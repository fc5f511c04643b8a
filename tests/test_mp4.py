"""ISO BMFF parser/demuxer (operators/mp4.py): writer round-trips,
64-bit and exotic box shapes the writer does not emit, sample-table
joins, hostile/corrupt input, and the Spark demux operators."""

import struct

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from bigslice_spark.operators.mp4 import (Mp4Track, TrackSpec,
                                          demux_samples, make_mp4,
                                          mp4_demux, mp4_meta,
                                          parse_mp4)

PROP = settings(max_examples=25, deadline=None,
                suppress_health_check=[HealthCheck.too_slow])


def _video(samples, w=64, h=48, delta=40):
    return TrackSpec(handler="vide", codec="mp4v", samples=samples,
                     width=w, height=h, timescale=1000,
                     sample_delta=delta)


def _audio(samples, delta=1024):
    return TrackSpec(handler="soun", codec="mp4a", samples=samples,
                     timescale=48000, sample_delta=delta)


def test_roundtrip_two_tracks():
    v = _video([b"frame0-bytes", b"f1", b"frame2!!"], w=320, h=240)
    a = _audio([b"audio-chunk-0", b"a1"])
    blob = make_mp4([v, a])
    m = parse_mp4(blob)
    assert m.brand == "isom"
    assert m.duration_ms == 120          # 3 video samples x 40 ms
    assert [t.handler for t in m.tracks] == ["vide", "soun"]
    vt, at = m.tracks
    assert (vt.track_id, vt.codec, vt.width, vt.height,
            vt.sample_count) == (1, "mp4v", 320, 240, 3)
    assert (at.track_id, at.codec, at.timescale,
            at.duration) == (2, "mp4a", 48000, 2048)
    assert demux_samples(blob, vt) == v.samples
    assert demux_samples(blob, at) == a.samples
    assert make_mp4([v, a]) == blob      # deterministic bytes


@PROP
@given(nv=st.integers(1, 8), na=st.integers(0, 5),
       seed=st.integers(0, 2**31), w=st.integers(1, 4096),
       h=st.integers(1, 4096))
def test_roundtrip_property(nv, na, seed, w, h):
    import numpy as np
    rng = np.random.default_rng(seed)
    vs = [bytes(rng.integers(0, 256, int(rng.integers(0, 200)),
                             dtype=np.uint8)) for _ in range(nv)]
    tracks = [_video(vs, w=w, h=h)]
    if na:
        tracks.append(_audio([bytes(rng.integers(0, 256, 32,
                                                 dtype=np.uint8))
                              for _ in range(na)]))
    blob = make_mp4(tracks)
    m = parse_mp4(blob)
    assert demux_samples(blob, m.tracks[0]) == vs
    assert (m.tracks[0].width, m.tracks[0].height) == (w, h)
    if na:
        assert m.tracks[1].sample_count == na
    # zero-size samples must keep their slot in the sample table
    assert m.tracks[0].sample_count == nv


def test_largesize_and_eof_boxes():
    """A 64-bit `largesize` mdat and a size==0 (to-EOF) trailing box —
    shapes real muxers emit that make_mp4 does not."""
    v = _video([b"payload-one", b"payload-two"])
    blob = bytearray(make_mp4([v]))
    # rewrite the trailing mdat as a largesize box (8 extra header
    # bytes shift sample data, so patch stco too)
    i = blob.rfind(b"mdat") - 4
    size = struct.unpack_from(">I", blob, i)[0]
    body = bytes(blob[i + 8:i + size])
    large = (struct.pack(">I", 1) + b"mdat"
             + struct.pack(">Q", 16 + len(body)) + body)
    j = bytes(blob).find(b"stco")
    old = struct.unpack_from(">I", blob, j + 12)[0]
    struct.pack_into(">I", blob, j + 12, old + 8)
    blob = bytes(blob[:i]) + large
    m = parse_mp4(blob)
    assert demux_samples(blob, m.tracks[0]) == v.samples
    # append a to-EOF free box: still parses (walk consumes it)
    blob2 = blob + struct.pack(">I", 0) + b"free" + b"junk"
    assert parse_mp4(blob2).tracks[0].sample_count == 2


def test_co64_and_uniform_stsz():
    """co64 offsets and run-length (uniform) stsz — hand-patched."""
    v = _video([b"eightby8", b"eightby8", b"eightby8"])
    blob = bytearray(make_mp4([v]))
    # uniform stsz: sample_size=8, count=3, no table
    j = bytes(blob).find(b"stsz")
    # old stsz body: ver/flags(4) + uniform(4) + n(4) + 3*4 table
    struct.pack_into(">II", blob, j + 8, 8, 3)
    # splice out the 12-byte table and shrink the boxes on the path
    table_at = j + 16
    del blob[table_at:table_at + 12]
    for tag in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        k = bytes(blob).find(tag)
        struct.pack_into(">I", blob, k - 4,
                         struct.unpack_from(">I", blob, k - 4)[0] - 12)
    k = bytes(blob).find(b"stsz")
    struct.pack_into(">I", blob, k - 4,
                     struct.unpack_from(">I", blob, k - 4)[0] - 12)
    # moov shrank by 12 → mdat moved back 12; repoint stco
    k = bytes(blob).find(b"stco")
    old = struct.unpack_from(">I", blob, k + 12)[0]
    struct.pack_into(">I", blob, k + 12, old - 12)
    m = parse_mp4(bytes(blob))
    assert demux_samples(bytes(blob), m.tracks[0]) == v.samples


def test_multi_chunk_stsc():
    """An stsc with two runs (2 samples/chunk then 1) across three
    chunks — the chunk-map expansion the single-chunk writer skips."""
    samples = [b"s0..", b"s1....", b"s2", b"s3model", b"s4!"]
    sizes = [len(s) for s in samples]
    data = b"".join(samples)
    stsd = _mk_full(b"stsd", struct.pack(">I", 1), _mk_box(
        b"mp4v", b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
        + struct.pack(">HH", 8, 8) + b"\x00" * 46))
    stts = _mk_full(b"stts", struct.pack(">I", 1),
                    struct.pack(">II", 5, 1))
    stsc = _mk_full(b"stsc", struct.pack(">I", 2),
                    struct.pack(">III", 1, 2, 1),
                    struct.pack(">III", 3, 1, 1))
    stsz = _mk_full(b"stsz", struct.pack(">II", 0, 5),
                    struct.pack(">5I", *sizes))
    # chunks: [s0,s1], [s2,s3], [s4] — offsets patched after assembly
    stco = _mk_full(b"stco", struct.pack(">I", 3),
                    struct.pack(">III", 0, 0, 0))
    stbl = _mk_box(b"stbl", stsd, stts, stsc, stsz, stco)
    minf = _mk_box(b"minf", _mk_full(b"vmhd", b"\x00" * 8), stbl)
    hdlr = _mk_full(b"hdlr", struct.pack(">I", 0), b"vide",
                    b"\x00" * 12, b"t\x00")
    mdhd = _mk_full(b"mdhd", struct.pack(">II", 0, 0),
                    struct.pack(">II", 1000, 5),
                    struct.pack(">HH", 0x55C4, 0))
    mdia = _mk_box(b"mdia", mdhd, hdlr, minf)
    tkhd = _mk_full(b"tkhd", struct.pack(">II", 0, 0),
                    struct.pack(">I", 9), b"\x00" * 4,
                    struct.pack(">I", 5), b"\x00" * 8,
                    struct.pack(">HHHH", 0, 0, 0, 0),
                    struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0,
                                0, 0, 0x40000000),
                    struct.pack(">II", 8 << 16, 8 << 16))
    trak = _mk_box(b"trak", tkhd, mdia)
    mvhd = _mk_full(b"mvhd", struct.pack(">II", 0, 0),
                    struct.pack(">II", 1000, 5), b"\x00" * 80)
    moov = _mk_box(b"moov", mvhd, trak)
    ftyp = _mk_box(b"ftyp", b"isom", struct.pack(">I", 0), b"isom")
    base = len(ftyp) + len(moov) + 8
    offs = [base, base + sizes[0] + sizes[1],
            base + sum(sizes[:4])]
    moov = bytearray(moov)
    j = bytes(moov).find(b"stco")
    struct.pack_into(">III", moov, j + 12, *offs)
    moov = bytes(moov)
    blob = ftyp + moov + _mk_box(b"mdat", data)
    m = parse_mp4(blob)
    t = m.tracks[0]
    assert t.track_id == 9 and t.sample_count == 5
    assert demux_samples(blob, t) == samples


def _mk_box(cc, *parts):
    body = b"".join(parts)
    return struct.pack(">I", 8 + len(body)) + cc + body


def _mk_full(cc, *parts):
    return _mk_box(cc, b"\x00\x00\x00\x00", *parts)


@pytest.mark.parametrize("mutate", [
    lambda b: b[:6],                                  # truncated header
    lambda b: b[:-4],                                 # truncated mdat
    lambda b: struct.pack(">I", 3) + b[4:],           # size < header
    lambda b: b.replace(b"ftyp", b"fTyp", 1),         # no ftyp/moov
])
def test_corrupt_raises(mutate):
    blob = make_mp4([_video([b"abc", b"defg"])])
    with pytest.raises(ValueError):
        parse_mp4(mutate(blob))


def test_sample_beyond_eof_raises():
    blob = bytearray(make_mp4([_video([b"abcdef"])]))
    j = bytes(blob).find(b"stsz")
    struct.pack_into(">I", blob, j + 16, 10_000)       # size 6 → 10000
    with pytest.raises(ValueError, match="beyond EOF"):
        parse_mp4(bytes(blob))


def test_stsz_stsc_mismatch_raises():
    blob = bytearray(make_mp4([_video([b"ab", b"cd", b"ef"])]))
    j = bytes(blob).find(b"stsc")
    struct.pack_into(">III", blob, j + 12, 1, 2, 1)    # 2 of 3 placed
    with pytest.raises(ValueError, match="inconsistent"):
        parse_mp4(bytes(blob))


def test_chunk_map_overcapacity_raises():
    """A chunk map placing MORE samples than stsz declares is corrupt
    and must raise — not silently stop at stsz's count."""
    blob = bytearray(make_mp4([_video([b"ab", b"cd", b"ef"])]))
    j = bytes(blob).find(b"stsc")
    struct.pack_into(">III", blob, j + 12, 1, 5, 1)    # 5 > 3 sizes
    with pytest.raises(ValueError, match="inconsistent"):
        parse_mp4(bytes(blob))


def test_truncated_tkhd_in_larger_blob_raises():
    """A tkhd whose body ends before the width/height fields must
    raise ValueError instead of reading the sibling box's bytes (or
    struct.error at EOF) — field reads are checked against the BOX
    end, not the blob end."""
    short_tkhd = _mk_full(b"tkhd", struct.pack(">II", 0, 0),
                          struct.pack(">I", 9))        # 12-byte body
    sibling = _mk_box(b"free", b"\xff" * 96)           # bytes beyond
    trak = _mk_box(b"trak", short_tkhd, sibling)
    mvhd = _mk_full(b"mvhd", struct.pack(">II", 0, 0),
                    struct.pack(">II", 1000, 5), b"\x00" * 80)
    moov = _mk_box(b"moov", mvhd, trak)
    ftyp = _mk_box(b"ftyp", b"isom", struct.pack(">I", 0), b"isom")
    with pytest.raises(ValueError, match="truncated tkhd"):
        parse_mp4(ftyp + moov)


def test_spark_meta_and_demux(spark):
    import hashlib
    rows = []
    for d in range(6):
        v = _video([(f"{d}:{i};".encode()) * (1 + (d + i) % 3)
                    for i in range(1 + d % 4)],
                   w=16 + d, h=9 + d)
        tracks = [v]
        if d % 2:
            tracks.append(_audio([f"aud{d}".encode()]))
        rows.append((d, bytearray(make_mp4(tracks))))
    rows.append((99, None))                            # missing blob
    df = spark.createDataFrame(rows, "id long, media binary")

    meta = {(r["id"], r["track_id"]): r
            for r in mp4_meta(df).collect()}
    assert (99, 1) not in meta and len(meta) == 6 + 3
    for d in range(6):
        r = meta[(d, 1)]
        assert (r["handler"], r["codec"]) == ("vide", "mp4v")
        assert (r["width"], r["height"]) == (16 + d, 9 + d)
        assert r["sample_count"] == 1 + d % 4
        assert r["duration_ms"] == 40 * (1 + d % 4) if d % 2 == 0 \
            else r["duration_ms"] >= 0

    sam = mp4_demux(df, handler="vide").collect()
    assert all(r["handler"] == "vide" for r in sam)
    got = {(r["id"], r["sample_idx"]): bytes(r["sample"]) for r in sam}
    for d in range(6):
        for i in range(1 + d % 4):
            assert got[(d, i)] == (f"{d}:{i};".encode()) * (1 + (d + i) % 3)
    # demux output feeds hashing/dedup directly — exactness check
    h = hashlib.md5(got[(3, 1)]).hexdigest()
    assert h == hashlib.md5(b"3:1;" * 2).hexdigest()


def test_frame_sample_mjpeg_real_decode(spark):
    """MJPEG-in-MP4: frame_sample(fake=False) demuxes the video track
    and decodes each sampled sample as a standalone JPEG."""
    import numpy as np
    from bigslice_spark.operators.jpeg import make_jpeg
    from bigslice_spark.operators.multimodal import frame_sample
    frames = []
    colors = []
    for i in range(5):
        rgb = ((10 + 40 * i) % 256, (200 - 30 * i) % 256, 77)
        colors.append(rgb)
        frames.append(make_jpeg(16, 16, bytes(rgb) * 256,
                                quality=100, subsampling="4:4:4"))
    blob = make_mp4([TrackSpec(handler="vide", codec="jpeg",
                               samples=frames, width=16, height=16)])
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "id long, media binary")
    rows = {r["frame_idx"]: bytes(r["frame"])
            for r in frame_sample(df, every_n=2, fake=False).collect()}
    assert sorted(rows) == [0, 2, 4]
    for i in (0, 2, 4):
        a = np.frombuffer(rows[i], np.uint8).reshape(16, 16, 3)
        assert (a == a[0, 0]).all()
        # constant color survives the JFIF round trip within ±1/clamp
        assert all(abs(int(a[0, 0][c]) - colors[i][c]) <= 2
                   for c in range(3))


def test_frame_sample_non_mjpeg_codec_raises(spark):
    from bigslice_spark.operators.multimodal import frame_sample
    blob = make_mp4([TrackSpec(handler="vide", codec="avc1",
                               samples=[b"h264-bitstream"],
                               width=16, height=16)])
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "id long, media binary")
    with pytest.raises(Exception, match="avc1"):
        frame_sample(df, fake=False).collect()


def test_frame_sample_audio_only_mp4_no_rows(spark):
    from bigslice_spark.operators.multimodal import frame_sample
    blob = make_mp4([TrackSpec(handler="soun", codec="mp4a",
                               samples=[b"aac"], timescale=48000)])
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "id long, media binary")
    assert frame_sample(df, fake=False).count() == 0
