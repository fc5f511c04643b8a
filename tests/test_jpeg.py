"""Baseline JPEG codec (operators/jpeg.py): exact round-trips where
the math is lossless, bounded error where it is not, spec-compliance
probes (restart markers, subsampling, odd sizes, marker hygiene), and
pinned-fixture determinism.

Exactness cases are the ones the multimodal_jpeg oracle leans on:
block-constant images at quality 100 (all-ones quantization) survive
DCT→quantize→Huffman→decode bit-exactly, and constant-color images
survive the JFIF floor(x+.5) color round-trip to the formula value.
"""

import hashlib
import math
import struct

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from bigslice_spark.operators.jpeg import (decode_jpeg, make_jpeg,
                                           quality_tables)

PROP = settings(max_examples=25, deadline=None,
                suppress_health_check=[HealthCheck.too_slow])


def _gray(a: np.ndarray) -> bytes:
    return np.repeat(a[:, :, None], 3, axis=2).tobytes()


def _ycc_roundtrip(r0: int, g0: int, b0: int) -> tuple[int, int, int]:
    """The exact decoded color of a constant (r0,g0,b0) input at
    quality 100 — the same floor(x+.5) formula the DuckDB oracle runs."""
    def fl(x):
        return math.floor(x + 0.5)
    y = fl(0.299 * r0 + 0.587 * g0 + 0.114 * b0)
    cb = fl(128 - 0.168736 * r0 - 0.331264 * g0 + 0.5 * b0)
    cr = fl(128 + 0.5 * r0 - 0.418688 * g0 - 0.081312 * b0)
    clip = lambda v: min(255, max(0, v))  # noqa: E731
    return (clip(fl(y + 1.402 * (cr - 128))),
            clip(fl(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))),
            clip(fl(y + 1.772 * (cb - 128))))


@pytest.mark.parametrize("w,h", [(8, 8), (16, 8), (13, 7), (1, 1),
                                 (32, 24)])
@pytest.mark.parametrize("v", [0, 128, 255])
def test_constant_gray_exact(w, h, v):
    px = bytes([v]) * (w * h * 3)
    w2, h2, out = decode_jpeg(make_jpeg(w, h, px, quality=100,
                                        grayscale=True))
    assert (w2, h2) == (w, h)
    assert out == px


@PROP
@given(nx=st.integers(1, 4), ny=st.integers(1, 3),
       seed=st.integers(0, 2**31), ri=st.integers(0, 4))
def test_block_constant_gray_exact(nx, ny, seed, ri):
    """Multi-block grayscale with per-block constant values: exact at
    q100 under every restart interval (0 = none) — exercises DC
    differential coding, EOB runs, restart predictor resets, and the
    MCU raster order."""
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 256, nx * ny)
    a = np.zeros((ny * 8, nx * 8), np.uint8)
    for b, v in enumerate(vals):
        r, c = divmod(b, nx)
        a[r * 8:(r + 1) * 8, c * 8:(c + 1) * 8] = v
    px = _gray(a)
    blob = make_jpeg(nx * 8, ny * 8, px, quality=100, grayscale=True,
                     restart_interval=ri)
    assert decode_jpeg(blob) == (nx * 8, ny * 8, px)


@PROP
@given(r0=st.integers(0, 255), g0=st.integers(0, 255),
       b0=st.integers(0, 255),
       sub=st.sampled_from(["4:4:4", "4:2:2", "4:2:0"]),
       w=st.integers(1, 40), h=st.integers(1, 24))
def test_constant_color_exact_formula(r0, g0, b0, sub, w, h):
    """Constant color at q100 decodes to EXACTLY the JFIF floor(x+.5)
    round-trip value under any subsampling and any (odd, padded)
    size — the invariant multimodal_jpeg's oracle recomputes in SQL."""
    px = bytes((r0, g0, b0)) * (w * h)
    w2, h2, out = decode_jpeg(make_jpeg(w, h, px, quality=100,
                                        subsampling=sub))
    assert (w2, h2) == (w, h)
    assert out == bytes(_ycc_roundtrip(r0, g0, b0)) * (w * h)


@PROP
@given(w=st.integers(1, 40), h=st.integers(1, 40),
       seed=st.integers(0, 2**31))
def test_random_gray_q100_bounded(w, h, seed):
    """Arbitrary content at q100: quantization steps are all 1, so
    the only loss is DCT round-off — max per-sample error ≤ 2."""
    rng = np.random.default_rng(seed)
    px = _gray(rng.integers(0, 256, (h, w), dtype=np.uint8))
    _, _, out = decode_jpeg(make_jpeg(w, h, px, quality=100,
                                      grayscale=True))
    err = np.abs(np.frombuffer(out, np.uint8).astype(np.int64)
                 - np.frombuffer(px, np.uint8).astype(np.int64))
    assert err.max() <= 2


@pytest.mark.parametrize("quality", [25, 50, 85])
@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
def test_lossy_quality_decodes(quality, sub):
    """Lossy settings still produce the right dims and plausible
    content (smooth gradient: error stays far under gross-failure
    levels), and lower quality compresses smaller."""
    w, h = 32, 24
    g = np.fromfunction(lambda y, x: (4 * x + 3 * y) % 256, (h, w))
    rgb = np.stack([g, 255 - g, np.full_like(g, 64)], axis=2)
    px = rgb.astype(np.uint8).tobytes()
    blob = make_jpeg(w, h, px, quality=quality, subsampling=sub)
    w2, h2, out = decode_jpeg(blob)
    assert (w2, h2) == (w, h)
    err = np.abs(np.frombuffer(out, np.uint8).astype(np.int64)
                 - np.frombuffer(px, np.uint8).astype(np.int64))
    assert err.mean() < 40, err.mean()
    bigger = make_jpeg(w, h, px, quality=95, subsampling=sub)
    assert len(blob) < len(bigger)


def test_pinned_fixture_md5():
    """Determinism pin: fixed input → byte-identical JPEG and
    byte-identical decode, across processes and sessions (the encoder
    has no RNG, no timestamps; Huffman ties break by symbol value)."""
    rng = np.random.default_rng(1234)
    px = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8).tobytes()
    blob = make_jpeg(24, 16, px, quality=90, subsampling="4:2:0")
    assert hashlib.md5(blob).hexdigest() == \
        "b2cccd36d2e765729626a0b21382d02e"
    w, h, out = decode_jpeg(blob)
    assert (w, h) == (24, 16)
    assert hashlib.md5(out).hexdigest() == \
        "d75d4ebd454c5ee06021f27772a278a9"


def test_marker_hygiene_and_raises():
    """Lossless (SOF3) and 12-bit raise NotImplementedError with the
    honest reason; corrupt/truncated streams raise ValueError — never
    a silent wrong decode."""
    sof = struct.pack(">H", 11) + b"\x08" + struct.pack(">HHB", 8, 8, 1) \
        + b"\x01\x11\x00"
    with pytest.raises(NotImplementedError, match="SOF3"):
        decode_jpeg(b"\xff\xd8\xff\xc3" + sof)
    sof12 = struct.pack(">H", 11) + b"\x0c" + struct.pack(">HHB", 8, 8, 1) \
        + b"\x01\x11\x00"
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg(b"\xff\xd8\xff\xc0" + sof12)
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xffJPEG...")
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"GIF89a")
    good = make_jpeg(8, 8, bytes(8 * 8 * 3), quality=100, grayscale=True)
    with pytest.raises(ValueError):
        decode_jpeg(good[:len(good) // 2])
    with pytest.raises(ValueError, match="restart_interval"):
        make_jpeg(8, 8, bytes(8 * 8 * 3), progressive=True,
                  restart_interval=2)


@PROP
@given(w=st.integers(1, 48), h=st.integers(1, 48),
       seed=st.integers(0, 2**31),
       sub=st.sampled_from(["4:4:4", "4:2:2", "4:2:0"]),
       quality=st.sampled_from([50, 75, 92, 100]),
       gray=st.booleans())
def test_progressive_equals_baseline(w, h, seed, sub, quality, gray):
    """THE progressive invariant: SOF2 is a bit-plane reordering of
    the same quantized coefficients, so decode(progressive) must be
    BYTE-IDENTICAL to decode(baseline) for any content, size,
    subsampling and quality — this exercises DC first/refine, AC
    first/refine, EOB runs with deferred correction bits, ZRL-in-
    refinement, and per-scan Huffman tables against each other."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    if gray:
        px[:, :, 1] = px[:, :, 0]
        px[:, :, 2] = px[:, :, 0]
    pb = px.tobytes()
    base = make_jpeg(w, h, pb, quality=quality, subsampling=sub,
                     grayscale=gray)
    prog = make_jpeg(w, h, pb, quality=quality, subsampling=sub,
                     grayscale=gray, progressive=True)
    assert b"\xff\xc2" in prog and b"\xff\xc2" not in base[:20]
    assert decode_jpeg(prog) == decode_jpeg(base)


def test_progressive_long_eob_runs():
    """A mostly-flat image at low quality drives long EOB runs (and
    their deferred refinement correction bits) through both codec
    sides; block-constant content also round-trips exactly at q100."""
    w, h = 64, 64
    flat = np.full((h, w, 3), 128, np.uint8)
    flat[0, 0] = (255, 0, 0)                    # one busy corner
    pb = flat.tobytes()
    for q in (30, 100):
        assert decode_jpeg(make_jpeg(w, h, pb, quality=q,
                                     progressive=True)) \
            == decode_jpeg(make_jpeg(w, h, pb, quality=q))
    v = bytes([77]) * (16 * 16 * 3)
    w2, h2, out = decode_jpeg(make_jpeg(16, 16, v, quality=100,
                                        grayscale=True,
                                        progressive=True))
    assert (w2, h2, out) == (16, 16, v)


def test_unknown_segments_skipped():
    """APPn/COM segments (EXIF blobs, comments) are skipped, including
    ones containing 0xFFD8/0xFFD9-looking bytes in their payload."""
    px = bytes([77]) * (8 * 8 * 3)
    blob = make_jpeg(8, 8, px, quality=100, grayscale=True)
    payload = b"Exif\x00\x00\xff\xd9\xff\xd8garbage"
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + len(payload)) + payload
    com = b"\xff\xfe" + struct.pack(">H", 9) + b"comment"
    spliced = blob[:2] + app1 + com + blob[2:]
    assert decode_jpeg(spliced) == (8, 8, px)


def test_quality_tables_formula():
    """q=100 → all-ones tables (the lossless-up-to-DCT case the exact
    tests rely on); q=50 → the Annex-K tables verbatim."""
    qy, qc = quality_tables(100)
    assert (qy == 1).all() and (qc == 1).all()
    qy50, qc50 = quality_tables(50)
    assert qy50[0, 0] == 16 and qy50[7, 7] == 99
    assert qc50[0, 0] == 17 and qc50[7, 7] == 99
    with pytest.raises(ValueError):
        quality_tables(0)


def test_decode_image_dispatch_and_features(spark):
    """The production entry points route JPEG: decode_image magic
    dispatch, and extract_features(fake=False) emits the exact
    integer-mean image descriptor for a JPEG payload."""
    from bigslice_spark.operators.multimodal import (decode_image,
                                                     extract_features,
                                                     pack_media)
    px = bytes([10, 200, 30]) * 64
    blob = make_jpeg(8, 8, px, quality=100)
    assert decode_image(blob)[:2] == (8, 8)
    r2, g2, b2 = _ycc_roundtrip(10, 200, 30)
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "id long, payload binary")
    row = extract_features(pack_media(df, "payload", "id"),
                           fake=False).first()
    assert row["feat"] == [1.0, 8.0, 8.0, 3.0, 64.0,
                           float(r2), float(g2), float(b2)]
