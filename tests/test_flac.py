"""FLAC codec (operators/flac.py): round trips, decode-path coverage,
structural corruption detection, and the flac_samples operator."""

import math
import random

import pytest

import bigslice_spark.operators.flac as FL
from bigslice_spark.operators.flac import decode_flac, encode_flac


def _interleave(left, right):
    return [v for pair in zip(left, right) for v in pair]


def _roundtrip(samples, channels=1, block_size=64, lpc_order=None,
               rate=8000, bps=16):
    blob = encode_flac(samples, rate, channels=channels, bps=bps,
                       block_size=block_size, lpc_order=lpc_order)
    got_rate, got_ch, dec = decode_flac(blob)
    assert got_rate == rate and got_ch == channels
    assert dec.tolist() == list(samples)
    return blob


def test_flac_roundtrip_shapes():
    rng = random.Random(11)
    sine = [int(8000 * math.sin(n / 10)) for n in range(500)]
    cases = [
        [100] * 300,                                   # constant
        [0] * 50,                                      # constant zero
        list(range(-200, 312)),                        # pure ramp
        [rng.randint(-32768, 32767) for _ in range(777)],  # noise
        [4 * rng.randint(-2000, 2000) for _ in range(300)],  # wasted
        sine,                                          # predictable
        [5, -3, 2],                                    # shorter than block
        [],                                            # empty stream
        [-32768, 32767] * 40,                          # full-scale swing
    ]
    for samples in cases:
        for bs in (64, 192, 256):
            _roundtrip(samples, block_size=bs)
    _roundtrip(sine, lpc_order=8)
    _roundtrip(sine, lpc_order=32)                     # max LPC order


def test_flac_roundtrip_stereo_modes():
    """Different channel relationships steer the per-frame stereo-mode
    search to different assignments; all must round-trip and the
    encoder must actually USE decorrelation when it pays."""
    rng = random.Random(13)
    L = [int(6000 * math.sin(n / 9)) for n in range(400)]
    R = [int(5500 * math.sin(n / 9 + 0.2)) for n in range(400)]
    corr = _roundtrip(_interleave(L, R), channels=2)
    dup = _roundtrip(_interleave(L, L), channels=2)     # side == 0
    rl = [rng.randint(-32768, 32767) for _ in range(400)]
    rr = [rng.randint(-32768, 32767) for _ in range(400)]
    indep = _roundtrip(_interleave(rl, rr), channels=2)
    _roundtrip(_interleave(L, R), channels=2, lpc_order=8)
    # frames start right after fLaC(4) + block header(4) + STREAMINFO
    # (34); channel assignment is the high nibble of header byte 3
    ca_corr = corr[42 + 3] >> 4
    ca_dup = dup[42 + 3] >> 4
    assert ca_corr in (8, 9, 10), ca_corr      # decorrelation chosen
    assert ca_dup in (8, 9, 10), ca_dup        # zero side: always wins
    # identical channels compress far better than independent noise
    assert len(dup) < len(indep) / 2


def test_flac_all_channel_assignments_decode():
    """Handcrafted frames covering every stereo decorrelation the spec
    allows — the encoder picks by cost, so the rarely-chosen modes
    (independent, right/side) need direct decoder coverage, including
    the side channel's bps+1 sample width."""
    L = [int(3000 * math.sin(n / 5)) for n in range(192)]
    R = [int(-2500 * math.sin(n / 6 + 1)) for n in range(192)]
    S = [a - b for a, b in zip(L, R)]
    M = [(a + b) >> 1 for a, b in zip(L, R)]

    def stereo_stream(ca, ch0, w0, ch1, w1):
        w = FL._BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 2)
        w.write(1, 4)                                  # 192 samples
        w.write(0, 4)                                  # streaminfo rate
        w.write(ca, 4)
        w.write(4, 3)                                  # 16-bit
        w.write(0, 1)
        FL._utf8_number(w, 0)
        w.align()
        hdr = w.getvalue()
        w.write(FL._crc8(hdr), 8)
        for sub, width in ((ch0, w0), (ch1, w1)):
            w.write(0, 1)
            w.write(1, 6)                              # VERBATIM
            w.write(0, 1)
            for v in sub:
                w.write(v, width)
        w.align()
        body = w.getvalue()
        w.write(FL._crc16(body), 16)
        fr = w.getvalue()
        si = FL._BitWriter()
        si.write(192, 16)
        si.write(192, 16)
        si.write(0, 48)
        si.write(8000, 20)
        si.write(1, 3)                                 # 2 channels
        si.write(15, 5)
        si.write(192, 36)
        info = si.getvalue() + b"\x00" * 16
        return (b"fLaC" + bytes([0x80]) + len(info).to_bytes(3, "big")
                + info + fr)

    want = [v for pair in zip(L, R) for v in pair]
    for ca, ch0, w0, ch1, w1 in (
            (1, L, 16, R, 16),                         # independent
            (8, L, 16, S, 17),                         # left/side
            (9, S, 17, R, 16),                         # right/side
            (10, M, 16, S, 17)):                       # mid/side
        rate, ch, dec = decode_flac(stereo_stream(ca, ch0, w0, ch1, w1))
        assert (rate, ch) == (8000, 2)
        assert dec.tolist() == want, f"ca={ca}"


def _spy_decode(blob, monkeypatch=None):
    """Decode while recording subframe types and residual methods."""
    types, methods = [], []
    orig_sub, orig_res = FL._decode_subframe, FL._decode_residual

    def spy_sub(r, bs, bps):
        byte, bit = r.byte, r.bit
        r.read(1)
        types.append(r.read(6))
        r.byte, r.bit = byte, bit
        return orig_sub(r, bs, bps)

    def spy_res(r, bs, order):
        byte, bit = r.byte, r.bit
        methods.append(r.read(2))
        r.byte, r.bit = byte, bit
        return orig_res(r, bs, order)

    FL._decode_subframe, FL._decode_residual = spy_sub, spy_res
    try:
        out = decode_flac(blob)
    finally:
        FL._decode_subframe, FL._decode_residual = orig_sub, orig_res
    return out, types, methods


def test_flac_encoder_exercises_decode_paths():
    """The encoder's cost-based decisions must reach every subframe
    kind and both residual methods on inputs built to favor them —
    otherwise the round-trip suite silently tests a subset."""
    rng = random.Random(17)
    # a FAST sine: fixed predictors (integer binomial coefficients)
    # leave a large residual, quantized-LPC (≈2·cos ω) annihilates it
    fast = [int(12000 * math.sin(n / 2)) for n in range(512)]
    blob = encode_flac(fast, 8000, block_size=256, lpc_order=8)
    _, types, _ = _spy_decode(blob)
    assert any(t >= 32 for t in types), types          # LPC used
    sine = [int(8000 * math.sin(n / 10)) for n in range(256)]
    blob = encode_flac([7] * 128 + sine[:128], 8000, block_size=64)
    _, types, _ = _spy_decode(blob)
    assert 0 in types                                  # constant
    assert any(8 <= t <= 12 for t in types)            # fixed
    noise = [rng.randint(-32768, 32767) for _ in range(128)]
    blob = encode_flac(noise, 8000, block_size=64)
    _, types, _ = _spy_decode(blob)
    assert 1 in types or any(8 <= t <= 12 for t in types)
    # 17-bit side residuals of anti-correlated noise: the escape/RICE2
    # regime — must round-trip whichever the cost search picks
    big = [rng.randint(20000, 32767) for _ in range(256)]
    inter = _interleave(big, [-v for v in big])
    blob = encode_flac(inter, 8000, channels=2, block_size=64)
    out, _, methods = _spy_decode(blob)
    assert out[2].tolist() == inter
    # wasted bits: decoded exactly, stream smaller than unscaled noise
    scaled = [v << 3 for v in
              [rng.randint(-1000, 1000) for _ in range(256)]]
    plain = [v >> 3 for v in scaled]
    b_scaled = encode_flac(scaled, 8000, block_size=64)
    b_plain = encode_flac(plain, 8000, block_size=64)
    assert decode_flac(b_scaled)[2].tolist() == scaled
    assert len(b_scaled) <= b_plain.__len__() + 16     # ~same size


def test_flac_handcrafted_header_codes():
    """Decoder paths the encoder never emits: standard block-size and
    sample-rate codes, inline sample rates, variable blocking
    strategy. Build a frame manually around a verbatim subframe."""
    samples = list(range(-96, 96))                     # 192 == code 1

    def frame(bs_code, sr_code, strategy, extra_hdr=b"", n=192,
              sr_extra=None):
        w = FL._BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(strategy, 1)
        w.write(bs_code, 4)
        w.write(sr_code, 4)
        w.write(0, 4)                                  # mono
        w.write(4, 3)                                  # 16-bit
        w.write(0, 1)
        FL._utf8_number(w, 0)
        if sr_extra is not None:
            w.write(*sr_extra)
        w.align()
        hdr = w.getvalue()
        w.write(FL._crc8(hdr), 8)
        w.write(0, 1)
        w.write(1, 6)                                  # VERBATIM
        w.write(0, 1)
        for v in samples[:n]:
            w.write(v, 16)
        w.align()
        body = w.getvalue()
        w.write(FL._crc16(body), 16)
        return w.getvalue()

    def stream(fr, rate=8000, total=192):
        si = FL._BitWriter()
        si.write(192, 16)
        si.write(192, 16)
        si.write(0, 24)
        si.write(0, 24)
        si.write(rate, 20)
        si.write(0, 3)
        si.write(15, 5)
        si.write(total, 36)
        info = si.getvalue() + b"\x00" * 16            # no MD5: skipped
        return (b"fLaC" + bytes([0x80]) + len(info).to_bytes(3, "big")
                + info + fr)

    # block size code 1 (=192) + streaminfo rate (code 0)
    rate, ch, dec = decode_flac(stream(frame(1, 0, 0)))
    assert (rate, ch, dec.tolist()) == (8000, 1, samples)
    # standard rate code 4 (8000) + variable blocking strategy
    assert decode_flac(stream(frame(1, 4, 1)))[2].tolist() == samples
    # inline kHz (code 12: 8 bits), Hz (13: 16 bits), daHz (14)
    for code, extra in ((12, (8, 8)), (13, (8000, 16)),
                        (14, (800, 16))):
        got = decode_flac(stream(frame(1, code, 0,
                                       sr_extra=(extra[0], extra[1]))))
        assert got[2].tolist() == samples
    # invalid rate code 15 raises
    with pytest.raises(ValueError, match="sample rate"):
        decode_flac(stream(frame(1, 15, 0)))


def test_flac_rice2_and_escape_partitions_decode():
    """Handcrafted method-1 (RICE2, 5-bit parameters) and escape-coded
    residuals — RICE with cap-14 + raw escape usually ties RICE2 in
    the encoder's cost search, so the decoder path needs direct
    coverage; also the 0-bit escape (all-zero partition)."""
    vals = [(-1) ** n * (n * 37 % 300) for n in range(64)]

    def fixed0_frame(write_residual):
        w = FL._BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 2)
        w.write(6, 4)                                  # 8-bit bs-1
        w.write(0, 4)
        w.write(0, 4)                                  # mono
        w.write(4, 3)
        w.write(0, 1)
        FL._utf8_number(w, 0)
        w.write(63, 8)                                 # bs = 64
        w.align()
        hdr = w.getvalue()
        w.write(FL._crc8(hdr), 8)
        w.write(0, 1)
        w.write(0b001000, 6)                           # FIXED order 0
        w.write(0, 1)
        write_residual(w)
        w.align()
        body = w.getvalue()
        w.write(FL._crc16(body), 16)
        fr = w.getvalue()
        si = FL._BitWriter()
        si.write(64, 16)
        si.write(64, 16)
        si.write(0, 48)
        si.write(8000, 20)
        si.write(0, 3)
        si.write(15, 5)
        si.write(64, 36)
        info = si.getvalue() + b"\x00" * 16
        return (b"fLaC" + bytes([0x80]) + len(info).to_bytes(3, "big")
                + info + fr)

    def rice2(w):
        w.write(1, 2)                                  # method 1
        w.write(0, 4)                                  # one partition
        w.write(16, 5)                                 # RICE2-only param
        for v in vals:
            u = (v << 1) if v >= 0 else ((-v) << 1) - 1
            w.write_unary(u >> 16)
            w.write(u, 16)

    assert decode_flac(fixed0_frame(rice2))[2].tolist() == vals

    def escapes(w):
        w.write(0, 2)
        w.write(1, 4)                                  # two partitions
        w.write(0xF, 4)                                # escape
        w.write(11, 5)                                 # 11-bit raw
        for v in vals[:32]:
            w.write(v, 11)
        w.write(0xF, 4)                                # escape, 0 bits
        w.write(0, 5)

    assert decode_flac(fixed0_frame(escapes))[2].tolist() == \
        vals[:32] + [0] * 32


def test_flac_32bit_noise_roundtrip():
    """Noisy 32-bit PCM residuals have raw widths > 31 bits — the
    escape partition's 5-bit count field cannot carry them, so the
    encoder must fall back to Rice (r11 review finding: the truncated
    field produced undecodable streams)."""
    rng = random.Random(41)
    exact = [5786367, 2106454194, -2085653202, 1155841727]
    blob = encode_flac(exact, 8000, bps=32, block_size=4)
    assert decode_flac(blob)[2].tolist() == exact
    for n, bs in ((1, 64), (7, 4), (200, 64), (200, 192)):
        x = [rng.randint(-(2 ** 31), 2 ** 31 - 1) for _ in range(n)]
        blob = encode_flac(x, 8000, bps=32, block_size=bs)
        assert decode_flac(blob)[2].tolist() == x, (n, bs)
    x = [rng.randint(-(2 ** 23), 2 ** 23 - 1) for _ in range(150)]
    blob = encode_flac(x, 8000, bps=24, block_size=64)
    assert decode_flac(blob)[2].tolist() == x


def test_flac_utf8_coded_numbers():
    for n in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x1FFFFF,
              0x3FFFFFF, 0x7FFFFFFF, (1 << 36) - 1):
        w = FL._BitWriter()
        FL._utf8_number(w, n)
        assert FL._read_utf8_number(FL._BitReader(w.getvalue())) == n


def test_flac_corruption_raises():
    sine = [int(5000 * math.sin(n / 7)) for n in range(300)]
    blob = bytearray(encode_flac(sine, 8000, block_size=64))
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"RIFF" + bytes(blob[4:]))
    # flip one bit in the first frame's body: CRC-8/16 must catch it
    bad = bytearray(blob)
    bad[42 + 8] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))
    # truncation mid-frame
    with pytest.raises(ValueError):
        decode_flac(bytes(blob[:len(blob) - 3]))
    # MD5 signature mismatch (bit flipped INSIDE the signature)
    bad = bytearray(blob)
    bad[42 - 10] ^= 0x01
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(bad))
    assert decode_flac(bytes(bad), verify_md5=False)[2].tolist() == sine
    # sample count vs STREAMINFO: drop the last frame entirely
    r = FL._BitReader(bytes(blob), 42)                 # walk frame 1
    with pytest.raises(ValueError, match="range|out of"):
        encode_flac([40000], bps=16)                   # out of range
    with pytest.raises(ValueError, match="ragged"):
        encode_flac([1, 2, 3], channels=2)


def test_flac_samples_operator(spark):
    """flac_samples: Arrow-batched decode into (id, rate, channels,
    samples), NULL blob raises with the id in the message."""
    from bigslice_spark.operators.audio import flac_samples
    import pandas as pd

    blobs = []
    for d in range(4):
        pcm = [((d * 43 + 29 * n * n) % 4001) - 2000 for n in range(96)]
        blobs.append((d, bytearray(encode_flac(pcm, 16000,
                                               block_size=64))))
    df = spark.createDataFrame(blobs, "id long, media binary")
    out = {r["id"]: r for r in flac_samples(df).collect()}
    assert len(out) == 4
    for d in range(4):
        pcm = [((d * 43 + 29 * n * n) % 4001) - 2000 for n in range(96)]
        assert out[d]["rate"] == 16000
        assert out[d]["channels"] == 1
        assert list(out[d]["samples"]) == pcm
    bad = spark.createDataFrame([(9, None)], "id long, media binary")
    with pytest.raises(Exception, match="NULL media blob"):
        flac_samples(bad).collect()
