"""IMA ADPCM ('ima4') — a real COMPRESSED audio codec, pure integer
arithmetic end to end (IMA Digital Audio Pack recommendation; the
QuickTime 'ima4' packetization: 34-byte packets = a 16-bit big-endian
state header + 32 bytes of 4-bit codes, 64 mono samples per packet,
low nibble first).

Why this codec: 4:1 compression with a decoder that is EXACTLY
specified over integers — step/index tables, shift-based diff
reconstruction, int16 clamping — so, unlike H.264/AAC (which stay
honest raises, multimodal.py:446), the full encode→decode chain is
replayable bit-for-bit by an ANSI-SQL recursive CTE: the
``audio_adpcm`` registry oracle re-runs the quantizer AND the
reconstruction recurrence from the analytic input signal and matches
the operator's decoded samples exactly.

Determinism contract: at each packet boundary the ENCODER truncates
its own predictor to the 9 bits the header can carry (two's-complement
``& ~0x7F``) before continuing, so encoder state == the state any
decoder restores from the header — packets decode independently and
identically. (Real encoders do the same; the header would otherwise
diverge from the decoder every 64 samples.)

Reference parity note: grailbio/bigslice has no media codecs; this is
part of the multimodal pipeline surface this engine adds (SURVEY §2.4).
"""

from __future__ import annotations

import struct

# IMA ADPCM step table (89 entries) and index adjustment table —
# public-spec constants (IMA ADPCM reference algorithm).
STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767]
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]

PACKET_SAMPLES = 64
PACKET_BYTES = 34


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _step(sample: int, pred: int, idx: int) -> tuple[int, int, int]:
    """One codec step: quantize ``sample`` against state (pred, idx),
    reconstruct exactly as a decoder would, return
    (nibble, new_pred, new_idx). Encoder and decoder share this
    reconstruction, which is what keeps them in lockstep."""
    step = STEP_TABLE[idx]
    delta = sample - pred
    nib = 0
    if delta < 0:
        nib = 8
        delta = -delta
    if delta >= step:
        nib |= 4
        delta -= step
    if delta >= step >> 1:
        nib |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        nib |= 1
    return nib, *_reconstruct(nib, pred, idx)


def _reconstruct(nib: int, pred: int, idx: int) -> tuple[int, int]:
    """Decoder state update for one 4-bit code."""
    step = STEP_TABLE[idx]
    diff = step >> 3
    if nib & 4:
        diff += step
    if nib & 2:
        diff += step >> 1
    if nib & 1:
        diff += step >> 2
    pred = _clamp16(pred - diff if nib & 8 else pred + diff)
    idx = idx + INDEX_TABLE[nib & 7]
    return pred, (0 if idx < 0 else (88 if idx > 88 else idx))


def encode_ima4(samples: list[int]) -> list[bytes]:
    """int16 PCM → list of 34-byte 'ima4' packets (mono). The input is
    zero-padded to a multiple of 64 samples (the format has no partial
    packets; decode + truncation is the caller's round trip)."""
    pred, idx = 0, 0
    pcm = list(samples) + [0] * (-len(samples) % PACKET_SAMPLES)
    packets = []
    for p0 in range(0, len(pcm), PACKET_SAMPLES):
        pred &= ~0x7F              # what the header can carry IS the
        # state both sides continue from (determinism contract above)
        header = struct.pack(">H", ((pred & 0xFFFF) | idx))
        body = bytearray(32)
        for j in range(PACKET_SAMPLES):
            nib, pred, idx = _step(pcm[p0 + j], pred, idx)
            if j & 1:
                body[j >> 1] |= nib << 4      # high nibble: odd sample
            else:
                body[j >> 1] |= nib           # low nibble first
        packets.append(header + bytes(body))
    return packets


def decode_ima4(packets: list[bytes]) -> list[int]:
    """'ima4' packets → int16 PCM. Each packet decodes independently
    from its own header state; corruption raises ValueError."""
    out = []
    for pk in packets:
        if len(pk) != PACKET_BYTES:
            raise ValueError(
                f"corrupt ima4 packet: {len(pk)} bytes != 34")
        h, = struct.unpack(">H", pk[:2])
        idx = h & 0x7F
        if idx > 88:
            raise ValueError(f"corrupt ima4 header: step index {idx}")
        pred = h & 0xFF80
        if pred >= 0x8000:
            pred -= 0x10000        # sign-extend the 9-bit predictor
        for b in pk[2:]:
            for nib in (b & 0x0F, b >> 4):    # low nibble first
                pred, idx = _reconstruct(nib, pred, idx)
                out.append(pred)
    return out
