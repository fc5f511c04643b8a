"""GIF87a/GIF89a codec, stdlib + numpy — the third web-image format
(after PNG and JPEG) a training-data ingest pipeline meets, and the
first ANIMATED one: multi-frame GIFs give frame_sample real frames to
sample instead of its fake byte-slices.

Decode: logical screen descriptor, global/local color tables, LZW
decompression (variable-width codes, clear/EOI, deferred clear),
interlaced row order, multiple image frames composited onto the
canvas honoring frame offsets, graphic-control transparency and
disposal methods 0/1/2 (unspecified/keep/restore-background),
extension-block skip. GIF is LOSSLESS (palette indices round-trip
exactly), so the builder/decoder pair pins content byte-for-byte —
the same exactness contract the PNG path has.

Encode (`make_gif`): palette built from the frames' distinct colors
(<= 256 — the format's own limit), LZW with dictionary reset at 4096
entries, optional interlacing, optional multi-frame animation with
per-frame delay. Deterministic bytes for identical inputs.

Reference parity note: grailbio/bigslice has no media codecs; this is
part of the LLM-pipeline multimodal surface (SURVEY.md §2.4).
"""

from __future__ import annotations

import struct


# ---------------------------------------------------------------------
# LZW (GIF variant: little-endian bit packing, variable code width)


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes((i,)): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for b in indices:
        cand = prefix + bytes((b,))
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # the decoder's table lags the encoder's by one entry (its
            # append for code k reconstructs the encoder's add at
            # k-1), so it widens at len == 1<<width exactly when the
            # encoder's next_code EXCEEDS 1<<width — the standard GIF
            # (late-change) convention
            if next_code > (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes((i,)): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes((b,))
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int,
                max_out: int | None = None) -> bytes:
    """``max_out`` caps the decoded length: with a full 4096-entry
    table each 12-bit code can emit a ~4 KB entry (~2700x
    amplification), so an uncapped decode is a decompression bomb no
    header check can prevent — callers pass the frame's pixel count
    and decoding simply stops there."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0          # bit position
    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes((i,)) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset()
    total_bits = len(data) * 8
    while pos + width <= total_bits:
        byte_i, bit_i = divmod(pos, 8)
        chunk = int.from_bytes(data[byte_i:byte_i + 3], "little")
        code = (chunk >> bit_i) & ((1 << width) - 1)
        pos += width
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW: first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:      # deferred-clear: full table
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW: code out of range")
        out += entry
        prev = entry
        if max_out is not None and len(out) >= max_out:
            return bytes(out[:max_out])
        if len(table) == (1 << width) and width < 12:
            width += 1
    return bytes(out)


# ---------------------------------------------------------------------
# Encoder

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))

# decode-side decompression-bomb guards (mirrors jpeg.MAX_PIXELS): a
# hostile header must not allocate executor-scale canvases or an
# unbounded frame list before any pixel data is read
MAX_PIXELS = 1 << 26
MAX_FRAMES = 4096


def _interlace_order(height: int) -> list[int]:
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, height, step))
    return rows


def make_gif(width: int, height: int, frames: list[bytes], *,
             delay_cs: int = 10, interlace: bool = False,
             loop: bool = True) -> bytes:
    """GIF89a from one or more width*height*3 RGB rasters (lossless:
    builds the palette from the distinct colors, which must be <= 256
    across all frames — the format's own limit). Multiple frames emit
    an animation (full-frame replace, ``delay_cs`` centiseconds per
    frame); ``interlace`` writes the four-pass interlaced row order."""
    if not frames:
        raise ValueError("make_gif: need at least one frame")
    for f in frames:
        if len(f) != width * height * 3:
            raise ValueError("each frame must be width*height*3 bytes")
    palette: dict[bytes, int] = {}
    for f in frames:
        for i in range(0, len(f), 3):
            c = f[i:i + 3]
            if c not in palette:
                palette[c] = len(palette)
    if len(palette) > 256:
        raise ValueError(f"make_gif: {len(palette)} distinct colors "
                         "(GIF palettes hold at most 256)")
    ncolors = max(2, len(palette))
    depth = max(1, (ncolors - 1).bit_length())
    size = 1 << depth
    pal_bytes = bytearray()
    for c, _i in sorted(palette.items(), key=lambda kv: kv[1]):
        pal_bytes += c
    pal_bytes += b"\x00" * (3 * size - len(pal_bytes))

    out = bytearray(b"GIF89a")
    # logical screen descriptor: global color table, depth
    out += struct.pack("<HHBBB", width, height,
                       0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0)
    out += pal_bytes
    if len(frames) > 1 and loop:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in frames:
        if len(frames) > 1:
            # graphic control: delay, no transparency, disposal=1
            out += b"\x21\xf9\x04" + bytes((1 << 2,)) \
                + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
        out += bytes(((0x40 if interlace else 0x00),))   # no local table
        idx = bytearray(width * height)
        for p in range(0, len(f), 3):
            idx[p // 3] = palette[f[p:p + 3]]
        if interlace:
            rows = _interlace_order(height)
            il = bytearray()
            for r in rows:
                il += idx[r * width:(r + 1) * width]
            idx = il
        mcs = max(2, depth)
        out += bytes((mcs,))
        comp = _lzw_encode(bytes(idx), mcs)
        for p in range(0, len(comp), 255):
            chunk = comp[p:p + 255]
            out += bytes((len(chunk),)) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------------
# Decoder


def decode_gif_frames(blob: bytes) -> tuple[int, int, list[bytes]]:
    """GIF -> (width, height, [RGB raster per frame]) with frames
    composited onto the logical screen (offsets, transparency,
    disposal 0/1/2 honored). Corrupt/truncated/hostile input raises
    ValueError only (fuzz-tested; MAX_PIXELS / MAX_FRAMES bound every
    allocation a header can demand)."""
    try:
        return _decode_gif_frames(blob)
    except (IndexError, struct.error) as e:
        raise ValueError(f"corrupt GIF stream: {e}") from e


def _decode_gif_frames(blob: bytes) -> tuple[int, int, list[bytes]]:
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    if w <= 0 or h <= 0 or w * h > MAX_PIXELS:
        raise ValueError(
            f"GIF dimensions {w}x{h} outside the decode limit "
            f"({MAX_PIXELS} px) — corrupt header or decompression bomb")
    import numpy as np
    i = 13
    gpal = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gpal = blob[i:i + 3 * n]
        i += 3 * n
    bgc = np.zeros(3, np.uint8)
    if gpal and bg * 3 + 3 <= len(gpal):
        bgc = np.frombuffer(gpal, np.uint8, 3, bg * 3)
    canvas = np.empty((h, w, 3), np.uint8)
    canvas[:] = bgc
    frames: list[bytes] = []
    transparent: int | None = None
    disposal = 0
    while i < len(blob):
        b0 = blob[i]
        if b0 == 0x3B:                         # trailer
            break
        if b0 == 0x21:                         # extension
            label = blob[i + 1]
            i += 2
            if label == 0xF9 and blob[i] >= 4:  # graphic control
                packed = blob[i + 1]
                disposal = (packed >> 2) & 7
                transparent = blob[i + 4] if packed & 1 else None
            while True:                        # skip/consume sub-blocks
                sz = blob[i]
                i += 1 + sz
                if sz == 0:
                    break
            continue
        if b0 != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b0:02X}")
        fx, fy, fw, fh = struct.unpack_from("<HHHH", blob, i + 1)
        fflags = blob[i + 9]
        i += 10
        pal = gpal
        if fflags & 0x80:                      # local color table
            n = 2 << (fflags & 7)
            pal = blob[i:i + 3 * n]
            i += 3 * n
        if pal is None:
            raise ValueError("GIF frame with no color table")
        mcs = blob[i]
        i += 1
        comp = bytearray()
        while True:
            sz = blob[i]
            i += 1
            comp += blob[i:i + sz]
            i += sz
            if sz == 0:
                break
        if fw * fh > MAX_PIXELS:
            raise ValueError("GIF frame larger than the decode limit")
        if len(frames) >= MAX_FRAMES:
            raise ValueError(
                f"GIF with more than {MAX_FRAMES} frames — refusing "
                f"an unbounded frame list")
        idx = _lzw_decode(bytes(comp), mcs, max_out=fw * fh)
        if len(idx) < fw * fh:
            raise ValueError("GIF frame pixel data underrun")
        if fflags & 0x40:                      # interlaced
            de = bytearray(fw * fh)
            for src_r, dst_r in enumerate(_interlace_order(fh)):
                de[dst_r * fw:(dst_r + 1) * fw] = \
                    idx[src_r * fw:(src_r + 1) * fw]
            idx = bytes(de)
        # vectorized composite of the frame's visible rectangle (the
        # per-pixel Python loop this replaces cost seconds per frame
        # near the pixel cap); the transparent index is legally
        # allowed to lie OUTSIDE the palette, so range-check only the
        # opaque indices
        pal_arr = np.frombuffer(pal, np.uint8)[
            :len(pal) - len(pal) % 3].reshape(-1, 3)
        idx_arr = np.frombuffer(idx, np.uint8, fw * fh).reshape(fh, fw)
        vis_h = max(0, min(fh, h - fy))
        vis_w = max(0, min(fw, w - fx))
        if vis_h and vis_w:
            sub = idx_arr[:vis_h, :vis_w]
            region = canvas[fy:fy + vis_h, fx:fx + vis_w]
            if transparent is None:
                if int(sub.max(initial=0)) >= len(pal_arr):
                    raise ValueError("GIF index outside color table")
                region[:] = pal_arr[sub]
            else:
                m = sub != transparent
                vals = sub[m]
                if vals.size and int(vals.max()) >= len(pal_arr):
                    raise ValueError("GIF index outside color table")
                region[m] = pal_arr[vals]
        frames.append(canvas.tobytes())
        if disposal == 2:
            # restore-to-BACKGROUND (GIF89a): the frame's rect resets
            # to the background color — NOT to the prior content
            # (that is disposal 3, restore-to-previous)
            canvas[fy:fy + vis_h, fx:fx + vis_w] = bgc
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF with no image frames")
    return w, h, frames


def decode_gif(blob: bytes) -> tuple[int, int, bytes]:
    """GIF -> (width, height, RGB raster) of the FIRST frame — the
    decode_image contract for still images."""
    w, h, frames = decode_gif_frames(blob)
    return w, h, frames[0]
