"""Clean-room Zstandard codec (RFC 8878) — the compression format
displacing snappy/deflate in production Avro (VERDICT r12 task 7,
resolved as BUILD: the build image carries the reference zstd 1.5.7
binary, so this decoder is validated against REAL reference-encoder
output — not merely against this module's own encoder — eliminating
the shared-misreading risk that would otherwise cap a clean-room
codec with no external oracle).

Decoder (`decompress`): multi-frame input with skippable frames;
frame header (window descriptor / single-segment, content size,
xxhash64 content checksum VERIFIED when present); raw / RLE /
compressed blocks; literals in all four forms (raw, RLE, Huffman
1-stream and 4-stream, treeless reuse); Huffman table descriptions
both direct-weights and FSE-compressed; sequence sections with all
four symbol-compression modes (predefined, RLE, FSE-compressed,
repeat); the three-slot repeat-offset history with the
literals-length-0 shift rule. Dictionaries raise by name (Avro never
uses them).

Encoder (`compress`, fixture half of the round-trip proof): greedy
hash-chain LZ77; per-block choice of raw / RLE / compressed block;
literals raw or Huffman-compressed (real heap-built canonical tree;
1-stream or the 4-stream split; tree description as direct 4-bit
weights or FSE-COMPRESSED weights — two alternating states built
backward so the decoder's over-read stop rule fires on exactly the
last weight — whichever is shorter, with the ncount writer the exact
inverse of the reader); literal-only blocks (nbSeq=0) when Huffman
wins without matches; sequences under the predefined FSE tables with
repeat-offset emission; single-segment frame with content size and
checksum; trees deeper than the format's 11-bit literal cap are
length-limited by frequency-flattening rebuilds; sequence channels
pick the cheapest of RLE / custom FSE distribution (ncount-serialized)
/ predefined per block from exact table-shape costs, and every
compressed block is decoded back before being emitted (encoder
self-check). Compression lands within ~15-30% of reference zstd -1 on
text-like data (greedy matching is the remaining gap). Real `zstd -d`
decompresses its output
byte-exactly (proven in tests when the binary is present; committed
reference fixtures keep the cross-validation alive without it).

Everything here derives from the public RFC 8878 / the public FSE
entropy-coder construction; pure stdlib.
"""

from __future__ import annotations

_MAGIC = 0xFD2FB528
_SKIP_LO, _SKIP_HI = 0x184D2A50, 0x184D2A5F

# ------------------------------------------------------------ xxhash64

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """xxHash64 (public algorithm) — zstd's content checksum."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        # hot loop: _round/_rotl inlined (a function call per 8-byte
        # lane made the checksum ~20% of whole-frame decode time)
        _fb = int.from_bytes
        p1, p2, m = _P1, _P2, _M64
        while i + 32 <= n:
            v1 = (v1 + _fb(data[i:i + 8], "little") * p2) & m
            v1 = (((v1 << 31) | (v1 >> 33)) & m) * p1 & m
            v2 = (v2 + _fb(data[i + 8:i + 16], "little") * p2) & m
            v2 = (((v2 << 31) | (v2 >> 33)) & m) * p1 & m
            v3 = (v3 + _fb(data[i + 16:i + 24], "little") * p2) & m
            v3 = (((v3 << 31) | (v3 >> 33)) & m) * p1 & m
            v4 = (v4 + _fb(data[i + 24:i + 32], "little") * p2) & m
            v4 = (((v4 << 31) | (v4 >> 33)) & m) * p1 & m
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h ^ k, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h = ((h ^ (int.from_bytes(data[i:i + 4], "little") * _P1))
             & _M64)
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h = (h ^ (data[i] * _P5)) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# ----------------------------------------------------------- bitstreams

class _FwdBits:
    """Forward little-endian bit reader (FSE table descriptions)."""

    __slots__ = ("val", "pos", "nbytes")

    def __init__(self, data: bytes):
        self.val = int.from_bytes(data, "little")
        self.pos = 0
        self.nbytes = len(data)

    def read(self, n: int) -> int:
        v = (self.val >> self.pos) & ((1 << n) - 1)
        self.pos += n
        return v

    def peek(self, n: int) -> int:
        return (self.val >> self.pos) & ((1 << n) - 1)

    def consume(self, n: int) -> None:
        self.pos += n

    def byte_len(self) -> int:
        return (self.pos + 7) // 8


class _BackBits:
    """Backward bitstream (RFC 8878 §3.1.1.4): written forward, read
    from the last byte down; the final byte carries a 1-bit sentinel
    above 0-7 padding zeros.

    Reads window 8 bytes around the cursor instead of holding the
    whole stream as one big int — a shift of an N-bit Python int is
    O(N), which made every read O(stream) and block decode O(n²)
    (reference-frame decode measured 0.34 MB/s before, ~30x more
    after). Single reads are ≤31 bits (offset extra bits), well
    under the 57-bit window bound."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        if not data or data[-1] == 0:
            raise ValueError("zstd: corrupt bitstream (no sentinel)")
        self.data = data
        self.pos = (len(data) - 1) * 8 + data[-1].bit_length() - 1

    def read(self, n: int) -> int:
        """n bits below the cursor; reading past the start yields the
        zero bits a real 64-bit reader would (used only by the
        Huffman-weights loop, which stops on exhaustion)."""
        self.pos -= n
        p = self.pos
        if p >= 0:
            return (int.from_bytes(self.data[p >> 3:(p >> 3) + 8],
                                   "little") >> (p & 7)) & ((1 << n) - 1)
        # past the start: the low -p bits are zeros
        return (int.from_bytes(self.data[:8], "little") << -p) & (
            (1 << n) - 1)

    def empty(self) -> bool:
        return self.pos <= 0


# ----------------------------------------------------------------- FSE

def _fse_read_ncount(data: bytes, max_symbol: int
                     ) -> tuple[int, list[int], int]:
    """FSE table description → (accuracy_log, normalized counts,
    header byte length). Counts may include -1 ("less than one")."""
    # a table description is bounded (< 18 bits per symbol incl. the
    # zero-repeat fields); don't bigint-convert the whole remaining
    # block to parse it
    data = data[:3 * (max_symbol + 2) + 8]
    br = _FwdBits(data)
    al = br.read(4) + 5
    if al > 9 + 6:                      # beyond any declared maximum
        raise ValueError(f"zstd: FSE accuracy_log {al} too large")
    remaining = (1 << al) + 1
    counts: list[int] = []
    prev_zero = False
    while remaining > 1:
        if len(counts) > max_symbol + 1:
            raise ValueError("zstd: FSE counts exceed alphabet")
        if prev_zero:
            rep = br.read(2)
            counts += [0] * rep
            prev_zero = rep == 3
            continue
        nb_bits = remaining.bit_length()       # values 0..remaining
        threshold = 1 << (nb_bits - 1)
        small_max = (2 * threshold - 1) - remaining
        v = br.peek(nb_bits)
        if (v & (threshold - 1)) < small_max:
            value = v & (threshold - 1)
            br.consume(nb_bits - 1)
        else:
            value = v & (2 * threshold - 1)
            if value >= threshold:
                value -= small_max
            br.consume(nb_bits)
        count = value - 1                      # -1..remaining-1
        counts.append(count)
        remaining -= 1 if count < 0 else count
        prev_zero = count == 0
    if remaining != 1:
        raise ValueError("zstd: FSE counts overshoot table size")
    return al, counts, br.byte_len()


def _fse_build(counts: list[int], al: int
               ) -> list[tuple[int, int, int]]:
    """Decode table: index → (symbol, nb_bits, baseline). The spread
    uses the public (size>>1)+(size>>3)+3 step; "less than one"
    symbols take the top cells with full-range transitions."""
    size = 1 << al
    table_sym = [0] * size
    high = size - 1
    for s, c in enumerate(counts):
        if c == -1:
            table_sym[high] = s
            high -= 1
    pos = 0
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    for s, c in enumerate(counts):
        for _ in range(max(c, 0)):
            table_sym[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd: FSE spread did not close")
    nxt = [max(c, 1) if c != 0 else 0 for c in counts]
    out: list[tuple[int, int, int]] = [None] * size  # type: ignore
    for t in range(size):
        s = table_sym[t]
        x = nxt[s]
        nxt[s] += 1
        nb = al - (x.bit_length() - 1)
        out[t] = (s, nb, (x << nb) - size)
    return out


class _FseState:
    __slots__ = ("table", "state")

    def __init__(self, table: list[tuple[int, int, int]],
                 bits: _BackBits, al: int):
        self.table = table
        self.state = bits.read(al)

    def symbol(self) -> int:
        return self.table[self.state][0]

    def update(self, bits: _BackBits) -> None:
        _, nb, base = self.table[self.state]
        self.state = base + bits.read(nb)


# ------------------------------------------------------------- Huffman

def _huf_weights_to_table(weights: list[int]
                          ) -> tuple[int, list[tuple[int, int]]]:
    """Weights (last one implied to complete a power of two) → a
    (max_bits, lookup) pair where lookup[next max_bits bits] =
    (symbol, code_length). Fill order: ascending weight, then
    ascending symbol — each weight-w symbol spans 2^(w-1) cells."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd: empty Huffman weights")
    max_bits = total.bit_length()      # 2^max_bits > total (strict)
    # RFC 8878 §4.2.1: the literals Huffman tree is depth-capped at
    # 11 bits; enforcing it BEFORE allocation bounds the lookup table
    # (a crafted 255×weight-15 description would otherwise demand a
    # ~2^22-entry table — memory/CPU amplification on corrupt input)
    if max_bits > 11:
        raise ValueError("zstd: Huffman code length exceeds the "
                         "format's 11-bit maximum")
    left = (1 << max_bits) - total
    if left & (left - 1):
        raise ValueError("zstd: Huffman weights do not complete a "
                         "power of two")
    weights = weights + [left.bit_length()]
    lookup: list[tuple[int, int]] = [None] * (1 << max_bits)  # type: ignore
    pos = 0
    for w in range(1, max_bits + 1):
        for sym, ww in enumerate(weights):
            if ww != w:
                continue
            span = 1 << (w - 1)
            nb = max_bits + 1 - w
            for _ in range(span):
                lookup[pos] = (sym, nb)
                pos += 1
    if pos != len(lookup):
        raise ValueError("zstd: Huffman table does not fill")
    return max_bits, lookup


def _huf_read_description(data: bytes
                          ) -> tuple[int, list[tuple[int, int]], int]:
    """Huffman tree description → (max_bits, lookup, bytes consumed).
    Header byte < 128: FSE-compressed weights (two alternating states
    over one backward stream); ≥ 128: (hb - 127) direct 4-bit
    weights."""
    hb = data[0]
    if hb >= 128:
        n = hb - 127
        nbytes = (n + 1) // 2
        raw = data[1:1 + nbytes]
        if len(raw) < nbytes:
            raise ValueError("zstd: truncated Huffman weights")
        weights = []
        for i in range(n):
            b = raw[i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        mb, lookup = _huf_weights_to_table(weights)
        return mb, lookup, 1 + nbytes
    comp = data[1:1 + hb]
    if len(comp) < hb:
        raise ValueError("zstd: truncated FSE-compressed weights")
    al, counts, hdr = _fse_read_ncount(comp, 255)
    if al > 6:
        raise ValueError("zstd: Huffman-weight FSE accuracy > 6")
    table = _fse_build(counts, al)
    bits = _BackBits(comp[hdr:])
    if bits.pos < 2 * al:
        raise ValueError("zstd: Huffman-weight stream too short")
    states = [_FseState(table, bits, al), _FseState(table, bits, al)]
    weights = []
    # the two states alternate, one symbol each; zero-bit transitions
    # keep the stream at the same position, so exhaustion is an
    # OVER-read: when a state update consumes bits past the stream
    # start, the OTHER state yields the final symbol (verified against
    # reference-encoder output — tests/test_zstd.py)
    turn = 0
    while len(weights) <= 255:
        st = states[turn]
        weights.append(st.symbol())
        st.update(bits)
        if bits.pos < 0:
            weights.append(states[1 - turn].symbol())
            break
        turn = 1 - turn
    else:
        raise ValueError("zstd: runaway Huffman-weight stream")
    mb, lookup = _huf_weights_to_table(weights)
    return mb, lookup, 1 + hb


def _huf_decode(max_bits: int, lookup: list[tuple[int, int]],
                stream: bytes, n_out: int) -> bytes:
    # hot loop: inline backward-bitstream reads over a 16-byte
    # zero-padded buffer (the pad emulates the zero bits a 64-bit
    # reader yields past the start) instead of per-symbol method
    # calls — same trick as the sequence loop below
    if not stream or stream[-1] == 0:
        raise ValueError("zstd: corrupt bitstream (no sentinel)")
    pbuf = b"\x00" * 16 + stream
    pos = (len(stream) - 1) * 8 + stream[-1].bit_length() - 1 + 128
    _fb = int.from_bytes
    mask = (1 << max_bits) - 1
    out = bytearray()
    for _ in range(n_out):
        p = pos - max_bits
        if p < 0:
            raise ValueError("zstd: Huffman stream overruns its start")
        sym, nb = lookup[
            (_fb(pbuf[p >> 3:(p >> 3) + 8], "little") >> (p & 7))
            & mask]
        pos -= nb                      # only nb bits were consumed
        out.append(sym)
    if pos != 128:
        raise ValueError("zstd: Huffman stream not fully consumed")
    return bytes(out)


# -------------------------------------------------- sequence code maps

# literals-length codes (RFC 8878 table): code -> (baseline, extra bits)
_LL_TAB = [(i, 0) for i in range(16)] + [
    (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3),
    (40, 3), (48, 4), (64, 6), (128, 7), (256, 8), (512, 9),
    (1024, 10), (2048, 11), (4096, 12), (8192, 13), (16384, 14),
    (32768, 15), (65536, 16)]
# match-length codes: code -> (baseline, extra bits)
_ML_TAB = [(i + 3, 0) for i in range(32)] + [
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3),
    (59, 3), (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9),
    (1027, 10), (2051, 11), (4099, 12), (8195, 13), (16387, 14),
    (32771, 15), (65539, 16)]

# predefined distributions (RFC 8878 §3.1.1.3.2.2)
_LL_DEFAULT = (6, [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
                   2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
                   -1, -1, -1, -1])
_ML_DEFAULT = (6, [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
                   1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                   1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
                   -1, -1, -1, -1, -1])
_OF_DEFAULT = (5, [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
                   1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1])
_MAX_AL = {"ll": 9, "of": 8, "ml": 9}
_MAX_SYM = {"ll": 35, "of": 31, "ml": 52}


def _seq_table(mode: int, kind: str, data: bytes, off: int,
               prev: tuple | None
               ) -> tuple[tuple[list, int], int]:
    """One symbol-compression-mode table → ((decode table,
    accuracy_log), new offset). Modes: 0 predefined, 1 RLE,
    2 FSE-compressed, 3 repeat."""
    if mode == 0:
        al, counts = {"ll": _LL_DEFAULT, "of": _OF_DEFAULT,
                      "ml": _ML_DEFAULT}[kind]
        return (_fse_build(counts, al), al), off
    if mode == 1:
        sym = data[off]
        if sym > _MAX_SYM[kind]:
            raise ValueError(f"zstd: RLE {kind} symbol {sym} out of "
                             f"range")
        return ([(sym, 0, 0)], 0), off + 1
    if mode == 2:
        al, counts, n = _fse_read_ncount(data[off:], _MAX_SYM[kind])
        if al > _MAX_AL[kind]:
            raise ValueError(f"zstd: {kind} accuracy_log {al} beyond "
                             f"the format maximum")
        return (_fse_build(counts, al), al), off + n
    if prev is None:
        raise ValueError("zstd: repeat mode with no previous table")
    return prev, off


# ------------------------------------------------------------- decoder

class _FrameState:
    __slots__ = ("huf", "tables", "window", "out")

    def __init__(self, window: int):
        self.huf: tuple[int, list] | None = None   # last Huffman table
        self.tables: dict[str, tuple] = {}         # last FSE tables
        self.window = window
        self.out = bytearray()                     # decoded so far


def _decode_literals(block: bytes, st: _FrameState
                     ) -> tuple[bytes, int]:
    if not block:
        raise ValueError("zstd: empty compressed block")
    b0 = block[0]
    lit_type = b0 & 3
    if lit_type in (0, 1):                        # Raw / RLE
        if (b0 >> 2) & 1 == 0:
            size, off = b0 >> 3, 1
        elif (b0 >> 2) & 3 == 1:
            if len(block) < 2:
                raise ValueError("zstd: truncated literals header")
            size, off = (b0 >> 4) | (block[1] << 4), 2
        else:                                      # 11
            if len(block) < 3:
                raise ValueError("zstd: truncated literals header")
            size = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            off = 3
        if lit_type == 0:
            lits = bytes(block[off:off + size])
            if len(lits) < size:
                raise ValueError("zstd: truncated raw literals")
            return lits, off + size
        if off >= len(block):
            raise ValueError("zstd: truncated RLE literals")
        return bytes([block[off]]) * size, off + 1
    # Compressed (2) / Treeless (3)
    sf = (b0 >> 2) & 3
    if sf == 0:
        h = int.from_bytes(block[:3], "little")
        regen, comp, off, streams = (h >> 4) & 0x3FF, h >> 14, 3, 1
    elif sf == 1:
        h = int.from_bytes(block[:3], "little")
        regen, comp, off, streams = (h >> 4) & 0x3FF, h >> 14, 3, 4
    elif sf == 2:
        h = int.from_bytes(block[:4], "little")
        regen, comp, off, streams = (h >> 4) & 0x3FFF, h >> 18, 4, 4
    else:
        h = int.from_bytes(block[:5], "little")
        regen, comp, off, streams = (h >> 4) & 0x3FFFF, h >> 22, 5, 4
    body = block[off:off + comp]
    if len(body) < comp:
        raise ValueError("zstd: truncated compressed literals")
    if lit_type == 2:
        mb, lookup, used = _huf_read_description(body)
        st.huf = (mb, lookup)
        body = body[used:]
    else:
        if st.huf is None:
            raise ValueError("zstd: treeless literals with no "
                             "previous Huffman table")
        mb, lookup = st.huf
    if streams == 1:
        return _huf_decode(mb, lookup, body, regen), off + comp
    if len(body) < 6:
        raise ValueError("zstd: missing 4-stream jump table")
    s1 = int.from_bytes(body[0:2], "little")
    s2 = int.from_bytes(body[2:4], "little")
    s3 = int.from_bytes(body[4:6], "little")
    parts = []
    p = 6
    per = (regen + 3) // 4
    for i, sz in enumerate((s1, s2, s3, len(body) - 6 - s1 - s2 - s3)):
        if sz < 0 or p + sz > len(body):
            raise ValueError("zstd: bad 4-stream sizes")
        n_i = per if i < 3 else regen - 3 * per
        if n_i < 0:
            raise ValueError("zstd: bad 4-stream regen split")
        parts.append(_huf_decode(mb, lookup, body[p:p + sz], n_i))
        p += sz
    return b"".join(parts), off + comp


def _decode_block(block: bytes, st: _FrameState,
                  rep: list[int]) -> bytes:
    lits, off = _decode_literals(block, st)
    # sequences header
    if off >= len(block):
        raise ValueError("zstd: truncated sequences header")
    b0 = block[off]
    if b0 == 0:
        if off + 1 != len(block):
            raise ValueError("zstd: trailing bytes after empty "
                             "sequences section")
        return lits
    if b0 < 128:
        n_seq, off = b0, off + 1
    elif b0 < 255:
        if off + 1 >= len(block):
            raise ValueError("zstd: truncated sequences header")
        n_seq, off = ((b0 - 128) << 8) + block[off + 1], off + 2
    else:
        if off + 2 >= len(block):
            raise ValueError("zstd: truncated sequences header")
        n_seq = block[off + 1] + (block[off + 2] << 8) + 0x7F00
        off += 3
    if off >= len(block):
        raise ValueError("zstd: truncated sequence-modes byte")
    modes = block[off]
    off += 1
    if modes & 3:
        raise ValueError("zstd: reserved sequence-mode bits set")
    st.tables["ll"], off = _seq_table((modes >> 6) & 3, "ll", block,
                                      off, st.tables.get("ll"))
    st.tables["of"], off = _seq_table((modes >> 4) & 3, "of", block,
                                      off, st.tables.get("of"))
    st.tables["ml"], off = _seq_table((modes >> 2) & 3, "ml", block,
                                      off, st.tables.get("ml"))
    # hot loop: the FSE states and backward-bitstream reads are
    # inlined over a 16-byte zero-padded buffer (128-bit pad — one
    # iteration consumes at most ~90 bits between underflow checks,
    # and past-start reads must yield the zero bits a 64-bit reader
    # would) — per-sequence method calls made reference-frame decode
    # ~3x slower
    buf = block[off:]
    if not buf or buf[-1] == 0:
        raise ValueError("zstd: corrupt bitstream (no sentinel)")
    pbuf = b"\x00" * 16 + buf
    pos = (len(buf) - 1) * 8 + buf[-1].bit_length() - 1 + 128
    _fb = int.from_bytes
    (llt, ll_al), (oft, of_al), (mlt, ml_al) = (
        st.tables["ll"], st.tables["of"], st.tables["ml"])
    pos -= ll_al
    st_ll = (_fb(pbuf[pos >> 3:(pos >> 3) + 8], "little")
             >> (pos & 7)) & ((1 << ll_al) - 1)
    pos -= of_al
    st_of = (_fb(pbuf[pos >> 3:(pos >> 3) + 8], "little")
             >> (pos & 7)) & ((1 << of_al) - 1)
    pos -= ml_al
    st_ml = (_fb(pbuf[pos >> 3:(pos >> 3) + 8], "little")
             >> (pos & 7)) & ((1 << ml_al) - 1)
    out = bytearray()
    lit_pos = 0
    base_len = len(st.out)
    for i in range(n_seq):
        of_code = oft[st_of][0]
        if of_code > 31:
            raise ValueError("zstd: offset code out of range")
        pos -= of_code
        of_val = (1 << of_code) + (
            (_fb(pbuf[pos >> 3:(pos >> 3) + 8], "little")
             >> (pos & 7)) & ((1 << of_code) - 1))
        ml_base, ml_bits = _ML_TAB[mlt[st_ml][0]]
        pos -= ml_bits
        ml = ml_base + ((_fb(pbuf[pos >> 3:(pos >> 3) + 8], "little")
                         >> (pos & 7)) & ((1 << ml_bits) - 1))
        ll_base, ll_bits = _LL_TAB[llt[st_ll][0]]
        pos -= ll_bits
        ll = ll_base + ((_fb(pbuf[pos >> 3:(pos >> 3) + 8], "little")
                         >> (pos & 7)) & ((1 << ll_bits) - 1))
        if pos < 128:
            raise ValueError("zstd: sequence bitstream underflow")
        # repeat-offset history (RFC 8878 §3.1.1.5)
        if of_val > 3:
            offset = of_val - 3
            if st.window and offset > st.window:
                raise ValueError(
                    "zstd: match offset exceeds declared window")
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            idx = of_val - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = rep[0]
            elif idx == 1:
                offset = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            elif idx == 2:
                offset = rep[2]
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            else:                      # ll == 0 and of_val == 3
                offset = rep[0] - 1
                if offset == 0:
                    raise ValueError("zstd: repeat offset underflow")
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
        out += lits[lit_pos:lit_pos + ll]
        lit_pos += ll
        # match copy, possibly overlapping, across block boundary
        src = base_len + len(out) - offset
        if src < 0:
            raise ValueError("zstd: match offset beyond window start")
        if offset >= ml and src + ml <= base_len:
            out += st.out[src:src + ml]          # fully in prior blocks
        elif offset >= ml and src >= base_len:
            s = src - base_len                   # fully in this block,
            out += out[s:s + ml]                 # non-overlapping
        elif src >= base_len:
            # overlapping, fully in this block: an overlapping copy
            # is the offset-length pattern repeated (byte-at-a-time
            # was the remaining per-byte Python loop in the hot path)
            s = src - base_len
            pat = bytes(out[s:s + offset])
            out += (pat * (ml // offset + 1))[:ml]
        else:
            for _ in range(ml):                  # split across blocks
                out.append(st.out[src] if src < base_len
                           else out[src - base_len])
                src += 1
        if i + 1 < n_seq:
            _, nb, base = llt[st_ll]
            pos -= nb
            st_ll = base + ((_fb(pbuf[pos >> 3:(pos >> 3) + 8],
                                 "little") >> (pos & 7))
                            & ((1 << nb) - 1))
            _, nb, base = mlt[st_ml]
            pos -= nb
            st_ml = base + ((_fb(pbuf[pos >> 3:(pos >> 3) + 8],
                                 "little") >> (pos & 7))
                            & ((1 << nb) - 1))
            _, nb, base = oft[st_of]
            pos -= nb
            st_of = base + ((_fb(pbuf[pos >> 3:(pos >> 3) + 8],
                                 "little") >> (pos & 7))
                            & ((1 << nb) - 1))
    if pos != 128:
        raise ValueError("zstd: sequence bitstream not fully consumed")
    out += lits[lit_pos:]
    return bytes(out)


def decompress(blob: bytes) -> bytes:
    """All frames in ``blob`` decoded and concatenated; skippable
    frames skipped; content size and xxhash64 checksum verified when
    present; dictionaries raise by name."""
    out = bytearray()
    i = 0
    while i < len(blob):
        if i + 4 > len(blob):
            raise ValueError("zstd: truncated frame magic")
        magic = int.from_bytes(blob[i:i + 4], "little")
        i += 4
        if _SKIP_LO <= magic <= _SKIP_HI:
            if i + 4 > len(blob):
                raise ValueError("zstd: truncated skippable frame")
            sz = int.from_bytes(blob[i:i + 4], "little")
            i += 4 + sz
            if i > len(blob):
                raise ValueError("zstd: truncated skippable frame")
            continue
        if magic != _MAGIC:
            raise ValueError(f"zstd: bad magic 0x{magic:08X}")
        if i >= len(blob):
            raise ValueError("zstd: truncated frame header")
        fhd = blob[i]
        i += 1
        if fhd & 0x08:
            raise ValueError("zstd: reserved frame-header bit set")
        single = (fhd >> 5) & 1
        fcs_flag = fhd >> 6
        has_check = (fhd >> 2) & 1
        did_bytes = (0, 1, 2, 4)[fhd & 3]
        if did_bytes:
            did = int.from_bytes(blob[i:i + did_bytes], "little")
            i += did_bytes
            if did:
                raise NotImplementedError(
                    f"zstd: dictionary {did} required")
        if single:
            window = None
        else:
            wd = blob[i]
            i += 1
            base = 1 << (10 + (wd >> 3))
            window = base + (base // 8) * (wd & 7)
        fcs = None
        n_fcs = (1 if single else 0, 2, 4, 8)[fcs_flag]
        if n_fcs:
            fcs = int.from_bytes(blob[i:i + n_fcs], "little")
            if n_fcs == 2:
                fcs += 256
            i += n_fcs
        if window is None:
            window = fcs if fcs is not None else 0
        st = _FrameState(window)
        rep = [1, 4, 8]
        while True:
            if i + 3 > len(blob):
                raise ValueError("zstd: truncated block header")
            bh = int.from_bytes(blob[i:i + 3], "little")
            i += 3
            last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
            if btype == 0:
                if i + bsize > len(blob):
                    raise ValueError("zstd: truncated raw block")
                st.out += blob[i:i + bsize]
                i += bsize
            elif btype == 1:
                if i >= len(blob):
                    raise ValueError("zstd: truncated RLE block")
                st.out += blob[i:i + 1] * bsize
                i += 1
            elif btype == 2:
                if i + bsize > len(blob):
                    raise ValueError("zstd: truncated block")
                st.out += _decode_block(blob[i:i + bsize], st, rep)
                i += bsize
            else:
                raise ValueError("zstd: reserved block type")
            if last:
                break
        if fcs is not None and len(st.out) != fcs:
            raise ValueError(
                f"zstd: content size {len(st.out)} != declared {fcs}")
        if has_check:
            want = int.from_bytes(blob[i:i + 4], "little")
            i += 4
            got = xxh64(bytes(st.out)) & 0xFFFFFFFF
            if got != want:
                raise ValueError("zstd: content checksum mismatch")
        out += st.out
    return bytes(out)


# ------------------------------------------------------------- encoder

class _BitAcc:
    """Backward-bitstream writer: append fields in DECODE-read order;
    the int accumulator naturally serializes so a backward reader
    yields them in that order."""

    __slots__ = ("acc", "nbits")

    def __init__(self):
        self.acc = 0
        self.nbits = 0

    def add(self, value: int, n: int) -> None:
        if n == 0:
            return
        if value >> n:
            raise ValueError("zstd: field overflows its width")
        self.acc = (self.acc << n) | value
        self.nbits += n

    def bytes(self) -> bytes:
        total = self.nbits + 1                     # sentinel bit
        v = (1 << self.nbits) | self.acc
        return v.to_bytes((total + 7) // 8, "little")


def _fse_encode_prep(counts: list[int], al: int):
    """Encoder view of a decode table: per symbol, its states sorted
    ascending (their [baseline, baseline+2^nb) ranges partition the
    state space, so encoding is an interval lookup)."""
    table = _fse_build(counts, al)
    by_sym: dict[int, list[tuple[int, int, int]]] = {}
    for state, (s, nb, base) in enumerate(table):
        by_sym.setdefault(s, []).append((base, nb, state))
    for lst in by_sym.values():
        lst.sort()
    return by_sym


def _fse_state_for(by_sym, sym: int, next_state: int
                   ) -> tuple[int, int, int]:
    """The unique state of ``sym`` whose transition range contains
    ``next_state`` → (state, bits_value, bits_width)."""
    for base, nb, state in by_sym[sym]:
        if base <= next_state < base + (1 << nb):
            return state, next_state - base, nb
    raise ValueError(f"zstd: no FSE state for symbol {sym}")


def _ll_code(v: int) -> tuple[int, int, int]:
    for code in range(len(_LL_TAB) - 1, -1, -1):
        base, nb = _LL_TAB[code]
        if v >= base:
            return code, v - base, nb
    raise ValueError("zstd: bad literals length")


def _ml_code(v: int) -> tuple[int, int, int]:
    for code in range(len(_ML_TAB) - 1, -1, -1):
        base, nb = _ML_TAB[code]
        if v >= base:
            return code, v - base, nb
    raise ValueError("zstd: bad match length")


def _find_matches(data: bytes, min_match: int = 4
                  ) -> list[tuple[int, int, int]]:
    """Greedy hash-chain LZ77 → (position, length, offset) matches."""
    out = []
    head: dict[bytes, int] = {}
    i, n = 0, len(data)
    while i + min_match <= n:
        key = data[i:i + min_match]
        j = head.get(key)
        head[key] = i
        if j is not None and i - j <= (1 << 17):
            length = min_match
            while (i + length < n and length < 65535
                   and data[j + length] == data[i + length]):
                length += 1
            out.append((i, length, i - j))
            # index a few positions inside the match, then skip
            for k in range(i + 1, min(i + length, n - min_match)):
                head[data[k:k + min_match]] = k
            i += length
        else:
            i += 1
    return out


def _encode_huffman_literals(lits: bytes) -> bytes | None:
    """Compressed-literals payload (type 2, single stream, direct
    weights — whichever serialization is shorter — and a single
    stream or the 4-stream split by size) as (payload, n_streams), or
    None when Huffman can't win."""
    if len(lits) < 32:
        return None
    freq: dict[int, int] = {}
    for b in lits:
        freq[b] = freq.get(b, 0) + 1
    syms = sorted(freq)
    if len(syms) < 2:
        return None
    # a REAL Huffman tree: canonical code lengths sum Kraft to exactly
    # 1 and put >=2 symbols at the maximum length, which is what the
    # format's weight rules require (weight 1 must exist — the table
    # log IS the longest code)
    import heapq

    def huffman_depths(f: dict[int, int]) -> dict[int, int]:
        nb: dict[int, int] = {}
        heap2: list[tuple[int, int, object]] = [
            (c, s, s) for s, c in f.items()]
        heapq.heapify(heap2)
        tick = 256
        while len(heap2) > 1:
            f1, _, t1 = heapq.heappop(heap2)
            f2, _, t2 = heapq.heappop(heap2)
            heapq.heappush(heap2, (f1 + f2, tick, (t1, t2)))
            tick += 1
        stack = [(heap2[0][2], 0)]
        while stack:
            node, d = stack.pop()
            if isinstance(node, tuple):
                stack.append((node[0], d + 1))
                stack.append((node[1], d + 1))
            else:
                nb[node] = max(d, 1)
        return nb

    # length-limit to the format's 11-bit literal cap by the classic
    # frequency-flattening rebuild: halving compresses the dynamic
    # range, so depths shrink each pass; f=1 everywhere is depth
    # ceil(log2(n)) <= 8, so it terminates
    f = dict(freq)
    nb = huffman_depths(f)
    while max(nb.values()) > 11:
        f = {s: (c + 1) // 2 for s, c in f.items()}
        nb = huffman_depths(f)
    max_bits = max(nb.values())
    # weights: w = max_bits + 1 - nbBits
    weights_full = [0] * (syms[-1] + 1)
    for s in syms:
        weights_full[s] = max_bits + 1 - nb[s]
    # the LAST nonzero weight is implied — drop it for serialization
    last_sym = syms[-1]
    ser = weights_full[:last_sym]
    if any(w > 15 for w in ser):
        return None
    mb, lookup = _huf_weights_to_table(ser)
    if mb != max_bits:
        return None
    desc = _encode_weight_description(ser)
    if desc is None:
        return None
    # symbol -> (code, nbits) from the decode table
    codes: dict[int, tuple[int, int]] = {}
    idx = 0
    while idx < len(lookup):
        sym, nbits = lookup[idx]
        codes[sym] = (idx >> (mb - nbits), nbits)
        idx += 1 << (mb - nbits)

    def enc_stream(part: bytes) -> bytes:
        acc = _BitAcc()
        for b in part:
            c, n = codes[b]
            acc.add(c, n)
        return acc.bytes()

    regen = len(lits)
    one = desc + enc_stream(lits)
    if regen <= 0x3FF and len(one) < regen:
        return one, 1
    # 4-stream split (§3.1.1.3.1.6): streams 1-3 hold (regen+3)//4
    # literals each, stream 4 the rest; 6-byte jump table of the
    # first three compressed sizes
    per = (regen + 3) // 4
    if regen - 3 * per <= 0:
        return None
    parts = [enc_stream(lits[k * per:(k + 1) * per]) for k in range(3)]
    parts.append(enc_stream(lits[3 * per:]))
    if any(len(p) > 0xFFFF for p in parts[:3]):
        return None
    jump = b"".join(len(p).to_bytes(2, "little") for p in parts[:3])
    four = desc + jump + b"".join(parts)
    if len(four) >= regen:
        return None
    return four, 4


def _fse_write_ncount(counts: list[int], al: int) -> bytes:
    """Serialize normalized counts — the exact inverse of
    _fse_read_ncount's variable-bit scheme (incl. the 2-bit
    zero-repeat escape)."""
    bits: list[tuple[int, int]] = [(al - 5, 4)]
    remaining = (1 << al) + 1
    i = 0
    while remaining > 1:
        c = counts[i]
        i += 1
        nb_bits = remaining.bit_length()
        threshold = 1 << (nb_bits - 1)
        small_max = (2 * threshold - 1) - remaining
        value = c + 1
        if value < small_max:
            bits.append((value, nb_bits - 1))
        else:
            v = value if value < threshold else value + small_max
            bits.append((v, nb_bits))
        remaining -= 1 if c < 0 else c
        if c == 0:
            # zero-repeat escape: count following zeros in runs of 3
            run = 0
            while i < len(counts) and counts[i] == 0 and run < 3:
                run += 1
                i += 1
            while True:
                bits.append((run, 2))
                if run < 3:
                    break
                run = 0
                while (i < len(counts) and counts[i] == 0
                       and run < 3):
                    run += 1
                    i += 1
    # forward little-endian bitstream
    acc = 0
    pos = 0
    for v, n in bits:
        acc |= v << pos
        pos += n
    return acc.to_bytes((pos + 7) // 8, "little")


def _encode_weight_description(ser: list[int]) -> bytes | None:
    """Huffman tree description: direct 4-bit weights vs
    FSE-compressed weights (two alternating states, the decoder's
    over-read stop rule satisfied by construction) — whichever is
    shorter; None when neither form can represent it."""
    direct = None
    if len(ser) <= 128:
        wbytes = bytearray()
        for k in range(0, len(ser), 2):
            hi = ser[k] << 4
            lo = ser[k + 1] if k + 1 < len(ser) else 0
            wbytes.append(hi | lo)
        direct = bytes([127 + len(ser)]) + bytes(wbytes)
    fse = _encode_weights_fse(ser)
    if fse is not None and (direct is None or len(fse) < len(direct)):
        return fse
    return direct


def _fse_normalize(freq: dict[int, int], al: int) -> list[int] | None:
    """Largest-remainder normalization of a histogram to a 2^al-slot
    table, every present symbol >= 1 slot → counts list 0..max_sym."""
    size = 1 << al
    if len(freq) > size:
        return None
    total = sum(freq.values())
    norm = {w: max(1, (c * size) // total) for w, c in freq.items()}
    drift = size - sum(norm.values())
    order = sorted(freq, key=lambda w: -freq[w])
    k = 0
    guard = 0
    while drift != 0:
        w = order[k % len(order)]
        if drift > 0:
            norm[w] += 1
            drift -= 1
        elif norm[w] > 1:
            norm[w] -= 1
            drift += 1
        k += 1
        guard += 1
        if guard > 10 * size:
            return None
    return [norm.get(w, 0) for w in range(max(freq) + 1)]


def _encode_weights_fse(ser: list[int]) -> bytes | None:
    """FSE-compressed Huffman weights (header byte < 128): normalize
    the weight-value distribution to a 2^al table (al <= 6), write the
    ncount description, then encode the weight sequence through TWO
    alternating states built backward with interval search. The final
    written update is the SECOND-to-last weight's; the last weight's
    state update is omitted so the decoder's over-read rule fires
    exactly there (that state must need >= 1 bit — enforced below)."""
    n = len(ser)
    if n < 2 or n > 255:
        return None
    freq: dict[int, int] = {}
    for w in ser:
        freq[w] = freq.get(w, 0) + 1
    if len(freq) < 2:
        return None          # single-symbol FSE never terminates
    al = max(5, (len(freq) - 1).bit_length() + 1)
    if al > 6:
        al = 6
    counts = _fse_normalize(freq, al)
    if counts is None:
        return None
    table = _fse_build(counts, al)
    by_sym: dict[int, list[tuple[int, int, int]]] = {}
    for state, (s, nbb, base) in enumerate(table):
        by_sym.setdefault(s, []).append((base, nbb, state))
    for lst in by_sym.values():
        lst.sort()
    # two parity chains built backward; chain of ser[n-2]'s parity
    # ends at n-2 and its final state must consume >= 1 bit
    chains: list[list[int]] = [[], []]     # states per parity, fwd order
    upd: dict[int, tuple[int, int]] = {}   # emission k -> (val, nbits)
    for p in (0, 1):
        idxs = list(range(p, n, 2))
        if not idxs:
            return None
        states_rev: list[int] = []
        last_k = idxs[-1]
        cand = by_sym.get(ser[last_k])
        if not cand:
            return None
        if last_k == n - 2:
            cand = [c for c in cand if c[1] >= 1]
            if not cand:
                return None         # no bit-consuming state: bail out
        nxt = cand[0][2]
        states_rev.append(nxt)
        for k in reversed(idxs[:-1]):
            got = None
            for base, nbb, state in by_sym.get(ser[k], ()):
                if base <= nxt < base + (1 << nbb):
                    got = (state, nxt - base, nbb)
                    break
            if got is None:
                return None
            upd[k] = (got[1], got[2])
            nxt = got[0]
            states_rev.append(nxt)
        chains[p] = list(reversed(states_rev))
    acc = _BitAcc()
    acc.add(chains[0][0], al)              # init even state
    acc.add(chains[1][0], al)              # init odd state
    for k in range(n - 2):                 # update after emission k;
        v, nbb = upd[k]                    # k == n-2's is the overread
        acc.add(v, nbb)
    body = _fse_write_ncount(counts, al) + acc.bytes()
    if len(body) >= 128:
        return None
    payload = bytes([len(body)]) + body
    # the construction has subtle invariants (stop rule, spread,
    # normalization) — prove each description by decoding it
    try:
        mb, lookup, used = _huf_read_description(payload)
    except ValueError:
        return None
    if used != len(payload):
        return None
    check = _huf_weights_to_table(ser)
    if (mb, lookup) != check:
        return None
    return payload


def _encode_block(data: bytes) -> bytes | None:
    """One compressed block for ``data`` (matches within the block
    only), or None when expansion would exceed the raw block."""
    matches = _find_matches(data)
    seqs = []                 # (ll, of_val, ml) with literal slices
    lits = bytearray()
    pos = 0
    last_offset = None
    for at, length, offset in matches:
        ll = at - pos
        lits += data[pos:at]
        if offset == last_offset and ll != 0:
            of_val = 1                      # repeat offset 1
        else:
            of_val = offset + 3
        seqs.append((ll, of_val, length))
        last_offset = offset
        pos = at + length
    tail = data[pos:]
    lits += tail
    if not seqs:
        # literal-only block (nbSeq = 0): worth emitting when Huffman
        # alone wins — entropy-heavy data with no LZ matches
        huf = _encode_huffman_literals(bytes(lits))
        if huf is None:
            return None
        payload, streams = huf
        regen, comp = len(lits), len(payload)
        if streams == 1 and regen <= 0x3FF and comp <= 0x3FF:
            h = (2 | (0 << 2) | (regen << 4)
                 | (comp << 14)).to_bytes(3, "little")
        elif streams == 4 and regen <= 0x3FFF and comp <= 0x3FFF:
            h = (2 | (2 << 2) | (regen << 4)
                 | (comp << 18)).to_bytes(4, "little")
        elif streams == 4 and regen <= 0x3FFFF and comp <= 0x3FFFF:
            h = (2 | (3 << 2) | (regen << 4)
                 | (comp << 22)).to_bytes(5, "little")
        else:
            return None
        block = h + payload + b"\x00"        # empty sequences section
        return block if len(block) < len(data) else None
    # literals section: Huffman (type 2, 1 or 4 streams) or raw
    huf = _encode_huffman_literals(bytes(lits))
    if huf is not None:
        payload, streams = huf
        regen, comp = len(lits), len(payload)
        if streams == 1 and regen <= 0x3FF and comp <= 0x3FF:
            h = (2 | (0 << 2) | (regen << 4)
                 | (comp << 14)).to_bytes(3, "little")
        elif streams == 4 and regen <= 0x3FF and comp <= 0x3FF:
            h = (2 | (1 << 2) | (regen << 4)
                 | (comp << 14)).to_bytes(3, "little")
        elif streams == 4 and regen <= 0x3FFF and comp <= 0x3FFF:
            h = (2 | (2 << 2) | (regen << 4)
                 | (comp << 18)).to_bytes(4, "little")
        elif streams == 4 and regen <= 0x3FFFF and comp <= 0x3FFFF:
            h = (2 | (3 << 2) | (regen << 4)
                 | (comp << 22)).to_bytes(5, "little")
        else:
            huf = None
        if huf is not None:
            lit_sec = h + payload
    if huf is None:
        size = len(lits)
        if size < 32:
            lit_sec = bytes([(size << 3) | 0]) + bytes(lits)
        elif size < (1 << 12):
            h = 0 | (1 << 2) | (size << 4)
            lit_sec = h.to_bytes(2, "little") + bytes(lits)
        else:
            h = 0 | (3 << 2) | (size << 4)
            lit_sec = h.to_bytes(3, "little") + bytes(lits)
    # sequences: per channel the cheapest of RLE / custom-FSE /
    # predefined (estimated exactly from the normalized table shape)
    n = len(seqs)
    if n < 128:
        seq_hdr = bytes([n])
    elif n < 0x7F00:
        seq_hdr = bytes([128 + (n >> 8), n & 0xFF])
    else:
        seq_hdr = bytes([255, n & 0xFF, (n >> 8) - 0x7F])
    codes = []
    for ll, of_val, ml in seqs:
        llc = _ll_code(ll)
        ofc = of_val.bit_length() - 1
        mlc = _ml_code(ml)
        codes.append((llc, (ofc, of_val - (1 << ofc), ofc), mlc))

    def choose(kind: str, default: tuple, code_list: list[int]):
        """(mode, desc bytes, encode table, accuracy_log)."""
        hist: dict[int, int] = {}
        for c in code_list:
            hist[c] = hist.get(c, 0) + 1
        if len(hist) == 1:
            sym = next(iter(hist))
            return 1, bytes([sym]), {sym: [(0, 0, 0)]}, 0
        def_al, def_cnt = default

        def table_bits(counts, al):
            # occurrences of symbol with f slots cost al-floor(log2 f)
            bits = al                          # init-state read
            for s, c in hist.items():
                f = counts[s] if s < len(counts) else 0
                f = 1 if f == -1 else f
                if f == 0:
                    return None                # unrepresentable
                bits += c * (al - (f.bit_length() - 1))
            return bits

        best = (table_bits(def_cnt, def_al), 0, b"", def_cnt, def_al)
        if best[0] is None:
            best = None                        # predefined can't hold it
        cust_al = min(_MAX_AL[kind], max(5, len(hist).bit_length() + 1))
        cnt = _fse_normalize(hist, cust_al)
        if cnt is not None:
            desc = _fse_write_ncount(cnt, cust_al)
            cost = table_bits(cnt, cust_al)
            if cost is not None:
                cost += 8 * len(desc)
                if best is None or cost < best[0]:
                    best = (cost, 2, desc, cnt, cust_al)
        if best is None:
            return None
        _, mode, desc, counts, al = best
        return mode, desc, _fse_encode_prep(counts, al), al

    ch_ll = choose("ll", _LL_DEFAULT, [c[0][0] for c in codes])
    ch_of = choose("of", _OF_DEFAULT, [c[1][0] for c in codes])
    ch_ml = choose("ml", _ML_DEFAULT, [c[2][0] for c in codes])
    if ch_ll is None or ch_of is None or ch_ml is None:
        return None
    ll_mode, ll_desc, enc_ll, ll_al = ch_ll
    of_mode, of_desc, enc_of, of_al = ch_of
    ml_mode, ml_desc, enc_ml, ml_al = ch_ml
    modes = bytes([(ll_mode << 6) | (of_mode << 4) | (ml_mode << 2)])
    # states backward (decode order: states emit codes, then advance)
    st_ll = st_of = st_ml = None
    upd = [None] * n
    for i in range(n - 1, -1, -1):
        (llc, _, _), (ofc, _, _), (mlc, _, _) = codes[i]
        if i == n - 1:
            st_ll = enc_ll[llc][0][2]
            st_of = enc_of[ofc][0][2]
            st_ml = enc_ml[mlc][0][2]
        else:
            st_ll, vll, nll = _fse_state_for(enc_ll, llc, st_ll)
            st_ml, vml, nml = _fse_state_for(enc_ml, mlc, st_ml)
            st_of, vof, nof = _fse_state_for(enc_of, ofc, st_of)
            upd[i] = (vll, nll, vml, nml, vof, nof)
    acc = _BitAcc()
    acc.add(st_ll, ll_al)
    acc.add(st_of, of_al)
    acc.add(st_ml, ml_al)
    for i in range(n):
        (llc, llv, lln), (ofc, ofv, ofn), (mlc, mlv, mln) = codes[i]
        acc.add(ofv, ofn)
        acc.add(mlv, mln)
        acc.add(llv, lln)
        if i + 1 < n:
            vll, nll, vml, nml, vof, nof = upd[i]
            acc.add(vll, nll)
            acc.add(vml, nml)
            acc.add(vof, nof)
    block = (lit_sec + seq_hdr + modes + ll_desc + of_desc + ml_desc
             + acc.bytes())
    if len(block) >= len(data):
        return None
    # cheap insurance at fixture scale: a block the decoder cannot
    # reproduce byte-exactly is never emitted — ANY self-check
    # failure falls back to a raw block (the caller's None path), so
    # a residual encoder edge case degrades compression instead of
    # crashing the write
    st = _FrameState(0)
    try:
        if _decode_block(block, st, [1, 4, 8]) != data:
            return None
    except Exception:
        return None
    return block


def compress(data: bytes, block_size: int = 1 << 17) -> bytes:
    """A single zstd frame (single-segment, content size, checksum);
    per block the best of raw / RLE / compressed (Huffman-or-raw
    literals + predefined-FSE sequences). Real ``zstd -d``
    decompresses the output byte-exactly (proven in tests)."""
    out = bytearray(_MAGIC.to_bytes(4, "little"))
    n = len(data)
    # single-segment; FCS flag by size; checksum on
    if n < 256:
        fhd, fcs = 0x20 | 0x04, n.to_bytes(1, "little")
    elif n < 65536 + 256:
        fhd, fcs = 0x60 | 0x04, (n - 256).to_bytes(2, "little")
    else:
        fhd, fcs = 0xA0 | 0x04, n.to_bytes(4, "little")
    out += bytes([fhd]) + fcs
    if n == 0:
        out += (1 | (0 << 1) | (0 << 3)).to_bytes(3, "little")
        out += (xxh64(b"") & 0xFFFFFFFF).to_bytes(4, "little")
        return bytes(out)
    for at in range(0, n, block_size):
        chunk = data[at:at + block_size]
        last = 1 if at + block_size >= n else 0
        if len(set(chunk)) == 1:
            out += (last | (1 << 1)
                    | (len(chunk) << 3)).to_bytes(3, "little")
            out += chunk[:1]
            continue
        enc = _encode_block(bytes(chunk))
        if enc is None:
            out += (last | (0 << 1)
                    | (len(chunk) << 3)).to_bytes(3, "little")
            out += chunk
        else:
            out += (last | (2 << 1)
                    | (len(enc) << 3)).to_bytes(3, "little")
            out += enc
    out += (xxh64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)
