"""PDF standard security handler (ISO 32000-1 §7.6) — the
empty-user-password subset that dominates crawled corpora: documents
"encrypted" with owner-only restrictions, which every real extractor
opens without a password (VERDICT r12 task 4 / "What's missing" #1).

Clean-room from public specifications only:
- RC4 — the classic stream cipher (public since 1994; §7.6.2 uses it
  for /V 1-2 and the /V 4 "/V2" crypt filter). Pinned in tests to the
  widely published "Key"/"Plaintext" test vector.
- AES-128 — FIPS-197. The S-box is DERIVED (GF(2^8) inverse + §5.1.1
  affine transform) rather than transcribed, and the cipher is pinned
  to the FIPS-197 Appendix C.1 known-answer vector. CBC mode with the
  §7.6.2 layout: a 16-byte prefix IV and PKCS#5-style padding where a
  whole pad block is appended when the plaintext is block-aligned.
- §7.6.3 password algorithms 2/3/4/5/6: file-key derivation (MD5 +
  50-fold stretch for R≥3), /O and /U generation, and user-password
  authentication. Only the EMPTY user password is attempted; anything
  else raises by name in the caller (operators/pdf.py).
- §7.6.2 Algorithm 1 per-object keys: MD5(file_key + objnum[3 LE] +
  gen[2 LE] + b"sAlT" for AESV2), truncated to min(n+5, 16).

Out of subset (honest raise in the caller): non-/Standard security
handlers, /V 5 (AES-256, PDF 2.0), split /StmF vs /StrF filters.

Reference: no analog in bigslice; part of the §2.4 document surface.
"""

from __future__ import annotations

import hashlib

# §7.6.3.3 padding string (Algorithm 2 step a) — a public constant
_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E,
    0x56, 0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68,
    0x3E, 0x80, 0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])


# ------------------------------------------------------------------ RC4

def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: encrypt == decrypt)."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = b ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# -------------------------------------------------------- AES-128 (FIPS-197)

def _gf_tables() -> tuple[list[int], list[int]]:
    """exp/log tables for GF(2^8) mod x^8+x^4+x^3+x+1 (0x11B),
    generator 3 (x+1) — the standard construction."""
    exp, log = [0] * 510, [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        # multiply by the generator 3: x*2 ^ x
        x2 = (x << 1) ^ (0x11B if x & 0x80 else 0)
        x = x2 ^ x
    for i in range(255, 510):
        exp[i] = exp[i - 255]
    return exp, log


_EXP, _LOG = _gf_tables()


def _gmul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _EXP[_LOG[a] + _LOG[b]]


def _make_sbox() -> tuple[list[int], list[int]]:
    """FIPS-197 §5.1.1: S(x) = affine(inverse(x)); derived, not
    transcribed, and pinned by the Appendix C.1 known-answer test."""
    def rotl(b: int, n: int) -> int:
        return ((b << n) | (b >> (8 - n))) & 0xFF

    sbox = [0] * 256
    for x in range(256):
        inv = 0 if x == 0 else _EXP[255 - _LOG[x]]
        sbox[x] = (inv ^ rotl(inv, 1) ^ rotl(inv, 2) ^ rotl(inv, 3)
                   ^ rotl(inv, 4) ^ 0x63)
    inv_sbox = [0] * 256
    for x, s in enumerate(sbox):
        inv_sbox[s] = x
    return sbox, inv_sbox


_SBOX, _INV_SBOX = _make_sbox()


def _expand_key(key: bytes) -> list[bytes]:
    """§5.2 key expansion for AES-128: 11 round keys of 16 bytes."""
    if len(key) != 16:
        raise ValueError("aes: key must be 16 bytes")
    w = [list(key[i:i + 4]) for i in range(0, 16, 4)]
    rcon = 1
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]                       # RotWord
            t = [_SBOX[b] for b in t]               # SubWord
            t[0] ^= rcon
            rcon = _gmul(rcon, 2)
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return [bytes(sum(w[4 * r: 4 * r + 4], [])) for r in range(11)]


def _add_round_key(state: list[int], rk: bytes) -> None:
    for i in range(16):
        state[i] ^= rk[i]


# state layout: state[4*c + r] == byte r of word c (column-major, the
# order bytes arrive in), so ShiftRows moves within r mod 4 classes
_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def _encrypt_block(rks: list[bytes], block: bytes) -> bytes:
    s = list(block)
    _add_round_key(s, rks[0])
    for rnd in range(1, 10):
        s = [_SBOX[s[_SHIFT[i]]] for i in range(16)]   # Sub+ShiftRows
        t = [0] * 16
        for c in range(0, 16, 4):                      # MixColumns
            a0, a1, a2, a3 = s[c], s[c + 1], s[c + 2], s[c + 3]
            t[c] = _gmul(a0, 2) ^ _gmul(a1, 3) ^ a2 ^ a3
            t[c + 1] = a0 ^ _gmul(a1, 2) ^ _gmul(a2, 3) ^ a3
            t[c + 2] = a0 ^ a1 ^ _gmul(a2, 2) ^ _gmul(a3, 3)
            t[c + 3] = _gmul(a0, 3) ^ a1 ^ a2 ^ _gmul(a3, 2)
        s = t
        _add_round_key(s, rks[rnd])
    s = [_SBOX[s[_SHIFT[i]]] for i in range(16)]       # final round
    _add_round_key(s, rks[10])
    return bytes(s)


def _decrypt_block(rks: list[bytes], block: bytes) -> bytes:
    s = list(block)
    _add_round_key(s, rks[10])
    for rnd in range(9, 0, -1):
        s = [_INV_SBOX[s[_INV_SHIFT[i]]] for i in range(16)]
        _add_round_key(s, rks[rnd])
        t = [0] * 16
        for c in range(0, 16, 4):                      # InvMixColumns
            a0, a1, a2, a3 = s[c], s[c + 1], s[c + 2], s[c + 3]
            t[c] = (_gmul(a0, 14) ^ _gmul(a1, 11) ^ _gmul(a2, 13)
                    ^ _gmul(a3, 9))
            t[c + 1] = (_gmul(a0, 9) ^ _gmul(a1, 14) ^ _gmul(a2, 11)
                        ^ _gmul(a3, 13))
            t[c + 2] = (_gmul(a0, 13) ^ _gmul(a1, 9) ^ _gmul(a2, 14)
                        ^ _gmul(a3, 11))
            t[c + 3] = (_gmul(a0, 11) ^ _gmul(a1, 13) ^ _gmul(a2, 9)
                        ^ _gmul(a3, 14))
        s = t
    s = [_INV_SBOX[s[_INV_SHIFT[i]]] for i in range(16)]
    _add_round_key(s, rks[0])
    return bytes(s)


def aes128_encrypt_block(key: bytes, block: bytes) -> bytes:
    """One ECB block — exposed for the FIPS-197 C.1 known-answer test."""
    return _encrypt_block(_expand_key(key), block)


def aes128_decrypt_block(key: bytes, block: bytes) -> bytes:
    return _decrypt_block(_expand_key(key), block)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """§7.6.2 AESV2 layout: IV prefix + CBC of the padded plaintext
    (PKCS#5-style: N bytes of value N, a full block when aligned)."""
    rks = _expand_key(key)
    pad = 16 - len(data) % 16
    data += bytes([pad]) * pad
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        prev = _encrypt_block(rks, blk)
        out += prev
    return bytes(out)


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """Inverse of aes_cbc_encrypt: strip the IV prefix, CBC-decrypt,
    validate and strip the padding."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError("pdf: AES data is not IV + whole blocks")
    rks = _expand_key(key)
    iv, body = data[:16], data[16:]
    out = bytearray()
    prev = iv
    for i in range(0, len(body), 16):
        blk = body[i:i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(rks, blk),
                                           prev))
        prev = blk
    pad = out[-1]
    if not 1 <= pad <= 16 or len(out) < pad:
        raise ValueError("pdf: bad AES padding")
    return bytes(out[:-pad])


# --------------------------------------- §7.6.3 password algorithms

def _pad_pw(pw: bytes) -> bytes:
    return (pw + _PAD)[:32]


def file_key(pw: bytes, o: bytes, p: int, id0: bytes, r: int,
             n: int) -> bytes:
    """Algorithm 2: the file encryption key from a user password."""
    h = hashlib.md5()
    h.update(_pad_pw(pw))
    h.update(o[:32])
    h.update((p & 0xFFFFFFFF).to_bytes(4, "little"))
    h.update(id0)
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def compute_o(owner_pw: bytes, user_pw: bytes, r: int, n: int) -> bytes:
    """Algorithm 3: the /O (owner password) entry."""
    key = hashlib.md5(_pad_pw(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:n]
    o = rc4(key, _pad_pw(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def compute_u(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / Algorithm 5 (R≥3): the /U entry."""
    if r == 2:
        return rc4(key, _PAD)
    u = hashlib.md5(_PAD + id0).digest()
    u = rc4(key, u)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + bytes(16)     # 16 arbitrary padding bytes (Alg 5 step f)


def auth_user(pw: bytes, o: bytes, u: bytes, p: int, id0: bytes,
              r: int, n: int) -> bytes | None:
    """Algorithm 6: authenticate a user password; the file key on
    success, None on failure (R2 compares all 32 bytes, R≥3 the
    first 16)."""
    key = file_key(pw, o, p, id0, r, n)
    expect = compute_u(key, id0, r)
    ok = expect == u if r == 2 else expect[:16] == u[:16]
    return key if ok else None


def object_key(fkey: bytes, num: int, gen: int, aes: bool) -> bytes:
    """§7.6.2 Algorithm 1: the per-object key."""
    ext = num.to_bytes(3, "little") + gen.to_bytes(2, "little")
    if aes:
        ext += b"sAlT"
    return hashlib.md5(fkey + ext).digest()[:min(len(fkey) + 5, 16)]
