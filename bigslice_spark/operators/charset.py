"""Charset detection and decoding for raw web payloads — all JVM-side.

A 100 TB crawl's Content-Type headers lie: payloads declared utf-8
arrive as windows-1252, BOM'd UTF-16 shows up as text/html, and pure
ASCII is the silent majority. Ingest therefore detects from the BYTES,
never the header. The detector here is the deterministic subset of the
chardet/ftfy heuristics that covers the overwhelming share of real web
text, chosen so every probe is a whole-stage-codegen expression — no
Python touches payload bytes:

  1. UTF-16 BOM (FF FE / FE FF)           -> 'utf-16le' / 'utf-16be'
  2. UTF-8 BOM (EF BB BF)                 -> 'utf-8-sig'
  3. valid UTF-8, no byte >= 0x80         -> 'ascii'
  4. valid UTF-8 with multibyte sequences -> 'utf-8'
  5. invalid UTF-8, some byte in 80-9F    -> 'windows-1252'
     (the C1 control range is meaningless in ISO-8859-1 but carries
     cp1252's printable punctuation — the classic smart-quote tell)
  6. invalid UTF-8, high bytes only A0-FF -> 'iso-8859-1'

Probes: ``is_valid_utf8`` on the byte-copy cast (Spark string casts
from binary copy bytes without validating), BOM prefixes via binary
``substring`` equality, and byte-range probes via the TOTAL
ISO-8859-1 decode (every byte sequence is valid latin-1, so it can
never raise) + ``rlike`` on the mapped U+0080-U+00FF ranges.

Decoding stays total on the hot paths: utf-8/ascii are a cast (BOM
stripped), latin-1/cp1252 go through the total ISO-8859-1 decode with
cp1252's 27 printable C1 bytes remapped by ``translate`` (the
byte-value -> glyph table, e.g. 0x80 -> Euro, 0x93/0x94 -> curly
quotes; the 5 undefined bytes pass through as C1 controls). The one
branch that can reject input is BOM'd UTF-16: Spark's ``decode`` uses
REPORT error semantics, so it is gated on BOM + even byte length, and
``utf16=False`` skips the attempt entirely (charset still reported,
text NULL) for pipelines that cannot tolerate a malformed-surrogate
failure; odd-length BOM'd payloads are classified 'utf-16-corrupt'
and never decoded.

Reference: no analog in bigslice (byte-level charset work is left to
user funcs there); part of the web-ingest surface around
sources/warc.py and operators/html.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cp1252_maps() -> tuple[str, str]:
    src, dst = [], []
    for b in range(0x80, 0xA0):
        src.append(chr(b))
        try:
            dst.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:     # 81 8D 8F 90 9D are undefined
            dst.append(chr(b))
    return "".join(src), "".join(dst)


_CP1252_SRC, _CP1252_DST = _cp1252_maps()
_BOM_LE = b"\xff\xfe"
_BOM_BE = b"\xfe\xff"
_BOM_U8 = b"\xef\xbb\xbf"


def charset_of(payload: Column) -> Column:
    """Detected charset label for a binary column (rules above)."""
    head2 = F.substring(payload, 1, 2)
    lat1 = F.decode(payload, "ISO-8859-1")
    valid8 = F.is_valid_utf8(payload.cast("string"))
    even = F.octet_length(payload) % 2 == 0
    return (
        F.when((head2 == F.lit(_BOM_LE)) & even, "utf-16le")
        .when((head2 == F.lit(_BOM_BE)) & even, "utf-16be")
        .when(head2.isin(F.lit(_BOM_LE), F.lit(_BOM_BE)), "utf-16-corrupt")
        .when(F.substring(payload, 1, 3) == F.lit(_BOM_U8), "utf-8-sig")
        .when(valid8 & ~lat1.rlike("[^\\x00-\\x7f]"), "ascii")
        .when(valid8, "utf-8")
        .when(lat1.rlike("[\\x80-\\x9f]"), "windows-1252")
        .otherwise("iso-8859-1"))


def decode_auto(df: DataFrame, bin_col: str = "payload",
                charset_col: str = "charset", text_col: str = "text",
                utf16: bool = True) -> DataFrame:
    """Append detected ``charset`` and decoded ``text`` columns.

    Total on every non-UTF-16 path. The UTF-16 branch (rare in web
    corpora, always BOM-gated here) uses Spark's REPORT-mode decode:
    a BOM'd payload with unpaired surrogates raises; pass
    ``utf16=False`` to label such rows without decoding (text NULL).
    'utf-16-corrupt' (BOM + odd length) always yields NULL text."""
    p = F.col(bin_col)
    cs = charset_of(p)
    lat1 = F.decode(p, "ISO-8859-1")
    cp1252 = F.translate(lat1, _CP1252_SRC, _CP1252_DST)
    text = (
        F.when(cs == "ascii", p.cast("string"))
        .when(cs == "utf-8", p.cast("string"))
        .when(cs == "utf-8-sig",
              F.substring(p, 4, F.octet_length(p) - 3).cast("string"))
        .when(cs == "windows-1252", cp1252)
        .when(cs == "iso-8859-1", lat1))
    if utf16:
        # Java's UTF-16 charset consumes the BOM and picks endianness
        text = text.when(cs.isin("utf-16le", "utf-16be"),
                         F.decode(p, "UTF-16"))
    return df.withColumn(charset_col, cs).withColumn(text_col, text)


def detect_charset(df: DataFrame, bin_col: str = "payload",
                   charset_col: str = "charset") -> DataFrame:
    """Append only the detected ``charset`` column (no decoding)."""
    return df.withColumn(charset_col, charset_of(F.col(bin_col)))
