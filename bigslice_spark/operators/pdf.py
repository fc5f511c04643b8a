"""PDF text extraction — the document-format leg of the media tour
(images: jpeg/gif/png · audio: wav/adpcm/g711/flac · video: mp4/mjpeg ·
documents: THIS), for corpora distributed as PDFs.

Clean-room implementation of the classic PDF 1.4 subset from the
public spec (ISO 32000-1 / Adobe PDF Reference 1.7): header, body of
indirect objects, cross-reference TABLE, trailer; content streams
stored raw or FlateDecode-compressed (stdlib zlib); text extracted
from BT..ET blocks' ``Tj`` (show string) and ``TJ`` (show array with
kerning) operators, with literal-string escapes (\\\\ \\( \\) \\n \\r
\\t \\b \\f, octal, line continuations) and hex strings per §7.3.4.

Honest-raise contract (the repo's codec rule): PDF 1.5+ cross-
reference STREAMS and object streams, encryption, and non-Flate
filters raise NotImplementedError/ValueError with the offending
construct named — never silently skipped; corrupt xref offsets,
truncated streams and bad zlib data raise too.

Scale shape: ``pdf_pages`` is one Arrow-batched mapInPandas pass over
opaque binary blobs (binaryFile/parquet column), one task per blob —
documents parallelize across the corpus, the parse never leaves the
executor, and the driver sees only extracted text rows.

Reference: no analog in bigslice (grep: no document/media operator);
part of the multimodal pipeline surface this engine adds (SURVEY §2.4).
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame

# ---------------------------------------------------------------- build

_ESC = {ord("\\"): "\\\\", ord("("): "\\(", ord(")"): "\\)",
        10: "\\n", 13: "\\r", 9: "\\t", 8: "\\b", 12: "\\f"}


def _lit(s: str) -> bytes:
    """PDF literal string with §7.3.4.2 escapes (latin-1 payload)."""
    out = "".join(_ESC.get(ord(c), c) for c in s)
    return b"(" + out.encode("latin-1") + b")"


def make_pdf(pages: list[list[str]], compress: bool = False) -> bytes:
    """A spec-valid single-section PDF: one page per entry of
    ``pages``, each a list of text lines shown with one ``Tj`` per
    line (12pt Helvetica, 14pt leading). ``compress`` stores every
    content stream FlateDecode'd. Used by the fixtures AND the
    registry entry — the parser is proven against real bytes this
    builder wrote, round-trip style (the make_wav contract)."""
    objs: list[bytes] = []  # 1-indexed object bodies, in object order
    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Count {n_pages} /Kids [{kids}] "
                f">>".encode())
    font_num = 3 + 2 * n_pages
    for i, lines in enumerate(pages):
        page_num, content_num = 3 + 2 * i, 4 + 2 * i
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
            f"/Contents {content_num} 0 R >>".encode())
        body = [b"BT /F1 12 Tf 14 TL 72 720 Td"]
        for j, line in enumerate(lines):
            if j:
                body.append(b"T*")       # next line (leading)
            body.append(_lit(line) + b" Tj")
        body.append(b"ET")
        data = b"\n".join(body)
        filt = b""
        if compress:
            data = zlib.compress(data)
            filt = b"/Filter /FlateDecode "
        objs.append(b"<< " + filt + b"/Length " + str(len(data)).encode()
                    + b" >>\nstream\n" + data + b"\nendstream")
    objs.append(b"<< /Type /Font /Subtype /Type1 "
                b"/BaseFont /Helvetica >>")
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


# ---------------------------------------------------------------- parse

_TOKEN_RE = re.compile(
    rb"<<|>>|\[|\]|/[^\s/<>\[\]()]*|"
    rb"[+-]?\d+\.\d*|[+-]?\.\d+|[+-]?\d+|"
    rb"true|false|null|R|obj|endobj|stream|[A-Za-z'\"*]+")


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num


def _parse_value(buf: bytes, i: int):
    """One PDF object at buf[i:] → (value, next_index). Handles dicts,
    arrays, names, numbers, strings (literal+hex), booleans, null and
    indirect references ``n g R``."""
    while i < len(buf) and buf[i:i + 1].isspace():
        i += 1
    c = buf[i:i + 1]
    if c == b"<" and buf[i + 1:i + 2] == b"<":
        i += 2
        d = {}
        while True:
            while i < len(buf) and buf[i:i + 1].isspace():
                i += 1
            if buf[i:i + 2] == b">>":
                return d, i + 2
            if buf[i:i + 1] != b"/":
                raise ValueError(f"pdf: dict key is not a name at {i}")
            key, i = _parse_value(buf, i)
            val, i = _parse_value(buf, i)
            d[key] = val
        # unreachable
    if c == b"[":
        i += 1
        arr = []
        while True:
            while i < len(buf) and buf[i:i + 1].isspace():
                i += 1
            if buf[i:i + 1] == b"]":
                return arr, i + 1
            v, i = _parse_value(buf, i)
            arr.append(v)
    if c == b"/":
        m = re.match(rb"/([^\s/<>\[\]()]*)", buf[i:])
        return "/" + m.group(1).decode("latin-1"), i + m.end()
    if c == b"(":
        s, j = _literal_string(buf, i)
        return s, j
    if c == b"<":
        j = buf.index(b">", i)
        hx = re.sub(rb"\s", b"", buf[i + 1:j])
        if len(hx) % 2:
            hx += b"0"                    # §7.3.4.3: odd -> pad 0
        return bytes.fromhex(hx.decode("ascii")).decode("latin-1"), j + 1
    m = re.match(rb"[+-]?(\d+\.\d*|\.\d+|\d+)", buf[i:])
    if m:
        txt = m.group(0)
        j = i + m.end()
        # lookahead for "gen R" => indirect reference
        m2 = re.match(rb"\s+(\d+)\s+R(?![A-Za-z0-9])", buf[j:])
        if m2 and b"." not in txt:
            return _Ref(int(txt)), j + m2.end()
        return (float(txt) if b"." in txt else int(txt)), j
    for lit, val in ((b"true", True), (b"false", False), (b"null", None)):
        if buf[i:i + len(lit)] == lit:
            return val, i + len(lit)
    raise ValueError(f"pdf: cannot parse object at offset {i}: "
                     f"{buf[i:i + 20]!r}")


def _literal_string(buf: bytes, i: int) -> tuple[str, int]:
    """§7.3.4.2 literal string starting at '(' → (text, next_index)."""
    assert buf[i:i + 1] == b"("
    out = bytearray()
    depth = 1
    i += 1
    while depth:
        c = buf[i:i + 1]
        if not c:
            raise ValueError("pdf: unterminated literal string")
        if c == b"\\":
            n = buf[i + 1:i + 2]
            simple = {b"n": b"\n", b"r": b"\r", b"t": b"\t",
                      b"b": b"\b", b"f": b"\f", b"(": b"(",
                      b")": b")", b"\\": b"\\"}
            if n in simple:
                out += simple[n]
                i += 2
            elif n == b"\n":              # line continuation
                i += 2
            elif n.isdigit():
                m = re.match(rb"\\([0-7]{1,3})", buf[i:])
                out.append(int(m.group(1), 8) & 0xFF)
                i += m.end()
            else:
                out += n                   # unknown escape: literal
                i += 2
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth:
                out += c
            i += 1
        else:
            out += c
            i += 1
    return out.decode("latin-1"), i


class PdfDoc:
    def __init__(self, blob: bytes):
        self.buf = blob
        self.offsets = self._read_xref()
        self._cache: dict[int, object] = {}

    def _read_xref(self) -> dict[int, int]:
        tail = self.buf[-256:]
        m = re.search(rb"startxref\s+(\d+)\s+%%EOF", tail)
        if not m:
            raise ValueError("pdf: no startxref/%%EOF trailer")
        at = int(m.group(1))
        if self.buf[at:at + 4] != b"xref":
            raise NotImplementedError(
                "pdf: cross-reference STREAM (PDF 1.5+) — only the "
                "classic xref table is implemented")
        i = at + 4
        offsets: dict[int, int] = {}
        while True:
            m = re.match(rb"\s*(\d+)\s+(\d+)\s*", self.buf[i:])
            if not m:
                break
            start, count = int(m.group(1)), int(m.group(2))
            i += m.end()
            for k in range(count):
                ent = self.buf[i:i + 20]
                if len(ent) < 18:
                    raise ValueError("pdf: truncated xref entry")
                off, _gen, kind = ent[:10], ent[11:16], ent[17:18]
                if kind == b"n":
                    offsets[start + k] = int(off)
                elif kind != b"f":
                    raise ValueError(f"pdf: bad xref kind {kind!r}")
                i += 20
        m = re.search(rb"trailer", self.buf[i - 1:])
        if not m:
            raise ValueError("pdf: xref table has no trailer")
        self.trailer, _ = _parse_value(
            self.buf, i - 1 + m.end())
        if "/Encrypt" in self.trailer:
            raise NotImplementedError("pdf: encrypted document")
        return offsets

    def obj(self, ref):
        """Resolve an object (following indirect references)."""
        if not isinstance(ref, _Ref):
            return ref
        if ref.num in self._cache:
            return self._cache[ref.num]
        off = self.offsets.get(ref.num)
        if off is None:
            raise ValueError(f"pdf: object {ref.num} not in xref")
        m = re.match(rb"\s*(\d+)\s+(\d+)\s+obj",
                     self.buf[off:off + 64])
        if not m or int(m.group(1)) != ref.num:
            raise ValueError(
                f"pdf: xref offset {off} does not hold object "
                f"{ref.num}")
        val, i = _parse_value(self.buf, off + m.end())
        m2 = re.match(rb"\s*stream\r?\n", self.buf[i:])
        if m2:
            if not isinstance(val, dict):
                raise ValueError("pdf: stream without a dict")
            ln = self.obj(val["/Length"])
            data = self.buf[i + m2.end(): i + m2.end() + ln]
            if len(data) < ln:
                raise ValueError("pdf: truncated stream")
            val = (val, data)
        self._cache[ref.num] = val
        return val

    def _stream_data(self, ref) -> bytes:
        d, data = self.obj(ref)
        filt = d.get("/Filter")
        if filt is None:
            return data
        filts = filt if isinstance(filt, list) else [filt]
        for f in filts:
            f = self.obj(f)
            if f == "/FlateDecode":
                data = zlib.decompress(data)
            else:
                raise NotImplementedError(f"pdf: filter {f}")
        return data

    def pages(self) -> list[bytes]:
        """Content-stream bytes per page, document order (§7.7.3 page
        tree walk; /Contents arrays are concatenated per spec)."""
        root = self.obj(self.trailer["/Root"])
        out: list[bytes] = []

        def walk(node_ref):
            node = self.obj(node_ref)
            t = node.get("/Type")
            if t == "/Pages":
                for kid in node["/Kids"]:
                    walk(kid)
            elif t == "/Page":
                c = node.get("/Contents")
                if c is None:
                    out.append(b"")
                    return
                refs = c if isinstance(c, list) else [c]
                out.append(b"\n".join(
                    self._stream_data(r) for r in refs))
            else:
                raise ValueError(f"pdf: unexpected page-tree node {t}")

        walk(root["/Pages"])
        return out


def extract_text(content: bytes) -> str:
    """Text shown by a content stream: Tj/TJ/' strings inside BT..ET,
    one output line per text line (T* / Td / TD / ' start new lines;
    TJ kerning numbers are ignored). §9.4 text-showing subset."""
    lines: list[list[str]] = []
    cur: list[str] = []
    stack: list[object] = []
    i = 0
    in_text = False

    def newline():
        nonlocal cur
        if cur:
            lines.append(cur)
        cur = []

    while i < len(content):
        c = content[i:i + 1]
        if c.isspace():
            i += 1
            continue
        if c == b"(":
            s, i = _literal_string(content, i)
            stack.append(s)
            continue
        if c == b"<" and content[i + 1:i + 2] != b"<":
            j = content.index(b">", i)
            hx = re.sub(rb"\s", b"", content[i + 1:j])
            if len(hx) % 2:
                hx += b"0"
            stack.append(bytes.fromhex(hx.decode()).decode("latin-1"))
            i = j + 1
            continue
        m = _TOKEN_RE.match(content, i)
        if not m:
            i += 1                        # unknown byte: skip
            continue
        tok = m.group(0)
        i = m.end()
        if tok == b"BT":
            in_text = True
            cur = []
        elif tok == b"ET":
            newline()
            in_text = False
        elif tok in (b"Td", b"TD", b"T*") and in_text:
            newline()
        elif tok == b"Tj" and in_text:
            cur.append(stack[-1] if stack else "")
        elif tok == b"'" and in_text:     # move-and-show
            newline()
            cur.append(stack[-1] if stack else "")
        elif tok == b"TJ" and in_text:
            arr = stack[-1] if stack else []
            if isinstance(arr, list):
                cur.extend(s for s in arr if isinstance(s, str))
        elif tok == b"[":
            v, i = _parse_value(content, m.start())
            stack.append(v)
            continue
        elif re.fullmatch(rb"[+-]?(\d+\.\d*|\.\d+|\d+)", tok):
            stack.append(float(tok) if b"." in tok else int(tok))
        # operators consume their operands
        if tok.isalpha() or tok in (b"T*", b"'"):
            stack = []
    newline()
    return "\n".join("".join(parts) for parts in lines)


def pdf_pages(df: DataFrame, media_col: str = "media",
              id_col: str = "id") -> DataFrame:
    """PDF blobs → ``(id_col, page, text, n_chars)``: one row per page
    in document order, text per extract_text. One Arrow-batched
    mapInPandas pass; corrupt xrefs / truncated or undecodable streams
    / unsupported constructs raise (honest-raise codec contract)."""
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, page int, text string, n_chars long"

    def dec(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[media_col]):
                if blob is None:
                    raise ValueError(
                        f"NULL media blob for {id_col}={rid!r}: "
                        "filter missing rows before pdf_pages")
                doc = PdfDoc(bytes(blob))
                for p, content in enumerate(doc.pages()):
                    text = extract_text(content)
                    rows.append((rid, p, text, len(text)))
            yield pd.DataFrame(
                rows, columns=[id_col, "page", "text", "n_chars"])

    return df.select(id_col, media_col).mapInPandas(dec, schema)
