"""PDF codec hardening (operators/pdf.py): round trips through real
bytes, spec corner cases hand-built, honest raises on unsupported or
corrupt constructs — the jpeg/flac test contract for documents."""

import re
import zlib

import pytest

from bigslice_spark.operators.pdf import (PdfDoc, extract_text,
                                          make_pdf, pdf_pages)


def _texts(blob: bytes) -> list[str]:
    return [extract_text(c) for c in PdfDoc(blob).pages()]


def test_round_trip_raw_and_compressed():
    pages = [["alpha one", "beta (two) \\ three"], ["gamma"], []]
    for compress in (False, True):
        got = _texts(make_pdf(pages, compress=compress))
        assert got == ["alpha one\nbeta (two) \\ three", "gamma", ""]


def test_literal_string_escapes_and_octal():
    # \101 = 'A'; nested parens; continuation eats the newline
    content = (b"BT (esc \\101\\102 (nested) done) Tj ET\n"
               b"BT (cont\\\ninues) Tj ET")
    assert extract_text(content) == "esc AB (nested) done\ncontinues"


def test_hex_strings_and_tj_array():
    content = (b"BT [<48656c6c6f> -120 (, ) 30 <776F726C64>] TJ ET")
    assert extract_text(content) == "Hello, world"
    # odd hex digit count pads a trailing 0 (spec 7.3.4.3): 0x40 = '@'
    assert extract_text(b"BT <4> Tj ET") == "@"


def test_move_show_quote_operator():
    content = b"BT (first) Tj (second)' ET"
    assert extract_text(content) == "first\nsecond"


def test_contents_array_concatenation():
    """A page whose /Contents is an ARRAY of streams concatenates
    them (spec 7.8.2) — build one by editing a real pdf."""
    blob = make_pdf([["only"]])
    # append a second content stream object and point the page at both
    extra = b"BT (more) Tj ET"
    n_obj = blob.count(b" 0 obj")
    new_num = n_obj + 1
    insert = (f"{new_num} 0 obj\n<< /Length {len(extra)} >>\n"
              .encode() + b"stream\n" + extra + b"\nendstream\nendobj\n")
    at = blob.index(b"xref")
    patched = blob[:at] + insert + blob[at:]
    patched = patched.replace(b"/Contents 4 0 R",
                              f"/Contents [4 0 R {new_num} 0 R]".encode())
    # rebuild xref from scratch (offsets all moved)
    offs = {int(m.group(1)): m.start()
            for m in re.finditer(rb"(\d+) 0 obj", patched)}
    xref_at = patched.index(b"xref")
    table = [b"xref\n", f"0 {len(offs) + 1}\n".encode(),
             b"0000000000 65535 f \n"]
    for num in sorted(offs):
        table.append(f"{offs[num]:010d} 00000 n \n".encode())
    tail = (f"trailer\n<< /Size {len(offs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    patched = patched[:xref_at] + b"".join(table) + tail
    assert _texts(patched) == ["only\nmore"]


def test_encrypted_and_xref_stream_raise():
    blob = make_pdf([["x"]])
    enc = blob.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    with pytest.raises(NotImplementedError, match="encrypted"):
        PdfDoc(enc)
    # point startxref at a non-table object -> xref-stream rejection
    m = re.search(rb"startxref\n(\d+)", blob)
    bad = blob[:m.start(1)] + b"9" + blob[m.end(1) - 1:]
    with pytest.raises((NotImplementedError, ValueError)):
        PdfDoc(bad)


def test_corrupt_stream_raises():
    blob = make_pdf([["payload line"]], compress=True)
    d = PdfDoc(blob)
    start = blob.index(b"stream\n") + len(b"stream\n")
    bad = blob[:start] + b"\xff\xff" + blob[start + 2:]
    with pytest.raises(zlib.error):
        [extract_text(c) for c in PdfDoc(bad).pages()]
    del d


def test_pdf_pages_spark_and_null_blob(spark):
    blob = make_pdf([["spark side"], ["page 2"]])
    df = spark.createDataFrame([(7, bytearray(blob))],
                               "id long, media binary")
    rows = sorted((r["page"], r["text"], r["n_chars"])
                  for r in pdf_pages(df).collect())
    assert rows == [(0, "spark side", 10), (1, "page 2", 6)]
    null = spark.createDataFrame([(8, None)], "id long, media binary")
    with pytest.raises(Exception, match="NULL media blob"):
        pdf_pages(null).collect()
