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
    # point startxref at a bogus offset -> chain rejection
    m = re.search(rb"startxref\n(\d+)", blob)
    bad = blob[:m.start(1)] + b"9" + blob[m.end(1) - 1:]
    with pytest.raises((NotImplementedError, ValueError)):
        PdfDoc(bad)


def test_xref_stream_objstm_round_trip():
    """PDF 1.5 layout (round 12, VERDICT r11 task 3): dict objects
    packed in an /ObjStm, binary /XRef stream with PNG Up predictor —
    build → parse round trip matches the classic layout exactly."""
    pages = [["alpha one", "beta (two) \\ three"], ["gamma"], []]
    for compress in (False, True):
        blob = make_pdf(pages, compress=compress, xref_stream=True)
        assert blob.startswith(b"%PDF-1.5")
        assert b"/ObjStm" in blob and b"/XRef" in blob
        assert b"trailer" not in blob          # 1.5: dict in the XRef
        assert _texts(blob) == ["alpha one\nbeta (two) \\ three",
                                "gamma", ""]
        d = PdfDoc(blob)
        assert d.compressed, "no type-2 (ObjStm) xref entries"


def test_xref_stream_prev_chain():
    """Incremental update: a NEW single-entry /XRef section with
    /Prev pointing at the original — first-seen (newest) wins, older
    sections still resolve everything else."""
    blob = make_pdf([["original"]], xref_stream=True)
    m = re.search(rb"startxref\n(\d+)\s+%%EOF", blob)
    old_at = int(m.group(1))
    body = blob[:m.start()]
    # append a replacement content stream (object 4) + tiny xref
    # stream covering ONLY object 4, chained to the old section
    new = b"BT (updated) Tj ET"
    patch_at = len(body)
    body += (f"4 0 obj\n<< /Length {len(new)} >>\nstream\n".encode()
             + new + b"\nendstream\nendobj\n")
    xref_at = len(body)
    entry = b"\x01" + patch_at.to_bytes(4, "big") + b"\x00\x00"
    import zlib as _z
    xdata = _z.compress(entry)
    nobj = blob.count(b" 0 obj")  # larger than any used number
    body += (f"{nobj + 5} 0 obj\n<< /Type /XRef /Size {nobj + 6} "
             f"/W [1 4 2] /Index [4 1] /Root 1 0 R /Prev {old_at} "
             f"/Filter /FlateDecode /Length {len(xdata)} >>\n"
             f"stream\n".encode() + xdata + b"\nendstream\nendobj\n")
    body += f"startxref\n{xref_at}\n%%EOF\n".encode()
    assert _texts(bytes(body)) == ["updated"]


def test_hybrid_reference_file():
    """Hybrid-reference layout (§7.5.8.4 — what Word-era exporters
    emit for 1.4-reader compatibility): a CLASSIC xref table that
    lists only the top-level objects (ObjStm members marked free) and
    whose trailer carries /XRefStm pointing at the 1.5 binary xref
    stream holding the hidden type-2 entries. Built by wrapping the
    1.5 fixture in a hand-assembled table."""
    blob = make_pdf([["hybrid page one"], ["and two"]],
                    xref_stream=True)
    m = re.search(rb"startxref\n(\d+)\s+%%EOF", blob)
    stream_at = int(m.group(1))
    body = blob[:m.start()]
    # top-level objects = content streams + ObjStm + XRef stream
    offs = {int(mm.group(1)): mm.start()
            for mm in re.finditer(rb"(\d+) 0 obj", body)}
    size = max(offs) + 1
    table_at = len(body)
    table = [f"xref\n0 {size}\n".encode(), b"0000000000 65535 f \n"]
    for num in range(1, size):
        if num in offs:
            table.append(f"{offs[num]:010d} 00000 n \n".encode())
        else:                    # hidden: in the ObjStm, table-free
            table.append(b"0000000000 00000 f \n")
    tail = (f"trailer\n<< /Size {size} /Root 1 0 R "
            f"/XRefStm {stream_at} >>\n"
            f"startxref\n{table_at}\n%%EOF\n").encode()
    hybrid = body + b"".join(table) + tail
    assert _texts(hybrid) == ["hybrid page one", "and two"]
    d = PdfDoc(hybrid)
    assert d.compressed, "hidden objects must come from the /XRefStm"
    # a bogus /XRefStm offset raises
    bad = hybrid.replace(f"/XRefStm {stream_at}".encode(),
                         f"/XRefStm {len(hybrid) + 9}".encode())
    with pytest.raises(ValueError):
        PdfDoc(bad)


def test_xref_stream_corruption_raises():
    """Fuzz the 1.5 structures: a corrupted /XRef payload, a bad
    ObjStm pointer, and a truncated predictor row all raise."""
    blob = make_pdf([["x"], ["y"]], xref_stream=True)
    # corrupt the XRef stream's zlib payload
    at = blob.rindex(b">>\nstream\n") + len(b">>\nstream\n")
    bad = blob[:at] + b"\xff\xff" + blob[at + 2:]
    with pytest.raises((ValueError, zlib.error)):
        PdfDoc(bad)
    # xref type-2 entry into a non-ObjStm object: retarget by editing
    # the ObjStm's /Type
    bad2 = blob.replace(b"/Type /ObjStm", b"/Type /ObjStx")
    with pytest.raises(ValueError, match="ObjStm|parse"):
        [extract_text(c) for c in PdfDoc(bad2).pages()]
    # predictor row-shape violation: /Columns lie
    bad3 = blob.replace(b"/Columns 7", b"/Columns 6")
    with pytest.raises(ValueError):
        PdfDoc(bad3)


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
