"""Charset detection/decoding (operators/charset.py)."""

import pytest

from bigslice_spark.operators.charset import decode_auto, detect_charset


def _run(spark, payloads, **kw):
    rows = [(i, p) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "id int, payload binary")
    out = decode_auto(df, **kw)
    return {r["id"]: (r["charset"], r["text"]) for r in out.collect()}


def test_detects_and_decodes_all_classes(spark):
    cases = [
        (b"plain ascii text", "ascii", "plain ascii text"),
        ("héllo wörld".encode("utf-8"), "utf-8", "héllo wörld"),
        ("﻿bom héllo".encode("utf-8"), "utf-8-sig", "bom héllo"),
        ("héllo".encode("utf-16"), "utf-16le", "héllo"),
        (b"\xfe\xff" + "héllo".encode("utf-16-be"), "utf-16be", "héllo"),
        ("caf\xe9 au lait".encode("latin-1"), "iso-8859-1",
         "café au lait"),
        ("price €9 “quoted”".encode("cp1252"),
         "windows-1252", "price €9 “quoted”"),
    ]
    got = _run(spark, [c[0] for c in cases])
    for i, (_, want_cs, want_text) in enumerate(cases):
        assert got[i] == (want_cs, want_text), (i, got[i])


def test_cp1252_undefined_bytes_pass_through(spark):
    # 0x81 is undefined in cp1252 -> stays as U+0081, label still
    # windows-1252 because 0x80-0x9F bytes are present
    got = _run(spark, [b"x\x81y\x93z"])
    cs, text = got[0]
    assert cs == "windows-1252"
    assert text == "x\x81y“z"


def test_bom_odd_length_is_corrupt_not_a_crash(spark):
    got = _run(spark, [b"\xff\xfeabc", b"ok"])
    assert got[0] == ("utf-16-corrupt", None)
    assert got[1] == ("ascii", "ok")


def test_utf16_false_labels_without_decoding(spark):
    got = _run(spark, ["héllo".encode("utf-16")], utf16=False)
    assert got[0] == ("utf-16le", None)


def test_empty_payload_is_ascii_empty(spark):
    got = _run(spark, [b""])
    assert got[0] == ("ascii", "")


def test_high_latin1_without_c1_is_iso(spark):
    # bytes only in A0-FF: no cp1252 tell, classify iso-8859-1
    got = _run(spark, [b"\xa1hola\xff"])
    assert got[0][0] == "iso-8859-1"


def test_detect_only_adds_single_column(spark):
    df = spark.createDataFrame([(1, b"abc")], "id int, payload binary")
    out = detect_charset(df)
    assert out.columns == ["id", "payload", "charset"]


def test_plan_stays_jvm_side(spark):
    from bigslice_spark.plans import explain_str
    df = spark.createDataFrame([(1, b"abc")], "id int, payload binary")
    plan = explain_str(decode_auto(df))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
