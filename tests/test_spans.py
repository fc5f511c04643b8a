"""Duplicate-span detection/removal (operators/spans.py)."""

import pytest

from bigslice_spark.operators.spans import dup_span_report, strip_dup_spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _report(spark, rows, **kw):
    out = dup_span_report(_docs(spark, rows), w=kw.pop("w", 3), **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_shared_boilerplate_detected(spark):
    # 5-token boilerplate shared by two docs, w=3 -> 3 dup windows
    # each, covering exactly the 5 boilerplate positions as ONE span.
    boiler = "all rights reserved worldwide inc"
    rows = [(1, "alpha beta gamma " + boiler),
            (2, "delta epsilon " + boiler),
            (3, "zeta eta theta iota kappa")]
    rep = _report(spark, rows)
    assert rep[1]["n_dup_windows"] == 3
    assert rep[1]["dup_tokens"] == 5
    assert rep[1]["n_dup_spans"] == 1
    assert rep[1]["n_tokens"] == 8
    assert rep[1]["dup_frac"] == pytest.approx(5 / 8)
    assert rep[2]["dup_tokens"] == 5
    assert rep[3]["n_dup_windows"] == 0
    assert rep[3]["dup_tokens"] == 0
    assert rep[3]["dup_frac"] == 0.0


def test_within_doc_repetition_counts(spark):
    # the same window repeated INSIDE one document is a repeat too
    rows = [(1, "x y z q r x y z"), (2, "totally unrelated words here")]
    rep = _report(spark, rows)
    # 'x y z' occurs at pos 0 and pos 5 -> both starts flagged,
    # coverage = {0,1,2} + {5,6,7} = 6 tokens, two islands
    assert rep[1]["n_dup_windows"] == 2
    assert rep[1]["dup_tokens"] == 6
    assert rep[1]["n_dup_spans"] == 2


def test_overlapping_windows_merge_into_one_span(spark):
    # 'a b c d' shared -> windows at 0 and 1 overlap -> one 4-token span
    rows = [(1, "a b c d tail1"), (2, "a b c d tail2")]
    rep = _report(spark, rows)
    assert rep[1]["n_dup_windows"] == 2
    assert rep[1]["dup_tokens"] == 4
    assert rep[1]["n_dup_spans"] == 1


def test_short_docs_report_zero(spark):
    rows = [(1, "one two"), (2, "one two"), (3, "one two three four")]
    rep = _report(spark, rows)
    # docs 1/2 are < w tokens: no window can exist, zero duplication
    assert rep[1]["n_dup_windows"] == 0
    assert rep[1]["dup_tokens"] == 0
    assert rep[1]["n_tokens"] == 2
    assert rep[3]["n_dup_windows"] == 0


def test_empty_doc_drops_out(spark):
    rep = _report(spark, [(1, ""), (2, "a b c")])
    assert 1 not in rep and 2 in rep


def test_min_count_threshold(spark):
    rows = [(1, "p q r s"), (2, "p q r t"), (3, "p q r u")]
    # 'p q r' occurs 3 times
    rep3 = _report(spark, rows, min_count=3)
    assert rep3[1]["n_dup_windows"] == 1
    rep4 = _report(spark, rows, min_count=4)
    assert rep4[1]["n_dup_windows"] == 0


def test_strip_removes_spans_keeps_order(spark):
    boiler = "all rights reserved worldwide inc"
    rows = [(1, "alpha beta " + boiler + " gamma delta"),
            (2, "epsilon " + boiler)]
    out = strip_dup_spans(_docs(spark, rows), w=3)
    d = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert d[1]["clean_text"] == "alpha beta gamma delta"
    assert d[1]["dup_tokens"] == 5
    assert d[2]["clean_text"] == "epsilon"


def test_strip_fully_duplicated_doc_yields_empty(spark):
    rows = [(1, "c o p y p a s t a"), (2, "c o p y p a s t a")]
    out = strip_dup_spans(_docs(spark, rows), w=3)
    d = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert d[1]["clean_text"] == "" and d[1]["dup_tokens"] == 9


def test_plan_stays_jvm_side(spark):
    from bigslice_spark.plans import explain_str
    rows = [(1, "a b c d"), (2, "a b c d")]
    df = dup_span_report(_docs(spark, rows), w=3)
    plan = explain_str(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
