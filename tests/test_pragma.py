"""Pragma directives (reference slice.go:107-200): Procs/Exclusive/
Materialize, composition semantics, and the concurrency-capping
mechanics on real plans."""

import pytest
from pyspark.sql import functions as F

from bigslice_spark import Exclusive, Materialize, Pragma, Procs, Slice
from bigslice_spark.pragma import (apply_pragma, concurrency_cap,
                                   total_cores)


def test_composition_mirrors_reference():
    """Pragmas compose as max(procs) / or(exclusive) / or(materialize)
    — slice.go:122-155."""
    p = Procs(2) | Procs(6) | Materialize
    assert (p.procs, p.exclusive, p.materialize) == (6, False, True)
    q = p | Exclusive
    assert q.exclusive and q.materialize and q.procs == 6
    assert Procs(1) == Pragma()
    with pytest.raises(ValueError):
        Procs(0)


def test_concurrency_cap_local(spark):
    cores = total_cores(spark)
    assert concurrency_cap(spark, Pragma()) is None  # no directive
    assert concurrency_cap(spark, Procs(4)) == cores // 4
    # exclusive = one task per machine; local mode is one machine
    assert concurrency_cap(spark, Exclusive) == 1
    # clamped to machine procs like the reference (slice.go:190-200)
    assert concurrency_cap(spark, Procs(10 ** 6)) == 1


def test_procs_caps_fn_stage_partitions(spark):
    """A Procs(n) map_ fn-stage must run over total_cores//n partitions
    — that's the concurrency cap mechanism."""
    df = spark.range(10_000).selectExpr("id", "id % 7 AS k")
    want_parts = total_cores(spark) // 4
    s = Slice(df, prefix=1).map_(
        fn=lambda pdf: pdf.assign(id=pdf.id * 2),
        schema="id long, k long", pragma=Procs(4))
    assert s.df.rdd.getNumPartitions() == want_parts
    base = Slice(df, prefix=1).map_(
        fn=lambda pdf: pdf.assign(id=pdf.id * 2),
        schema="id long, k long")
    assert sorted(map(tuple, s.df.collect())) \
        == sorted(map(tuple, base.df.collect()))


def test_exclusive_fold_single_group_stage(spark):
    """Exclusive on a grouped fold: the applyInPandas stage runs over
    num_executors partitions (1 in local), with NO extra exchange beyond
    the capped one (repartition(cap, keys) satisfies the grouping
    distribution)."""
    df = spark.range(1_000).selectExpr("id % 5 AS k", "id AS v")

    def summed(key, pdf):
        import pandas as pd
        return pd.DataFrame([{"k": key[0], "s": int(pdf.v.sum())}])

    s = Slice(df, prefix=1).fold(fn=summed, schema="k long, s long",
                                 pragma=Exclusive)
    assert s.df.rdd.getNumPartitions() == 1
    plan = s.df._jdf.queryExecution().executedPlan().toString() \
        .split("== Initial Plan ==")[0]  # AQE prints both plans
    assert plan.count("Exchange") == 1, plan
    got = {r["k"]: r["s"] for r in s.df.collect()}
    want = {r["k"]: r["s"] for r in
            df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    assert got == want


def test_materialize_pragma_cuts_lineage(spark):
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    out = apply_pragma(df, Materialize)
    assert "LogicalRDD" in \
        out._jdf.queryExecution().optimizedPlan().toString()
    assert out.count() == 100
