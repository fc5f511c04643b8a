"""Bloom-filter membership ops (operators/bloom.py) and the bloom
decontamination path (operators/decontam.py)."""

import pytest
from pyspark.sql import functions as F

from bigslice_spark.operators.bloom import (
    Bloom, bloom_anti_join, bloom_build, bloom_params, bloom_probe,
    bloom_semi_join)


def test_params_power_of_two_and_sane_k():
    m, k = bloom_params(1000, fpp=0.01)
    assert m & (m - 1) == 0 and m >= 1000
    assert 1 <= k <= 16


def test_params_cap_raises():
    with pytest.raises(ValueError):
        bloom_params(10**12, fpp=0.0001, max_bits=1 << 20)


def test_no_false_negatives(spark):
    keys = spark.range(500).select(
        F.concat(F.lit("key_"), F.col("id")).alias("k"))
    bloom = bloom_build(keys, "k", fpp=0.01)
    probed = bloom_probe(keys, "k", bloom)
    assert probed.filter(~F.col("__bloom_maybe")).count() == 0


def test_false_positive_rate_in_band(spark):
    ins = spark.range(2000).select(
        F.concat(F.lit("in_"), F.col("id")).alias("k"))
    outs = spark.range(20000).select(
        F.concat(F.lit("out_"), F.col("id")).alias("k"))
    bloom = bloom_build(ins, "k", fpp=0.01)
    fp = bloom_probe(outs, "k", bloom) \
        .filter(F.col("__bloom_maybe")).count()
    # target 1%; allow generous slack for a 20k sample
    assert fp / 20000 < 0.05, fp


def test_semi_and_anti_join_are_exact(spark):
    big = spark.range(3000).select(
        F.concat(F.lit("k"), (F.col("id") % 900)).alias("k"),
        F.col("id").alias("v"))
    small = spark.range(300).select(
        F.concat(F.lit("k"), (F.col("id") * 3)).alias("k"))
    want_semi = big.join(small.distinct(), "k", "semi")
    want_anti = big.join(small.distinct(), "k", "anti")
    got_semi = bloom_semi_join(big, small, "k", fpp=0.05)
    got_anti = bloom_anti_join(big, small, "k", fpp=0.05)
    assert got_semi.exceptAll(want_semi).count() == 0
    assert want_semi.exceptAll(got_semi).count() == 0
    assert got_anti.exceptAll(want_anti).count() == 0
    assert want_anti.exceptAll(got_anti).count() == 0


def test_decontaminate_bloom_matches_broadcast_path(spark, tables):
    from bigslice_spark.operators.decontam import (
        contamination_report, contamination_report_bloom,
        decontaminate, decontaminate_bloom)
    docs = tables["documents"]
    ev = docs.filter(F.col("doc_id") % 17 == 0)
    tr = docs.filter(F.col("doc_id") % 17 != 0)
    a = contamination_report(tr, ev, ngram_w=3, min_shared=2)
    b = contamination_report_bloom(tr, ev, ngram_w=3, min_shared=2,
                                   fpp=0.05)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    da = decontaminate(tr, ev, ngram_w=3, min_shared=2)
    db = decontaminate_bloom(tr, ev, ngram_w=3, min_shared=2, fpp=0.05)
    assert da.count() == db.count()
    assert da.select("doc_id").exceptAll(db.select("doc_id")).count() == 0


def test_probe_sends_only_hashes_to_python(spark):
    from bigslice_spark.plans import explain_str
    keys = spark.range(50).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"))
    bloom = bloom_build(keys, "k", fpp=0.01)
    plan = explain_str(bloom_probe(keys, "k", bloom))
    assert "ArrowEvalPython" in plan
    # the Arrow node's inputs are the two xxhash64 exprs, not the key
    arrow = [ln for ln in plan.splitlines() if "ArrowEvalPython" in ln
             or "xxhash64" in ln.lower()]
    assert any("xxhash64" in ln.lower() for ln in arrow), plan[:800]


def test_empty_build_side(spark):
    # an empty filter set: probe is all-False (all-zero bits), so the
    # semi join is empty and the anti join passes everything through
    from pyspark.sql import functions as F
    big = spark.range(100).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"))
    small = big.filter(F.lit(False))
    assert bloom_semi_join(big, small, "k").count() == 0
    assert bloom_anti_join(big, small, "k").count() == 100


def test_probe_reuses_one_broadcast_per_instance(spark):
    from pyspark.sql import functions as F
    from bigslice_spark.operators.bloom import bloom_build, bloom_probe
    keys = spark.range(64).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"))
    bloom = bloom_build(keys, "k", fpp=0.01)
    assert bloom._bc is None
    a = bloom_probe(keys, "k", bloom)
    bc1 = bloom._bc
    b = bloom_probe(keys, "k", bloom)
    assert bloom._bc is bc1            # second probe reused it
    assert a.filter("__bloom_maybe").count() == 64
    assert b.filter("__bloom_maybe").count() == 64
    bloom.unpersist()
    assert bloom._bc is None
    # probing again after unpersist re-broadcasts transparently
    c = bloom_probe(keys, "k", bloom)
    assert bloom._bc is not None and bloom._bc is not bc1
    assert c.filter("__bloom_maybe").count() == 64
