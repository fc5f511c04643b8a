"""Statistical-LM quality scoring — the CCNet/KenLM-style filter with
an exactly-specified model.

Real pipelines score documents with a language-model perplexity and
drop the tails (CCNet trains KenLM on a reference corpus). A neural or
KenLM model is not reproducible across engines, so this module uses
the exactly-specified statistical analog: an add-one-smoothed BIGRAM
model trained on a reference corpus, scored as the per-document mean
log-probability

    avg_logprob(d) = mean over bigrams (w1,w2) of
                     ln((c12 + 1) / (c1 + V))

with integer corpus counts c12 (bigram), c1 (bigram-context = sum of
c12 over w1) and vocabulary size V — every input to ``ln`` is an exact
rational, so both engines evaluate the same doubles (ulp-level libm
agreement, far inside the driver's 1e-9 float normalization), and the
per-document SUM runs over ``decimal(38,12)``-cast addends so the
result does not depend on partial-aggregation order.

Scale shape: training is one explode + count aggregation (vocabulary-
scale shuffle, Zipf-bounded); scoring joins document bigrams to the
count table on the bigram key (shuffle equi-join), with V attached as
a broadcast 1-row aggregate. Train-on-self costs two corpus scans
(like heavy_hitters exact); pass ``ref=`` to train on a separate
reference corpus — the CCNet setup — and scan each side once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def _bigrams(df: DataFrame, text_col: str, id_col: str | None) -> DataFrame:
    """(id?, w1, w2) — adjacent token pairs per document."""
    tk = tokens(text_col)
    cols = ([F.col(id_col)] if id_col else []) + [tk.alias("__tk__")]
    base = df.select(*cols).filter(F.size("__tk__") >= 2)
    pair = F.explode(F.arrays_zip(
        F.slice("__tk__", 1, F.size("__tk__") - 1),
        F.slice("__tk__", 2, F.size("__tk__") - 1))).alias("p")
    out = base.select(*([F.col(id_col)] if id_col else []), pair)
    return out.select(*([id_col] if id_col else []),
                      F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))


def lm_quality(df: DataFrame, ref: DataFrame | None = None,
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(id_col, n_bigrams, avg_logprob) for every document with ≥ 1
    bigram: mean add-one-smoothed bigram log-probability under the
    model trained on ``ref`` (default: the corpus itself). Higher is
    more reference-like; filter the low tail for quality."""
    ref = df if ref is None else ref
    rb = _bigrams(ref, text_col, None)
    c12 = rb.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (ref.select(F.explode(tokens(text_col)).alias("w"))
             .agg(F.count_distinct("w").alias("V")))
    db = _bigrams(df, text_col, id_col)
    scored = (db.join(c12, on=["w1", "w2"], how="left")
              .join(c1, on="w1", how="left")
              .join(F.broadcast(vocab))
              .select(id_col, (
                  F.log((F.coalesce(F.col("c12"), F.lit(0)) + F.lit(1))
                        .cast("double")
                        / (F.coalesce(F.col("c1"), F.lit(0))
                           + F.col("V")).cast("double"))
                  .cast("decimal(38,12)")).alias("lp")))
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 (F.sum("lp").cast("double")
                  / F.count(F.lit(1))).alias("avg_logprob")))
