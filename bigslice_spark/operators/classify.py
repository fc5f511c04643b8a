"""Linear model scoring over hashed bag-of-words features — the
fasttext-style quality-classifier pass every LLM data pipeline runs
(score each document with a trained linear model, filter on the
score). Training happens offline; this operator is the 100 TB
INFERENCE path.

Shape: explode tokens → feature id = hash(token) mod dim → broadcast
hash join against the (feature, weight) model → per-document sum +
count → score = bias + Σw / n_tokens (mean pooling, fasttext's
default). The model is a few thousand rows and ALWAYS broadcasts; the
corpus meets it map-side, so the operator's only exchange is the final
per-document aggregation — and map-side partial aggregation collapses
that to ~one row per document before the shuffle (gated in
tests/test_plans.py).

Everything is codegen: the token hash is the same xxhash64 /
md5-portable pair as the dedup family, so with ``portable=True`` the
whole scoring pass replays bit-identically in ANSI SQL. (For the
oracle, exactness also needs order-independent double sums — give the
model dyadic-rational weights, e.g. k/1024, and Σw is exact in IEEE
double regardless of reduction order; see the ``classify_score``
registry entry.)

Reference: no analog in bigslice; part of the LLM-pipeline surface
this engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _tok_hash31
from .text import tokens


def hashed_features(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", dim: int = 1024,
                    portable: bool = False) -> DataFrame:
    """(id_col, feature): one row per token OCCURRENCE (bag semantics —
    a token appearing 3× contributes its feature 3×)."""
    toks = df.select(F.col(id_col),
                     F.explode(tokens(text_col)).alias("tok"))
    return toks.select(id_col,
                       F.pmod(_tok_hash31(portable), F.lit(dim))
                       .cast("long").alias("feature"))


def score_documents(df: DataFrame, weights: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id",
                    dim: int = 1024, bias: float = 0.0,
                    link: str | None = None,
                    portable: bool = False) -> DataFrame:
    """(id_col, n_tokens, score): mean-pooled linear score per document.

    ``weights`` is a (feature: long, weight: double) model — broadcast,
    never shuffled. Tokens hashing to a feature absent from the model
    contribute weight 0 but still count toward ``n_tokens`` (mean
    pooling divides by ALL tokens, matching fasttext). ``link`` None
    returns the raw logit; ``"logistic"`` applies the sigmoid (keep
    None when replaying against an oracle — transcendental libm calls
    are not bit-stable across engines)."""
    feats = hashed_features(df, text_col, id_col, dim, portable)
    w = F.broadcast(weights.select(F.col("feature"),
                                   F.col("weight").cast("double")))
    per = (feats.join(w, on="feature", how="left")
           .groupBy(id_col)
           .agg(F.sum(F.coalesce(F.col("weight"), F.lit(0.0)))
                .alias("__sw"),
                F.count(F.lit(1)).alias("n_tokens")))
    score = F.lit(float(bias)) + F.col("__sw") / F.col("n_tokens")
    if link == "logistic":
        score = F.lit(1.0) / (F.lit(1.0) + F.exp(-score))
    elif link is not None:
        raise ValueError(f"unknown link: {link}")
    return per.select(id_col, "n_tokens", score.alias("score"))


def demo_weights(spark, dim: int = 1024) -> DataFrame:
    """A deterministic dyadic-rational model for tests and oracle
    replay: weight_j = (md5-derived hash of str(j) mod 2001 − 1000) /
    1024 ∈ [−0.977, 0.977], exactly representable in double."""
    r = spark.range(dim).toDF("feature")
    h = F.conv(F.substring(F.md5(F.col("feature").cast("string")), 1, 15),
               16, 10).cast("long")
    return r.select("feature",
                    ((F.pmod(h, F.lit(2001)) - 1000) / F.lit(1024.0))
                    .alias("weight"))
