"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD'03 — the MOSS algorithm): hash every token k-gram, slide a
window of ``window`` consecutive k-gram hashes over each document, and
select the minimum of each window (ties → rightmost). The selected
(hash, position) set is a compact, position-aware fingerprint with the
winnowing guarantee: any shared run of ``window + k - 1`` tokens
between two documents yields at least one shared selected hash.

Spark-first shape — everything stays in whole-stage codegen and ONE
exchange does all the per-document work:

* k-gram rows via the posexplode + window ``lead`` path (the measured
  fast path, see dedup._shingle_rows), KEEPING the gram position;
* the winnowing selection is ``min(struct(hash, -pos))`` over a
  forward ROWS window — struct ordering compares hash first, then
  ``-pos``, which encodes the rightmost-min tie-break declaratively
  (no stateful scan, unlike the paper's imperative formulation);
* both windows share ``(id, pos)`` clustering, so Catalyst plans one
  exchange + one sort for the whole operator; the trailing
  ``distinct`` on narrow (id, hash, pos) rows is the only other
  shuffle (gated in tests/test_plans.py).

``portable=True`` swaps xxhash64 for the md5-derived 60-bit hash so
the whole pipeline replays bit-identically in ANSI SQL (the DuckDB
oracle for the ``winnow`` registry entry).

Reference: bigslice has no fingerprinting operator (this is part of
the LLM-pipeline surface this engine adds); the algorithm follows the
published paper only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .dedup import _tok_hash31
from .text import tokens


def _kgram_rows(df: DataFrame, text_col: str, id_col: str,
                k: int) -> DataFrame:
    """(id, pos, tok, n_grams) positional token k-grams; documents
    shorter than k tokens yield their whole text as the single gram at
    pos 0 (mirrors dedup._shingle_rows, which drops positions)."""
    t = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    t = t.select(id_col, F.size("__toks").alias("__n"),
                 F.array_join("__toks", " ").alias("__all"),
                 F.posexplode_outer("__toks").alias("__pos", "__tok"))
    wspec = W.partitionBy(id_col).orderBy("__pos")
    parts = [F.col("__tok")] + [F.lead("__tok", j).over(wspec)
                                for j in range(1, k)]
    ann = t.withColumn("__sh", F.concat_ws(" ", *parts))
    keep = (((F.col("__n") >= k) & (F.col("__pos") <= F.col("__n") - k))
            | ((F.col("__n") < k)
               & (F.col("__pos").isNull() | (F.col("__pos") == 0))))
    val = F.when(F.col("__n") >= k, F.col("__sh")).otherwise(F.col("__all"))
    n_grams = F.greatest(F.col("__n") - (k - 1), F.lit(1))
    return (ann.filter(keep)
            .select(id_col,
                    F.coalesce(F.col("__pos"), F.lit(0)).alias("pos"),
                    val.alias("tok"),
                    n_grams.cast("long").alias("__P")))


def winnow_fingerprints(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        window: int = 4,
                        portable: bool = False) -> DataFrame:
    """(id_col, fp, fp_pos): the winnowing-selected k-gram hashes and
    the token position each was taken from. Deterministic: ties inside
    a window go to the rightmost occurrence."""
    if k < 1 or window < 1:
        raise ValueError(f"k and window must be >= 1, got {k}, {window}")
    kg = _kgram_rows(df, text_col, id_col, k)
    kg = kg.withColumn("h", _tok_hash31(portable))
    wwin = (W.partitionBy(id_col).orderBy("pos")
            .rowsBetween(W.currentRow, window - 1))
    sel = F.min(F.struct(F.col("h"), (-F.col("pos")).alias("np"))).over(wwin)
    ann = kg.withColumn("__sel", sel)
    # valid window starts: pos ∈ [0, P - window]; if the doc has fewer
    # grams than the window, the whole doc is one (truncated) window
    valid = F.col("pos") <= F.greatest(F.col("__P") - window, F.lit(0))
    return (ann.filter(valid)
            .select(id_col, F.col("__sel.h").alias("fp"),
                    (-F.col("__sel.np")).cast("long").alias("fp_pos"))
            .distinct())


def winnow_pairs(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", k: int = 3, window: int = 4,
                 min_shared: int = 2,
                 portable: bool = False) -> DataFrame:
    """(id_a, id_b, n_shared): document pairs sharing at least
    ``min_shared`` distinct selected fingerprints — the MOSS-style
    match report. Inverted-index self-join on the fingerprint hash
    (never all-pairs): at 100 TB the join carries only the selected
    ~1/window fraction of 16-byte (id, hash) rows."""
    fps = winnow_fingerprints(df, text_col, id_col, k, window,
                              portable).select(id_col, "fp").distinct()
    a = fps.toDF("id_a", "fp")
    b = fps.toDF("id_b", "fp")
    return (a.join(b, on="fp")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared))
