"""Sketch-based operators with exact, deterministic outputs.

heavy_hitters: find every token whose frequency is ≥ phi·N without a
full-vocabulary shuffle — the φ-heavy-hitters problem at corpus scale.

Two phases, the classic sketch-then-verify shape:

1. CANDIDATES — per-partition Misra-Gries summaries with
   k = ceil(2/phi) counters, via mapInPandas (pandas value_counts,
   trimmed to the top k). Merging MG summaries preserves the
   deficiency bound: any item with true count ≥ N/k survives in at
   least one partition summary, so the union of per-partition outputs
   is a SUPERSET of the φ-heavy hitters (k ≥ 2/φ gives margin). The
   candidate set is bounded by partitions × k rows — thousands, not
   the vocabulary.
2. VERIFY — broadcast the candidate set, filter the token stream to
   candidates, count EXACTLY, keep count ≥ phi·N (N in-plan as a
   1-row broadcast). The output is therefore exact and independent of
   partitioning — the sketch only bounds the work, never the answer —
   which is what makes the operator oracle-checkable
   (HAVING count >= phi*N) unlike a raw approximate sketch.

At 100 TB: phase 1 is a map-only pass emitting O(parts·k) rows; phase
2 shuffles only candidate tokens (≤ 2/φ distinct values). A full
groupBy(token) would shuffle the entire vocabulary instead.
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def heavy_hitters(df: DataFrame, phi: float = 0.01,
                  text_col: str = "text") -> DataFrame:
    """All tokens with frequency ≥ phi of total token count, with their
    EXACT counts — (token, n, freq). freq = n/N double, engine-exact
    from two integers."""
    if not 0.0 < phi <= 1.0:
        raise ValueError(f"phi out of (0,1]: {phi}")
    k = int(math.ceil(2.0 / phi))

    toks = df.select(F.explode(tokens(text_col)).alias("tok"))

    def mg_partial(batches: Iterator["object"]) -> Iterator["object"]:
        # Batched Misra-Gries via the mergeable-summaries combine
        # (Agarwal et al.): each Arrow batch's exact value_counts is
        # itself a summary; merge = add counts, then subtract the
        # (k+1)-th largest count from all and trim to k. Work per batch
        # is O(unique tokens) vectorized pandas, never O(rows) Python —
        # the map-only pass stays fast at any batch size. The combine
        # keeps total deficiency ≤ N_p/(k+1), so the candidate
        # guarantee is unchanged.
        import pandas as pd
        acc = pd.Series(dtype="int64")
        for pdf in batches:
            acc = acc.add(pdf["tok"].value_counts(), fill_value=0)
            if len(acc) > k:
                acc = acc.sort_values(ascending=False)
                acc = (acc - acc.iloc[k]).iloc[:k]
                acc = acc[acc > 0]
        yield pd.DataFrame({"tok": acc.index.astype(str)})

    cand = toks.mapInPandas(mg_partial, schema="tok string").distinct()
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    exact = (toks.join(F.broadcast(cand), on="tok")
             .groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
             .crossJoin(F.broadcast(total))
             .filter(F.col("n").cast("double")
                     >= F.lit(phi) * F.col("n_total").cast("double")))
    return exact.select(
        F.col("tok"), F.col("n"),
        (F.col("n").cast("double") / F.col("n_total").cast("double"))
        .alias("freq"))
