"""Per-key time-series state folds.

ewma_last: the final exponentially-weighted moving average per key —
the standard online feature (user activity level, rolling quality
score) computed as a batch fold: s_0 = v_0, s_i = α·v_i + (1−α)·s_{i−1}
over the key's events in (ts, tiebreak...) order.

Scale shape: ONE aggregation exchange on the key; per-key state is the
key's own event list (collect_list → array_sort → left fold — the
pagerank ordered-mode pattern), so memory is bounded by the largest
single key, not the table. A hub key with hundreds of millions of
events would want a segmented scan instead (fold per day-partition,
then fold the per-segment states with the same recurrence re-weighted
by (1−α)^len — the recurrence is associative under that composition);
documented rather than built because the per-key list covers every
realistic user/document key.

Float portability: the fold is a left fold in a pinned order with
α forced to DOUBLE on both engines, so every intermediate double is
bitwise-reproducible by DuckDB's list_reduce (which also seeds with
the first element) — the same contract pagerank(ordered=True) pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ewma_last(df: DataFrame, key_col: str, ts_col: str, val_col: str,
              order_cols: list[str] | None = None,
              alpha: float = 0.3) -> DataFrame:
    """(key, n_events, ewma): final EWMA of ``val_col`` per key over
    rows in (``ts_col``, ``order_cols``...) order. ``order_cols``
    breaks timestamp ties deterministically (pass a unique id)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha out of (0,1]: {alpha}")
    a = float(alpha)
    tiebreak = [F.col(c).alias(f"o{i}")
                for i, c in enumerate(order_cols or [])]
    xs = F.array_sort(F.collect_list(F.struct(
        F.unix_micros(F.col(ts_col)).alias("t"), *tiebreak,
        F.col(val_col).cast("double").alias("v"))))
    fold = (f"aggregate(slice(__xs__, 2, size(__xs__) - 1), "
            f"CAST(__xs__[0].v AS DOUBLE), "
            f"(acc, x) -> CAST({a!r} AS DOUBLE) * x.v + "
            f"(CAST(1.0 AS DOUBLE) - CAST({a!r} AS DOUBLE)) * acc)")
    return (df.groupBy(key_col).agg(xs.alias("__xs__"))
            .select(F.col(key_col), F.size("__xs__").alias("n_events"),
                    F.expr(fold).alias("ewma")))
