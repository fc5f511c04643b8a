"""Exact global order statistics without the single-partition trap.

A naive ``row_number() OVER (ORDER BY x)`` has no PARTITION BY, so
Spark plans a single-partition sort — one task owns the whole table
(the same hazard packing.py documents for the global prefix sum, and
the reason every 100 TB "sort the corpus" step must be range-based).
global_rank computes the identical 1-based rank with the two-level
scan instead:

1. range-partition on the order columns (partition order == key
   order), pin the partitioning with an eager materialize (the
   partition id feeds two subtrees; lazy recomputation could
   re-sample range boundaries);
2. row_number WITHIN each partition — distributed windows;
3. per-partition counts → one window over #partitions METADATA rows
   yields each partition's global offset;
4. broadcast offsets back: rank = local row_number + offset.

``order_cols`` must be a TOTAL order (append a unique tiebreaker id) —
with ties the rank of equal keys would depend on which side of a range
boundary they land.

equidepth_histogram builds on it: exact k-quantile buckets
(bucket = (rank-1)·k div n) with per-bucket count/min/max — the
distribution profile where every bucket holds the same row count,
complementing the fixed-width price_histogram entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..checkpoint import materialize


def _ranked(df: DataFrame, order_cols: list[str],
            rank_col: str) -> tuple[DataFrame, DataFrame]:
    """(ranked rows, per-partition counts (__pid, __n)) — the counts
    frame is metadata-sized, so totals derive from it without a second
    pass over the ranked data."""
    cols = [F.col(c) for c in order_cols]
    part = (df.repartitionByRange(*cols)
            .withColumn("__pid", F.spark_partition_id()))
    part = materialize(part)
    local = part.withColumn(
        "__rn", F.row_number().over(
            W.partitionBy("__pid").orderBy(*cols)))
    counts = part.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    poff = (counts
            .withColumn("__off", F.coalesce(
                F.sum("__n").over(
                    W.orderBy("__pid")
                    .rowsBetween(W.unboundedPreceding, -1)),
                F.lit(0)))
            .select("__pid", "__off"))
    ranked = (local.join(F.broadcast(poff), on="__pid")
              .withColumn(rank_col,
                          (F.col("__rn") + F.col("__off")).cast("long"))
              .drop("__pid", "__rn", "__off"))
    return ranked, counts


def global_rank(df: DataFrame, order_cols: list[str],
                rank_col: str = "rank") -> DataFrame:
    """Input columns + ``rank_col``: exact 1-based global rank in
    ``order_cols`` order, computed with range partitioning + two-level
    offsets (no single-partition sort anywhere in the plan)."""
    ranked, _ = _ranked(df, order_cols, rank_col)
    return ranked


def equidepth_histogram(df: DataFrame, val_col: str,
                        tiebreak_col: str, k: int = 10) -> DataFrame:
    """(bucket, n_rows, lo, hi): exact equi-depth histogram of
    ``val_col`` in ``k`` buckets — every bucket holds n/k (±1) rows;
    ``lo``/``hi`` are the bucket's min/max values (untouched doubles,
    so cross-engine exact). ``tiebreak_col`` must be unique."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    ranked, counts = _ranked(df.select(val_col, tiebreak_col),
                             [val_col, tiebreak_col], "rank")
    # total from the metadata-sized partition counts — never a second
    # aggregation pass over the ranked table rows
    n = counts.agg(F.sum("__n").alias("__total__"))
    return (ranked.join(F.broadcast(n))
            .withColumn("bucket", F.expr(
                f"((rank - 1) * {int(k)}) div __total__").cast("long"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min(val_col).alias("lo"),
                 F.max(val_col).alias("hi")))


def key_percentiles(df: DataFrame, key_col: str, val_col: str,
                    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
                    order_cols: list[str] | None = None) -> DataFrame:
    """EXACT per-key percentiles: for each key, the value at ascending
    rank ceil(p·n) (the lower nearest-rank definition — integer-exact,
    no interpolation, engine-neutral). One window exchange computes
    rank and count together; one aggregation picks the target rows.
    The per-key latency-band report (p50/p90/p99) at any scale — the
    complement of the GLOBAL equidepth_histogram path.
    """
    from pyspark.sql import Window as W
    order = [F.col(val_col)] + [F.col(c) for c in (order_cols or [])]
    w = W.partitionBy(key_col).orderBy(*order)
    wc = W.partitionBy(key_col)
    base = df.select(F.col(key_col),
                     F.col(val_col).cast("double").alias("__v"),
                     F.row_number().over(w).alias("__rn"),
                     F.count(F.lit(1)).over(wc).alias("__n"))
    aggs = [F.max("__n").cast("long").alias("n")]
    for p in ps:
        target = F.ceil(F.lit(float(p)) * F.col("__n").cast("double"))
        name = f"p{str(p)[2:].ljust(2, '0')}"
        aggs.append(F.max(F.when(F.col("__rn") == target,
                                 F.col("__v"))).alias(name))
    return base.groupBy(key_col).agg(*aggs)


def winsorize(df: DataFrame, key_col: str, val_col: str,
              id_col: str, lo: float = 0.05,
              hi: float = 0.95) -> DataFrame:
    """Per-key winsorization: clamp each value into its own key's
    exact [p_lo, p_hi] band (nearest-rank percentiles, as
    key_percentiles) — the outlier-taming step before averaging noisy
    per-user metrics or training on bounded features.

    Zero extra shuffles beyond the one rank window: the band edges are
    whole-partition window aggregates over the SAME key partitioning
    (max-over-key of the rank-picked values), and the clamp is a
    projection.
    """
    from pyspark.sql import Window as W
    w = W.partitionBy(key_col).orderBy(F.col(val_col), F.col(id_col))
    wk = W.partitionBy(key_col)
    v = F.col(val_col).cast("double")
    rn = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wk)
    base = df.select(F.col(key_col), F.col(id_col), v.alias("__v"),
                     rn.alias("__rn"), n.alias("__n"))
    def edge(p):
        target = F.ceil(F.lit(float(p)) * F.col("__n").cast("double"))
        return F.max(F.when(F.col("__rn") == target,
                            F.col("__v"))).over(wk)
    lo_v, hi_v = edge(lo), edge(hi)
    return base.select(
        key_col, id_col, F.col("__v").alias("value"),
        F.least(F.greatest(F.col("__v"), lo_v), hi_v)
        .alias("value_w"))
