"""Pure range (interval) joins — an operator family Spark lacks natively.

A join whose ONLY predicate is a range condition (`l.ts BETWEEN r.start
AND r.end`, no equi-key) plans as BroadcastNestedLoop/Cartesian in
Spark — quadratic work and a single-task hazard at 100TB. The scale
path is the classic binning rewrite (used by Databricks' range-join
optimization and Flink's interval join): quantize time into fixed-width
bins, explode each interval into the bins it covers, equi-join on the
bin id (hash shuffle, fully parallel), then apply the exact range
predicate as a residual filter. Work becomes O(|L| + |R| · bins_per
interval + matches), and the shuffle key (bin) is uniform by
construction — no skew even when intervals pile up.

Bin width is a knob: ≈ the median interval length is a good default
(≤2 bins per interval, few false candidates per bin).

The reference has no interval join (joins exist only via Cogroup,
cogroup.go:28-34); this extends the as-of family in operators/asof.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(left: DataFrame, right: DataFrame,
                  ts_col: str, start_col: str, end_col: str,
                  bin_seconds: int = 300,
                  end_exclusive: bool = True) -> DataFrame:
    """Join rows of `left` (point timestamps, `ts_col`) to rows of
    `right` (intervals [`start_col`, `end_col`]) with NO equi-key.

    Columns of both inputs are preserved; every (point, interval) match
    produces one output row. Intervals and points must be timestamps.
    """
    b = F.lit(bin_seconds)
    lb = left.withColumn(
        "__bin", (F.unix_timestamp(F.col(ts_col)) / b).cast("long"))
    rb = (right
          .withColumn("__bins", F.sequence(
              (F.unix_timestamp(F.col(start_col)) / b).cast("long"),
              (F.unix_timestamp(F.col(end_col)) / b).cast("long")))
          .withColumn("__bin", F.explode("__bins"))
          .drop("__bins"))
    upper: Column = (F.col(ts_col) < F.col(end_col)) if end_exclusive \
        else (F.col(ts_col) <= F.col(end_col))
    return (lb.join(rb, on="__bin")
            .filter((F.col(ts_col) >= F.col(start_col)) & upper)
            .drop("__bin"))
