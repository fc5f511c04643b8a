"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as the scalable union-sort pattern, NOT a per-group pandas
merge_asof: tag both sides, union, single shuffle+sort on (key, ts), then
`last(..., ignorenulls)` over the running window carries the most recent
right-side row forward onto each left row. One exchange, no broadcast
requirement on either side, skew handled by AQE.

Tie policy: at equal timestamps the right row sorts BEFORE the left row
(strict=False ⇒ right value at ts==t matches a left row at t; strict=True
excludes equal timestamps, like `>` vs `>=`). Among multiple RIGHT rows
sharing the exact same (key, ts), the carried row is UNSPECIFIED (a
distributed shuffle has no input order to preserve, so pandas
merge_asof's "last input row wins" is not reproducible); disambiguate
upstream (aggregate duplicates, or fold a sequence number into the
timestamp) when such ties are possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str, right_ts: str,
              value_cols: list[str] | None = None,
              strict: bool = False,
              direction: str = "backward",
              tolerance: float | None = None) -> DataFrame:
    """For each left row, attach the nearest right row matching on
    ``on``: direction="backward" (default) takes the latest right row
    with right_ts <= left_ts (< if strict); direction="forward" takes
    the EARLIEST right row with right_ts >= left_ts (> if strict) —
    same union-sort-carry plan with the timestamp order flipped.

    ``tolerance`` (seconds, timestamp columns required): a match
    farther than this from the left timestamp is rejected — values
    come back NULL, exactly pandas merge_asof's tolerance semantics.
    Pure post-filter on the carried row; the plan is unchanged."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, "
                         f"got {direction!r}")
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_ts)]
    lcols = left.columns

    l_tag = left.withColumn("__ts__", F.col(left_ts)) \
        .withColumn("__side__", F.lit(1))
    for c in value_cols:
        if c not in l_tag.columns:
            l_tag = l_tag.withColumn(c, F.lit(None))
    # a right row with NULL ts satisfies no inequality — drop it here
    # (left rows with NULL ts sort before everything via *_nulls_first
    # below, see no right rows, and correctly emit NULL values)
    r_tag = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(on), F.col(right_ts).alias("__ts__"),
        *[F.col(c) for c in value_cols]) \
        .withColumn("__side__", F.lit(0 if not strict else 2))
    for c in lcols:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None))

    u = l_tag.select(*lcols, "__ts__", "__side__", *value_cols) \
        .unionByName(r_tag.select(*lcols, "__ts__", "__side__",
                                  *value_cols))
    # side 0 sorts before 1 at equal ts (inclusive); side 2 after (strict)
    ts_ord = F.col("__ts__").asc_nulls_first() \
        if direction == "backward" else F.col("__ts__").desc_nulls_first()
    w = (W.partitionBy(on).orderBy(ts_ord, "__side__")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    # Carry the nearest right row ATOMICALLY as one struct — timestamp
    # and every value column come from the same right row, exactly like
    # pandas merge_asof / DuckDB ASOF JOIN (a NULL in the nearest row's
    # value column stays NULL; it is never backfilled from an older
    # row, which per-column last(..., ignorenulls) would wrongly do —
    # and the tolerance gate then provably checks the same row it
    # accepts). One window expression instead of N+1.
    row = F.last(
        F.when(F.col("__side__") != 1,
               F.struct(F.col("__ts__").alias("__rts__"),
                        *[F.col(c).alias(c) for c in value_cols])),
        True).over(w)
    carried = u.select(*lcols, "__ts__",
                       F.col("__side__").alias("__side__"),
                       row.alias("__r__"))
    out = carried.filter(F.col("__side__") == 1)
    ok = F.col("__r__").isNotNull()
    if tolerance is not None:
        gap = F.unix_micros("__ts__") \
            - F.unix_micros(F.col("__r__").getField("__rts__"))
        if direction == "forward":
            gap = -gap
        ok = ok & (gap <= int(tolerance * 1_000_000))
    return out.select(
        *lcols,
        *[F.when(ok, F.col("__r__").getField(c)).alias(c)
          for c in value_cols])
