"""Declarative data-quality checks — the pipeline guardrail.

``data_checks`` evaluates a dict of named boolean expectations over a
table in ONE aggregation pass (conditional partial-agg sums — no per
check scan, no shuffle beyond the single global agg) and returns one
row per check: (check, n_violations, n_rows). A row violates a check
when the expectation is NOT TRUE for it — i.e. FALSE or NULL, so a
null in a checked column counts as a violation unless the expectation
handles it explicitly.

This is the batch CI gate for a 100 TB corpus build: run it on every
snapshot version before publishing (compose with upsert's `_SUCCESS`
protocol), alert on any n_violations > 0.

Reference: no analog in bigslice (closest: user asserts inside map
funcs); standard data-quality tooling re-expressed as one Spark agg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _stacked(wide: DataFrame, labels: list[str], per_label_cols: int,
             out_cols: list[str]) -> DataFrame:
    """stack() the positional __c{i}_{j} columns of a 1-row frame into
    one row per label. Labels ride as escaped string LITERALS and the
    value columns are positional, so arbitrary user-supplied names
    (dashes, spaces, quotes) never reach an identifier position."""
    cells = []
    for i, label in enumerate(labels):
        lit = "'" + label.replace("\\", "\\\\").replace("'", "\\'") + "'"
        cells.append(", ".join(
            [lit] + [f"__c{i}_{j}" for j in range(per_label_cols)]))
    return wide.select(
        F.expr(f"stack({len(labels)}, {', '.join(cells)}) "
               f"AS ({', '.join(out_cols)})"),
        F.col("__n"))


def data_checks(df: DataFrame,
                checks: dict[str, Column]) -> DataFrame:
    """(check, n_violations, n_rows) per named expectation, computed
    in a single scan + single 1-row aggregation. Output is
    driver-tiny (one row per check) by construction. Check names are
    arbitrary strings (carried as literals, never identifiers)."""
    if not checks:
        raise ValueError("no checks given")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, cond in enumerate(checks.values()):
        aggs.append(F.sum(F.when(cond, 0).otherwise(1))
                    .alias(f"__c{i}_0"))
    wide = df.agg(*aggs)
    return (_stacked(wide, list(checks), 1, ["check", "n_violations"])
            .select("check",
                    F.col("n_violations").cast("long"),
                    F.col("__n").cast("long").alias("n_rows")))


def table_profile(df: DataFrame, cols: list[str],
                  rsd: float | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct) per profiled column — the
    describe()-style observability report as data. Exact distincts by
    default (the result feeds data_checks-style gates, and the
    single-agg form costs one (ncols+1)-way Expand pass); pass
    ``rsd=`` (e.g. 0.02) to profile with approx_count_distinct
    instead — the HLL buffers avoid the Expand entirely (one plain
    pass whatever the column count), which is the right trade at
    100 TB where the Expand multiplies the scan by ncols+1 and ±2%
    cardinality is plenty for a profile. All counts integer, so
    cross-engine comparison is trivial in exact mode."""
    if not cols:
        raise ValueError("no columns given")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                    .alias(f"__c{i}_0"))
        nd = (F.countDistinct(F.col(c)) if rsd is None
              else F.approx_count_distinct(F.col(c), rsd))
        aggs.append(nd.alias(f"__c{i}_1"))
    wide = df.agg(*aggs)
    return (_stacked(wide, cols, 2,
                     ["column", "n_nulls", "n_distinct"])
            .select("column",
                    F.col("__n").cast("long").alias("n_rows"),
                    F.col("n_nulls").cast("long"),
                    F.col("n_distinct").cast("long")))
