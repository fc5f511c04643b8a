"""Ordered-funnel analysis over event streams.

Classic product-analytics operator the reference cannot express without
hand-rolled cogroup plumbing (SURVEY.md §2.3 relational surface): for an
ordered list of step event-types, find for each user the earliest
timestamp of step i that occurs AT OR AFTER their chosen step i-1
timestamp — strict stage ordering, not mere presence.

Plan shape: conditional MIN aggregations per step over ONE hash
aggregation on user_id... is not possible (step i's minimum depends on
step i-1's choice), so the operator does k-1 self-refining passes over
the per-(user, step) minima — but crucially the heavy lifting is a
single groupBy(user, type) agg over the raw events (one shuffle of the
event table, reduced to ≤k rows per user); the step-chaining joins run
on that tiny aggregate, partitioned by the same user_id key (no further
exchange of event-scale data). At 100 TB of events this is one shuffle
of (user, type, ts-min) triples.

Greedy-earliest semantics: step₁ = min ts of type₁; stepᵢ = min ts of
typeᵢ that is ≥ stepᵢ₋₁. (Greedy choice is optimal here: an earlier
stepᵢ₋₁ never excludes a later stepᵢ candidate.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(events: DataFrame, steps: list[str],
           user_col: str = "user_id", type_col: str = "event_type",
           ts_col: str = "ts") -> DataFrame:
    """Per-user funnel timestamps: columns t1..tk (epoch µs, null once
    the funnel breaks) plus ``depth`` = number of completed steps.
    Users with no step-1 event are omitted (inner on step 1)."""
    # one shuffle: all candidate (user, step-index, ts) events, pre-min'd
    # per (user, step) is NOT enough for steps 2+ (the min must be
    # conditional on the previous step) — keep per-event rows but only
    # for the step types, which at funnel use is a small fraction
    ev = (events
          .filter(F.col(type_col).isin(*steps))
          .select(F.col(user_col).alias("u"),
                  F.col(type_col).alias("et"),
                  F.unix_micros(F.col(ts_col)).alias("us")))
    # step 1: unconditional min
    cur = (ev.filter(F.col("et") == steps[0])
           .groupBy("u").agg(F.min("us").alias("t1")))
    for i, st in enumerate(steps[1:], start=2):
        nxt = ev.filter(F.col("et") == st).select("u", "us")
        # min ts of this step ≥ previous step's ts; same u key both
        # sides → the join and re-agg cluster on the existing partition
        cand = (cur.join(nxt, on="u", how="left")
                .withColumn(
                    f"t{i}",
                    F.when(F.col("us") >= F.col(f"t{i-1}"), F.col("us")))
                .drop("us"))
        cur = cand.groupBy(
            "u", *[f"t{j}" for j in range(1, i)]).agg(
            F.min(f"t{i}").alias(f"t{i}"))
    depth = sum(
        (F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0)
         for i in range(1, len(steps) + 1)),
        start=F.lit(0))
    return cur.select(F.col("u").alias(user_col),
                      *[f"t{i}" for i in range(1, len(steps) + 1)],
                      depth.cast("int").alias("depth"))
