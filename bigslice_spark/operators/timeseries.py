"""Per-key time-series state folds.

ewma_last: the final exponentially-weighted moving average per key —
the standard online feature (user activity level, rolling quality
score) computed as a batch fold: s_0 = v_0, s_i = α·v_i + (1−α)·s_{i−1}
over the key's events in (ts, tiebreak...) order.

Scale shape, method="list" (default): ONE aggregation exchange on the
key; per-key state is the key's own event list (collect_list →
array_sort → left fold — the pagerank ordered-mode pattern), so memory
is bounded by the largest single key, not the table.

method="distributed" is the hub-key path (VERDICT r7 task 5): the
segment-composition idea — per-segment affine states (A, B) with
A = (1−α)^len composed as s' = A·s + B — collapses into a closed form
because every segment's A is a power of the SAME base, so the suffix
products of A's are just (1−α)^(suffix event count). That turns the
whole fold into one weighted sum:

    s_N = v_first·(1−α)^(N−1) + Σ_{i≥2} α·v_i·(1−α)^(N−i)

computed as a window rank from the end + a plain aggregation: NO
collect_list, no per-key array, no per-key Python — a 10⁸-event hub
key costs two running window columns and a partial-aggregable sum.
(1−α)^(N−i) underflows to exactly 0.0 for deep history, which is also
what those terms round to mathematically. The weighted terms are
summed through DECIMAL(38,18) so the result is order-independent and
bitwise-reproducible; vs the sequential list fold the value agrees to
~1e-12 relative (different rounding sequence — property-tested), and
is EXACT (bitwise) when (1−α) is a power of two and the term count is
small enough that every sequential intermediate is dyadic-exact.

Float portability: the fold is a left fold in a pinned order with
α forced to DOUBLE on both engines, so every intermediate double is
bitwise-reproducible by DuckDB's list_reduce (which also seeds with
the first element) — the same contract pagerank(ordered=True) pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def ewma_last(df: DataFrame, key_col: str, ts_col: str, val_col: str,
              order_cols: list[str] | None = None,
              alpha: float = 0.3, method: str = "list",
              segment_s: int | None = None) -> DataFrame:
    """(key, n_events, ewma): final EWMA of ``val_col`` per key over
    rows in (``ts_col``, ``order_cols``...) order. ``order_cols``
    breaks timestamp ties deterministically (pass a unique id).
    ``method="list"`` folds the key's sorted event array (exactly the
    sequential recurrence, bitwise DuckDB-replayable);
    ``method="distributed"`` computes the closed-form weighted sum
    with no per-key state (hub-key safe — see module docstring).

    ``segment_s`` (distributed only): two-level rank — events rank
    within (key, ``segment_s``-second time bucket) and the bucket
    relation (rows per key = bucket count) contributes each bucket's
    later-event count, so even the rank SORT parallelizes across a
    hub key's buckets instead of one task sorting its whole history
    (measured: the residual single-task sort costs ~40s at a
    25.6M-event key — PERFORMANCE.md hub curves). Ranks are identical
    by construction (buckets partition the time axis monotonically;
    ties share a bucket), so results are bitwise-unchanged; price is
    one extra small exchange for the bucket relation."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha out of (0,1]: {alpha}")
    if segment_s is not None and method != "distributed":
        raise ValueError("segment_s requires method='distributed'")
    a = float(alpha)
    if method == "distributed":
        oc = order_cols or []
        base = df.select(
            F.col(key_col),
            F.unix_micros(F.col(ts_col)).alias("__t__"),
            *[F.col(c).alias(f"__o{i}__") for i, c in enumerate(oc)],
            F.col(val_col).cast("double").alias("__v__"))
        # rank from the END of the key's history: rn=1 is the newest
        # event, rn=n the oldest (the seed of the recurrence)
        order = [F.col("__t__").desc()] + [
            F.col(f"__o{i}__").desc() for i in range(len(oc))]
        if segment_s is None:
            wr = W.partitionBy(key_col).orderBy(*order)
            wn = W.partitionBy(key_col)        # same exchange, no sort
            ranked = base.select(
                key_col, "__v__",
                F.row_number().over(wr).alias("__rn__"),
                F.count(F.lit(1)).over(wn).alias("__n__"))
        else:
            seg = F.expr(f"__t__ div {int(segment_s) * 1_000_000}")
            base = base.withColumn("__seg__", seg)
            wr = W.partitionBy(key_col, "__seg__").orderBy(*order)
            within = base.select(
                key_col, "__seg__", "__v__",
                F.row_number().over(wr).alias("__rs__"))
            # bucket relation: per (key, bucket) counts + each
            # bucket's later-event count and the key total — rows per
            # key = bucket count, a tiny window
            wlater = (W.partitionBy(key_col)
                      .orderBy(F.col("__seg__").desc())
                      .rowsBetween(W.unboundedPreceding, -1))
            wall_ = W.partitionBy(key_col)
            segrel = (base.groupBy(key_col, "__seg__")
                      .agg(F.count(F.lit(1)).alias("__cnt__"))
                      .select(key_col, "__seg__",
                              F.coalesce(F.sum("__cnt__").over(wlater),
                                         F.lit(0)).alias("__later__"),
                              F.sum("__cnt__").over(wall_).alias("__n__")))
            ranked = (within.join(segrel, on=[key_col, "__seg__"])
                      .select(key_col, "__v__",
                              (F.col("__later__") + F.col("__rs__"))
                              .alias("__rn__"), "__n__"))
        om = F.lit(1.0 - a)
        term = F.when(
            F.col("__rn__") == F.col("__n__"),
            F.col("__v__")
            * F.pow(om, (F.col("__n__") - 1).cast("double"))
        ).otherwise(
            F.lit(a) * F.col("__v__")
            * F.pow(om, (F.col("__rn__") - 1).cast("double")))
        # decimal-exact sum: order-independent, bitwise-reproducible
        # (terms < 1e-18 truncate to 0 — already below double noise).
        # DOMAIN GUARD: decimal(38,18) cannot represent |term| >= 1e20
        # or non-finite values. try_cast nulls such terms (a plain
        # cast would kill the whole job under ANSI, and silently DROP
        # the term with ANSI off); whenever a present value lost its
        # term the key's ewma comes back NaN — loud and per-key,
        # matching the list path's NaN propagation for NaN inputs.
        # Finite inputs past 1e20 are outside this method's domain;
        # use method='list' there.
        dterm = term.try_cast("decimal(38,18)")
        return (ranked.groupBy(key_col)
                .agg(F.count(F.lit(1)).alias("n_events"),
                     F.when(F.count("__v__") != F.count(dterm),
                            F.lit(float("nan")))
                     .otherwise(F.sum(dterm).cast("double"))
                     .alias("ewma")))
    if method != "list":
        raise ValueError(f"unknown ewma method {method!r} "
                         "(expected 'list' or 'distributed')")
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


def time_rollup(df: DataFrame, ts_col: str = "ts",
                val_col: str = "value",
                user_col: str = "user_id",
                scale: int = 4) -> DataFrame:
    """Hierarchical time-bucket rollup (the hypertable/continuous-
    aggregate shape): one pass producing hour, day, and week grains
    plus the grand total from a single ROLLUP aggregation. ``gid``
    (grouping_id — 0 detail, 1 day-grain, 3 week-grain, 7 total;
    Spark and DuckDB share the first-column-is-MSB convention)
    identifies the grain EXPLICITLY: a NULL ``ts_col`` produces
    all-NULL buckets whose detail rows would otherwise be
    indistinguishable from the subtotal rows.

    Scale shape: one fused rollup aggregation (the Expand multiplies
    rows 4x before the partial agg, but partials collapse to |buckets|
    per grain) plus the standard second exchange the exact
    count-DISTINCT adds (partial on (grain, user), final on grain) —
    at 100 TB this is the cost of four separate GROUP BYs fused into
    two shuffles of bucket-cardinality rows.
    Sums are decimal-exact (queries.py float conventions); bucket
    boundaries are ISO date_trunc (week starts Monday on both
    engines); buckets surface as unix-microsecond BIGINTs so the
    values hash identically everywhere.
    """
    v = F.col(val_col).cast("double")
    wk = F.unix_micros(F.date_trunc("week", F.col(ts_col)))
    dy = F.unix_micros(F.date_trunc("day", F.col(ts_col)))
    hr = F.unix_micros(F.date_trunc("hour", F.col(ts_col)))
    return (df.select(wk.alias("week_us"), dy.alias("day_us"),
                      hr.alias("hour_us"), v.alias("__v"),
                      F.col(user_col).alias("__u"))
            .rollup("week_us", "day_us", "hour_us")
            .agg(F.grouping_id().cast("int").alias("gid"),
                 F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("__v").cast(f"decimal(38,{scale})"))
                 .cast("double").alias("sum_value"),
                 F.countDistinct("__u").alias("n_users")))


def rolling_zscore(df: DataFrame, key_col: str, ts_col: str,
                   val_col: str, order_cols: list[str] | None = None,
                   window: int = 20, min_n: int = 8,
                   z_threshold: float = 3.0,
                   scale: int = 6) -> DataFrame:
    """Per-key rolling z-score anomaly detection: each value is scored
    against the mean/stddev of its own trailing ``window`` values
    (exclusive frame — the current row never smooths itself), and rows
    with |z| ≥ ``z_threshold`` after ``min_n`` warm-up points are
    emitted as anomalies.

    Scale shape: ONE window exchange on the key (same shape as
    event_gaps); the frame is ROWS-bounded so state per row is O(window)
    regardless of key size. Window sums go through decimal (exact,
    order-independent); the variance is then plain double arithmetic in
    a pinned expression order, so the score — and the threshold cut —
    is bitwise engine-reproducible.
    """
    if window < 2 or min_n < 2:
        raise ValueError("window and min_n must be ≥ 2")
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = (W.partitionBy(key_col).orderBy(*order)
         .rowsBetween(-window, -1))
    v = F.col(val_col).cast("double")
    s = (F.sum(v.cast(f"decimal(38,{scale})")).over(w)
         .cast("double"))
    s2 = (F.sum((v * v).cast(f"decimal(38,{scale})")).over(w)
          .cast("double"))
    n = F.count(v).over(w)
    nd = n.cast("double")
    mean = s / nd
    var = (s2 - s * s / nd) / (nd - F.lit(1.0))
    z = (v - mean) / F.sqrt(var)
    out = (df.select(F.col(key_col),
                     F.unix_micros(F.col(ts_col)).alias("ts_us"),
                     v.alias("value"),
                     n.alias("__n"), mean.alias("mean"),
                     var.alias("__var"), z.alias("z")))
    return (out.filter((F.col("__n") >= min_n) & (F.col("__var") > 0)
                       & (F.abs(F.col("z")) >= z_threshold))
            .select(key_col, "ts_us", "value",
                    F.col("__n").cast("int").alias("n_ref"),
                    "mean", "z"))


def retention_cohorts(df: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Weekly retention cohorts: users grouped by the ISO week of
    their FIRST event; for each (cohort_week, weeks_since) cell, how
    many distinct cohort members were active that week — the classic
    retention triangle.

    Scale shape: one aggregation to per-(user, week) activity (the
    dominant exchange, partial-agg'd), one broadcast-friendly
    self-derived first-week join rides the same user partitioning,
    then a count-distinct per cell over user-week rows (bounded by
    users × active weeks, far below event count). Weeks surface as
    DATEs and weeks_since comes from calendar datediff/7 — exact in
    ANY session timezone (an epoch-micros subtraction would mis-bin
    the week that straddles a DST shift).
    """
    uw = (df.select(F.col(user_col).alias("u"),
                    F.date_trunc("week", F.col(ts_col))
                    .cast("date").alias("wk"))
          .distinct())
    first = uw.groupBy("u").agg(F.min("wk").alias("cohort_wk"))
    j = uw.join(first, on="u")
    # week starts are exactly 7 calendar days apart, so datediff/7 is
    # an exact small integer
    weeks_since = (F.datediff(F.col("wk"), F.col("cohort_wk"))
                   / F.lit(7)).cast("int")
    return (j.groupBy(F.col("cohort_wk"),
                      weeks_since.alias("weeks_since"))
            .agg(F.countDistinct("u").alias("n_users")))


def ts_pattern_search(df: DataFrame, key_col: str, ts_col: str,
                      val_col: str, pattern: list[float],
                      k: int = 10,
                      order_cols: list[str] | None = None) -> DataFrame:
    """Top-k time-series subsequence search: slide a length-m window
    over every key's value series (ordered, exclusive of nothing —
    the window ENDS at each row) and return the k windows closest to
    ``pattern`` by squared Euclidean distance.

    Scale shape: ONE window exchange on the key builds the per-row
    length-m arrays (state O(m) per row); the distance is a codegen'd
    zip_with/aggregate fold; the global top-k plans as
    TakeOrderedAndProject — never a single-partition sort. Distances
    are doubles in a pinned left-fold order (squares are non-negative,
    so the zero seed is bitwise equal to DuckDB's first-element seed).

    Normalization: pre-scale the series (e.g. with a rolling_zscore
    pass) if amplitude-invariant matching is wanted; the operator
    matches raw values.
    """
    m = len(pattern)
    if m < 2:
        raise ValueError("pattern must have at least 2 points")
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = (W.partitionBy(key_col).orderBy(*order)
         .rowsBetween(-(m - 1), 0))
    win = F.collect_list(F.col(val_col).cast("double")).over(w)
    pat = "array(" + ", ".join(
        f"CAST({float(p)!r} AS DOUBLE)" for p in pattern) + ")"
    dist = F.expr(
        f"aggregate(zip_with(__win__, {pat}, "
        f"(x, y) -> (x - y) * (x - y)), "
        f"CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)")
    base = (df.select(F.col(key_col),
                      F.unix_micros(F.col(ts_col)).alias("ts_us"),
                      win.alias("__win__"))
            .filter(F.size("__win__") == m)
            .select(key_col, "ts_us", dist.alias("dist")))
    return (base.orderBy(F.col("dist").asc(), F.col(key_col).asc(),
                         F.col("ts_us").asc())
            .limit(k))
