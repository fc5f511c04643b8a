"""Deterministic sampling / splitting for training-data pipelines.

- hash_split:    stable train/val/test assignment from a hash of the
                 document id — the same row lands in the same split on
                 every run, every engine, any partitioning (unlike
                 ``df.randomSplit``, which depends on partition layout).
- budget_sample: keep documents per group (e.g. language) until a
                 token budget is exhausted, in a deterministic priority
                 order — the "sample 50B tokens per language" step of a
                 corpus build. One shuffle (the group window).

Both are pure expression-level (no UDFs) and SQL-replayable, so the
registry oracles check them exactly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_SPLIT_BUCKETS = 10_000


def _hash_bucket(id_col: str, portable: bool) -> "F.Column":
    """id → bucket in [0, 10000). Default xxhash64 (fast JVM path);
    portable=True derives it from md5 hex (bit-identical in any engine,
    same trick as dedup._tok_hash31)."""
    s = F.col(id_col).cast("string")
    if portable:
        h = F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    else:
        h = F.xxhash64(s)
    return F.pmod(h, F.lit(_SPLIT_BUCKETS))


def hash_split(df: DataFrame, id_col: str = "doc_id",
               fractions: Sequence[tuple[str, float]] = (
                   ("train", 0.98), ("val", 0.01), ("test", 0.01)),
               portable: bool = False) -> DataFrame:
    """Append a ``split`` column assigning each row to a named split by
    hash-bucketing its id — deterministic, engine-independent, and
    stable under repartitioning/appends (a new row never moves existing
    rows between splits). Fractions must sum to ≤ 1; any remainder
    bucket range is assigned to the LAST split."""
    if any(f <= 0 for _, f in fractions):
        raise ValueError(f"every fraction must be > 0, got {fractions}")
    total = sum(f for _, f in fractions)
    if not 0 < total <= 1.0 + 1e-9:
        raise ValueError(f"fractions must sum to (0, 1], got {total}")
    bucket = _hash_bucket(id_col, portable)
    expr = None
    cum = 0.0
    for i, (name, frac) in enumerate(fractions[:-1]):
        cum += frac
        # Round the CUMULATIVE sum (not per-split increments, which can
        # drift) and cap so every later split keeps >= 1 bucket — e.g.
        # (0.99995, 0.00005) must not round the boundary to 10000 and
        # silently empty the last split.
        remaining = len(fractions) - 1 - i
        hi = min(int(round(cum * _SPLIT_BUCKETS)),
                 _SPLIT_BUCKETS - remaining)
        cond = bucket < hi
        expr = F.when(cond, name) if expr is None else \
            expr.when(cond, name)
    last = fractions[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def budget_sample(df: DataFrame, weight: Column | str,
                  budget: int, key_col: str = "lang",
                  order_col: str = "doc_id") -> DataFrame:
    """Per-group budget sampling: walk each group in ``order_col`` order
    and keep rows while the running sum of ``weight`` stays within
    ``budget`` (first row always kept even if oversized — a budget
    should never produce an empty group).

    Scale shape: ONE shuffle (window partitioned by ``key_col``);
    deterministic given the ordering column, so the SQL oracle replays
    it exactly. Skewed groups are a single partition each — for a
    handful of huge groups, pre-salt upstream or raise
    spark.sql.windowExec buffer thresholds."""
    wcol = F.col(weight) if isinstance(weight, str) else weight
    # Reject negative weights in-plan (a negative weight would let
    # non-prefix rows back under budget); the raise_error branch is
    # never taken on valid data so the cumulative sum is unchanged.
    wchk = F.when(wcol < 0, F.raise_error(
        F.concat(F.lit("budget_sample: negative weight "),
                 wcol.cast("string")))).otherwise(wcol)
    w = (W.partitionBy(key_col).orderBy(order_col)
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    rn = F.row_number().over(W.partitionBy(key_col).orderBy(order_col))
    cum = F.sum(wchk).over(w)
    return (df.withColumn("__cum__", cum).withColumn("__rn__", rn)
            .filter((F.col("__cum__") <= budget)
                    | (F.col("__rn__") == 1))
            .drop("__cum__", "__rn__"))


def stratified_sample(df: DataFrame, strata_col: str,
                      n_per: int | dict[str, int],
                      id_col: str = "doc_id",
                      portable: bool = False) -> DataFrame:
    """Exact-count per-stratum sample: keep at most ``n_per`` rows in
    each stratum (per-stratum quotas via a dict; missing strata keep
    nothing with a dict, everything is capped with an int).

    Deterministic: rows rank within their stratum by a hash of
    ``id_col`` (ties broken by ``id_col`` itself), so the same rows
    survive on any run, any partitioning, any engine. One exchange —
    the stratum window; at 100 TB the quota table is pure metadata.

    For a RATE rather than a count, use ``stratified_frac`` — it is a
    zero-shuffle projection and the better fit when strata are huge."""
    rank = F.row_number().over(
        W.partitionBy(strata_col)
        .orderBy(_hash_bucket(id_col, portable), F.col(id_col)))
    out = df.withColumn("__rk", rank)
    if isinstance(n_per, dict):
        quota = F.lit(None)
        for k, v in n_per.items():
            quota = F.when(F.col(strata_col) == k, F.lit(int(v))) \
                .otherwise(quota)
        keep = F.col("__rk") <= F.coalesce(quota, F.lit(0))
    else:
        keep = F.col("__rk") <= int(n_per)
    return out.filter(keep).drop("__rk")


def stratified_frac(df: DataFrame, strata_col: str,
                    frac_per: float | dict[str, float],
                    id_col: str = "doc_id",
                    portable: bool = False) -> DataFrame:
    """Per-stratum rate sample: keep a deterministic ``frac`` of each
    stratum by hash-bucketing ``id_col`` (the hash_split mechanism,
    quota per stratum). ZERO exchanges — a pure filter that runs at
    scan speed and composes with pushdown; the sample is stable across
    runs and engines (portable=True for oracle replay)."""
    b = _hash_bucket(id_col, portable)
    if isinstance(frac_per, dict):
        for k, v in frac_per.items():
            if not 0.0 <= v <= 1.0:
                raise ValueError(f"fraction for {k!r} out of [0,1]: {v}")
        thr = F.lit(0)
        for k, v in frac_per.items():
            thr = F.when(F.col(strata_col) == k,
                         F.lit(int(round(v * _SPLIT_BUCKETS)))) \
                .otherwise(thr)
    else:
        if not 0.0 <= frac_per <= 1.0:
            raise ValueError(f"fraction out of [0,1]: {frac_per}")
        thr = F.lit(int(round(frac_per * _SPLIT_BUCKETS)))
    return df.filter(b < thr)


def mix_weights(df: DataFrame, strata_col: str = "source",
                text_col: str = "text", alpha: float = 0.5) -> DataFrame:
    """Temperature-scaled mixture weights per stratum: the
    multilingual/multi-source rebalancing rule w_s = (n_s/N)^alpha
    (alpha<1 upweights small strata — the mT5/XLM-R sampling scheme).

    One hash aggregation over the corpus (exact integer token counts),
    one broadcast of the 1-row total back in-plan — no driver collect.
    The weight is computed as pow(n_s/N, alpha); with alpha=0.5 that is
    sqrt(), the one transcendental that IEEE requires correctly rounded,
    so the doubles are engine-bitwise-reproducible from exact integer
    inputs. (Other alphas are supported but their pow() is only
    reproducible within 1 ulp across engines — use portable alpha=0.5
    for oracle-checked runs.)"""
    from .text import token_count
    per = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(text_col)).alias("n_tokens"))
    tot = per.agg(F.sum("n_tokens").alias("tot"))
    j = per.crossJoin(F.broadcast(tot))
    frac = F.col("n_tokens").cast("double") / F.col("tot").cast("double")
    w = F.sqrt(frac) if alpha == 0.5 else F.pow(frac, F.lit(alpha))
    return j.select(strata_col, "n_docs", "n_tokens",
                    w.alias("weight"))


def sample_per_key(df: DataFrame, key_cols: Sequence[str],
                   k: int, id_col: str = "doc_id") -> DataFrame:
    """Deterministic uniform-ish sample of exactly ≤k rows PER KEY —
    the distributed form of per-group reservoir sampling. The "random"
    order is md5(key:id) (engine-portable, seed-free), so the same k
    rows survive on every run, engine, and partitioning; rows within a
    key are exchange-ranked once (a single window shuffle on the key).

    Scale shape: one exchange on ``key_cols``; no per-key
    materialization beyond the window sort, and the output is bounded
    at k·|keys| rows. For billions of rows per key, pre-filter with a
    cheap hash-range cut (WHERE bucket < ~4k/expected_rows·buckets)
    before ranking so the window sorts a sliver, not the key's whole
    partition — documented rather than automatic because the cut needs
    the expected per-key cardinality.

    Reference: no analog in bigslice (its sampling story is
    user-written map/filter); standard eval-set/inspection tooling for
    a corpus pipeline.
    """
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    tag = F.md5(F.concat_ws(
        ":", *[F.col(c).cast("string") for c in key_cols],
        F.col(id_col).cast("string")))
    w = (W.partitionBy(*key_cols)
         .orderBy(tag.asc(), F.col(id_col).asc()))
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k).drop("__rn"))


def mixture_sample(df: DataFrame, strata_col: str = "source",
                   total: int = 1000, alpha: float = 0.5,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Materialize a temperature-mixed corpus: per-stratum quotas are
    ``floor(total · w_s / Σw)`` from mix_weights' (n_s/N)^alpha
    temperatures, then each stratum keeps its quota by the md5
    priority sample_per_key uses — "give me a ~``total``-document mix
    at temperature alpha", deterministically.

    Scale shape: mix_weights' aggregation (one exchange over strata
    counts), a broadcast join of the |strata|-row quota table back
    onto the corpus, and one window exchange for the per-stratum rank
    — nothing driver-side, nothing quadratic. With alpha=0.5 the
    weight doubles are engine-bitwise (sqrt of exact-integer ratios),
    so the floor() quotas are exact cross-engine.
    """
    w = mix_weights(df, strata_col, text_col=text_col, alpha=alpha)
    # decimal-exact Σw: order-independent, so the floor() quota cut
    # cannot flip on partial-aggregation order (queries.py float
    # conventions)
    wtot = w.agg(F.sum(F.col("weight").cast("decimal(38,18)"))
                 .cast("double").alias("wtot"))
    quota = (w.crossJoin(F.broadcast(wtot))
             .select(strata_col,
                     F.floor(F.lit(float(total)) * F.col("weight")
                             / F.col("wtot")).alias("__quota")))
    tag = F.md5(F.concat_ws(
        ":", F.col(strata_col).cast("string"),
        F.col(id_col).cast("string")))
    rank = F.row_number().over(
        W.partitionBy(strata_col)
        .orderBy(tag.asc(), F.col(id_col).asc()))
    return (df.join(F.broadcast(quota), on=strata_col)
            .withColumn("__rn", rank)
            .filter(F.col("__rn") <= F.col("__quota"))
            .drop("__rn", "__quota"))


def epoch_order(df: DataFrame, seed: int = 0, epoch: int = 0,
                id_col: str = "doc_id") -> DataFrame:
    """Deterministic global training order for one epoch: every row
    gains ``pos`` in 0..N-1 under a seeded md5 permutation — the
    epoch-shuffle step that turns a prepared corpus into a consumable
    training stream. Bumping ``epoch`` reshuffles; the same
    (seed, epoch) replays bit-identically on any engine and any
    partitioning (unlike an ``orderBy(rand())``, whose seed is
    per-partition).

    Scale shape: the permutation priority is a pure projection; the
    global position comes from packing.global_prefix_sum — a RANGE
    partition on the priority plus the two-level prefix count
    (per-partition local cumsum and a broadcast of the k
    per-partition totals), never a single-partition global window.
    One range exchange total (the same exchange Spark's own
    ``orderBy`` plans), so writing the result
    partitioned-by-``pos``-range yields ordered training shards
    directly. The range-sampled partition boundaries do NOT leak into
    the output: positions follow the total (priority, id) order
    wherever the boundaries land."""
    from .packing import global_prefix_sum
    if "__pri" in df.columns:
        raise ValueError("epoch_order reserves column name '__pri'; "
                         "rename it on the input")
    pri = F.md5(F.concat_ws("\x1f", F.lit(str(int(seed))),
                            F.lit(str(int(epoch))),
                            F.col(id_col).cast("string")))
    out = global_prefix_sum(df.withColumn("__pri", pri),
                            ["__pri", id_col], F.lit(1), "pos")
    return out.drop("__pri")


def leakage_safe_split(df: DataFrame, dup_pairs: DataFrame,
                       id_col: str = "doc_id",
                       fractions: Sequence[tuple[str, float]] = (
                           ("train", 0.98), ("val", 0.01),
                           ("test", 0.01)),
                       portable: bool = False) -> DataFrame:
    """hash_split with a DUPLICATE-CLUSTER atom: near-duplicate
    documents must never straddle train/test (a test doc whose
    near-copy sits in train is leaked, and a row-level random or
    hash split WILL separate dup pairs). ``dup_pairs`` is any
    (id_a, id_b) near-dup pair relation (minhash_lsh_pairs,
    ngram_jaccard_pairs, simhash_pairs, ...); pairs are closed into
    clusters (operators/graph.py connected_components, min-label) and
    the whole cluster is bucketed by its representative — singletons
    by their own id. Appends ``split_group`` (the atom's id) and
    ``split``.

    100 TB shape: the dup-pair graph is SPARSE (dedup-rate × corpus),
    so components iterate over the pair relation only, never the
    corpus; the corpus then takes ONE join against the (node,
    component) map — members of non-trivial clusters, a small fraction
    of the corpus — and the split itself is a pure codegen projection.
    """
    from .graph import connected_components
    comp = connected_components(
        dup_pairs.selectExpr("id_a AS src", "id_b AS dst"))
    keyed = (df.join(comp.withColumnRenamed("node", id_col),
                     on=id_col, how="left")
             .withColumn("split_group",
                         F.coalesce("component", F.col(id_col))
                         .cast("long"))
             .drop("component"))
    return hash_split(keyed, id_col="split_group", fractions=fractions,
                      portable=portable)
