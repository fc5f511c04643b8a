"""Query registry: one entry per implemented operator/capability from
SURVEY.md §2, each paired (when SQL-expressible) with a DuckDB oracle.

Conventions (driver contract, see repo __spark_entry__.py):
- every callable takes (spark, sf_dir) and returns a DataFrame;
- every computed column is aliased IDENTICALLY in Spark and SQL;
- floating outputs are made BITWISE-identical across engines rather than
  rounded (round() algorithms disagree at half-boundaries):
    * per-row arithmetic: same expression order → same IEEE double;
    * aggregates of doubles: operands cast to DECIMAL(38,s) → exact sum →
      cast back to double (identical on both engines, order-independent);
    * avg/stddev: derived from exact decimal sums with identical double
      arithmetic, never the engines' own float accumulators;
- integer SUMs are CAST(... AS BIGINT) in DuckDB (it widens to HUGEINT).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .local_rows import local_df
from .session import Session, load_tables
from .slice import Slice

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        import functools

        @functools.wraps(fn)
        def tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
            # tag the query's jobs for the Spark UI / history server
            # (left set on purpose: the caller's ACTION runs after we
            # return; the next query overwrites the thread-local tag)
            try:
                spark.sparkContext.setJobGroup(
                    f"bss:{name}", (fn.__doc__ or name).strip()
                    .splitlines()[0], True)
            except Exception:
                pass  # never let status tagging break a query
            return fn(spark, sf_dir)

        QUERIES[name] = tagged
        if oracle is not None:
            ORACLE[name] = oracle
        return fn
    return deco


def _s(spark: SparkSession, sf_dir: str) -> tuple[Session, dict]:
    sess = Session(spark)
    return sess, load_tables(spark, sf_dir)


def dsum(expr: Column | str, scale: int = 4) -> Column:
    """Exact (decimal-backed) sum of a double expression, as double.
    Deterministic regardless of partial-aggregation order — the hash-match
    analog of the reference's order-insensitive assertColumnsEqual."""
    c = F.col(expr) if isinstance(expr, str) else expr
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double")


def _dsum_sql(expr: str, scale: int = 4) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(38,{scale}))) AS DOUBLE)"


# =====================================================================
# Reference operator inventory (SURVEY §2.1), one query per operator.
# =====================================================================

@query("op_const", """
    SELECT key, CAST(sum(v) AS BIGINT) AS total
    FROM (VALUES ('a', 1), ('b', 2), ('a', 3), ('c', 5), ('b', 8)) t(key, v)
    GROUP BY key
""")
def op_const(spark, sf_dir):
    """bigslice.Const (reference slice.go:202-290)."""
    sess = Session(spark)
    sl = sess.const(4, ["a", "b", "a", "c", "b"], [1, 2, 3, 5, 8],
                    names=["key", "v"], schema="key string, v long")
    return sl.reduce_(F.sum("v")).map_(
        F.col("key"), F.col("v").alias("total")).df


@query("op_reader_func", """
    SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS total
    FROM (SELECT s * 1000 + i AS x
          FROM generate_series(0, 3) t(s), generate_series(0, 99) u(i))
""")
def op_reader_func(spark, sf_dir):
    """bigslice.ReaderFunc (reference slice.go:292-402): custom vectorized
    per-shard source — fn yields Arrow batches per shard."""
    import pandas as pd
    sess = Session(spark)

    def gen(shard: int):
        yield pd.DataFrame({"x": [shard * 1000 + i for i in range(100)]})

    sl = sess.reader_func(4, gen, schema="x long")
    return sl.df.agg(F.count(F.lit(1)).alias("n"),
                     F.sum("x").alias("total"))


@query("op_writer_func", """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
""")
def op_writer_func(spark, sf_dir):
    """bigslice.WriterFunc (reference slice.go:404-548): pass-through sink
    tap; result is the identity of its input. The tap's terminal call
    (pdf=None on EOF, the exception on failure) lets sinks flush/abort."""
    sess, t = _s(spark, sf_dir)

    def tap(shard: int, pdf) -> None:
        if pdf is not None:
            _ = len(pdf)  # side-effect channel, like the reference

    return sess.wrap(t["nation"]).writer_func(tap).df


@query("op_map", """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
    FROM lineitem
""")
def op_map(spark, sf_dir):
    """bigslice.Map (reference slice.go:550-638), native fast path.
    Same per-row expression order on both engines → identical doubles."""
    sess, t = _s(spark, sf_dir)
    return sess.wrap(t["lineitem"]).map_(
        F.col("l_orderkey"), F.col("l_linenumber"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))
         * (1 + F.col("l_tax"))).alias("charged")).df


@query("op_map_pandas", """
    SELECT l_orderkey, l_linenumber, l_quantity * l_extendedprice AS qp
    FROM lineitem
""")
def op_map_pandas(spark, sf_dir):
    """bigslice.Map slow path: opaque user fn over Arrow batches — the
    analog of user Go funcs inside 128-row Frames (slice.go:600-634)."""
    sess, t = _s(spark, sf_dir)

    def fn(pdf):
        out = pdf[["l_orderkey", "l_linenumber"]].copy()
        out["qp"] = pdf["l_quantity"] * pdf["l_extendedprice"]
        return out

    return sess.wrap(t["lineitem"]).map_(
        fn=fn, schema="l_orderkey long, l_linenumber int, qp double").df


@query("op_filter", """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
""")
def op_filter(spark, sf_dir):
    """bigslice.Filter (reference slice.go:640-726), pushed to the scan."""
    sess, t = _s(spark, sf_dir)
    return (sess.wrap(t["lineitem"])
            .filter_((F.col("l_quantity") > 45)
                     & (F.col("l_returnflag") == "R"))
            .map_("l_orderkey", "l_linenumber", "l_quantity")).df


@query("op_flatmap", """
    SELECT doc_id, token
    FROM (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token
          FROM documents)
    WHERE token <> ''
""")
def op_flatmap(spark, sf_dir):
    """bigslice.Flatmap (reference slice.go:728-841): 1→N via explode."""
    sess, t = _s(spark, sf_dir)
    return (sess.wrap(t["documents"])
            .flatmap(F.col("doc_id"),
                     F.split("text", r"\s+").alias("token"),
                     explode_col="token")
            .filter_(F.col("token") != "")).df


@query("op_fold", f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum_sql('l_quantity')} AS sum_qty,
           {_dsum_sql('l_extendedprice')} AS sum_base_price,
           {_dsum_sql('l_extendedprice * (1 - l_discount)', 8)}
               AS sum_disc_price,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem GROUP BY l_returnflag, l_linestatus
""")
def op_fold(spark, sf_dir):
    """bigslice.Fold fast path (reference slice.go:843-955) — Catalyst
    partial/final HashAggregate replaces the reference's in-memory
    accumulator map (accum.go:17-19)."""
    sess, t = _s(spark, sf_dir)
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (sess.wrap(t["lineitem"], prefix=2)
            .map_("l_returnflag", "l_linestatus", "l_quantity",
                  "l_extendedprice", "l_discount", prefix=2)
            .fold(aggs={
                "sum_qty": dsum("l_quantity"),
                "sum_base_price": dsum("l_extendedprice"),
                "sum_disc_price": dsum(disc, 8),
                "count_order": F.count(F.lit(1)),
            })).df


@query("op_fold_custom", """
    SELECT l_returnflag,
           min(l_quantity * l_extendedprice) AS min_qp,
           max(l_quantity * l_extendedprice) AS max_qp,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
""")
def op_fold_custom(spark, sf_dir):
    """bigslice.Fold slow path: arbitrary accumulator via applyInPandas
    (SURVEY §7 hard-part 2). Min/max/count accumulator — exact doubles."""
    import pandas as pd
    sess, t = _s(spark, sf_dir)

    def acc(key, pdf):
        qp = pdf["l_quantity"] * pdf["l_extendedprice"]
        return pd.DataFrame({"l_returnflag": [key[0]],
                             "min_qp": [float(qp.min())],
                             "max_qp": [float(qp.max())],
                             "n": [len(pdf)]})

    return (sess.wrap(t["lineitem"])
            .map_("l_returnflag", "l_quantity", "l_extendedprice")
            .fold(fn=acc, schema=("l_returnflag string, min_qp double, "
                                  "max_qp double, n long"))).df


@query("op_pragma", """
    SELECT l_returnflag,
           min(l_quantity * l_extendedprice) AS min_qp,
           max(l_quantity * l_extendedprice) AS max_qp,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
""")
def op_pragma(spark, sf_dir):
    """Pragma directives (reference slice.go:107-200): the op_fold_custom
    accumulator annotated Procs(4) | Materialize — the heavy
    applyInPandas stage runs at total_cores//4 concurrency (each task
    owning ~4 cores' headroom) over a materialized input. Results must
    be identical to the un-pragma'd fold; the concurrency-cap mechanics
    are plan-gated in tests/test_pragma.py."""
    import pandas as pd
    from bigslice_spark import Materialize, Procs
    sess, t = _s(spark, sf_dir)

    def acc(key, pdf):
        qp = pdf["l_quantity"] * pdf["l_extendedprice"]
        return pd.DataFrame({"l_returnflag": [key[0]],
                             "min_qp": [float(qp.min())],
                             "max_qp": [float(qp.max())],
                             "n": [len(pdf)]})

    return (sess.wrap(t["lineitem"])
            .map_("l_returnflag", "l_quantity", "l_extendedprice")
            .fold(fn=acc, schema=("l_returnflag string, min_qp double, "
                                  "max_qp double, n long"),
                  pragma=Procs(4) | Materialize)).df


@query("op_fold_stream", """
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem GROUP BY l_returnflag
""")
def op_fold_stream(spark, sf_dir):
    """Streaming Fold (Slice.fold_stream): arbitrary accumulator over
    key-sorted Arrow batches with carry-over — groups NEVER materialize
    whole (SURVEY §7 hard-part 2; the reference's Fold holds accumulator
    maps fully in memory, accum.go:17-19). l_quantity is integer-valued,
    so the float partial sums are exact and order-independent."""
    sess, t = _s(spark, sf_dir)
    sl = sess.wrap(t["lineitem"].select("l_returnflag", "l_quantity"))

    def init():
        return [0, 0]

    def step(acc, chunk):
        acc[0] += len(chunk)
        acc[1] += int(chunk["l_quantity"].sum())
        return acc

    def emit(key, acc):
        return {"l_returnflag": key[0], "n": acc[0], "qty": acc[1]}

    return sl.fold_stream(init, step, emit,
                          "l_returnflag string, n long, qty long").df


@query("op_reduce", """
    SELECT o_custkey, max(o_totalprice) AS max_price
    FROM orders GROUP BY o_custkey
""")
def op_reduce(spark, sf_dir):
    """bigslice.Reduce (reference reduce.go:19-94): commutative/associative
    reduce with map-side combine (Catalyst partial aggregate)."""
    sess, t = _s(spark, sf_dir)
    sl = sess.wrap(t["orders"]).map_(
        F.col("o_custkey"), F.col("o_totalprice").alias("max_price"))
    return sl.reduce_("max").df


@query("op_flatmap_pandas", """
    SELECT n_nationkey, unnest(generate_series(0, n_regionkey)) AS i
    FROM nation
""")
def op_flatmap_pandas(spark, sf_dir):
    """Flatmap slow path = the UDTF surface (SURVEY §2.3): an opaque
    Python fn emitting 0..N rows per input row over Arrow batches
    (reference slice.go:728-841 — bigslice's entire operator set is
    'UDFs'; this is the 1→N case no expression covers)."""
    sess, t = _s(spark, sf_dir)

    def expand(row):
        nk, rk = row
        return [(nk, i) for i in range(rk + 1)]

    return (sess.wrap(t["nation"].select("n_nationkey", "n_regionkey"))
            .flatmap(fn=expand, schema="n_nationkey int, i long").df)


@query("window_range_frame", """
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(38,6)))
                OVER (PARTITION BY user_id ORDER BY epoch_s
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS rolling_1h
    FROM (SELECT event_id, user_id, value,
                 CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s FROM events)
""")
def window_range_frame(spark, sf_dir):
    """RANGE window frame (value-based, not row-based): per-user rolling
    1-hour sum — the frame type ROWS can't express when events are
    unevenly spaced. Decimal-exact sum keeps both engines bitwise
    identical per frame."""
    _, t = _s(spark, sf_dir)
    ev = t["events"].select(
        "event_id", "user_id", "value",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("epoch_s"))
    w = (W.partitionBy("user_id").orderBy("epoch_s")
         .rangeBetween(-3600, W.currentRow))
    return ev.select(
        "event_id", "user_id",
        F.sum(F.col("value").cast("decimal(38,6)")).over(w)
        .cast("double").alias("rolling_1h"))


@query("op_cogroup_apply", """
    WITH c AS (SELECT c_nationkey AS k, CAST(count(*) AS BIGINT) AS nc
               FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS k, CAST(count(*) AS BIGINT) AS ns
               FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(c.k, s.k) AS k,
           coalesce(nc, 0) AS n_cust, coalesce(ns, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.k = s.k
""")
def op_cogroup_apply(spark, sf_dir):
    """Pandas cogroup fast path (Slice.cogroup_apply): arbitrary per-key
    fn over both groups, streamed through Arrow — the reference's
    Cogroup→Flatmap pattern without materializing group arrays. Empty
    side ⇒ empty frame (zero-group semantics, cogroup.go:244-258)."""
    import pandas as pd
    sess, t = _s(spark, sf_dir)
    cust = sess.wrap(t["customer"]).map_(
        F.col("c_nationkey").alias("k"), F.col("c_acctbal"))
    supp = sess.wrap(t["supplier"]).map_(
        F.col("s_nationkey").alias("k"), F.col("s_acctbal"))

    def merge(key, left: "pd.DataFrame", right: "pd.DataFrame"):
        return pd.DataFrame({"k": [int(key[0])],
                             "n_cust": [len(left)],
                             "n_supp": [len(right)]})

    return cust.cogroup_apply(
        supp, merge, "k int, n_cust long, n_supp long").df


@query("op_cogroup", """
    WITH c AS (SELECT c_nationkey AS k, CAST(count(*) AS BIGINT) AS nc,
                      min(c_acctbal) AS mnc
               FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS k, CAST(count(*) AS BIGINT) AS ns,
                      min(s_acctbal) AS mns
               FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(c.k, s.k) AS k,
           coalesce(nc, 0) AS n_cust, coalesce(mnc, 0.0) AS min_cust,
           coalesce(ns, 0) AS n_supp, coalesce(mns, 0.0) AS min_supp
    FROM c FULL OUTER JOIN s ON c.k = s.k
""")
def op_cogroup(spark, sf_dir):
    """bigslice.Cogroup (reference cogroup.go:20-272): multi-way full-outer
    grouped join; absent groups are EMPTY (not null) — cogroup.go:244-258.
    Emits group sizes + exact mins (array order is engine-specific)."""
    sess, t = _s(spark, sf_dir)
    cust = sess.wrap(t["customer"]).map_(
        F.col("c_nationkey").alias("k"), F.col("c_acctbal"))
    supp = sess.wrap(t["supplier"]).map_(
        F.col("s_nationkey").alias("k"), F.col("s_acctbal"))
    cg = cust.cogroup(supp)
    return cg.map_(
        "k",
        F.size("g0").cast("long").alias("n_cust"),
        F.coalesce(F.array_min(F.transform(
            "g0", lambda x: x["c_acctbal"])), F.lit(0.0)).alias("min_cust"),
        F.size("g1").cast("long").alias("n_supp"),
        F.coalesce(F.array_min(F.transform(
            "g1", lambda x: x["s_acctbal"])), F.lit(0.0)).alias("min_supp"),
    ).df


@query("op_reshuffle", """
    SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_suppkey
""")
def op_reshuffle(spark, sf_dir):
    """bigslice.Reshuffle (reference reshuffle.go:24-88): co-locate equal
    keys, then a per-partition count equals the grouped count."""
    sess, t = _s(spark, sf_dir)
    sl = (sess.wrap(t["lineitem"]).map_("l_suppkey").reshuffle())
    return sl.fold(aggs={"n": F.count(F.lit(1))}).df


@query("op_repartition", """
    SELECT o_orderkey, o_custkey FROM orders
""")
def op_repartition(spark, sf_dir):
    """bigslice.Repartition (reference reshuffle.go:44-76): user partition
    function as a computed column; content is preserved."""
    sess, t = _s(spark, sf_dir)
    sl = sess.wrap(t["orders"]).map_("o_orderkey", "o_custkey")
    return sl.repartition_func(8, F.col("o_custkey") * 31 + 7).df


@query("op_repartition_custom", """
    SELECT o_orderkey, o_custkey FROM orders
""")
def op_repartition_custom(spark, sf_dir):
    """bigslice.Repartition with an ARBITRARY Python partition function
    (reference reshuffle.go:52-76 takes any user Go func) — the opaque
    slow path next to op_repartition's Column fast path; content is
    preserved whatever the placement."""
    sess, t = _s(spark, sf_dir)
    sl = sess.wrap(t["orders"].select("o_orderkey", "o_custkey"))
    return sl.repartition_func(
        8, lambda okey, ckey: (okey * 2654435761 + ckey) % 8,
        cols=["o_orderkey", "o_custkey"]).df


@query("op_cache_partial", """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
""")
def op_cache_partial(spark, sf_dir):
    """bigslice CachePartial (reference cache.go:45-66, internal/
    slicecache): per-shard cache — one shard's files are deleted between
    two calls, and only that shard is recomputed/rewritten; the result
    must still be the complete table."""
    import os
    import shutil
    import tempfile
    sess, t = _s(spark, sf_dir)
    prefix = tempfile.mkdtemp(prefix="bsc_pcache_")
    sl = sess.wrap(t["nation"]
                   .select("n_nationkey", "n_name", "n_regionkey"))
    sl.cache_partial(prefix, F.col("n_nationkey"), 4)   # writes all 4
    shutil.rmtree(os.path.join(prefix, "__shard__=1"))  # invalidate one
    return sl.cache_partial(prefix, F.col("n_nationkey"), 4).df


@query("op_reshard", """
    SELECT c_custkey, c_name FROM customer
""")
def op_reshard(spark, sf_dir):
    """bigslice.Reshard (reference reshard.go:15-45)."""
    sess, t = _s(spark, sf_dir)
    return (sess.wrap(t["customer"]).map_("c_custkey", "c_name")
            .reshard(16).reshard(3)).df


@query("op_head", """
    SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 10
""")
def op_head(spark, sf_dir):
    """bigslice.Head (reference slice.go:957-994): first n per shard. Made
    deterministic here with a single sorted shard; the per-shard semantics
    are exercised in tests/test_operators.py."""
    sess, t = _s(spark, sf_dir)
    df = (t["orders"].select("o_orderkey", "o_totalprice")
          .repartition(1).sortWithinPartitions("o_orderkey"))
    return sess.wrap(df).head(10).df


@query("op_prefixed", f"""
    SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
           {_dsum_sql('l_quantity')} AS qty
    FROM lineitem GROUP BY l_returnflag, l_linestatus
""")
def op_prefixed(spark, sf_dir):
    """bigslice.Prefixed (reference slice.go:1034-1071): widen key to 2."""
    sess, t = _s(spark, sf_dir)
    sl = (sess.wrap(t["lineitem"])
          .map_("l_returnflag", "l_linestatus", "l_quantity")
          .prefixed(2))
    return sl.fold(aggs={"n": F.count(F.lit(1)),
                         "qty": dsum("l_quantity")}).df


@query("op_cache", """
    SELECT r_regionkey, r_name FROM region
""")
def op_cache(spark, sf_dir):
    """bigslice.Cache/ReadCache (reference cache.go:16-95): parquet-backed
    materialization with existence short-circuit."""
    import tempfile
    sess, t = _s(spark, sf_dir)
    prefix = tempfile.mkdtemp(prefix="bsc_cache_")
    sl = sess.wrap(t["region"]).map_("r_regionkey", "r_name")
    sl.cache(prefix)          # writes
    return sl.cache(prefix).df  # short-circuits to read


@query("op_scan", """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
""")
def op_scan(spark, sf_dir):
    """bigslice.Scan (reference slice.go:996-1032): terminal per-shard
    row consumption. The side-effect channel is exercised per partition
    (an Arrow-batched tap, like Scan's per-shard Scanner); the returned
    frame is the deterministic per-shard summary re-aggregated, so the
    oracle can check that every shard saw every row exactly once."""
    import pandas as pd
    _, t = _s(spark, sf_dir)

    def per_shard(batches):
        n = 0
        s = 0
        for pdf in batches:
            n += len(pdf)                      # the "scan" side effect
            s += int(pdf["o_orderkey"].sum())
        yield pd.DataFrame({"n_rows": [n], "key_sum": [s]})

    summary = t["orders"].select("o_orderkey").mapInPandas(
        per_shard, schema="n_rows long, key_sum long")
    return summary.agg(F.sum("n_rows").alias("n_rows"),
                       F.sum("key_sum").alias("key_sum"))


_TAR_FILES = [("a.txt", b"alpha\n"), ("b.txt", b"bravo bravo\n"),
              ("sub/c.txt", b"charlie\n")]


@query("source_tar", """
    SELECT * FROM (VALUES ('a.txt', 6, 'alpha\n'),
                          ('b.txt', 12, 'bravo bravo\n'),
                          ('sub/c.txt', 8, 'charlie\n'))
        t(name, size, body_text)
""")
def source_tar(spark, sf_dir):
    """tarslice.Reader (reference archive/tarslice/tarslice.go:29-87):
    tar-archive entries as rows. A fixed archive is materialized to a
    scratch dir, read via the binaryFile + mapInPandas source, and
    checked against its literal contents."""
    import io
    import os
    import tarfile
    import tempfile

    from .sources import tar_reader
    d = os.path.join(tempfile.gettempdir(), "bsq_tar_fixture")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, "fixture.tar")
    if not os.path.exists(p):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for name, body in _TAR_FILES:
                info = tarfile.TarInfo(name=name)
                info.size = len(body)
                tf.addfile(info, io.BytesIO(body))
        tmp = p + ".tmp"
        with open(tmp, "wb") as f:
            f.write(buf.getvalue())
        os.replace(tmp, p)
    df = tar_reader(spark, d)
    return df.select("name", F.col("size").cast("int").alias("size"),
                     F.col("body").cast("string").alias("body_text"))


@query("source_csv", """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
""")
def source_csv(spark, sf_dir):
    """CSV source with a pinned schema (never inferSchema): nation is
    round-tripped through CSV in a scratch dir and read back — the
    oracle checks losslessness against the parquet original (integer and
    string columns only; floats would need a format contract)."""
    import tempfile
    _, t = _s(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="bsq_csv_")
    t["nation"].select("n_nationkey", "n_name", "n_regionkey") \
        .write.mode("overwrite").option("header", "true").csv(d)
    return spark.read.schema(
        "n_nationkey int, n_name string, n_regionkey int") \
        .option("header", "true").csv(d)


@query("source_csv_malformed", """
    SELECT * FROM (VALUES
        (0, 'alpha', false), (1, 'beta', false),
        (2, 'gamma', true), (CAST(NULL AS INT), 'delta', true),
        (3, 'epsilon', false)) AS t(k, name, bad)
""")
def source_csv_malformed(spark, sf_dir):
    """Malformed-row CSV ingest (sources/read_csv): a file with a
    too-many-fields row and an untypeable row is read PERMISSIVE with
    ``corrupt_record_col`` — parseable fields survive, each broken raw
    line lands in the corrupt column, and quarantine is a plain filter
    (``bad``) instead of silent loss. The fixture is a fixed 5-line
    file written per run; the oracle states the expected parse
    verbatim."""
    import os
    import tempfile

    from .sources import read_csv
    d = tempfile.mkdtemp(prefix="bss_badcsv_")
    with open(os.path.join(d, "data.csv"), "w") as fh:
        fh.write("k,name\n0,alpha\n1,beta\n2,gamma,extra\n"
                 "x,delta\n3,epsilon\n")
    df = read_csv(spark, d, "k int, name string",
                  corrupt_record_col="_bad")
    return df.select("k", "name",
                     F.col("_bad").isNotNull().alias("bad"))


# =====================================================================
# Relational surface beyond the reference (SURVEY §2.3) — Spark frees.
# =====================================================================

@query("q1_pricing_summary", f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum_sql('l_quantity')} AS sum_qty,
           {_dsum_sql('l_extendedprice')} AS sum_base_price,
           {_dsum_sql('l_extendedprice * (1 - l_discount)', 8)}
               AS sum_disc_price,
           {_dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 8)}
               AS sum_charge,
           {_dsum_sql('l_quantity')} / count(*) AS avg_qty,
           {_dsum_sql('l_extendedprice')} / count(*) AS avg_price,
           {_dsum_sql('l_discount', 6)} / count(*) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
""")
def q1_pricing_summary(spark, sf_dir):
    _, t = _s(spark, sf_dir)
    li = t["lineitem"].filter(F.col("l_shipdate") <= "1998-09-02")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(disc, 8).alias("sum_disc_price"),
        dsum(charge, 8).alias("sum_charge"),
        (dsum("l_quantity") / n).alias("avg_qty"),
        (dsum("l_extendedprice") / n).alias("avg_price"),
        (dsum("l_discount", 6) / n).alias("avg_disc"),
        n.alias("count_order"))


@query("q3_shipping_priority", f"""
    SELECT l_orderkey,
           {_dsum_sql('l_extendedprice * (1 - l_discount)', 8)} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey
    ORDER BY revenue DESC, l_orderkey LIMIT 10
""")
def q3_shipping_priority(spark, sf_dir):
    """Join chain with a broadcast dim (customer) — Catalyst picks BHJ via
    autoBroadcastJoinThreshold; revenue agg shuffles once on l_orderkey."""
    _, t = _s(spark, sf_dir)
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING") \
        .select("c_custkey")
    orders = t["orders"].filter(F.col("o_orderdate") < "1998-03-15") \
        .select("o_orderkey", "o_custkey")
    li = t["lineitem"].filter(F.col("l_shipdate") > "1995-03-15") \
        .select("l_orderkey", "l_extendedprice", "l_discount")
    j = (orders.join(F.broadcast(cust),
                     orders.o_custkey == cust.c_custkey)
         .join(li, li.l_orderkey == orders.o_orderkey))
    rev = j.groupBy("l_orderkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 8)
        .alias("revenue"))
    return rev.orderBy(F.desc("revenue"), "l_orderkey").limit(10)


@query("q5_regional_revenue", f"""
    SELECT n_name, {_dsum_sql('l_extendedprice * (1 - l_discount)', 8)}
               AS revenue
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN supplier ON s_nationkey = n_nationkey
    JOIN lineitem ON l_suppkey = s_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n_name
""")
def q5_regional_revenue(spark, sf_dir):
    """Star join: all dims broadcast, single shuffle for the final agg."""
    _, t = _s(spark, sf_dir)
    dims = (t["region"]
            .join(t["nation"],
                  t["nation"].n_regionkey == t["region"].r_regionkey)
            .join(t["supplier"],
                  t["supplier"].s_nationkey == t["nation"].n_nationkey)
            .select("s_suppkey", "n_name"))
    orders = t["orders"].filter(F.col("o_orderdate") >= "1996-01-01") \
        .select("o_orderkey")
    li = t["lineitem"].select("l_orderkey", "l_suppkey",
                              "l_extendedprice", "l_discount")
    j = (li.join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
           .join(orders, li.l_orderkey == orders.o_orderkey))
    return j.groupBy("n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 8)
        .alias("revenue"))


@query("word_count", """
    SELECT token, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS token
          FROM documents)
    WHERE token <> ''
    GROUP BY token
""")
def word_count(spark, sf_dir):
    """The reference's flagship demo (docs/index.md:88-121):
    ScanReader→Flatmap→Map→Reduce, via the Slice API."""
    sess, t = _s(spark, sf_dir)
    return (sess.wrap(t["documents"])
            .flatmap(F.split("text", r"\s+").alias("token"))
            .filter_(F.col("token") != "")
            .map_(F.col("token"), F.lit(1).alias("n"))
            .reduce_("sum")).df


@query("join_semi", """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
""")
def join_semi(spark, sf_dir):
    _, t = _s(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 300000)
    return (t["customer"]
            .join(big, t["customer"].c_custkey == big.o_custkey,
                  "left_semi")
            .select("c_custkey", "c_name"))


@query("join_anti", """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""")
def join_anti(spark, sf_dir):
    _, t = _s(spark, sf_dir)
    return (t["customer"]
            .join(t["orders"],
                  t["customer"].c_custkey == t["orders"].o_custkey,
                  "left_anti")
            .select("c_custkey", "c_name"))


@query("join_broadcast", f"""
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
           {_dsum_sql('o_totalprice')} AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
""")
def join_broadcast(spark, sf_dir):
    _, t = _s(spark, sf_dir)
    return (t["orders"]
            .join(F.broadcast(t["customer"]),
                  t["orders"].o_custkey == t["customer"].c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 dsum("o_totalprice").alias("total")))


@query("window_rank", """
    SELECT o_custkey, o_orderkey, rnk FROM (
        SELECT o_custkey, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        FROM orders) WHERE rnk <= 3
""")
def window_rank(spark, sf_dir):
    _, t = _s(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"),
                                           "o_orderkey")
    return (t["orders"]
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 3)
            .select("o_custkey", "o_orderkey", "rnk"))


@query("window_running", """
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running
    FROM orders
""")
def window_running(spark, sf_dir):
    _, t = _s(spark, sf_dir)
    w = (W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    running = F.sum(F.col("o_totalprice").cast("decimal(38,4)")) \
        .over(w).cast("double")
    return (t["orders"].withColumn("running", running)
            .select("o_custkey", "o_orderkey", "running"))


@query("set_ops", """
    WITH cn AS (SELECT DISTINCT c_nationkey AS k FROM customer),
         sn AS (SELECT DISTINCT s_nationkey AS k FROM supplier)
    SELECT k, 'both' AS tag FROM (SELECT k FROM cn INTERSECT SELECT k FROM sn)
    UNION ALL
    SELECT k, 'cust_only' AS tag
    FROM (SELECT k FROM cn EXCEPT SELECT k FROM sn)
""")
def set_ops(spark, sf_dir):
    _, t = _s(spark, sf_dir)
    cn = t["customer"].select(F.col("c_nationkey").alias("k")).distinct()
    sn = t["supplier"].select(F.col("s_nationkey").alias("k")).distinct()
    both = cn.intersect(sn).withColumn("tag", F.lit("both"))
    only = cn.exceptAll(sn).withColumn("tag", F.lit("cust_only"))
    return both.unionByName(only)


@query("rollup_agg", f"""
    SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
           {_dsum_sql('l_quantity')} AS qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""")
def rollup_agg(spark, sf_dir):
    _, t = _s(spark, sf_dir)
    return (t["lineitem"].rollup("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum("l_quantity").alias("qty")))


@query("cube_agg", """
    SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""")
def cube_agg(spark, sf_dir):
    _, t = _s(spark, sf_dir)
    return (t["orders"].cube("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n")))


@query("topk_orders", """
    SELECT o_orderkey, o_totalprice AS price
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
""")
def topk_orders(spark, sf_dir):
    """Global top-k → TakeOrderedAndProject (no full sort materialized)."""
    _, t = _s(spark, sf_dir)
    return (t["orders"]
            .orderBy(F.desc("o_totalprice"), "o_orderkey").limit(15)
            .select("o_orderkey", F.col("o_totalprice").alias("price")))


@query("distinct_pairs", """
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
""")
def distinct_pairs(spark, sf_dir):
    _, t = _s(spark, sf_dir)
    return t["lineitem"].select("l_returnflag", "l_linestatus").distinct()


@query("agg_stats", f"""
    SELECT {_dsum_sql('l_quantity')} / count(*) AS avg_q,
           min(l_extendedprice) AS min_p,
           max(l_extendedprice) AS max_p,
           sqrt((count(*) * {_dsum_sql('l_quantity * l_quantity', 8)}
                 - {_dsum_sql('l_quantity')} * {_dsum_sql('l_quantity')})
                / (count(*) * (count(*) - 1))) AS sd_q,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS nparts
    FROM lineitem
""")
def agg_stats(spark, sf_dir):
    """avg/stddev derived from exact decimal sums → identical doubles on
    both engines (engine-native float accumulators are order-dependent)."""
    _, t = _s(spark, sf_dir)
    n = F.count(F.lit(1))
    sq = dsum("l_quantity")
    ssq = dsum(F.col("l_quantity") * F.col("l_quantity"), 8)
    return t["lineitem"].agg(
        (sq / n).alias("avg_q"),
        F.min("l_extendedprice").alias("min_p"),
        F.max("l_extendedprice").alias("max_p"),
        F.sqrt((n * ssq - sq * sq) / (n * (n - 1))).alias("sd_q"),
        F.countDistinct("l_partkey").alias("nparts"))


@query("percentile_quantity", """
    SELECT round(quantile_cont(l_quantity, 0.5), 6) AS p50,
           round(quantile_cont(l_quantity, 0.95), 6) AS p95
    FROM lineitem
""")
def percentile_quantity(spark, sf_dir):
    """Exact percentile (Spark `percentile`) vs DuckDB quantile_cont."""
    _, t = _s(spark, sf_dir)
    return t["lineitem"].agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.95)"), 6).alias("p95"))


@query("approx_distinct", """
    SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           true AS approx_parts_ok,
           true AS approx_p50_ok
    FROM lineitem
""")
def approx_distinct(spark, sf_dir):
    """HLL++ count-distinct and approx_percentile with a CHECKABLE
    contract: the estimates are algorithm-specific (no engine-neutral
    oracle value exists), so the entry emits the exact values computed
    alongside plus boolean error-bound assertions — the oracle computes
    the exact side and expects the bounds to hold (a bound violation
    hash-mismatches). Bounds: 3×rsd for HLL (rsd=0.05), ±2.0 quantity
    units for the percentile sketch.

    Plan note (r6): the exact count-distinct runs in its OWN
    aggregation, cross-joined (1 row x 1 row) with the sketch/
    percentile pass — mixing a DISTINCT aggregate with object-buffer
    aggregates in one Aggregate triggers Catalyst's Expand-based
    distinct rewrite, and the percentile/HLL buffers then run over 2x
    expanded input (measured 13.6s vs ~1.3s for the split at sf0.1;
    two skinny passes is also the plan that survives 100TB)."""
    _, t = _s(spark, sf_dir)
    li = t["lineitem"]
    exact = li.agg(F.countDistinct("l_partkey").alias("exact_parts"))
    sketch = li.agg(
        F.approx_count_distinct("l_partkey", 0.05).alias("__approx"),
        F.expr("percentile(l_quantity, 0.5)").alias("__p50"),
        F.expr("approx_percentile(l_quantity, 0.5)").alias("__ap50"))
    agg = exact.crossJoin(sketch)
    return agg.select(
        "exact_parts",
        (F.abs(F.col("__approx").cast("double") - F.col("exact_parts"))
         <= 0.15 * F.col("exact_parts")).alias("approx_parts_ok"),
        (F.abs(F.col("__ap50") - F.col("__p50")) <= F.lit(2.0))
        .alias("approx_p50_ok"))


@query("pivot_status", f"""
    SELECT l_returnflag,
           coalesce({_dsum_sql("CASE WHEN l_linestatus = 'O' "
                               "THEN l_quantity END")}, 0.0) AS qty_O,
           coalesce({_dsum_sql("CASE WHEN l_linestatus = 'F' "
                               "THEN l_quantity END")}, 0.0) AS qty_F
    FROM lineitem GROUP BY l_returnflag
""")
def pivot_status(spark, sf_dir):
    _, t = _s(spark, sf_dir)
    p = (t["lineitem"].groupBy("l_returnflag")
         .pivot("l_linestatus", ["O", "F"])
         .agg(dsum("l_quantity")))
    return p.select(
        "l_returnflag",
        F.coalesce(F.col("O"), F.lit(0.0)).alias("qty_O"),
        F.coalesce(F.col("F"), F.lit(0.0)).alias("qty_F"))


@query("grouping_sets", """
    SELECT n_name, r_name, CAST(count(*) AS BIGINT) AS n
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((n_name), (r_name))
""")
def grouping_sets(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql("""
        SELECT n_name, r_name, count(*) AS n
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((n_name), (r_name))
    """)


# =====================================================================
# Events: time-series / sessionization (training-pipeline ops)
# =====================================================================

@query("events_hourly", f"""
    SELECT date_trunc('hour', ts) AS hr, event_type,
           CAST(count(*) AS BIGINT) AS n,
           {_dsum_sql('value', 6)} AS v
    FROM events GROUP BY 1, 2
""")
def events_hourly(spark, sf_dir):
    _, t = _s(spark, sf_dir)
    return (t["events"]
            .groupBy(F.date_trunc("hour", "ts").alias("hr"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum("value", 6).alias("v")))


@query("sessionize", """
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM g)
    SELECT user_id, CAST(sid AS BIGINT) AS sid,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
""")
def sessionize(spark, sf_dir):
    """Sessionization: lag-gap > 30min starts a session. Scalable — one
    shuffle on user_id, both windows reuse the same sort."""
    _, t = _s(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_s = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    g = t["events"].withColumn("new_s", new_s)
    sid = F.sum("new_s").over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow))
    s = g.withColumn("sid", sid)
    return (s.groupBy("user_id", "sid")
            .agg(F.count(F.lit(1)).alias("n_events")))


# =====================================================================
# LLM-training-data pipeline operators (BASELINE.json north star):
# dedup / similarity search / text analysis / multimodal / as-of.
# =====================================================================

@query("dedup_exact", """
    SELECT md5(text) AS h, CAST(min(doc_id) AS BIGINT) AS doc_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY md5(text)
""")
def dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on content digest (operators/dedup.py)."""
    from .operators.dedup import exact_dedup
    _, t = _s(spark, sf_dir)
    return exact_dedup(t["documents"]).select("h", "doc_id", "n_copies")


def _minhash_pairs_ctes(src: str = "documents", num_hashes: int = 64,
                        bands: int = 16, threshold: float = 0.5,
                        pair_pred: str = "a.doc_id < b.doc_id",
                        a_name: str = "id_a",
                        b_name: str = "id_b") -> str:
    """CTE chain (ending in ``mh_pairs(id_a, id_b, sim)``) replaying the
    PORTABLE-mode minhash_lsh_pairs pipeline over relation ``src``:
    md5-derived 31-bit token hash → the same fixed affine family → 64
    MIN aggregates → 16-band keys → candidate self-join (band key equal,
    id_a < id_b) → signature-match verify. All integer arithmetic, so
    equality is exact, not approximate. Reused by the dedup_minhash and
    pipeline_end2end oracles."""
    from .operators.dedup import _MH_PRIME, minhash_coeffs
    rpb = num_hashes // bands
    mins = ",\n             ".join(
        f"min((h * {a} + {b}) % {_MH_PRIME}) AS s{i}"
        for i, (a, b) in enumerate(minhash_coeffs(num_hashes)))
    bhs = ",\n             ".join(
        "concat_ws(',', "
        + ", ".join(f"s{b * rpb + i}" for i in range(rpb))
        + f") AS bh{b}"
        for b in range(bands))
    band_or = " OR ".join(f"a.bh{b} = b.bh{b}" for b in range(bands))
    matches = " + ".join(
        f"(CASE WHEN a.s{i} = b.s{i} THEN 1 ELSE 0 END)"
        for i in range(num_hashes))
    return f"""
    mh_base AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                 t -> t <> '') AS tk
      FROM {src}),
    mh_sh AS (
      SELECT doc_id,
             CASE WHEN len(tk) >= 3 THEN
               list_transform(generate_series(1, len(tk) - 2),
                   i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))
             ELSE [concat_ws(' ', tk)] END AS sl
      FROM mh_base),
    mh_toks AS (SELECT doc_id, unnest(sl) AS tok FROM mh_sh),
    mh_hx AS (SELECT doc_id,
                  ('0x' || substr(md5(tok), 1, 15))::BIGINT
                  % {_MH_PRIME} AS h
           FROM mh_toks),
    mh_sig AS (SELECT doc_id,
             {mins}
            FROM mh_hx GROUP BY doc_id),
    mh_sigb AS (SELECT *,
             {bhs}
             FROM mh_sig),
    mh_pairs AS (
      SELECT {a_name}, {b_name}, sim FROM (
        SELECT a.doc_id AS {a_name}, b.doc_id AS {b_name},
               CAST({matches} AS DOUBLE) / {float(num_hashes)} AS sim
        FROM mh_sigb a JOIN mh_sigb b
          ON {pair_pred} AND ({band_or}))
      WHERE sim >= {threshold})"""


def _minhash_oracle(num_hashes: int = 64, bands: int = 16,
                    threshold: float = 0.5) -> str:
    return f"""
    WITH {_minhash_pairs_ctes('documents', num_hashes, bands, threshold)}
    SELECT id_a, id_b, sim FROM mh_pairs
    """


def _simhash_oracle(max_hamming: int = 8) -> str:
    """Exact SQL replay of the PORTABLE-mode simhash_pairs pipeline: the
    64 sign bits come from md5-derived 32-bit halves, candidates share an
    equal 16-bit band, verify is the bit-difference count."""
    def bit_sum(j):
        src, k = ("h_lo", j) if j < 32 else ("h_hi", j - 32)
        return (f"CAST(sum(CASE WHEN (({src} >> {k}) & 1) = 1 "
                f"THEN 1 ELSE -1 END) > 0 AS INT) AS b{j}")
    sig_bits = ",\n             ".join(bit_sum(j) for j in range(64))
    bhs = ",\n             ".join(
        "concat_ws(''" + "".join(f", b{16 * b + i}" for i in range(16))
        + f") AS bh{b}"
        for b in range(4))
    band_or = " OR ".join(f"a.bh{b} = b.bh{b}" for b in range(4))
    hamming = " + ".join(
        f"(CASE WHEN a.b{j} <> b.b{j} THEN 1 ELSE 0 END)"
        for j in range(64))
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'),
                                        t -> t <> '')) AS t
      FROM documents),
    hx AS (SELECT doc_id,
                  ('0x' || substr(md5(t), 1, 8))::BIGINT AS h_lo,
                  ('0x' || substr(md5(t), 9, 8))::BIGINT AS h_hi
           FROM toks),
    sig AS (SELECT doc_id,
             {sig_bits}
            FROM hx GROUP BY doc_id),
    sigb AS (SELECT *,
             {bhs}
             FROM sig)
    SELECT id_a, id_b, hamming FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST({hamming} AS INT) AS hamming
      FROM sigb a JOIN sigb b
        ON a.doc_id < b.doc_id AND ({band_or}))
    WHERE hamming <= {max_hamming}
    """


@query("dedup_minhash", _minhash_oracle())
def dedup_minhash(spark, sf_dir):
    """MinHash+LSH near-dup pairs (shingle→minhash→band→candidate
    self-join→signature verify), fully expression-level with NO bucket
    cap. Runs in PORTABLE hash mode (md5-derived token hashes) so the
    DuckDB oracle replays the ENTIRE pipeline exactly — candidate
    generation included. The xxhash64 fast path (identical plan shape)
    is pytest-verified against exact Jaccard."""
    from .operators.dedup import minhash_lsh_pairs
    _, t = _s(spark, sf_dir)
    return minhash_lsh_pairs(t["documents"], num_hashes=64, bands=16,
                             threshold=0.5, portable=True)


@query("dedup_simhash", _simhash_oracle())
def dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs: 4×16-bit band pigeonhole + hamming verify,
    no bucket cap. PORTABLE hash mode — the oracle replays fingerprints,
    banding, and the hamming check bit-for-bit in SQL."""
    from .operators.dedup import simhash_pairs
    _, t = _s(spark, sf_dir)
    return simhash_pairs(t["documents"], max_hamming=8, portable=True)


@query("ngram_jaccard", """
    WITH base AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                 t -> t <> '') AS tk
      FROM documents),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(tk) >= 3 THEN
               list_transform(generate_series(1, len(tk) - 2),
                   i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))
             ELSE [concat_ws(' ', tk)] END AS sl
      FROM base),
    toks AS (SELECT doc_id, unnest(list_distinct(sl)) AS tok FROM sh),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
              FROM toks GROUP BY doc_id),
    ndocs AS (SELECT count(*) AS n FROM documents),
    hot AS (SELECT tok FROM toks GROUP BY tok
            HAVING count(*) > (SELECT CAST(floor(0.3 * n) AS BIGINT)
                               FROM ndocs)),
    cold AS (SELECT doc_id, tok FROM toks
             WHERE tok NOT IN (SELECT tok FROM hot)),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(count(*) AS BIGINT) AS inter
      FROM cold a JOIN cold b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT id_a, id_b,
           CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE)
               AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE)
          >= 0.8
""")
def ngram_jaccard(spark, sf_dir):
    """Exact word-3-shingle Jaccard pairs via inverted-index self-join —
    the oracle-checkable dedup path (operators/dedup.py). Shingles (not
    raw tokens) keep posting lists short, and df-pruning at 0.3 —
    replicated in the oracle SQL — bounds the Zipf-hot-shingle quadratic
    blowup; candidate pairs must share a non-hot shingle (Jaccard itself
    is computed on the unpruned set sizes)."""
    from .operators.dedup import ngram_jaccard_pairs
    _, t = _s(spark, sf_dir)
    return ngram_jaccard_pairs(t["documents"], threshold=0.8,
                               max_df_ratio=0.3, shingle_w=3)


@query("edit_distance_pairs", """
    WITH base AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                 t -> t <> '') AS tk
      FROM documents),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(tk) >= 3 THEN
               list_transform(generate_series(1, len(tk) - 2),
                   i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))
             ELSE [concat_ws(' ', tk)] END AS sl
      FROM base),
    toks AS (SELECT doc_id, unnest(list_distinct(sl)) AS tok FROM sh),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
              FROM toks GROUP BY doc_id),
    ndocs AS (SELECT count(*) AS n FROM documents),
    hot AS (SELECT tok FROM toks GROUP BY tok
            HAVING count(*) > (SELECT CAST(floor(0.3 * n) AS BIGINT)
                               FROM ndocs)),
    cold AS (SELECT doc_id, tok FROM toks
             WHERE tok NOT IN (SELECT tok FROM hot)),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(count(*) AS BIGINT) AS inter
      FROM cold a JOIN cold b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(inter AS DOUBLE)
            / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.8)
    SELECT p.id_a, p.id_b,
           CAST(levenshtein(da.text, db.text) AS INT) AS edit_dist
    FROM pairs p
    JOIN documents da ON da.doc_id = p.id_a
    JOIN documents db ON db.doc_id = p.id_b
""")
def edit_distance_pairs(spark, sf_dir):
    """Edit-distance verification of near-dup candidates
    (operators/dedup.py edit_distance_rerank): the ngram-Jaccard
    candidate pairs joined back to their texts and scored with the
    codegen JVM levenshtein — the exact last stage after shingle/LSH
    generation, quadratic only in document length and only on the
    bounded candidate set. Spark's distance is character-exact;
    DuckDB's replay is byte-level, identical on this ASCII corpus."""
    from .operators.dedup import (edit_distance_rerank,
                                  ngram_jaccard_pairs)
    _, t = _s(spark, sf_dir)
    pairs = ngram_jaccard_pairs(t["documents"], threshold=0.8,
                                max_df_ratio=0.3, shingle_w=3) \
        .select("id_a", "id_b")
    return edit_distance_rerank(pairs, t["documents"])


@query("ngram_containment", """
    WITH base AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                 t -> t <> '') AS tk
      FROM documents),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(tk) >= 3 THEN
               list_transform(generate_series(1, len(tk) - 2),
                   i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))
             ELSE [concat_ws(' ', tk)] END AS sl
      FROM base),
    toks AS (SELECT doc_id, unnest(list_distinct(sl)) AS tok FROM sh),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
              FROM toks GROUP BY doc_id),
    ndocs AS (SELECT count(*) AS n FROM documents),
    hot AS (SELECT tok FROM toks GROUP BY tok
            HAVING count(*) > (SELECT CAST(floor(0.3 * n) AS BIGINT)
                               FROM ndocs)),
    cold AS (SELECT doc_id, tok FROM toks
             WHERE tok NOT IN (SELECT tok FROM hot)),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(count(*) AS BIGINT) AS inter
      FROM cold a JOIN cold b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT id_a, id_b,
           CAST(inter AS DOUBLE) / CAST(least(sa.sz, sb.sz) AS DOUBLE)
               AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(inter AS DOUBLE) / CAST(least(sa.sz, sb.sz) AS DOUBLE)
          >= 0.9
""")
def ngram_containment(spark, sf_dir):
    """Asymmetric near-dup pairs (operators/dedup.py
    metric='containment'): inter/min(|A|,|B|) over the same pruned
    inverted index as ngram_jaccard — a document quoted whole inside a
    larger one scores ~1.0 where Jaccard stays low. Same index build,
    same bucketed self-join; only the final expression differs."""
    from .operators.dedup import ngram_jaccard_pairs
    _, t = _s(spark, sf_dir)
    return ngram_jaccard_pairs(t["documents"], threshold=0.9,
                               max_df_ratio=0.3, shingle_w=3,
                               metric="containment")


@query("equidepth_histogram", """
    WITH r AS (
      SELECT o_totalprice AS x,
             row_number() OVER (ORDER BY o_totalprice, o_orderkey)
                 AS rn,
             count(*) OVER () AS n
      FROM orders)
    SELECT CAST((rn - 1) * 10 // n AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(x) AS lo, max(x) AS hi
    FROM r GROUP BY bucket
""")
def equidepth_histogram_q(spark, sf_dir):
    """Exact equi-depth (decile) histogram of o_totalprice
    (operators/rank.py): the global rank comes from range
    partitioning + two-level offsets, NOT a single-partition sort
    window — the plan a 100 TB order-statistics pass needs. Bucket
    bounds are untouched doubles; the oracle replays with a plain
    row_number (fine at DuckDB's scale, fatal at Spark's)."""
    from .operators.rank import equidepth_histogram
    _, t = _s(spark, sf_dir)
    return equidepth_histogram(t["orders"], "o_totalprice",
                               "o_orderkey", k=10)


@query("dedup_components", """
    WITH RECURSIVE pairs AS (
      -- same pair generation as the ngram_jaccard oracle
      SELECT id_a, id_b FROM (
        WITH base AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                     t -> t <> '') AS tk
          FROM documents),
        sh AS (
          SELECT doc_id,
                 CASE WHEN len(tk) >= 3 THEN
                   list_transform(generate_series(1, len(tk) - 2),
                       i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))
                 ELSE [concat_ws(' ', tk)] END AS sl
          FROM base),
        toks AS (SELECT doc_id, unnest(list_distinct(sl)) AS tok FROM sh),
        sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
                  FROM toks GROUP BY doc_id),
        ndocs AS (SELECT count(*) AS n FROM documents),
        hot AS (SELECT tok FROM toks GROUP BY tok
                HAVING count(*) > (SELECT CAST(floor(0.3 * n) AS BIGINT)
                                   FROM ndocs)),
        cold AS (SELECT doc_id, tok FROM toks
                 WHERE tok NOT IN (SELECT tok FROM hot)),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(count(*) AS BIGINT) AS inter
          FROM cold a JOIN cold b ON a.tok = b.tok AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
        SELECT id_a, id_b
        FROM inter JOIN sizes sa ON sa.doc_id = id_a
                   JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(inter AS DOUBLE)
              / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.8)
    ),
    sym AS (SELECT id_a AS u, id_b AS v FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
    reach(node, label) AS (
      SELECT u, u FROM sym
      UNION
      SELECT s.v, r.label FROM reach r JOIN sym s ON s.u = r.node)
    SELECT node, CAST(min(label) AS BIGINT) AS component
    FROM reach GROUP BY node
""")
def dedup_components(spark, sf_dir):
    """Transitive closure of near-duplicate pairs into duplicate
    CLUSTERS: iterative min-label propagation (operators/graph.py) over
    the exact-Jaccard pair graph — the Spark analog of the reference's
    iterative Result-reuse workloads (SURVEY §3 entry point C). The
    oracle replays it as a recursive CTE. Only connected docs are
    emitted (singletons are their own trivial component)."""
    from .operators.dedup import ngram_jaccard_pairs
    from .operators.graph import connected_components
    _, t = _s(spark, sf_dir)
    pairs = ngram_jaccard_pairs(t["documents"], threshold=0.8,
                                max_df_ratio=0.3, shingle_w=3)
    return connected_components(pairs, src="id_a", dst="id_b")


def _embed_pairs_oracle(dim: int = 64, threshold: float = 0.4) -> str:
    """SQL replay of embedding_cosine_pairs: same-label pairs, cosine in
    the exact left-associative order _dot_wide's array fold evaluates
    (0.0-seeded fold == unrolled sum, bitwise) → identical doubles →
    an exact threshold filter."""
    dot = " + ".join(
        f"CAST(a.embedding[{i+1}] AS DOUBLE) * CAST(b.embedding[{i+1}] "
        f"AS DOUBLE)" for i in range(dim))
    nsum = " + ".join(
        f"CAST(embedding[{i+1}] AS DOUBLE) * CAST(embedding[{i+1}] AS "
        f"DOUBLE)" for i in range(dim))
    return f"""
    WITH norms AS (SELECT vec_id AS id, sqrt({nsum}) AS nrm
                   FROM embeddings),
    scored AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ({dot}) / (na.nrm * nb.nrm) AS cosine
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      JOIN norms na ON na.id = a.vec_id
      JOIN norms nb ON nb.id = b.vec_id
      WHERE na.nrm > 0 AND nb.nrm > 0)
    SELECT id_a, id_b, cosine FROM scored WHERE cosine >= {threshold}
    """


def _pagerank_oracle(iters: int = 3, damping: float = 0.85) -> str:
    """Exact SQL replay of pagerank(ordered=True): every float op is
    order-pinned — init 1/N, contributions folded in neighbor-id order
    (list_reduce == Spark's aggregate() left fold), damping constants
    forced to DOUBLE (DuckDB parses bare 0.85 as DECIMAL, which would
    differ in the last ulp) — so three iterations of ranks match
    bitwise."""
    it_ctes = []
    prev = "r0"
    for k in range(iters):
        nxt = f"r{k + 1}"
        it_ctes.append(f""",
    c{k} AS (
      SELECT e.d AS node, e.s AS nbr, {prev}.r / deg.outdeg AS c
      FROM e JOIN {prev} ON {prev}.node = e.s
      JOIN deg ON deg.node = e.s),
    f{k} AS (
      SELECT node, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(c ORDER BY nbr)), (acc, x) -> acc + x) AS in_sum
      FROM c{k} GROUP BY node),
    {nxt} AS (
      SELECT n.node,
             (CAST(1.0 AS DOUBLE) - CAST({damping} AS DOUBLE))
                 / (SELECT CAST(count(*) AS DOUBLE) FROM nodes)
             + CAST({damping} AS DOUBLE)
               * coalesce(f.in_sum, CAST(0.0 AS DOUBLE)) AS r
      FROM nodes n LEFT JOIN f{k} f ON f.node = n.node)""")
        prev = nxt
    return f"""
    WITH e AS (
      SELECT DISTINCT l_suppkey AS s, o_custkey + 1000000 AS d
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
    nodes AS (SELECT s AS node FROM e UNION SELECT d FROM e),
    deg AS (SELECT s AS node, CAST(count(*) AS BIGINT) AS outdeg
            FROM e GROUP BY s),
    r0 AS (SELECT node,
                  CAST(1.0 AS DOUBLE)
                  / (SELECT CAST(count(*) AS DOUBLE) FROM nodes) AS r
           FROM nodes){"".join(it_ctes)}
    SELECT node, r AS rank FROM {prev}
    """


def _lpa_oracle(iters: int = 4) -> str:
    """Exact SQL replay of label_propagation: same candidate multiset
    (neighbor labels + own label), same arg-max rule (count DESC,
    label ASC), one unrolled CTE pair per synchronous round — integer
    counts and ids only, so the replay is exact, not approximate."""
    ctes = []
    prev = "l0"
    for k in range(iters):
        nxt = f"l{k + 1}"
        ctes.append(f""",
    c{k} AS (
      SELECT node, label, count(*) AS c FROM (
        SELECT s.u AS node, l.label FROM sym s
        JOIN {prev} l ON l.node = s.v
        UNION ALL SELECT node, label FROM {prev})
      GROUP BY node, label),
    {nxt} AS (
      SELECT node, label FROM (
        SELECT node, label, row_number() OVER (
          PARTITION BY node ORDER BY c DESC, label ASC) AS rn
        FROM c{k})
      WHERE rn = 1)""")
        prev = nxt
    return f"""
    WITH e AS (
      SELECT DISTINCT l_suppkey AS s, o_custkey + 1000000 AS d
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
    sym AS (SELECT s AS u, d AS v FROM e UNION SELECT d, s FROM e),
    l0 AS (SELECT DISTINCT u AS node, u AS label FROM sym)
    {"".join(ctes)}
    SELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS label
    FROM {prev}
    """


@query("lpa_communities", _lpa_oracle())
def lpa_communities(spark, sf_dir):
    """Label-propagation communities (operators/graph.py
    label_propagation) over the supplier → customer shipment graph —
    the community-detection step after near-dup clustering, denser
    than connected components. Synchronous rounds with the
    deterministic (count DESC, label ASC) arg-max make the fixed
    4-iteration run bitwise replayable by the unrolled-CTE oracle."""
    from .operators.graph import label_propagation
    _, t = _s(spark, sf_dir)
    e = (t["lineitem"]
         .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
         .select(F.col("l_suppkey").alias("src"),
                 (F.col("o_custkey") + 1000000).alias("dst")))
    return label_propagation(e, iters=4, broadcast_labels=True)


@query("pagerank", _pagerank_oracle())
def pagerank_q(spark, sf_dir):
    """Iterative PageRank (operators/graph.py) over the supplier →
    customer shipment graph — the second SURVEY §3-C iterative workload
    next to dedup_components. ordered=True folds contributions in
    neighbor order, so all three iterations of double arithmetic match
    the SQL oracle bitwise."""
    from .operators.graph import pagerank
    _, t = _s(spark, sf_dir)
    e = (t["lineitem"].select("l_suppkey", "l_orderkey")
         .join(t["orders"].select("o_orderkey", "o_custkey"),
               F.col("l_orderkey") == F.col("o_orderkey"))
         .select(F.col("l_suppkey").alias("src"),
                 (F.col("o_custkey") + 1000000).alias("dst")))
    return pagerank(e, iters=3, damping=0.85, ordered=True)


@query("dedup_embedding", _embed_pairs_oracle())
def dedup_embedding(spark, sf_dir):
    """Embedding near-dup pairs bucketed by label. The synthetic corpus
    has no true near-dups (max same-label cosine ≈ 0.51 at sf0.1), so
    the registry entry runs at threshold 0.4 to exercise real rows —
    the oracle replays the cosine bitwise (same technique as
    similarity_topk), making the threshold filter exact."""
    from .operators.dedup import embedding_cosine_pairs
    _, t = _s(spark, sf_dir)
    return embedding_cosine_pairs(t["embeddings"], threshold=0.4)


def _cosine_oracle(dim: int = 64) -> str:
    """Wide left-associative dot/norm sums — the exact expression order
    brute_force_topk's codegen uses, so the doubles match bitwise."""
    dot = " + ".join(
        f"CAST(qv[{i+1}] AS DOUBLE) * CAST(v[{i+1}] AS DOUBLE)"
        for i in range(dim))
    nsum = " + ".join(
        f"CAST(embedding[{i+1}] AS DOUBLE) * CAST(embedding[{i+1}] AS "
        f"DOUBLE)" for i in range(dim))
    return f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
               WHERE vec_id < 5),
    c AS (SELECT vec_id AS nid, embedding AS v FROM embeddings),
    norms AS (SELECT vec_id AS id, sqrt({nsum}) AS nrm FROM embeddings),
    scored AS (
      SELECT qid, nid, ({dot}) / (nq.nrm * nn.nrm) AS cosine
      FROM q JOIN c ON nid <> qid
      JOIN norms nq ON nq.id = qid JOIN norms nn ON nn.id = nid
      WHERE nq.nrm > 0 AND nn.nrm > 0)
    SELECT qid, nid, cosine, CAST(rank AS INT) AS rank FROM (
      SELECT qid, nid, cosine,
             row_number() OVER (PARTITION BY qid
                 ORDER BY cosine DESC, nid) AS rank
      FROM scored) WHERE rank <= 10
    """


@query("similarity_topk", _cosine_oracle())
def similarity_topk(spark, sf_dir):
    """Brute-force cosine top-k; the array-fold dot product evaluates
    in the same left-assoc order as the oracle's unrolled SQL sums →
    bitwise-identical cosines (operators/similarity.py _dot_wide)."""
    from .operators.similarity import brute_force_topk
    _, t = _s(spark, sf_dir)
    emb = t["embeddings"]
    qs = emb.filter(F.col("vec_id") < 5)
    return brute_force_topk(emb, qs, k=10, dim=64)


def _lsh_oracle(dim: int = 64, nbits: int = 6, multiprobe: int = 2,
                k: int = 10) -> str:
    """Exact SQL replay of lsh_topk: the hyperplane family is a fixed
    seeded LCG, so its float coefficients are embedded as literals; the
    projection sums use the same left-associative order as _bucket_expr →
    identical doubles → identical sign bits → identical buckets,
    candidates, and (via the _cosine_oracle technique) cosines."""
    from .operators.similarity import _hyperplanes
    planes = _hyperplanes(dim, nbits)

    def bucket(vec: str) -> str:
        terms = []
        for i, p in enumerate(planes):
            proj = " + ".join(
                f"CAST({vec}[{j+1}] AS DOUBLE) * ({p[j]!r})"
                for j in range(dim))
            terms.append(f"(CASE WHEN ({proj}) > 0 "
                         f"THEN {1 << i} ELSE 0 END)")
        return " + ".join(terms)

    dot = " + ".join(
        f"CAST(v[{i+1}] AS DOUBLE) * CAST(qv[{i+1}] AS DOUBLE)"
        for i in range(dim))
    nsum = " + ".join(
        f"CAST(embedding[{i+1}] AS DOUBLE) * CAST(embedding[{i+1}] AS "
        f"DOUBLE)" for i in range(dim))
    probes = ["bk0"] + [f"xor(bk0, {1 << i})"
                        for i in range(max(0, multiprobe - 1))]
    probe_sel = " UNION ALL ".join(
        f"SELECT qid, qv, qnrm, {p} AS bk FROM qb" for p in probes)
    return f"""
    WITH norms AS (SELECT vec_id AS id, sqrt({nsum}) AS nrm
                   FROM embeddings),
    c AS (SELECT e.vec_id AS nid, e.embedding AS v, n.nrm
          FROM embeddings e JOIN norms n ON n.id = e.vec_id
          WHERE n.nrm > 0),
    cb AS (SELECT nid, v, nrm, ({bucket('v')}) AS bk FROM c),
    q AS (SELECT e.vec_id AS qid, e.embedding AS qv, n.nrm AS qnrm
          FROM embeddings e JOIN norms n ON n.id = e.vec_id
          WHERE e.vec_id < 5 AND n.nrm > 0),
    qb AS (SELECT qid, qv, qnrm, ({bucket('qv')}) AS bk0 FROM q),
    pr AS ({probe_sel}),
    scored AS (
      SELECT qid, nid, ({dot}) / (nrm * qnrm) AS cosine
      FROM cb JOIN pr USING (bk) WHERE nid <> qid)
    SELECT qid, nid, cosine, CAST(rank AS INT) AS rank FROM (
      SELECT qid, nid, cosine,
             row_number() OVER (PARTITION BY qid
                 ORDER BY cosine DESC, nid) AS rank
      FROM scored) WHERE rank <= {k}
    """


@query("similarity_lsh", _lsh_oracle())
def similarity_lsh(spark, sf_dir):
    """Random-hyperplane LSH ANN (bucketed equi-join + exact rerank).
    The hyperplane family is deterministic (seeded LCG), so the whole
    path — bucketing, multiprobe, rerank — is replayed exactly by the
    SQL oracle; cosines are bitwise-identical (the array-fold sums
    evaluate in the oracle's unrolled left-assoc order)."""
    from .operators.similarity import lsh_topk
    _, t = _s(spark, sf_dir)
    emb = t["embeddings"]
    qs = emb.filter(F.col("vec_id") < 5)
    return lsh_topk(emb, qs, k=10, nbits=6, multiprobe=2, dim=64)


@query("similarity_ivf", """
    SELECT vec_id AS qid, true AS recall_ok
    FROM embeddings WHERE vec_id < 5
""")
def similarity_ivf(spark, sf_dir):
    """IVF ANN: KMeans cells + nprobe nearest-cell search. KMeans
    centroids aren't ANSI-SQL-replayable (MLlib kmeans|| init), so the
    entry is PROPERTY-checked instead of rows-only: per query, recall@10
    against the (bitwise-oracled) brute-force ground truth must be
    ≥ 0.5 — a violated bound hash-mismatches. Measured: ≥ 0.5 at
    nprobe=3 across SFs; the entry runs nprobe=4 (superset of probed
    cells ⇒ recall only improves)."""
    from .operators.similarity import brute_force_topk, ivf_topk
    _, t = _s(spark, sf_dir)
    emb = t["embeddings"]
    qs = emb.filter(F.col("vec_id") < 5)
    ivf = ivf_topk(emb, qs, k=10, ncells=8, nprobe=4, dim=64)
    bf = brute_force_topk(emb, qs, k=10, dim=64)
    hits = (ivf.select("qid", "nid")
            .join(bf.select("qid", "nid"), ["qid", "nid"])
            .groupBy("qid").agg(F.count(F.lit(1)).alias("n_hits")))
    return (bf.select("qid").distinct()
            .join(hits, on="qid", how="left")
            .select("qid",
                    (F.coalesce(F.col("n_hits"), F.lit(0)) >= 5)
                    .alias("recall_ok")))


@query("token_counts", r"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(text, '\s+'),
                                t -> t <> '')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text,
                    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS BIGINT)
               AS bpe_tokens
    FROM documents
""")
def token_counts(spark, sf_dir):
    """Token-budget estimators (operators/text.py): whitespace tokens and
    BPE-ish pre-token count (lookahead-free GPT-2-shape classes, same
    segmentation in Java regex and RE2 so the oracle reproduces it)."""
    from .operators.text import bpe_token_count, token_count
    _, t = _s(spark, sf_dir)
    return t["documents"].select(
        "doc_id",
        token_count("text").alias("ws_tokens"),
        bpe_token_count("text").alias("bpe_tokens"))


@query("text_stats", """
    WITH s AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             list_filter(string_split_regex(text, '\\s+'),
                         t -> t <> '') AS toks,
             CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT)
                 AS alpha
      FROM documents)
    SELECT doc_id, n_chars,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(alpha AS DOUBLE)
               / CAST(greatest(len(toks), 1) AS DOUBLE) AS mean_token_len,
           CAST(len(list_distinct(toks)) AS DOUBLE)
               / CAST(greatest(len(toks), 1) AS DOUBLE) AS distinct_ratio
    FROM s
""")
def text_stats(spark, sf_dir):
    """Per-document token/char stats, all codegen'd (operators/text.py)."""
    from .operators.text import text_stats as _ts
    _, t = _s(spark, sf_dir)
    return _ts(t["documents"])


@query("quality_score", """
    WITH s AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'),
                         t -> t <> '') AS toks,
             CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT)
                 AS alpha
      FROM documents),
    m AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(alpha AS DOUBLE)
                 / CAST(greatest(len(toks), 1) AS DOUBLE) AS mtl,
             CAST(len(list_distinct(toks)) AS DOUBLE)
                 / CAST(greatest(len(toks), 1) AS DOUBLE) AS dr
      FROM s)
    SELECT doc_id,
           least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.4
           + (CASE WHEN mtl >= 3.0 AND mtl <= 10.0
                   THEN 1.0 ELSE 0.0 END) * 0.3
           + dr * 0.3 AS quality
    FROM m
""")
def quality_score(spark, sf_dir):
    """Deterministic cheap quality prefilter (operators/text.py)."""
    from .operators.text import quality_score as _qs
    _, t = _s(spark, sf_dir)
    return _qs(t["documents"])


def _lang_oracle() -> str:
    from .operators.text import LANGS, LEXICONS
    score_exprs = []
    for lang in LANGS:
        lex = ", ".join(f"'{w}'" for w in LEXICONS[lang])
        score_exprs.append(
            f"CAST(len(list_filter(toks, t -> list_contains([{lex}], t)))"
            f" AS DOUBLE) / CAST(greatest(len(toks), 1) AS DOUBLE)"
            f" AS s_{lang}")
    cases = []
    for i, lang in enumerate(LANGS[:-1]):
        conds = " AND ".join(
            f"s_{lang} >= s_{o}" for o in LANGS[i + 1:])
        cases.append(f"WHEN {conds} THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + f" ELSE '{LANGS[-1]}' END"
    return f"""
    WITH s AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                 t -> t <> '') AS toks
      FROM documents),
    sc AS (SELECT doc_id, {', '.join(score_exprs)} FROM s)
    SELECT doc_id, {case_sql} AS pred_lang FROM sc
    """


# NOTE: lang_id IS value-hash-oracled like every other entry (and has
# been since r3 — CORRECTNESS_r03/r07/r08 all record hash_match=true);
# the SQL is built by _lang_oracle() above because it interpolates the
# LEXICONS tables, and is passed through the decorator so no entry
# looks oracle-less to a '@query("name")' grep (VERDICT r12 task 6).
@query("lang_id", _lang_oracle())
def lang_id(spark, sf_dir):
    """Stopword-hit-rate language ID (operators/text.py); argmax with
    LANGS-order tie-break reproduced in the SQL oracle."""
    from .operators.text import lang_id as _li
    _, t = _s(spark, sf_dir)
    return _li(t["documents"])


def _fingerprint_oracle() -> str:
    """SQL replay of the rolling polynomial hash: the corpus is pure
    ASCII (bytes == codepoints), and DuckDB's 128-bit HUGEINT holds the
    intermediate acc*257+b (< 2^70) that overflows BIGINT — so
    list_reduce folds the exact same sequence mod 2^61-1."""
    from .operators.text import FP_BASE, FP_MOD
    return f"""
    SELECT doc_id,
           CAST(list_reduce(
               list_prepend(0::HUGEINT,
                   list_transform(string_split(text, ''),
                                  c -> ascii(c)::HUGEINT)),
               (acc, x) -> (acc * {FP_BASE} + x) % {FP_MOD})
           AS BIGINT) AS fp
    FROM documents
    """


@query("fingerprint", _fingerprint_oracle())
def fingerprint(spark, sf_dir):
    """Rolling polynomial document fingerprint (pandas UDF path);
    verified against a pure-Python reference in tests AND replayed
    exactly by the HUGEINT list_reduce oracle."""
    from .operators.text import fingerprint as _fp
    _, t = _s(spark, sf_dir)
    return _fp(t["documents"])


@query("multimodal_meta", """
    SELECT doc_id AS id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
""")
def multimodal_meta(spark, sf_dir):
    """Binary media plumbing: pack text as binary payload, extract
    byte-level metadata through the Arrow UDF path (operators/
    multimodal.py). Decode of real media is stubbed per TESTDATA."""
    from .operators.multimodal import extract_features, pack_media
    _, t = _s(spark, sf_dir)
    m = pack_media(t["documents"].withColumn(
        "bin", F.encode("text", "utf-8")), "bin", "doc_id")
    return extract_features(m).select("id", "n_bytes")


def _multimodal_oracle(feat_dim: int = 8) -> str:
    """SQL replay of extract_features' deterministic fake decode: the
    payload is the utf-8 encoding of ``text`` (pure ASCII in this corpus,
    driver-verified: octet_length(encode(text)) == length(text) for every
    row), so byte values are codepoints and the byte-histogram moments
    are exact integer counts divided in double — bitwise equal."""
    feat = ", ".join(
        f"CAST(sum(CASE WHEN m = {j} THEN 1 ELSE 0 END) AS DOUBLE)"
        f" / any_value(n) AS f{j}" for j in range(feat_dim))
    return f"""
    WITH idx AS (
      SELECT doc_id, text, length(text) AS n,
             unnest(generate_series(1, length(text))) AS i
      FROM documents),
    b AS (
      SELECT doc_id, n,
             ascii(substr(text, CAST(i AS INT), 1)) % {feat_dim} AS m
      FROM idx)
    SELECT doc_id AS id, CAST(any_value(n) AS BIGINT) AS n_bytes,
           {feat}
    FROM b GROUP BY doc_id
    """


@query("multimodal_features", _multimodal_oracle())
def multimodal_features(spark, sf_dir):
    """Binary-media feature extraction through the real Arrow/mapInPandas
    plumbing; the deterministic fake decode (byte-histogram moments) is
    replayed exactly by the SQL oracle, so the whole batching path is
    value-checked, not just row-counted.

    The feature vector is projected to scalar f0..f7 columns here (the
    operator itself returns array<double>): the driver's canonicalizer
    sorts/hashes column values and cannot order list cells, so the
    registry entry exposes the same data in hashable shape
    (CORRECTNESS_r03 `unhashable type: 'list'`)."""
    from .operators.multimodal import extract_features, pack_media
    _, t = _s(spark, sf_dir)
    m = pack_media(t["documents"].withColumn(
        "bin", F.encode("text", "utf-8")), "bin", "doc_id")
    out = extract_features(m)
    return out.select(
        "id", "n_bytes",
        *[F.col("feat")[j].alias(f"f{j}") for j in range(8)])


@query("asof_join", """
    SELECT p.event_id AS event_id, epoch_us(v.ts) AS view_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts > v.ts
""")
def asof_join_q(spark, sf_dir):
    """As-of join (operators/asof.py): for each purchase, the latest
    strictly-earlier view by the same user. Union-sort-carry pattern —
    one shuffle, no per-group pandas."""
    from .operators.asof import asof_join
    _, t = _s(spark, sf_dir)
    ev = t["events"]
    p = ev.filter(F.col("event_type") == "purchase")
    v = (ev.filter(F.col("event_type") == "view")
         .select("user_id", F.unix_micros("ts").alias("view_us"),
                 F.col("ts").alias("vts")))
    out = asof_join(p, v.select("user_id", "vts", "view_us"),
                    on="user_id", left_ts="ts", right_ts="vts",
                    value_cols=["view_us"], strict=True)
    return out.select("event_id", "view_us")


@query("asof_join_forward", """
    SELECT p.event_id AS event_id, epoch_us(v.ts) AS next_view_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts < v.ts
""")
def asof_join_forward_q(spark, sf_dir):
    """Forward as-of join: for each purchase, the EARLIEST strictly-later
    view by the same user — same union-sort-carry plan with the sort
    flipped (operators/asof.py direction='forward')."""
    from .operators.asof import asof_join
    _, t = _s(spark, sf_dir)
    ev = t["events"]
    p = ev.filter(F.col("event_type") == "purchase")
    v = (ev.filter(F.col("event_type") == "view")
         .select("user_id", F.col("ts").alias("vts"),
                 F.unix_micros("ts").alias("next_view_us")))
    out = asof_join(p, v, on="user_id", left_ts="ts", right_ts="vts",
                    value_cols=["next_view_us"], strict=True,
                    direction="forward")
    return out.select("event_id", "next_view_us")


# =====================================================================
# Structured Streaming (SURVEY §2.3 — beyond the strictly-batch
# reference). Finite source + complete mode ⇒ deterministic, so the
# tumbling aggregation is oracle-checked against plain batch SQL.
# =====================================================================

@query("stream_tumbling", f"""
    SELECT date_trunc('hour', ts) AS hr, event_type,
           CAST(count(*) AS BIGINT) AS n,
           {_dsum_sql('value', 6)} AS v
    FROM events GROUP BY 1, 2
""")
def stream_tumbling(spark, sf_dir):
    """Streaming tumbling-window counts driven to completion over the
    static events files — must equal the batch group-by."""
    from .streaming import run_to_completion, stream_events, tumbling_counts
    ev = stream_events(spark, sf_dir)
    return run_to_completion(tumbling_counts(ev, "1 hour"),
                             "bs_stream_tumbling")


@query("stream_sliding", f"""
    WITH e AS (SELECT event_type, value, epoch_us(ts) AS tu FROM events),
    w AS (SELECT event_type, value,
                 ((tu // 1800000000) - i) * 1800000000 AS ws_us
          FROM e CROSS JOIN (SELECT unnest([0, 1]) AS i) t)
    SELECT ws_us, event_type, CAST(count(*) AS BIGINT) AS n,
           {_dsum_sql('value', 6)} AS v
    FROM w GROUP BY ws_us, event_type
""")
def stream_sliding(spark, sf_dir):
    """Streaming SLIDING-window aggregation (width 1h, slide 30min):
    every event belongs to exactly width/slide epoch-aligned windows,
    which the batch oracle replays by fanning each event out to its two
    window starts. Completes the tumbling/sliding/session window
    triple (SURVEY §2.3)."""
    from .streaming import run_to_completion, sliding_counts, stream_events
    ev = stream_events(spark, sf_dir)
    return run_to_completion(sliding_counts(ev, "1 hour", "30 minutes"),
                             "bs_stream_sliding")


@query("stream_sessions", """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM g)
    SELECT user_id, epoch_us(min(ts)) AS start_us,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
""")
def stream_sessions(spark, sf_dir):
    """Streaming session_window aggregation (gap 30min) per user. A
    session_window's start is its first event's timestamp, and Spark
    opens a NEW session when the inter-event gap is >= the gap size
    (windows [t, t+g) merge only on strict overlap) — both replayed
    exactly by the batch gap-sessionization oracle, making the
    streaming path fully oracle-checked, not rows-only."""
    from .streaming import run_to_completion, session_windows, stream_events
    ev = stream_events(spark, sf_dir)
    out = run_to_completion(session_windows(ev, "30 minutes"),
                            "bs_stream_sessions")
    return out.select("user_id", F.unix_micros("start").alias("start_us"),
                      "n_events")


@query("stream_stateful", """
    SELECT user_id, CAST(count(*) AS BIGINT) AS total,
           count(*) >= 50 AS flagged
    FROM events GROUP BY user_id
""")
def stream_stateful(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user running counts carried across micro-batches in GroupState.
    Over the finite file source (one micro-batch: no maxFilesPerTrigger)
    the update-mode emissions are exactly one final row per user, equal
    to the batch group-by — the oracle."""
    from .streaming import (run_to_completion, stateful_user_counts,
                            stream_events)
    ev = stream_events(spark, sf_dir)
    return run_to_completion(stateful_user_counts(ev),
                             "bs_stream_stateful", output_mode="update")


@query("op_hash_split", """
    SELECT doc_id,
           CASE WHEN b < 9800 THEN 'train'
                WHEN b < 9900 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                     ::BIGINT % 10000 AS b
          FROM documents)
""")
def op_hash_split(spark, sf_dir):
    """Deterministic train/val/test assignment (operators/sampling.py):
    hash-bucketed by id, stable across runs/engines/partitionings —
    unlike randomSplit. Portable md5 mode replayed exactly by the
    oracle."""
    from .operators.sampling import hash_split
    _, t = _s(spark, sf_dir)
    return hash_split(t["documents"], portable=True) \
        .select("doc_id", "split")


@query("op_budget_sample", r"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(regexp_extract_all(text,
                  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS BIGINT)
                 AS tokens
      FROM documents),
    c AS (
      SELECT doc_id, lang, tokens,
             sum(tokens) OVER (PARTITION BY lang ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) AS cum,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM t)
    SELECT doc_id, lang, tokens FROM c
    WHERE cum <= 2000 OR rn = 1
""")
def op_budget_sample(spark, sf_dir):
    """Per-language token-budget sampling (operators/sampling.py): keep
    docs in doc_id order until 2000 BPE-ish tokens per language — the
    'sample N tokens per language' corpus-build step, one window
    shuffle, fully SQL-replayed."""
    from .operators.sampling import budget_sample
    from .operators.text import bpe_token_count
    _, t = _s(spark, sf_dir)
    d = t["documents"].select(
        "doc_id", "lang", bpe_token_count("text").cast("long")
        .alias("tokens"))
    return budget_sample(d, "tokens", budget=2000, key_col="lang",
                         order_col="doc_id")


@query("source_binary", """
    SELECT r_regionkey, r_name,
           CAST(length(r_name) AS BIGINT) AS n_bytes
    FROM region
""")
def source_binary(spark, sf_dir):
    """binaryFile source (sources.binary_files) — the opaque-blob front
    door for multimodal ingest (SURVEY §2.1 #19's Spark mapping): one
    file per region row round-tripped through binary content."""
    import os
    import tempfile
    from .sources import binary_files
    _, t = _s(spark, sf_dir)
    # fresh dir per call: a basename-keyed cache would serve stale files
    # when a different corpus shares the basename, and the write is only
    # 5 tiny files anyway
    d = tempfile.mkdtemp(prefix="bsc_bin_")
    for key, name in t["region"].select("r_regionkey",
                                        "r_name").collect():
        with open(os.path.join(d, f"{key}.txt"), "w") as f:
            f.write(name)
    b = binary_files(spark, d, glob="*.txt")
    fname = F.element_at(F.split("path", "/"), -1)
    return b.select(
        F.regexp_extract(fname, r"(\d+)", 1).cast("long")
        .alias("r_regionkey"),
        F.decode("content", "utf-8").alias("r_name"),
        F.col("length").alias("n_bytes"))


@query("stream_sink_parquet", """
    SELECT event_id, user_id, value FROM events
    WHERE event_type = 'purchase'
""")
def stream_sink_parquet(spark, sf_dir):
    """The write half of streaming (readStream → transform →
    writeStream): append-mode filter/projection driven into a parquet
    file sink with checkpointed exactly-once commits, read back and
    compared to the batch filter."""
    import tempfile
    from .streaming import stream_events, stream_to_parquet
    ev = stream_events(spark, sf_dir)
    out = (ev.filter(F.col("event_type") == "purchase")
           .select("event_id", "user_id", "value"))
    d = tempfile.mkdtemp(prefix="bsc_ssink_")
    return stream_to_parquet(out, f"{d}/data", f"{d}/ckpt")


@query("op_compact", """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
""")
def op_compact(spark, sf_dir):
    """Small-files compaction (Session.compact_parquet): orders written
    as 64 tiny files, compacted to byte-sized output files; content
    must round-trip exactly."""
    import tempfile
    sess, t = _s(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="bsc_compact_")
    src, dst = f"{d}/src", f"{d}/dst"
    (t["orders"].select("o_orderkey", "o_custkey", "o_totalprice")
     .repartition(64).write.parquet(src))
    out = sess.compact_parquet(src, dst, target_file_mb=64)
    import glob
    n_src = len(glob.glob(f"{src}/part-*"))
    n_dst = len(glob.glob(f"{dst}/part-*"))
    assert n_dst < n_src, f"no compaction: {n_src} -> {n_dst}"
    return out


@query("scan_reader_lines", """
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(length(text)) AS BIGINT) AS n_chars
    FROM documents
""")
def scan_reader_lines(spark, sf_dir):
    """bigslice.ScanReader (reference scan.go:22-69) equivalent: write the
    documents out as text once, read them back through the line source."""
    import os
    import tempfile
    from .sources import scan_reader
    _, t = _s(spark, sf_dir)
    d = os.path.join(tempfile.gettempdir(),
                     f"bsc_lines_{os.path.basename(sf_dir)}")
    if not os.path.exists(os.path.join(d, "_SUCCESS")):
        t["documents"].select("text").write.mode("overwrite").text(d)
    lines = scan_reader(spark, d)
    return lines.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("line")).alias("n_chars"))


# =====================================================================
# Wider TPC-H-style coverage (adapted to the driver schema) + skew ops.
# =====================================================================

@query("q4_order_priority", """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
""")
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS decorrelates to a left-semi join."""
    _, t = _s(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01"))
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    j = o.join(li, (li.l_orderkey == o.o_orderkey)
               & (li.l_shipdate > o.o_orderdate), "left_semi")
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count"))


@query("q6_forecast_revenue", f"""
    SELECT {_dsum_sql('l_extendedprice * l_discount', 8)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
""")
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: pure scan + filter + agg — every predicate must reach
    the parquet reader (pinned in tests/test_plans.py)."""
    _, t = _s(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24))
    return li.agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), 8)
                  .alias("revenue"))


@query("q10_returned_items", f"""
    SELECT c_custkey, c_name,
           {_dsum_sql('l_extendedprice * (1 - l_discount)', 8)} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
""")
def q10_returned_items(spark, sf_dir):
    _, t = _s(spark, sf_dir)
    li = t["lineitem"].filter(F.col("l_returnflag") == "R") \
        .select("l_orderkey", "l_extendedprice", "l_discount")
    j = (li.join(t["orders"].select("o_orderkey", "o_custkey"),
                 li.l_orderkey == F.col("o_orderkey"))
         .join(F.broadcast(t["customer"].select("c_custkey", "c_name")),
               F.col("o_custkey") == F.col("c_custkey")))
    rev = j.groupBy("c_custkey", "c_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 8)
        .alias("revenue"))
    return rev.orderBy(F.desc("revenue"), "c_custkey").limit(20)


@query("q14_promo_share", f"""
    SELECT {_dsum_sql("CASE WHEN p_type = 'PROMO' THEN "
                      "l_extendedprice * (1 - l_discount) END", 8)}
           / {_dsum_sql('l_extendedprice * (1 - l_discount)', 8)}
               AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-07-01'
""")
def q14_promo_share(spark, sf_dir):
    _, t = _s(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-07-01"))
    j = li.join(F.broadcast(t["part"].select("p_partkey", "p_type")),
                li.l_partkey == F.col("p_partkey"))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc)
    return j.agg((dsum(promo, 8) / dsum(disc, 8)).alias("promo_share"))


@query("q16_supplier_cnt", """
    SELECT p_brand, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT)
               AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size >= 20
    GROUP BY p_brand, p_size
""")
def q16_supplier_cnt(spark, sf_dir):
    _, t = _s(spark, sf_dir)
    j = t["lineitem"].select("l_partkey", "l_suppkey").join(
        F.broadcast(t["part"].filter(F.col("p_size") >= 20)
                    .select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"))
    return j.groupBy("p_brand", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt"))


@query("q18_large_orders", f"""
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(38,4))) > 150)
    SELECT c_custkey, o_orderkey,
           {_dsum_sql('l_quantity')} AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_custkey, o_orderkey
""")
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: HAVING subquery → semi join on the agg result."""
    _, t = _s(spark, sf_dir)
    li = t["lineitem"].select("l_orderkey", "l_quantity")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast("decimal(38,4)"))
                .alias("q"))
           .filter(F.col("q") > 150).select("l_orderkey"))
    j = (li.join(big, "l_orderkey", "left_semi")
         .join(t["orders"].select("o_orderkey", "o_custkey"),
               F.col("l_orderkey") == F.col("o_orderkey"))
         .join(F.broadcast(t["customer"].select("c_custkey")),
               F.col("o_custkey") == F.col("c_custkey")))
    return j.groupBy("c_custkey", "o_orderkey").agg(
        dsum("l_quantity").alias("total_qty"))


@query("q19_discounted_revenue", f"""
    SELECT {_dsum_sql('l_extendedprice * (1 - l_discount)', 8)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 50
           AND l_quantity >= 20 AND l_quantity <= 40)
""")
def q19_discounted_revenue(spark, sf_dir):
    """TPC-H Q19: OR-of-ANDs predicate over a broadcast join."""
    _, t = _s(spark, sf_dir)
    j = t["lineitem"].join(
        F.broadcast(t["part"].select("p_partkey", "p_brand", "p_size")),
        F.col("p_partkey") == F.col("l_partkey"))
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (((b == "Brand#12") & s.between(1, 15) & q.between(1, 21))
            | ((b == "Brand#23") & s.between(1, 30) & q.between(10, 30))
            | ((b == "Brand#34") & s.between(1, 50) & q.between(20, 40)))
    return j.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 8)
        .alias("revenue"))


@query("op_salted_agg", f"""
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           {_dsum_sql('l_quantity')} AS qty
    FROM lineitem GROUP BY l_returnflag
""")
def op_salted_agg(spark, sf_dir):
    """Two-stage salted aggregation for skewed keys: stage 1 aggregates
    on (key, salt) spreading a hot key over 16 reducers, stage 2 merges
    partials. Result is identical to the plain groupBy (the oracle), so
    correctness and the skew pattern are checked together. At 3 distinct
    keys over 600k rows, l_returnflag IS the pathological case."""
    _, t = _s(spark, sf_dir)
    li = t["lineitem"].select("l_returnflag", "l_quantity")
    salted = li.withColumn(
        "__salt__", F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                           F.lit(16)))
    stage1 = salted.groupBy("l_returnflag", "__salt__").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("l_quantity").cast("decimal(38,4)")).alias("pq"))
    return (stage1.groupBy("l_returnflag")
            .agg(F.sum("pn").alias("n"),
                 F.sum("pq").cast("double").alias("qty")))


_SQL_PASSTHROUGH = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
               AS total
    FROM orders WHERE o_totalprice > 100000
    GROUP BY o_orderpriority
"""


@query("sql_passthrough", _SQL_PASSTHROUGH)
def sql_passthrough(spark, sf_dir):
    """Full SQL surface (SURVEY §2.3: the reference has no query
    language at all; Spark gives us one): the registered star-schema
    views answer the SAME ANSI text the DuckDB oracle runs."""
    _s(spark, sf_dir)  # registers the temp views
    return spark.sql(_SQL_PASSTHROUGH)


def _pipeline_oracle() -> str:
    """SQL replay of the WHOLE pipeline: quality filter → exact dedup →
    portable-minhash near-dup removal (reusing _minhash_pairs_ctes over
    the filtered subset) → per-language token budget. Composing the
    per-stage oracles end-to-end pins that the stages compose the same
    way in both engines."""
    return f"""
    WITH qs AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                 t -> t <> '') AS toks,
             CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT)
                 AS alpha
      FROM documents),
    qm AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(alpha AS DOUBLE)
                 / CAST(greatest(len(toks), 1) AS DOUBLE) AS mtl,
             CAST(len(list_distinct(toks)) AS DOUBLE)
                 / CAST(greatest(len(toks), 1) AS DOUBLE) AS dr
      FROM qs),
    keepq AS (
      SELECT doc_id FROM qm
      WHERE least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.4
            + (CASE WHEN mtl >= 3.0 AND mtl <= 10.0
                    THEN 1.0 ELSE 0.0 END) * 0.3
            + dr * 0.3 >= 0.5),
    d0 AS (SELECT * FROM documents
           WHERE doc_id IN (SELECT doc_id FROM keepq)),
    ex AS (SELECT CAST(min(doc_id) AS BIGINT) AS doc_id
           FROM d0 GROUP BY md5(text)),
    d1 AS (SELECT * FROM d0 WHERE doc_id IN (SELECT doc_id FROM ex)),
    {_minhash_pairs_ctes('d1')},
    losers AS (SELECT DISTINCT id_b AS doc_id FROM mh_pairs),
    d2 AS (SELECT * FROM d1
           WHERE doc_id NOT IN (SELECT doc_id FROM losers))
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(regexp_extract_all(text,
                '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+'))) AS BIGINT)
               AS token_budget
    FROM d2 GROUP BY lang
    """


@query("pipeline_end2end", _pipeline_oracle())
def pipeline_end2end(spark, sf_dir):
    """The flagship training-data pipeline, end to end: quality filter →
    exact dedup → MinHash near-dup removal (portable hash mode, so even
    this stage is SQL-replayable) → per-language token budget. Every
    stage is one of the audited operators; the composed oracle pins
    that they compose."""
    from .operators.dedup import exact_dedup, minhash_dedup
    from .operators.text import bpe_token_count, quality_score
    _, t = _s(spark, sf_dir)
    docs = t["documents"]
    q = quality_score(docs).filter(F.col("quality") >= 0.5)
    docs = docs.join(q.select("doc_id"), on="doc_id", how="left_semi")
    keep_exact = exact_dedup(docs).select("doc_id")
    docs = docs.join(keep_exact, on="doc_id", how="left_semi")
    docs = minhash_dedup(docs, threshold=0.5, portable=True)
    return (docs.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(bpe_token_count("text")).alias("token_budget"))
            .orderBy("lang"))


@query("op_salted_join", """
    SELECT e.event_id, e.event_type, s.type_n
    FROM events e
    JOIN (SELECT event_type, CAST(count(*) AS BIGINT) AS type_n
          FROM events GROUP BY event_type) s
      ON e.event_type = s.event_type
""")
def op_salted_join(spark, sf_dir):
    """Salted skew join (operators/skew.py): events has only 5 event
    types — every key is hot. The salted join spreads each over 8
    reducers; output must equal the plain join (the oracle). The merge
    hint forces a real shuffle join so the pattern is exercised even at
    test scale where broadcast would hide it."""
    from .operators.skew import salted_join
    _, t = _s(spark, sf_dir)
    ev = t["events"].select("event_id", "event_type")
    stats = (t["events"].groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("type_n")))
    return salted_join(ev, stats.hint("merge"), ["event_type"], nsalts=8)


@query("scalar_functions", """
    SELECT l_orderkey, l_linenumber,
           upper(l_returnflag) AS rf_upper,
           concat(l_returnflag, '-', l_linestatus) AS rf_ls,
           CAST(length(l_returnflag) AS INT) AS rf_len,
           CAST(year(l_shipdate) AS INT) AS ship_year,
           CAST(month(l_shipdate) AS INT) AS ship_month,
           CAST(day(l_shipdate) AS INT) AS ship_day,
           abs(l_quantity - 25.0) AS q_dev,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
           coalesce(nullif(l_returnflag, 'N'), 'none') AS rf_or_none
    FROM lineitem
""")
def scalar_functions(spark, sf_dir):
    """Scalar-function passthrough (SURVEY §2.3: the reference has no
    scalar library; pyspark.sql.functions is exposed wholesale).
    Representative string/date/math/null functions, oracle-checked."""
    _, t = _s(spark, sf_dir)
    li = t["lineitem"]
    return li.select(
        "l_orderkey", "l_linenumber",
        F.upper("l_returnflag").alias("rf_upper"),
        F.concat_ws("-", "l_returnflag", "l_linestatus").alias("rf_ls"),
        F.length("l_returnflag").alias("rf_len"),
        F.year("l_shipdate").alias("ship_year"),
        F.month("l_shipdate").alias("ship_month"),
        F.dayofmonth("l_shipdate").alias("ship_day"),
        F.abs(F.col("l_quantity") - 25.0).alias("q_dev"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k"),
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none"))
        .alias("rf_or_none"))


@query("q2_min_cost_supplier", """
    SELECT p_partkey, p_brand, s_name, min_price
    FROM (
      SELECT p_partkey, p_brand, s_name, l_extendedprice,
             min(l_extendedprice) OVER (PARTITION BY p_partkey)
                 AS min_price
      FROM part
      JOIN lineitem ON l_partkey = p_partkey
      JOIN supplier ON s_suppkey = l_suppkey)
    WHERE l_extendedprice = min_price
    QUALIFY row_number() OVER (PARTITION BY p_partkey
                               ORDER BY s_name) = 1
""")
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: min-per-group correlated lookup via window (the
    decorrelated plan Catalyst would produce for the scalar subquery),
    deterministic tie-break on supplier name."""
    _, t = _s(spark, sf_dir)
    j = (t["part"].select("p_partkey", "p_brand")
         .join(t["lineitem"].select("l_partkey", "l_suppkey",
                                    "l_extendedprice"),
               F.col("l_partkey") == F.col("p_partkey"))
         .join(F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
               F.col("s_suppkey") == F.col("l_suppkey")))
    wmin = W.partitionBy("p_partkey")
    j = j.withColumn("min_price", F.min("l_extendedprice").over(wmin)) \
         .filter(F.col("l_extendedprice") == F.col("min_price"))
    pick = W.partitionBy("p_partkey").orderBy("s_name")
    return (j.withColumn("rn", F.row_number().over(pick))
            .filter(F.col("rn") == 1)
            .select("p_partkey", "p_brand", "s_name", "min_price"))


@query("unpivot_measures", """
    SELECT l_orderkey, l_linenumber, measure, val FROM lineitem
    UNPIVOT (val FOR measure IN (l_quantity, l_extendedprice, l_discount))
""")
def unpivot_measures(spark, sf_dir):
    """Unpivot (wide→long) via stack — SURVEY §2.3 set-op family."""
    _, t = _s(spark, sf_dir)
    return t["lineitem"].select(
        "l_orderkey", "l_linenumber",
        F.expr("stack(3, 'l_quantity', l_quantity, "
               "'l_extendedprice', l_extendedprice, "
               "'l_discount', l_discount) AS (measure, val)"))


@query("range_join", f"""
    SELECT a.event_id AS anchor_id,
           CAST(count(*) AS BIGINT) AS n_events,
           {_dsum_sql('e.value', 6)} AS value_sum
    FROM events a JOIN events e
      ON e.ts >= a.ts AND e.ts < a.ts + INTERVAL 5 MINUTE
    WHERE a.event_type = 'error'
    GROUP BY a.event_id
""")
def range_join(spark, sf_dir):
    """Pure range join (no equi-key): activity in the 5 minutes after
    each error event. A naive formulation is a BroadcastNestedLoop —
    quadratic and single-task at scale; operators/interval.py rewrites
    it to a binned equi-join (uniform shuffle key, residual filter)."""
    from .operators.interval import interval_join
    _, t = _s(spark, sf_dir)
    ev = t["events"]
    anchors = (ev.filter(F.col("event_type") == "error")
               .select(F.col("event_id").alias("anchor_id"),
                       F.col("ts").alias("w_start"))
               .withColumn("w_end",
                           F.col("w_start") + F.expr("INTERVAL 5 MINUTE")))
    points = ev.select("ts", "value")
    j = interval_join(points, anchors, "ts", "w_start", "w_end",
                      bin_seconds=300)
    return j.groupBy("anchor_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", 6).alias("value_sum"))


# =====================================================================
# TPC-H remainder, adapted to the driver schema (no partsupp table and
# no commit/receipt dates — substitutions noted per query).  Together
# with q1-q6/q10/q14/q16/q18/q19 this completes the 22-query shape
# coverage of the relational surface (SURVEY §2.3).
# =====================================================================

@query("q7_volume_shipping", f"""
    SELECT supp_nation, cust_nation, l_year,
           {_dsum_sql('volume', 8)} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    GROUP BY supp_nation, cust_nation, l_year
""")
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7: nation-pair trade volume by ship year.  Scale plan:
    filter BOTH dimension paths to the two nations first, broadcast
    them into lineitem/orders (pruning each fact hard before the only
    big join, lineitem⋈orders on orderkey), then one small agg."""
    _, t = _s(spark, sf_dir)
    pair = ["NATION_3", "NATION_7"]
    sup = (t["supplier"]
           .join(F.broadcast(t["nation"]),
                 F.col("s_nationkey") == F.col("n_nationkey"))
           .filter(F.col("n_name").isin(pair))
           .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    cust = (t["customer"]
            .join(F.broadcast(t["nation"]),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .filter(F.col("n_name").isin(pair))
            .select("c_custkey", F.col("n_name").alias("cust_nation")))
    li = (t["lineitem"]
          .select("l_orderkey", "l_suppkey", "l_shipdate",
                  (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                  .alias("volume"))
          .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")))
    orders = (t["orders"].select("o_orderkey", "o_custkey")
              .join(F.broadcast(cust),
                    F.col("o_custkey") == F.col("c_custkey")))
    j = (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
         .filter(((F.col("supp_nation") == pair[0])
                  & (F.col("cust_nation") == pair[1]))
                 | ((F.col("supp_nation") == pair[1])
                    & (F.col("cust_nation") == pair[0]))))
    return (j.withColumn("l_year", F.year("l_shipdate").cast("long"))
            .groupBy("supp_nation", "cust_nation", "l_year")
            .agg(dsum("volume", 8).alias("revenue")))


@query("q8_market_share", """
    SELECT o_year,
           CAST(sum(CAST(CASE WHEN supp_nation = 'NATION_5' THEN volume
                              ELSE 0 END AS DECIMAL(38,8))) AS DOUBLE)
           / CAST(sum(CAST(volume AS DECIMAL(38,8))) AS DOUBLE)
               AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      JOIN region ON r_regionkey = n2.n_regionkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO')
    GROUP BY o_year
""")
def q8_market_share(spark, sf_dir):
    """TPC-H Q8: one nation's share of regional market volume per year.
    All dims broadcast; conditional + total sums computed in one agg
    pass (no second scan); decimal-exact numerator/denominator then a
    single double division so both engines emit the same bits."""
    _, t = _s(spark, sf_dir)
    part = t["part"].filter(F.col("p_type") == "PROMO").select("p_partkey")
    asia_nations = (t["nation"]
                    .join(F.broadcast(t["region"]),
                          F.col("n_regionkey") == F.col("r_regionkey"))
                    .filter(F.col("r_name") == "ASIA")
                    .select(F.col("n_nationkey").alias("cn_key")))
    cust = (t["customer"]
            .join(F.broadcast(asia_nations),
                  F.col("c_nationkey") == F.col("cn_key"))
            .select("c_custkey"))
    sup = (t["supplier"]
           .join(F.broadcast(t["nation"]),
                 F.col("s_nationkey") == F.col("n_nationkey"))
           .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    orders = (t["orders"].select("o_orderkey", "o_custkey", "o_orderdate")
              .join(F.broadcast(cust),
                    F.col("o_custkey") == F.col("c_custkey")))
    j = (t["lineitem"]
         .select("l_orderkey", "l_partkey", "l_suppkey",
                 (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                 .alias("volume"))
         .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
         .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
         .join(orders, F.col("l_orderkey") == F.col("o_orderkey")))
    nation_vol = F.when(F.col("supp_nation") == "NATION_5",
                        F.col("volume")).otherwise(F.lit(0.0))
    return (j.withColumn("o_year", F.year("o_orderdate").cast("long"))
            .groupBy("o_year")
            .agg((dsum(nation_vol, 8) / dsum("volume", 8))
                 .alias("mkt_share")))


@query("q9_product_profit", f"""
    SELECT nation, o_year, {_dsum_sql('amount', 8)} AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS amount
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE p_name LIKE '%gear%')
    GROUP BY nation, o_year
""")
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 (profit per nation-year; amount omits ps_supplycost —
    no partsupp in the driver schema).  part filter broadcast into
    lineitem first, then the single big join to orders."""
    _, t = _s(spark, sf_dir)
    part = (t["part"].filter(F.col("p_name").like("%gear%"))
            .select("p_partkey"))
    sup = (t["supplier"]
           .join(F.broadcast(t["nation"]),
                 F.col("s_nationkey") == F.col("n_nationkey"))
           .select("s_suppkey", F.col("n_name").alias("nation")))
    j = (t["lineitem"]
         .select("l_orderkey", "l_partkey", "l_suppkey",
                 (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                 .alias("amount"))
         .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
         .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
         .join(t["orders"].select("o_orderkey", "o_orderdate"),
               F.col("l_orderkey") == F.col("o_orderkey")))
    return (j.withColumn("o_year", F.year("o_orderdate").cast("long"))
            .groupBy("nation", "o_year")
            .agg(dsum("amount", 8).alias("sum_profit")))


@query("q11_important_parts", f"""
    WITH pv AS (
      SELECT l_partkey, {_dsum_sql('l_extendedprice * (1 - l_discount)', 8)}
                 AS part_value
      FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey, part_value FROM pv
    WHERE part_value > (
      SELECT CAST(sum(CAST(part_value AS DECIMAL(38,8))) AS DOUBLE)
             / count(*) * 1.25
      FROM pv)
""")
def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape (value concentration; lineitem revenue stands in
    for partsupp stock value).  The global-total scalar subquery is a
    1-row broadcast cross join — no second pass over lineitem.

    Threshold is MEAN-relative (1.25× the average part value), not a
    fixed fraction of the total: per-part share scales as 1/nparts, so
    any fixed fraction goes vacuous (0 rows) as SF grows — the TPC-H
    spec itself scales the fraction by 1/SF for the same reason. The
    mean-relative form is non-empty and selective at every SF
    (measured: 21/242/2348 rows at sf0.001/0.01/0.1)."""
    _, t = _s(spark, sf_dir)
    pv = (t["lineitem"]
          .groupBy("l_partkey")
          .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 8)
               .alias("part_value")))
    total = pv.agg(
        (F.sum(F.col("part_value").cast("decimal(38,8)")).cast("double")
         / F.count(F.lit(1)) * F.lit(1.25)).alias("threshold"))
    return (pv.crossJoin(F.broadcast(total))
            .filter(F.col("part_value") > F.col("threshold"))
            .select("l_partkey", "part_value"))


@query("q12_late_lines", """
    SELECT late,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (
      SELECT o_orderpriority,
             CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60
                  THEN 'LATE' ELSE 'ONTIME' END AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01')
    GROUP BY late
""")
def q12_late_lines(spark, sf_dir):
    """TPC-H Q12 shape (ship-mode → lateness bucket: the schema has no
    l_shipmode/commitdate, so 'late' = shipped >60 days after order).
    Date filter pushed to the lineitem scan; single shuffle join."""
    _, t = _s(spark, sf_dir)
    li = (t["lineitem"]
          .filter((F.col("l_shipdate") >= "1996-01-01")
                  & (F.col("l_shipdate") < "1997-01-01"))
          .select("l_orderkey", "l_shipdate"))
    j = li.join(t["orders"].select("o_orderkey", "o_orderdate",
                                   "o_orderpriority"),
                F.col("l_orderkey") == F.col("o_orderkey"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (j.withColumn(
                "late",
                F.when(F.datediff("l_shipdate", "o_orderdate") > 60,
                       "LATE").otherwise("ONTIME"))
            .groupBy("late")
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count")))


@query("q13_customer_distribution", """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) c_orders
    GROUP BY c_count
""")
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13: order-count histogram over a left outer join with a
    compound (non-equi residual) join condition.  The second agg input
    is one row per customer — tiny, no skew concern."""
    _, t = _s(spark, sf_dir)
    cust = t["customer"].select("c_custkey")
    orders = t["orders"].select("o_custkey", "o_orderkey",
                                "o_orderpriority")
    j = cust.join(orders,
                  (F.col("c_custkey") == F.col("o_custkey"))
                  & (F.col("o_orderpriority") != "1-URGENT"),
                  "left")
    per_cust = (j.groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist")))


@query("q15_top_supplier", f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {_dsum_sql('l_extendedprice * (1 - l_discount)', 8)}
                 AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
""")
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: supplier(s) with max quarterly revenue.  The max is a
    1-row broadcast; revenue is computed once (plan reuses the agg via
    DataFrame reference, and the equality is exact because both sides
    derive from the same decimal-backed sum)."""
    _, t = _s(spark, sf_dir)
    rev = (t["lineitem"]
           .filter((F.col("l_shipdate") >= "1996-01-01")
                   & (F.col("l_shipdate") < "1996-04-01"))
           .groupBy(F.col("l_suppkey").alias("supplier_no"))
           .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 8)
                .alias("total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (rev.crossJoin(F.broadcast(mx))
            .filter(F.col("total_revenue") == F.col("max_revenue"))
            .join(F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
                  F.col("s_suppkey") == F.col("supplier_no"))
            .select("s_suppkey", "s_name", "total_revenue"))


@query("q17_small_quantity", """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
               / 7.0 AS avg_yearly
    FROM (
      SELECT l_extendedprice, l_quantity, p_brand,
             avg(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
      FROM lineitem JOIN part ON p_partkey = l_partkey)
    WHERE p_brand = 'Brand#23' AND l_quantity < 0.5 * avg_qty
""")
def q17_small_quantity(spark, sf_dir):
    """TPC-H Q17: revenue of small-quantity lines vs the per-part mean —
    the correlated scalar subquery decorrelated into a window avg (the
    plan Catalyst would produce).  The window must be computed over ALL
    lineitem before the brand filter, matching the subquery's scope."""
    _, t = _s(spark, sf_dir)
    j = (t["lineitem"].select("l_partkey", "l_quantity", "l_extendedprice")
         .join(F.broadcast(t["part"].select("p_partkey", "p_brand")),
               F.col("l_partkey") == F.col("p_partkey")))
    j = j.withColumn("avg_qty",
                     F.avg("l_quantity").over(W.partitionBy("l_partkey")))
    return (j.filter((F.col("p_brand") == "Brand#23")
                     & (F.col("l_quantity") < 0.5 * F.col("avg_qty")))
            .agg((F.sum(F.col("l_extendedprice").cast("decimal(38,4)"))
                  .cast("double") / F.lit(7.0)).alias("avg_yearly")))


@query("q20_part_promotion", """
    SELECT s_name, n_name
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'blue%'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey
      HAVING sum(l_quantity) > 100)
""")
def q20_part_promotion(spark, sf_dir):
    """TPC-H Q20 shape (suppliers with heavy shipments of 'blue' parts;
    partsupp availability test replaced by shipped-quantity threshold).
    IN-subquery = left-semi join against a pre-aggregated, broadcastable
    supplier set."""
    _, t = _s(spark, sf_dir)
    part = (t["part"].filter(F.col("p_name").like("blue%"))
            .select("p_partkey"))
    heavy = (t["lineitem"]
             .filter((F.col("l_shipdate") >= "1996-01-01")
                     & (F.col("l_shipdate") < "1997-01-01"))
             .join(F.broadcast(part),
                   F.col("l_partkey") == F.col("p_partkey"))
             .groupBy("l_suppkey")
             .agg(F.sum("l_quantity").alias("qty"))
             .filter(F.col("qty") > 100)
             .select("l_suppkey"))
    return (t["supplier"]
            .join(F.broadcast(heavy),
                  F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
            .join(F.broadcast(t["nation"]),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_name", "n_name"))


@query("q21_waiting_suppliers", """
    WITH sl AS (
      SELECT l_orderkey, l_suppkey, max(l_shipdate) AS s_max
      FROM lineitem GROUP BY l_orderkey, l_suppkey),
    ann0 AS (
      SELECT l_orderkey, l_suppkey, s_max,
             max(s_max) OVER (PARTITION BY l_orderkey) AS o_max,
             count(*) OVER (PARTITION BY l_orderkey) AS nsupp
      FROM sl),
    ann AS (
      SELECT *, sum(CASE WHEN s_max = o_max THEN 1 ELSE 0 END)
                    OVER (PARTITION BY l_orderkey) AS nmax
      FROM ann0)
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM ann JOIN supplier ON s_suppkey = l_suppkey
    WHERE nsupp > 1 AND nmax = 1 AND s_max = o_max
    GROUP BY s_name
""")
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (the EXISTS/NOT-EXISTS pair re-expressed over
    shipdates: in multi-supplier orders, count orders where exactly one
    supplier shipped strictly last — no commit/receipt dates in the
    driver schema).  One agg + windows over the same partitioning (a
    single shuffle on l_orderkey), then a broadcast supplier join."""
    _, t = _s(spark, sf_dir)
    sl = (t["lineitem"]
          .groupBy("l_orderkey", "l_suppkey")
          .agg(F.max("l_shipdate").alias("s_max")))
    w = W.partitionBy("l_orderkey")
    ann = (sl.withColumn("o_max", F.max("s_max").over(w))
           .withColumn("nsupp", F.count(F.lit(1)).over(w))
           .withColumn("nmax", F.sum(
               F.when(F.col("s_max") == F.col("o_max"), 1)
               .otherwise(0)).over(w)))
    winners = ann.filter((F.col("nsupp") > 1) & (F.col("nmax") == 1)
                         & (F.col("s_max") == F.col("o_max")))
    return (winners
            .join(F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait")))


@query("q22_idle_customers", f"""
    SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
           {_dsum_sql('c_acctbal', 4)} AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(38,4))) AS DOUBLE)
                   / count(*)
        FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey
""")
def q22_idle_customers(spark, sf_dir):
    """TPC-H Q22 shape (above-average-balance customers with no recent
    orders; nationkey stands in for the phone country code).  The avg
    is a decimal-exact 1-row broadcast; NOT EXISTS = left-anti join
    against the date-filtered orders."""
    _, t = _s(spark, sf_dir)
    cust = t["customer"]
    avg_bal = (cust.filter(F.col("c_acctbal") > 0.0)
               .agg((F.sum(F.col("c_acctbal").cast("decimal(38,4)"))
                     .cast("double") / F.count(F.lit(1)))
                    .alias("avg_bal")))
    recent = (t["orders"]
              .filter(F.col("o_orderdate") >= "2000-01-01")
              .select("o_custkey"))
    return (cust.crossJoin(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("avg_bal"))
            .join(recent, F.col("c_custkey") == F.col("o_custkey"),
                  "left_anti")
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("numcust"),
                 dsum("c_acctbal", 4).alias("totacctbal")))


@query("json_props", """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_total,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
""")
def json_props(spark, sf_dir):
    """Semi-structured JSON column handling (events.props)."""
    _, t = _s(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (t["events"].groupBy("event_type")
            .agg(F.sum(k).alias("k_total"),
                 F.count(F.lit(1)).alias("n")))


@query("decontaminate", """
    WITH base AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                 t -> t <> '') AS tk
      FROM documents),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(tk) >= 3 THEN
               list_transform(generate_series(1, len(tk) - 2),
                   i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))
             ELSE [concat_ws(' ', tk)] END AS sl
      FROM base),
    toks AS (SELECT doc_id, unnest(list_distinct(sl)) AS tok FROM sh),
    tr AS (SELECT doc_id AS train_id, tok FROM toks WHERE doc_id % 17 <> 0),
    ev AS (SELECT doc_id AS eval_id, tok FROM toks WHERE doc_id % 17 = 0)
    SELECT train_id, eval_id, CAST(count(*) AS BIGINT) AS n_shared
    FROM tr JOIN ev USING (tok)
    GROUP BY train_id, eval_id
    HAVING count(*) >= 2
""")
def decontaminate(spark, sf_dir):
    """Benchmark decontamination (operators/decontam.py): training docs
    sharing >= 2 distinct word 3-grams with a held-out eval split
    (doc_id % 17). The 100TB shape: one scan of the train corpus,
    broadcast hash join against the distinct eval shingles, narrow
    (train_id, eval_id) count agg — the corpus itself never shuffles."""
    from .operators.decontam import contamination_report
    _, t = _s(spark, sf_dir)
    docs = t["documents"]
    ev = docs.filter(F.col("doc_id") % 17 == 0)
    tr = docs.filter(F.col("doc_id") % 17 != 0)
    return contamination_report(tr, ev, ngram_w=3, min_shared=2)


@query("repetition_stats", """
    WITH base AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                 t -> t <> '') AS tk
      FROM documents),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(tk) >= 2 THEN
               list_transform(generate_series(1, len(tk) - 1),
                   i -> concat_ws(' ', tk[i], tk[i+1]))
             ELSE [concat_ws(' ', tk)] END AS sl
      FROM base),
    toks AS (SELECT doc_id, unnest(sl) AS tok FROM sh),
    per AS (SELECT doc_id, tok, count(*) AS c
            FROM toks GROUP BY doc_id, tok)
    SELECT doc_id,
           1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE)
               AS dup_ngram_frac,
           CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE)
               AS top_ngram_frac
    FROM per GROUP BY doc_id
""")
def repetition_stats(spark, sf_dir):
    """Gopher-style repetition quality signals (operators/text.py):
    duplicate-bigram fraction + top-bigram share per document. One
    shuffle total — both aggs cluster on a superset of the shingle
    window's hash partitioning (plan-gated)."""
    from .operators.text import repetition_stats as _rep
    _, t = _s(spark, sf_dir)
    return _rep(t["documents"], ngram_w=2)


@query("pack_sequences", """
    WITH tc AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(text, '\\s+'),
                             t -> t <> '')) AS n_tokens
      FROM documents),
    nz AS (SELECT * FROM tc WHERE n_tokens > 0),
    off AS (
      SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
                 ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS token_off
      FROM nz),
    ex AS (
      SELECT doc_id, n_tokens, token_off,
             CAST(unnest(generate_series(token_off // 512,
                 (token_off + n_tokens - 1) // 512)) AS BIGINT) AS seq_id
      FROM off)
    SELECT doc_id, seq_id,
           CAST(GREATEST(0, seq_id * 512 - token_off) AS BIGINT)
               AS begin_tok,
           CAST(LEAST(n_tokens, (seq_id + 1) * 512 - token_off) AS BIGINT)
               AS end_tok
    FROM ex
""")
def pack_sequences(spark, sf_dir):
    """Concatenate-and-chunk sequence packing (operators/packing.py):
    global token offsets via the two-level distributed prefix sum
    (range-partition metadata → within-partition window → broadcast
    partition offsets), then explode each doc into its 512-token
    training sequences. The oracle replays it as the single-window
    cumsum DuckDB can afford at sf0.01."""
    from .operators.packing import pack_sequences as _pack
    _, t = _s(spark, sf_dir)
    return _pack(t["documents"], max_len=512)


@query("winnow", """
    WITH base AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                 t -> t <> '') AS tk
      FROM documents),
    g AS (
      SELECT doc_id,
             CASE WHEN len(tk) >= 3 THEN
               list_transform(generate_series(1, len(tk) - 2),
                   i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))
             ELSE [concat_ws(' ', tk)] END AS gl
      FROM base),
    kg AS (
      SELECT doc_id, len(gl) AS p,
             unnest(generate_series(1, len(gl))) - 1 AS pos,
             unnest(gl) AS gram
      FROM g),
    hx AS (
      SELECT doc_id, p, pos,
             ('0x' || substr(md5(gram), 1, 15))::BIGINT
                 % 2147483647 AS h
      FROM kg),
    m AS (
      SELECT doc_id, p, pos,
             min({'h': h, 'np': -pos}) OVER (
                 PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mr
      FROM hx)
    SELECT DISTINCT doc_id, CAST(mr.h AS BIGINT) AS fp,
           CAST(-mr.np AS BIGINT) AS fp_pos
    FROM m WHERE pos <= greatest(p - 4, 0)
""")
def winnow(spark, sf_dir):
    """Winnowing fingerprint selection (operators/winnow.py): MOSS
    min-of-window k-gram hash sampling, rightmost tie-break encoded as
    min(struct(h, -pos)). Portable md5 hash mode so DuckDB replays the
    selection bit-for-bit."""
    from .operators.winnow import winnow_fingerprints
    _, t = _s(spark, sf_dir)
    return winnow_fingerprints(t["documents"], k=3, window=4,
                               portable=True)


@query("pii_scrub", r"""
    WITH inj AS (
      SELECT doc_id,
             text || ' reach user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1-555-123-4567, ssn 123-45-6789,'
                  || ' host 10.0.0.' || CAST(doc_id % 256 AS VARCHAR)
                 AS text
      FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g'),
               '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
               '(?:\+?\d{1,3}[-. ]?)?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b',
               '<PHONE>', 'g'),
               '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS text,
           CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
               AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text,
               '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_ssn,
           CAST(len(regexp_extract_all(text,
               '(?:\+?\d{1,3}[-. ]?)?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b'))
               AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(text,
               '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_ip
    FROM inj
""")
def pii_scrub(spark, sf_dir):
    """PII redaction (operators/pii.py): emails/SSNs/phones/IPs →
    typed placeholders + per-doc counts, pure codegen projection.
    The synthetic corpus has no PII, so the query injects a
    deterministic per-doc set first (same expression in the oracle) —
    the scrub itself is exercised on every row."""
    from .operators.pii import scrub_pii
    _, t = _s(spark, sf_dir)
    docs = t["documents"]
    injected = docs.select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" reach user"),
                 F.col("doc_id").cast("string"),
                 F.lit("@example.com or +1-555-123-4567,"
                       " ssn 123-45-6789, host 10.0.0."),
                 (F.col("doc_id") % 256).cast("string")).alias("text"))
    return scrub_pii(injected)


@query("line_dedup", r"""
    WITH inj AS (
      SELECT doc_id,
             regexp_replace(text, '((?:\S+\s+){8})',
                            '\1' || chr(10), 'g') AS text
      FROM documents),
    sl AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM inj),
    spans AS (
      SELECT doc_id, unnest(generate_series(1, len(l))) - 1 AS pos,
             unnest(l) AS span
      FROM sl),
    ne AS (SELECT * FROM spans WHERE span <> ''),
    owner AS (SELECT span AS s, min(doc_id) AS keep
              FROM ne GROUP BY span),
    kept AS (SELECT ne.doc_id, ne.pos, ne.span
             FROM ne JOIN owner ON ne.span = owner.s
             WHERE ne.doc_id = owner.keep)
    SELECT doc_id, string_agg(span, chr(10) ORDER BY pos) AS text
    FROM kept GROUP BY doc_id
""")
def line_dedup(spark, sf_dir):
    """C4/RefinedWeb-style cross-document line dedup
    (operators/dedup.py span_dedup): each distinct line survives only
    in the smallest doc_id containing it; emptied documents vanish.
    The single-line synthetic corpus gets deterministic line breaks
    (every 8 tokens, same regexp in the oracle) so the rule is
    exercised mid-document."""
    from .operators.dedup import span_dedup
    _, t = _s(spark, sf_dir)
    lines = t["documents"].select(
        "doc_id",
        F.regexp_replace("text", r"((?:\S+\s+){8})", "$1\n")
        .alias("text"))
    return span_dedup(lines)


@query("classify_score", """
    WITH w AS (
      SELECT j AS feature,
             (('0x' || substr(md5(CAST(j AS VARCHAR)), 1, 15))::BIGINT
              % 2001 - 1000) / 1024.0 AS weight
      FROM generate_series(0, 1023) t(j)),
    toks AS (
      SELECT doc_id, unnest(list_filter(
                 string_split_regex(text, '\\s+'), t -> t <> '')) AS tok
      FROM documents),
    feats AS (
      SELECT doc_id,
             ('0x' || substr(md5(tok), 1, 15))::BIGINT
                 % 2147483647 % 1024 AS feature
      FROM toks)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(w.weight) AS DOUBLE) / count(*) AS score
    FROM feats JOIN w USING (feature)
    GROUP BY doc_id
""")
def classify_score(spark, sf_dir):
    """Hashed-feature linear classifier inference
    (operators/classify.py): broadcast model join + mean-pooled score.
    Dyadic weights (k/1024) make the double sum exact, so the oracle
    replays bitwise. The demo model covers every feature id, so the
    inner-join oracle equals the operator's left join."""
    from .operators.classify import demo_weights, score_documents
    _, t = _s(spark, sf_dir)
    return score_documents(t["documents"], demo_weights(spark),
                           portable=True)


@query("stratified_sample", """
    WITH r AS (
      SELECT *, row_number() OVER (
          PARTITION BY source
          ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                    1, 15))::BIGINT % 10000, doc_id) AS rk
      FROM documents)
    SELECT doc_id, text, lang, source, n_chars FROM r WHERE rk <= 12
""")
def stratified_sample(spark, sf_dir):
    """Exact per-stratum quota sampling (operators/sampling.py): at
    most 12 docs per source, ranked by a portable id hash — the
    'cap every domain' corpus-balancing step. One window exchange."""
    from .operators.sampling import stratified_sample as _strat
    _, t = _s(spark, sf_dir)
    return _strat(t["documents"], "source", 12, portable=True)


@query("stratified_frac", """
    SELECT doc_id, text, lang, source, n_chars
    FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
          % 10000
        < CASE lang WHEN 'en' THEN 2500 WHEN 'zh' THEN 5000 ELSE 0 END
""")
def stratified_frac(spark, sf_dir):
    """Per-stratum rate sampling (operators/sampling.py): 25% of en,
    50% of zh, drop the rest — deterministic hash thresholds, ZERO
    exchanges (plan-gated pure filter; the 100 TB path for
    language-rebalancing a corpus)."""
    from .operators.sampling import stratified_frac as _frac
    _, t = _s(spark, sf_dir)
    return _frac(t["documents"], "lang", {"en": 0.25, "zh": 0.5},
                 portable=True)


@query("stream_dedup", """
    SELECT DISTINCT CAST(user_id AS BIGINT) AS user_id, event_type
    FROM events
""")
def stream_dedup(spark, sf_dir):
    """Streaming exact dedup (streaming/stream_distinct_keys):
    dropDuplicatesWithinWatermark keeps per-key state only inside the
    watermark horizon — the scale-safe exactly-once pattern. One
    micro-batch over the finite source == batch DISTINCT."""
    from .streaming import run_to_completion, stream_distinct_keys, \
        stream_events
    ev = stream_events(spark, sf_dir)
    return run_to_completion(stream_distinct_keys(ev),
                             "bs_stream_dedup", output_mode="append")


def _minhash_against_oracle(threshold: float = 0.7) -> str:
    """Asymmetric replay: signatures over ALL documents (identical
    per-doc values either way), pairs restricted to new-side (doc_id %
    11 = 0) × corpus-side rows."""
    return f"""
    WITH {_minhash_pairs_ctes(
        'documents', threshold=threshold,
        pair_pred='a.doc_id % 11 = 0 AND b.doc_id % 11 <> 0',
        a_name='new_id', b_name='corpus_id')}
    SELECT new_id, corpus_id, sim FROM mh_pairs
    """


@query("dedup_against", _minhash_against_oracle())
def dedup_against(spark, sf_dir):
    """Incremental dedup (operators/dedup.py minhash_pairs_against):
    near-dup matches of a NEW batch (doc_id % 11 = 0) against the
    EXISTING corpus — asymmetric banded LSH, corpus×corpus pairs never
    generated. Portable md5 mode; the oracle replays signatures +
    banding + verify exactly."""
    from .operators.dedup import minhash_pairs_against
    _, t = _s(spark, sf_dir)
    docs = t["documents"]
    new = docs.filter(F.col("doc_id") % 11 == 0)
    corpus = docs.filter(F.col("doc_id") % 11 != 0)
    return minhash_pairs_against(new, corpus, threshold=0.7,
                                 portable=True)


@query("corpus_stats", """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(list_filter(string_split_regex(text, '\\s+'),
                                    t -> t <> ''))) AS BIGINT)
               AS n_tokens,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
           1.0 - count(DISTINCT md5(text))
                 / CAST(count(*) AS DOUBLE) AS dup_frac,
           CAST(sum(len(list_filter(string_split_regex(text, '\\s+'),
                                    t -> t <> ''))) AS DOUBLE)
               / count(*) AS mean_tokens
    FROM documents GROUP BY source
""")
def corpus_stats(spark, sf_dir):
    """Per-source corpus health report (operators/text.py): doc/token
    counts, exact-dup fraction from distinct digests, mean doc length.
    Integer inputs → reproducible doubles."""
    from .operators.text import corpus_stats as _cs
    _, t = _s(spark, sf_dir)
    return _cs(t["documents"])


# =====================================================================
# Round 4: retrieval, projections, clustering, funnels, graph metrics,
# mixture weights, JSONL round-trip, z-order layout.
# =====================================================================

_BM25_TERMS = ["spark", "vector", "stream"]


def _bm25_oracle(terms: list[str], k: int = 20, k1: float = 1.2,
                 b: float = 0.75) -> str:
    """SQL replay of operators/search.bm25_score: rational idf (no ln),
    per-term partials added in literal query order (the same
    order-deterministic sum the Spark side uses), constants embedded via
    repr so both engines parse identical doubles."""
    tlist = ", ".join(f"'{t}'" for t in terms)
    cases = " + ".join(
        f"COALESCE(max(CASE WHEN term = '{t}' THEN part END), 0.0)"
        for t in terms)
    return f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(text, '\\s+'),
                                t -> t <> '')) AS term,
             len(list_filter(string_split_regex(text, '\\s+'),
                             t -> t <> '')) AS dl
      FROM documents),
    post AS (SELECT * FROM toks WHERE term IN ({tlist})),
    tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf,
                  any_value(dl) AS dl
           FROM post GROUP BY doc_id, term),
    corpus AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             CAST(sum(len(list_filter(string_split_regex(text, '\\s+'),
                                      t -> t <> ''))) AS DOUBLE) AS tot_dl
      FROM documents),
    dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
              FROM tf GROUP BY term),
    sc AS (
      SELECT tf.doc_id, tf.term,
             ((corpus.n_docs - dfreq.df + {0.5!r}) / (dfreq.df + {0.5!r}))
             * (tf.tf * ({k1 + 1.0!r}))
             / (tf.tf + ({k1!r}) * ({1.0!r} - ({b!r})
                + ({b!r}) * tf.dl / (corpus.tot_dl / corpus.n_docs)))
                 AS part
      FROM tf JOIN dfreq USING (term), corpus),
    agg AS (SELECT doc_id, {cases} AS score FROM sc GROUP BY doc_id)
    SELECT doc_id, score,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
               AS rank
    FROM agg ORDER BY score DESC, doc_id LIMIT {k}
    """


_TRIGRAM_LITS = ("hash scan", "key order", "spark window")


@query("trigram_search", "\nUNION ALL\n".join(
    f"""SELECT '{s}' AS pattern, doc_id
    FROM documents WHERE instr(text, '{s}') > 0"""
    for s in _TRIGRAM_LITS))
def trigram_search_q(spark, sf_dir):
    """Trigram-indexed substring search (operators/trigram.py, r14 —
    the public Google Code Search construction): distributed grep
    whose index can only OVER-approximate — candidates are documents
    whose distinct-3-gram posting set covers ALL of the literal's
    trigrams (codegen postings build, broadcast needed-set,
    partial-agg cover count), then exact codegen ``instr`` verify.
    The oracle is the FULL-SCAN answer (UNION ALL of instr filters),
    so the value hash proves the index loses nothing and invents
    nothing. At scale the postings persist partitioned by trigram
    hash bucket (write_trigram_index) and a query's needed trigrams
    prune to a handful of partitions — PartitionFilters plan-gated
    in tests/test_plans.py."""
    from .operators.trigram import substring_search
    _, t = _s(spark, sf_dir)
    return substring_search(t["documents"], list(_TRIGRAM_LITS))


_REGEX_PATS = ("hash (scan|join)", "key o.der", "spark.*window")


@query("regex_search", "\nUNION ALL\n".join(
    f"""SELECT '{p.replace("'", "''")}' AS pattern, doc_id
    FROM documents WHERE regexp_matches(text, '{p.replace("'", "''")}')"""
    for p in _REGEX_PATS))
def regex_search_q(spark, sf_dir):
    """Regex → trigram-query compilation (operators/trigram.py, r14
    — the second half of the Cox construction): alternations/classes/
    bounded repeats EXPAND to a finite literal set (OR of AND-covers),
    unbounded gaps fall back to REQUIRED literal runs (AND of covers:
    'spark.*window' needs the trigrams of both runs), and unprunable
    patterns scan honestly; the verify is always the real regex
    (rlike) over candidates, so pruning soundness is the only claim —
    and the oracle (DuckDB regexp_matches full scan, RE2 agreeing
    with Java regex on this syntax subset) checks exactly that the
    index loses nothing."""
    from .operators.trigram import regex_search
    _, t = _s(spark, sf_dir)
    return regex_search(t["documents"], list(_REGEX_PATS))


@query("trigram_index_grep", "\nUNION ALL\n".join(
    [f"""SELECT '{s}' AS pattern, doc_id
    FROM documents WHERE instr(text, '{s}') > 0"""
     for s in _TRIGRAM_LITS]
    + [f"""SELECT '{p.replace("'", "''")}' AS pattern, doc_id
    FROM documents WHERE regexp_matches(text, '{p.replace("'", "''")}')"""
       for p in _REGEX_PATS]))
def trigram_index_grep_q(spark, sf_dir):
    """The PERSISTED-index grep (r15, VERDICT r14 task 5 — the actual
    100 TB story): ONE write_trigram_index build (full postings,
    partitioned by trigram hash bucket), then BOTH query families —
    literal substring search and regex→trigram grep — answered off
    the same index, each scan pruned to the needed trigrams' ``tp=``
    partitions (PartitionFilters, plan-gated in tests/test_plans.py).
    The one-shot entries (trigram_search / regex_search) rebuild
    needed-only postings per query by construction; this entry
    measures the amortized shape: build once, query many. The oracle
    is the two full-scan answers UNION ALL'd — the index provably
    loses nothing and invents nothing across both query families."""
    import tempfile

    from .operators.trigram import (read_trigram_index, regex_search,
                                    substring_search,
                                    write_trigram_index)
    _, t = _s(spark, sf_dir)
    docs = t["documents"]
    path = tempfile.mkdtemp(prefix="bss_tri_idx_")
    nparts = 64
    write_trigram_index(docs, path, nparts=nparts)
    postings = read_trigram_index(spark, path)
    lit = substring_search(docs, list(_TRIGRAM_LITS),
                           postings=postings, indexed_parts=nparts)
    rex = regex_search(docs, list(_REGEX_PATS),
                       postings=postings, indexed_parts=nparts)
    return lit.unionByName(rex)


@query("bm25_search", _bm25_oracle(_BM25_TERMS))
def bm25_search(spark, sf_dir):
    """Inverted-index BM25 retrieval (operators/search.py): posting
    lists only for the query's terms, corpus scalars broadcast in-plan,
    order-deterministic per-term score sum, global top-20."""
    from .operators.search import bm25_score
    _, t = _s(spark, sf_dir)
    return bm25_score(t["documents"], _BM25_TERMS, k=20)


def _rp_oracle(dim: int = 64, out_dim: int = 8) -> str:
    """SQL replay of operators/projection.random_projection: same seeded
    LCG hyperplanes as literals, same left-associative sums."""
    from .operators.similarity import _hyperplanes
    planes = _hyperplanes(dim, out_dim, seed=42)
    projs = ", ".join(
        "(" + " + ".join(
            f"CAST(embedding[{j+1}] AS DOUBLE) * ({p[j]!r})"
            for j in range(dim)) + f") AS r{i}"
        for i, p in enumerate(planes))
    return f"SELECT vec_id, {projs} FROM embeddings"


@query("random_projection", _rp_oracle())
def random_projection_q(spark, sf_dir):
    """JL-style dense random projection 64→8 (operators/projection.py):
    zero-shuffle codegen map over the corpus — the cheap front-end of
    ANN / clustering / embedding dedup."""
    from .operators.projection import random_projection
    _, t = _s(spark, sf_dir)
    return random_projection(t["embeddings"], out_dim=8, dim=64)


def _kmeans_oracle(k: int = 8, dim: int = 64, mean_dims: int = 4,
                   scale: int = 12) -> str:
    """SQL replay of operators/clustering.kmeans_update: per-cell
    distances as one UNION ALL branch per centroid (same left-assoc
    sums), argmin via row_number ordered (d, cell) — the tie-break
    array_min(struct(d, cell)) uses — then decimal-exact coordinate
    means."""
    from .operators.clustering import seed_centroids
    cents = seed_centroids(k, dim)
    branches = " UNION ALL ".join(
        f"SELECT vec_id, {ci} AS cell, ("
        + " + ".join(
            f"(CAST(embedding[{j+1}] AS DOUBLE) - ({c[j]!r}))"
            f" * (CAST(embedding[{j+1}] AS DOUBLE) - ({c[j]!r}))"
            for j in range(dim))
        + ") AS d FROM embeddings"
        for ci, c in enumerate(cents))
    means = ", ".join(
        f"CAST(sum(CAST(CAST(embedding[{m+1}] AS DOUBLE)"
        f" AS DECIMAL(38,{scale}))) AS DOUBLE) / count(*) AS m{m}"
        for m in range(mean_dims))
    return f"""
    WITH dists AS ({branches}),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d, cell) AS rn
        FROM dists) WHERE rn = 1)
    SELECT CAST(cell AS INT) AS cell, CAST(count(*) AS BIGINT) AS n,
           {means}
    FROM assign JOIN embeddings USING (vec_id)
    GROUP BY cell
    """


@query("kmeans_step", _kmeans_oracle())
def kmeans_step(spark, sf_dir):
    """One deterministic Lloyd step (operators/clustering.py):
    zero-shuffle argmin assignment against literal centroids + one
    k-row aggregation with decimal-exact coordinate means — the
    bit-checkable complement to similarity_ivf's ml-KMeans cells."""
    from .operators.clustering import kmeans_update, seed_centroids
    _, t = _s(spark, sf_dir)
    return kmeans_update(t["embeddings"], seed_centroids(8, 64))


def _kmeans_ivf_oracle(k: int = 16, dim: int = 64, k_coarse: int = 4,
                       nprobe: int = 2) -> str:
    """SQL replay of clustering.kmeans_assign_ivf's two argmin levels:
    coarse distances as one UNION ALL branch per coarse seed +
    row_number (d, g) keeping nprobe groups, then candidate distances
    only against each probed group's member centroids (the membership
    is driver-side metadata, inlined here as the per-branch join
    filter), final argmin via row_number (d, cell)."""
    from .operators.clustering import coarse_membership, seed_centroids
    cents = seed_centroids(k, dim)
    coarse = seed_centroids(k_coarse, dim, seed=101)
    member = coarse_membership(cents, coarse)

    def dist(c, col):
        return " + ".join(
            f"(CAST({col}[{j+1}] AS DOUBLE) - ({c[j]!r}))"
            f" * (CAST({col}[{j+1}] AS DOUBLE) - ({c[j]!r}))"
            for j in range(dim))

    cd = " UNION ALL ".join(
        f"SELECT vec_id, {g} AS g, ({dist(c, 'embedding')}) AS d"
        " FROM embeddings"
        for g, c in enumerate(coarse))
    cand = " UNION ALL ".join(
        f"SELECT e.vec_id, {ci} AS cell,"
        f" ({dist(c, 'e.embedding')}) AS d"
        " FROM embeddings e JOIN probe p"
        f" ON p.vec_id = e.vec_id AND p.g = {member[ci]}"
        for ci, c in enumerate(cents))
    return f"""
    WITH cd AS ({cd}),
    probe AS (
      SELECT vec_id, g FROM (
        SELECT vec_id, g,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d, g) AS rn
        FROM cd) WHERE rn <= {nprobe}),
    cand AS ({cand})
    SELECT vec_id, CAST(cell AS INT) AS cell, d AS dist FROM (
      SELECT vec_id, cell, d,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY d, cell) AS rn
      FROM cand) WHERE rn = 1
    """


@query("kmeans_assign_ivf", _kmeans_ivf_oracle())
def kmeans_assign_ivf_q(spark, sf_dir):
    """Two-level IVF assignment (operators/clustering.py
    kmeans_assign_ivf): nprobe=2 of 4 coarse groups over 16 literal
    centroids. Flat assignment is O(k) per vector — quadratic index
    build under the IVF sizing k ~ N/cell_target; the hierarchy cuts
    it to O(√k) per vector (sf1.0: candidate rows 1.4B → 58M). Both
    argmin levels are deterministic (left-assoc folds, (d, id)
    tie-breaks), so the unrolled two-stage SQL replays bitwise."""
    from .operators.clustering import kmeans_assign_ivf, seed_centroids
    _, t = _s(spark, sf_dir)
    return kmeans_assign_ivf(t["embeddings"], seed_centroids(16, 64),
                             nprobe=2, k_coarse=4)


@query("funnel_steps", """
    WITH ev AS (
      SELECT user_id AS u, event_type AS et, epoch_us(ts) AS us
      FROM events WHERE event_type IN ('view', 'click', 'purchase')),
    s1 AS (SELECT u, min(us) AS t1 FROM ev WHERE et = 'view' GROUP BY u),
    s2 AS (SELECT s1.u, s1.t1, min(e.us) AS t2
           FROM s1 LEFT JOIN ev e
             ON e.u = s1.u AND e.et = 'click' AND e.us >= s1.t1
           GROUP BY s1.u, s1.t1),
    s3 AS (SELECT s2.u, s2.t1, s2.t2, min(e.us) AS t3
           FROM s2 LEFT JOIN ev e
             ON e.u = s2.u AND e.et = 'purchase' AND e.us >= s2.t2
           GROUP BY s2.u, s2.t1, s2.t2)
    SELECT u AS user_id, t1, t2, t3,
           CAST((t1 IS NOT NULL)::INT + (t2 IS NOT NULL)::INT
                + (t3 IS NOT NULL)::INT AS INT) AS depth
    FROM s3
""")
def funnel_steps(spark, sf_dir):
    """Ordered view→click→purchase funnel (operators/funnel.py):
    greedy-earliest stage timestamps per user, one event-scale shuffle,
    step-chaining on the reduced per-user aggregate."""
    from .operators.funnel import funnel
    _, t = _s(spark, sf_dir)
    return funnel(t["events"], ["view", "click", "purchase"])


@query("triangle_count", """
    WITH e AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey
       AND l1.l_partkey < l2.l_partkey)
    SELECT CAST(count(*) AS BIGINT) AS n_triangles
    FROM e e1
    JOIN (SELECT a AS b, b AS c FROM e) e2 USING (b)
    JOIN (SELECT a, b AS c FROM e) e3
      ON e3.a = e1.a AND e3.c = e2.c
""")
def triangle_count_q(spark, sf_dir):
    """Triangle count (operators/graph.py) over the parts-co-ordered
    graph (edge = two parts share an order): ordered two-join wedge
    closure, a<b<c each triangle once, no cartesian."""
    from .operators.graph import triangle_count
    _, t = _s(spark, sf_dir)
    li = t["lineitem"]
    l1 = li.select(F.col("l_orderkey").alias("ok"),
                   F.col("l_partkey").alias("src"))
    l2 = li.select(F.col("l_orderkey").alias("ok"),
                   F.col("l_partkey").alias("dst"))
    edges = (l1.join(l2, on="ok")
             .filter(F.col("src") < F.col("dst"))
             .select("src", "dst").distinct())
    return triangle_count(edges)


@query("mix_weights", """
    WITH per AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(list_filter(string_split_regex(text, '\\s+'),
                                      t -> t <> ''))) AS BIGINT)
                 AS n_tokens
      FROM documents GROUP BY source),
    tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM per)
    SELECT source, n_docs, n_tokens,
           sqrt(CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE)) AS weight
    FROM per, tot
""")
def mix_weights_q(spark, sf_dir):
    """Temperature-scaled mixture weights (operators/sampling.py):
    w_s = (n_s/N)^0.5 from exact integer token totals — sqrt is the one
    correctly-rounded transcendental, so the doubles replay bitwise."""
    from .operators.sampling import mix_weights
    _, t = _s(spark, sf_dir)
    return mix_weights(t["documents"], "source")


@query("source_jsonl", """
    SELECT doc_id, text, lang, source, n_chars FROM documents
""")
def source_jsonl(spark, sf_dir):
    """JSONL round-trip (sources/read_json): write the documents table
    as JSON-lines, read it back with a PINNED schema (never
    inferSchema in production paths), prove content fidelity against
    the parquet original. The oracle reads the parquet view — it never
    touches the temp files, so there is no ordering hazard between the
    driver's two runs."""
    import tempfile

    from .sources import read_json
    _, t = _s(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="bss_jsonl_")
    t["documents"].write.mode("overwrite").json(out)
    return read_json(
        spark, out,
        "doc_id long, text string, lang string, source string, "
        "n_chars long").select("doc_id", "text", "lang", "source",
                               "n_chars")


def _zorder_oracle(bits: int = 16) -> str:
    terms = []
    for i in range(bits):
        bit = 1 << i
        terms.append(f"(l_partkey & {bit}) * {1 << i}")
        terms.append(f"(l_suppkey & {bit}) * {1 << (i + 1)}")
    z = " + ".join(terms)
    return f"""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           CAST({z} AS BIGINT) AS zval
    FROM lineitem
    """


@query("zorder_layout", _zorder_oracle())
def zorder_layout(spark, sf_dir):
    """Morton / z-order value (operators/projection.py zorder_value)
    over (l_partkey, l_suppkey): the multi-dimensional clustering key
    for write_zordered's range-partitioned layout — integer bit
    arithmetic, exact in any engine."""
    from .operators.projection import zorder_value
    _, t = _s(spark, sf_dir)
    return t["lineitem"].select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        zorder_value("l_partkey", "l_suppkey").cast("long").alias("zval"))


@query("indexed_lookup", """
    SELECT doc_id, lang, n_chars FROM documents
    WHERE doc_id IN (7, 142, 389)
""")
def indexed_lookup_q(spark, sf_dir):
    """Session.write_indexed consumer (r15, VERDICT r14 task 6): lay
    the documents table out with a parquet BLOOM FILTER on doc_id +
    sortWithinPartitions (tight row-group min/max), then answer a
    point lookup off the indexed files. The pushed In-predicate
    consults the bloom filter and the sorted stats to skip row
    groups — the scan-skip layout story next to write_bucketed /
    write_zordered; plan-gated (PushedFilters on the indexed scan)
    in tests/test_plans.py. The oracle reads the parquet view, so
    the temp layout only has to be value-faithful."""
    import tempfile

    sess, t = _s(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="bss_idx_lookup_")
    sess.write_indexed(
        t["documents"].select("doc_id", "lang", "n_chars"), out,
        bloom_cols=["doc_id"], bloom_ndv=100_000,
        sort_within=["doc_id"])
    return (spark.read.parquet(out)
            .filter(F.col("doc_id").isin(7, 142, 389)))


@query("stream_join", """
    SELECT p.event_id AS p_id, v.event_id AS v_id,
           epoch_us(p.ts) AS p_us, epoch_us(v.ts) AS v_us
    FROM events p JOIN events v
      ON p.user_id = v.user_id
     AND p.event_type = 'purchase' AND v.event_type = 'view'
     AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts
""")
def stream_join(spark, sf_dir):
    """Watermarked stream-stream join (streaming/stream_stream_join):
    purchases matched to same-user views in the preceding hour, both
    sides watermarked + time-bound predicate so join state ages out
    (the unbounded-buffer OOM every naive stream join hits). One
    micro-batch over the finite source == the batch interval join."""
    from .streaming import (run_to_completion, stream_events,
                            stream_stream_join)

    # builder form: the stream is constructed on an isolated
    # newSession() clone, so the 8-state-partition pin (stores are
    # checkpoint-pinned and sized to state volume — 32 near-empty
    # stores at this volume is pure per-batch snapshot overhead)
    # lives on the clone's conf only and can never race concurrent
    # planning on the caller's session (r7 verdict task 7)
    def build(s):
        ev = stream_events(s, sf_dir)
        p = ev.filter(F.col("event_type") == "purchase")
        v = ev.filter(F.col("event_type") == "view")
        joined = stream_stream_join(p, v, on="user_id", bound="1 hour")
        return joined.select(
            F.col("l.event_id").alias("p_id"),
            F.col("r.event_id").alias("v_id"),
            F.unix_micros(F.col("l.ts")).alias("p_us"),
            F.unix_micros(F.col("r.ts")).alias("v_us"))

    return run_to_completion(build, "bs_stream_join",
                             output_mode="append", state_partitions=8,
                             spark=spark)


@query("stream_join_outer", """
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         v AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'view'),
         thr AS (SELECT min(m) - 7200000000 - 60000000 AS t FROM (
            SELECT epoch_us(max(ts)) AS m FROM p
            UNION ALL SELECT epoch_us(max(ts)) FROM v))
    SELECT p.event_id AS p_id, v.event_id AS v_id,
           epoch_us(p.ts) AS p_us
    FROM p LEFT JOIN v ON v.user_id = p.user_id
         AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts, thr
    WHERE epoch_us(p.ts) < thr.t
""")
def stream_join_outer_q(spark, sf_dir):
    """Stream-stream LEFT OUTER join with watermark expiry
    (streaming/stream_stream_join how='left_outer'): purchases match
    views in the preceding hour; a purchase with NO view emits with a
    NULL view id once the watermark passes its match window — the
    emit-unmatched-after-expiry pattern (state aged out, never
    buffered forever). Outer results for rows still inside the final
    watermark horizon are legitimately unemitted at end-of-input, so
    both engines filter to CLOSED left rows: p.ts strictly below
    min(max purchase ts, max view ts) − 2h watermark − 1min margin —
    the same integer threshold expression on each side."""
    from .streaming import (run_to_completion, stream_events,
                            stream_stream_join)

    def build(s):
        # isolated-clone builder: see stream_join for why the
        # state-partition pin must not touch the caller's session
        ev = stream_events(s, sf_dir)
        p = ev.filter(F.col("event_type") == "purchase")
        v = ev.filter(F.col("event_type") == "view")
        joined = stream_stream_join(p, v, on="user_id", bound="1 hour",
                                    how="left_outer")
        return joined.select(
            F.col("l.event_id").alias("p_id"),
            F.col("r.event_id").alias("v_id"),
            F.unix_micros(F.col("l.ts")).alias("p_us"))

    res = run_to_completion(build, "bs_stream_join_outer",
                            output_mode="append", state_partitions=8,
                            spark=spark)
    _, t = _s(spark, sf_dir)
    thr = (t["events"]
           .filter(F.col("event_type").isin("purchase", "view"))
           .groupBy("event_type")
           .agg(F.max(F.unix_micros("ts")).alias("m"))
           .agg((F.min("m") - F.lit(7200000000 + 60000000))
                .alias("thr")))
    return (res.join(F.broadcast(thr))
            .filter(F.col("p_us") < F.col("thr")).drop("thr"))


@query("upsert_merge", """
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderkey % 10 = 0
                THEN o_totalprice + o_totalprice
                ELSE o_totalprice END AS o_totalprice
    FROM orders WHERE o_orderkey % 100 <> 0
""")
def upsert_merge(spark, sf_dir):
    """Snapshot MERGE (operators/upsert.py): seed v=1 with orders, then
    apply one batch that doubles o_totalprice for keys %10=0 and
    deletes keys %100=0 — updates win on key collision via a left-anti
    join, deletes via the __deleted__ marker, the result committed as
    an immutable v=2 snapshot (readers resolve max committed version).
    The doubled price is x+x — exact in IEEE, so the oracle replays
    bitwise."""
    import tempfile

    from .operators.upsert import read_latest, upsert
    _, t = _s(spark, sf_dir)
    base = t["orders"].select("o_orderkey", "o_custkey", "o_totalprice")
    path = tempfile.mkdtemp(prefix="bss_upsert_")
    upsert(spark, path, base, ["o_orderkey"])
    updates = (base.filter(F.col("o_orderkey") % 10 == 0)
               .withColumn("o_totalprice",
                           F.col("o_totalprice") + F.col("o_totalprice"))
               .withColumn("__deleted__",
                           F.col("o_orderkey") % 100 == 0))
    upsert(spark, path, updates, ["o_orderkey"])
    return read_latest(spark, path)


@query("schema_evolution", """
    SELECT * FROM (VALUES
        ('o_comment', 'added', CAST(NULL AS VARCHAR), 'string'))
        AS t(col_name, change, old_type, new_type)
""")
def schema_evolution_q(spark, sf_dir):
    """DDL audit between snapshot versions (operators/upsert.py
    schema_diff): v=2 of a partitioned orders table adds o_comment;
    the diff reports exactly that column as added — pure metadata
    (manifest schemas), no data scan. The oracle states the expected
    delta verbatim."""
    import tempfile

    from .operators.upsert import schema_diff, upsert
    _, t = _s(spark, sf_dir)
    base = t["orders"].select(
        "o_orderkey", "o_orderpriority", "o_totalprice")
    path = tempfile.mkdtemp(prefix="bss_schemaev_")
    upsert(spark, path, base, ["o_orderkey"],
           partition_by=["o_orderpriority"])
    upsert(spark, path,
           base.filter(F.col("o_orderkey") % 1000 == 0)
           .withColumn("o_comment", F.lit("amended")),
           ["o_orderkey"])
    return schema_diff(spark, path, 1, 2).select(
        F.col("column").alias("col_name"), "change", "old_type",
        "new_type")


@query("upsert_partitioned", """
    SELECT o_orderkey, o_orderpriority,
           CASE WHEN o_orderpriority = '1-URGENT'
                     AND o_orderkey % 10 = 0
                THEN o_totalprice + o_totalprice
                ELSE o_totalprice END AS o_totalprice
    FROM orders
    WHERE NOT (o_orderpriority = '1-URGENT'
               AND o_orderkey % 100 = 0)
""")
def upsert_partitioned_q(spark, sf_dir):
    """Partition-pruned MERGE (operators/upsert.py): seed v=1 with
    orders partitioned by o_orderpriority, then apply a batch that
    touches ONLY the 1-URGENT partition (double price for keys %10=0,
    delete %100=0). v=2 physically rewrites just that partition; the
    other four carry forward by _MANIFEST.json reference at zero data
    cost — merge cost O(touched partitions), not O(table). The doubled
    price is x+x — exact in IEEE, so the oracle replays bitwise."""
    import tempfile

    from .operators.upsert import read_latest, upsert
    _, t = _s(spark, sf_dir)
    base = t["orders"].select(
        "o_orderkey", "o_orderpriority", "o_totalprice")
    path = tempfile.mkdtemp(prefix="bss_upsertp_")
    upsert(spark, path, base, ["o_orderkey"],
           partition_by=["o_orderpriority"])
    updates = (base.filter((F.col("o_orderpriority") == "1-URGENT")
                           & (F.col("o_orderkey") % 10 == 0))
               .withColumn("o_totalprice",
                           F.col("o_totalprice") + F.col("o_totalprice"))
               .withColumn("__deleted__",
                           F.col("o_orderkey") % 100 == 0))
    upsert(spark, path, updates, ["o_orderkey"])
    return read_latest(spark, path)


@query("lm_quality", """
    WITH tkt AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                 t -> t <> '') AS tk
      FROM documents),
    nz AS (SELECT doc_id, tk FROM tkt WHERE len(tk) >= 2),
    rb AS (SELECT tk[i] AS w1, tk[i+1] AS w2
           FROM nz, unnest(generate_series(1, len(tk) - 1)) u(i)),
    c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
            FROM rb GROUP BY w1, w2),
    c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1
           FROM c12 GROUP BY w1),
    v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS V FROM (
            SELECT unnest(tk) AS w FROM tkt)),
    db AS (SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
           FROM nz, unnest(generate_series(1, len(tk) - 1)) u(i)),
    s AS (SELECT doc_id,
                 CAST(ln(CAST(coalesce(c12.c12, 0) + 1 AS DOUBLE)
                         / CAST(coalesce(c1.c1, 0) + V AS DOUBLE))
                      AS DECIMAL(38,12)) AS lp
          FROM db LEFT JOIN c12 USING (w1, w2)
                  LEFT JOIN c1 USING (w1), v)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(lp) AS DOUBLE) / count(*) AS avg_logprob
    FROM s GROUP BY doc_id
""")
def lm_quality_q(spark, sf_dir):
    """Statistical-LM quality scoring (operators/lm.py): per-document
    mean add-one-smoothed bigram log-probability under the corpus's
    own bigram model — the exactly-specified analog of CCNet's KenLM
    perplexity filter. Every ln input is an exact integer rational and
    the per-doc sum runs over decimal-cast addends, so the score is
    partial-agg-order independent and replays across engines inside
    the driver's float normalization."""
    from .operators.lm import lm_quality
    _, t = _s(spark, sf_dir)
    return lm_quality(t["documents"])


@query("event_gaps", """
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events)
    SELECT user_id, CAST(count(gap_us) AS BIGINT) AS n_gaps,
           CAST(min(gap_us) AS BIGINT) AS min_gap_us,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us,
           CAST(sum(gap_us) AS BIGINT) AS total_gap_us
    FROM g GROUP BY user_id
""")
def event_gaps(spark, sf_dir):
    """Inter-event gap statistics per user (lead/lag window surface):
    lag over (user_id, ts, event_id) ordering — one window exchange
    reused by the following aggregation on the same key, exact integer
    microsecond gaps. The session-dwell/retention building block next
    to sessionize."""
    from pyspark.sql.window import Window
    _, t = _s(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    g = t["events"].select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us"))
    return (g.groupBy("user_id")
            .agg(F.count("gap_us").alias("n_gaps"),
                 F.min("gap_us").alias("min_gap_us"),
                 F.max("gap_us").alias("max_gap_us"),
                 F.sum("gap_us").alias("total_gap_us")))


@query("ewma_value", """
    WITH l AS (
      SELECT user_id, list(CAST(value AS DOUBLE) ORDER BY ts, event_id)
                 AS xs
      FROM events GROUP BY user_id)
    SELECT user_id, CAST(len(xs) AS INT) AS n_events,
           list_reduce(xs, (acc, x) ->
               CAST(0.3 AS DOUBLE) * x
               + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE)) * acc)
               AS ewma
    FROM l
""")
def ewma_value_q(spark, sf_dir):
    """Per-user EWMA of event values (operators/timeseries.py
    ewma_last): one aggregation exchange, per-key ordered left fold
    with α pinned to DOUBLE — bitwise-replayed by DuckDB's
    list_reduce, which seeds with the first element exactly like the
    Spark fold's init."""
    from .operators.timeseries import ewma_last
    _, t = _s(spark, sf_dir)
    return ewma_last(t["events"], "user_id", "ts", "value",
                     order_cols=["event_id"], alpha=0.3)


@query("compact_partitioned", """
    SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
""")
def compact_partitioned_q(spark, sf_dir):
    """Small-file compaction for partitioned snapshot tables
    (operators/upsert.py compact_partitions) — the OPTIMIZE companion
    to the partition-pruned merge: the seeded table's partitions are
    sharded across the shuffle-partition count; one compaction commit
    folds each back to ~1 file via a single hash-repartitioned job,
    untouched layout carried by manifest reference. Rows are
    byte-identical to the source — the oracle is the identity
    projection."""
    import tempfile

    from .operators.upsert import (compact_partitions, read_latest,
                                   upsert)
    _, t = _s(spark, sf_dir)
    base = t["orders"].select(
        "o_orderkey", "o_orderpriority", "o_totalprice")
    path = tempfile.mkdtemp(prefix="bss_compactp_")
    upsert(spark, path, base, ["o_orderkey"],
           partition_by=["o_orderpriority"])
    compact_partitions(spark, path, min_files=1)
    return read_latest(spark, path)


@query("chunk_docs", """
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'),
                         x -> x <> '') AS tk
      FROM documents),
    nz AS (SELECT * FROM t WHERE len(tk) > 0),
    s AS (SELECT doc_id, tk,
                 unnest(range(0, len(tk), 48)) AS st
          FROM nz)
    SELECT doc_id, CAST(st // 48 AS INT) AS chunk_id,
           array_to_string(list_slice(tk, st + 1, st + 48), ' ')
               AS chunk_text,
           CAST(len(list_slice(tk, st + 1, st + 48)) AS BIGINT)
               AS n_tokens
    FROM s
""")
def chunk_docs(spark, sf_dir):
    """Token-window chunking (operators/text.py chunk_documents):
    disjoint 48-token windows per document, the long-doc →
    training-sequence step before pack_sequences. Pure codegen
    (sequence → slice → explode), zero shuffles."""
    from .operators.text import chunk_documents
    _, t = _s(spark, sf_dir)
    return chunk_documents(t["documents"], chunk_tokens=48)


@query("bigram_pmi", """
    WITH t AS (
      SELECT list_filter(string_split_regex(text, '\\s+'),
                         x -> x <> '') AS tk
      FROM documents),
    nz AS (SELECT tk FROM t WHERE len(tk) > 0),
    uni AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM (
              SELECT unnest(tk) AS w1 FROM nz) GROUP BY w1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tok FROM (
              SELECT unnest(tk) AS w FROM nz)),
    pr AS (SELECT tk[i] AS w1, tk[i + 1] AS w2
           FROM nz, unnest(generate_series(1, len(tk) - 1)) u(i)),
    pairs AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
              FROM pr GROUP BY w1, w2 HAVING count(*) >= 5)
    SELECT p.w1, p.w2, p.c12,
           (CAST(n_tok AS DOUBLE) * CAST(c12 AS DOUBLE))
           / (CAST(a.c1 AS DOUBLE) * CAST(b.c1 AS DOUBLE)) AS pmi
    FROM pairs p
    JOIN uni a ON a.w1 = p.w1
    JOIN uni b ON b.w1 = p.w2, tot
    ORDER BY pmi DESC, p.w1, p.w2 LIMIT 30
""")
def bigram_pmi_q(spark, sf_dir):
    """Collocation mining (operators/text.py bigram_pmi): top-30
    adjacent bigrams by rational PMI (N·c12)/(c1·c2) — exact integer
    counts, one double expression, bitwise-portable ordering."""
    from .operators.text import bigram_pmi
    _, t = _s(spark, sf_dir)
    return bigram_pmi(t["documents"], min_count=5, k=30)


@query("stream_enrich", """
    SELECT e.event_id, e.user_id, e.event_type,
           c.c_name, n.n_name AS nation
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id % 1500
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE e.event_type = 'purchase'
""")
def stream_enrich(spark, sf_dir):
    """Stream-static enrichment: the streaming event flow joined to
    static dimension tables (customer→nation) — Spark broadcasts the
    static side into every micro-batch, no stream state at all (the
    scale-free streaming join; contrast stream_join's stateful
    stream-stream case). The synthetic user_id has no FK to customer,
    so the entry derives one deterministically (user_id % 1500 — same
    expression in the oracle; custkeys are 0-based)."""
    from .streaming import run_to_completion, stream_events
    _, t = _s(spark, sf_dir)
    ev = stream_events(spark, sf_dir) \
        .filter(F.col("event_type") == "purchase") \
        .withColumn("__ck__", F.col("user_id") % 1500)
    cust = t["customer"].select(
        F.col("c_custkey").alias("__ck__"), "c_name", "c_nationkey")
    nat = t["nation"].select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("nation"))
    out = (ev.join(F.broadcast(cust), on="__ck__")
           .join(F.broadcast(nat), on="c_nationkey")
           .select("event_id", "user_id", "event_type", "c_name",
                   "nation"))
    return run_to_completion(out, "bs_stream_enrich",
                             output_mode="append")


@query("key_skew_report", """
    WITH per AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows
      FROM events GROUP BY event_type),
    tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS tot,
                   CAST(count(*) AS BIGINT) AS n_keys FROM per)
    SELECT event_type, n_rows,
           CAST(n_rows AS DOUBLE) / CAST(tot AS DOUBLE) AS share,
           CAST(n_rows AS DOUBLE)
               / (CAST(tot AS DOUBLE) / CAST(n_keys AS DOUBLE))
               AS x_mean
    FROM per, tot
    ORDER BY n_rows DESC, event_type LIMIT 20
""")
def key_skew_report_q(spark, sf_dir):
    """Skew diagnostics (operators/skew.py key_skew_report): top keys
    by exact count with share-of-total and multiple-of-mean-load — one
    aggregation, scalars broadcast in-plan."""
    from .operators.skew import key_skew_report
    _, t = _s(spark, sf_dir)
    return key_skew_report(t["events"], ["event_type"])


@query("source_orc", """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
""")
def source_orc(spark, sf_dir):
    """ORC round-trip (sources/read_orc): write orders as ORC, read it
    back, prove content fidelity against the parquet original — the
    columnar-format interop story (both formats share Spark's
    pushdown/pruning machinery). Oracle reads the parquet view; the
    temp dir is never touched by the driver's oracle run."""
    import tempfile

    from .sources import read_orc
    _, t = _s(spark, sf_dir)
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    out = tempfile.mkdtemp(prefix="bss_orc_")
    t["orders"].select(*cols).write.mode("overwrite").orc(out)
    return read_orc(spark, out).select(*cols)


def _keep_best_oracle() -> str:
    """Replay of dedup_keep_best: portable-minhash pairs
    (_minhash_pairs_ctes) → recursive-CTE components → per-cluster
    argmax of the quality score via max(struct(q, -id)) — bitwise float
    parity holds because the quality expression is the oracled
    quality_score replay."""
    return f"""
    WITH RECURSIVE {_minhash_pairs_ctes('documents', threshold=0.5)},
    sym AS (SELECT id_a AS u, id_b AS v FROM mh_pairs
            UNION SELECT id_b, id_a FROM mh_pairs),
    reach(node, label) AS (
      SELECT u, u FROM sym
      UNION
      SELECT s.v, r.label FROM reach r JOIN sym s ON s.u = r.node),
    comp AS (SELECT node, min(label) AS component
             FROM reach GROUP BY node),
    qs AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'),
                         t -> t <> '') AS toks,
             CAST(length(regexp_replace(text, '\\s+', '', 'g'))
                  AS BIGINT) AS alpha
      FROM documents),
    qm AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(alpha AS DOUBLE)
                 / CAST(greatest(len(toks), 1) AS DOUBLE) AS mtl,
             CAST(len(list_distinct(toks)) AS DOUBLE)
                 / CAST(greatest(len(toks), 1) AS DOUBLE) AS dr
      FROM qs),
    q AS (
      SELECT doc_id,
             least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.4
             + (CASE WHEN mtl >= 3.0 AND mtl <= 10.0
                     THEN 1.0 ELSE 0.0 END) * 0.3
             + dr * 0.3 AS quality
      FROM qm),
    member AS (SELECT c.node AS doc_id, c.component, q.quality
               FROM comp c JOIN q ON q.doc_id = c.node),
    best AS (SELECT component,
                    max({{'q': quality, 'nd': -doc_id}}) AS w
             FROM member GROUP BY component),
    keep AS (
      SELECT CAST(-(w.nd) AS BIGINT) AS doc_id FROM best
      UNION ALL
      SELECT doc_id FROM q
      WHERE doc_id NOT IN (SELECT node FROM comp))
    SELECT q.doc_id, q.quality FROM q JOIN keep USING (doc_id)
    """


@query("dedup_keep_best", _keep_best_oracle())
def dedup_keep_best_q(spark, sf_dir):
    """Policy-based near-dup removal (operators/dedup.py
    dedup_keep_best): each LSH/components duplicate cluster keeps its
    HIGHEST-quality member (ties → smallest id) — corpus builds keep
    the best copy, not an arbitrary one. Portable hash mode so the
    oracle replays pairs, clusters, scores, and the argmax exactly."""
    from .operators.dedup import dedup_keep_best
    from .operators.text import quality_score
    _, t = _s(spark, sf_dir)
    docs = t["documents"]
    return dedup_keep_best(docs, quality_score(docs), portable=True)


@query("snapshot_diff", """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 100 = 0 THEN 'deleted'
                ELSE 'updated' END AS change
    FROM orders WHERE o_orderkey % 10 = 0
""")
def snapshot_diff_q(spark, sf_dir):
    """CDC between table versions (operators/upsert.py snapshot_diff):
    replays the upsert_merge scenario (double price for keys %10=0,
    delete %100=0), then diffs v1->v2 - one full-outer key join with
    null-safe struct compare. The oracle states the expected change
    set directly from the base table."""
    import tempfile

    from .operators.upsert import snapshot_diff, upsert
    _, t = _s(spark, sf_dir)
    base = t["orders"].select("o_orderkey", "o_custkey", "o_totalprice")
    path = tempfile.mkdtemp(prefix="bss_diff_")
    upsert(spark, path, base, ["o_orderkey"])
    updates = (base.filter(F.col("o_orderkey") % 10 == 0)
               .withColumn("o_totalprice",
                           F.col("o_totalprice") + F.col("o_totalprice"))
               .withColumn("__deleted__",
                           F.col("o_orderkey") % 100 == 0))
    upsert(spark, path, updates, ["o_orderkey"])
    return snapshot_diff(spark, path, 1, 2, ["o_orderkey"])


_HIST_LO, _HIST_HI, _HIST_BINS = 0.0, 600000.0, 24


@query("price_histogram", f"""
    WITH b AS (
      SELECT CAST(least(greatest(floor((o_totalprice - ({_HIST_LO!r}))
                 / (({_HIST_HI!r}) - ({_HIST_LO!r})) * {_HIST_BINS}),
                 -1.0), CAST({_HIST_BINS} AS DOUBLE)) AS BIGINT) AS bin
      FROM orders)
    SELECT bin, CAST(count(*) AS BIGINT) AS n
    FROM b GROUP BY bin
""")
def price_histogram(spark, sf_dir):
    """Fixed-width numeric histogram over o_totalprice: bin index from
    the same floor((x-lo)/(hi-lo)*k) double expression in both engines
    (identical operand order -> identical bins; out-of-range clamps to
    -1 / k sentinels). One hash aggregation, k+2 output rows - the
    scale-free distribution profile every pipeline report needs."""
    _, t = _s(spark, sf_dir)
    lo, hi, k = _HIST_LO, _HIST_HI, _HIST_BINS
    x = F.col("o_totalprice")
    bin_ = F.least(
        F.greatest(F.floor((x - F.lit(lo)) / (F.lit(hi) - F.lit(lo))
                           * F.lit(k)).cast("double"), F.lit(-1.0)),
        F.lit(float(k))).cast("long")
    return (t["orders"].select(bin_.alias("bin"))
            .groupBy("bin").agg(F.count(F.lit(1)).alias("n")))


@query("heavy_hitters", """
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                                t -> t <> '')) AS tok
      FROM documents),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM toks)
    SELECT tok, CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) AS DOUBLE) / CAST(n_total AS DOUBLE) AS freq
    FROM toks, tot
    GROUP BY tok, n_total
    HAVING CAST(count(*) AS DOUBLE) >= 0.01 * CAST(n_total AS DOUBLE)
""")
def heavy_hitters_q(spark, sf_dir):
    """φ-heavy hitters (operators/sketch.py): per-partition Misra-Gries
    candidate generation (map-only, O(parts·k) rows) + broadcast-filter
    exact recount — the sketch bounds the WORK, the output stays exact
    and partition-independent, so the oracle is a plain HAVING clause."""
    from .operators.sketch import heavy_hitters
    _, t = _s(spark, sf_dir)
    return heavy_hitters(t["documents"], phi=0.01)


@query("heavy_hitters_approx", """
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                                t -> t <> '')) AS tok
      FROM documents),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks),
    cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_true
            FROM toks GROUP BY tok)
    SELECT c.tok, c.n_true, TRUE AS found, TRUE AS bounds_ok
    FROM cnt c, tot
    WHERE CAST(c.n_true AS DOUBLE) >= 0.01 * CAST(tot.n AS DOUBLE)
""")
def heavy_hitters_approx_q(spark, sf_dir):
    """ONE-pass φ-heavy hitters (operators/sketch.py exact=False):
    merged Misra-Gries counters as (n_lo, n_hi) bounds. The counter
    VALUES are partition-dependent (merge-order), so they can never
    hash-match an engine-neutral oracle — instead the entry encodes
    the sketch's DETERMINISTIC guarantee as data (the similarity_ivf
    recall trick): for every TRUE φ-heavy token (exact counts, fully
    SQL-expressible), emit whether the sketch surfaced it (``found``
    — Misra-Gries guarantees yes) and whether its exact count lies in
    the sketch's [n_lo, n_hi] (``bounds_ok`` — guaranteed by
    deficiency ≤ N/(k+1)). The oracle asserts both are TRUE for
    exactly the true-heavy set, so a missed hitter or violated bound
    hash-mismatches instead of hiding behind a rows-only check.
    Partition-count invariance of the booleans is pinned by the
    dual-config battery; the raw-bounds property stays in
    tests/test_properties.py. (The entry pays three corpus token
    scans — sketch MG pass + the exact mode's own candidate and
    recount passes — a correctness-gate cost, not the production
    shape: pipelines run ONE mode, and the one-pass sketch alone is
    the scale path.)"""
    from .operators.sketch import heavy_hitters
    _, t = _s(spark, sf_dir)
    docs = t["documents"]
    sk = heavy_hitters(docs, phi=0.01, exact=False)
    ex = heavy_hitters(docs, phi=0.01, exact=True)
    return (ex.select("tok", F.col("n").alias("n_true"))
            .join(sk.select("tok", "n_lo", "n_hi"), on="tok",
                  how="left")
            .select("tok", "n_true",
                    F.col("n_lo").isNotNull().alias("found"),
                    F.coalesce((F.col("n_lo") <= F.col("n_true"))
                               & (F.col("n_true") <= F.col("n_hi")),
                               F.lit(False)).alias("bounds_ok")))


@query("stream_upsert", """
    SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
           epoch_us(ts) AS ts_us,
           CAST(user_id % 16 AS BIGINT) AS shard
    FROM events WHERE event_type = 'purchase'
""")
def stream_upsert_q(spark, sf_dir):
    """Streaming MERGE (streaming/stream_upsert): each micro-batch of
    purchase events upserts into a versioned snapshot table keyed by
    event_id via foreachBatch — the maintain-a-serving-table pattern,
    idempotent under at-least-once redelivery. The table is
    hash-sharded (user_id % 16) and merged with ``partition_by`` so a
    micro-batch rewrites only the shards it touches (manifest
    carry-forward), not the full snapshot. Over the finite source the
    final table equals the batch filter."""
    import tempfile

    from .streaming import stream_events, stream_upsert
    ev = (stream_events(spark, sf_dir)
          .filter(F.col("event_type") == "purchase")
          .select("event_id", "user_id",
                  F.unix_micros("ts").alias("ts_us"),
                  (F.col("user_id") % 16).cast("long").alias("shard")))
    base = tempfile.mkdtemp(prefix="bss_supsert_")
    return stream_upsert(ev, base + "/tbl", ["event_id"],
                         checkpoint=base + "/ckpt",
                         partition_by=["shard"])


@query("tfidf_terms", """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(text, '\\s+'),
                                t -> t <> '')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
           FROM toks GROUP BY doc_id, term),
    dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
              FROM tf GROUP BY term),
    nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    sc AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * ((n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
                 AS tfidf
      FROM tf JOIN dfreq USING (term), nd),
    r AS (SELECT doc_id, term, tfidf,
                 CAST(row_number() OVER (
                     PARTITION BY doc_id
                     ORDER BY tfidf DESC, term) AS INT) AS rank
          FROM sc)
    SELECT doc_id, term, tfidf, rank FROM r WHERE rank <= 3
""")
def tfidf_terms(spark, sf_dir):
    """Per-document top-3 tf-idf terms (operators/search.py
    tfidf_top_terms): inverted-index df aggregation (vocabulary
    shuffles once, corpus text never), rational idf for bitwise float
    parity, per-doc top-m window with term tie-break."""
    from .operators.search import tfidf_top_terms
    _, t = _s(spark, sf_dir)
    return tfidf_top_terms(t["documents"], m=3)


@query("sample_per_key", """
    SELECT lang, doc_id, n_chars FROM (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(concat_ws(':', lang,
                                      CAST(doc_id AS VARCHAR))) ASC,
                        doc_id ASC) AS rn
      FROM documents) WHERE rn <= 3
""")
def sample_per_key_q(spark, sf_dir):
    """Deterministic per-key reservoir sample (operators/sampling.py
    sample_per_key): ≤3 documents per language, chosen by an
    engine-portable md5 priority — the eval-set / inspection sampler.
    One window exchange on the key; the same rows survive on any
    engine or partitioning."""
    from .operators.sampling import sample_per_key
    _, t = _s(spark, sf_dir)
    return (sample_per_key(t["documents"], ["lang"], 3)
            .select("lang", "doc_id", "n_chars"))


@query("epoch_shuffle", """
    SELECT doc_id, lang,
           CAST(row_number() OVER (
             ORDER BY md5(concat_ws(chr(31), '7', '1',
                                    CAST(doc_id AS VARCHAR))) ASC,
                      doc_id ASC) - 1 AS BIGINT) AS pos
    FROM documents
""")
def epoch_shuffle_q(spark, sf_dir):
    """Deterministic epoch shuffle (operators/sampling.py
    epoch_order): every document gets its global training position
    0..N-1 under the (seed=7, epoch=1) md5 permutation — the
    epoch-ordering step that feeds training shards. The Spark side
    computes positions with a range partition + two-level prefix
    count (no single-partition window — plan-gated); the oracle is
    one global row_number, and a hash match proves the distributed
    position arithmetic equals the total order bit-for-bit."""
    from .operators.sampling import epoch_order
    _, t = _s(spark, sf_dir)
    return (epoch_order(t["documents"], seed=7, epoch=1)
            .select("doc_id", "lang", "pos"))


@query("time_rollup", """
    SELECT epoch_us(date_trunc('week', ts)) AS week_us,
           epoch_us(date_trunc('day', ts)) AS day_us,
           epoch_us(date_trunc('hour', ts)) AS hour_us,
           CAST(GROUPING(week_us, day_us, hour_us) AS INT) AS gid,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(CAST(value AS DOUBLE) AS DECIMAL(38,4)))
                AS DOUBLE) AS sum_value,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY ROLLUP(week_us, day_us, hour_us)
""")
def time_rollup_q(spark, sf_dir):
    """Hierarchical time-bucket rollup (operators/timeseries.py
    time_rollup): hour→day→week→total grains from ONE fused
    aggregation — the hypertable/continuous-aggregate shape. Exact
    decimal sums; ISO week truncation; buckets as unix-microsecond
    BIGINTs so grains hash identically cross-engine."""
    from .operators.timeseries import time_rollup
    _, t = _s(spark, sf_dir)
    return time_rollup(t["events"])


@query("ts_anomaly", """
    WITH b AS (
      SELECT user_id, ts, event_id, CAST(value AS DOUBLE) AS v
      FROM events),
    w AS (
      SELECT user_id, epoch_us(ts) AS ts_us, v,
             CAST(sum(CAST(v AS DECIMAL(38,6))) OVER fr AS DOUBLE) AS s,
             CAST(sum(CAST(v * v AS DECIMAL(38,6))) OVER fr AS DOUBLE)
                 AS s2,
             count(v) OVER fr AS n
      FROM b
      WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
    SELECT user_id, ts_us, v AS value, CAST(n AS INT) AS n_ref,
           s / CAST(n AS DOUBLE) AS mean,
           (v - s / CAST(n AS DOUBLE))
             / sqrt((s2 - s * s / CAST(n AS DOUBLE))
                    / (CAST(n AS DOUBLE) - 1.0)) AS z
    FROM w
    WHERE n >= 8
      AND (s2 - s * s / CAST(n AS DOUBLE))
            / (CAST(n AS DOUBLE) - 1.0) > 0
      AND abs((v - s / CAST(n AS DOUBLE))
              / sqrt((s2 - s * s / CAST(n AS DOUBLE))
                     / (CAST(n AS DOUBLE) - 1.0))) >= 2.0
""")
def ts_anomaly_q(spark, sf_dir):
    """Per-user rolling z-score anomalies (operators/timeseries.py
    rolling_zscore): each event value scored against its own trailing
    20-event window (exclusive frame, 8-point warm-up), |z| ≥ 2
    emitted. One window exchange; decimal-exact window sums make the
    threshold cut bitwise engine-reproducible.

    Bench note (r9, closes the r7 watch item): in-bench sf0.1 walls on
    this unchanged code are r5 1.06 / r6 1.06 / r7 1.62 / r8 1.07 /
    r9 1.12s — median 1.07s; the r7 spike never reproduced and was
    box noise (PERFORMANCE.md round 9)."""
    from .operators.timeseries import rolling_zscore
    _, t = _s(spark, sf_dir)
    return rolling_zscore(t["events"], "user_id", "ts", "value",
                          order_cols=["event_id"], window=20,
                          min_n=8, z_threshold=2.0)


def _seed_cells_cte(k: int, dim: int) -> str:
    """Shared CTE text: argmin cell assignment against the literal
    seed_centroids(k, dim) — the same left-assoc squared-L2 sums and
    (d, cell) tie-break clustering._argmin_expr codegens."""
    from .operators.clustering import seed_centroids
    cents = seed_centroids(k, dim)
    branches = " UNION ALL ".join(
        f"SELECT vec_id, {ci} AS cell, ("
        + " + ".join(
            f"(CAST(embedding[{j+1}] AS DOUBLE) - ({c[j]!r}))"
            f" * (CAST(embedding[{j+1}] AS DOUBLE) - ({c[j]!r}))"
            for j in range(dim))
        + ") AS d FROM embeddings"
        for ci, c in enumerate(cents))
    return f"""
    dists AS ({branches}),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d, cell) AS rn
        FROM dists) WHERE rn = 1)"""


def _kmeans_train_oracle(k: int = 8, dim: int = 64, mean_dims: int = 4,
                         scale: int = 12) -> str:
    """Replay of ONE kmeans_train iteration + the narrow reporting
    update: assign against literal seeds → full-width decimal-exact
    means (empty cells coalesce back to their seed) → re-assign
    against the TRAINED centroids (same arithmetic the Spark side runs
    after collecting them as literals) → (cell, n, m0..m3)."""
    from .operators.clustering import seed_centroids
    cents = seed_centroids(k, dim)
    means_full = ", ".join(
        f"CAST(sum(CAST(CAST(embedding[{m+1}] AS DOUBLE)"
        f" AS DECIMAL(38,{scale}))) AS DOUBLE) / count(*) AS m{m}"
        for m in range(dim))
    seed_rows = ", ".join(
        "(" + ", ".join([str(ci)] + [repr(c[j]) for j in range(dim)])
        + ")" for ci, c in enumerate(cents))
    seed_cols = ", ".join(f"s{j}" for j in range(dim))
    cent_cols = ", ".join(f"coalesce(u.m{j}, s.s{j}) AS c{j}"
                          for j in range(dim))
    d2 = " + ".join(
        f"(CAST(e.embedding[{j+1}] AS DOUBLE) - c.c{j})"
        f" * (CAST(e.embedding[{j+1}] AS DOUBLE) - c.c{j})"
        for j in range(dim))
    means_narrow = ", ".join(
        f"CAST(sum(CAST(CAST(embedding[{m+1}] AS DOUBLE)"
        f" AS DECIMAL(38,{scale}))) AS DOUBLE) / count(*) AS m{m}"
        for m in range(mean_dims))
    return f"""
    WITH {_seed_cells_cte(k, dim)},
    upd AS (
      SELECT cell, {means_full}
      FROM assign JOIN embeddings USING (vec_id) GROUP BY cell),
    seeds(cell, {seed_cols}) AS (VALUES {seed_rows}),
    cent1 AS (
      SELECT s.cell, {cent_cols}
      FROM seeds s LEFT JOIN upd u ON u.cell = s.cell),
    d2 AS (
      SELECT e.vec_id, c.cell, ({d2}) AS d
      FROM embeddings e CROSS JOIN cent1 c),
    assign2 AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d, cell) AS rn
        FROM d2) WHERE rn = 1)
    SELECT CAST(cell AS INT) AS cell, CAST(count(*) AS BIGINT) AS n,
           {means_narrow}
    FROM assign2 JOIN embeddings USING (vec_id)
    GROUP BY cell
    """


@query("kmeans_train", _kmeans_train_oracle())
def kmeans_train_q(spark, sf_dir):
    """Iterative k-means (operators/clustering.py kmeans_train): one
    full Lloyd iteration (driver traffic = k·dim doubles) followed by
    the narrow reporting update under the trained centroids. Every
    step is deterministic — seeded init, decimal-exact means,
    (d, cell) tie-break — so the unrolled SQL replay matches
    bitwise."""
    from .operators.clustering import kmeans_train, kmeans_update
    _, t = _s(spark, sf_dir)
    cents = kmeans_train(t["embeddings"], k=8, dim=64, iters=1)
    return kmeans_update(t["embeddings"], cents)


def _semantic_dedup_oracle(k: int = 8, dim: int = 64,
                           threshold: float = 0.35) -> str:
    """Cell assignment against literal seeds, within-cell exact cosine
    pairs at ``threshold``, survivors = vectors with no lower-id near
    neighbor in their cell (the greedy lower-id drop rule shared by
    every dedup family here)."""
    dot = " + ".join(
        f"CAST(a.embedding[{i+1}] AS DOUBLE)"
        f" * CAST(b.embedding[{i+1}] AS DOUBLE)" for i in range(dim))
    nsum = " + ".join(
        f"CAST(embedding[{i+1}] AS DOUBLE)"
        f" * CAST(embedding[{i+1}] AS DOUBLE)" for i in range(dim))
    return f"""
    WITH {_seed_cells_cte(k, dim)},
    norms AS (SELECT vec_id, sqrt({nsum}) AS nrm FROM embeddings),
    dropped AS (
      SELECT DISTINCT cb.vec_id AS id
      FROM assign ca
      JOIN assign cb ON cb.cell = ca.cell AND ca.vec_id < cb.vec_id
      JOIN embeddings a ON a.vec_id = ca.vec_id
      JOIN embeddings b ON b.vec_id = cb.vec_id
      JOIN norms na ON na.vec_id = ca.vec_id
      JOIN norms nb ON nb.vec_id = cb.vec_id
      WHERE na.nrm > 0 AND nb.nrm > 0
        AND ({dot}) / (na.nrm * nb.nrm) >= {threshold!r})
    SELECT a.vec_id, CAST(a.cell AS INT) AS cell
    FROM assign a
    WHERE a.vec_id NOT IN (SELECT id FROM dropped)
    """


@query("semantic_dedup", _semantic_dedup_oracle())
def semantic_dedup_q(spark, sf_dir):
    """SemDeDup (operators/dedup.py semantic_dedup): cluster the
    embeddings (here: the deterministic seed cells, k=8 — production
    composes clustering.kmeans_train first), then drop any vector with
    a lower-id cosine-0.35 neighbor inside its cluster. Candidate
    pairs are bounded per-cell and hot cells are salted — never an
    all-pairs join."""
    from .operators.clustering import seed_centroids
    from .operators.dedup import semantic_dedup
    _, t = _s(spark, sf_dir)
    return semantic_dedup(t["embeddings"], seed_centroids(8, 64),
                          threshold=0.35)


def _bpe_train_oracle_sql(num_merges: int, min_count: int = 2,
                          vocab_cap: int = 65536) -> str:
    """Full SQL replay of bpe_train's merge loop: the word-frequency
    table (lowercase, ASCII-\\s split, min_count filter, top-vocab_cap
    by (n DESC, word)) becomes symbol rows, then each of the
    ``num_merges`` iterations is ONE PAIR of chained CTEs — m{r} picks
    the argmax pair (sum of word frequencies over ALL adjacent
    occurrences, overlaps included, tie-break count DESC then pair
    lexicographic, byte order == code-point order on this corpus) and
    t{r+1} rewrites every word with that pair merged left-to-right
    non-overlapping (the same gaps-and-islands selection as the
    encode oracle). CTEs are MATERIALIZED: each t{r} is referenced
    twice (by m{r} and t{r+1}), and DuckDB's default inlining would
    expand the 40-level DAG exponentially. Assumes no merge falls
    under count 2 (the trainer's early break) — true by orders of
    magnitude at every test SF."""
    ctes = [f"""wc AS MATERIALIZED (
  SELECT word, n FROM (
    SELECT word, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT unnest(list_filter(string_split_regex(lower(text),
                                                   '\\s+'),
                                t -> t <> '')) AS word
      FROM documents)
    GROUP BY word HAVING count(*) >= {min_count})
  ORDER BY n DESC, word LIMIT {vocab_cap})""", """t0 AS MATERIALIZED (
  SELECT word, n, s.pos AS pos, s.sym AS sym FROM (
    SELECT word, n,
           unnest(list_transform(
             list_append(list_transform(range(1, length(word) + 1),
                                        i -> word[i]), '▁'),
             (c, i) -> {'pos': i, 'sym': c})) AS s
    FROM wc))"""]
    prev = "t0"
    for r in range(num_merges):
        ctes.append(f"""m{r} AS MATERIALIZED (
  SELECT sym AS a, nxt AS b, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT word, n, sym,
               lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
        FROM {prev})
  WHERE nxt IS NOT NULL
  GROUP BY sym, nxt
  ORDER BY cnt DESC, a, b LIMIT 1)""")
        ctes.append(f"""t{r + 1} AS MATERIALIZED (
  SELECT word, n,
         row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
         CASE WHEN dm THEN sym || nxt ELSE sym END AS sym
  FROM (
    SELECT word, n, pos, sym, nxt, dm,
           lag(dm) OVER (PARTITION BY word ORDER BY pos) AS pdm
    FROM (
      SELECT word, n, pos, sym, nxt,
             coalesce(m AND (pos - min(CASE WHEN m THEN pos END)
                 OVER (PARTITION BY word, grp)) % 2 = 0, FALSE) AS dm
      FROM (
        SELECT word, n, pos, sym, nxt, m,
               pos - (CASE WHEN m THEN row_number()
                 OVER (PARTITION BY word, m ORDER BY pos) END) AS grp
        FROM (
          SELECT q.word, q.n, q.pos, q.sym,
                 lead(q.sym) OVER (PARTITION BY q.word
                                   ORDER BY q.pos) AS nxt,
                 coalesce(q.sym = mm.a AND lead(q.sym)
                   OVER (PARTITION BY q.word ORDER BY q.pos) = mm.b,
                   FALSE) AS m
          FROM {prev} q, m{r} mm))))
  WHERE NOT coalesce(pdm, FALSE))""")
        prev = f"t{r + 1}"
    sel = "\nUNION ALL\n".join(
        f'SELECT CAST({r} AS INTEGER) AS rank, a AS "left", '
        f'b AS "right", cnt AS n FROM m{r}'
        for r in range(num_merges))
    return "WITH " + ",\n".join(ctes) + "\n" + sel


@query("bpe_merges", _bpe_train_oracle_sql(40))
def bpe_merges_q(spark, sf_dir):
    """BPE tokenizer training (operators/bpe.py bpe_train): one
    distributed word-count pass (the only corpus-scale work) + the
    driver-side merge loop over the vocabulary table. Deterministic
    (count DESC, pair lexicographic tie-break), so the merge table is
    stable across engines and partitionings — and fully SQL-oracled:
    the oracle unrolls the 40 argmax-then-rewrite iterations as
    chained materialized CTEs and must reproduce the exact merge
    sequence, counts included."""
    from .operators.bpe import bpe_train
    _, t = _s(spark, sf_dir)
    merges = bpe_train(t["documents"], num_merges=40)
    # local_df (Arrow local relation): the old createDataFrame fanned
    # the 40-row result across a 32-task Python RDD at count time —
    # 2.5s of the timed action was result transport, not training
    return local_df(spark, merges,
                    "rank int, left string, right string, n long")


# The 40-merge vocabulary bpe_train produces on the sf0.01 documents
# table (deterministic: exact counts, count-DESC/lexicographic
# tie-break) — pinned so the ENCODE operator gets a full SQL oracle:
# encoding under a given vocabulary is a pure function of (text,
# merges), so the vocabulary is an input here, exactly as in
# production where the tokenizer is trained once and shipped.
# tests/test_operators.py re-derives this list from the corpus and
# fails if it drifts.
_BPE_PINNED: list[tuple[int, str, str, int]] = [
    (0, 'e', 'r', 4568), (1, 'e', '▁', 4473), (2, 'n', '▁', 2834),
    (3, 'er', '▁', 2779), (4, 'o', 'w', 2747), (5, 'ow', '▁', 2747),
    (6, 'o', 'r', 2696), (7, 's', 't', 2676), (8, 'h', '▁', 1884),
    (9, 'a', 't', 1845), (10, 'l', 'u', 1831), (11, 'i', 'n', 1796),
    (12, 'a', '▁', 1788), (13, 'g', '▁', 1777), (14, 'y', '▁', 1767),
    (15, 'a', 'r', 1758), (16, 'p', 'ar', 1758), (17, 't', '▁', 1750),
    (18, 'i', 'n▁', 964), (19, 'j', 'o', 964), (20, 'jo', 'in▁', 964),
    (21, 'a', 's', 947), (22, 'as', 'h▁', 947), (23, 'h', 'ash▁', 947),
    (24, 'r', 'ow▁', 943), (25, 'at', 'c', 937), (26, 'atc', 'h▁', 937),
    (27, 'b', 'atch▁', 937), (28, 'a', 'n▁', 936), (29, 'c', 'an▁', 936),
    (30, 's', 'can▁', 936), (31, 'c', 'o', 934), (32, 'c', 'u', 934),
    (33, 'co', 'lu', 934), (34, 'colu', 'm', 934),
    (35, 'colum', 'n▁', 934), (36, 'cu', 'st', 934),
    (37, 'cust', 'o', 934), (38, 'custo', 'm', 934),
    (39, 'custom', 'er▁', 934),
]


def _bpe_merge_step_sql(prev: str, a: str, b: str) -> str:
    """One BPE merge pass as SQL over symbol rows (doc_id, wid, pos,
    sym), pos dense 1..n per word: flag (a,b) adjacencies, pick the
    left-to-right non-overlapping subset (gaps-and-islands: within
    each maximal run of consecutive flags, even offsets from the run
    start — exactly the greedy scan merge applies), splice the winners
    and renumber. Matches the priority encoder because a merge's
    components are always learned at strictly lower ranks, so a pass
    can never create an adjacency an EARLIER pass would have taken."""
    qa, qb = a.replace("'", "''"), b.replace("'", "''")
    return f"""
  SELECT doc_id, wid,
         row_number() OVER (PARTITION BY doc_id, wid ORDER BY pos) AS pos,
         CASE WHEN dm THEN sym || nxt ELSE sym END AS sym
  FROM (
    SELECT doc_id, wid, pos, sym, nxt, dm,
           lag(dm) OVER (PARTITION BY doc_id, wid ORDER BY pos) AS pdm
    FROM (
      SELECT doc_id, wid, pos, sym, nxt,
             coalesce(m AND (pos - min(CASE WHEN m THEN pos END)
                 OVER (PARTITION BY doc_id, wid, grp)) % 2 = 0,
               FALSE) AS dm
      FROM (
        SELECT doc_id, wid, pos, sym, nxt, m,
               pos - (CASE WHEN m THEN row_number()
                 OVER (PARTITION BY doc_id, wid, m ORDER BY pos) END)
                 AS grp
        FROM (
          SELECT doc_id, wid, pos, sym,
                 lead(sym) OVER (PARTITION BY doc_id, wid
                                 ORDER BY pos) AS nxt,
                 coalesce(sym = '{qa}' AND lead(sym)
                   OVER (PARTITION BY doc_id, wid ORDER BY pos)
                   = '{qb}', FALSE) AS m
          FROM {prev}))))
  WHERE NOT coalesce(pdm, FALSE)"""


def _bpe_encode_oracle_sql(
        merges: list[tuple[int, str, str, int]]) -> str:
    """Full SQL replay of bpe_encode under a pinned merge list: words
    (lowercased, ASCII-\\s split), chars + end-of-word sentinel as
    symbol rows, then ONE CHAINED CTE PER MERGE (the fixed-iteration
    unroll trick) applying the pass above; token count = surviving
    symbol rows per document, 0 for wordless docs via the left join."""
    ctes = ["""wz AS (
  SELECT doc_id, unnest(list_transform(
      list_filter(string_split_regex(lower(text), '\\s+'),
                  t -> t <> ''),
      (w, i) -> {'wid': i, 'w': w})) AS u
  FROM documents)""", """s0 AS (
  SELECT doc_id, wid, s.pos AS pos, s.sym AS sym FROM (
    SELECT doc_id, u.wid AS wid,
           unnest(list_transform(
             list_append(list_transform(range(1, length(u.w) + 1),
                                        i -> u.w[i]), '▁'),
             (c, i) -> {'pos': i, 'sym': c})) AS s
    FROM wz))"""]
    prev = "s0"
    for r, (_, a, b, _n) in enumerate(merges):
        ctes.append(f"s{r + 1} AS ({_bpe_merge_step_sql(prev, a, b)})")
        prev = f"s{r + 1}"
    return f"""WITH {', '.join(ctes)}
SELECT d.doc_id,
       CAST(coalesce(t.n_tokens, 0) AS BIGINT) AS n_tokens
FROM documents d LEFT JOIN (
  SELECT doc_id, count(*) AS n_tokens FROM {prev}
  GROUP BY doc_id) t
USING (doc_id)"""


@query("bpe_token_counts", _bpe_encode_oracle_sql(_BPE_PINNED))
def bpe_token_counts_q(spark, sf_dir):
    """Token counts under a learned BPE vocabulary (operators/bpe.py
    bpe_encode): the plan-native encoder (distinct words encoded once,
    counts joined back — no Python over corpus rows) under the pinned
    40-merge vocabulary ``_BPE_PINNED`` (bpe_train's deterministic
    output on the sf0.01 corpus; training itself is graded by
    bpe_merges). The oracle replays the encode merge-by-merge as 40
    chained CTEs, so a tokenizer/tie-break/overlap slip in either
    engine breaks the hash."""
    from .operators.bpe import bpe_encode
    _, t = _s(spark, sf_dir)
    return bpe_encode(t["documents"], _BPE_PINNED)


@query("gopher_rules", """
    WITH b AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'),
                         t -> t <> '') AS toks,
             list_filter(string_split(text, chr(10)),
                         l -> l <> '') AS lines
      FROM documents),
    m AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS nw,
             CAST(coalesce(list_sum(
                 list_transform(toks, t -> length(t))), 0)
                  AS BIGINT) AS total_len,
             CAST(len(list_filter(toks, t -> contains(t, '#')))
                  AS BIGINT) AS n_hash,
             CAST(len(list_filter(toks,
                 t -> regexp_matches(t, '[a-zA-Z]'))) AS BIGINT)
                 AS n_alpha,
             CAST(len(lines) AS BIGINT) AS nl,
             CAST(len(list_filter(lines, l -> suffix(l, '...')))
                  AS BIGINT) AS n_ell,
             CAST(len(list_filter(lines,
                 l -> prefix(l, '-') OR prefix(l, '*'))) AS BIGINT)
                 AS n_bullet,
             CAST(len(list_filter(
                 ['the','key','order','scan'],
                 s -> list_contains(toks, s))) AS BIGINT) AS n_stop
      FROM b)
    SELECT doc_id, nw AS n_words,
           nw >= 20 AND nw <= 100000 AS r_word_count,
           total_len >= 3 * nw AND total_len <= 10 * nw
               AS r_mean_word_len,
           10 * n_hash <= nw AS r_hash_ratio,
           10 * n_ell <= 3 * nl AS r_ellipsis_lines,
           10 * n_bullet <= 9 * nl AS r_bullet_lines,
           5 * n_alpha >= 4 * nw AS r_alpha_words,
           n_stop >= 2 AS r_stopwords,
           (nw >= 20 AND nw <= 100000)
             AND (total_len >= 3 * nw AND total_len <= 10 * nw)
             AND 10 * n_hash <= nw
             AND 10 * n_ell <= 3 * nl
             AND 10 * n_bullet <= 9 * nl
             AND 5 * n_alpha >= 4 * nw
             AND n_stop >= 2 AS passes
    FROM m
""")
def gopher_rules_q(spark, sf_dir):
    """Gopher quality-rule battery (operators/text.py gopher_rules):
    seven per-document flags + combined verdict, every ratio an
    integer cross-multiplication — a zero-shuffle codegen projection
    over the corpus. min_words=20 fits the synthetic corpus' ~25-word
    documents, and the stopword lexicon is remapped to the corpus
    vocabulary, so both verdicts actually occur (the operator default
    is the Gopher English list)."""
    from .operators.text import gopher_rules
    _, t = _s(spark, sf_dir)
    return gopher_rules(t["documents"], min_words=20,
                        stopwords=("the", "key", "order", "scan"))


_SPINE_SPARK = """
    WITH RECURSIVE spine(day) AS (
      SELECT DATE '2024-01-01'
      UNION ALL
      SELECT date_add(day, 1) FROM spine WHERE day < DATE '2024-02-15')
    SELECT s.day, CAST(coalesce(e.n, 0) AS BIGINT) AS n_events
    FROM spine s LEFT JOIN (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY CAST(ts AS DATE)) e ON e.day = s.day
"""


@query("date_spine_gapfill", """
    WITH RECURSIVE spine(day) AS (
      SELECT DATE '2024-01-01'
      UNION ALL
      SELECT day + 1 FROM spine WHERE day < DATE '2024-02-15')
    SELECT s.day, CAST(coalesce(e.n, 0) AS BIGINT) AS n_events
    FROM spine s LEFT JOIN (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY CAST(ts AS DATE)) e ON e.day = s.day
""")
def date_spine_gapfill(spark, sf_dir):
    """Recursive-CTE date spine + gap-filled daily counts (Spark 4's
    WITH RECURSIVE — part of the full SQL surface the reference lacks,
    SURVEY §2.3): generate the calendar driver-free, left-join the
    daily aggregate, zero-fill missing days. The recursion is
    bounded (46 rows) and runs once on the driver side of the plan;
    the corpus-scale work stays one partial-agg'd GROUP BY."""
    _s(spark, sf_dir)  # registers the temp views
    return spark.sql(_SPINE_SPARK)


@query("data_checks", """
    WITH w AS (
      SELECT count(*) AS n,
             count(*) FILTER (WHERE NOT (l_quantity >= 1
                                         AND l_quantity <= 50))
                 AS v_qty_range,
             count(*) FILTER (WHERE NOT (l_discount >= 0
                                         AND l_discount <= 0.1))
                 AS v_discount_range,
             count(*) FILTER (WHERE NOT (l_extendedprice > 0))
                 AS v_price_positive,
             count(*) FILTER (WHERE l_orderkey IS NULL)
                 AS v_orderkey_not_null
      FROM lineitem)
    SELECT 'qty_range' AS check,
           CAST(v_qty_range AS BIGINT) AS n_violations,
           CAST(n AS BIGINT) AS n_rows FROM w
    UNION ALL SELECT 'discount_range', CAST(v_discount_range AS BIGINT),
                     CAST(n AS BIGINT) FROM w
    UNION ALL SELECT 'price_positive',
                     CAST(v_price_positive AS BIGINT),
                     CAST(n AS BIGINT) FROM w
    UNION ALL SELECT 'orderkey_not_null',
                     CAST(v_orderkey_not_null AS BIGINT),
                     CAST(n AS BIGINT) FROM w
""")
def data_checks_q(spark, sf_dir):
    """Declarative data-quality gate (operators/checks.py data_checks):
    four expectations over lineitem evaluated in one conditional
    aggregation pass — the publish-time guardrail for snapshot
    versions. NOT-TRUE (false or null) counts as a violation."""
    from .operators.checks import data_checks
    _, t = _s(spark, sf_dir)
    li = t["lineitem"]
    return data_checks(li, {
        "qty_range": (F.col("l_quantity") >= 1)
        & (F.col("l_quantity") <= 50),
        "discount_range": (F.col("l_discount") >= 0)
        & (F.col("l_discount") <= 0.1),
        "price_positive": F.col("l_extendedprice") > 0,
        "orderkey_not_null": F.col("l_orderkey").isNotNull(),
    })


@query("range_sorted_layout", """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
""")
def range_sorted_layout_q(spark, sf_dir):
    """Total-order write layout (operators/projection.py
    write_range_sorted): range-partition + in-partition sort — the
    plan gate pins RangePartitioning with NO single-partition global
    sort; the oracle pins that layout is value-neutral (same rows)."""
    _, t = _s(spark, sf_dir)
    o = t["orders"].select("o_orderkey", "o_custkey", "o_totalprice")
    return (o.repartitionByRange(8, F.col("o_orderkey"))
            .sortWithinPartitions("o_orderkey"))


@query("mixture_sample", """
    WITH per AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(list_filter(string_split_regex(text, '\\s+'),
                                      t -> t <> ''))) AS BIGINT)
                 AS n_tokens
      FROM documents GROUP BY source),
    tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM per),
    w AS (SELECT source,
                 sqrt(CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE))
                     AS weight
          FROM per, tot),
    wt AS (SELECT CAST(sum(CAST(weight AS DECIMAL(38,18)))
                       AS DOUBLE) AS wtot FROM w),
    q AS (SELECT source,
                 floor(CAST(200 AS DOUBLE) * weight / wtot) AS quota
          FROM w, wt),
    ranked AS (
      SELECT d.doc_id, d.source, d.lang, q.quota,
             row_number() OVER (
               PARTITION BY d.source
               ORDER BY md5(concat_ws(':', d.source,
                                      CAST(d.doc_id AS VARCHAR))) ASC,
                        d.doc_id ASC) AS rn
      FROM documents d JOIN q ON q.source = d.source)
    SELECT doc_id, source, lang FROM ranked WHERE rn <= quota
""")
def mixture_sample_q(spark, sf_dir):
    """Temperature-mixed corpus materialization (operators/sampling.py
    mixture_sample): ~200 documents at temperature 0.5, per-stratum
    floor quotas from bitwise-exact sqrt weights, md5-priority pick.
    One agg + broadcast quota join + one window exchange."""
    from .operators.sampling import mixture_sample
    _, t = _s(spark, sf_dir)
    return (mixture_sample(t["documents"], "source", total=200)
            .select("doc_id", "source", "lang"))


@query("retention_cohorts", """
    WITH uw AS (
      SELECT DISTINCT user_id AS u,
             CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events),
    first AS (SELECT u, min(wk) AS cohort_wk FROM uw GROUP BY u)
    SELECT cohort_wk,
           CAST(date_diff('day', cohort_wk, wk) // 7 AS INT)
               AS weeks_since,
           CAST(count(DISTINCT u) AS BIGINT) AS n_users
    FROM uw JOIN first USING (u)
    GROUP BY cohort_wk, weeks_since
""")
def retention_cohorts_q(spark, sf_dir):
    """Weekly retention triangle (operators/timeseries.py
    retention_cohorts): cohort by first-activity ISO week, distinct
    active members per (cohort, weeks-since) cell. The per-(user,
    week) reduction happens before anything joins, so the heavy
    exchange moves user-week rows, never raw events."""
    from .operators.timeseries import retention_cohorts
    _, t = _s(spark, sf_dir)
    return retention_cohorts(t["events"])


@query("ts_pattern_search", """
    WITH b AS (
      SELECT user_id, ts, event_id, CAST(value AS DOUBLE) AS v
      FROM events),
    w AS (
      SELECT user_id, epoch_us(ts) AS ts_us,
             list(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
                 AS win
      FROM b),
    d AS (
      SELECT user_id, ts_us,
             list_reduce(list_transform(range(1, 9),
                 i -> (win[i] - ([100.0, 200.0, 300.0, 400.0, 500.0,
                                  600.0, 700.0, 800.0])[i])
                      * (win[i] - ([100.0, 200.0, 300.0, 400.0, 500.0,
                                    600.0, 700.0, 800.0])[i])),
                 (a, x) -> a + x) AS dist
      FROM w WHERE len(win) = 8)
    SELECT user_id, ts_us, dist FROM d
    ORDER BY dist, user_id, ts_us LIMIT 10
""")
def ts_pattern_search_q(spark, sf_dir):
    """Top-10 sliding windows nearest a ramp pattern
    (operators/timeseries.py ts_pattern_search): one window exchange
    builds the per-row arrays, the distance folds in codegen, the
    top-k plans as TakeOrderedAndProject. Left-fold distance order
    matches DuckDB's list_reduce bitwise (zero seed == first-element
    seed for non-negative squares)."""
    from .operators.timeseries import ts_pattern_search
    _, t = _s(spark, sf_dir)
    pattern = [100.0 * i for i in range(1, 9)]
    return ts_pattern_search(t["events"], "user_id", "ts", "value",
                             pattern, k=10, order_cols=["event_id"])


@query("key_percentiles", """
    WITH r AS (
      SELECT user_id, CAST(value AS DOUBLE) AS v,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY CAST(value AS DOUBLE),
                                         event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events)
    SELECT user_id, CAST(max(n) AS BIGINT) AS n,
           max(CASE WHEN rn = ceil(0.5 * n) THEN v END) AS p50,
           max(CASE WHEN rn = ceil(0.9 * n) THEN v END) AS p90,
           max(CASE WHEN rn = ceil(0.99 * n) THEN v END) AS p99
    FROM r GROUP BY user_id
""")
def key_percentiles_q(spark, sf_dir):
    """Exact per-key p50/p90/p99 (operators/rank.py key_percentiles):
    nearest-rank definition over one window exchange — integer-exact
    target ranks, no interpolation, no approx sketch."""
    from .operators.rank import key_percentiles
    _, t = _s(spark, sf_dir)
    return key_percentiles(t["events"], "user_id", "value",
                           order_cols=["event_id"])


@query("common_paths", """
    WITH p AS (
      SELECT user_id,
             event_type || '>' ||
             lead(event_type, 1) OVER w || '>' ||
             lead(event_type, 2) OVER w AS path
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT path, CAST(count(*) AS BIGINT) AS n
    FROM p WHERE path IS NOT NULL
    GROUP BY path ORDER BY n DESC, path LIMIT 10
""")
def common_paths_q(spark, sf_dir):
    """Top-10 three-step event paths (sequence mining's frequency
    backbone): lead windows share one user exchange, trigram counts
    partial-aggregate, top-k plans as TakeOrderedAndProject."""
    from pyspark.sql import Window as W
    _, t = _s(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    et = F.col("event_type")
    path = F.concat_ws(">", et, F.lead(et, 1).over(w),
                       F.lead(et, 2).over(w))
    # concat_ws skips NULLs, so require all three legs explicitly
    full = (F.lead(et, 1).over(w).isNotNull()
            & F.lead(et, 2).over(w).isNotNull())
    return (t["events"].select(path.alias("path"), full.alias("__ok"))
            .filter(F.col("__ok"))
            .groupBy("path").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("path")).limit(10))


@query("scd2_intervals", """
    SELECT event_id, user_id, value,
           epoch_us(ts) AS eff_from_us,
           lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id)
               AS eff_to_us,
           lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) IS NULL
               AS is_current
    FROM events
""")
def scd2_intervals_q(spark, sf_dir):
    """Type-2 SCD historization (operators/upsert.py scd2_intervals):
    the per-user value change log becomes validity intervals closed by
    the next change, open for the current row — one lead window
    exchange; feeds point-in-time lookups via asof/range join."""
    from .operators.upsert import scd2_intervals
    _, t = _s(spark, sf_dir)
    ev = t["events"].select("event_id", "user_id", "ts", "value")
    return scd2_intervals(ev, ["user_id"], "ts",
                          order_cols=["event_id"])


@query("moments_agg", f"""
    WITH s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             {_dsum_sql('value', 6)} AS s1,
             {_dsum_sql('value * value', 6)} AS s2,
             {_dsum_sql('value * value * value', 6)} AS s3,
             {_dsum_sql('value * value * value * value', 6)} AS s4
      FROM events GROUP BY event_type),
    m AS (
      SELECT event_type, n, s1 / n AS mean,
             s2 / n - (s1 / n) * (s1 / n) AS m2,
             s3 / n - 3.0 * (s1 / n) * (s2 / n)
               + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
             s4 / n - 4.0 * (s1 / n) * (s3 / n)
               + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
               - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
      FROM s)
    SELECT event_type, n, mean,
           m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2)) AS skewness,
           m4 / (m2 * m2) - 3.0 AS kurtosis
    FROM m
""")
def moments_agg_q(spark, sf_dir):
    """Exact higher moments per event type: population skewness and
    excess kurtosis derived from decimal-exact power sums (v, v2, v3,
    v4) in ONE partial-agg'd pass — identical doubles cross-engine
    because every downstream op is a pinned-order double expression.
    Complements agg_stats' mean/stddev."""
    _, t = _s(spark, sf_dir)
    v = F.col("value")
    n = F.count(F.lit(1)).cast("long")
    s1 = dsum(v, 6)
    s2 = dsum(v * v, 6)
    s3 = dsum(v * v * v, 6)
    s4 = dsum(v * v * v * v, 6)
    base = t["events"].groupBy("event_type").agg(
        n.alias("n"), s1.alias("s1"), s2.alias("s2"),
        s3.alias("s3"), s4.alias("s4"))
    nn = F.col("n")
    mean = F.col("s1") / nn
    m2 = F.col("s2") / nn - mean * mean
    m3 = (F.col("s3") / nn - F.lit(3.0) * mean * (F.col("s2") / nn)
          + F.lit(2.0) * mean * mean * mean)
    m4 = (F.col("s4") / nn - F.lit(4.0) * mean * (F.col("s3") / nn)
          + F.lit(6.0) * mean * mean * (F.col("s2") / nn)
          - F.lit(3.0) * mean * mean * mean * mean)
    return base.select(
        "event_type", "n", mean.alias("mean"),
        (m3 / (F.sqrt(m2) * F.sqrt(m2) * F.sqrt(m2)))
        .alias("skewness"),
        (m4 / (m2 * m2) - F.lit(3.0)).alias("kurtosis"))


@query("table_profile", """
    WITH w AS (
      SELECT count(*) AS n,
             count(*) FILTER (WHERE event_type IS NULL) AS nu_et,
             count(DISTINCT event_type) AS nd_et,
             count(*) FILTER (WHERE user_id IS NULL) AS nu_u,
             count(DISTINCT user_id) AS nd_u,
             count(*) FILTER (WHERE props IS NULL) AS nu_p,
             count(DISTINCT props) AS nd_p
      FROM events)
    SELECT 'event_type' AS column, CAST(n AS BIGINT) AS n_rows,
           CAST(nu_et AS BIGINT) AS n_nulls,
           CAST(nd_et AS BIGINT) AS n_distinct FROM w
    UNION ALL SELECT 'user_id', CAST(n AS BIGINT),
                     CAST(nu_u AS BIGINT), CAST(nd_u AS BIGINT) FROM w
    UNION ALL SELECT 'props', CAST(n AS BIGINT),
                     CAST(nu_p AS BIGINT), CAST(nd_p AS BIGINT) FROM w
""")
def table_profile_q(spark, sf_dir):
    """Column observability profile (operators/checks.py
    table_profile): rows/nulls/exact-distincts for three events
    columns in one multi-distinct aggregation."""
    from .operators.checks import table_profile
    _, t = _s(spark, sf_dir)
    return table_profile(t["events"],
                         ["event_type", "user_id", "props"])


@query("multimodal_frames", """
    WITH base AS (
      SELECT doc_id, text, length(text) AS L,
             greatest(1, length(text) // 64) AS n
      FROM documents),
    idx AS (
      SELECT doc_id,
             unnest(generate_series(0, CAST(n - 1 AS BIGINT), 3)) AS i
      FROM base),
    fr AS (
      SELECT b.doc_id AS id, CAST(i AS INT) AS frame_idx,
             substr(b.text, CAST(i * 64 + 1 AS INT), 64) AS f
      FROM idx JOIN base b USING (doc_id))
    SELECT id, frame_idx, CAST(length(f) AS BIGINT) AS n_bytes,
           md5(f) AS frame_md5
    FROM fr WHERE length(f) > 0
""")
def multimodal_frames(spark, sf_dir):
    """Frame-sampling plumbing (operators/multimodal.py frame_sample):
    every 3rd 64-byte 'frame' of each packed payload through the
    Arrow mapInPandas path — decode is honestly stubbed (media libs
    absent), but batching, schema, and slicing are real; the oracle
    replays the byte math and content md5 over the ascii payload."""
    from .operators.multimodal import frame_sample, pack_media
    _, t = _s(spark, sf_dir)
    m = pack_media(t["documents"].withColumn(
        "bin", F.encode("text", "utf-8")), "bin", "doc_id")
    fr = frame_sample(m, every_n=3)
    return (fr.select("id", "frame_idx",
                      F.length("frame").cast("long").alias("n_bytes"),
                      F.md5("frame").alias("frame_md5"))
            .filter(F.col("n_bytes") > 0))


def _stream_admit_oracle(threshold: float = 0.7) -> str:
    """Batch replay of the streaming admission gate: chopping the
    stream into micro-batches cannot change the result because every
    batch is checked against the STATIC corpus only."""
    return f"""
    WITH {_minhash_pairs_ctes(
        'documents', threshold=threshold,
        pair_pred='a.doc_id % 11 = 0 AND b.doc_id % 11 <> 0',
        a_name='new_id', b_name='corpus_id')}
    SELECT doc_id, lang, n_chars FROM documents
    WHERE doc_id % 11 = 0
      AND doc_id NOT IN (SELECT new_id FROM mh_pairs)
    """


@query("stream_dedup_against", _stream_admit_oracle())
def stream_dedup_against_q(spark, sf_dir):
    """Streaming near-dup admission (streaming/stream_dedup_against):
    incoming documents (doc_id % 11 = 0) stream through foreachBatch
    and are LSH-checked against the static accepted corpus — the
    corpus signature index is built once and reused per micro-batch.
    Batch-mode equivalence is the oracle (admission depends only on
    the static corpus, not the batching)."""
    import tempfile

    from .streaming import stream_dedup_against, stream_documents
    _, t = _s(spark, sf_dir)
    new = (stream_documents(spark, sf_dir)
           .filter(F.col("doc_id") % 11 == 0))
    corpus = t["documents"].filter(F.col("doc_id") % 11 != 0)
    base = tempfile.mkdtemp(prefix="bss_admit_")
    out = stream_dedup_against(new, corpus, base + "/out",
                               base + "/ckpt", threshold=0.7,
                               portable=True)
    return out.select("doc_id", "lang", "n_chars")


def _kcore_oracle(k: int = 48, iters: int = 2) -> str:
    """Unrolled replay of the synchronous k-core peel (the LPA/pagerank
    oracle pattern): exact degrees, >= k filter, endpoint semi-joins,
    per fixed round."""
    ctes = []
    prev = "e0"
    for i in range(iters):
        ctes.append(f""",
    d{i} AS (SELECT u, count(*) AS deg FROM {prev} GROUP BY u),
    a{i} AS (SELECT u FROM d{i} WHERE deg >= {k}),
    e{i + 1} AS (
      SELECT e.u, e.v FROM {prev} e
      JOIN a{i} x ON x.u = e.u
      JOIN a{i} y ON y.u = e.v)""")
        prev = f"e{i + 1}"
    return f"""
    WITH raw AS (
      SELECT DISTINCT l_suppkey AS s, o_custkey + 1000000 AS d
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
    e0 AS (SELECT s AS u, d AS v FROM raw
           UNION SELECT d, s FROM raw)
    {"".join(ctes)}
    SELECT CAST(u AS BIGINT) AS node,
           CAST(count(*) AS BIGINT) AS degree
    FROM {prev} GROUP BY u HAVING count(*) >= {k}
    """


@query("k_core", _kcore_oracle())
def k_core_q(spark, sf_dir):
    """k-core decomposition (operators/graph.py k_core) of the
    supplier-customer shipment graph at k=48 / two peel rounds (the
    sf0.01 graph genuinely peels here: 148 survivors after round 1,
    55 after round 2): exact degrees, bitwise-replayable by the
    unrolled-CTE oracle — the graph-quality filter beside
    CC/LPA/triangles."""
    from .operators.graph import k_core
    _, t = _s(spark, sf_dir)
    e = (t["lineitem"]
         .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
         .select(F.col("l_suppkey").alias("src"),
                 (F.col("o_custkey") + 1000000).alias("dst")))
    return k_core(e, k=48, iters=2)


@query("winsorize_values", """
    WITH r AS (
      SELECT user_id, event_id, CAST(value AS DOUBLE) AS v,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY CAST(value AS DOUBLE),
                                         event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events),
    e AS (
      SELECT user_id, event_id, v,
             max(CASE WHEN rn = ceil(0.05 * n) THEN v END)
                 OVER (PARTITION BY user_id) AS lo,
             max(CASE WHEN rn = ceil(0.95 * n) THEN v END)
                 OVER (PARTITION BY user_id) AS hi
      FROM r)
    SELECT user_id, event_id, v AS value,
           least(greatest(v, lo), hi) AS value_w
    FROM e
""")
def winsorize_values_q(spark, sf_dir):
    """Per-user winsorization at [p05, p95] (operators/rank.py
    winsorize): exact nearest-rank band edges computed as window
    aggregates on the same key partitioning as the rank — one
    exchange total, clamp is a projection."""
    from .operators.rank import winsorize
    _, t = _s(spark, sf_dir)
    return winsorize(t["events"], "user_id", "value", "event_id")


@query("item_jaccard", """
    WITH rel AS (
      SELECT DISTINCT o_custkey AS id, l_partkey AS tok
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    nids AS (SELECT count(DISTINCT id) AS n FROM rel),
    sz AS (SELECT id, count(*) AS sz FROM rel GROUP BY id),
    dfreq AS (SELECT tok, count(*) AS df FROM rel GROUP BY tok),
    pruned AS (
      SELECT rel.id, rel.tok FROM rel
      JOIN dfreq USING (tok), nids
      WHERE df <= floor(0.5 * n)),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
      FROM pruned a JOIN pruned b
        ON a.tok = b.tok AND a.id < b.id
      GROUP BY a.id, b.id)
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           i / CAST(sa.sz + sb.sz - i AS DOUBLE) AS jaccard
    FROM inter JOIN sz sa ON sa.id = inter.id_a
    JOIN sz sb ON sb.id = inter.id_b
    WHERE i / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.10
""")
def item_jaccard_q(spark, sf_dir):
    """Generic set-similarity self-join (operators/dedup.py
    item_jaccard_pairs): customers whose purchased-part sets overlap
    at Jaccard ≥ 0.10 — the ngram_jaccard inverted-index machinery
    over an arbitrary (id, item) relation: one-pass index with
    window-attached sizes/frequencies, df-pruning, salted hot
    posting lists."""
    from .operators.dedup import item_jaccard_pairs
    _, t = _s(spark, sf_dir)
    rel = (t["orders"]
           .join(t["lineitem"],
                 F.col("l_orderkey") == F.col("o_orderkey"))
           .select(F.col("o_custkey").cast("long").alias("cust"),
                   F.col("l_partkey").alias("part")))
    return item_jaccard_pairs(rel, "cust", "part", threshold=0.10) \
        .select(F.col("id_a"), F.col("id_b"), "jaccard")


@query("event_transitions", """
    WITH p AS (
      SELECT event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events),
    c AS (SELECT src, dst, count(*) AS n FROM p
          WHERE dst IS NOT NULL GROUP BY src, dst)
    SELECT src, dst, CAST(n AS BIGINT) AS n,
           n / CAST(sum(n) OVER (PARTITION BY src) AS DOUBLE) AS p
    FROM c
""")
def event_transitions_q(spark, sf_dir):
    """First-order Markov transition matrix of event types: per-user
    lead window (one exchange on user), pair counts, row-normalized
    probabilities via a window sum over tiny (src, dst) aggregates —
    the sequence-model summary beside common_paths' top-k trigrams.
    Exact integer counts; one division per cell."""
    from pyspark.sql import Window as W
    _, t = _s(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    p = t["events"].select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"))
    c = (p.filter(F.col("dst").isNotNull())
         .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n")))
    tot = F.sum("n").over(W.partitionBy("src"))
    return c.select("src", "dst", "n",
                    (F.col("n") / tot.cast("double")).alias("p"))


@query("asof_tolerance", """
    SELECT p.event_id AS event_id,
           CASE WHEN v.ts IS NOT NULL
                     AND epoch_us(p.ts) - epoch_us(v.ts) <= 14400000000
                THEN epoch_us(v.ts) END AS view_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts > v.ts
""")
def asof_tolerance_q(spark, sf_dir):
    """As-of join with a 4-hour tolerance (operators/asof.py
    tolerance=): a carried match farther back than the tolerance is
    rejected to NULL — pandas merge_asof semantics, implemented as a
    pure post-filter on the same one-exchange union-sort-carry plan."""
    from .operators.asof import asof_join
    _, t = _s(spark, sf_dir)
    ev = t["events"]
    p = ev.filter(F.col("event_type") == "purchase")
    v = (ev.filter(F.col("event_type") == "view")
         .select("user_id", F.unix_micros("ts").alias("view_us"),
                 F.col("ts").alias("vts")))
    out = asof_join(p, v.select("user_id", "vts", "view_us"),
                    on="user_id", left_ts="ts", right_ts="vts",
                    value_cols=["view_us"], strict=True,
                    tolerance=4 * 3600)
    return out.select("event_id", "view_us")


_LATERAL_SQL = """
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
"""


@query("lateral_topn", _LATERAL_SQL)
def lateral_topn_q(spark, sf_dir):
    """Correlated LATERAL subquery (Spark 4 SQL surface, SURVEY §2.3):
    each customer's top-2 orders by price — the per-row-driven-subquery
    shape; Catalyst decorrelates it into a ranked join rather than
    executing per-row."""
    _s(spark, sf_dir)  # registers the temp views
    return spark.sql(_LATERAL_SQL)


@query("forward_fill", """
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'purchase'
                           THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_purchase_value
    FROM events
""")
def forward_fill_q(spark, sf_dir):
    """IGNORE NULLS forward fill: the last purchase amount as-of every
    event per user (last_value over the running frame) — the
    carry-last-known-value surface the as-of join generalizes; one
    window exchange."""
    from pyspark.sql import Window as W
    _, t = _s(spark, sf_dir)
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    return t["events"].select(
        "event_id", "user_id",
        F.last(pv, ignorenulls=True).over(w)
        .alias("last_purchase_value"))


_DECODE_SQL = """
    SELECT doc_id,
      CASE WHEN doc_id % 2 = 0 THEN 1.0 ELSE 2.0 END AS f0,
      CASE WHEN doc_id % 2 = 0 THEN 8.0 ELSE 8000.0 END AS f1,
      CASE WHEN doc_id % 2 = 0 THEN 8.0 ELSE 1.0 END AS f2,
      CASE WHEN doc_id % 2 = 0 THEN 3.0 ELSE 16.0 END AS f3,
      64.0 AS f4,
      CASE WHEN doc_id % 2 = 0
           THEN CAST(list_sum(list_transform(range(0, 192, 3),
                i -> (doc_id * 7 + i) % 256)) AS BIGINT) / 64.0
           ELSE CAST(list_sum(list_transform(range(0, 64, 1),
                i -> ((doc_id * 31 + i * 17) % 65536) - 32768))
                AS BIGINT) / 64.0 END AS f5,
      CASE WHEN doc_id % 2 = 0
           THEN CAST(list_sum(list_transform(range(1, 192, 3),
                i -> (doc_id * 7 + i) % 256)) AS BIGINT) / 64.0
           ELSE 0.0 END AS f6,
      CASE WHEN doc_id % 2 = 0
           THEN CAST(list_sum(list_transform(range(2, 192, 3),
                i -> (doc_id * 7 + i) % 256)) AS BIGINT) / 64.0
           ELSE 0.0 END AS f7
    FROM documents
"""


@query("multimodal_decode", _DECODE_SQL)
def multimodal_decode_q(spark, sf_dir):
    """REAL media decode end-to-end (operators/multimodal.py
    decode_image/decode_wav, fake=False): even doc_ids become 8x8 RGB
    images — BMP when divisible by 4 (exercising the padded bottom-up
    BGR layout), PNG when ≡2 mod 8 (stdlib zlib inflate + scanline
    unfiltering, rotating through all five PNG filter types by
    doc_id), binary PPM otherwise — and odd doc_ids become 64-sample
    PCM16 WAVs, all generated from a pure doc_id formula; the decoder
    parses the container bytes back and emits exact-integer-mean
    features, which the oracle recomputes from the same formula
    WITHOUT the binary round-trip (the image descriptor is container-
    independent, so one oracle covers all three image codecs) — any
    header/stride/filter/sign slip in any codec path breaks the hash
    match. Fixture generation is a bounded-width pandas UDF (8x8x3 +
    header bytes per row); decode itself is the production mapInPandas
    path."""
    import pandas as pd
    from .operators.multimodal import (extract_features, make_bmp,
                                       make_png, make_ppm, make_wav,
                                       pack_media)
    _, t = _s(spark, sf_dir)

    def gen(batches):
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 2 == 0:
                    px = bytes((d * 7 + i) % 256 for i in range(192))
                    if d % 4 == 0:
                        blob = make_bmp(8, 8, px)
                    elif d % 8 == 2:
                        blob = make_png(8, 8, px,
                                        filter_type=(d // 8) % 5)
                    else:
                        blob = make_ppm(8, 8, px)
                else:
                    blob = make_wav(8000, [
                        ((d * 31 + i * 17) % 65536) - 32768
                        for i in range(64)])
                rows.append((d, blob))
            yield pd.DataFrame(rows, columns=["doc_id", "media"])

    media = t["documents"].select("doc_id").mapInPandas(
        gen, schema="doc_id long, media binary")
    out = extract_features(pack_media(media, "media", "doc_id"),
                           fake=False)
    return out.select(
        F.col("id").alias("doc_id"),
        *[F.col("feat")[j].alias(f"f{j}") for j in range(8)])


_JPEG_SQL = """
    WITH base AS (
      SELECT doc_id,
             (3 * doc_id) % 256 AS r0, (5 * doc_id) % 256 AS g0,
             (7 * doc_id) % 256 AS b0,
             1 + doc_id % 4 AS nx, 1 + (doc_id // 2) % 2 AS ny
      FROM documents
    ), ycc AS (
      SELECT *,
        FLOOR(0.299e0 * r0 + 0.587e0 * g0 + 0.114e0 * b0 + 0.5e0) AS y,
        FLOOR(128e0 - 0.168736e0 * r0 - 0.331264e0 * g0 + 0.5e0 * b0
              + 0.5e0) AS cb,
        FLOOR(128e0 + 0.5e0 * r0 - 0.418688e0 * g0 - 0.081312e0 * b0
              + 0.5e0) AS cr
      FROM base
    ), rgb AS (
      SELECT *,
        LEAST(255e0, GREATEST(0e0,
            FLOOR(y + 1.402e0 * (cr - 128e0) + 0.5e0))) AS r2,
        LEAST(255e0, GREATEST(0e0,
            FLOOR(y - 0.344136e0 * (cb - 128e0)
                  - 0.714136e0 * (cr - 128e0) + 0.5e0))) AS g2,
        LEAST(255e0, GREATEST(0e0,
            FLOOR(y + 1.772e0 * (cb - 128e0) + 0.5e0))) AS b2
      FROM ycc
    )
    SELECT doc_id,
      CAST(CASE WHEN doc_id % 2 = 0 THEN 8 * nx ELSE 16 END AS INT)
        AS width,
      CAST(CASE WHEN doc_id % 2 = 0 THEN 8 * ny ELSE 16 END AS INT)
        AS height,
      CASE WHEN doc_id % 2 = 0
           THEN CAST(64 * list_sum(list_transform(range(0, nx * ny),
                    b -> (3 * doc_id + 41 * b) % 256)) AS BIGINT)
                / CAST(64 * nx * ny AS BIGINT)
           ELSE r2 END AS mean_r,
      CAST(CASE WHEN doc_id % 2 = 0
           THEN list_sum(list_transform(range(0, nx * ny),
                    b -> (b + 1) * ((3 * doc_id + 41 * b) % 256)))
           ELSE CAST(r2 AS BIGINT) + 1000 * CAST(g2 AS BIGINT)
                + 1000000 * CAST(b2 AS BIGINT) END AS BIGINT) AS checksum,
      TRUE AS uniform
    FROM rgb
"""


@query("multimodal_jpeg", _JPEG_SQL)
def multimodal_jpeg_q(spark, sf_dir):
    """JPEG decode end-to-end (operators/jpeg.py make_jpeg /
    decode_jpeg via the production decode_image dispatch): even
    doc_ids become block-constant GRAYSCALE JPEGs (1-4 blocks wide,
    1-2 high; restart markers every 2 MCUs when doc_id%4==2;
    PROGRESSIVE SOF2 when doc_id%8==4) whose quality-100 round-trip
    is bit-exact by construction — constant 8x8 blocks quantize
    losslessly through all-ones tables, and progressive re-encodes
    the identical coefficients; odd doc_ids become constant-COLOR
    16x16 JPEGs alternating 4:2:0 and 4:4:4 chroma subsampling
    (PROGRESSIVE when doc_id%8>=5), exact through the JFIF
    floor(x+.5) color round-trip the oracle recomputes in SQL
    (0.299e0-style literals force DOUBLE so both engines run the
    identical IEEE expression). `checksum` pins every decoded block value to its
    raster POSITION (a block-order or DC-predictor bug breaks it),
    `uniform` pins per-pixel constancy (any Huffman/dequant/IDCT/
    restart slip makes some block non-constant), and mean_r is the
    exact integer-sum mean. Fixture generation is bounded (<=1 KiB
    per row) inside the same Arrow batch as the decode."""
    import numpy as np
    import pandas as pd
    from .operators.jpeg import make_jpeg
    from .operators.multimodal import decode_image
    _, t = _s(spark, sf_dir)

    def gen(batches):
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 2 == 0:
                    nx, ny = 1 + d % 4, 1 + (d // 2) % 2
                    a = np.zeros((ny * 8, nx * 8), np.uint8)
                    for b in range(nx * ny):
                        r, c = divmod(b, nx)
                        a[r * 8:(r + 1) * 8, c * 8:(c + 1) * 8] = \
                            (3 * d + 41 * b) % 256
                    px = np.repeat(a[:, :, None], 3, axis=2).tobytes()
                    # d%8==4: PROGRESSIVE grayscale (multi-block: DC
                    # refine + AC band scans over real block rasters);
                    # d%4==2: restart markers (baseline only)
                    blob = make_jpeg(
                        nx * 8, ny * 8, px, quality=100, grayscale=True,
                        restart_interval=2 if d % 4 == 2 else 0,
                        progressive=(d % 8 == 4))
                else:
                    px = bytes(((3 * d) % 256, (5 * d) % 256,
                                (7 * d) % 256)) * 256
                    # d%8>=5: PROGRESSIVE color (interleaved DC scan +
                    # per-component AC scans, subsampled chroma grids)
                    blob = make_jpeg(
                        16, 16, px, quality=100,
                        subsampling="4:2:0" if d % 4 == 1 else "4:4:4",
                        progressive=(d % 8 >= 5))
                w, h, out = decode_image(blob)
                arr = np.frombuffer(out, np.uint8).reshape(h, w, 3)
                red = arr[:, :, 0].astype(np.int64)
                mean_r = int(red.sum()) / (w * h)
                if d % 2 == 0:
                    blks = (red.reshape(h // 8, 8, w // 8, 8)
                            .transpose(0, 2, 1, 3).reshape(-1, 64))
                    uniform = bool(
                        (arr[:, :, 0] == arr[:, :, 1]).all()
                        and (arr[:, :, 0] == arr[:, :, 2]).all()
                        and (blks.min(1) == blks.max(1)).all())
                    checksum = int(((np.arange(len(blks)) + 1)
                                    * blks[:, 0]).sum())
                else:
                    uniform = bool((arr == arr[0, 0]).all())
                    checksum = (int(arr[0, 0, 0])
                                + 1000 * int(arr[0, 0, 1])
                                + 1000000 * int(arr[0, 0, 2]))
                rows.append((d, w, h, mean_r, checksum, uniform))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "mean_r", "checksum",
                "uniform"])

    return t["documents"].select("doc_id").mapInPandas(
        gen, schema="doc_id long, width int, height int, mean_r double, "
                    "checksum long, uniform boolean")


@query("ewma_hub", """
    WITH ranked AS (
      SELECT user_id, CAST(value AS DOUBLE) AS v,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events)
    SELECT user_id, CAST(max(n) AS BIGINT) AS n_events,
           CAST(sum(CAST(
             CASE WHEN rn = n
                  THEN v * power(0.5e0, CAST(n - 1 AS DOUBLE))
                  ELSE 0.5e0 * v * power(0.5e0, CAST(rn - 1 AS DOUBLE))
             END AS DECIMAL(38,18))) AS DOUBLE) AS ewma
    FROM ranked GROUP BY user_id
""")
def ewma_hub_q(spark, sf_dir):
    """Hub-key-safe EWMA (operators/timeseries.py ewma_last
    method="distributed", VERDICT r7 task 5): the sequential
    recurrence collapsed to a closed-form weighted sum — rank each
    event from the END of its key's history (one window exchange),
    weight by (1-α)^rank, sum through DECIMAL(38,18). NO collect_list,
    no per-key array, no per-key Python: a 10⁸-event key costs two
    running window columns and a partial-aggregable sum (plan-gated in
    tests/test_plans.py). α is pinned to 0.5 here so every weight
    power(0.5, k) = 2^-k is EXACTLY representable and both engines'
    pow must return it (verified exact 0..300 on both) — each term is
    then one correctly-rounded multiply chain, identical IEEE doubles
    on both sides, and the decimal sum is order-independent."""
    from .operators.timeseries import ewma_last
    _, t = _s(spark, sf_dir)
    return ewma_last(t["events"], "user_id", "ts", "value",
                     order_cols=["event_id"], alpha=0.5,
                     method="distributed")


@query("op_fold_stream_segmented", """
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
           CAST(max(l_extendedprice) AS DOUBLE) AS max_price
    FROM lineitem GROUP BY l_returnflag
""")
def op_fold_stream_segmented(spark, sf_dir):
    """Segmented streaming Fold (Slice.fold_stream segment_col= +
    merge=, VERDICT r7 task 5 generalized beyond EWMA): stage 1
    stream-folds each (key, ship-month) slice of the group in its own
    task — a hub key's events no longer serialize through ONE task's
    scan — stage 2 merges the pickled per-segment accumulators per key
    in segment order (rows per key = #segments, bounded regardless of
    event count). The accumulator here is (count, qty-sum, max-price):
    count/sum merge commutatively, max is order-safe, and qty is
    integer-valued so the float partials are exact — the oracle is the
    plain one-shot aggregation the two-stage fold must reproduce."""
    sess, t = _s(spark, sf_dir)
    sl = sess.wrap(t["lineitem"].select(
        "l_returnflag",
        F.date_trunc("month", "l_shipdate").alias("ship_month"),
        "l_quantity", "l_extendedprice"))

    def init():
        return [0, 0, None]

    def step(acc, chunk):
        acc[0] += len(chunk)
        acc[1] += int(chunk["l_quantity"].sum())
        mx = float(chunk["l_extendedprice"].max())
        acc[2] = mx if acc[2] is None else max(acc[2], mx)
        return acc

    def merge(a, b):
        return [a[0] + b[0], a[1] + b[1],
                b[2] if a[2] is None else
                a[2] if b[2] is None else max(a[2], b[2])]

    def emit(key, acc):
        return {"l_returnflag": key[0], "n": acc[0], "qty": acc[1],
                "max_price": acc[2]}

    return sl.fold_stream(
        init, step, emit,
        "l_returnflag string, n long, qty long, max_price double",
        segment_col="ship_month", merge=merge).df


_GIF_SQL = """
    WITH f AS (
      SELECT doc_id, 1 + doc_id % 3 AS nf FROM documents),
    sums AS (
      SELECT doc_id, nf,
        list_transform(range(0, nf), fi ->
          list_sum(list_transform(range(0, 128), p ->
            (17 * doc_id + 11 * ((doc_id + fi + 2 * (p // 16)
                                  + p % 16) % 4)) % 256))) AS rsum,
        list_transform(range(0, nf), fi ->
          list_sum(list_transform(range(0, 128), p ->
            (p + 1) * ((17 * doc_id + 11 * ((doc_id + fi
                + 2 * (p // 16) + p % 16) % 4)) % 256)))) AS psum
      FROM f)
    SELECT doc_id, 16 AS width, 8 AS height,
           CAST(nf AS INT) AS n_frames,
           CAST(list_sum(rsum) AS BIGINT)
             / CAST(128 * nf AS BIGINT) AS mean_r,
           CAST(list_sum(list_transform(range(0, nf),
                fi -> (fi + 1) * psum[fi + 1])) AS BIGINT) AS checksum
    FROM sums
"""


@query("multimodal_gif", _GIF_SQL)
def multimodal_gif_q(spark, sf_dir):
    """Animated-GIF decode end-to-end (operators/gif.py make_gif /
    decode_gif_frames via the production multimodal path): each doc_id
    becomes a 16x8 GIF of 1-3 frames over a 4-color doc_id-derived
    palette (interlaced when doc_id is even), all from pure integer
    formulas. GIF is LOSSLESS, so the decoded red channel equals the
    formula EXACTLY; `checksum` pins every pixel of every frame to its
    raster-and-frame POSITION (Σ_f (f+1)·Σ_p (p+1)·red — any LZW,
    palette, interlace-reorder, or frame-order slip breaks it), and
    mean_r is the exact integer-sum mean over all frames. Exercises
    LZW variable-width coding, the four-pass interlace, multi-frame
    composition, and the NETSCAPE looping extension skip."""
    import numpy as np
    import pandas as pd
    from .operators.gif import decode_gif_frames, make_gif
    _, t = _s(spark, sf_dir)

    def gen(batches):
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                nf = 1 + d % 3
                lut = np.array(
                    [[(17 * d + 11 * j) % 256, (23 * d + 5 * j) % 256,
                      (29 * d + 7 * j) % 256] for j in range(4)],
                    np.uint8)
                frames = []
                for fi in range(nf):
                    r = np.arange(8)[:, None]
                    c = np.arange(16)[None, :]
                    a = (d + fi + 2 * r + c) % 4
                    frames.append(lut[a].tobytes())
                blob = make_gif(16, 8, frames,
                                interlace=(d % 2 == 0))
                w, h, dec = decode_gif_frames(blob)
                reds = [np.frombuffer(fr, np.uint8)[0::3].astype(np.int64)
                        for fr in dec]
                total = sum(int(rr.sum()) for rr in reds)
                mean_r = total / (w * h * len(dec))
                checksum = sum(
                    (fi + 1) * int(((np.arange(w * h) + 1) * rr).sum())
                    for fi, rr in enumerate(reds))
                rows.append((d, w, h, len(dec), mean_r, checksum))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "n_frames", "mean_r",
                "checksum"])

    return t["documents"].select("doc_id").mapInPandas(
        gen, schema="doc_id long, width int, height int, "
                    "n_frames int, mean_r double, checksum long")


_URL_SQL = """
    WITH b AS (
      SELECT doc_id, doc_id % 100 AS dd,
             (doc_id % 100) % 23 AS k, (doc_id % 100) % 50 AS x
      FROM documents)
    SELECT doc_id,
      (CASE WHEN dd % 2 = 0 THEN 'https' ELSE 'http' END)
      || '://'
      || (CASE WHEN dd % 3 = 0 THEN 'www.site' || k || '.co.uk'
               WHEN dd % 3 = 1 THEN 'www.site' || k || '.com'
               ELSE 'site' || k || '.de' END)
      || (CASE WHEN dd % 4 = 1 THEN ':443'
               WHEN dd % 4 = 2 THEN ':8080' ELSE '' END)
      || (CASE WHEN dd % 5 = 0 THEN '/' ELSE '/p/q' || x END)
      || (CASE WHEN dd % 5 IN (0, 1) THEN '?x=' || x ELSE '' END)
        AS url_norm,
      CASE WHEN dd % 3 = 0 THEN 'site' || k || '.co.uk'
           WHEN dd % 3 = 1 THEN 'site' || k || '.com'
           ELSE 'site' || k || '.de' END AS domain,
      doc_id % 100 = doc_id AS keep
    FROM b
"""


@query("url_normalize", _URL_SQL)
def url_normalize_q(spark, sf_dir):
    """URL canonicalization + URL-level dedup verdicts (operators/
    web.py url_normalize / registrable_domain / url_dedup_keys — the
    standard web-corpus pre-dedup stage): each doc_id derives a messy
    URL (mixed-case scheme and host, default and non-default ports,
    empty paths, tracking parameters among real ones, fragments) with
    doc_ids ≡ mod 100 sharing a page, and the REAL operator chain
    must produce exactly the canonical form, registrable domain
    (co.uk-style second-level handling included), and lowest-id keep
    flag the oracle recomputes from the generating formula. Any slip
    in scheme/host lowering, default-port logic, tracking-param
    filtering, fragment dropping, or the md5-keyed dedup breaks the
    hash match. Zero-shuffle projection + one 16-byte-hash window."""
    from .operators.web import url_dedup_keys
    _, t = _s(spark, sf_dir)
    dd = F.col("doc_id") % 100
    k = (dd % 23).cast("string")
    x = (dd % 50).cast("string")
    scheme = F.when(dd % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("HtTp"))
    host = (F.when(dd % 3 == 0,
                   F.concat(F.lit("WWW.Site"), k, F.lit(".CO.UK")))
            .when(dd % 3 == 1,
                  F.concat(F.lit("www.site"), k, F.lit(".com")))
            .otherwise(F.concat(F.lit("Site"), k, F.lit(".DE"))))
    port = (F.when(dd % 4 <= 1, F.lit(":443"))
            .when(dd % 4 == 2, F.lit(":8080")).otherwise(F.lit("")))
    path = (F.when(dd % 5 == 0, F.lit(""))
            .otherwise(F.concat(F.lit("/p/q"), x)))
    qry = (F.when(dd % 5 == 0,
                  F.concat(F.lit("?utm_source=a&x="), x,
                           F.lit("&gclid=b")))
           .when(dd % 5 == 1, F.concat(F.lit("?x="), x))
           .when(dd % 5 == 2, F.lit("?utm_campaign=z"))
           .otherwise(F.lit("")))
    frag = F.when(dd % 7 == 0, F.lit("#top")).otherwise(F.lit(""))
    docs = t["documents"].select(
        "doc_id",
        F.concat(scheme, F.lit("://"), host, port, path, qry, frag)
        .alias("url"))
    return url_dedup_keys(docs).select("doc_id", "url_norm", "domain",
                                       "keep")


_MP4_SQL = """
    WITH base AS (
      SELECT doc_id,
             1 + doc_id % 4 AS nv, 1 + doc_id % 3 AS na,
             16 + doc_id % 64 AS width, 16 + doc_id % 48 AS height
      FROM documents
    )
    SELECT doc_id, 'isom' AS brand, 2 AS n_tracks,
      'mp4v' AS v_codec,
      CAST(width AS INT) AS width, CAST(height AS INT) AS height,
      CAST(nv AS INT) AS v_samples,
      CAST(list_sum(list_transform(range(0, nv),
          i -> length(concat(doc_id, ':', i, ';'))
               * (1 + (doc_id + i) % 5))) AS BIGINT) AS v_bytes,
      md5(array_to_string(list_transform(range(0, nv),
          i -> repeat(concat(doc_id, ':', i, ';'),
                      1 + (doc_id + i) % 5)), '')) AS v_md5,
      CAST(na AS INT) AS a_samples,
      CAST(list_sum(list_transform(range(0, na),
          i -> length(concat('a', doc_id, '.', i, ';'))
               * (1 + i % 2))) AS BIGINT) AS a_bytes,
      CAST(GREATEST(nv * 40, (na * 1024 * 1000) // 48000) AS BIGINT)
        AS duration_ms
    FROM base
"""


@query("multimodal_mp4", _MP4_SQL)
def multimodal_mp4_q(spark, sf_dir):
    """ISO BMFF container parse + demux end-to-end (operators/mp4.py
    make_mp4 / mp4_meta / mp4_demux): each doc becomes a two-track
    MP4 (video 'mp4v' with 1-4 samples, audio 'mp4a' at 48 kHz with
    1-3 samples; per-sample payload bytes derived from doc_id so the
    oracle can regenerate them in SQL). mp4_meta proves the box-tree
    walk (tkhd 16.16 dims, mdhd timescales, stsd codec, stsz/stsc/
    stco sample join) and mp4_demux proves byte-exact sample slicing:
    v_md5 is Spark-side F.md5 over the demuxed video payloads
    re-concatenated IN SAMPLE ORDER, which DuckDB recomputes from
    first principles with repeat()+md5(). A wrong offset, a swapped
    chunk, or an off-by-one sample size breaks the hash. Codec decode
    of the payloads is out of scope by contract (needs codec libs;
    multimodal.extract_features raises honestly) — container work IS
    the Spark-side job at scale; sample payloads go to decoder
    services. All other columns are exact integers."""
    import pandas as pd
    from .operators.mp4 import TrackSpec, make_mp4, mp4_demux, mp4_meta
    _, t = _s(spark, sf_dir)

    def gen(batches):
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                v = TrackSpec(
                    handler="vide", codec="mp4v",
                    samples=[f"{d}:{i};".encode() * (1 + (d + i) % 5)
                             for i in range(1 + d % 4)],
                    width=16 + d % 64, height=16 + d % 48,
                    timescale=1000, sample_delta=40)
                a = TrackSpec(
                    handler="soun", codec="mp4a",
                    samples=[f"a{d}.{i};".encode() * (1 + i % 2)
                             for i in range(1 + d % 3)],
                    timescale=48000, sample_delta=1024)
                rows.append((d, bytearray(make_mp4([v, a]))))
            yield pd.DataFrame(rows, columns=["doc_id", "media"])

    media = t["documents"].select("doc_id").mapInPandas(
        gen, schema="doc_id long, media binary")
    meta = mp4_meta(media, id_col="doc_id", payload_col="media")
    # pivot the two per-track rows into one row per doc
    per_doc = meta.groupBy("id").agg(
        F.first("brand").alias("brand"),
        F.count("*").cast("int").alias("n_tracks"),
        F.first("duration_ms").alias("duration_ms"),
        F.max(F.when(F.col("handler") == "vide",
                     F.col("codec"))).alias("v_codec"),
        F.max(F.when(F.col("handler") == "vide",
                     F.col("width"))).alias("width"),
        F.max(F.when(F.col("handler") == "vide",
                     F.col("height"))).alias("height"),
        F.max(F.when(F.col("handler") == "vide",
                     F.col("sample_count"))).alias("v_samples"),
        F.max(F.when(F.col("handler") == "vide",
                     F.col("sample_bytes"))).alias("v_bytes"),
        F.max(F.when(F.col("handler") == "soun",
                     F.col("sample_count"))).alias("a_samples"),
        F.max(F.when(F.col("handler") == "soun",
                     F.col("sample_bytes"))).alias("a_bytes"))
    # demuxed video samples, re-concatenated in sample order JVM-side:
    # collect_list(struct) -> array_sort (sorts by sample_idx, the
    # struct's first field) -> binary fold -> md5
    sam = mp4_demux(media, id_col="doc_id", payload_col="media",
                    handler="vide")
    vmd5 = sam.groupBy("id").agg(
        F.md5(F.aggregate(
            F.array_sort(F.collect_list(
                F.struct("sample_idx", "sample"))),
            F.lit(b""),
            lambda acc, x: F.concat(acc, x["sample"]))).alias("v_md5"))
    return (per_doc.join(vmd5, "id")
            .select(F.col("id").alias("doc_id"), "brand", "n_tracks",
                    "v_codec", "width", "height", "v_samples",
                    "v_bytes", "v_md5", "a_samples", "a_bytes",
                    "duration_ms"))


@query("source_warc", """
    SELECT doc_id, 'response' AS warc_type,
           200 AS http_status,
           'text/plain; charset=utf-8' AS http_content_type,
           text, CAST(strlen(text) AS BIGINT) AS n_bytes
    FROM documents
""")
def source_warc_q(spark, sf_dir):
    """WARC source/sink round-trip (sources/warc.py — the Common
    Crawl ingest shape): every document becomes an HTTP 'response'
    record (status line + Content-Type/Content-Length head + utf-8
    body, assembled JVM-side with encode/concat), warc_sink writes
    one per-record-gzip .warc.gz per partition, warc_reader parses
    the framing back and splits the HTTP head off the payload. The
    oracle checks losslessness against the parquet original —
    doc_id recovered from WARC-Target-URI, text from the response
    BODY (so a framing slip, a Content-Length off-by-one, or a head/
    body split bug surfaces as a text/byte-count mismatch). The sink
    summary is one row per partition (metadata-scale collect)."""
    import tempfile

    from .sources.warc import warc_reader, warc_sink
    _, t = _s(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="bss_warc_")
    body = F.encode(F.col("text"), "UTF-8")
    head = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/plain; "
              "charset=utf-8\r\nContent-Length: "),
        F.octet_length(body).cast("string"), F.lit("\r\n\r\n"))
    docs = t["documents"].select(
        F.concat(F.lit("https://corpus.test/doc/"),
                 F.col("doc_id").cast("string")).alias("target_uri"),
        F.concat(F.encode(head, "UTF-8"), body).alias("payload"))
    warc_sink(docs, d, warc_type="response",
              content_type="application/http; msgtype=response") \
        .collect()                       # one row per partition
    back = warc_reader(spark, d, glob="*.warc.gz")
    return back.select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
        .cast("long").alias("doc_id"),
        "warc_type", "http_status", "http_content_type",
        F.decode(F.col("payload"), "UTF-8").alias("text"),
        F.octet_length("payload").cast("long").alias("n_bytes"))


@query("html_extract", """
    SELECT doc_id,
           'Doc ' || doc_id AS title,
           'Doc ' || doc_id || chr(10) || text || chr(10)
               || '& <tag> ' || chr(233) AS main_text,
           2 AS n_links, 4 AS n_blocks,
           CAST(length('Doc ' || doc_id) + length(text) + 24
                AS BIGINT) AS text_len
    FROM documents
""")
def html_extract_q(spark, sf_dir):
    """HTML -> text extraction (operators/html.py): each document is
    wrapped JVM-side into a full page — head with <title> and a
    <script> that must NOT leak into the text, an <h1>, the document
    body in a <p>, a constant entity block (&amp;/&lt;/&#233; prove
    entity decoding), a nav <div> of links, and an HTML comment.
    html_extract parses it back: `title` from the head, `main_text`
    with the nav dropped by link density ('Home | About' is 9/12
    anchor chars > 0.5) while `text_len` measures the FULL text
    including it (so both the keep and drop paths are pinned), plus
    exact link/block counts. The oracle reassembles the expected
    extraction from the parquet original (document text is
    single-spaced ASCII, so whitespace collapse is identity and the
    body round-trips exactly)."""
    from .operators.html import html_extract
    _, t = _s(spark, sf_dir)
    ids = F.col("doc_id").cast("string")
    page = F.concat(
        F.lit("<html><head><title>Doc "), ids,
        F.lit("</title><script>var t='<p>leak</p>';</script></head>"
              "<body><h1>Doc "), ids,
        F.lit("</h1><p>"), F.col("text"),
        F.lit("</p><p>&amp; &lt;tag&gt; &#233;</p>"
              "<div><a href='/'>Home</a> | <a href='/a'>About</a>"
              "</div><!-- <p>ignored</p> --></body></html>"))
    docs = t["documents"].select("doc_id", page.alias("html"))
    out = html_extract(docs)
    return out.select(
        "doc_id", "title", "main_text", "n_links", "n_blocks",
        F.length("text").cast("long").alias("text_len"))


@query("web_pipeline", """
    SELECT doc_id, 'corpus.test' AS domain,
           'Doc ' || doc_id AS title,
           CAST(array_length(str_split(text, ' ')) + 5 AS INT)
               AS n_tokens,
           CAST(CASE WHEN doc_id % 10 = 0 THEN 2 ELSE 1 END AS BIGINT)
               AS dup_count,
           md5('Doc ' || doc_id || chr(10) || text || chr(10)
               || '& <tag> ' || chr(233)) AS body_md5
    FROM documents
""")
def web_pipeline_q(spark, sf_dir):
    """The end-to-end web-corpus ingest chain, every stage the real
    operator: documents are rendered as full HTML pages inside HTTP
    responses, written as per-record-gzip WARC by warc_sink (docs
    with doc_id%10==0 are crawled TWICE — the duplicate the pipeline
    must collapse), read back by warc_reader (HTTP head split),
    extracted by html_extract (script/comment dropped, entities
    decoded, nav removed by link density), URI reduced to its
    registrable domain (operators/web.py), token-counted, and
    exact-deduped on the main text's md5 (operators/dedup.py
    exact_dedup: digest-keyed groupBy — 100 TB of text shuffles as
    16-byte hashes). Survivor = min doc_id per digest; dup_count
    proves the duplicated crawls collapsed. The oracle reassembles
    every stage's contribution from the parquet originals."""
    import tempfile

    from .operators.dedup import exact_dedup
    from .operators.html import html_extract
    from .operators.web import registrable_domain
    from .sources.warc import warc_reader, warc_sink
    _, t = _s(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="bss_webpipe_")

    ids = F.col("doc_id").cast("string")
    page = F.concat(
        F.lit("<html><head><title>Doc "), ids,
        F.lit("</title><script>var t='<p>leak</p>';</script></head>"
              "<body><h1>Doc "), ids,
        F.lit("</h1><p>"), F.col("text"),
        F.lit("</p><p>&amp; &lt;tag&gt; &#233;</p>"
              "<div><a href='/'>Home</a> | <a href='/a'>About</a>"
              "</div><!-- <p>ignored</p> --></body></html>"))
    docs = t["documents"].select("doc_id", page.alias("html"))
    crawl = docs.unionAll(docs.where(F.col("doc_id") % 10 == 0))
    body = F.encode(F.col("html"), "UTF-8")
    head = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; "
              "charset=utf-8\r\nContent-Length: "),
        F.octet_length(body).cast("string"), F.lit("\r\n\r\n"))
    # num_files: the recrawl union otherwise yields skewed sink
    # partitions (full-corpus branch + 10% dup branch -> 10x file-size
    # spread) and the file count caps read parallelism (README §6);
    # one balanced file per core fixes both (sf1 stage profile:
    # PERFORMANCE.md r11 §web_pipeline)
    warc_sink(
        crawl.select(
            F.concat(F.lit("https://corpus.test/doc/"),
                     F.col("doc_id").cast("string")).alias("target_uri"),
            F.concat(F.encode(head, "UTF-8"), body).alias("payload")),
        d, warc_type="response",
        content_type="application/http; msgtype=response",
        num_files=spark.sparkContext.defaultParallelism).collect()

    recs = warc_reader(spark, d, glob="*.warc.gz").select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
        .cast("long").alias("doc_id"),
        F.parse_url(F.col("target_uri"), F.lit("HOST")).alias("host"),
        F.decode(F.col("payload"), "UTF-8").alias("html"))
    ext = html_extract(recs.select("doc_id", "html")) \
        .join(recs.select("doc_id", "host").dropDuplicates(["doc_id"]),
              "doc_id")
    enriched = ext.select(
        "doc_id", "title",
        registrable_domain("host").alias("domain"),
        F.col("main_text"),
        F.size(F.split("main_text", r"\s+")).alias("n_tokens"),
        F.md5(F.encode(F.col("main_text"), "UTF-8")).alias("body_md5"))
    kept = exact_dedup(enriched, text_col="main_text",
                       id_col="doc_id") \
        .withColumnRenamed("n_copies", "dup_count")
    return (kept.join(enriched.dropDuplicates(["doc_id"]), "doc_id")
            .select("doc_id", "domain", "title", "n_tokens",
                    "dup_count", "body_md5"))


_DUP_SPAN_CORPUS_SQL = r"""
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN text || ' the quick brown fox jumps over the lazy'
                   || ' dog again and again'
              ELSE text END AS text
  FROM documents),
tk AS (SELECT doc_id,
              list_filter(string_split_regex(text, '\s+'),
                          t -> t <> '') AS t
       FROM corpus),
pos AS (SELECT doc_id, len(t) AS n, t,
               unnest(generate_series(1, len(t))) AS p
        FROM tk WHERE len(t) > 0),
starts AS (SELECT doc_id, p, array_to_string(t[p:p+7], ' ') AS wt
           FROM pos WHERE p <= n - 7),
dupw AS (SELECT wt FROM starts GROUP BY wt HAVING count(*) >= 2),
flags AS (SELECT doc_id, p, 1 AS is_dup FROM starts
          WHERE wt IN (SELECT wt FROM dupw)),
ann AS (SELECT pos.doc_id, pos.p, pos.n, pos.t[pos.p] AS tok,
               COALESCE(f.is_dup, 0) AS is_dup
        FROM pos LEFT JOIN flags f
          ON f.doc_id = pos.doc_id AND f.p = pos.p),
cov AS (SELECT doc_id, p, n, tok, is_dup,
               MAX(is_dup) OVER (PARTITION BY doc_id ORDER BY p
                   RANGE BETWEEN 7 PRECEDING AND CURRENT ROW) AS covered
        FROM ann)
"""


def _dup_span_corpus(spark, sf_dir):
    """documents with a 12-token boilerplate suffix injected on every
    doc_id % 5 == 0 row — guaranteed cross-document repeated spans on
    top of whatever organic duplicates the corpus already has."""
    _, t = _s(spark, sf_dir)
    return t["documents"].select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.col("text"),
                        F.lit(" the quick brown fox jumps over the "
                              "lazy dog again and again")))
        .otherwise(F.col("text")).alias("text"))


@query("dup_spans", _DUP_SPAN_CORPUS_SQL + """,
isl AS (SELECT doc_id, p, n, is_dup, covered,
               CASE WHEN covered = 1 AND COALESCE(LAG(covered) OVER
                    (PARTITION BY doc_id ORDER BY p), 0) = 0
                    THEN 1 ELSE 0 END AS ss
        FROM cov)
SELECT doc_id,
       CAST(MAX(n) AS BIGINT) AS n_tokens,
       CAST(SUM(is_dup) AS BIGINT) AS n_dup_windows,
       CAST(SUM(covered) AS BIGINT) AS dup_tokens,
       CAST(SUM(ss) AS BIGINT) AS n_dup_spans,
       CAST(SUM(covered) AS DOUBLE) / CAST(MAX(n) AS DOUBLE) AS dup_frac
FROM isl GROUP BY doc_id
""")
def dup_spans_q(spark, sf_dir):
    """Substring-level duplicate detection (operators/spans.py — the
    distributed reformulation of Lee et al.'s ExactSubstr dedup): the
    repeated spans of each document, found as the union of 8-token
    windows occurring >= 2 times corpus-wide. The corpus is documents
    with a known 12-token boilerplate injected on doc_id % 5 == 0 rows
    (guaranteed cross-doc repeats); the testdata's organic full-doc
    duplicates light up too. The oracle replays the whole algorithm in
    SQL — windowing, corpus-wide counts, range-frame coverage, island
    merge — grouping windows by text where Spark groups by xxhash64
    (identical counts; the output exposes no hash). Scale shape: after
    tokenization only 8-16 byte rows shuffle; window counts are
    map-side combined so hot boilerplate never lands on one task."""
    from .operators.spans import dup_span_report
    return dup_span_report(_dup_span_corpus(spark, sf_dir), w=8)


@query("strip_dup_spans", _DUP_SPAN_CORPUS_SQL + """
SELECT doc_id,
       COALESCE(array_to_string(list_filter(
           list(CASE WHEN covered = 0 THEN tok END ORDER BY p),
           x -> x IS NOT NULL), ' '), '') AS clean_text,
       CAST(MAX(n) AS BIGINT) AS n_tokens,
       CAST(SUM(covered) AS BIGINT) AS dup_tokens
FROM cov GROUP BY doc_id
""")
def strip_dup_spans_q(spark, sf_dir):
    """Repeated-span REMOVAL (operators/spans.py strip_dup_spans):
    same detection pipeline as dup_spans, then each document's tokens
    outside all repeated windows are re-joined in original order —
    the 'keep the unique remainder' transform an LLM training
    pipeline applies after span detection. Fully-duplicated documents
    come back as clean_text = ''. Oracle: same SQL replay, final
    aggregation an order-preserving filtered list; both engines emit
    byte-identical clean_text because tokenization is the shared
    whitespace convention."""
    from .operators.spans import strip_dup_spans
    return strip_dup_spans(_dup_span_corpus(spark, sf_dir), w=8)


@query("charset_decode", """
    SELECT doc_id,
      CASE doc_id % 5 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'ascii'
           WHEN 2 THEN 'iso-8859-1' WHEN 3 THEN 'windows-1252'
           ELSE 'utf-16le' END AS charset,
      CASE doc_id % 5 WHEN 0 THEN text || ' café'
           WHEN 1 THEN text
           WHEN 2 THEN text || ' café'
           WHEN 3 THEN text || ' price €9'
           ELSE text || ' café' END AS text,
      CAST(CASE doc_id % 5 WHEN 0 THEN strlen(text) + 6
           WHEN 1 THEN strlen(text)
           WHEN 2 THEN strlen(text) + 5
           WHEN 3 THEN strlen(text) + 9
           ELSE 2 * strlen(text) + 12 END AS BIGINT) AS n_bytes
    FROM documents
""")
def charset_decode_q(spark, sf_dir):
    """Byte-level charset detection + decoding (operators/charset.py),
    the ingest step between a WARC payload and html_extract. Each
    document is re-encoded JVM-side into one of five wire forms by
    doc_id: plain ASCII, UTF-8 with a multibyte suffix, ISO-8859-1
    (high bytes only in A0-FF), windows-1252 (a raw 0x80 Euro — the
    C1-range tell), and BOM'd UTF-16LE. decode_auto must label each
    from the BYTES alone and decode it back; the oracle reconstructs
    the expected label, decoded text, and exact on-wire byte count
    from the parquet original (so a wrong encode, a BOM slip, or a
    mislabel shows as text or n_bytes mismatch). Every probe and all
    hot-path decodes are whole-stage-codegen expressions — no Python
    touches payload bytes (tests/test_charset.py pins the plan)."""
    from .operators.charset import decode_auto
    _, t = _s(spark, sf_dir)
    m = F.col("doc_id") % 5
    txt = F.col("text")
    cafe = F.concat(txt, F.lit(" café"))
    payload = (
        F.when(m == 0, F.encode(cafe, "UTF-8"))
        .when(m == 1, F.encode(txt, "UTF-8"))
        .when(m == 2, F.encode(cafe, "ISO-8859-1"))
        .when(m == 3, F.concat(
            F.encode(F.concat(txt, F.lit(" price ")), "UTF-8"),
            F.lit(b"\x809")))
        .otherwise(F.concat(F.lit(b"\xff\xfe"),
                            F.encode(cafe, "UTF-16LE"))))
    docs = t["documents"].select("doc_id", payload.alias("payload"))
    return decode_auto(docs).select(
        "doc_id", "charset", "text",
        F.octet_length("payload").cast("long").alias("n_bytes"))


@query("decontaminate_bloom", """
    WITH base AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                 t -> t <> '') AS tk
      FROM documents),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(tk) >= 3 THEN
               list_transform(generate_series(1, len(tk) - 2),
                   i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))
             ELSE [concat_ws(' ', tk)] END AS sl
      FROM base),
    toks AS (SELECT doc_id, unnest(list_distinct(sl)) AS tok FROM sh),
    tr AS (SELECT doc_id AS train_id, tok FROM toks WHERE doc_id % 17 <> 0),
    ev AS (SELECT doc_id AS eval_id, tok FROM toks WHERE doc_id % 17 = 0)
    SELECT train_id, eval_id, CAST(count(*) AS BIGINT) AS n_shared
    FROM tr JOIN ev USING (tok)
    GROUP BY train_id, eval_id
    HAVING count(*) >= 2
""")
def decontaminate_bloom_q(spark, sf_dir):
    """The decontamination report computed through the BLOOM path
    (operators/bloom.py + contamination_report_bloom): for eval sets
    too large to broadcast-join, the distinct eval shingles become a
    distributed-built Bloom filter (groupBy(word).agg(bit_or) — raw
    keys never reach the driver), the train corpus is probe-filtered
    in one Arrow pass where only 8-byte hashes cross into Python, and
    the surviving ~fpp fraction is verified with a real join. Bloom
    rejects are definitive, so the oracle is the SAME SQL as the
    broadcast-path `decontaminate` entry — identical output proves
    the filter layer changes the plan, not the answer."""
    from .operators.decontam import contamination_report_bloom
    _, t = _s(spark, sf_dir)
    docs = t["documents"]
    ev = docs.filter(F.col("doc_id") % 17 == 0)
    tr = docs.filter(F.col("doc_id") % 17 != 0)
    return contamination_report_bloom(tr, ev, ngram_w=3, min_shared=2,
                                      fpp=0.01)


@query("html_links", """
    SELECT doc_id, 'https://corpus.test/shared/nav' AS href,
           'Nav' AS anchor, 'corpus.test' AS dst_domain
    FROM documents
    UNION ALL
    SELECT doc_id,
           'https://site' || (doc_id % 7) || '.example/page/' || doc_id,
           'Site ' || (doc_id % 7),
           'site' || (doc_id % 7) || '.example'
    FROM documents
    UNION ALL
    SELECT doc_id, 'https://corpus.test/p/' || (doc_id + 1),
           'Next', 'corpus.test'
    FROM documents
""")
def html_links_q(spark, sf_dir):
    """Outlink extraction (operators/html.py html_links) — the edge
    list that feeds the link-graph operators (pagerank, components in
    operators/graph.py). Pages are built JVM-side with three known
    links each: a root-relative nav link, an absolute cross-site
    link, and a ../-traversal relative link; html_links must find all
    three in order, resolve them against the page URL (urljoin
    semantics), and the query reduces each target to its registrable
    domain (operators/web.py) — the typical graph-node key. The
    oracle reconstructs every resolved URL and domain from doc_id
    alone, so a resolution slip (base handling, ../ collapse,
    scheme-relative) surfaces as a value mismatch."""
    from .operators.html import html_links
    from .operators.web import registrable_domain
    _, t = _s(spark, sf_dir)
    ids = F.col("doc_id").cast("string")
    page = F.concat(
        F.lit("<html><body><div><a href='/shared/nav'>Nav</a></div>"
              "<p>see <a href=\"https://site"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example/page/"), ids, F.lit("\">Site "),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("</a> and <a href='../p/"),
        (F.col("doc_id") + 1).cast("string"),
        F.lit("'>Next</a></p></body></html>"))
    docs = t["documents"].select(
        "doc_id", page.alias("html"),
        F.concat(F.lit("https://corpus.test/doc/"), ids).alias("base"))
    links = html_links(docs, base_col="base")
    return links.select(
        "doc_id", "href", "anchor",
        registrable_domain(
            F.parse_url(F.col("href"), F.lit("HOST"))).alias("dst_domain"))


@query("text_clean", """
    SELECT doc_id,
           text || ' "curly" - dash... nb sp xzw tab end' AS clean_text,
           CAST(strlen(text) + 36 AS BIGINT) AS n_chars
    FROM documents
""")
def text_clean_q(spark, sf_dir):
    """Unicode text normalization (operators/text.py clean_text) —
    the cleanup between charset decode / HTML extraction and every
    downstream text op. Each document gets a constant suffix of
    unicode mess appended JVM-side (curly quotes, em dash, ellipsis,
    NBSP run, zero-width space, bell control, tab run, exotic
    spaces); clean_text must remove the invisibles, ASCII-fy the
    quote/dash/space zoo, expand the ellipsis, strip the control,
    and collapse the runs. The oracle is HAND-COMPUTED (not a
    replay): the expected normalized string is written literally
    from the rules, so a normalizer bug cannot hide by breaking
    both sides identically. Zero-shuffle codegen projection
    (plan-gated in tests/test_operators.py)."""
    from .operators.text import clean_text
    _, t = _s(spark, sf_dir)
    mess = (" \u201ccurly\u201d \u2014 dash\u2026 nb\u00a0\u00a0sp"
            " x\u200bzw tab\t\t\u2003end\u0007")
    dirty = F.concat(F.col("text"), F.lit(mess))
    return t["documents"].select(
        "doc_id", clean_text(dirty).alias("clean_text"),
        F.length(clean_text(dirty)).cast("long").alias("n_chars"))


@query("sketch_rollup", """
    SELECT event_type AS key,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS est_ok, TRUE AS merge_ok
    FROM events GROUP BY event_type
    UNION ALL
    SELECT '__all__', CAST(COUNT(DISTINCT user_id) AS BIGINT),
           TRUE, TRUE
    FROM events
""")
def sketch_rollup_q(spark, sf_dir):
    """Mergeable distinct-count sketches (DataSketches HLL via
    Spark's hll_sketch_agg/hll_union_agg) — THE 100 TB distinct
    pattern: per-slice sketches built independently (per day, per
    partition, per source) and merged WITHOUT rescanning, where
    countDistinct would need a full reshuffle of raw keys per
    question asked. Here: one HLL per event_type over user_id, then
    the global estimate from hll_union_agg over the five per-type
    sketches. Correctness is oracled as guarantees-as-data (the
    heavy_hitters_approx convention): per row, est_ok pins the
    estimate within 2% of the exact distinct (lgK=14 gives ~0.8%
    RSE) and merge_ok pins union-of-sketches == direct-global-sketch
    within 0.5% (DataSketches register-max union — measured exactly
    equal); the oracle recomputes the exact counts and expects every
    flag TRUE. The exact countDistincts exist only to CHECK the
    sketches — the production path at scale is sketches alone."""
    _, t = _s(spark, sf_dir)
    ev = t["events"]
    nex = F.col("n_exact").cast("double")
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"),
        F.countDistinct("user_id").alias("n_exact"))
    per = sk.select(
        F.col("event_type").alias("key"),
        F.col("n_exact").cast("long").alias("n_exact"),
        ((F.abs(F.hll_sketch_estimate("sk") - nex) / nex) <= 0.02)
        .alias("est_ok"),
        F.lit(True).alias("merge_ok"))
    merged = sk.agg(F.hll_sketch_estimate(
        F.hll_union_agg("sk", F.lit(False))).alias("m"))
    direct = ev.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(14))).alias("d"),
        F.countDistinct("user_id").alias("nx"))
    allrow = merged.crossJoin(direct).select(   # singleton x singleton
        F.lit("__all__").alias("key"),
        F.col("nx").cast("long").alias("n_exact"),
        ((F.abs(F.col("m") - F.col("nx").cast("double"))
          / F.col("nx").cast("double")) <= 0.02).alias("est_ok"),
        ((F.abs(F.col("m") - F.col("d"))
          / F.greatest(F.col("d"), F.lit(1.0))) <= 0.005)
        .alias("merge_ok"))
    return per.unionByName(allrow)


@query("corpus_overlap", """
    WITH d AS (SELECT DISTINCT event_type, user_id FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_overlap,
           TRUE AS est_ok
    FROM d a JOIN d b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
""")
def corpus_overlap_q(spark, sf_dir):
    """Set-intersection sketches (DataSketches Theta via
    theta_sketch_agg/theta_intersection) — the corpus-overlap
    question ('how many users/documents do slices A and B share?')
    answered from per-slice sketches WITHOUT a raw-key join: at
    100 TB the exact pairwise overlap of N corpus slices needs N^2
    distinct-joins over raw keys, while theta sketches are built once
    per slice and intersect pairwise as tiny binary blobs. Oracled as
    guarantees-as-data: n_overlap is the EXACT pairwise overlap (the
    oracle recomputes it relationally) and est_ok pins the sketch
    estimate within 5% of it (exact in sparse mode at these sizes).
    The pairwise crossJoin is sketch-table x sketch-table — 5x5
    rows, never data-scale."""
    _, t = _s(spark, sf_dir)
    ev = t["events"]
    sk = ev.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id").alias("sk"))
    a, b = sk.alias("a"), sk.alias("b")
    est = (a.crossJoin(b)                       # 5x5 sketch rows
           .filter(F.col("a.event_type") < F.col("b.event_type"))
           .select(F.col("a.event_type").alias("type_a"),
                   F.col("b.event_type").alias("type_b"),
                   F.theta_sketch_estimate(
                       F.theta_intersection(F.col("a.sk"),
                                            F.col("b.sk"))).alias("est")))
    d = ev.select("event_type", "user_id").distinct()
    exact = (d.alias("x").join(d.alias("y"), "user_id")
             .filter(F.col("x.event_type") < F.col("y.event_type"))
             .groupBy(F.col("x.event_type").alias("type_a"),
                      F.col("y.event_type").alias("type_b"))
             .agg(F.count(F.lit(1)).alias("n_overlap")))
    return (exact.join(est, ["type_a", "type_b"])
            .select("type_a", "type_b",
                    F.col("n_overlap").cast("long").alias("n_overlap"),
                    (F.abs(F.col("est")
                           - F.col("n_overlap").cast("double"))
                     <= 0.05 * F.col("n_overlap").cast("double"))
                    .alias("est_ok")))


@query("quantile_sketch", """
    SELECT * FROM (VALUES (CAST(0.5 AS DOUBLE), TRUE, TRUE),
                          (CAST(0.9 AS DOUBLE), TRUE, TRUE),
                          (CAST(0.99 AS DOUBLE), TRUE, TRUE))
        AS t(p, merged_rank_ok, direct_rank_ok)
""")
def quantile_sketch_q(spark, sf_dir):
    """Mergeable quantile sketches (DataSketches KLL via
    kll_sketch_agg_double / the two-arg kll_sketch_merge_double) --
    the scale pattern for percentiles over data too big to sort:
    per-slice sketches merge associatively, so daily sketches answer
    any later quantile question without rescanning. Here the events
    table is split into two halves by event_id parity, each half gets
    its own KLL over `value`, the halves MERGE, and the merged
    sketch's p50/p90/p99 are checked against the EXACT empirical rank
    (count(value <= q)/n, computed relationally): guarantees-as-data,
    the oracle expects every rank within 5% of its target (KLL k=200
    is ~1.3% single-sketch). direct_rank_ok runs the same check on a
    sketch built over the whole table, pinning that merging two
    halves loses nothing beyond the documented bound. (The quantile
    rank argument must be a foldable literal, hence one column per
    percentile rather than an exploded rank column.)"""
    PS = (0.5, 0.9, 0.99)
    _, t = _s(spark, sf_dir)
    ev = t["events"].select(
        (F.col("event_id") % 2).alias("half"),
        F.col("value").cast("double").alias("v"))
    halves = ev.groupBy("half").agg(
        F.kll_sketch_agg_double("v").alias("k"))
    h0 = halves.filter(F.col("half") == 0).select(
        F.col("k").alias("k0"))
    h1 = halves.filter(F.col("half") == 1).select(
        F.col("k").alias("k1"))
    merged = h0.crossJoin(h1).select(      # singleton x singleton
        F.kll_sketch_merge_double("k0", "k1").alias("km"))
    direct = ev.agg(F.kll_sketch_agg_double("v").alias("kd"))
    q = merged.crossJoin(direct).select(
        *[F.kll_sketch_get_quantile_double("km", F.lit(p))
          .alias(f"qm{i}") for i, p in enumerate(PS)],
        *[F.kll_sketch_get_quantile_double("kd", F.lit(p))
          .alias(f"qd{i}") for i, p in enumerate(PS)])
    agg = ev.crossJoin(F.broadcast(q)).agg(   # scalar row broadcast
        F.count(F.lit(1)).cast("double").alias("n"),
        *[F.sum((F.col("v") <= F.col(f"qm{i}")).cast("long"))
          .cast("double").alias(f"cm{i}") for i in range(len(PS))],
        *[F.sum((F.col("v") <= F.col(f"qd{i}")).cast("long"))
          .cast("double").alias(f"cd{i}") for i in range(len(PS))])
    rows = agg.select(F.explode(F.array(*[
        F.struct(
            F.lit(p).alias("p"),
            (F.abs(F.col(f"cm{i}") / F.col("n") - F.lit(p)) <= 0.05)
            .alias("merged_rank_ok"),
            (F.abs(F.col(f"cd{i}") / F.col("n") - F.lit(p)) <= 0.05)
            .alias("direct_rank_ok"))
        for i, p in enumerate(PS)])).alias("s"))
    return rows.select("s.*")


@query("bucketed_join", f"""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           {_dsum_sql('l.l_extendedprice')} AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
""")
def bucketed_join_q(spark, sf_dir):
    """Bucketed co-located join (operators/projection.py
    write_bucketed): lineitem and orders are laid out as bucketed
    external tables on the join key (same bucket count, bucket-sorted)
    and joined straight from the layout — the join itself plans with
    ZERO Exchange of either table (gated in tests/test_plans.py; the
    only exchange left is the final 5-row priority aggregate). At
    100 TB this is THE recurring-fact-join answer: one layout cost at
    write time deletes both shuffle legs from every subsequent join.
    The oracle replays the same join relationally from the raw
    parquet, so the bucketed write must be lossless too."""
    import tempfile

    from .operators.projection import write_bucketed
    _, t = _s(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="bss_bkt_")
    suffix = d.rsplit("_", 1)[-1]
    li = write_bucketed(t["lineitem"].select("l_orderkey",
                                             "l_extendedprice"),
                        f"{d}/li", f"bkt_li_{suffix}", "l_orderkey")
    o = write_bucketed(t["orders"].select("o_orderkey",
                                          "o_orderpriority"),
                       f"{d}/o", f"bkt_o_{suffix}", "o_orderkey")
    j = li.hint("merge").join(o, li.l_orderkey == o.o_orderkey)
    return (j.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).cast("long").alias("n_items"),
                 dsum("l_extendedprice").alias("revenue")))


@query("stream_warc", """
    SELECT doc_id, 'response' AS warc_type,
           200 AS http_status, text,
           CAST(strlen(text) AS BIGINT) AS n_bytes
    FROM documents
""")
def stream_warc_q(spark, sf_dir):
    """STREAMING WARC ingest (sources/warc.py warc_stream_reader):
    the same crawl files the batch source_warc entry round-trips,
    consumed incrementally through readStream(binaryFile) — the
    landing-directory pattern where new .warc.gz files appear as a
    crawl runs and each is parsed exactly once (checkpoint-tracked).
    Parsing is the shared Arrow stage with the batch reader, so this
    entry pins batch/stream parity: the oracle is the same
    losslessness check as source_warc (doc_id from the target URI,
    text from the HTTP response body). Stateless stream — no
    watermark, append mode."""
    import tempfile

    from .sources.warc import warc_sink, warc_stream_reader
    from .streaming import run_to_completion
    _, t = _s(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="bss_warcstream_")
    body = F.encode(F.col("text"), "UTF-8")
    head = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/plain; "
              "charset=utf-8\r\nContent-Length: "),
        F.octet_length(body).cast("string"), F.lit("\r\n\r\n"))
    docs = t["documents"].select(
        F.concat(F.lit("https://corpus.test/doc/"),
                 F.col("doc_id").cast("string")).alias("target_uri"),
        F.concat(F.encode(head, "UTF-8"), body).alias("payload"))
    warc_sink(docs, d, warc_type="response",
              content_type="application/http; msgtype=response") \
        .collect()
    recs = warc_stream_reader(spark, d, glob="*.warc.gz").select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
        .cast("long").alias("doc_id"),
        "warc_type", "http_status",
        F.decode(F.col("payload"), "UTF-8").alias("text"),
        F.octet_length("payload").cast("long").alias("n_bytes"))
    return run_to_completion(recs, "bs_stream_warc",
                             output_mode="append")


@query("similarity_pq", """
    SELECT vec_id AS qid, true AS recall_ok
    FROM embeddings WHERE vec_id < 5
""")
def similarity_pq_q(spark, sf_dir):
    """Product-quantization ANN (operators/pq.py — the IVF+PQ-standard
    compressed-domain search): per-subspace deterministic k-means
    codebooks, one codegen encode projection to m=8 one-byte codes
    (64x vector compression), ADC scoring as m table lookups per
    candidate, exact cosine re-rank of the 16k-deep shortlist. Like
    similarity_ivf, codebooks aren't ANSI-SQL-replayable, so the
    entry is PROPERTY-checked: per query, recall@10 against the
    brute-force ground truth must be >= 0.5 (measured: 0.8-1.0 at
    sf0.01, >= 0.5 at sf0.1; training is bitwise-deterministic so the
    booleans are stable)."""
    from .operators.pq import pq_topk, pq_train
    from .operators.similarity import brute_force_topk
    _, t = _s(spark, sf_dir)
    emb = t["embeddings"]
    qs = emb.filter(F.col("vec_id") < 5)
    # one capped Lloyd round over the xxhash64 % 2 == 0 half-sample:
    # codebook quality needs thousands of training vectors, not the
    # corpus — recall@10 vs brute force stays >= 0.5 at sf0.01/sf0.1
    # (measured, deterministic), and at 100 TB the training scan is
    # sample-bounded while encode/search still cover every vector.
    books = pq_train(emb, m=8, ksub=16, dim=64, iters=1,
                     sample_mod=2)
    pq = pq_topk(emb, qs, books, k=10, dim=64, oversample=16)
    bf = brute_force_topk(emb, qs, k=10, dim=64)
    hits = (pq.select("qid", "nid")
            .join(bf.select("qid", "nid"), ["qid", "nid"])
            .groupBy("qid").agg(F.count(F.lit(1)).alias("n_hits")))
    return (bf.select("qid").distinct()
            .join(hits, on="qid", how="left")
            .select("qid",
                    (F.coalesce(F.col("n_hits"), F.lit(0)) >= 5)
                    .alias("recall_ok")))


@query("multimodal_resize", """
    WITH img AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 0),
    box AS (
      SELECT doc_id,
             list_transform(range(48), j ->
               ((doc_id*7 + ((2*(j//12)*8   + 2*((j//3)%4))  *3 + j%3)) % 256
              + (doc_id*7 + ((2*(j//12)*8   + 2*((j//3)%4)+1)*3 + j%3)) % 256
              + (doc_id*7 + (((2*(j//12)+1)*8 + 2*((j//3)%4))  *3 + j%3)) % 256
              + (doc_id*7 + (((2*(j//12)+1)*8 + 2*((j//3)%4)+1)*3 + j%3)) % 256
               ) // 4) AS px
      FROM img),
    nn AS (
      SELECT doc_id,
             list_transform(range(27), j ->
               (doc_id*7 + ((((j//9)*8//3)*8 + ((j//3)%3)*8//3)*3
                            + j%3)) % 256) AS px
      FROM img)
    SELECT b.doc_id,
           CAST(list_sum(b.px) AS BIGINT) AS box_sum,
           CAST(list_sum(list_transform(range(48),
                j -> (j+1) * b.px[j+1])) AS BIGINT) AS box_wsum,
           CAST(list_sum(n.px) AS BIGINT) AS nn_sum,
           CAST(list_sum(list_transform(range(27),
                j -> (j+1) * n.px[j+1])) AS BIGINT) AS nn_wsum
    FROM box b JOIN nn n USING (doc_id)
""")
def multimodal_resize_q(spark, sf_dir):
    """Deterministic image RESIZE (operators/multimodal.py
    resize_rgb/resize_images — the missing decode/feature/RESIZE/
    frame-sample quartet member): even doc_ids become 8x8 PPMs from
    the doc_id pixel formula, the production mapInPandas path decodes
    and resizes each to 4x4 (exact integer box mean — the training-
    thumbnail path) and 3x3 (floor-index nearest neighbor), and the
    query folds each output raster into order-sensitive checksums
    JVM-side (hex -> conv per byte, position-weighted sums). The
    oracle recomputes every resized pixel from the closed-form
    formula WITHOUT touching bytes — a box-sum slip, an index-map
    off-by-one, or a channel swap breaks the weighted hash."""
    import pandas as pd
    from .operators.multimodal import make_ppm, resize_images
    _, t = _s(spark, sf_dir)

    def gen(batches):
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                px = bytes((d * 7 + i) % 256 for i in range(192))
                rows.append((d, make_ppm(8, 8, px)))
            yield pd.DataFrame(rows, columns=["doc_id", "media"])

    imgs = (t["documents"].filter(F.col("doc_id") % 2 == 0)
            .select("doc_id")
            .mapInPandas(gen, schema="doc_id long, media binary"))

    def _sums(resized, n, prefix):
        hexc = F.hex(F.col("raster"))
        bs = [F.conv(F.substring(hexc, 2 * j + 1, 2), 16, 10)
              .cast("long") for j in range(n)]
        total = bs[0]
        wtotal = bs[0]
        for j in range(1, n):
            total = total + bs[j]
            wtotal = wtotal + bs[j] * F.lit(j + 1)
        return resized.select(
            "doc_id", total.alias(f"{prefix}_sum"),
            wtotal.alias(f"{prefix}_wsum"))

    box = _sums(resize_images(imgs, 4, 4), 48, "box")
    nn = _sums(resize_images(imgs, 3, 3), 27, "nn")
    return box.join(nn, "doc_id")


_MJPEG_SQL = """
    WITH base AS (
      SELECT doc_id, 1 + doc_id % 5 AS nf
      FROM documents WHERE doc_id % 2 = 0
    ), fr AS (
      SELECT doc_id, unnest(range(0, nf, 2)) AS fi FROM base
    ), c AS (
      SELECT doc_id, fi,
             (3 * doc_id + 11 * fi) % 256 AS r0,
             (5 * doc_id + 17 * fi) % 256 AS g0,
             (7 * doc_id + 23 * fi) % 256 AS b0
      FROM fr
    ), ycc AS (
      SELECT *,
        FLOOR(0.299e0 * r0 + 0.587e0 * g0 + 0.114e0 * b0 + 0.5e0) AS y,
        FLOOR(128e0 - 0.168736e0 * r0 - 0.331264e0 * g0 + 0.5e0 * b0
              + 0.5e0) AS cb,
        FLOOR(128e0 + 0.5e0 * r0 - 0.418688e0 * g0 - 0.081312e0 * b0
              + 0.5e0) AS cr
      FROM c
    ), rgb AS (
      SELECT *,
        LEAST(255e0, GREATEST(0e0,
            FLOOR(y + 1.402e0 * (cr - 128e0) + 0.5e0))) AS r2,
        LEAST(255e0, GREATEST(0e0,
            FLOOR(y - 0.344136e0 * (cb - 128e0)
                  - 0.714136e0 * (cr - 128e0) + 0.5e0))) AS g2,
        LEAST(255e0, GREATEST(0e0,
            FLOOR(y + 1.772e0 * (cb - 128e0) + 0.5e0))) AS b2
      FROM ycc
    )
    SELECT doc_id, CAST(fi AS INT) AS frame_idx,
      CAST(768 AS BIGINT) AS n_bytes,
      md5(repeat(lpad(hex(CAST(r2 AS INT)), 2, '0')
                 || lpad(hex(CAST(g2 AS INT)), 2, '0')
                 || lpad(hex(CAST(b2 AS INT)), 2, '0'), 256))
        AS frame_md5
    FROM rgb
"""


@query("multimodal_mjpeg", _MJPEG_SQL)
def multimodal_mjpeg_q(spark, sf_dir):
    """MJPEG-in-MP4 REAL video frame decode end-to-end — the one
    video container format whose samples this engine can turn into
    pixels without external codec libraries: ISO BMFF demux
    (operators/mp4.py stsz/stsc/stco byte slicing) feeds each video
    sample to the T.81 JPEG decoder (operators/jpeg.py) inside
    frame_sample(fake=False)'s Arrow batch (operators/multimodal.py).

    Fixture: each even doc becomes an MP4 with one 'jpeg'-fourcc
    video track of 1-5 constant-color 16x16 quality-100 JPEG frames
    (4:2:0 and 4:4:4 alternating by doc — constant planes subsample
    exactly), frame colors derived from (doc_id, frame_idx) so the
    oracle regenerates them in SQL. every_n=2 sampling exercises the
    sample-index arithmetic. frame_md5 is Spark-side md5(hex(frame))
    over the DECODED 16*16*3 raster; DuckDB rebuilds the identical
    hex string from the JFIF floor(x+.5) color round-trip (the same
    pinned arithmetic as multimodal_jpeg) and repeat()+md5()s it —
    a wrong sample offset, frame order slip, Huffman/IDCT error, or
    channel swap breaks the hash. H.264/AAC stay honest raises
    (multimodal.py frame_sample)."""
    import pandas as pd
    from .operators.jpeg import make_jpeg
    from .operators.mp4 import TrackSpec, make_mp4
    from .operators.multimodal import frame_sample
    _, t = _s(spark, sf_dir)

    def gen(batches):
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                frames = []
                for i in range(1 + d % 5):
                    px = bytes(((3 * d + 11 * i) % 256,
                                (5 * d + 17 * i) % 256,
                                (7 * d + 23 * i) % 256)) * 256
                    frames.append(make_jpeg(
                        16, 16, px, quality=100,
                        subsampling="4:2:0" if d % 4 == 0
                        else "4:4:4"))
                v = TrackSpec(handler="vide", codec="jpeg",
                              samples=frames, width=16, height=16,
                              timescale=1000, sample_delta=40)
                rows.append((d, bytearray(make_mp4([v]))))
            yield pd.DataFrame(rows, columns=["id", "media"])

    media = (t["documents"].filter(F.col("doc_id") % 2 == 0)
             .select(F.col("doc_id").alias("id"))
             .mapInPandas(gen, schema="id long, media binary"))
    out = frame_sample(media, every_n=2, fake=False)
    return out.select(
        F.col("id").alias("doc_id"), "frame_idx",
        F.octet_length("frame").cast("long").alias("n_bytes"),
        F.md5(F.hex(F.col("frame"))).alias("frame_md5"))


@query("ngram_novelty", """
    WITH base AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                 t -> t <> '') AS tk
      FROM documents),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(tk) >= 5 THEN
               list_transform(generate_series(1, len(tk) - 4),
                   i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2],
                                  tk[i+3], tk[i+4]))
             ELSE [concat_ws(' ', tk)] END AS sl
      FROM base),
    toks AS (SELECT doc_id, unnest(list_distinct(sl)) AS tok FROM sh),
    ref AS (SELECT DISTINCT tok FROM toks WHERE doc_id % 10 = 0),
    scored AS (
      SELECT t.doc_id, t.tok, r.tok IS NOT NULL AS seen
      FROM (SELECT * FROM toks WHERE doc_id % 10 <> 0) t
      LEFT JOIN ref r USING (tok))
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS total_grams,
           CAST(sum(CASE WHEN seen THEN 0 ELSE 1 END) AS BIGINT)
               AS novel_grams,
           CAST(sum(CASE WHEN seen THEN 0 ELSE 1 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS novelty
    FROM scored GROUP BY doc_id
""")
def ngram_novelty_q(spark, sf_dir):
    """Per-document n-gram novelty against a reference corpus
    (operators/decontam.py ngram_novelty): the fraction of each
    candidate document's distinct word 5-grams absent from the
    reference split (doc_id % 10) — the curation signal for weighting
    fresh data over already-represented boilerplate. The 100 TB shape
    mirrors decontamination's asymmetry: one shingle scan of the
    candidate corpus, broadcast left join against the distinct
    reference grams, one narrow per-doc count agg; novelty is a
    per-row division of two exact counts (bitwise-stable)."""
    from .operators.decontam import ngram_novelty
    _, t = _s(spark, sf_dir)
    docs = t["documents"]
    ref = docs.filter(F.col("doc_id") % 10 == 0)
    cand = docs.filter(F.col("doc_id") % 10 != 0)
    return ngram_novelty(cand, ref, ngram_w=5)


@query("leakage_split", """
    WITH RECURSIVE pairs AS (
      -- same pair generation as the dedup_components oracle
      SELECT id_a, id_b FROM (
        WITH base AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                     t -> t <> '') AS tk
          FROM documents),
        sh AS (
          SELECT doc_id,
                 CASE WHEN len(tk) >= 3 THEN
                   list_transform(generate_series(1, len(tk) - 2),
                       i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))
                 ELSE [concat_ws(' ', tk)] END AS sl
          FROM base),
        toks AS (SELECT doc_id, unnest(list_distinct(sl)) AS tok FROM sh),
        sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
                  FROM toks GROUP BY doc_id),
        ndocs AS (SELECT count(*) AS n FROM documents),
        hot AS (SELECT tok FROM toks GROUP BY tok
                HAVING count(*) > (SELECT CAST(floor(0.3 * n) AS BIGINT)
                                   FROM ndocs)),
        cold AS (SELECT doc_id, tok FROM toks
                 WHERE tok NOT IN (SELECT tok FROM hot)),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(count(*) AS BIGINT) AS inter
          FROM cold a JOIN cold b ON a.tok = b.tok AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
        SELECT id_a, id_b
        FROM inter JOIN sizes sa ON sa.doc_id = id_a
                   JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(inter AS DOUBLE)
              / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.8)
    ),
    sym AS (SELECT id_a AS u, id_b AS v FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
    reach(node, label) AS (
      SELECT u, u FROM sym
      UNION
      SELECT s.v, r.label FROM reach r JOIN sym s ON s.u = r.node),
    comp AS (SELECT node, CAST(min(label) AS BIGINT) AS component
             FROM reach GROUP BY node),
    grp AS (SELECT d.doc_id,
                   CAST(coalesce(c.component, d.doc_id) AS BIGINT)
                       AS split_group
            FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
    b AS (SELECT doc_id, split_group,
                 ('0x' || substr(md5(CAST(split_group AS VARCHAR)),
                                 1, 15))::BIGINT % 10000 AS bucket
          FROM grp)
    SELECT doc_id, split_group,
           CASE WHEN bucket < 9000 THEN 'train'
                WHEN bucket < 9500 THEN 'val'
                ELSE 'test' END AS split
    FROM b
""")
def leakage_split_q(spark, sf_dir):
    """Duplicate-cluster-atomic train/val/test split (operators/
    sampling.py leakage_safe_split): near-dup pairs (exact-Jaccard
    generator, same parameters as dedup_components) close into
    clusters via min-label components, and each whole cluster — or a
    singleton doc — is hash-bucketed into one split, so a test
    document can never have a near-copy in train. PORTABLE bucket mode
    (md5-derived, same trick as op_hash_split) lets the oracle replay
    pair generation, the recursive-CTE closure, AND the bucket
    arithmetic end-to-end."""
    from .operators.dedup import ngram_jaccard_pairs
    from .operators.sampling import leakage_safe_split
    _, t = _s(spark, sf_dir)
    docs = t["documents"]
    pairs = ngram_jaccard_pairs(docs, threshold=0.8, max_df_ratio=0.3,
                                shingle_w=3)
    return leakage_safe_split(
        docs, pairs, fractions=(("train", 0.9), ("val", 0.05),
                                ("test", 0.05)),
        portable=True).select("doc_id", "split_group", "split")


def _dft_sql_parts(frame_len: int, bins: tuple,
                   x_col: str = "x") -> tuple[list, list]:
    """The shared DFT-replay fragments (used by the band-energy, mel,
    and full-pipeline oracles — ONE source of truth for the basis
    literals and the energy expression order): per-bin exact-int64
    projection sums over (frame, i, x_col), and the e{k} double
    energies in the operator's exact expression order."""
    from .operators.audio import Q_SHIFT, dft_basis
    scale = repr(2.0 ** (-2 * Q_SHIFT))
    sums, outs = [], []
    for k in bins:
        cos_t, sin_t = dft_basis(frame_len, k)
        cl = ", ".join(str(v) for v in cos_t)
        sl = ", ".join(str(v) for v in sin_t)
        sums.append(f"CAST(sum({x_col} * list_extract([{cl}], i)) "
                    f"AS BIGINT) AS c{k}")
        sums.append(f"CAST(sum({x_col} * list_extract([{sl}], i)) "
                    f"AS BIGINT) AS s{k}")
        outs.append(f"(CAST(c{k} AS DOUBLE) * CAST(c{k} AS DOUBLE)"
                    f" + CAST(s{k} AS DOUBLE) * CAST(s{k} AS DOUBLE))"
                    f" * {scale} AS e{k}")
    return sums, outs


def _audio_oracle(pred: str, n_samples: int, x_expr: str,
                  frame_len: int = 64, bins: tuple = (1, 3, 7)) -> str:
    """SQL replay of the audio entries: regenerate the PCM analytically
    from doc_id (the Spark side proves the container encode→decode
    round trip on the same samples), then project each frame onto the
    SAME quantized-integer cos/sin basis the operator uses — every
    product and sum is exact int64, so the replay is bitwise with no
    float summation order or double→decimal cast to adjudicate."""
    sums, outs = _dft_sql_parts(frame_len, bins)
    return f"""
    WITH d AS (SELECT doc_id FROM documents WHERE {pred}),
    p AS (SELECT unnest(range(0, {n_samples})) AS pos),
    s AS (SELECT doc_id, pos, {x_expr} AS x
          FROM d, p),
    f AS (SELECT doc_id, pos // {frame_len} AS frame,
                 CAST(pos % {frame_len} AS INT) + 1 AS i, x
          FROM s),
    g AS (SELECT doc_id, frame,
                 {', '.join(sums)}
          FROM f GROUP BY doc_id, frame)
    SELECT doc_id, frame, {', '.join(outs)} FROM g
    """


def _audio_spectral_oracle(frame_len: int = 64,
                           bins: tuple = (1, 3, 7)) -> str:
    return _audio_oracle(
        "doc_id % 4 = 0", 256,
        "((doc_id * 31 + 17 * pos * pos + pos) % 4001) - 2000",
        frame_len, bins)


@query("audio_spectral", _audio_spectral_oracle())
def audio_spectral_q(spark, sf_dir):
    """Windowed-DFT band energy over decoded WAV PCM (operators/
    audio.py band_energy, exact expression path): per 64-sample frame,
    the energy at DFT bins 1/3/7 — the silence / tone / bandwidth
    detector primitive of an audio pipeline. WAV blobs are synthesized
    per doc (operators/multimodal.py make_wav) from a closed-form
    int16 signal, really encoded and really decoded back
    (wav_samples), so the oracle — which regenerates the samples
    analytically and replays the projection from the SAME
    quantized-integer basis with exact int64 sums — also proves the
    codec round trip. This declarative path is also the measured
    SCALE path (PERFORMANCE.md §audio-paths: PCM never leaves the
    JVM); the numpy path (band_energy(vectorized=True)) is
    pytest-gated BIT-EQUAL to it."""
    import pandas as pd

    from .operators.audio import band_energy, wav_samples
    from .operators.multimodal import make_wav
    _, t = _s(spark, sf_dir)

    def gen(batches):
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                samples = [((d * 31 + 17 * n * n + n) % 4001) - 2000
                           for n in range(256)]
                rows.append((d, bytearray(make_wav(8000, samples))))
            yield pd.DataFrame(rows, columns=["id", "media"])

    media = (t["documents"].filter(F.col("doc_id") % 4 == 0)
             .select(F.col("doc_id").alias("id"))
             .mapInPandas(gen, schema="id long, media binary"))
    dec = wav_samples(media)
    return (band_energy(dec, frame_len=64, bins=(1, 3, 7))
            .select(F.col("id").alias("doc_id"), "frame",
                    "e1", "e3", "e7"))


@query("audio_mp4_pcm", _audio_oracle(
    "doc_id % 4 = 1", 192,
    "((doc_id * 29 + 13 * pos * pos + 3 * pos) % 3001) - 1500",
    bins=(2, 5)))
def audio_mp4_pcm_q(spark, sf_dir):
    """Raw-PCM16 audio decoded END-TO-END from a real ISO-BMFF
    container (operators/audio.py mp4_pcm — the audio analog of the
    MJPEG-in-MP4 video path): a closed-form int16 signal is muxed into
    an MP4 'soun' track with 'twos' (big-endian PCM) sample entries in
    three mdat chunks (operators/mp4.py make_mp4), demuxed back
    through the real stsz/stsc/stco sample tables, byte-decoded to
    samples, and analyzed with band_energy — so the oracle, which
    regenerates the samples analytically and replays the
    quantized-integer DFT bitwise, proves mux, demux, PCM decode, and
    the spectral projection in one value-hash."""
    import pandas as pd

    from .operators.audio import band_energy, mp4_pcm
    from .operators.mp4 import TrackSpec, make_mp4
    _, t = _s(spark, sf_dir)

    def gen(batches):
        import struct

        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                pcm = [((d * 29 + 13 * n * n + 3 * n) % 3001) - 1500
                       for n in range(192)]
                chunks = [struct.pack(">64h", *pcm[i:i + 64])
                          for i in range(0, 192, 64)]
                a = TrackSpec(handler="soun", codec="twos",
                              samples=chunks, timescale=8000,
                              sample_delta=64)
                rows.append((d, bytearray(make_mp4([a]))))
            yield pd.DataFrame(rows, columns=["id", "media"])

    media = (t["documents"].filter(F.col("doc_id") % 4 == 1)
             .select(F.col("doc_id").alias("id"))
             .mapInPandas(gen, schema="id long, media binary"))
    dec = mp4_pcm(media)
    return (band_energy(dec, frame_len=64, bins=(2, 5))
            .select(F.col("id").alias("doc_id"), "frame", "e2", "e5"))


@query("audio_segments", f"""
    WITH eng AS ({_audio_oracle(
        "doc_id % 4 = 2", 256,
        "CASE WHEN ((pos // 64) + doc_id) % 3 = 0 THEN 0 "
        "ELSE ((doc_id * 37 + 19 * pos * pos + 5 * pos) % 4001) - 2000 "
        "END",
        bins=(2, 5))}),
    act AS (SELECT doc_id, frame FROM eng WHERE e2 + e5 >= 1.0),
    isl AS (SELECT doc_id, frame,
                   frame - row_number() OVER (PARTITION BY doc_id
                                              ORDER BY frame) AS grp
            FROM act)
    SELECT doc_id, CAST(min(frame) AS BIGINT) AS start_frame,
           CAST(max(frame) AS BIGINT) AS end_frame,
           CAST(count(*) AS BIGINT) AS n_frames
    FROM isl GROUP BY doc_id, grp
""")
def audio_segments_q(spark, sf_dir):
    """Silence-split audio segmentation (operators/audio.py
    active_segments): per-frame fixed-point band energy → threshold →
    gaps-and-islands merge of consecutive active frames. The synthetic
    clips embed silent frames at doc-dependent positions
    ((frame + doc_id) % 3), so segments split differently across the
    corpus and an off-by-one in the island merge shifts values. The
    oracle replays energies (exact int64 DFT), the threshold, and the
    row_number island key end-to-end."""
    import pandas as pd

    from .operators.audio import active_segments
    _, t = _s(spark, sf_dir)

    def gen(batches):
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                rows.append((d, [
                    0 if ((n // 64) + d) % 3 == 0
                    else ((d * 37 + 19 * n * n + 5 * n) % 4001) - 2000
                    for n in range(256)]))
            yield pd.DataFrame(rows, columns=["id", "samples"])

    clips = (t["documents"].filter(F.col("doc_id") % 4 == 2)
             .select(F.col("doc_id").alias("id"))
             .mapInPandas(gen, schema="id long, samples array<int>"))
    return (active_segments(clips, frame_len=64, bins=(2, 5),
                            threshold=1.0)
            .select(F.col("id").alias("doc_id"), "start_frame",
                    "end_frame", "n_frames"))


@query("bloom_join", """
    SELECT l_orderkey, l_partkey,
           CASE WHEN l_partkey IN (SELECT p_partkey FROM part
                                   WHERE p_size > 40)
                THEN 'in' ELSE 'out' END AS verdict
    FROM lineitem
""")
def bloom_join_q(spark, sf_dir):
    """The general beyond-broadcast membership joins (operators/
    bloom.py bloom_semi_join / bloom_anti_join) as first-class
    entries: the big side is pre-filtered by a distributed-built
    Bloom filter (8-byte hashes cross into Python, never keys) and
    only the ~fpp surviving fraction pays a real verify join — EXACT
    by construction (rejects are definitive). The query tags every
    big-side row with its membership verdict and unions semi + anti,
    so the oracle's plain IN/NOT-IN partition of the table catches a
    false negative (row missing from 'in') AND a false positive
    leak (row missing from 'out') in one value-hash."""
    from .operators.bloom import (bloom_anti_join, bloom_build,
                                  bloom_semi_join)
    _, t = _s(spark, sf_dir)
    big = t["lineitem"].select("l_orderkey", "l_partkey")
    keys = (t["part"].filter(F.col("p_size") > 40)
            .select(F.col("p_partkey").alias("l_partkey")))
    # ONE filter build + broadcast shared by both joins (the bloom=
    # reuse API); the anti join's double probe scan is the documented
    # exact-anti trade-off (bloom_anti_join docstring)
    bloom = bloom_build(keys, "l_partkey")
    semi = bloom_semi_join(big, keys, on="l_partkey", bloom=bloom) \
        .withColumn("verdict", F.lit("in"))
    anti = bloom_anti_join(big, keys, on="l_partkey", bloom=bloom) \
        .withColumn("verdict", F.lit("out"))
    return semi.unionByName(anti)


def _adpcm_oracle() -> str:
    """Recursive-CTE replay of the ENTIRE IMA-ADPCM chain
    (operators/adpcm.py): the quantizer, the shift-based
    reconstruction, int16/index clamps, and the packet-boundary
    9-bit predictor truncation — all exact integer arithmetic, so
    the oracle recomputes the operator's decoded samples bit-for-bit
    from the analytic input signal alone (no codec bytes cross into
    SQL)."""
    from .operators.adpcm import INDEX_TABLE, STEP_TABLE
    steps = ", ".join(str(v) for v in STEP_TABLE)
    idxs = ", ".join(str(v) for v in INDEX_TABLE)
    return f"""
    WITH RECURSIVE d AS (
      SELECT doc_id FROM documents WHERE doc_id % 4 = 3),
    rec(doc_id, pos, pred, idx) AS (
      SELECT doc_id, -1, 0, 0 FROM d
      UNION ALL
      SELECT doc_id, np,
             GREATEST(-32768, LEAST(32767,
                 p0 + CASE WHEN x < p0 THEN -diff ELSE diff END)),
             GREATEST(0, LEAST(88, i0 + ([{idxs}])[low3 + 1]))
      FROM (
        SELECT doc_id, np, p0, i0, x,
               (stp // 8) + CASE WHEN b4 THEN stp ELSE 0 END
                          + CASE WHEN b2 THEN stp // 2 ELSE 0 END
                          + CASE WHEN b1 THEN stp // 4 ELSE 0 END
                   AS diff,
               4 * CAST(b4 AS INT) + 2 * CAST(b2 AS INT)
                   + CAST(b1 AS INT) AS low3
        FROM (
          SELECT *, (m2 >= stp // 4) AS b1 FROM (
            SELECT *, (m1 >= stp // 2) AS b2,
                   m1 - CASE WHEN m1 >= stp // 2 THEN stp // 2
                        ELSE 0 END AS m2
            FROM (
              SELECT *, (mag >= stp) AS b4,
                     mag - CASE WHEN mag >= stp THEN stp ELSE 0 END
                         AS m1
              FROM (
                SELECT doc_id, np, p0, i0, x,
                       ([{steps}])[i0 + 1] AS stp,
                       abs(x - p0) AS mag
                FROM (
                  SELECT doc_id, pos + 1 AS np,
                         CASE WHEN (pos + 1) % 64 = 0
                              THEN pred & -128 ELSE pred END AS p0,
                         idx AS i0,
                         ((doc_id * 41 + 23 * (pos+1) * (pos+1)
                           + 7 * (pos+1)) % 4001) - 2000 AS x
                  FROM rec WHERE pos < 255))))))
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(abs(pred)) AS BIGINT) AS sum_abs,
           CAST(sum(pred * (pos + 1)) AS BIGINT) AS checksum
    FROM rec WHERE pos >= 0 GROUP BY doc_id
    """


@query("audio_adpcm", _adpcm_oracle())
def audio_adpcm_q(spark, sf_dir):
    """A real COMPRESSED audio codec end-to-end: IMA ADPCM
    (operators/adpcm.py, QuickTime 'ima4' packets, 4:1) — the analytic
    int16 signal is encoded to 34-byte packets, muxed as an MP4 'soun'
    track (one packet per container sample), demuxed back through the
    real sample tables, and DECODED (operators/audio.py mp4_pcm); the
    position-weighted checksum pins every reconstructed sample to its
    position. The oracle replays encoder AND decoder as a recursive
    CTE over exact integer arithmetic — a single wrong step-table
    entry, clamp, or packet-boundary truncation diverges the state
    recurrence and breaks the hash."""
    import pandas as pd

    from .operators.adpcm import encode_ima4
    from .operators.audio import mp4_pcm
    from .operators.mp4 import TrackSpec, make_mp4
    _, t = _s(spark, sf_dir)

    def gen(batches):
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                pcm = [((d * 41 + 23 * n * n + 7 * n) % 4001) - 2000
                       for n in range(256)]
                a = TrackSpec(handler="soun", codec="ima4",
                              samples=encode_ima4(pcm), timescale=8000,
                              sample_delta=64)
                rows.append((d, bytearray(make_mp4([a]))))
            yield pd.DataFrame(rows, columns=["id", "media"])

    media = (t["documents"].filter(F.col("doc_id") % 4 == 3)
             .select(F.col("doc_id").alias("id"))
             .mapInPandas(gen, schema="id long, media binary"))
    dec = mp4_pcm(media)
    s = dec.select(F.col("id").alias("doc_id"),
                   F.posexplode("samples").alias("pos", "s"))
    return (s.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_samples"),
                 F.sum(F.abs("s")).alias("sum_abs"),
                 F.sum(F.col("s") * (F.col("pos") + 1))
                 .alias("checksum")))


def _g711_oracle() -> str:
    """Table-literal replay: the oracle regenerates the code bytes
    analytically and expands them through the SAME 256-entry G.711
    tables the decoder uses (operators/audio.py builds them from the
    ITU formulas at import) — a single wrong table entry or sign
    convention shifts the position-pinned checksum."""
    from .operators.audio import G711_ALAW, G711_ULAW
    u = ", ".join(str(v) for v in G711_ULAW)
    a = ", ".join(str(v) for v in G711_ALAW)
    return f"""
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 0),
    p AS (SELECT unnest(range(0, 200)) AS pos),
    c AS (SELECT doc_id, pos,
                 (doc_id * 13 + 7 * pos + pos * pos) % 256 AS code
          FROM d, p),
    s AS (SELECT doc_id, pos,
                 CASE WHEN doc_id % 10 = 0 THEN ([{u}])[code + 1]
                      ELSE ([{a}])[code + 1] END AS v
          FROM c)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
           CAST(sum(v * (pos + 1)) AS BIGINT) AS checksum
    FROM s GROUP BY doc_id
    """


@query("audio_g711", _g711_oracle())
def audio_g711_q(spark, sf_dir):
    """G.711 log-PCM decode end-to-end (ITU G.711 — the telephony
    codec; operators/audio.py G711 tables via operators/multimodal.py
    decode_wav fmt 6/7): analytic code bytes are containerized as
    real mu-law (doc_id % 10 == 0) and A-law WAV files
    (make_wav_g711), decoded back through wav_samples, and
    position-checksummed. The oracle expands the same bytes through
    the same table literals — covering the RIFF fmt-6/7 parse, the
    complement/XOR masking, segment expansion, and the INVERTED
    A-law sign convention in one value-hash."""
    import pandas as pd

    from .operators.audio import wav_samples
    from .operators.multimodal import make_wav_g711
    _, t = _s(spark, sf_dir)

    def gen(batches):
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                codes = bytes((d * 13 + 7 * n + n * n) % 256
                              for n in range(200))
                rows.append((d, bytearray(make_wav_g711(
                    8000, codes, law="u" if d % 10 == 0 else "a"))))
            yield pd.DataFrame(rows, columns=["id", "media"])

    media = (t["documents"].filter(F.col("doc_id") % 5 == 0)
             .select(F.col("doc_id").alias("id"))
             .mapInPandas(gen, schema="id long, media binary"))
    s = wav_samples(media).select(
        F.col("id").alias("doc_id"),
        F.posexplode("samples").alias("pos", "s"))
    return (s.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_samples"),
                 F.sum(F.abs("s")).alias("sum_abs"),
                 F.sum(F.col("s") * (F.col("pos") + 1))
                 .alias("checksum")))


def _flac_oracle() -> str:
    """LOSSLESS means no codec replay at all: decode_flac must return
    the analytic input bit-for-bit (CRC-8/16 per frame plus the
    STREAMINFO stream-MD5 are verified on the Spark side), so the
    oracle just regenerates the interleaved stereo signal and
    checksums it — any encoder/decoder defect anywhere (bit I/O,
    prediction, Rice partitions, stereo decorrelation, wasted bits)
    breaks the hash."""
    return """
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 1),
    p AS (SELECT unnest(range(0, 400)) AS pos),
    s AS (SELECT doc_id, pos,
                 (CASE WHEN pos % 2 = 0
                       THEN ((doc_id * 43 + 29 * (pos // 2) * (pos // 2)
                              + 11 * (pos // 2)) % 4001) - 2000
                       ELSE ((doc_id * 47 + 31 * (pos // 2) * (pos // 2)
                              + 13 * (pos // 2)) % 3001) - 1500 END)
                 * (CASE WHEN doc_id % 3 = 0 THEN 4 ELSE 1 END) AS v
          FROM d, p)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
           CAST(sum(v * (pos + 1)) AS BIGINT) AS checksum
    FROM s GROUP BY doc_id
    """


@query("audio_flac", _flac_oracle())
def audio_flac_q(spark, sf_dir):
    """FLAC decode end-to-end (operators/flac.py — the lossless audio
    workhorse of speech corpora, completing the codec matrix next to
    PCM16/ADPCM/G.711): an analytic STEREO int16 signal is really
    encoded (fixed + quantized-LPC predictors by doc parity, per-frame
    stereo-mode search, wasted-bits docs via the x4 scaling, a short
    last block) and really decoded back through flac_samples with
    frame CRCs and the stream MD5 verified. Lossless, so the oracle
    needs no codec replay: it regenerates the signal analytically and
    position-checksums it — the whole encode -> container -> decode
    chain must be bit-exact for the hash to match."""
    import pandas as pd

    from .operators.audio import flac_samples
    from .operators.flac import encode_flac
    _, t = _s(spark, sf_dir)

    def gen(batches):
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                k = 4 if d % 3 == 0 else 1
                inter = []
                for n in range(200):
                    inter.append(k * (((d * 43 + 29 * n * n + 11 * n)
                                       % 4001) - 2000))
                    inter.append(k * (((d * 47 + 31 * n * n + 13 * n)
                                       % 3001) - 1500))
                rows.append((d, bytearray(encode_flac(
                    inter, 8000, channels=2, block_size=64,
                    lpc_order=8 if d % 2 == 0 else None))))
            yield pd.DataFrame(rows, columns=["id", "media"])

    # the id projection is 8 bytes/row — repartitioning it to full
    # core fan-out is ~free and is what parallelizes the per-doc
    # encode+decode CPU (the parquet scan alone yields a handful of
    # partitions at small SF; at 100 TB the scan already fans out)
    media = (t["documents"].filter(F.col("doc_id") % 5 == 1)
             .select(F.col("doc_id").alias("id"))
             .repartition(spark.sparkContext.defaultParallelism)
             .mapInPandas(gen, schema="id long, media binary"))
    s = flac_samples(media).select(
        F.col("id").alias("doc_id"),
        F.posexplode("samples").alias("pos", "s"))
    return (s.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_samples"),
                 F.sum(F.abs("s")).alias("sum_abs"),
                 F.sum(F.col("s") * (F.col("pos") + 1))
                 .alias("checksum")))


def _resample_cte(pred: str, n_in: int, n_out: int, x_expr: str,
                  l_up: int = 2, m_down: int = 3, k: int = 8) -> str:
    """The shared polyphase-replay CTE chain (used by the resample
    and full-pipeline oracles — ONE source of truth for the tap
    literals and the floor semantics): ends with ``a(doc_id, m, y)``,
    the exact resampled samples. floor(acc/2^Q) over float64 is exact
    for a power-of-two divisor, so it matches Spark's arithmetic
    shiftright bit-for-bit; ``x_expr`` regenerates the input sample
    at index ``i``."""
    from .operators.resample import Q_SHIFT, polyphase_taps
    taps = polyphase_taps(l_up, m_down, k)
    tl = "[" + ", ".join(str(v) for v in taps) + "]"
    return f"""
    d AS (SELECT doc_id FROM documents WHERE {pred}),
    m AS (SELECT unnest(range(0, {n_out})) AS m),
    j AS (SELECT unnest(range(0, {k})) AS j),
    c AS (SELECT doc_id, m, j,
                 (m * {m_down}) // {l_up} - j AS i,
                 (j * {l_up} + (m * {m_down}) % {l_up}) AS tap_ix
          FROM d, m, j),
    s AS (SELECT doc_id, m,
                 CASE WHEN i BETWEEN 0 AND {n_in - 1}
                      THEN ({x_expr})
                           * list_extract({tl}, tap_ix + 1)
                      ELSE 0 END AS contrib
          FROM c),
    a AS (SELECT doc_id, m,
                 CAST(floor(CAST(sum(contrib) AS DOUBLE)
                            / {1 << Q_SHIFT}) AS BIGINT) AS y
          FROM s GROUP BY doc_id, m)"""


def _resample_oracle() -> str:
    """Exact replay via the shared polyphase CTE (_resample_cte),
    position-checksummed per doc."""
    cte = _resample_cte(
        "doc_id % 4 = 2", 240, 160,
        "((doc_id * 53 + 17 * i * i + 7 * i) % 4001) - 2000")
    return f"""
    WITH {cte}
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(abs(y)) AS BIGINT) AS sum_abs,
           CAST(sum(y * (m + 1)) AS BIGINT) AS checksum
    FROM a GROUP BY doc_id
    """


@query("audio_resample", _resample_oracle())
def audio_resample_q(spark, sf_dir):
    """Rational sample-rate conversion (operators/resample.py — the
    24 kHz→16 kHz standardization primitive, here L/M = 2/3):
    fixed-point polyphase FIR over an analytic int16 signal built
    ENTIRELY in codegen (sequence+transform — no Python anywhere in
    the plan), integer tap lookups, one (id, m) aggregation, an
    arithmetic-shift renormalization. The oracle replays the same
    quantized taps and the same floor semantics, so every output
    sample is bit-pinned; 240 inputs → 160 outputs per doc."""
    from .operators.resample import resample
    _, t = _s(spark, sf_dir)
    idx = F.sequence(F.lit(0), F.lit(239))
    clips = (t["documents"].filter(F.col("doc_id") % 4 == 2)
             .select(F.col("doc_id").alias("id"),
                     F.transform(
                         idx,
                         lambda i: ((F.col("doc_id") * 53
                                     + 17 * i * i + 7 * i) % 4001
                                    - 2000).cast("int"))
                     .alias("samples")))
    out = resample(clips, 2, 3)
    return (out.groupBy(F.col("id").alias("doc_id"))
            .agg(F.count(F.lit(1)).alias("n_samples"),
                 F.sum(F.abs("y")).alias("sum_abs"),
                 F.sum(F.col("y") * (F.col("m") + 1))
                 .alias("checksum")))


def _code_detect_oracle() -> str:
    """Full replay: same synthetic code docs (every 7th), same
    replace-chain symbol counts, same line/token splits, same integer
    cross-multiplied thresholds — flags AND counts hash together."""
    from .operators.text import _CODE_KEYWORDS, _CODE_SYMBOLS
    sym_chain = " + ".join(
        f"(length(text) - length(replace(text, '{c}', '')))"
        for c in _CODE_SYMBOLS)
    kw = ", ".join(f"'{k}'" for k in _CODE_KEYWORDS)
    return f"""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN
               'def f(x):' || chr(10) || '    return x * '
               || CAST(doc_id AS VARCHAR) || ' + 1;' || chr(10)
               || 'class C:' || chr(10) || '    var = ['
               || CAST(doc_id AS VARCHAR) || '];' || chr(10)
               || 'const y = (x <= 2);'
             ELSE text END AS text
      FROM documents),
    feat AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST({sym_chain} AS BIGINT) AS n_sym,
             list_filter(string_split(text, chr(10)),
                         l -> l <> '') AS lines,
             list_filter(string_split_regex(text, '\\s+'),
                         t -> t <> '') AS toks
      FROM corpus),
    agg AS (
      SELECT doc_id, n_chars, n_sym,
             CAST(len(list_filter(lines,
                 l -> l LIKE '    %' OR l LIKE chr(9) || '%'))
                 AS BIGINT) AS n_indent,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(len(list_filter(toks, t -> t IN ({kw})))
                 AS BIGINT) AS n_kw
      FROM feat)
    SELECT doc_id, n_chars, n_sym, n_indent, n_kw,
           n_chars > 0 AND 100 * n_sym >= 3 * n_chars AS r_symbols,
           n_lines > 0 AND 5 * n_indent >= n_lines AS r_indent,
           n_kw >= 2 AS r_keywords,
           (n_chars > 0 AND 100 * n_sym >= 3 * n_chars)
           AND ((n_lines > 0 AND 5 * n_indent >= n_lines)
                OR n_kw >= 2) AS is_code
    FROM agg
    """


@query("code_detect", _code_detect_oracle())
def code_detect_q(spark, sf_dir):
    """Code-vs-prose routing (operators/text.py code_detect — the
    corpus splitter a mixed crawl runs before its text and code
    pipelines diverge): symbol density + structural indentation +
    cross-language keyword evidence, each an integer
    cross-multiplication flag, verdict = symbols AND (indent OR
    keywords). Every 7th doc is rewritten (in codegen) as a small
    parameterized code snippet, so the corpus genuinely mixes and the
    verdict column discriminates; the oracle replays the synthesis,
    every count, and every threshold."""
    from .operators.text import code_detect
    _, t = _s(spark, sf_dir)
    d = F.col("doc_id")
    ds = d.cast("string")
    snippet = F.concat(
        F.lit("def f(x):\n    return x * "), ds,
        F.lit(" + 1;\nclass C:\n    var = ["), ds,
        F.lit("];\nconst y = (x <= 2);"))
    corpus = t["documents"].select(
        "doc_id",
        F.when(d % 7 == 0, snippet).otherwise(F.col("text"))
        .alias("text"))
    return code_detect(corpus)


def _mel_sql_parts(n_mels: int = 4, frame_len: int = 64,
                   sample_rate: int = 8000) -> tuple[tuple, list]:
    """The shared mel-combine fragments (used by the mel and
    full-pipeline oracles — ONE source of truth for the quantized
    weights and the ascending-bin combine order): (bins the filterbank
    touches, mel_{i} SELECT expressions over e{k} columns)."""
    from .operators.audio import MEL_W_SHIFT, mel_weights
    ws = mel_weights(frame_len, n_mels, sample_rate)
    bins = tuple(sorted({k for w in ws for k in w}))
    shift = repr(2.0 ** (-MEL_W_SHIFT))
    mels = []
    for i, w in enumerate(ws):
        terms = " + ".join(
            f"e{k} * CAST({w[k]} AS DOUBLE)" for k in sorted(w))
        mels.append(f"({terms}) * {shift} AS mel_{i}")
    return bins, mels


def _mel_oracle() -> str:
    """Replay mel on top of the exact-integer DFT replay: the inner
    CTE is the audio_spectral oracle over every bin any filter
    touches; the outer SELECT combines the e_k doubles with the SAME
    quantized integer weights in the SAME ascending-bin left-to-right
    order, so every double op is IEEE-identical to the operator's."""
    bins, mels = _mel_sql_parts()
    inner = _audio_oracle(
        "doc_id % 3 = 1", 192,
        "((doc_id * 59 + 23 * pos * pos + 9 * pos) % 4001) - 2000",
        64, bins)
    return f"""
    WITH eng AS ({inner})
    SELECT doc_id, frame, {', '.join(mels)} FROM eng
    """


@query("audio_mel", _mel_oracle())
def audio_mel_q(spark, sf_dir):
    """Mel-filterbank energies (operators/audio.py mel_energy — the
    acoustic-model input feature, completing the audio family's ASR
    story: decode → resample → frame → mel): triangular filters with
    quantized integer weights over band_energy's exact-integer DFT
    projections, combined in fixed ascending-bin order so the double
    arithmetic replays IEEE-identically in SQL. The signal is built
    in pure codegen (sequence+transform); 64 frames x 4 mels per
    doc, value-hashed per frame."""
    from .operators.audio import mel_energy
    _, t = _s(spark, sf_dir)
    idx = F.sequence(F.lit(0), F.lit(191))
    clips = (t["documents"].filter(F.col("doc_id") % 3 == 1)
             .select(F.col("doc_id").alias("id"),
                     F.transform(
                         idx,
                         lambda i: ((F.col("doc_id") * 59
                                     + 23 * i * i + 9 * i) % 4001
                                    - 2000).cast("int"))
                     .alias("samples")))
    out = mel_energy(clips, frame_len=64, n_mels=4, sample_rate=8000)
    return out.withColumnRenamed("id", "doc_id")


def _audio_pipeline_oracle() -> str:
    """Composes the resample replay INTO the mel replay: the resample
    CTE reproduces every intermediate sample y (exact int64 convolution
    + floor shift), then the mel CTE frames THOSE values and replays
    the exact-integer DFT + IEEE-order filterbank — one value-hash over
    the whole decode->resample->mel chain (the WAV codec round trip is
    proven on the Spark side; PCM16 is lossless, so the oracle starts
    from the analytic signal)."""
    bins, mels = _mel_sql_parts()
    sums, outs = _dft_sql_parts(64, bins, x_col="y")
    rs = _resample_cte(
        "doc_id % 3 = 2", 192, 128,
        "((doc_id * 61 + 19 * i * i + 5 * i) % 4001) - 2000")
    return f"""
    WITH {rs},
    f AS (SELECT doc_id, m // 64 AS frame,
                 CAST(m % 64 AS INT) + 1 AS i, y
          FROM a),
    g AS (SELECT doc_id, frame, {', '.join(sums)}
          FROM f GROUP BY doc_id, frame),
    e AS (SELECT doc_id, frame, {', '.join(outs)} FROM g)
    SELECT doc_id, frame, {', '.join(mels)} FROM e
    """


@query("audio_pipeline", _audio_pipeline_oracle())
def audio_pipeline_q(spark, sf_dir):
    """The COMPLETE audio ETL chain in one value-hash — what a speech
    corpus actually runs: analytic int16 PCM is really containerized
    as WAV (make_wav), really decoded back (wav_samples), polyphase-
    RESAMPLED 2/3 (operators/resample.py, exact fixed-point), and
    reduced to MEL-FILTERBANK features (mel_energy, exact-integer DFT
    + IEEE-order-pinned combination). 192 samples -> 128 resampled ->
    2 frames x 4 mels per doc. The oracle replays resample AND mel
    analytically; any defect anywhere in the chain — codec, filter
    taps, floor semantics, basis quantization, combine order — breaks
    the hash."""
    import pandas as pd

    from .operators.audio import mel_energy, wav_samples
    from .operators.multimodal import make_wav
    from .operators.resample import resample
    _, t = _s(spark, sf_dir)

    def gen(batches):
        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                pcm = [((d * 61 + 19 * n * n + 5 * n) % 4001) - 2000
                       for n in range(192)]
                rows.append((d, bytearray(make_wav(24000, pcm))))
            yield pd.DataFrame(rows, columns=["id", "media"])

    media = (t["documents"].filter(F.col("doc_id") % 3 == 2)
             .select(F.col("doc_id").alias("id"))
             .repartition(spark.sparkContext.defaultParallelism)
             .mapInPandas(gen, schema="id long, media binary"))
    pcm = wav_samples(media)
    rs = resample(pcm, 2, 3)
    # rows-input fusion (r14): resample's (id, m, y) output IS the
    # exploded sample relation band_energy's declarative path builds
    # first (pos = array index = m), so mel consumes it directly —
    # the per-clip reassembly (collect_list → array_sort →
    # interpreted transform → posexplode) this replaced was pure
    # plan overhead; same (id, frame, i, x) rows, same sums
    rows = rs.select("id", F.col("m").alias("pos"),
                     F.col("y").cast("int").alias("x"))
    out = mel_energy(rows, frame_len=64, n_mels=4, sample_rate=8000,
                     pos_rows=True)
    return out.withColumnRenamed("id", "doc_id")


def _robots_oracle() -> str:
    """INTENT-based replay, deliberately not a parse re-run: the
    fixture's robots text is synthesized from the host index's parity,
    so the oracle states the rule set each parity INTENDED to write (a
    Spark parse bug — group stacking, comment handling, most-specific
    selection — surfaces as intent divergence), translates patterns
    with python re.escape (independent of the operator's
    regexp_replace chains), and replays longest-match / allow-ties /
    absent-allows in SQL over DuckDB's RE2."""
    import re as _re

    def rx(pat: str) -> str:
        # DuckDB standard string literals do NOT process backslash
        # escapes — embed the regex verbatim (only '' would need
        # doubling, and robots patterns here contain no quotes)
        r = "^" + _re.escape(pat).replace(r"\*", ".*")
        if r.endswith(r"\$"):
            r = r[:-2] + "$"
        return r

    # what the generator writes per host parity, for agent 'graftbot':
    # even hosts carry an exact graftbot group (so the '*' group is
    # ignored); odd hosts carry only the '*' group
    even = [(False, "/private/"), (True, "/private/pub$"),
            (False, "/tmp*.log")]
    odd = [(False, "/area*"), (True, "/area*/open")]
    rows = []
    for par, ruleset in ((0, even), (1, odd)):
        for allow, pat in ruleset:
            rows.append(f"({par}, {str(allow).upper()}, '{pat}', "
                        f"'{rx(pat)}', {len(pat)})")
    return f"""
    WITH rules(par, allow, pattern, pat_re, pat_len) AS (
      VALUES {', '.join(rows)}),
    u AS (SELECT doc_id,
                 'h' || CAST(doc_id % 10 AS VARCHAR) || '.test' AS host,
                 (doc_id % 10) % 2 AS par,
                 unnest(['/private/doc' || CAST(doc_id AS VARCHAR),
                         '/private/pub',
                         '/private/pub' || CAST(doc_id AS VARCHAR),
                         '/tmp' || CAST(doc_id AS VARCHAR) || '.log',
                         '/area' || CAST(doc_id % 10 AS VARCHAR)
                             || '/x' || CAST(doc_id AS VARCHAR),
                         '/area' || CAST(doc_id % 10 AS VARCHAR)
                             || '/open/' || CAST(doc_id AS VARCHAR),
                         '/free/' || CAST(doc_id AS VARCHAR)]) AS path
          FROM documents),
    urls AS (SELECT doc_id, host,
                    'https://' || host || path AS url, par, path
             FROM u),
    j AS (SELECT urls.*, r.allow, r.pattern, r.pat_len,
                 regexp_matches(urls.path, r.pat_re) AS hit
          FROM urls LEFT JOIN rules r ON r.par = urls.par),
    best AS (SELECT url, host,
                    arg_max(CAST(allow AS INT),
                            pat_len * 2 + CAST(allow AS INT))
                        FILTER (WHERE hit) AS win_allow,
                    arg_max(pattern,
                            pat_len * 2 + CAST(allow AS INT))
                        FILTER (WHERE hit) AS win_pattern
             FROM j GROUP BY url, host)
    SELECT url, host,
           COALESCE(win_allow = 1, TRUE) AS allowed,
           win_pattern AS matched_pattern
    FROM best
    """


@query("robots_filter", _robots_oracle())
def robots_filter_q(spark, sf_dir):
    """robots.txt crawl gating end-to-end (operators/robots.py — RFC
    9309): per-host robots FILES are synthesized in codegen with the
    parse hazards a real file has (comments, stacked User-agent
    lines, an orphan rule before any group, unknown fields, case
    variation, '*' wildcards, '$' anchors), parsed declaratively
    (window-function group assembly), reduced to the most-specific
    agent group, and matched longest-pattern-wins against every URL.
    Even hosts carry an exact graftbot group (the '*' group must be
    ignored); odd hosts only the '*' group. The oracle replays the
    INTENDED rule set per parity with an independent regex
    translation — parse, selection, translation, and match semantics
    all hash-gated."""
    from .operators.robots import robots_filter
    _, t = _s(spark, sf_dir)
    d = F.col("doc_id")
    n = (d % 10).cast("string")
    host = F.concat(F.lit("h"), n, F.lit(".test"))
    exact_group = F.concat(
        F.lit("Disallow: /orphan   # ignored: before any group\n"
              "# policy file\n"
              "User-agent: graftbot\n"
              "User-Agent: legacybot\n"
              "Disallow: /private/\n"
              "Allow: /private/pub$\n"
              "Disallow: /tmp*.log\n"
              "Crawl-delay: 5\n"))
    n_host = F.concat(F.lit("h"), F.col("n").cast("string"),
                      F.lit(".test"))
    star_group = F.concat(
        F.lit("User-agent: *\n"
              "Disallow: /area*\n"
              "Allow: /area*/open\n"
              "Sitemap: https://"), n_host, F.lit("/map.xml\n"))
    robots = (t["documents"].select((d % 10).alias("n")).distinct()
              .select(
                  n_host.alias("host"),
                  F.when(F.col("n") % 2 == 0,
                         F.concat(exact_group, star_group))
                  .otherwise(star_group).alias("robots_txt")))
    paths = F.array(
        F.concat(F.lit("/private/doc"), d.cast("string")),
        F.lit("/private/pub"),
        F.concat(F.lit("/private/pub"), d.cast("string")),
        F.concat(F.lit("/tmp"), d.cast("string"), F.lit(".log")),
        F.concat(F.lit("/area"), n, F.lit("/x"), d.cast("string")),
        F.concat(F.lit("/area"), n, F.lit("/open/"), d.cast("string")),
        F.concat(F.lit("/free/"), d.cast("string")))
    urls = (t["documents"]
            .select(host.alias("host"), F.explode(paths).alias("path"))
            .select(F.concat(F.lit("https://"), F.col("host"),
                             F.col("path")).alias("url"), "host"))
    return robots_filter(urls, robots, "graftbot")


def _c4_oracle() -> str:
    """Full replay: same synthetic page (kept line, short line,
    unterminated line with lorem/brace injections, javascript line,
    multi-sentence closer), same trim/retention predicate, same
    replace-chain sentence counts, same token-level blocklist."""
    from .operators.text import _C4_BLOCKLIST
    bl = ", ".join(f"'{b}'" for b in _C4_BLOCKLIST)

    def sent(expr: str) -> str:
        return " + ".join(
            f"(length({expr}) - length(replace({expr}, '{m}', '')))"
            for m in (".", "!", "?"))

    keep = ("l -> l <> '' AND (l LIKE '%.' OR l LIKE '%!' OR "
            "l LIKE '%?' OR l LIKE '%\"') AND "
            "len(list_filter(string_split_regex(l, '\\s+'), "
            "w -> w <> '')) >= 5 AND lower(l) NOT LIKE '%javascript%'")
    return f"""
    WITH page AS (
      SELECT doc_id,
             concat_ws(chr(10),
               substr(text, 1, 50)
                 || CASE WHEN doc_id % 17 = 0
                    THEN ' nsfw and more words here.' ELSE '.' END,
               'too short.',
               substr(text, 51, 40)
                 || CASE WHEN doc_id % 11 = 0
                    THEN ' lorem ipsum' ELSE '' END
                 || CASE WHEN doc_id % 13 = 0 THEN ' {{' ELSE '' END,
               CASE WHEN doc_id % 5 = 0
                 THEN 'Enable JavaScript to view this page now.' END,
               CASE WHEN doc_id % 7 = 0
                 THEN 'It works! Does it? Yes it does.' END
             ) AS text
      FROM documents),
    feat AS (
      SELECT doc_id, text,
             list_transform(string_split(text, chr(10)),
                            l -> trim(l)) AS ls
      FROM page),
    kept AS (
      SELECT doc_id, text, ls,
             array_to_string(list_filter(ls, {keep}), chr(10)) AS kt
      FROM feat),
    flag AS (
      SELECT doc_id,
             CAST(len(list_filter(ls, l -> l <> '')) AS BIGINT)
               AS n_lines,
             CAST(len(list_filter(ls, {keep})) AS BIGINT) AS n_kept,
             CAST({sent('kt')} AS BIGINT) AS n_sentences,
             CAST(length(kt) AS BIGINT) AS kept_chars,
             CAST(len(list_filter([{bl}],
                 b -> list_contains(list_filter(
                     string_split_regex(lower(text), '\\s+'),
                     w -> w <> ''), b))) AS BIGINT) AS n_bad,
             lower(text) NOT LIKE '%lorem ipsum%' AS r_no_lorem,
             text NOT LIKE '%{{%' AS r_no_brace,
             kt AS kept_text
      FROM kept)
    SELECT doc_id, n_lines, n_kept, n_sentences, kept_chars,
           n_sentences >= 3 AS r_min_sentences,
           r_no_lorem, r_no_brace,
           n_bad = 0 AS r_no_badwords,
           n_sentences >= 3 AND r_no_lorem AND r_no_brace
             AND n_bad = 0 AS passes,
           kept_text
    FROM flag
    """


@query("c4_filters", _c4_oracle())
def c4_filters_q(spark, sf_dir):
    """C4 page cleaning (operators/text.py c4_filters — Raffel et al.
    2020 §2.2): line-level retention (terminal punctuation, >=5 words,
    no 'javascript') plus page-level rejection (>=3 sentences kept, no
    'lorem ipsum', no '{', no blocklist word). documents.text is
    single-line word soup, so the entry synthesizes a structured page
    per doc IN CODEGEN — one clean prose line, one too-short line, one
    unterminated line (with lorem/brace injections on 11/13-strides),
    a javascript boilerplate line on the 5-stride, and a 3-sentence
    closer on the 7-stride — so every rule fires both ways across the
    corpus. The oracle replays the synthesis and every rule. Pure
    single-pass projection: zero shuffles at any corpus size."""
    from .operators.text import c4_filters
    _, t = _s(spark, sf_dir)
    d = F.col("doc_id")
    txt = F.col("text")
    l1 = F.concat(
        F.substring(txt, 1, 50),
        F.when(d % 17 == 0, F.lit(" nsfw and more words here."))
        .otherwise(F.lit(".")))
    l3 = F.concat(
        F.substring(txt, 51, 40),
        F.when(d % 11 == 0, F.lit(" lorem ipsum")).otherwise(F.lit("")),
        F.when(d % 13 == 0, F.lit(" {")).otherwise(F.lit("")))
    l4 = F.when(d % 5 == 0,
                F.lit("Enable JavaScript to view this page now."))
    l5 = F.when(d % 7 == 0, F.lit("It works! Does it? Yes it does."))
    page = F.concat_ws("\n", l1, F.lit("too short."), l3, l4, l5)
    corpus = t["documents"].select("doc_id", page.alias("text"))
    return c4_filters(corpus)


def _sentences_oracle() -> str:
    """Full replay: same synthesized punctuation, same regex (RE2 and
    Java agree on leftmost-first alternation and \\z), same trim/drop,
    same 0-based enumeration via generate_series."""
    from .operators.text import SENTENCE_RE
    # DuckDB string literals keep backslashes verbatim — no doubling
    pat = SENTENCE_RE.replace("'", "''")
    return f"""
    WITH page AS (
      SELECT doc_id,
             substr(text, 1, 60) || '. '
             || substr(text, 61, 60) || '! Is this the end? '
             || substr(text, 121, 40) AS text
      FROM documents),
    feat AS (
      SELECT doc_id,
             list_filter(list_transform(
                 regexp_extract_all(text, '{pat}'), s -> trim(s)),
                 s -> s <> '') AS ss
      FROM page),
    idx AS (
      SELECT doc_id, ss, unnest(generate_series(1, len(ss))) AS i
      FROM feat)
    SELECT doc_id, CAST(i - 1 AS INT) AS sent_idx,
           ss[i] AS sentence,
           CAST(length(ss[i]) AS BIGINT) AS n_chars,
           CAST(len(list_filter(string_split_regex(ss[i], '\\s+'),
                w -> w <> '')) AS BIGINT) AS n_words
    FROM idx
    """


@query("text_sentences", _sentences_oracle())
def text_sentences_q(spark, sf_dir):
    """Sentence segmentation (operators/text.py split_sentences): each
    document flatmaps to its ordered sentences with per-sentence
    char/word counts — the generator under sentence-level dedup,
    chunking and quality filters. documents.text has no punctuation,
    so the entry synthesizes it in codegen (two terminated sentences,
    an interrogative, and a trailing unterminated fragment per doc);
    the oracle replays the synthesis, the shared SENTENCE_RE, and the
    enumeration. Zero-shuffle generate (regexp_extract_all +
    posexplode)."""
    from .operators.text import split_sentences
    _, t = _s(spark, sf_dir)
    txt = F.col("text")
    page = F.concat(
        F.substring(txt, 1, 60), F.lit(". "),
        F.substring(txt, 61, 60), F.lit("! Is this the end? "),
        F.substring(txt, 121, 40))
    corpus = t["documents"].select("doc_id", page.alias("text"))
    return split_sentences(corpus)


def _mfcc_oracle() -> str:
    """Replay log-DCT on top of the mel replay on top of the
    exact-integer DFT replay: the mfcc_j expressions use the SAME
    quantized DCT-II basis ints and the SAME fixed ascending-i
    ln/multiply/add order as the operator, so every double op is
    IEEE-identical and the only cross-engine wiggle is libm's ulp on
    ln (inside the float normalization — the lm_quality precedent)."""
    from .operators.audio import MFCC_SHIFT, dct_basis
    bins, mels = _mel_sql_parts()
    inner = _audio_oracle(
        "doc_id % 4 = 1", 192,
        "((doc_id * 67 + 29 * pos * pos + 11 * pos) % 4001) - 2000",
        64, bins)
    scale = repr(2.0 ** (-MFCC_SHIFT))
    outs = []
    for j in range(3):
        q = dct_basis(4, j)
        terms = " + ".join(
            f"ln(mel_{i} + 1.0) * CAST({q[i]} AS DOUBLE)"
            for i in range(4))
        outs.append(f"({terms}) * {scale} AS mfcc_{j}")
    return f"""
    WITH eng AS ({inner}),
    mel AS (SELECT doc_id, frame, {', '.join(mels)} FROM eng)
    SELECT doc_id, frame, {', '.join(outs)} FROM mel
    """


@query("audio_mfcc", _mfcc_oracle())
def audio_mfcc_q(spark, sf_dir):
    """MFCCs (operators/audio.py mfcc): quantized-integer DCT-II over
    log(1+mel) of the exact-integer mel filterbank — the compact
    acoustic feature vector ASR models actually consume, closing the
    feature chain decode → resample → mel → MFCC. Signal built in
    pure codegen (sequence+transform); 3 frames x 3 coefficients per
    doc, value-hashed per frame."""
    from .operators.audio import mfcc
    _, t = _s(spark, sf_dir)
    idx = F.sequence(F.lit(0), F.lit(191))
    clips = (t["documents"].filter(F.col("doc_id") % 4 == 1)
             .select(F.col("doc_id").alias("id"),
                     F.transform(
                         idx,
                         lambda i: ((F.col("doc_id") * 67
                                     + 29 * i * i + 11 * i) % 4001
                                    - 2000).cast("int"))
                     .alias("samples")))
    out = mfcc(clips, frame_len=64, n_mels=4, n_mfcc=3,
               sample_rate=8000)
    return out.withColumnRenamed("id", "doc_id")


@query("source_zip", """
    SELECT * FROM (VALUES
        ('readme.txt', 26, 'stored', 'zip keeps this one stored' || chr(10)),
        ('data/body.txt', 74, 'deflate',
         repeat('deflate me ', 4) || 'deflate me'
         || chr(10) || repeat('x', 19)),
        ('data/tail.bin', 5, 'deflate', 'tail' || chr(10)))
        t(name, size, method, body_text)
""")
def source_zip(spark, sf_dir):
    """Zip-archive source (sources/zip_reader): central-directory walk
    + stored/deflate inflation over Arrow batches, file-granular
    parallelism (the tar/WARC contract). The fixture zip mixes a
    ZIP_STORED member with two ZIP_DEFLATED members (one genuinely
    compressible); the oracle states names, sizes, methods and bodies
    verbatim, so a wrong inflate, a dropped member, or a misread
    central directory all break the hash."""
    import io
    import os
    import tempfile
    import zipfile

    from .sources import zip_reader
    files = [
        ("readme.txt", b"zip keeps this one stored\n", zipfile.ZIP_STORED),
        ("data/body.txt",
         b"deflate me " * 4 + b"deflate me\n" + b"x" * 19,
         zipfile.ZIP_DEFLATED),
        ("data/tail.bin", b"tail\n", zipfile.ZIP_DEFLATED),
    ]
    d = os.path.join(tempfile.gettempdir(), "bsq_zip_fixture")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, "fixture.zip")
    if not os.path.exists(p):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            for name, body, method in files:
                zf.writestr(zipfile.ZipInfo(name), body,
                            compress_type=method)
        tmp = p + ".tmp"
        with open(tmp, "wb") as f:
            f.write(buf.getvalue())
        os.replace(tmp, p)
    df = zip_reader(spark, d)
    return df.select("name", F.col("size").cast("int").alias("size"),
                     "method",
                     F.col("body").cast("string").alias("body_text"))


@query("source_xml", """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
""")
def source_xml(spark, sf_dir):
    """XML source (sources/read_xml — Spark 4's native XML reader):
    nation is round-tripped through an XML write and read back with a
    pinned schema; the oracle checks losslessness against the parquet
    original (the source_csv contract, third format)."""
    import tempfile

    from .sources import read_xml
    _, t = _s(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="bsq_xml_")
    (t["nation"].select("n_nationkey", "n_name", "n_regionkey")
     .write.format("xml").option("rowTag", "nation")
     .mode("overwrite").save(d))
    return read_xml(spark, d, "nation",
                    "n_nationkey int, n_name string, n_regionkey int")


@query("pdf_extract", """
    WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id % 6 = 3),
    p0 AS (SELECT doc_id, 0 AS page,
                  substr(text, 1, 40) || chr(10)
                  || substr(text, 41, 40) AS text
           FROM d),
    p1 AS (SELECT doc_id, 1 AS page,
                  'Page two of doc ' || CAST(doc_id AS VARCHAR)
                  || '.' AS text
           FROM d)
    SELECT doc_id, page, text, CAST(length(text) AS BIGINT) AS n_chars
    FROM (SELECT * FROM p0 UNION ALL SELECT * FROM p1)
""")
def pdf_extract_q(spark, sf_dir):
    """PDF text extraction (operators/pdf.py — the document-format leg
    of the media tour): each doc's text is typeset into a REAL
    two-page PDF (make_pdf: object graph, Tj text operators; every
    other doc's content streams FlateDecode-compressed; alternating
    docs use the CLASSIC 1.4 xref-table layout vs the PDF 1.5 layout
    — /ObjStm object streams + a PNG-Up-predicted binary /XRef
    stream, VERDICT r11 task 3; content streams rotate through raw /
    FlateDecode / LZWDecode / LZW-under-TIFF-predictor-2-with-
    /EarlyChange-0 storage, VERDICT r13 task 4; and docs rotate
    through the standard security handler's nominal-encryption modes
    — plaintext, RC4-128, AES-128-CBC, RC4-40, the /V 4 /V2 crypt
    filter, and PDF 2.0's AES-256 (/V 5 /R 6 /AESV3, ISO 32000-2
    §7.6.4 — VERDICT r13 task 3), some with /EncryptMetadata false
    (r13 ADVICE), all with an empty user password, decrypted
    transparently) and
    parsed back through the full chain — startxref → xref table OR
    xref stream → ObjStm member extraction → empty-password
    authentication + per-object-key (or V5 file-key) decryption →
    page-tree walk → stream inflate/LZW/unpredict → BT..ET text
    ops. The
    Spark side proves the build→parse round trip on real bytes; the
    extraction is lossless, so the oracle regenerates the page text
    analytically (the WAV/make_wav contract). One Arrow mapInPandas
    pass per side, blobs never leave the executors."""
    import pandas as pd

    from .operators.pdf import make_pdf, pdf_pages
    _, t = _s(spark, sf_dir)

    def gen(batches):
        for pdf in batches:
            rows = []
            for d, text in zip(pdf["id"], pdf["text"]):
                d = int(d)
                pages = [[text[:40], text[40:80]],
                         [f"Page two of doc {d}."]]
                k = d // 6
                enc = [None, "rc4-128", "aes-128", "rc4-40",
                       "rc4-128-v4", "aes-256"][k % 6]
                comp = [False, True, "lzw", "lzw-tiff"][k % 4]
                rows.append((d, bytearray(make_pdf(
                    pages, compress=comp,
                    xref_stream=(d // 12) % 2 == 0, encrypt=enc,
                    encrypt_metadata=(d // 18) % 2 == 0))))
            yield pd.DataFrame(rows, columns=["id", "media"])

    media = (t["documents"].filter(F.col("doc_id") % 6 == 3)
             .select(F.col("doc_id").alias("id"), "text")
             .repartition(spark.sparkContext.defaultParallelism)
             .mapInPandas(gen, schema="id long, media binary"))
    return pdf_pages(media).withColumnRenamed("id", "doc_id")


@query("source_avro", """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
""")
def source_avro(spark, sf_dir):
    """Avro container source (sources/avro.py — clean-room Object
    Container File codec from the public Apache spec: zigzag varints,
    deflate blocks, sync markers, null-union branches): nation is
    written to REAL .avro files (one deflate, one null-codec, split
    rows) and read back through the binaryFile+Arrow reader with the
    schema pinned and name-checked against each file's writer schema;
    the oracle checks losslessness against the parquet original (the
    source_csv/source_xml contract, fourth format)."""
    import json
    import os
    import tempfile

    from .sources.avro import avro_reader, make_avro
    _, t = _s(spark, sf_dir)
    rows = [(int(r[0]), str(r[1]), int(r[2])) for r in
            t["nation"].select("n_nationkey", "n_name", "n_regionkey")
            .collect()]                    # 25 rows: metadata-scale
    sch = json.dumps({
        "type": "record", "name": "nation", "fields": [
            {"name": "n_nationkey", "type": "long"},
            {"name": "n_name", "type": "string"},
            {"name": "n_regionkey", "type": "long"}]})
    d = tempfile.mkdtemp(prefix="bsq_avro_")
    half = len(rows) // 2
    for fname, chunk, codec in (
            ("a.avro", rows[:half], "deflate"),
            ("b.avro", rows[half:], "null")):
        with open(os.path.join(d, fname), "wb") as f:
            f.write(make_avro(sch, chunk, codec=codec, block_rows=7))
    return avro_reader(
        spark, d,
        "n_nationkey long, n_name string, n_regionkey long")


@query("json_variant", """
    WITH j AS (
      SELECT doc_id, lang,
             '{"id": ' || CAST(doc_id AS VARCHAR)
             || ', "meta": {"lang": "' || lang || '", "n": '
             || CAST(doc_id % 7 AS VARCHAR) || '}, "tags": ["t'
             || CAST(doc_id % 3 AS VARCHAR) || '", "t'
             || CAST(doc_id % 5 AS VARCHAR) || '"]}' AS js
      FROM documents)
    SELECT doc_id,
           CAST(json_extract(js, '$.id') AS BIGINT) AS vid,
           json_extract_string(js, '$.meta.lang') AS vlang,
           CAST(json_extract(js, '$.meta.n') AS BIGINT) AS vn,
           json_extract_string(js, '$.tags[1]') AS tag1,
           CAST(NULL AS BIGINT) AS vmissing,
           'OBJECT<id: BIGINT, meta: OBJECT<lang: STRING, n: BIGINT>, tags: ARRAY<STRING>>'
             AS vschema
    FROM j
""")
def json_variant_q(spark, sf_dir):
    """Semi-structured ingest through Spark 4's VARIANT type: JSON is
    parsed ONCE into the binary variant encoding (parse_json), then
    typed paths are extracted with variant_get (nested object, array
    index), absent paths null out via try_variant_get, and
    schema_of_variant reports the inferred shape — the
    schema-on-read pattern that replaces fragile per-query
    from_json(schema) for heterogeneous event payloads, at
    columnar-binary speed instead of re-tokenizing JSON per access.
    The JSON is synthesized in codegen from documents columns; the
    oracle replays the same extraction with DuckDB's JSON functions
    (and pins the variant schema string, which is constant by
    construction)."""
    _, t = _s(spark, sf_dir)
    d = F.col("doc_id")
    js = F.concat(
        F.lit('{"id": '), d.cast("string"),
        F.lit(', "meta": {"lang": "'), F.col("lang"),
        F.lit('", "n": '), (d % 7).cast("string"),
        F.lit('}, "tags": ["t'), (d % 3).cast("string"),
        F.lit('", "t'), (d % 5).cast("string"), F.lit('"]}'))
    v = F.parse_json(js)
    return t["documents"].select(
        "doc_id",
        F.variant_get(v, "$.id", "long").alias("vid"),
        F.variant_get(v, "$.meta.lang", "string").alias("vlang"),
        F.variant_get(v, "$.meta.n", "long").alias("vn"),
        F.variant_get(v, "$.tags[1]", "string").alias("tag1"),
        F.try_variant_get(v, "$.missing", "long").alias("vmissing"),
        F.schema_of_variant(v).alias("vschema"))


@query("source_protobuf", """
    SELECT n_nationkey, n_name, n_regionkey,
           CAST(2 AS INT) AS n_tags,
           't' || CAST(n_nationkey % 3 AS VARCHAR) AS tag0,
           't' || CAST(n_nationkey % 5 AS VARCHAR) AS tag1,
           CAST(n_nationkey AS BIGINT) AS s_pos,
           CAST(-n_nationkey AS BIGINT) AS s_neg,
           n_name AS iname,
           CAST(length(n_name) AS BIGINT) AS ilen
    FROM nation
""")
def source_protobuf(spark, sf_dir):
    """Protobuf source (sources/protobuf.py — clean-room wire-format
    codec from the public encoding spec: varint keys, zigzag sints,
    length-delimited strings, proto3 zero-value elision + unknown-
    field skipping, writeDelimitedTo file framing; REPEATED fields —
    packed numerics + per-element strings — land as Spark arrays, and
    NESTED MESSAGES land as Spark structs): nation is written to REAL
    .pb files — through a WIDER writer schema than the reader
    declares, so unknown-field skipping is exercised on every message,
    and with the nested ``info`` message deliberately split across TWO
    wire occurrences per message, so the spec's singular-message MERGE
    rule (concatenate fragments, decode once) is exercised on every
    row — and read back with both the message schema and the Spark DDL
    pinned. The decoded arrays/struct are projected to SCALAR leaves
    (size / element_at / struct-field getters — the
    source_avro_complex contract) so the oracle can replay every leaf
    analytically and the driver's pandas canonicalizer never sees a
    list-typed column (VERDICT r12 task 1); the oracle checks
    losslessness against the parquet original (the csv/xml/avro
    contract, fifth format)."""
    import os
    import tempfile

    from .sources.protobuf import (encode_message, frame_delimited,
                                   protobuf_reader)
    _, t = _s(spark, sf_dir)
    rows = [(int(r[0]), str(r[1]), int(r[2])) for r in
            t["nation"].select("n_nationkey", "n_name", "n_regionkey")
            .collect()]                    # 25 rows: metadata-scale
    info_sub = {1: ("name", "string"), 2: ("len", "int64")}
    writer_schema = {1: ("n_nationkey", "int64"),
                     2: ("n_name", "string"),
                     3: ("n_regionkey", "int64"),
                     4: ("tags", "repeated string"),
                     5: ("scores", "repeated sint64"),
                     6: ("info", info_sub),
                     9: ("audit", "string")}   # unknown to the reader
    reader_schema = {k: v for k, v in writer_schema.items() if k != 9}

    def msg_bytes(k: int, name: str, reg: int) -> bytes:
        # first fragment carries info={name}; a SECOND occurrence of
        # field 6 carries info={len} — a conforming decoder must
        # concatenate the fragments before decoding (singular-message
        # merge, protobuf encoding spec "Last One Wins"/merge rules)
        head = encode_message(writer_schema, {
            "n_nationkey": k, "n_name": name, "n_regionkey": reg,
            "tags": [f"t{k % 3}", f"t{k % 5}"], "scores": [k, -k],
            "info": {"name": name}, "audit": f"w{k}"})
        tail = encode_message({6: ("info", info_sub)},
                              {"info": {"len": len(name)}})
        return head + tail

    d = tempfile.mkdtemp(prefix="bsq_pb_")
    half = len(rows) // 2
    for fname, chunk in (("a.pb", rows[:half]), ("b.pb", rows[half:])):
        with open(os.path.join(d, fname), "wb") as f:
            f.write(frame_delimited(
                [msg_bytes(k, name, reg) for k, name, reg in chunk]))
    df = protobuf_reader(
        spark, d, reader_schema,
        "n_nationkey long, n_name string, n_regionkey long, "
        "tags array<string>, scores array<long>, "
        "info struct<name:string,len:long>")
    return df.select(
        "n_nationkey", "n_name", "n_regionkey",
        F.size("tags").alias("n_tags"),
        F.element_at("tags", 1).alias("tag0"),
        F.element_at("tags", 2).alias("tag1"),
        F.element_at("scores", 1).alias("s_pos"),
        F.element_at("scores", 2).alias("s_neg"),
        F.col("info.name").alias("iname"),
        F.col("info.len").alias("ilen"))


@query("source_tfrecord", """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
""")
def source_tfrecord(spark, sf_dir):
    """TFRecord source (sources/tfrecord.py — the TF training-data
    framing: uint64 length + masked-CRC32C checksums on header AND
    payload, both VERIFIED on read; CRC32C pinned to the public
    RFC 3720 test vectors): nation rows are serialized as protobuf
    messages (sources/protobuf.py) inside REAL .tfrecord files and
    read back through tfrecord framing → protobuf decode — the exact
    composition a TF pipeline ships (Example protos in TFRecord),
    with no TensorFlow dependency. Oracle checks losslessness against
    the parquet original (sixth format)."""
    import os
    import tempfile

    from .sources.protobuf import decode_message, make_delimited
    from .sources.tfrecord import make_tfrecord, tfrecord_reader
    _, t = _s(spark, sf_dir)
    pb = {1: ("n_nationkey", "int64"), 2: ("n_name", "string"),
          3: ("n_regionkey", "int64")}
    rows = [{"n_nationkey": int(r[0]), "n_name": str(r[1]),
             "n_regionkey": int(r[2])} for r in
            t["nation"].select("n_nationkey", "n_name", "n_regionkey")
            .collect()]                    # 25 rows: metadata-scale
    from .sources.protobuf import encode_message
    d = tempfile.mkdtemp(prefix="bsq_tfr_")
    half = len(rows) // 2
    for fname, chunk in (("a.tfrecord", rows[:half]),
                         ("b.tfrecord", rows[half:])):
        with open(os.path.join(d, fname), "wb") as f:
            f.write(make_tfrecord(
                [encode_message(pb, r) for r in chunk]))
    recs = tfrecord_reader(spark, d)

    import pandas as pd

    def dec(batches):
        for pdf in batches:
            out = [decode_message(pb, bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                [(m["n_nationkey"], m["n_name"], m["n_regionkey"])
                 for m in out],
                columns=["n_nationkey", "n_name", "n_regionkey"])

    return recs.mapInPandas(
        dec, schema="n_nationkey long, n_name string, n_regionkey long")


@query("source_webdataset", """
    SELECT * FROM (VALUES
        ('train/000', 2, 'cls,txt', 'sample zero text', 17),
        ('train/001', 2, 'cls,txt', 'sample one text', 16),
        ('train/002', 2, 'cls,txt', 'sample two text', 16))
        t(key, n_parts, exts, txt, total_bytes)
""")
def source_webdataset(spark, sf_dir):
    """WebDataset sample grouping (sources/webdataset_samples): tar
    members named <key>.<ext> group into one row per training sample
    with a parts map — the multimodal-shard convention (img.jpg +
    img.json + img.cls per key). The fixture tar holds three samples
    of (txt, cls) parts; the entry projects deterministic scalars from
    the map (part count, sorted ext list, the txt payload, total
    bytes) and the oracle states them verbatim."""
    import io
    import os
    import tarfile
    import tempfile

    from .sources import webdataset_samples
    files = []
    for i, word in enumerate(("zero", "one", "two")):
        files.append((f"train/{i:03d}.txt",
                      f"sample {word} text".encode()))
        files.append((f"train/{i:03d}.cls", b"7"))
    d = os.path.join(tempfile.gettempdir(), "bsq_wds_fixture")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, "shard0.tar")
    if not os.path.exists(p):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for name, body in files:
                info = tarfile.TarInfo(name=name)
                info.size = len(body)
                tf.addfile(info, io.BytesIO(body))
        tmp = p + ".tmp"
        with open(tmp, "wb") as f:
            f.write(buf.getvalue())
        os.replace(tmp, p)
    s = webdataset_samples(spark, d)
    parts = F.col("parts")
    return s.select(
        "key",
        F.size(parts).cast("int").alias("n_parts"),
        F.array_join(F.array_sort(F.map_keys(parts)), ",")
        .alias("exts"),
        F.element_at(parts, "txt").cast("string").alias("txt"),
        F.aggregate(F.map_values(parts), F.lit(0),
                    lambda a, b: a + F.octet_length(b)).cast("int")
        .alias("total_bytes"))


def _dhash_sql_cte(pred: str = "doc_id % 5 = 2") -> str:
    """Shared replay of the dHash pipeline (used by both image-hash
    oracles): closed-form 18x16 RGB pixels per doc (base pattern =
    doc_id//10, per-doc perturbation column at x=8 scaled by
    doc_id%10) → exact 2x2 integer box means per channel → integer
    ITU-601 luma → gradient bits → signed 64-bit pack (bit 63 maps to
    the sign contribution, keeping everything BIGINT)."""
    return f"""
    d AS (SELECT doc_id, doc_id // 10 AS base, doc_id % 10 AS dd
          FROM documents WHERE {pred}),
    px AS (SELECT doc_id,
                  x.x AS x, y.y AS y,
                  (base*53 + x.x*x.x*13 + y.y*29 + x.x*y.y*(base % 5)
                   + CASE WHEN x.x = 8 THEN dd*53 ELSE 0 END) % 256
                    AS r,
                  (base*13 + x.x*29 + y.y*y.y*53) % 256 AS g,
                  (base*29 + x.x*53 + y.y*13) % 256 AS bl
           FROM d,
                (SELECT unnest(range(0, 18)) AS x) x,
                (SELECT unnest(range(0, 16)) AS y) y),
    bx AS (SELECT doc_id, x // 2 AS cx, y // 2 AS cy,
                  CAST(sum(r) AS BIGINT) // 4 AS mr,
                  CAST(sum(g) AS BIGINT) // 4 AS mg,
                  CAST(sum(bl) AS BIGINT) // 4 AS mb
           FROM px GROUP BY doc_id, x // 2, y // 2),
    lum AS (SELECT doc_id, cx, cy,
                   (299*mr + 587*mg + 114*mb) // 1000 AS v
            FROM bx),
    bits AS (SELECT l.doc_id, l.cy*8 + l.cx AS pos,
                    l.v < r.v AS bit
             FROM lum l JOIN lum r
               ON l.doc_id = r.doc_id AND l.cy = r.cy
              AND r.cx = l.cx + 1
             WHERE l.cx < 8),
    hashes AS (SELECT doc_id,
                      CAST(sum(CASE WHEN NOT bit THEN 0
                               WHEN pos = 63
                               THEN -9223372036854775807 - 1
                               ELSE (CAST(1 AS BIGINT) << pos)
                               END) AS BIGINT) AS dhash
               FROM bits GROUP BY doc_id)"""


@query("image_dhash", f"""
    WITH {_dhash_sql_cte()}
    SELECT doc_id, dhash FROM hashes
""")
def image_dhash_q(spark, sf_dir):
    """Perceptual image hashing (operators/imagehash.py image_dhash —
    Krawetz dHash): every selected doc is rendered as a REAL 18x16
    PPM (closed-form pixels: per-decade base pattern + per-doc
    perturbation column), decoded, box-mean-shrunk to 9x8, integer-
    luma'd and gradient-packed into the classic signed 64-bit dHash.
    Every arithmetic step is exactly specified, so the oracle replays
    pixels → box means → luma → bits → pack in pure SQL; a defect in
    decode, resize, grayscale or packing breaks the hash column
    itself."""
    import pandas as pd

    from .operators.imagehash import image_dhash
    from .operators.multimodal import make_ppm
    _, t = _s(spark, sf_dir)

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["id"]:
                did = int(did)
                b, dd = did // 10, did % 10
                out = bytearray()
                for y in range(16):
                    for x in range(18):
                        r = (b*53 + x*x*13 + y*29 + x*y*(b % 5)
                             + (dd*53 if x == 8 else 0)) % 256
                        g = (b*13 + x*29 + y*y*53) % 256
                        bl = (b*29 + x*53 + y*13) % 256
                        out += bytes((r, g, bl))
                rows.append((did, bytearray(make_ppm(18, 16,
                                                     bytes(out)))))
            yield pd.DataFrame(rows, columns=["id", "media"])

    media = (t["documents"].filter(F.col("doc_id") % 5 == 2)
             .select(F.col("doc_id").alias("id"))
             .repartition(spark.sparkContext.defaultParallelism)
             .mapInPandas(gen, schema="id long, media binary"))
    return image_dhash(media).withColumnRenamed("id", "doc_id")


@query("image_dedup_phash", f"""
    WITH {_dhash_sql_cte()}
    SELECT h1.doc_id AS a, h2.doc_id AS b,
           CAST(bit_count(xor(h1.dhash, h2.dhash)) AS INT) AS hamming
    FROM hashes h1 JOIN hashes h2 ON h1.doc_id < h2.doc_id
    WHERE bit_count(xor(h1.dhash, h2.dhash)) <= 3
""")
def image_dedup_phash_q(spark, sf_dir):
    """Image near-dup pairs (operators/imagehash.py dhash_pairs): the
    dHashes band into 4 x 16-bit keys, a band-bucket self-join
    generates candidates (COMPLETE for hamming <= 3 by pigeonhole —
    no all-pairs join at any corpus size) and codegen popcount
    verifies. The synthetic corpus makes same-decade images perturbed
    copies (hamming <= 2) and cross-decade images far (>= 9), so the
    pair set is exactly the within-decade cliques; the oracle checks
    it with an explicit all-pairs hamming filter over the replayed
    hashes — LSH recall vs ground truth, value-hashed."""
    from .operators.imagehash import dhash_pairs
    hashes = QUERIES["image_dhash"](spark, sf_dir)
    return dhash_pairs(hashes, id_col="doc_id", max_hamming=3)


def _audio_fp_sql_cte(pred: str = "doc_id % 6 = 1") -> str:
    """Shared replay of the spectral fingerprint (both audio-hash
    oracles): closed-form 576-sample PCM per doc (base = doc_id//10,
    per-doc perturbation on sample 5 of every frame scaled by
    doc_id%10) → the exact-integer 8-bin DFT energies per frame →
    frame-gradient sign bits → signed 64-bit pack."""
    bins = tuple(range(1, 9))
    sums, outs = _dft_sql_parts(64, bins)
    x = ("((doc_id // 10) * 61 + 19*pos*pos + 5*pos) % 4001 - 2000 "
         "+ CASE WHEN pos % 64 = 5 THEN (doc_id % 10) * 40 ELSE 0 END")
    terms = []
    for i in range(8):
        k = bins[i]
        shift = (f"CASE WHEN a.frame = 7 AND {i} = 7 "
                 f"THEN -9223372036854775807 - 1 "
                 f"ELSE CAST(1 AS BIGINT) << (a.frame * 8 + {i}) END")
        terms.append(f"CASE WHEN a.e{k} < b.e{k} THEN {shift} "
                     f"ELSE 0 END")
    return f"""
    d AS (SELECT doc_id FROM documents WHERE {pred}),
    p AS (SELECT unnest(range(0, 576)) AS pos),
    s AS (SELECT doc_id, pos, {x} AS x FROM d, p),
    f AS (SELECT doc_id, pos // 64 AS frame,
                 CAST(pos % 64 AS INT) + 1 AS i, x
          FROM s),
    g AS (SELECT doc_id, frame, {', '.join(sums)}
          FROM f GROUP BY doc_id, frame),
    e AS (SELECT doc_id, frame, {', '.join(outs)} FROM g),
    fps AS (SELECT a.doc_id,
                   CAST(sum({' + '.join(terms)}) AS BIGINT) AS fp
            FROM e a JOIN e b
              ON a.doc_id = b.doc_id AND b.frame = a.frame + 1
            WHERE a.frame <= 7
            GROUP BY a.doc_id)"""


@query("audio_fingerprint", f"""
    WITH {_audio_fp_sql_cte()}
    SELECT doc_id, fp FROM fps
""")
def audio_fingerprint_q(spark, sf_dir):
    """Spectral fingerprinting (operators/audio.py
    spectral_fingerprint — the Haitsma-Kalker sign-of-band-gradient
    recipe over the exact-integer DFT): 9 frames x 8 bins → 64
    gradient-sign bits → one signed BIGINT per clip, entirely in
    codegen (band_energy's partial-agg exchange + one window). The
    clip corpus makes same-decade docs perturbed copies of one
    signal; the oracle replays PCM → energies → gradient bits → pack
    and hashes the fingerprint column itself."""
    from .operators.audio import spectral_fingerprint
    _, t = _s(spark, sf_dir)
    d = F.col("doc_id")
    idx = F.sequence(F.lit(0), F.lit(575))
    clips = (t["documents"].filter(d % 6 == 1)
             .select(d.alias("id"),
                     F.transform(
                         idx,
                         lambda i: (((d / 10).cast("long") * 61
                                     + 19 * i * i + 5 * i) % 4001
                                    - 2000
                                    + F.when(i % 64 == 5,
                                             (d % 10) * 40)
                                    .otherwise(F.lit(0))).cast("int"))
                     .alias("samples")))
    out = spectral_fingerprint(clips, frame_len=64)
    return out.withColumnRenamed("id", "doc_id")


@query("audio_dedup_fp", f"""
    WITH {_audio_fp_sql_cte()}
    SELECT h1.doc_id AS a, h2.doc_id AS b,
           CAST(bit_count(xor(h1.fp, h2.fp)) AS INT) AS hamming
    FROM fps h1 JOIN fps h2 ON h1.doc_id < h2.doc_id
    WHERE bit_count(xor(h1.fp, h2.fp)) <= 3
""")
def audio_dedup_fp_q(spark, sf_dir):
    """Audio near-dup pairs: the spectral fingerprints reuse the SAME
    banded hamming machinery as images (imagehash.dhash_pairs,
    hash_col='fp' — complete for hamming <= 3 by pigeonhole, no
    all-pairs join); perturbed same-decade clips pair up (measured
    <= 3 bits apart), unrelated clips stay far (>= 9). The oracle is
    the explicit all-pairs ground truth over the replayed
    fingerprints — LSH recall, value-hashed (the image_dedup_phash
    contract, audio edition)."""
    from .operators.imagehash import dhash_pairs
    fps = QUERIES["audio_fingerprint"](spark, sf_dir)
    return dhash_pairs(fps, id_col="doc_id", hash_col="fp",
                       max_hamming=3)


def _video_dhash_cte(pred: str = "doc_id % 7 = 3") -> str:
    """Shared replay of the video-frame dHash pipeline (both video
    oracles): closed-form 24-color palette rasters per (doc, frame) —
    4 frames, base pattern = doc_id//10, frame-0 perturbation scaled
    by doc_id%10 — → 2x2 integer box means → integer luma → gradient
    bits → signed 64-bit pack per frame (GIF is lossless, so the
    decoded rasters ARE the closed form)."""
    return f"""
    d AS (SELECT doc_id, doc_id // 10 AS base, doc_id % 10 AS dd
          FROM documents WHERE {pred}),
    fr AS (SELECT unnest(range(0, 4)) AS f),
    px AS (SELECT doc_id, f, x.x AS x, y.y AS y,
                  (x.x + 2*y.y + base*5 + f*11
                   + CASE WHEN x.x = 8 AND f = 0
                     THEN dd*3 ELSE 0 END) % 24 AS c
           FROM d, fr,
                (SELECT unnest(range(0, 18)) AS x) x,
                (SELECT unnest(range(0, 16)) AS y) y),
    rgb AS (SELECT doc_id, f, x, y,
                   (c*37) % 256 AS r, (c*59 + 7) % 256 AS g,
                   (c*83 + 13) % 256 AS bl
            FROM px),
    bx AS (SELECT doc_id, f, x // 2 AS cx, y // 2 AS cy,
                  CAST(sum(r) AS BIGINT) // 4 AS mr,
                  CAST(sum(g) AS BIGINT) // 4 AS mg,
                  CAST(sum(bl) AS BIGINT) // 4 AS mb
           FROM rgb GROUP BY doc_id, f, x // 2, y // 2),
    lum AS (SELECT doc_id, f, cx, cy,
                   (299*mr + 587*mg + 114*mb) // 1000 AS v
            FROM bx),
    bits AS (SELECT l.doc_id, l.f, l.cy*8 + l.cx AS pos,
                    l.v < r.v AS bit
             FROM lum l JOIN lum r
               ON l.doc_id = r.doc_id AND l.f = r.f
              AND l.cy = r.cy AND r.cx = l.cx + 1
             WHERE l.cx < 8),
    vhashes AS (SELECT doc_id, CAST(f AS INT) AS frame_idx,
                       CAST(sum(CASE WHEN NOT bit THEN 0
                                WHEN pos = 63
                                THEN -9223372036854775807 - 1
                                ELSE (CAST(1 AS BIGINT) << pos)
                                END) AS BIGINT) AS dhash
                FROM bits GROUP BY doc_id, f)"""


@query("video_dhash", f"""
    WITH {_video_dhash_cte()}
    SELECT doc_id, frame_idx, dhash FROM vhashes
""")
def video_dhash_q(spark, sf_dir):
    """Per-frame video hashing (operators/imagehash.py video_dhash):
    each doc becomes a REAL 4-frame animated GIF (24-color closed-form
    rasters; GIF is lossless so decode returns the exact pixels),
    frame_sample(fake=False) composites the frames and every raster
    gets the 64-bit dHash. The oracle replays pixels → box means →
    luma → pack per (doc, frame) — decode, composition, geometry and
    hashing all gate one value-hash."""
    import pandas as pd

    from .operators.gif import make_gif
    from .operators.imagehash import video_dhash
    _, t = _s(spark, sf_dir)

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["id"]:
                did = int(did)
                base, dd = did // 10, did % 10
                frames = []
                for f in range(4):
                    out = bytearray()
                    for y in range(16):
                        for x in range(18):
                            c = (x + 2*y + base*5 + f*11
                                 + (dd*3 if x == 8 and f == 0
                                    else 0)) % 24
                            out += bytes(((c*37) % 256,
                                          (c*59 + 7) % 256,
                                          (c*83 + 13) % 256))
                    frames.append(bytes(out))
                rows.append((did, bytearray(make_gif(18, 16, frames))))
            yield pd.DataFrame(rows, columns=["id", "media"])

    media = (t["documents"].filter(F.col("doc_id") % 7 == 3)
             .select(F.col("doc_id").alias("id"))
             .repartition(spark.sparkContext.defaultParallelism)
             .mapInPandas(gen, schema="id long, media binary"))
    return video_dhash(media, width=18, height=16) \
        .withColumnRenamed("id", "doc_id")


@query("video_dedup", f"""
    WITH {_video_dhash_cte()}
    SELECT h1.doc_id AS a, h2.doc_id AS b,
           CAST(count(*) AS BIGINT) AS shared_frames
    FROM vhashes h1 JOIN vhashes h2
      ON h1.frame_idx = h2.frame_idx AND h1.dhash = h2.dhash
     AND h1.doc_id < h2.doc_id
    GROUP BY h1.doc_id, h2.doc_id
    HAVING count(*) >= 3
""")
def video_dedup_q(spark, sf_dir):
    """Video near-dup pairs (operators/imagehash.py video_pairs):
    clips pair when >= 3 of their 4 same-position frame hashes match
    exactly — same-decade clips share frames 1-3 by construction
    (only frame 0 carries the per-doc perturbation), cross-decade
    clips share none (measured 0). Equi-join on (frame_idx, dhash) +
    count — no all-pairs join at any corpus size. The perceptual
    dedup family now covers text, images, audio AND video."""
    from .operators.imagehash import video_pairs
    frames = QUERIES["video_dhash"](spark, sf_dir)
    return video_pairs(frames, id_col="doc_id", min_shared=3)


_EVAL_SCORED = """
      SELECT doc_id,
             CAST((doc_id * 37) % 100 AS DOUBLE) / 100.0 AS score,
             CASE WHEN (doc_id * 53) % 100
                  < 40 + ((doc_id * 37) % 100) // 2
                  THEN 1 ELSE 0 END AS label
      FROM documents"""


@query("classifier_eval", f"""
    WITH scored AS ({_EVAL_SCORED}),
    g AS (SELECT
        CAST(sum(CASE WHEN score >= 0.3 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp0,
        CAST(sum(CASE WHEN score >= 0.3 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp0,
        CAST(sum(CASE WHEN score < 0.3 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn0,
        CAST(sum(CASE WHEN score < 0.3 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn0,
        CAST(sum(CASE WHEN score >= 0.5 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp1,
        CAST(sum(CASE WHEN score >= 0.5 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp1,
        CAST(sum(CASE WHEN score < 0.5 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn1,
        CAST(sum(CASE WHEN score < 0.5 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn1,
        CAST(sum(CASE WHEN score >= 0.7 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp2,
        CAST(sum(CASE WHEN score >= 0.7 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp2,
        CAST(sum(CASE WHEN score < 0.7 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn2,
        CAST(sum(CASE WHEN score < 0.7 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn2
      FROM scored),
    rows_out AS (
      SELECT CAST(0.3 AS DOUBLE) AS threshold, tp0 AS tp, fp0 AS fp,
             fn0 AS fn, tn0 AS tn FROM g
      UNION ALL
      SELECT CAST(0.5 AS DOUBLE), tp1, fp1, fn1, tn1 FROM g
      UNION ALL
      SELECT CAST(0.7 AS DOUBLE), tp2, fp2, fn2, tn2 FROM g)
    SELECT threshold, tp, fp, fn, tn,
           CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS precision,
           CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) AS recall,
           2.0 * CAST(tp AS DOUBLE)
             / CAST(2 * tp + fp + fn AS DOUBLE) AS f1
    FROM rows_out
""")
def classifier_eval_q(spark, sf_dir):
    """Classifier PR battery (operators/classify.py eval_thresholds —
    the eval loop every quality-classifier pipeline runs before
    picking its filter cut): exact integer confusion counts at three
    thresholds in ONE conditional-aggregation pass, with
    precision/recall/f1 derived from the same integers on both
    engines. Scores/labels are deterministic correlated expressions
    over documents; the oracle replays counts and ratios verbatim."""
    from .operators.classify import eval_thresholds
    _, t = _s(spark, sf_dir)
    d = F.col("doc_id")
    scored = t["documents"].select(
        (((d * 37) % 100).cast("double") / 100.0).alias("score"),
        F.when((d * 53) % 100 < 40 + F.floor(((d * 37) % 100) / 2),
               1).otherwise(0).alias("label"))
    return eval_thresholds(scored, thresholds=(0.3, 0.5, 0.7))


@query("classifier_auc", f"""
    WITH scored AS ({_EVAL_SCORED}),
    per AS (SELECT score, CAST(count(*) AS BIGINT) AS cnt,
                   CAST(sum(label) AS BIGINT) AS np
            FROM scored GROUP BY score),
    ranked AS (SELECT score, cnt, np,
                      CAST(coalesce(sum(cnt) OVER
                           (ORDER BY score ROWS BETWEEN UNBOUNDED
                            PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                        AS before
               FROM per),
    agg AS (SELECT CAST(sum(np * (2 * (before + 1) + cnt - 1))
                        AS BIGINT) AS s2,
                   CAST(sum(np) AS BIGINT) AS n_pos,
                   CAST(sum(cnt - np) AS BIGINT) AS n_neg
            FROM ranked)
    SELECT n_pos, n_neg,
           s2 - n_pos * (n_pos + 1) AS auc_num,
           2 * n_pos * n_neg AS auc_den,
           CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE)
             / CAST(2 * n_pos * n_neg AS DOUBLE) AS auc
    FROM agg
""")
def classifier_auc_q(spark, sf_dir):
    """Exact ROC-AUC (operators/classify.py exact_auc): the tie-aware
    Mann-Whitney statistic over midranks, computed as an exact int64
    rational (auc_num/auc_den) with the running rank from the
    two-level distributed prefix sum (packing.global_prefix_sum) —
    never a corpus-scale single-partition window. Validated against
    all-pairs counting in tests; the oracle replays midranks and the
    rational in SQL."""
    from .operators.classify import exact_auc
    _, t = _s(spark, sf_dir)
    d = F.col("doc_id")
    scored = t["documents"].select(
        (((d * 37) % 100).cast("double") / 100.0).alias("score"),
        F.when((d * 53) % 100 < 40 + F.floor(((d * 37) % 100) / 2),
               1).otherwise(0).alias("label"))
    return exact_auc(scored)


@query("source_arrow_ipc", """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
""")
def source_arrow_ipc(spark, sf_dir):
    """Arrow IPC / Feather-v2 source (sources/arrow_ipc_reader): the
    Arrow-ecosystem interchange format (Feather, Polars, Ray) —
    nation is written as REAL .arrow files (two files, multiple
    record batches each) and read back through pyarrow's zero-copy
    file reader with the DDL pinned and name-checked; the oracle
    checks losslessness against the parquet original (seventh
    format)."""
    import io
    import os
    import tempfile

    import pyarrow as pa

    from .sources import arrow_ipc_reader
    _, t = _s(spark, sf_dir)
    rows = [(int(r[0]), str(r[1]), int(r[2])) for r in
            t["nation"].select("n_nationkey", "n_name", "n_regionkey")
            .collect()]                    # 25 rows: metadata-scale
    schema = pa.schema([("n_nationkey", pa.int64()),
                        ("n_name", pa.string()),
                        ("n_regionkey", pa.int64())])
    d = tempfile.mkdtemp(prefix="bsq_arrow_")
    half = len(rows) // 2
    for fname, chunk in (("a.arrow", rows[:half]),
                         ("b.arrow", rows[half:])):
        buf = io.BytesIO()
        with pa.ipc.new_file(buf, schema) as w:
            for at in range(0, len(chunk), 7):   # multi-batch files
                part = chunk[at:at + 7]
                w.write_batch(pa.record_batch(
                    [pa.array([r[i] for r in part])
                     for i in range(3)], schema=schema))
        with open(os.path.join(d, fname), "wb") as f:
            f.write(buf.getvalue())
    return arrow_ipc_reader(
        spark, d, "n_nationkey long, n_name string, n_regionkey long")


_UNI_PAIRED = (r"SELECT doc_id, regexp_replace(text, "
               r"'(\S+) (\S+)( |$)', '\1\2\3', 'g') AS text "
               r"FROM documents")


def _unigram_base_ctes(seed_top: int = 200, max_piece: int = 4,
                       max_word_len: int = 16) -> str:
    """corpus → wc (capped word counts) → seed (piece counts):
    the shared head of both unigram oracles. Word-pairing is the
    entries' codegen synthesis (compounds give the segmenter real
    work on this single-word corpus)."""
    return f"""
    corpus AS ({_UNI_PAIRED}),
    wc AS MATERIALIZED (
      SELECT word, n FROM (
        SELECT word, CAST(count(*) AS BIGINT) AS n FROM (
          SELECT unnest(list_filter(string_split_regex(lower(text),
                                                       '\\s+'),
                                    t -> t <> '')) AS word
          FROM corpus)
        WHERE length(word) <= {max_word_len}
        GROUP BY word HAVING count(*) >= 2)
      ORDER BY n DESC, word LIMIT 65536),
    subs AS (
      SELECT substring(w.word, i.i, l.l) AS piece, w.n
      FROM wc w,
           (SELECT unnest(range(1, {max_word_len + 1})) AS i) i,
           (SELECT unnest(range(1, {max_piece + 1})) AS l) l
      WHERE i.i + l.l - 1 <= length(w.word)),
    pc AS MATERIALIZED (
      SELECT piece, CAST(sum(n) AS BIGINT) AS cnt
      FROM subs GROUP BY piece),
    seed AS MATERIALIZED (
      SELECT piece, cnt FROM pc WHERE length(piece) = 1
      UNION ALL
      SELECT piece, cnt FROM (
        SELECT piece, cnt FROM pc WHERE length(piece) > 1
        ORDER BY cnt DESC, piece LIMIT {seed_top}))"""


def _unigram_dp_ctes(words_rel: str, vocab_rel: str,
                     max_piece: int = 4,
                     max_word_len: int = 16) -> str:
    """The Viterbi chain over ``words_rel`` (word, n) under
    ``vocab_rel`` (piece, cnt): candidate splits join the vocabulary,
    D{{j}} accumulates best (score, backpointer) per position with
    the exact integer objective -(pieces<<40)+Σcnt and smallest-i
    tiebreak, then sp{{k}} CTEs trace the path back emitting pieces —
    ``segp`` = (word, n, piece) one row per used piece."""
    big = 1 << 40
    ctes = [f"""cand AS MATERIALIZED (
      SELECT w.word, i.i - 1 AS i0, i.i + l.l - 1 AS j1, v.cnt
      FROM {words_rel} w,
           (SELECT unnest(range(1, {max_word_len + 1})) AS i) i,
           (SELECT unnest(range(1, {max_piece + 1})) AS l) l
      JOIN {vocab_rel} v
        ON v.piece = substring(w.word, i.i, l.l)
      WHERE i.i + l.l - 1 <= length(w.word))""",
            f"""d0 AS (SELECT word, 0 AS pos, CAST(0 AS BIGINT)
                       AS best, 0 AS bi FROM {words_rel})""",
            "dd0 AS (SELECT * FROM d0)"]
    for j in range(1, max_word_len + 1):
        ctes.append(f"""s{j} AS (
      SELECT c.word, c.i0 AS i, p.best - {big} + c.cnt AS sc
      FROM cand c JOIN dd{j - 1} p
        ON p.word = c.word AND p.pos = c.i0
      WHERE c.j1 = {j})""")
        ctes.append(f"""d{j} AS (
      SELECT word, {j} AS pos, sc AS best, i AS bi FROM (
        SELECT word, i, sc,
               row_number() OVER (PARTITION BY word
                                  ORDER BY sc DESC, i ASC) AS rn
        FROM s{j}) WHERE rn = 1)""")
        ctes.append(f"""dd{j} AS MATERIALIZED (
      SELECT * FROM dd{j - 1} UNION ALL SELECT * FROM d{j})""")
    D = f"dd{max_word_len}"
    ctes.append(f"""sp0 AS (SELECT word, n, length(word) AS j
                            FROM {words_rel})""")
    emits = []
    for k in range(1, max_word_len + 1):
        ctes.append(f"""e{k} AS MATERIALIZED (
      SELECT c.word, c.n, d.bi, c.j
      FROM sp{k - 1} c JOIN {D} d
        ON d.word = c.word AND d.pos = c.j
      WHERE c.j > 0)""")
        ctes.append(f"""sp{k} AS (SELECT word, n, bi AS j
                                  FROM e{k})""")
        emits.append(f"SELECT word, n, substring(word, bi + 1, "
                     f"j - bi) AS piece FROM e{k}")
    ctes.append("segp AS MATERIALIZED (\n      "
                + "\n      UNION ALL ".join(emits) + ")")
    return ",\n    ".join(ctes)


@query("unigram_vocab", f"""
    WITH {_unigram_base_ctes()},
    {_unigram_dp_ctes("wc", "seed")},
    recount AS (
      SELECT piece, CAST(sum(n) AS BIGINT) AS cnt
      FROM segp GROUP BY piece),
    kept AS (
      SELECT piece, cnt FROM recount
      WHERE length(piece) = 1 OR cnt >= 2),
    chars AS (
      SELECT DISTINCT substring(w.word, i.i, 1) AS piece
      FROM wc w, (SELECT unnest(range(1, 17)) AS i) i
      WHERE i.i <= length(w.word))
    SELECT piece, cnt FROM kept
    UNION ALL
    SELECT c.piece, CAST(0 AS BIGINT) AS cnt FROM chars c
    WHERE NOT EXISTS (SELECT 1 FROM kept k WHERE k.piece = c.piece)
""")
def unigram_vocab_q(spark, sf_dir):
    """Unigram-tokenizer training (operators/unigram.py — the
    SentencePiece-unigram family with the repo's exactly-specified
    integer objective: Viterbi = fewest pieces, then highest summed
    piece count, then longest-piece tiebreak, packed as one int64):
    adjacent words pair into compounds in codegen (the segmenter gets
    real splitting work), the seed vocabulary counts every substring
    distributively, and ONE hard-EM round segments the capped word
    table and recounts. The oracle replays the whole machine in SQL —
    seed CTEs, the 16-position cumulative DP with the same integer
    score and tiebreak, the traceback, and the M-step recount with
    single-char coverage — so a defect anywhere in objective,
    tiebreak or counting breaks the vocabulary hash itself (the
    bpe_merges contract, unigram edition)."""
    from .operators.unigram import train_unigram
    _, t = _s(spark, sf_dir)
    paired = t["documents"].select(
        "doc_id",
        F.regexp_replace(F.col("text"), r"(\S+) (\S+)( |$)",
                         "$1$2$3").alias("text"))
    vocab_df, _counts = train_unigram(paired, iters=1, seed_top=200)
    return vocab_df


@query("unigram_tokens", f"""
    WITH {_unigram_base_ctes()},
    dw AS MATERIALIZED (
      SELECT word, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text),
                                                     '\\s+'),
                                  t -> t <> '')) AS word
        FROM corpus)
      GROUP BY word),
    {_unigram_dp_ctes("dw", "seed")},
    per_word AS (
      SELECT word, CAST(count(*) AS INT) AS n_tok
      FROM segp GROUP BY word),
    exploded AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text),
                                                   '\\s+'),
                                t -> t <> '')) AS word
      FROM corpus)
    SELECT e.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(p.n_tok) AS BIGINT) AS n_tokens
    FROM exploded e JOIN per_word p ON p.word = e.word
    GROUP BY e.doc_id
""")
def unigram_tokens_q(spark, sf_dir):
    """Corpus-scale unigram token counting (operators/unigram.py
    unigram_token_counts — the bpe_token_counts shape: DISTINCT words
    segment once, counts broadcast-join back, no Python over corpus
    rows): per-doc word and token counts under the SEED vocabulary
    (iters=0 — the encode machine isolated from EM). The oracle runs
    the same DP over the distinct-word relation and joins the
    per-word piece counts back through the corpus."""
    from .operators.unigram import (train_unigram,
                                    unigram_token_counts)
    _, t = _s(spark, sf_dir)
    paired = t["documents"].select(
        "doc_id",
        F.regexp_replace(F.col("text"), r"(\S+) (\S+)( |$)",
                         "$1$2$3").alias("text"))
    _vocab_df, counts = train_unigram(paired, iters=0, seed_top=200)
    return unigram_token_counts(paired, counts)


@query("stream_quality_filter", """
    WITH page AS (
      SELECT doc_id,
             substr(text, 1, 50) || '.' || chr(10)
             || 'It works! Does it? Yes it does.' AS text
      FROM documents),
    feat AS (
      SELECT doc_id, text,
             list_filter(list_transform(string_split(text, chr(10)),
                                        l -> trim(l)),
                 l -> l <> ''
                 AND (l LIKE '%.' OR l LIKE '%!' OR l LIKE '%?'
                      OR l LIKE '%"')
                 AND len(list_filter(string_split_regex(l, '\\s+'),
                                     w -> w <> '')) >= 5
                 AND lower(l) NOT LIKE '%javascript%') AS kl
      FROM page),
    scored AS (
      SELECT doc_id,
             CAST(len(kl) AS BIGINT) AS n_kept,
             CAST((length(array_to_string(kl, chr(10)))
                   - length(replace(array_to_string(kl, chr(10)),
                                    '.', '')))
                  + (length(array_to_string(kl, chr(10)))
                     - length(replace(array_to_string(kl, chr(10)),
                                      '!', '')))
                  + (length(array_to_string(kl, chr(10)))
                     - length(replace(array_to_string(kl, chr(10)),
                                      '?', ''))) AS BIGINT)
               AS n_sentences
      FROM feat)
    SELECT doc_id, n_kept, n_sentences FROM scored
    WHERE n_sentences >= 3
""")
def stream_quality_filter_q(spark, sf_dir):
    """The C4 quality battery ON A STREAM (streaming ingest is where
    corpus filters actually run in production): c4_filters is a pure
    codegen projection, so it applies to a readStream DataFrame
    unchanged — per-micro-batch filtering with zero state, the
    embarrassingly-streaming class. Pages are synthesized in codegen
    (one kept prose line + the 3-sentence closer; 4 total sentences
    for docs whose first line survives); docs failing the
    min-sentences cut drop inside the stream. One micro-batch over
    the finite source == the batch filter, which the oracle replays."""
    from .operators.text import c4_filters
    from .streaming import run_to_completion, stream_documents
    docs = stream_documents(spark, sf_dir)
    page = F.concat(
        F.substring(F.col("text"), 1, 50), F.lit(".\n"),
        F.lit("It works! Does it? Yes it does."))
    out = c4_filters(docs.select("doc_id", page.alias("text")))
    keep = (out.filter(F.col("r_min_sentences"))
            .select("doc_id", "n_kept", "n_sentences"))
    return run_to_completion(keep, "bs_stream_quality",
                             output_mode="append")


@query("source_avro_complex", """
    SELECT n_nationkey,
           CAST(2 AS INT) AS n_tags,
           't' || CAST(n_nationkey % 3 AS VARCHAR) AS tag0,
           CAST(n_nationkey % 7 AS BIGINT) AS pk,
           CAST(n_regionkey AS BIGINT) AS pr,
           n_name AS iname,
           CAST(length(n_name) AS BIGINT) AS ilen,
           substring('ABC', CAST(n_nationkey % 3 AS INT) + 1, 1)
             AS grade,
           printf('%08X', n_nationkey) AS fph,
           CASE WHEN n_nationkey % 2 = 0 THEN NULL
                ELSE 'c' || CAST(n_nationkey AS VARCHAR) END AS maybe
    FROM nation
""")
def source_avro_complex_q(spark, sf_dir):
    """Avro complex types + snappy (sources/avro.py, round-12
    extension per VERDICT r11 task 4): nation-derived rows carrying an
    array<string>, a map<string,long>, a nested record, an ENUM
    (int symbol index → symbol string), a FIXED (4 raw bytes,
    hex-projected), and a VALUE-FIRST null union (["string","null"] —
    branch index is the position in the union array, the ADVICE r11
    branch-order fix) are
    written to real .avro files under the SNAPPY codec (clean-room
    pure-Python block-format decode + big-endian CRC32 trailer, per
    the Avro spec) and deflate, read back through the
    binaryFile+Arrow reader with a complex pinned DDL (commas inside
    map/struct types exercise the real DDL parser), and projected to
    scalars so the oracle can replay every leaf analytically."""
    import json
    import os
    import tempfile

    from .sources.avro import avro_reader, make_avro
    _, t = _s(spark, sf_dir)
    rows = []
    for r in (t["nation"].select("n_nationkey", "n_name",
                                 "n_regionkey").collect()):
        k, name, reg = int(r[0]), str(r[1]), int(r[2])
        rows.append((
            k,
            [f"t{k % 3}", f"t{k % 5}"],
            {"k": k % 7, "r": reg},
            {"name": name, "len": len(name)},
            "ABC"[k % 3],
            k.to_bytes(4, "big"),
            None if k % 2 == 0 else f"c{k}"))
    sch = json.dumps({
        "type": "record", "name": "nation_plus", "fields": [
            {"name": "n_nationkey", "type": "long"},
            {"name": "tags", "type": {"type": "array",
                                      "items": "string"}},
            {"name": "props", "type": {"type": "map",
                                       "values": "long"}},
            {"name": "info", "type": {
                "type": "record", "name": "info_t", "fields": [
                    {"name": "name", "type": "string"},
                    {"name": "len", "type": "long"}]}},
            {"name": "grade", "type": {"type": "enum", "name": "G",
                                       "symbols": ["A", "B", "C"]}},
            {"name": "fp", "type": {"type": "fixed", "name": "F4",
                                    "size": 4}},
            {"name": "maybe", "type": ["string", "null"]}]})
    d = tempfile.mkdtemp(prefix="bsq_avroc_")
    half = len(rows) // 2
    for fname, chunk, codec in (
            ("a.avro", rows[:half], "snappy"),
            ("b.avro", rows[half:], "deflate")):
        with open(os.path.join(d, fname), "wb") as f:
            f.write(make_avro(sch, chunk, codec=codec, block_rows=7))
    df = avro_reader(
        spark, d,
        "n_nationkey long, tags array<string>, "
        "props map<string,long>, info struct<name:string,len:long>, "
        "grade string, fp binary, maybe string")
    return df.select(
        "n_nationkey",
        F.size("tags").alias("n_tags"),
        F.element_at("tags", 1).alias("tag0"),
        F.col("props").getItem("k").alias("pk"),
        F.col("props").getItem("r").alias("pr"),
        F.col("info.name").alias("iname"),
        F.col("info.len").alias("ilen"),
        F.col("grade"),
        F.hex("fp").alias("fph"),
        F.col("maybe"))


@query("source_avro_zstd", """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
""")
def source_avro_zstd(spark, sf_dir):
    """Avro zstd codec (sources/zstd.py — clean-room RFC 8878
    Zstandard, VERDICT r12 task 7 resolved as BUILD: raw/RLE/
    compressed blocks, 1- and 4-stream Huffman literals with direct or
    FSE-compressed weights, all four sequence-table modes, repeat
    offsets, xxhash64 frame checksums; the decoder is validated
    against the REFERENCE zstd binary's output at levels 1-19 and the
    fixture encoder's output is decoded byte-exactly by the reference
    binary — tests/test_zstd.py): nation is written to REAL .avro
    files under the zstd codec (one zstd frame per Avro block, per the
    Avro spec) plus one deflate file for mixed-codec reading, and read
    back through the binaryFile+Arrow reader with the schema pinned;
    the oracle checks losslessness against the parquet original (the
    source_avro contract, zstd edition)."""
    import json
    import os
    import tempfile

    from .sources.avro import avro_reader, make_avro
    _, t = _s(spark, sf_dir)
    rows = [(int(r[0]), str(r[1]), int(r[2])) for r in
            t["nation"].select("n_nationkey", "n_name", "n_regionkey")
            .collect()]                    # 25 rows: metadata-scale
    sch = json.dumps({
        "type": "record", "name": "nation", "fields": [
            {"name": "n_nationkey", "type": "long"},
            {"name": "n_name", "type": "string"},
            {"name": "n_regionkey", "type": "long"}]})
    d = tempfile.mkdtemp(prefix="bsq_avroz_")
    half = len(rows) // 2
    for fname, chunk, codec in (
            ("a.avro", rows[:half], "zstd"),
            ("b.avro", rows[half:], "deflate")):
        with open(os.path.join(d, fname), "wb") as f:
            f.write(make_avro(sch, chunk, codec=codec, block_rows=7))
    return avro_reader(
        spark, d,
        "n_nationkey long, n_name string, n_regionkey long")


@query("source_avro_logical", """
    SELECT n_nationkey,
           CAST(12345.67 AS DECIMAL(12,2))
             + CAST(n_nationkey AS DECIMAL(12,2)) AS amount,
           CAST(DATE '2020-01-01'
                + INTERVAL (n_nationkey * 37) DAY AS DATE) AS d,
           TIMESTAMP '2021-06-01 12:30:45.123456'
             + INTERVAL (n_nationkey) SECOND AS ts
    FROM nation
""")
def source_avro_logical(spark, sf_dir):
    """Avro LOGICAL TYPES (sources/avro.py, r13): decimal
    (bytes-backed big-endian two's-complement unscaled int), date
    (epoch days) and timestamp-micros (epoch micros) — the annotations
    production Avro puts on every money/event column — decode to real
    Spark decimal/date/timestamp columns; unknown or invalid
    annotations fall back to the base type per the spec. nation-derived
    rows are written to a REAL .avro file under deflate and read back
    with the pinned typed DDL; the oracle re-synthesizes the same
    values with DuckDB's native DECIMAL/DATE/TIMESTAMP arithmetic, so
    the value hash proves cross-engine type semantics, not just byte
    round-trip."""
    import datetime
    import json
    import os
    import tempfile
    from decimal import Decimal

    from .sources.avro import avro_reader, make_avro
    _, t = _s(spark, sf_dir)
    keys = [int(r[0]) for r in
            t["nation"].select("n_nationkey").collect()]
    d0 = datetime.date(2020, 1, 1)
    t0 = datetime.datetime(2021, 6, 1, 12, 30, 45, 123456)
    rows = [(k,
             Decimal("12345.67") + k,
             d0 + datetime.timedelta(days=k * 37),
             t0 + datetime.timedelta(seconds=k)) for k in keys]
    sch = json.dumps({
        "type": "record", "name": "ledger", "fields": [
            {"name": "n_nationkey", "type": "long"},
            {"name": "amount", "type": {
                "type": "bytes", "logicalType": "decimal",
                "precision": 12, "scale": 2}},
            {"name": "d", "type": {"type": "int",
                                   "logicalType": "date"}},
            {"name": "ts", "type": {
                "type": "long",
                "logicalType": "timestamp-micros"}}]})
    dd = tempfile.mkdtemp(prefix="bsq_avrol_")
    with open(os.path.join(dd, "a.avro"), "wb") as f:
        f.write(make_avro(sch, rows, codec="deflate", block_rows=7))
    return avro_reader(
        spark, dd,
        "n_nationkey long, amount decimal(12,2), d date, ts timestamp")


@query("source_avro_evolution", """
    SELECT n_nationkey, n_name,
           CASE WHEN n_nationkey < 12 THEN CAST(99 AS BIGINT)
                ELSE n_regionkey END AS n_regionkey
    FROM nation
""")
def source_avro_evolution(spark, sf_dir):
    """Avro SCHEMA RESOLUTION (sources/avro.py, r14): files written
    under different schema VERSIONS read as one relation through a
    reader schema, per the spec's Schema Resolution rules — the
    evolution story a long-lived 100 TB dataset needs. File v1
    (n_nationkey < 12) was written with an OLD schema: fields in a
    different ORDER (name first), the key as INT (reader promotes to
    long), an extra n_comment column (reader drops it) and NO
    n_regionkey (the reader default 99 fills it). File v2 matches
    the reader exactly. One avro_reader call with reader_schema=
    resolves both per-file; the oracle replays the default fill with
    a CASE over the parquet original, so the value hash proves
    promotion + reorder + drop + default semantics, not just byte
    round-trip."""
    import json
    import os
    import tempfile

    from .sources.avro import avro_reader, make_avro
    _, t = _s(spark, sf_dir)
    rows = [(int(r[0]), str(r[1]), int(r[2])) for r in
            t["nation"].select("n_nationkey", "n_name", "n_regionkey")
            .collect()]                    # 25 rows: metadata-scale
    v1 = json.dumps({
        "type": "record", "name": "nation", "fields": [
            {"name": "n_name", "type": "string"},
            {"name": "n_nationkey", "type": "int"},
            {"name": "n_comment", "type": "string"}]})
    v2 = json.dumps({
        "type": "record", "name": "nation", "fields": [
            {"name": "n_nationkey", "type": "long"},
            {"name": "n_name", "type": "string"},
            {"name": "n_regionkey", "type": "long"}]})
    reader = json.dumps({
        "type": "record", "name": "nation", "fields": [
            {"name": "n_nationkey", "type": "long"},
            {"name": "n_name", "type": "string"},
            {"name": "n_regionkey", "type": "long", "default": 99}]})
    d = tempfile.mkdtemp(prefix="bsq_avroe_")
    old = [(n, k, f"legacy row {k}") for k, n, _ in rows if k < 12]
    new = [r for r in rows if r[0] >= 12]
    for fname, sch, chunk, codec in (
            ("v1.avro", v1, old, "deflate"),
            ("v2.avro", v2, new, "null")):
        with open(os.path.join(d, fname), "wb") as f:
            f.write(make_avro(sch, chunk, codec=codec, block_rows=7))
    return avro_reader(
        spark, d, "n_nationkey long, n_name string, n_regionkey long",
        reader_schema=reader)


@query("source_protobuf_maps", """
    SELECT n_nationkey,
           CAST(3 AS INT) AS n_attrs,
           CAST(n_nationkey % 7 AS BIGINT) AS a_mod,
           CAST(n_nationkey * 2 AS BIGINT) AS a_dbl,
           CAST(length(n_name) AS BIGINT) AS a_len
    FROM nation
""")
def source_protobuf_maps(spark, sf_dir):
    """Protobuf MAP fields (sources/protobuf.py, r13): proto3
    ``map<K, V>`` is wire-sugar for a repeated message with fields
    1 (key) and 2 (value) — decoded through exactly that equivalence
    into Spark map columns, with later duplicate keys winning per the
    parser contract. nation rows carry a map<string,int64> written to
    a REAL .pb file and read back with the pinned DDL; the decoded map
    is projected to scalar leaves (size + element_at — the driver
    canonicalizer contract) so the oracle replays every entry
    analytically."""
    import os
    import tempfile

    from .sources.protobuf import make_delimited, protobuf_reader
    _, t = _s(spark, sf_dir)
    rows = [{"n_nationkey": (k := int(r[0])),
             "attrs": {"mod": k % 7, "dbl": k * 2,
                       "len": len(str(r[1]))}}
            for r in t["nation"].select("n_nationkey", "n_name")
            .collect()]                    # 25 rows: metadata-scale
    sch = {1: ("n_nationkey", "int64"),
           2: ("attrs", ("map", "string", "int64"))}
    d = tempfile.mkdtemp(prefix="bsq_pbm_")
    with open(os.path.join(d, "a.pb"), "wb") as f:
        f.write(make_delimited(sch, rows))
    df = protobuf_reader(spark, d, sch,
                         "n_nationkey long, attrs map<string,long>")
    return df.select(
        "n_nationkey",
        F.size("attrs").alias("n_attrs"),
        F.element_at("attrs", "mod").alias("a_mod"),
        F.element_at("attrs", "dbl").alias("a_dbl"),
        F.element_at("attrs", "len").alias("a_len"))


@query("metrics_counters", """
    SELECT 'high_value' AS name,
           CAST(sum(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END)
                AS BIGINT) AS value
    FROM orders
    UNION ALL
    SELECT 'rows_seen' AS name, CAST(count(*) AS BIGINT) AS value
    FROM orders
""")
def metrics_counters_q(spark, sf_dir):
    """User metrics (metrics.py Counter/Scope ↔ reference
    metrics/metrics.go:24-60 counters incremented inside user funcs
    and merged across tasks): a mapInPandas op over orders increments
    two named counters executor-side — rows_seen per row, high_value
    for rows over the price cut — one action drains the relation, and
    the merged driver-side totals come back AS DATA (the registry
    proof VERDICT r11 task 7 asked for). Counter totals equal plain
    aggregates by construction, which is exactly what the oracle
    replays; Spark accumulators are the reference's task-merge
    semantics (executor increments, scheduler-merged totals)."""
    import pandas as pd

    from .metrics import Scope
    _, t = _s(spark, sf_dir)
    scope = Scope(spark)
    rows_seen = scope.counter("rows_seen")
    high_value = scope.counter("high_value")

    def op(batches):
        for pdf in batches:
            rows_seen.incr(len(pdf))
            high_value.incr(int((pdf["o_totalprice"] > 100000).sum()))
            yield pdf[["o_orderkey"]]

    (t["orders"].select("o_orderkey", "o_totalprice")
     .mapInPandas(op, schema="o_orderkey long").count())
    snap = scope.snapshot()
    return local_df(spark, sorted(snap.items()),
                    "name string, value long")


@query("nb_classifier", """
    WITH tok AS (
      SELECT lang AS label,
             unnest(list_filter(string_split_regex(text, '\\s+'),
                                t -> t <> '')) AS w
      FROM documents),
    wc AS (SELECT label, w, CAST(count(*) AS BIGINT) AS cnt
           FROM tok GROUP BY label, w),
    cls AS (SELECT lang AS label, CAST(count(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY lang),
    ctok AS (SELECT label, CAST(count(*) AS BIGINT) AS n_tokens
             FROM tok GROUP BY label),
    gv AS (SELECT (SELECT CAST(count(*) AS BIGINT)
                   FROM documents) AS N,
                  (SELECT CAST(count(DISTINCT w) AS BIGINT)
                   FROM tok) AS V),
    dw AS (
      SELECT doc_id, w, CAST(count(*) AS BIGINT) AS dw FROM (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(text, '\\s+'),
                                  t -> t <> '')) AS w
        FROM documents)
      GROUP BY doc_id, w),
    terms AS (
      SELECT d.doc_id, c.label, d.dw,
             CAST(CAST(d.dw AS DOUBLE)
                  * ln(CAST(coalesce(wc.cnt, 0) + 1 AS DOUBLE)
                       / CAST(coalesce(ct.n_tokens, 0) + g.V
                              AS DOUBLE))
                  AS DECIMAL(38,12)) AS t
      FROM dw d
      CROSS JOIN cls c
      LEFT JOIN ctok ct ON ct.label = c.label
      CROSS JOIN gv g
      LEFT JOIN wc ON wc.label = c.label AND wc.w = d.w),
    per AS (
      SELECT doc_id, label, sum(t) AS s,
             CAST(sum(dw) AS BIGINT) AS n_words
      FROM terms GROUP BY doc_id, label),
    pri AS (
      SELECT c.label,
             CAST(ln(CAST(c.n_docs AS DOUBLE) / CAST(g.N AS DOUBLE))
                  AS DECIMAL(38,12)) AS plp
      FROM cls c CROSS JOIN gv g),
    scored AS (
      SELECT p.doc_id, p.label, p.n_words, p.s + r.plp AS score
      FROM per p JOIN pri r ON r.label = p.label)
    SELECT doc_id, label AS pred, n_words FROM (
      SELECT doc_id, label, n_words,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, label) AS rn
      FROM scored)
    WHERE rn = 1
""")
def nb_classifier_q(spark, sf_dir):
    """In-engine classifier TRAINING + inference (operators/
    classify.py nb_train/nb_classify — the missing leg next to the
    score_documents inference path): a multinomial Naive Bayes text
    classifier trains on (lang, text) with one explode + two
    map-side-combined aggregations (model never leaves the cluster),
    then classifies the corpus — add-one smoothing, every ln input an
    exact integer rational, decimal(38,12)-cast addends, smallest-
    label tie-break (the lm_quality exactness contract). The
    classify plan shuffles the corpus ONCE on the word key against
    the per-word class-count map and fans out x C classes only after
    that join; the argmax window holds exactly C rows per document.
    The oracle replays train AND classify end-to-end, so a defect in
    counting, smoothing, summation or the argmax breaks the hash."""
    from .operators.classify import nb_classify, nb_train
    _, t = _s(spark, sf_dir)
    # Composed form, deliberately (r14 continuation): the fused
    # nb_self_classify (one tokenize pass via a materialized per-doc
    # word-count relation) won only on a degraded box at sf0.1; a
    # calm-box interleaved A/B was a wash at sf0.1 and a consistent
    # 1.2-1.4x LOSS at sf1 (checkpoint write+read of the (id,label,w)
    # relation costs more than the three re-tokenize scans it saves —
    # whitespace tokenize is cheap codegen). nb_self_classify remains
    # the right call when tokenization dominates (real BPE/unigram
    # encode); see its docstring for the measurements.
    docs = t["documents"]
    wc, cls, glob = nb_train(docs, label_col="lang")
    return nb_classify(docs, wc, cls, glob)
