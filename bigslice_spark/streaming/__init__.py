"""Structured Streaming surface (absent in the reference — SURVEY §2.3:
bigslice is strictly batch; Spark gives us streams).

Patterns exposed:
- stream_events:        readStream over the events parquet (schema pinned,
                        ns→µs rebuild, like session.load_tables).
- tumbling_counts:      watermark + fixed window aggregation.
- session_windows:      session_window(ts, gap) aggregation.
- run_to_completion:    drive a query over the static files through the
                        memory sink synchronously (processAllAvailable) —
                        the test/oracle harness for streaming: a
                        deterministic stream over a finite source must
                        equal the batch answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", ts_type),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet, ts normalized to TIMESTAMP.

    The testdata has shipped ts as either int64 nanos (rounds 1-2) or a
    native timestamp[us]; probe the static footer once to pick the
    stream schema (readStream requires one up front). When the static
    file does not exist YET — standard FileStreamSource usage is to
    start the stream before data arrives — fall back to the legacy
    int64-nanos schema instead of failing the probe. A stream's schema
    is FIXED at start, so a file that later lands with a different
    encoding cannot be re-probed: a timestamp-typed file fails the
    parquet conversion outright, and to close the silent case (a plain
    int64 column holding non-nano units, which the div-1000
    normalization would skew 1000×) the fallback path guards the
    derived timestamps with an in-plan plausibility check that
    raise_errors instead of emitting skewed event times — restart the
    stream once the file exists to pick up its real encoding."""
    import os
    from ..session import normalize_events_ts
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    fallback = False
    try:
        static = spark.read.parquet(
            os.path.join(sf_dir, "events.parquet"))
        ts_type = static.schema["ts"].dataType
    except Exception:
        ts_type = T.LongType()
        fallback = True
    # FileStreamSource requires a DIRECTORY; events.parquet is a plain
    # file, so stream the parent dir with a glob filter.
    raw = (spark.readStream.schema(_events_schema(ts_type))
           .option("pathGlobFilter", "events.parquet")
           .parquet(sf_dir))
    out = normalize_events_ts(raw)
    if fallback:
        lo = F.lit("1990-01-01").cast("timestamp")
        hi = F.lit("2200-01-01").cast("timestamp")
        # NULL ts passes through (a missing timestamp is not an
        # encoding mismatch); only an implausible PRESENT value aborts
        out = out.withColumn("ts", F.when(
            F.col("ts").isNull()
            | ((F.col("ts") >= lo) & (F.col("ts") < hi)), F.col("ts"))
            .otherwise(F.expr(
                "raise_error('stream_events: ts outside plausible "
                "range - the file that arrived does not match the "
                "pinned legacy int64-nanos fallback schema; restart "
                "the stream now that events.parquet exists')")))
    return out


def tumbling_counts(events: DataFrame, width: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts per event_type."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", width).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("value").cast("decimal(38,6)"))
                 .cast("double").alias("v"))
            .select(F.col("w.start").alias("hr"), "event_type", "n", "v"))


def sliding_counts(events: DataFrame, width: str = "1 hour",
                   slide: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Watermarked SLIDING-window counts per event_type: each event lands
    in width/slide overlapping windows (epoch-aligned starts every
    ``slide``). Emits the window start as epoch µs for engine-neutral
    comparison."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", width, slide).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("value").cast("decimal(38,6)"))
                 .cast("double").alias("v"))
            .select(F.unix_micros(F.col("w.start")).alias("ws_us"),
                    "event_type", "n", "v"))


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    watermark: str = "2 hours") -> DataFrame:
    """Native session_window aggregation (gap-based sessions per user)."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("w"),
                     "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id", F.col("w.start").alias("start"),
                    "n_events"))


# runtime SQL confs a builder-isolated clone must inherit from its
# parent: newSession() starts from the SparkContext's build-time conf,
# NOT the parent's runtime conf, and these four change query RESULTS
# or source decoding if they diverge
_ISOLATE_INHERIT = ("spark.sql.session.timeZone",
                    "spark.sql.legacy.parquet.nanosAsLong",
                    "spark.sql.shuffle.partitions",
                    "spark.sql.adaptive.enabled")


def run_to_completion(agg, name: str,
                      output_mode: str = "complete",
                      state_partitions: int | None = None,
                      spark: "SparkSession | None" = None) -> DataFrame:
    """Drive a streaming aggregation over its (finite) source through the
    memory sink; returns the final result as a batch DataFrame.

    ``agg`` is either a built streaming DataFrame (same-session mode)
    or a BUILDER ``callable(SparkSession) -> streaming DataFrame``
    (isolated mode — pass the parent via ``spark=``).

    ``state_partitions``: shuffle-partition count for THIS query. For
    stateful streaming, partitions == state-store instances and the
    count is PINNED by the checkpoint at first start (Spark cannot
    re-partition existing state), so it must be sized to expected
    state volume, not to the session's batch default — each store
    costs per-micro-batch snapshot/commit I/O, so hundreds of
    near-empty stores is pure overhead, while too few caps the
    parallelism of a 100 TB-scale join state.

    ISOLATION (r7 verdict task 7): ``spark.sql.shuffle.partitions``
    is a session-level conf read at each micro-batch's planning, and
    a streaming DataFrame cannot be rebound to a ``newSession()``
    clone after construction — so pinning ``state_partitions`` on a
    pre-built frame's session races any concurrent planning on that
    session. The builder form removes the hazard: the stream (and
    everything it reads) is CONSTRUCTED on a fresh ``newSession()``
    clone, the pin lives on the clone's conf only, the parent session
    is never mutated, and the final result comes back as a
    parent-session batch frame (the memory sink is driver-resident
    either way, so the copy adds nothing). The clone inherits the
    result-affecting runtime confs (_ISOLATE_INHERIT) from the
    parent. With a pre-built frame and ``state_partitions`` set, the
    old single-query contract still applies: no other query may be
    PLANNED on that session while this call is in flight."""
    if callable(agg):
        if spark is None:
            raise TypeError("run_to_completion: builder form requires "
                            "the parent session via spark=")
        iso = spark.newSession()
        for k in _ISOLATE_INHERIT:
            try:
                iso.conf.set(k, spark.conf.get(k))
            except Exception:
                pass  # conf unset on the parent: keep the clone default
        if state_partitions is not None:
            iso.conf.set("spark.sql.shuffle.partitions",
                         str(state_partitions))
        df = agg(iso)
        q = (df.writeStream.outputMode(output_mode)
             .format("memory").queryName(name).start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        result = iso.table(name)
        # bounded by construction: the memory sink already holds the
        # full result in the driver
        return spark.createDataFrame(result.collect(), result.schema)
    src = agg.sparkSession
    key = "spark.sql.shuffle.partitions"
    prev = src.conf.get(key)
    try:
        if state_partitions is not None:
            src.conf.set(key, str(state_partitions))
        q = (agg.writeStream.outputMode(output_mode)
             .format("memory").queryName(name).start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if state_partitions is not None:
            src.conf.set(key, prev)
    return src.table(name)


def stream_to_parquet(df: DataFrame, path: str, checkpoint: str,
                      name: str = "bs_stream_sink") -> DataFrame:
    """The write half of the streaming story (readStream →
    transformations → writeStream): drive ``df`` (append-mode capable —
    no aggregation, or a watermarked one) to a parquet sink with a
    checkpoint dir for exactly-once file commits, synchronously to
    completion, then return the materialized result as a batch frame."""
    spark = df.sparkSession
    q = (df.writeStream.outputMode("append")
         .format("parquet")
         .option("path", path)
         .option("checkpointLocation", checkpoint)
         .queryName(name)
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # schema passed explicitly: a stream that committed ZERO rows leaves
    # only _spark_metadata behind, and schema inference would throw
    return spark.read.schema(df.schema).parquet(path)


def stateful_user_counts(events: DataFrame,
                         threshold: int = 50) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count; emits (user_id, total, flagged) each batch,
    carrying the count across micro-batches in GroupState — the Spark
    analog of a bigslice-style per-key stateful reducer (SURVEY §2.3:
    'stateful ops' row)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "total": [total],
                            "flagged": [total >= threshold]})

    return (events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, total long, flagged boolean",
        stateStructType="total long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout))


def stream_distinct_keys(events: DataFrame,
                         keys: tuple[str, ...] = ("user_id",
                                                  "event_type"),
                         watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup — the exactly-once event-processing
    pattern: emit each key combination once, with
    ``dropDuplicatesWithinWatermark`` bounding the dedup state to the
    watermark horizon (unbounded-key dedup state is the classic
    streaming OOM). Only the key columns are emitted, so the result is
    deterministic (WHICH duplicate row arrives first is not). Over the
    finite test source (one micro-batch) this equals batch DISTINCT —
    the oracle."""
    return (events.withWatermark("ts", watermark)
            .select(*keys, "ts")
            .dropDuplicatesWithinWatermark(list(keys))
            .select(*keys))


def stream_stream_join(left: DataFrame, right: DataFrame,
                       on: str = "user_id",
                       left_ts: str = "ts", right_ts: str = "ts",
                       bound: str = "1 hour",
                       watermark: str = "2 hours",
                       how: str = "inner") -> DataFrame:
    """Watermarked stream-stream join: left events match right events
    with the same key whose timestamp falls in [left_ts − bound,
    left_ts]. Both sides carry watermarks and the join predicate
    carries the time bound — the two things Spark needs to age join
    state out instead of buffering both streams forever (the
    unbounded-state OOM every naive stream join hits). Returns the
    joined frame; callers project/rename before sinking.

    ``how='left_outer'`` additionally emits each unmatched left row
    (right columns NULL) once the watermark passes the end of its
    match window — the emit-unmatched-after-expiry pattern. Expiry
    results surface in the no-data micro-batch the engine runs when
    the watermark advances (`spark.sql.streaming.noDataMicroBatches`,
    on by default), so `processAllAvailable` over a finite source
    includes every CLOSED left row; rows still inside the watermark
    horizon at end-of-input have emitted their matches but not their
    null-result — callers comparing against a batch oracle filter to
    left_ts below the final watermark (see the stream_join_outer
    registry entry).

    Over the finite test source the inner join emits exactly the batch
    answer — the oracle."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    lcol, rcol = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    return (lw.alias("l").join(
        rw.alias("r"),
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (rcol >= lcol - F.expr(f"INTERVAL {bound}"))
        & (rcol <= lcol), how))


def stream_upsert(df: DataFrame, path: str, key_cols: list[str],
                  checkpoint: str, name: str = "bs_stream_upsert",
                  partition_by: list[str] | None = None) -> DataFrame:
    """Streaming MERGE: apply each micro-batch as a keyed upsert into a
    versioned snapshot table (operators/upsert.py) via foreachBatch —
    the standard pattern for maintaining a mutable serving table from a
    stream when the sink format has no transactional MERGE of its own.
    Re-delivered batches re-apply the same keys idempotently (updates
    win on collision), so the table converges under at-least-once
    delivery. Pass ``partition_by`` so each micro-batch rewrites only
    the partitions it touches (manifest carry-forward) — without it
    every batch rewrites the FULL snapshot, O(table) per batch and
    quadratic in stream length. Runs to completion over the finite
    source, then returns the final table."""
    from ..operators.upsert import read_latest, upsert

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert(batch_df.sparkSession, path, batch_df, key_cols,
               partition_by=partition_by)

    q = (df.writeStream.foreachBatch(apply_batch)
         .option("checkpointLocation", checkpoint)
         .queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return read_latest(df.sparkSession, path)


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the documents parquet (schema pinned — a file
    stream cannot infer)."""
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ])
    # FileStreamSource requires a DIRECTORY; documents.parquet is a
    # plain file, so stream the parent dir with a glob filter (the
    # stream_events pattern)
    return (spark.readStream.schema(schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir))


def stream_dedup_against(docs: DataFrame, corpus: DataFrame,
                         path: str, checkpoint: str,
                         name: str = "bs_stream_admit",
                         **kw) -> DataFrame:
    """Streaming near-dup ADMISSION: each micro-batch of incoming
    documents is LSH-checked against the static accepted corpus
    (operators/dedup.minhash_dedup_against) and only documents with no
    near-duplicate are appended to ``path`` — the continual-ingestion
    gate in streaming form.

    The corpus signature index is computed ONCE here and reused by
    every micro-batch (foreachBatch closes over the materialized
    relation); per-batch cost is the batch's own signatures plus the
    banded cross-join against the index. Batches are checked against
    the CORPUS only, not against each other, so the final admitted set
    equals the batch-mode result regardless of how the stream was
    chopped (the oracle's replay) — add a stream_upsert stage after
    admission when intra-stream dedup is also wanted. Runs to
    completion over the finite source, then returns the admitted
    documents."""
    from ..checkpoint import materialize
    from ..operators.dedup import (minhash_dedup_against,
                                   minhash_signatures)
    sig_kw = {k: kw[k] for k in
              ("num_hashes", "shingle_w", "portable") if k in kw}
    corpus_sig = materialize(minhash_signatures(corpus, **sig_kw))

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        # No isEmpty() short-circuit: writing an empty batch still lays
        # down the parquet footer, so an all-empty (or never-firing)
        # stream yields a readable empty admitted set below instead of
        # an AnalysisException on a path that was never created.
        kept = minhash_dedup_against(batch_df, corpus,
                                     corpus_sig=corpus_sig, **kw)
        kept.write.mode("append").parquet(path)

    q = (docs.writeStream.foreachBatch(admit)
         .option("checkpointLocation", checkpoint)
         .queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    spark = docs.sparkSession
    # probe existence explicitly instead of catching the read's
    # exceptions — a corrupt footer or permission error must FAIL, not
    # masquerade as "zero documents admitted"; only a path never
    # created (zero micro-batches ever fired) yields the empty set
    from ..operators.upsert import _jfs
    _, fs, jpath = _jfs(spark, path)
    if not fs.exists(jpath):
        return spark.createDataFrame([], docs.schema)
    return spark.read.parquet(path)
