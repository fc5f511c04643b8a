"""Run a fixed battery of registry queries under ONE Spark config and
print normalized results as a single JSON line.

Used by test_dual_config.py, which diffs the output across configs
(local[1] vs local[32], Arrow on vs off) — the Spark analog of the
reference running every operator under both the Local and
Bigmachine.Test executors and comparing (slice_test.go:64-103). A
result that changes with the master or the serialization path means an
operator leaked a partitioning or Arrow-batch assumption into its
OUTPUT, which on a real cluster shows up as silent wrong answers.

Usage: python tests/dual_config_runner.py <master> <arrow:on|off> <sf_dir>
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Every entry here must have config-independent OUTPUT. Deliberately
# excluded: op_head (per-shard semantics — row set depends on the number
# of input shards by design, like the reference's Head), op_reshard /
# op_reshuffle (tested by partition-count elsewhere; row sets ARE stable
# but they're trivial projections), streaming entries (own harness).
BATTERY = [
    "op_map", "op_map_pandas", "op_filter", "op_flatmap_pandas",
    "op_fold", "op_fold_custom", "op_reduce", "op_cogroup_apply",
    "op_repartition_custom", "op_budget_sample", "op_hash_split",
    "word_count", "dedup_minhash", "ngram_jaccard", "text_stats",
    "asof_join", "window_rank", "q1_pricing_summary",
    # round-3 pipeline operators — packing's two-level prefix sum and
    # the stratified window are exactly the kind of op that could leak
    # a partitioning assumption; pack_sequences output must be
    # IDENTICAL under local[1] (one physical partition) and local[32]
    "pack_sequences", "winnow", "pii_scrub", "line_dedup",
    "classify_score", "stratified_sample", "stratified_frac",
    "repetition_stats", "decontaminate", "dedup_against",
    # round-4 operators — bm25's order-deterministic score sum, the
    # funnel's chained per-user aggregates, triangle's distinct-edge
    # joins, k-means' decimal means, and the chunker's per-doc windows
    # must all be partition- and transport-invariant; upsert_merge
    # additionally exercises snapshot listing under each config
    "bm25_search", "random_projection", "kmeans_step", "funnel_steps",
    "triangle_count", "mix_weights", "chunk_docs", "bigram_pmi",
    "zorder_layout", "upsert_merge", "tfidf_terms", "heavy_hitters",
    # round-5 operators — the partition-pruned merge's manifest
    # carry-forward, LPA's synchronous arg-max rounds, and the CSV
    # corrupt-record capture must be partition- and transport-invariant
    # (heavy_hitters_approx joined the battery in round 7, when its
    # entry switched to guarantee-as-data booleans over the exact
    # heavy set — invariant by the sketch guarantee even though the
    # raw counter VALUES remain partition-dependent by design)
    "upsert_partitioned", "lpa_communities", "source_csv_malformed",
    "compact_partitioned", "ewma_value", "event_gaps",
    "equidepth_histogram", "ngram_containment", "lm_quality",
    # late round-5 — k-means training collects/re-embeds centroids as
    # literals (must be layout-stable), SemDeDup's salted cell join,
    # the md5-priority sampler, the rollup's Expand, the exclusive
    # window frame, and the BPE trainer's top-k'd word table must all
    # be partition- and transport-invariant
    "sample_per_key", "time_rollup", "ts_anomaly", "kmeans_train",
    "semantic_dedup", "bpe_merges", "bpe_token_counts",
    # the analytics/observability wave: every entry is one-or-two
    # exchange expression-level code whose values must not depend on
    # layout or transport
    "gopher_rules", "date_spine_gapfill", "data_checks",
    "range_sorted_layout", "mixture_sample", "retention_cohorts",
    "ts_pattern_search", "key_percentiles", "common_paths",
    "scd2_intervals", "moments_agg", "table_profile",
    "k_core", "winsorize_values", "multimodal_frames",
    "item_jaccard", "event_transitions", "asof_tolerance",
    "lateral_topn", "forward_fill",
    # round-6 — the real PPM/BMP/WAV decode rides mapInPandas (Arrow
    # transport + partitioning must not change decoded features)
    "multimodal_decode",
    # round-7 — epoch_order's two-level global positions must be
    # identical under local[1] (one range partition) and local[32]
    # (many, with SAMPLED boundaries); heavy_hitters_approx's
    # guarantee-as-data booleans are now invariant by construction
    # even though the raw counter values are not
    "epoch_shuffle", "heavy_hitters_approx",
    # round-9 — the JPEG/GIF codecs ride mapInPandas (Arrow batching
    # and partition count must not change decoded bytes); ewma_hub's
    # decimal-summed closed form and the two-stage segmented fold must
    # be partitioning-invariant (the whole point of a distributed
    # fold: local[1] serializes it, local[32] spreads it)
    "multimodal_jpeg", "multimodal_gif", "ewma_hub",
    "op_fold_stream_segmented",
    # round-9b — the MP4 box parse + sample demux ride mapInPandas
    # (sample-order md5 must be transport/partition-invariant)
    "multimodal_mp4",
    # round-9c — WARC writes one file per partition (local[1] vs [32]
    # changes the file layout but must not change the parsed records);
    # web_pipeline chains sink -> reader -> extract -> dedup across
    # partition boundaries; dup_spans' window counts and bloom's
    # distributed bit_or build + Arrow probe must be
    # partitioning/transport-invariant
    "source_warc", "html_extract", "web_pipeline", "dup_spans",
    "strip_dup_spans", "charset_decode", "decontaminate_bloom",
    "html_links", "text_clean", "sketch_rollup", "corpus_overlap",
    "quantile_sketch", "bucketed_join", "stream_warc",
    "similarity_pq", "multimodal_resize",
    # round-10 — MJPEG-in-MP4 decode: fixture generation, demux, and
    # per-sample JPEG decode all run inside Arrow batches whose
    # boundaries shift with partitioning/transport
    "multimodal_mjpeg",
    # rounds 11-13 — the format-source codecs all ride binaryFile +
    # mapInPandas (file-granular batches whose grouping shifts with
    # partitioning/transport; every decode must be byte-deterministic
    # regardless), pdf_extract additionally decrypts under per-object
    # keys inside the batch, the unigram encode segments distinct
    # words through an Arrow UDF, and nb_classifier's word-key join +
    # decimal addends must be layout-invariant
    "source_zip", "source_xml", "source_avro", "source_avro_complex",
    "source_avro_zstd", "source_protobuf", "source_tfrecord",
    "source_webdataset", "source_arrow_ipc", "pdf_extract",
    "audio_flac", "unigram_tokens", "nb_classifier", "json_variant",
    # decimal/date/timestamp and map columns cross the Arrow vs
    # pickle transport boundary with different physical encodings —
    # the classic divergence class this battery exists for
    "source_avro_logical", "source_protobuf_maps",
    # r14 — per-file schema RESOLUTION (adapters built inside the
    # mapInPandas batch) must be invariant to which files share a
    # batch
    "source_avro_evolution",
    # r14 — trigram cover-count candidates ride a broadcast +
    # partial-agg pipeline whose grouping shifts with partitioning;
    # the verify must make the answer layout-invariant
    "trigram_search", "regex_search",
]


def _norm(v):
    if isinstance(v, float):
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return [_norm(x) for x in v]
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in sorted(v.items())}
    if isinstance(v, bytearray):
        return bytes(v).hex()
    if isinstance(v, bytes):
        return v.hex()
    return v


def main() -> None:
    master, arrow, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.appName(f"dualcfg-{master}-{arrow}")
             .master(master)
             .config("spark.sql.shuffle.partitions",
                     "1" if master == "local[1]" else "8")
             .config("spark.sql.execution.arrow.pyspark.enabled",
                     "true" if arrow == "on" else "false")
             .config("spark.sql.execution.arrow.pyspark.fallback.enabled",
                     "false")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from bigslice_spark.queries import QUERIES

    out = {}
    for name in BATTERY:
        df = QUERIES[name](spark, sf_dir)
        rows = [[_norm(v) for _, v in sorted(r.asDict().items())]
                for r in df.collect()]
        out[name] = {"cols": sorted(df.columns), "rows": sorted(
            rows, key=lambda r: json.dumps(r, default=str))}
    print("DUALCFG:" + json.dumps(out, default=str, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
