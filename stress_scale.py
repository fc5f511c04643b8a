"""Scale-stress harness: measure how the heavy operators scale when the
input grows 1x -> 4x -> 16x, holding the box fixed (local[32]).

The 100 TB question is not "how fast at sf0.1" but "what's the growth
curve": an operator whose wall time grows ~linearly in input rows (with
the fixed JIT/planning floor amortizing away) survives a cluster
scale-up; superlinear growth means a shuffle or candidate space is
exploding. This harness amplifies the sf0.1 tables in-memory:

- documents: replicate with shifted doc_ids and a per-replica vowel
  rotation of the text (every shingle changes, so replicas are NOT
  near-dups of one another — we measure candidate GENERATION scaling,
  not the output-quadratic all-dup corner, which the salted join
  already bounds by design);
- events: replicate with shifted user_ids (keys and rows both scale —
  the window/agg operators see more groups, not hotter ones).

Run: python stress_scale.py [sf_dir]   (prints one JSON line per
operator x amplification with rows and wall seconds)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

AMPS = (1, 4, 16)


def amplify_docs(docs, amp):
    import pyspark.sql.functions as F
    if amp == 1:
        return docs
    parts = []
    for i in range(amp):
        rot = "aeiou"[i % 5:] + "aeiou"[:i % 5]
        parts.append(docs.select(
            (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
            F.translate("text", "aeiou", rot).alias("text"),
            "lang", "source", "n_chars"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def amplify_events(events, amp):
    import pyspark.sql.functions as F
    if amp == 1:
        return events
    parts = []
    for i in range(amp):
        parts.append(events.select(
            (F.col("event_id") + i * 100_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + i * 10_000_000).alias("user_id"),
            "event_type", "value", "props"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession
    import pyspark.sql.functions as F

    spark = (SparkSession.builder.appName("bss_stress")
             .master("local[32]")
             .config("spark.driver.memory", "24g")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from bigslice_spark.session import load_tables
    from bigslice_spark.operators.dedup import minhash_lsh_pairs
    from bigslice_spark.operators.timeseries import (rolling_zscore,
                                                     time_rollup)
    from bigslice_spark.operators.text import gopher_rules
    from bigslice_spark.operators.search import bm25_score

    t = load_tables(spark, sf_dir)

    def run(name, df_builder):
        for amp in AMPS:
            df = df_builder(amp)
            # Time a noop-sink write, NOT df.count(): under a bare count
            # Catalyst prunes every computed column of a pure projection
            # (gopher_rules would degenerate to a parquet row-count
            # scan). The noop sink fully evaluates every column JVM-side
            # with zero sink cost. Row count is reported from a separate
            # untimed pass — metadata only, not part of the measurement.
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            wall = round(time.time() - t0, 2)
            n = df.count()
            print(json.dumps({"op": name, "amp": amp, "rows": n,
                              "sec": wall}), flush=True)

    docs = {a: amplify_docs(t["documents"], a).localCheckpoint()
            for a in AMPS}
    evs = {a: amplify_events(t["events"], a).localCheckpoint()
           for a in AMPS}

    run("gopher_rules", lambda a: gopher_rules(docs[a], min_words=20))
    run("time_rollup", lambda a: time_rollup(evs[a]))
    run("rolling_zscore",
        lambda a: rolling_zscore(evs[a], "user_id", "ts", "value",
                                 order_cols=["event_id"], window=20,
                                 min_n=8, z_threshold=2.0))
    run("minhash_lsh_pairs",
        lambda a: minhash_lsh_pairs(docs[a], threshold=0.5))
    run("bm25", lambda a: bm25_score(
        docs[a], ["fast", "key", "order"], k=20))


if __name__ == "__main__":
    main()
