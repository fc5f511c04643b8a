"""Full-registry sf0.1 sweep → one JSON artifact per round.

Runs EVERY registry entry (not just the bench headliners) at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) in one local[32]
JVM and writes SWEEP_r{N}.json: {"sf": ..., "entries": {name: sec},
"failed": {name: err}} — per-entry wall, diffable round-over-round,
so a scale cliff in the non-headline tail can't hide behind the
35-entry bench.

Forcing protocol (fixed at r6, the artifact's first round): each
entry's DataFrame is evaluated with a noop-sink write, which computes
every output column JVM-side — a bare count() would let Catalyst
prune all computed columns out of pure projections (the ADVICE r5
gopher_rules finding). Entries are timed once, in registry order,
after a warmup primes JVM codegen and the Python worker pool.

Run: python sweep.py [round_number] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    sf_dir = (sys.argv[2] if len(sys.argv) > 2
              else os.environ.get("SPARK_GRAFT_SF_DIR",
                                  "/root/testdata/sf0.1"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.appName("bss_sweep")
             .master(f"local[{cpus}]")
             .config("spark.driver.memory", "24g")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from bigslice_spark.queries import QUERIES

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    try:
        QUERIES["q1_pricing_summary"](spark, sf_dir).count()
    except Exception:
        pass

    entries: dict[str, float] = {}
    failed: dict[str, str] = {}
    for name, fn in QUERIES.items():
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.mode("overwrite") \
                .format("noop").save()
            entries[name] = round(time.time() - t0, 3)
        except Exception as ex:
            failed[name] = str(ex)[:200]
        # untimed between-entries hygiene (see bench.py): free the
        # finished entry's materialized intermediates promptly
        from bigslice_spark.checkpoint import release_all
        release_all(spark)
        print(json.dumps({"entry": name,
                          "sec": entries.get(name),
                          "err": failed.get(name)}), file=sys.stderr,
              flush=True)

    out = {"sf": sf_dir, "n_entries": len(entries),
           "n_failed": len(failed),
           "total_sec": round(sum(entries.values()), 1),
           "entries": entries, "failed": failed}
    if rnd:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            f"SWEEP_r{rnd:02d}.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"wrote {path}", file=sys.stderr)
    print(json.dumps({"metric": "full_registry_sweep_total_wall",
                      "value": out["total_sec"], "unit": "sec",
                      "n": len(entries), "failed": len(failed)}))


if __name__ == "__main__":
    main()
