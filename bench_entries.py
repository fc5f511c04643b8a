"""Fresh-JVM bench for ARBITRARY registry entries (not just bench.py
headliners) — the tool the heavy-sweep-tail scaling records come from
(VERDICT r11 task 6: sweep entries like audio_dedup_fp or
similarity_pq need sf1 numbers but are not headline queries).

Protocol = bench_sf1.py's: every entry runs in its own subprocess JVM
(no query absorbs another's JVM pressure; numbers reproduce standalone
by construction), with sweep.py's noop-sink forcing (a bare count()
would let Catalyst prune computed columns out of pure projections).
Per-subprocess untimed warmup primes codegen + the Python worker pool.

Run:  python bench_entries.py <sf_dir> <entry> [entry ...]
      prints one JSON line {"sf_dir": ..., "entries": {name: sec}}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_child(sf_dir: str, name: str) -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.appName("bss_bench_entry")
             .master(f"local[{cpus}]")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from bigslice_spark.queries import QUERIES
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    try:                                   # untimed warmup
        QUERIES["q1_pricing_summary"](spark, sf_dir).count()
    except Exception:
        pass
    t0 = time.time()
    QUERIES[name](spark, sf_dir).write.mode("overwrite") \
        .format("noop").save()
    print(json.dumps({"entry": name,
                      "sec": round(time.time() - t0, 3)}))


def main() -> None:
    if len(sys.argv) >= 4 and sys.argv[1] == "--one":
        run_child(sys.argv[2], sys.argv[3])
        return
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    sf_dir, names = sys.argv[1], sys.argv[2:]
    from bigslice_spark.queries import QUERIES
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"not registry entries: {unknown}")
    times: dict[str, float] = {}
    t0 = time.time()
    for i, name in enumerate(names):
        t = -1.0
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one",
             sf_dir, name],
            capture_output=True, text=True, timeout=1800)
        for line in proc.stdout.splitlines():
            if line.strip().startswith("{"):
                t = json.loads(line)["sec"]
                break
        else:
            print(f"bench_entries: {name} produced no result:\n"
                  f"{proc.stderr[-2000:]}", file=sys.stderr)
        times[name] = t
        print(f"[{i + 1}/{len(names)}] {name}: {t}s "
              f"(elapsed {time.time() - t0:.0f}s)", file=sys.stderr,
              flush=True)
    print(json.dumps({"sf_dir": sf_dir, "entries": times,
                      "protocol": "fresh JVM per entry, noop-sink "
                                  "forcing, per-subprocess warmup"}))


if __name__ == "__main__":
    main()
