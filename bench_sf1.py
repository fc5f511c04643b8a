"""Fresh-JVM-per-query sf1 bench (VERDICT r10 task 2).

The r10 sf1 artifact was recorded as one 42-query in-sequence JVM run;
its tail queries absorbed the whole sequence's JVM pressure
(ts_anomaly 12.6s in-sequence vs 4.47s fresh — PERFORMANCE.md r10
close), so as recorded it could not serve as a per-query scaling
ratchet. This harness runs EVERY headline query in its own subprocess
JVM via bench.py's SPARK_GRAFT_BENCH_ONLY knob: each number is a
fresh-JVM measurement, reproducible within box noise by construction,
at the cost of paying JVM+Python-worker warmup per query (bench.py's
untimed warmup runs in each subprocess, so warmup cost stays OUT of
the recorded times).

Run:  python bench_sf1.py [sf_dir] [out.json]
defaults: /tmp/spark_graft_sf1.0, BENCH_sf1_r11.json
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_one(name: str, sf_dir: str, cpus: str, mem: str) -> float:
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=cpus,
               SPARK_GRAFT_DRIVER_MEM=mem,
               SPARK_GRAFT_BENCH_ONLY=name)
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "bench.py")],
        env=env, capture_output=True, text=True, timeout=1800)
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)["queries"].get(name, -1.0)
    print(f"bench_sf1: {name} produced no result:\n{proc.stderr[-2000:]}",
          file=sys.stderr)
    return -1.0


def zstd_decode_probe() -> dict:
    """VERDICT r13 task 7: the pure-Python zstd decode throughput
    claim as a recorded measurement. Decodes the COMMITTED
    multi-megabyte zstd-Avro fixture (bench_fixtures/ — blocks
    compressed by the REFERENCE zstd binary at level 3, i.e. frames a
    real Avro writer would produce, not this repo's own encoder
    output) single-threaded, best of 3."""
    fix = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "bench_fixtures", "zstd_avro_bench.avro")
    from bigslice_spark.sources.avro import read_avro_blob
    blob = open(fix, "rb").read()
    best = float("inf")
    rows = []
    for _ in range(3):
        t0 = time.time()
        _, rows = read_avro_blob(blob)
        best = min(best, time.time() - t0)
    raw_bytes = 6_470_312            # builder-reported decoded size
    return {
        "fixture": "bench_fixtures/zstd_avro_bench.avro",
        "frames": "reference zstd 1.5.7, level 3 (per Avro block)",
        "compressed_bytes": len(blob),
        "raw_bytes": raw_bytes,
        "rows": len(rows),
        "sec_best_of_3": round(best, 3),
        "mb_per_s_per_core": round(raw_bytes / 1e6 / best, 2),
        "note": ("single-core pure-Python decode incl. Avro row "
                 "parse; grounds PERFORMANCE.md's 'read zstd-Avro "
                 "through a JVM datasource at 100 TB' guidance"),
    }


def adjudicate(out_path: str, sf_dir: str, cpus: str, mem: str) -> None:
    """In-band >1.5x mover adjudication vs the newest PRIOR sf1
    artifact (the bench.py r13 protocol, extended to sf1 — VERDICT
    r13 task 8): each mover re-runs up to three standalone fresh-JVM
    trials; the artifact records {name: [prev, now, rerun...]} so box
    noise is adjudicated in the artifact itself instead of burning a
    judge round. Also callable standalone:
    python bench_sf1.py --adjudicate <artifact> [sf_dir]."""
    import glob
    doc = json.load(open(out_path))
    cur = doc["bench_sf1"]["queries"]
    here = os.path.dirname(os.path.abspath(out_path)) or "."
    prev_round, prev = 0, {}
    for f in sorted(glob.glob(os.path.join(here, "BENCH_sf1_r*.json")),
                    reverse=True):
        n = int(re.search(r"_r(\d+)", f).group(1))
        if n >= doc.get("round", 1 << 30):
            continue
        try:
            prev = json.load(open(f))["bench_sf1"]["queries"]
            prev_round = n
            break
        except Exception:
            continue
    movers: dict[str, list[float]] = {}
    for name, t in sorted(cur.items()):
        p = prev.get(name, 0.0)
        if p > 0.25 and t > 0 and t / p > 1.5:
            reruns = []
            for _ in range(3):
                reruns.append(run_one(name, sf_dir, cpus, mem))
                # stop early once a rerun lands back inside the gate
                if 0 < reruns[-1] / p <= 1.5:
                    break
            movers[name] = [p, t] + reruns
            print(f"mover {name}: prev={p} now={t} reruns={reruns}",
                  flush=True)
    doc["prev_sf1_round"] = prev_round
    doc["movers_vs_prev"] = movers       # {} = gate ran, no movers
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)


def main() -> None:
    from bench import HEADLINE
    if sys.argv[1:2] == ["--adjudicate"]:
        out_path = sys.argv[2]
        sf_dir = (sys.argv[3] if len(sys.argv) > 3
                  else "/tmp/spark_graft_sf1.0")
        adjudicate(out_path, sf_dir,
                   os.environ.get("SPARK_GRAFT_CPUS", "32"),
                   os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1.0"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_sf1_r12.json"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
    times: dict[str, float] = {}
    t0 = time.time()
    for i, name in enumerate(HEADLINE):
        t = run_one(name, sf_dir, cpus, mem)
        times[name] = t
        print(f"[{i + 1}/{len(HEADLINE)}] {name}: {t}s "
              f"(elapsed {time.time() - t0:.0f}s)", flush=True)
    total = round(sum(v for v in times.values() if v > 0), 3)
    m = re.search(r"_r(\d+)", out_path)
    doc = {
        "round": int(m.group(1)) if m else -1,
        "sf": 1.0,
        "cpus": int(cpus),
        "driver_mem": mem,
        "protocol": ("fresh JVM per query (bench.py subprocess with "
                     "SPARK_GRAFT_BENCH_ONLY=<name>); bench.py's "
                     "untimed warmup runs per subprocess, so no query "
                     "absorbs another's JVM pressure — every number "
                     "reproduces standalone by construction "
                     "(VERDICT r10 task 2)"),
        "data": ("make_sf1.py: FK-consistent 10x amplification of "
                 "/root/testdata/sf0.1 (lineitem 6,000,000 rows; "
                 "document text vowel-rotated and embeddings "
                 "coordinate-rotated per replica so dedup/ANN measure "
                 "candidate generation, not an all-dup corner)"),
        "bench_sf1": {
            "metric": "headline_queries_total_wall",
            "value": total,
            "unit": "sec",
            "queries": times,
            "sf": 1.0,
        },
        "zstd_decode_throughput": zstd_decode_probe(),
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    adjudicate(out_path, sf_dir, cpus, mem)
    print(json.dumps({"metric": "sf1_fresh_jvm_total", "value": total,
                      "unit": "sec", "n": len(times)}))


if __name__ == "__main__":
    main()
