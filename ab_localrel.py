"""Interleaved same-box fresh-JVM A/B for the continuation-session
changes (local_df Arrow relations / count(*) covers / driver-side
buckets / incremental BPE): pre-change tree (018ffb7, worktree
/root/repo_prev) vs HEAD. Same protocol as ab_r15.py (per-query
SPARK_GRAFT_BENCH_ONLY subprocess, alternating trees per iteration,
medians)."""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

TOUCHED = [
    "trigram_search", "regex_search", "trigram_index_grep",
    "bpe_merges", "kmeans_assign_ivf", "unigram_tokens",
    "ts_anomaly", "random_projection",
]
CONTROLS = ["similarity_topk", "dedup_simhash"]
QUERIES = TOUCHED + CONTROLS
TREES = [("prev", "/root/repo_prev"), ("head", "/root/repo")]
ITERS = int(os.environ.get("AB_ITERS", "5"))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ab_localrel_results.json")


def run_one(tdir: str, q: str) -> float:
    env = dict(os.environ, SPARK_GRAFT_BENCH_ONLY=q)
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(tdir, "bench.py")],
            env=env, capture_output=True, text=True, cwd=tdir,
            timeout=900)
    except subprocess.TimeoutExpired:
        return -1.0
    for line in p.stdout.splitlines():
        if line.strip().startswith("{"):
            return json.loads(line)["queries"].get(q, -1.0)
    return -1.0


def main() -> None:
    results: dict = {q: {t: [] for t, _ in TREES} for q in QUERIES}
    for it in range(ITERS):
        order = TREES if it % 2 == 0 else TREES[::-1]
        for q in QUERIES:
            for tname, tdir in order:
                sec = run_one(tdir, q)
                results[q][tname].append(sec)
                print(f"iter {it} {q} {tname}: {sec:.3f}s", flush=True)
    summary = {}
    for q in QUERIES:
        med = {t: statistics.median([x for x in results[q][t] if x > 0])
               for t, _ in TREES}
        summary[q] = {**med, "ratio_head_over_prev":
                      round(med["head"] / med["prev"], 3)}
        print(f"{q:24s} prev={med['prev']:.2f} head={med['head']:.2f} "
              f"ratio={summary[q]['ratio_head_over_prev']}")
    json.dump({"iters": ITERS, "raw": results, "medians": summary},
              open(OUT, "w"), indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
