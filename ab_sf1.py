"""Interleaved same-box fresh-JVM A/B: r13 seal tree (fc68e70,
worktree at /root/repo_r13) vs HEAD — the VERDICT r14 task-2
adjudication of the fleet-wide elevation PERF_r14 recorded on
UNTOUCHED queries.

Protocol: for each iteration, for each query, run the query once in
each tree via the bench's own per-query fresh-JVM path
(SPARK_GRAFT_BENCH_ONLY=<name>, same env contract, same timed
action), alternating trees back-to-back so box drift cannot favor
one side. Medians over iterations are the verdict; results land in
ab_r15_results.json.

Queries: the 10 worst PERF_r14 rows plus controls — ≥5 verified
UNTOUCHED between fc68e70 and HEAD (q5, q13, range_join, sessionize,
op_cogroup, web_pipeline, similarity_lsh) and the touched
regression-suspect family (semantic_dedup, dedup_simhash,
decontaminate_bloom, dup_spans, text_stats).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

UNTOUCHED = []
TOUCHED = [
    "dedup_simhash", "semantic_dedup", "dedup_minhash",
    "ngram_jaccard",
]
QUERIES = UNTOUCHED + TOUCHED
TREES = [("r14", "/root/repo_r14"), ("fix", "/root/repo")]
ITERS = int(os.environ.get("AB_ITERS", "3"))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ab_r15_sf1_results.json")


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
    t0 = time.time()
    for it in range(ITERS):
        for q in QUERIES:
            # alternate which tree goes first each iteration so
            # slow-drift cannot systematically favor one side
            order = TREES if it % 2 == 0 else TREES[::-1]
            for tname, tdir in order:
                v = run_one(tdir, q)
                results[q][tname].append(v)
                print(f"iter{it} {q} [{tname}]: {v}s "
                      f"(elapsed {time.time() - t0:.0f}s)", flush=True)
            with open(OUT, "w") as f:
                json.dump(results, f, indent=1)
    summary = {}
    for q in QUERIES:
        a = [v for v in results[q]["r14"] if v > 0]
        b = [v for v in results[q]["fix"] if v > 0]
        summary[q] = {
            "r14_median": round(statistics.median(a), 3) if a else None,
            "fix_median": round(statistics.median(b), 3) if b else None,
            "fix_over_r14": round(statistics.median(b)
                                   / statistics.median(a), 3)
            if a and b else None,
            "touched": q in TOUCHED,
        }
    with open(OUT, "w") as f:
        json.dump({"runs": results, "summary": summary,
                   "iters": ITERS}, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
