"""The 100TB training-data pipeline, end to end on this engine:

  quality filter → exact dedup → MinHash near-dup removal →
  near-dup CLUSTER report (connected components) → per-language
  token budget — with distributed counters at every stage.

Every stage is one of the audited operators (same composition the
`pipeline_end2end` registry entry oracle-checks); this script is the
runnable user journey with per-stage survivor counts.

Run: python examples/llm_pipeline.py [sf_dir]
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import pyspark.sql.functions as F

from bigslice_spark import Session
from bigslice_spark.metrics import Scope
from bigslice_spark.operators.dedup import (exact_dedup,
                                            minhash_lsh_pairs)
from bigslice_spark.operators.graph import connected_components
from bigslice_spark.operators.text import bpe_token_count, quality_score


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sess = Session()
    scope = Scope(sess.spark)
    docs = sess.read_parquet(f"{sf_dir}/documents.parquet").df
    scope.counter("ingested").incr(docs.count())

    # 1. cheap quality prefilter (codegen'd token stats)
    q = quality_score(docs).filter(F.col("quality") >= 0.5)
    docs = docs.join(q.select("doc_id"), on="doc_id", how="left_semi")
    scope.counter("after_quality").incr(docs.count())

    # 2. exact dedup: 16-byte digests shuffle, not content
    docs = docs.join(exact_dedup(docs).select("doc_id"),
                     on="doc_id", how="left_semi")
    scope.counter("after_exact_dedup").incr(docs.count())

    # 3. near-dup pairs (un-capped banded LSH) → clusters → keep minima
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    comp = connected_components(pairs, src="id_a", dst="id_b")
    losers = comp.filter(F.col("node") != F.col("component")) \
        .select(F.col("node").alias("doc_id"))
    docs = docs.join(losers, on="doc_id", how="left_anti")
    scope.counter("after_near_dedup").incr(docs.count())

    # 4. per-language token budget for the sampler
    budget = (docs.groupBy("lang")
              .agg(F.count(F.lit(1)).alias("n_docs"),
                   F.sum(bpe_token_count("text")).alias("token_budget"))
              .orderBy("lang"))
    for lang, n_docs, tokens in budget.collect():
        print(f"{lang}\t{n_docs}\t{tokens}")
    for stage, n in scope.snapshot().items():
        print(f"# {stage}: {n}")


if __name__ == "__main__":
    main()
