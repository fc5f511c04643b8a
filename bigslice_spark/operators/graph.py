"""Iterative graph operators.

The reference supports iterative workloads by passing a computed
`*Result` back into the next invocation (exec/session.go:34-37,
exec/compile.go:226-261 task reuse — SURVEY §3 entry point C). The
Spark analog is a driver loop over persisted/checkpointed DataFrames.

connected_components implements minimum-label propagation: every node's
label converges to the smallest node id reachable from it. This is the
transitive-closure step that turns near-duplicate PAIRS (minhash /
ngram-jaccard output) into duplicate CLUSTERS — canonical docs are the
component minima. Deterministic on integer ids, so it oracle-checks
against a recursive CTE.

Scale shape: each iteration is one join (labels ⋈ symmetric edges) +
one min-aggregation — both hash-partitioned on node id, so every
iteration reuses the same partitioning. Iterations = graph diameter
(near-dup clusters are shallow; ≤10 covers real corpora). Each round
is materialized (checkpoint.materialize) to truncate the
exponentially growing lineage — localCheckpoint on local masters,
reliable checkpoints on clusters, overridable with ``reliable=``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpoint import materialize


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst",
                         nodes: DataFrame | None = None,
                         node_col: str = "node",
                         max_iter: int = 20,
                         reliable: bool | None = None) -> DataFrame:
    """(node, component) for every node, component = min reachable id.

    `edges` are undirected (symmetrized internally). `nodes` optionally
    supplies isolated vertices (emitted as their own singleton
    component). Converges when an iteration changes no label; raises if
    max_iter rounds don't converge (diameter > max_iter).
    """
    e = edges.select(F.col(src).cast("long").alias("u"),
                     F.col(dst).cast("long").alias("v"))
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = materialize(sym.distinct(), reliable)

    lab = sym.select("u").distinct() \
        .select(F.col("u").alias("node"), F.col("u").alias("label"))
    if nodes is not None:
        extra = (nodes.select(F.col(node_col).cast("long").alias("node"))
                 .join(lab.select("node"), on="node", how="left_anti")
                 .select("node", F.col("node").alias("label")))
        lab = lab.unionByName(extra)
    lab = materialize(lab, reliable)

    for _ in range(max_iter):
        # candidate labels: own label + the label of every neighbor
        nbr = (sym.join(lab, sym.v == lab.node)
               .select(F.col("u").alias("node"),
                       F.col("label").alias("cand")))
        new = materialize(
            lab.select("node", F.col("label").alias("cand"))
            .unionByName(nbr)
            .groupBy("node").agg(F.min("cand").alias("label")),
            reliable)
        changed = (new.join(lab.withColumnRenamed("label", "old"), "node")
                   .filter(F.col("label") != F.col("old")).count())
        lab = new
        if changed == 0:
            return lab.select("node", F.col("label").alias("component"))
    raise RuntimeError(f"did not converge in {max_iter} iterations")
