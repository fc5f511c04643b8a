"""Deterministic distributed clustering primitives.

similarity.ivf_topk already uses pyspark.ml KMeans for index cells; its
oracle is necessarily a weak recall bound (ml's float accumulation is
not engine-reproducible). This module provides the complementary piece:
a SINGLE Lloyd iteration built from deterministic literal centroids and
exact arithmetic, so the full assign→update step is value-checkable
bit-for-bit against a SQL oracle — and composable into an iterative
driver loop (collect k·d doubles per iteration, nothing else).

Scale shape: assignment is a pure projection (wide codegen argmin over
k literal centroids — no join, no shuffle); the update is one hash
aggregation on the cell id. Per-iteration cost at 100 TB = one scan +
one k-row shuffle, the textbook distributed Lloyd step. Means use
decimal-exact sums (queries.py float conventions) so results don't
depend on partial-aggregation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _hyperplanes


def seed_centroids(k: int, dim: int, seed: int = 7,
                   scale: float = 0.125) -> list[list[float]]:
    """Deterministic pseudo-random centroids in [-scale, scale]^dim (the
    LCG hyperplane family): data-independent, so no driver-side sample
    or collect is needed to start the loop. The default scale suits
    unit-normalized embeddings (coords ~±0.1): centroid norms land near
    the data shell, so the initial Voronoi cells actually partition the
    cloud instead of funneling it into one corner cell."""
    return [[x * scale for x in row] for row in _hyperplanes(dim, k, seed=seed)]


def kmeans_assign(df: DataFrame, centroids: list[list[float]],
                  vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """Assign each vector to its nearest centroid (squared L2, argmin;
    ties break toward the lower cell id). One F.expr parse; the whole
    assignment is a zero-shuffle projection."""
    dim = len(centroids[0])
    v = df.select(F.col(id_col),
                  F.transform(F.col(vec_col),
                              lambda x: x.cast("double")).alias("__v__"))
    entries = []
    for ci, c in enumerate(centroids):
        d = " + ".join(
            f"(__v__[{j}] - ({c[j]!r})) * (__v__[{j}] - ({c[j]!r}))"
            for j in range(dim))
        entries.append(f"named_struct('d', ({d}), 'cell', {ci})")
    arg = F.expr("array_min(array(" + ", ".join(entries) + "))")
    return v.select(id_col, arg["cell"].cast("int").alias("cell"),
                    arg["d"].alias("dist"))


def kmeans_update(df: DataFrame, centroids: list[list[float]],
                  vec_col: str = "embedding",
                  id_col: str = "vec_id",
                  mean_dims: int = 4,
                  scale: int = 12) -> DataFrame:
    """One Lloyd update: per-cell count + exact-decimal means of the
    first ``mean_dims`` coordinates as scalar columns m0..mK (full-width
    means work identically; the registry entry keeps the output narrow
    for the driver's hash compare). Input floats are exact in ≤7
    significant digits, so decimal(38,scale) sums are exact and the
    mean double = exact_sum / count is bitwise engine-neutral."""
    assigned = kmeans_assign(df, centroids, vec_col, id_col)
    vecs = df.select(F.col(id_col),
                     F.transform(F.col(vec_col),
                                 lambda x: x.cast("double")).alias("__v__"))
    j = assigned.join(vecs, on=id_col)
    aggs = [F.count(F.lit(1)).alias("n")]
    for m in range(mean_dims):
        aggs.append(
            (F.sum(F.col("__v__")[m].cast(f"decimal(38,{scale})"))
             .cast("double") / F.count(F.lit(1))).alias(f"m{m}"))
    return j.groupBy("cell").agg(*aggs)
