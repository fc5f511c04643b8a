"""Approximate-nearest-neighbor search over embedding columns.

Three tiers, same output shape (query_id, neighbor_id, cosine, rank):

- brute_force_topk:  exact baseline — broadcast the (small) query set,
                     codegen'd zip_with/aggregate dot products, per-query
                     top-k via window. Cost O(N·Q·d), embarrassingly
                     parallel, zero shuffle until the final top-k.
- lsh_topk:          random-hyperplane LSH — b sign-bits bucket the corpus;
                     queries probe their own bucket (+ optional multiprobe
                     by flipping bits); exact rerank inside buckets. The
                     100TB path: candidate generation is an equi-join on
                     bucket id.
- ivf_topk:          IVF — KMeans centroids (pyspark.ml, trained on a
                     sample), assign each vector to its cell, probe the
                     nprobe nearest cells per query, exact rerank inside.

All distance math is expression-level double arithmetic (no Python in the
per-row path); hyperplanes are a deterministic seeded family so results are
reproducible across runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _as_double_vec(col) -> "F.Column":
    return F.transform(col, lambda x: x.cast("double"))


def _norm(col) -> "F.Column":
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a, b) -> "F.Column":
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _dot_exact(a, b) -> "F.Column":
    """Order-independent exact dot product: per-element double products
    (IEEE-identical across engines) summed as DECIMAL(38,12) → double.
    Used when results must hash-match an external oracle."""
    # acc is (30,12); each add widens to (31,12) exactly, then the cast
    # narrows back — no scale loss, and the lambda keeps a fixed type
    # (Spark decimal addition grows precision by 1 per operand pair).
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("decimal(20,12)")),
        F.lit(0).cast("decimal(30,12)"),
        lambda acc, x: (acc + x).cast("decimal(30,12)")).cast("double")


def _prep(df: DataFrame, vec_col: str, id_col: str,
          exact: bool = False) -> DataFrame:
    v = df.select(F.col(id_col).alias("nid"),
                  _as_double_vec(F.col(vec_col)).alias("v"))
    nrm = F.sqrt(_dot_exact("v", "v")) if exact else _norm("v")
    return v.withColumn("nrm", nrm).filter(F.col("nrm") > 0)


def brute_force_topk(df: DataFrame, queries: DataFrame, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     q_vec_col: str | None = None,
                     q_id_col: str | None = None,
                     exact: bool = False) -> DataFrame:
    """Exact cosine top-k: broadcast queries × corpus scan, window top-k.
    Rank ties broken by neighbor id for determinism. exact=True computes
    dot/norms via decimal accumulation (reproducible across engines)."""
    q_vec_col = q_vec_col or vec_col
    q_id_col = q_id_col or id_col
    dot = _dot_exact if exact else _dot
    corpus = _prep(df, vec_col, id_col, exact)
    qs = queries.select(F.col(q_id_col).alias("qid"),
                        _as_double_vec(F.col(q_vec_col)).alias("qv"))
    qnrm = F.sqrt(_dot_exact("qv", "qv")) if exact else _norm("qv")
    qs = qs.withColumn("qnrm", qnrm).filter(F.col("qnrm") > 0)
    scored = (corpus.join(F.broadcast(qs), F.col("nid") != F.col("qid"))
              .withColumn("cosine",
                          dot("v", "qv") / (F.col("nrm") * F.col("qnrm"))))
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), "nid")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "nid", "cosine", "rank"))


def _hyperplanes(dim: int, nbits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG, no numpy RNG state)."""
    planes = []
    state = seed
    for _ in range(nbits):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) \
                % (1 << 64)
            row.append(((state >> 33) / float(1 << 31)) - 1.0)
        planes.append(row)
    return planes


def _bucket_expr(vec: "F.Column", planes: list[list[float]]) -> "F.Column":
    """Sign-bit bucket id from a fixed hyperplane family, expression-level:
    bit_i = (Σ_j v[j] * p_i[j]) > 0."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        proj = _dot(vec, plane)
        bits.append(F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = F.lit(0)
    for b in bits:
        out = out.bitwiseOR(b)
    return out


def lsh_topk(df: DataFrame, queries: DataFrame, k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             nbits: int = 8, dim: int | None = None,
             multiprobe: int = 1) -> DataFrame:
    """Random-hyperplane LSH ANN: equi-join on bucket id, exact rerank
    inside buckets. multiprobe=m additionally probes buckets at hamming
    distance 1 for the first m bit positions (recall knob)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, nbits)
    corpus = _prep(df, vec_col, id_col) \
        .withColumn("bk", _bucket_expr(F.col("v"), planes))
    qs = queries.select(F.col(id_col).alias("qid"),
                        _as_double_vec(F.col(vec_col)).alias("qv"))
    qs = qs.withColumn("qnrm", _norm("qv")).filter(F.col("qnrm") > 0) \
        .withColumn("bk0", _bucket_expr(F.col("qv"), planes))
    probes = [F.col("bk0")]
    for i in range(max(0, multiprobe - 1)):
        probes.append(F.col("bk0").bitwiseXOR(F.lit(1 << i)))
    qs = qs.withColumn("bk", F.explode(F.array(*probes)))
    scored = (corpus.join(qs, on="bk")
              .filter(F.col("nid") != F.col("qid"))
              .withColumn("cosine",
                          _dot("v", "qv") / (F.col("nrm") * F.col("qnrm"))))
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), "nid")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "nid", "cosine", "rank"))


def ivf_topk(df: DataFrame, queries: DataFrame, k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             ncells: int = 16, nprobe: int = 4,
             sample_fraction: float = 1.0, seed: int = 42) -> DataFrame:
    """IVF ANN: KMeans cells (pyspark.ml), probe nprobe nearest cells.
    Trains on a sample; assignment + rerank are expression-level."""
    try:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector
    except ImportError as ex:  # pragma: no cover
        raise NotImplementedError(f"pyspark.ml unavailable: {ex}")

    corpus = _prep(df, vec_col, id_col)
    train = corpus if sample_fraction >= 1.0 else \
        corpus.sample(fraction=sample_fraction, seed=seed)
    km = KMeans(k=ncells, seed=seed, featuresCol="feat")
    model = km.fit(train.withColumn("feat", array_to_vector("v")))
    centers = [[float(x) for x in c] for c in model.clusterCenters()]

    def cell_dists(vec):
        """array<struct<d,cell>> of squared L2 to each centroid."""
        return F.array(*[
            F.struct(
                F.aggregate(
                    F.zip_with(vec, F.array(*[F.lit(x) for x in c]),
                               lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0), lambda acc, x: acc + x).alias("d"),
                F.lit(i).alias("cell"))
            for i, c in enumerate(centers)])

    assigned = corpus.withColumn(
        "cell", F.array_min(cell_dists(F.col("v")))["cell"])
    qs = queries.select(F.col(id_col).alias("qid"),
                        _as_double_vec(F.col(vec_col)).alias("qv"))
    qs = (qs.withColumn("qnrm", _norm("qv")).filter(F.col("qnrm") > 0)
          .withColumn("cells", F.slice(
              F.array_sort(cell_dists(F.col("qv"))), 1, nprobe))
          .withColumn("cell", F.explode(
              F.transform("cells", lambda s: s["cell"])))
          .drop("cells"))
    scored = (assigned.join(qs, on="cell")
              .filter(F.col("nid") != F.col("qid"))
              .withColumn("cosine",
                          _dot("v", "qv") / (F.col("nrm") * F.col("qnrm"))))
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), "nid")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "nid", "cosine", "rank"))
