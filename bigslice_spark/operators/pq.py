"""Product quantization (PQ) — compressed-domain ANN, the IVF+PQ
standard (Jégou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011).

At 100 TB the raw float vectors are the cost: 1B × 64-dim float64 =
512 GB scanned per query batch. PQ splits each (L2-normalized) vector
into ``m`` subvectors and replaces each with the id of its nearest
per-subspace centroid: 64 dims × 8 bytes → m one-byte codes (64×
compression at m=8), and query scoring never touches floats — it sums
m table lookups per candidate (ADC, asymmetric distance computation).

Spark-first shape, reusing the engine's deterministic pieces:

  - TRAIN: per-subspace k-means via clustering.kmeans_train on sliced
    subvectors (bitwise-reproducible: seeded data-independent init,
    exact-decimal means). Codebooks are m × ksub × (dim/m) floats —
    KBs, a plan literal.
  - ENCODE: one codegen projection — per subspace, argmin over ksub
    centroids as least() over (distance, code) structs, each distance
    one array fold against a literal centroid (the
    _fold_dot_literal template; no interpretation cliff at these
    widths). No shuffle, no Python.
  - SEARCH (ADC): the query's m×ksub inner-product table is built
    driver-side (queries are metadata-scale by contract, like k-means
    centroids) and broadcast; each corpus row's score is m
    element_at lookups, unrolled into one codegen expression. Exact
    re-rank of the ADC shortlist (oversample×k) restores true cosine
    on the final k — the standard two-stage serving layout.

Reference: no analog in bigslice (no vector ops at all); part of the
similarity surface beside brute-force/LSH/IVF (similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .clustering import kmeans_train
from .similarity import (_as_double_vec, _dim_of, _dot_wide,
                         _fold_dot_literal, _prep, _rerank)


def _normed(df: DataFrame, vec_col: str, id_col: str,
            dim: int) -> DataFrame:
    p = _prep(df, vec_col, id_col, dim)
    unit = F.transform("v", lambda x: x / F.col("nrm"))
    return p.select("nid", unit.alias("v"))


def pq_train(df: DataFrame, m: int = 8, ksub: int = 16,
             vec_col: str = "embedding", id_col: str = "vec_id",
             dim: int | None = None, iters: int = 4,
             seed: int = 7) -> list:
    """Train m per-subspace codebooks of ksub centroids each over the
    L2-normalized corpus. Returns [m][ksub][dim/m] floats. One
    kmeans_train per subspace — m small deterministic Lloyd loops,
    each a scan + ksub-row shuffle per iteration."""
    from concurrent.futures import ThreadPoolExecutor

    dim = dim or _dim_of(df, vec_col)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    unit = _normed(df, vec_col, id_col, dim)

    def _train(j: int):
        sub = unit.select(F.col("nid").alias(id_col),
                          F.slice("v", j * dsub + 1, dsub)
                          .alias("sub"))
        return kmeans_train(sub, k=ksub, dim=dsub, iters=iters,
                            vec_col="sub", id_col=id_col,
                            seed=seed + j)

    # the m subspace trainings are independent; run them as CONCURRENT
    # Spark jobs (driver threads) instead of m*iters sequential
    # collect-rounds — results are bitwise-unchanged (kmeans_train is
    # deterministic regardless of scheduling), wall drops ~m-fold
    with ThreadPoolExecutor(max_workers=m) as ex:
        return list(ex.map(_train, range(m)))


def _code_expr(j: int, dsub: int, ksub: int, book) -> F.Column:
    """argmin_c ||x_j - c||^2 = argmin_c (||c||^2 - 2<x_j, c>) as a
    least() over (partial-distance, code) structs — ties resolve to
    the smaller code by struct ordering."""
    sl = f"slice(v, {j * dsub + 1}, {dsub})"
    cands = []
    for c, cent in enumerate(book):
        c_norm = sum(x * x for x in cent)
        d = F.expr(_fold_dot_literal(sl, cent)) * F.lit(-2.0) \
            + F.lit(float(c_norm))
        cands.append(F.struct(d.alias("d"), F.lit(c).alias("c")))
    return F.least(*cands).getField("c")


def pq_encode(df: DataFrame, codebooks: list,
              vec_col: str = "embedding", id_col: str = "vec_id",
              dim: int | None = None) -> DataFrame:
    """(nid, codes array<int>) — one zero-shuffle codegen projection;
    vectors are L2-normalized before encoding (cosine regime)."""
    dim = dim or _dim_of(df, vec_col)
    m = len(codebooks)
    dsub = dim // m
    ksub = len(codebooks[0])
    unit = _normed(df, vec_col, id_col, dim)
    codes = F.array(*[_code_expr(j, dsub, ksub, codebooks[j])
                      for j in range(m)])
    return unit.select("nid", codes.alias("codes"))


def pq_topk(df: DataFrame, queries: DataFrame, codebooks: list,
            k: int = 10, vec_col: str = "embedding",
            id_col: str = "vec_id", dim: int | None = None,
            oversample: int = 4) -> DataFrame:
    """Two-stage PQ search: ADC shortlist of oversample*k candidates
    per query from the codes alone, then exact cosine re-rank of the
    shortlist against the raw vectors. Output matches the other ANN
    ops: (qid, nid, cosine, rank), cosine exact on the returned k.

    Queries are collected driver-side to build the m×ksub ADC tables
    (queries are metadata-scale by contract; the corpus never is)."""
    dim = dim or _dim_of(df, vec_col)
    m = len(codebooks)
    dsub = dim // m
    ksub = len(codebooks[0])
    spark = df.sparkSession

    qrows = _normed(queries, vec_col, id_col, dim).collect()
    if not qrows:
        return _rerank(
            df.sparkSession.createDataFrame(
                [], "qid long, nid long, cosine double"), k)
    tabs = []
    for r in qrows:
        qv = list(r["v"])
        tab = [sum(qv[j * dsub + t] * cent[t] for t in range(dsub))
               for j in range(m) for cent in codebooks[j]]
        tabs.append((r["nid"], tab))
    qdf = spark.createDataFrame(tabs, "qid long, tab array<double>")

    encoded = pq_encode(df, codebooks, vec_col, id_col, dim)
    # ADC score: sum of m table lookups, unrolled (codegen, no HOF)
    score = None
    for j in range(m):
        term = F.element_at(
            "tab", (F.lit(j * ksub)
                    + F.element_at("codes", j + 1) + 1).cast("int"))
        score = term if score is None else score + term
    shortlist = (encoded.join(F.broadcast(qdf),
                              F.col("nid") != F.col("qid"))
                 .withColumn("adc", score))
    wq = W.partitionBy("qid").orderBy(F.desc("adc"), "nid")
    cand = (shortlist.withColumn("r", F.row_number().over(wq))
            .filter(F.col("r") <= oversample * k)
            .select("qid", "nid"))
    # exact re-rank of the shortlist against raw vectors
    corpus = _prep(df, vec_col, id_col, dim)
    qs = _prep(queries, vec_col, id_col, dim) \
        .select(F.col("nid").alias("qid"), F.col("v").alias("qv"),
                F.col("nrm").alias("qnrm"))
    scored = (cand.join(corpus, "nid").join(F.broadcast(qs), "qid")
              .withColumn("cosine", _dot_wide("v", "qv", dim)
                          / (F.col("nrm") * F.col("qnrm"))))
    return _rerank(scored, k)
