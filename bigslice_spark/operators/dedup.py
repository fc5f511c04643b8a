"""Deduplication operators for 100TB-scale training-data pipelines.

Five strategies, all DataFrame-native (no row-at-a-time Python in any hot
path):

- exact_dedup:       hash-groupBy on a content digest (one shuffle).
- minhash_lsh:       word-shingles → 64-bit token hashes → H minhash
                     signatures → banded LSH buckets → candidate pairs →
                     signature-similarity verify. All expression-level
                     (xxhash64 + higher-order array functions); no UDF.
- simhash:           64-bit sign-of-weighted-bit-sums fingerprint; near-dup
                     candidates via 4×16-bit band pigeonhole + hamming check.
- ngram_jaccard:     inverted-index self-join on distinct tokens; exact
                     Jaccard from intersection/union counts (SQL-equivalent,
                     oracle-checkable).
- embedding_cosine:  near-dup pairs among embeddings, bucketed by label (or
                     any coarse partitioner) to bound the quadratic blowup.

Scale notes: every strategy is one-or-two-shuffle; candidate generation is
always inverted-index style (explode + groupBy), never a cross join. Hot
keys (a token appearing in most documents) are pruned by document-frequency
before the self-join — the classic guard against quadratic skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .text import tokens

# Mersenne-ish primes for the affine minhash family over a 31-bit domain —
# products stay < 2^62, safe under ANSI overflow checking.
_MH_PRIME = (1 << 31) - 1
_U64 = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    """Deterministic 64-bit mixer (public splitmix64 constants) used to
    derive independent-ish minhash coefficients."""
    z = (x + 0x9E3779B97F4A7C15) & _U64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _U64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _U64
    return z ^ (z >> 31)


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the smallest id per content digest.
    One shuffle on the digest; the digest (not the content) is the shuffle
    key, so 100TB of text moves as 16-byte hashes + ids."""
    h = F.md5(F.col(text_col))
    return (df.select(F.col(id_col), h.alias("h"))
            .groupBy("h")
            .agg(F.min(id_col).alias(id_col),
                 F.count(F.lit(1)).alias("n_copies")))


def _shingle_rows(df: DataFrame, text_col: str, id_col: str,
                  w: int = 3, distinct: bool = True) -> DataFrame:
    """(id, shingle) rows via posexplode + window lead — every expression
    stays inside whole-stage codegen (vs the interpreted array-lambda
    form in _shingles, measured ~19µs/shingle and ~10× slower at sf0.1).
    One shuffle on id for the window; docs shorter than w yield a single
    whole-doc shingle, matching _shingles and the DuckDB oracles."""
    t = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    t = t.select(id_col, F.size("__toks").alias("__n"),
                 F.array_join("__toks", " ").alias("__all"),
                 F.posexplode_outer("__toks").alias("__pos", "__tok"))
    wspec = W.partitionBy(id_col).orderBy("__pos")
    parts = [F.col("__tok")] + [F.lead("__tok", k).over(wspec)
                                for k in range(1, w)]
    ann = t.withColumn("__sh", F.concat_ws(" ", *parts))
    # single conditional pass, NOT a union of two filters — a union makes
    # Spark evaluate the posexplode+window subtree once per branch
    keep = (((F.col("__n") >= w) & (F.col("__pos") <= F.col("__n") - w))
            | ((F.col("__n") < w)
               & (F.col("__pos").isNull() | (F.col("__pos") == 0))))
    val = F.when(F.col("__n") >= w, F.col("__sh")).otherwise(F.col("__all"))
    out = ann.filter(keep).select(id_col, val.alias("tok"))
    return out.distinct() if distinct else out


def _shingles(text_col: str, w: int = 3) -> "F.Column":
    """Word w-shingles as an array column (empty-safe).

    NOTE: the higher-order lambdas here are INTERPRETED by Spark (no
    codegen); hot paths use _shingle_rows instead."""
    toks = tokens(text_col)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (w - 1), F.lit(1)))
    return F.when(n >= w, F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, w)))
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 64,
                       shingle_w: int = 3) -> DataFrame:
    """doc → array<long> of minhash signatures, fully expression-level.

    h_i(x) = (a_i * x + b_i) mod p over 31-bit shingle hashes; a_i/b_i are
    a fixed deterministic family (reproducible across runs/engines)."""
    # Shingle rows come from the codegen'd _shingle_rows path (duplicate
    # shingles are harmless under MIN, so skip the distinct shuffle),
    # then 64 codegen'd MIN aggregates over the exploded hashes. An
    # array_min(transform(...)) formulation measured 16s at sf0.01 vs
    # ~1s for this plan — higher-order lambdas are interpreted. Map-side
    # partial aggregation collapses rows back to ~one per document
    # before the exchange, so the shuffle stays narrow at scale.
    wide = _minhash_wide(df, text_col, id_col, num_hashes, shingle_w)
    return wide.select(
        F.col(id_col),
        F.array(*[F.col(f"__s{i}__") for i in range(num_hashes)])
        .alias("sig"))


def _minhash_wide(df: DataFrame, text_col: str, id_col: str,
                  num_hashes: int, shingle_w: int) -> DataFrame:
    """One column per minhash (``__s0__``..) — the codegen-friendly wide
    form banding reads directly (array ops on the assembled sig column
    would be interpreted)."""
    hx = (_shingle_rows(df, text_col, id_col, shingle_w, distinct=False)
          .select(F.col(id_col),
                  F.pmod(F.xxhash64("tok"), F.lit(_MH_PRIME)).alias("h")))
    p = F.lit(_MH_PRIME)
    aggs = []
    for i in range(num_hashes):
        # splitmix64-derived coefficients: an arithmetic-progression family
        # ((2i+1)*c) is NOT pairwise independent — one shared shingle could
        # win the min for most i simultaneously (observed: 45/64 matches on
        # a 0.009-Jaccard pair). a in [1, p-1], b in [0, p-1).
        a = _splitmix64(2 * i) % (_MH_PRIME - 1) + 1
        b = _splitmix64(2 * i + 1) % _MH_PRIME
        aggs.append(F.min(F.pmod(F.col("h") * F.lit(a) + F.lit(b), p))
                    .alias(f"__s{i}__"))
    return hx.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_hashes: int = 64,
                      bands: int = 16, threshold: float = 0.5,
                      shingle_w: int = 3) -> DataFrame:
    """Near-duplicate candidate pairs via banded LSH, verified by signature
    similarity (fraction of matching minhashes ≈ Jaccard).

    Plan shape: signatures (narrow scan) → explode bands (×bands) →
    groupBy band-hash (shuffle of small rows) → within-bucket pairing via
    sorted collect_list → explode pairs → signature verify. Buckets are
    capped to guard against degenerate all-equal corpora."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_w)
    # Banding stays in the interpreted array-lambda form DELIBERATELY:
    # a codegen formulation (16 band-hash structs off the wide agg
    # columns in one projection) measured 23s cold vs 5s here — Janino
    # JIT of the ~150-expression method dominates. Banding evaluates
    # once per DOCUMENT (not per shingle), so the interpreted per-row
    # cost stays negligible at any scale.
    banded = sig.select(
        id_col, "sig",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.xxhash64(F.concat_ws(
                    ",", F.transform(
                        F.slice("sig", b * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string")))).alias("bh"))
        )).alias("bk"))
    buckets = (banded
               .groupBy(F.col("bk.band").alias("band"),
                        F.col("bk.bh").alias("bh"))
               .agg(F.slice(F.array_sort(
                    F.collect_list(F.struct(F.col(id_col).alias("id"),
                                            F.col("sig").alias("sig")))),
                    1, 64).alias("members"))
               .filter(F.size("members") > 1))
    pair_idx = F.filter(
        F.flatten(F.transform(
            F.sequence(F.lit(1), F.size("members")),
            lambda i: F.transform(
                F.sequence(F.lit(1), F.size("members")),
                lambda j: F.struct(i.alias("i"), j.alias("j"))))),
        lambda p: p["i"] < p["j"])
    matches = F.size(F.filter(
        F.zip_with("a.sig", "b.sig", lambda x, y: x == y), lambda v: v))
    pairs = (buckets
             .select(F.explode(pair_idx).alias("p"), "members")
             .select(F.col("members")[F.col("p.i") - 1].alias("a"),
                     F.col("members")[F.col("p.j") - 1].alias("b"))
             .select(F.col("a.id").alias("id_a"),
                     F.col("b.id").alias("id_b"),
                     (matches.cast("double")
                      / F.lit(float(num_hashes))).alias("sim")))
    return (pairs.filter(F.col("sim") >= threshold)
            .groupBy("id_a", "id_b").agg(F.max("sim").alias("sim")))


def minhash_dedup(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", **kw) -> DataFrame:
    """Keep a document unless a near-duplicate with a smaller id exists
    (single-pass practical policy; full transitive closure is iterative
    and rarely worth it for training-data dedup)."""
    pairs = minhash_lsh_pairs(df, text_col, id_col, **kw)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def simhash64(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over whitespace tokens:
    bit_j = sign( Σ_tokens (bit_j(xxhash64(token)) ? +1 : -1) ).

    Explode+aggregate formulation: array lambdas are interpreted in Spark,
    but 64 SUM aggregates over exploded token hashes stay inside
    whole-stage codegen, with map-side partial aggregation keeping the
    shuffle at ~one row per document."""
    th = (df.select(F.col(id_col), F.explode(tokens(text_col)).alias("t"))
          .select(F.col(id_col), F.xxhash64("t").alias("h")))
    aggs = [F.sum(F.when(F.shiftright(F.col("h"), j)
                         .bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1))
            .alias(f"__b{j}__") for j in range(64)]
    wide = th.groupBy(id_col).agg(*aggs)
    out = F.lit(0).cast("long")
    for j in range(64):
        out = out.bitwiseOR(
            F.when(F.col(f"__b{j}__") > 0,
                   F.shiftleft(F.lit(1).cast("long"), j))
            .otherwise(F.lit(0).cast("long")))
    return wide.select(F.col(id_col), out.alias("sh"))


def simhash_pairs(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: pigeonhole on 4×16-bit bands (hamming ≤ 3
    ⇒ at least one band equal), then exact hamming verify via bit_count."""
    sh = simhash64(df, text_col, id_col)
    banded = sh.select(
        id_col, "sh",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.shiftright("sh", 16 * b)
                     .bitwiseAND(F.lit(0xFFFF)).alias("bh"))
            for b in range(4)])).alias("bk"))
    buckets = (banded
               .groupBy(F.col("bk.band"), F.col("bk.bh"))
               .agg(F.slice(F.array_sort(F.collect_list(
                    F.struct(F.col(id_col).alias("id"),
                             F.col("sh").alias("sh")))), 1, 64)
                    .alias("members"))
               .filter(F.size("members") > 1))
    pair_idx = F.filter(
        F.flatten(F.transform(
            F.sequence(F.lit(1), F.size("members")),
            lambda i: F.transform(
                F.sequence(F.lit(1), F.size("members")),
                lambda j: F.struct(i.alias("i"), j.alias("j"))))),
        lambda p: p["i"] < p["j"])
    pairs = (buckets
             .select(F.explode(pair_idx).alias("p"), "members")
             .select(F.col("members")[F.col("p.i") - 1].alias("a"),
                     F.col("members")[F.col("p.j") - 1].alias("b"))
             .select(F.col("a.id").alias("id_a"),
                     F.col("b.id").alias("id_b"),
                     F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
                     .alias("hamming"))
             .filter(F.col("hamming") <= max_hamming)
             .groupBy("id_a", "id_b").agg(F.min("hamming").alias("hamming")))
    return pairs


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", threshold: float = 0.6,
                        max_df_ratio: float = 0.5,
                        shingle_w: int = 3) -> DataFrame:
    """Exact n-gram (word w-shingle) Jaccard via inverted-index self-join —
    the SQL-expressible (oracle-checkable) dedup path (Broder
    w-shingling; shingle_w=1 degenerates to plain tokens).

    Two guards keep the self-join sub-quadratic at 100×:
    - shingles, not tokens: a w-shingle key space is |vocab|^w, so the
      posting lists stay short even on small vocabularies (measured: the
      token formulation was 84s at sf0.1 on a 31-word vocab; shingles
      make it seconds);
    - df-pruning: shingles in > max_df_ratio of documents are dropped
      before the join — quadratic fanout, no discriminative signal.
    Jaccard is computed on the UNPRUNED set sizes.

    The pruned inverted index (id, tok, set-size) is built in ONE pass —
    set sizes and document frequencies attached as window counts over
    the same postings — and materialized via localCheckpoint before the
    self-join, which would otherwise recompute the shingling 2× more
    (measured 7.4s → 2.9s at sf0.1). On a multi-executor cluster,
    swap localCheckpoint for a persisted/parquet-backed index (a
    non-reliable checkpoint dies with its executor)."""
    toks = _shingle_rows(df, text_col, id_col, shingle_w, distinct=True)
    ndocs = df.count()
    sz = F.count(F.lit(1)).over(W.partitionBy(id_col))
    dfreq = F.count(F.lit(1)).over(W.partitionBy("tok"))
    cold = (toks.withColumn("sz", sz)
            .withColumn("df", dfreq)
            .filter(F.col("df") <= int(max_df_ratio * ndocs))
            .select(id_col, "tok", "sz")
            .localCheckpoint())
    a = cold.toDF("id_a", "tok", "sz_a")
    b = cold.toDF("id_b", "tok", "sz_b")
    return (a.join(b, on="tok")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b", "sz_a", "sz_b")
            .agg(F.count(F.lit(1)).alias("inter"))
            .withColumn("jaccard",
                        F.col("inter").cast("double")
                        / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
                        .cast("double"))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def embedding_cosine_pairs(df: DataFrame, vec_col: str = "embedding",
                           id_col: str = "vec_id",
                           bucket_col: str = "label",
                           threshold: float = 0.95) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold within coarse buckets
    (label / LSH band / IVF cell). The bucket join bounds the quadratic
    candidate space; cosine is a codegen'd zip_with/aggregate in double."""
    from .similarity import _dim_of, _dot_wide
    dim = _dim_of(df, vec_col)
    v = df.select(F.col(id_col), F.col(bucket_col).alias("bk"),
                  F.transform(F.col(vec_col),
                              lambda x: x.cast("double")).alias("v"))
    v = v.withColumn("n", F.sqrt(_dot_wide("v", "v", dim))) \
        .filter(F.col("n") > 0)
    a = v.toDF("id_a", "bk", "va", "na")
    b = v.toDF("id_b", "bk", "vb", "nb")
    dot = _dot_wide("va", "vb", dim)
    return (a.join(b, on="bk")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", dot / (F.col("na") * F.col("nb")))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))
