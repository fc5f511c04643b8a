"""Broadcast Bloom filters — semi/anti joins past the broadcast limit.

The engine's decontamination and membership ops broadcast the small
side when it fits (decontam.py). At 100 TB the "small" side can stop
fitting: 100M distinct eval shingles x ~30 bytes of text is several
GB — too big for a broadcast hash join — while a Bloom filter of the
same set at 1% false positives is ~120 MB and broadcasts fine. The
pattern here:

  1. BUILD, distributed: the small side's keys are hashed JVM-side
     (xxhash64 twice, independent seeds) and turned into k bit
     positions with xor-rotate mixing — bitwise ops only, so ANSI
     overflow checking (Spark 4 default) can never fire. Positions
     explode to (word, mask) rows and a groupBy(word).agg(bit_or)
     assembles the filter WITHOUT ever collecting raw keys; only the
     m/64 aggregated words reach the driver (16 MB per 2^30 bits).
  2. PROBE, Arrow-batched: the filter ships as a numpy uint64 array
     via SparkContext.broadcast; a vectorized pandas UDF tests the k
     bits per row. Only the two 8-byte hash columns cross into
     Python — never the key text. This is the one deliberate Python
     touchpoint, and it exists because Spark does not expose its
     internal BloomFilterMightContain to the DataFrame API.
  3. VERIFY, exact: Bloom filters have no false negatives, so rows
     the probe rejects are definitively absent. Rows it accepts
     (target fpp + true hits) are re-checked with a REAL join — by
     then both sides are tiny relative to the corpus, so the verify
     join is cheap. bloom_semi_join / bloom_anti_join therefore
     return EXACTLY the rows a plain semi/anti join would.

Sizing: m = -n ln(fpp)/ln(2)^2 rounded up to a power of two (cheap
mask modulo), k = (m/n) ln 2. The build caps m at ``max_bits``
(default 2^33 = 1 GiB of driver/broadcast memory) and raises rather
than silently over-saturating the filter.

Reference: no analog in bigslice; Spark's own runtime-filter bloom
(InjectRuntimeFilter) inspired the shape but is not reachable from
the public API.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# fixed rotation schedule for the k probe positions (k <= 16 in any
# sane fpp regime; extend cyclically beyond)
_ROTS = (17, 31, 47, 5, 23, 41, 11, 53, 29, 3, 37, 59, 13, 43, 7, 61)


def _hash_cols(col: Column) -> tuple[Column, Column]:
    """Two independent 64-bit hashes of a column, JVM-side."""
    return F.xxhash64(col), F.xxhash64(col, F.lit(0x9E3779B9))


def _position(h1: Column, h2: Column, rot: int, m: int) -> Column:
    """(h1 ^ rotl64(h2, rot)) & (m-1) — bitwise only, ANSI-safe."""
    rotl = F.shiftleft(h2, rot).bitwiseOR(
        F.shiftrightunsigned(h2, 64 - rot))
    return h1.bitwiseXOR(rotl).bitwiseAND(F.lit(m - 1))


@dataclass
class Bloom:
    words: "np.ndarray"       # uint64[m/64]
    m: int                    # bits, power of two
    k: int                    # probes
    n_items: int
    # one SparkContext.broadcast per Bloom INSTANCE, created lazily on
    # first probe and reused after — repeated probes in a long-lived
    # session must not accumulate up-to-GiB-scale broadcasts on the
    # driver and executors. Keyed on the context: reusing a Bloom
    # after a session restart must rebuild, not hand back a dead (or
    # foreign-context) broadcast.
    _bc: object = field(default=None, repr=False, compare=False)

    def broadcast_for(self, sc) -> object:
        """The (cached) broadcast of ``words`` on context ``sc``;
        rebuilt when the context changed since the last probe."""
        if self._bc is None or self._bc[0] is not sc:
            self._bc = (sc, sc.broadcast(self.words))
        return self._bc[1]

    def unpersist(self) -> None:
        """Release the cached broadcast from driver and executors."""
        if self._bc is not None:
            self._bc[1].unpersist()
            self._bc = None


def bloom_params(n_items: int, fpp: float = 0.01,
                 max_bits: int = 1 << 33) -> tuple[int, int]:
    """(m, k) for a target false-positive rate; m a power of two."""
    n = max(1, n_items)
    ideal = -n * math.log(fpp) / (math.log(2) ** 2)
    m = 1 << max(6, math.ceil(math.log2(ideal)))
    if m > max_bits:
        raise ValueError(
            f"bloom of {n} keys at fpp={fpp} needs {ideal/8/2**20:.0f}"
            f" MiB > max_bits; raise fpp or max_bits")
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, len(_ROTS))


def bloom_build(df: DataFrame, col: str, fpp: float = 0.01,
                n_items: int | None = None,
                max_bits: int = 1 << 33) -> Bloom:
    """Build a Bloom filter of df[col]'s distinct values, distributed.

    One count job on the build side when ``n_items`` is not given,
    then one explode + groupBy(word).agg(bit_or) pass; the driver
    sees only aggregated 64-bit words, never keys."""
    from ..checkpoint import materialize, release
    keys = df.select(F.col(col).alias("__key")).distinct()
    if n_items is None:
        # the sizing count and the position build both consume the
        # distinct relation — materialize so the distinct's shuffle
        # runs once, not once per action (r14); released after the
        # filter words are collected (release is a no-op on
        # untracked frames)
        keys = materialize(keys)
        n_items = keys.count()
    m, k = bloom_params(n_items, fpp, max_bits)
    h1, h2 = _hash_cols(F.col("__key"))
    pos = F.explode(F.array(
        *[_position(h1, h2, _ROTS[i], m) for i in range(k)]))
    words = (keys.select(pos.alias("__pos"))
             .select(F.shiftrightunsigned("__pos", 6).alias("__word"),
                     F.expr("shiftleft(CAST(1 AS BIGINT), "
                            "CAST(__pos & 63 AS INT))").alias("__mask"))
             .groupBy("__word").agg(F.bit_or("__mask").alias("__bits"))
             .collect())
    arr = np.zeros(m // 64, dtype=np.uint64)
    for r in words:
        arr[r["__word"]] = np.uint64(r["__bits"] & 0xFFFFFFFFFFFFFFFF)
    release(keys)
    return Bloom(words=arr, m=m, k=k, n_items=n_items)


def bloom_probe(df: DataFrame, col: str, bloom: Bloom,
                out_col: str = "__bloom_maybe") -> DataFrame:
    """Append a boolean column: might df[col] be in the filter?

    False is definitive (no false negatives); True is 'verify me'.
    Only the two hash columns of ``col`` enter the Arrow batch."""
    sc = df.sparkSession.sparkContext
    bc = bloom.broadcast_for(sc)
    k, m = bloom.k, bloom.m
    rots = _ROTS[:k]
    mask = np.uint64(m - 1)

    @pandas_udf("boolean")
    def _probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        a = h1.to_numpy().astype(np.uint64)
        b = h2.to_numpy().astype(np.uint64)
        bits = bc.value
        out = np.ones(len(a), dtype=bool)
        for r in rots:
            rr = np.uint64(r)
            pos = (a ^ ((b << rr) | (b >> (np.uint64(64) - rr)))) & mask
            w = (pos >> np.uint64(6)).astype(np.int64)
            out &= ((bits[w] >> (pos & np.uint64(63)))
                    & np.uint64(1)).astype(bool)
        return pd.Series(out)

    # asNondeterministic PINS the Arrow node where it is written. The
    # probe is pure, but left deterministic Catalyst pushes the
    # probe-filter below upstream aggregates/projections — measured on
    # the decontamination pipeline: the UDF lands inside the shingle
    # window stage, evaluates TWICE (pushed filter + original column),
    # and the python runner's row queue buffers the WIDE pre-projection
    # rows (full document text per token row): 46s vs 3s at 16x sf0.1.
    # Callers only ever filter on the probe's own output, so pinning
    # it after the narrow projection is always the right plan.
    h1, h2 = _hash_cols(F.col(col))
    return df.withColumn(out_col, _probe.asNondeterministic()(h1, h2))


def bloom_semi_join(big: DataFrame, small: DataFrame, on: str,
                    fpp: float = 0.01, bloom: Bloom | None = None,
                    **kw) -> DataFrame:
    """EXACT left-semi join; the bloom only pre-filters the big side
    so the verify join sees the small surviving fraction. Pass a
    prebuilt ``bloom`` (bloom_build) to share one filter — and its
    executor broadcast — across several joins against the same small
    side (e.g. a semi + anti pair partitioning one relation)."""
    if bloom is None:
        bloom = bloom_build(small, on, fpp, **kw)
    cand = (bloom_probe(big, on, bloom)
            .filter(F.col("__bloom_maybe")).drop("__bloom_maybe"))
    return cand.join(small.select(on).distinct(), on, "semi")


def bloom_anti_join(big: DataFrame, small: DataFrame, on: str,
                    fpp: float = 0.01, bloom: Bloom | None = None,
                    **kw) -> DataFrame:
    """EXACT left-anti join: bloom rejects pass straight through (no
    false negatives); bloom accepts are re-checked with a real anti
    join on the surviving fraction only. ``bloom`` as in
    bloom_semi_join.

    Plan shape, deliberate: the union's two arms each contain the
    probe subtree, so the BIG side is scanned and probed twice
    (plan_report flags it as duplicated_python_udf — here it is the
    accepted cost, not the r9c pushdown bug: the probe is pinned
    after a narrow projection in both arms). The alternatives lose at
    scale: materializing the probed relation writes+reads the whole
    big side once each (≥ the second scan, plus storage), and folding
    both arms into one outer join either shuffles the full big side
    or funnels every bloom-reject through a NULL join key — one
    straggler partition. Two pushdown-pruned scans of a columnar
    source are the cheapest exact formulation."""
    if bloom is None:
        bloom = bloom_build(small, on, fpp, **kw)
    probed = bloom_probe(big, on, bloom)
    sure_out = probed.filter(~F.col("__bloom_maybe")) \
        .drop("__bloom_maybe")
    maybe = probed.filter(F.col("__bloom_maybe")).drop("__bloom_maybe")
    return sure_out.unionByName(
        maybe.join(small.select(on).distinct(), on, "anti"))
