"""Embedding projections and space-filling-curve layout.

Two layout/compression primitives a 100 TB training-data store needs:

- random_projection: Johnson-Lindenstrauss-style dense random projection
  of an embedding column to a small output dimension — the cheap
  front-end of ANN indexing, clustering, and dedup (project once, store
  8 doubles instead of 64+). Same deterministic hyperplane family as
  similarity.lsh_topk, and the same wide-codegen dot products: one
  projection is d multiply-adds per output dim, fully inside
  whole-stage codegen, ZERO shuffles — a pure map over the corpus.

- zorder_value / write_zordered: bit-interleaved Morton code over two
  integer keys. Range-partitioning + sorting by the z-value clusters
  rows so that a scan filtered on EITHER key touches a bounded band of
  files — the standard multi-dimensional data-layout trick (Delta
  OPTIMIZE ZORDER, Hudi clustering) expressed with plain Spark
  primitives. The z-value is a codegen'd bit expression; the write is
  repartitionByRange + sortWithinPartitions (one range exchange, no
  extra pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _hyperplanes


def random_projection(df: DataFrame, out_dim: int = 8,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id",
                      dim: int | None = None,
                      seed: int = 42) -> DataFrame:
    """Project ``vec_col`` (array<float|double>, length ``dim``) to
    ``out_dim`` doubles r0..rK via the deterministic seeded hyperplane
    family. Output columns are scalars (driver-hashable, parquet-
    friendly); one F.expr parse per output dim, left-associative sums —
    bitwise-reproducible by any engine writing the same expression.

    ``dim=None`` infers the width with an EAGER driver-side
    ``first()`` — one action inside an otherwise lazy operator; pass
    ``dim=`` explicitly in pipelines that must stay action-free. A
    ragged corpus fails loudly per-row (raise_error when a vector's
    length differs from ``dim``) instead of silently projecting NULLs
    from out-of-bounds indexing."""
    if dim is None:
        row = df.select(vec_col).first()
        if row is None or row[0] is None:
            raise ValueError(f"cannot infer dim: {vec_col} has no rows")
        dim = len(row[0])
    planes = _hyperplanes(dim, out_dim, seed=seed)
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # NULL vectors pass through (projections come out NULL, filterable
    # downstream) — only a PRESENT vector of the wrong length is an
    # error
    checked = (F.when(F.col(vec_col).isNull(), F.lit(None))
               .when(F.size(vec) == dim, vec)
               .otherwise(F.expr(
                   f"raise_error('random_projection: ragged {vec_col} "
                   f"(size != {dim})')")))
    from .similarity import _fold_dot_literal
    v = df.select(F.col(id_col), checked.alias("__v__"))
    # each projection as ONE array fold against the literal plane —
    # the same left-associative sum (0.0 + t == t) the unrolled string
    # produced, verified bitwise-equal, but with none of the wide-
    # expression interpretation cliff (see similarity._dot_wide:
    # measured 13.1s unrolled vs 4.8s fold at dim=64 over 2M rows);
    # the fold string itself is the SHARED _fold_dot_literal template
    projs = [
        F.expr(_fold_dot_literal("__v__", p)).alias(f"r{i}")
        for i, p in enumerate(planes)]
    return v.select(id_col, *projs)


def zorder_value(a, b, bits: int = 16) -> "F.Column":
    """Morton code: interleave the low ``bits`` bits of two non-negative
    integer columns (a even positions, b odd). Codegen'd shift/mask
    arithmetic, reproducible in any engine with >>, &, * (DuckDB
    included — no Java-only intrinsics)."""
    ca = a if not isinstance(a, str) else F.col(a)
    cb = b if not isinstance(b, str) else F.col(b)
    ca, cb = ca.cast("long"), cb.cast("long")
    terms = []
    for i in range(bits):
        bit = 1 << i
        terms.append(ca.bitwiseAND(F.lit(bit)) * F.lit(1 << i))
        terms.append(cb.bitwiseAND(F.lit(bit)) * F.lit(1 << (i + 1)))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def write_zordered(df: DataFrame, path: str, col_a: str, col_b: str,
                   n_files: int = 64, bits: int = 16) -> None:
    """Lay out ``df`` as parquet clustered by the z-order of
    (col_a, col_b): range-partition on the z-value (one exchange),
    sort within partitions (no extra exchange), write. A reader
    filtering on either column then prunes to a contiguous band of
    files via min/max footer stats."""
    (df.withColumn("__z__", zorder_value(col_a, col_b, bits))
       .repartitionByRange(n_files, "__z__")
       .sortWithinPartitions("__z__")
       .drop("__z__")
       .write.mode("overwrite").parquet(path))


def write_range_sorted(df: DataFrame, path: str, cols: list[str],
                       n_files: int = 64) -> None:
    """Total-order layout: range-partition on ``cols`` (one sampled
    exchange — Spark's RangePartitioner, never a single-partition
    sort), sort within partitions, write. File k's key range precedes
    file k+1's, so the table reads back globally ordered and a point /
    range predicate on ``cols`` prunes to a contiguous file band via
    min/max footer stats — the 1-D complement of write_zordered's
    multi-dimensional clustering."""
    (df.repartitionByRange(n_files, *[F.col(c) for c in cols])
       .sortWithinPartitions(*cols)
       .write.mode("overwrite").parquet(path))


def write_bucketed(df, path: str, table: str, bucket_cols,
                   n_buckets: int = 8, sort_cols=None,
                   mode: str = "overwrite"):
    """Write ``df`` as a BUCKETED external table and return it.

    Bucketing is the co-located-join layout: both sides of a
    recurring join written with the same bucket count on the join
    key read back pre-partitioned, so the join plans with ZERO
    exchanges of either table — at 100 TB that deletes the two
    biggest shuffles a fact-fact join would otherwise pay, every
    time the tables are joined, for one layout cost at write time.
    (Spark only honors bucketing through the catalog, hence
    saveAsTable with an explicit external ``path``; the in-memory
    catalog is enough, no Hive metastore needed.)

    ``sort_cols`` (defaults to the bucket columns) additionally
    sorts within buckets, letting the sort-merge join skip its
    per-partition sort. Reference: bigslice has no persistent
    layout control at all (shard placement is runtime-only,
    exec/bigmachine.go); this is Spark-native surface."""
    bucket_cols = ([bucket_cols] if isinstance(bucket_cols, str)
                   else list(bucket_cols))
    sort_cols = (bucket_cols if sort_cols is None
                 else ([sort_cols] if isinstance(sort_cols, str)
                       else list(sort_cols)))
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (df.write.mode(mode).option("path", path)
       .bucketBy(n_buckets, *bucket_cols).sortBy(*sort_cols)
       .saveAsTable(table))
    return spark.table(table)
