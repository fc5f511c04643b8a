"""Keyed upsert (MERGE) over parquet snapshots — the mutable-table story.

Plain parquet directories are immutable; the reference sidesteps the
problem entirely (bigslice caches are write-once, cache.go:38-44 pushes
invalidation onto the user). Real pipelines need MERGE: apply a batch of
keyed updates/inserts/deletes to a table. Table formats (Delta/Iceberg)
do this with a transaction log; this module implements the same
SNAPSHOT pattern with primitives Spark ships:

- a table is a directory of versioned snapshot subdirs ``v=N``;
- ``upsert`` reads the latest snapshot, merges the update batch
  (updates win on key collision, ``__deleted__`` column drops rows),
  and writes the WHOLE result as ``v=N+1`` — never mutating ``v=N``;
- readers always resolve the max committed version (a ``_SUCCESS``
  marker gates visibility), so a crashed writer leaves a dead partial
  dir, not a corrupt table.

At 100 TB a full-snapshot rewrite per merge is the wrong default —
partition the table and rewrite only partitions the update batch
touches (``partition_by=``); untouched partitions are carried forward
by reference would require a manifest, so this implementation rewrites
them but documents the boundary honestly: snapshot-rewrite cost is
O(table), the format-with-log cost is O(touched files + log). The merge
JOIN itself is scale-correct either way: one left-anti join on the key
(existing rows not superseded) + union with the update batch.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession


def _versions(spark: SparkSession, path: str) -> list[int]:
    """Committed snapshot versions under ``path`` via the Hadoop FS API
    (works on HDFS/S3/local alike — same pattern as the cache helpers,
    session.py drop_cache/list_caches)."""
    jvm = spark.sparkContext._jvm
    jroot = jvm.org.apache.hadoop.fs.Path(path)
    fs = jroot.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jroot):
        return []
    out = []
    for st in fs.listStatus(jroot):
        if not st.isDirectory():
            continue
        m = re.fullmatch(r"v=(\d+)", st.getPath().getName())
        if m and fs.exists(
                jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def read_latest(spark: SparkSession, path: str) -> DataFrame:
    vs = _versions(spark, path)
    if not vs:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    return spark.read.parquet(os.path.join(path, f"v={vs[-1]}"))


def upsert(spark: SparkSession, path: str, updates: DataFrame,
           key_cols: list[str], deleted_col: str = "__deleted__") -> int:
    """MERGE ``updates`` into the table at ``path``; returns the new
    version number. Update rows replace existing rows with the same
    key; unseen keys insert; rows with ``deleted_col`` true delete.
    First call on an empty path creates v=1 from the batch."""
    has_del = deleted_col in updates.columns
    vs = _versions(spark, path)
    if vs:
        base = read_latest(spark, path)
        keep = base.join(updates.select(*key_cols).distinct(),
                         on=key_cols, how="left_anti")
        ins = updates
        if has_del:
            ins = ins.filter(~updates[deleted_col]).drop(deleted_col)
        # schema evolution, additive-only: a column present on one side
        # only arrives as NULL on the other (Delta's mergeSchema rule)
        merged = keep.unionByName(ins, allowMissingColumns=True)
        new_v = vs[-1] + 1
    else:
        merged = updates.filter(~updates[deleted_col]).drop(deleted_col) \
            if has_del else updates
        new_v = 1
    merged.write.mode("overwrite").parquet(
        os.path.join(path, f"v={new_v}"))
    return new_v


def read_version(spark: SparkSession, path: str, version: int) -> DataFrame:
    """Time travel: read a specific committed snapshot."""
    if version not in _versions(spark, path):
        raise FileNotFoundError(f"no committed v={version} under {path}")
    return spark.read.parquet(os.path.join(path, f"v={version}"))


def vacuum(spark: SparkSession, path: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest ``keep_last`` committed snapshots (plus
    any uncommitted partials — dead writers' debris). Returns the
    versions removed. Readers of a dropped version fail fast on the
    missing _SUCCESS rather than reading half a table."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    jvm = spark.sparkContext._jvm
    jroot = jvm.org.apache.hadoop.fs.Path(path)
    fs = jroot.getFileSystem(spark._jsc.hadoopConfiguration())
    committed = _versions(spark, path)
    keep = set(committed[-keep_last:])
    removed = []
    if not fs.exists(jroot):
        return removed
    for st in fs.listStatus(jroot):
        name = st.getPath().getName()
        m = re.fullmatch(r"v=(\d+)", name)
        if not m:
            continue
        v = int(m.group(1))
        committed_v = v in committed
        if v in keep:
            continue
        fs.delete(st.getPath(), True)
        if committed_v:
            removed.append(v)
    return sorted(removed)


def snapshot_diff(spark: SparkSession, path: str, v_old: int, v_new: int,
                  key_cols: list[str]) -> DataFrame:
    """Change-data-capture between two committed snapshots: one row per
    key whose state changed, classified 'inserted' / 'deleted' /
    'updated' (value change in any non-key column, null-safe struct
    compare). Unchanged keys are not emitted.

    One full-outer join on the key — the scale cost is a co-partitioned
    merge of the two snapshots; at 100 TB pair with zorder/bucketed
    layouts so the join is exchange-free."""
    from pyspark.sql import functions as F
    old = read_version(spark, path, v_old)
    new = read_version(spark, path, v_new)
    val_cols = sorted(set(old.columns) & set(new.columns)
                      - set(key_cols))
    o = old.select(*key_cols,
                   F.struct(*val_cols).alias("__o__"),
                   F.lit(True).alias("__in_o__"))
    n = new.select(*key_cols,
                   F.struct(*val_cols).alias("__n__"),
                   F.lit(True).alias("__in_n__"))
    j = o.join(n, on=key_cols, how="full")
    change = (
        F.when(F.col("__in_o__").isNull(), "inserted")
         .when(F.col("__in_n__").isNull(), "deleted")
         .when(~F.col("__o__").eqNullSafe(F.col("__n__")), "updated"))
    return (j.withColumn("change", change)
            .filter(F.col("change").isNotNull())
            .select(*key_cols, "change"))
