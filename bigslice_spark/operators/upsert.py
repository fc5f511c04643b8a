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
  and commits the result as ``v=N+1`` — never mutating ``v=N``;
- readers always resolve the max committed version (a ``_SUCCESS``
  marker gates visibility), so a crashed writer leaves a dead partial
  dir, not a corrupt table.

Two physical strategies:

- **Unpartitioned** (default): ``v=N+1`` is a full snapshot rewrite.
  O(table) per merge — fine for dimension-sized tables, wrong for a
  100 TB fact table.
- **Partitioned** (``partition_by=``): ``v=N+1`` physically contains
  ONLY the partitions the update batch touches; every untouched
  partition is carried forward *by reference* through a
  ``_MANIFEST.json`` that maps its Hive dir (``p=a/q=b``) to the
  version whose directory physically holds its data. Merge cost is
  O(touched partitions + manifest), the Delta/Iceberg cost model,
  with zero data copied for untouched partitions. References always
  point at the PHYSICAL version (no chains to walk), and commit order
  is data → manifest → ``_SUCCESS`` (Spark's own marker is suppressed
  for the write) so a version is never visible half-described.

Concurrent writers: commits are ATOMIC — a version is written into a
writer-private ``v=N.inprogress-<token>`` dir and published with one
``fs.rename``, so when two uncoordinated writers race on ``v=N+1``
exactly one commit lands and the loser raises ConcurrentWriteError
(re-read and retry) instead of silently interleaving files. There is
still no lock service (plain parquet), so last-writer-wins ordering
across DIFFERENT versions is the caller's concern, and on stores
without atomic rename (S3 without a committer) the usual rename-
commit caveat applies. ``vacuum`` is safe against an in-flight writer
ABOVE the max committed version (it only reaps uncommitted debris and
lost-race temps at or below it).
"""

from __future__ import annotations

import json
import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..checkpoint import materialize
from ..local_rows import local_df

_MANIFEST = "_MANIFEST.json"


def _now_ms() -> int:
    import time
    return int(time.time() * 1000)


def _jfs(spark: SparkSession, path: str):
    """(jvm, fs, jpath) for ``path`` via the Hadoop FS API (works on
    HDFS/S3/local alike — same pattern as the cache helpers,
    session.py drop_cache/list_caches)."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs, jpath


def _versions(spark: SparkSession, path: str) -> list[int]:
    """Committed snapshot versions under ``path`` (``_SUCCESS``-gated)."""
    jvm, fs, jroot = _jfs(spark, path)
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


def _write_text(spark: SparkSession, dir_path: str, name: str,
                text: str) -> None:
    jvm, fs, jdir = _jfs(spark, dir_path)
    out = fs.create(jvm.org.apache.hadoop.fs.Path(jdir, name), True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _read_text(spark: SparkSession, file_path: str) -> str | None:
    """Read a small metadata file through the Hadoop FS API. Plain
    java.io line reader — no commons-io dependency, and deliberately
    NOT spark.read.text: Spark's file index hides underscore-prefixed
    paths, so it can never see `_MANIFEST.json`."""
    jvm, fs, jp = _jfs(spark, file_path)
    if not fs.exists(jp):
        return None
    stream = fs.open(jp)
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8"))
        lines = []
        while True:
            line = reader.readLine()
            if line is None:
                break
            lines.append(line)
        return "\n".join(lines)
    finally:
        stream.close()


def _read_manifest(spark: SparkSession, vdir: str) -> dict | None:
    txt = _read_text(spark, os.path.join(vdir, _MANIFEST))
    return None if txt is None else json.loads(txt)


def _leaf_dirs(spark: SparkSession, base: str, depth: int) -> list[str]:
    """Hive partition dir relpaths exactly ``depth`` levels below
    ``base`` (e.g. ``['p=a/q=b', 'p=a/q=c']``), skipping hidden
    ``_``/``.`` entries."""
    jvm, fs, jbase = _jfs(spark, base)
    if not fs.exists(jbase):
        return []
    out: list[str] = []

    def rec(jp, rel: str, d: int) -> None:
        for st in fs.listStatus(jp):
            name = st.getPath().getName()
            if (not st.isDirectory() or name.startswith("_")
                    or name.startswith(".")):
                continue
            nrel = f"{rel}/{name}" if rel else name
            if d == 1:
                out.append(nrel)
            else:
                rec(st.getPath(), nrel, d - 1)

    rec(jbase, "", depth)
    return sorted(out)


def _layout_of(spark: SparkSession, path: str, version: int,
               man: dict) -> dict[str, int]:
    """{partition relpath: physical version} for a committed
    partitioned version — local dirs plus manifest-carried refs."""
    vdir = os.path.join(path, f"v={version}")
    layout = {rel: version for rel in _leaf_dirs(
        spark, vdir, len(man["partition_by"]))}
    layout.update({rel: int(pv) for rel, pv in man["carried"].items()})
    return layout


def _grouped_read(spark: SparkSession, path: str,
                  layout: dict[str, int],
                  schema: T.StructType) -> DataFrame | None:
    """One schema-pinned read per physical version over the partition
    dirs in ``layout``, unioned by name. Pinning the schema suppresses
    Hive partition-value type INFERENCE (a string partition value
    '01' must stay '01', never become int 1 and re-render as '1') and
    fills columns a carried old partition predates with NULL straight
    from the reader. Returns None for an empty layout."""
    groups: dict[int, list[str]] = {}
    for rel, pv in layout.items():
        groups.setdefault(int(pv), []).append(rel)
    df = None
    for pv in sorted(groups):
        basep = os.path.join(path, f"v={pv}")
        part = (spark.read.option("basePath", basep).schema(schema)
                .parquet(*[os.path.join(basep, rel)
                           for rel in sorted(groups[pv])]))
        df = part if df is None else df.unionByName(
            part, allowMissingColumns=True)
    return df


def _evolve_schema(prev: T.StructType | None,
                   new: T.StructType) -> T.StructType:
    """Additive schema-evolution union: previous columns keep their
    position (taking the new definition where redefined), new columns
    append. A merge batch that does not touch every partition must
    never DROP a column an earlier batch added — the manifest schema
    is the union of everything the table has ever carried."""
    if prev is None:
        return new
    new_by_name = {f.name: f for f in new.fields}
    prev_names = {f.name for f in prev.fields}
    out = [new_by_name.get(f.name, f) for f in prev.fields]
    out += [f for f in new.fields if f.name not in prev_names]
    return T.StructType(out)


def _partition_stats(spark: SparkSession, path: str,
                     layout: dict[str, int]) -> dict[str, tuple[int, int]]:
    """{relpath: (n_files, n_bytes)} from the FS listing — metadata
    only, no data scan."""
    jvm, fs, _ = _jfs(spark, path)
    out: dict[str, tuple[int, int]] = {}
    for rel, pv in layout.items():
        jdir = jvm.org.apache.hadoop.fs.Path(
            os.path.join(path, f"v={pv}", rel))
        n = size = 0
        for st in fs.listStatus(jdir):
            if st.isFile() and not st.getPath().getName() \
                    .startswith(("_", ".")):
                n += 1
                size += st.getLen()
        out[rel] = (n, size)
    return out


def _read_snapshot(spark: SparkSession, path: str, version: int) -> DataFrame:
    """Materialize the logical table at ``version``: local partitions
    plus manifest-carried ones via the schema-pinned grouped read,
    projected to the manifest's column order."""
    vdir = os.path.join(path, f"v={version}")
    man = _read_manifest(spark, vdir)
    if man is None:
        return spark.read.parquet(vdir)
    schema = T.StructType.fromJson(man["schema"])
    df = _grouped_read(spark, path,
                       _layout_of(spark, path, version, man), schema)
    if df is None:  # every partition deleted: legitimately empty table
        return spark.createDataFrame([], schema)
    return df.select(*[f.name for f in schema.fields])


def read_latest(spark: SparkSession, path: str) -> DataFrame:
    vs = _versions(spark, path)
    if not vs:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    return _read_snapshot(spark, path, vs[-1])


def read_version(spark: SparkSession, path: str, version: int) -> DataFrame:
    """Time travel: read a specific committed snapshot."""
    if version not in _versions(spark, path):
        raise FileNotFoundError(f"no committed v={version} under {path}")
    return _read_snapshot(spark, path, version)


def _write_committed(df: DataFrame, vdir: str,
                     partition_by: list[str] | None,
                     manifest: dict | None) -> None:
    """Write ``df`` fully into a writer-private temp sibling
    (``v=N.inprogress-<token>``, Spark ``_SUCCESS`` suppressed;
    manifest + our own ``_SUCCESS`` written inside it), then PUBLISH
    with a single ``fs.rename`` to ``v=N`` — so the version appears
    atomically and fully described, and when two writers race on the
    same version exactly one rename lands: the loser sees the target
    exist, removes its temp, and raises instead of silently
    interleaving files (the concurrent-writer fail-fast; rename is a
    metadata op on HDFS/local — on S3A it is a copy, the documented
    caveat of every rename-committed layout)."""
    spark = df.sparkSession
    tmp = f"{vdir}.inprogress-{uuid.uuid4().hex}"
    hconf = spark._jsc.hadoopConfiguration()
    key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    old = hconf.get(key)
    hconf.set(key, "false")
    try:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
    finally:
        if old is None:
            hconf.unset(key)
        else:
            hconf.set(key, old)
    if manifest is not None:
        _write_text(spark, tmp, _MANIFEST,
                    json.dumps(manifest, sort_keys=True))
    _write_text(spark, tmp, "_SUCCESS", "")
    jvm, fs, _ = _jfs(spark, vdir)
    src = jvm.org.apache.hadoop.fs.Path(tmp)
    dst = jvm.org.apache.hadoop.fs.Path(vdir)
    # A dst that exists WITHOUT _SUCCESS is a crashed writer's partial
    # (nothing using this commit path can produce it) — uncommitted
    # debris that must not block the table forever (vacuum
    # deliberately leaves dirs above max committed alone). It is moved
    # ASIDE with one atomic rename to a debris name (never deleted in
    # place): if a racer committed the same version between the
    # _SUCCESS probe and the grab, the grab steals a COMMITTED dir —
    # detected by the _SUCCESS inside the debris, restored with a
    # rename back, and this writer loses cleanly. No interleave can
    # silently drop a commit; a COMMITTED dst always fails fast.
    if fs.exists(dst):
        if fs.exists(jvm.org.apache.hadoop.fs.Path(dst, "_SUCCESS")):
            fs.delete(src, True)
            raise ConcurrentWriteError(
                f"{vdir} was committed by a concurrent writer; "
                f"re-read the table and retry the merge")
        debris = jvm.org.apache.hadoop.fs.Path(
            f"{vdir}.dead-{uuid.uuid4().hex}")
        outcome = _rename_no_overwrite(spark, jvm, fs, dst, debris)
        if outcome == "ok" and fs.exists(
                jvm.org.apache.hadoop.fs.Path(debris, "_SUCCESS")):
            # stole a commit that landed after the probe: put it back
            # (if dst re-filled meanwhile, a committed v=N exists
            # either way — leave the duplicate as debris for vacuum)
            _rename_no_overwrite(spark, jvm, fs, debris, dst)
            fs.delete(src, True)
            raise ConcurrentWriteError(
                f"{vdir} was committed by a concurrent writer; "
                f"re-read the table and retry the merge")
        # "missing-src": another racer grabbed the partial first —
        # fine, the publish below is atomic regardless
    outcome = _rename_no_overwrite(spark, jvm, fs, src, dst)
    if outcome == "exists":
        fs.delete(src, True)
        raise ConcurrentWriteError(
            f"{vdir} was committed by a concurrent writer; "
            f"re-read the table and retry the merge")
    if outcome == "missing-src":  # our own temp vanished: not a race
        raise IOError(f"writer temp {tmp} disappeared before publish "
                      f"(external deletion? premature vacuum?)")


_ALREADY_EXISTS_CLASSES = frozenset({
    "org.apache.hadoop.fs.FileAlreadyExistsException",
    "java.nio.file.FileAlreadyExistsException",
    "org.apache.hadoop.fs.PathExistsException",
})
_MISSING_SRC_CLASSES = frozenset({
    "java.io.FileNotFoundException",
    "java.nio.file.NoSuchFileException",
    "org.apache.hadoop.fs.PathNotFoundException",
})


def _classify_rename_exc(ex: Exception) -> str | None:
    """Map a py4j rename failure to 'exists' / 'missing-src' / None
    (genuine IO error) by java exception CLASS, walking the cause
    chain — message-text matching is the fallback only when no java
    exception is attached (a nested path error whose message happens
    to contain 'already exists' must not masquerade as a race)."""
    jex = getattr(ex, "java_exception", None)
    if jex is None:
        msg = str(ex)
        if "FileAlreadyExists" in msg or "already exists" in msg:
            return "exists"
        # only java CLASS-name substrings: generic phrases like
        # "does not exist" also appear in py4j protocol errors
        # ("Method rename(...) does not exist"), which must re-raise
        if "FileNotFoundException" in msg or "NoSuchFileException" in msg:
            return "missing-src"
        return None
    hops = 0
    while jex is not None and hops < 8:
        try:
            name = jex.getClass().getName()
        except Exception:
            break
        if name in _ALREADY_EXISTS_CLASSES:
            return "exists"
        if name in _MISSING_SRC_CLASSES:
            return "missing-src"
        try:
            jex = jex.getCause()
        except Exception:
            break
        hops += 1
    return None


def _rename_no_overwrite(spark, jvm, fs, src, dst) -> str:
    """One atomic no-overwrite rename; returns 'ok' / 'exists' /
    'missing-src', re-raising genuine IO failures (safe mode, timeout,
    permissions) so the caller keeps its temp — the rename alone is
    retryable and vacuum reaps it if abandoned.

    Goes through FileContext.rename with Rename.NONE, which FAILS if
    dst exists — unlike FileSystem.rename, which would move src INSIDE
    an existing dst and return true, silently nesting the loser's
    snapshot in the winner's. Stores without an AbstractFileSystem
    binding for their scheme (some object-store connectors expose only
    a FileSystem) fall back to FileSystem.rename plus a post-rename
    nesting check, which detects-and-repairs the lost race instead of
    preventing it."""
    try:
        done = _fctx_rename_none(spark, jvm, fs, src, dst)
    except Exception as ex:
        kind = _classify_rename_exc(ex)
        if kind is None:
            raise
        return kind
    if done:
        return "ok"
    if not fs.rename(src, dst):
        # FileSystem.rename's false is ambiguous — disambiguate so a
        # vanished src (racer grabbed it first) isn't reported as a
        # lost race
        return "missing-src" if not fs.exists(src) else "exists"
    nested = jvm.org.apache.hadoop.fs.Path(dst, src.getName())
    if fs.exists(nested):  # rename moved src INSIDE existing dst
        fs.delete(nested, True)
        return "exists"
    return "ok"


def _fctx_rename_none(spark, jvm, fs, src, dst) -> bool:
    """The shared atomic-rename primitive: FileContext.rename with
    Rename.NONE. True on success; False when the scheme has no
    AbstractFileSystem binding (caller falls back to FileSystem
    semantics with its own policy); rename failures propagate for the
    caller to classify."""
    try:
        fctx = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            fs.getUri(), spark._jsc.hadoopConfiguration())
    except Exception:
        return False
    ren = jvm.org.apache.hadoop.fs.Options.Rename
    opts = spark.sparkContext._gateway.new_array(ren, 1)
    opts[0] = ren.NONE
    fctx.rename(src, dst, opts)
    return True


def _restore_debris(spark, jvm, fs, debris, dst) -> bool:
    """Move a stolen committed snapshot back to its live ``v=N`` path;
    True on success. NEVER destroys the debris — _rename_no_overwrite
    is unsuitable here because its FileSystem-fallback repair DELETES
    the dir that nested inside an existing dst, and in this call the
    nested dir would be the only copy of an acknowledged commit. Any
    failure leaves the debris untouched for the next vacuum run."""
    try:
        if _fctx_rename_none(spark, jvm, fs, debris, dst):
            return True
    except Exception:
        return False
    if fs.exists(dst):
        return False
    if not fs.rename(debris, dst):
        return False
    nested = jvm.org.apache.hadoop.fs.Path(dst, debris.getName())
    if fs.exists(nested):        # raced with a writer re-landing dst:
        fs.rename(nested, debris)  # UNDO — put the debris back whole
        return False
    return True


class ConcurrentWriteError(RuntimeError):
    """Two writers raced on the same snapshot version; the loser gets
    this instead of a silently corrupted table."""


def _live_rows(updates: DataFrame, deleted_col: str) -> DataFrame:
    """Insert set of an update batch: delete-marked rows removed.
    A NULL marker means 'not deleted' (coalesced), so a nullable
    delete column upserts the row instead of silently dropping it."""
    if deleted_col not in updates.columns:
        return updates
    return (updates
            .filter(~F.coalesce(F.col(deleted_col), F.lit(False)))
            .drop(deleted_col))


def upsert(spark: SparkSession, path: str, updates: DataFrame,
           key_cols: list[str], deleted_col: str = "__deleted__",
           partition_by: list[str] | None = None) -> int:
    """MERGE ``updates`` into the table at ``path``; returns the new
    version number. Update rows replace existing rows with the same
    key; unseen keys insert; rows with ``deleted_col`` true delete
    (NULL counts as false). First call on an empty path creates v=1.

    With ``partition_by`` (which must stay fixed for the table's
    lifetime — it is recorded in the manifest and later calls may omit
    it), the merge is PARTITION-PRUNED: only partitions present in the
    update batch are read, merged, and rewritten; all others carry
    forward by manifest reference at zero data cost. Keys must not
    move between partitions (the key's partition columns identify it —
    standard Hive/Delta static-partition semantics), and partition
    values must be non-NULL. One driver-side ``collect()`` of the
    DISTINCT partition tuples runs per merge — metadata-scale (the
    touched-partition list), the same driver state a Delta commit
    holds; the touched dir names are derived by a tiny marker write so
    Hive dir escaping always matches Spark's own."""
    vs = _versions(spark, path)
    vdir_for = lambda v: os.path.join(path, f"v={v}")  # noqa: E731

    # -------- resolve layout against an existing table ------------
    man = _read_manifest(spark, vdir_for(vs[-1])) if vs else None
    if vs:
        existing_pb = man["partition_by"] if man else None
        if partition_by is not None and partition_by != existing_pb:
            raise ValueError(
                f"partition_by {partition_by} does not match the "
                f"table's layout {existing_pb}")
        partition_by = existing_pb

    # the batch plan is consumed up to three times (touched-partition
    # collect, the anti-join key set, the written union) — cut its
    # lineage ONCE so an expensive derived batch isn't recomputed per
    # consumer (checkpoint.materialize policy; no-op cost for a plain
    # scan, one pass saved for a pipeline)
    updates = materialize(updates)
    ins = _live_rows(updates, deleted_col)

    # -------- unpartitioned: full-snapshot rewrite (documented) ---
    if not partition_by:
        if vs:
            base = _read_snapshot(spark, path, vs[-1])
            keep = base.join(updates.select(*key_cols).distinct(),
                             on=key_cols, how="left_anti")
            # schema evolution, additive-only: a column present on one
            # side only arrives as NULL (Delta's mergeSchema rule)
            merged = keep.unionByName(ins, allowMissingColumns=True)
            new_v = vs[-1] + 1
        else:
            merged, new_v = ins, 1
        _write_committed(merged, vdir_for(new_v), None, None)
        return new_v

    # -------- partitioned: rewrite touched partitions only --------
    pb = partition_by
    missing = [c for c in pb if c not in updates.columns]
    if missing:
        raise ValueError(f"update batch lacks partition columns {missing}")
    new_v = (vs[-1] + 1) if vs else 1
    vdir = vdir_for(new_v)

    upd_parts = updates.select(*pb).distinct()
    tuples = upd_parts.collect()  # metadata-scale: touched partitions
    for row in tuples:
        for c in pb:
            if row[c] is None or row[c] == "":
                raise ValueError(
                    f"NULL/empty partition value in update batch: "
                    f"{row.asDict()}")

    # render the touched Hive dir names. Simple partition types
    # (string/integer) render driver-side through Spark's OWN
    # escapePathName — zero extra jobs, same bytes the writer
    # produces; anything else (dates, decimals — writer-formatted)
    # falls back to a tiny marker write so encoding always matches.
    simple = (T.StringType(), T.IntegerType(), T.LongType(),
              T.ShortType(), T.ByteType())
    if all(f.dataType in simple for f in upd_parts.schema.fields):
        esc = spark.sparkContext._jvm.org.apache.spark.sql.catalyst \
            .catalog.ExternalCatalogUtils.escapePathName
        touched = {"/".join(f"{esc(c)}={esc(str(row[c]))}" for c in pb)
                   for row in tuples}
    else:
        marker = spark.createDataFrame(tuples, schema=upd_parts.schema) \
            .withColumn("__m__", F.lit(1))
        # writer-private scratch OUTSIDE the version dir (the snapshot
        # write publishes v=N+1 atomically via rename; nothing may
        # pre-create or dirty the target)
        marker_dir = os.path.join(path, f"_touched-{uuid.uuid4().hex}")
        marker.write.mode("overwrite").partitionBy(*pb) \
            .parquet(marker_dir)
        touched = set(_leaf_dirs(spark, marker_dir, len(pb)))
        _jfs(spark, marker_dir)[1].delete(
            _jfs(spark, marker_dir)[2], True)

    prev_schema = T.StructType.fromJson(man["schema"]) if vs else None
    if vs:
        layout = _layout_of(spark, path, vs[-1], man)
        carried = {rel: pv for rel, pv in layout.items()
                   if rel not in touched}
        base_touched = _grouped_read(
            spark, path,
            {rel: pv for rel, pv in layout.items() if rel in touched},
            prev_schema)
        if base_touched is not None:
            keep = base_touched.join(
                updates.select(*key_cols).distinct(),
                on=key_cols, how="left_anti")
            merged = keep.unionByName(ins, allowMissingColumns=True)
        else:
            merged = ins
    else:
        carried, merged = {}, ins

    # manifest schema = union with everything the table ever carried:
    # a batch that doesn't touch a column-bearing partition must not
    # drop that column from the logical table
    manifest = {"partition_by": pb, "carried": carried,
                "schema": _evolve_schema(prev_schema,
                                         merged.schema).jsonValue()}
    _write_committed(merged, vdir, pb, manifest)
    return new_v


def compact_partitions(spark: SparkSession, path: str,
                       target_bytes: int = 128 << 20,
                       min_files: int = 2,
                       partitions: list[str] | None = None,
                       zorder_by: tuple[str, str] | None = None) -> int:
    """Small-file compaction for a PARTITIONED snapshot table: commit
    ``v=N+1`` where every partition holding ≥ ``min_files`` data files
    (or exactly the Hive relpaths in ``partitions``) is rewritten
    coalesced, and every other partition carries forward by manifest
    reference — the OPTIMIZE companion to the partition-pruned merge
    (micro-batch merges shard each touched partition across the
    shuffle-partition count; this folds them back). Returns the new
    version, or the current one untouched if nothing qualifies.

    One Spark job regardless of partition count: the target partitions
    are read as one frame and hash-repartitioned on the partition
    columns (+ a content-hash salt bounding files to
    ceil(max_partition_bytes/target_bytes) per partition), so each
    compacted partition lands in at most that many files — 1 for the
    common small-file case. Data is byte-identical row-wise; only
    layout changes. Same atomic-rename commit (and concurrent-writer
    fail-fast) as ``upsert``.

    ``zorder_by=(col_a, col_b)`` is OPTIMIZE ZORDER: compacted
    partitions are additionally SORTED by the Morton code of the two
    columns (sortWithinPartitions — no extra exchange), so a reader
    filtering on either column prunes row groups via min/max footer
    stats inside each partition file."""
    vs = _versions(spark, path)
    if not vs:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    latest = vs[-1]
    man = _read_manifest(spark, os.path.join(path, f"v={latest}"))
    if man is None:
        raise ValueError(
            "compact_partitions requires a partitioned table "
            "(use partition_by= on upsert); op_compact covers plain "
            "directories")
    pb = man["partition_by"]
    layout = _layout_of(spark, path, latest, man)
    stats = _partition_stats(spark, path, layout)
    if partitions is not None:
        unknown = sorted(set(partitions) - set(layout))
        if unknown:
            raise ValueError(f"unknown partitions: {unknown}")
        targets = list(partitions)
    else:
        targets = [rel for rel, (n, _) in stats.items()
                   if n >= min_files]
    if not targets:
        return latest

    df = _grouped_read(
        spark, path,
        {rel: layout[rel] for rel in targets},
        T.StructType.fromJson(man["schema"]))

    k = max(1, max(-(-stats[rel][1] // target_bytes)
                   for rel in targets))
    data_cols = [c for c in df.columns if c not in pb]
    salt = (F.pmod(F.xxhash64(*data_cols), F.lit(k)) if data_cols
            else F.lit(0))
    out = (df.withColumn("__salt__", salt)
           .repartition(*pb, "__salt__").drop("__salt__"))
    if zorder_by is not None:
        from .projection import zorder_value
        # sort key leads with the partition columns: the dynamic-
        # partition writer requires [pb...] ordering and would insert
        # its own UNSTABLE sort (destroying z order) if the incoming
        # ordering didn't already satisfy it
        out = (out.withColumn("__z__", zorder_value(*zorder_by))
               .sortWithinPartitions(*pb, "__z__").drop("__z__"))

    new_v = latest + 1
    carried = {rel: pv for rel, pv in layout.items()
               if rel not in set(targets)}
    manifest = {"partition_by": pb, "carried": carried,
                "schema": man["schema"]}
    _write_committed(out, os.path.join(path, f"v={new_v}"), pb, manifest)
    return new_v


def snapshot_stats(spark: SparkSession, path: str,
                   version: int | None = None) -> DataFrame:
    """(partition, physical_version, n_files, n_bytes) for every
    partition of a partitioned snapshot table at ``version`` (default
    latest) — the table-health view behind compaction decisions:
    small-file pressure (n_files ≫ 1 after many micro-batch merges)
    and partition skew (n_bytes) read straight off the manifest +
    directory listing, no data scan. Driver-side metadata listing,
    returned as a local DataFrame (one row per partition)."""
    vs = _versions(spark, path)
    if not vs:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise FileNotFoundError(f"no committed v={v} under {path}")
    man = _read_manifest(spark, os.path.join(path, f"v={v}"))
    if man is None:
        raise ValueError("snapshot_stats requires a partitioned table")
    layout = _layout_of(spark, path, v, man)
    stats = _partition_stats(spark, path, layout)
    rows = [(rel, pv, stats[rel][0], stats[rel][1])
            for rel, pv in sorted(layout.items())]
    return local_df(
        spark, rows,
        "partition string, physical_version int, n_files int, "
        "n_bytes long")


def vacuum(spark: SparkSession, path: str, keep_last: int = 2,
           reap_ambiguous_debris_older_than: float | None = None
           ) -> list[int]:
    """Drop all but the newest ``keep_last`` committed snapshots, plus
    uncommitted partials BELOW the max committed version (a dir above
    it may be an in-flight writer's — left alone). Returns committed
    versions removed. For partitioned tables, a reaped old version
    whose partition dirs are still referenced by a kept manifest is
    DEMOTED, not deleted: its ``_SUCCESS``/manifest go (no longer
    time-travelable) but referenced partition data stays until no kept
    manifest points at it. Readers of a dropped version fail fast on
    the missing ``_SUCCESS`` rather than reading half a table.
    Single-writer assumption as for ``upsert``.

    ``reap_ambiguous_debris_older_than`` (seconds) — ESCAPE HATCH,
    default off: committed debris (a ``v=N.dead-*`` dir containing a
    ``_SUCCESS``) that vacuum can neither restore nor prove superseded
    is normally kept FOREVER for manual adjudication, because deleting
    it could destroy the only standalone copy of an acknowledged
    commit. On a crash-prone table that policy is an unbounded disk
    leak (r7 verdict watch item); setting this reaps such debris once
    its filesystem mtime is older than the given age. CHOOSE THE AGE
    SO ADJUDICATION HAS PROVABLY HAPPENED (e.g. several days, beyond
    any writer's lifetime and your incident-review window) — a reaped
    dir is unrecoverable, and if it WAS the only copy of a stolen
    commit, that version's history is gone. Restorable debris is
    always restored first; the hatch never races a live writer (age
    gates it) and never touches uncommitted debris' existing rules."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    if (reap_ambiguous_debris_older_than is not None
            and reap_ambiguous_debris_older_than <= 0):
        raise ValueError(
            "reap_ambiguous_debris_older_than must be positive seconds")
    jvm, fs, jroot = _jfs(spark, path)
    committed = _versions(spark, path)
    keep = set(committed[-keep_last:])
    max_committed = committed[-1] if committed else None
    removed: list[int] = []
    restored: set[int] = set()
    if not fs.exists(jroot):
        return removed

    # partition dirs still referenced by a manifest we are keeping
    live: dict[int, set[str]] = {}
    for v in keep:
        man = _read_manifest(spark, os.path.join(path, f"v={v}"))
        if man:
            for rel, pv in man["carried"].items():
                live.setdefault(int(pv), set()).add(rel)

    for st in fs.listStatus(jroot):
        name = st.getPath().getName()
        m = re.fullmatch(r"v=(\d+)", name)
        if not m:
            # a lost-race/crashed writer's temp for an already-decided
            # version is dead by construction (its rename can never
            # land) — but only reap it once stale (>1h by FS mtime):
            # a LIVE doomed writer may still be mid-parquet-job, and
            # yanking its temp would turn its clean fail-fast
            # ConcurrentWriteError into an opaque task/commit failure.
            # One at/above max committed may be in flight — left alone.
            stale = st.getModificationTime() < _now_ms() - 3_600_000
            mi = re.fullmatch(r"v=(\d+)\.inprogress-[0-9a-f]+", name)
            if (mi and stale and max_committed is not None
                    and int(mi.group(1)) <= max_committed):
                fs.delete(st.getPath(), True)
            # a crashed partial moved aside by a later committer
            # (_write_committed's rename-aside). Policy by content:
            # - NO _SUCCESS inside: a genuinely dead crashed partial —
            #   reap once stale (the guard covers the instant between
            #   a mistaken grab of a committed dir and its rename-
            #   back).
            # - _SUCCESS inside: a COMMITTED snapshot a grabbing
            #   writer stole and then crashed before restoring.
            #   RESTORE it when its version sits above the current tip
            #   (a stolen-and-never-reissued commit) or when a kept
            #   manifest still references its partition dirs (the
            #   steal broke carried-forward reads; restore repairs
            #   them). Anything else is ambiguous between a
            #   superseded duplicate and an old reaped snapshot —
            #   restoring could resurrect data below the keep window,
            #   deleting could destroy the only standalone copy of an
            #   acknowledged commit — so committed debris is NEVER
            #   deleted: it stays, invisible to readers, for manual
            #   adjudication (these need a multi-writer race plus a
            #   crash inside a millisecond window; they do not
            #   accumulate in practice).
            elif (md := re.fullmatch(r"v=(\d+)\.dead-[0-9a-f]+",
                                     name)):
                vd = int(md.group(1))
                has_success = fs.exists(
                    jvm.org.apache.hadoop.fs.Path(st.getPath(),
                                                  "_SUCCESS"))
                if not has_success:
                    if stale:
                        fs.delete(st.getPath(), True)
                elif (vd not in restored
                        and (max_committed is None
                             or vd > max_committed or vd in live)):
                    if _restore_debris(
                            spark, jvm, fs, st.getPath(),
                            jvm.org.apache.hadoop.fs.Path(
                                os.path.join(path, f"v={vd}"))):
                        restored.add(vd)
                elif (reap_ambiguous_debris_older_than is not None
                        and st.getModificationTime() < _now_ms()
                        - int(reap_ambiguous_debris_older_than * 1000)):
                    # the explicit escape hatch (see docstring): the
                    # operator asserted adjudication is over for debris
                    # this old — reap the otherwise-kept-forever dir
                    fs.delete(st.getPath(), True)
            # a crashed writer's partition-name scratch: reap only
            # when stale — a LIVE writer's marker exists for
            # milliseconds between write and inline delete
            elif re.fullmatch(r"_touched-[0-9a-f]+", name) and stale:
                fs.delete(st.getPath(), True)
            continue
        v = int(m.group(1))
        if v in keep:
            continue
        vdir = os.path.join(path, name)
        if v not in committed:
            # uncommitted debris — but never an in-flight writer's dir
            # (>= max committed) nor one still holding referenced data
            if (max_committed is not None and v < max_committed
                    and v not in live):
                fs.delete(st.getPath(), True)
            continue
        if v in live:
            man = _read_manifest(spark, vdir)
            depth = len(man["partition_by"]) if man else 0
            fs.delete(jvm.org.apache.hadoop.fs.Path(vdir, "_SUCCESS"),
                      False)
            fs.delete(jvm.org.apache.hadoop.fs.Path(vdir, _MANIFEST),
                      False)
            if depth:
                for rel in _leaf_dirs(spark, vdir, depth):
                    if rel not in live[v]:
                        fs.delete(jvm.org.apache.hadoop.fs.Path(
                            os.path.join(vdir, rel)), True)
            removed.append(v)
        else:
            fs.delete(st.getPath(), True)
            removed.append(v)
    return sorted(removed)


def schema_diff(spark: SparkSession, path: str, v_old: int,
                v_new: int) -> DataFrame:
    """Schema evolution between two committed snapshots: one row per
    column whose definition changed — (column, change, old_type,
    new_type) with change ∈ added / removed / type_changed. Pure
    metadata (manifest schema for partitioned tables, parquet footer
    via a zero-row read otherwise); the DDL-audit companion to
    snapshot_diff's row-level CDC."""
    def sch(v: int):
        man = _read_manifest(spark, os.path.join(path, f"v={v}"))
        if man is not None:
            return T.StructType.fromJson(man["schema"])
        return read_version(spark, path, v).schema
    if v_old not in _versions(spark, path):
        raise FileNotFoundError(f"no committed v={v_old} under {path}")
    if v_new not in _versions(spark, path):
        raise FileNotFoundError(f"no committed v={v_new} under {path}")
    old = {f.name: f.dataType.simpleString() for f in sch(v_old).fields}
    new = {f.name: f.dataType.simpleString() for f in sch(v_new).fields}
    rows = []
    for c in sorted(old.keys() | new.keys()):
        if c not in new:
            rows.append((c, "removed", old[c], None))
        elif c not in old:
            rows.append((c, "added", None, new[c]))
        elif old[c] != new[c]:
            rows.append((c, "type_changed", old[c], new[c]))
    return local_df(
        spark, rows,
        "column string, change string, old_type string, "
        "new_type string")


def snapshot_diff(spark: SparkSession, path: str, v_old: int, v_new: int,
                  key_cols: list[str]) -> DataFrame:
    """Change-data-capture between two committed snapshots: one row per
    key whose state changed, classified 'inserted' / 'deleted' /
    'updated' (value change in any non-key column of EITHER snapshot —
    a column present on one side only compares against NULL, matching
    the additive mergeSchema rule, so a row whose only change is in a
    newly added column classifies as updated). Unchanged keys are not
    emitted. Tables whose only columns are the keys diff on presence
    alone (inserted/deleted).

    One full-outer join on the key — the scale cost is a co-partitioned
    merge of the two snapshots; at 100 TB pair with zorder/bucketed
    layouts so the join is exchange-free."""
    old = read_version(spark, path, v_old)
    new = read_version(spark, path, v_new)
    val_cols = sorted((set(old.columns) | set(new.columns))
                      - set(key_cols))

    def side(df: DataFrame, tag: str) -> DataFrame:
        cols = list(df.columns)
        sel = [F.col(c) for c in key_cols]
        if val_cols:
            fields = []
            for c in val_cols:
                if c in cols:
                    fields.append(F.col(c).alias(c))
                else:
                    other = new if df is old else old
                    fields.append(F.lit(None)
                                  .cast(other.schema[c].dataType)
                                  .alias(c))
            sel.append(F.struct(*fields).alias(f"__{tag}__"))
        sel.append(F.lit(True).alias(f"__in_{tag}__"))
        return df.select(*sel)

    j = side(old, "o").join(side(new, "n"), on=key_cols, how="full")
    change = (F.when(F.col("__in_o__").isNull(), "inserted")
               .when(F.col("__in_n__").isNull(), "deleted"))
    if val_cols:
        change = change.when(
            ~F.col("__o__").eqNullSafe(F.col("__n__")), "updated")
    return (j.withColumn("change", change)
            .filter(F.col("change").isNotNull())
            .select(*key_cols, "change"))


def scd2_intervals(df: DataFrame, key_cols: list[str], ts_col: str,
                   order_cols: list[str] | None = None) -> DataFrame:
    """Build a type-2 slowly-changing dimension from a change log:
    each change row becomes a validity interval [eff_from_us,
    eff_to_us) per key, closed by the key's next change (the current
    row carries eff_to_us = NULL). The standard historization step
    between a CDC feed (snapshot_diff / stream_upsert batches) and
    point-in-time lookups (asof_join / range_join consume the result
    directly).

    One window exchange on the key (lead over the change order);
    timestamps surface as unix-micros BIGINTs. Ties on ``ts_col``
    break by ``order_cols`` — pass the change-log sequence id for a
    total order, otherwise same-timestamp changes produce zero-width
    intervals in log order (the conventional CDC semantics).
    """
    from pyspark.sql import Window as W
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = W.partitionBy(*key_cols).orderBy(*order)
    eff_from = F.unix_micros(F.col(ts_col))
    eff_to = F.lead(eff_from).over(w)
    return (df.withColumn("eff_from_us", eff_from)
            .withColumn("eff_to_us", eff_to)
            .withColumn("is_current", eff_to.isNull())
            .drop(ts_col))
