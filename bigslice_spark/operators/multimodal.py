"""Multimodal (binary) column plumbing for training-data pipelines.

Images/audio/video are opaque `binary` columns with a typed metadata
struct. The Spark-side plumbing — schema, batching, partition-size control,
Arrow UDF signatures — is real and tested; the actual media decoding is
STUBBED (the image/audio libraries are not in this container): decode_*
raise NotImplementedError unless `fake=True`, which substitutes a
deterministic fake so the pipeline shape can be exercised end-to-end.

At 100TB: binary payloads dominate partition size, so operators here
repartition by byte budget (`target_partition_mb`) before any Arrow
transfer — an Arrow batch must fit comfortably in executor memory.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("id long, media binary, mime string, width int, height int, "
                "n_frames int")


def pack_media(df: DataFrame, payload_col: str, id_col: str,
               mime: str = "application/octet-stream") -> DataFrame:
    """Wrap an existing column as a media (binary+metadata) record."""
    return df.select(
        F.col(id_col).alias("id"),
        F.col(payload_col).cast("binary").alias("media"),
        F.lit(mime).alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("n_frames"))


def repartition_by_bytes(df: DataFrame, payload_col: str = "media",
                         target_partition_mb: int = 128) -> DataFrame:
    """Size partitions by payload bytes, not row count — with media rows,
    row-count partitioning OOMs on skewed blobs.

    Skew-aware: blobs at/above the target size are split off and
    round-robined across their OWN partitions (≈1 giant blob per task)
    instead of landing next to a full budget of small rows — bounding
    any partition at ~2× target even when one blob IS the partition
    budget. One stats scan (two aggregates), then one shuffle each for
    the small and big sides; the union concatenates partitions without
    another exchange."""
    target = target_partition_mb * 1024 * 1024
    # NULL payloads count as 0 bytes — they must flow through like any
    # other row (a filter on a NULL length would silently drop them)
    blen = F.coalesce(F.octet_length(payload_col), F.lit(0))
    stats = df.agg(
        F.sum(F.when(blen < target, blen).otherwise(0)).alias("small_b"),
        F.sum(F.when(blen >= target, 1).otherwise(0)).alias("n_big"),
    ).first()
    small_bytes = stats["small_b"] or 0
    n_big = int(stats["n_big"] or 0)
    n_small = max(1, int(small_bytes / target) + 1)
    small = df.filter(blen < target).repartition(n_small)
    if not n_big:
        return small
    # range-partition the big side on a unique id: boundaries come from
    # sampling the (few) big rows, giving ~1 giant blob per partition
    # deterministically — plain round-robin starts each input partition
    # at a random offset, so two giants could collide on one task
    big = (df.filter(blen >= target)
           .withColumn("__rid__", F.monotonically_increasing_id())
           .repartitionByRange(n_big, "__rid__")
           .drop("__rid__"))
    return small.union(big)


def extract_features(df: DataFrame, fake: bool = True,
                     feat_dim: int = 8) -> DataFrame:
    """media → feature vector via Arrow-batched mapInPandas.

    Real decode is stubbed; fake=True produces a deterministic per-blob
    feature (byte-histogram moments) so schema/batching are testable."""
    if not fake:
        raise NotImplementedError(
            "media decode requires image/audio libs not in this container")

    import numpy as np
    import pandas as pd

    out_schema = f"id long, n_bytes long, feat array<double>"

    def feats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf["id"], pdf["media"]):
                b = np.frombuffer(blob or b"", dtype=np.uint8)
                if len(b) == 0:
                    rows.append((int(rid), 0, [0.0] * feat_dim))
                    continue
                hist = np.bincount(b % feat_dim, minlength=feat_dim)
                rows.append((int(rid), int(len(b)),
                             (hist / len(b)).tolist()))
            yield pd.DataFrame(rows, columns=["id", "n_bytes", "feat"])

    return df.mapInPandas(feats, schema=out_schema)


def frame_sample(df: DataFrame, every_n: int = 10,
                 fake: bool = True) -> DataFrame:
    """Video frame sampling stub: emits (id, frame_idx, frame binary).
    Fake mode slices the payload into `n_frames` fake frames."""
    if not fake:
        raise NotImplementedError(
            "video decode requires libs not in this container")
    import pandas as pd

    def sample(batches):
        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf["id"], pdf["media"]):
                blob = blob or b""
                n = max(1, len(blob) // 64)
                for i in range(0, n, every_n):
                    rows.append((int(rid), i, blob[i * 64:(i + 1) * 64]))
            yield pd.DataFrame(rows, columns=["id", "frame_idx", "frame"])

    return df.mapInPandas(sample, schema="id long, frame_idx int, "
                                         "frame binary")
