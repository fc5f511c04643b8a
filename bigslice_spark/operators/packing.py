"""Sequence packing for LLM training: lay every document's tokens out
on one global number line (in a deterministic document order) and cut
it into fixed-length training sequences — the standard
"concatenate-and-chunk" packing, where a document may span a sequence
boundary.

The hard part at 100 TB is the GLOBAL exclusive prefix sum of token
counts: a naive ``sum() over (order by doc_id)`` window has no
PARTITION BY, so Spark plans a single-partition sort — one task owns
the whole corpus. This module uses the classic two-level scan instead,
entirely on (doc_id, n_tokens) metadata rows (~16 bytes/doc; the text
column is pruned at the scan and never shuffles):

1. range-partition the metadata by ``id_col`` (so partition order ==
   document order) and pin the partitioning with an eager
   ``materialize`` (the partition id is referenced by two downstream
   subtrees; re-execution could re-sample range boundaries);
2. within-partition exclusive cumsum — one window per partition id;
3. per-partition totals → a single-partition window over ~#partitions
   METADATA rows (thousands, not billions) yields each partition's
   global starting offset;
4. broadcast the offsets back; ``global offset = partition offset +
   local offset``.

Each document then covers global tokens ``[off, off+tc)`` and is
exploded into the sequences ``floor(off/L) .. floor((off+tc-1)/L)``
with per-sequence begin/end token slices — all codegen expressions.

Reference: no analog in bigslice (packing is an LLM-pipeline op this
engine adds); the two-level scan is the textbook distributed prefix
sum (also how Spark's own zipWithIndex works, RDD.scala:1293-1305 in
apache/spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..checkpoint import materialize
from .text import tokens


def global_prefix_sum(df: DataFrame, order_cols: list[str],
                      weight, out_col: str) -> DataFrame:
    """``df``'s columns + ``out_col``: the exclusive GLOBAL prefix sum
    of ``weight`` (a Column; ``F.lit(1)`` yields 0-based positions) in
    ``order_cols`` total order — the two-level scan from the module
    docstring, shared by sequence packing and sampling.epoch_order.
    Internal columns never leak into the output; a caller column that
    COLLIDES with one (or with ``out_col``) raises instead of being
    silently clobbered and dropped."""
    taken = {"__w", "__pid", "__loc", "__poff", out_col}
    clash = sorted(taken.intersection(df.columns))
    if clash:
        raise ValueError(
            f"global_prefix_sum reserves column name(s) {clash}; "
            f"rename them on the input (or pick another out_col)")
    meta = (df.repartitionByRange(*[F.col(c) for c in order_cols])
            .withColumn("__w", weight)
            .withColumn("__pid", F.spark_partition_id()))
    # pin __pid: the subtree feeds both the row-level window and the
    # per-partition totals; lazy recomputation could re-sample range
    # boundaries and disagree on partition membership
    meta = materialize(meta)
    in_part = W.partitionBy("__pid").orderBy(*order_cols)
    local = meta.withColumn(
        "__loc", F.coalesce(
            F.sum("__w").over(
                in_part.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0)))
    ptot = meta.groupBy("__pid").agg(F.sum("__w").alias("__ptot"))
    poff = ptot.withColumn(
        "__poff", F.coalesce(
            F.sum("__ptot").over(
                W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0))).select("__pid", "__poff")
    return (local.join(F.broadcast(poff), on="__pid")
            .withColumn(out_col,
                        (F.col("__loc") + F.col("__poff"))
                        .cast("long"))
            .drop("__pid", "__loc", "__poff", "__w"))


def global_token_offsets(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """(id_col, n_tokens, token_off): each document's token count and
    exclusive global prefix sum in ``id_col`` order, via the two-level
    scan described in the module docstring. Zero-token documents are
    dropped (they occupy no space on the token line)."""
    meta = (df.select(id_col, F.size(tokens(text_col)).alias("n_tokens"))
            .filter(F.col("n_tokens") > 0))
    return global_prefix_sum(meta, [id_col], F.col("n_tokens"),
                             "token_off")


def pack_sequences(df: DataFrame, max_len: int, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(id_col, seq_id, begin_tok, end_tok): the assignment of each
    document's token slice ``[begin_tok, end_tok)`` to fixed-length
    training sequence ``seq_id`` (global token range
    ``[seq_id*max_len, (seq_id+1)*max_len)``). A document longer than
    the remaining room in its sequence continues into the next one —
    rows for one document are contiguous in (seq_id, begin_tok).

    The output is a pure metadata mapping; callers join it back to the
    corpus on ``id_col`` and slice tokens per row (so the text itself
    moves at most once, in that final join)."""
    if max_len <= 0:
        raise ValueError(f"max_len must be positive, got {max_len}")
    L = F.lit(int(max_len))
    off = global_token_offsets(df, text_col, id_col)
    first = F.floor(F.col("token_off") / L)
    last = F.floor((F.col("token_off") + F.col("n_tokens") - 1) / L)
    out = off.select(
        id_col, "n_tokens", "token_off",
        F.explode(F.sequence(first, last)).alias("seq_id"))
    begin = F.greatest(F.lit(0), F.col("seq_id") * L - F.col("token_off"))
    end = F.least(F.col("n_tokens"),
                  (F.col("seq_id") + 1) * L - F.col("token_off"))
    return out.select(id_col, "seq_id",
                      begin.cast("long").alias("begin_tok"),
                      end.cast("long").alias("end_tok"))
