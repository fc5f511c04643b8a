"""Duplicate-span detection and removal — substring-level dedup.

Document-level dedup (exact_dedup, minhash) removes whole near-copies;
real web corpora ALSO repeat sub-document text: boilerplate sentences,
license blocks, quoted paragraphs. The standard fix (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better") finds every
substring above a length threshold that occurs more than once in the
corpus and removes the repeated spans, keeping the unique remainder of
each document.

The paper builds a single suffix array over the concatenated corpus —
inherently sequential and memory-resident, unusable at 100 TB. The
distributed reformulation here gets the same spans from fixed-width
token windows:

  a repeated substring of >= w tokens  <=>  every w-token window inside
  it is repeated; conversely the union of repeated w-windows recovers
  the repeated spans (to window granularity).

Spark-first shape, three narrow exchanges and zero Python:

  1. posexplode + lead window over (doc, pos)    — shuffle by doc_id
  2. groupBy(xxhash64(window)).count()           — shuffle by 8-byte
     hash with map-side partial aggregation, so a boilerplate window
     repeated 10^7 times arrives at the reducer as per-mapper partial
     counts, never as 10^7 rows on one key (the skew story the
     count-over-whash-partition window variant would NOT have)
  3. semi-join window starts against the repeated-hash set (narrow:
     hash + pos), left-join the dup flags back onto token positions,
     then a per-doc RANGE window turns start flags into covered
     positions: pos p is inside a repeated span iff some repeated
     window starts in [p-w+1, p]. Island detection (lag) merges
     overlapping windows into maximal spans.

Everything after tokenization moves 8-16 byte rows; the text itself is
never shuffled. Per-key state is bounded by document length (the same
bound every per-doc window in this engine carries), never by corpus
size. Counting repeats by xxhash64(window) instead of window text is
the scale choice; a 64-bit collision merging two distinct windows needs
~2^32 distinct windows to become likely — at that point switch the hash
to concat of two seeds.

Reference: no analog in bigslice (grep: no suffix/substring dedup);
part of the LLM-pipeline surface this engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .text import tokens


def _positions(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, n, pos, tok) — one row per token position, 0-based.

    Empty documents yield no rows (posexplode, not _outer): a document
    with no tokens has no positions to cover and drops out, matching
    the SQL replay where unnest(generate_series(1, 0)) is empty."""
    t = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    return t.select(id_col, F.size("__toks").alias("__n"),
                    F.posexplode("__toks").alias("__pos", "__tok"))


def _dup_start_flags(pr: DataFrame, id_col: str, w: int,
                     min_count: int) -> DataFrame:
    """(id, __pos, __is_dup=1) for every position starting a w-token
    window whose corpus-wide occurrence count is >= min_count."""
    wspec = W.partitionBy(id_col).orderBy("__pos")
    parts = [F.col("__tok")] + [F.lead("__tok", k).over(wspec)
                                for k in range(1, w)]
    starts = (pr.withColumn("__wh",
                            F.xxhash64(F.concat_ws(" ", *parts)))
              .filter(F.col("__pos") <= F.col("__n") - w)
              .select(id_col, "__pos", "__wh"))
    # partial-agg-friendly count, NOT count().over(partitionBy(__wh)):
    # the window form puts every occurrence of a hot boilerplate window
    # on one task; groupBy combines map-side first.
    dup_hashes = (starts.groupBy("__wh")
                  .agg(F.count(F.lit(1)).alias("__c"))
                  .filter(F.col("__c") >= min_count)
                  .select("__wh"))
    return (starts.join(dup_hashes, "__wh", "semi")
            .select(id_col, "__pos", F.lit(1).alias("__is_dup")))


def _covered(df: DataFrame, text_col: str, id_col: str, w: int,
             min_count: int) -> DataFrame:
    """(id, n, pos, tok, is_dup, covered): per-token duplication state.

    ``is_dup`` marks positions that START a repeated window; ``covered``
    marks positions INSIDE any repeated window (the RANGE frame looks
    back w-1 positions for a flagged start)."""
    pr = _positions(df, text_col, id_col)
    flags = _dup_start_flags(pr, id_col, w, min_count)
    ann = (pr.join(flags, [id_col, "__pos"], "left")
           .withColumn("__is_dup",
                       F.coalesce(F.col("__is_dup"), F.lit(0))))
    cov = W.partitionBy(id_col).orderBy("__pos") \
        .rangeBetween(-(w - 1), 0)
    return ann.withColumn("__covered", F.max("__is_dup").over(cov))


def dup_span_report(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", w: int = 8,
                    min_count: int = 2) -> DataFrame:
    """Per-document repeated-span statistics.

    Returns (id, n_tokens, n_dup_windows, dup_tokens, n_dup_spans,
    dup_frac): how many w-token windows of the document occur >=
    min_count times corpus-wide, how many token positions fall inside
    the union of those windows, how many maximal spans that union
    merges into, and the covered fraction. Documents shorter than w
    tokens report zero duplication (they cannot contain a w-token
    repeat); empty documents drop out."""
    ann = _covered(df, text_col, id_col, w, min_count)
    lagw = W.partitionBy(id_col).orderBy("__pos")
    ann = ann.withColumn(
        "__span_start",
        ((F.col("__covered") == 1)
         & (F.coalesce(F.lag("__covered").over(lagw), F.lit(0)) == 0)
         ).cast("int"))
    return (ann.groupBy(id_col)
            .agg(F.max("__n").cast("long").alias("n_tokens"),
                 F.sum("__is_dup").cast("long").alias("n_dup_windows"),
                 F.sum("__covered").cast("long").alias("dup_tokens"),
                 F.sum("__span_start").cast("long").alias("n_dup_spans"),
                 (F.sum("__covered").cast("double")
                  / F.max("__n").cast("double")).alias("dup_frac")))


def strip_dup_spans(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", w: int = 8,
                    min_count: int = 2) -> DataFrame:
    """Remove every repeated span, keep the unique remainder.

    Returns (id, clean_text, n_tokens, dup_tokens). ``clean_text`` is
    the document's tokens outside all repeated windows, re-joined with
    single spaces in original order (collect_list per doc — bounded by
    document length, the engine-wide per-doc state bound). A document
    that is entirely repeated text comes back with clean_text = ''."""
    ann = _covered(df, text_col, id_col, w, min_count)
    keep = F.when(F.col("__covered") == 0,
                  F.struct(F.col("__pos"), F.col("__tok")))
    return (ann.groupBy(id_col)
            .agg(F.array_join(
                     F.transform(F.array_sort(F.collect_list(keep)),
                                 lambda s: s["__tok"]),
                     " ").alias("clean_text"),
                 F.max("__n").cast("long").alias("n_tokens"),
                 F.sum("__covered").cast("long").alias("dup_tokens")))
