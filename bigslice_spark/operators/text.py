"""Text-analysis operators for training-data pipelines: tokenization stats,
quality scoring, language ID, document fingerprinting.

All hot paths are native Column expressions (whole-stage codegen); only the
rolling-hash fingerprint drops to an Arrow-batched pandas UDF. Designed so
each output is reproducible in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny fixed stopword lexicons for the n-gram/stopword language heuristic.
# Order matters: ties resolve to the first language in LANGS.
LANGS = ["de", "en", "es", "fr", "zh"]
LEXICONS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "de": ["der", "die", "und", "das", "ist", "ein", "mit", "von", "zu",
           "den"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "du", "que", "est"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "就", "不", "人"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization, empty tokens removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


# BPE-style pre-tokenizer classes (GPT-2-family shape, simplified to the
# lookahead-free subset shared by Java regex and RE2 so Spark and DuckDB
# segment identically): letter runs, digit runs, runs of other
# non-whitespace. A BPE vocabulary then splits within these classes —
# counting them is the standard cheap token-budget estimator.
BPE_PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_count(col: Column | str,
                    pattern: str = BPE_PRETOKEN_RE) -> Column:
    """Pre-token count under a BPE-ish segmentation (see BPE_PRETOKEN_RE).
    Codegen'd regexp_extract_all; oracle-reproducible with DuckDB's
    regexp_extract_all on the same pattern."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0))) \
        .cast("long")


def text_stats(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-document stats: chars, tokens, mean token length, whitespace
    ratio, distinct-token ratio — all codegen'd expressions."""
    toks = tokens(text_col)
    n_chars = F.length(text_col).cast("long")
    n_tokens = F.size(toks).cast("long")
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), r"\s+", "")) \
        .cast("long")
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (alpha_chars.cast("double")
         / F.greatest(n_tokens, F.lit(1)).cast("double"))
        .alias("mean_token_len"),
        (F.size(F.array_distinct(toks)).cast("double")
         / F.greatest(n_tokens, F.lit(1)).cast("double"))
        .alias("distinct_ratio"),
    )


def quality_score(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Deterministic quality score in [0,1]: favors documents with enough
    tokens, plausible mean token length, and lexical diversity — the
    classic cheap pre-filters before expensive dedup/classification."""
    s = text_stats(df, text_col, id_col)
    len_component = F.least(s.n_tokens.cast("double") / 50.0, F.lit(1.0))
    tok_len_ok = F.when((s.mean_token_len >= 3.0)
                        & (s.mean_token_len <= 10.0), 1.0).otherwise(0.0)
    return s.select(
        id_col,
        (len_component * 0.4 + tok_len_ok * 0.3
         + s.distinct_ratio * 0.3).alias("quality"))


def lang_id(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit-rate language ID over fixed lexicons. Argmax with ties
    resolved by LANGS order — reproducible in SQL for the oracle."""
    toks = tokens(text_col)
    n = F.greatest(F.size(toks), F.lit(1)).cast("double")
    def _hits(lex: list[str]):
        return lambda t: t.isin(*lex)

    scores = {
        lang: (F.size(F.filter(toks, _hits(LEXICONS[lang]))) / n)
        for lang in LANGS
    }
    # deterministic argmax: max (score, LANGS-order priority) lexicographic
    entries = [F.struct(scores[lang].alias("s"),
                        F.lit(len(LANGS) - i).alias("p"),
                        F.lit(lang).alias("l"))
               for i, lang in enumerate(LANGS)]
    best = F.array_max(F.array(*entries))["l"]
    return df.select(id_col, best.alias("pred_lang"))


FP_MOD = (1 << 61) - 1
FP_BASE = 257


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Rolling polynomial hash (base 257 mod 2^61-1) over the utf-8 bytes —
    a deterministic whole-document fingerprint (winnowing building block).
    Arrow-batched pandas path; pure-Python reference in tests."""

    def fp_series(s: pd.Series) -> pd.Series:
        out = []
        for txt in s:
            h = 0
            for b in (txt or "").encode("utf-8"):
                h = (h * FP_BASE + b) % FP_MOD
            out.append(h)
        return pd.Series(out, dtype="int64")

    fp_udf = F.pandas_udf(fp_series, "long")
    return df.select(id_col, fp_udf(F.col(text_col)).alias("fp"))
