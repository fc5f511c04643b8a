"""PII scrubbing for training corpora: redact emails, SSNs, phone
numbers and IPv4 addresses with typed placeholder tokens, and report
per-document match counts — the standard pre-training privacy pass.

All work is chained ``regexp_replace`` / ``regexp_count`` expressions:
JVM-side, whole-stage codegen, zero shuffles (a pure projection — the
operator adds NOTHING to the job's exchange count, gated in
tests/test_plans.py). The patterns are restricted to the
lookahead-free regex subset shared by Java's engine (Spark) and RE2
(DuckDB), so the whole scrub replays bit-identically in the oracle.

Pattern order matters and is fixed: email → ssn → phone → ip, each
replacement running on the output of the previous one (an SSN must be
claimed before the looser phone pattern can eat it). Match counts are
taken on the ORIGINAL text, so a span is counted by every pattern it
matches even though only the first one in order gets to redact it.

Reference: no analog in bigslice; part of the LLM-pipeline surface
this engine adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — ORDER IS SEMANTIC, see module docstring
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone",
     r"(?:\+?\d{1,3}[-. ]?)?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
]


def scrub_expr(col: Column | str,
               patterns: list[tuple[str, str]] | None = None) -> Column:
    """The chained-redaction expression alone (for use inside wider
    selects)."""
    c = F.col(col) if isinstance(col, str) else col
    for name, pat in patterns or PII_PATTERNS:
        c = F.regexp_replace(c, pat, f"<{name.upper()}>")
    return c


def scrub_pii(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id",
              patterns: list[tuple[str, str]] | None = None) -> DataFrame:
    """(id_col, text, n_<name>...): the redacted text plus one match
    count per pattern (counted on the original text). A pure
    projection — runs at scan speed on 100 TB."""
    pats = patterns or PII_PATTERNS
    counts = [F.regexp_count(F.col(text_col), F.lit(pat))
              .cast("long").alias(f"n_{name}") for name, pat in pats]
    return df.select(F.col(id_col),
                     scrub_expr(text_col, pats).alias(text_col), *counts)
