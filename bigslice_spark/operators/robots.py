"""robots.txt parsing and URL filtering (RFC 9309) — the crawl
politeness gate: before a fetched URL enters the corpus (or a frontier
schedules it), the host's robots rules decide whether the agent may
use it.

FULLY DECLARATIVE, deliberately: the parse (line split, comment strip,
group assembly via window functions), the rule→regex translation
(escape-then-unescape chains), the longest-match semantics, and the
allow/deny verdict are all codegen/SQL expressions over the robots
TEXT column — no Python touches the corpus, the per-host rule tables
shuffle as a handful of short strings, and the whole pipeline replays
exactly in ANSI SQL (the ``robots_filter`` registry oracle does).

Semantics implemented (RFC 9309):

- groups: consecutive ``User-agent:`` lines stack onto one group;
  the first Allow/Disallow ends the stacking; rules before any
  User-agent line are ignored; comments (``#`` to end of line) and
  unknown fields (Sitemap, Crawl-delay, ...) are transparent;
- agent matching: case-insensitive exact product token, with ``*``
  as the fallback — if any exact group matches, ALL exact groups
  merge and ``*`` groups are ignored; otherwise all ``*`` groups
  merge (the RFC's "crawlers MUST obey the most specific group",
  with multi-group merge). Substring product-token matching
  (``FooBot/1.2`` vs ``foobot``) is the caller's normalization.
- rule matching: ``*`` matches any run of characters, ``$`` anchors
  the END of the path (elsewhere ``$`` is literal); every other
  character is literal. Longest-pattern-octets match wins;
  allow wins length ties; no matching rule → allowed; empty
  patterns match nothing (``Disallow:`` = allow all).
- percent-encoding normalization of paths/patterns is NOT performed
  (compare in one canonical form upstream — url_normalize).

Reference parity note: grailbio/bigslice has no web-crawl operators;
this extends the web-ingest family (SURVEY §2.4) next to
url_normalize/registrable_domain (operators/web.py) and the WARC
sources.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# regex specials escaped BEFORE the wildcard unescape; '*' and '$' are
# escaped too, then '\*' -> '.*' and a TRAILING '\$' -> '$'
_SPECIALS = r"([.\[\]{}()+?^$|*\\])"


def _pattern_to_regex(pat: Column) -> Column:
    """robots rule pattern → anchored Java/RE2 regex (identical chains
    in the SQL oracle): escape specials, turn '*' into '.*', keep a
    trailing '$' as the end anchor, prefix-match otherwise."""
    esc = F.regexp_replace(pat, _SPECIALS, r"\\$1")
    esc = F.regexp_replace(esc, r"\\\*", ".*")
    # Java replacement strings treat '$' as a group reference: the
    # literal end-anchor must be written escaped
    esc = F.regexp_replace(esc, r"\\\$$", r"\$")
    return F.concat(F.lit("^"), esc)


def robots_rules(robots: DataFrame, agent: str,
                 host_col: str = "host",
                 text_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) → the rule set governing ``agent`` on each
    host: ``(host, allow boolean, pattern, pat_len, pat_re)`` — the
    merged most-specific matching group's Allow/Disallow rules with
    empty patterns dropped. One window pass per host over its robots
    LINES (bounded by file size, never corpus-scale)."""
    a = agent.lower()
    lines = robots.select(
        host_col,
        F.posexplode(F.split(text_col, "\n")).alias("ln", "raw"))
    fields = lines.select(
        host_col, "ln",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"))
    fields = fields.select(
        host_col, "ln",
        F.lower(F.trim(F.substring_index("line", ":", 1)))
        .alias("field"),
        F.trim(F.expr(
            "CASE WHEN instr(line, ':') > 0 "
            "THEN substring(line, instr(line, ':') + 1) END"))
        .alias("value")
    ).filter(F.col("field").isin("user-agent", "allow", "disallow"))
    w = Window.partitionBy(host_col).orderBy("ln")
    # a User-agent line STARTS a group iff the previous relevant line
    # was not a User-agent line (consecutive UA lines stack)
    marked = fields.withColumn(
        "__prev", F.lag("field").over(w)).withColumn(
        "__start", ((F.col("field") == "user-agent")
                    & (F.coalesce(F.col("__prev"), F.lit("")) !=
                       "user-agent")).cast("int"))
    grouped = marked.withColumn(
        "grp", F.sum("__start").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    # group agent specificity: 2 = exact token match, 1 = '*', 0 = no
    uas = (grouped.filter(F.col("field") == "user-agent")
           .groupBy(host_col, "grp")
           .agg(F.max(F.when(F.lower("value") == a, 2)
                      .when(F.col("value") == "*", 1)
                      .otherwise(0)).alias("spec")))
    best = (uas.filter(F.col("spec") > 0)
            .groupBy(host_col)
            .agg(F.max("spec").alias("best_spec")))
    chosen = (uas.join(best, on=host_col)
              .filter(F.col("spec") == F.col("best_spec"))
              .select(host_col, "grp"))
    rules = (grouped.filter(F.col("field").isin("allow", "disallow"))
             .filter(F.col("grp") > 0)
             .join(chosen, on=[host_col, "grp"])
             .filter(F.length("value") > 0)
             .select(host_col,
                     (F.col("field") == "allow").alias("allow"),
                     F.col("value").alias("pattern"),
                     F.length("value").alias("pat_len"),
                     _pattern_to_regex(F.col("value")).alias("pat_re")))
    return rules


def robots_filter(urls: DataFrame, robots: DataFrame, agent: str,
                  url_col: str = "url", host_col: str = "host",
                  text_col: str = "robots_txt") -> DataFrame:
    """Annotate every URL with its robots verdict for ``agent``:
    ``(... url columns ..., allowed boolean, matched_pattern)``.

    Scale shape: robots parse is one window pass over per-host LINES;
    the verdict is one equi-join of urls⋈rules on host (rule tables
    are small per host — broadcast when the crawl list of hosts fits,
    shuffled otherwise) followed by a per-URL argmax over the handful
    of matching rules (longest pattern wins, allow wins ties, absent →
    allowed). No Python anywhere; hosts with no robots row allow
    everything (left join)."""
    rules = robots_rules(robots, agent, host_col, text_col)
    path = F.coalesce(
        F.regexp_extract(url_col, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/[^#]*)?",
                         1), F.lit(""))
    path = F.when(path == "", "/").otherwise(path)
    u = urls.withColumn("__path", path)
    j = u.join(rules, on=host_col, how="left")
    hit = F.col("pat_re").isNotNull() & F.regexp_like(
        F.col("__path"), F.col("pat_re"))
    # verdict = argmax over matching rules by (pat_len, allow);
    # max of NULLs (no rule matched / no robots) is NULL -> allowed
    verdict = (j.groupBy(*urls.columns)
               .agg(F.max(F.when(hit, F.struct(
                   F.col("pat_len").alias("l"),
                   F.col("allow").cast("int").alias("a"),
                   F.col("pattern").alias("p")))).alias("__m")))
    return verdict.select(
        *urls.columns,
        F.coalesce(F.col("__m.a") == 1, F.lit(True)).alias("allowed"),
        F.col("__m.p").alias("matched_pattern"))
