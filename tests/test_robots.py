"""robots.txt parsing/filtering (operators/robots.py) against an
independently written pure-Python RFC 9309 reference."""

import re

import pytest


def _ref_rules(text: str, agent: str):
    """Independent reference: parse robots.txt into the rule list for
    ``agent`` per RFC 9309 group semantics."""
    groups = []          # (set_of_uas, [(allow, pattern)])
    cur_uas, cur_rules, stacking = None, None, False
    for raw in text.split("\n"):
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        field, value = line.split(":", 1)
        field, value = field.strip().lower(), value.strip()
        if field == "user-agent":
            if not stacking:
                if cur_uas is not None:
                    groups.append((cur_uas, cur_rules))
                cur_uas, cur_rules, stacking = set(), [], True
            cur_uas.add(value.lower())
        elif field in ("allow", "disallow"):
            stacking = False
            if cur_uas is not None and value:
                cur_rules.append((field == "allow", value))
    if cur_uas is not None:
        groups.append((cur_uas, cur_rules))
    exact = [g for g in groups if agent.lower() in g[0]]
    star = [g for g in groups if "*" in g[0]]
    chosen = exact or star
    return [r for g in chosen for r in g[1]]


def _ref_match(path: str, pattern: str) -> bool:
    rx = "^" + re.escape(pattern).replace(r"\*", ".*")
    if rx.endswith(r"\$"):
        rx = rx[:-2] + "$"
    return re.search(rx, path) is not None


def _ref_allowed(path: str, rules) -> tuple[bool, str | None]:
    best = None
    for allow, pat in rules:
        if _ref_match(path, pat):
            key = (len(pat), allow)
            if best is None or key > (len(best[1]), best[0]):
                best = (allow, pat)
    return (True, None) if best is None else best


ROBOTS = """\
# corpus.test policy
User-agent: graftbot
User-Agent: otherbot
Disallow: /private/
Allow: /private/pub$
Disallow: /tmp*.log
Crawl-delay: 5

User-agent: *
Disallow: /
Allow: /index.html
"""

PATHS = ["/", "/index.html", "/private/doc1", "/private/pub",
         "/private/pub2", "/tmp1.log", "/tmpx/y.log", "/public/a",
         "/tmp.log$x"]


def test_reference_semantics():
    """The reference itself behaves per RFC on the fixture."""
    rules = _ref_rules(ROBOTS, "graftbot")
    assert ("/private/doc1", False) == (
        "/private/doc1", _ref_allowed("/private/doc1", rules)[0])
    assert _ref_allowed("/private/pub", rules)[0] is True   # $ anchor
    assert _ref_allowed("/private/pub2", rules)[0] is False
    assert _ref_allowed("/tmp1.log", rules)[0] is False     # wildcard
    assert _ref_allowed("/public/a", rules)[0] is True      # no rule
    star = _ref_rules(ROBOTS, "strangerbot")
    assert _ref_allowed("/public/a", star)[0] is False      # * group
    assert _ref_allowed("/index.html", star)[0] is True


def test_robots_filter_matches_reference(spark):
    from bigslice_spark.operators.robots import robots_filter
    robots = spark.createDataFrame(
        [("a.test", ROBOTS),
         ("b.test", "User-agent: *\nDisallow:\n"),    # empty = allow
         ("c.test", "Disallow: /orphan\n")],          # rules w/o UA
        "host string, robots_txt string")
    rows = [(f"https://{h}.test{p}", f"{h}.test")
            for h in ("a", "b", "c", "nobots") for p in PATHS]
    urls = spark.createDataFrame(rows, "url string, host string")
    for agent in ("graftbot", "strangerbot", "GRAFTBOT"):
        got = {r["url"]: (r["allowed"], r["matched_pattern"])
               for r in robots_filter(urls, robots, agent).collect()}
        assert len(got) == len(rows)
        for url, host in rows:
            path = url.split(".test", 1)[1] or "/"
            rules = _ref_rules(ROBOTS, agent) if host == "a.test" \
                else []
            want = _ref_allowed(path, rules)
            assert got[url] == want, (agent, url, got[url], want)


def test_robots_filter_query_string_and_no_path(spark):
    """Rules match against path+query; a bare host URL is path '/'."""
    from bigslice_spark.operators.robots import robots_filter
    robots = spark.createDataFrame(
        [("q.test", "User-agent: *\nDisallow: /search?q=*priv\n"
                    "Disallow: /$\n")],
        "host string, robots_txt string")
    urls = spark.createDataFrame(
        [("https://q.test/search?q=xprivy", "q.test"),
         ("https://q.test/search?q=pub", "q.test"),
         ("https://q.test", "q.test"),
         ("https://q.test/deep", "q.test")],
        "url string, host string")
    got = {r["url"]: r["allowed"]
           for r in robots_filter(urls, robots, "bot").collect()}
    assert got["https://q.test/search?q=xprivy"] is False
    assert got["https://q.test/search?q=pub"] is True
    assert got["https://q.test"] is False       # '/' hits '/$'
    assert got["https://q.test/deep"] is True   # '$' anchored


def test_robots_plan_no_python(spark):
    from bigslice_spark.operators.robots import robots_filter
    robots = spark.createDataFrame([("x", "User-agent: *\nDisallow: /a")],
                                   "host string, robots_txt string")
    urls = spark.createDataFrame([("https://x/a", "x")],
                                 "url string, host string")
    plan = robots_filter(urls, robots, "bot") \
        ._jdf.queryExecution().executedPlan().toString()
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert node not in plan
