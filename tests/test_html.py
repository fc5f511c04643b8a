"""HTML extraction (operators/html.py): entity decoding, skip-tag
content, block segmentation, link-density boilerplate filtering, and
the tolerant-parser contract on malformed markup."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from bigslice_spark.operators.html import extract_text, html_extract

PROP = settings(max_examples=40, deadline=None,
                suppress_health_check=[HealthCheck.too_slow])


def test_full_page():
    h = ("<html><head><title>My  Page</title>"
         "<script>var x='<p>no</p>';</script><style>p{}</style></head>"
         "<body><h1>Head&amp;line</h1>"
         "<p>First   para with <b>bold</b> and &#233;.</p>"
         "<div><a href='/'>Home</a> | <a href='/a'>About</a></div>"
         "<!-- <p>ignored</p> --></body></html>")
    r = extract_text(h)
    assert r["title"] == "My Page"
    assert r["text"] == ("Head&line\nFirst para with bold and é.\n"
                         "Home | About")
    assert r["main_text"] == "Head&line\nFirst para with bold and é."
    assert (r["n_links"], r["n_blocks"]) == (2, 3)


def test_script_cdata_and_case():
    """Browser semantics (html.parser CDATA mode): script content
    runs to the FIRST </script> — it cannot nest — so text after an
    inner closer is page text. Tag-name case is insensitive."""
    h = ("<SCRIPT>a<script>b</script>after-closer</SCRIPT>"
         "<P>kept</P><NOSCRIPT>gone</NOSCRIPT>")
    r = extract_text(h)
    assert r["text"] == "after-closer\nkept"
    assert "gone" not in r["text"] and " a" not in r["text"]


def test_link_density_threshold():
    # 'two' is 3 of 8 chars -> kept at 0.5, dropped at 0.3
    h = "<li>item <a href=x>two</a></li><li><a href=y>alllink</a></li>"
    assert extract_text(h)["main_text"] == "item two"
    assert extract_text(h, max_link_density=0.3)["main_text"] == ""
    assert extract_text(h)["text"] == "item two\nalllink"


def test_inline_tags_do_not_split_blocks():
    r = extract_text("<p>a <b>b</b> <i>c</i> d<br>e</p>")
    # br IS a block boundary; b/i are not
    assert r["text"] == "a b c d\ne"
    assert r["n_blocks"] == 2


def test_malformed_never_raises():
    for bad in ("<div <p broken <<< &#xNOPE; <a href=",
                "</closed-never-opened><b>x", "\x00\xff<p>y",
                "<p>" + "<div>" * 2000):
        extract_text(bad)                       # must not raise
    assert extract_text("")["n_blocks"] == 0
    assert extract_text("plain no tags")["text"] == "plain no tags"


@PROP
@given(words=st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=8),
    min_size=1, max_size=20))
def test_plain_body_roundtrip(words):
    """Single-spaced plain text wrapped in one <p> extracts exactly."""
    text = " ".join(words)
    r = extract_text(f"<body><p>{text}</p></body>")
    assert r["text"] == text == r["main_text"]


def test_spark_html_extract(spark):
    rows = [(0, "<h1>T</h1><p>body zero</p>"),
            (1, "<nav><a href=/>only links</a></nav>"),
            (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r["doc_id"]: r for r in html_extract(df).collect()}
    assert got[0]["text"] == "T\nbody zero"
    assert got[1]["main_text"] == "" and got[1]["n_links"] == 1
    assert got[2]["text"] == "" and got[2]["n_blocks"] == 0


def test_html_links_extracts_resolves_and_orders(spark):
    from bigslice_spark.operators.html import html_links
    page = ("<html><body>"
            "<a href='/abs'>Root Rel</a>"
            "<a href='rel/page'>Doc Rel</a>"
            "<a href='../up'>Up</a>"
            "<a href='https://other.example/x'>Abs</a>"
            "<a href='//cdn.example/y'>Scheme Rel</a>"
            "<script><a href='/no'>skipped</a></script>"
            "<a href='/empty'></a>"
            "text <a>no href</a></body></html>")
    df = spark.createDataFrame(
        [(7, page, "https://corpus.test/doc/sub/7")],
        "doc_id long, html string, base string")
    rows = html_links(df, base_col="base").collect()
    got = [(r["href"], r["raw_href"], r["anchor"]) for r in rows]
    assert got == [
        ("https://corpus.test/abs", "/abs", "Root Rel"),
        ("https://corpus.test/doc/sub/rel/page", "rel/page", "Doc Rel"),
        ("https://corpus.test/doc/up", "../up", "Up"),
        ("https://other.example/x", "https://other.example/x", "Abs"),
        ("https://cdn.example/y", "//cdn.example/y", "Scheme Rel"),
        ("https://corpus.test/empty", "/empty", ""),
    ]


def test_html_links_no_base_and_nested_anchor(spark):
    from bigslice_spark.operators.html import html_links
    page = "<a href='/a'>one <a href='/b'>two</a></a>"
    df = spark.createDataFrame([(1, page)], "doc_id long, html string")
    rows = html_links(df).collect()
    got = [(r["href"], r["anchor"]) for r in rows]
    # browser model: second <a> implicitly closes the first
    assert got == [("/a", "one"), ("/b", "two")]


def test_html_links_empty_and_null_pages(spark):
    from bigslice_spark.operators.html import html_links
    df = spark.createDataFrame(
        [(1, None), (2, "no links here")], "doc_id long, html string")
    assert html_links(df).count() == 0


def test_html_extract_and_links_string_id(spark):
    """id column type is derived from the input schema — a string
    doc id must not hit an Arrow long/string mismatch."""
    from bigslice_spark.operators.html import html_links
    df = spark.createDataFrame(
        [("u1", "<html><body><p>hello world</p>"
          "<a href='/x'>x</a></body></html>")], "doc_id string, html string")
    ext = html_extract(df).collect()
    assert ext[0]["doc_id"] == "u1" and "hello world" in ext[0]["text"]
    links = html_links(df).collect()
    assert [(r["doc_id"], r["raw_href"]) for r in links] == [("u1", "/x")]
