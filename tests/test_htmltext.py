"""operators/htmltext.py — X59 HTML → text extraction tier."""

from __future__ import annotations

from pyspark.sql import functions as F

from bi_utils_spark.operators.htmltext import (
    attach_html_columns,
    html_links,
    html_title,
    outlink_domains,
    strip_html,
)


def _one(spark, html, col):
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(col("html").alias("v")).collect()[0]["v"]


def test_strip_html_script_lt_trap(spark):
    # '<' and '>' inside script/style bodies must not derail the tag
    # pattern — blocks vanish BEFORE tag stripping
    html = (
        "<html><head><title>T</title></head><body>"
        "<script>if (a < b && c > d) { x('</div>') }</script>"
        "<style>p > a {color: red}</style>"
        "<p>hello</p></body></html>"
    )
    assert _one(spark, html, strip_html) == "hello"


def test_strip_html_entities_and_whitespace(spark):
    html = "<p>Tom &amp; Jerry &lt;3   &quot;ok&quot; &#39;y&#39;&nbsp;z</p>"
    assert _one(spark, html, strip_html) == "Tom & Jerry <3 \"ok\" 'y' z"
    # &amp;lt; must NOT double-decode into '<'
    assert _one(spark, "<p>&amp;lt;</p>", strip_html) == "&lt;"


def test_strip_html_comments_and_head_dropped(spark):
    html = (
        "<head><title>Page Title</title><meta x='y'></head>"
        "<!-- hidden <p>junk</p> -->body text"
    )
    assert _one(spark, html, strip_html) == "body text"
    assert _one(spark, html, html_title) == "Page Title"


def test_html_title_absent_and_messy(spark):
    assert _one(spark, "<p>no title</p>", html_title) == ""
    assert (
        _one(spark, "<TITLE>\n  Spaced   Out\n</TITLE>", html_title)
        == "Spaced Out"
    )


def test_html_links_in_document_order(spark):
    html = (
        '<a href="http://a.com/1">x</a> mid '
        "<a id='z' href=\"http://b.com/2\">y</a>"
    )
    assert _one(spark, html, html_links) == ["http://a.com/1", "http://b.com/2"]
    assert _one(spark, "<p>none</p>", html_links) == []


def test_attach_html_columns_is_map_only(spark):
    docs = spark.createDataFrame(
        [(1, "<p>a</p>")], "doc_id long, html string"
    )
    plan = (
        attach_html_columns(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )  # noqa: SLF001
    assert "Exchange" not in plan


def test_outlink_domains_counts_links_and_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, '<a href="http://x.example.com/a">a</a>'
                '<a href="http://y.example.com/b">b</a>'),
            (2, '<a href="http://z.example.com/c">c</a>'),
            (3, '<a href="http://other.org/d">d</a>'),
            (4, "<p>no links</p>"),
        ],
        "doc_id long, html string",
    )
    rows = {r["domain"]: r for r in outlink_domains(docs).collect()}
    assert rows["example.com"]["n_links"] == 3
    assert rows["example.com"]["n_docs"] == 2
    assert rows["other.org"]["n_links"] == 1 and rows["other.org"]["n_docs"] == 1
    assert set(rows) == {"example.com", "other.org"}
