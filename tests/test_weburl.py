"""operators/weburl.py — X57 URL parse / normalize / domain tier."""

from __future__ import annotations

from pyspark.sql import functions as F

from bi_utils_spark.operators.weburl import (
    attach_url_columns,
    domain_stats,
    filter_blocked_domains,
    normalize_url,
    registered_domain,
    url_parts,
)


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["n"] for r in df.select(normalize_url("url").alias("n")).collect()]


def _dom(spark, hosts):
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    return [
        r["d"] for r in df.select(registered_domain("host").alias("d")).collect()
    ]


def test_normalize_case_ports_fragments_tracking(spark):
    assert _norm(
        spark,
        [
            "HTTPS://Example.COM:443/Path?utm_source=a&z=2&a=1#frag",
            "http://example.com:80/",
            "http://example.com:8080/x",
            "https://example.com",
            "http://example.com/x?gclid=1&fbclid=2",
        ],
    ) == [
        "https://example.com/Path?a=1&z=2",  # path case preserved, params sorted
        "http://example.com/",
        "http://example.com:8080/x",  # non-default port kept
        "https://example.com/",  # empty path -> '/'
        "http://example.com/x",  # all-tracking query dropped entirely
    ]


def test_normalize_does_not_merge_distinct_resources(spark):
    # https:443 is default, http:443 is NOT — they must stay distinct
    a, b = _norm(spark, ["https://h.com:443/p", "http://h.com:443/p"])
    assert a == "https://h.com/p" and b == "http://h.com:443/p"


def test_url_parts_userinfo_stripped(spark):
    df = spark.createDataFrame(
        [("https://user:pw@Host.COM:8443/a/b?q=1#f",)], "url string"
    )
    p = url_parts("url")
    row = df.select(
        p["scheme"].alias("s"), p["host"].alias("h"), p["port"].alias("p"),
        p["path"].alias("pa"), p["query"].alias("q"), p["fragment"].alias("f"),
    ).collect()[0]
    assert (row["s"], row["h"], row["p"]) == ("https", "Host.COM", "8443")
    assert (row["pa"], row["q"], row["f"]) == ("/a/b", "q=1", "f")


def test_registered_domain_suffix_rules(spark):
    assert _dom(
        spark,
        [
            "www.example.com",
            "news.bbc.co.uk",
            "a.b.c.example.org",
            "example.com",
            "localhost",
            "shop.example.com.br",
        ],
    ) == [
        "example.com",
        "bbc.co.uk",
        "example.org",
        "example.com",
        "localhost",
        "example.com.br",
    ]


def test_blocklist_anti_join_is_broadcast_and_case_insensitive(spark):
    docs = spark.createDataFrame(
        [
            (1, "http://spam.example.org/x"),
            (2, "http://ok.example.com/y"),
        ],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame([("EXAMPLE.ORG",)], "domain string")
    out = filter_blocked_domains(docs, bl)
    assert [r["doc_id"] for r in out.collect()] == [2]
    plan = out._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_domain_stats_counts_normalized_urls(spark):
    docs = spark.createDataFrame(
        [
            (1, "http://a.example.com/p?utm_source=x"),
            (2, "http://a.example.com/p"),  # same canonical resource
            (3, "http://b.example.com/q"),
        ],
        "doc_id long, url string",
    )
    row = {r["domain"]: r for r in domain_stats(docs).collect()}["example.com"]
    assert row["n_docs"] == 3 and row["n_urls"] == 2 and row["n_hosts"] == 2


def test_attach_url_columns_is_map_only(spark):
    docs = spark.createDataFrame([(1, "http://x.com/a")], "doc_id long, url string")
    plan = (
        attach_url_columns(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )  # noqa: SLF001
    assert "Exchange" not in plan
