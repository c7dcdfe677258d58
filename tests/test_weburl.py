"""operators/weburl.py — X57 URL parse / normalize / domain tier."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark.sql import Window

from bi_utils_spark.operators.weburl import (
    attach_registered_domain,
    attach_url_columns,
    cap_per_domain,
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


def test_ipv6_literal_authorities_parse_and_never_merge(spark):
    # r5 defect class (VERDICT r5 #1): '[::1]' used to parse to host
    # '[' so distinct IPv6 resources merged after normalization.
    a, b, c, d = _norm(
        spark,
        [
            "http://[::1]/x",
            "http://[::2]/x",
            "http://[::1]:8080/x",
            "HTTPS://[2001:DB8::1]:443/p",
        ],
    )
    assert a == "http://[::1]/x" and b == "http://[::2]/x"
    assert a != b  # distinct resources stay distinct
    assert c == "http://[::1]:8080/x"  # non-default port kept
    assert d == "https://[2001:db8::1]/p"  # default port stripped, host lowered


def test_fragment_question_mark_is_not_a_query(spark):
    # '?' inside the fragment must not be parsed as a query string
    a, b = _norm(
        spark, ["http://example.com/path#a?b=1", "http://example.com/path?b=1"]
    )
    assert a == "http://example.com/path" and b == "http://example.com/path?b=1"
    df = spark.createDataFrame([("http://e.com/p#a?b=1",)], "url string")
    p = url_parts("url")
    row = df.select(p["query"].alias("q"), p["fragment"].alias("f")).collect()[0]
    assert row["q"] == "" and row["f"] == "a?b=1"


def test_trailing_dot_fqdn_canonicalized(spark):
    # example.co.uk. names the same DNS zone as example.co.uk
    a, b = _norm(spark, ["http://example.co.uk./a", "http://example.co.uk/a"])
    assert a == b == "http://example.co.uk/a"
    assert _dom(spark, ["example.co.uk.", "www.Example.COM."]) == [
        "example.co.uk",
        "example.com",
    ]


def test_registered_domain_ip_literals_pass_through(spark):
    # an IP address has no DNS labels — pooling by 'last two octets'
    # would merge unrelated servers into one blocklist/cap unit
    assert _dom(
        spark, ["93.184.216.34", "5.6.216.34", "[2001:db8::1]", "[::1]"]
    ) == ["93.184.216.34", "5.6.216.34", "[2001:db8::1]", "[::1]"]


def test_ip_blocklist_matches_the_address_itself(spark):
    docs = spark.createDataFrame(
        [
            (1, "http://93.184.216.34/x"),
            (2, "http://5.6.216.34/y"),  # shares two octets — must survive
            (3, "http://[2001:db8::1]/z"),
        ],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame(
        [("93.184.216.34",), ("[2001:db8::1]",)], "domain string"
    )
    out = filter_blocked_domains(docs, bl)
    assert [r["doc_id"] for r in out.collect()] == [2]


def test_psl_registered_domain_rule_types(spark):
    psl = spark.createDataFrame(
        [(r,) for r in
         ["com", "co.uk", "io", "github.io", "ck", "*.ck", "!www.ck",
          "// comment", ""]],
        "rule string",
    )
    hosts = [
        ("a.b.github.io", "b.github.io"),    # private suffix rule
        ("github.io", "github.io"),          # public suffix itself: passthrough
        ("news.bbc.co.uk", "bbc.co.uk"),     # multi-label ccTLD
        ("x.y.z.ck", "y.z.ck"),              # wildcard *.ck
        ("b.ck", "b.ck"),                    # wildcard's own suffix: passthrough
        ("WWW.CK", "www.ck"),                # exception !www.ck beats *.ck
        ("x.www.ck", "www.ck"),              # under the exception domain
        ("example.com", "example.com"),
        ("unknown.tld", "unknown.tld"),      # no rule: default '*' (last label)
        ("a.unknown.tld", "unknown.tld"),
        ("localhost", "localhost"),
        ("93.184.216.34", "93.184.216.34"),  # IP literals bypass the PSL
    ]
    df = spark.createDataFrame([(h,) for h, _ in hosts], "host string")
    got = {
        r["host"]: r["domain"]
        for r in attach_registered_domain(df, "host", psl=psl).collect()
    }
    for h, want in hosts:
        assert got[h] == want, (h, got[h], want)


def test_load_psl_file_format(spark, tmp_path):
    from bi_utils_spark.operators.weburl import load_psl

    p = tmp_path / "psl.dat"
    p.write_text(
        "// ===BEGIN ICANN DOMAINS===\n"
        "\n"
        "com\n"
        "co.uk\n"
        "*.ck\n"
        "!www.ck\n"
        "github.io   // private section annotation\n"
        "// ===END===\n"
    )
    psl = load_psl(spark, str(p))
    assert sorted(r["rule"] for r in psl.collect()) == [
        "!www.ck", "*.ck", "co.uk", "com", "github.io",
    ]
    df = spark.createDataFrame(
        [("a.b.github.io",), ("www.ck",)], "host string"
    )
    got = {
        r["host"]: r["domain"]
        for r in attach_registered_domain(df, "host", psl=psl).collect()
    }
    assert got == {"a.b.github.io": "b.github.io", "www.ck": "www.ck"}


def test_psl_join_is_broadcast_only_on_corpus_side(spark):
    psl = spark.createDataFrame([("co.uk",), ("*.ck",)], "rule string")
    df = spark.createDataFrame([("a.b.co.uk",)], "host string")
    plan = (
        attach_registered_domain(df, "host", psl=psl)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )  # noqa: SLF001
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # corpus never shuffles for the lookup


def test_cap_per_domain_matches_one_level_window_and_partitions(spark):
    docs = spark.createDataFrame(
        [(i, f"http://d{i % 7}.ex{i % 3}.com/p/{i}") for i in range(400)],
        "doc_id long, url string",
    )
    capped = cap_per_domain(docs, cap=9)
    # exact kept set == the naive one-level per-domain window
    one = (
        attach_url_columns(docs)
        .withColumn(
            "__h",
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("domcap"))),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("domain").orderBy("__h", "doc_id")
            ),
        )
        .filter(F.col("rn") <= 9)
    )
    assert sorted(r["doc_id"] for r in capped.collect()) == sorted(
        r["doc_id"] for r in one.collect()
    )
    counts = [r["c"] for r in capped.groupBy("domain").agg(F.count("*").alias("c")).collect()]
    assert counts and all(c <= 9 for c in counts)
    # no unpartitioned window anywhere in the plan
    plan = capped._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "Window" in plan
    import re

    for m in re.finditer(r"partitionBy=\[\]", plan):
        raise AssertionError("unpartitioned window in cap_per_domain plan")


def test_attach_url_columns_is_map_only(spark):
    docs = spark.createDataFrame([(1, "http://x.com/a")], "doc_id long, url string")
    plan = (
        attach_url_columns(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )  # noqa: SLF001
    assert "Exchange" not in plan
