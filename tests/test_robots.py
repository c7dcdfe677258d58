"""operators/robots.py — X60 robots.txt compliance tier."""

from __future__ import annotations

from pyspark.sql import functions as F

from bi_utils_spark.operators.robots import (
    filter_robots_allowed,
    parse_robots,
    robots_decisions,
)


def _rules(spark, files):
    df = spark.createDataFrame(files, "host string, robots_txt string")
    return parse_robots(df)


def _decide(spark, rules, urls, agent):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    rows = (
        robots_decisions(df, rules, user_agent=agent)
        .orderBy("doc_id")
        .collect()
    )
    return [r["allowed"] for r in rows]


_FULL = (
    "example.com",
    "# comment\n"
    "User-agent: *\n"
    "Disallow: /private/\n"
    "Allow: /private/ok\n"
    "Crawl-delay: 5\n"
    "\n"
    "User-agent: MyBot\n"
    "User-agent: OtherBot\n"
    "Disallow: /tmp/*  # inline comment\n"
    "Allow: /tmp/keep$\n"
    "Disallow:\n"
    "Sitemap: http://example.com/sm.xml\n",
)


def test_parse_groups_and_traps(spark):
    got = {
        (r["host"], r["agent"], r["rule"], r["path"])
        for r in _rules(spark, [_FULL]).collect()
    }
    assert got == {
        ("example.com", "*", "disallow", "/private/"),
        ("example.com", "*", "allow", "/private/ok"),
        # consecutive UA lines share the group; agents lowercased
        ("example.com", "mybot", "disallow", "/tmp/*"),
        ("example.com", "mybot", "allow", "/tmp/keep$"),
        ("example.com", "otherbot", "disallow", "/tmp/*"),
        ("example.com", "otherbot", "allow", "/tmp/keep$"),
        # Crawl-delay/Sitemap ignored, empty Disallow dropped,
        # comments stripped (incl. after a rule value)
    }


def test_specific_group_shadows_star(spark):
    rules = _rules(spark, [_FULL])
    urls = [
        "http://example.com/private/doc",  # star disallow — but mybot
        "http://example.com/tmp/a",        # mybot wildcard disallow
        "http://example.com/tmp/keep",     # $-anchored allow
        "http://example.com/tmp/keepX",    # $ does not match -> disallow
        "http://example.com/other",
    ]
    # RFC 9309 §2.2.1: an agent with its own group ignores '*'.
    assert _decide(spark, rules, urls, "MyBot") == [
        True, False, True, False, True,
    ]
    assert _decide(spark, rules, urls, "*") == [
        False, True, True, True, True,
    ]


def test_longest_match_wins_ties_allow(spark):
    rules = _rules(
        spark,
        [
            (
                "h.com",
                "User-agent: *\n"
                "Disallow: /a/\n"
                "Allow: /a/b/\n"
                "Disallow: /a/b/c\n"
                # equal-length tie: allow wins
                "Allow: /t/x\n"
                "Disallow: /t/y\n"
                "Allow: /t/y\n",
            )
        ],
    )
    urls = [
        "http://h.com/a/doc",     # /a/ disallow
        "http://h.com/a/b/doc",   # /a/b/ allow (longer)
        "http://h.com/a/b/cd",    # /a/b/c disallow (longest)
        "http://h.com/t/y",       # 4-char tie -> allow
    ]
    assert _decide(spark, rules, urls, "*") == [False, True, False, True]


def test_unknown_host_unmatched_and_empty_paths_allowed(spark):
    rules = _rules(
        spark, [("h.com", "User-agent: onlyother\nDisallow: /\n")]
    )
    urls = [
        "http://nohost.org/x",   # no rule row for host
        "http://h.com/x",        # rules exist, none for this agent or '*'
        "http://h.com",          # empty path defaults to '/'
    ]
    assert _decide(spark, rules, urls, "mybot") == [True, True, True]


def test_disallow_all_and_default_path(spark):
    rules = _rules(spark, [("h.com", "User-agent: *\nDisallow: /\n")])
    assert _decide(
        spark, rules, ["http://h.com", "http://h.com/x"], "anybot"
    ) == [False, False]


def test_filter_and_no_corpus_groupby(spark):
    rules = _rules(spark, [("h.com", "User-agent: *\nDisallow: /no/\n")])
    urls = spark.createDataFrame(
        [(1, "http://h.com/ok"), (2, "http://h.com/no/x")],
        "doc_id long, url string",
    )
    kept = filter_robots_allowed(urls, rules)
    assert [r["doc_id"] for r in kept.collect()] == [1]
    # The decision is a per-row fold after the host join — the
    # corpus side must NOT re-aggregate (no per-URL groupBy).
    plan = kept._jdf.queryExecution().executedPlan().toString()
    # the rules side broadcasts by default — the URL corpus must not
    # shuffle (no Exchange above the corpus scan) and the join must
    # be a BroadcastHashJoin, not an SMJ on the corpus host key.
    assert "BroadcastHashJoin" in plan
    # an SMJ inside parse_robots joins two RULE-TABLE-sized sides on
    # (host, group_id) — fine at scale; what must not exist is a
    # sort-merge join on the corpus host key.
    import re

    assert not re.search(r"SortMergeJoin \[_rb_host", plan)
    # aggregates belong to the FILE-bounded rule packing only
    assert plan.count("HashAggregate") <= 8


def test_pattern_metachars_literal(spark):
    # regex metacharacters in a robots path are literals, not regex
    rules = _rules(
        spark, [("h.com", "User-agent: *\nDisallow: /a.b(c)/\n")]
    )
    assert _decide(
        spark,
        rules,
        ["http://h.com/a.b(c)/x", "http://h.com/aXb(c)/x"],
        "*",
    ) == [False, True]
