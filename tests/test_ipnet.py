"""operators/ipnet.py — X72 IPv4/CIDR blocklist tier."""

from __future__ import annotations

from pyspark.sql import functions as F

from bi_utils_spark.operators.ipnet import (
    attach_cidr_match,
    cidr_ranges,
    filter_blocked_ips,
    ipv4_to_long,
)


def _longs(spark, ips):
    df = spark.createDataFrame([(i,) for i in ips], "ip string")
    return [
        r["n"] for r in df.select(ipv4_to_long("ip").alias("n")).collect()
    ]


def test_ipv4_to_long_strict(spark):
    got = _longs(
        spark,
        [
            "0.0.0.0", "255.255.255.255", "10.0.0.1",
            "256.1.1.1",      # octet out of range
            "01.2.3.4",       # leading zero rejected (ambiguous octal)
            "1.2.3",          # short
            "1.2.3.4.5",      # long
            " 1.2.3.4",       # whitespace
            None,
        ],
    )
    assert got == [
        0, 4294967295, 167772161, None, None, None, None, None, None
    ]


def test_cidr_ranges_and_malformed_rules_drop(spark):
    cidrs = spark.createDataFrame(
        [
            ("10.0.0.0/8",), ("10.1.2.3/32",), ("0.0.0.0/0",),
            ("bogus/8",), ("10.0.0.0/33",), ("10.0.0.0",),
        ],
        "cidr string",
    )
    got = {
        r["cidr"]: (r["lo"], r["hi"])
        for r in cidr_ranges(cidrs).collect()
    }
    assert got == {
        "10.0.0.0/8": (167772160, 184549375),
        "10.1.2.3/32": (167838211, 167838211),
        "0.0.0.0/0": (0, 4294967295),
    }
    # base bits below the prefix are masked off
    one = cidr_ranges(
        spark.createDataFrame([("10.7.7.7/16",)], "cidr string")
    ).first()
    assert (one["lo"], one["hi"]) == (
        167772160 + 7 * 65536,
        167772160 + 7 * 65536 + 65535,
    )


def test_longest_prefix_wins_and_unmatched_null(spark):
    ips = spark.createDataFrame(
        [(1, "10.5.9.9"), (2, "10.9.9.9"), (3, "11.0.0.1"), (4, "bad")],
        "id long, ip string",
    )
    cidrs = spark.createDataFrame(
        [("10.0.0.0/8",), ("10.5.0.0/16",)], "cidr string"
    )
    got = {
        r["id"]: r["matched_cidr"]
        for r in attach_cidr_match(ips, "ip", cidrs).collect()
    }
    assert got == {
        1: "10.5.0.0/16", 2: "10.0.0.0/8", 3: None, 4: None
    }


def test_filter_blocked_and_corpus_stays_broadcast(spark):
    ips = spark.createDataFrame(
        [(i, f"10.0.0.{i}") for i in range(5)]
        + [(9, "9.9.9.9")],
        "id long, ip string",
    )
    cidrs = spark.createDataFrame([("10.0.0.0/24",)], "cidr string")
    kept = filter_blocked_ips(ips, "ip", cidrs)
    assert [r["id"] for r in kept.collect()] == [9]
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    import re

    assert not re.search(r"SortMergeJoin \[__b16", plan)


def test_wide_prefix_expansion_covers_all_buckets(spark):
    # a /14 spans 4 /16 buckets; IPs across them all match
    cidrs = spark.createDataFrame([("172.16.0.0/14",)], "cidr string")
    ips = spark.createDataFrame(
        [(i, f"172.{16 + i}.5.5") for i in range(4)]
        + [(99, "172.20.0.1")],  # first bucket outside the /14
        "id long, ip string",
    )
    got = {
        r["id"]: r["matched_cidr"]
        for r in attach_cidr_match(ips, "ip", cidrs).collect()
    }
    assert got == {
        0: "172.16.0.0/14",
        1: "172.16.0.0/14",
        2: "172.16.0.0/14",
        3: "172.16.0.0/14",
        99: None,
    }
