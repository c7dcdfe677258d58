"""IPv4 / CIDR utilities for crawl curation (X72).

Crawl pipelines filter by network, not just by name: datacenter /
VPN / known-abuse ranges arrive as CIDR blocklists ("10.0.0.0/8",
"203.0.113.0/24"), and the server IP rides next to the URL in crawl
metadata. This tier does the address arithmetic JVM-side:

- :func:`ipv4_to_long` — dotted quad -> uint32 as BIGINT (strictly
  validated; anything malformed -> NULL, never a wrong number).
- :func:`cidr_ranges` — CIDR strings -> (cidr, lo, hi) rows.
- :func:`attach_cidr_match` — tag each row with the matching CIDR
  (longest prefix wins) via a PREFIX-BUCKETED equi-join: every CIDR
  expands to the /16 prefixes it covers, the corpus joins on its
  ip/16 bucket, and a range check finishes the match — an equi-join
  a 100 TB corpus can shuffle (or broadcast, for blocklist-sized
  tables), never a full interval cross join.
- :func:`filter_blocked_ips` — drop matching rows (anti-join form).

Prefixes shorter than /16 fan out (a /8 becomes 256 bucket rows) —
blocklists are rule-table-sized, so the expansion stays broadcast-
sized; the corpus side is one map-only bucket projection.

Reference: Flaconi/bi_utils has no network tier (north-star surface,
same as X57-X71).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OCTET = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
_IPV4_RE = rf"^{_OCTET}\.{_OCTET}\.{_OCTET}\.{_OCTET}$"


def ipv4_to_long(col: Column | str) -> Column:
    """Dotted-quad IPv4 -> BIGINT in [0, 2^32). Strict: octets must
    be 0-255 with no signs/spaces/extra labels; invalid -> NULL."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, r"\.", -1)
    num = (
        F.element_at(parts, 1).cast("long") * F.lit(16777216)
        + F.element_at(parts, 2).cast("long") * F.lit(65536)
        + F.element_at(parts, 3).cast("long") * F.lit(256)
        + F.element_at(parts, 4).cast("long")
    )
    return F.when(c.rlike(_IPV4_RE), num)


def cidr_ranges(
    cidrs: DataFrame, cidr_col: str = "cidr"
) -> DataFrame:
    """CIDR strings -> (cidr, prefix_len, lo, hi). Malformed rows
    (bad address, prefix outside 0-32) drop with no match ever
    produced — a blocklist typo must not silently match traffic."""
    c = F.col(cidr_col)
    addr = F.regexp_extract(c, r"^([^/]+)/", 1)
    plen = F.regexp_extract(c, r"/([0-9]{1,2})$", 1)
    base = ipv4_to_long(addr)
    p = plen.cast("int")
    # Column-valued shift count needs the SQL form (the Python
    # shiftleft binding takes only a literal int)
    span = F.expr("shiftleft(CAST(1 AS BIGINT), 32 - __p)")
    out = (
        cidrs.select(
            c.alias("cidr"), base.alias("__b"), p.alias("__p")
        )
        .where(
            F.col("__b").isNotNull()
            & F.col("__p").isNotNull()
            & (F.col("__p") >= 0)
            & (F.col("__p") <= 32)
        )
        .select(
            "cidr",
            F.col("__p").alias("prefix_len"),
            (F.col("__b") - F.pmod(F.col("__b"), span)).alias("lo"),
            (
                F.col("__b") - F.pmod(F.col("__b"), span) + span - 1
            ).alias("hi"),
        )
    )
    return out


def _expand_to_prefix16(ranges: DataFrame) -> DataFrame:
    """One row per /16 bucket a range covers: (bucket16, cidr,
    prefix_len, lo, hi). A /16-or-longer prefix covers exactly one
    bucket; a /8 covers 256 — fan-out bounded by the RULE table."""
    return ranges.select(
        F.explode(
            F.sequence(
                F.shiftright("lo", 16), F.shiftright("hi", 16)
            )
        ).alias("bucket16"),
        "cidr",
        "prefix_len",
        "lo",
        "hi",
    )


def attach_cidr_match(
    df: DataFrame,
    ip_col: str,
    cidrs: DataFrame,
    cidr_col: str = "cidr",
    out_col: str = "matched_cidr",
) -> DataFrame:
    """Tag each row with the longest-prefix CIDR containing its IP
    (NULL when unmatched or the IP is malformed). The rule table
    packs to ONE row per /16 bucket (array of (lo, hi, prefix_len,
    cidr) structs), broadcasts, equi-joins the corpus on its ip/16
    bucket, and a per-row HOF fold picks the longest-prefix match —
    the robots.py decision shape: no groupBy, no row ids, the corpus
    never shuffles."""
    packed = F.broadcast(
        _expand_to_prefix16(cidr_ranges(cidrs, cidr_col))
        .groupBy("bucket16")
        .agg(
            F.collect_list(
                F.struct("lo", "hi", "prefix_len", "cidr")
            ).alias("__rules")
        )
    )
    probe = df.withColumn("__ip", ipv4_to_long(ip_col)).withColumn(
        "__b16", F.shiftright("__ip", 16)
    )
    joined = probe.join(
        packed, probe["__b16"] == packed["bucket16"], "left"
    )
    best = F.aggregate(
        F.filter(
            F.coalesce(
                F.col("__rules"),
                F.array().cast(
                    "array<struct<lo:bigint,hi:bigint,"
                    "prefix_len:int,cidr:string>>"
                ),
            ),
            lambda r: (F.col("__ip") >= r["lo"])
            & (F.col("__ip") <= r["hi"]),
        ),
        F.lit(None).cast("struct<prefix_len:int,cidr:string>"),
        lambda acc, r: F.when(
            acc.isNull() | (r["prefix_len"] > acc["prefix_len"]),
            F.struct(
                r["prefix_len"].alias("prefix_len"),
                r["cidr"].alias("cidr"),
            ),
        ).otherwise(acc),
    )
    return (
        joined.withColumn(out_col, best["cidr"])
        .drop("__rules", "bucket16", "__ip", "__b16")
    )


def filter_blocked_ips(
    df: DataFrame,
    ip_col: str,
    cidrs: DataFrame,
    cidr_col: str = "cidr",
) -> DataFrame:
    """Drop rows whose IP falls in any blocklist CIDR. Same bucketed
    plan with the match consumed by a null filter."""
    return (
        attach_cidr_match(df, ip_col, cidrs, cidr_col, "__blk")
        .where(F.col("__blk").isNull())
        .drop("__blk")
    )
