"""robots.txt compliance tier for web-corpus curation (X60).

Responsible crawl-derived corpora (Common Crawl post-processing, C4,
RefinedWeb) honor robots exclusion: a page whose host's robots.txt
disallows the fetching agent must not enter the training set, even
when the WARC payload exists. This module parses a corpus of robots
files into a rule table and evaluates RFC 9309 allow/disallow
decisions for a URL corpus:

- :func:`parse_robots` — robots.txt text -> (host, agent, rule, path)
  rows. Grouping per RFC 9309 §2.1: consecutive ``User-agent`` lines
  open a group; ``Allow``/``Disallow`` lines attach to every agent of
  the most recent group. Windows are partitioned by host and bounded
  by the FILE's line count (robots files are KB-sized), never by the
  corpus.
- :func:`robots_decisions` / :func:`filter_robots_allowed` — RFC 9309
  §2.2.2 evaluation: the applicable group is the agent's own if one
  exists else ``*``; among matching rules the LONGEST path spec wins,
  ties break toward ``allow``; no group or no match -> allowed.
  Patterns support the de-facto ``*`` wildcard and ``$`` end anchor
  (RFC 9309 §2.2.3).

Scale shape: the rule table is packed to ONE row per host (arrays of
rule structs — robots files are bounded, so the row is), the corpus
joins it on the host equi-key (broadcast when small, AQE skew-join
otherwise), and the decision is an aggregate HOF over the packed
array — map-side after the join, no per-URL groupBy, no corpus
re-shuffle. Patterns are compiled to anchored regexes once per RULE
at pack time, not per URL.

Reference: Flaconi/bi_utils has no web tier (north-star surface, same
as X57-X59); semantics follow RFC 9309 and the Google robots.txt
parser's documented behavior.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bi_utils_spark.operators.weburl import url_parts, canonical_host

_RULE_KEYS = ("user-agent", "allow", "disallow")


def parse_robots(
    df: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """Parse a corpus of robots.txt files into one row per
    (host, agent, rule, path).

    Lines are split on CR/LF, ``#`` comments stripped, keys
    lowercased. Only ``user-agent`` / ``allow`` / ``disallow`` lines
    participate in grouping (unknown keys like ``crawl-delay`` or
    ``sitemap`` are ignored per RFC 9309 §2.2.4's
    must-ignore-unrecognized rule). Empty-path rules match nothing
    (RFC 9309 §2.2.2: an empty pattern matches no path) and are
    dropped. Agents are lowercased product tokens; paths keep case
    (URL paths are case-sensitive).

    Both windows are partitioned by host — state per task is one
    robots FILE, never the corpus.
    """
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), r"\r?\n", -1)).alias(
            "pos", "line"
        ),
    ).select(
        "host",
        "pos",
        F.trim(F.regexp_replace("line", r"#.*$", "")).alias("line"),
    )
    kv = lines.select(
        "host",
        "pos",
        F.lower(F.regexp_extract("line", r"^([A-Za-z\-]+)\s*:", 1)).alias(
            "key"
        ),
        F.trim(
            F.regexp_extract("line", r"^[A-Za-z\-]+\s*:\s*(.*)$", 1)
        ).alias("value"),
    ).where(F.col("key").isin(*_RULE_KEYS))

    w = Window.partitionBy("host").orderBy("pos")
    is_ua = F.col("key") == "user-agent"
    # A group opens at a user-agent line NOT preceded by another
    # user-agent line (consecutive UA lines share the group).
    start = is_ua & ~F.coalesce(
        F.lag(is_ua).over(w), F.lit(False)
    )
    grouped = kv.withColumn(
        "group_id",
        F.sum(start.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).where(F.col("group_id") > 0)

    agents = grouped.where(is_ua).select(
        "host",
        "group_id",
        F.lower(F.col("value")).alias("agent"),
    ).distinct()
    rules = grouped.where(~is_ua & (F.col("value") != "")).select(
        "host",
        "group_id",
        F.col("key").alias("rule"),
        F.col("value").alias("path"),
    )
    # agents x rules within a group: both sides are FILE-bounded, so
    # the join fan-out is |agents in group| * |rules in group|.
    return agents.join(rules, ["host", "group_id"]).select(
        "host", "agent", "rule", "path"
    )


def robots_pattern_regex(path: Column | str) -> Column:
    """Anchored Java/RE2 regex equivalent of a robots path pattern:
    metacharacters escaped, ``*`` -> ``.*``, a trailing ``$`` becomes
    the end anchor. Built once per RULE row (pack time), matched many
    times per URL."""
    p = F.col(path) if isinstance(path, str) else path
    anchored = p.endswith("$")
    body = F.when(anchored, p.substr(F.lit(1), F.length(p) - 1)).otherwise(p)
    esc = F.regexp_replace(body, r"([.^$+?(){}\[\]\\|])", r"\\$1")
    wild = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(
        F.lit("^"), wild, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
    )


def pack_robots_rules(rules: DataFrame, user_agent: str) -> DataFrame:
    """Collapse a (host, agent, rule, path) table to ONE row per host
    for the decision join: ``rules`` = array<struct<pattern, spec_len,
    is_allow>> of the APPLICABLE group (the agent's own rules when any
    exist for this host, else the ``*`` group — RFC 9309 §2.2.1).

    The packed row is bounded by the host's robots file size. The
    pattern regex is compiled here, once per rule.
    """
    ua = user_agent.strip().lower()
    mine = F.col("agent") == ua
    star = F.col("agent") == "*"
    compiled = rules.where(mine | star).select(
        "host",
        mine.alias("mine"),
        F.struct(
            robots_pattern_regex("path").alias("pattern"),
            F.length("path").alias("spec_len"),
            (F.col("rule") == "allow").cast("int").alias("is_allow"),
        ).alias("r"),
    )
    return compiled.groupBy("host").agg(
        F.when(
            F.count_if("mine") > 0,
            F.collect_list(F.when(F.col("mine"), F.col("r"))),
        )
        .otherwise(F.collect_list(F.when(~F.col("mine"), F.col("r"))))
        .alias("rules")
    )


def robots_decisions(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    user_agent: str = "*",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Attach an ``allowed`` boolean to every URL row per RFC 9309.

    The corpus side computes (host, path) map-only, equi-joins the
    one-row-per-host packed rule table, and folds the rule array:
    among rules whose pattern matches the path, the longest spec
    wins, ties break toward allow (RFC 9309 §2.2.2). Hosts with no
    rule row, URLs with no matching rule, and empty groups are
    allowed. No groupBy — the decision is a per-row HOF fold.

    ``broadcast_rules`` (default True) ships the packed table to every
    executor so the CORPUS never shuffles — right whenever the crawl's
    robots inventory fits in a broadcast (typical: one bounded row per
    host). Set False for extreme host counts; the plan falls back to
    a host equi-join where AQE absorbs hot-host skew, at the price of
    one corpus shuffle.
    """
    p = url_parts(F.col(url_col))
    path = F.when(p["path"] == "", F.lit("/")).otherwise(p["path"])
    with_host = urls.withColumn(
        "_rb_host", canonical_host(p["host"])
    ).withColumn("_rb_path", path)
    packed = pack_robots_rules(rules, user_agent)
    if broadcast_rules:
        packed = F.broadcast(packed)

    matched = F.filter(
        F.col("rules"),
        lambda r: F.regexp_like(F.col("_rb_path"), r["pattern"]),
    )
    # best = argmax over (spec_len, is_allow); fold keeps it explicit
    # and null-safe (no reliance on struct-ordering of array_max).
    best = F.aggregate(
        matched,
        F.lit(None).cast("struct<spec_len:int,is_allow:int>"),
        lambda acc, r: F.when(
            acc.isNull()
            | (r["spec_len"] > acc["spec_len"])
            | (
                (r["spec_len"] == acc["spec_len"])
                & (r["is_allow"] > acc["is_allow"])
            ),
            F.struct(
                r["spec_len"].alias("spec_len"),
                r["is_allow"].alias("is_allow"),
            ),
        ).otherwise(acc),
    )
    out = with_host.join(
        packed, with_host["_rb_host"] == packed["host"], "left"
    ).withColumn(
        "allowed",
        F.when(F.col("rules").isNull(), F.lit(True)).otherwise(
            F.coalesce(best["is_allow"] == 1, F.lit(True))
        ),
    )
    return out.drop("rules", "host", "_rb_host", "_rb_path")


def filter_robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    user_agent: str = "*",
) -> DataFrame:
    """Keep only URLs the agent may fetch. Same plan as
    :func:`robots_decisions` with the flag consumed by a filter."""
    return (
        robots_decisions(urls, rules, url_col, user_agent)
        .where(F.col("allowed"))
        .drop("allowed")
    )
