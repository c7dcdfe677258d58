"""URL / domain operators for web-corpus curation (X57).

Web-scale training corpora (CCNet, RefinedWeb, C4) are keyed by URL:
normalization collapses crawl-duplicate URLs (scheme/host case,
default ports, fragments, tracking params), the registered domain is
the unit of reputation (blocklists, per-domain caps, domain mixing),
and domain-level stats drive curation decisions. Everything here is
Column expressions — regexp_extract and array HOFs, JVM-side, zero
Python — so the tier is map-only until the one stats aggregation.

Patterns stay in the RE2-compatible subset (no backrefs, no
lookaround) so the same semantics are expressible in the DuckDB
oracles — the repo-wide cross-engine regex discipline.

Reference: Flaconi/bi_utils has no web tier (north-star surface,
same as X42-X56); the semantics follow RFC 3986 component grammar
and the public-suffix convention for registered domains.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# authority = everything between "scheme://" and the first /?#
_AUTH = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)"

# Multi-label public suffixes whose registered domain takes THREE
# labels (a pragmatic top slice of the public-suffix list — the full
# list is a data file a production deployment broadcasts instead).
_MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
)

# Query parameters that identify the click, not the resource.
_TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid)=.*"


def url_parts(url: Column | str) -> dict[str, Column]:
    """RFC-3986 component split of a URL column: scheme, host (case
    preserved, userinfo stripped), port (string, '' if absent), path,
    query, fragment. One regexp_extract per part — map-only."""
    u = F.col(url) if isinstance(url, str) else url
    auth = F.regexp_extract(u, _AUTH, 1)
    return {
        "scheme": F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://", 1),
        "host": F.regexp_extract(auth, r"^(?:[^@]*@)?([^:]*)", 1),
        "port": F.regexp_extract(auth, r":([0-9]+)$", 1),
        "path": F.regexp_extract(u, _AUTH + r"(/[^?#]*)", 2),
        "query": F.regexp_extract(u, r"\?([^#]*)", 1),
        "fragment": F.regexp_extract(u, r"#(.*)$", 1),
    }


def normalize_url(url: Column | str) -> Column:
    """Canonical URL for crawl dedup: lowercase scheme+host, strip
    userinfo-less default ports (80 for http, 443 for https), drop
    the fragment, drop tracking query params (utm_*/gclid/fbclid/...),
    sort surviving params bytewise, default the empty path to '/'.
    Everything else (path case, non-default ports, param values) is
    preserved — normalization must never merge distinct resources.
    """
    p = url_parts(url)
    scheme = F.lower(p["scheme"])
    host = F.lower(p["host"])
    default = (
        ((scheme == "http") & (p["port"] == "80"))
        | ((scheme == "https") & (p["port"] == "443"))
        | (p["port"] == "")
    )
    port = F.when(default, F.lit("")).otherwise(F.concat(F.lit(":"), p["port"]))
    path = F.when(p["path"] == "", F.lit("/")).otherwise(p["path"])
    kept = F.array_sort(
        F.filter(
            F.split(p["query"], "&", -1),
            lambda s: (s != "") & ~s.rlike(_TRACKING_PARAM_RE),
        )
    )
    query = F.when(
        F.size(kept) > 0,
        F.concat(F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port, path, query)


def registered_domain(host: Column | str) -> Column:
    """Registrable domain of a (lowercased) hostname: the last two
    labels, or three when the two-label tail is a multi-part public
    suffix (co.uk, com.au, ...). Hosts with one label (localhost,
    intranet names) pass through unchanged. Pure array arithmetic on
    the split — map-only, no lookup table shuffle."""
    h = F.lower(F.col(host) if isinstance(host, str) else host)
    labels = F.split(h, r"\.", -1)
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    is_multi = last2.isin(*_MULTI_SUFFIXES)
    return (
        F.when(n <= 1, h)
        .when((n >= 3) & is_multi, last3)
        .otherwise(last2)
    )


def attach_url_columns(
    df: DataFrame, url_col: str = "url"
) -> DataFrame:
    """df + (url_norm, host, domain) — the three keys the curation
    tier groups, joins and filters on. One map-only projection."""
    p = url_parts(url_col)
    return df.withColumns(
        {
            "url_norm": normalize_url(url_col),
            "host": F.lower(p["host"]),
            "domain": registered_domain(p["host"]),
        }
    )


def domain_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(domain, n_docs, n_urls, n_hosts) — the per-domain curation
    panel: raw row pressure vs distinct canonical resources vs host
    fan-out. One aggregation keyed on the registered domain; the
    distinct counts partial-aggregate map-side. At web scale the
    domain key is skewed by construction (that is the finding) — the
    counts are all partial-aggregable, so hot domains cost partials,
    not a single-reducer funnel."""
    with_cols = attach_url_columns(df, url_col)
    return (
        with_cols.groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("url_norm").alias("n_urls"),
            F.countDistinct("host").alias("n_hosts"),
        )
    )


def filter_blocked_domains(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Drop rows whose registered domain appears in ``blocklist``
    (one column: domain). Blocklists are tiny next to the corpus —
    broadcast anti-join, zero corpus shuffle."""
    dom = registered_domain(url_parts(url_col)["host"]).alias("__dom")
    tagged = df.withColumn("__dom", dom)
    bl = blocklist.select(F.lower(F.col("domain")).alias("__dom")).distinct()
    return (
        tagged.join(F.broadcast(bl), "__dom", "left_anti").drop("__dom")
    )
