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

from pyspark.sql import Column, DataFrame, Window
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
    query, fragment. One regexp_extract per part — map-only.

    IP-literal authorities (``[::1]:8080``) parse per RFC 3986 §3.2.2:
    the bracketed literal is the host (brackets kept — they are part
    of the authority spelling) and the port is whatever follows the
    closing bracket. The query is anchored AFTER authority+path so a
    '?' inside the fragment (``/p#a?b=1``) is never parsed as a query.
    """
    u = F.col(url) if isinstance(url, str) else url
    auth = F.regexp_extract(u, _AUTH, 1)
    # host: optional userinfo, then EITHER a bracketed IP-literal
    # (opaque — ':' inside the brackets is not a port separator) or
    # everything up to the first ':'. Alternation order matters and is
    # leftmost-first in both java.util.regex and RE2.
    host = F.regexp_extract(auth, r"^(?:[^@]*@)?(\[[^\]]*\]|[^:]*)", 1)
    return {
        "scheme": F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://", 1),
        "host": host,
        # ':digits' at end-of-authority — a ':' inside '[...]' never
        # ends the authority with digits, so this stays correct for
        # bracketed literals with and without an explicit port.
        "port": F.regexp_extract(auth, r":([0-9]+)$", 1),
        "path": F.regexp_extract(u, _AUTH + r"(/[^?#]*)", 2),
        "query": F.regexp_extract(u, _AUTH + r"[^?#]*\?([^#]*)", 2),
        "fragment": F.regexp_extract(u, r"#(.*)$", 1),
    }


def canonical_host(host: Column | str) -> Column:
    """Canonical form of a hostname for dedup/grouping keys: lowercase
    plus at most ONE trailing dot stripped (``Example.COM.`` →
    ``example.com`` — the DNS root dot names the same zone, so the
    merge is safe; a bracketed IP-literal never ends in '.', so it
    passes through untouched)."""
    h = F.col(host) if isinstance(host, str) else host
    return F.regexp_replace(F.lower(h), r"\.$", "")


def _is_ip_literal(h: Column) -> Column:
    """True for hosts that are IP addresses, not DNS names: bracketed
    IPv6/IPvFuture literals and dotted-quad IPv4. DNS-label arithmetic
    (registered domains) is meaningless for these."""
    return h.rlike(r"^\[") | h.rlike(r"^[0-9]{1,3}(\.[0-9]{1,3}){3}$")


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
    host = canonical_host(p["host"])
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
    """Registrable domain of a (lowercased, trailing-dot-normalized)
    hostname: the last two labels, or three when the two-label tail is
    a multi-part public suffix (co.uk, com.au, ...). Hosts with one
    label (localhost, intranet names) and IP literals (dotted-quad
    IPv4, bracketed IPv6) pass through unchanged — an address has no
    DNS labels, so pooling ``93.184.216.34`` with ``5.6.216.34`` under
    a fake domain '216.34' would merge unrelated servers into one
    blocklist/cap unit. Pure array arithmetic on the split — map-only,
    no lookup table shuffle. For full public-suffix-list semantics use
    :func:`attach_registered_domain` with a PSL DataFrame."""
    h = canonical_host(host)
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
        F.when(_is_ip_literal(h) | (n <= 1), h)
        .when((n >= 3) & is_multi, last3)
        .otherwise(last2)
    )


def load_psl(spark, path: str) -> DataFrame:
    """Load a public-suffix list in the publicsuffix.org FILE FORMAT
    (one rule per line; ``//`` comments and blank lines ignored —
    _psl_rules drops them again defensively; rules end at the first
    whitespace per the spec, so trailing annotations are safe). Feed
    the result to :func:`attach_registered_domain` / ``psl=`` params.
    The file is rule-table-sized (~240 KB upstream) — one driver-side
    text read, broadcast at join time."""
    lines = spark.read.text(path)
    rule = F.element_at(
        F.split(F.trim(F.col("value")), r"\s+", -1), 1
    )
    return lines.select(rule.alias("rule")).where(
        (F.col("rule") != "") & ~F.col("rule").startswith("//")
    )


def _psl_rules(psl: DataFrame) -> DataFrame:
    """Normalize a public-suffix-list DataFrame (one column ``rule``:
    ``co.uk``, ``*.ck``, ``!www.ck``, ``github.io``, comments/blank
    rows ignored) into one prevailing row per join key:

    - key          — the equi-join key: the rule's labels with any
                     ``*.``/``!`` prefix stripped (a wildcard matches
                     any host whose k-label tail equals its X part).
    - rule_labels  — the PSL label count used to pick the prevailing
                     rule (wildcard's ``*`` counts as a label).
    - pub_labels   — labels in the public suffix when this rule
                     prevails (exception: one less than its key).
    - min_n        — host label count required for the rule to apply.

    Two raw rules can share a key (``ck`` + ``*.ck``; ``www.ck`` +
    ``!www.ck``); the groupBy keeps the prevailing one (exception
    first, then most labels) — host-side min_n gating makes the
    collapse lossless (see test_weburl PSL cases). The PSL is a rule
    table (~10k rows) — broadcast-sized by construction."""
    r = F.trim(F.col("rule"))
    is_exc = r.startswith("!")
    is_wild = r.startswith("*.")
    key = F.when(is_exc, F.substring(r, 2, 2**30)).when(
        is_wild, F.substring(r, 3, 2**30)
    ).otherwise(r)
    key = F.lower(key)
    k_labels = F.size(F.split(key, r"\.", -1))
    return (
        psl.where((r != "") & ~r.startswith("//"))
        .select(
            key.alias("key"),
            F.when(is_wild, k_labels + 1).otherwise(k_labels).alias(
                "rule_labels"
            ),
            F.when(is_exc, k_labels - 1)
            .when(is_wild, k_labels + 1)
            .otherwise(k_labels)
            .alias("pub_labels"),
            F.when(is_exc, k_labels)
            .when(is_wild, k_labels + 1)
            .otherwise(k_labels)
            .alias("min_n"),
            is_exc.cast("int").alias("is_exc"),
        )
        .groupBy("key")
        .agg(
            F.max(
                F.struct("is_exc", "rule_labels", "pub_labels", "min_n")
            ).alias("r")
        )
        .select("key", "r.rule_labels", "r.pub_labels", "r.min_n", "r.is_exc")
    )


def attach_registered_domain(
    df: DataFrame,
    host_col: str = "host",
    psl: DataFrame | None = None,
    out_col: str = "domain",
) -> DataFrame:
    """df + ``out_col`` = registered (registrable) domain of
    ``host_col``. With ``psl=None`` this is the map-only hardcoded-
    slice Column path (:func:`registered_domain`). With a PSL
    DataFrame it implements the full public-suffix algorithm
    (https://publicsuffix.org/list/ — longest rule wins, exception
    rules beat wildcards) WITHOUT shuffling the corpus:

    - one bounded metadata action reads the deepest rule key K from
      the PSL (rule-table-sized — the codebook-collect discipline);
    - the host's k-label tails (k = 1..K) each LEFT-broadcast-join the
      prevailing-rule table — K BroadcastHashJoins, zero Exchange on
      the corpus side;
    - the prevailing match is picked per-row with array arithmetic
      (max over (is_exc, rule_labels), gated on min_n), default rule
      ``*`` (pub = last label) when nothing matches.

    Hosts that are public suffixes themselves (``github.io`` with a
    ``github.io`` rule) have no registrable domain and pass through
    unchanged, as do IP literals and single-label hosts."""
    if psl is None:
        return df.withColumn(out_col, registered_domain(host_col))

    rules = _psl_rules(psl)
    depth = rules.agg(
        F.max(F.size(F.split("key", r"\.", -1)))
    ).first()[0]
    if depth is None:  # empty PSL — default rule only
        depth = 0

    h = canonical_host(F.col(host_col))
    labels = F.split(h, r"\.", -1)
    n = F.size(labels)
    out = df.withColumns({"__rd_h": h, "__rd_n": n})

    cand_cols: list[str] = []
    for k in range(1, depth + 1):
        sfx = F.when(
            F.col("__rd_n") >= k,
            F.concat_ws(
                ".",
                F.slice(
                    F.split("__rd_h", r"\.", -1),
                    F.col("__rd_n") - F.lit(k) + 1,
                    F.lit(k),
                ),
            ),
        )
        rk = rules.where(F.size(F.split("key", r"\.", -1)) == k).select(
            F.col("key").alias(f"__rd_key{k}"),
            F.col("is_exc").alias(f"__rd_exc{k}"),
            F.col("rule_labels").alias(f"__rd_rl{k}"),
            F.col("pub_labels").alias(f"__rd_pub{k}"),
            F.col("min_n").alias(f"__rd_minn{k}"),
        )
        out = out.withColumn(f"__rd_sfx{k}", sfx).join(
            F.broadcast(rk),
            F.col(f"__rd_sfx{k}") == F.col(f"__rd_key{k}"),
            "left",
        )
        cand_cols.append(str(k))

    # prevailing rule: exceptions first, then most labels; a rule only
    # applies when the host has at least min_n labels.
    cands = F.filter(
        F.array(
            *[
                F.struct(
                    F.col(f"__rd_exc{k}").alias("exc"),
                    F.col(f"__rd_rl{k}").alias("rl"),
                    F.col(f"__rd_pub{k}").alias("pub"),
                    F.col(f"__rd_minn{k}").alias("minn"),
                )
                for k in cand_cols
            ]
        ),
        lambda c: c["exc"].isNotNull() & (F.col("__rd_n") >= c["minn"]),
    )
    pub = F.when(F.size(cands) > 0, F.array_max(cands)["pub"]).otherwise(
        F.lit(1)
    )
    nn = F.col("__rd_n")
    hh = F.col("__rd_h")
    reg = F.when(
        _is_ip_literal(hh) | (nn <= pub),
        hh,
    ).otherwise(
        F.concat_ws(
            ".",
            F.slice(F.split(hh, r"\.", -1), nn - pub, pub + F.lit(1)),
        )
    )
    drop = ["__rd_h", "__rd_n"] + [
        c
        for k in cand_cols
        for c in (
            f"__rd_sfx{k}",
            f"__rd_key{k}",
            f"__rd_exc{k}",
            f"__rd_rl{k}",
            f"__rd_pub{k}",
            f"__rd_minn{k}",
        )
    ]
    return out.withColumn(out_col, reg).drop(*drop)


def attach_url_columns(
    df: DataFrame, url_col: str = "url", psl: DataFrame | None = None
) -> DataFrame:
    """df + (url_norm, host, domain) — the three keys the curation
    tier groups, joins and filters on. One map-only projection with
    the hardcoded suffix slice; with ``psl`` the domain comes from the
    full public-suffix algorithm (broadcast joins, still zero corpus
    shuffle — see :func:`attach_registered_domain`)."""
    p = url_parts(url_col)
    out = df.withColumns(
        {
            "url_norm": normalize_url(url_col),
            "host": canonical_host(p["host"]),
        }
    )
    return attach_registered_domain(out, "host", psl=psl, out_col="domain")


def domain_stats(
    df: DataFrame, url_col: str = "url", psl: DataFrame | None = None
) -> DataFrame:
    """(domain, n_docs, n_urls, n_hosts) — the per-domain curation
    panel: raw row pressure vs distinct canonical resources vs host
    fan-out. One aggregation keyed on the registered domain; the
    distinct counts partial-aggregate map-side. At web scale the
    domain key is skewed by construction (that is the finding) — the
    counts are all partial-aggregable, so hot domains cost partials,
    not a single-reducer funnel."""
    with_cols = attach_url_columns(df, url_col, psl=psl)
    return (
        with_cols.groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("url_norm").alias("n_urls"),
            F.countDistinct("host").alias("n_hosts"),
        )
    )


def cap_per_domain(
    df: DataFrame,
    url_col: str = "url",
    cap: int = 100,
    id_col: str = "doc_id",
    order_col: str | None = None,
    salt: str = "domcap",
    bucket_hex_chars: int = 2,
    psl: DataFrame | None = None,
) -> DataFrame:
    """At most ``cap`` rows per registered domain (the RefinedWeb-style
    curation step that stops one crawl-heavy domain from dominating
    the corpus). The kept set is deterministic: the ``cap`` smallest
    ``(order_col, md5(id‖salt), id)`` rows per domain — with the
    default ``order_col=None`` that is a portable uniform hash draw
    (the splits.py discipline), repartition-stable and
    oracle-checkable.

    Per-domain top-cap WITHOUT a domain-sized single-task sort (a
    10⁸-doc domain is one window partition in the naive form): stage 1
    ranks within (domain, hash-prefix sub-bucket) so tasks sort
    ~n/256 rows; survivors are ≤ 256·cap per domain; stage 2 re-ranks
    those to the exact per-domain top-cap. Any global top-cap row is
    also in its sub-bucket's top-cap, so the two-level result equals
    the one-level one (the cluster_balanced_sample argument,
    clustering.py:308 — asserted in tests)."""
    tagged = attach_registered_domain(
        df.withColumn(
            "__cap_host", canonical_host(url_parts(url_col)["host"])
        ),
        "__cap_host",
        psl=psl,
        out_col="__cap_dom",
    )
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    staged = tagged.withColumn("__cap_h", h).withColumn(
        "__cap_b", F.substring("__cap_h", 1, bucket_hex_chars)
    )
    order = (
        [F.col(order_col), F.col("__cap_h"), F.col(id_col)]
        if order_col is not None
        else [F.col("__cap_h"), F.col(id_col)]
    )
    w1 = Window.partitionBy("__cap_dom", "__cap_b").orderBy(*order)
    survivors = staged.withColumn(
        "__cap_rn1", F.row_number().over(w1)
    ).filter(F.col("__cap_rn1") <= cap)
    w2 = Window.partitionBy("__cap_dom").orderBy(*order)
    return (
        survivors.withColumn("__cap_rn", F.row_number().over(w2))
        .filter(F.col("__cap_rn") <= cap)
        .withColumn("domain", F.col("__cap_dom"))
        .drop("__cap_host", "__cap_dom", "__cap_h", "__cap_b", "__cap_rn1", "__cap_rn")
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
