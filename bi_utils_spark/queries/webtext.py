"""Web-corpus curation: line/paragraph dedup, URL normalization +
PSL domains, HTML extraction, robots.txt, unicode normalization,
CIDR, PageRank, Gopher rules, sentences, BPE train, sketches."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bi_utils_spark.operators.localrel import local_df
from bi_utils_spark.queries.core import load, register



# ---------------------------------------------------------------------------
# X55: cross-document line dedup (boilerplate removal). The test
# corpus has no newlines, so the fixture synthesizes multi-line
# documents in-plan, closed-form in BOTH engines (the q_jpeg_roundtrip
# discipline): each doc gets n = doc_id%5+3 lines — a rotating member
# of a 7-line shared-header pool (i%3==0), a blank structural line
# (i%4==1), or a doc-unique line. The pool lines recur across ~1/7 of
# the corpus (df >> 5), unique lines have df=1, blanks are exempt by
# contract — so the oracle's expected output exercises removal, keep,
# and blank-preservation paths on every document.
# ---------------------------------------------------------------------------

_MLINES_CTE = """
    WITH d AS (SELECT doc_id, doc_id % 5 + 3 AS n FROM documents),
    ml AS (
      SELECT doc_id, i,
             CASE WHEN i % 3 = 0
                  THEN 'shared header ' || CAST((doc_id + i * 5) % 7 AS VARCHAR)
                  WHEN i % 4 = 1 THEN ''
                  ELSE 'unique ' || CAST(doc_id AS VARCHAR)
                       || ' line ' || CAST(i AS VARCHAR)
             END AS line
      FROM (SELECT doc_id, n, UNNEST(range(0, n)) AS i FROM d)
    )
"""


def _multiline_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark half of _MLINES_CTE — one codegen projection."""
    docs = load(spark, sf_dir, "documents").select("doc_id")

    def line(i):
        return (
            F.when(
                i % 3 == 0,
                F.concat(
                    F.lit("shared header "),
                    ((F.col("doc_id") + i * 5) % 7).cast("string"),
                ),
            )
            .when(i % 4 == 1, F.lit(""))
            .otherwise(
                F.concat(
                    F.lit("unique "),
                    F.col("doc_id").cast("string"),
                    F.lit(" line "),
                    i.cast("string"),
                )
            )
        )

    return docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(F.lit(0).cast("long"), F.col("doc_id") % 5 + 2),
                line,
            ),
            "\n",
        ).alias("text"),
    )


@register(
    "q_boilerplate_lines",
    _MLINES_CTE
    + """
    SELECT line, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
    FROM ml WHERE trim(line) <> ''
    GROUP BY line HAVING count(DISTINCT doc_id) >= 5
    ORDER BY df DESC, line
    """,
)
def q_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate inventory: non-blank lines recurring in >= 5
    distinct documents, worst offenders first (X55 report half)."""
    from bi_utils_spark.operators.dedup import line_doc_freq

    return line_doc_freq(_multiline_docs(spark, sf_dir), min_df=5)


@register(
    "q_line_dedup",
    _MLINES_CTE
    + """
    , f AS (
      SELECT line FROM ml WHERE trim(line) <> ''
      GROUP BY line HAVING count(DISTINCT doc_id) >= 5
    )
    SELECT ml.doc_id,
           coalesce(array_to_string(
             list(ml.line ORDER BY ml.i) FILTER (WHERE f.line IS NULL),
             chr(10)), '') AS text_cleaned,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN f.line IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_removed
    FROM ml LEFT JOIN f ON ml.line = f.line
    GROUP BY ml.doc_id
    """,
)
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style line-level boilerplate removal, full-row
    oracle: every document's reconstructed text (shared-header lines
    deleted, blank + unique lines kept in order) plus removal counts
    (X55 removal half)."""
    from bi_utils_spark.operators.dedup import remove_boilerplate_lines

    return remove_boilerplate_lines(_multiline_docs(spark, sf_dir), min_df=5)


# ---------------------------------------------------------------------------
# X57: URL / domain curation tier. The corpus has no URL column, so
# the fixture synthesizes one in-plan from doc_id, closed-form in
# both engines (the X55 discipline), deliberately covering every
# normalization branch: mixed-case scheme/host, default vs non-default
# vs scheme-mismatched ports, empty paths, tracking-only and mixed
# query strings, fragments (including '?' INSIDE a fragment, which
# must not parse as a query), multi-label public suffixes, bracketed
# IPv6 authorities (with and without ports), dotted-quad IPv4 hosts,
# and trailing-dot FQDNs (r6 — the r5 wrong-answer classes). The
# oracle derives the expected canonical form from the CONSTRUCTION
# parts — an independent derivation, not a re-parse — so a parser
# that mishandles any component cannot hash-match.
# ---------------------------------------------------------------------------

_URLS_CTE = """
    WITH u AS (
      SELECT doc_id,
        CASE WHEN doc_id % 4 = 0 THEN 'HTTPS'
             WHEN doc_id % 4 = 1 THEN 'https' ELSE 'http' END AS scheme,
        CASE doc_id % 8 WHEN 0 THEN 'Example.COM'
                        WHEN 1 THEN 'news.Example.co.uk'
                        WHEN 2 THEN 'cdn.site.org'
                        WHEN 3 THEN 'sub.blog.example.com'
                        WHEN 4 THEN 'shop.example.com'
                        WHEN 5 THEN '[2001:DB8::1]'
                        WHEN 6 THEN '93.184.216.34'
                        ELSE 'www.Example.co.uk.' END AS host,
        CASE WHEN doc_id % 7 = 0 THEN ':443'
             WHEN doc_id % 11 = 0 THEN ':8080' ELSE '' END AS port,
        CASE WHEN doc_id % 13 = 0 THEN ''
             ELSE '/p/' || CAST(doc_id % 13 AS VARCHAR) END AS path,
        CASE WHEN doc_id % 2 = 0
             THEN '?utm_source=x&b=' || CAST(doc_id % 3 AS VARCHAR) || '&a=1'
             WHEN doc_id % 9 = 0 THEN '?gclid=abc' ELSE '' END AS query,
        CASE WHEN doc_id % 3 = 0
             THEN '#sec' || CAST(doc_id % 2 AS VARCHAR)
             WHEN doc_id % 5 = 1 THEN '#a?b=1' ELSE '' END AS frag
      FROM documents
    ),
    norm AS (
      SELECT doc_id,
        scheme || '://' || host || port || path || query || frag AS url,
        lower(scheme) || '://'
          || regexp_replace(lower(host), '\\.$', '')
          || CASE WHEN port = ':443' AND lower(scheme) = 'https'
                  THEN '' ELSE port END
          || CASE WHEN path = '' THEN '/' ELSE path END
          || CASE WHEN query LIKE '?utm%'
                  THEN '?a=1&b=' || CAST(doc_id % 3 AS VARCHAR)
                  ELSE '' END AS url_norm,
        regexp_replace(lower(host), '\\.$', '') AS host,
        CASE doc_id % 8 WHEN 0 THEN 'example.com'
                        WHEN 1 THEN 'example.co.uk'
                        WHEN 2 THEN 'site.org'
                        WHEN 3 THEN 'example.com'
                        WHEN 4 THEN 'example.com'
                        WHEN 5 THEN '[2001:db8::1]'
                        WHEN 6 THEN '93.184.216.34'
                        ELSE 'example.co.uk' END AS domain
      FROM u
    )
"""


def _url_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark half of _URLS_CTE's `u` — one codegen projection
    building the raw (pre-normalization) URL string."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    return docs.select("doc_id", _url_col().alias("url"))


def _url_col() -> "Column":
    """The raw-URL construction as a bare Column over doc_id (shared
    by _url_docs and the composed q_web_pipeline fixture)."""
    d = F.col("doc_id")
    scheme = (
        F.when(d % 4 == 0, F.lit("HTTPS"))
        .when(d % 4 == 1, F.lit("https"))
        .otherwise(F.lit("http"))
    )
    host = (
        F.when(d % 8 == 0, F.lit("Example.COM"))
        .when(d % 8 == 1, F.lit("news.Example.co.uk"))
        .when(d % 8 == 2, F.lit("cdn.site.org"))
        .when(d % 8 == 3, F.lit("sub.blog.example.com"))
        .when(d % 8 == 4, F.lit("shop.example.com"))
        .when(d % 8 == 5, F.lit("[2001:DB8::1]"))
        .when(d % 8 == 6, F.lit("93.184.216.34"))
        .otherwise(F.lit("www.Example.co.uk."))
    )
    port = (
        F.when(d % 7 == 0, F.lit(":443"))
        .when(d % 11 == 0, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path = F.when(d % 13 == 0, F.lit("")).otherwise(
        F.concat(F.lit("/p/"), (d % 13).cast("string"))
    )
    query = (
        F.when(
            d % 2 == 0,
            F.concat(
                F.lit("?utm_source=x&b="),
                (d % 3).cast("string"),
                F.lit("&a=1"),
            ),
        )
        .when(d % 9 == 0, F.lit("?gclid=abc"))
        .otherwise(F.lit(""))
    )
    frag = (
        F.when(d % 3 == 0, F.concat(F.lit("#sec"), (d % 2).cast("string")))
        .when(d % 5 == 1, F.lit("#a?b=1"))
        .otherwise(F.lit(""))
    )
    return F.concat(scheme, F.lit("://"), host, port, path, query, frag)


@register(
    "q_url_normalize",
    _URLS_CTE
    + """
    SELECT doc_id, url, url_norm, host, domain FROM norm
    """,
)
def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC-3986 parse + canonicalization + registered-domain
    extraction per URL (X57), full-row oracle via the independent
    closed-form derivation in _URLS_CTE."""
    from bi_utils_spark.operators.weburl import attach_url_columns

    return attach_url_columns(_url_docs(spark, sf_dir)).select(
        "doc_id", "url", "url_norm", "host", "domain"
    )


@register(
    "q_domain_stats",
    _URLS_CTE
    + """
    SELECT domain,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT url_norm) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
    FROM norm GROUP BY domain
    """,
)
def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registered-domain curation panel: row pressure vs distinct
    canonical resources vs host fan-out (X57)."""
    from bi_utils_spark.operators.weburl import domain_stats

    return domain_stats(_url_docs(spark, sf_dir))


@register(
    "q_domain_blocklist",
    _URLS_CTE
    + """
    SELECT doc_id, domain FROM norm
    WHERE domain NOT IN ('site.org', 'example.co.uk', '93.184.216.34')
    """,
)
def q_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast anti-join blocklist filter on the registered domain
    (X57): site.org, example.co.uk and an IPv4-literal host dropped
    (an IP blocklist entry must match the address itself, not a fake
    'last two octets' domain — the r5 defect class), survivors tagged
    with their domain."""
    from bi_utils_spark.operators.weburl import (
        attach_url_columns,
        filter_blocked_domains,
    )

    blocklist = local_df(
        spark,
        [("site.org",), ("example.co.uk",), ("93.184.216.34",)],
        "domain string",
    )
    survivors = filter_blocked_domains(
        _url_docs(spark, sf_dir), blocklist
    )
    return attach_url_columns(survivors).select("doc_id", "domain")


# Public-suffix-list fixture (r6): hosts exercising every PSL rule
# type — private multi-label suffix (github.io), wildcard (*.ck),
# exception (!www.ck), classic ccTLD (co.uk), public-suffix-only
# hosts (no registrable domain -> passthrough) — with the expected
# registrable domain derived from the CONSTRUCTION, not a re-parse.
_PSL_CTE = """
    WITH h AS (
      SELECT doc_id,
        CASE doc_id % 6 WHEN 0 THEN 'a.b.GitHub.IO'
                        WHEN 1 THEN 'WWW.CK'
                        WHEN 2 THEN 'x.y.z.ck'
                        WHEN 3 THEN 'news.bbc.co.uk'
                        WHEN 4 THEN 'github.io'
                        ELSE 'foo.example.com' END AS host,
        CASE doc_id % 6 WHEN 0 THEN 'b.github.io'
                        WHEN 1 THEN 'www.ck'
                        WHEN 2 THEN 'y.z.ck'
                        WHEN 3 THEN 'bbc.co.uk'
                        WHEN 4 THEN 'github.io'
                        ELSE 'example.com' END AS domain
      FROM documents
    )
"""

_PSL_RULES = [
    "com", "uk", "co.uk", "io", "github.io", "ck", "*.ck", "!www.ck",
    "// comment lines and blanks are ignored", "",
]


def _psl_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    host = (
        F.when(d % 6 == 0, F.lit("a.b.GitHub.IO"))
        .when(d % 6 == 1, F.lit("WWW.CK"))
        .when(d % 6 == 2, F.lit("x.y.z.ck"))
        .when(d % 6 == 3, F.lit("news.bbc.co.uk"))
        .when(d % 6 == 4, F.lit("github.io"))
        .otherwise(F.lit("foo.example.com"))
    )
    return docs.select("doc_id", host.alias("host"))


def _psl_df(spark: SparkSession) -> DataFrame:
    return local_df(spark, [(r,) for r in _PSL_RULES], "rule string")


@register(
    "q_registered_domain_psl",
    _PSL_CTE
    + """
    SELECT doc_id, host, domain FROM h
    """,
)
def q_registered_domain_psl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full public-suffix-algorithm registered domain (X57, r6):
    longest-rule-wins with wildcard and exception rules, via K
    broadcast joins of the host's label tails against the prevailing-
    rule table (weburl.attach_registered_domain) — zero corpus
    shuffle. Full-row oracle from the construction-derived expected
    domains."""
    from bi_utils_spark.operators.weburl import attach_registered_domain

    return attach_registered_domain(
        _psl_hosts(spark, sf_dir), "host", psl=_psl_df(spark)
    ).select("doc_id", "host", "domain")


@register(
    "q_domain_stats_psl",
    _PSL_CTE
    + """
    SELECT domain,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT 'http://' || lower(host) || '/p/'
                      || CAST(doc_id % 5 AS VARCHAR)) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT lower(host)) AS BIGINT) AS n_hosts
    FROM h GROUP BY domain
    """,
)
def q_domain_stats_psl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """domain_stats keyed by PSL-correct registered domains (X57,
    r6): the per-domain curation panel where the grouping unit is the
    publicsuffix.org registrable domain, not the 2-label heuristic."""
    from bi_utils_spark.operators.weburl import domain_stats

    urls = _psl_hosts(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("http://"),
            F.col("host"),
            F.lit("/p/"),
            (F.col("doc_id") % 5).cast("string"),
        ).alias("url"),
    )
    return domain_stats(urls, psl=_psl_df(spark))


@register(
    "q_domain_cap",
    _URLS_CTE
    + """
    SELECT doc_id, domain FROM (
      SELECT doc_id, domain,
             row_number() OVER (
               PARTITION BY domain
               ORDER BY md5(CAST(doc_id AS VARCHAR) || 'domcap'), doc_id
             ) AS rn
      FROM norm
    ) WHERE rn <= 7
    """,
)
def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registered-domain document cap (X58, r6): keep the 7
    smallest md5(doc_id‖salt) rows per domain via the two-level
    ranking (no domain-sized single-task sort). Exact-kept-set oracle:
    DuckDB replays the same portable md5 order in one window."""
    from bi_utils_spark.operators.weburl import cap_per_domain

    return cap_per_domain(_url_docs(spark, sf_dir), cap=7).select(
        "doc_id", "domain"
    )


# ---------------------------------------------------------------------------
# X59: HTML → text extraction. The fixture synthesizes an HTML page
# per document IN-PLAN (closed-form in both engines): real corpus
# text wrapped in <p>, a <head> with title + style, a comment, a
# script block whose body contains '<' and '>' (the trap a naive
# tag-stripper falls into), entity-encoded characters, and 0-3 <a>
# outlinks. The oracle derives title/text/links from the
# CONSTRUCTION pieces — an independent derivation, not a re-parse.
# ---------------------------------------------------------------------------

_HTML_CTE = r"""
    WITH hsrc AS (
      SELECT doc_id,
        regexp_replace(trim(substr(text, 1, 120)), '\s+', ' ', 'g') AS frag,
        doc_id % 4 AS nl,
        doc_id % 5 AS site
      FROM documents
    ),
    links AS (
      SELECT doc_id, frag, nl, site,
        CASE WHEN nl >= 1
             THEN '<a class="x" href="http://ex' || site || '.com/'
                  || doc_id || '/0">link0</a>' ELSE '' END
        || CASE WHEN nl >= 2
             THEN '<a class="x" href="http://ex' || site || '.com/'
                  || doc_id || '/1">link1</a>' ELSE '' END
        || CASE WHEN nl >= 3
             THEN '<a class="x" href="http://ex' || site || '.com/'
                  || doc_id || '/2">link2</a>' ELSE '' END AS ahtml,
        CASE WHEN nl >= 1 THEN ' link0' ELSE '' END
        || CASE WHEN nl >= 2 THEN ' link1' ELSE '' END
        || CASE WHEN nl >= 3 THEN ' link2' ELSE '' END AS atext
      FROM hsrc
    ),
    pages AS (
      SELECT doc_id, frag, nl, site,
        '<html><head><title> Doc ' || doc_id || ' </title>'
        || '<style>p {color: red}</style></head>'
        || '<body><!-- c' || doc_id || ' -->'
        || '<script>if (1 < 2 && x > 3) { bad() }</script>'
        || '<h1>Doc &#39;' || doc_id || '&#39;</h1>'
        || '<p>' || frag || '</p>'
        || '<p>Tom &amp; Jerry &lt;3</p>'
        || ahtml || '</body></html>' AS html,
        'Doc ' || doc_id AS exp_title,
        trim(regexp_replace(
          'Doc ''' || doc_id || ''' ' || frag || ' Tom & Jerry <3' || atext,
          '\s+', ' ', 'g')) AS exp_text
      FROM links
    )
"""


def _html_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark half of _HTML_CTE's `pages` — one codegen projection
    building the raw HTML string from (doc_id, text)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select("doc_id", _html_col().alias("html"))


def _html_col() -> "Column":
    """The synthesized-page construction as a bare Column over
    (doc_id, text) — shared by _html_docs and q_web_pipeline."""
    d = F.col("doc_id")
    frag = F.regexp_replace(
        F.trim(F.substring("text", 1, 120)), r"\s+", " "
    )
    site = (d % 5).cast("string")
    did = d.cast("string")

    def link(k: int):
        return F.when(
            d % 4 >= k + 1,
            F.concat(
                F.lit('<a class="x" href="http://ex'), site, F.lit(".com/"),
                did, F.lit(f'/{k}">link{k}</a>'),
            ),
        ).otherwise(F.lit(""))

    html = F.concat(
        F.lit("<html><head><title> Doc "), did, F.lit(" </title>"),
        F.lit("<style>p {color: red}</style></head>"),
        F.lit("<body><!-- c"), did, F.lit(" -->"),
        F.lit("<script>if (1 < 2 && x > 3) { bad() }</script>"),
        F.lit("<h1>Doc &#39;"), did, F.lit("&#39;</h1>"),
        F.lit("<p>"), frag, F.lit("</p>"),
        F.lit("<p>Tom &amp; Jerry &lt;3</p>"),
        link(0), link(1), link(2),
        F.lit("</body></html>"),
    )
    return html


@register(
    "q_html_extract",
    _HTML_CTE
    + """
    SELECT doc_id, exp_title AS title, exp_text AS text,
           CAST(nl AS INT) AS n_links
    FROM pages
    """,
)
def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → (title, visible text, outlink count) extraction (X59):
    head/script/style/comment removal (a '<' inside JavaScript must
    not derail tag stripping), tags → spaces, entity decode, and
    whitespace normalization. The oracle recomputes every value from
    the fixture CONSTRUCTION, so a parser that leaks script bodies,
    drops entity decode or mangles whitespace cannot hash-match."""
    from bi_utils_spark.operators.htmltext import attach_html_columns

    out = attach_html_columns(_html_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        "title",
        "text",
        F.size("links").cast("int").alias("n_links"),
    )


@register(
    "q_outlink_domains",
    _HTML_CTE
    + """
    SELECT 'ex' || site || '.com' AS domain,
           CAST(sum(nl) AS BIGINT) AS n_links,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM pages WHERE nl > 0 GROUP BY site
    """,
)
def q_outlink_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph domain pressure (X59 ∘ X57): extract every <a href>
    outlink, key it by registered TARGET domain, count links and
    distinct linking documents — the 'which domains does the crawl
    point at' curation panel. Explode is per-page-bounded; one
    partial-aggregable groupBy."""
    from bi_utils_spark.operators.htmltext import outlink_domains

    return outlink_domains(_html_docs(spark, sf_dir))


@register(
    "q_web_pipeline",
    _URLS_CTE
    + _HTML_CTE.replace("WITH hsrc AS (", ", hsrc AS (", 1)
    + """
    SELECT doc_id, domain, title,
           CAST(n_tokens AS INT) AS n_tokens,
           CAST(n_links AS INT) AS n_links
    FROM (
      SELECT n.doc_id, n.domain, p.exp_title AS title,
             len(string_split(p.exp_text, ' ')) AS n_tokens,
             p.nl AS n_links,
             row_number() OVER (
               PARTITION BY n.domain
               ORDER BY md5(CAST(n.doc_id AS VARCHAR) || 'domcap'), n.doc_id
             ) AS rn
      FROM norm n JOIN pages p ON n.doc_id = p.doc_id
      WHERE n.domain NOT IN ('site.org', '93.184.216.34')
    ) WHERE rn <= 20
    """,
)
def q_web_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed END-TO-END web-curation pipeline (X57 ∘ X58 ∘ X59 —
    the crawl-side sibling of q_llm_pipeline): raw (url, html) pages →
    registered-domain blocklist (broadcast anti-join, IP entry
    matches the address itself) → HTML text extraction (title,
    visible text, outlinks) → per-domain document cap (two-level
    ranking, ≤20/domain) → per-doc curation record (domain, title,
    token count, outlink count). Every stage is closed-form from the
    fixture constructions, so the oracle replays the WHOLE pipeline:
    one wrong component anywhere breaks the hash."""
    from bi_utils_spark.operators.htmltext import attach_html_columns
    from bi_utils_spark.operators.weburl import (
        cap_per_domain,
        filter_blocked_domains,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    web = docs.select(
        "doc_id", _url_col().alias("url"), _html_col().alias("html")
    )
    blocklist = local_df(
        spark, [("site.org",), ("93.184.216.34",)], "domain string"
    )
    survivors = filter_blocked_domains(web, blocklist)
    extracted = attach_html_columns(survivors).drop("html")
    capped = cap_per_domain(extracted, cap=20)
    return capped.select(
        "doc_id",
        "domain",
        "title",
        F.size(F.split("text", " ", -1)).cast("int").alias("n_tokens"),
        F.size("links").cast("int").alias("n_links"),
    )


# ---------------------------------------------------------------------------
# X60: robots.txt compliance. The fixture synthesizes one robots.txt
# file per host IN-PLAN (6 hosts, g = doc_id % 6): a '*' group with a
# prefix disallow + longer allow, then a two-agent group (Bot{g%2} +
# extra{g}) with a '*'-wildcard disallow and a '$'-anchored allow,
# plus the traps — comment line, blank line, unknown keys
# (Crawl-delay, Sitemap), an empty Disallow, mixed key case. The
# oracles derive the parsed rule rows and the per-URL RFC 9309
# decision from the CONSTRUCTION tuples — closed-form, not a re-parse.
# ---------------------------------------------------------------------------


def _robots_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One synthesized robots.txt per host h<g>.example.com."""
    docs = (
        load(spark, sf_dir, "documents")
        .select((F.col("doc_id") % 6).alias("g"))
        .distinct()
    )
    gs = F.col("g").cast("string")
    ps = (F.col("g") % 2).cast("string")
    host = F.concat(F.lit("h"), gs, F.lit(".example.com"))
    txt = F.concat(
        F.lit("# fixture robots\nUser-agent: *\nDisallow: /g"),
        gs,
        F.lit("/\nAllow: /g"),
        gs,
        F.lit("/ok\nCrawl-delay: 5\n\nUser-agent: Bot"),
        ps,
        F.lit("\nUser-agent: extra"),
        gs,
        F.lit("\nDisallow: /x"),
        gs,
        F.lit("/* # trailing comment\nAllow: /x"),
        gs,
        F.lit("/keep$\nDisallow:\nSitemap: http://sm.example/x.xml\n"),
    )
    return docs.select(host.alias("host"), txt.alias("robots_txt"))


_ROBOTS_HOSTS_SQL = """
    g AS (SELECT DISTINCT doc_id % 6 AS g FROM documents),
    h AS (SELECT 'h' || CAST(g AS VARCHAR) || '.example.com' AS host,
                 CAST(g AS VARCHAR) AS gs,
                 CAST(g % 2 AS VARCHAR) AS ps
          FROM g)
"""


@register(
    "q_robots_rules",
    "WITH "
    + _ROBOTS_HOSTS_SQL
    + """
    SELECT host, '*' AS agent, 'disallow' AS rule,
           '/g' || gs || '/' AS path FROM h
    UNION ALL SELECT host, '*', 'allow', '/g' || gs || '/ok' FROM h
    UNION ALL SELECT host, 'bot' || ps, 'disallow',
                     '/x' || gs || '/*' FROM h
    UNION ALL SELECT host, 'bot' || ps, 'allow',
                     '/x' || gs || '/keep$' FROM h
    UNION ALL SELECT host, 'extra' || gs, 'disallow',
                     '/x' || gs || '/*' FROM h
    UNION ALL SELECT host, 'extra' || gs, 'allow',
                     '/x' || gs || '/keep$' FROM h
    """,
)
def q_robots_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt corpus -> RFC 9309 rule table (X60, r6): group
    assembly (consecutive UA lines share a group), comment/blank/
    unknown-key dropping, empty-Disallow dropping, agent lowercasing.
    The oracle lists the construction's rule tuples directly."""
    from bi_utils_spark.operators.robots import parse_robots

    return parse_robots(_robots_corpus(spark, sf_dir))


@register(
    "q_robots_decisions",
    """
    SELECT doc_id,
           CAST(NOT ((doc_id % 6) % 2 = 0 AND doc_id % 5 = 2
                  OR (doc_id % 6) % 2 = 1 AND doc_id % 5 = 0)
                AS INT) AS allowed
    FROM documents
    """,
)
def q_robots_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-URL RFC 9309 fetch decision for agent 'Bot0' (X60, r6).
    Even-g hosts have a bot0 group (wildcard disallow /x<g>/*,
    '$'-anchored allow /x<g>/keep$ — and the '*' group is IGNORED);
    odd-g hosts fall back to the '*' group (prefix disallow /g<g>/
    overridden by the longer allow /g<g>/ok). doc_id % 5 picks the
    path: 0 -> /g<g>/a, 1 -> /g<g>/ok/x, 2 -> /x<g>/a,
    3 -> /x<g>/keep, 4 -> '' (empty path defaults to '/'). The oracle
    is the closed-form truth table of (g % 2, doc_id % 5)."""
    from bi_utils_spark.operators.robots import (
        parse_robots,
        robots_decisions,
    )

    d = F.col("doc_id")
    gs = (d % 6).cast("string")
    pc = d % 5
    path = (
        F.when(pc == 0, F.concat(F.lit("/g"), gs, F.lit("/a")))
        .when(pc == 1, F.concat(F.lit("/g"), gs, F.lit("/ok/x")))
        .when(pc == 2, F.concat(F.lit("/x"), gs, F.lit("/a")))
        .when(pc == 3, F.concat(F.lit("/x"), gs, F.lit("/keep")))
        .otherwise(F.lit(""))
    )
    urls = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("http://h"), gs, F.lit(".example.com"), path
        ).alias("url"),
    )
    rules = parse_robots(_robots_corpus(spark, sf_dir))
    return robots_decisions(urls, rules, user_agent="Bot0").select(
        "doc_id", F.col("allowed").cast("int").alias("allowed")
    )


# ---------------------------------------------------------------------------
# X61: Z-order layout keys. The oracle evaluates the IDENTICAL bit-
# interleave expression (zorder_key_sql emits the same clamp + shift
# terms both engines run with plain integer operators) over the same
# bucketed dimensions — a bit-exact cross-engine check of the Morton
# arithmetic that drives the layout rewrite.
# ---------------------------------------------------------------------------


def _zorder_oracle_sql() -> str:
    from bi_utils_spark.operators.layout import zorder_key_sql

    return (
        """
    WITH b AS (
      SELECT o_orderkey,
             o_custkey % 256 AS x,
             CAST(FLOOR(o_totalprice) AS BIGINT) % 256 AS y
      FROM orders
    )
    SELECT o_orderkey, x, y,
           """
        + zorder_key_sql(["x", "y"], bits=8)
        + """ AS zkey
    FROM b
    """
    )


@register("q_zorder_key", _zorder_oracle_sql())
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton layout key over two bucketed order dimensions (X61,
    r6): customer bucket x price bucket, 8 bits each, interleaved to
    one BIGINT. Bit-exact oracle: DuckDB evaluates the same generated
    shift/mask expression."""
    from bi_utils_spark.operators.layout import zorder_key

    orders = load(spark, sf_dir, "orders")
    b = orders.select(
        "o_orderkey",
        (F.col("o_custkey") % 256).alias("x"),
        (F.floor("o_totalprice").cast("long") % 256).alias("y"),
    )
    return b.select(
        "o_orderkey", "x", "y", zorder_key(["x", "y"], bits=8).alias("zkey")
    )


# ---------------------------------------------------------------------------
# X62: count-min sketch. Hashing is the portable-md5 bucket (52-bit
# exact), so the oracles replay the WHOLE sketch in SQL — cell sums,
# collisions, min-over-rows, threshold — bit-exactly. q_countmin_hh
# uses a skewed synthetic key (half the corpus mass on 5 hot keys);
# q_countmin_bound attests the one-sided guarantee (est >= exact)
# against the exact groupBy on a real column.
# ---------------------------------------------------------------------------

_CM_KEY_SQL = (
    "CASE WHEN doc_id % 2 = 0 THEN 'k' || CAST(doc_id % 5 AS VARCHAR) "
    "ELSE 'u' || CAST(doc_id AS VARCHAR) END"
)


def _cm_replay_sql(key_sql: str, src: str, depth: int, width: int) -> str:
    """DuckDB replay of countmin_table + countmin_estimate over
    ``key_sql`` drawn from table ``src`` (bit-exact: same md5 row
    salts, same 13-hex 52-bit bucket arithmetic)."""
    return f"""
    k AS (SELECT {key_sql} AS key FROM {src}),
    cells AS (
      SELECT r AS row,
             CAST('0x' || substr(md5('cm' || CAST(r AS VARCHAR) || '|' || key),
                                 1, 13) AS BIGINT) % {width} AS bucket
      FROM k CROSS JOIN (SELECT unnest(range({depth})) AS r)
    ),
    sketch AS (
      SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM cells GROUP BY row, bucket
    ),
    probes AS (
      SELECT d.key, r AS row,
             CAST('0x' || substr(md5('cm' || CAST(r AS VARCHAR) || '|' || d.key),
                                 1, 13) AS BIGINT) % {width} AS bucket
      FROM (SELECT DISTINCT key FROM k) d
      CROSS JOIN (SELECT unnest(range({depth})) AS r)
    ),
    est AS (
      SELECT p.key, MIN(COALESCE(s.cnt, 0)) AS est
      FROM probes p LEFT JOIN sketch s
        ON p.row = s.row AND p.bucket = s.bucket
      GROUP BY p.key
    )
    """


@register(
    "q_countmin_hh",
    "WITH "
    + _cm_replay_sql(_CM_KEY_SQL, "documents", depth=3, width=64)
    + """
    SELECT key, est,
           est / (SELECT COUNT(*) FROM documents) AS share_est
    FROM est
    WHERE est >= 0.05 * (SELECT COUNT(*) FROM documents)
    """,
)
def q_countmin_hh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via count-min sketch (X62, r6): skewed key (5
    hot keys share half the mass, the rest unique), depth 3 x width
    64, threshold share 5%. The oracle replays build, collisions,
    min-over-rows and threshold bit-exactly, so even sketch
    FALSE-POSITIVES match across engines."""
    from bi_utils_spark.operators.sketches import heavy_hitters

    d = F.col("doc_id")
    keyed = load(spark, sf_dir, "documents").select(
        F.when(
            d % 2 == 0, F.concat(F.lit("k"), (d % 5).cast("string"))
        )
        .otherwise(F.concat(F.lit("u"), d.cast("string")))
        .alias("key")
    )
    return heavy_hitters(keyed, "key", min_share=0.05, depth=3, width=64)


@register(
    "q_countmin_bound",
    "WITH "
    + _cm_replay_sql("event_type", "events", depth=3, width=32)
    + """
    , exact AS (
      SELECT event_type AS key, CAST(COUNT(*) AS BIGINT) AS exact
      FROM events GROUP BY event_type
    )
    SELECT e.key AS event_type, e.est, x.exact,
           CAST(e.est >= x.exact AS INT) AS one_sided
    FROM est e JOIN exact x ON e.key = x.key
    """,
)
def q_countmin_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sidedness attestation (X62, r6): per event type, the CMS
    estimate never undercounts the exact count — (est, exact,
    est >= exact) all replayed/recomputed in the oracle."""
    from bi_utils_spark.operators.sketches import (
        countmin_estimate,
        countmin_table,
    )

    events = load(spark, sf_dir, "events")
    sketch = countmin_table(events, "event_type", depth=3, width=32)
    keys = events.select("event_type").distinct()
    est = countmin_estimate(keys, sketch, "event_type", depth=3, width=32)
    exact = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "est",
        "exact",
        (F.col("est") >= F.col("exact")).cast("int").alias("one_sided"),
    )


# ---------------------------------------------------------------------------
# X63: Unicode hygiene. The fixture plants one damage class per
# doc_id % 4 — decomposed NFD sequence, cp1252 mojibake, zero-width
# space, clean — on an ascii-only corpus fragment. The oracle derives
# the REPAIRED/COMPOSED text closed-form from the construction
# (chr(233) etc.), an independent derivation, not a re-normalization.
# ---------------------------------------------------------------------------

_UNI_FRAG_SQL = (
    "regexp_replace(substr(text, 1, 40), '[^ -~]', '', 'g')"
)


def _uni_frag_col() -> "Column":
    return F.regexp_replace(
        F.substring("text", 1, 40), "[^ -~]", ""
    )


def _uni_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("doc_id")
    frag = _uni_frag_col()
    dirty = (
        F.when(d % 4 == 0, F.concat(frag, F.lit(" Café")))
        .when(d % 4 == 1, F.concat(F.lit("CafÃ© "), frag))
        .when(d % 4 == 2, F.concat(frag, F.lit("​x")))
        .otherwise(frag)
    )
    return load(spark, sf_dir, "documents").select(
        "doc_id", dirty.alias("text")
    )


@register(
    "q_unicode_nfc",
    f"""
    WITH f AS (SELECT doc_id, {_UNI_FRAG_SQL} AS frag FROM documents)
    SELECT doc_id,
      CASE WHEN doc_id % 4 = 0 THEN frag || ' Caf' || chr(233)
           WHEN doc_id % 4 = 1 THEN 'Caf' || chr(233) || ' ' || frag
           WHEN doc_id % 4 = 2 THEN frag || 'x'
           ELSE frag END AS text_norm
    FROM f
    """,
)
def q_unicode_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed hygiene projection (X63, r6): mojibake repair (gated
    on marker + strict round-trip) -> NFC -> invisible-char strip.
    doc_id%4 plants: 0 = decomposed e+U+0301 (composes to é), 1 =
    'CafÃ©' cp1252 mojibake (repairs to 'Café'), 2 = zero-width space
    (stripped), 3 = clean (byte-identical passthrough)."""
    from bi_utils_spark.operators.textnorm import attach_normalized_text

    return attach_normalized_text(_uni_fixture(spark, sf_dir)).select(
        "doc_id", "text_norm"
    )


# ---------------------------------------------------------------------------
# X73: MAD series anomalies over the X69 grid. Exact interpolated
# medians (percentile == quantile_cont, the funnel-latency identity)
# make the flags engine-portable.
# ---------------------------------------------------------------------------


@register(
    "q_series_outliers",
    """
    WITH b AS (
      SELECT event_type,
             CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    med AS (SELECT event_type, quantile_cont(n, 0.5) AS med
            FROM b GROUP BY event_type),
    dev AS (SELECT b.event_type, b.bucket, b.n, m.med,
                   ABS(CAST(b.n AS DOUBLE) - m.med) AS dv
            FROM b JOIN med m ON b.event_type = m.event_type),
    mad AS (SELECT event_type, quantile_cont(dv, 0.5) AS mad
            FROM dev GROUP BY event_type)
    SELECT d.event_type, d.bucket, d.n, d.med, m.mad,
           CAST(CASE WHEN m.mad > 0 THEN d.dv > 3.0 * m.mad
                     ELSE d.dv > 0 END AS INT) AS is_outlier
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    """,
)
def q_series_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-count anomalies per type (X73, r6): MAD detector
    over the bucketed series; flags, medians and MADs all recomputed
    independently by the oracle."""
    from bi_utils_spark.operators.timeseries import (
        attach_time_bucket,
        mad_outliers,
    )

    counts = (
        attach_time_bucket(
            load(spark, sf_dir, "events"), "ts", width_sec=86400
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = mad_outliers(counts, value_col="n", group_cols=("event_type",))
    return out.select(
        "event_type",
        "bucket",
        "n",
        "med",
        "mad",
        F.col("is_outlier").cast("int").alias("is_outlier"),
    )


# ---------------------------------------------------------------------------
# X72: IPv4/CIDR blocklists. The oracle replays the integer address
# arithmetic (strict octet regex, base-256 fold) and the
# longest-prefix-first decision as an ordered CASE over the literal
# rule ranges. doc_id % 5 = 0 rows with doc_id % 200 = 5 hit BOTH
# 10.0.0.0/8 and 10.5.0.0/16 — the /16 must win.
# ---------------------------------------------------------------------------

_IP_FIXTURE_SQL = """
      SELECT doc_id,
        CASE WHEN doc_id % 5 = 0
             THEN '10.' || CAST(doc_id % 200 AS VARCHAR) || '.3.4'
             WHEN doc_id % 5 = 1
             THEN '203.0.113.' || CAST(doc_id % 256 AS VARCHAR)
             WHEN doc_id % 5 = 2
             THEN '8.8.' || CAST(doc_id % 256 AS VARCHAR) || '.8'
             WHEN doc_id % 5 = 3
             THEN '192.168.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
             ELSE '999.1.2.' || CAST(doc_id AS VARCHAR) END AS ip
      FROM documents
"""

_IP_CIDRS = (
    "10.0.0.0/8",
    "10.5.0.0/16",
    "203.0.113.0/24",
    "192.168.0.0/16",
)

_OCT = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"


@register(
    "q_cidr_match",
    f"""
    WITH x AS ({_IP_FIXTURE_SQL}),
    n AS (
      SELECT doc_id, ip,
        CASE WHEN regexp_matches(ip,
               '^{_OCT}\\.{_OCT}\\.{_OCT}\\.{_OCT}$')
             THEN CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
                + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
                + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
                + CAST(string_split(ip, '.')[4] AS BIGINT)
        END AS ipn
      FROM x
    )
    SELECT doc_id, ip,
      CASE WHEN ipn IS NULL THEN NULL
           WHEN ipn BETWEEN 3405803776 AND 3405804031
             THEN '203.0.113.0/24'
           WHEN ipn BETWEEN 168099840 AND 168165375
             THEN '10.5.0.0/16'
           WHEN ipn BETWEEN 3232235520 AND 3232301055
             THEN '192.168.0.0/16'
           WHEN ipn BETWEEN 167772160 AND 184549375
             THEN '10.0.0.0/8'
      END AS matched_cidr
    FROM n
    """,
)
def q_cidr_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-prefix CIDR tagging (X72, r6) over the planted IP
    fixture: /16 beats /8 on overlap, 8.8.x.8 stays unmatched,
    999.x addresses are invalid and tag NULL."""
    from bi_utils_spark.operators.ipnet import attach_cidr_match

    d = F.col("doc_id")
    ips = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            d % 5 == 0,
            F.concat(
                F.lit("10."), (d % 200).cast("string"), F.lit(".3.4")
            ),
        )
        .when(
            d % 5 == 1,
            F.concat(F.lit("203.0.113."), (d % 256).cast("string")),
        )
        .when(
            d % 5 == 2,
            F.concat(
                F.lit("8.8."), (d % 256).cast("string"), F.lit(".8")
            ),
        )
        .when(
            d % 5 == 3,
            F.concat(
                F.lit("192.168."), (d % 256).cast("string"), F.lit(".1")
            ),
        )
        .otherwise(F.concat(F.lit("999.1.2."), d.cast("string")))
        .alias("ip"),
    )
    cidrs = local_df(spark, [(c,) for c in _IP_CIDRS], "cidr string")
    return attach_cidr_match(ips, "ip", cidrs)


# ---------------------------------------------------------------------------
# X71: stream-stream interval join, batch-parity form. The oracle is
# a plain SQL interval join; the streaming semantics (watermarks,
# bounded state, left_outer null emission) are proven in
# tests/test_streaming.py on the IDENTICAL plan.
# ---------------------------------------------------------------------------


@register(
    "q_stream_attribution",
    """
    SELECT c.user_id,
           CAST(FLOOR(epoch(c.ts)) AS BIGINT) AS earlier_s,
           CAST(FLOOR(epoch(p.ts)) AS BIGINT) AS later_s,
           CAST(FLOOR(epoch(p.ts)) - FLOOR(epoch(c.ts)) AS BIGINT)
             AS lag_sec
    FROM events p JOIN events c
      ON c.user_id = p.user_id
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
)
def q_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click -> purchase attribution within 30 minutes (X71, r6):
    the stream-stream interval join run in its batch form (same
    code path; withWatermark is a no-op on static frames)."""
    from bi_utils_spark.streaming.joins import attribute_events

    events = load(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts"
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    out = attribute_events(clicks, purchases, window_sec=1800)
    return out.select(
        "user_id",
        F.unix_timestamp("earlier_ts").alias("earlier_s"),
        F.unix_timestamp("later_ts").alias("later_s"),
        "lag_sec",
    )


# ---------------------------------------------------------------------------
# X70: paragraph-level boilerplate removal. Fixture paragraphs are
# MULTI-LINE (internal single \n) so the unit granularity is proven:
# a line-level pass would split them, the paragraph pass must not.
# ---------------------------------------------------------------------------

_MPARA_CTE = """
    WITH d AS (SELECT doc_id, doc_id % 4 + 2 AS n FROM documents),
    mp AS (
      SELECT doc_id, i,
             CASE WHEN i % 3 = 0
                  THEN 'shared para ' || CAST((doc_id + i) % 6 AS VARCHAR)
                       || chr(10) || 'cont ' || CAST((doc_id + i) % 6 AS VARCHAR)
                  ELSE 'unique ' || CAST(doc_id AS VARCHAR)
                       || ' para ' || CAST(i AS VARCHAR)
             END AS para
      FROM (SELECT doc_id, n, UNNEST(range(0, n)) AS i FROM d)
    )
"""


def _multipara_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id")

    def para(i):
        k = ((F.col("doc_id") + i) % 6).cast("string")
        return F.when(
            i % 3 == 0,
            F.concat(
                F.lit("shared para "), k, F.lit("\ncont "), k
            ),
        ).otherwise(
            F.concat(
                F.lit("unique "),
                F.col("doc_id").cast("string"),
                F.lit(" para "),
                i.cast("string"),
            )
        )

    return docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(
                    F.lit(0).cast("long"), F.col("doc_id") % 4 + 1
                ),
                para,
            ),
            "\n\n",
        ).alias("text"),
    )


@register(
    "q_paragraph_dedup",
    _MPARA_CTE
    + """
    , f AS (
      SELECT para FROM mp
      GROUP BY para HAVING count(DISTINCT doc_id) >= 5
    )
    SELECT mp.doc_id,
           coalesce(array_to_string(
             list(mp.para ORDER BY mp.i) FILTER (WHERE f.para IS NULL),
             chr(10) || chr(10)), '') AS text_cleaned,
           CAST(count(*) AS BIGINT) AS n_paragraphs,
           CAST(sum(CASE WHEN f.para IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_removed
    FROM mp LEFT JOIN f ON mp.para = f.para
    GROUP BY mp.doc_id
    """,
)
def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document paragraph boilerplate removal (X70, r6):
    multi-line shared paragraphs deleted whole, unique paragraphs
    kept in order, canonical blank-line rejoin — full reconstructed
    text per document in the oracle."""
    from bi_utils_spark.operators.dedup import (
        remove_boilerplate_paragraphs,
    )

    return remove_boilerplate_paragraphs(
        _multipara_docs(spark, sf_dir), min_df=5
    )


# ---------------------------------------------------------------------------
# X69: time-series resample + gap fill. The value > 200 filter
# sparsifies the hourly series, so the zero-filled grid genuinely
# differs from the bare groupBy; bounds derive from the filtered data.
# ---------------------------------------------------------------------------


@register(
    "q_resample_gaps",
    """
    WITH f AS (
      SELECT event_type,
             CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS bucket
      FROM events WHERE value > 200
    ),
    agg AS (SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS n
            FROM f GROUP BY 1, 2),
    bounds AS (SELECT MIN(bucket) AS lo, MAX(bucket) AS hi FROM f),
    grid AS (
      SELECT g.event_type, u.b AS bucket
      FROM (SELECT DISTINCT event_type FROM f) g
      CROSS JOIN (SELECT unnest(generate_series(
                    (SELECT lo FROM bounds),
                    (SELECT hi FROM bounds))) AS b) u
    )
    SELECT g.event_type, g.bucket, COALESCE(a.n, 0) AS n
    FROM grid g LEFT JOIN agg a
      ON g.event_type = a.event_type AND g.bucket = a.bucket
    """,
)
def q_resample_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly high-value event counts per type on the COMPLETE
    bucket grid (X69, r6) — missing hours appear as explicit zeros.
    The oracle rebuilds the grid with generate_series."""
    from bi_utils_spark.operators.timeseries import resample_counts

    events = load(spark, sf_dir, "events").where(F.col("value") > 200)
    return resample_counts(
        events, ts_col="ts", width_sec=3600, group_cols=("event_type",)
    )


# ---------------------------------------------------------------------------
# X68: PageRank. Exact integer fixed-point power iteration, so the
# oracle replays every iteration as a chained CTE — bit-exact ranks.
# Fixture: a 21-node graph from doc_id arithmetic with node 20
# dangling (appears only as a target).
# ---------------------------------------------------------------------------

_PR_EDGES_SQL = """
      SELECT DISTINCT doc_id % 20 AS src,
        CASE WHEN doc_id % 5 = 0 THEN 20
             ELSE (doc_id * 7) % 20 END AS dst
      FROM documents
"""


def _pr_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("doc_id")
    return (
        load(spark, sf_dir, "documents")
        .select(
            (d % 20).alias("src"),
            F.when(d % 5 == 0, F.lit(20).cast("long"))
            .otherwise((d * 7) % 20)
            .alias("dst"),
        )
        .distinct()
    )


def _pagerank_replay_sql(n_iter: int, p: int = 85) -> str:
    from bi_utils_spark.operators.graph import PR_SCALE

    sql = f"""
    WITH e0 AS ({_PR_EDGES_SQL}),
    nodes AS (SELECT DISTINCT n FROM
        (SELECT src AS n FROM e0 UNION ALL SELECT dst FROM e0)),
    deg AS (SELECT src, COUNT(*) AS deg FROM e0 GROUP BY src),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (SELECT n AS node,
                  CAST({PR_SCALE} // (SELECT n FROM nn) AS BIGINT) AS rq
           FROM nodes)"""
    base = f"(({PR_SCALE} - {p} * {PR_SCALE} // 100) // (SELECT n FROM nn))"
    for k in range(1, n_iter + 1):
        prev = f"r{k - 1}"
        sql += f""",
    c{k} AS (SELECT e.dst AS node, SUM(r.rq // d.deg) AS s
             FROM e0 e JOIN {prev} r ON e.src = r.node
             JOIN deg d ON e.src = d.src
             GROUP BY e.dst),
    d{k} AS (SELECT COALESCE(SUM(rq), 0) AS dang FROM {prev}
             WHERE node NOT IN (SELECT src FROM deg)),
    r{k} AS (SELECT n.n AS node,
               CAST({base}
                 + ({p} * (COALESCE(c.s, 0)
                    + (SELECT dang FROM d{k}) // (SELECT n FROM nn)))
                   // 100 AS BIGINT) AS rq
             FROM nodes n LEFT JOIN c{k} c ON n.n = c.node)"""
    sql += f"""
    SELECT node, rq AS rank_q,
           CAST(rq AS DOUBLE) / {float(PR_SCALE)} AS rank
    FROM r{n_iter}
    """
    return sql


@register("q_pagerank_domains", _pagerank_replay_sql(5))
def q_pagerank_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five PageRank power iterations over the synthesized domain
    graph (X68, r6): exact fixed-point ranks incl. dangling-mass
    redistribution — the domain-authority signal for crawl frontier
    and quota ranking. Oracle replays all iterations bit-exactly."""
    from bi_utils_spark.operators.graph import pagerank

    return pagerank(_pr_edges(spark, sf_dir), n_iter=5)


# ---------------------------------------------------------------------------
# X67: Gopher quality rules. doc_id % 3 plants: 0 = raw corpus text,
# 1 = a 4-word fragment (fails word count), 2 = 60 identical bullet
# lines (fails bullet fraction + stopwords). The oracle recomputes
# every rule in SQL over the same construction.
# ---------------------------------------------------------------------------

_GOPHER_FIXTURE_SQL = """
      SELECT doc_id,
        CASE WHEN doc_id % 3 = 0 THEN text
             WHEN doc_id % 3 = 1 THEN 'only four words here'
             ELSE repeat('- itm' || chr(10), 60) END AS text
      FROM documents
"""


def _gopher_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("doc_id")
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(d % 3 == 0, F.col("text"))
        .when(d % 3 == 1, F.lit("only four words here"))
        .otherwise(F.repeat(F.lit("- itm\n"), 60))
        .alias("text"),
    )


_GOPHER_RULES_SQL = f"""
    WITH fx AS ({_GOPHER_FIXTURE_SQL}),
    w AS (
      SELECT doc_id, text,
        list_filter(string_split_regex(trim(text), '\\s+'),
                    x -> x <> '') AS words,
        list_filter(string_split(text, chr(10)),
                    l -> trim(l) <> '') AS lines
      FROM fx
    ),
    m AS (
      SELECT doc_id,
        len(words) AS n_words,
        CASE WHEN len(words) > 0
             THEN CAST(list_sum(list_transform(words, x -> length(x)))
                       AS DOUBLE) / len(words) ELSE 0.0 END AS mean_len,
        CASE WHEN len(words) > 0
             THEN CAST(length(text)
                       - length(regexp_replace(text, '[#…]', '', 'g'))
                       AS DOUBLE) / len(words) ELSE 0.0 END AS sym_ratio,
        CASE WHEN len(lines) > 0
             THEN CAST(len(list_filter(lines,
                        l -> regexp_matches(trim(l), '^[-*•]')))
                       AS DOUBLE) / len(lines) ELSE 0.0 END AS bullet_frac,
        CASE WHEN len(lines) > 0
             THEN CAST(len(list_filter(lines,
                        l -> regexp_matches(trim(l), '(\\.\\.\\.|…)$')))
                       AS DOUBLE) / len(lines) ELSE 0.0 END AS ellipsis_frac,
        CASE WHEN len(words) > 0
             THEN CAST(len(list_filter(words,
                        x -> regexp_matches(x, '[A-Za-z]')))
                       AS DOUBLE) / len(words) ELSE 0.0 END AS alpha_frac,
        (SELECT COUNT(*) FROM (SELECT unnest(['the','be','to','of',
           'and','that','have','with']) AS s) st
         WHERE list_contains(list_transform(words, x -> lower(x)), st.s)
        ) AS stop_hits
      FROM w
    ),
    fl AS (
      SELECT doc_id, n_words,
        CAST(n_words >= 50 AND n_words <= 100000 AS INT) AS ok_word_count,
        CAST(mean_len >= 3.0 AND mean_len <= 10.0 AS INT) AS ok_mean_word_len,
        CAST(sym_ratio <= 0.1 AS INT) AS ok_symbol_ratio,
        CAST(bullet_frac <= 0.9 AS INT) AS ok_bullet_lines,
        CAST(ellipsis_frac <= 0.3 AS INT) AS ok_ellipsis_lines,
        CAST(alpha_frac >= 0.8 AS INT) AS ok_alpha_words,
        CAST(stop_hits >= 2 AS INT) AS ok_stopwords
      FROM m
    )
"""


@register(
    "q_gopher_flags",
    _GOPHER_RULES_SQL
    + """
    SELECT doc_id, CAST(n_words AS INT) AS n_words, ok_word_count,
           ok_mean_word_len, ok_symbol_ratio, ok_bullet_lines,
           ok_ellipsis_lines, ok_alpha_words, ok_stopwords,
           CAST(ok_word_count + ok_mean_word_len + ok_symbol_ratio
                + ok_bullet_lines + ok_ellipsis_lines + ok_alpha_words
                + ok_stopwords = 7 AS INT) AS gopher_keep
    FROM fl
    """,
)
def q_gopher_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Gopher rule verdicts (X67, r6) over the planted
    fixture — every rule recomputed independently by the oracle."""
    from bi_utils_spark.operators.gopher import gopher_flags

    out = gopher_flags(_gopher_fixture(spark, sf_dir))
    cols = [
        "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
        "ok_bullet_lines", "ok_ellipsis_lines", "ok_alpha_words",
        "ok_stopwords", "gopher_keep",
    ]
    return out.select(
        "doc_id",
        "n_words",
        *[F.col(c).cast("int").alias(c) for c in cols],
    )


@register(
    "q_gopher_report",
    _GOPHER_RULES_SQL
    + """
    SELECT CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(CASE WHEN ok_word_count + ok_mean_word_len
                + ok_symbol_ratio + ok_bullet_lines + ok_ellipsis_lines
                + ok_alpha_words + ok_stopwords = 7
                THEN 1 ELSE 0 END) AS BIGINT) AS kept,
           CAST(SUM(1 - ok_word_count) AS BIGINT) AS fail_word_count,
           CAST(SUM(1 - ok_mean_word_len) AS BIGINT) AS fail_mean_word_len,
           CAST(SUM(1 - ok_symbol_ratio) AS BIGINT) AS fail_symbol_ratio,
           CAST(SUM(1 - ok_bullet_lines) AS BIGINT) AS fail_bullet_lines,
           CAST(SUM(1 - ok_ellipsis_lines) AS BIGINT) AS fail_ellipsis_lines,
           CAST(SUM(1 - ok_alpha_words) AS BIGINT) AS fail_alpha_words,
           CAST(SUM(1 - ok_stopwords) AS BIGINT) AS fail_stopwords
    FROM fl
    """,
)
def q_gopher_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level Gopher kill counts (X67, r6): which rule removes
    how much — the curation-debugging audit."""
    from bi_utils_spark.operators.gopher import gopher_report

    return gopher_report(_gopher_fixture(spark, sf_dir))


# ---------------------------------------------------------------------------
# X66: sentence segmentation. The oracle replays the exact same
# three RE2-safe regexps + split (split_sentences_sql) over the real
# corpus text — wholesale SQL replay, the embsig.py pattern.
# ---------------------------------------------------------------------------


def _sentences_oracle_sql() -> str:
    from bi_utils_spark.operators.sentences import split_sentences_sql

    return (
        f"""
    WITH d AS (SELECT doc_id, {split_sentences_sql("text")} AS ss
               FROM documents)
    SELECT doc_id, CAST(j - 1 AS INT) AS sent_idx, ss[j] AS sentence
    FROM d, unnest(range(1, len(ss) + 1)) AS u(j)
    """
    )


@register("q_sentences", _sentences_oracle_sql())
def q_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence unit table over the real corpus (X66, r6):
    terminator-keeping splits with initial/abbreviation guards, in
    document order. Oracle replays the identical regexps in DuckDB."""
    from bi_utils_spark.operators.sentences import explode_sentences

    return explode_sentences(load(spark, sf_dir, "documents"))


def _sentence_stats_oracle_sql() -> str:
    from bi_utils_spark.operators.sentences import split_sentences_sql

    return (
        f"""
    WITH d AS (SELECT doc_id, {split_sentences_sql("text")} AS ss
               FROM documents),
    lens AS (SELECT doc_id, len(ss) AS n,
                    list_transform(ss, s -> length(s)) AS ls
             FROM d)
    SELECT doc_id, CAST(n AS INT) AS n_sentences,
           CASE WHEN n > 0
                THEN CAST(list_sum(ls) AS DOUBLE) / n
                ELSE 0.0 END AS mean_sentence_chars,
           CAST(COALESCE(list_max(ls), 0) AS INT) AS max_sentence_chars
    FROM lens
    """
    )


@register("q_sentence_stats", _sentence_stats_oracle_sql())
def q_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc sentence-shape profile (X66, r6): count, mean chars,
    max chars — array arithmetic on the split, no explode."""
    from bi_utils_spark.operators.sentences import sentence_stats

    return sentence_stats(load(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# X65: mergeable distinct sketches. Attestation oracle: the exact
# per-week distinct counts come from SQL; the Spark side must emit
# merged_eq_direct = 1 (union(sketch) == sketch(union) identity) and
# err_ok = 1 (estimate within 5% of exact) for every row or the hash
# breaks. The sketches themselves are engine-internal (DataSketches),
# so the attested properties — not the registers — are the contract.
# ---------------------------------------------------------------------------


@register(
    "q_sketch_rollup",
    """
    SELECT CAST(FLOOR(datediff('day', DATE '1970-01-01',
                               CAST(ts AS DATE)) / 7) AS BIGINT) AS week,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact,
           1 AS merge_consistent,
           1 AS err_ok
    FROM events
    GROUP BY 1
    """,
)
def q_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily HLL user sketches unioned to weekly rollups (X65, r6):
    the raw stream is read once at day grain; the week numbers come
    from kilobyte sketch unions. Attested per week: merged estimate
    == direct coarse-grain estimate (exact mergeability) and within
    5% of the true distinct count."""
    from bi_utils_spark.operators.distinct_sketch import (
        sketch_rollup_report,
    )

    events = load(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").cast("string").alias("day"),
        F.floor(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")) / 7
        ).alias("week"),
    )
    return sketch_rollup_report(
        events,
        fine_cols=["day", "week"],
        coarse_cols=["week"],
        key_col="user_id",
        lgk=12,
        rel_error_bound=0.05,
    )


# ---------------------------------------------------------------------------
# X64: iterative BPE training. The fixture vocab uses DISTINCT-char
# words, so every candidate pair occurs at most once per word and a
# single string replace equals the exact left-to-right merge — which
# lets the oracle replay the WHOLE training loop (pair counts, argmax
# with tie-break, merge application) as a chained CTE per step. The
# Spark operator itself uses an exact fold (pending-register state
# machine) that is correct for ANY input, including repeated-char
# words (pytest covers those against a Python reference).
# ---------------------------------------------------------------------------

_BPE_WORDS = ["abcd", "abce", "bcd", "acd", "abd", "bce", "ade", "ce"]


def _bpe_chain_sql(n_merges: int) -> str:
    """WITH-chain replaying bpe_train's merge loop: v0 (spaced
    chars) .. v{n} (state after n merges), t1..tn (the argmax pair
    per step) — shared by the train and encode oracles."""
    words = ", ".join(
        f"('{w}', {i})" for i, w in enumerate(_BPE_WORDS)
    )
    sql = f"""
    WITH w(term, i) AS (VALUES {words}),
    dcnt AS (SELECT doc_id % 8 AS i, COUNT(*) AS n
             FROM documents GROUP BY 1),
    v0 AS (SELECT term,
                  trim(regexp_replace(term, '(.)', '\\1 ', 'g')) AS spaced,
                  CAST(dcnt.n + (8 - w.i) * 7 AS BIGINT) AS c
           FROM w JOIN dcnt ON w.i = dcnt.i)"""
    for k in range(1, n_merges + 1):
        prev = f"v{k - 1}"
        sql += f""",
    p{k} AS (
      SELECT t.pair, SUM(c) AS cnt
      FROM {prev}, unnest(list_transform(
             range(1, len(string_split(spaced, ' '))),
             j -> string_split(spaced, ' ')[j] || ' ' ||
                  string_split(spaced, ' ')[j + 1])) AS t(pair)
      GROUP BY t.pair
    ),
    t{k} AS (SELECT pair, cnt FROM p{k}
             ORDER BY cnt DESC, pair LIMIT 1),
    v{k} AS (
      SELECT term,
             trim(replace(' ' || spaced || ' ',
                          ' ' || (SELECT pair FROM t{k}) || ' ',
                          ' ' || replace((SELECT pair FROM t{k}), ' ', '')
                              || ' ')) AS spaced,
             c
      FROM {prev}
    )"""
    return sql


def _bpe_replay_sql(n_merges: int) -> str:
    selects = [
        f"SELECT {k} AS rank, pair, replace(pair, ' ', '') AS merged, "
        f"CAST(cnt AS BIGINT) AS cnt FROM t{k}"
        for k in range(1, n_merges + 1)
    ]
    return (
        _bpe_chain_sql(n_merges)
        + "\n    "
        + "\n    UNION ALL ".join(selects)
    )


@register("q_bpe_train", _bpe_replay_sql(4))
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four BPE merges learned end-to-end (X64, r6): per step, the
    corpus-weighted pair argmax (ties by pair text) and the exact
    left-to-right merge rewrite. Counts couple to the corpus via
    doc_id % 8 host-word weights. The oracle replays every step as a
    chained CTE — bit-exact iterative tokenizer training."""
    from bi_utils_spark.operators.lm import bpe_train

    dcnt = (
        load(spark, sf_dir, "documents")
        .groupBy((F.col("doc_id") % 8).alias("i"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # Arrow-local frame: the pickled-RDD path costs a Python-worker
    # round trip PER SLICE per consumer — coalesce(1) just serialized
    # those 32 round trips into one task (measured 4.5 s of the 4.6 s
    # wall); one Arrow batch removes the Python boundary entirely
    words = local_df(
        spark, [(w, i) for i, w in enumerate(_BPE_WORDS)], "term string, i long"
    )
    model = words.join(dcnt, "i").select(
        "term", (F.col("n") + (8 - F.col("i")) * 7).alias("c")
    )
    merges, _state = bpe_train(model, 4)
    return merges


@register(
    "q_unicode_stats",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS non_nfc_docs,
           CAST(SUM(CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS mojibake_docs,
           CAST(SUM(CASE WHEN doc_id % 4 = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS invisible_docs
    FROM documents
    """,
)
def q_unicode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus hygiene audit (X63, r6) over the planted fixture: the
    per-class counts follow doc_id % 4 closed-form."""
    from bi_utils_spark.operators.textnorm import unicode_stats

    return unicode_stats(_uni_fixture(spark, sf_dir))
