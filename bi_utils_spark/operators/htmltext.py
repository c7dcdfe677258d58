"""HTML → text extraction for web-corpus curation (X59).

The step between a raw crawl and every text operator in this repo
(quality scoring, dedup, language ID all assume visible TEXT): drop
non-content blocks (head/script/style/comments), strip tags, decode
the standard character entities, normalize whitespace — plus title
and outlink extraction for metadata and link-graph curation.

Everything is Column expressions (regexp_replace / regexp_extract /
regexp_extract_all — JVM-side, codegen, zero Python), so the tier is
map-only like the URL tier it composes with. Patterns stay in the
RE2-compatible subset (no backreferences, no lookaround; lazy
quantifiers and inline (?is) flags are RE2-safe) so the same
semantics replay in the DuckDB oracles — the repo-wide cross-engine
regex discipline.

Semantics contract (what the oracle fixtures pin down):
- head/script/style blocks and comments vanish BEFORE tag stripping,
  so a ``<`` inside JavaScript (``if (1 < 2)``) cannot derail the
  tag pattern;
- every remaining tag becomes ONE space (tag boundaries are
  whitespace — the CCNet-style quick extractor, not a DOM renderer);
- entities decode after tag stripping (&amp; LAST so ``&amp;lt;``
  cannot double-decode), then whitespace collapses to single spaces.

Reference: Flaconi/bi_utils has no web tier (north-star surface,
same as X42–X58).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Non-content blocks removed wholesale (RE2 has no backreferences, so
# one pattern per element instead of <(head|script|style)>.*?</\1>).
_BLOCK_PATTERNS = (
    r"(?is)<head[^>]*>.*?</head>",
    r"(?is)<script[^>]*>.*?</script>",
    r"(?is)<style[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
)

# Entity decode order matters: &amp; must be LAST or '&amp;lt;' would
# double-decode into '<'.
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def strip_html(html: Column | str) -> Column:
    """Visible text of an HTML column: non-content blocks removed,
    tags → single spaces, standard entities decoded, whitespace
    collapsed and trimmed. One codegen projection."""
    c = F.col(html) if isinstance(html, str) else html
    for pat in _BLOCK_PATTERNS:
        c = F.regexp_replace(c, pat, "")
    c = F.regexp_replace(c, r"<[^>]*>", " ")
    for ent, rep in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def html_title(html: Column | str) -> Column:
    """Text of the first <title> element ('' when absent), entities
    decoded, whitespace collapsed — extracted BEFORE head-stripping
    (the title lives in <head>, which strip_html drops)."""
    c = F.col(html) if isinstance(html, str) else html
    t = F.regexp_extract(c, r"(?is)<title[^>]*>(.*?)</title>", 1)
    for ent, rep in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def html_links(html: Column | str) -> Column:
    """Array of href targets of <a> elements, in document order —
    the outlink list a link-graph / domain-curation pass feeds to
    weburl.registered_domain."""
    c = F.col(html) if isinstance(html, str) else html
    return F.regexp_extract_all(
        c, F.lit(r'(?i)<a\s[^>]*href="([^"]*)"'), F.lit(1)
    )


def attach_html_columns(df: DataFrame, html_col: str = "html") -> DataFrame:
    """df + (title, text, links) — the extraction projection a crawl
    pipeline runs once, after which only TEXT flows downstream (the
    fat html column prunes out of every later scan). Map-only."""
    return df.withColumns(
        {
            "title": html_title(html_col),
            "text": strip_html(html_col),
            "links": html_links(html_col),
        }
    )


def outlink_domains(
    df: DataFrame,
    html_col: str = "html",
    psl: DataFrame | None = None,
) -> DataFrame:
    """(domain, n_links, n_docs) — outlink pressure per registered
    TARGET domain across the corpus: the link-graph side of domain
    curation (which domains does the crawl point AT). Explode is
    per-document-bounded (links per page, not corpus-sized); the one
    aggregation partial-aggregates map-side like domain_stats."""
    from bi_utils_spark.operators.weburl import (
        attach_registered_domain,
        canonical_host,
        url_parts,
    )

    # key the doc identity BEFORE explode so n_docs counts source
    # documents, not link rows
    links = df.withColumn(
        "__doc", F.monotonically_increasing_id()
    ).select("__doc", F.explode(html_links(html_col)).alias("__url"))
    tagged = attach_registered_domain(
        links.withColumn("__host", canonical_host(url_parts("__url")["host"])),
        "__host",
        psl=psl,
        out_col="__dom",
    )
    return (
        tagged.groupBy(F.col("__dom").alias("domain"))
        .agg(
            F.count("*").alias("n_links"),
            F.countDistinct("__doc").alias("n_docs"),
        )
    )
