"""Sentence segmentation (X66).

Parallel-corpus mining (X52 bitext), context-window chunking (X10)
and quality filters all want SENTENCE units, not documents. This is
the light-weight rule tier used by the big public pipelines (CCNet,
ParaCrawl's first pass): split after terminal punctuation followed by
whitespace, keep the terminator with its sentence, guard common
abbreviation traps. Everything is Column regexps in the RE2-safe
subset (no lookbehind/lookahead), so the DuckDB oracles replay the
exact same patterns — and the plan stays map-only, zero Python.

Mechanics: a control character (U+001E, record separator — stripped
from real text by the X63 hygiene tier upstream) is injected after
sentence-terminal punctuation, then one split. Guards un-inject the
marker after known abbreviations and initials, anchored on ``\\b``
BEFORE the abbreviation (never consuming the preceding character),
so consecutive guarded tokens ("J. R. Smith") resolve in one global
pass — no overlap ambiguity. This is a heuristic tier by design;
callers needing ML-grade segmentation plug it behind the same
(doc_id, sent_idx, sentence) contract.

Reference: Flaconi/bi_utils has no text tier (north-star surface,
same as X57-X65).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# record separator; X63 strip_invisible removes it from real text
_SEP = "\x1e"

# abbreviations whose trailing '.' must not end a sentence
# (regex-escaped where needed)
_ABBREVS = (
    "Mr", "Mrs", "Ms", "Dr", "Prof", "St", "Jr", "Sr",
    "vs", "etc", "e\\.g", "i\\.e", "cf", "al", "Inc", "Ltd", "Co",
    "No", "Vol", "Fig", "Eq",
)


def split_sentences(col: Column | str) -> Column:
    """array<string> of sentences: split after runs of ``.!?``
    (terminator stays with its sentence) when followed by
    whitespace; single-letter initials ("J. Smith") and common
    abbreviations ("Dr. Who", "e.g. this") do NOT split. Leading/
    trailing whitespace is trimmed per sentence; empty pieces drop.
    """
    c = F.col(col) if isinstance(col, str) else col
    # inject the marker after terminal punctuation + whitespace
    marked = F.regexp_replace(c, r"([.!?]+)\s+", "$1" + _SEP)
    # un-inject after single-letter initials ("J." before a name)
    marked = F.regexp_replace(marked, r"\b([A-Za-z]\.)" + _SEP, "$1 ")
    # un-inject after known abbreviations (one alternation pass)
    marked = F.regexp_replace(
        marked,
        r"\b((?:" + "|".join(_ABBREVS) + r")\.)" + _SEP,
        "$1 ",
    )
    parts = F.split(marked, _SEP, -1)
    return F.filter(
        F.transform(parts, lambda s: F.trim(s)), lambda s: s != ""
    )


def split_sentences_sql(text_sql: str) -> str:
    """DuckDB-SQL replay of :func:`split_sentences` over the
    expression ``text_sql`` — the same three regexps and split, for
    cross-engine oracles. The separator is embedded as the RAW U+001E
    character (DuckDB replacement strings do not interpret ``\\x``
    escapes). Returns a VARCHAR[] expression."""
    abbrev = "|".join(_ABBREVS)
    sep = _SEP  # raw control char, legal inside SQL string literals
    return (
        "list_filter(list_transform(string_split("
        f"regexp_replace(regexp_replace(regexp_replace({text_sql},"
        f" '([.!?]+)\\s+', '\\1{sep}', 'g'),"
        f" '\\b([A-Za-z]\\.){sep}', '\\1 ', 'g'),"
        f" '\\b((?:{abbrev})\\.){sep}', '\\1 ', 'g'),"
        f" '{sep}'), s -> trim(s)), s -> s <> '')"
    )


def explode_sentences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 1,
) -> DataFrame:
    """(doc_id, sent_idx, sentence) rows in document order —
    the unit table bitext mining / sentence dedup consume. Map-only
    posexplode; ``min_chars`` drops fragments (default keeps all)."""
    out = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(split_sentences(text_col)).alias(
            "sent_idx", "sentence"
        ),
    )
    if min_chars > 1:
        out = out.where(F.length("sentence") >= min_chars)
    return out


def sentence_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc segmentation profile: sentence count, mean/max
    sentence length in chars — the Gopher-style doc-shape signals at
    sentence granularity. One map-only projection (array arithmetic
    on the split — no explode, no shuffle)."""
    sents = split_sentences(text_col)
    lens = F.transform(sents, lambda s: F.length(s))
    n = F.size(sents)
    total = F.aggregate(lens, F.lit(0).cast("long"), lambda a, x: a + x)
    return df.select(
        F.col(id_col).alias("doc_id"),
        n.cast("int").alias("n_sentences"),
        F.when(n > 0, (total.cast("double") / n))
        .otherwise(F.lit(0.0))
        .alias("mean_sentence_chars"),
        F.coalesce(F.array_max(lens), F.lit(0))
        .cast("int")
        .alias("max_sentence_chars"),
    )
