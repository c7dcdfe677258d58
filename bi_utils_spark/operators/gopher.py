"""Gopher document-quality rules (X67).

The rule set from Rae et al. 2021 (Gopher, §A1.1) — the de-facto
standard first-pass filter for web-scale training corpora, reused by
MassiveText/RefinedWeb/Dolma-style pipelines. Each rule is a boolean
column; ``gopher_flags`` attaches all of them plus the conjunction,
``gopher_filter`` keeps passing docs. Splitting the verdict into
per-rule flags matters operationally: curation debugging is "which
rule killed 40% of my corpus", not "keep=false".

Rules implemented here (all map-only Column arithmetic — arrays,
regexps, HOF folds; zero Python, zero shuffles):

- word count in [min_words, max_words]            (50 .. 100k)
- mean word length in [3, 10]
- symbol-to-word ratio ('#' or '…') <= 0.1
- bullet-started lines <= 90%, ellipsis-ended lines <= 30%
- >= 80% of words contain at least one alphabetic character
- >= 2 of the 8 English function words present ("the, be, to, of,
  and, that, have, with" — the paper's stop-word sanity check)

The paper's repetition rules (dup line/paragraph fraction, top-n-gram
mass) live in ``textstats.repetition_stats`` — compose them after
this tier; they need per-doc array builds this projection avoids.

Reference: Flaconi/bi_utils has no text tier (north-star surface,
same as X57-X66); thresholds follow the published table, overridable
per deployment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _words(c: Column) -> Column:
    """Whitespace words of the raw text (case preserved — the alpha
    test is case-insensitive anyway), empty tokens dropped so blank
    text counts zero words."""
    return F.filter(
        F.split(F.trim(c), r"\s+", -1), lambda w: w != ""
    )


def gopher_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Attach the Gopher rule columns + ``gopher_keep`` (their AND).

    Emitted flags: ``ok_word_count``, ``ok_mean_word_len``,
    ``ok_symbol_ratio``, ``ok_bullet_lines``, ``ok_ellipsis_lines``,
    ``ok_alpha_words``, ``ok_stopwords``. One map-only projection.
    """
    t = F.col(text_col)
    # Stage the two split+filter arrays as named columns: every flag
    # below references them, and withColumn-chained flag expressions
    # would otherwise re-split the text once PER FLAG (CollapseProject
    # keeps multiply-referenced non-trivial aliases staged — the
    # repetition_stats pattern; guide §1.2, don't compute things
    # twice). Same expressions, evaluated once per document.
    df = df.select(
        "*",
        _words(t).alias("__gopher_words"),
        F.filter(
            F.split(t, r"\n", -1), lambda l: F.trim(l) != ""
        ).alias("__gopher_lines"),
    )
    words = F.col("__gopher_words")
    lines = F.col("__gopher_lines")
    n_words = F.size(words)
    total_chars = F.aggregate(
        F.transform(words, lambda w: F.length(w)),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    mean_len = F.when(
        n_words > 0, total_chars.cast("double") / n_words
    ).otherwise(F.lit(0.0))
    # translate counts the same '#'/'…' chars the regex did, without
    # the regex engine (guide §4.1)
    n_symbols = (
        F.length(t) - F.length(F.translate(t, "#…", ""))
    )
    symbol_ratio = F.when(
        n_words > 0, n_symbols.cast("double") / n_words
    ).otherwise(F.lit(0.0))
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]"))
        ).cast("double")
        / n_lines,
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines,
                lambda l: F.trim(l).rlike(r"(\.\.\.|…)$"),
            )
        ).cast("double")
        / n_lines,
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n_words > 0,
        F.size(
            F.filter(words, lambda w: w.rlike(r"[A-Za-z]"))
        ).cast("double")
        / n_words,
    ).otherwise(F.lit(0.0))
    from bi_utils_spark.functions.litarrays import lit_string_array

    lower_words = F.transform(words, lambda w: F.lower(w))
    stop_hits = F.size(
        F.filter(
            lit_string_array(GOPHER_STOPWORDS),
            lambda s: F.array_contains(lower_words, s),
        )
    )
    out = df.withColumn("n_words", n_words.cast("int"))
    flags = {
        "ok_word_count": (n_words >= min_words)
        & (n_words <= max_words),
        "ok_mean_word_len": (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "ok_symbol_ratio": symbol_ratio <= max_symbol_ratio,
        "ok_bullet_lines": bullet_frac <= max_bullet_frac,
        "ok_ellipsis_lines": ellipsis_frac <= max_ellipsis_frac,
        "ok_alpha_words": alpha_frac >= min_alpha_word_frac,
        "ok_stopwords": stop_hits >= min_stopword_hits,
    }
    keep = F.lit(True)
    for name, col in flags.items():
        out = out.withColumn(name, col)
        keep = keep & col
    return out.withColumn("gopher_keep", keep).drop(
        "__gopher_words", "__gopher_lines"
    )


def gopher_filter(df: DataFrame, text_col: str = "text", **kw) -> DataFrame:
    """Keep documents passing every Gopher rule; flag columns are
    dropped (use :func:`gopher_flags` to audit)."""
    flagged = gopher_flags(df, text_col, **kw)
    drop = [c for c in flagged.columns if c.startswith("ok_")]
    return (
        flagged.where(F.col("gopher_keep"))
        .drop("gopher_keep", "n_words", *drop)
    )


def gopher_report(df: DataFrame, text_col: str = "text", **kw) -> DataFrame:
    """One-row corpus audit: docs, keep count, and per-rule kill
    counts (docs failing that rule) — the curation-debugging view.
    One partial-aggregable pass over the flags projection."""
    flagged = gopher_flags(df, text_col, **kw)
    rules = [c for c in flagged.columns if c.startswith("ok_")]
    aggs = [F.count(F.lit(1)).alias("docs")]
    aggs.append(
        F.sum(F.col("gopher_keep").cast("long")).alias("kept")
    )
    for r in rules:
        aggs.append(
            F.sum((~F.col(r)).cast("long")).alias(r.replace("ok_", "fail_"))
        )
    return flagged.agg(*aggs)
