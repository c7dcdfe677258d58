"""Text-analysis operators for LLM data pipelines (SURVEY.md §2.14 X5).

All hot-path expressions are native Spark SQL functions — tokenize,
count, ratio, and fingerprint run inside whole-stage codegen with zero
Python. At 100 TB these are embarrassingly parallel map-side
projections over the document scan: no shuffle except the explicit
``groupBy`` aggregations, which combine map-side first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnOrName = Column | str

# Minimal per-language function-word lists for the heuristic
# language-ID scorer. Deliberately tiny: the operator demonstrates the
# scoring plumbing; swap in real profiles (e.g. full stopword tables
# broadcast as a map) for production accuracy.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "es": ("el", "la", "de", "que", "y", "es"),
    "fr": ("le", "la", "et", "les", "des", "est"),
    "zh": ("的", "是", "不", "了", "在", "我"),
}


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(c: ColumnOrName) -> Column:
    """Whitespace tokenization of lowercased, trimmed text."""
    return F.split(F.trim(F.lower(_col(c))), r"\s+")


def token_count(c: ColumnOrName) -> Column:
    """Whitespace token count."""
    return F.size(tokens(c))


def word_token_count(c: ColumnOrName) -> Column:
    """BPE-ish token count: word pieces + digits + punctuation runs
    counted separately (a cheap proxy for subword tokenizer load)."""
    return F.size(
        F.regexp_extract_all(
            F.lower(_col(c)), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0)
        )
    )


def punct_ratio(c: ColumnOrName) -> Column:
    """Non-alphanumeric-non-space chars / total chars (0 for empty)."""
    c = _col(c)
    total = F.length(c)
    punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(
        punct.cast("double") / total.cast("double")
    )


def stopword_ratio(c: ColumnOrName, stopwords: Sequence[str]) -> Column:
    """Fraction of tokens that are stopwords."""
    toks = tokens(c)
    sw = F.array(*[F.lit(w) for w in stopwords])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / n.cast("double")
    )


def mean_word_length(c: ColumnOrName) -> Column:
    """Average token length in characters (0 for empty)."""
    toks = tokens(c)
    n = F.size(toks)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return F.when(n == 0, F.lit(0.0)).otherwise(
        total.cast("double") / n.cast("double")
    )


def quality_score(
    c: ColumnOrName,
    min_tokens: int = 20,
    max_punct_ratio: float = 0.2,
    stopwords: Sequence[str] = LANG_MARKERS["en"],
) -> Column:
    """Composite quality heuristic in [0, 1]: length gate, punctuation
    gate, stopword-presence signal — the C4-style gating used by
    pretraining-data filters, as one codegen'd expression."""
    length_ok = (token_count(c) >= min_tokens).cast("double")
    punct_ok = (punct_ratio(c) <= max_punct_ratio).cast("double")
    sw = stopword_ratio(c, stopwords)
    sw_signal = F.least(sw * 5.0, F.lit(1.0))  # saturates at 20% stopwords
    return (length_ok + punct_ok + sw_signal) / 3.0


def language_scores(c: ColumnOrName) -> dict[str, Column]:
    """Per-language marker-hit counts (the n-gram-profile heuristic
    reduced to function-word profiles)."""
    toks = tokens(c)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in markers])
        out[lang] = F.size(F.array_intersect(toks, arr))
    return out


def language_id(c: ColumnOrName, default: str = "und") -> Column:
    """Argmax language by marker hits; ``default`` when no marker hits.

    Ties break by language code order (deterministic). Pure Column
    expression — a broadcast-free, shuffle-free classifier.
    """
    scores = language_scores(c)
    best_lang: Column = F.lit(default)
    best_score: Column = F.lit(0)
    for lang in sorted(scores):  # later greater-than keeps first max
        s = scores[lang]
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def content_fingerprint(c: ColumnOrName) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted
    distinct token set. Identical token multisets-modulo-order map to
    one fingerprint — the cheap first stage of near-dup detection
    (full MinHash lives in ``dedup``)."""
    return F.md5(
        F.array_join(F.array_sort(F.array_distinct(tokens(c))), " ")
    )


def text_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One-pass per-document stat panel (all codegen'd)."""
    return df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        word_token_count(text_col).alias("n_word_tokens"),
        F.length(F.col(text_col)).alias("n_chars_measured"),
        punct_ratio(text_col).alias("punct_ratio"),
        mean_word_length(text_col).alias("mean_word_len"),
        content_fingerprint(text_col).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# Repetition metrics (Gopher-style quality signals): duplicate lines,
# duplicate n-grams, most-frequent-n-gram mass. All map-only codegen
# expressions over per-document arrays — no shuffle, no Python. The
# classic explode+groupBy formulation would shuffle the whole token
# stream (~corpus size × n); folding over per-document sorted arrays
# keeps repetition analysis embarrassingly parallel at 100 TB.
# ---------------------------------------------------------------------------


def grams(toks: Column, n: int, sep: str = " ") -> Column:
    """Non-distinct n-gram strings of a token-array column; empty array
    when the document has fewer than ``n`` tokens. (Distinct shingle
    variant: ``dedup.token_shingles``.)"""
    last = F.size(toks) - (n - 1)
    return F.when(last <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), last),
            lambda i: F.array_join(F.slice(toks, i, n), sep),
        )
    )


def _dup_frac(arr: Column) -> Column:
    """1 − |distinct| / |all| (0.0 for empty arrays)."""
    tot = F.size(arr)
    return F.when(tot == 0, F.lit(0.0)).otherwise(
        F.lit(1.0)
        - F.size(F.array_distinct(arr)).cast("double") / tot.cast("double")
    )


def _dup_char_frac(arr: Column) -> Column:
    """1 − chars(distinct) / chars(all): fraction of characters sitting
    in repeat occurrences (0.0 when the array holds no characters)."""
    chars = lambda a: F.aggregate(  # noqa: E731
        F.transform(a, F.length), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    tot = chars(arr)
    return F.when((tot.isNull()) | (tot == 0), F.lit(0.0)).otherwise(
        F.lit(1.0) - chars(F.array_distinct(arr)).cast("double") / tot.cast("double")
    )


def _max_run(sorted_arr: Column) -> Column:
    """Length of the longest run of equal neighbours in a sorted array
    = the count of its most frequent element. Single fold, codegen'd."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc, x):
        run = F.when(
            acc.getField("prev").isNotNull() & (x == acc.getField("prev")),
            acc.getField("run") + 1,
        ).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc.getField("best"), run).alias("best"),
        )

    return F.aggregate(sorted_arr, zero, step, lambda acc: acc.getField("best"))


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition panel:

    - ``dup_line_frac`` / ``dup_line_char_frac`` — fraction of lines /
      line-characters that are repeats of an earlier identical line;
    - ``dup_5gram_frac`` — fraction of token 5-grams that are repeats;
    - ``top_2gram_frac`` — mass of the most frequent token 2-gram.

    The Gopher filters gate on exactly these (e.g. drop when
    dup_line_frac > 0.30 or top_2gram_frac > 0.20). Arrays are staged
    as named columns between selects so tokenization runs once per
    document (CollapseProject leaves multiply-referenced non-trivial
    aliases staged)."""
    staged = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(text_col).alias("_toks"),
        F.split(F.col(text_col), "\n").alias("_lines"),
    )
    arrs = staged.select(
        "doc_id",
        "_lines",
        grams(F.col("_toks"), 2).alias("_g2"),
        grams(F.col("_toks"), 5).alias("_g5"),
    )
    g2_tot = F.size(F.col("_g2"))
    top2 = _max_run(F.array_sort(F.col("_g2")))
    return arrs.select(
        "doc_id",
        _dup_frac(F.col("_lines")).alias("dup_line_frac"),
        _dup_char_frac(F.col("_lines")).alias("dup_line_char_frac"),
        _dup_frac(F.col("_g5")).alias("dup_5gram_frac"),
        F.when(g2_tot == 0, F.lit(0.0))
        .otherwise(top2.cast("double") / g2_tot.cast("double"))
        .alias("top_2gram_frac"),
    )
