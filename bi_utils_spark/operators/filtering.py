"""Score-quantile corpus filtering — "keep the top X% by quality".

The curation step after scoring (textstats.quality_score,
lm.unigram_logprob_scores): select rows by their rank position in the
corpus-wide score distribution rather than by a fixed threshold that
drifts with the corpus mix.

Scale shape — the naive plan (percent_rank window over the whole
corpus) is a single-partition global sort, a non-starter at 100 TB.
Instead the exact path computes the CDF over DISTINCT scores:

1. ``groupBy(score)`` count — one shuffle, map-side partials; output
   is |distinct scores| rows (quality scores are low-cardinality by
   construction: bounded ratios, quantized components);
2. a window over those distinct rows orders scores once — the sort
   touches |distinct scores| rows, not corpus rows;
3. rows join back on score (AQE picks broadcast when the kept-score
   set is small). Corpus rows are never globally sorted.

Ties share a rank by definition (SQL ``percent_rank`` semantics:
rows-strictly-below / (n − 1)), so the kept set is deterministic and
engine-portable — the DuckDB oracle's ``percent_rank() OVER (ORDER BY
score)`` computes the identical value.

For monotone pipelines that only need an approximate cut,
:func:`quantile_thresholds` gives the one-pass sketch path
(``percentile_approx``) whose thresholds broadcast into a map-only
filter — no join at all.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def attach_percent_rank(
    df: DataFrame, score_col: str, out_col: str = "pr"
) -> DataFrame:
    """df + exact SQL ``percent_rank`` of ``score_col`` over the whole
    frame, computed without a corpus-wide sort (see module docstring).
    Single-row frames get rank 0 (the SQL convention)."""
    counts = df.groupBy(score_col).agg(F.count("*").alias("__cnt"))
    w = (
        Window.orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = counts.select(
        score_col,
        F.coalesce(F.sum("__cnt").over(w), F.lit(0)).alias("__below"),
    )
    # total as a broadcast one-row aggregate — fully lazy, no driver
    # action at plan-build time
    tot = df.agg(F.count("*").alias("__total"))
    pr = F.when(F.col("__total") <= 1, F.lit(0.0)).otherwise(
        F.col("__below").cast("double") / (F.col("__total") - 1).cast("double")
    )
    ranked = cum.crossJoin(F.broadcast(tot)).select(
        score_col, pr.alias(out_col)
    )
    return df.join(ranked, score_col)


def filter_by_score_quantile(
    df: DataFrame,
    score_col: str,
    min_q: float = 0.0,
    max_q: float = 1.0,
) -> DataFrame:
    """Rows whose exact percent-rank lies in [min_q, max_q] — e.g.
    ``min_q=0.5`` keeps the top half by score, ties included the way
    SQL ranks them. Columns pass through unchanged."""
    if not 0.0 <= min_q <= max_q <= 1.0:
        raise ValueError("need 0 <= min_q <= max_q <= 1")
    out = attach_percent_rank(df, score_col, "__pr")
    return out.filter(
        (F.col("__pr") >= min_q) & (F.col("__pr") <= max_q)
    ).drop("__pr")


def quantile_thresholds(
    df: DataFrame,
    score_col: str,
    probs: Sequence[float],
    relative_error: float = 1e-4,
) -> list[float]:
    """Approximate score thresholds at the given quantiles — the
    sketch path (Greenwald–Khanna via ``percentile_approx``): one
    aggregation pass, bounded driver result, then filter map-side
    with the returned constants. Use when an ε-approximate cut is
    acceptable (it usually is at 100 TB)."""
    row = df.agg(
        F.percentile_approx(
            score_col, list(probs), int(1.0 / relative_error)
        ).alias("q")
    ).first()
    return list(row["q"])


def filter_by_approx_quantile(
    df: DataFrame,
    score_col: str,
    min_q: float = 0.0,
    max_q: float = 1.0,
    relative_error: float = 1e-4,
) -> DataFrame:
    """Map-only quantile filter using sketched thresholds: one agg
    pass to get the cut points, then a scan-fused range predicate.
    The 100 TB default; swap in :func:`filter_by_score_quantile`
    when the boundary must be exact."""
    lo, hi = quantile_thresholds(df, score_col, [min_q, max_q], relative_error)
    return df.filter((F.col(score_col) >= lo) & (F.col(score_col) <= hi))
