"""Score-quantile corpus filtering — "keep the top X% by quality".

The curation step after scoring (textstats.quality_score,
lm.unigram_logprob_scores): select rows by their rank position in the
corpus-wide score distribution rather than by a fixed threshold that
drifts with the corpus mix.

Scale shape — the naive plan (percent_rank window over the whole
corpus) is a single-partition global sort, a non-starter at 100 TB.
Instead the exact path computes a TWO-LEVEL CDF over DISTINCT scores
(the same bucket-then-prefix discipline as mixing.py's
mixture_sample_bucketed), which stays parallel even when the score is
continuous and |distinct| ≈ |corpus| (e.g. per-doc avg_logprob):

1. ``groupBy(score)`` count — one shuffle, map-side partials; output
   is |distinct scores| rows;
2. one bounded driver aggregate fetches ~``num_buckets`` approximate
   split points over the distinct-score table (the sampling job
   Spark's own range partitioner would run) and bakes them into the
   plan as literals — bucket placement only steers parallelism, the
   rank arithmetic is exact for ANY boundaries;
3. per-bucket cumulative counts run in parallel partitioned windows;
   cross-bucket offsets come from a broadcast self-join over the
   ≤ num_buckets bucket totals — no single-partition window anywhere;
4. rows join back on score (AQE picks broadcast when the kept-score
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
    df: DataFrame, score_col: str, out_col: str = "pr", num_buckets: int = 256
) -> DataFrame:
    """df + exact SQL ``percent_rank`` of ``score_col`` over the whole
    frame, computed without a corpus-wide sort OR a single-partition
    window (see module docstring). Numeric scores are range-bucketed
    via one bounded driver aggregate (~``num_buckets`` approximate
    split points, baked as literals — deterministic downstream plan);
    non-numeric scores fall back to one bucket (distinct values of a
    non-numeric score are assumed bounded). Single-row frames get
    rank 0 (the SQL convention)."""
    from pyspark.sql.types import NumericType

    counts = df.groupBy(score_col).agg(F.count("*").alias("__cnt"))
    bounds: list[float] = []
    if isinstance(df.schema[score_col].dataType, NumericType) and num_buckets > 1:
        probs = [i / num_buckets for i in range(1, num_buckets)]
        qrow = counts.agg(
            F.percentile_approx(
                F.col(score_col).cast("double"), probs, 100
            ).alias("q")
        ).first()
        bounds = sorted({b for b in (qrow["q"] or []) if b is not None})
    if bounds:
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        sc = F.col(score_col).cast("double")
        # count of boundaries strictly below the score: monotone in the
        # score, so bucket order == score order; equal scores (and
        # NULLs, which sort first and land in bucket 0) share a bucket.
        bucket = F.size(F.filter(barr, lambda x: x < sc))
    else:
        bucket = F.lit(0)
    b = counts.withColumn("__bk", bucket)
    w_in = (
        Window.partitionBy("__bk")
        .orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    inner = b.withColumn("__within", F.coalesce(F.sum("__cnt").over(w_in), F.lit(0)))
    # cross-bucket offsets via a broadcast self-join over the bucket
    # totals (≤ num_buckets rows) — O(num_buckets²) trivial work that
    # avoids the one no-partition window the prefix would need.
    btot = b.groupBy("__bk").agg(F.sum("__cnt").alias("__bt"))
    lo = btot.select(F.col("__bk").alias("__bk_lo"), F.col("__bt").alias("__bt_lo"))
    boff = (
        btot.join(F.broadcast(lo), F.col("__bk_lo") < F.col("__bk"), "left")
        .groupBy("__bk")
        .agg(F.coalesce(F.sum("__bt_lo"), F.lit(0)).alias("__boff"))
    )
    cum = inner.join(F.broadcast(boff), "__bk").select(
        score_col,
        (F.col("__boff") + F.col("__within")).alias("__below"),
    )
    # total as a broadcast one-row aggregate
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
