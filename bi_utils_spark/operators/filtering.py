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
   cross-bucket offsets (and the grand total) come from one bounded
   driver fetch of the ≤ num_buckets bucket totals, prefix-summed and
   baked back as a literal map — no unpartitioned window anywhere in
   the plan;
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

    # Persisted across the two plan-build driver fetches (split
    # points, bucket totals), which would otherwise each re-run the
    # upstream scoring scan — then UNPERSISTED before returning, so
    # repeated calls don't accumulate session-lifetime cached frames
    # (|distinct scores| rows is corpus-sized for continuous scores).
    # Cost of releasing it: the returned rank plan recomputes the
    # counts aggregate once when the consumer executes — one extra
    # scan, bounded, vs. an unbounded storage leak (ADVICE r4).
    counts = df.groupBy(score_col).agg(F.count("*").alias("__cnt")).persist()
    try:
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
            # count of boundaries strictly below the score: monotone in
            # the score, so bucket order == score order; equal scores
            # (and NULLs, which sort first and land in bucket 0) share a
            # bucket. The lambda must only ever compare against the
            # score ATTRIBUTE coming out of the counts aggregate (cheap,
            # per distinct score) — see the offsets comment below for
            # the optimizer hazard when a consumer lets the aggregate
            # collapse.
            bucket = F.size(F.filter(barr, lambda x: x < sc))
        else:
            bucket = F.lit(0)
        b = counts.withColumn("__bk", bucket)
        w_in = (
            Window.partitionBy("__bk")
            .orderBy(score_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        inner = b.withColumn(
            "__within", F.coalesce(F.sum("__cnt").over(w_in), F.lit(0))
        )
        # Cross-bucket offsets and the grand total: ONE bounded driver
        # fetch of the ≤ num_buckets bucket totals, prefix-summed in
        # Python and baked back as a literal map — the same bounded-fetch
        # class as the split points above. A distributed formulation
        # (self-join or window over the totals) leaves a second corpus
        # subtree in the plan, and any consumer that needs only __bk lets
        # column pruning + RemoveRedundantAggregates collapse the counts
        # aggregate and re-inline the raw score EXPRESSION into the bucket
        # lambda over the raw scan — re-evaluated per array element per
        # corpus row, since Catalyst CSE stops at lambda boundaries
        # (measured 38 s vs 0.7 s at sf0.1 on quality_score). The fetch
        # derives from `b` (the aggregate is irreducible there: __cnt is
        # aggregated), never from a keys-only projection.
        btot_rows = sorted(
            b.groupBy("__bk").agg(F.sum("__cnt").alias("__bt")).collect(),
            key=lambda r: r["__bk"],
        )
    finally:
        counts.unpersist()
    total = sum(r["__bt"] for r in btot_rows)
    off_map: dict[int, int] = {}
    off = 0
    for r in btot_rows:
        off_map[r["__bk"]] = off
        off += r["__bt"]
    if off_map:
        boff = F.element_at(
            F.create_map(*[F.lit(x) for kv in off_map.items() for x in kv]),
            F.col("__bk"),
        )
    else:
        boff = F.lit(0)
    below = F.coalesce(boff, F.lit(0)) + F.col("__within")
    pr = (
        F.lit(0.0)
        if total <= 1
        else below.cast("double") / F.lit(float(total - 1))
    )
    # Null-safe equi-join: a NULL score is a legitimate rank group
    # (SQL ranks NULLs first); a plain name-list join would silently
    # DROP those rows (NULL = NULL is never true). eqNullSafe is still
    # an equi-join key for the planner — hash/broadcast, no BNLJ.
    ranked = inner.select(F.col(score_col).alias("__prk"), pr.alias(out_col))
    return df.join(
        ranked, F.col(score_col).eqNullSafe(F.col("__prk")), "inner"
    ).drop("__prk")


def bucketed_distinct_cdf(
    df: DataFrame,
    score_col: str,
    num_buckets: int = 256,
) -> tuple[DataFrame, int]:
    """(cdf, total_rows): the exact CDF over DISTINCT non-null values
    of ``score_col``, computed with the same range-bucketed two-level
    discipline as :func:`attach_percent_rank` — no unpartitioned
    window anywhere, so the plan stays parallel even when the value is
    continuous and |distinct| ≈ |corpus|.

    ``cdf`` has one row per distinct value: ``__v`` (the value),
    ``__c`` (its row count), ``__start`` (exclusive cumulative count
    of rows with strictly smaller values — 0-based position of the
    value's first copy in the sorted corpus). ``total_rows`` is the
    non-null row count, returned as a plain int (it falls out of the
    same bounded bucket-totals fetch that builds the offsets).

    Numeric values are range-bucketed via one bounded driver
    aggregate (~``num_buckets`` approximate split points baked as
    literals — placement only steers parallelism, the arithmetic is
    exact for any boundaries); non-numeric values fall back to one
    bucket (distinct values of a non-numeric column are assumed
    bounded). Shared by :func:`winsorize` and
    ``histogram.equi_depth_histogram``.
    """
    from pyspark.sql.types import NumericType

    v = F.col(score_col)
    # Persisted across the two plan-build driver fetches (split
    # points, bucket totals); unpersisted before returning — same
    # bounded-cache discipline as attach_percent_rank (ADVICE r4).
    vals = (
        df.where(v.isNotNull())
        .groupBy(v.alias("__v"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .persist()
    )
    try:
        bounds: list[float] = []
        if (
            isinstance(df.schema[score_col].dataType, NumericType)
            and num_buckets > 1
        ):
            probs = [i / num_buckets for i in range(1, num_buckets)]
            qrow = vals.agg(
                F.percentile_approx(
                    F.col("__v").cast("double"), probs, 100
                ).alias("q")
            ).first()
            bounds = sorted({b for b in (qrow["q"] or []) if b is not None})
        if bounds:
            barr = F.array(*[F.lit(float(b)) for b in bounds])
            sc = F.col("__v").cast("double")
            bucket = F.size(F.filter(barr, lambda x: x < sc))
        else:
            bucket = F.lit(0)
        b = vals.withColumn("__bk", bucket)
        w_in = (
            Window.partitionBy("__bk")
            .orderBy("__v")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        inner = b.withColumn(
            "__within", F.coalesce(F.sum("__c").over(w_in), F.lit(0))
        )
        # ≤ num_buckets rows: bounded driver fetch, prefix-summed and
        # baked back as a literal map (see attach_percent_rank for why
        # a distributed formulation is worse here).
        btot_rows = sorted(
            b.groupBy("__bk").agg(F.sum("__c").alias("__bt")).collect(),
            key=lambda r: r["__bk"],
        )
    finally:
        vals.unpersist()
    total = int(sum(r["__bt"] for r in btot_rows))
    off_map: dict[int, int] = {}
    off = 0
    for r in btot_rows:
        off_map[r["__bk"]] = off
        off += r["__bt"]
    if off_map:
        boff = F.element_at(
            F.create_map(*[F.lit(x) for kv in off_map.items() for x in kv]),
            F.col("__bk"),
        )
    else:
        boff = F.lit(0)
    cdf = inner.select(
        "__v",
        "__c",
        (F.coalesce(boff, F.lit(0)) + F.col("__within"))
        .cast("long")
        .alias("__start"),
    )
    return cdf, total


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


def winsorize(
    df: DataFrame,
    score_col: str,
    lo_q: float = 0.01,
    hi_q: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """Clip (not drop) values outside the exact [lo_q, hi_q] rank
    quantiles (X95) — metric hygiene before means/tests: one fat
    outlier otherwise owns a mean at any corpus size.

    Thresholds are EXACT rank quantiles (value at ceil(q·n)) off the
    distinct-value CDF, computed via :func:`bucketed_distinct_cdf` —
    the range-bucketed two-level discipline, so no unpartitioned
    window even when the metric is continuous and |distinct| ≈ n
    (the r6 verdict's scale finding: the old form ordered ONE window
    over the whole distinct-value table). Thresholds broadcast back
    as a 1-row frame; the clip itself is a map-only least/greatest.
    Engine-replayable because thresholds are actual data values, not
    interpolations.
    """
    import math

    out_col = out_col or f"{score_col}_wins"
    v = F.col(score_col)
    cdf, n = bucketed_distinct_cdf(df, score_col)
    # value at rank ceil(q*n): min __v whose inclusive cumulative
    # count (__start + __c) reaches the cut. Python's ceil over the
    # same IEEE double product matches the SQL CEIL the oracle runs.
    lo_cut = int(math.ceil(lo_q * n))
    hi_cut = int(math.ceil(hi_q * n))
    thr = cdf.agg(
        F.min(
            F.when(
                F.col("__start") + F.col("__c") >= F.lit(lo_cut), F.col("__v")
            )
        ).alias("__lo"),
        F.min(
            F.when(
                F.col("__start") + F.col("__c") >= F.lit(hi_cut), F.col("__v")
            )
        ).alias("__hi"),
    )
    return (
        df.crossJoin(F.broadcast(thr))
        .withColumn(
            out_col,
            # greatest/least skip NULLs, which would clip a NULL to
            # the lower threshold — gate explicitly
            F.when(
                v.isNotNull(),
                F.least(F.greatest(v, F.col("__lo")), F.col("__hi")),
            ),
        )
        .drop("__lo", "__hi")
    )
