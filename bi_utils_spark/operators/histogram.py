"""Histograms: equi-width and equi-depth binning (X76).

Column profiling for BI dashboards and for choosing partition/bucket
boundaries at scale. Two constructions:

- :func:`equi_width_histogram` — fixed-width bins over [lo, hi]
  (bounds from the data via one bounded agg, or pinned). Emits the
  COMPLETE bin grid — empty bins are explicit zeros (the
  resample_counts discipline: a missing bar is a signal, not an
  absent row). Bin arithmetic is plain IEEE double floor-division,
  identical across engines.
- :func:`equi_depth_histogram` — ~equal-count bins. The assignment
  runs over the DISTINCT-value CDF (one groupBy + one window over
  |distinct| rows, never a corpus-wide sort — the
  filtering.py::attach_percent_rank discipline) with pure integer
  arithmetic: value v starts at cumulative position c, lands in
  bucket (c * num_bins) div total. Ties keep all copies of a value
  in one bucket (the only honest choice: a value cannot straddle a
  boundary), so depths are equal up to tie mass.

Scale shape: both histograms aggregate the corpus exactly once
(partial-aggregable groupBy). The width grid is a sequence explode
off the broadcast bounds row; the depth window runs over distinct
values only. No NTILE-over-corpus, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equi_width_histogram(
    df: DataFrame,
    col: str,
    num_bins: int,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """(bin, bin_lo, bin_hi, n) over the complete 0..num_bins-1 grid.

    Bounds default to the column's min/max (one bounded agg,
    broadcast). Rows outside a PINNED [lo, hi] are dropped (a pinned
    axis is a reporting window); x == hi lands in the last bin.
    NULLs never count.
    """
    if num_bins < 1:
        raise ValueError("num_bins must be >= 1")
    x = F.col(col).cast("double")
    src = df.where(x.isNotNull())
    if lo is None or hi is None:
        bounds = src.agg(
            F.min(x).alias("__lo"), F.max(x).alias("__hi")
        )
    else:
        bounds = src.sparkSession.range(1).select(
            F.lit(float(lo)).alias("__lo"), F.lit(float(hi)).alias("__hi")
        )
    with_b = src.crossJoin(F.broadcast(bounds)).where(
        (x >= F.col("__lo")) & (x <= F.col("__hi"))
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(num_bins))
    raw = F.floor((x - F.col("__lo")) / width)
    # constant column (hi == lo): width 0 would make every row NaN —
    # all mass belongs in bin 0
    bin_ = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
        F.least(raw, F.lit(num_bins - 1))
    ).cast("long")
    counts = (
        with_b.withColumn("__bin", bin_)
        .groupBy("__bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grid = bounds.select(
        "__lo",
        "__hi",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"), F.lit(num_bins - 1).cast("long")
            )
        ).alias("__bin"),
    )
    w = (F.col("__hi") - F.col("__lo")) / F.lit(float(num_bins))
    return (
        grid.join(counts, "__bin", "left")
        .select(
            F.col("__bin").alias("bin"),
            (F.col("__lo") + F.col("__bin") * w).alias("bin_lo"),
            (F.col("__lo") + (F.col("__bin") + 1) * w).alias("bin_hi"),
            F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n"),
        )
    )


def equi_depth_histogram(
    df: DataFrame, col: str, num_bins: int
) -> DataFrame:
    """(bin, lo, hi, n, n_distinct) with ~n/num_bins rows per bin.

    Integer-exact assignment over the distinct-value CDF: a value
    whose copies start at cumulative position c (0-based) lands in
    bucket (c * num_bins) div total — all engines agree, no float
    boundary ambiguity. All copies of one value share a bucket, so
    heavy ties widen that bucket (reported via ``n``).

    The CDF comes from ``filtering.bucketed_distinct_cdf`` — the
    range-bucketed two-level form, so the plan has no unpartitioned
    corpus-scaled window even when the column is continuous and
    |distinct| ≈ n (the r6 verdict's scale finding against the old
    single-window form). Total row count rides the cdf as its ``__n``
    column — one distributed plan, no plan-build count job.
    """
    if num_bins < 1:
        raise ValueError("num_bins must be >= 1")
    from bi_utils_spark.operators.filtering import bucketed_distinct_cdf

    cdf = bucketed_distinct_cdf(df, col)
    assigned = cdf.select(
        "__v",
        "__c",
        F.expr(f"(__start * {num_bins}) div greatest(__n, 1)").alias("bin"),
    )
    return assigned.groupBy("bin").agg(
        F.min("__v").alias("lo"),
        F.max("__v").alias("hi"),
        F.sum("__c").alias("n"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
