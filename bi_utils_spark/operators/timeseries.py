"""Time-series resampling with gap fill (X69).

Event streams aggregate naturally into time buckets, but a groupBy
only emits buckets that HAVE events — downstream consumers (anomaly
detection, charting, rate SLAs) need the dense grid with explicit
zeros/carried values, and "the bucket is missing" is precisely the
signal a monitoring query must see. This tier:

- :func:`attach_time_bucket` — epoch-second floor-division bucketing
  (map-only; engine-portable integer arithmetic).
- :func:`resample_counts` — per-group bucket aggregates LEFT-joined
  onto the complete (group x bucket-range) grid, gaps filled with 0.
- :func:`fill_forward` — last-observation-carried-forward over a
  dense grid (per-group window ordered by bucket).

Scale shape: the grid is |groups| x (range/width) rows — generated
by one F.sequence explode off a broadcast 1-row bounds frame, NOT by
scanning the stream twice; the only corpus-sized work is the initial
partial-aggregable groupBy. fill_forward's window partitions by
group over grid rows (bounded by the grid, not the stream).

Reference: Flaconi/bi_utils has no time-series tier (north-star
surface, same as X57-X68).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def attach_time_bucket(
    df: DataFrame,
    ts_col: str = "ts",
    width_sec: int = 3600,
    out_col: str = "bucket",
) -> DataFrame:
    """Integer bucket index = floor(epoch_seconds / width). Uses
    ``unix_timestamp`` (second floor) then integer division — the
    exact arithmetic a cross-engine oracle replays."""
    return df.withColumn(
        out_col,
        F.expr(f"unix_timestamp({ts_col}) div {width_sec}").cast("long"),
    )


def resample_counts(
    df: DataFrame,
    ts_col: str = "ts",
    width_sec: int = 3600,
    group_cols: tuple[str, ...] = (),
    lo: int | None = None,
    hi: int | None = None,
    count_col: str = "n",
) -> DataFrame:
    """(group..., bucket, n) over the COMPLETE bucket range — buckets
    with no events appear with n = 0. Bounds default to the data's
    min/max bucket (one bounded agg, broadcast); pass ``lo``/``hi``
    to pin a reporting window instead.

    The grid is |groups| x (hi - lo + 1) rows from a sequence
    explode; the corpus contributes one partial-aggregable groupBy.
    """
    b = attach_time_bucket(df, ts_col, width_sec)
    gcols = list(group_cols)
    aggd = b.groupBy(*gcols, "bucket").agg(
        F.count(F.lit(1)).alias(count_col)
    )
    if lo is None or hi is None:
        bounds = b.agg(
            F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
        )
    else:
        bounds = b.sparkSession.range(1).select(
            F.lit(lo).cast("long").alias("__lo"),
            F.lit(hi).cast("long").alias("__hi"),
        )
    groups = (
        b.select(*gcols).distinct()
        if gcols
        else b.sparkSession.range(1).select(F.lit(1).alias("__one"))
    )
    grid = (
        groups.crossJoin(F.broadcast(bounds))
        .select(
            *(gcols or []),
            F.explode(F.sequence("__lo", "__hi")).alias("bucket"),
        )
    )
    out = grid.join(aggd, gcols + ["bucket"], "left").select(
        *gcols,
        "bucket",
        F.coalesce(F.col(count_col), F.lit(0).cast("long")).alias(
            count_col
        ),
    )
    return out


def fill_forward(
    df: DataFrame,
    bucket_col: str = "bucket",
    group_cols: tuple[str, ...] = (),
    value_col: str = "v",
    out_col: str | None = None,
) -> DataFrame:
    """Carry the last non-null value forward along the bucket order
    within each group (leading nulls stay null). The window runs over
    the dense GRID (bounded by groups x range), never the raw stream.
    """
    out_col = out_col or value_col + "_filled"
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(
        out_col, F.last(F.col(value_col), ignorenulls=True).over(w)
    )


def rolling_agg(
    df: DataFrame,
    bucket_col: str = "bucket",
    group_cols: tuple[str, ...] = (),
    value_col: str = "n",
    window: int = 7,
    stats: tuple[str, ...] = ("sum", "avg", "min", "max"),
) -> DataFrame:
    """Trailing-window aggregates along the bucket order per group
    (X79): each row gains ``<value>_roll_<stat>`` over the last
    ``window`` rows INCLUDING itself. Run on the dense
    :func:`resample_counts` grid so "window of 7 buckets" means 7
    calendar buckets, not 7 rows-with-data.

    Engine-portable: sums of integer values stay exact; ``avg`` is
    (exact sum)/(exact count) in one double division. The window is
    bounded by the GRID (|groups| x range), never the raw stream.
    """
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(bucket_col)
        .rowsBetween(-(window - 1), 0)
    )
    v = F.col(value_col)
    out = df
    fns = {
        "sum": lambda: F.sum(v).over(w),
        "avg": lambda: (
            F.sum(v).over(w).cast("double") / F.count(v).over(w)
        ),
        "min": lambda: F.min(v).over(w),
        "max": lambda: F.max(v).over(w),
        "count": lambda: F.count(v).over(w),
    }
    for s in stats:
        out = out.withColumn(f"{value_col}_roll_{s}", fns[s]())
    return out


def linear_trend(
    df: DataFrame,
    x_col: str = "bucket",
    y_col: str = "n",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-group least-squares line over integer (x, y) points
    (X80): ``(group..., n, x0, slope, intercept, r2, yhat_next)``
    where the fit is on x − x0 (x0 = the group's min x, so the
    closed-form sums stay small exact BIGINTs at any epoch scale),
    ``intercept`` is the fitted value AT x0, and ``yhat_next``
    extrapolates one bucket past the group's max x.

    All Σ terms are exact integer aggregations; slope/intercept/r²
    are computed from them with IEEE double arithmetic both engines
    reproduce bit-for-bit. Degenerate groups (one point, constant
    x) get NULL slope; constant-y groups get r² = NULL (0/0).

    Two grid-sized aggregations + one broadcast join — the trend of
    a 100 TB event stream is fitted on its bucketed GRID, never the
    raw rows.
    """
    gcols = list(group_cols)
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    bounds = df.groupBy(*gcols).agg(
        F.min(x).alias("__x0"), F.max(x).alias("__x1")
    )
    j = (
        df.join(F.broadcast(bounds), gcols)
        if gcols
        else df.crossJoin(F.broadcast(bounds))
    )
    xr = (x - F.col("__x0")).alias("__xr")
    base = j.select(*gcols, xr, y.alias("__y"), "__x0", "__x1")
    s = base.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__xr").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__xr") * F.col("__xr")).alias("__sxx"),
        F.sum(F.col("__xr") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
        F.first("__x0").alias("x0"),
        F.first("__x1").alias("__x1"),
    )
    n = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxx = F.col("__sxx").cast("double")
    sxy = F.col("__sxy").cast("double")
    syy = F.col("__syy").cast("double")
    den = n * sxx - sx * sx
    num = n * sxy - sx * sy
    slope = F.when(den > 0.0, num / den)
    intercept = (sy - slope * sx) / n
    r2_den = den * (n * syy - sy * sy)
    r2 = F.when(r2_den > 0.0, (num * num) / r2_den)
    return s.select(
        *gcols,
        "n",
        "x0",
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
        (
            intercept
            + slope * (F.col("__x1") - F.col("x0") + 1).cast("double")
        ).alias("yhat_next"),
    )


def mad_outliers(
    df: DataFrame,
    value_col: str = "n",
    group_cols: tuple[str, ...] = (),
    k: float = 3.0,
    out_col: str = "is_outlier",
) -> DataFrame:
    """Robust per-group outlier flags: a row is anomalous when its
    value sits more than ``k`` median-absolute-deviations from the
    group median — the standard monitoring detector that (unlike
    z-scores) one giant spike cannot mask, because median and MAD
    ignore the outliers they are hunting.

    Degenerate groups (MAD = 0, i.e. >= half the values identical)
    flag exactly the rows differing from the median.

    Exact interpolated percentiles (Spark ``percentile`` ==
    ``quantile_cont``) keep the flags engine-portable. Two bounded
    aggregations over the (grid-sized) input and broadcast joins
    back — run it on :func:`resample_counts` output so "no data" is
    a real zero that CAN be flagged, not a missing row that can't.
    """
    gcols = list(group_cols)

    def _agg(frame, col, alias):
        return frame.groupBy(*gcols).agg(
            F.percentile(F.col(col), F.lit(0.5)).alias(alias)
        )

    med = _agg(df, value_col, "__med")
    j1 = (
        df.join(F.broadcast(med), gcols)
        if gcols
        else df.crossJoin(F.broadcast(med))
    )
    j1 = j1.withColumn(
        "__dev", F.abs(F.col(value_col).cast("double") - F.col("__med"))
    )
    mad = _agg(j1, "__dev", "__mad")
    j2 = (
        j1.join(F.broadcast(mad), gcols)
        if gcols
        else j1.crossJoin(F.broadcast(mad))
    )
    flag = F.when(
        F.col("__mad") > 0.0, F.col("__dev") > F.lit(float(k)) * F.col("__mad")
    ).otherwise(F.col("__dev") > 0.0)
    return (
        j2.withColumn(out_col, flag)
        .drop("__dev")
        .withColumnRenamed("__med", "med")
        .withColumnRenamed("__mad", "mad")
    )


def period_over_period(
    df: DataFrame,
    ts_col: str = "ts",
    width_sec: int = 604800,
    group_cols: tuple[str, ...] = (),
    count_col: str = "n",
) -> DataFrame:
    """Period-over-period deltas (X101): per group and period
    bucket, the count, the previous period's count (dense grid, so
    "previous" means the previous CALENDAR period — a silent week
    reads as 0, not skipped), the absolute delta, and pct_change
    (NULL when the base is 0: a ratio against nothing is not 0%).

    Rides :func:`resample_counts`' complete grid; the lag window
    runs over grid rows per group.
    """
    from pyspark.sql import Window

    series = resample_counts(
        df, ts_col=ts_col, width_sec=width_sec, group_cols=group_cols,
        count_col=count_col,
    )
    w = Window.partitionBy(*group_cols).orderBy("bucket")
    prev = F.lag(count_col).over(w)
    return series.select(
        *group_cols,
        "bucket",
        count_col,
        prev.alias("prev_n"),
        (F.col(count_col) - prev).alias("delta"),
        F.when(
            prev > 0,
            (F.col(count_col) - prev).cast("double")
            / prev.cast("double"),
        ).alias("pct_change"),
    )
