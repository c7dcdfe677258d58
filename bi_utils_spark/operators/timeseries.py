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
