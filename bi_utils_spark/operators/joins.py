"""Temporal joins the reference lacks but a Spark-native engine needs
(SURVEY.md §2.3: "theta, range, as-of … not present in reference").

Naive formulations of both joins are inequality joins, which Spark
plans as BroadcastNestedLoopJoin / CartesianProduct — quadratic and
fatal at 100 TB. Both operators here are rewritten into shapes that
shuffle once and hash-join:

- ``asof_join`` — union-then-window ("distributed merge-asof"): tag
  both inputs, union them, sort each key's timeline once inside a
  single window, and carry the most recent right-side row forward
  with ``last(ignorenulls)``. One shuffle on the key, zero row
  explosion, no join at all.
- ``point_in_interval_join`` — bucketed range join: quantize the
  range dimension, explode each interval to the buckets it covers,
  equi-join on (keys…, bucket), then apply the exact range predicate
  as a residual filter. Turns the nested-loop into a shuffled hash
  join whose fan-out is bounded by interval_width / bucket_width.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Mapping[str, str],
    *,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance_seconds: float | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """As-of (nearest-neighbor temporal) left join.

    For every left row, attach the right row with the greatest
    ``right_ts <= left_ts`` (direction="backward"; "forward" takes the
    smallest ``right_ts >= left_ts``) within the same ``on`` key.
    Matches DuckDB ``ASOF LEFT JOIN`` / pandas ``merge_asof`` semantics.

    right_cols maps right column → output name. ``right_tiebreak``
    makes the pick deterministic when several right rows share one
    timestamp (highest wins). ``tolerance_seconds`` nulls out matches
    further away than the bound.

    Scale: the union-window plan shuffles each input exactly once on
    ``on`` and sorts per partition — the same cost as one sort-merge
    join — regardless of how many right rows precede each left row.
    A join-based formulation (t1.ts <= t2.ts) would be a nested-loop.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    keys = list(on)
    carried = list(right_cols) + ([right_ts] if right_ts not in right_cols else [])

    lpart = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None)
        .cast(T.StructType([T.StructField(c, right.schema[c].dataType) for c in carried]))
        .alias("__r"),
    )
    null_left = [
        F.col(c) if c in keys else F.lit(None).cast(left.schema[c].dataType).alias(c)
        for c in left.columns
    ]
    rpart = right.select(
        *null_left,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(*[F.col(c) for c in carried]).alias("__r"),
    )
    unioned = lpart.unionByName(rpart)

    # Ordering encodes inclusivity: with exact matches allowed, a right
    # row at the same timestamp sorts BEFORE the left row (inside the
    # frame); strict mode sorts it after (outside the frame).
    t_order = F.asc("__t") if direction == "backward" else F.desc("__t")
    side = F.asc("__is_left") if allow_exact_matches else F.desc("__is_left")
    order = [t_order, side]
    if right_tiebreak is not None:
        order.append(F.asc(F.col("__r").getField(right_tiebreak)))
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # One struct-valued last() so every carried column comes from the
    # SAME right row even if some right values are themselves null.
    matched = unioned.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).filter(
        F.col("__is_left") == 1
    )

    if tolerance_seconds is not None:
        gap = F.abs(
            F.col("__t").cast("double") - F.col("__m").getField(right_ts).cast("double")
        )
        matched = matched.withColumn(
            "__m", F.when(gap <= F.lit(float(tolerance_seconds)), F.col("__m"))
        )

    return matched.select(
        *[F.col(c) for c in left.columns],
        *[F.col("__m").getField(rc).alias(out) for rc, out in right_cols.items()],
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    *,
    on: Sequence[str] = (),
    bucket_seconds: float = 3600.0,
    closed: str = "both",
) -> DataFrame:
    """Inner range join: point rows × interval rows they fall inside.

    ``closed`` ∈ {"both", "left", "right", "neither"} controls endpoint
    inclusivity. Output keeps all columns of both inputs (names must be
    disjoint apart from the ``on`` keys).

    Scale: each interval is exploded to ``ceil(width / bucket)`` bucket
    rows, then equi-joined on (keys…, bucket) — a plain shuffled hash
    join Catalyst/AQE can size and skew-split, instead of the
    BroadcastNestedLoopJoin an inequality join would plan. Pick
    bucket_seconds near the typical interval width so fan-out stays
    O(1) per interval.
    """
    keys = list(on)
    us = int(bucket_seconds * 1_000_000)
    pt = F.unix_micros(F.col(point_ts))
    lo = F.unix_micros(F.col(start_ts))
    hi = F.unix_micros(F.col(end_ts))

    p = points.withColumn("__bkt", F.floor(pt / F.lit(us)))
    iv = intervals.withColumn(
        "__bkt", F.explode(F.sequence(F.floor(lo / F.lit(us)), F.floor(hi / F.lit(us))))
    )
    joined = p.join(iv, on=keys + ["__bkt"], how="inner").drop("__bkt")

    pcol = F.unix_micros(F.col(point_ts))
    lower: Column = pcol >= F.unix_micros(F.col(start_ts))
    upper: Column = pcol <= F.unix_micros(F.col(end_ts))
    if closed in ("right", "neither"):
        lower = pcol > F.unix_micros(F.col(start_ts))
    if closed in ("left", "neither"):
        upper = pcol < F.unix_micros(F.col(end_ts))
    return joined.filter(lower & upper)
