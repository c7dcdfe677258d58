"""Mergeable quantile sketches: DDSketch-style log buckets (X89).

``percentile_approx`` answers one query over one pass; a metrics
pipeline needs quantiles that ROLL UP — per-hour sketches that merge
into days without re-reading raw data (the distinct_sketch.py HLL
story, for quantiles). Log-bucket sketches (DDSketch, Masson et al.,
PVLDB 2019) give a relative-error guarantee: with
γ = (1+α)/(1−α), value v lands in bucket ⌈log_γ v⌉, and any
quantile estimated from bucket midpoints is within α of the true
value — at any scale, for any merge order, because the sketch is
just exact integer counts per bucket.

- :func:`qsketch_build` — (group..., bucket, cnt) + zero/negative
  counts; one partial-aggregable groupBy.
- :func:`qsketch_merge` — union + re-sum (associative; hourly →
  daily → monthly rollups).
- :func:`qsketch_quantiles` — CDF walk over each group's OWN
  buckets (≤ a few hundred rows per group by construction:
  log_γ(max/min) buckets).

Engine note: bucket indices come from IEEE ``log``; two engines may
disagree by one bucket for values at bucket borders, so the ORACLE
contract is the α-bound attestation (exact quantile recomputed in
SQL, |est−exact| ≤ α·exact asserted as integer flags) — the
q_hll_daily_users pattern — while mergeability and determinism are
same-engine exact properties, pytest-asserted.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gamma(alpha: float) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


# Reserved buckets must sort BELOW every positive-value bucket and
# never collide with one. A positive value's index ceil(log_γ v) is
# unbounded below as v → 0⁺ (at α = 0.01, v = 1e-300 → ≈ −34,500),
# so small sentinels like 0/−1 sit INSIDE the positive index range:
# the original +2-shifted encoding made positives ≤ γ⁻² ≈ 0.9607
# land in the reserved ids and estimate as 0.0 (r7 review finding).
# IEEE doubles bottom out near 1e−308, bounding |index| well under
# 10⁷ for any representable α — −2⁶² is unreachable.
_ZERO_BUCKET = -(1 << 62)
_NEG_BUCKET = _ZERO_BUCKET - 1


def qsketch_build(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    alpha: float = 0.01,
) -> DataFrame:
    """(group..., bucket, cnt): positive values at their DDSketch log
    index ceil(log_γ v); zeros and negatives count into the reserved
    sentinel buckets ``_ZERO_BUCKET``/``_NEG_BUCKET`` (their
    magnitude is not sketched — shift the metric if it matters).
    NULLs drop.
    """
    g = _gamma(alpha)
    v = F.col(value_col).cast("double")
    bucket = (
        F.when(v > 0.0, F.ceil(F.log(v) / math.log(g)).cast("long"))
        .when(v == 0.0, F.lit(_ZERO_BUCKET).cast("long"))
        .otherwise(F.lit(_NEG_BUCKET).cast("long"))
    )
    return (
        df.where(v.isNotNull())
        .groupBy(*group_cols, bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def qsketch_merge(
    sketches: list[DataFrame], group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Associative merge: union + re-sum. Merging a month of hourly
    sketches shuffles bucket rows, never raw values."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def qsketch_quantiles(
    sketch: DataFrame,
    qs: tuple[float, ...],
    group_cols: tuple[str, ...] = (),
    alpha: float = 0.01,
) -> DataFrame:
    """(group..., q, est) per requested quantile — the value of the
    first bucket whose cumulative count reaches ⌈q·n⌉ (rank
    semantics), estimated at the bucket's log midpoint 2γ^i/(γ+1).
    Only positive-value buckets participate (reserved buckets count
    toward n at their literal values 0 — the DDSketch convention of
    sketching magnitudes applies).

    The CDF window runs over each group's OWN bucket rows —
    log_γ(max/min) ≈ hundreds, never the data.
    """
    g = _gamma(alpha)
    gcols = list(group_cols)
    w = (
        Window.partitionBy(*gcols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = sketch.groupBy(*gcols).agg(F.sum("cnt").alias("__n"))
    cum = sketch.withColumn("__cum", F.sum("cnt").over(w))
    j = (
        cum.join(F.broadcast(tot), gcols)
        if gcols
        else cum.crossJoin(F.broadcast(tot))
    )
    # all requested quantiles in ONE aggregation: explode the q
    # list onto the (bounded) bucket rows, conditional-min the first
    # bucket whose cumulative count reaches the rank, and derive the
    # midpoint estimate from that bucket directly — the sketch
    # pipeline runs once however many quantiles are asked for
    jq = j.withColumn(
        "q", F.explode(F.array(*[F.lit(float(q)) for q in qs]))
    )
    rank = F.ceil(F.col("q") * F.col("__n")).cast("long")
    picked = jq.groupBy(*gcols, "q").agg(
        F.min(
            F.when(F.col("__cum") >= rank, F.col("bucket"))
        ).alias("bucket")
    )
    est_val = F.when(
        F.col("bucket") > _ZERO_BUCKET,
        2.0
        * F.pow(F.lit(g), F.col("bucket").cast("double"))
        / F.lit(g + 1.0),
    ).otherwise(F.lit(0.0))
    return picked.select(*gcols, "q", est_val.alias("est"))
