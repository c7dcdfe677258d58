"""Mergeable distinct-count sketches (X65).

The 100 TB reporting problem: "distinct users per day / week / month /
campaign" re-reads the raw stream for every new rollup grain, because
COUNT(DISTINCT) does not pre-aggregate. Apache DataSketches HLL
sketches (built into Spark as ``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``) fix the algebra: a
sketch is a fixed-size binary register array, sketches MERGE by
register-max, and crucially

    union(sketch(A), sketch(B)) == sketch(A ∪ B)   (exactly, same lgK)

so a per-day sketch table — corpus touched ONCE — answers every
coarser rollup (week, month, all-time, any group subset) by unioning
kilobyte-sized binaries. Estimation error is ~1.04/sqrt(2^lgk)
(lgk=12 → ~1.6%).

One honest caveat the attestation encodes: the register/coupon MERGE
is lossless, but DataSketches promotes sketches between exact-coupon
and dense-HLL modes at different points along the two paths, so the
ESTIMATOR can differ by a hair (±1 at the boundary) between
union-of-fine-sketches and a directly-built coarse sketch. The
report therefore attests a 1% consistency bound between the two
paths, not bit equality.

Everything here is JVM-side DataSketches aggregation — no Python, one
partial-aggregable shuffle per build/rollup; the sketch column
persists to parquet as plain BINARY for incremental daily appends.

Reference: Flaconi/bi_utils has no sketch tier (north-star surface,
same as X57-X64); semantics are Apache DataSketches HLL as shipped
in Spark >= 3.5 (SPARK-16484).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketch_table(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    lgk: int = 12,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Pre-aggregate: one HLL sketch of ``key_col`` per group — the
    table you persist at the finest grain (e.g. per day). One
    groupBy with map-side partials; output is |groups| rows of
    <= 2^lgk-byte binaries."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias(sketch_col)
    )


def rollup_sketches(
    sketches: DataFrame,
    group_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Re-aggregate persisted sketches to a coarser grain by register
    union — the raw data is never re-read. ``group_cols`` is the
    COARSER key (e.g. week derived from the day column); the shuffle
    moves only |fine groups| kilobyte rows."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    )


def estimate_distinct(
    sketches: DataFrame,
    sketch_col: str = "sketch",
    out_col: str = "distinct_est",
) -> DataFrame:
    """Attach the DataSketches estimator's distinct count (BIGINT)."""
    return sketches.withColumn(
        out_col,
        F.hll_sketch_estimate(F.col(sketch_col)).cast("long"),
    )


def sketch_rollup_report(
    df: DataFrame,
    fine_cols: list[str],
    coarse_cols: list[str],
    key_col: str,
    lgk: int = 12,
    rel_error_bound: float = 0.05,
) -> DataFrame:
    """Self-attesting rollup: build fine-grain sketches, union to the
    coarse grain, and emit per coarse group

    - ``exact`` — the true COUNT(DISTINCT) (computed here so the
      attestation is in-plan; production omits it),
    - ``merge_consistent`` — 1 iff the estimate via fine-sketch union
      is within ``2 * rel_error_bound`` (and ±1) of a sketch built
      directly at the coarse grain. Each path individually estimates
      within ``rel_error_bound`` of the truth, so their difference is
      bounded by the sum — the flag still catches a broken merge
      (e.g. additive double counting reads ~2x, far outside) while
      honoring the mode-promotion caveat above,
    - ``err_ok`` — 1 iff |est - exact| <= rel_error_bound * exact.

    ``coarse_cols`` must be derivable from ``fine_cols`` rows
    (week from day, etc.) — pass the derived columns in ``df``.
    """
    fine = distinct_sketch_table(df, fine_cols, key_col, lgk)
    merged = estimate_distinct(
        rollup_sketches(fine, coarse_cols), out_col="est_merged"
    )
    direct = estimate_distinct(
        distinct_sketch_table(df, coarse_cols, key_col, lgk),
        out_col="est_direct",
    )
    exact = df.groupBy(*coarse_cols).agg(
        F.countDistinct(key_col).alias("exact")
    )
    out = (
        merged.select(*coarse_cols, "est_merged")
        .join(direct.select(*coarse_cols, "est_direct"), coarse_cols)
        .join(exact, coarse_cols)
    )
    err = F.abs(F.col("est_merged") - F.col("exact")).cast("double")
    path_diff = F.abs(
        F.col("est_merged") - F.col("est_direct")
    ).cast("double")
    return out.select(
        *coarse_cols,
        "exact",
        (
            path_diff
            <= F.greatest(
                F.lit(1.0),
                F.lit(2.0 * rel_error_bound)
                * F.col("exact").cast("double"),
            )
        )
        .cast("int")
        .alias("merge_consistent"),
        (err <= F.lit(rel_error_bound) * F.col("exact").cast("double"))
        .cast("int")
        .alias("err_ok"),
    )
