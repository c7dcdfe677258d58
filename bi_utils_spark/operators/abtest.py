"""A/B experiment readouts with exact-arithmetic test statistics (X87).

Experiment analysis belongs in the warehouse (joins against
assignment and exposure tables), and its arithmetic must be
reproducible — a re-run that flips significance because of float
accumulation order is an incident. Every moment here is built from
EXACT aggregates:

- metric values quantize by ``floor(value · 1e6)`` (an IEEE multiply
  + floor both engines compute identically — no rounding-mode
  ambiguity), and Σv, Σv² accumulate as DECIMAL(38,0) integers;
- means, Welch variance, lift, and the z statistic are then a fixed
  sequence of double ops on those exact integers — bit-stable under
  any partitioning and engine.

``welch_test`` compares a continuous metric (unequal variances,
the default safe choice); ``proportion_test`` compares conversion
rates (pooled two-proportion z). Both emit the decision inputs
(counts, means/rates, lift, z, significant-at-95%) in one row.

Scale shape: one partial-aggregable groupBy over the exposure
table — the statistics of a 10¹⁰-row experiment cost one scan and a
2-row shuffle. No windows, no collects beyond the 2-row result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_Q = 1_000_000  # metric fixed-point quantum
_Z95 = 1.959963984540054  # two-sided 95% normal quantile


def _group_moments(
    df: DataFrame, group_col: str, metric_col: str
) -> DataFrame:
    vq = F.floor(F.col(metric_col).cast("double") * _Q).cast(
        "decimal(38,0)"
    )
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(vq).alias("s1"),
        F.sum(vq * vq).alias("s2"),
    )


def welch_test(
    df: DataFrame,
    group_col: str,
    metric_col: str,
    control: str,
    treatment: str,
) -> DataFrame:
    """One-row Welch z readout: ``(n_c, n_t, mean_c, mean_t, lift,
    z, significant)``. Requires n ≥ 2 per arm (sample variance)."""
    m = _group_moments(df, group_col, metric_col)
    c = m.where(F.col(group_col) == control).select(
        F.col("n").alias("n_c"),
        F.col("s1").cast("double").alias("c1"),
        F.col("s2").cast("double").alias("c2"),
    )
    t = m.where(F.col(group_col) == treatment).select(
        F.col("n").alias("n_t"),
        F.col("s1").cast("double").alias("t1"),
        F.col("s2").cast("double").alias("t2"),
    )
    j = c.crossJoin(F.broadcast(t))
    nc = F.col("n_c").cast("double")
    nt = F.col("n_t").cast("double")
    mean_c = F.col("c1") / nc / _Q
    mean_t = F.col("t1") / nt / _Q
    var_c = (
        (F.col("c2") - F.col("c1") * F.col("c1") / nc)
        / (nc - 1.0)
        / (_Q * _Q)
    )
    var_t = (
        (F.col("t2") - F.col("t1") * F.col("t1") / nt)
        / (nt - 1.0)
        / (_Q * _Q)
    )
    z = (mean_t - mean_c) / F.sqrt(var_t / nt + var_c / nc)
    return j.select(
        "n_c",
        "n_t",
        mean_c.alias("mean_c"),
        mean_t.alias("mean_t"),
        ((mean_t - mean_c) / mean_c).alias("lift"),
        z.alias("z"),
        (F.abs(z) > F.lit(_Z95)).cast("int").alias("significant"),
    )


def proportion_test(
    df: DataFrame,
    group_col: str,
    success: Column,
    control: str,
    treatment: str,
) -> DataFrame:
    """Two-proportion pooled z test on a boolean success condition:
    ``(n_c, n_t, conv_c, conv_t, rate_c, rate_t, lift, z,
    significant)`` — all from four exact counts."""
    m = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(success.cast("long")).alias("x"),
    )
    c = m.where(F.col(group_col) == control).select(
        F.col("n").alias("n_c"), F.col("x").alias("conv_c")
    )
    t = m.where(F.col(group_col) == treatment).select(
        F.col("n").alias("n_t"), F.col("x").alias("conv_t")
    )
    j = c.crossJoin(F.broadcast(t))
    nc = F.col("n_c").cast("double")
    nt = F.col("n_t").cast("double")
    pc = F.col("conv_c").cast("double") / nc
    pt = F.col("conv_t").cast("double") / nt
    pool = (F.col("conv_c") + F.col("conv_t")).cast("double") / (nc + nt)
    z = (pt - pc) / F.sqrt(pool * (1.0 - pool) * (1.0 / nc + 1.0 / nt))
    return j.select(
        "n_c",
        "n_t",
        "conv_c",
        "conv_t",
        pc.alias("rate_c"),
        pt.alias("rate_t"),
        ((pt - pc) / pc).alias("lift"),
        z.alias("z"),
        (F.abs(z) > F.lit(_Z95)).cast("int").alias("significant"),
    )


def chi_square_independence(
    df: DataFrame, row_col: str, col_col: str
) -> DataFrame:
    """Chi-square independence test over a contingency table (X100):
    one row — ``(n, rows, cols, dof, chi2)`` — from exact cell
    counts. chi2 = Σ (observed − expected)² / expected with
    expected_ij = row_i·col_j / n; every term derives from four
    exact BIGINTs, so the statistic is bit-stable (compare against
    the critical value for the dof offline — no p-value here by
    design, erf is not portable).

    Scale: one groupBy over the fact table builds the
    |rows|·|cols| contingency table; margins and the fold run over
    that bounded table.
    """
    cells = df.groupBy(
        F.col(row_col).alias("__r"), F.col(col_col).alias("__c")
    ).agg(F.count(F.lit(1)).alias("__o"))
    rm = cells.groupBy("__r").agg(F.sum("__o").alias("__rm"))
    cm = cells.groupBy("__c").agg(F.sum("__o").alias("__cm"))
    tot = cells.agg(F.sum("__o").alias("__n"))
    j = (
        cells.join(F.broadcast(rm), "__r")
        .join(F.broadcast(cm), "__c")
        .crossJoin(F.broadcast(tot))
    )
    exp = (
        F.col("__rm").cast("double")
        * F.col("__cm").cast("double")
        / F.col("__n").cast("double")
    )
    term = (
        (F.col("__o").cast("double") - exp)
        * (F.col("__o").cast("double") - exp)
        / exp
    )
    # chi2 sums floats — quantize terms to 1e-9 fixed point so the
    # accumulation is exact integers (the lm.py discipline)
    termq = F.floor(term * 1e9).cast("long")
    return j.agg(
        F.max("__n").alias("n"),
        F.countDistinct("__r").alias("rows"),
        F.countDistinct("__c").alias("cols"),
        (
            (F.countDistinct("__r") - 1)
            * (F.countDistinct("__c") - 1)
        ).cast("long").alias("dof"),
        (F.sum(termq).cast("double") / 1e9).alias("chi2"),
    )
