"""Contribution / Pareto analysis (X91).

"Which brands cover 80% of revenue?" — the classic concentration
report behind assortment and vendor decisions. Exact arithmetic
end-to-end: per-key totals accumulate as DECIMAL(38,6) (the
FIXTURES.md float-sum rule), the cumulative sum runs over DECIMALS
(exact), and shares divide once into doubles — so the vital-few cut
cannot move between runs or engines.

Scale shape: one partial-aggregable groupBy over the fact table;
the ranking/cumulative window runs over |keys| rows (group-domain
cardinality — brands, vendors, categories — not facts). A
10¹²-row fact table contributes one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def contribution_report(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    threshold: float = 0.8,
) -> DataFrame:
    """(key..., total, share, cum_share, rank, vital) ranked by
    contribution (ties by key): ``vital`` marks the minimal prefix
    of keys whose PRECEDING cumulative share is below ``threshold``
    — i.e. every key needed to reach it, threshold-boundary key
    included."""
    totals = df.groupBy(*key_cols).agg(
        F.sum(F.col(value_col).cast("decimal(38,6)"))
        .cast("decimal(38,6)")
        .alias("__tot")
    )
    grand = totals.agg(
        F.sum("__tot").cast("decimal(38,6)").alias("__grand")
    )
    w = Window.orderBy(
        F.desc("__tot"), *[F.asc(c) for c in key_cols]
    )
    cum = (
        totals.withColumn("rank", F.row_number().over(w))
        .withColumn(
            "__cum",
            F.sum("__tot")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("decimal(38,6)"),
        )
        .crossJoin(F.broadcast(grand))
    )
    share = F.col("__tot").cast("double") / F.col("__grand").cast(
        "double"
    )
    cum_share = F.col("__cum").cast("double") / F.col("__grand").cast(
        "double"
    )
    prev_share = (F.col("__cum") - F.col("__tot")).cast(
        "double"
    ) / F.col("__grand").cast("double")
    return cum.select(
        *key_cols,
        F.col("__tot").cast("double").alias("total"),
        share.alias("share"),
        cum_share.alias("cum_share"),
        "rank",
        (prev_share < F.lit(float(threshold))).cast("int").alias(
            "vital"
        ),
    )


def contribution_report_grouped(
    df: DataFrame,
    partition_cols: list[str],
    key_cols: list[str],
    value_col: str,
    threshold: float = 0.8,
) -> DataFrame:
    """Per-partition Pareto (X91b): the vital-few cut WITHIN each
    partition (e.g. top suppliers per region). Same exact-DECIMAL
    arithmetic; the ranking window partitions by the report
    dimension, so no single-task sort even when the key domain is
    large — each partition orders only its own keys."""
    totals = df.groupBy(*partition_cols, *key_cols).agg(
        F.sum(F.col(value_col).cast("decimal(38,6)"))
        .cast("decimal(38,6)")
        .alias("__tot")
    )
    grand = totals.groupBy(*partition_cols).agg(
        F.sum("__tot").cast("decimal(38,6)").alias("__grand")
    )
    w = Window.partitionBy(*partition_cols).orderBy(
        F.desc("__tot"), *[F.asc(c) for c in key_cols]
    )
    cum = (
        totals.withColumn("rank", F.row_number().over(w))
        .withColumn(
            "__cum",
            F.sum("__tot")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("decimal(38,6)"),
        )
        .join(F.broadcast(grand), partition_cols)
    )
    g = F.col("__grand").cast("double")
    return cum.select(
        *partition_cols,
        *key_cols,
        F.col("__tot").cast("double").alias("total"),
        (F.col("__tot").cast("double") / g).alias("share"),
        (F.col("__cum").cast("double") / g).alias("cum_share"),
        "rank",
        (
            (F.col("__cum") - F.col("__tot")).cast("double") / g
            < F.lit(float(threshold))
        ).cast("int").alias("vital"),
    )
