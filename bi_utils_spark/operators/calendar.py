"""Calendar dimension generator (X99).

Every warehouse joins facts to a date spine; generating it in-engine
beats shipping a CSV nobody remembers to extend. One sequence
explode off a 2-literal row — |days| rows, no shuffle — with the
standard derived attributes (ISO week handling per Spark's
``weekofyear`` == ISO-8601, which DuckDB matches).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def date_spine(
    spark: SparkSession,
    start: str | dt.date,
    end: str | dt.date,
) -> DataFrame:
    """One row per calendar day in [start, end] (inclusive):
    ``d, year, quarter, month, day, day_of_week (1=Mon..7=Sun),
    iso_week, is_weekend, month_start, month_end``."""
    s = F.lit(str(start)).cast("date")
    e = F.lit(str(end)).cast("date")
    days = spark.range(1).select(
        F.explode(F.sequence(s, e)).alias("d")
    )
    dow = (((F.dayofweek("d") + 5) % 7) + 1).cast("int")  # ISO: Mon=1
    return days.select(
        "d",
        F.year("d").alias("year"),
        F.quarter("d").alias("quarter"),
        F.month("d").alias("month"),
        F.dayofmonth("d").alias("day"),
        dow.alias("day_of_week"),
        F.weekofyear("d").alias("iso_week"),
        (dow >= 6).cast("int").alias("is_weekend"),
        F.trunc("d", "month").alias("month_start"),
        F.last_day("d").alias("month_end"),
    )
