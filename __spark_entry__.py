"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Conventions used throughout so Spark and DuckDB hash-match:
- every computed column is explicitly aliased identically on both sides;
- timestamps cross the boundary as ``unix_micros``/``epoch_us`` BIGINTs
  or fixed-format strings (never raw timestamp objects);
- float aggregations are summed as DECIMAL then cast back to DOUBLE so
  the result is independent of accumulation order on both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bi_utils_spark.entry_queries import QUERIES, ORACLES, flagship

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Composes the reference's two core read semantics (SURVEY.md §7.0):
    delta-load watermark (A1, ct_utils.py:19-37) + top-1-per-key
    (W1, utils.py:210-224) + scalar layer (F1 hash, F4 JSON extract).
    """
    return flagship(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each ``queries()`` entry."""
    return dict(ORACLES)
