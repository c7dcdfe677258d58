"""Registry spine: the QUERIES/ORACLES dicts, the @register
decorator, and the shared table loaders every domain module
builds on."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession



QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn
    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    from bi_utils_spark.sources.tables import load_table

    return load_table(spark, sf_dir, table)


def load_fanout(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """load() + repartition to the session's parallelism — for the
    CPU-heavy per-row pipelines (tokenize / md5-bucket / shingle)
    whose map stage would otherwise inherit the test table's SINGLE
    input split and run one-core. At production scale inputs arrive
    in many splits and the scan parallelizes naturally; here one
    small shuffle buys a full-width map stage (measured ~2× on the
    classifier fit at sf0.1)."""
    return load(spark, sf_dir, table).repartition(
        spark.sparkContext.defaultParallelism
    )
