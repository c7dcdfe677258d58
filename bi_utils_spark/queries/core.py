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


def adaptive_width(spark: SparkSession, n_rows: int, rows_per_task: int = 128) -> int:
    """Fan-out width for an expensive per-row stage (quadratic
    scoring, Arrow codec work) over a small-split input: enough tasks
    to use the cluster, but at least ``rows_per_task`` rows per task
    so per-task overhead (Python worker round-trip, task scheduling)
    does not dominate — a fixed defaultParallelism fan-out measured
    1.9 s vs 1.2 s per kNN leg and 6.4 s vs 0.7 s on the semantic
    BNLJ at sf0.1 (guide §2: make partitioning scale-adaptive, not a
    constant tuned for one scale). Clamped to defaultParallelism, so
    at production row counts it is exactly the session's parallelism
    and the repartition cost is the same one `load_fanout` pays."""
    par = spark.sparkContext.defaultParallelism
    return max(1, min(par, n_rows // rows_per_task or 1))
