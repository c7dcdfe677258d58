"""Parameterized SQL script execution (SURVEY.md S1/S2).

Reference: ``return_df_from_sql_script`` (`utils.py:312-339`) read a
``.sql`` file, substituted ``{param}`` placeholders via ``str.format``
and shipped the string to Exasol; ``execute_sql_script``
(`utils.py:342-352`) did the same for statements without results.
Here Catalyst parses/plans/executes the same SQL locally, and the
docstring contract of `utils.py:322-323` (GROUP BY … HAVING templates)
works unchanged.

Unlike the reference (which returned None and logged on failure,
`utils.py:336-339`), errors raise — silent-None poisoned downstream
pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bi_utils_spark.session import set_logging


def render_sql_script(filename: str, **params) -> str:
    """Read a .sql file and substitute ``{param}`` placeholders."""
    with open(filename, encoding="utf-8") as f:
        query = f.read()
    return query.format(**params) if params else query


def return_df_from_sql_script(
    spark: SparkSession, filename: str, **params
) -> DataFrame:
    """S1: .sql file + params → DataFrame (lazy plan)."""
    query = render_sql_script(filename, **params)
    set_logging().info("running SQL script %s", filename)
    return spark.sql(query)


def execute_sql_script(spark: SparkSession, filename: str, **params) -> None:
    """S2: .sql file + params → execute for effect (DDL/DML)."""
    query = render_sql_script(filename, **params)
    set_logging().info("executing SQL script %s", filename)
    spark.sql(query).collect()


def register_tables(spark: SparkSession, sf_dir: str, tables: list[str]) -> None:
    """Register parquet tables as temp views so scripts can name them
    (the engine's analogue of Exasol schema-qualified tables)."""
    from bi_utils_spark.sources.tables import load_table

    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
