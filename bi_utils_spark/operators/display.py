"""Diagnostic display / statistics operators (SURVEY.md O4/C5).

Reference: ``print_full`` (`utils.py:357-373`) printed an entire
pandas frame by widening display options; ``print_df_statistics``
(`utils.py:376-386`) logged row/column counts and the column list.
Spark-side, full materialization is a deliberate, bounded act.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from bi_utils_spark.session import set_logging


def df_statistics(df: DataFrame) -> dict:
    """Row/column statistics (C5). One job (the count)."""
    stats = {
        "num_rows": df.count(),
        "num_columns": len(df.columns),
        "columns": list(df.columns),
    }
    log = set_logging()
    log.info("The dataframe has %d rows", stats["num_rows"])
    log.info("The dataframe has %d columns", stats["num_columns"])
    log.info("Columns: %s", stats["columns"])
    return stats


def show_full(df: DataFrame, max_rows: int = 10_000) -> None:
    """O4: print the entire result, refusing above ``max_rows`` (the
    reference's pandas display-option dance assumed driver-sized
    data; at 100 TB an unbounded print is an outage, so bound it)."""
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"show_full: result has {n} rows > max_rows={max_rows}; "
            "raise max_rows explicitly if you really mean it"
        )
    df.show(n=max(n, 1), truncate=False)
