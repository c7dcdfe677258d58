"""Diagnostic display / statistics operators (SURVEY.md O4/C5).

Reference: ``print_full`` (`utils.py:357-373`) printed an entire
pandas frame by widening display options; ``print_df_statistics``
(`utils.py:376-386`) logged row/column counts and the column list.
Spark-side, full materialization is a deliberate, bounded act.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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


def profile(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """Long-form column profile: one row per column with null count,
    approximate distinct, min/max, and numeric mean — the engine-side
    generalization of print_df_statistics (utils.py:376-386).

    ONE aggregation pass for all columns (the reference looped per
    column); approx_count_distinct keeps it 100 TB-safe. Output:
    (column_name, n_nulls, approx_distinct, min_str, max_str, mean).
    """
    from pyspark.sql.types import NumericType

    cols = list(columns) if columns else df.columns
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"__nn_{c}"),
            F.approx_count_distinct(c).alias(f"__ad_{c}"),
            F.min(col.cast("string")).alias(f"__mn_{c}"),
            F.max(col.cast("string")).alias(f"__mx_{c}"),
            (F.avg(col.cast("double")) if c in numeric else F.lit(None).cast("double")).alias(f"__av_{c}"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', `__nn_{c}`, `__ad_{c}`, `__mn_{c}`, `__mx_{c}`, `__av_{c}`"
        for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack}) as "
        "(column_name, n_nulls, approx_distinct, min_str, max_str, mean)"
    )
