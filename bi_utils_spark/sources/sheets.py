"""Spreadsheet-style source with header promotion (SURVEY.md S6).

Reference: gs_utils.py:14-74 — Google Sheets ``values().get(range)``
returning a 2-D array of strings; first row promoted to column names
(`gs_utils.py:64-72`), retry ×6 with linear backoff (`:51-63`).
OAuth connectivity is an explicit non-goal (SURVEY.md §7.8); the
fetcher is injectable, and the header-promotion semantics are the
operator under test.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from bi_utils_spark.sources.retry import with_retry


def matrix_to_df(
    spark: SparkSession,
    data: Sequence[Sequence[str]],
    header: bool = True,
) -> DataFrame:
    """2-D string matrix → DataFrame with optional header promotion.

    ``header=True``: first row becomes column names, rest is data
    (`gs_utils.py:68-70`). ``header=False``: columns named c0..cN
    (pandas default integer columns, stringified for Spark). Ragged
    rows are padded with NULL (Sheets returns short rows for empty
    trailing cells).
    """
    if not data:
        raise ValueError("matrix_to_df: empty sheet data")
    if header:
        names = [str(c).strip() for c in data[0]]
        rows = data[1:]
    else:
        width = max(len(r) for r in data)
        names = [f"c{i}" for i in range(width)]
        rows = data
    width = len(names)
    padded = [
        tuple(list(r)[:width] + [None] * (width - len(r))) for r in rows
    ]
    schema = ", ".join(f"`{n}` string" for n in names)
    return spark.createDataFrame(padded, schema)


def load_sheet_to_df(
    spark: SparkSession,
    fetch_values: Callable[[], Sequence[Sequence[str]]],
    header: bool = True,
    num_retries: int = 6,
    interval_retry: float = 10.0,
    sleep=None,
) -> DataFrame:
    """Full S6 pipeline: retried fetch → header promotion.

    ``fetch_values`` stands in for the Sheets API call
    (`gs_utils.py:54-56`); pass a real HTTP closure in production,
    a fake in tests.
    """
    kw = {"sleep": sleep} if sleep is not None else {}
    data = with_retry(fetch_values, num_retries, interval_retry, **kw)
    return matrix_to_df(spark, data, header=header)
