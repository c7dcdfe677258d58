"""Parquet table loader with timestamp-unit normalization.

Spark rejects parquet TIMESTAMP(NANOS) columns outright
(PARQUET_TYPE_ILLEGAL). The testdata `events.ts` is timestamp[ns], so
we read nanos as raw INT64 (``spark.sql.legacy.parquet.nanosAsLong``)
and truncate to microseconds with integer division — byte-identical
to how DuckDB/Arrow truncate ns → µs, which keeps the oracle
comparison exact.

Scale note: the conversion is a codegen'd projection on the scan (no
shuffle, no UDF); predicate pushdown on other columns is unaffected.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _nanos_columns(path: str) -> list[str]:
    try:
        schema = pq.read_schema(path)
    except Exception:  # noqa: BLE001 — directory datasets etc.; let Spark handle
        return []
    return [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read ``{sf_dir}/{name}.parquet`` with ns-timestamp handling."""
    path = f"{sf_dir}/{name}.parquet"
    # Engine invariant: all date/time semantics are UTC (the reference's
    # Exasol DWH was implicitly UTC). Pin it even when the caller's
    # session was built elsewhere, else to_date/date_format drift.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ns_cols = _nanos_columns(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Arrow-written parquet stores naive timestamps (isAdjustedToUTC=false),
    # which Spark ≥3.4 infers as TIMESTAMP_NTZ by default. The engine's
    # contract is instant (LTZ) semantics in a UTC session — disabling the
    # inference reads the stored micros as epoch-UTC micros directly, which
    # is exactly how DuckDB's epoch_us sees the same bytes, keeping the
    # oracle comparison exact. Runtime conf: applies per-read, no restart.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    return df
