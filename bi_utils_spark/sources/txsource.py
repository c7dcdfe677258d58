"""Python DataSource over manifest-log tx tables (X110, r7) — the
`spark.read.format("txtable")` / `readStream.format("txtable")`
integration of `operators/txtable.py`, built on PySpark 4's public
Python Data Source API (`pyspark.sql.datasource`).

Batch: the log-resolved live file set becomes one InputPartition per
file; executors read their file with pyarrow. Same snapshot isolation
as `read_table` (options: ``path``, ``version``).

Streaming: STREAM OFFSETS ARE COMMIT VERSIONS. `latestOffset` is a
driver-side log stat; `partitions(start, end)` lists exactly the
files added by commits in ``(start, end]`` — each micro-batch reads
the delta, never the table, and replaying any offset range re-reads
the same committed files (the deterministic-replay contract
Structured Streaming recovery requires; commits are immutable).
Rewriting commits (merge/overwrite/compact) are NOT append deltas: by
default the stream FAILS on one (silent double-counting of moved rows
is corruption), ``skipRewrites=true`` opts into skipping them (the
Delta ``ignoreChanges`` analog — downstream must tolerate missing
row-level updates; `table_diff` is the row-level form).

Scale notes: offset math and file listing are O(commits in range)
driver-side JSON; row I/O happens in executors, one task per delta
file. The pyarrow read path exists because a Python data source reads
in Python workers — for JVM-parquet speed on big batch scans, use
`txtable.read_table`; this source is the STREAMING integration and
the SQL-reader convenience.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from bi_utils_spark.operators import txtable as tx

FORMAT_NAME = "txtable"


class TxFilePartition(InputPartition):
    def __init__(
        self, file_path: str, partition_values: dict[str, str]
    ) -> None:
        self.file_path = file_path
        self.partition_values = partition_values


def _coerce(value: str, spark_type: str):
    """Directory-encoded partition values are strings; coerce to the
    schema's type for every partitionable primitive (int/float/bool,
    plus date/timestamp/decimal — Spark renders those ISO-style in
    the directory name, so the stdlib parsers are faithful
    inverses). The Hive default-partition sentinel is a NULL."""
    if value is None or value == "__HIVE_DEFAULT_PARTITION__":
        return None
    t = spark_type.lower()
    if t in ("int", "integer", "smallint", "tinyint", "bigint", "long"):
        return int(value)
    if t in ("double", "float"):
        return float(value)
    if t == "boolean":
        return value.lower() == "true"
    if t == "date":
        import datetime

        return datetime.date.fromisoformat(value)
    if t.startswith("timestamp"):
        import datetime

        return datetime.datetime.fromisoformat(value)
    if t.startswith("decimal"):
        from decimal import Decimal

        return Decimal(value)
    return value


def _read_file_rows(
    file_path: str,
    partition_values: dict[str, str],
    schema: StructType,
) -> Iterator[tuple]:
    import pyarrow.parquet as pq

    tbl = pq.read_table(file_path)
    cols: dict[str, list] = {
        name: tbl.column(name).to_pylist() for name in tbl.column_names
    }
    n = tbl.num_rows
    out_cols = []
    for f in schema.fields:
        if f.name in cols:
            out_cols.append(cols[f.name])
        elif f.name in partition_values:
            v = _coerce(
                partition_values[f.name], f.dataType.simpleString()
            )
            out_cols.append([v] * n)
        else:
            out_cols.append([None] * n)  # schema-widened old file
    yield from zip(*out_cols) if n else iter(())


class TxBatchReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self._schema = schema
        self._path = options["path"]
        v = options.get("version")
        self._version = int(v) if v is not None else None

    def partitions(self) -> list[InputPartition]:
        snap = tx._fold(self._path, self._version)
        return [
            TxFilePartition(
                os.path.join(self._path, rel), meta["partition_values"]
            )
            for rel, meta in sorted(snap.files.items())
        ]

    def read(self, partition: TxFilePartition) -> Iterator[tuple]:
        return _read_file_rows(
            partition.file_path, partition.partition_values, self._schema
        )


class TxStreamReader(DataSourceStreamReader):
    """Micro-batch reader: offset = {"version": last consumed}."""

    def __init__(self, schema: StructType, options: dict) -> None:
        self._schema = schema
        self._path = options["path"]
        self._start = int(options.get("startingVersion", -1))
        self._skip_rewrites = (
            str(options.get("skipRewrites", "false")).lower() == "true"
        )

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        return {"version": tx.latest_version(self._path)}

    def _delta_files(
        self, after: int, up_to: int
    ) -> list[TxFilePartition]:
        parts: list[TxFilePartition] = []
        for v in range(after + 1, up_to + 1):
            with open(tx._commit_file(self._path, v)) as fh:
                entry = json.load(fh)
            if entry["action"] not in ("append", "create"):
                if self._skip_rewrites:
                    continue
                raise ValueError(
                    f"txtable stream: commit v{v} is "
                    f"{entry['action']!r}, not an append — set "
                    "skipRewrites=true to skip rewriting commits "
                    "(appends-only semantics), or consume row-level "
                    "changes with txtable.table_diff"
                )
            for a in entry.get("added", []):
                parts.append(
                    TxFilePartition(
                        os.path.join(self._path, a["path"]),
                        a.get("partition_values", {}),
                    )
                )
        return parts

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        return self._delta_files(int(start["version"]), int(end["version"]))

    def read(self, partition: TxFilePartition) -> Iterator[tuple]:
        return _read_file_rows(
            partition.file_path, partition.partition_values, self._schema
        )

    def commit(self, end: dict) -> None:
        pass  # commits are immutable; nothing to clean up


class TxTableDataSource(DataSource):
    """``spark.dataSource.register(TxTableDataSource)`` then
    ``spark.read.format("txtable").option("path", p).load()`` or
    ``spark.readStream.format("txtable").option("path", p).load()``.
    Options: path (required), version (batch time travel),
    startingVersion / skipRewrites (streaming)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        snap = tx._fold(self.options["path"])
        return snap.spark_schema()

    def reader(self, schema: StructType) -> TxBatchReader:
        return TxBatchReader(schema, self.options)

    def streamReader(self, schema: StructType) -> TxStreamReader:
        return TxStreamReader(schema, self.options)


def register_txtable_source(spark) -> None:
    """Register the format with this session (idempotent)."""
    spark.dataSource.register(TxTableDataSource)
