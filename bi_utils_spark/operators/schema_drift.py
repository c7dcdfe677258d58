"""Schema-drift detection operators (SURVEY.md §2.10, M3/M4/M5).

The reference joined the DWH catalog's declared VARCHAR sizes against
the incoming batch's per-column max stringified lengths and emitted
``ALTER TABLE … MODIFY COLUMN`` widenings (`utils.py:496-557`), plus
Slack notifications for dlt schema-update events (`dlt_utils.py:8-40`).

In Spark, strings are unbounded, so VARCHAR widening is a report, not
a DDL emergency — but the *detection* remains valuable (drift tells
you an upstream contract changed). Two detectors:

- :func:`length_drift` — the reference's max-length comparison (data-
  driven, one aggregate pass);
- :func:`schema_diff` — structural diff of two schemas (added /
  removed / type-changed columns), the dlt_utils semantics without
  the Slack coupling (sink adapters live in ``sources``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from bi_utils_spark.operators.relational import column_max_lengths


def length_drift(
    incoming: DataFrame,
    declared: DataFrame,
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """Rows where incoming max length exceeds the declared size.

    Reference: `utils.py:496-538` ``check_column_length`` — catalog
    scan (S15) ⋈ per-column incoming max (A3), keep ``NEW > CURRENT``.
    ``declared`` has (column_name, declared_max_length) — the stand-in
    for SYS.EXA_ALL_COLUMNS (`utils.py:509-515`).

    The measured side is one aggregate job over the batch (vs the
    reference's per-column pandas scans); the declared side is tiny →
    broadcast join.
    """
    measured = column_max_lengths(incoming, columns)
    return (
        measured.join(F.broadcast(declared), "column_name", "inner")
        .filter(F.col("new_max_length") > F.col("declared_max_length"))
        .select("column_name", "declared_max_length", "new_max_length")
    )


def widen_ddl(
    drift: DataFrame,
    schema: str,
    table: str,
    column_type: str = "VARCHAR",
) -> list[str]:
    """Generate the widening DDL the reference executed (M4,
    `utils.py:541-557`): one ``ALTER TABLE … MODIFY COLUMN`` per
    drifted column. Returned, not executed — Spark tables widen via
    schema merge; this exists for external-DWH parity."""
    rows = drift.collect()
    return [
        f"ALTER TABLE {schema}.{table} MODIFY COLUMN "
        f"{r['column_name']} {column_type}({r['new_max_length']})"
        for r in rows
    ]


def schema_diff(old: StructType, new: StructType) -> list[dict]:
    """Structural schema diff → list of change events.

    Reference: `dlt_utils.py:22-33` walked dlt LoadInfo's
    packages→tables→columns→data_type triple loop and emitted one
    message per changed column. Here: compare two StructTypes and
    emit typed events (added / removed / type_changed).
    """
    old_fields = {f.name: f.dataType.simpleString() for f in old.fields}
    new_fields = {f.name: f.dataType.simpleString() for f in new.fields}
    events: list[dict] = []
    for name, dtype in new_fields.items():
        if name not in old_fields:
            events.append({"column": name, "change": "added", "data_type": dtype})
        elif old_fields[name] != dtype:
            events.append(
                {
                    "column": name,
                    "change": "type_changed",
                    "data_type": dtype,
                    "old_data_type": old_fields[name],
                }
            )
    for name, dtype in old_fields.items():
        if name not in new_fields:
            events.append({"column": name, "change": "removed", "data_type": dtype})
    return events


def format_schema_change_messages(
    table: str, events: Sequence[dict]
) -> list[str]:
    """Human-readable notification lines (M5, `dlt_utils.py:34-40`
    formatted one Slack message per changed column)."""
    return [
        f"Schema change in table `{table}`: column `{e['column']}` "
        f"{e['change'].replace('_', ' ')} (type: {e['data_type']})"
        for e in events
    ]
