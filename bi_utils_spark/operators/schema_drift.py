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


def decimal_widening_plan(old: StructType, new: StructType) -> dict[str, str]:
    """M4 apply support: per-column widened DECIMAL type each drifted
    column needs to hold BOTH schemas' values — scale = max(scales),
    integer digits = max(integer digits), precision capped at 38
    (Spark's DecimalType max). Only decimal→decimal changes
    participate: strings are unbounded in Spark (widening is a no-op
    by design, reference `utils.py:541-557` widened VARCHARs), and
    unrelated type changes are schema_diff events, not widenings."""
    from pyspark.sql.types import DecimalType

    new_fields = {f.name: f.dataType for f in new.fields}
    out: dict[str, str] = {}
    for f in old.fields:
        nd = new_fields.get(f.name)
        od = f.dataType
        if not (isinstance(od, DecimalType) and isinstance(nd, DecimalType)):
            continue
        scale = max(od.scale, nd.scale)
        intd = max(od.precision - od.scale, nd.precision - nd.scale)
        prec = min(38, intd + scale)
        if (prec, scale) != (od.precision, od.scale):
            out[f.name] = f"decimal({prec},{scale})"
    return out


def _fs_delete(spark, path: str) -> bool:
    """Recursive delete through the Hadoop FileSystem API — works on
    every filesystem Spark can write to (file://, hdfs://, s3a://…).
    A local-only ``shutil.rmtree`` would silently no-op on object
    storage, leaving a table-sized orphan (ADVICE r4). Shared
    implementation: operators/fsops.py."""
    from bi_utils_spark.operators.fsops import fs_delete

    return fs_delete(spark, path)


def apply_widening(
    spark, path: str, plan: dict[str, str]
) -> None:
    """Apply a widening plan to a parquet table IN PLACE (M3/M4 beyond
    report-only): cast the planned columns and rewrite the files. The
    reference issued ``ALTER TABLE … MODIFY COLUMN`` (`utils.py:541-
    557`) because its DWH widens in metadata; parquet encodes decimal
    physical widths per file, so widening the table requires a cast +
    rewrite (string widening stays a genuine no-op — unbounded).

    Staged for safety: cast → write a sibling ``<path>.__widen_tmp``
    (full copy) → overwrite the original FROM the temp → drop the
    temp (via the Hadoop FileSystem API, so cleanup works on
    hdfs://s3a:// paths too, not just the local FS); no job ever
    reads and overwrites the same files. At 100 TB, use
    :func:`apply_widening_partitioned` (one partition at a time), or
    a table format with metadata schema evolution (Delta/Iceberg —
    an ALTER, no rewrite; those jars are not in this image, so the
    parquet path is the one provided)."""
    if not plan:
        return
    df = spark.read.parquet(path)
    casted = df.select(
        *[
            F.col(c).cast(plan[c]).alias(c) if c in plan else F.col(c)
            for c in df.columns
        ]
    )
    tmp = path.rstrip("/") + ".__widen_tmp"
    casted.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(path)
    _fs_delete(spark, tmp)


def apply_widening_partitioned(
    spark,
    path: str,
    plan: dict[str, str],
    partition_cols: Sequence[str],
    partition_values: Sequence[dict] | None = None,
) -> list[dict]:
    """Partition-at-a-time widening — the 100 TB execution of
    :func:`apply_widening`'s own prescription: rewrite ONLY the named
    partitions; every other partition's files stay byte-identical.
    Reuses the partition-scoped overwrite discipline of
    merge.merge_into_partitioned_path (filtered read → partition
    pruning keeps untouched files out of the scan; dynamic partition
    overwrite replaces only the rewritten directories).

    ``partition_values``: list of {col: value} dicts naming the
    partitions to widen this run (run the backfill in waves — a
    scheduler retries one failed date, not the table). ``None`` means
    all partitions (discovered from the partition columns — a bounded
    aggregate over directory metadata, no data columns read).

    Mid-backfill the table holds MIXED physical decimal widths across
    partitions; read it with an explicit schema (the widened one)
    until the sweep completes — parquet vectorized readers up-cast
    narrower physical decimals into the requested type.

    Returns the list of partition dicts actually rewritten."""
    if not plan:
        return []
    from functools import reduce

    df = spark.read.parquet(path)
    missing = [c for c in partition_cols if c not in df.columns]
    if missing:
        raise ValueError(f"widen: partition cols {missing} not in table")
    if partition_values is None:
        partition_values = [
            {c: r[c] for c in partition_cols}
            for r in df.select(*partition_cols).distinct().collect()
        ]
    if not partition_values:
        return []
    pred = reduce(
        lambda a, b: a | b,
        [
            reduce(
                lambda a, b: a & b,
                [F.col(c) == F.lit(pv[c]) for c in partition_cols],
            )
            for pv in partition_values
        ],
    )
    casted = df.filter(pred).select(
        *[
            F.col(c).cast(plan[c]).alias(c) if c in plan else F.col(c)
            for c in df.columns
        ]
    )
    # Shared read-then-overwrite discipline (materialize first):
    # operators/fsops.py, same as the partitioned merge / compaction.
    from bi_utils_spark.operators.fsops import overwrite_partitions

    overwrite_partitions(spark, casted, partition_cols, path)
    return list(partition_values)


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
