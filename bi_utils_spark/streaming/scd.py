"""Streaming SCD2 dimension maintenance (X106, r7) — the continuous
form of ``operators/scd.py``. A change stream (key, tracked
attributes, event timestamp) keeps a Type-2 dimension current via
``foreachBatch``: each micro-batch folds through
``scd2_apply_changes``'s rebuild (same code path as batch — the
repo's streaming/batch-parity discipline, cf. streaming/cdc.py).

Storage layout (plain-parquet incremental; a Delta/Iceberg MERGE
sink is the production swap, capability-gated like merge.py's ACID
tier — jars absent in this image):

    <table>/closed/__b=<batch_id>/   append-only closed versions,
                                     one directory per micro-batch
    <table>/current/v=<batch_id>/    the FULL current slice as of
                                     that batch (|keys| rows)
    <table>/_VERSION                 last committed batch id

Per batch the write is |current slice| + |newly closed| rows —
closed history, the bulk after years of changes, is NEVER rewritten
or even read. Commit order (closed delta, new current slice, then
the version pointer) plus the ``batch_id <= committed`` replay
guard makes the fold exactly-once under foreachBatch's
at-least-once retries: a crash before the pointer re-runs the batch
into the SAME directories (overwrite, idempotent); a crash after is
skipped on replay. Readers (:func:`read_scd2_table`) only trust
closed directories ``<= _VERSION``, so a half-committed batch is
invisible. Old ``current/v=*`` directories are retained for
point-in-time reads until vacuumed (retention policy, not
correctness).

Late data follows ``scd2_apply_changes``'s bounded-lateness
contract: changes older than their key's current ``valid_from``
fold into the current segment; closed history is never reopened.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_VERSION_FILE = "_VERSION"


def _read_version(table_path: str) -> int | None:
    try:
        with open(os.path.join(table_path, _VERSION_FILE)) as fh:
            return int(fh.read().strip())
    except (OSError, ValueError):
        return None


def _write_version(table_path: str, batch_id: int) -> None:
    os.makedirs(table_path, exist_ok=True)
    tmp = os.path.join(table_path, _VERSION_FILE + ".tmp")
    with open(tmp, "w") as fh:
        fh.write(str(batch_id))
    os.replace(tmp, os.path.join(table_path, _VERSION_FILE))


def read_scd2_table(spark: SparkSession, table_path: str) -> DataFrame:
    """The maintained dimension at its last committed version:
    closed versions (directories ``<= _VERSION`` only — see the
    commit protocol above) plus the current slice."""
    ptr = _read_version(table_path)
    if ptr is None:
        raise FileNotFoundError(
            f"no committed SCD2 table at {table_path!r}"
        )
    cur = spark.read.parquet(os.path.join(table_path, f"current/v={ptr}"))
    closed_root = os.path.join(table_path, "closed")
    try:
        closed = (
            spark.read.option("basePath", closed_root)
            .parquet(closed_root)
            .where(F.col("__b") <= ptr)
            .drop("__b")
        )
    except Exception:  # noqa: BLE001 — no closed versions yet
        return cur
    return closed.unionByName(cur)


def scd2_maintain_stream(
    stream: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    ts_col: str,
    table_path: str,
    checkpoint_dir: str,
    query_name: str = "scd2_maintain",
    tiebreak_cols: list[str] | None = None,
) -> StreamingQuery:
    """Start the maintainer: every micro-batch of change events
    folds into the stored dimension through the
    ``operators/scd.py::_rebuild_touched`` rebuild (the exact
    ``scd2_apply_changes`` code path). Streaming-batch parity is
    test-asserted: feeding a ts-ordered change log through any
    micro-batch partition lands on the same table as one
    ``scd2_from_history`` over the whole log.
    """
    from bi_utils_spark.operators.scd import (
        _rebuild_touched,
        scd2_from_history,
    )

    out_cols = [*key_cols, *tracked_cols, "valid_from", "valid_to",
                "is_current"]

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        committed = _read_version(table_path)
        if committed is not None and batch_id <= committed:
            return  # replay of a committed batch
        spark = batch_df.sparkSession
        if committed is None:
            new = scd2_from_history(
                batch_df.select(*key_cols, *tracked_cols, ts_col),
                key_cols, tracked_cols, ts_col, tiebreak_cols,
            )
            closed_delta = new.where(~F.col("is_current"))
            cur_new = new.where(F.col("is_current"))
        else:
            cur = spark.read.parquet(
                os.path.join(table_path, f"current/v={committed}")
            )
            rebuilt, cur_untouched = _rebuild_touched(
                cur, batch_df, key_cols, tracked_cols, ts_col,
                tiebreak_cols,
            )
            closed_delta = rebuilt.where(~F.col("is_current"))
            cur_new = cur_untouched.select(*out_cols).unionByName(
                rebuilt.where(F.col("is_current")).select(*out_cols)
            )
        closed_delta.select(*out_cols).write.mode("overwrite").parquet(
            os.path.join(table_path, f"closed/__b={batch_id}")
        )
        cur_new.select(*out_cols).write.mode("overwrite").parquet(
            os.path.join(table_path, f"current/v={batch_id}")
        )
        _write_version(table_path, batch_id)

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .queryName(query_name)
        .start()
    )
