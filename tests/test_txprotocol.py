"""Table-features protocol gating (r9).

The log records which features a table USES (the Delta Lake
reader/writer table-features analog, reference parity n/a — the
reference has no transactional tier). A library build that does not
implement a required reader feature must refuse to read (silently
ignoring, say, deletion vectors would return rows the log says are
gone); one that cannot MAINTAIN a writer feature must refuse to
write while reads keep working. Feature sets are monotone and
survive checkpoints, clones, and restores.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from bi_utils_spark.operators import txtable as tx


def _rows(spark, *triples):
    return spark.createDataFrame(
        [(k, s, v) for k, s, v in triples], "k int, status string, v long"
    )


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "t")
    tx.create_table(
        _rows(spark, (1, "A", 10), (2, "A", 20), (3, "B", 30)),
        path,
        partition_cols=["status"],
    )
    return path


def _stamp(path: str, reader=(), writer=()):
    """Append a protocol-bearing no-op commit, as a future library
    build would."""
    snap = tx._fold(path)
    v = snap.version + 1
    assert tx._claim(
        path,
        v,
        {
            "version": v,
            "action": "upgrade",
            "added": [],
            "removed": [],
            "protocol": {
                "reader": sorted(set(reader)),
                "writer": sorted(set(writer) | set(reader)),
            },
        },
    )
    return v


def test_fresh_table_has_no_protocol(table):
    assert tx._fold(table).protocol == {}


def test_mor_delete_stamps_deletion_vectors(spark, table):
    tx.delete_from_table(spark, table, F.col("k") == 1)
    proto = tx._fold(table).protocol
    assert proto["reader"] == ["deletionVectors"]
    assert proto["writer"] == ["deletionVectors"]


def test_mor_update_stamps_deletion_vectors(spark, table):
    tx.update_table(spark, table, F.col("k") == 1, {"v": F.lit(11)})
    assert tx._fold(table).protocol["reader"] == ["deletionVectors"]


def test_stamp_is_idempotent_and_monotone(spark, table):
    tx.delete_from_table(spark, table, F.col("k") == 1)
    v1 = tx.latest_version(table)
    tx.delete_from_table(spark, table, F.col("k") == 2)
    # second delete found the feature already required — no re-stamp
    with open(tx._commit_file(table, v1 + 1)) as fh:
        assert "protocol" not in json.load(fh)
    tx.rename_column(table, "v", "val")
    proto = tx._fold(table).protocol
    assert proto["reader"] == ["columnMapping", "deletionVectors"]


def test_column_mapping_stamps(spark, table):
    tx.rename_column(table, "v", "val")
    assert tx._fold(table).protocol["reader"] == ["columnMapping"]
    tx.drop_column(table, "val")
    assert tx._fold(table).protocol["reader"] == ["columnMapping"]


def test_unknown_reader_feature_refuses_reads(spark, table):
    _stamp(table, reader=["vectorClocks"])
    with pytest.raises(tx.ProtocolError, match="vectorClocks"):
        tx.read_table(spark, table)
    with pytest.raises(tx.ProtocolError):
        tx.append_table(_rows(spark, (9, "A", 90)), table)
    # time travel BELOW the upgrade commit still works — the feature
    # was not in use at that version
    assert tx.read_table(spark, table, version=0).count() == 3


def test_unknown_writer_feature_blocks_writes_not_reads(spark, table):
    _stamp(table, writer=["rowTracking"])
    assert tx.read_table(spark, table).count() == 3
    assert tx.table_history(spark, table).count() == 2
    for call in (
        lambda: tx.append_table(_rows(spark, (9, "A", 90)), table),
        lambda: tx.overwrite_table(_rows(spark, (9, "A", 90)), table),
        lambda: tx.delete_from_table(spark, table, F.col("k") == 1),
        lambda: tx.update_table(
            spark, table, F.col("k") == 1, {"v": F.lit(0)}
        ),
        lambda: tx.compact_table(spark, table),
        lambda: tx.rename_column(table, "v", "val"),
        lambda: tx.drop_column(table, "v"),
        lambda: tx.restore_table(spark, table, 0),
        lambda: tx.vacuum_table(table),
    ):
        with pytest.raises(tx.ProtocolError, match="rowTracking"):
            call()
    # dry-run vacuum is a read — allowed
    tx.vacuum_table(table, dry_run=True)


def test_protocol_survives_checkpoint(spark, table):
    tx.delete_from_table(spark, table, F.col("k") == 1)
    for i in range(tx.CHECKPOINT_EVERY + 2):
        tx.append_table(_rows(spark, (100 + i, "A", 1)), table)
    snap = tx._fold(table)
    ckpts = tx._list_log(table)[1]
    assert ckpts, "expected a checkpoint to have been written"
    with open(tx._ckpt_file(table, max(ckpts))) as fh:
        assert json.load(fh)["protocol"]["reader"] == ["deletionVectors"]
    assert snap.protocol["reader"] == ["deletionVectors"]


def test_clone_carries_protocol(spark, table, tmp_path):
    tx.delete_from_table(spark, table, F.col("k") == 1)
    dst = str(tmp_path / "c")
    tx.clone_table(spark, table, dst)
    assert tx._fold(dst).protocol["reader"] == ["deletionVectors"]


def test_purge_does_not_downgrade(spark, table):
    tx.delete_from_table(spark, table, F.col("k") == 1)
    tx.materialize_deletes(spark, table)
    assert tx._fold(table).protocol["reader"] == ["deletionVectors"]


# ---------------------------------------------------------------------------
# DROP FEATURE
# ---------------------------------------------------------------------------


def test_drop_deletion_vectors_requires_purge(spark, table):
    tx.delete_from_table(spark, table, F.col("k") == 1)
    dv_version = tx.latest_version(table)
    with pytest.raises(ValueError, match="materialize_deletes"):
        tx.drop_table_feature(spark, table, "deletionVectors")
    tx.materialize_deletes(spark, table)
    tx.drop_table_feature(spark, table, "deletionVectors")
    snap = tx._fold(table)
    assert "deletionVectors" not in snap.protocol["reader"]
    assert "deletionVectors" not in snap.protocol["writer"]
    # no history truncation needed: the DV'd version keeps its stamp
    old = tx._fold(table, dv_version)
    assert old.protocol["reader"] == ["deletionVectors"]
    assert tx.read_table(spark, table).count() == 2


def test_drop_column_mapping_only_when_undiverged(spark, table):
    tx.rename_column(table, "v", "val")
    with pytest.raises(ValueError, match="diverged"):
        tx.drop_table_feature(spark, table, "columnMapping")
    # renaming back does NOT help: the physical name is permanent
    tx.rename_column(table, "val", "v2")
    with pytest.raises(ValueError, match="diverged"):
        tx.drop_table_feature(spark, table, "columnMapping")


def test_drop_generated_stops_enforcement(spark, tmp_path):
    path = str(tmp_path / "g")
    df = _rows(spark, (1, "A", 10)).withColumn("d", F.lit("x"))
    tx.create_table(df, path, generated={"l": "length(d)"})
    tx.drop_table_feature(spark, path, "generatedColumns")
    snap = tx._fold(path)
    assert snap.generated == {}
    assert "generatedColumns" not in snap.protocol["writer"]
    # a value the definition would have rejected now passes
    bad = _rows(spark, (2, "A", 20)).withColumn("d", F.lit("x")).withColumn(
        "l", F.lit(999)
    )
    tx.append_table(bad, path)
    got = {r["l"] for r in tx.read_table(spark, path).collect()}
    assert got == {1, 999}


def test_drop_identity_retires_allocation(spark, tmp_path):
    path = str(tmp_path / "i")
    tx.create_table(
        _rows(spark, (1, "A", 10), (2, "B", 20)), path,
        identity={"id": {"start": 1, "step": 1}},
    )
    tx.drop_table_feature(spark, path, "identityColumns")
    snap = tx._fold(path)
    assert snap.identity == {}
    assert "identityColumns" not in snap.protocol["writer"]
    # the column is plain data now: writers supply it themselves
    tx.append_table(
        _rows(spark, (3, "A", 30)).withColumn("id", F.lit(99).cast("long")),
        path,
    )
    assert {
        r["id"] for r in tx.read_table(spark, path).collect()
    } == {1, 2, 99}


def test_drop_unused_feature_raises(spark, table):
    with pytest.raises(ValueError, match="not required"):
        tx.drop_table_feature(spark, table, "deletionVectors")
    with pytest.raises(ValueError, match="not required"):
        tx.drop_table_feature(spark, table, "deletionVektors")  # typo'd
