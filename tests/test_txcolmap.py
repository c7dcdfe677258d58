"""Column mapping: metadata-only RENAME / DROP (r9).

Columns carry a stable PHYSICAL name (what parquet bytes are keyed
by); the manifest schema's field name is just the logical label.
Rename/drop therefore commit in metadata time — zero files
rewritten — while reads, writes, merges, DVs, zone skips, bloom
probes, CDF, and the data source all translate transparently. A
re-added logical name gets a fresh physical name, so dropped bytes
never resurface.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bi_utils_spark.operators import txtable as tx


def _rows(spark, *triples):
    return spark.createDataFrame(
        [(k, s, v) for k, s, v in triples], "k int, status string, v long"
    )


@pytest.fixture()
def ptable(spark, tmp_path):
    path = str(tmp_path / "pt")
    tx.create_table(
        _rows(
            spark,
            (1, "A", 10),
            (2, "A", 20),
            (3, "B", 30),
            (4, "B", 40),
        ),
        path,
        partition_cols=["status"],
    )
    return path


def test_rename_is_metadata_only(spark, ptable):
    before = set(tx._fold(ptable).files)
    v = tx.rename_column(ptable, "v", "amount")
    snap = tx._fold(ptable)
    assert set(snap.files) == before  # zero files touched
    got = {
        r["k"]: r["amount"]
        for r in tx.read_table(spark, ptable).collect()
    }
    assert got == {1: 10, 2: 20, 3: 30, 4: 40}
    # time travel shows the OLD label
    old = tx.read_table(spark, ptable, version=v - 1)
    assert "v" in old.columns and "amount" not in old.columns


def test_writes_after_rename_spell_physical(spark, ptable):
    tx.rename_column(ptable, "v", "amount")
    tx.append_table(
        spark.createDataFrame(
            [(9, "A", 90)], "k int, status string, amount long"
        ),
        ptable,
    )
    got = {
        r["k"]: r["amount"]
        for r in tx.read_table(spark, ptable).collect()
    }
    assert got[9] == 90 and got[1] == 10
    # the staged file's parquet bytes are keyed by the PHYSICAL name
    import pyarrow.parquet as pq

    snap = tx._fold(ptable)
    newest = max(
        snap.files,
        key=lambda rel: os.path.getmtime(os.path.join(ptable, rel)),
    )
    names = pq.read_schema(os.path.join(ptable, newest)).names
    assert "v" in names and "amount" not in names


def test_merge_and_update_after_rename(spark, ptable):
    tx.rename_column(ptable, "v", "amount")
    src = spark.createDataFrame(
        [(1, "A", 111), (7, "B", 70)],
        "k int, status string, amount long",
    )
    tx.merge_tx_table(spark, ptable, src, ["k"])
    tx.update_table(spark, ptable, "k = 2", {"amount": "amount + 5"})
    got = {
        r["k"]: r["amount"]
        for r in tx.read_table(spark, ptable).collect()
    }
    assert got[1] == 111 and got[7] == 70 and got[2] == 25


def test_drop_column_hides_bytes(spark, ptable):
    before = set(tx._fold(ptable).files)
    tx.drop_column(ptable, "v")
    snap = tx._fold(ptable)
    assert set(snap.files) == before
    df = tx.read_table(spark, ptable)
    assert df.columns == ["k", "status"]
    assert df.count() == 4


def test_readd_after_drop_never_resurfaces_bytes(spark, ptable):
    tx.drop_column(ptable, "v")
    tx.append_table(
        spark.createDataFrame(
            [(9, "A", 999)], "k int, status string, v long"
        ),
        ptable,
    )
    got = {r["k"]: r["v"] for r in tx.read_table(spark, ptable).collect()}
    # the re-added column reads NULL for pre-drop rows — the dropped
    # bytes (10/20/30/40) must never resurface under the new column
    assert got[9] == 999
    assert all(got[k] is None for k in (1, 2, 3, 4))


def test_rename_guards(spark, ptable):
    with pytest.raises(ValueError, match="no column"):
        tx.rename_column(ptable, "nope", "x")
    with pytest.raises(ValueError, match="exists"):
        tx.rename_column(ptable, "v", "k")
    with pytest.raises(ValueError, match="partition column"):
        tx.rename_column(ptable, "status", "state")
    with pytest.raises(ValueError, match="partition column"):
        tx.drop_column(ptable, "status")
    # renaming BACK onto a physical name still in the files is the
    # resurrection hazard — refused
    tx.rename_column(ptable, "v", "amount")
    tx.append_table(
        spark.createDataFrame(
            [(8, "A", 80, "x")],
            "k int, status string, amount long, note string",
        ),
        ptable,
    )
    with pytest.raises(ValueError, match="physical"):
        tx.rename_column(ptable, "note", "v")


def test_zone_skip_translates_after_rename(spark, tmp_path):
    path = str(tmp_path / "t")
    tx.create_table(
        spark.range(0, 100).selectExpr("id AS k", "id AS v"), path
    )
    tx.append_table(
        spark.range(1000, 1100).selectExpr("id AS k", "id AS v"), path
    )
    tx.rename_column(path, "v", "amount")
    got = tx.read_table(spark, path, where="amount >= 1050")
    assert got.count() == 50
    snap = tx._fold(path)
    maxes = {
        os.path.basename(rel): (m.get("stats", {}).get("v") or [0, 0])[1]
        for rel, m in snap.files.items()
    }
    in_files = [os.path.basename(f) for f in got.inputFiles()]
    assert in_files and all(maxes[f] >= 1050 for f in in_files)


def test_bloom_probe_survives_rename(spark, ptable):
    tx.build_bloom_index(spark, ptable, "v")
    tx.rename_column(ptable, "v", "amount")
    got = tx.read_table(spark, ptable, point={"amount": 30}).where(
        F.col("amount") == 30
    )
    assert [r["k"] for r in got.collect()] == [3]


def test_dv_delete_after_rename(spark, ptable):
    tx.rename_column(ptable, "v", "amount")
    out = tx.delete_from_table(spark, ptable, "amount >= 30")
    assert out["rows_deleted"] == 2
    got = {r["k"] for r in tx.read_table(spark, ptable).collect()}
    assert got == {1, 2}


def test_cdf_spans_rename(spark, ptable):
    v1 = tx.rename_column(ptable, "v", "amount")
    tx.update_table(spark, ptable, "k = 1", {"amount": "amount + 1"})
    feed = tx.table_changes_cdf(spark, ptable, ["k"], after_version=-1)
    assert "amount" in feed.columns
    rows = {
        (r["k"], r["_change_type"], r["_commit_version"], r["amount"])
        for r in feed.collect()
    }
    # the rename commit itself emits nothing
    assert not any(t[2] == v1 for t in rows)
    assert (1, "update_postimage", v1 + 1, 11) in rows
    assert (1, "insert", 0, 10) in rows


def test_batch_source_translates(spark, ptable):
    from bi_utils_spark.sources.txsource import register_txtable_source

    register_txtable_source(spark)
    tx.rename_column(ptable, "v", "amount")
    got = (
        spark.read.format("txtable").option("path", ptable).load()
    )
    assert "amount" in got.columns
    assert {r["amount"] for r in got.collect()} == {10, 20, 30, 40}


def test_rename_conflicts_with_racing_schema_change(spark, ptable):
    snap = tx._fold(ptable)
    tx.rename_column(ptable, "v", "amount")
    from pyspark.sql.types import StructType

    with pytest.raises(tx.ConcurrentWriteError):
        tx._rewrite_commit(
            ptable,
            snap.version,
            "rename_column",
            [],
            [],
            schema=snap.schema,  # stale schema change racing ours
            conflict="files",
        )


def test_clone_carries_mapping(spark, ptable, tmp_path):
    tx.rename_column(ptable, "v", "amount")
    dst = str(tmp_path / "clone")
    tx.clone_table(spark, ptable, dst)
    got = {
        r["k"]: r["amount"] for r in tx.read_table(spark, dst).collect()
    }
    assert got == {1: 10, 2: 20, 3: 30, 4: 40}


def test_restore_across_rename(spark, ptable):
    v0 = tx.latest_version(ptable)
    tx.rename_column(ptable, "v", "amount")
    tx.restore_table(spark, ptable, v0)
    assert "v" in tx.read_table(spark, ptable).columns


def test_symlink_manifest_refuses_mapping(spark, ptable):
    tx.rename_column(ptable, "v", "amount")
    with pytest.raises(ValueError, match="PHYSICAL"):
        tx.write_symlink_manifest(ptable)
