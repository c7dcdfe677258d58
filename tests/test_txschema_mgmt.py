"""Persisted CHECK constraints, explicit ADD COLUMN, type widening (r9).

All three are metadata-time schema management in the Delta style:
constraints gate every writer's delta before staging; ADD COLUMN and
type widening are one-JSON commits with zero files rewritten (the
parquet reader null-fills the new column and upcasts the narrower
physical values at scan time).
"""

from __future__ import annotations

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


# ---------------------------------------------------------------------------
# persisted CHECK constraints
# ---------------------------------------------------------------------------


def test_add_constraint_then_every_writer_enforces(spark, table):
    tx.add_check_constraint(spark, table, "v_pos", "v > 0")
    snap = tx._fold(table)
    assert snap.constraints == {"v_pos": "v > 0"}
    assert "checkConstraints" in snap.protocol["writer"]
    with pytest.raises(tx.CheckViolation, match="v_pos"):
        tx.append_table(_rows(spark, (9, "A", -1)), table)
    with pytest.raises(tx.CheckViolation, match="v_pos"):
        tx.merge_tx_table(spark, table, _rows(spark, (1, "A", -5)), ["k"])
    with pytest.raises(tx.CheckViolation, match="v_pos"):
        tx.update_table(spark, table, F.col("k") == 1, {"v": F.lit(-7)})
    with pytest.raises(tx.CheckViolation, match="v_pos"):
        tx.overwrite_table(_rows(spark, (9, "A", 0)), table)
    # nothing staged by any of the rejected batches
    assert tx.read_table(spark, table).count() == 3
    tx.append_table(_rows(spark, (9, "A", 90)), table)  # valid passes
    assert tx.read_table(spark, table).count() == 4


def test_null_passes_sql_semantics(spark, table):
    tx.add_check_constraint(spark, table, "v_pos", "v > 0")
    nulls = spark.createDataFrame(
        [(10, "A", None)], "k int, status string, v long"
    )
    tx.append_table(nulls, table)  # NULL check result = pass
    assert tx.read_table(spark, table).count() == 4


def test_add_validates_existing_rows(spark, table):
    with pytest.raises(tx.CheckViolation, match="v_small"):
        tx.add_check_constraint(spark, table, "v_small", "v < 25")
    assert tx._fold(table).constraints == {}


def test_add_duplicate_and_drop(spark, table):
    tx.add_check_constraint(spark, table, "v_pos", "v > 0")
    with pytest.raises(ValueError, match="already exists"):
        tx.add_check_constraint(spark, table, "v_pos", "v > 1")
    tx.drop_check_constraint(table, "v_pos")
    assert tx._fold(table).constraints == {}
    tx.append_table(_rows(spark, (9, "A", -1)), table)  # enforcement gone
    with pytest.raises(ValueError, match="no constraint"):
        tx.drop_check_constraint(table, "nope")
    # the feature stays until dropped explicitly
    snap = tx._fold(table)
    assert "checkConstraints" in snap.protocol["writer"]
    tx.drop_table_feature(spark, table, "checkConstraints")
    assert "checkConstraints" not in tx._fold(table).protocol["writer"]


def test_update_postimages_gated_both_modes(spark, table):
    tx.add_check_constraint(spark, table, "v_cap", "v <= 100")
    with pytest.raises(tx.CheckViolation):
        tx.update_table(
            spark, table, F.col("k") == 1, {"v": F.lit(200)}, mode="cow"
        )
    assert tx.read_table(spark, table).where("v > 100").count() == 0


def test_constraints_survive_checkpoint(spark, table):
    tx.add_check_constraint(spark, table, "v_pos", "v > 0")
    for i in range(tx.CHECKPOINT_EVERY + 1):
        tx.append_table(_rows(spark, (100 + i, "A", 1)), table)
    assert tx._list_log(table)[1]
    assert tx._fold(table).constraints == {"v_pos": "v > 0"}


# ---------------------------------------------------------------------------
# ADD COLUMN / type widening
# ---------------------------------------------------------------------------


def test_add_column_null_fills(spark, table):
    v0_files = set(tx._fold(table).files)
    tx.add_column(table, "note", "string")
    assert set(tx._fold(table).files) == v0_files  # zero rewrites
    df = tx.read_table(spark, table)
    assert df.schema["note"].dataType.simpleString() == "string"
    assert df.where(F.col("note").isNull()).count() == 3
    tx.append_table(
        spark.createDataFrame(
            [(9, "A", 90, "hi")], "k int, status string, v long, note string"
        ),
        table,
    )
    assert tx.read_table(spark, table).where("note = 'hi'").count() == 1
    with pytest.raises(ValueError, match="exists"):
        tx.add_column(table, "v", "long")


def test_add_column_fresh_physical_name_under_mapping(spark, table):
    tx.rename_column(table, "v", "val")  # enables mapping
    tx.drop_column(table, "val")
    tx.add_column(table, "val", "long")  # same logical name re-added
    # fresh physical name: the dropped bytes must NOT resurface
    df = tx.read_table(spark, table)
    assert df.where(F.col("val").isNotNull()).count() == 0


def test_widen_column_type(spark, table):
    v0_files = set(tx._fold(table).files)
    tx.append_table(_rows(spark, (4, "B", 40)), table)
    tx.widen_column_type(table, "k", "bigint")
    assert set(tx._fold(table).files) > v0_files  # still zero rewrites
    df = tx.read_table(spark, table)
    assert df.schema["k"].dataType.simpleString() == "bigint"
    assert {r["k"] for r in df.collect()} == {1, 2, 3, 4}
    # wide appends now pass type validation
    tx.append_table(
        spark.createDataFrame(
            [(2**40, "A", 50)], "k long, status string, v long"
        ),
        table,
    )
    assert tx.read_table(spark, table).where(f"k = {2**40}").count() == 1
    # zone-map skip still prunes correctly across old narrow files
    lo = tx.read_table(spark, table, skip={"k": (4, None)})
    assert {r["k"] for r in lo.collect()} == {4, 2**40}


def test_widen_rejects_narrowing_and_partition(spark, table):
    with pytest.raises(ValueError, match="not a lossless widening"):
        tx.widen_column_type(table, "v", "int")
    with pytest.raises(ValueError, match="partition"):
        tx.widen_column_type(table, "status", "string")
    with pytest.raises(ValueError, match="already"):
        tx.widen_column_type(table, "v", "bigint")


def test_float_to_double(spark, tmp_path):
    path = str(tmp_path / "f")
    tx.create_table(
        spark.createDataFrame([(1, 1.5)], "k int, x float"), path
    )
    tx.widen_column_type(path, "x", "double")
    row = tx.read_table(spark, path).first()
    assert abs(row["x"] - 1.5) < 1e-9
