"""Metadata-only table statistics (r9).

`table_stats` answers COUNT(*) — and MIN/MAX where provably exact —
from the manifest fold alone: no data file is ever opened. Exactness
contract: counts subtract deletion-vector cardinalities; min/max is
reported only when every live file contributes a zone map and none
carries a DV, NULL otherwise (never a bound presented as a value).
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
            (3, "A", 30),
            (4, "B", 40),
            (5, "B", 50),
            (6, "B", 60),
        ),
        path,
        partition_cols=["status"],
    )
    return path


def test_count_and_minmax_from_manifest(spark, ptable):
    st = tx.table_stats(ptable, columns=["v", "k"])
    assert st["num_rows"] == 6
    assert st["num_files"] == len(tx._fold(ptable).files)
    assert st["columns"]["v"] == {"min": 10, "max": 60}
    assert st["columns"]["k"] == {"min": 1, "max": 6}
    assert st["num_bytes"] > 0


def test_stats_open_no_data_files(spark, ptable, monkeypatch):
    """The whole point: zero reads of parquet data."""
    import pyspark.sql.readwriter as rw

    def _boom(*a, **k):  # pragma: no cover - should never run
        raise AssertionError("table_stats read a data file")

    monkeypatch.setattr(rw.DataFrameReader, "parquet", _boom)
    st = tx.table_stats(ptable, columns=["v"])
    assert st["num_rows"] == 6 and st["columns"]["v"]["max"] == 60


def test_dv_subtracts_exactly_and_gates_minmax(spark, ptable):
    tx.delete_from_table(spark, ptable, F.col("k").isin(2, 5))
    st = tx.table_stats(ptable, columns=["v"])
    assert st["num_rows"] == 4
    assert st["columns"]["v"] is None  # a masked row may hold the extreme


def test_partition_filter_scopes(spark, ptable):
    st = tx.table_stats(ptable, partition_filter={"status": "A"},
                        columns=["v"])
    assert st["num_rows"] == 3
    assert st["columns"]["v"] == {"min": 10, "max": 30}
    assert st["num_files"] < tx.table_stats(ptable)["num_files"]


def test_rewrite_restores_exactness(spark, ptable):
    tx.delete_from_table(spark, ptable, F.col("k") == 2)
    tx.materialize_deletes(spark, ptable)
    st = tx.table_stats(ptable, columns=["v"])
    assert st["num_rows"] == 5
    assert st["columns"]["v"] == {"min": 10, "max": 60}


def test_time_travel_stats(spark, ptable):
    tx.append_table(_rows(spark, (7, "A", 70)), ptable)
    assert tx.table_stats(ptable, version=0)["num_rows"] == 6
    assert tx.table_stats(ptable)["num_rows"] == 7


def test_string_column_is_never_reported(spark, ptable):
    # parquet footers may truncate string stats — honesty over reach
    st = tx.table_stats(ptable, columns=["status", "nope"])
    assert st["columns"]["status"] is None
    assert st["columns"]["nope"] is None


def test_minmax_survives_rename(spark, ptable):
    tx.rename_column(ptable, "v", "val")
    st = tx.table_stats(ptable, columns=["val"])
    assert st["columns"]["val"] == {"min": 10, "max": 60}


def test_timestamp_forms(spark, ptable):
    """RESTORE TIMESTAMP AS OF and CDF timestamp bounds resolve
    through the log's commit stamps."""
    v0_ts = tx._commit_ts(ptable, 0)
    tx.append_table(_rows(spark, (7, "A", 70)), ptable)
    tx.restore_table(spark, ptable, timestamp=v0_ts)
    assert tx.read_table(spark, ptable).count() == 6
    with pytest.raises(ValueError, match="mutually exclusive"):
        tx.restore_table(spark, ptable, version=0, timestamp=v0_ts)
    with pytest.raises(ValueError, match="required"):
        tx.restore_table(spark, ptable)
    feed = tx.table_changes_cdf(
        spark, ptable, ["k"], after_timestamp=v0_ts
    )
    assert feed.count() > 0
    with pytest.raises(ValueError, match="mutually exclusive"):
        tx.table_changes_cdf(
            spark, ptable, ["k"], after_version=0, after_timestamp=v0_ts
        )
    with pytest.raises(ValueError, match="required"):
        tx.table_changes_cdf(spark, ptable, ["k"])


def test_describe_table(spark, ptable):
    tx.add_check_constraint(spark, ptable, "v_pos", "v > 0")
    row = tx.describe_table(spark, ptable).first()
    assert row["format"] == "txtable"
    assert row["version"] == 1
    assert row["num_rows"] == 6
    assert row["partition_columns"] == ["status"]
    assert "checkConstraints" in row["writer_features"]
    assert '"v_pos": "v > 0"' in row["check_constraints"]


def test_null_counts(spark, ptable):
    nulls = spark.createDataFrame(
        [(10, "A", None), (11, "A", 110)], "k int, status string, v long"
    )
    tx.append_table(nulls, ptable)
    st = tx.table_stats(ptable, columns=["v", "status"])
    assert st["null_counts"]["v"] == 1
    assert st["null_counts"]["status"] == 0  # strings count too
    # COUNT(col) = num_rows - nulls, the metadata-only form
    assert st["num_rows"] - st["null_counts"]["v"] == 7
    # DVs gate null counts like min/max (a masked row may be null)
    tx.delete_from_table(spark, ptable, F.col("k") == 10)
    st = tx.table_stats(ptable, columns=["v"])
    assert st["null_counts"]["v"] is None
    assert st["num_rows"] == 7
