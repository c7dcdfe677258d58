"""Partition evolution (r9) — the Iceberg analog Delta lacks.

`repartition_table` swaps the partition spec in one metadata commit.
Old-spec files stay live: reads/DELETE/UPDATE scope them with an
automatic row-level filter (fail-open at the manifest), MERGE treats
them as always-touched and migrates them, table_stats refuses to
guess, and compact_table is the one-shot migration.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bi_utils_spark.operators import txtable as tx


def _rows(spark, ks):
    return spark.createDataFrame(
        [(k, "A" if k % 2 == 0 else "B", k % 3, k * 10) for k in ks],
        "k int, status string, bucket int, v long",
    )


@pytest.fixture()
def rtable(spark, tmp_path):
    """v0: partitioned by status (k 0..9). v1: respec to bucket.
    v2: append k 10..19 under the new spec."""
    path = str(tmp_path / "rt")
    tx.create_table(_rows(spark, range(10)), path, partition_cols=["status"])
    tx.repartition_table(path, ["bucket"])
    tx.append_table(_rows(spark, range(10, 20)), path)
    return path


def test_respec_is_metadata_only(spark, rtable):
    snap = tx._fold(rtable)
    assert snap.partition_cols == ["bucket"]
    specs = {
        frozenset(meta["partition_values"]) for meta in snap.files.values()
    }
    assert specs == {frozenset({"status"}), frozenset({"bucket"})}
    got = {r["k"] for r in tx.read_table(spark, rtable).collect()}
    assert got == set(range(20))


def test_partition_filter_fail_open_plus_row_filter(spark, rtable):
    # bucket=1: new-spec files prune at the manifest; old-spec files
    # stay and the row filter scopes them
    got = {
        r["k"]
        for r in tx.read_table(
            spark, rtable, partition_filter={"bucket": 1}
        ).collect()
    }
    assert got == {k for k in range(20) if k % 3 == 1}
    # filtering on the OLD spec column still works the same way
    got = {
        r["k"]
        for r in tx.read_table(
            spark, rtable, partition_filter={"status": "A"}
        ).collect()
    }
    assert got == {k for k in range(20) if k % 2 == 0}


def test_guards(spark, rtable, tmp_path):
    with pytest.raises(ValueError, match="already partitioned"):
        tx.repartition_table(rtable, ["bucket"])
    with pytest.raises(ValueError, match="no column"):
        tx.repartition_table(rtable, ["nope"])
    path = str(tmp_path / "ident")
    tx.create_table(
        _rows(spark, range(3)).drop("k"),
        path,
        identity={"k": {"start": 1}},
    )
    with pytest.raises(ValueError, match="identity column"):
        tx.repartition_table(path, ["k"])


def test_delete_scoped_by_partition_filter_across_specs(spark, rtable):
    out = tx.delete_from_table(
        spark, rtable, F.col("v") >= 0, partition_filter={"bucket": 0}
    )
    assert out["rows_deleted"] == sum(1 for k in range(20) if k % 3 == 0)
    left = {r["k"] for r in tx.read_table(spark, rtable).collect()}
    assert left == {k for k in range(20) if k % 3 != 0}


def test_merge_reaches_rows_in_old_spec_files(spark, rtable):
    # k=4 lives in an old-spec (status) file, k=15 in a new-spec one,
    # k=100 is an insert
    src = spark.createDataFrame(
        [(4, "A", 1, 999), (15, "B", 0, 888), (100, "A", 1, 777)],
        "k int, status string, bucket int, v long",
    )
    tx.merge_tx_table(spark, rtable, src, ["k"])
    got = {r["k"]: r["v"] for r in tx.read_table(spark, rtable).collect()}
    assert got[4] == 999 and got[15] == 888 and got[100] == 777
    assert len(got) == 21
    # every key appears once — the old-spec copy of k=4 was retired
    df = tx.read_table(spark, rtable)
    assert df.groupBy("k").count().where("count > 1").count() == 0
    # and the stale files are GONE from the manifest (migrated)
    snap = tx._fold(rtable)
    specs = {
        frozenset(meta["partition_values"]) for meta in snap.files.values()
    }
    assert specs == {frozenset({"bucket"})}


def test_stats_refuse_inexact_scope_until_compacted(spark, rtable):
    st = tx.table_stats(rtable, partition_filter={"bucket": 1})
    assert st["num_rows"] is None  # old-spec files: honest unknown
    assert tx.table_stats(rtable)["num_rows"] == 20  # unscoped exact
    tx.compact_table(spark, rtable)
    snap = tx._fold(rtable)
    assert all(
        set(meta["partition_values"]) == {"bucket"}
        for meta in snap.files.values()
    )
    st = tx.table_stats(rtable, partition_filter={"bucket": 1})
    assert st["num_rows"] == sum(1 for k in range(20) if k % 3 == 1)


def test_update_scoped_across_specs(spark, rtable):
    tx.update_table(
        spark,
        rtable,
        F.col("v") >= 0,
        {"v": F.lit(-1)},
        partition_filter={"bucket": 2},
    )
    hit = {
        r["k"]
        for r in tx.read_table(spark, rtable).where("v = -1").collect()
    }
    assert hit == {k for k in range(20) if k % 3 == 2}


def test_cdf_spans_a_respec(spark, rtable):
    feed = tx.table_changes_cdf(spark, rtable, ["k"], after_version=-1)
    ins = feed.where("_change_type = 'insert'")
    assert ins.count() == 20


# ---------------------------------------------------------------------------
# FIM transform (co-located here to avoid a one-test file; it has no
# tx dependency)
# ---------------------------------------------------------------------------


def test_fim_transform_segments_and_determinism(spark):
    from bi_utils_spark.operators import fim

    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, ""), (3, None), (4, "xy")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["fim_text"], r["fim_text_applied"])
        for r in fim.fim_transform(df, "doc_id", "text", rate=1.0).collect()
    }
    assert out[2] == ("", False)  # shorter than min_chars
    assert out[3] == (None, False)
    for doc_id, text in [(1, "abcdefghij"), (4, "xy")]:
        t, applied = out[doc_id]
        assert applied
        pre, rest = t.split(fim.SUF_TOK)
        pre = pre.removeprefix(fim.PRE_TOK)
        suf, mid = rest.split(fim.MID_TOK)
        assert pre + mid + suf == text  # splice identity
    # rate=0 is the identity
    out0 = {
        r["doc_id"]: r["fim_text"]
        for r in fim.fim_transform(df, "doc_id", "text", rate=0.0).collect()
    }
    assert out0[1] == "abcdefghij"
    # deterministic across invocations
    again = {
        r["doc_id"]: r["fim_text"]
        for r in fim.fim_transform(df, "doc_id", "text", rate=1.0).collect()
    }
    assert again[1] == out[1][0]
    with pytest.raises(ValueError, match="rate"):
        fim.fim_transform(df, "doc_id", "text", rate=1.5)


def test_merge_on_partition_move_modes(spark, tmp_path):
    """A source row whose partition value changed: 'migrate' (the
    default) retires the old copy, 'error' raises pre-commit,
    'ignore' keeps the scope-strict zero-cost contract (and strands,
    documented)."""

    def fresh(tag):
        p = str(tmp_path / tag)
        tx.create_table(
            spark.createDataFrame(
                [(1, "d1", 10), (2, "d2", 20), (3, "d3", 30)],
                "k int, day string, v long",
            ),
            p,
            partition_cols=["day"],
        )
        return p

    moved = spark.createDataFrame(
        [(1, "d2", 99)], "k int, day string, v long"
    )
    p = fresh("migrate")
    tx.merge_tx_table(spark, p, moved, ["k"])
    rows = {(r["k"], r["day"], r["v"])
            for r in tx.read_table(spark, p).collect()}
    assert rows == {(1, "d2", 99), (2, "d2", 20), (3, "d3", 30)}

    p = fresh("err")
    with pytest.raises(ValueError, match="OUTSIDE"):
        tx.merge_tx_table(spark, p, moved, ["k"], on_partition_move="error")
    assert tx.latest_version(p) == 0

    p = fresh("ign")
    tx.merge_tx_table(spark, p, moved, ["k"], on_partition_move="ignore")
    ks = [r["k"] for r in tx.read_table(spark, p).collect()]
    assert sorted(ks) == [1, 1, 2, 3]  # the documented strand

    with pytest.raises(ValueError, match="on_partition_move"):
        tx.merge_tx_table(spark, fresh("bad"), moved, ["k"],
                          on_partition_move="nope")
