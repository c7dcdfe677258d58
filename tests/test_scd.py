from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from bi_utils_spark.operators.scd import (
    scd2_apply,
    scd2_from_history,
    scd2_snapshot,
)


def _ts(day: int):
    return dt.datetime(2024, 1, day)


@pytest.fixture(scope="module")
def history(spark):
    rows = [
        # key 1: A -> A (collapse) -> B -> B (collapse) -> A again
        (1, _ts(1), "A"),
        (1, _ts(2), "A"),
        (1, _ts(3), "B"),
        (1, _ts(4), "B"),
        (1, _ts(5), "A"),
        # key 2: single version
        (2, _ts(2), "X"),
        # key 3: null attribute transitions (null-safe compare)
        (3, _ts(1), None),
        (3, _ts(2), None),
        (3, _ts(3), "C"),
    ]
    return spark.createDataFrame(rows, ["k", "ts", "attr"])


def test_history_collapses_runs_and_tracks_intervals(history):
    out = scd2_from_history(history, ["k"], ["attr"], "ts").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    for v in by_key.values():
        v.sort(key=lambda r: r["valid_from"])

    k1 = by_key[1]
    assert [(r["attr"], r["valid_from"], r["valid_to"]) for r in k1] == [
        ("A", _ts(1), _ts(3)),
        ("B", _ts(3), _ts(5)),
        ("A", _ts(5), None),
    ]
    assert [r["is_current"] for r in k1] == [False, False, True]

    assert len(by_key[2]) == 1 and by_key[2][0]["is_current"]

    k3 = by_key[3]
    assert [(r["attr"], r["valid_from"]) for r in k3] == [
        (None, _ts(1)),
        ("C", _ts(3)),
    ]


def test_intervals_partition_the_timeline(history):
    out = scd2_from_history(history, ["k"], ["attr"], "ts")
    # valid_to of version i == valid_from of version i+1; exactly one
    # current row per key.
    cur = out.groupBy("k").agg(
        F.sum(F.col("is_current").cast("int")).alias("n")
    )
    assert all(r["n"] == 1 for r in cur.collect())


def test_apply_change_new_noop(spark, history):
    dim = scd2_from_history(history, ["k"], ["attr"], "ts")
    updates = spark.createDataFrame(
        [(1, "Z"), (2, "X"), (9, "NEW")], ["k", "attr"]
    )
    out = scd2_apply(dim, updates, ["k"], ["attr"], _ts(9))
    rows = {(r["k"], r["attr"], r["is_current"]): r for r in out.collect()}

    # changed key 1: old current closed at batch ts, new current opened
    assert rows[(1, "A", False)]["valid_to"] == _ts(9)
    assert rows[(1, "Z", True)]["valid_from"] == _ts(9)
    # no-op key 2: still one current row, untouched
    assert rows[(2, "X", True)]["valid_from"] == _ts(2)
    # new key 9 inserts as current
    assert rows[(9, "NEW", True)]["valid_from"] == _ts(9)
    # closed history passes through
    assert (1, "B", False) in rows
    # exactly one current row per key
    cur = (
        out.where("is_current").groupBy("k").count().collect()
    )
    assert all(r["count"] == 1 for r in cur)


def test_apply_idempotent_on_redelivery(spark, history):
    dim = scd2_from_history(history, ["k"], ["attr"], "ts")
    updates = spark.createDataFrame([(1, "Z")], ["k", "attr"])
    once = scd2_apply(dim, updates, ["k"], ["attr"], _ts(9))
    twice = scd2_apply(once, updates, ["k"], ["attr"], _ts(10))
    key = lambda r: repr(r)
    assert sorted(map(tuple, once.collect()), key=key) == sorted(
        map(tuple, twice.collect()), key=key
    )


def test_snapshot_point_in_time(history):
    dim = scd2_from_history(history, ["k"], ["attr"], "ts")
    # at day 3 12:00 key1 is B; boundary day 3 exactly: B (from <= at)
    snap = scd2_snapshot(dim, dt.datetime(2024, 1, 3, 12))
    vals = {r["k"]: r["attr"] for r in snap.collect()}
    assert vals[1] == "B" and vals[2] == "X" and vals[3] == "C"
    at_boundary = scd2_snapshot(dim, _ts(3))
    assert {r["k"]: r["attr"] for r in at_boundary.collect()}[1] == "B"


def test_apply_equals_rebuilt_history(spark, history):
    """Folding a batch into the SCD2 table == rebuilding from the
    concatenated raw history (the defining property)."""
    updates = spark.createDataFrame(
        [(1, "Z"), (2, "X"), (9, "NEW")], ["k", "attr"]
    )
    applied = scd2_apply(
        scd2_from_history(history, ["k"], ["attr"], "ts"),
        updates,
        ["k"],
        ["attr"],
        _ts(9),
    )
    rebuilt = scd2_from_history(
        history.unionByName(
            updates.withColumn("ts", F.lit(_ts(9))).select(
                "k", "ts", "attr"
            )
        ),
        ["k"],
        ["attr"],
        "ts",
    )
    key = lambda r: repr(r)
    assert sorted(map(tuple, applied.collect()), key=key) == sorted(
        map(tuple, rebuilt.collect()), key=key
    )


def test_apply_duplicate_update_rows_deterministic(spark, history):
    """Two update rows for one key resolve by lexicographic struct
    max — stable under repartitioning, not arrival order."""
    dim = scd2_from_history(history, ["k"], ["attr"], "ts")
    updates = spark.createDataFrame(
        [(1, "M"), (1, "Z"), (1, "A")], ["k", "attr"]
    )
    out = scd2_apply(dim, updates, ["k"], ["attr"], _ts(9))
    cur = out.where("is_current AND k = 1").collect()
    assert len(cur) == 1 and cur[0]["attr"] == "Z"


def test_join_facts_takes_covering_version(spark, history):
    from bi_utils_spark.operators.scd import scd2_join_facts

    dim = scd2_from_history(history, ["k"], ["attr"], "ts")
    facts = spark.createDataFrame(
        [
            (100, 1, dt.datetime(2024, 1, 2, 12)),  # inside A interval
            (101, 1, _ts(3)),                       # boundary -> B (newer)
            (102, 1, dt.datetime(2024, 1, 9)),      # current version A
            (103, 2, _ts(5)),                       # key 2 current X
        ],
        ["fid", "k", "fts"],
    )
    out = {
        r["fid"]: r["attr"]
        for r in scd2_join_facts(facts, dim, ["k"], "fts").collect()
    }
    assert out == {100: "A", 101: "B", 102: "A", 103: "X"}
    # exactly one dimension version per fact
    n = scd2_join_facts(facts, dim, ["k"], "fts").count()
    assert n == 4


def _as_tuples(df):
    cols = ["k", "attr", "valid_from", "valid_to", "is_current"]
    return sorted(
        (tuple(r[c] for c in cols) for r in df.select(*cols).collect()),
        key=repr,
    )


def test_apply_changes_batched_equals_full_rebuild(spark, history):
    """Streaming-batch parity: folding a ts-ordered change log
    through ANY micro-batch partition via scd2_apply_changes lands
    on the same table as one scd2_from_history over the whole log."""
    from bi_utils_spark.operators.scd import scd2_apply_changes

    rows = sorted(history.collect(), key=lambda r: (r["ts"], r["k"]))
    full = scd2_from_history(history, ["k"], ["attr"], "ts")
    for split in (3, 5, 7):
        b1 = spark.createDataFrame(rows[:split], history.schema)
        b2 = spark.createDataFrame(rows[split:], history.schema)
        dim = scd2_from_history(b1, ["k"], ["attr"], "ts")
        out = scd2_apply_changes(dim, b2, ["k"], ["attr"], "ts")
        assert _as_tuples(out) == _as_tuples(full), split


def test_apply_changes_multiple_versions_in_one_batch(spark, history):
    """Several changes to one key inside one batch each open a
    version — unlike scd2_apply's one-snapshot-per-batch fold."""
    from bi_utils_spark.operators.scd import scd2_apply_changes

    dim = scd2_from_history(history, ["k"], ["attr"], "ts")
    batch = spark.createDataFrame(
        [(2, _ts(6), "Y"), (2, _ts(8), "Z")], ["k", "ts", "attr"]
    )
    out = scd2_apply_changes(dim, batch, ["k"], ["attr"], "ts")
    k2 = sorted(
        out.where("k = 2").collect(), key=lambda r: r["valid_from"]
    )
    assert [(r["attr"], r["valid_from"], r["valid_to"]) for r in k2] == [
        ("X", _ts(2), _ts(6)),
        ("Y", _ts(6), _ts(8)),
        ("Z", _ts(8), None),
    ]
    # untouched keys pass through bit-identically
    assert _as_tuples(out.where("k != 2")) == _as_tuples(
        dim.where("k != 2")
    )


def test_apply_changes_redelivery_idempotent(spark, history):
    from bi_utils_spark.operators.scd import scd2_apply_changes

    dim = scd2_from_history(history, ["k"], ["attr"], "ts")
    batch = spark.createDataFrame(
        [(1, _ts(7), "Q"), (3, _ts(3), "C")], ["k", "ts", "attr"]
    )
    once = scd2_apply_changes(dim, batch, ["k"], ["attr"], "ts")
    twice = scd2_apply_changes(once, batch, ["k"], ["attr"], "ts")
    assert _as_tuples(once) == _as_tuples(twice)
    # the no-op redelivery for key 3 opened no version
    assert once.where("k = 3").count() == dim.where("k = 3").count()
