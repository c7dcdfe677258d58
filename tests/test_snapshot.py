"""operators/snapshot.py — corpus snapshot diffing."""

from __future__ import annotations

import pytest

from bi_utils_spark.operators.snapshot import assert_unique_keys, snapshot_diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_diff_classifies_all_four_states(spark):
    old = _snap(spark, [(1, "a", "en"), (2, "b", "en"), (3, "c", "de"), (4, None, "en")])
    new = _snap(spark, [(2, "b", "en"), (3, "C", "de"), (4, "", "en"), (5, "e", "fr")])
    got = {r["doc_id"]: r["change"] for r in snapshot_diff(old, new, ["doc_id"]).collect()}
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "changed",  # NULL -> '' IS a change (null-safe identity)
        5: "added",
    }


def test_changed_only_prunes(spark):
    old = _snap(spark, [(1, "a", "en"), (2, "b", "en")])
    new = _snap(spark, [(1, "a", "en"), (2, "B", "en")])
    got = snapshot_diff(old, new, ["doc_id"], changed_only=True).collect()
    assert [(r["doc_id"], r["change"]) for r in got] == [(2, "changed")]


def test_content_cols_subset(spark):
    old = _snap(spark, [(1, "a", "en")])
    new = _snap(spark, [(1, "a", "de")])  # only lang differs
    full = snapshot_diff(old, new, ["doc_id"]).first()["change"]
    text_only = snapshot_diff(old, new, ["doc_id"], content_cols=["text"]).first()[
        "change"
    ]
    assert (full, text_only) == ("changed", "unchanged")


def test_validations_and_unique_probe(spark):
    old = _snap(spark, [(1, "a", "en")])
    with pytest.raises(ValueError, match="key column"):
        snapshot_diff(old, old, [])
    with pytest.raises(ValueError, match="content columns"):
        snapshot_diff(
            old.select("doc_id"), old.select("doc_id"), ["doc_id"]
        )
    dup = _snap(spark, [(1, "a", "en"), (1, "b", "en")])
    with pytest.raises(ValueError, match="duplicate key"):
        assert_unique_keys(dup, ["doc_id"])
    assert_unique_keys(old, ["doc_id"])  # passes silently


def test_diff_plan_never_carries_payloads(spark):
    # the join sides project (key, 32-byte digest) — the text column
    # must not appear above the pre-join projections
    from bi_utils_spark.plans.inspect import executed_plan

    old = _snap(spark, [(i, "x" * 100, "en") for i in range(50)])
    new = _snap(spark, [(i, "x" * 100, "en") for i in range(50)])
    plan = executed_plan(snapshot_diff(old, new, ["doc_id"]))
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan
