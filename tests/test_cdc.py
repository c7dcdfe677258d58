from __future__ import annotations

import pytest

from bi_utils_spark.operators.cdc import apply_cdc


@pytest.fixture(scope="module")
def log(spark):
    rows = [
        # key 1: insert, update — update wins
        (1, 1, "I", "a1"),
        (1, 2, "U", "a2"),
        # key 2: insert then delete — gone
        (2, 1, "I", "b1"),
        (2, 3, "D", None),
        # key 3: delete then LATE insert with higher ordinal — back
        (3, 5, "I", "c5"),
        (3, 4, "D", None),
        # key 4: single insert
        (4, 1, "I", "d1"),
    ]
    return spark.createDataFrame(rows, ["k", "ord", "op", "v"])


def test_net_effect(log):
    out = {r["k"]: r["v"] for r in apply_cdc(log, ["k"], ["v"]).collect()}
    assert out == {1: "a2", 3: "c5", 4: "d1"}  # key 2 deleted


def test_idempotent_and_order_independent(spark, log):
    shuffled = log.orderBy("v").repartition(7)
    a = sorted(map(tuple, apply_cdc(log, ["k"], ["v"]).collect()))
    b = sorted(map(tuple, apply_cdc(shuffled, ["k"], ["v"]).collect()))
    assert a == b
    doubled = log.unionByName(log)
    c = sorted(map(tuple, apply_cdc(doubled, ["k"], ["v"]).collect()))
    assert a == c


def test_base_snapshot_participates_as_oldest(spark, log):
    base = spark.createDataFrame(
        [(2, "old-b"), (9, "old-i")], ["k", "v"]
    )
    out = {
        r["k"]: r["v"]
        for r in apply_cdc(log, ["k"], ["v"], base=base).collect()
    }
    # key 2's delete still wins over the snapshot; key 9 survives
    assert 2 not in out and out[9] == "old-i"
    assert out[1] == "a2"


def test_tiebreak_column(spark):
    rows = [(1, 7, 1, "I", "first"), (1, 7, 2, "U", "second")]
    df = spark.createDataFrame(rows, ["k", "ord", "seq", "op", "v"])
    out = apply_cdc(df, ["k"], ["v"], tiebreak_col="seq").collect()
    assert out[0]["v"] == "second"


def test_one_aggregation_no_window(log):
    plan = (
        apply_cdc(log, ["k"], ["v"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one key exchange with a map-side partial max — the struct max
    # lowers to SortAggregate (per-partition sort, bounded), never a
    # window or a global sort
    assert "WindowExec" not in plan
    assert plan.count("Exchange") == 1
    assert "partial_max" in plan
