"""PSI distribution drift (operators/drift.py)."""

from __future__ import annotations

import math

import pytest

from bi_utils_spark.operators.drift import psi_report


def _by_col(df):
    return {r["column"]: r for r in df.collect()}


def test_identical_distribution_is_stable(spark):
    base = spark.createDataFrame(
        [(float(i % 50), i % 7) for i in range(700)], ["v", "w"]
    )
    cur = spark.createDataFrame(
        [(float((i * 13) % 50), i % 7) for i in range(350)], ["v", "w"]
    )
    out = _by_col(psi_report(base, cur, ["v", "w"]))
    assert out["v"]["verdict"] == "stable" and out["v"]["psi"] < 0.01
    assert out["w"]["verdict"] == "stable"
    assert out["v"]["n_base"] == 700 and out["v"]["n_cur"] == 350


def test_shift_and_null_rate_read_as_drift(spark):
    base = spark.createDataFrame(
        [(float(i % 100),) for i in range(1000)], ["v"]
    )
    shifted = spark.createDataFrame(
        [(float(i % 100) + 70.0,) for i in range(1000)], ["v"]
    )
    nulled = spark.createDataFrame(
        [((float(i % 100) if i % 3 else None),) for i in range(1000)],
        "v double",
    )
    assert _by_col(psi_report(base, shifted, ["v"]))["v"]["verdict"] == (
        "major_shift"
    )
    # a third of current went null: caught via the null bin, not
    # dropped (classic silent-upstream-change failure)
    assert _by_col(psi_report(base, nulled, ["v"]))["v"]["psi"] > 0.25


def test_psi_matches_hand_computation(spark):
    # 2 bins over [0, 2): baseline 50/50, current 80/20
    base = spark.createDataFrame(
        [(0.0,)] * 50 + [(2.0,)] * 50, ["v"]
    )
    cur = spark.createDataFrame([(0.0,)] * 80 + [(2.0,)] * 20, ["v"])
    got = _by_col(psi_report(base, cur, ["v"], num_bins=2))["v"]["psi"]
    want = (0.8 - 0.5) * math.log(0.8 / 0.5) + (0.2 - 0.5) * math.log(
        0.2 / 0.5
    )
    assert abs(got - want) < 1e-8


def test_degenerate_constant_baseline(spark):
    base = spark.createDataFrame([(7.0,)] * 10, ["v"])
    same = spark.createDataFrame([(7.0,)] * 5, ["v"])
    moved = spark.createDataFrame([(9.0,)] * 5, ["v"])
    assert _by_col(psi_report(base, same, ["v"]))["v"]["psi"] == 0.0
    # all current mass in the overflow bin -> maximal drift signal
    assert _by_col(psi_report(base, moved, ["v"]))["v"]["verdict"] == (
        "major_shift"
    )


def test_repartition_stable(spark):
    base = spark.createDataFrame(
        [(float(i % 31),) for i in range(500)], ["v"]
    )
    cur = spark.createDataFrame(
        [(float((i * 7) % 37),) for i in range(400)], ["v"]
    )
    a = _by_col(psi_report(base, cur, ["v"]))["v"]["psi"]
    b = _by_col(
        psi_report(base.repartition(13), cur.repartition(7), ["v"])
    )["v"]["psi"]
    assert a == b  # quantized integer sum: bit-stable, not approx


def test_single_partial_aggregation_per_frame(spark):
    base = spark.createDataFrame([(float(i), i) for i in range(50)], ["v", "w"])
    cur = spark.createDataFrame([(float(i), i) for i in range(50)], ["v", "w"])
    plan = (
        psi_report(base, cur, ["v", "w"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # no window and no cartesian anywhere; the only joins (and their
    # SMJ sorts) run over the (column, bin) grid — |columns| x 13
    # rows regardless of corpus size, reached through partial-
    # aggregable bin counts
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the corpus-side aggregation is partial (map-side combine before
    # the exchange): partial_count marks appear in the plan
    assert "partial_count" in plan
