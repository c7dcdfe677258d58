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


# --- streaming drift monitor (streaming/drift.py) --------------------------


def test_stream_fold_matches_batch_psi(spark):
    """Batch parity: one micro-batch through the stream fold equals
    psi_report on the same frames (same bins, floor, quantization)."""
    from bi_utils_spark.streaming.drift import (
        _psi_against_profile,
        baseline_profile,
    )

    base = spark.createDataFrame(
        [(float(i % 40), i % 5) for i in range(600)], ["v", "w"]
    )
    batch = spark.createDataFrame(
        [(float((i * 11) % 55), i % 9) for i in range(300)], ["v", "w"]
    )
    prof = baseline_profile(base, ["v", "w"])
    got = {
        r["column"]: (r["psi"], r["verdict"], r["n_cur"])
        for r in _psi_against_profile(batch, prof, 1e-6).collect()
    }
    want = {
        r["column"]: (r["psi"], r["verdict"], r["n_cur"])
        for r in psi_report(base, batch, ["v", "w"]).collect()
    }
    assert got == want  # bit-equal, not approx


def test_drift_monitor_alerts_over_stream(spark, tmp_path):
    """Three file micro-batches: in-distribution, shifted, and
    null-heavy — the monitor must flag exactly the drifted ones."""
    import json

    from bi_utils_spark.streaming.drift import (
        baseline_profile,
        monitor_drift_foreach,
    )

    base = spark.createDataFrame(
        [(float(i % 50),) for i in range(500)], ["v"]
    )
    prof = baseline_profile(base, ["v"])
    src = tmp_path / "batches"
    src.mkdir()
    reports = []

    def on_report(df, batch_id):
        for r in df.collect():
            reports.append((batch_id, r["column"], r["verdict"]))

    stream = spark.readStream.schema("v double").json(str(src))
    q = monitor_drift_foreach(
        stream, prof, str(tmp_path / "ckpt"), on_report,
        query_name="drift_monitor_test",
    )
    try:
        batches = [
            [{"v": float(i % 50)} for i in range(200)],        # stable
            [{"v": float(i % 50) + 45.0} for i in range(200)], # shifted
            [{"v": (float(i % 50) if i % 2 else None)}
             for i in range(200)],                             # nulls
        ]
        for i, b in enumerate(batches):
            (src / f"b{i}.jsonl").write_text(
                "\n".join(json.dumps(r) for r in b)
            )
            q.processAllAvailable()
    finally:
        q.stop()
    verdicts = [v for (_, _, v) in sorted(reports)]
    assert verdicts[0] == "stable"
    assert verdicts[1] == "major_shift"
    assert verdicts[2] == "major_shift"
