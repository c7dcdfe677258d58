"""operators/timeseries.py — X69 resample + gap fill."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from bi_utils_spark.operators.timeseries import (
    attach_time_bucket,
    fill_forward,
    resample_counts,
)


def _events(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # type a: hours 0, 1, 1, 5   type b: hours 2, 7
    for t, h in [("a", 0), ("a", 1), ("a", 1), ("a", 5), ("b", 2), ("b", 7)]:
        rows.append((t, base + dt.timedelta(hours=h, minutes=7)))
    return spark.createDataFrame(rows, "k string, ts timestamp")


def test_bucket_floor(spark):
    df = _events(spark)
    b = attach_time_bucket(df, width_sec=3600)
    hours = sorted(r["bucket"] for r in b.collect())
    assert hours[0] * 3600 == 1704067200  # 2024-01-01T00 UTC
    assert hours == [473352 + h for h in [0, 1, 1, 2, 5, 7]]


def test_resample_fills_zeros_per_group(spark):
    out = resample_counts(
        _events(spark), width_sec=3600, group_cols=("k",)
    ).collect()
    got = {(r["k"], r["bucket"] - 473352): r["n"] for r in out}
    # shared bounds 0..7 for both groups: 16 grid rows
    assert len(got) == 16
    assert got[("a", 0)] == 1 and got[("a", 1)] == 2 and got[("a", 5)] == 1
    assert got[("a", 2)] == 0 and got[("a", 7)] == 0
    assert got[("b", 2)] == 1 and got[("b", 7)] == 1 and got[("b", 0)] == 0


def test_resample_explicit_bounds_and_no_groups(spark):
    out = resample_counts(
        _events(spark), width_sec=3600, lo=473352, hi=473361
    ).collect()
    assert len(out) == 10  # pinned window wider than the data
    total = sum(r["n"] for r in out)
    assert total == 6


def test_fill_forward_carries_and_leading_nulls(spark):
    grid = spark.createDataFrame(
        [
            ("a", 0, None), ("a", 1, 10.0), ("a", 2, None),
            ("a", 3, None), ("a", 4, 7.0),
            ("b", 0, 1.0), ("b", 1, None),
        ],
        "k string, bucket long, v double",
    )
    out = {
        (r["k"], r["bucket"]): r["v_filled"]
        for r in fill_forward(grid, group_cols=("k",)).collect()
    }
    assert out[("a", 0)] is None  # nothing to carry yet
    assert out[("a", 2)] == 10.0 and out[("a", 3)] == 10.0
    assert out[("a", 4)] == 7.0
    assert out[("b", 1)] == 1.0


def test_grid_join_is_broadcastable(spark):
    out = resample_counts(
        _events(spark), width_sec=3600, group_cols=("k",)
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the bounds frame broadcasts into the grid build; the grid join
    # itself may be either side — what must NOT happen is a window
    # or sort over the raw stream
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "WindowExec" not in plan


def test_mad_outliers_spike_and_degenerate(spark):
    from bi_utils_spark.operators.timeseries import mad_outliers

    df = spark.createDataFrame(
        [("a", i, float(v)) for i, v in
         enumerate([10, 11, 9, 10, 12, 11, 10, 95, 10, 11])]
        + [("b", i, 5.0) for i in range(6)] + [("b", 6, 7.0)],
        "k string, bucket long, v double",
    )
    out = {
        (r["k"], r["bucket"]): r["is_outlier"]
        for r in mad_outliers(df, "v", ("k",)).collect()
    }
    assert out[("a", 7)] is True          # the 95 spike
    assert not any(
        v for kk, v in out.items() if kk[0] == "a" and kk[1] != 7
    )
    # degenerate MAD=0 group: only the differing row flags
    assert out[("b", 6)] is True
    assert not any(
        v for kk, v in out.items() if kk[0] == "b" and kk[1] != 6
    )


def test_mad_outliers_spike_does_not_mask_itself(spark):
    from bi_utils_spark.operators.timeseries import mad_outliers

    # one enormous spike in a small series: stdev-based z-scores
    # would swallow it; MAD must not
    vals = [100.0] * 8 + [100000.0]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)],
        "k string, bucket long, v double",
    )
    out = {
        r["bucket"]: r["is_outlier"]
        for r in mad_outliers(df, "v", ("k",)).collect()
    }
    assert out[8] is True and sum(out.values()) == 1


def test_mad_outliers_no_groups(spark):
    from bi_utils_spark.operators.timeseries import mad_outliers

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([1, 2, 1, 2, 1, 50])],
        "bucket long, v double",
    )
    out = {r["bucket"]: r["is_outlier"] for r in
           mad_outliers(df, "v").collect()}
    assert out[5] is True and sum(out.values()) == 1


def test_rolling_agg_trailing_window(spark):
    from bi_utils_spark.operators.timeseries import rolling_agg

    rows = [("a", i, (i + 1) * 10) for i in range(5)]
    df = spark.createDataFrame(rows, ["g", "bucket", "n"])
    out = {
        r["bucket"]: r
        for r in rolling_agg(
            df, "bucket", ("g",), "n", window=3
        ).collect()
    }
    # bucket 0: [10]; bucket 2: [10,20,30]; bucket 4: [30,40,50]
    assert out[0]["n_roll_sum"] == 10
    assert out[2]["n_roll_sum"] == 60
    assert out[4]["n_roll_sum"] == 120
    assert out[4]["n_roll_avg"] == pytest.approx(40.0)
    assert out[4]["n_roll_min"] == 30 and out[4]["n_roll_max"] == 50


def test_rolling_agg_groups_independent(spark):
    from bi_utils_spark.operators.timeseries import rolling_agg

    rows = [("a", 0, 1), ("a", 1, 2), ("b", 0, 100), ("b", 1, 200)]
    df = spark.createDataFrame(rows, ["g", "bucket", "n"])
    out = {
        (r["g"], r["bucket"]): r["n_roll_sum"]
        for r in rolling_agg(df, "bucket", ("g",), "n", 2).collect()
    }
    assert out[("a", 1)] == 3 and out[("b", 1)] == 300


def test_linear_trend_exact_line(spark):
    from bi_utils_spark.operators.timeseries import linear_trend

    # y = 3x + 7 at x in 100..104 (offset exercises the rebase)
    rows = [("a", 100 + i, 7 + 3 * (100 + i)) for i in range(5)]
    df = spark.createDataFrame(rows, ["g", "bucket", "n"])
    r = linear_trend(df, "bucket", "n", ("g",)).collect()[0]
    assert r["x0"] == 100
    assert r["slope"] == pytest.approx(3.0)
    # intercept is the fitted value AT x0
    assert r["intercept"] == pytest.approx(7 + 3 * 100)
    assert r["r2"] == pytest.approx(1.0)
    assert r["yhat_next"] == pytest.approx(7 + 3 * 105)


def test_linear_trend_degenerate_groups(spark):
    from bi_utils_spark.operators.timeseries import linear_trend

    rows = [("one_point", 5, 10), ("const_y", 0, 4), ("const_y", 1, 4)]
    df = spark.createDataFrame(rows, ["g", "bucket", "n"])
    out = {r["g"]: r for r in linear_trend(df, "bucket", "n", ("g",)).collect()}
    assert out["one_point"]["slope"] is None
    assert out["const_y"]["slope"] == pytest.approx(0.0)
    assert out["const_y"]["r2"] is None  # 0/0 variance explained


def test_linear_trend_noisy_r2_below_one(spark):
    from bi_utils_spark.operators.timeseries import linear_trend

    rows = [("a", 0, 0), ("a", 1, 2), ("a", 2, 1), ("a", 3, 3)]
    df = spark.createDataFrame(rows, ["g", "bucket", "n"])
    r = linear_trend(df, "bucket", "n", ("g",)).collect()[0]
    assert 0.0 < r["r2"] < 1.0
    assert r["slope"] == pytest.approx(0.8)  # by hand: num=16? verify


def test_period_over_period(spark):
    from bi_utils_spark.operators.timeseries import period_over_period

    rows = [
        ("a", dt.datetime(2024, 1, 1 + 7 * w, 12), i)
        for w, k in enumerate([3, 6, 0, 2])
        for i in range(k)
    ]
    df = spark.createDataFrame(rows, ["g", "ts", "i"])
    out = {
        r["bucket"]: r
        for r in period_over_period(
            df, "ts", 604800, ("g",)
        ).collect()
    }
    buckets = sorted(out)
    vals = [out[b] for b in buckets]
    assert [v["n"] for v in vals] == [3, 6, 0, 2]
    assert vals[0]["prev_n"] is None and vals[0]["pct_change"] is None
    assert vals[1]["delta"] == 3 and vals[1]["pct_change"] == pytest.approx(1.0)
    # the silent week reads as an explicit 0 with -100% change
    assert vals[2]["n"] == 0 and vals[2]["pct_change"] == pytest.approx(-1.0)
    # and the rebound week's base is 0 -> pct undefined, delta real
    assert vals[3]["delta"] == 2 and vals[3]["pct_change"] is None
