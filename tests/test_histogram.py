from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bi_utils_spark.operators.histogram import (
    equi_depth_histogram,
    equi_width_histogram,
)


@pytest.fixture(scope="module")
def nums(spark):
    # 0..99 once each, plus a heavy tie at 50 (20 extra copies), one null
    rows = [(float(i),) for i in range(100)]
    rows += [(50.0,)] * 20
    rows += [(None,)]
    return spark.createDataFrame(rows, ["v"])


def test_width_bins_and_grid(nums):
    h = {r["bin"]: r for r in equi_width_histogram(nums, "v", 10).collect()}
    assert sorted(h) == list(range(10))
    # data bounds 0..99, width 9.9; bin 5 = [49.5, 59.4) -> 50..59 + ties
    assert h[5]["n"] == 10 + 20
    assert h[0]["n"] == 10
    # max value lands in the last bin, not bin 10
    assert h[9]["n"] == 10
    assert sum(r["n"] for r in h.values()) == 120


def test_width_empty_bins_are_zero_rows(spark):
    df = spark.createDataFrame([(0.0,), (100.0,)], ["v"])
    h = {r["bin"]: r["n"] for r in equi_width_histogram(df, "v", 4).collect()}
    assert h == {0: 1, 1: 0, 2: 0, 3: 1}


def test_width_pinned_bounds_drop_outside(spark):
    df = spark.createDataFrame([(-5.0,), (5.0,), (15.0,)], ["v"])
    h = equi_width_histogram(df, "v", 2, lo=0.0, hi=10.0).collect()
    assert sum(r["n"] for r in h) == 1  # only 5.0 inside


def test_width_bin_edges(nums):
    h = sorted(
        equi_width_histogram(nums, "v", 4).collect(),
        key=lambda r: r["bin"],
    )
    assert h[0]["bin_lo"] == 0.0
    assert h[-1]["bin_hi"] == pytest.approx(99.0)
    for a, b in zip(h, h[1:]):
        assert a["bin_hi"] == pytest.approx(b["bin_lo"])


def test_depth_equal_counts_without_ties(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], ["v"])
    h = sorted(
        equi_depth_histogram(df, "v", 4).collect(), key=lambda r: r["bin"]
    )
    assert [r["n"] for r in h] == [25, 25, 25, 25]
    assert [r["lo"] for r in h] == [0.0, 25.0, 50.0, 75.0]
    # buckets partition the value range in order
    for a, b in zip(h, h[1:]):
        assert a["hi"] < b["lo"]


def test_depth_ties_stay_in_one_bucket(nums):
    h = sorted(
        equi_depth_histogram(nums, "v", 4).collect(), key=lambda r: r["bin"]
    )
    # 120 rows; the 21 copies of 50.0 must share a bucket
    homes = [r for r in h if r["lo"] <= 50.0 <= r["hi"]]
    assert len(homes) == 1
    assert sum(r["n"] for r in h) == 120


def test_depth_fewer_distinct_than_bins(spark):
    df = spark.createDataFrame([(1.0,)] * 10 + [(2.0,)] * 10, ["v"])
    h = equi_depth_histogram(df, "v", 8).collect()
    assert len(h) == 2  # one bucket per distinct value, no empties
    assert sum(r["n"] for r in h) == 20


def test_depth_no_corpus_window(spark, nums):
    """The CDF window is range-bucketed (partitioned by __bk), never
    a single unpartitioned frame — for a continuous column |distinct|
    ≈ n, so an unbucketed distinct-value window would still scale
    with the corpus (r6 verdict finding, closed r7)."""
    plan = (
        equi_depth_histogram(nums, "v", 4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in plan
    # every window frame in the plan is partitioned by the range bucket
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "__bk" in line, line
    # the aggregation (distinct values) sits below the window
    assert plan.index("Window") < plan.index("Scan ExistingRDD")


def test_width_constant_column(spark):
    df = spark.createDataFrame([(7.0,)] * 5, ["v"])
    h = {r["bin"]: r["n"] for r in equi_width_histogram(df, "v", 4).collect()}
    assert h[0] == 5 and h[1] == h[2] == h[3] == 0


def test_equi_depth_random_parity_with_brute_force(spark):
    """Seeded randomized parity against the integer-exact reference
    assignment bucket(v) = (start(v)·bins) div total — heavy ties,
    fewer distincts than bins, every bucketed-CDF seam."""
    import collections
    import random

    from bi_utils_spark.operators.histogram import equi_depth_histogram

    rng = random.Random(11)
    for _ in range(8):
        n = rng.randrange(2, 40)
        vals = [float(rng.randrange(0, 8)) for _ in range(n)]
        bins = rng.choice([2, 3, 4, 8])
        df = spark.createDataFrame([(v,) for v in vals], ["v"])
        got = sorted(
            (r["bin"], r["lo"], r["hi"], r["n"], r["n_distinct"])
            for r in equi_depth_histogram(df, "v", bins).collect()
        )
        s = sorted(set(vals))
        total, acc, start = len(vals), 0, {}
        for x in s:
            start[x] = acc
            acc += vals.count(x)
        byb = collections.defaultdict(list)
        for x in s:
            byb[(start[x] * bins) // total].append(x)
        exp = sorted(
            (b, min(xs), max(xs), sum(vals.count(x) for x in xs), len(xs))
            for b, xs in byb.items()
        )
        assert got == exp, (vals, bins)
