from __future__ import annotations

import pytest

from bi_utils_spark.operators.pareto import contribution_report


def test_vital_few_cut(spark):
    rows = [("a", 50.0), ("b", 30.0), ("c", 15.0), ("d", 5.0)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = {
        r["k"]: r
        for r in contribution_report(df, ["k"], "v", 0.8).collect()
    }
    assert [out[k]["rank"] for k in "abcd"] == [1, 2, 3, 4]
    assert out["a"]["share"] == pytest.approx(0.5)
    assert out["b"]["cum_share"] == pytest.approx(0.8)
    # a (prev 0.0), b (prev 0.5), c (prev 0.8 -> NOT vital at 0.8)
    assert (out["a"]["vital"], out["b"]["vital"], out["c"]["vital"],
            out["d"]["vital"]) == (1, 1, 0, 0)


def test_ties_break_by_key_and_values_aggregate(spark):
    rows = [("x", 10.0), ("x", 10.0), ("y", 20.0), ("z", 20.0)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = sorted(
        contribution_report(df, ["k"], "v", 0.5).collect(),
        key=lambda r: r["rank"],
    )
    # x and y and z all total 20 -> tie broken by key asc
    assert [r["k"] for r in out] == ["x", "y", "z"]
    assert out[0]["total"] == 20.0
    assert out[-1]["cum_share"] == pytest.approx(1.0)


def test_grouped_pareto_independent_partitions(spark):
    from bi_utils_spark.operators.pareto import contribution_report_grouped

    rows = [
        ("eu", "a", 80.0), ("eu", "b", 20.0),
        ("us", "x", 50.0), ("us", "y", 30.0), ("us", "z", 20.0),
    ]
    df = spark.createDataFrame(rows, ["region", "k", "v"])
    out = {
        (r["region"], r["k"]): r
        for r in contribution_report_grouped(
            df, ["region"], ["k"], "v", 0.7
        ).collect()
    }
    assert out[("eu", "a")]["vital"] == 1 and out[("eu", "b")]["vital"] == 0
    # us: x (prev 0) vital, y (prev 0.5) vital, z (prev 0.8) not
    assert out[("us", "x")]["vital"] == 1
    assert out[("us", "y")]["vital"] == 1
    assert out[("us", "z")]["vital"] == 0
    assert out[("us", "x")]["share"] == pytest.approx(0.5)
    # ranks restart per partition
    assert out[("eu", "a")]["rank"] == 1 and out[("us", "x")]["rank"] == 1
