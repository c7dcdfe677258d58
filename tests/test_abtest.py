from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bi_utils_spark.operators.abtest import proportion_test, welch_test


def _welch_z(a, b):
    ma = sum(a) / len(a)
    mb = sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    return (mb - ma) / math.sqrt(vb / len(b) + va / len(a))


def test_welch_matches_hand_computation(spark):
    a = [10.0, 12.0, 11.0, 13.0, 9.0, 11.5]
    b = [14.0, 15.0, 13.5, 16.0, 14.5, 15.5]
    rows = [("c", x) for x in a] + [("t", x) for x in b]
    df = spark.createDataFrame(rows, ["grp", "v"])
    r = welch_test(df, "grp", "v", "c", "t").collect()[0]
    assert r["n_c"] == 6 and r["n_t"] == 6
    assert r["mean_c"] == pytest.approx(sum(a) / 6, rel=1e-9)
    assert r["z"] == pytest.approx(_welch_z(a, b), rel=1e-6)
    assert r["significant"] == 1
    assert r["lift"] == pytest.approx(
        (sum(b) / 6 - sum(a) / 6) / (sum(a) / 6), rel=1e-9
    )


def test_welch_null_effect_not_significant(spark):
    rows = [("c", float(i % 10)) for i in range(50)]
    rows += [("t", float(i % 10)) for i in range(50)]
    df = spark.createDataFrame(rows, ["grp", "v"])
    r = welch_test(df, "grp", "v", "c", "t").collect()[0]
    assert r["z"] == pytest.approx(0.0, abs=1e-9)
    assert r["significant"] == 0


def test_proportion_hand_math(spark):
    # control 20/100, treatment 35/100
    rows = [("c", i < 20) for i in range(100)]
    rows += [("t", i < 35) for i in range(100)]
    df = spark.createDataFrame(rows, ["grp", "ok"])
    r = proportion_test(df, "grp", F.col("ok"), "c", "t").collect()[0]
    assert (r["conv_c"], r["conv_t"]) == (20, 35)
    p = 55 / 200
    z = (0.35 - 0.20) / math.sqrt(p * (1 - p) * (2 / 100))
    assert r["z"] == pytest.approx(z, rel=1e-9)
    assert r["significant"] == 1


def test_repartition_stable(spark):
    rows = [("c", float(i % 7) + 0.123456) for i in range(101)]
    rows += [("t", float(i % 5) + 1.9) for i in range(97)]
    df = spark.createDataFrame(rows, ["grp", "v"])
    r1 = welch_test(df, "grp", "v", "c", "t").collect()[0]
    r2 = welch_test(df.repartition(13), "grp", "v", "c", "t").collect()[0]
    assert tuple(r1) == tuple(r2)  # bit-stable, not approx


def test_chi_square_hand_math(spark):
    from bi_utils_spark.operators.abtest import chi_square_independence

    # classic 2x2: 30/10 vs 20/40
    rows = (
        [("a", "x")] * 30 + [("a", "y")] * 10
        + [("b", "x")] * 20 + [("b", "y")] * 40
    )
    df = spark.createDataFrame(rows, ["g", "o"])
    r = chi_square_independence(df, "g", "o").collect()[0]
    assert (r["n"], r["rows"], r["cols"], r["dof"]) == (100, 2, 2, 1)
    # chi2 by hand: margins a=40,b=60,x=50,y=50; E = 20,20,30,30
    # terms: (30-20)^2/20=5, (10-20)^2/20=5, (20-30)^2/30=10/3, (40-30)^2/30=10/3
    expect = 5 + 5 + 10 / 3 + 10 / 3
    assert r["chi2"] == pytest.approx(expect, abs=1e-6)


def test_chi_square_independent_is_zero(spark):
    from bi_utils_spark.operators.abtest import chi_square_independence

    rows = [("a", "x")] * 10 + [("a", "y")] * 10
    rows += [("b", "x")] * 30 + [("b", "y")] * 30
    df = spark.createDataFrame(rows, ["g", "o"])
    r = chi_square_independence(df, "g", "o").collect()[0]
    assert r["chi2"] == pytest.approx(0.0, abs=1e-6)
