"""Unit tests for the relational layer (SURVEY.md §2.2-§2.7)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bi_utils_spark.operators import relational as R


def _events(spark):
    return spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 10), 1, "a", 1.0),
            (2, dt.datetime(2024, 1, 2, 10), 1, "a", 2.0),
            (3, dt.datetime(2024, 1, 3, 10), 2, "b", 3.0),
            (4, dt.datetime(2024, 1, 3, 10), 2, "b", 4.0),
        ],
        ["id", "ts", "user", "typ", "val"],
    )


def test_project_existing_drops_missing(spark):
    df = _events(spark)
    out = R.project_existing(df, ["ts", "nope", "val"])
    assert out.columns == ["ts", "val"]


def test_max_watermark_and_empty(spark):
    df = _events(spark)
    wm = R.max_watermark(df, "ts", "3 seconds")
    assert wm == dt.datetime(2024, 1, 3, 9, 59, 57)
    empty = df.filter(F.lit(False))
    assert R.max_watermark(empty, "ts") is None  # ct_utils.py:32-36


def test_watermark_filter(spark):
    df = _events(spark)
    out = R.watermark_filter(df, "ts", "25 hours")
    assert sorted(r["id"] for r in out.collect()) == [2, 3, 4]


def test_latest_per_key_with_tiebreak(spark):
    df = _events(spark)
    out = R.latest_per_key(df, ["user"], "ts", tiebreak_cols=["id"])
    got = {r["user"]: r["id"] for r in out.collect()}
    assert got == {1: 2, 2: 4}  # ties on ts broken by highest id


def test_top_k(spark):
    df = _events(spark)
    out = R.top_k(df, "val", 2)
    assert [r["id"] for r in out.collect()] == [4, 3]


def test_top_k_per_group(spark):
    df = _events(spark)
    out = R.top_k_per_group(df, ["user"], "val", 1)
    assert sorted(r["id"] for r in out.collect()) == [2, 4]


def test_union_pages_allows_missing_columns(spark):
    a = spark.createDataFrame([(1, "x")], ["k", "v"])
    b = spark.createDataFrame([(2,)], ["k"])
    out = R.union_pages([a, b])
    rows = sorted(out.collect(), key=lambda r: r["k"])
    assert rows[0]["v"] == "x" and rows[1]["v"] is None


def test_column_max_lengths_single_pass(spark):
    df = spark.createDataFrame([("ab", 123), ("abcd", 7)], ["s", "n"])
    out = {r["column_name"]: r["new_max_length"] for r in R.column_max_lengths(df).collect()}
    assert out == {"s": 4, "n": 3}


def test_grouped_having(spark):
    df = _events(spark)
    out = R.grouped_having(
        df, ["user"], [F.count("*").alias("n")], having=F.col("n") > 1
    )
    assert sorted(r["user"] for r in out.collect()) == [1, 2]


def test_filtered_count_and_date(spark):
    df = _events(spark)
    assert R.filtered_count(df, F.col("val") > 2.5) == 2
    assert R.count_on_date(df, "ts", dt.date(2024, 1, 3)) == 2


def test_melt_roundtrips_pivot(spark):
    from bi_utils_spark.operators.relational import melt

    wide = spark.createDataFrame(
        [("a", 1.0, 2.0), ("b", 3.0, 4.0)], ["k", "x", "y"]
    )
    long = melt(wide, ["k"], ["x", "y"], "m", "v")
    assert long.columns == ["k", "m", "v"]
    got = {(r["k"], r["m"]): r["v"] for r in long.collect()}
    assert got == {
        ("a", "x"): 1.0, ("a", "y"): 2.0,
        ("b", "x"): 3.0, ("b", "y"): 4.0,
    }
    # melt is map-only: no Exchange in the plan
    plan = long._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # pivot inverts it
    back = long.groupBy("k").pivot("m", ["x", "y"]).sum("v")
    assert sorted(map(tuple, back.collect())) == [
        ("a", 1.0, 2.0), ("b", 3.0, 4.0),
    ]


def test_date_spine(spark):
    from bi_utils_spark.operators.calendar import date_spine

    sp = date_spine(spark, "2024-02-26", "2024-03-03").collect()
    assert len(sp) == 7
    by_d = {str(r["d"]): r for r in sp}
    leap = by_d["2024-02-29"]
    assert (leap["year"], leap["month"], leap["day"]) == (2024, 2, 29)
    assert leap["day_of_week"] == 4  # Thursday
    assert str(leap["month_end"]) == "2024-02-29"
    sat = by_d["2024-03-02"]
    assert sat["is_weekend"] == 1 and sat["day_of_week"] == 6
    mon = by_d["2024-02-26"]
    assert mon["day_of_week"] == 1 and mon["iso_week"] == 9
    # plan is a pure generator off literals — no shuffle
    plan = (
        date_spine(spark, "2024-01-01", "2024-12-31")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
