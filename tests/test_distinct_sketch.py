"""operators/distinct_sketch.py — X65 mergeable HLL distinct counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from bi_utils_spark.operators.distinct_sketch import (
    distinct_sketch_table,
    estimate_distinct,
    rollup_sketches,
    sketch_rollup_report,
)


def _events(spark, days=6, users_per_day=200, overlap=50):
    # day d has users [d*150, d*150 + 200): consecutive days share 50
    rows = [
        (d, d // 3, u)
        for d in range(days)
        for u in range(d * 150, d * 150 + users_per_day)
    ]
    return spark.createDataFrame(rows, "day int, half int, user long")


def test_small_sketch_is_exact(spark):
    df = _events(spark)
    est = estimate_distinct(
        distinct_sketch_table(df, ["day"], "user", lgk=12)
    )
    exact = {
        r["day"]: r["x"]
        for r in df.groupBy("day")
        .agg(F.countDistinct("user").alias("x"))
        .collect()
    }
    for r in est.collect():
        # HLL is exact in sparse mode at these cardinalities
        assert r["distinct_est"] == exact[r["day"]]


def test_union_of_sketches_equals_sketch_of_union(spark):
    df = _events(spark)
    fine = distinct_sketch_table(df, ["day", "half"], "user", lgk=12)
    merged = estimate_distinct(
        rollup_sketches(fine, ["half"]), out_col="m"
    )
    direct = estimate_distinct(
        distinct_sketch_table(df, ["half"], "user", lgk=12), out_col="d"
    )
    got = {(r["half"]): r["m"] for r in merged.collect()}
    for r in direct.collect():
        # register merge is lossless; the ESTIMATOR may differ by a
        # hair across coupon/dense mode-promotion boundaries
        assert abs(got[r["half"]] - r["d"]) <= max(1, 0.04 * r["d"])


def test_rollup_report_flags_green_and_overlap_dedups(spark):
    df = _events(spark)
    rep = sketch_rollup_report(
        df, ["day", "half"], ["half"], "user", lgk=12
    ).collect()
    assert len(rep) == 2
    for r in rep:
        assert r["merge_consistent"] == 1
        assert r["err_ok"] == 1
        # 3 days x 200 users with 50-user overlaps: distinct < 600
        assert r["exact"] < 600


def test_sketch_column_survives_parquet(spark, tmp_path):
    df = _events(spark)
    fine = distinct_sketch_table(df, ["day"], "user", lgk=12)
    p = str(tmp_path / "sketches")
    fine.write.parquet(p)
    back = spark.read.parquet(p)
    merged = estimate_distinct(
        rollup_sketches(back, []), out_col="est"
    ).first()
    exact = df.select("user").distinct().count()
    assert abs(merged["est"] - exact) <= 0.05 * exact


def test_build_is_one_partial_agg(spark):
    df = _events(spark)
    fine = distinct_sketch_table(df, ["day"], "user", lgk=12)
    fine.collect()
    plan = fine._jdf.queryExecution().executedPlan().toString()
    # partial + final aggregate pair around the single required
    # shuffle (AQE may render an extra read node); no join anywhere
    assert plan.count("Exchange") <= 2
    assert "Join" not in plan
