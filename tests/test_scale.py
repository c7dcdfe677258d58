"""Scale mechanics (operators/scale.py): salting and bucketed joins."""

import pytest
from pyspark.sql import functions as F

from bi_utils_spark.operators.scale import salted_agg, salted_join, write_bucketed
from bi_utils_spark.sources.tables import load_table


def test_salted_agg_matches_plain(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    # build aggs over `value`: salted vs plain must agree exactly
    salted = salted_agg(
        events.select("event_type", F.col("value").alias("n"),
                      F.col("value").alias("total"),
                      F.col("value").alias("lo"), F.col("value").alias("hi")),
        ["event_type"],
        {"n": "count", "total": "sum", "lo": "min", "hi": "max"},
        salt=8,
    )
    plain = events.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.sum("value").alias("total"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    s = {r["event_type"]: (r["n"], round(r["total"], 6), r["lo"], r["hi"])
         for r in salted.collect()}
    p = {r["event_type"]: (r["n"], round(r["total"], 6), r["lo"], r["hi"])
         for r in plain.collect()}
    assert s == p


def test_salted_agg_rejects_non_recombinable(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError):
        salted_agg(events, ["event_type"], {"value": "avg"})


def test_salted_join_matches_plain(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [("click", 1), ("purchase", 10), ("error", -1)], ["event_type", "weight"]
    )
    salted = salted_join(events, dim, ["event_type"], salt=8)
    plain = events.join(dim, "event_type")
    assert salted.count() == plain.count()
    s = salted.agg(F.sum(F.col("weight") * F.col("value"))).first()[0]
    p = plain.agg(F.sum(F.col("weight") * F.col("value"))).first()[0]
    assert s == pytest.approx(p)


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path_factory):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    write_bucketed(li.select("l_orderkey", "l_quantity"), "t_li_b",
                   ["l_orderkey"], num_buckets=8)
    write_bucketed(orders.select("o_orderkey", "o_totalprice"), "t_ord_b",
                   ["o_orderkey"], num_buckets=8)
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_li_b").join(
            spark.table("t_ord_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_li_b")
        spark.sql("DROP TABLE IF EXISTS t_ord_b")


def test_skew_report_shares_and_salt(spark):
    from bi_utils_spark.operators.scale import skew_report

    rows = [("hot",)] * 90 + [("warm",)] * 8 + [("cold",)] * 2
    df = spark.createDataFrame(rows, ["k"])
    out = skew_report(df, ["k"], top=2, target_rows_per_task=10).collect()
    assert [(r["k"], r["n"]) for r in out] == [("hot", 90), ("warm", 8)]
    assert out[0]["share"] == 0.9
    assert out[0]["recommended_salt"] == 9 and out[1]["recommended_salt"] == 1
