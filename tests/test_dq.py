from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bi_utils_spark.operators.dq import Check, dq_gate, dq_metrics, dq_report


@pytest.fixture(scope="module")
def table(spark):
    rows = [
        (1, "A", 10.0, "ab1"),
        (2, "A", 20.0, "cd2"),
        (2, "B", -5.0, "xy"),     # dup key, below range, bad shape
        (3, None, 150.0, "ef3"),  # null cat, above range
        (4, "C", 50.0, None),     # unaccepted cat
    ]
    return spark.createDataFrame(rows, ["k", "cat", "v", "code"])


def _report(table, refs=None, checks=None):
    checks = checks or []
    return {
        r["constraint"]: r
        for r in dq_report(table, checks, refs).collect()
    }


def test_row_local_constraints(table):
    checks = [
        Check("completeness", "cat"),
        Check("in_range", "v", lo=0.0, hi=100.0),
        Check("accepted", "cat", values=("A", "B")),
        Check("matches", "code", pattern="^[a-z]{2}[0-9]$"),
    ]
    rep = _report(table, checks=checks)
    assert (rep["completeness(cat)"]["ok"],
            rep["completeness(cat)"]["total"]) == (4, 5)
    assert rep["in_range(v)"]["ok"] == 3  # 10, 20, 50
    assert rep["accepted(cat)"]["ok"] == 3  # A, A, B
    assert rep["matches(code)"]["ok"] == 3  # ab1, cd2, ef3
    assert rep["in_range(v)"]["value"] == pytest.approx(0.6)


def test_row_local_checks_share_one_scan(table):
    checks = [
        Check("completeness", "cat"),
        Check("in_range", "v", lo=0.0),
        Check("accepted", "cat", values=("A",)),
    ]
    plan = dq_metrics(table, checks)._jdf.queryExecution().executedPlan().toString()
    # all three row-local constraints fold into one aggregation pass:
    # exactly one scan of the input
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") == 1


def test_unique_counts_rows_in_singleton_groups(table):
    rep = _report(table, checks=[Check("unique", columns=("k",))])
    r = rep["unique(k)"]
    # keys 1,3,4 unique (3 rows ok) out of 5 rows
    assert (r["ok"], r["total"]) == (3, 5)
    assert not r["passed"]


def test_referential(spark, table):
    ref = spark.createDataFrame([(1,), (2,), (3,)], ["id"])
    rep = _report(
        table,
        refs={"dim": ref},
        checks=[Check("referential", "k", ref="dim", ref_key="id")],
    )
    r = rep["referential(k)"]
    # k=4 dangles; k null rows would be excluded (none here)
    assert (r["ok"], r["total"]) == (4, 5)


def test_thresholds_and_gate(spark, table):
    ok_checks = [Check("completeness", "k")]
    assert dq_gate(table, ok_checks) is table
    failing = [
        Check("completeness", "cat"),
        Check("accepted", "cat", values=("A", "B"), min_fraction=0.5),
    ]
    rep = _report(table, checks=failing)
    assert not rep["completeness(cat)"]["passed"]  # 0.8 < 1.0 default
    assert rep["accepted(cat)"]["passed"]  # 0.6 >= 0.5
    with pytest.raises(ValueError, match="completeness\\(cat\\)"):
        dq_gate(table, failing)


def test_empty_table_passes_vacuously(spark):
    empty = spark.range(0).select(
        F.col("id").alias("k"), F.lit("x").alias("cat")
    )
    rep = _report(
        empty,
        checks=[Check("completeness", "cat"), Check("unique", columns=("k",))],
    )
    assert all(r["passed"] for r in rep.values())
    assert all(r["value"] == 1.0 for r in rep.values())


def test_custom_name_label(table):
    rep = _report(
        table, checks=[Check("completeness", "cat", name="cat_not_null")]
    )
    assert "cat_not_null" in rep


def test_referential_non_broadcast_path(spark, table):
    ref = spark.createDataFrame([(1,), (2,), (3,)], ["id"])
    checks = [
        Check("referential", "k", ref="dim", ref_key="id",
              broadcast_ref=False)
    ]
    rep = _report(table, refs={"dim": ref}, checks=checks)
    r = rep["referential(k)"]
    assert (r["ok"], r["total"]) == (4, 5)
    plan = (
        dq_metrics(table, checks, {"dim": ref})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" not in plan


def test_suppress_small_groups(spark):
    from bi_utils_spark.operators.dq import suppress_small_groups

    rows = [("a",)] * 7 + [("b",)] * 2 + [("c",)] * 5
    df = spark.createDataFrame(rows, ["g"])
    out = {
        r["g"]: (r["n"], r["suppressed"])
        for r in suppress_small_groups(df, ["g"], k=5).collect()
    }
    assert out["a"] == (7, 0) and out["c"] == (5, 0)
    # the small cell is present but its count is withheld
    assert out["b"] == (None, 1)


def test_benford_audit_digits_and_terms(spark):
    import math
    from bi_utils_spark.operators.dq import benford_audit

    # exact Benford-proportioned sample (scaled to 1000 rows)
    rows = []
    for d in range(1, 10):
        n = round(1000 * math.log10(1 + 1 / d))
        rows += [(float(d) * 10,)] * n
    df = spark.createDataFrame(rows, ["v"])
    out = benford_audit(df, "v").collect()
    total_chi2 = sum(r["chi2_term"] for r in out)
    assert total_chi2 < 0.1  # near-perfect fit
    assert sum(r["observed"] for r in out) == len(rows)
    # digit extraction edge cases: decimals < 1 and negatives
    df2 = spark.createDataFrame([(0.067,), (-230.0,)], ["v"])
    got = {
        r["digit"]: r["observed"]
        for r in benford_audit(df2, "v").collect()
    }
    assert got[6] == 1 and got[2] == 1


def test_profile_columns_one_pass(spark, table):
    from bi_utils_spark.operators.dq import profile_columns

    out = {r["column"]: r for r in profile_columns(table).collect()}
    assert out["cat"]["nulls"] == 1 and out["cat"]["distinct"] == 3
    assert out["k"]["nulls"] == 0 and out["k"]["distinct"] == 4
    assert out["v"]["min_str"] == "-5.0"
    assert all(r["total"] == 5 for r in out.values())
    # single scan for the whole profile
    plan = (
        profile_columns(table)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") == 1
    # sketch default (r7): HLL++ partial-aggregable state — no
    # corpus-sized rows x columns Expand pass in the default plan
    assert "Expand" not in plan
    # exact opt-in still available (plans the Expand, counts exactly)
    exact = {
        r["column"]: r["distinct"]
        for r in profile_columns(table, exact_distinct=True).collect()
    }
    assert exact["cat"] == 3 and exact["k"] == 4
