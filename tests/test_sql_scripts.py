"""Tests for SQL script execution + display utils (SURVEY.md S1/S2, O4/C5)."""

from __future__ import annotations

import pytest

from bi_utils_spark.operators.display import df_statistics, show_full
from bi_utils_spark.sources.sql_scripts import (
    execute_sql_script,
    register_tables,
    render_sql_script,
    return_df_from_sql_script,
)


def test_render_substitutes_params(tmp_path):
    p = tmp_path / "q.sql"
    p.write_text("SELECT * FROM t WHERE x > {threshold}")
    assert render_sql_script(str(p), threshold=5) == "SELECT * FROM t WHERE x > 5"


def test_return_df_from_sql_script(spark, tmp_path):
    spark.createDataFrame([(1,), (7,)], ["x"]).createOrReplaceTempView("t_sql")
    p = tmp_path / "q.sql"
    p.write_text("SELECT x FROM t_sql WHERE x > {threshold}")
    out = return_df_from_sql_script(spark, str(p), threshold=5)
    assert [r["x"] for r in out.collect()] == [7]


def test_execute_sql_script_ddl(spark, tmp_path):
    p = tmp_path / "ddl.sql"
    p.write_text("CREATE OR REPLACE TEMP VIEW made_by_script AS SELECT {v} AS v")
    execute_sql_script(spark, str(p), v=42)
    assert spark.sql("SELECT v FROM made_by_script").first()["v"] == 42


def test_register_tables(spark, sf_dir):
    register_tables(spark, sf_dir, ["region"])
    assert spark.sql("SELECT count(*) c FROM region").first()["c"] == 5


def test_bad_script_raises_not_none(spark, tmp_path):
    # the reference returned None on failure (utils.py:336-339); we raise
    p = tmp_path / "bad.sql"
    p.write_text("SELECT FROM nothing !!")
    with pytest.raises(Exception):
        return_df_from_sql_script(spark, str(p)).collect()


def test_df_statistics(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    stats = df_statistics(df)
    assert stats == {"num_rows": 2, "num_columns": 2, "columns": ["id", "v"]}


def test_show_full_bounds(spark):
    df = spark.range(5)
    show_full(df)  # small: prints fine
    with pytest.raises(ValueError, match="max_rows"):
        show_full(spark.range(100), max_rows=10)


def test_profile_one_pass(spark, sf_dir):
    from bi_utils_spark.operators.display import profile
    from bi_utils_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    rows = {r["column_name"]: r for r in profile(events).collect()}
    assert set(rows) == set(events.columns)
    assert rows["event_id"]["n_nulls"] == 0
    exact_users = events.select("user_id").distinct().count()
    assert abs(rows["user_id"]["approx_distinct"] - exact_users) / exact_users < 0.1
    assert rows["value"]["mean"] is not None
    assert rows["event_type"]["mean"] is None      # non-numeric: no mean
    assert rows["event_type"]["min_str"] == "click"
