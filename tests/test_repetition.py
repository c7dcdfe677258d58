"""Repetition metrics (operators/textstats.py::repetition_stats)."""

import pytest

from bi_utils_spark.operators.textstats import repetition_stats


def _stats(spark, text):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    return repetition_stats(df, "doc_id", "text").first()


def test_duplicate_lines(spark):
    r = _stats(spark, "aa\nbb\naa\ncc")
    assert r["dup_line_frac"] == pytest.approx(0.25)       # 4 lines, 3 distinct
    assert r["dup_line_char_frac"] == pytest.approx(0.25)  # 8 chars, 6 distinct


def test_top_2gram_mass(spark):
    # tokens x y x y x -> 2-grams: "x y","y x","x y","y x" -> top 2/4
    r = _stats(spark, "x y x y x")
    assert r["top_2gram_frac"] == pytest.approx(0.5)
    assert r["dup_5gram_frac"] == 0.0                      # single 5-gram


def test_duplicate_5grams(spark):
    # six identical tokens -> two identical 5-grams -> 1 - 1/2
    r = _stats(spark, "w w w w w w")
    assert r["dup_5gram_frac"] == pytest.approx(0.5)
    assert r["top_2gram_frac"] == pytest.approx(1.0)


def test_empty_and_short_docs_are_zero(spark):
    for text in ["", "solo"]:
        r = _stats(spark, text)
        assert r["dup_line_frac"] == 0.0
        assert r["dup_line_char_frac"] == 0.0 or text == "solo"
        assert r["dup_5gram_frac"] == 0.0
        assert r["top_2gram_frac"] == 0.0


def test_clean_doc_all_zero(spark):
    r = _stats(spark, "every token here is completely unique today")
    assert r["dup_line_frac"] == 0.0
    assert r["dup_5gram_frac"] == 0.0
    # 6 distinct 2-grams of 7 tokens -> top mass 1/6
    assert r["top_2gram_frac"] == pytest.approx(1 / 6)


def test_map_only_plan(spark):
    # the whole panel must be a shuffle-free projection
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
