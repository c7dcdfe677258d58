"""operators/gopher.py — X67 Gopher quality rules."""

from __future__ import annotations

from pyspark.sql import functions as F

from bi_utils_spark.operators.gopher import (
    gopher_filter,
    gopher_flags,
    gopher_report,
)

_GOOD = (
    "The quick brown fox jumps over the lazy dog and keeps running "
    "through the field with great speed because it must not be caught "
    "by the farmer that waits nearby holding tools of the trade. "
) * 3  # ~90 words, has stopwords, normal shape


def _flags(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r["doc_id"]: r for r in gopher_flags(df).collect()}


def test_good_document_passes_all(spark):
    r = _flags(spark, [_GOOD])[0]
    assert r["gopher_keep"] is True
    for c in r.asDict():
        if c.startswith("ok_"):
            assert r[c] is True, c


def test_word_count_bounds(spark):
    r = _flags(spark, ["too short to pass"])[0]
    assert r["ok_word_count"] is False and r["gopher_keep"] is False


def test_mean_word_length_bounds(spark):
    # 60 single-char words: mean length 1 < 3
    r = _flags(spark, [" ".join(["a"] * 60)])[0]
    assert r["ok_mean_word_len"] is False
    # 60 very long words: mean length > 10
    r = _flags(spark, [" ".join(["extraordinarily"] * 60)])[0]
    assert r["ok_mean_word_len"] is False


def test_symbol_ratio(spark):
    r = _flags(spark, [_GOOD + " " + "#" * 30])[0]
    assert r["ok_symbol_ratio"] is False


def test_bullet_and_ellipsis_lines(spark):
    bullets = "\n".join(f"- item {i} here" for i in range(40))
    r = _flags(spark, [bullets])[0]
    assert r["ok_bullet_lines"] is False
    dots = "\n".join(f"line {i} trails off..." for i in range(40))
    r = _flags(spark, [dots])[0]
    assert r["ok_ellipsis_lines"] is False


def test_alpha_words_and_stopwords(spark):
    nums = " ".join(str(i) for i in range(100, 180))
    r = _flags(spark, [nums])[0]
    assert r["ok_alpha_words"] is False
    assert r["ok_stopwords"] is False
    # stopword check is case-insensitive
    r = _flags(spark, [_GOOD.upper()])[0]
    assert r["ok_stopwords"] is True


def test_empty_text_fails_closed(spark):
    r = _flags(spark, ["", "   "])
    for i in (0, 1):
        assert r[i]["gopher_keep"] is False
        assert r[i]["n_words"] == 0


def test_filter_and_report(spark):
    df = spark.createDataFrame(
        [(1, _GOOD), (2, "tiny"), (3, "\n".join(["- b"] * 20))],
        "doc_id long, text string",
    )
    kept = gopher_filter(df)
    assert [r["doc_id"] for r in kept.collect()] == [1]
    assert kept.columns == ["doc_id", "text"]
    rep = gopher_report(df).first()
    assert rep["docs"] == 3 and rep["kept"] == 1
    assert rep["fail_word_count"] == 2
    assert rep["fail_bullet_lines"] == 1


def test_map_only_plan(spark):
    df = spark.createDataFrame([(1, _GOOD)], "doc_id long, text string")
    out = gopher_flags(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_threshold_overrides(spark):
    df = spark.createDataFrame(
        [(1, "five words right here now total")],
        "doc_id long, text string",
    )
    r = gopher_flags(df, min_words=3, min_stopword_hits=0).first()
    assert r["ok_word_count"] is True and r["ok_stopwords"] is True
