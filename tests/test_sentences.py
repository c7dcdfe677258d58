"""operators/sentences.py — X66 sentence segmentation."""

from __future__ import annotations

from pyspark.sql import functions as F

from bi_utils_spark.operators.sentences import (
    explode_sentences,
    sentence_stats,
    split_sentences,
)


def _split(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    return [
        r["s"] for r in df.select(split_sentences("t").alias("s")).collect()
    ]


def test_basic_terminators_kept(spark):
    assert _split(spark, ["Hello world. This is fine! Is it? Yes."]) == [
        ["Hello world.", "This is fine!", "Is it?", "Yes."]
    ]


def test_abbreviations_and_initials_guarded(spark):
    got = _split(
        spark,
        [
            "Dr. Who met Mr. Smith. They left.",
            "J. R. R. Tolkien wrote it. e.g. this. See Fig. 3 here.",
            "Fetch No. 5 today. Then stop.",
        ],
    )
    assert got[0] == ["Dr. Who met Mr. Smith.", "They left."]
    assert got[1] == [
        "J. R. R. Tolkien wrote it.",
        "e.g. this.",
        "See Fig. 3 here.",
    ]
    assert got[2] == ["Fetch No. 5 today.", "Then stop."]


def test_runs_no_terminator_and_empty(spark):
    got = _split(
        spark,
        ["Multi...  dots. Wow!!! Really?!", "no terminator", "", None],
    )
    assert got[0] == ["Multi...", "dots.", "Wow!!!", "Really?!"]
    assert got[1] == ["no terminator"]
    assert got[2] == []
    assert got[3] is None


def test_word_internal_dots_do_not_guard(spark):
    # 'it.' ends a sentence ('t.' is not an initial: no \b before t)
    assert _split(spark, ["She took it. Then ran."]) == [
        ["She took it.", "Then ran."]
    ]


def test_explode_order_and_min_chars(spark):
    df = spark.createDataFrame(
        [(1, "One. Two two. X.")], "doc_id long, text string"
    )
    rows = explode_sentences(df).orderBy("sent_idx").collect()
    assert [(r["sent_idx"], r["sentence"]) for r in rows] == [
        (0, "One."),
        (1, "Two two."),
        (2, "X."),
    ]
    rows = explode_sentences(df, min_chars=5).collect()
    assert [r["sentence"] for r in rows] == ["Two two."]


def test_stats_and_map_only_plan(spark):
    df = spark.createDataFrame(
        [(1, "Hi there. Bye."), (2, "")], "doc_id long, text string"
    )
    out = sentence_stats(df)
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["n_sentences"] == 2
    assert got[1]["max_sentence_chars"] == 9
    assert got[1]["mean_sentence_chars"] == (9 + 4) / 2
    assert got[2]["n_sentences"] == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
