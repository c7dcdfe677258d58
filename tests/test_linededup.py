"""operators/dedup.py — X55 cross-document line dedup (boilerplate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bi_utils_spark.operators.dedup import line_doc_freq, remove_boilerplate_lines


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_removed_unique_and_blanks_kept(spark):
    df = _docs(
        spark,
        [
            (1, "HEADER\n\nalpha one\nFOOTER"),
            (2, "HEADER\nbeta two\n\nFOOTER"),
            (3, "HEADER\ngamma three\nFOOTER"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(df, min_df=3).collect()
    }
    assert out[1]["text_cleaned"] == "\nalpha one"
    assert out[2]["text_cleaned"] == "beta two\n"
    assert out[3]["text_cleaned"] == "gamma three"
    assert all(out[i]["n_removed"] == 2 for i in (1, 2, 3))
    assert out[1]["n_lines"] == 4  # blank line counted, never removed


def test_min_df_boundary_is_distinct_doc_count(spark):
    # the repeated line appears TWICE in doc 1 but only in 2 distinct
    # docs — with min_df=3 it must survive (df counts docs, not rows)
    df = _docs(
        spark,
        [
            (1, "dup\ndup\na"),
            (2, "dup\nb"),
            (3, "c"),
        ],
    )
    out = {
        r["doc_id"]: r["text_cleaned"]
        for r in remove_boilerplate_lines(df, min_df=3).collect()
    }
    assert out[1] == "dup\ndup\na"
    out2 = {
        r["doc_id"]: r["text_cleaned"]
        for r in remove_boilerplate_lines(df, min_df=2).collect()
    }
    assert out2[1] == "a" and out2[2] == "b" and out2[3] == "c"


def test_fully_boilerplate_doc_kept_as_empty(spark):
    df = _docs(spark, [(1, "x"), (2, "x"), (3, "x\ny")])
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(df, min_df=2).collect()
    }
    assert out[1]["text_cleaned"] == "" and out[1]["n_removed"] == 1
    assert out[3]["text_cleaned"] == "y"
    assert len(out) == 3  # emptied rows are kept, not dropped


def test_line_doc_freq_reports_only_above_threshold(spark):
    df = _docs(spark, [(1, "h\nu1"), (2, "h\nu2"), (3, "h\n\n")])
    rows = line_doc_freq(df, min_df=2).collect()
    assert [(r["line"], r["df"]) for r in rows] == [("h", 3)]


def test_whitespace_only_lines_are_exempt(spark):
    df = _docs(spark, [(1, "  \nkeep1"), (2, "  \nkeep2"), (3, "  \nkeep3")])
    out = remove_boilerplate_lines(df, min_df=2)
    assert all(r["text_cleaned"].startswith("  \n") for r in out.collect())
    assert line_doc_freq(df, min_df=2).count() == 0


def test_no_pair_enumeration_in_plan(spark):
    df = _docs(spark, [(1, "a\nb"), (2, "a\nc")])
    plan = (
        remove_boilerplate_lines(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )  # noqa: SLF001
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
