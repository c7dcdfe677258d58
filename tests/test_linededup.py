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


# ---------------------------------------------------------------------------
# X70: paragraph-level boilerplate (dedup.paragraph_doc_freq /
# remove_boilerplate_paragraphs)
# ---------------------------------------------------------------------------


def _para_docs(spark):
    shared = "COOKIE NOTICE\nwe use cookies"
    docs = [
        (1, shared + "\n\nunique one"),
        (2, shared + "\n\nunique two\n\nalso two"),
        (3, "unique three\n\n" + shared),
        (4, "only unique four"),
        (5, shared + "\n\n" + shared),  # repeats within ONE doc
    ]
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_paragraph_df_counts_distinct_docs(spark):
    from bi_utils_spark.operators.dedup import paragraph_doc_freq

    rows = paragraph_doc_freq(_para_docs(spark), min_df=2).collect()
    assert [(r["paragraph"], r["df"]) for r in rows] == [
        ("COOKIE NOTICE\nwe use cookies", 4)  # doc 5 counts ONCE
    ]


def test_paragraph_removal_keeps_units_whole(spark):
    from bi_utils_spark.operators.dedup import (
        remove_boilerplate_paragraphs,
    )

    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_paragraphs(
            _para_docs(spark), min_df=2
        ).collect()
    }
    assert out[1]["text_cleaned"] == "unique one"
    assert out[2]["text_cleaned"] == "unique two\n\nalso two"
    assert out[3]["text_cleaned"] == "unique three"
    assert out[4]["text_cleaned"] == "only unique four"
    assert out[5]["text_cleaned"] == ""  # fully boilerplate, row kept
    assert out[5]["n_removed"] == 2
    # the shared block's INTERNAL line survives nowhere in cleaned
    for r in out.values():
        assert "we use cookies" not in r["text_cleaned"]


def test_paragraph_trim_identity_and_line_pass_contrast(spark):
    from bi_utils_spark.operators.dedup import (
        remove_boilerplate_lines,
        remove_boilerplate_paragraphs,
    )

    # whitespace-jittered copies still count as the same paragraph
    docs = spark.createDataFrame(
        [(1, "  shared body  \n\nkeep1"), (2, "shared body\n\nkeep2")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text_cleaned"]
        for r in remove_boilerplate_paragraphs(docs, min_df=2).collect()
    }
    assert out == {1: "keep1", 2: "keep2"}
    # a line-level pass at the same threshold removes shared LINES
    # but leaves multi-line paragraphs partially standing — the
    # granularity difference this tier exists for
    d2 = spark.createDataFrame(
        [(1, "a\nb unique1"), (2, "a\nb unique2")],
        "doc_id long, text string",
    )
    lines = {
        r["doc_id"]: r["text_cleaned"]
        for r in remove_boilerplate_lines(d2, min_df=2).collect()
    }
    assert lines == {1: "b unique1", 2: "b unique2"}
    paras = {
        r["doc_id"]: r["text_cleaned"]
        for r in remove_boilerplate_paragraphs(d2, min_df=2).collect()
    }
    # each doc is ONE paragraph and their identities differ (the
    # unique tail), so the paragraph pass removes nothing
    assert paras == {1: "a\nb unique1", 2: "a\nb unique2"}
