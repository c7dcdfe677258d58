"""operators/textnorm.py — X63 Unicode hygiene tier."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bi_utils_spark.operators.textnorm import (
    attach_normalized_text,
    normalize_unicode,
    repair_mojibake,
    strip_invisible,
    unicode_stats,
)


def _apply(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], "t string")
    return [r["o"] for r in df.select(col_fn(F.col("t")).alias("o")).collect()]


def test_nfc_composes_and_is_idempotent(spark):
    decomposed = "Café"          # e + combining acute
    composed = "Café"
    got = _apply(spark, normalize_unicode, [decomposed, composed, "", None])
    assert got == [composed, composed, "", None]


def test_nfkc_folds_compatibility(spark):
    got = _apply(
        spark,
        lambda c: normalize_unicode(c, "NFKC"),
        ["ﬁle", "x²"],       # ﬁ ligature, superscript 2
    )
    assert got == ["file", "x2"]


def test_bad_form_raises(spark):
    with pytest.raises(ValueError):
        normalize_unicode(F.col("x"), "NFX")


def test_mojibake_repair_gated(spark):
    got = _apply(
        spark,
        repair_mojibake,
        [
            "CafÃ© au lait",            # utf8-as-cp1252 -> repaired
            "â€œquotedâ€",       # curly quotes mojibake
            "Café clean",          # real é, no marker -> untouched
            "ascii only",
            None,
        ],
    )
    assert got[0] == "Café au lait"
    assert got[1] == "“quoted”"
    assert got[2] == "Café clean"
    assert got[3] == "ascii only"
    assert got[4] is None


def test_mojibake_never_damages_non_roundtrippable(spark):
    # marker present but bytes do NOT round-trip as UTF-8 -> unchanged
    v = "Ã only marker, not valid utf8 tail"
    assert _apply(spark, repair_mojibake, [v]) == [v]


def test_repair_is_idempotent(spark):
    v = "CafÃ©"
    once = _apply(spark, repair_mojibake, [v])[0]
    twice = _apply(spark, repair_mojibake, [once])[0]
    assert once == twice == "Café"


def test_strip_invisible_keeps_whitespace(spark):
    got = _apply(
        spark,
        strip_invisible,
        ["a​b‍﻿c", "tab\there\nline\rret", "\x01\x07x"],
    )
    assert got == ["abc", "tab\there\nline\rret", "x"]


def test_attach_and_stats_pipeline(spark):
    df = spark.createDataFrame(
        [
            (1, "Café nfd"),
            (2, "CafÃ© moji"),
            (3, "zw​sp"),
            (4, "clean"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text_norm"]
        for r in attach_normalized_text(df).collect()
    }
    assert out == {
        1: "Café nfd",
        2: "Café moji",
        3: "zwsp",
        4: "clean",
    }
    s = unicode_stats(df).first()
    assert (
        s["docs"],
        s["non_nfc_docs"],
        s["mojibake_docs"],
        s["invisible_docs"],
    ) == (4, 1, 1, 1)


def test_clean_rows_stay_jvm_side(spark):
    # the repair prefilter must keep marker-free rows out of Python:
    # the plan's Python evaluation is inside a conditional branch, so
    # a fully-clean frame still runs, and the projection stays map-only
    df = spark.createDataFrame([("plain",)] * 10, "t string")
    out = df.select(repair_mojibake("t").alias("o"))
    assert [r["o"] for r in out.collect()] == ["plain"] * 10
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
