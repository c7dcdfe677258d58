"""Tests for unigram LM quality scoring (operators/lm.py)."""

from __future__ import annotations

import math

import pytest

from bi_utils_spark.operators.lm import unigram_logprob_scores, unigram_model


def test_unigram_hand_math(spark):
    # corpus: "a a b" + "b" -> counts a:2 b:2, total 4, V 2
    df = spark.createDataFrame([(1, "a a b"), (2, "b")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in unigram_logprob_scores(df).collect()}
    lp = lambda c: round(math.log((c + 1) / 6.0) * 1e7) / 1e7  # noqa: E731
    assert got[1]["n_tokens"] == 3
    assert got[1]["avg_logprob"] == pytest.approx((2 * lp(2) + lp(2)) / 3, abs=1e-9)
    assert got[2]["avg_logprob"] == pytest.approx(lp(2), abs=1e-9)


def test_unigram_rare_text_scores_lower(spark, sf_dir):
    from bi_utils_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    scores = unigram_logprob_scores(docs)
    joined = docs.join(scores, "doc_id")
    # corpus-mode text scores higher than a doc scored against the
    # model trained elsewhere: spot-check ordering is sane (finite,
    # negative, bounded)
    row = joined.agg(
        F.min("avg_logprob").alias("lo"), F.max("avg_logprob").alias("hi")
    ).first()
    assert row["lo"] < row["hi"] < 0.0


def test_unigram_cross_corpus_unseen_terms(spark):
    ref = spark.createDataFrame([(1, "clean fluent text here")], ["doc_id", "text"])
    model = unigram_model(ref)
    cand = spark.createDataFrame(
        [(10, "clean text"), (11, "zzqx vvkw")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["avg_logprob"] for r in
           unigram_logprob_scores(cand, model=model).collect()}
    # all-unseen gibberish must score strictly below in-vocab text
    assert got[11] < got[10]


def test_unigram_deterministic_under_repartition(spark, sf_dir):
    from bi_utils_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100)
    a = sorted(map(tuple, unigram_logprob_scores(docs).collect()))
    b = sorted(map(tuple, unigram_logprob_scores(docs.repartition(17)).collect()))
    assert a == b  # fixed-point sums are order-independent
