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


def test_top_vocab_deterministic_ties(spark):
    from bi_utils_spark.operators.lm import top_vocab, unigram_model

    df = spark.createDataFrame(
        [(1, "b a a c b z")], ["doc_id", "text"]
    )
    vocab = [r["term"] for r in top_vocab(unigram_model(df), 3).collect()]
    # counts: a=2 b=2 c=1 z=1 -> ties break alphabetically
    assert vocab == ["a", "b", "c"]


def test_oov_rate_exact(spark):
    from bi_utils_spark.operators.lm import oov_rate

    docs = spark.createDataFrame(
        [(1, "a b qq"), (2, "a a a"), (3, "zz yy")], ["doc_id", "text"]
    )
    vocab = spark.createDataFrame([("a",), ("b",)], ["term"])
    got = {r["doc_id"]: r for r in oov_rate(docs, vocab).collect()}
    assert (got[1]["n_tokens"], got[1]["n_oov"]) == (3, 1)
    assert got[2]["n_oov"] == 0
    assert got[3]["oov_rate"] == 1.0
    assert abs(got[1]["oov_rate"] - 1 / 3) < 1e-12
