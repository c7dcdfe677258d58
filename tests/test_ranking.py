"""Tests for BM25 keyword search (operators/ranking.py)."""

from __future__ import annotations

import math

import pytest

from bi_utils_spark.operators.ranking import bm25_scores, bm25_topk


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "spark query engine with fast query plans"),
            (2, "query"),
            (3, "unrelated text about other things entirely"),
            (4, "fast fast fast"),
        ],
        ["doc_id", "text"],
    )


def test_bm25_matches_hand_math(corpus):
    got = {r["doc_id"]: r["score"] for r in bm25_scores(corpus, ["query"]).collect()}
    assert set(got) == {1, 2}  # only docs containing the term
    # hand-computed: N=4, df=2, idf=ln((4-2+0.5)/(2+0.5)+1)=ln(2)
    # avgdl=(7+1+6+3)/4=4.25
    idf = math.log((4 - 2 + 0.5) / (2 + 0.5) + 1)
    for doc_id, tf, dl in [(1, 2, 7), (2, 1, 1)]:
        expected = idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 4.25))
        assert got[doc_id] == pytest.approx(expected, abs=1e-6)
    # doc 1 has tf=2 but is longer; doc 2 is one pure hit — shorter doc
    # with saturating tf must not dominate unboundedly
    assert got[1] > 0 and got[2] > 0


def test_bm25_multi_term_additive(corpus):
    single_q = {r["doc_id"]: r["score"] for r in bm25_scores(corpus, ["query"]).collect()}
    single_f = {r["doc_id"]: r["score"] for r in bm25_scores(corpus, ["fast"]).collect()}
    both = {r["doc_id"]: r["score"] for r in bm25_scores(corpus, ["query", "fast"]).collect()}
    assert set(both) == {1, 2, 4}
    assert both[1] == pytest.approx(single_q[1] + single_f[1], abs=1e-5)


def test_bm25_topk_order_deterministic(corpus):
    top = bm25_topk(corpus, ["fast", "query"], k=2).collect()
    assert len(top) == 2
    assert top[0]["score"] >= top[1]["score"]


def test_bm25_no_matches(corpus):
    assert bm25_scores(corpus, ["zzzzz"]).count() == 0


def test_bm25_stats_broadcast_plan(corpus):
    from bi_utils_spark.plans.inspect import join_kinds

    plan_joins = join_kinds(bm25_scores(corpus, ["query"]))
    # the one-row stats frame must come in as a broadcast, never a shuffle
    assert plan_joins.get("BroadcastNestedLoopJoin", 0) + plan_joins.get(
        "BroadcastHashJoin", 0
    ) >= 1
    assert "SortMergeJoin" not in plan_joins


def test_bm25_index_path_matches_direct(spark, sf_dir):
    from bi_utils_spark.operators.ranking import (
        bm25_from_index,
        bm25_scores,
        build_inverted_index,
    )
    from bi_utils_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    terms = ["vector", "merge", "stream"]
    direct = {r["doc_id"]: r["score"] for r in bm25_scores(docs, terms).collect()}
    postings, stats = build_inverted_index(docs)
    via_index = {
        r["doc_id"]: r["score"]
        for r in bm25_from_index(postings, stats, terms).collect()
    }
    assert set(direct) == set(via_index)  # match set identical
    for doc_id, s in direct.items():
        assert via_index[doc_id] == pytest.approx(s, abs=1e-9)


def test_inverted_index_shape(spark):
    from bi_utils_spark.operators.ranking import build_inverted_index

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b c")], ["doc_id", "text"]
    )
    postings, stats = build_inverted_index(df)
    rows = {(r["term"], r["doc_id"]): (r["tf"], r["dl"]) for r in postings.collect()}
    assert rows[("a", 1)] == (2, 3)
    assert rows[("b", 1)] == (1, 3) and rows[("b", 2)] == (1, 2)
    st = stats.first()
    assert st["n_docs"] == 2 and st["avgdl"] == pytest.approx(2.5)


def test_tfidf_top_terms(spark):
    from bi_utils_spark.operators.ranking import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana shared"),
            (2, "cherry shared shared"),
            (3, "apple shared"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_top_terms(docs, "doc_id", "text", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"]))
    for v in by_doc.values():
        v.sort()
    # doc 1: apple (tf=2, df=2) beats banana (tf=1, df=1)?
    # idf(banana)=ln(4/2)+1 > idf(apple)=ln(4/3)+1 but tf=2 doubles it:
    # 2*(ln(4/3)+1) ~ 2.575 vs 1*(ln(2)+1) ~ 1.693 -> apple first
    assert by_doc[1][0][1] == "apple" and by_doc[1][1][1] == "banana"
    # doc 2: cherry (unique, df=1) beats shared (df=3) despite tf 1 vs 2:
    # 1*(ln(2)+1) ~ 1.693 vs 2*(ln(1)+1) = 2.0 -> actually shared wins
    assert by_doc[2][0][1] == "shared" and by_doc[2][1][1] == "cherry"
    # k truncation
    assert all(len(v) <= 2 for v in by_doc.values())
    # determinism under repartitioning (exact tuple equality)
    again = tfidf_top_terms(
        docs.repartition(5), "doc_id", "text", k=2
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
