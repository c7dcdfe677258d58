"""operators/retrieval.py — reciprocal-rank fusion hybrid retrieval."""

from __future__ import annotations

import pytest

from bi_utils_spark.operators.retrieval import hybrid_topk, ranked_topk, rrf_fuse


def _leg(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "score"])


def test_ranked_topk_orders_and_breaks_ties_by_id(spark):
    leg = _leg(spark, [(1, 5.0), (2, 9.0), (3, 5.0), (4, 1.0)])
    got = {r["doc_id"]: r["rank"] for r in ranked_topk(leg, 3).collect()}
    # 9.0 first; the 5.0 tie resolves to the smaller id; depth cuts id 4
    assert got == {2: 1, 1: 2, 3: 3}


def test_rrf_hand_math(spark):
    a = _leg(spark, [(1, 3.0), (2, 2.0), (3, 1.0)])
    b = _leg(spark, [(2, 9.0), (4, 8.0)])
    out = hybrid_topk({"a": a, "b": b}, k=10, depth=10)
    rows = {r["doc_id"]: r for r in out.collect()}
    q = lambda r: round(1e7 / (60 + r)) / 1e7  # noqa: E731
    assert rows[2]["rrf_score"] == pytest.approx(q(2) + q(1), abs=1e-12)
    assert rows[1]["rrf_score"] == pytest.approx(q(1), abs=1e-12)
    assert rows[4]["rrf_score"] == pytest.approx(q(2), abs=1e-12)
    # doc 2 tops the fusion: present in both legs
    assert (
        out.collect()[0]["doc_id"] == 2
    ), "consensus doc must outrank single-leg docs"
    # per-leg ranks carried; missing leg is NULL
    assert rows[1]["a_rank"] == 1 and rows[1]["b_rank"] is None
    assert rows[2]["a_rank"] == 2 and rows[2]["b_rank"] == 1


def test_rrf_weights_shift_the_order(spark):
    a = _leg(spark, [(1, 9.0), (2, 1.0)])
    b = _leg(spark, [(2, 9.0), (1, 1.0)])
    # symmetric lists tie on unweighted RRF (id breaks it) — weighting
    # leg b must put doc 2 first
    unw = hybrid_topk({"a": a, "b": b}, k=1, depth=10).first()["doc_id"]
    wtd = hybrid_topk(
        {"a": a, "b": b}, k=1, depth=10, weights={"b": 2.0}
    ).first()["doc_id"]
    assert unw == 1 and wtd == 2


def test_rrf_depth_cuts_before_fusion(spark):
    a = _leg(spark, [(i, float(100 - i)) for i in range(1, 20)])
    out = hybrid_topk({"a": a}, k=50, depth=5)
    assert out.count() == 5  # ids 6..19 never enter the fusion


def test_rrf_validations(spark):
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse({})
    a = _leg(spark, [(1, 1.0)])
    with pytest.raises(ValueError, match="k0"):
        rrf_fuse({"a": ranked_topk(a, 5)}, k0=0)


def test_hybrid_plan_is_bounded(spark):
    # fusion never shuffles the corpus: every exchange past the legs
    # operates on <= legs*depth rows; no join appears at all
    from bi_utils_spark.plans.inspect import join_kinds

    a = _leg(spark, [(i, float(i % 17)) for i in range(200)])
    b = _leg(spark, [(i, float(i % 13)) for i in range(200)])
    out = hybrid_topk({"a": a, "b": b}, k=10, depth=20)
    assert join_kinds(out) == {}  # union + groupBy, no joins
    assert out.count() <= 40
