"""BNLJ entry-point size guards (r10 verdict task 7): operators whose
plans legitimately carry a BroadcastNestedLoopJoin must REFUSE an
oversized broadcast side with guidance toward the scale path, instead
of planning a runaway join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bi_utils_spark.operators.guards import (
    BroadcastSizeError,
    require_broadcastable,
)


def _vecs(spark, n, dim=4, id_col="vec_id"):
    return spark.range(n).select(
        F.col("id").alias(id_col),
        F.array(
            *[(F.col("id") * (i + 1) % 7 + 1).cast("double") for i in range(dim)]
        ).alias("embedding"),
    )


def test_require_broadcastable_passes_small_side(spark):
    df = spark.range(10)
    out = require_broadcastable(df, 10, "query", "op", "alt")
    assert out is df  # unchanged, no wrapping


def test_require_broadcastable_raises_with_guidance(spark):
    df = spark.range(11)
    with pytest.raises(BroadcastSizeError, match="use_this_instead"):
        require_broadcastable(df, 10, "query", "my_op", "use_this_instead")
    # the error also names the operator and the knob
    with pytest.raises(BroadcastSizeError, match="my_op"):
        require_broadcastable(df, 10, "query", "my_op", "alt")
    with pytest.raises(BroadcastSizeError, match="max_broadcast_rows"):
        require_broadcastable(df, 10, "query", "my_op", "alt")


def test_require_broadcastable_none_disables(spark):
    df = spark.range(1000)
    assert require_broadcastable(df, None, "q", "op", "alt") is df


def test_knn_join_exact_guard(spark):
    from bi_utils_spark.operators.similarity import knn_join_exact

    corpus = _vecs(spark, 20)
    queries = _vecs(spark, 8)
    # within bound: works
    out = knn_join_exact(queries, corpus, k=2, max_broadcast_rows=8)
    assert out.count() == 16
    # over bound: loud refusal pointing at the blocked form
    with pytest.raises(BroadcastSizeError, match="knn_join_blocked"):
        knn_join_exact(queries, corpus, k=2, max_broadcast_rows=7)


def test_semantic_contamination_guard(spark):
    from bi_utils_spark.operators.decontam import (
        semantic_contamination_pairs,
        semantic_decontaminate,
    )

    corpus = _vecs(spark, 20)
    bench = _vecs(spark, 6)
    ok = semantic_contamination_pairs(
        corpus, bench, threshold=0.99, max_broadcast_rows=6
    )
    assert ok.count() >= 0
    with pytest.raises(BroadcastSizeError, match="ivf_topk"):
        semantic_contamination_pairs(
            corpus, bench, threshold=0.99, max_broadcast_rows=5
        )
    with pytest.raises(BroadcastSizeError, match="ivf_topk"):
        semantic_decontaminate(
            corpus, bench, threshold=0.99, max_broadcast_rows=5
        )


def test_bm25_term_count_guard(spark):
    from bi_utils_spark.operators.ranking import bm25_scores, bm25_topk

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    # duplicate terms dedupe before the check
    assert (
        bm25_scores(docs, ["beta", "BETA", "beta"], max_query_terms=1).count()
        == 2
    )
    with pytest.raises(ValueError, match="bm25_from_index"):
        bm25_scores(docs, ["a", "b", "c"], max_query_terms=2)
    with pytest.raises(ValueError, match="bm25_from_index"):
        bm25_topk(docs, ["a", "b", "c"], k=1, max_query_terms=2)


def test_hybrid_topk_depth_guard(spark):
    from bi_utils_spark.operators.retrieval import hybrid_topk

    leg = spark.createDataFrame(
        [(1, 0.9), (2, 0.5)], "doc_id long, score double"
    )
    assert hybrid_topk({"a": leg}, k=1, depth=50).count() == 1
    with pytest.raises(ValueError, match="depth"):
        hybrid_topk({"a": leg}, k=1, depth=1_000_001)
