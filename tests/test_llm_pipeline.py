"""Golden composition test: the q_llm_pipeline stages agree with the
independently-verified stage queries when run step-by-step."""

from pyspark.sql import functions as F

from bi_utils_spark.entry_queries import QUERIES
from bi_utils_spark.operators import textclean as tc
from bi_utils_spark.operators.dedup import dedup_exact, jaccard_similarity_join
from bi_utils_spark.operators.graph import dedup_near_canonical
from bi_utils_spark.sources.tables import load_table


def test_pipeline_stage_consistency(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    cleaned = docs.select("doc_id", tc.clean_text("text").alias("text"))
    assert cleaned.count() == n_docs                      # clean is 1:1

    uniq = dedup_exact(cleaned, ["text"], keep_order_col="doc_id")
    n_uniq = uniq.count()
    n_distinct = cleaned.select("text").distinct().count()
    assert n_uniq == n_distinct                           # one survivor per content

    pairs = jaccard_similarity_join(uniq, "doc_id", "text", threshold=0.5, shingle_n=3)
    kept = dedup_near_canonical(uniq, pairs)
    n_kept = kept.count()
    assert n_kept <= n_uniq
    # every dropped doc appears in at least one pair
    dropped = uniq.join(kept, "doc_id", "left_anti").select("doc_id")
    pair_ids = pairs.select(F.col("id_a").alias("doc_id")).union(
        pairs.select(F.col("id_b").alias("doc_id"))
    ).distinct()
    assert dropped.join(pair_ids, "doc_id", "left_anti").count() == 0

    out = QUERIES["q_llm_pipeline"](spark, sf_dir)
    rows = out.collect()
    assert sum(r["n_docs"] for r in rows) <= n_kept       # quality gate only removes
    assert all(r["total_tokens"] > 0 for r in rows)
    assert len({r["lang"] for r in rows}) == len(rows)    # lang is the group key
