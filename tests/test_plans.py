"""Plan-level assertions for the scale design claims (plans/inspect.py)."""

import pytest
from pyspark.sql import functions as F

from bi_utils_spark.plans.inspect import (
    assert_no_nested_loop,
    assert_pruned_scan,
    assert_pushed_filter,
    join_kinds,
    num_exchanges,
    scan_pushed_filters,
)
from bi_utils_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def sf01():
    return "/root/testdata/sf0.01"


def test_q6_pushdown_and_pruning(spark, sf01):
    import __spark_entry__ as m

    df = m.queries()["q_forecast_revenue"](spark, sf01)
    assert_pushed_filter(df, "l_shipdate")
    assert_pushed_filter(df, "l_quantity")
    # 11-column lineitem read with ≤4 columns
    assert_pruned_scan(df, table_cols=11, max_read_cols=4)


def test_star_join_broadcasts_dims(spark, sf01):
    import __spark_entry__ as m

    df = m.queries()["q_revenue_by_nation"](spark, sf01)
    kinds = join_kinds(df)
    assert kinds.get("BroadcastHashJoin", 0) >= 3
    assert_no_nested_loop(df)


def test_quantile_queries_have_no_global_window(spark, sf01):
    # VERDICT r3 #2/#3 Done-criterion: neither the discrete-score
    # percent_rank (q_quality_tophalf) nor the continuous-score
    # curriculum layout (q_curriculum_order) may contain an
    # unpartitioned Window (single-task corpus sort)
    import __spark_entry__ as m

    from bi_utils_spark.plans.inspect import assert_no_global_window

    assert_no_global_window(m.queries()["q_quality_tophalf"](spark, sf01))
    assert_no_global_window(m.queries()["q_curriculum_order"](spark, sf01))


def test_asof_join_plan_is_shuffle_once(spark, sf01):
    import __spark_entry__ as m

    df = m.queries()["q_asof_click_before_purchase"](spark, sf01)
    assert_no_nested_loop(df)


def test_metadata_only_media_stats_prunes_payload(spark, tmp_path):
    from bi_utils_spark.operators.multimodal import MEDIA_SCHEMA, media_stats
    from bi_utils_spark.plans.inspect import scan_read_schemas

    media = spark.createDataFrame(
        [("m1", "image", "image/png", b"\x89PNG" * 1000, (640, 480, None, None))],
        MEDIA_SCHEMA,
    )
    path = str(tmp_path / "media")
    media.write.parquet(path)
    # media_stats touches modality + meta only — the parquet scan's
    # ReadSchema must exclude the fat payload column entirely
    out = media_stats(spark.read.parquet(path))
    schemas = scan_read_schemas(out)
    assert schemas and all("payload" not in s for s in schemas)


def test_exchange_counts_bounded_for_pricing_summary(spark, sf01):
    import __spark_entry__ as m

    df = m.queries()["q_pricing_summary"](spark, sf01)
    # scan → partial agg → single exchange → final agg (+AQE reads)
    assert num_exchanges(df) <= 2


def test_chunking_is_shuffle_free(spark, sf01):
    # chunking is a map-side projection: split + slice + explode must
    # fuse into the document scan with zero Exchange at any scale
    from bi_utils_spark.operators.chunking import chunk_documents

    docs = load_table(spark, sf01, "documents")
    df = chunk_documents(docs, chunk_tokens=64, overlap=8)
    assert num_exchanges(df) == 0


def test_stratified_sample_is_shuffle_free(spark, sf01):
    from bi_utils_spark.operators.splits import stratified_sample

    docs = load_table(spark, sf01, "documents")
    df = stratified_sample(docs, "doc_id", "lang", {"en": 0.5})
    assert num_exchanges(df) == 0


def test_unigram_scoring_broadcasts_model(spark, sf01):
    # the vocab model and the one-row constants must come in as
    # broadcasts — the token stream is never shuffled for the join
    from bi_utils_spark.operators.lm import unigram_logprob_scores

    docs = load_table(spark, sf01, "documents")
    df = unigram_logprob_scores(docs)
    kinds = join_kinds(df)
    assert kinds.get("BroadcastHashJoin", 0) >= 1
    assert "SortMergeJoin" not in kinds and "ShuffledHashJoin" not in kinds


def test_session_windows_single_shuffle(spark, sf01):
    import __spark_entry__ as m

    df = m.queries()["q_session_windows"](spark, sf01)
    # one exchange on user_id; session merging happens inside the
    # aggregation, never via a self-join
    assert num_exchanges(df) <= 1
    assert_no_nested_loop(df)


def test_shard_positions_single_shuffle(spark, sf01):
    from bi_utils_spark.operators.importance import shard_positions

    docs = load_table(spark, sf01, "documents")
    df = shard_positions(docs, "doc_id", num_shards=8)
    # one hash exchange on shard; within-shard sort is per-partition
    assert num_exchanges(df) == 1
    assert_no_nested_loop(df)


def test_encode_tokens_broadcast_only(spark, sf01):
    from bi_utils_spark.operators.lm import (
        encode_tokens,
        term_ranks,
        unigram_model,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, sf01, "documents")
    vocab = term_ranks(unigram_model(docs)).filter(F.col("rank") <= 200)
    df = encode_tokens(docs, vocab)
    kinds = join_kinds(df)
    # the token-stream probe must be a broadcast join — a shuffle of
    # the exploded stream would be the 100 TB scale-killer
    assert kinds.get("BroadcastHashJoin", 0) >= 1
    assert "SortMergeJoin" not in kinds and "ShuffledHashJoin" not in kinds


def test_mixture_sample_no_sort_merge_join(spark, sf01):
    from bi_utils_spark.operators.mixing import mixture_sample

    docs = load_table(spark, sf01, "documents")
    df = mixture_sample(docs, "doc_id", "source", 5000)
    kinds = join_kinds(df)
    assert "SortMergeJoin" not in kinds  # quota arrives by broadcast
    assert num_exchanges(df) <= 3


def test_knn_join_exact_scores_map_only(spark, sf01):
    from bi_utils_spark.operators.similarity import knn_join_exact
    from pyspark.sql import functions as F

    emb = load_table(spark, sf01, "embeddings")
    df = knn_join_exact(
        emb.filter(F.col("vec_id") % 25 == 0),
        emb.filter(F.col("vec_id") % 25 != 0),
        k=5,
    )
    kinds = join_kinds(df)
    # r12: the corpus side streams map-only against the task-shipped
    # query batch inside ONE vectorized Arrow stage — no join node at
    # all (the former BroadcastNestedLoopJoin's zip_with fold was
    # interpreted per element)
    assert kinds == {}
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "MapInPandas" in plan
    # one exchange: the per-query rank shuffle
    assert num_exchanges(df) == 1


def test_importance_sample_key_is_map_only_over_weights(spark, sf01):
    # the Gumbel key adds no exchange beyond what the weights plan has
    from bi_utils_spark.operators.importance import (
        bucket_logratio,
        importance_resample,
        importance_weights,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, sf01, "documents")
    lr = bucket_logratio(docs.filter(F.col("lang") == "en"), docs)
    w = importance_weights(docs, lr)
    keyed = importance_resample(w, k=10)
    assert num_exchanges(keyed) == num_exchanges(w)


def test_classifier_fit_and_score_never_smj(spark, sf01):
    # fit shuffles only the 4096-bucket key space; scoring joins the
    # broadcast weight table; densification joins broadcast. No
    # sort-merge join may appear anywhere in the labeled pipeline.
    from bi_utils_spark.operators.classifier import (
        classifier_scores,
        fit_nb_weights_labeled,
    )

    docs = load_table(spark, sf01, "documents")
    w = fit_nb_weights_labeled(docs, F.col("lang") == "en")
    scored = classifier_scores(docs, w)
    kinds = join_kinds(scored)
    assert kinds.get("SortMergeJoin", 0) == 0
    assert kinds.get("BroadcastHashJoin", 0) >= 1


def test_phash_pair_search_no_nested_loop(spark):
    # banded candidate join is an equi-join on (band, seg) — an
    # all-pairs nested-loop must never appear
    from bi_utils_spark.operators.phash import phash_near_dup_pairs

    hashes = spark.createDataFrame(
        [(str(i), i * 7919) for i in range(100)],
        "media_id string, phash long",
    )
    assert_no_nested_loop(phash_near_dup_pairs(hashes))


def test_kmeans_assignment_is_map_only(spark, sf01):
    # centroids are literals in the plan: assignment adds ZERO
    # exchanges over the bare scan
    from bi_utils_spark.operators.clustering import kmeans_assign, kmeans_init

    emb = load_table(spark, sf01, "embeddings")
    cents = kmeans_init(emb, "vec_id", "embedding", 4)
    assert num_exchanges(kmeans_assign(emb, cents)) == 0
