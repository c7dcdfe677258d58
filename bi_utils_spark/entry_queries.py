"""Registry facade — one import surface for the driver contract.

The per-domain modules under bi_utils_spark/queries/ register
themselves into QUERIES/ORACLES (import order = original
registration order); this facade applies the round's _PROMOTED
correctness window and assembles the bench's RAW_QUERIES
overrides. External surface (unchanged): QUERIES, ORACLES,
flagship, RAW_QUERIES, register, load, load_fanout."""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# registration order is the package's module order — import the
# domain modules for their @register side effects, then re-export
# the public spine.  noqa: the 'unused' imports ARE the point.
from bi_utils_spark.queries.core import (  # noqa: F401
    ORACLES,
    QUERIES,
    load,
    load_fanout,
    register,
)
import bi_utils_spark.queries.relational  # noqa: F401,E402
import bi_utils_spark.queries.llmtext  # noqa: F401,E402
import bi_utils_spark.queries.neardup  # noqa: F401,E402
import bi_utils_spark.queries.analytics  # noqa: F401,E402
import bi_utils_spark.queries.media  # noqa: F401,E402
import bi_utils_spark.queries.vectors  # noqa: F401,E402
import bi_utils_spark.queries.warehouse  # noqa: F401,E402
import bi_utils_spark.queries.pipeline  # noqa: F401,E402
import bi_utils_spark.queries.webtext  # noqa: F401,E402
import bi_utils_spark.queries.warehouse2  # noqa: F401,E402
import bi_utils_spark.queries.tx  # noqa: F401,E402
from bi_utils_spark.queries.relational import flagship  # noqa: F401,E402
from bi_utils_spark.queries.neardup import (  # noqa: E402
    raw_ann_topk,
    raw_minhash_near_dup,
    raw_simhash_near_dup,
)
from bi_utils_spark.queries.vectors import (  # noqa: E402
    raw_emb_near_dup_ivf,
    raw_ivf_batch_probe,
    raw_ivf_index_probe,
    raw_ivf_topk,
    raw_pq_topk,
)
from bi_utils_spark.queries.warehouse import raw_winnow_near_dup  # noqa: E402
from bi_utils_spark.queries.tx import (  # noqa: E402
    raw_tx_delete,
    raw_tx_merge,
)



# ===========================================================================
# Registration-order priority (round 11 window).
#
# The driver's correctness run evaluates the first 50 queries in dict
# order. Standing rule (VERDICT r2 #2): every query whose
# implementation changed since its last official CORRECTNESS row is
# promoted into the window; remaining slots re-attest the queries
# whose official green row is OLDEST. The r11 window:
#
# (1) NEW in r11: the five formerly BENCH-only rows promoted per the
#     r10 verdict (capped minhash/simhash/winnow bound attestations;
#     the two raw tx DML arcs with direct SQL oracles), plus the SQL
#     DML front-end and Iceberg-export rows added this round.
# (2) r11-changed implementation: the five queries whose operators
#     gained BNLJ size guards (knn_join_exact, semantic pair/
#     decontaminate, bm25, hybrid fusion) — the guard probe is a new
#     code path in front of each plan.
# (3) re-attestation, oldest official row first: the r5-era tier
#     resuming at q_audio_features (exactly where r10's ledger left
#     off), registry order, skipping names already in tier 2.
# Demoted: the r10 tx tier (attested officially in r10) and everything
# attested r8-r9.
# ===========================================================================

_PROMOTED: list[str] = [
    # ---- tier 1: new in r11 ----
    "q_sql_dml_arc",
    "q_iceberg_export",
    "q_tx_merge_raw",
    "q_tx_delete_raw",
    "q_minhash_near_dup_capped",
    "q_simhash_near_dup_capped",
    "q_winnow_near_dup_capped",
    # ---- tier 2: r11-changed implementation (BNLJ guards) ----
    "q_knn_join",
    "q_semantic_contamination",
    "q_semantic_decontam",
    "q_bm25_search",
    "q_hybrid_search",
    # ---- tier 3: re-attestation, oldest official rows first,
    # resuming at q_audio_features per the r10 ledger note ----
    "q_audio_features",
    "q_phash_near_dup",
    "q_emb_simhash_pairs",
    "q_phash_dedup_clusters",
    "q_emb_dedup_exact",
    "q_emb_near_dup_ivf",
    "q_ivf_topk",
    "q_ivf_index_topk",
    "q_ivf_batch_topk",
    "q_pq_topk",
    "q_forecast_revenue",
    "q_returned_items",
    "q_large_orders",
    "q_promo_share",
    "q_cube_flags",
    "q_users_click_not_purchase",
    "q_users_signup_and_error",
    "q_winnow_near_dup",
    "q_grouping_sets",
    "q_price_variance",
    "q_string_funcs",
    "q_priority_with_shipment",
    "q_hourly_rollup",
    "q_hll_daily_users",
    "q_repetition_stats",
    "q_pack_conservation",
    "q_pack_sequences",
    "q_chunk_documents",
    "q_snapshot_diff",
    "q_bitext_mine",
    "q_bitext_mine_blocked",
    "q_stratified_sample",
    "q_unigram_logprob",
    "q_oov_rate",
    "q_contamination",
    "q_decontaminate",
    "q_quality_tophalf",
    "q_remove_dup_spans",
    # (q_boilerplate_grams onward: next in line for r12)
]


def _reorder() -> None:
    global QUERIES, ORACLES
    order = [n for n in _PROMOTED if n in QUERIES]
    order += [n for n in QUERIES if n not in _PROMOTED]
    QUERIES = {n: QUERIES[n] for n in order}
    ORACLES = {n: ORACLES[n] for n in order if n in ORACLES}


_reorder()


# ===========================================================================
# Raw approximate operators for the bench. The registry entries of the
# same names are oracle-backed recall/completeness SUMMARIES (they run
# the approximate operator AND its exact ground truth); the bench
# times the raw operator alone so walls stay comparable across rounds.
# ===========================================================================

def raw_minhash_near_dup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-bucket-capped MinHash join — the 100 TB production config
    (recall under caps property-tested in tests/test_llmdata.py)."""
    from bi_utils_spark.operators.dedup import minhash_near_dup_join

    docs = load(spark, sf_dir, "documents")
    return minhash_near_dup_join(
        docs, "doc_id", "text", threshold=0.6, num_hashes=64, num_bands=16,
        max_bucket_size=50,
    )


def raw_simhash_near_dup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-chunk-capped SimHash join (hamming-0 tier stays exact)."""
    from bi_utils_spark.operators.dedup import simhash_near_dup_join

    docs = load(spark, sf_dir, "documents")
    return simhash_near_dup_join(
        docs, "doc_id", "text", max_hamming=3, max_chunk_bucket_size=200
    )


def raw_winnow_near_dup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint-frequency-capped winnowing join."""
    from bi_utils_spark.operators.dedup import winnowing_near_dup_join

    docs = load(spark, sf_dir, "documents")
    return winnowing_near_dup_join(
        docs, "doc_id", "text", min_shared=3, max_fp_doc_freq=50
    )


def raw_bitext_mine_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked-kNN bitext mining alone — the 10⁸+-per-side production
    config (the registry entry of the same name is the attestation
    that this equals the exact form; the bench times the raw scale
    path, the established approximate-operator split)."""
    from bi_utils_spark.operators.bitext import mine_bitext
    from bi_utils_spark.operators.similarity import knn_join_blocked

    emb = load(spark, sf_dir, "embeddings")
    par = spark.sparkContext.defaultParallelism
    src = emb.filter(F.col("label") % 2 == 0).repartition(par)
    tgt = emb.filter(F.col("label") % 2 == 1).repartition(par)
    return mine_bitext(src, tgt, k=4, knn=knn_join_blocked)


RAW_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_bitext_mine_blocked": raw_bitext_mine_blocked,
    "q_ivf_index_topk": raw_ivf_index_probe,
    "q_ivf_batch_topk": raw_ivf_batch_probe,
    "q_tx_merge_raw": raw_tx_merge,
    "q_tx_delete_raw": raw_tx_delete,
    "q_minhash_near_dup": raw_minhash_near_dup,
    "q_simhash_near_dup": raw_simhash_near_dup,
    "q_winnow_near_dup": raw_winnow_near_dup,
    "q_ann_topk": raw_ann_topk,
    "q_ivf_topk": raw_ivf_topk,
    "q_emb_near_dup_ivf": raw_emb_near_dup_ivf,
    "q_pq_topk": raw_pq_topk,
    "q_minhash_near_dup_capped": raw_minhash_near_dup_capped,
    "q_simhash_near_dup_capped": raw_simhash_near_dup_capped,
    "q_winnow_near_dup_capped": raw_winnow_near_dup_capped,
}
