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
    raw_tx_cdf,
    raw_tx_delete,
    raw_tx_merge,
)



# ===========================================================================
# Registration-order priority (round 12 window).
#
# The driver's correctness run evaluates the first 50 queries in dict
# order. Standing rule (VERDICT r2 #2): every query whose
# implementation changed since its last official CORRECTNESS row is
# promoted into the window; remaining slots re-attest the queries
# whose official green row is OLDEST. The r12 window:
#
# (1) NEW in r12: q_tx_respec_export (multi-spec Iceberg export, the
#     r11 verdict headline) and q_sql_dml_merge2 (widened SQL MERGE
#     grammar); plus the two r11 rows whose implementation AND (for
#     the sql arc) oracle changed this round: q_sql_dml_arc
#     (SQL-standard matched-only delete semantics; reference binding
#     rewrite) and q_iceberg_export (multi-spec export internals).
# (2) r12-changed implementation: q_tx_compact and q_tx_zorder — the
#     compaction planner (_group_counts) learned to scan old-spec
#     files for their current-spec keys; both rows drive it.
# (3) oldest-green sample (verdict task 8): pre-r5 rows whose last
#     official attestation predates the rotation ledger —
#     q_union_pages, q_alert_top1, q_flatten_lineitems, q_hash_id,
#     q_daily_count, q_latest_event_per_user.
# (4) re-attestation, oldest official rows first: resuming at
#     q_boilerplate_grams (exactly where the r11 ledger note left
#     off), registry order, skipping names green in the r11 window
#     (q_semantic_contamination, q_semantic_decontam, q_knn_join).
# Demoted: everything attested officially in r11.
# Ledger note: tier 4 ends at q_unicode_nfc; r13 resumes at
# q_series_outliers onward.
# ===========================================================================

_PROMOTED: list[str] = [
    # ---- tier 1: new / semantics-changed in r12 ----
    "q_tx_respec_export",
    "q_sql_dml_merge2",
    "q_sql_ddl_arc",
    "q_sql_dml_arc",
    "q_iceberg_export",
    # ---- tier 2: r12-changed compaction planner ----
    "q_tx_compact",
    "q_tx_zorder",
    # ---- tier 3: oldest-green pre-r5 sample ----
    "q_union_pages",
    "q_alert_top1",
    "q_flatten_lineitems",
    "q_hash_id",
    "q_daily_count",
    "q_latest_event_per_user",
    # ---- tier 4: re-attestation, oldest official rows first ----
    "q_boilerplate_grams",
    "q_dup_spans",
    "q_importance_weights",
    "q_importance_sample",
    "q_nb_classifier",
    "q_nb_classifier_eval",
    "q_zipf_topk",
    "q_head_coverage",
    "q_bigram_logprob",
    "q_mixture_sample",
    "q_bpe_top_pairs",
    "q_ivfpq_residual_topk",
    "q_funnel",
    "q_funnel_latency",
    "q_event_transitions",
    "q_cohort_retention",
    "q_corpus_report",
    "q_curriculum_order",
    "q_encode_tokens",
    "q_global_shuffle",
    "q_boilerplate_lines",
    "q_line_dedup",
    "q_url_normalize",
    "q_domain_stats",
    "q_domain_blocklist",
    "q_registered_domain_psl",
    "q_domain_stats_psl",
    "q_domain_cap",
    "q_html_extract",
    "q_outlink_domains",
    "q_web_pipeline",
    "q_robots_rules",
    "q_robots_decisions",
    "q_zorder_key",
    "q_countmin_hh",
    "q_countmin_bound",
    "q_unicode_nfc",
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
    # scale-curve-only row (not benched, not oracled): the end-to-end
    # commit-time-CDF arc, rebuilt from scratch per call
    "q_tx_cdf_raw": raw_tx_cdf,
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
