"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query executes to completion through the no-op sink (`format
("noop")`) so results are fully materialized without driver collect
overhead polluting the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    # relational / window / scalar surface
    "q_pricing_summary",
    "q_shipping_priority",
    "q_revenue_by_nation",
    "q_top_suppliers",
    "q_forecast_revenue",
    "q_returned_items",
    "q_large_orders",
    "q_promo_share",
    "q_latest_event_per_user",
    "q_alert_decide_batch",
    # temporal joins
    "q_asof_click_before_purchase",
    "q_range_clicks_before_error",
    "q_sessionize",
    "q_funnel",
    "q_cohort_retention",
    "q_event_transitions",
    # nested + merge surface
    "q_flatten_lineitems",
    "q_merge_upsert",
    # LLM-data surface
    "q_text_stats",
    "q_repetition_stats",
    "q_dedup_exact",
    "q_jaccard_pairs",
    "q_minhash_near_dup",
    "q_minhash_near_dup_capped",
    "q_simhash_near_dup",
    "q_simhash_near_dup_capped",
    "q_winnow_near_dup",
    "q_winnow_near_dup_capped",
    "q_topk_cosine_exact",
    "q_ivf_topk",
    "q_pq_topk",
    # the scale path for embedding near-dup (the exact O(n²) variant
    # q_emb_dedup_exact stays oracle-only — quadratic by definition)
    "q_emb_near_dup_ivf",
    "q_knn_join",
    "q_media_features",
    "q_pack_sequences",
    # r3 additions: chunking / search / LM-quality / session surface
    "q_chunk_documents",
    "q_bm25_search",
    "q_unigram_logprob",
    "q_oov_rate",
    "q_session_windows",
    "q_stratified_sample",
    # r3 additions: DSIR importance resampling / Zipf / global shuffle
    "q_importance_weights",
    "q_importance_sample",
    "q_head_coverage",
    "q_global_shuffle",
    "q_bigram_logprob",
    "q_mixture_sample",
    "q_semantic_contamination",
    "q_bpe_top_pairs",
    "q_encode_tokens",
    "q_curriculum_order",
    # r3 additions: decontamination / span diagnostics / quantile filter
    "q_contamination",
    "q_dup_spans",
    "q_remove_dup_spans",
    "q_quality_tophalf",
    "q_corpus_report",
    # r4 additions: hashed NB quality classifier / perceptual-hash
    # image near-dup / exact-arithmetic k-means
    "q_nb_classifier",
    "q_nb_classifier_eval",
    "q_phash_near_dup",
    "q_kmeans_clusters",
    "q_cluster_balanced_sample",
    "q_embedding_outliers",
    "q_emb_simhash_pairs",
    # r5 additions: hybrid retrieval (BM25 + dense cosine fused by
    # RRF), margin-based bitext mining (dual exact kNN), and the
    # baseline-JPEG real-codec round-trip
    "q_hybrid_search",
    "q_bitext_mine",
    "q_jpeg_roundtrip",
    "q_line_dedup",
    "q_audio_features",
    "q_url_normalize",
    "q_domain_stats",
    # r6 additions: blocked-kNN bitext (the scale path — raw operator,
    # equality attested by the registry entry), PSL registered
    # domains, the per-domain cap, and the real resize round-trip
    "q_bitext_mine_blocked",
    "q_registered_domain_psl",
    "q_domain_cap",
    "q_resize_roundtrip",
    "q_html_extract",
    "q_outlink_domains",
    "q_web_pipeline",
    # r6 late additions: robots.txt decisions, Z-order keys, count-min
    # heavy hitters, Unicode hygiene, iterative BPE training
    "q_robots_decisions",
    "q_zorder_key",
    "q_countmin_hh",
    "q_unicode_nfc",
    "q_bpe_train",
    "q_sketch_rollup",
    "q_sentences",
    "q_gopher_flags",
    "q_pagerank_domains",
    "q_resample_gaps",
    "q_paragraph_dedup",
    "q_stream_attribution",
    "q_cidr_match",
    "q_series_outliers",
    # SCD Type 2: full history build over events + one batch fold
    "q_scd2_history",
    "q_scd2_apply",
    # declarative data-quality constraint report (shared-pass agg)
    "q_dq_report",
    # wide->long melt of per-status metrics
    "q_unpivot_metrics",
    # histograms: equi-width grid + equi-depth over the 60k-row CDF
    "q_hist_width",
    "q_hist_depth",
    # fuzzy entity matching: pigeonhole-blocked levenshtein pairs
    "q_fuzzy_pairs",
    # rolling stats + trend fit over the dense daily grid
    "q_rolling_daily",
    "q_trend_daily",
    # compact-forward triangle counting on the doc_id graph
    "q_triangles",
    # BPE train + encode end to end (vocab-cached merge fold)
    "q_bpe_encode",
    # entity resolution: fuzzy match -> CC -> golden-record fold
    "q_golden_record",
    # CDC net-effect fold (arg-max aggregation, no window)
    "q_cdc_apply",
    # first/last/linear attribution over user timelines
    "q_attribution",
    # top session-opening paths (gap sessions, ordered truncation)
    "q_session_paths",
    # A/B readouts: Welch + two-proportion z from exact moments
    "q_ab_welch",
    "q_ab_proportion",
    # fixed-round label propagation communities
    "q_label_propagation",
    # DDSketch quantile rollups with alpha-bound attestation
    "q_quantile_sketch",
    # TF-IDF keywords + brand revenue Pareto
    "q_tfidf_terms",
    "q_pareto_brands",
    # conversion-deadline funnel
    "q_funnel_windowed",
    # facts joined as-of their SCD2 dimension version
    "q_scd2_fact_join",
    # bucketed gaps-and-islands over the order-key sequence
    "q_sequence_gaps",
    # exact-threshold winsorized means
    "q_winsorized_means",
    # Apriori-pruned market-basket association rules
    "q_basket_rules",
    # RFM quintile segmentation (bucketed percent-rank tiles)
    "q_rfm_segments",
    # int8 scalar-quantized vector search
    "q_sq8_topk",
    # calendar spine + contingency chi-square
    "q_date_spine",
    "q_chi2_type_parity",
    # composed warehouse pipeline: CDC -> DQ -> Pareto
    "q_warehouse_pipeline",
    # calendar-true week-over-week deltas
    "q_week_over_week",
    # per-region supplier Pareto (partitioned windows)
    "q_pareto_region_suppliers",
    # k-anonymity suppression + Benford first-digit audit
    "q_suppressed_counts",
    "q_benford_prices",
    # pre-join key-skew diagnostic
    "q_skew_report",
    # one-scan column intake profile
    "q_profile_orders",
    # r7: incremental SCD2 fold (multi-ts micro-batch primitive) and
    # the persisted-IVF serving probe (raw: partition-pruned nprobe=3)
    "q_scd2_apply_changes",
    "q_ivf_index_topk",
    # r7: PSI distribution-drift report (grid-sized joins only)
    "q_psi_drift",
    # r7: manifest-log tx table — repeat walls measure the log-fold
    # read path (fixture arc builds once per SF, then is reused)
    "q_tx_merge_table",
    "q_tx_timetravel",
    # r8: the honest merge wall (fresh COW merge per repeat via
    # metadata-only restore reset), the restore arc's log-fold read,
    # the lifecycle read paths (change feed / zone-map skip / bloom
    # point probe), and the bulk IVF probe (raw: pruned nprobe=3)
    "q_tx_merge_raw",
    "q_tx_restore",
    "q_tx_changes",
    "q_tx_skip",
    "q_tx_point",
    "q_tx_compact",
    # r9: row-level change feed across the rewriting arc; zorder'd
    # partition-scoped compaction read path; deletion vectors — the
    # DV-masked read, the CDF delete emission, and the honest MOR
    # delete wall (fresh delete per repeat via restore reset)
    "q_tx_cdf",
    "q_tx_zorder",
    "q_tx_delete",
    "q_tx_dv_cdf",
    "q_tx_delete_raw",
    "q_tx_clone",
    "q_tx_update",
    "q_tx_rename",
    # r9 second wave: metadata-only stats (the wall is the log fold —
    # zero tasks), generated-column pruning read (base-column filter
    # prunes year partitions at the manifest), identity read path
    "q_tx_stats",
    "q_tx_generated",
    "q_tx_identity",
    "q_tx_evolve",
    "q_tx_respec",
    "q_ivf_batch_topk",
    # r10: commit-time change data — the pk-less feed read as a pure
    # scan of the persisted change files (no read-time join) — and
    # the pk-less blind-rewrite rendering (overwrite/restore as
    # delete-all+insert-all, join-free)
    "q_tx_cdc",
    "q_tx_ow_cdf",
    # r9: map-only FIM rewrite (fuses into the scan — the wall IS the scan)
    "q_fim",
    # composed end-to-end training-data pipeline (clean → dedup tiers
    # → near-dup canonical → quality/lang stats)
    "q_llm_pipeline",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from bi_utils_spark import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("bench")
    # Warm the JVM + the parquet reader code path (tiny table) so the
    # first timed query doesn't pay one-time datasource init.
    spark.range(1).count()
    from bi_utils_spark.sources.tables import load_table

    load_table(spark, sf_dir, "region").count()
    # Warm the Python worker pool (Arrow/pandas-UDF path): daemon +
    # worker startup + numpy/pandas import is one-time session init,
    # not per-query cost. A 1-row job spawns ONE worker; the media
    # queries fan out to every core, so r6's official best-of-3 still
    # caught 31 cold workers paying first-touch import on the first
    # fanned-out mapInPandas (q_jpeg_roundtrip 0.76 -> 7.98 s). Warm
    # one worker per core with the heavy imports done in-worker.
    ncores = spark.sparkContext.defaultParallelism

    def _warm(batches):
        import numpy  # noqa: F401 — first-touch import in the worker

        try:  # repo modules resolve via the shipped closure's path
            import bi_utils_spark.operators.multimodal  # noqa: F401
        except ImportError:
            pass
        yield from batches

    spark.range(ncores * 4, numPartitions=ncores).selectExpr(
        "CAST(id AS INT) AS x"
    ).mapInPandas(_warm, "x int").count()

    queries = entry_mod.queries()
    # Approximate operators are registered as oracle-backed summary
    # queries (approx + exact ground truth); bench the raw operator
    # alone so walls stay comparable across rounds.
    from bi_utils_spark.entry_queries import RAW_QUERIES

    queries.update(RAW_QUERIES)
    # Best-of-N per query (default 3): this box is a shared container
    # with bursty CPU contention — single-shot walls show 3-20x
    # outlier spikes on queries that are sub-second steady-state. The
    # min is the capability number; contention is not a plan property.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    timings: dict[str, float] = {}
    plans: dict[str, dict] = {}
    for name in BENCH_QUERIES:
        fn = queries[name]
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
            # operators persist intermediates (shingle rows,
            # signatures); drop them so no run is timed under a
            # previous run's cache
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
        # Plan fingerprint alongside the wall: shuffle count, physical
        # join strategies, and filters reaching the scans. Box noise
        # moves the wall; only a code change moves the fingerprint —
        # this is how a regression is separated from contention.
        try:
            from bi_utils_spark.plans import inspect as pi

            df = fn(spark, sf_dir)
            plans[name] = {
                "exchanges": pi.num_exchanges(df),
                "joins": pi.join_kinds(df),
                "pushed_filters": sum(
                    1 for p in pi.scan_pushed_filters(df) if p.strip()
                ),
            }
        except Exception as exc:  # noqa: BLE001 — metrics must not fail the bench
            plans[name] = {"error": str(exc)[:200]}
        spark.catalog.clearCache()
        print(f"  {name}: {timings[name]:.2f}s {plans[name]}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # The driver records only a ~2 KB tail of stdout. r3's and r6's
    # official records both came back `parsed: null` when the full
    # payload (plans in r3, the 129-entry per-query map in r6)
    # pushed the JSON line past the capture window. So: the FULL
    # per-query map and the plan fingerprints ride in sidecar files,
    # and the stdout line stays compact at ANY surface size — total,
    # query count, the 10 slowest walls, and the sidecar paths.
    here = os.path.dirname(os.path.abspath(__file__))
    plan_sidecar = os.path.join(here, "BENCH_PLANS.json")
    with open(plan_sidecar, "w") as fh:
        json.dump({"sf": sf, "repeats": repeats, "plans": plans}, fh, indent=1)
    query_sidecar = os.path.join(here, "BENCH_QUERIES.json")
    with open(query_sidecar, "w") as fh:
        json.dump(
            {"sf": sf, "repeats": repeats, "total_sec": total,
             "queries": timings},
            fh, indent=1,
        )
    print(f"  plan fingerprints -> {plan_sidecar}", file=sys.stderr)
    print(f"  per-query walls   -> {query_sidecar}", file=sys.stderr)
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "queries": slowest,
                "queries_file": "BENCH_QUERIES.json",
                "repeats": repeats,
                "sf": sf,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
