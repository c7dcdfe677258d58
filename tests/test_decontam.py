"""Decontamination / duplicated-span operators (operators/decontam.py):
exact semantics on constructed corpora plus plan-shape assertions
(benchmark side broadcast, no pair enumeration)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bi_utils_spark.operators import decontam as X
from bi_utils_spark.plans import inspect as pi


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_ngram_rows_count_and_short_doc_contract(spark):
    df = _docs(spark, [(1, "a b c d e"), (2, "a b"), (3, "x y z")])
    out = X.ngram_hash_rows(df, "doc_id", "text", 3)
    per = {r["id"]: r["n"] for r in out.groupBy("id").agg(F.count("*").alias("n")).collect()}
    # 5 tokens -> 3 trigrams; 2 tokens -> none (shorter than n); 3 -> 1
    assert per == {1: 3, 3: 1}


def test_ngram_hash_equality_matches_gram_identity(spark):
    # same trigram in two docs hashes identically; different grams differ
    df = _docs(spark, [(1, "p q r s"), (2, "z p q r")])
    rows = X.ngram_hash_rows(df, "doc_id", "text", 3)
    shared = (
        rows.groupBy("sh").agg(F.countDistinct("id").alias("d")).filter("d = 2")
    )
    assert shared.count() == 1  # exactly "p q r"


def test_contamination_report_counts(spark):
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text about spark plans here"),
            (3, "tiny"),
        ],
    )
    bench = _docs(spark, [(100, "quick brown fox jumps high")])
    rep = X.contamination_report(corpus, bench, "doc_id", "text", n=3)
    got = {r["doc_id"]: r for r in rep.collect()}
    # doc 1: 9 tokens -> 7 trigrams, shares "quick brown fox" and
    # "brown fox jumps" with the benchmark
    assert got[1]["n_shared"] == 2 and got[1]["n_ngrams"] == 7
    assert abs(got[1]["contamination"] - 2 / 7) < 1e-12
    assert got[2]["n_shared"] == 0
    assert 3 not in got  # shorter than n: no row


def test_decontaminate_drops_flagged_keeps_short(spark):
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text about spark plans here"),
            (3, "ti ny"),
        ],
    )
    bench = _docs(spark, [(100, "quick brown fox jumps high")])
    kept = X.decontaminate(corpus, bench, "doc_id", "text", n=3, max_shared=0)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]
    # threshold above the overlap keeps everything
    kept2 = X.decontaminate(corpus, bench, "doc_id", "text", n=3, max_shared=2)
    assert kept2.count() == 3


def test_contamination_benchmark_is_broadcast(spark):
    corpus = _docs(spark, [(1, "a b c d e f g h")])
    bench = _docs(spark, [(2, "a b c")])
    rep = X.contamination_report(corpus, bench, "doc_id", "text", n=3)
    kinds = pi.join_kinds(rep)
    assert any("Broadcast" in k for k in kinds), kinds
    assert not any("NestedLoop" in k and "Broadcast" not in k for k in kinds)


def test_duplicated_span_stats_exact(spark):
    df = _docs(
        spark,
        [
            (1, "a b c d e"),   # trigrams: abc bcd cde
            (2, "x a b c y"),   # trigrams: xab abc bcy
            (3, "u v w"),       # trigram uvw, unique
        ],
    )
    out = {r["doc_id"]: r for r in X.duplicated_span_stats(df, "doc_id", "text", k=3).collect()}
    assert out[1]["n_spans"] == 3 and out[1]["n_dup_spans"] == 1
    assert out[2]["n_spans"] == 3 and out[2]["n_dup_spans"] == 1
    assert out[3]["n_spans"] == 1 and out[3]["n_dup_spans"] == 0
    assert abs(out[1]["dup_frac"] - 1 / 3) < 1e-12


def test_duplicated_span_stats_ignores_within_doc_repeats(spark):
    # "a b c" appears twice in doc 1 but in no other doc: doc frequency
    # is 1, so its positions are NOT duplicated spans
    df = _docs(spark, [(1, "a b c a b c"), (2, "q r s")])
    out = {r["doc_id"]: r for r in X.duplicated_span_stats(df, "doc_id", "text", k=3).collect()}
    assert out[1]["n_dup_spans"] == 0


def test_decontam_no_pair_join_shape(spark):
    # the span-stats plan must never enumerate doc pairs: no join on a
    # per-doc key against itself — joins are gram-keyed only, and the
    # number of exchanges stays bounded (window + df agg + join + agg)
    df = _docs(spark, [(i, f"t{i} a b c d") for i in range(20)])
    out = X.duplicated_span_stats(df, "doc_id", "text", k=3)
    assert pi.num_exchanges(out) <= 6, pi.executed_plan(out)


def test_remove_duplicated_spans_exact(spark):
    # "c1 c2 c3" is the shared trigram; with k=3 it covers tokens
    # c1..c3 in both docs; doc 3 is untouched; doc 4 is shorter than k
    df = _docs(
        spark,
        [
            (1, "u1 u2 c1 c2 c3 u3"),
            (2, "c1 c2 c3 w1 w2"),
            (3, "x1 x2 x3 x4"),
            (4, "s1 s2"),
        ],
    )
    got = {
        r["doc_id"]: r
        for r in X.remove_duplicated_spans(df, "doc_id", "text", k=3).collect()
    }
    assert got[1]["text_deduped"] == "u1 u2 u3"
    assert (got[1]["n_tokens"], got[1]["n_removed"]) == (6, 3)
    assert got[2]["text_deduped"] == "w1 w2"
    assert got[3]["text_deduped"] == "x1 x2 x3 x4"
    assert got[3]["n_removed"] == 0
    assert got[4]["text_deduped"] == "s1 s2"  # < k tokens: untouched


def test_remove_duplicated_spans_full_coverage_empty(spark):
    df = _docs(spark, [(1, "a b c"), (2, "a b c")])
    got = {
        r["doc_id"]: r
        for r in X.remove_duplicated_spans(df, "doc_id", "text", k=3).collect()
    }
    assert got[1]["text_deduped"] == "" and got[1]["n_removed"] == 3
    assert got[2]["text_deduped"] == ""


def test_remove_duplicated_spans_within_doc_repeat_kept(spark):
    # the trigram repeats WITHIN one doc only -> doc frequency 1 -> kept
    df = _docs(spark, [(1, "a b c a b c"), (2, "q r s t")])
    got = X.remove_duplicated_spans(df, "doc_id", "text", k=3).collect()
    by = {r["doc_id"]: r for r in got}
    assert by[1]["n_removed"] == 0


def test_top_duplicated_grams(spark):
    df = _docs(
        spark,
        [
            (1, "the same header text one"),
            (2, "the same header text two"),
            (3, "the same header text three"),
            (4, "entirely different body here"),
        ],
    )
    got = X.top_duplicated_grams(df, "doc_id", "text", k=4, top=5).collect()
    assert got[0]["gram"] == "the same header text" and got[0]["n_docs"] == 3
    # singletons (n_docs < 2) never appear
    assert all(r["n_docs"] >= 2 for r in got)


# --- semantic (embedding-tier) decontamination ----------------------------


def test_semantic_contamination_finds_exact_copy(spark):
    from bi_utils_spark.operators.decontam import (
        semantic_contamination_pairs,
        semantic_decontaminate,
    )

    v1 = [1.0, 0.0, 0.0]
    v2 = [0.0, 1.0, 0.0]
    corpus = spark.createDataFrame(
        [(1, v1), (2, v2)], ["vec_id", "embedding"]
    )
    bench = spark.createDataFrame([(100, v1)], ["vec_id", "embedding"])
    hits = semantic_contamination_pairs(corpus, bench, threshold=0.9).collect()
    assert [(r["corpus_id"], r["bench_id"]) for r in hits] == [(1, 100)]
    assert hits[0]["score"] == 1.0
    kept = semantic_decontaminate(corpus, bench, threshold=0.9)
    assert [r["vec_id"] for r in kept.collect()] == [2]


def test_semantic_contamination_broadcast_plan(spark, sf_dir):
    # the corpus side must not shuffle: benchmark broadcast, BNLJ only
    from bi_utils_spark.operators.decontam import semantic_contamination_pairs
    from bi_utils_spark.plans.inspect import join_kinds, num_exchanges
    from bi_utils_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = semantic_contamination_pairs(
        emb.filter(F.col("vec_id") % 10 != 0),
        emb.filter(F.col("vec_id") % 10 == 0),
        threshold=0.45,
    )
    kinds = join_kinds(pairs)
    assert any("BroadcastNestedLoopJoin" in k for k in kinds)
    assert num_exchanges(pairs) <= 1  # the broadcast side only
