"""operators/classifier.py — hashed NB linear classifier."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bi_utils_spark.operators.classifier import (
    class_prior,
    classifier_confusion,
    classifier_scores,
    filter_by_classifier,
    fit_nb_weights,
)


def _toy(spark):
    pos = spark.createDataFrame(
        [(1, "good clean prose here"), (2, "good solid prose text")],
        ["doc_id", "text"],
    )
    neg = spark.createDataFrame(
        [(3, "spam spam buy now"), (4, "buy spam click spam")],
        ["doc_id", "text"],
    )
    return pos, neg


def test_scores_separate_classes(spark):
    pos, neg = _toy(spark)
    w = fit_nb_weights(pos, neg, num_buckets=64)
    scored = classifier_scores(
        pos.union(neg), w, num_buckets=64
    ).collect()
    by_id = {r["doc_id"]: r for r in scored}
    # training docs must score on their own side of the boundary
    assert by_id[1]["logit"] > 0 and by_id[2]["logit"] > 0
    assert by_id[3]["logit"] < 0 and by_id[4]["logit"] < 0
    assert by_id[1]["label"] and not by_id[3]["label"]
    # n_feats = unigrams + bigrams = 4 + 3 occurrences
    assert by_id[1]["n_feats"] == 7


def test_class_prior_logodds(spark):
    pos, neg = _toy(spark)
    one = class_prior(pos, neg).first()["prior_q"]
    assert one == 0  # equal class sizes -> ln(1) = 0
    skew = class_prior(pos.union(neg), neg).first()["prior_q"]
    assert skew == round(math.log(2.0) * 1e7)


def test_prior_shifts_logit(spark):
    pos, neg = _toy(spark)
    w = fit_nb_weights(pos, neg, num_buckets=64)
    base = classifier_scores(pos, w, num_buckets=64)
    shifted = classifier_scores(
        pos, w, prior=class_prior(pos.union(pos), neg), num_buckets=64
    )
    b = {r["doc_id"]: r["logit"] for r in base.collect()}
    s = {r["doc_id"]: r["logit"] for r in shifted.collect()}
    for k in b:
        assert abs(s[k] - (b[k] + math.log(2.0))) < 1e-6


def test_filter_by_classifier_passthrough(spark):
    pos, neg = _toy(spark)
    w = fit_nb_weights(pos, neg, num_buckets=64)
    kept = filter_by_classifier(pos.union(neg), w, num_buckets=64)
    assert kept.columns == ["doc_id", "text"]
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2]


def test_confusion_counts_and_null_truth(spark):
    df = spark.createDataFrame(
        [
            (True, True),  # tp
            (True, False),  # fn
            (False, True),  # fp
            (False, False),  # tn
            (False, False),  # tn
            (None, True),  # excluded
        ],
        "truth boolean, label boolean",
    )
    row = classifier_confusion(df, "truth").first()
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (1, 1, 1, 2)
    assert abs(row["accuracy"] - 3 / 5) < 1e-12


def test_scoring_is_broadcast_map_only(spark):
    # the weight join must be a broadcast: no shuffle of the feature
    # stream by bucket
    pos, neg = _toy(spark)
    w = fit_nb_weights(pos, neg, num_buckets=64)
    plan = classifier_scores(
        pos.union(neg), w, num_buckets=64
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_labeled_fit_matches_two_frame(spark):
    from bi_utils_spark.operators.classifier import fit_nb_weights_labeled

    pos, neg = _toy(spark)
    both = pos.withColumn("y", F.lit(True)).union(
        neg.withColumn("y", F.lit(False))
    )
    two = fit_nb_weights(pos, neg, num_buckets=64)
    one = fit_nb_weights_labeled(both, F.col("y"), num_buckets=64)
    assert sorted(map(tuple, two.collect())) == sorted(map(tuple, one.collect()))


def test_classifier_metrics_rates(spark):
    from bi_utils_spark.operators.classifier import classifier_metrics

    df = spark.createDataFrame(
        [(True, True), (True, False), (False, True), (False, False)],
        "truth boolean, label boolean",
    )
    r = classifier_metrics(df, "truth").first()
    assert r["precision"] == 0.5 and r["recall"] == 0.5 and r["f1"] == 0.5
    # degenerate: nothing predicted positive -> precision NULL, f1 NULL
    neg = spark.createDataFrame(
        [(True, False), (False, False)], "truth boolean, label boolean"
    )
    r2 = classifier_metrics(neg, "truth").first()
    assert r2["precision"] is None and r2["f1"] is None
    assert r2["recall"] == 0.0


def test_inline_scoring_matches_join_scoring(spark):
    from bi_utils_spark.operators.classifier import classifier_scores_inline

    pos, neg = _toy(spark)
    both = pos.union(neg)
    w = fit_nb_weights(pos, neg, num_buckets=64)
    prior = class_prior(pos, neg.limit(1))
    a = classifier_scores(both, w, prior=prior, num_buckets=64)
    b = classifier_scores_inline(both, w, prior=prior)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_inline_scoring_null_text_row_set_parity(spark):
    """ADVICE r4: NULL / feature-less text must be dropped by BOTH
    scorers — the join form's explode emits nothing for them, so the
    inline form must not emit NULL-logit rows the join form lacks."""
    from bi_utils_spark.operators.classifier import classifier_scores_inline

    pos, neg = _toy(spark)
    w = fit_nb_weights(pos, neg, num_buckets=64)
    hostile = pos.union(
        spark.createDataFrame([(90, None), (91, "")], "doc_id long, text string")
    )
    a = classifier_scores(hostile, w, num_buckets=64)
    b = classifier_scores_inline(hostile, w)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert 90 not in {r["doc_id"] for r in b.collect()}  # NULL text dropped


def test_inline_scoring_zero_exchanges(spark):
    from bi_utils_spark.operators.classifier import classifier_scores_inline
    from bi_utils_spark.plans.inspect import num_exchanges

    pos, neg = _toy(spark)
    w = fit_nb_weights(pos, neg, num_buckets=64)
    assert num_exchanges(classifier_scores_inline(pos, w)) == 0


def test_sparse_weight_table_raises(spark):
    """ADVICE r4: the hash modulus is the table length — a filtered/
    truncated weight table must raise, not silently rehash every
    feature into a different bucket space."""
    import pytest

    from bi_utils_spark.operators.classifier import collect_weights

    pos, neg = _toy(spark)
    w = fit_nb_weights(pos, neg, num_buckets=64)
    assert len(collect_weights(w)) == 64
    assert len(collect_weights(w, num_buckets=64)) == 64
    with pytest.raises(ValueError, match="not dense"):
        collect_weights(w.filter(F.col("bucket") % 7 != 3))
    with pytest.raises(ValueError, match="not dense"):
        # prefix truncation is only detectable with the explicit modulus
        collect_weights(w.filter(F.col("bucket") < 32), num_buckets=64)
    # explicit modulus disagreeing with a dense table also raises
    with pytest.raises(ValueError, match="not dense"):
        collect_weights(w, num_buckets=128)


def test_sparse_logratio_table_raises_inline(spark):
    import pytest

    from bi_utils_spark.operators.importance import (
        bucket_logratio,
        importance_weights_inline,
    )

    pos, neg = _toy(spark)
    lr = bucket_logratio(pos, neg, num_buckets=64)
    with pytest.raises(ValueError, match="not dense"):
        importance_weights_inline(pos, lr.filter(F.col("bucket") % 7 != 3))


def test_save_load_classifier_roundtrip(spark, tmp_path):
    from bi_utils_spark.operators.classifier import (
        load_classifier,
        save_classifier,
    )

    pos, neg = _toy(spark)
    w = fit_nb_weights(pos, neg, num_buckets=64)
    prior = class_prior(pos.union(pos), neg)
    path = str(tmp_path / "model")
    save_classifier(w, path, prior)
    w2, prior2 = load_classifier(spark, path)
    a = classifier_scores(pos, w, prior=prior, num_buckets=64)
    b = classifier_scores(pos, w2, prior=prior2, num_buckets=64)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # prior is optional
    save_classifier(w, str(tmp_path / "m2"))
    _, none_prior = load_classifier(spark, str(tmp_path / "m2"))
    assert none_prior is None
