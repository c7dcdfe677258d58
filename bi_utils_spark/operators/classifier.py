"""Hashed-n-gram linear text classifier — the fastText-style quality
filter used to gate web-scale pretraining corpora (train a cheap
linear model on a curated positive set vs a random crawl sample, keep
documents the model scores as positive).

Construction is the public Naive-Bayes-log-odds recipe (the linear
baseline of Wang & Manning 2012 "Baselines and Bigrams"; the same
bag-of-hashed-ngrams representation as fastText, Joulin et al. 2016):

1. features: unigram + bigram occurrences hashed into a FIXED bucket
   space (operators/importance.py::hashed_feature_rows — md5-based,
   engine-portable);
2. per-bucket weight  w_b = ln p(b | pos) − ln p(b | neg)  with
   add-one smoothing over the bucket space (exactly
   importance.bucket_logratio — DSIR's log-ratio IS the NB weight
   vector when the two corpora are the class conditionals);
3. document logit = class-prior log-odds + Σ_occurrences w_bucket;
   label = logit > 0.

Scale shape: FIT is two feature-count aggregations whose shuffle key
space is ``num_buckets`` (4096) rows regardless of corpus size;
SCORING is one map-only pass — the weight table always broadcasts, so
a 100 TB corpus is classified without any vocab-sized shuffle. This
is why hashing matters: a real vocabulary (10⁸⁺ terms) would turn
every scoring run into a shuffle join.

Engine-portability: weights are 1e-7 fixed-point BIGINTs summed
exactly (operators/lm.py discipline), so logits are bit-identical in
Spark and the DuckDB oracle.

No reference counterpart; north-star LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bi_utils_spark.operators.importance import (
    _Q,
    _md5_bucket,
    bucket_logratio,
    bucket_logratio_labeled,
    feature_array,
    hashed_feature_rows,
)


def fit_nb_weights(
    pos_df: DataFrame,
    neg_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 4096,
) -> DataFrame:
    """(bucket, lr_q) Naive-Bayes log-odds weight table over ALL
    ``num_buckets`` buckets — ln((c⁺_b+1)/(T⁺+B)) − ln((c⁻_b+1)/
    (T⁻+B)), 1e-7-quantized. Delegates to
    :func:`importance.bucket_logratio` (same math, classifier
    framing): pos/neg each scanned once, output is B rows —
    broadcast-sized at any corpus scale. When both classes live in
    one frame, prefer :func:`fit_nb_weights_labeled` (single corpus
    pass)."""
    return bucket_logratio(pos_df, neg_df, id_col, text_col, num_buckets)


def fit_nb_weights_labeled(
    df: DataFrame,
    pos_cond: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 4096,
) -> DataFrame:
    """One-pass fit over a single labeled frame: rows matching
    ``pos_cond`` are the positive class, the rest negative. Identical
    weights to :func:`fit_nb_weights` on the two filtered halves, but
    the corpus feature stream is scanned once with conditional
    aggregation (importance.bucket_logratio_labeled) — the form to
    use at 100 TB."""
    return bucket_logratio_labeled(
        df, pos_cond, ~pos_cond, id_col, text_col, num_buckets
    )


def class_prior(pos_df: DataFrame, neg_df: DataFrame) -> DataFrame:
    """One-row (prior_q,) class-prior log-odds ln(N⁺/N⁻), quantized.
    Two count aggregates; broadcast into scoring."""
    np_ = pos_df.agg(F.count("*").alias("__np"))
    nn = neg_df.agg(F.count("*").alias("__nn"))
    return (
        np_.crossJoin(nn)
        .select(
            F.round(
                F.log(F.col("__np").cast("double") / F.col("__nn").cast("double"))
                * F.lit(_Q)
            )
            .cast("long")
            .alias("prior_q")
        )
    )


def classifier_scores(
    df: DataFrame,
    weights: DataFrame,
    prior: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 4096,
) -> DataFrame:
    """(id, n_feats, logit, label) — score every document with the
    fitted weight table. One map-only pass over the hashed feature
    stream (the ``num_buckets``-row weight table is forced broadcast),
    one groupBy(id) with map-side partials, then the optional one-row
    ``prior`` broadcast. logit is exact fixed-point; ``label`` is the
    sign decision (logit > 0)."""
    feats = hashed_feature_rows(df, id_col, text_col, num_buckets)
    scored = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy("id")
        .agg(F.count("*").alias("n_feats"), F.sum("lr_q").alias("__wq"))
    )
    if prior is not None:
        scored = scored.crossJoin(F.broadcast(prior)).withColumn(
            "__wq", F.col("__wq") + F.col("prior_q")
        )
    return scored.select(
        F.col("id").alias(id_col),
        "n_feats",
        (F.col("__wq").cast("double") / F.lit(_Q)).alias("logit"),
        (F.col("__wq") > 0).alias("label"),
    )


def collect_weights(
    weights: DataFrame, num_buckets: int | None = None
) -> list[int]:
    """Densified weight table → bucket-indexed list of lr_q BIGINTs —
    a BOUNDED driver fetch (exactly num_buckets rows, the IVF-centroid
    collect class) that turns scoring into a pure map expression.

    The feature-hash modulus IS the list length, so a sparse or
    truncated table would silently rehash every feature into the
    wrong bucket space. Pass ``num_buckets`` to pin it explicitly;
    otherwise the table must be DENSE (bucket_logratio emits all
    num_buckets rows) — a gap raises instead of scoring garbage."""
    out: dict[int, int] = {
        r["bucket"]: r["lr_q"] for r in weights.collect()
    }
    n = num_buckets if num_buckets is not None else (max(out) + 1 if out else 0)
    if len(out) != n or (out and max(out) + 1 != n):
        raise ValueError(
            f"weight table is not dense: {len(out)} rows for modulus {n} — "
            "a filtered/truncated table would silently change the feature "
            "hash space; pass the fit's num_buckets or use the full table"
        )
    return [out[b] for b in range(n)]


def inline_logit_q(
    text_col: str, wq: list[int], prior_q: int = 0
) -> Column:
    """Exact fixed-point classifier logit (1e-7 units) as a single
    Column expression: fold the unigram+bigram feature array against
    the literal weight table — no explode, no shuffle, no join. The
    per-document feature rows never materialize; the only state per
    row is the running BIGINT sum. Identical value to the join-based
    scoring (sum of the same integers).

    This is the 100 TB scoring path AND the streaming path: being a
    stateless expression it drops into readStream pipelines
    unchanged (streaming/classify.py)."""
    if not wq:
        raise ValueError("empty weight table — fit on a non-empty corpus")
    warr = F.lit([int(w) for w in wq])
    num_buckets = len(wq)
    return (
        F.aggregate(
            feature_array(text_col),
            F.lit(0).cast("long"),
            lambda acc, t: acc
            + F.element_at(
                warr, (_md5_bucket(t, num_buckets) + 1).cast("int")
            ),
        )
        + F.lit(int(prior_q)).cast("long")
    )


def classifier_scores_inline(
    df: DataFrame,
    weights: DataFrame,
    prior: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_feats, logit, label) — same contract, same ROW SET and
    exact same values as :func:`classifier_scores`, computed as one
    map-only pass: the weight table (and prior) are collected once
    (bounded: num_buckets rows / 1 row) and baked into the plan.
    Rows with no features (NULL or feature-less text) are dropped,
    matching the join scorer where the feature explode emits nothing
    for them — so downstream filters and confusion metrics see the
    identical row set either way. Zero exchanges over the scan; the
    preferred scoring form at scale and the only one usable on
    unbounded streams."""
    wq = collect_weights(weights)
    prior_q = int(prior.first()["prior_q"]) if prior is not None else 0
    lq = inline_logit_q(text_col, wq, prior_q)
    return df.select(
        F.col(id_col),
        F.size(feature_array(text_col)).cast("long").alias("n_feats"),
        (lq.cast("double") / F.lit(_Q)).alias("logit"),
        (lq > 0).alias("label"),
    ).filter(F.col("n_feats") > 0)


def filter_by_classifier(
    df: DataFrame,
    weights: DataFrame,
    prior: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 4096,
    threshold: float = 0.0,
) -> DataFrame:
    """Keep documents whose classifier logit exceeds ``threshold`` —
    the corpus-gating form. Input columns pass through; the scoring
    join keys on id only (scoring never re-reads the text twice)."""
    kept = (
        classifier_scores(df, weights, prior, id_col, text_col, num_buckets)
        .filter(F.col("logit") > threshold)
        .select(id_col)
    )
    return df.join(kept, id_col, "left_semi")


def save_classifier(
    weights: DataFrame, path: str, prior: DataFrame | None = None
) -> None:
    """Persist a fitted model (weight table + optional prior) as
    parquet — the train-once / serve-many lifecycle, same shape as
    pq.save_ivfpq. The weight table is ``num_buckets`` rows, so this
    is a trivially small artifact regardless of training-corpus
    size."""
    weights.write.mode("overwrite").parquet(f"{path}/weights")
    if prior is not None:
        prior.write.mode("overwrite").parquet(f"{path}/prior")


def load_classifier(
    spark, path: str
) -> tuple[DataFrame, DataFrame | None]:
    """(weights, prior_or_None) back from :func:`save_classifier` —
    feed straight into classifier_scores / collect_weights."""
    weights = spark.read.parquet(f"{path}/weights")
    try:
        prior = spark.read.parquet(f"{path}/prior")
    except Exception:  # noqa: BLE001 — prior is optional by contract
        prior = None
    return weights, prior


def classifier_confusion(
    scored: DataFrame, truth_col: str, label_col: str = "label"
) -> DataFrame:
    """One-row confusion summary (tp, fp, fn, tn, accuracy) of
    predicted ``label_col`` against boolean ``truth_col`` — the
    held-out evaluation step. A single aggregate pass; NULL truth
    rows are excluded (count toward neither class)."""
    t = F.col(truth_col)
    p = F.col(label_col)
    return scored.filter(t.isNotNull()).agg(
        F.sum((t & p).cast("long")).alias("tp"),
        F.sum((~t & p).cast("long")).alias("fp"),
        F.sum((t & ~p).cast("long")).alias("fn"),
        F.sum((~t & ~p).cast("long")).alias("tn"),
        (F.sum((t == p).cast("long")) / F.count("*")).alias("accuracy"),
    )


def classifier_metrics(
    scored: DataFrame, truth_col: str, label_col: str = "label"
) -> DataFrame:
    """One-row (tp, fp, fn, tn, accuracy, precision, recall, f1) —
    :func:`classifier_confusion` plus the derived rates. Degenerate
    denominators (no predicted / no actual positives) yield NULL
    rather than a fake 0.0."""
    c = classifier_confusion(scored, truth_col, label_col)
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    precision = F.when(tp + fp > 0, tp / (tp + fp))
    recall = F.when(tp + fn > 0, tp / (tp + fn))
    return c.select(
        "*",
        precision.alias("precision"),
        recall.alias("recall"),
        F.when(
            precision.isNotNull() & recall.isNotNull() & (precision + recall > 0),
            2 * precision * recall / (precision + recall),
        ).alias("f1"),
    )
