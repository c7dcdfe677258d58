"""Streaming classifier gate — the fitted quality classifier
(operators/classifier.py) applied to continuous ingest.

The inline scoring form is what makes this possible: the fitted
weight table collapses into a literal array inside one fold
expression (classifier.inline_logit_q), so scoring an unbounded
stream is a STATELESS map-only projection — no state store, no
watermark, no shuffle, fused into each micro-batch's source scan.
The join-based batch scorer could not run here (a stream-side
groupBy(id) would demand stateful aggregation for no reason).

Train-offline / serve-online with bit-exact parity: the stream
emits the SAME fixed-point logits as the oracle-checked batch query
(q_nb_classifier), so an admit decision made at ingest time can be
re-audited in batch and reproduce exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bi_utils_spark.operators.classifier import _Q, feature_array, inline_logit_q


def attach_classifier_scores(
    stream: DataFrame,
    wq: list[int],
    prior_q: int = 0,
    text_col: str = "text",
) -> DataFrame:
    """Add (n_feats, logit, label) from a fitted bucket-indexed weight
    list (classifier.collect_weights) — stateless, map-only. Same
    column contract as the batch scorers, so admitted batches re-audit
    directly."""
    lq = inline_logit_q(text_col, wq, prior_q)
    return (
        stream.withColumn(
            "n_feats", F.size(feature_array(text_col)).cast("long")
        )
        .withColumn("logit", lq.cast("double") / F.lit(_Q))
        .withColumn("label", F.col("logit") > 0)
    )


def classifier_gate(
    stream: DataFrame,
    wq: list[int],
    prior_q: int = 0,
    text_col: str = "text",
    threshold: float = 0.0,
) -> DataFrame:
    """Admit only documents with ≥ 1 feature that the classifier
    scores above ``threshold``. The zero-feature drop keeps stream/
    batch parity: the batch scorers emit NO row for feature-less
    (NULL/empty) text, so a gate that admitted them on prior mass
    alone would pass documents a batch re-audit cannot reproduce.
    Stateless — safe in append mode with no watermark; composes with
    the quality gate and streaming dedup downstream."""
    return attach_classifier_scores(stream, wq, prior_q, text_col).filter(
        (F.col("n_feats") > 0) & (F.col("logit") > threshold)
    )


def near_dedup_stream_embeddings(
    stream: DataFrame,
    ts_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    watermark: str = "60 minutes",
    salt: str = "esim",
) -> DataFrame:
    """Streaming NEAR-dedup for embedding ingest: sign each arriving
    vector (embsig.embedding_simhash — map-only, works on streams),
    then drop rows whose 64-bit signature was already admitted inside
    the watermark horizon (streaming/dedup.py's watermark-bounded
    state contract). Catches re-encodes and float-jitter re-deliveries
    that content-hash dedup misses — cosine-near vectors collide on
    the signature with probability (1 − θ/π)⁶⁴. State per key is the
    16-byte signature, bounded by rate × horizon; anything farther
    apart than the horizon belongs to the batch near-dup tiers."""
    from bi_utils_spark.operators.embsig import embedding_simhash
    from bi_utils_spark.streaming.dedup import dedup_stream_keys

    sigs = embedding_simhash(
        stream, id_col, vec_col, salt, keep_cols=(ts_col,)
    )
    return dedup_stream_keys(sigs, ["sig64"], ts_col, watermark)


def attach_cluster(
    stream: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Online topic tagging: assign each arriving embedding to its
    nearest k-means centroid (clustering.kmeans_assign — centroid
    literals in a map-only select, so it runs on unbounded streams
    with zero state). Train offline with kmeans_fit, tag online with
    bit-exact batch parity."""
    from bi_utils_spark.operators.clustering import kmeans_assign

    return kmeans_assign(stream, centroids, id_col, vec_col)
