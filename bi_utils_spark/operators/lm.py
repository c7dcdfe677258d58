"""Corpus language-model scoring — the CCNet/Gopher-style quality
signal: score every document by its average token log-probability
under a unigram model of the corpus itself (gibberish, boilerplate
and OCR noise score low; fluent text scores near the corpus mode).

Shape at 100 TB:
- the model is one explode + groupBy over the token stream (the same
  shuffle an inverted-index build pays) producing |vocab| rows —
  small enough to broadcast for the scoring join;
- scoring joins each token against the model and aggregates per doc.
  Per-token log-probs are quantized to fixed point (round(x·1e7) as
  BIGINT) before summing, so document scores are bit-identical under
  any row order or partitioning — the property the hash-exact oracle
  gate needs (same trick as similarity.centroid_dims).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bi_utils_spark.operators.textstats import tokens


def unigram_model(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, c) corpus token counts — the unigram model table."""
    return (
        df.select(F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )


def unigram_logprob_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    model: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, avg_logprob) with add-one smoothing:
    logp(t) = ln((c_t + 1) / (total + |V|)). ``model`` defaults to a
    model of ``df`` itself (self-scoring, the CCNet setup); pass a
    reference-corpus model to score a candidate set against clean
    text instead."""
    if model is None:
        model = unigram_model(df, id_col, text_col)
    consts = model.agg(
        F.sum("c").alias("total"), F.count("*").alias("v")
    )
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term")
    )
    logp = F.log(
        (F.col("c").cast("double") + 1.0)
        / (F.col("total") + F.col("v")).cast("double")
    )
    # unseen terms (cross-corpus scoring): c -> 0
    scored = (
        toks.join(F.broadcast(model), "term", "left")
        .crossJoin(F.broadcast(consts))
        .select(
            "doc_id",
            F.round(
                F.when(F.col("c").isNull(),
                       F.log(F.lit(1.0) / (F.col("total") + F.col("v")).cast("double")))
                .otherwise(logp)
                * 1e7
            )
            .cast("long")
            .alias("__q"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        (
            (F.sum("__q").cast("double") / F.lit(1e7)) / F.count("*")
        ).alias("avg_logprob"),
    )


def top_vocab(model: DataFrame, v: int) -> DataFrame:
    """Top-``v`` terms of a unigram model by count (ties broken by
    term, so the vocabulary is deterministic and engine-portable) —
    TakeOrdered over the |corpus vocab| model rows, never the token
    stream."""
    return model.orderBy(F.desc("c"), F.asc("term")).limit(v)


def oov_rate(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, n_oov, oov_rate) — the fraction of each
    document's tokens outside a fixed vocabulary. The tokenizer-fit
    signal used to triage corpora before subword training: high OOV
    flags encoding damage, the wrong language, or gibberish that
    per-token quality heuristics miss.

    Scale: the vocabulary (top-V of a unigram model — bounded by
    construction) broadcasts; the token stream is probed map-side and
    one groupBy(id) aggregates — the same one-shuffle shape as
    unigram scoring."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term")
    )
    flagged = toks.join(
        F.broadcast(vocab.select("term").withColumn("__in", F.lit(1))),
        "term",
        "left",
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0)).alias("n_oov"),
        (
            F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0)).cast("double")
            / F.count("*")
        ).alias("oov_rate"),
    )


def term_ranks(model: DataFrame) -> DataFrame:
    """(term, c, rank) — Zipf rank table of a unigram model, rank 1 =
    most frequent, ties broken by term so the ranking is total and
    engine-portable.

    Scale: one window over the MODEL (|vocab| rows), never the token
    stream; the single-partition window is fine up to ~10⁸ vocab rows
    — beyond that, rank via sort + zipWithIndex-style shard offsets.
    """
    w = Window.orderBy(F.desc("c"), F.asc("term"))
    return model.select("term", "c", F.row_number().over(w).alias("rank"))


def head_coverage(model: DataFrame, k: int) -> DataFrame:
    """One row (k, head_tokens, total_tokens, coverage): the fraction
    of all token OCCURRENCES covered by the ``k`` most frequent
    terms — the Zipf-head diagnostic that sizes a tokenizer
    vocabulary (coverage(k) flattening ⇒ bigger V buys nothing).

    Scale: aggregates the model table (|vocab| rows), not the corpus;
    the top-k head is a TakeOrdered inside the same plan.
    """
    head = top_vocab(model, k)
    tot = model.agg(F.sum("c").alias("total_tokens"))
    return (
        head.agg(F.sum("c").alias("head_tokens"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.lit(k).alias("k"),
            "head_tokens",
            "total_tokens",
            (
                F.col("head_tokens").cast("double")
                / F.col("total_tokens").cast("double")
            ).alias("coverage"),
        )
    )
