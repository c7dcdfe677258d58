"""Keyword search / relevance ranking over a document corpus — BM25
(Robertson–Spärck Jones probabilistic model, the Okapi BM25 form) as
native Spark SQL expressions.

Shape at 100 TB:
- corpus statistics (N, avgdl, per-term document frequency) are ONE
  aggregate pass producing a single row — broadcast back to the
  scoring projection, so scoring is map-side over the document scan
  with zero shuffle of document data;
- per-term term frequencies are codegen'd ``size(filter(tokens))``
  expressions — no explode of the token stream (the classic
  explode+groupBy inverted-index build shuffles ~corpus-size rows;
  for a FIXED query, scoring needs none of it);
- for repeated ad-hoc queries at scale, materialize an inverted
  index once (explode → (term, doc, tf) table bucketed by term) and
  score by joining the query terms against it; this module's direct
  path is the one-shot / streaming-friendly form.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bi_utils_spark.operators.textstats import tokens


def bm25_scores(
    df: DataFrame,
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 6,
    max_query_terms: int = 256,
) -> DataFrame:
    """(doc_id, score) for every document matching ≥ 1 query term.

    score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln((N − df_t + 0.5)/(df_t + 0.5) + 1)  (the non-negative
    Lucene variant). Returning the full match set (tf > 0 is an
    integer property) keeps the result deterministic across engines;
    rank with :func:`bm25_topk` when only the head is needed.

    Size contract: this direct path compiles ONE tf expression + one
    broadcast stat per distinct term (the 1-row stats broadcast is
    the plan's benign BroadcastNestedLoopJoin), so its cost is linear
    in the term count and it is meant for ad-hoc queries, not bulk
    term sets. ``max_query_terms`` (default 256) raises with guidance
    toward :func:`bm25_from_index` — which touches only the queried
    terms' postings of a prebuilt index — instead of compiling a
    multi-thousand-column plan.
    """
    terms = list(dict.fromkeys(w.lower() for w in query_terms))
    if len(terms) > max_query_terms:
        raise ValueError(
            f"bm25_scores: {len(terms)} distinct query terms exceeds "
            f"max_query_terms={max_query_terms} — the direct path "
            f"compiles one expression per term and is for ad-hoc "
            f"queries. Build an inverted index once "
            f"(ranking.build_inverted_index) and score with "
            f"ranking.bm25_from_index, or raise max_query_terms if the "
            f"plan size is genuinely acceptable."
        )
    staged = df.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("__t")
    )
    tf_cols = [
        F.size(F.filter(F.col("__t"), lambda x: x == F.lit(t))).alias(f"__tf{i}")
        for i, t in enumerate(terms)
    ]
    base = staged.select("doc_id", F.size("__t").alias("__dl"), *tf_cols)
    stats = base.agg(
        F.count("*").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
            for i in range(len(terms))
        ],
    )
    joined = base.crossJoin(F.broadcast(stats))
    norm = F.lit(1.0) - F.lit(b) + F.lit(b) * (
        F.col("__dl").cast("double") / F.col("__avgdl")
    )
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"__tf{i}").cast("double")
        idf = F.log(
            (F.col("__n").cast("double") - F.col(f"__df{i}") + 0.5)
            / (F.col(f"__df{i}") + 0.5)
            + 1.0
        )
        score = score + idf * tf * (k1 + 1.0) / (tf + F.lit(k1) * norm)
    tfs = [F.col(f"__tf{i}") for i in range(len(terms))]
    matched = (F.greatest(*tfs) if len(tfs) > 1 else tfs[0]) > 0
    return joined.filter(matched).select(
        "doc_id", F.round(score, round_digits).alias("score")
    )


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> DataFrame:
    """Top-k matches by BM25 (TakeOrdered — no full sort), ties broken
    by doc id for determinism."""
    scored = bm25_scores(df, query_terms, id_col, text_col, **kwargs)
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def build_inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Build the repeated-query search structures ONCE:
    ``(postings, doc_stats)``.

    postings = (term, doc_id, tf) — the classic inverted index as a
    table; doc_stats = one row (n_docs, avgdl). Write postings out
    bucketed/partitioned by term so each query's term lookup becomes
    partition pruning instead of a corpus scan; per-term document
    frequencies are a groupBy away and are computed inside
    :func:`bm25_from_index` for exactly the queried terms only.

    Scale: the build shuffles the token stream once ((term, doc)
    grouping) — the cost the direct :func:`bm25_scores` path avoids
    for one-shot queries and the index amortizes over many.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("__t")
    )
    doc_stats = toks.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.size("__t")).alias("avgdl"),
    )
    postings = (
        toks.select(
            "doc_id",
            F.size("__t").alias("dl"),
            F.explode("__t").alias("term"),
        )
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").alias("tf"))
    )
    return postings, doc_stats


def bm25_from_index(
    postings: DataFrame,
    doc_stats: DataFrame,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 6,
) -> DataFrame:
    """(doc_id, score) from a prebuilt inverted index — the same
    match set as :func:`bm25_scores` with scores equal up to float
    summation order (per-term rows are summed by an aggregate here
    vs a fixed-order expression there; tested to 1e-9), and per query
    it touches only the queried terms' postings (partition pruning on
    a term-partitioned index) instead of re-tokenizing the corpus.
    """
    terms = list(dict.fromkeys(w.lower() for w in query_terms))
    hits = postings.filter(F.col("term").isin(terms))
    dfreq = hits.groupBy("term").agg(F.countDistinct("doc_id").alias("df_t"))
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(doc_stats))
    )
    norm = F.lit(1.0) - F.lit(b) + F.lit(b) * (
        F.col("dl").cast("double") / F.col("avgdl")
    )
    tf = F.col("tf").cast("double")
    idf = F.log(
        (F.col("n_docs").cast("double") - F.col("df_t") + 0.5)
        / (F.col("df_t") + 0.5)
        + 1.0
    )
    per_term = scored.select(
        "doc_id",
        (idf * tf * (k1 + 1.0) / (tf + F.lit(k1) * norm)).alias("__s"),
    )
    return per_term.groupBy("doc_id").agg(
        F.round(F.sum("__s"), round_digits).alias("score")
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF (X90) —
    keyword extraction for corpus exploration and weak labeling.

    Scoring is the fixed-point discipline (importance.py): idf_q =
    floor(1e7 · ln((N+1)/(df+1)) ) + 1e7 (smooth idf, quantized to
    an exact BIGINT), score_q = tf · idf_q — integer products, so
    the per-doc (score desc, term asc) ranking is deterministic and
    engine-replayable.

    Scale shape: tf is one (doc, term) groupBy over the token
    stream; df/idf live in a VOCAB-sized table (broadcast to the
    scoring join at any corpus size); the top-k window partitions
    by doc over each doc's own distinct terms.
    """
    from pyspark.sql import Window

    from bi_utils_spark.operators.textstats import tokens

    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens(F.col(text_col))).alias("__t"),
    ).where(F.col("__t") != "")
    tf = toks.groupBy("__id", "__t").agg(
        F.count(F.lit(1)).alias("tf")
    )
    n_docs = df.select(
        F.countDistinct(id_col).alias("__n")
    )
    dfreq = tf.groupBy("__t").agg(
        F.count(F.lit(1)).alias("__df")
    )
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "__t",
        (
            F.floor(
                10_000_000.0
                * F.log(
                    (F.col("__n") + 1).cast("double")
                    / (F.col("__df") + 1).cast("double")
                )
            ).cast("long")
            + 10_000_000
        ).alias("__idf_q"),
    )
    scored = tf.join(F.broadcast(idf), "__t").select(
        "__id",
        "__t",
        "tf",
        (F.col("tf") * F.col("__idf_q")).alias("__score_q"),
    )
    w = Window.partitionBy("__id").orderBy(
        F.desc("__score_q"), F.asc("__t")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(
            F.col("__id").alias(id_col),
            F.col("__rn").alias("rank"),
            F.col("__t").alias("term"),
            "tf",
            (F.col("__score_q").cast("double") / 1e7).alias("tfidf"),
        )
    )
