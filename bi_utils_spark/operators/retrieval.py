"""Hybrid retrieval — fuse lexical (BM25) and dense (embedding
cosine) candidate lists with Reciprocal Rank Fusion (RRF, Cormack,
Clarke & Büttcher 2009): rrf(d) = Σ_legs w / (k0 + rank_leg(d)).
The standard first stage of a RAG / retrieval pipeline: BM25 catches
exact-term matches dense retrieval misses, embeddings catch
paraphrases BM25 misses, and RRF needs no score calibration between
the two (ranks only).

Scale shape: each leg is already bounded — a TakeOrdered(depth) over
whatever scorer produced it (bm25_scores is a map-only scan +
TakeOrdered; cosine_topk is scan → project → TakeOrdered) — so
everything past the legs operates on ≤ legs·depth rows: the rank
windows sort ``depth`` rows (the bounded-window class documented in
lm.py — never corpus-sized), the fusion is a union + one tiny
groupBy, and the result is a TakeOrdered(k). The corpus is scanned
once per leg and never joined or shuffled.

Determinism: ranks order by (score DESC, id ASC); RRF contributions
are quantized to 1e-7 fixed point (round(w·1e7/(k0+rank)) summed as
BIGINT), so the fused score is bit-identical under any partitioning
and engine — the oracle replays the whole fusion in SQL. Feed legs
whose scores are themselves engine-portable (bm25_scores rounds;
round cosine to 9 digits as q_topk_cosine_exact does) and the final
ranking is too.

No reference counterpart; north-star LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_Q = 1e7


def ranked_topk(
    scored: DataFrame,
    depth: int,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """(id, rank) — the top-``depth`` rows of a scored frame, rank
    1-based by (score DESC, id ASC). TakeOrdered(depth) first, then a
    row_number over the surviving ≤ depth rows — the window is
    bounded by construction (depth, not corpus, rows; the lm.py
    bounded-window class)."""
    top = (
        scored.select(F.col(id_col), F.col(score_col))
        .orderBy(F.desc(score_col), F.asc(id_col))
        .limit(depth)
    )
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return top.select(
        F.col(id_col), F.row_number().over(w).cast("int").alias("rank")
    )


def rrf_fuse(
    rankings: dict[str, DataFrame],
    id_col: str = "doc_id",
    k0: int = 60,
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Fuse named (id, rank) lists: one row per id seen in ANY list
    with ``rrf_score`` = Σ w/(k0+rank) (1e-7 fixed point under the
    hood) and a nullable ``<name>_rank`` column per leg. Ids absent
    from a leg simply contribute nothing for it — RRF's native
    missing-data semantics, no outer-join NULL arithmetic."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if k0 < 1:
        raise ValueError(f"k0 must be >= 1, got {k0}")
    weights = weights or {}
    names = list(rankings)
    legs = []
    for name in names:
        w = float(weights.get(name, 1.0))
        legs.append(
            rankings[name].select(
                F.col(id_col),
                F.lit(name).alias("__leg"),
                F.col("rank"),
                F.round(F.lit(w * _Q) / (F.lit(k0) + F.col("rank")))
                .cast("long")
                .alias("__q"),
            )
        )
    allrows = legs[0]
    for leg in legs[1:]:
        allrows = allrows.unionByName(leg)
    agg = [
        (F.sum("__q").cast("double") / F.lit(_Q)).alias("rrf_score"),
        *[
            F.max(F.when(F.col("__leg") == n, F.col("rank")))
            .cast("int")
            .alias(f"{n}_rank")
            for n in names
        ],
    ]
    return allrows.groupBy(id_col).agg(*agg)


def hybrid_topk(
    scored_legs: dict[str, DataFrame],
    k: int = 10,
    depth: int = 50,
    id_col: str = "doc_id",
    k0: int = 60,
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Top-``k`` documents by RRF over named scored legs (each an
    (id, score) frame — e.g. {"bm25": bm25_scores(...), "dense":
    cosine-scored embeddings}). Each leg is cut to its top-``depth``
    before fusing (the standard fusion depth); final order is
    (rrf_score DESC, id ASC). One TakeOrdered per leg + one k-row
    TakeOrdered — no corpus joins, no corpus shuffles.

    Size contract: the fused set is ≤ depth·len(legs) rows by
    construction, so the fusion never sees corpus-scale data — the
    only BNLJ in a typical composition is the 1-row stats broadcast
    inside a bm25 leg (benign). ``depth`` is capped at 1_000_000 to
    keep that invariant loud: a bigger depth means the caller wants a
    full-corpus fusion, which should be a plain join on scores, not
    RRF."""
    if depth > 1_000_000:
        raise ValueError(
            f"hybrid_topk: depth={depth} exceeds 1_000_000 — RRF fusion "
            f"is for head-of-ranking sets (the fused input is "
            f"depth x n_legs rows). For full-corpus fusion join the "
            f"scored legs directly instead."
        )
    ranked = {
        name: ranked_topk(df, depth, id_col) for name, df in scored_legs.items()
    }
    fused = rrf_fuse(ranked, id_col, k0, weights)
    return fused.orderBy(F.desc("rrf_score"), F.asc(id_col)).limit(k)
