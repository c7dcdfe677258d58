"""Sequence packing: batch documents into fixed token-budget bins.

The last mile of a pretraining-data pipeline: after cleaning, dedup,
and splitting, documents are concatenated into training sequences of
at most ``max_tokens`` tokens, minimizing padding waste. Exact global
first-fit-decreasing (FFD) is inherently sequential, so the scale
construction is: hash documents into independent buckets sized for
one executor each, and run FFD inside each bucket with an
Arrow-batched applyInPandas. Packing quality is bucket-local FFD —
within ~1% of global FFD once buckets hold thousands of docs (bin
waste concentrates in the tail bin of each bucket).

Scale: one shuffle on the bucket key; bucket count scales with the
corpus (aim ~10⁴–10⁵ docs per bucket); the packer is O(n log n) per
bucket with a bins list bounded by bucket token mass / max_tokens.
Deterministic: bucket = xxhash64(id), order inside = (tokens desc,
id), so re-runs pack identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    max_tokens: int = 2048,
    num_buckets: int = 32,
) -> DataFrame:
    """(seq_id, doc_ids, n_docs, total_tokens) — every doc in exactly
    one sequence, no sequence over ``max_tokens``. Docs individually
    longer than the budget get a dedicated oversize sequence (marked
    by total_tokens > max_tokens) — chunk/truncate upstream at the
    tokenizer if that is not acceptable.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    src = df.select(
        F.col(id_col).alias("id").cast("long"),
        F.col(token_count_col).alias("n").cast("long"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_buckets)).alias("bucket"),
    )
    schema = StructType(
        [
            StructField("seq_id", LongType(), False),
            StructField("doc_ids", ArrayType(LongType(), False), False),
            StructField("n_docs", LongType(), False),
            StructField("total_tokens", LongType(), False),
        ]
    )

    def pack(key, pdf):
        import pandas as pd

        bucket = int(key[0])
        rows = sorted(
            zip(pdf["id"].tolist(), pdf["n"].tolist()),
            key=lambda t: (-t[1], t[0]),
        )
        bins: list[tuple[int, list[int]]] = []  # (remaining, ids)
        for doc_id, n in rows:
            placed = False
            if n <= max_tokens:
                for i, (rem, ids) in enumerate(bins):
                    if n <= rem:
                        bins[i] = (rem - n, ids + [doc_id])
                        placed = True
                        break
            if not placed:
                bins.append((max_tokens - n, [doc_id]))
        return pd.DataFrame(
            {
                "seq_id": [bucket * 1_000_000_000 + i for i in range(len(bins))],
                "doc_ids": [ids for _, ids in bins],
                "n_docs": [len(ids) for _, ids in bins],
                "total_tokens": [max_tokens - rem for rem, _ in bins],
            }
        )

    return src.groupBy("bucket").applyInPandas(pack, schema=schema)


def packing_stats(packed: DataFrame, max_tokens: int) -> DataFrame:
    """One-row efficiency report: sequences, docs, fill ratio, and the
    count of oversize sequences (single docs above the budget)."""
    return packed.agg(
        F.count("*").alias("n_sequences"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("total_tokens").alias("total_tokens"),
        (
            F.sum(F.least("total_tokens", F.lit(max_tokens)))
            / (F.count("*") * max_tokens)
        ).alias("fill_ratio"),
        F.sum((F.col("total_tokens") > max_tokens).cast("long")).alias("n_oversize"),
    )
