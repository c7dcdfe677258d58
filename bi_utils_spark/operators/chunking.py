"""Document chunking — overlapping token windows for LLM ingestion.

The standard preprocessing step between cleaning and tokenization:
long documents become fixed-budget chunks with an overlap so no
context is lost at boundaries. Entirely codegen (split + transform +
slice + explode): a map-side projection that fuses into the document
scan — zero shuffles at any corpus size, the same shape as
``textstats``.

Chunk math (for ``chunk_tokens`` C, ``overlap`` V, step S = C − V,
doc length n): windows start at 0, S, 2S, …; the number of chunks is
``max(ceil((n − V) / S), 1)`` so the final window always covers the
tail and every token belongs to ≥ 1 chunk. Deterministic chunk ids =
(doc_id, chunk_idx).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bi_utils_spark.operators.textstats import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """One row per (doc, chunk): (doc_id, chunk_idx, n_doc_tokens,
    n_chunk_tokens, chunk_text). Whitespace-token windows rejoined
    with single spaces (the downstream tokenizer re-splits anyway).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    staged = df.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("__toks")
    )
    n = F.size("__toks")
    n_chunks = F.greatest(
        ((n - F.lit(overlap) + F.lit(step - 1)) / F.lit(step)).cast("int"),
        F.lit(1),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.array_join(
                F.slice(F.col("__toks"), i * step + 1, chunk_tokens), " "
            ).alias("chunk_text"),
            F.least(n - i * step, F.lit(chunk_tokens)).alias("n_chunk_tokens"),
        ),
    )
    return staged.select(
        "doc_id",
        n.alias("n_doc_tokens"),
        F.explode(chunks).alias("__c"),
    ).select(
        "doc_id",
        F.col("__c.chunk_idx").alias("chunk_idx"),
        "n_doc_tokens",
        F.col("__c.n_chunk_tokens").alias("n_chunk_tokens"),
        F.col("__c.chunk_text").alias("chunk_text"),
    )


def chunking_stats(chunked: DataFrame) -> DataFrame:
    """One-row conservation panel over a chunked frame (the
    q_pack_conservation pattern): chunk counts and token coverage
    that an oracle recomputes exactly from the raw documents."""
    return chunked.agg(
        F.count("*").alias("n_chunks"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("n_chunk_tokens").alias("total_chunk_tokens"),
        F.max("n_chunk_tokens").alias("max_chunk_tokens"),
    )
