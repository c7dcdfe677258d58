"""Tests for document chunking (operators/chunking.py)."""

from __future__ import annotations

import pytest

from bi_utils_spark.operators.chunking import chunk_documents, chunking_stats


def test_chunk_windows_exact(spark):
    # 10 tokens, C=4, V=1 -> step 3 -> ceil(9/3)=3 chunks:
    # [t0..t3], [t3..t6], [t6..t9]  wait: starts 0,3,6 cover 0-3,3-6,6-9
    text = "a b c d e f g h i j"
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, chunk_tokens=4, overlap=1).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [r["chunk_text"] for r in rows] == [
        "a b c d", "d e f g", "g h i j",
    ]
    assert [r["n_chunk_tokens"] for r in rows] == [4, 4, 4]
    assert all(r["n_doc_tokens"] == 10 for r in rows)


def test_chunk_tail_window_covers_remainder(spark):
    # 6 tokens, C=4, V=1 -> step 3 -> ceil(5/3)=2 chunks; tail is short
    df = spark.createDataFrame([(1, "a b c d e f")], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, chunk_tokens=4, overlap=1).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [r["chunk_text"] for r in rows] == ["a b c d", "d e f"]
    assert [r["n_chunk_tokens"] for r in rows] == [4, 3]


def test_chunk_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "one two")], ["doc_id", "text"])
    rows = chunk_documents(df, chunk_tokens=128, overlap=16).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_idx"] == 0 and rows[0]["chunk_text"] == "one two"


def test_chunk_every_token_covered(spark, sf_dir):
    # conservation: with step S, chunk i covers tokens [i*S, i*S+C);
    # union over chunks must be [0, n) — equivalently the sum of chunk
    # sizes equals n + (n_chunks - 1) * overlap
    from bi_utils_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").limit(50)
    ch = chunk_documents(docs, chunk_tokens=64, overlap=8)
    per_doc = ch.groupBy("doc_id", "n_doc_tokens").agg(
        F.count("*").alias("k"), F.sum("n_chunk_tokens").alias("s")
    )
    bad = per_doc.filter(
        F.col("s") != F.col("n_doc_tokens") + (F.col("k") - 1) * 8
    ).count()
    assert bad == 0


def test_chunk_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_chunking_stats(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x y")], ["doc_id", "text"]
    )
    row = chunking_stats(chunk_documents(df, chunk_tokens=4, overlap=1)).first()
    assert row["n_docs"] == 2 and row["n_chunks"] == 3
    assert row["max_chunk_tokens"] == 4
