"""Sequence packing (operators/packing.py)."""

import pytest
from pyspark.sql import functions as F

from bi_utils_spark.operators.packing import pack_sequences, packing_stats


@pytest.fixture()
def docs(spark):
    # token counts 1..400, ids 0..399
    return spark.range(400).select(
        F.col("id").alias("doc_id"), (F.col("id") + 1).alias("n_toks")
    )


def test_every_doc_packed_once_no_overflow(spark, docs):
    packed = pack_sequences(docs, "doc_id", "n_toks", max_tokens=512, num_buckets=8)
    rows = packed.collect()
    all_ids = [i for r in rows for i in r["doc_ids"]]
    assert sorted(all_ids) == list(range(400))            # exactly once
    for r in rows:
        assert r["total_tokens"] <= 512
        assert r["n_docs"] == len(r["doc_ids"])


def test_oversize_docs_get_own_sequence(spark):
    df = spark.createDataFrame(
        [(1, 5000), (2, 100), (3, 200)], ["doc_id", "n_toks"]
    )
    packed = pack_sequences(df, "doc_id", "n_toks", max_tokens=1024, num_buckets=1)
    rows = {tuple(r["doc_ids"]): r for r in packed.collect()}
    assert (1,) in rows and rows[(1,)]["total_tokens"] == 5000
    stats = packing_stats(packed, 1024).first()
    assert stats["n_oversize"] == 1
    assert stats["n_docs"] == 3


def test_packing_deterministic_under_repartition(spark, docs):
    p1 = {
        r["seq_id"]: tuple(r["doc_ids"])
        for r in pack_sequences(docs, "doc_id", "n_toks", 512, 8).collect()
    }
    p2 = {
        r["seq_id"]: tuple(r["doc_ids"])
        for r in pack_sequences(docs.repartition(17), "doc_id", "n_toks", 512, 8).collect()
    }
    assert p1 == p2


def test_fill_ratio_beats_one_doc_per_bin(spark, docs):
    packed = pack_sequences(docs, "doc_id", "n_toks", max_tokens=512, num_buckets=4)
    fill = packing_stats(packed, 512).first()["fill_ratio"]
    naive = (docs.agg(F.sum("n_toks")).first()[0] / 512) / docs.count()
    assert fill > 0.8                      # FFD packs tightly
    assert fill > naive * 2                # far better than 1 doc/bin
