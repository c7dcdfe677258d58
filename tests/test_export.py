"""Tests for sharded training-dataset export (operators/export.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bi_utils_spark.operators.export import (
    verify_training_shards,
    write_training_shards,
)
from bi_utils_spark.sources.tables import load_table


def test_write_shards_roundtrip_and_manifest(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "ds")
    manifest = write_training_shards(docs, path, "doc_id", num_shards=8)
    rows = manifest.collect()
    assert sum(r["n_rows"] for r in rows) == docs.count()
    assert len(rows) <= 8
    # data roundtrip: every doc present exactly once with its text
    back = spark.read.parquet(f"{path}/data")
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    # verification passes on pristine data
    v = verify_training_shards(spark, path, "doc_id")
    assert all(r["ok"] for r in v.collect())


def test_verify_detects_tampering(spark, sf_dir, tmp_path):
    import glob
    import os

    docs = load_table(spark, sf_dir, "documents").limit(50)
    path = str(tmp_path / "ds2")
    write_training_shards(docs, path, "doc_id", num_shards=4)
    # tamper: delete one shard's files
    shards = sorted(glob.glob(f"{path}/data/shard=*"))
    victim = shards[0]
    for f in glob.glob(f"{victim}/*.parquet"):
        os.remove(f)
    v = {r["shard"]: r["ok"] for r in
         verify_training_shards(spark, path, "doc_id").collect()}
    assert not all(v.values())
    assert sum(1 for ok in v.values() if not ok) == 1


def test_write_shards_deterministic(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    m1 = {(r["shard"], r["content_hash"]) for r in
          write_training_shards(docs, str(tmp_path / "a"), "doc_id", num_shards=8).collect()}
    m2 = {(r["shard"], r["content_hash"]) for r in
          write_training_shards(docs.repartition(13), str(tmp_path / "b"), "doc_id", num_shards=8).collect()}
    assert m1 == m2
