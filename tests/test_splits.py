"""Deterministic splits/samples (operators/splits.py)."""

import pytest
from pyspark.sql import functions as F

from bi_utils_spark.operators.splits import (
    deterministic_sample,
    hash_split,
    stratified_hash_split,
)


def test_split_covers_all_rows_and_is_stable(spark):
    df = spark.range(10_000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == 10_000          # nothing dropped
    assert abs(counts["train"] - 8000) < 200       # ~binomial tolerance
    assert abs(counts["val"] - 1000) < 150
    # repartitioned input -> identical assignment per id
    again = hash_split(df.repartition(13), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.join(again, "doc_id").filter(out["split"] != again["split"]).count() == 0


def test_split_is_superset_stable(spark):
    full = hash_split(
        spark.range(1000).withColumnRenamed("id", "doc_id"), "doc_id", {"a": 0.5, "b": 0.5}
    )
    half = hash_split(
        spark.range(500).withColumnRenamed("id", "doc_id"), "doc_id", {"a": 0.5, "b": 0.5}
    )
    joined = full.withColumnRenamed("split", "s1").join(
        half.withColumnRenamed("split", "s2"), "doc_id"
    )
    assert joined.filter(F.col("s1") != F.col("s2")).count() == 0


def test_sample_fraction_and_determinism(spark):
    df = spark.range(20_000).withColumnRenamed("id", "doc_id")
    s1 = deterministic_sample(df, "doc_id", 0.25)
    n = s1.count()
    assert abs(n - 5000) < 300
    s2 = deterministic_sample(df.repartition(7), "doc_id", 0.25)
    assert s1.select("doc_id").exceptAll(s2.select("doc_id")).count() == 0
    with pytest.raises(ValueError, match="fraction"):
        deterministic_sample(df, "doc_id", 1.5)


def test_sample_edge_fractions(spark):
    df = spark.range(100).withColumnRenamed("id", "doc_id")
    assert deterministic_sample(df, "doc_id", 0.0).count() == 0
    assert deterministic_sample(df, "doc_id", 1.0).count() == 100


def test_stratified_split_balances_within_strata(spark):
    df = spark.range(8000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 4).alias("lang")
    )
    out = stratified_hash_split(df, "doc_id", "lang", {"train": 0.75, "val": 0.25})
    per = {
        (r["lang"], r["split"]): r["count"]
        for r in out.groupBy("lang", "split").count().collect()
    }
    for lang in range(4):
        tr = per.get((lang, "train"), 0)
        assert abs(tr - 1500) < 150, f"stratum {lang} train={tr}"


def test_stratified_sample_fractions_and_stability(spark, sf_dir):
    from bi_utils_spark.operators.splits import stratified_sample
    from bi_utils_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    kept = stratified_sample(docs, "doc_id", "lang", {"en": 0.5}, 1.0)
    by_lang_in = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    by_lang_out = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # non-listed strata kept whole; 'en' roughly halved (hash variance)
    for lang, n in by_lang_in.items():
        if lang == "en":
            assert 0.25 * n <= by_lang_out.get(lang, 0) <= 0.75 * n
        else:
            assert by_lang_out.get(lang, 0) == n
    # repartition-stability: same kept ids regardless of layout
    ids1 = {r["doc_id"] for r in kept.collect()}
    ids2 = {
        r["doc_id"]
        for r in stratified_sample(
            docs.repartition(13), "doc_id", "lang", {"en": 0.5}, 1.0
        ).collect()
    }
    assert ids1 == ids2


def test_stratified_sample_validates_fraction(spark):
    from bi_utils_spark.operators.splits import stratified_sample

    df = spark.createDataFrame([(1, "en")], ["doc_id", "lang"])
    import pytest as _pt

    with _pt.raises(ValueError):
        stratified_sample(df, "doc_id", "lang", {"en": 1.5})
