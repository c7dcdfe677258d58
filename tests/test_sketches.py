"""operators/sketches.py — X62 count-min sketch heavy hitters."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from bi_utils_spark.operators.sketches import (
    countmin_estimate,
    countmin_table,
    heavy_hitters,
)


def _bucket_py(key: str, row: int, width: int) -> int:
    h = hashlib.md5(f"cm{row}|{key}".encode()).hexdigest()[:13]
    return int(h, 16) % width


def _corpus(spark):
    # 'a' x 30, 'b' x 12, singles c..j
    rows = (
        [("a",)] * 30 + [("b",)] * 12 + [(c,) for c in "cdefghij"]
    )
    return spark.createDataFrame(rows, "key string")


def test_table_matches_hand_hashing(spark):
    df = _corpus(spark)
    got = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in countmin_table(df, "key", depth=2, width=16).collect()
    }
    want: dict = {}
    for key, n in [("a", 30), ("b", 12)] + [(c, 1) for c in "cdefghij"]:
        for row in range(2):
            cell = (row, _bucket_py(key, row, 16))
            want[cell] = want.get(cell, 0) + n
    assert got == want


def test_estimate_one_sided_and_exact_without_collisions(spark):
    df = _corpus(spark)
    sketch = countmin_table(df, "key", depth=4, width=256)
    keys = df.distinct()
    est = {
        r["key"]: r["est"]
        for r in countmin_estimate(
            keys, sketch, "key", depth=4, width=256
        ).collect()
    }
    exact = {"a": 30, "b": 12, **{c: 1 for c in "cdefghij"}}
    for k, x in exact.items():
        assert est[k] >= x
    # wide sketch, 10 keys: whp no collision in all 4 rows
    assert est["a"] == 30 and est["b"] == 12


def test_unsketched_key_estimates_zero_or_collision(spark):
    df = _corpus(spark)
    sketch = countmin_table(df, "key", depth=4, width=512)
    probe = spark.createDataFrame([("zzz",)], "key string")
    est = countmin_estimate(probe, sketch, "key", depth=4, width=512)
    assert est.first()["est"] >= 0  # one-sided: never negative


def test_weighted_build(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 7), ("b", 2)], "key string, w long"
    )
    sketch = countmin_table(df, "key", depth=2, width=64, weight_col="w")
    est = countmin_estimate(
        df.select("key").distinct(), sketch, "key", depth=2, width=64
    )
    got = {r["key"]: r["est"] for r in est.collect()}
    assert got["a"] >= 12 and got["b"] >= 2


def test_heavy_hitters_threshold_and_sampled_candidates(spark):
    df = _corpus(spark)  # N=50; shares: a=0.6, b=0.24, singles 0.02
    hh = heavy_hitters(df, "key", min_share=0.2, depth=4, width=256)
    assert {r["key"] for r in hh.collect()} == {"a", "b"}
    # hash-sampled candidate generation still finds keys that pass
    # the sample filter; hot key 'a' repeats 30x so it survives any
    # per-KEY hash sample iff its single hash falls under the bound —
    # use frac=1.0 to keep determinism and assert parity instead
    hh_all = heavy_hitters(
        df, "key", min_share=0.2, depth=4, width=256, sample_frac=1.0
    )
    assert {r["key"] for r in hh_all.collect()} == {"a", "b"}


def test_sketch_side_broadcasts(spark):
    df = _corpus(spark)
    sketch = countmin_table(df, "key", depth=2, width=32)
    est = countmin_estimate(
        df.distinct(), sketch, "key", depth=2, width=32
    )
    est.collect()
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
