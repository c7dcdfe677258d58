"""operators/embsig.py — embedding SimHash signatures + banded pairs."""

from __future__ import annotations

import hashlib

from bi_utils_spark.operators.embsig import (
    embedding_simhash,
    embedding_simhash_pairs,
    hyperplane_signs,
)


def test_hyperplane_signs_match_sql_formula():
    signs = hyperplane_signs(4, 3, "esim")
    for b in range(4):
        for d in range(3):
            hexdig = hashlib.md5(f"esim,{b},{d}".encode()).hexdigest()[0]
            expect = 1 if int(hexdig, 16) % 2 == 0 else -1
            assert signs[b][d] == expect


def test_identical_vectors_identical_signature(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -0.25, 0.125]), (2, [0.5, -0.25, 0.125]), (3, [-0.5, 0.25, -0.125])],
        "vec_id long, embedding array<float>",
    )
    sigs = {r["vec_id"]: r["sig64"] for r in embedding_simhash(df).collect()}
    assert sigs[1] == sigs[2]
    # antipodal vector flips every non-zero-projection bit
    assert sigs[1] != sigs[3]


def test_phash_column_name_deprecated_shim(spark):
    import warnings

    df = spark.createDataFrame(
        [(1, [0.5, -0.25, 0.125])], "vec_id long, embedding array<float>"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        legacy = embedding_simhash(df, sig_col="phash")
        assert any(issubclass(w.category, DeprecationWarning) for w in caught)
    row = legacy.collect()[0]
    new = embedding_simhash(df).collect()[0]
    assert row["phash"] == new["sig64"]


def test_near_vectors_small_hamming(spark):
    base = [0.1 * (d % 7) - 0.3 for d in range(16)]
    near = [x + 1e-6 for x in base]
    far = [-x for x in base]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "vec_id long, embedding array<float>"
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in embedding_simhash_pairs(df, max_hamming=3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 1
    assert (1, 3) not in pairs


def test_signature_is_map_only(spark):
    from bi_utils_spark.plans.inspect import num_exchanges

    df = spark.createDataFrame(
        [(1, [0.5, 0.5])], "vec_id long, embedding array<float>"
    )
    assert num_exchanges(embedding_simhash(df)) == 0


def test_repartition_stable(spark):
    rows = [(i, [0.01 * ((i + d) % 11) - 0.05 for d in range(8)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted(map(tuple, embedding_simhash(df).collect()))
    b = sorted(map(tuple, embedding_simhash(df.repartition(7)).collect()))
    assert a == b
