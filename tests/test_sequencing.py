from __future__ import annotations

import pytest

from bi_utils_spark.operators.sequencing import (
    sequence_gaps,
    sequence_islands,
)


@pytest.fixture(scope="module")
def ids(spark):
    # present: 1-5, 8, 9, 20-22; duplicates and a null mixed in
    present = [1, 2, 3, 4, 5, 8, 9, 20, 21, 22, 3, 8, None]
    return spark.createDataFrame([(x,) for x in present], ["id"])


def test_gaps_within_and_across_buckets(ids):
    got = sorted(
        (r["gap_start"], r["gap_end"])
        for r in sequence_gaps(ids, "id", bucket_size=4).collect()
    )
    assert got == [(6, 7), (10, 19)]


def test_gaps_bucket_size_invariant(ids):
    for b in (1, 2, 3, 7, 1 << 20):
        got = sorted(
            (r["gap_start"], r["gap_end"])
            for r in sequence_gaps(ids, "id", bucket_size=b).collect()
        )
        assert got == [(6, 7), (10, 19)], b


def test_islands(ids):
    got = sorted(
        (r["island_start"], r["island_end"], r["n_ids"])
        for r in sequence_islands(ids, "id", bucket_size=4).collect()
    )
    assert got == [(1, 5, 5), (8, 9, 2), (20, 22, 3)]


def test_dense_sequence_no_gaps(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], ["id"])
    assert sequence_gaps(df, "id", bucket_size=8).count() == 0
    isl = sequence_islands(df, "id", bucket_size=8).collect()
    assert [(r["island_start"], r["island_end"], r["n_ids"]) for r in isl] == [
        (0, 49, 50)
    ]


def test_no_corpus_window(spark, ids):
    """Per-id windows partition by bucket; only bucket/gap tables see
    unpartitioned windows."""
    plan = (
        sequence_gaps(ids, "id", bucket_size=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the id-level window must carry a partition spec
    assert "windowspecdefinition(__b" in plan.replace(" ", "")[:100000] or "__b" in plan


def test_random_parity_with_brute_force(spark):
    """Seeded randomized parity: gaps + islands equal the O(n log n)
    driver-side reference on 8 random id multisets, including tiny
    bucket sizes that force cross-bucket stitching."""
    import random

    from bi_utils_spark.operators.sequencing import (
        sequence_gaps,
        sequence_islands,
    )

    rng = random.Random(123)
    for _ in range(8):
        n = rng.randrange(1, 40)
        ids = [rng.randrange(0, 60) for _ in range(n)]
        bs = rng.choice([1, 2, 4, 1 << 20])
        df = spark.createDataFrame([(i,) for i in ids], ["id"])
        got_g = sorted(
            (r["gap_start"], r["gap_end"])
            for r in sequence_gaps(df, "id", bucket_size=bs).collect()
        )
        got_i = sorted(
            (r["island_start"], r["island_end"], r["n_ids"])
            for r in sequence_islands(df, "id", bucket_size=bs).collect()
        )
        s = sorted(set(ids))
        exp_g = [
            (a + 1, b - 1) for a, b in zip(s, s[1:]) if b - a > 1
        ]
        exp_i, start, prev, cnt = [], s[0], s[0], 1
        for x in s[1:]:
            if x == prev + 1:
                prev, cnt = x, cnt + 1
            else:
                exp_i.append((start, prev, cnt))
                start = prev = x
                cnt = 1
        exp_i.append((start, prev, cnt))
        assert got_g == exp_g, (ids, bs)
        assert got_i == exp_i, (ids, bs)
