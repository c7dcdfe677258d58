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
