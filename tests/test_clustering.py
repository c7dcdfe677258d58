"""operators/clustering.py — exact fixed-point Lloyd's k-means."""

from __future__ import annotations

from bi_utils_spark.operators.clustering import (
    _round_half_away,
    kmeans_assign,
    kmeans_fit,
    kmeans_init,
    kmeans_summary,
)


def _pts(spark):
    # two tight groups around (0,0) and (10,10)
    rows = [
        (1, [0.1, 0.0]),
        (2, [0.0, 0.2]),
        (3, [10.0, 10.1]),
        (4, [9.9, 10.0]),
        (5, [0.2, 0.1]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_round_half_away_matches_sql_round():
    assert _round_half_away(2.5) == 3
    assert _round_half_away(-2.5) == -3
    assert _round_half_away(2.4) == 2
    assert _round_half_away(-2.4) == -2


def test_init_is_smallest_ids_quantized(spark):
    cents = kmeans_init(_pts(spark), "vec_id", "embedding", 2)
    assert len(cents) == 2
    assert abs(cents[0][0] - 0.1) < 1e-9  # vec_id 1
    assert abs(cents[1][1] - 0.2) < 1e-9  # vec_id 2


def test_fit_separates_groups(spark):
    df = _pts(spark)
    cents = kmeans_fit(df, k=2, iters=2)
    assigned = {
        r["vec_id"]: r["cluster"] for r in kmeans_assign(df, cents).collect()
    }
    assert assigned[1] == assigned[2] == assigned[5]
    assert assigned[3] == assigned[4]
    assert assigned[1] != assigned[3]
    # the far-group centroid must have moved to ~(9.95, 10.05)
    far = cents[assigned[3]]
    assert abs(far[0] - 9.95) < 1e-6 and abs(far[1] - 10.05) < 1e-6


def test_empty_cluster_keeps_seed(spark):
    rows = [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [50.0, 50.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # k=3 seeds at ids 1,2,3; seed 2 duplicates seed 1 so its cluster
    # empties (ties go to the lowest index) and must keep its seed
    cents = kmeans_fit(df, k=3, iters=2)
    assert cents[1] == [0.0, 0.0]


def test_assignment_tie_goes_to_lowest_cluster(spark):
    rows = [(1, [5.0, 5.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_assign(df, [[0.0, 0.0], [10.0, 10.0]]).first()
    assert out["cluster"] == 0  # equidistant -> first match


def test_summary_partitioning_invariance(spark):
    df = _pts(spark)
    a = sorted(map(tuple, kmeans_summary(df, k=2, iters=2).collect()))
    b = sorted(
        map(tuple, kmeans_summary(df.repartition(7), k=2, iters=2).collect())
    )
    assert a == b
    # inertia: group one spread = sum of squared dists to (0.1, 0.1)
    n_by_cluster = {r[0]: r[1] for r in a}
    assert sorted(n_by_cluster.values()) == [2, 3]
