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


def test_cluster_balanced_sample_cap_and_determinism(spark):
    from bi_utils_spark.operators.clustering import cluster_balanced_sample

    rows = [(i, [float(i % 2) * 10, 0.0]) for i in range(1, 41)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cluster_balanced_sample(df, k=2, iters=1, cap=5)
    got = out.collect()
    by_cluster = {}
    for r in got:
        by_cluster.setdefault(r["cluster"], []).append(r["vec_id"])
    assert all(len(v) == 5 for v in by_cluster.values())
    # repartition-stable
    again = cluster_balanced_sample(df.repartition(9), k=2, iters=1, cap=5)
    assert sorted(map(tuple, got)) == sorted(map(tuple, again.collect()))


def test_two_level_topk_equals_one_level(spark):
    from pyspark.sql import Window
    from bi_utils_spark.operators.clustering import (
        cluster_balanced_sample,
        kmeans_assign,
        kmeans_fit,
    )
    from pyspark.sql import functions as F

    rows = [(i, [float(i % 3) * 8, 1.0]) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    two = cluster_balanced_sample(df, k=3, iters=2, cap=7)
    # one-level reference: global per-cluster window
    cents = kmeans_fit(df, k=3, iters=2)
    assigned = kmeans_assign(df, cents).select("vec_id", "cluster")
    h = F.md5(F.concat(F.col("vec_id").cast("string"), F.lit("bal")))
    w = Window.partitionBy("cluster").orderBy(h.asc(), F.col("vec_id"))
    one = (
        assigned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 7)
        .select("vec_id", "cluster")
    )
    assert sorted(map(tuple, two.collect())) == sorted(map(tuple, one.collect()))


def test_embedding_outliers_flags_far_point(spark):
    from bi_utils_spark.operators.clustering import embedding_outliers

    rows = [(i, [0.0 + 0.001 * i, 0.0]) for i in range(1, 20)]
    rows.append((99, [500.0, 500.0]))  # corrupt vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["is_outlier"] for r in
           embedding_outliers(df, k=2, iters=1, quantile=0.9).collect()}
    assert out[99] is True
    assert sum(out.values()) <= 2  # only the tail is flagged


def test_assign_numpy_bit_equals_column(spark):
    """The vectorized Arrow assignment must be BIT-identical to the
    Column-expression form — same residual doubles, same half-away
    rounding, same saturation, same first-min tie, including at the
    saturation boundary."""
    rows = [
        (1, [0.1, 0.2, 0.3]),
        (2, [0.10000005, 0.2, 0.3]),   # sub-quantum jitter
        (3, [50.0, -50.0, 0.0]),       # beyond the dim-3 cap
        (4, [0.0, 0.0, 0.0]),
        (5, [1e9, 1e9, 1e9]),          # corrupt, saturates
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[0.1, 0.2, 0.3], [0.0, 0.0, 0.0], [0.1, 0.2, 0.3]]  # dup: tie
    a = sorted(map(tuple, kmeans_assign(df, cents, impl="column").collect()))
    b = sorted(map(tuple, kmeans_assign(df, cents, impl="numpy").collect()))
    assert a == b
    import pytest as _pytest

    with _pytest.raises(ValueError, match="impl"):
        kmeans_assign(df, cents, impl="nope")


def test_high_dim_corrupt_vector_never_overflows(spark):
    """ADVICE r4: at dim >> 64, a corrupt vector saturating every dim
    must still yield a non-negative (saturated-max) distance — the cap
    is derived per-dim, so Σ q² stays inside BIGINT and the corrupt
    row ranks FARTHEST, never wraps negative and ranks nearest."""
    from bi_utils_spark.operators.clustering import _qcap, kmeans_assign

    dim = 1536
    assert dim * _qcap(dim) ** 2 < 2**63  # the invariant itself
    rows = [
        (1, [0.001 * (d % 5) for d in range(dim)]),
        (2, [0.001 * (d % 5) + 1e-4 for d in range(dim)]),
        (99, [1.0e9] * dim),  # corrupt: saturates every dimension
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[0.0] * dim, [0.001 * (d % 5) for d in range(dim)]]
    got = {r["vec_id"]: r for r in kmeans_assign(df, cents).collect()}
    assert all(r["d2q"] >= 0 for r in got.values())
    assert got[99]["d2q"] > got[1]["d2q"] and got[99]["d2q"] > got[2]["d2q"]
    assert got[99]["d2q"] == dim * _qcap(dim) ** 2  # deterministic saturation


def test_farthest_init_escapes_mirror_skew(spark):
    from bi_utils_spark.operators.clustering import (
        kmeans_assign,
        kmeans_fit,
        kmeans_init_farthest,
    )

    # seeds 1,2 mirror-skew around the origin: "first" init converges
    # to the degenerate split; farthest-first seeds across the groups
    rows = [(1, [0.0, 0.1]), (2, [0.1, 0.0]), (3, [9.9, 10.0]), (4, [10.0, 9.9])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    seeds = kmeans_init_farthest(df, "vec_id", "embedding", 2)
    assert seeds[0][0] < 1 and seeds[1][0] > 9  # one seed per group
    cents = kmeans_fit(df, k=2, iters=2, init="farthest")
    a = {r["vec_id"]: r["cluster"] for r in kmeans_assign(df, cents).collect()}
    assert a[1] == a[2] and a[3] == a[4] and a[1] != a[3]


def test_farthest_init_fewer_points_than_k(spark):
    from bi_utils_spark.operators.clustering import kmeans_init_farthest

    df = spark.createDataFrame(
        [(1, [1.0, 1.0]), (2, [1.0, 1.0])], "vec_id long, embedding array<float>"
    )
    # duplicate points: stops at 1 seed instead of inventing one
    assert len(kmeans_init_farthest(df, "vec_id", "embedding", 3)) == 1


def test_assign_numpy_survives_malformed_vectors(spark):
    """Review r5: one NULL/ragged/NaN vector must not kill the Arrow
    batch — malformed rows emit NULL cluster/d2q and flow on, like
    the Column form."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    rows = [
        Row(vec_id=1, embedding=[0.1, 0.2]),
        Row(vec_id=2, embedding=None),
        Row(vec_id=3, embedding=[0.1, 0.2, 0.3]),   # wrong dim
        Row(vec_id=4, embedding=[float("nan"), 0.0]),
        Row(vec_id=5, embedding=[]),
        Row(vec_id=6, embedding=[0.3, 0.4]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[0.0, 0.0], [1.0, 1.0]]
    got = {r["vec_id"]: r for r in kmeans_assign(df, cents, impl="numpy").collect()}
    assert got[1]["cluster"] == 0 and got[1]["d2q"] is not None
    assert got[6]["cluster"] == 0
    for bad in (2, 3, 4, 5):
        assert got[bad]["cluster"] is None and got[bad]["d2q"] is None
    # Column form agrees on well-formed and NULL-vector rows. Its
    # malformed behavior is documented as accidental (missing
    # elements saturate via null-skipping greatest; NaN RAISES under
    # ANSI — the crash class the numpy path's NULL handling avoids),
    # so parity is only asserted where behavior is defined.
    sane = df.filter(F.col("vec_id").isin(1, 2, 6))
    col = {r["vec_id"]: r for r in kmeans_assign(sane, cents, impl="column").collect()}
    for vid in (1, 2, 6):
        assert (col[vid]["cluster"], col[vid]["d2q"]) == (
            got[vid]["cluster"],
            got[vid]["d2q"],
        )


def test_fused_update_partials_equal_unfused_chain(spark):
    """r12: the fused assign+partial-sum pass must aggregate to exactly
    the rows the old assign -> posexplode -> groupBy chain produced —
    including half-way rounding edges, negatives, and malformed rows
    (NULL / ragged / NaN vectors contribute nothing, as before)."""
    from pyspark.sql import functions as F

    from bi_utils_spark.operators.clustering import (
        _Q,
        _assign_update_partials,
    )

    rows = [
        (1, [0.1, 0.0]),
        (2, [0.00000005, -0.00000015]),  # x*1e7 = 0.5 / -1.5 half-way edges
        (3, [10.0, 10.1]),
        (4, [-9.9, 10.0]),
        (5, [0.2, 0.1]),
        (6, None),
        (7, [1.0]),  # ragged
        (8, [float("nan"), 1.0]),
        (9, [2.5e-7, -2.5e-7]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[0.0, 0.0], [10.0, 10.0]]

    fused = {
        (r["cluster"], r["dim"]): (r["s"], r["n"])
        for r in (
            _assign_update_partials(df, cents, "vec_id", "embedding")
            .groupBy("cluster", "dim")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
    }
    old = {
        (r["cluster"], r["dim"]): (r["s"], r["n"])
        for r in (
            kmeans_assign(df, cents, "vec_id", "embedding")
            .select("cluster", F.posexplode(F.col("embedding")).alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(
                F.sum(
                    F.round(F.col("x").cast("double") * F.lit(_Q)).cast("long")
                ).alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        if r["cluster"] is not None
    }
    assert fused == old


def test_driver_tier_equals_distributed(spark):
    """The r12 size tier must return bit-identical centroids to the
    distributed loop — random vectors plus the documented edge cases
    (malformed rows, saturation-scale values, duplicate seeds)."""
    import random

    rng = random.Random(77)
    rows = [
        (i, [rng.uniform(-1.5, 1.5) for _ in range(8)]) for i in range(200)
    ]
    rows += [
        (200, None),                                   # NULL vector
        (201, [1.0, 2.0]),                             # ragged
        (202, [float("nan")] * 8),                     # non-finite
        (203, [50.0] * 8),                             # far outlier
        (204, rows[0][1]),                             # duplicate point
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    for k, iters in [(2, 1), (5, 3)]:
        fast = kmeans_fit(df, k=k, iters=iters)
        slow = kmeans_fit(df, k=k, iters=iters, driver_max_rows=0)
        assert fast == slow


def test_driver_tier_overflow_probe_falls_through(spark):
    """Above the bound the probe is discarded and the distributed
    loop runs — same centroids either way."""
    rows = [(i, [float(i % 7), float(i % 3)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assert kmeans_fit(df, k=2, iters=2, driver_max_rows=10) == kmeans_fit(
        df, k=2, iters=2
    )
