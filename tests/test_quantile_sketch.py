from __future__ import annotations

import pytest

from bi_utils_spark.operators.quantile_sketch import (
    qsketch_build,
    qsketch_merge,
    qsketch_quantiles,
)


@pytest.fixture(scope="module")
def values(spark):
    # deterministic skewed positives: 1..1000 with quadratic spread
    rows = [("g1", float(i * i % 997 + 1)) for i in range(1, 1201)]
    rows += [("g2", float(i % 100 + 1)) for i in range(500)]
    return spark.createDataFrame(rows, ["g", "v"])


def test_quantiles_within_alpha(values):
    alpha = 0.01
    sk = qsketch_build(values, "v", ("g",), alpha)
    out = {
        (r["g"], r["q"]): r["est"]
        for r in qsketch_quantiles(
            sk, (0.5, 0.95, 0.99), ("g",), alpha
        ).collect()
    }
    rows = values.collect()
    for g in ("g1", "g2"):
        vs = sorted(r["v"] for r in rows if r["g"] == g)
        for q in (0.5, 0.95, 0.99):
            exact = vs[max(0, -(-int(q * len(vs)) // 1) - 1)]
            # rank-based exact: value at ceil(q*n)
            import math

            exact = vs[math.ceil(q * len(vs)) - 1]
            est = out[(g, q)]
            assert abs(est - exact) <= alpha * exact * 1.0001, (
                g, q, est, exact,
            )


def test_merge_equals_whole(spark, values):
    a = values.where("v < 300")
    b = values.where("v >= 300")
    whole = qsketch_build(values, "v", ("g",))
    merged = qsketch_merge(
        [qsketch_build(a, "v", ("g",)), qsketch_build(b, "v", ("g",))],
        ("g",),
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_zero_and_negative_reserved_buckets(spark):
    from bi_utils_spark.operators.quantile_sketch import (
        _NEG_BUCKET,
        _ZERO_BUCKET,
    )

    df = spark.createDataFrame(
        [(0.0,), (-3.0,), (5.0,), (None,)], ["v"]
    )
    sk = {r["bucket"]: r["cnt"] for r in qsketch_build(df, "v").collect()}
    assert sk[_ZERO_BUCKET] == 1 and sk[_NEG_BUCKET] == 1
    assert sum(sk.values()) == 3  # null dropped


def test_small_positive_values_do_not_collide_with_sentinels(spark):
    """r7 review regression: with the old +2-shifted encoding,
    positives <= gamma^-2 (~0.9607 at alpha=0.01) landed in the
    reserved ids and every sub-1 quantile estimated as 0.0."""
    from bi_utils_spark.operators.quantile_sketch import (
        _NEG_BUCKET,
        _ZERO_BUCKET,
    )

    alpha = 0.01
    vals = [0.94, 0.5, 0.01, 1e-6, 0.9607]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    sk = qsketch_build(df, "v", alpha=alpha)
    buckets = [r["bucket"] for r in sk.collect()]
    assert _ZERO_BUCKET not in buckets and _NEG_BUCKET not in buckets
    out = {
        r["q"]: r["est"]
        for r in qsketch_quantiles(sk, (0.2, 0.5, 0.9), alpha=alpha).collect()
    }
    import math

    exact = sorted(vals)
    for q, est in out.items():
        truth = exact[math.ceil(q * len(exact)) - 1]
        assert abs(est - truth) <= alpha * truth * 1.0001, (q, est, truth)


def test_sketch_size_is_logarithmic(spark):
    rows = [(float(2**i),) for i in range(1, 31)] * 10
    df = spark.createDataFrame(rows, ["v"])
    sk = qsketch_build(df, "v", alpha=0.01)
    # 30 distinct powers over 9 decades -> thousands of possible
    # values but only ~log-gamma many buckets
    assert sk.count() <= 3000
    total = sum(r["cnt"] for r in sk.collect())
    assert total == 300
