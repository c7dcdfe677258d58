"""Property tests for the r9 pruning and FIM machinery.

These defend the two places where a subtle bug silently loses rows at
100 TB: generated-column range derivation (an unsound bound would
prune a file that held a matching row) and the FIM splice (a
misaligned cut would corrupt training text). Both are pure column /
python arithmetic, so the properties run without Spark.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from bi_utils_spark.operators import txtable as tx

_TS = st.datetimes(
    min_value=dt.datetime(1900, 1, 1),
    max_value=dt.datetime(2199, 12, 28, 23, 59, 59),
)

_FORMS = [
    ("date", None, lambda d: d.date().isoformat()),
    ("year", None, lambda d: d.year),
    ("dtrunc", "year", lambda d: f"{d.year:04d}-01-01 00:00:00"),
    ("dtrunc", "month", lambda d: f"{d.year:04d}-{d.month:02d}-01 00:00:00"),
    (
        "dtrunc",
        "week",
        lambda d: (
            d.date() - dt.timedelta(days=d.weekday())
        ).isoformat()
        + " 00:00:00",
    ),
    ("dtrunc", "day", lambda d: d.date().isoformat() + " 00:00:00"),
    ("trunc", "month", lambda d: f"{d.year:04d}-{d.month:02d}-01"),
    ("trunc", "year", lambda d: f"{d.year:04d}-01-01"),
]


@settings(max_examples=300, deadline=None)
@given(a=_TS, b=_TS, x=_TS)
def test_generated_bounds_are_sound(a, b, x):
    """For any lo <= x <= hi, every supported monotone form must put
    f(x) inside [_gen_bound(lo), _gen_bound(hi)] — otherwise a file
    holding x could be pruned by a predicate that matches it."""
    lo, hi = min(a, b, x), max(a, b, x)
    lo_s = lo.strftime("%Y-%m-%d %H:%M:%S")
    hi_s = hi.strftime("%Y-%m-%d %H:%M:%S")
    for kind, arg, truth in _FORMS:
        glo = tx._gen_bound(kind, arg, lo_s)
        ghi = tx._gen_bound(kind, arg, hi_s)
        fx = truth(x)
        assert glo is not None and ghi is not None
        assert glo <= fx <= ghi, (kind, arg, lo_s, hi_s, fx, glo, ghi)


@settings(max_examples=300, deadline=None)
@given(
    a=st.text(min_size=0, max_size=30),
    b=st.text(min_size=0, max_size=30),
    x=st.text(min_size=0, max_size=30),
)
def test_prefix_bound_is_sound(a, b, x):
    vals = sorted([a, b, x])
    lo, hi = vals[0], vals[2]
    mid = vals[1]
    for n in (1, 3, 8):
        glo = tx._gen_bound("prefix", n, lo)
        ghi = tx._gen_bound("prefix", n, hi)
        assert glo <= mid[:n] <= ghi


@settings(max_examples=200, deadline=None)
@given(
    text=st.text(min_size=2, max_size=200),
    w1=st.integers(min_value=0, max_value=2**32 - 1),
    w2=st.integers(min_value=0, max_value=2**32 - 1),
)
def test_fim_splice_identity_pure(text, w1, w2):
    """The PSM splice must reassemble to the original text for ANY
    cut-point pair — mirrors the column arithmetic in python."""
    n = len(text)
    c1, c2 = w1 % n, w2 % n
    a, b = min(c1, c2) + 1, max(c1, c2) + 1
    prefix = text[0 : a - 1]
    suffix = text[b - 1 :]
    middle = text[a - 1 : b - 1]
    assert prefix + middle + suffix == text


def test_pf_prune_partition_of_reads(spark, tmp_path):
    """Mixed-spec invariant: for every partition_filter value, the
    scoped read and its complement partition the unscoped read —
    nothing lost, nothing duplicated, whatever mix of specs holds."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "p")
    rows = spark.createDataFrame(
        [(k, "A" if k % 2 == 0 else "B", k % 3) for k in range(30)],
        "k int, status string, bucket int",
    )
    tx.create_table(
        rows.where("k < 10"), path, partition_cols=["status"]
    )
    tx.repartition_table(path, ["bucket"])
    tx.append_table(rows.where("k >= 10 and k < 20"), path)
    tx.repartition_table(path, ["status"])
    tx.append_table(rows.where("k >= 20"), path)
    everything = {r["k"] for r in tx.read_table(spark, path).collect()}
    assert everything == set(range(30))
    for col, vals in (("bucket", [0, 1, 2]), ("status", ["A", "B"])):
        parts = [
            {
                r["k"]
                for r in tx.read_table(
                    spark, path, partition_filter={col: v}
                ).collect()
            }
            for v in vals
        ]
        assert set().union(*parts) == everything
        assert sum(len(p) for p in parts) == len(everything)


def test_kitchen_sink_feature_interplay(spark, tmp_path):
    """Every r9 feature on ONE table, end to end: generated partition
    column + identity + persisted constraint + MOR delete/update +
    merge + compaction + vacuum + stats + describe — asserting the
    final contents against a pure-python model at each hop."""
    import datetime as dtm

    from pyspark.sql import functions as F

    path = str(tmp_path / "ks")
    rows = spark.createDataFrame(
        [
            (f"u{k}", dtm.datetime(1994 + k % 3, 1 + k % 12, 3), k * 10)
            for k in range(30)
        ],
        "name string, d timestamp, v long",
    )
    tx.create_table(
        rows,
        path,
        partition_cols=["y"],
        generated={"y": "year(d)"},
        identity={"id": {"start": 1, "step": 1}},
    )
    tx.add_check_constraint(spark, path, "v_nonneg", "v >= 0")
    snap = tx._fold(path)
    assert set(snap.protocol["writer"]) >= {
        "generatedColumns", "identityColumns", "checkConstraints",
    }
    # constraint + generated validation both gate an append
    import pytest as _pytest

    with _pytest.raises(tx.CheckViolation):
        tx.append_table(
            rows.limit(1).withColumn("v", F.lit(-5)).drop("y")
            if "y" in rows.columns else rows.limit(1).withColumn("v", F.lit(-5)),
            path,
        )
    # MOR delete a slice, MOR update another (recomputes y), merge an
    # insert + an update through the full stack
    tx.delete_from_table(spark, path, "v >= 250")
    tx.update_table(
        spark, path, F.col("name") == "u1", {"d": "d + interval 370 days"}
    )
    src = spark.createDataFrame(
        [
            ("u2", dtm.datetime(2000, 5, 5), 777),
            ("u_new", dtm.datetime(2001, 6, 6), 888),
        ],
        "name string, d timestamp, v long",
    )
    tx.merge_tx_table(spark, path, src, ["name"])
    got = {
        r["name"]: (r["y"], r["v"], r["id"])
        for r in tx.read_table(spark, path).collect()
    }
    assert len(got) == 26  # 30 - 5 deleted + 1 insert
    assert got["u_new"][1] == 888 and got["u_new"][0] == 2001
    assert got["u2"] == (2000, 777, got["u2"][2])
    assert got["u1"][0] == 1995 + 1  # update recomputed the partition year
    ids = [i for (_, _, i) in got.values()]
    assert len(set(ids)) == len(ids)
    # maintenance: purge DVs, compact, vacuum — contents invariant
    before = dict(got)
    tx.materialize_deletes(spark, path)
    tx.compact_table(spark, path)
    tx.vacuum_table(path, retain_versions=1, stray_age_seconds=0.0)
    after = {
        r["name"]: (r["y"], r["v"], r["id"])
        for r in tx.read_table(spark, path).collect()
    }
    assert after == before
    # metadata answers stay exact post-compaction
    st = tx.table_stats(path, columns=["v"])
    assert st["num_rows"] == 26
    assert st["columns"]["v"]["min"] == 0
    card = tx.describe_table(spark, path).first()
    assert card["num_rows"] == 26
    assert "deletionVectors" in card["reader_features"]
    # wind the features down: constraints then identity then DVs
    tx.drop_check_constraint(path, "v_nonneg")
    tx.drop_table_feature(spark, path, "checkConstraints")
    tx.drop_table_feature(spark, path, "identityColumns")
    tx.drop_table_feature(spark, path, "deletionVectors")
    snap = tx._fold(path)
    assert set(snap.protocol["writer"]) == {"generatedColumns"}
    assert (
        tx.read_table(spark, path).count() == 26
    )  # nothing lost on the way down
