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
