"""r10 ADVICE regressions (txtable).

Five defects from the r9 advisory: (1) an append that loses the claim
race to ALTER ADD CONSTRAINT must re-validate its delta against the
new constraint set before rebasing, and (2) a rewriting commit must
treat an interleaved constraint ADDITION as a conflict (a pure DROP
composes); (3) CLONE carries persisted CHECK constraints (shallow and
deep); (4) decimal zone-map extremes compare numerically in
table_stats, never lexicographically; (5) version_at_timestamp reads
'2024' as a calendar year, not unix epoch seconds; (6) a merge that
allocated NO identity values composes with an interleaved allocating
append instead of spuriously conflicting.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from bi_utils_spark.operators import txtable as tx


def _rows(spark, *triples):
    return spark.createDataFrame(
        [(k, s, v) for k, s, v in triples], "k int, status string, v long"
    )


def _as_dict(df):
    return {r["k"]: (r["status"], r["v"]) for r in df.collect()}


def _now():
    return F.lit(dt.datetime(2024, 6, 1))


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "t")
    tx.create_table(_rows(spark, (1, "A", 10), (2, "A", 20)), path)
    return path


# ---------------------------------------------------------------------------
# 1: append rebase re-validates an interleaved ADD CONSTRAINT
# ---------------------------------------------------------------------------


def test_append_lost_race_to_add_constraint_revalidates(
    spark, table, monkeypatch
):
    real_claim = tx._claim
    state = {"injected": False}

    def racy(path, version, payload):
        if not state["injected"] and payload.get("action") == "append":
            # a constraint lands between the append's validation and
            # its claim — the append must lose the slot and re-gate
            state["injected"] = True
            assert real_claim(
                path,
                version,
                {
                    "version": version,
                    "action": "add_constraint",
                    "added": [],
                    "removed": [],
                    "constraints": {"v_cap": "v <= 100"},
                },
            )
        return real_claim(path, version, payload)

    monkeypatch.setattr(tx, "_claim", racy)
    with pytest.raises(tx.CheckViolation, match="v_cap"):
        tx.append_table(_rows(spark, (3, "B", 300)), table)
    # nothing landed: the violating batch left the table untouched
    assert 3 not in _as_dict(tx.read_table(spark, table))
    # a compliant append now folds the constraint and commits
    tx.append_table(_rows(spark, (4, "B", 40)), table)
    assert _as_dict(tx.read_table(spark, table))[4] == ("B", 40)


def test_rewrite_conflicts_on_interleaved_add_constraint(spark, table):
    snap = tx._fold(table)
    tx.add_check_constraint(spark, table, "v_cap", "v <= 100")
    with pytest.raises(tx.ConcurrentWriteError, match="CHECK constraint"):
        tx._rewrite_commit(
            table, snap.version, "compact", [], [], conflict="files"
        )
    # a pure DROP only loosens the set — disjoint rewrites compose
    snap2 = tx._fold(table)
    tx.drop_check_constraint(table, "v_cap")
    v = tx._rewrite_commit(
        table, snap2.version, "compact", [], [], conflict="files"
    )
    assert v == tx.latest_version(table)


# ---------------------------------------------------------------------------
# 3: CLONE carries CHECK constraints
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shallow", [True, False])
def test_clone_keeps_enforcing_constraints(spark, table, tmp_path, shallow):
    tx.add_check_constraint(spark, table, "v_pos", "v > 0")
    dst = str(tmp_path / ("sh" if shallow else "dp"))
    tx.clone_table(spark, table, dst, shallow=shallow)
    assert tx._fold(dst).constraints == {"v_pos": "v > 0"}
    with pytest.raises(tx.CheckViolation, match="v_pos"):
        tx.append_table(_rows(spark, (9, "Z", -1)), dst)
    tx.append_table(_rows(spark, (8, "Z", 5)), dst)
    assert _as_dict(tx.read_table(spark, dst))[8] == ("Z", 5)
    # the source is untouched by the clone's rejected batch
    assert set(_as_dict(tx.read_table(spark, table))) == {1, 2}


# ---------------------------------------------------------------------------
# 4: decimal min/max is numeric, and exact
# ---------------------------------------------------------------------------


def test_table_stats_decimal_numeric_minmax(spark, tmp_path):
    import json

    path = str(tmp_path / "dec")
    tx.create_table(
        spark.createDataFrame(
            [(1, Decimal("9.5"))], "k int, d decimal(10,1)"
        ).coalesce(1),
        path,
    )
    tx.append_table(
        spark.createDataFrame(
            [(2, Decimal("10.2"))], "k int, d decimal(10,1)"
        ).coalesce(1),
        path,
    )
    # a decimal column must not nuke the file's OTHER footer stats:
    # pyarrow raises on Spark-written decimal statistics, and that
    # used to zero out row counts and sibling zone maps for the file
    snap = tx._fold(path)
    assert all(m.get("rows") == 1 for m in snap.files.values())
    assert all("k" in (m.get("stats") or {}) for m in snap.files.values())
    st = tx.table_stats(path, columns=["k"])
    assert st["num_rows"] == 2
    assert st["columns"]["k"] == {"min": 1, "max": 2}
    # local footers expose no decimal extremes -> honest None
    assert tx.table_stats(path, columns=["d"])["columns"]["d"] is None
    # when decimal stats ARE present (e.g. borrowed files written by
    # engines whose footers expose them), the fold must compare
    # NUMERICALLY — lexicographic folding would say min='10.2'
    for v, val in ((0, "9.5"), (1, "10.2")):
        cf = tx._commit_file(path, v)
        e = json.loads(open(cf).read())
        for a in e["added"]:
            a["stats"] = {**a.get("stats", {}), "d": [val, val]}
        open(cf, "w").write(json.dumps(e))
    got = tx.table_stats(path, columns=["d"])["columns"]["d"]
    assert Decimal(got["min"]) == Decimal("9.5")
    assert Decimal(got["max"]) == Decimal("10.2")


# ---------------------------------------------------------------------------
# 5: bare-year / year-month timestamps are dates, not epoch seconds
# ---------------------------------------------------------------------------


def test_version_at_timestamp_bare_year(spark, table, monkeypatch):
    import json
    import os

    cf = tx._commit_file(table, 0)
    e = json.loads(open(cf).read())
    e["ts"] = dt.datetime(2023, 6, 1).timestamp()
    open(cf, "w").write(json.dumps(e))
    orig = tx.time.time
    monkeypatch.setattr(
        tx.time, "time", lambda: dt.datetime(2024, 3, 1).timestamp()
    )
    tx.append_table(_rows(spark, (3, "B", 30)), table)
    monkeypatch.setattr(tx.time, "time", orig)
    # '2024' = 2024-01-01, between v0 (2023-06) and v1 (2024-03)
    assert tx.version_at_timestamp(table, "2024") == 0
    assert tx.version_at_timestamp(table, "2024-06") == 1
    assert tx.version_at_timestamp(table, "2024-03-01") == 1
    # numeric unix-seconds strings still resolve numerically
    s = str(dt.datetime(2023, 12, 1).timestamp())
    assert tx.version_at_timestamp(table, s) == 0


# ---------------------------------------------------------------------------
# 6: a non-allocating merge composes with an interleaved identity append
# ---------------------------------------------------------------------------


def test_update_only_merge_composes_with_identity_append(
    spark, tmp_path, monkeypatch
):
    path = str(tmp_path / "pid")
    base = spark.createDataFrame(
        [(1, "d1", 10), (2, "d2", 20)], "k int, day string, v long"
    )
    tx.create_table(
        base,
        path,
        partition_cols=["day"],
        identity={"id": {"start": 1, "step": 1}},
    )
    real_claim = tx._claim
    state = {"done": False}

    def racy(p, version, payload):
        if not state["done"] and payload.get("action") == "merge":
            # an append into a DIFFERENT partition allocates identity
            # values between the merge's fold and its claim
            state["done"] = True
            tx.append_table(
                spark.createDataFrame(
                    [(9, "d2", 90)], "k int, day string, v long"
                ),
                p,
            )
        return real_claim(p, version, payload)

    monkeypatch.setattr(tx, "_claim", racy)
    # update-only source: zero inserts -> zero identity allocation ->
    # the interleaved allocation CANNOT collide; the merge must rebase
    # and commit, not raise
    src = spark.createDataFrame([(1, "d1", 11)], "k int, day string, v long")
    tx.merge_tx_table(spark, path, src, ["k"], now=_now())
    rows = {r["k"]: r for r in tx.read_table(spark, path).collect()}
    assert rows[1]["v"] == 11 and rows[9]["v"] == 90
    ids = [r["id"] for r in rows.values()]
    assert len(ids) == len(set(ids))  # uniqueness held throughout
