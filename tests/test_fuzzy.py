from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from bi_utils_spark.operators.fuzzy import (
    fuzzy_block_stats,
    levenshtein_dedup_pairs,
    levenshtein_join_blocked,
)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def registry(spark):
    names = [
        (1, "alpha-corp"),
        (2, "alpha-corq"),   # 1 sub of 1
        (3, "alpha-cxxp"),   # 2 subs of 1
        (4, "beta-trading"),
        (5, "beta-tradjng"), # 1 sub of 4
        (6, "gamma-ltd"),
        (7, "gamma-ltd"),    # exact dup of 6
        (8, "delta-gmbh"),
    ]
    return spark.createDataFrame(names, ["id", "name"])


def test_substitution_recall_complete_and_fp_zero(registry):
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in levenshtein_dedup_pairs(registry, "id", "name", 1).collect()
    }
    rows = {r["id"]: r["name"] for r in registry.collect()}
    truth = {
        (a, b): _lev(rows[a], rows[b])
        for a, b in itertools.combinations(sorted(rows), 2)
        if _lev(rows[a], rows[b]) <= 1
    }
    # substitution-only fixture: pigeonhole is exact
    assert got == truth
    assert (1, 2) in got and (6, 7) in got and (1, 3) not in got


def test_distance_two(registry):
    got = {
        (r["id_a"], r["id_b"])
        for r in levenshtein_dedup_pairs(registry, "id", "name", 2).collect()
    }
    assert (1, 3) in got          # dist 2 found at max_dist=2
    assert (2, 3) not in got      # dist 3 stays out


def test_two_table_linkage(spark):
    left = spark.createDataFrame(
        [(1, "acme industries"), (2, "zenith labs")], ["lid", "lname"]
    )
    right = spark.createDataFrame(
        [(10, "acme industrees"), (11, "unrelated co")], ["rid", "rname"]
    )
    out = levenshtein_join_blocked(
        left, right, "lid", "lname", "rid", "rname", max_dist=1
    ).collect()
    assert [(r["id_a"], r["id_b"], r["dist"]) for r in out] == [(1, 10, 1)]


def test_indel_found_when_chunk_survives(spark):
    # deletion at the very end: the FIRST aligned chunk still matches
    df = spark.createDataFrame(
        [(1, "longname-here"), (2, "longname-her")], ["id", "name"]
    )
    got = levenshtein_dedup_pairs(df, "id", "name", 1).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(1, 2)]


def test_hot_block_cap_bounds_candidates(spark):
    # 60 rows sharing an 8-char prefix: prefix chunk is a hot block
    rows = [(i, f"shared--{i:04d}") for i in range(60)]
    df = spark.createDataFrame(rows, ["id", "name"])
    uncapped = levenshtein_dedup_pairs(df, "id", "name", 1)
    capped = levenshtein_dedup_pairs(
        df, "id", "name", 1, max_block_size=10
    )
    assert capped.count() <= uncapped.count()
    # capped output is still FP-free (subset of exact matches)
    for r in capped.collect():
        assert r["dist"] <= 1


def test_block_stats_pressure(spark):
    rows = [(i, f"shared--{i:04d}") for i in range(30)]
    df = spark.createDataFrame(rows, ["id", "name"])
    stats = {
        (r["chunk_idx"], r["chunk"]): (r["n"], r["pairs"])
        for r in fuzzy_block_stats(df, "id", "name", 1).collect()
    }
    assert stats[(0, "shared")] == (30, 435)


def test_no_cartesian_in_plan(registry):
    plan = (
        levenshtein_dedup_pairs(registry, "id", "name", 1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_golden_records_survivorship(spark):
    from bi_utils_spark.operators.fuzzy import golden_records

    rows = [
        # cluster 1: newest row has NULL segment -> falls back to older
        (1, 1, 10, "alpha-corp", "retail", 100),
        (2, 1, 20, "alpha-corq", None, 200),
        # singleton cluster
        (5, 5, 7, "solo", "web", None),
    ]
    df = spark.createDataFrame(
        rows, ["id", "cluster", "updated", "name", "segment", "balance"]
    )
    out = {
        r["cluster"]: r
        for r in golden_records(
            df, "id", "cluster", "updated", ["name", "segment", "balance"]
        ).collect()
    }
    g = out[1]
    assert g["canonical_id"] == 1 and g["n_members"] == 2
    assert g["name"] == "alpha-corq"      # newest wins
    assert g["segment"] == "retail"       # null never overwrites
    assert g["balance"] == 200
    assert g["last_updated"] == 20
    s = out[5]
    assert s["canonical_id"] == 5 and s["balance"] is None


def test_golden_records_tiebreak_by_id(spark):
    from bi_utils_spark.operators.fuzzy import golden_records

    rows = [(1, 1, 10, "a"), (2, 1, 10, "b")]  # same updated
    df = spark.createDataFrame(rows, ["id", "cluster", "updated", "name"])
    out = golden_records(df, "id", "cluster", "updated", ["name"]).collect()[0]
    assert out["name"] == "b"  # (order, id) lexicographic max


def test_resolve_entities_end_to_end(spark):
    from bi_utils_spark.operators.fuzzy import resolve_entities

    rows = [
        (1, "acme-industries", 1, "old"),
        (2, "acme-industrees", 2, None),    # matches 1
        (3, "zenith-labs", 1, "z"),
    ]
    df = spark.createDataFrame(rows, ["id", "name", "updated", "note"])
    out = {
        r["cluster"]: r
        for r in resolve_entities(
            df, "id", "name", "updated", ["name", "note"]
        ).collect()
    }
    assert set(out) == {1, 3}
    assert out[1]["n_members"] == 2
    assert out[1]["name"] == "acme-industrees"  # newer spelling wins
    assert out[1]["note"] == "old"              # null never overwrites
    assert out[3]["n_members"] == 1
