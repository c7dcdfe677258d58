"""String zone maps with truncation semantics (r10).

Footer string min/max are recorded in the manifest (bounded to
`_STR_STAT_MAX` chars via the Delta/Iceberg truncate-and-increment
discipline), so `read_table(where="status = 'P'")` prunes files on
NON-partition string predicates; `table_stats` reports string
extremes as exact only when no live file's bound was truncated —
provably-exact-or-None, the X113 honesty gate extended to strings.
"""

from __future__ import annotations

import json

import pytest

from bi_utils_spark.operators import txtable as tx


def _sdf(spark, *pairs):
    return spark.createDataFrame(list(pairs), "k int, status string")


@pytest.fixture()
def stable(spark, tmp_path):
    """Two files with disjoint status ranges: ['aa'..'am'] and
    ['zx'..'zz']."""
    path = str(tmp_path / "t")
    tx.create_table(
        _sdf(spark, (1, "aa"), (2, "am")).coalesce(1), path
    )
    tx.append_table(_sdf(spark, (3, "zx"), (4, "zz")).coalesce(1), path)
    return path


def test_string_skip_prunes_files(spark, stable):
    snap = tx._fold(stable)
    assert all("status" in m["stats"] for m in snap.files.values())
    # equality predicate on a string column prunes to the one file
    # whose zone map covers it — manifest-level, before Spark
    df = tx.read_table(spark, stable, where="status = 'zz'")
    assert len(df.inputFiles()) == 1
    assert [r["k"] for r in df.collect()] == [4]
    df2 = tx.read_table(spark, stable, skip={"status": ("ab", "al")})
    assert len(df2.inputFiles()) == 1
    # out-of-range probe prunes everything
    df3 = tx.read_table(spark, stable, where="status = 'mm'")
    assert len(df3.inputFiles()) == 0 and df3.count() == 0


def test_string_stats_exact_when_untouched(spark, stable):
    st = tx.table_stats(stable, columns=["status"])
    assert st["columns"]["status"] == {"min": "aa", "max": "zz"}


def test_long_strings_truncate_conservatively(spark, tmp_path):
    path = str(tmp_path / "long")
    lo = "b" * 100 + "early"
    hi = "y" * 100 + "late"
    tx.create_table(_sdf(spark, (1, lo), (2, hi)).coalesce(1), path)
    snap = tx._fold(path)
    (meta,) = snap.files.values()
    rec_lo, rec_hi = meta["stats"]["status"]
    # bounded length, conservative direction: prefix <= real min,
    # incremented prefix >= real max
    assert len(rec_lo) <= tx._STR_STAT_MAX
    assert len(rec_hi) <= tx._STR_STAT_MAX
    assert rec_lo <= lo and rec_hi >= hi
    assert "status" in meta["stats_trunc"]
    # the manifest JSON itself never carries the 100-char bodies
    e = json.loads(open(tx._commit_file(path, 0)).read())
    assert all(
        len(v) <= tx._STR_STAT_MAX
        for a in e["added"]
        for v in a["stats"].get("status", [])
    )
    # truncated bounds are sound for skipping: the real value is
    # still found, never wrongly pruned
    df = tx.read_table(spark, path, where=f"status = '{hi}'")
    assert [r["k"] for r in df.collect()] == [2]
    # ...but NEVER reported as an exact extreme
    assert tx.table_stats(path, columns=["status"])["columns"][
        "status"
    ] is None


def test_str_upper_bound_increment():
    assert tx._str_upper_bound("abc" + "z" * 100) > "abc" + "z" * 200
    # max code point in last slot: bump an earlier one
    s = "a" * 63 + chr(0x10FFFF) * 10
    ub = tx._str_upper_bound(s)
    assert ub is not None and ub > s
    # unboundable: every code point already at the maximum
    assert tx._str_upper_bound(chr(0x10FFFF) * 80) is None


def test_truncated_col_skip_still_sound_after_merge(spark, tmp_path):
    """A rewrite carrying truncated stats keeps the marker through
    restore (meta passthrough paths)."""
    path = str(tmp_path / "rt")
    body = "k" * 200
    tx.create_table(_sdf(spark, (1, body)).coalesce(1), path)
    tx.append_table(_sdf(spark, (2, "short")).coalesce(1), path)
    tx.restore_table(spark, path, version=0)
    snap = tx._fold(path)
    (meta,) = snap.files.values()
    assert "status" in meta.get("stats_trunc", [])
    assert tx.table_stats(path, columns=["status"])["columns"][
        "status"
    ] is None
