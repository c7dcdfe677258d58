"""r10 property tests: randomized DML arcs pin the change feed.

For seeded-random arcs of append/merge/delete/update (MOR and COW
mixed), run the SAME arc on a cdc-enabled table and a plain one:

1. the commit-time-change-file feed (read with NO pks) must equal the
   pk-join-derived feed of the plain table row-for-row (after the
   one-commit version shift the set_cdc commit introduces), and
2. folding the feed into a fresh table via `cdf_apply_batch` must
   converge to the upstream live snapshot.

Deterministic seeds rather than hypothesis: every Spark-backed example
costs real jobs, so a handful of well-mixed arcs beats shrinking.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from bi_utils_spark.operators import txtable as tx


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v long")


def _arc_ops(seed: int):
    rng = random.Random(seed)
    ops = []
    for _ in range(5):
        kind = rng.choice(["append", "merge", "delete", "update"])
        mode = rng.choice(["mor", "cow"])
        keys = rng.sample(range(30), rng.randint(1, 6))
        bump = rng.randint(1, 99)
        ops.append((kind, mode, keys, bump))
    return ops


def _apply_arc(spark, path: str, ops) -> None:
    for kind, mode, keys, bump in ops:
        if kind == "append":
            # append only brand-new keys (k >= 100 namespace)
            tx.append_table(
                _df(spark, [(100 + k, bump) for k in keys]), path
            )
        elif kind == "merge":
            src = _df(spark, [(k, k * bump) for k in keys]).withColumn(
                "__del", F.col("k") % 7 == 0
            )
            tx.merge_tx_table(spark, path, src, ["k"], delete_col="__del")
        elif kind == "delete":
            tx.delete_from_table(
                spark, path, f"k % 11 = {bump % 11}", mode=mode
            )
        else:
            tx.update_table(
                spark,
                path,
                f"k % 5 = {bump % 5}",
                {"v": f"v + {bump}"},
                mode=mode,
            )


def _feed_rows(spark, path: str, pks, shift: int):
    df = tx.table_changes_cdf(spark, path, pks, after_version=-1)
    out = []
    for r in df.collect():
        v = r["_commit_version"]
        out.append((r["k"], r["v"], r["_change_type"], v if v == 0 else v - shift))
    return sorted(out)


@pytest.mark.parametrize("seed", [7, 19, 23, 41])
def test_random_arc_feed_equivalence_and_replay(spark, tmp_path, seed):
    ops = _arc_ops(seed)
    base = [(k, 10 * k) for k in range(0, 25, 2)]
    a = str(tmp_path / "cdc")
    b = str(tmp_path / "plain")
    tx.create_table(_df(spark, base), a)
    tx.enable_change_data(a)
    tx.create_table(_df(spark, base), b)
    _apply_arc(spark, a, ops)
    _apply_arc(spark, b, ops)
    # the arcs landed the same live snapshot
    snap_a = sorted(
        (r["k"], r["v"]) for r in tx.read_table(spark, a).collect()
    )
    snap_b = sorted(
        (r["k"], r["v"]) for r in tx.read_table(spark, b).collect()
    )
    assert snap_a == snap_b
    # 1) pk-less change-file feed == pk-join-derived feed
    assert _feed_rows(spark, a, None, shift=1) == _feed_rows(
        spark, b, ["k"], shift=0
    )
    # 2) folding the feed replays the snapshot exactly
    replica = str(tmp_path / "replica")
    tx.create_table(_df(spark, []), replica)
    feed = tx.table_changes_cdf(spark, a, after_version=-1)
    tx.cdf_apply_batch(spark, replica, feed, ["k"])
    got = sorted(
        (r["k"], r["v"]) for r in tx.read_table(spark, replica).collect()
    )
    assert got == snap_a
