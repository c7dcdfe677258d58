"""Concurrency fuzz harness for the tx layer (r10 verdict task 6).

Racing writer threads fire seeded-random DML/maintenance arcs —
append, merge, delete, update (MOR and COW), compact, vacuum,
check-constraint add/drop, and (r12, verdict task 6) the schema/DDL
verbs where optimistic rebases are most likely to hide a bug:
add_column, rename_column, and repartition_table racing the DML —
at ONE table through the optimistic commit protocol. The WriteSerializable claim under test: whatever
interleaving the race produced, the final table state equals a
SERIAL replay of the committed operations in commit (version) order.

Mechanics: each writer retries an op on ConcurrentWriteError (the
protocol's stale-snapshot signal) and records the VERSION its commit
landed at — put-if-absent guarantees exactly one owner per slot, so
the recorded map is a total order. The harness then:

1. accounts for every log slot: versions 1..latest are exactly the
   recorded commits (no phantom, no lost commit);
2. replays the recorded ops single-threaded in the EQUIVALENT SERIAL
   ORDER onto a fresh table and asserts the live snapshots match
   row-for-row;
3. asserts the surviving constraint metadata matches the replay's.

The equivalent serial order is NOT commit order: WriteSerializable
(the Delta isolation level this protocol implements) lets a rewrite
commit at a later slot after rebasing over blind appends it never
read — e.g. DELETE folds snapshot 5, a racing append lands k=1001 at
slot 6, the delete commits at slot 7 WITHOUT having seen k=1001 even
when 1001 matches its predicate. The delete therefore serializes at
its READ version, before the append. Every rewriting commit records
that position as ``read_version`` (Delta's commitInfo.readVersion),
and the replay sorts by effective key: blind appends at
(commit_version, 0), rewrites at (read_version, 1, commit_version).
Merges never reorder (their partition conflict rule refuses to
rebase over appends into touched partitions — the whole table when
unpartitioned), which the key reproduces since un-rebased rewrites
have read_version = commit_version - 1.

Deterministic seeds rather than hypothesis (the test_r10_properties
rule): every op is a real Spark job, so a few well-mixed arcs beat
shrinking. Thread scheduling stays nondeterministic — the point is
that the ASSERTION holds for every schedule, and the committed-order
replay is computed from the schedule that actually happened.
"""

from __future__ import annotations

import random
import threading

import pytest
from pyspark.sql import functions as F

from bi_utils_spark.operators import txtable as tx
from bi_utils_spark.operators.txtable import CheckViolation, ConcurrentWriteError

N_WRITERS = 3
OPS_PER_WRITER = 20
MAX_RETRIES = 120


def _df(spark, rows):
    """Writer rows carry a deterministic partition column p = k % 3
    so `repartition_table(["p"])` arcs compose with every other op
    (p is a pure function of k — merges stay partition-stable)."""
    return spark.createDataFrame(
        [(k, v, k % 3) for k, v in rows], "k int, v long, p int"
    )


def _writer_ops(seed: int, wid: int):
    """≥ OPS_PER_WRITER seeded ops for one writer: mixed DML +
    maintenance + DDL. Descriptors are plain tuples so the serial
    replay re-executes exactly what the concurrent run committed
    (stateful resolutions — which column a rename picked, which spec
    a respec toggled to — are recovered from the live log entry at
    replay time)."""
    rng = random.Random(seed * 1000 + wid)
    ops = []
    for i in range(OPS_PER_WRITER):
        kind = rng.choice(
            ["append", "merge", "merge", "delete", "update",
             "compact", "vacuum", "addc", "dropc",
             "addcol", "rename", "respec"]
        )
        if kind == "append":
            keys = rng.sample(range(100), rng.randint(1, 5))
            ops.append(("append", [(1000 * wid + k, rng.randint(1, 99))
                                   for k in keys]))
        elif kind == "merge":
            keys = rng.sample(range(40), rng.randint(1, 6))
            ops.append(("merge", keys, rng.randint(1, 99)))
        elif kind == "delete":
            ops.append(("delete", f"k % 11 = {rng.randint(0, 10)}",
                        rng.choice(["mor", "cow"])))
        elif kind == "update":
            ops.append(("update", f"k % 7 = {rng.randint(0, 6)}",
                        rng.randint(1, 99), rng.choice(["mor", "cow"])))
        elif kind == "compact":
            ops.append(("compact",))
        elif kind == "vacuum":
            ops.append(("vacuum",))
        elif kind == "addc":
            ops.append(("addc", f"c_{wid}_{i}",
                        rng.choice(["v >= 0", "k >= 0", "v IS NOT NULL"])))
        elif kind == "dropc":
            ops.append(("dropc", wid))
        elif kind == "addcol":
            ops.append(("addcol", f"x_{wid}_{i}"))
        elif kind == "rename":
            # renames this writer's oldest surviving x_-column
            # (stateful — the replay recovers the exact pair from the
            # live log entry's "renamed" record)
            ops.append(("rename", wid))
        else:
            # toggles the partition spec: ["p"] <-> [] — every toggle
            # puts the OTHER era's live files into old-spec (stale)
            # state, stressing mixed-spec reads/merges/compactions
            ops.append(("respec",))
    return ops


def _apply_op(spark, path: str, op) -> int | None:
    """Execute one descriptor; return the committed version, or None
    for versionless maintenance (vacuum) / no-op drops."""
    kind = op[0]
    if kind == "append":
        return tx.append_table(_df(spark, op[1]), path)
    if kind == "merge":
        _, keys, bump = op
        src = _df(spark, [(k, k * bump) for k in keys]).withColumn(
            "__del", F.col("k") % 9 == 0
        )
        return tx.merge_tx_table(spark, path, src, ["k"], delete_col="__del")
    if kind == "delete":
        return tx.delete_from_table(spark, path, op[1], mode=op[2])["version"]
    if kind == "update":
        _, cond, bump, mode = op
        return tx.update_table(
            spark, path, cond, {"v": f"v + {bump}"}, mode=mode
        )["version"]
    if kind == "compact":
        return tx.compact_table(spark, path, target_files=2)
    if kind == "vacuum":
        # maintenance, not a commit: default stray age (in-flight
        # staged files stay safe), generous version retention so
        # concurrent rewrites rebase instead of losing their base.
        tx.vacuum_table(path, retain_versions=5)
        return None
    if kind == "addc":
        return tx.add_check_constraint(spark, path, op[1], op[2])
    if kind == "dropc":
        # drop this writer's OLDEST surviving constraint, if any
        snap = tx._fold(path)
        mine = sorted(n for n in snap.constraints if n.startswith(f"c_{op[1]}_"))
        if not mine:
            return None
        try:
            return tx.drop_check_constraint(path, mine[0])
        except ValueError:
            return None  # raced with another drop of the same name
    if kind == "addcol":
        return tx.add_column(path, op[1], "long")
    if kind == "rename":
        snap = tx._fold(path)
        mine = sorted(
            f.name
            for f in snap.spark_schema().fields
            if f.name.startswith(f"x_{op[1]}_")
        )
        if not mine:
            return None  # nothing of ours to rename yet
        return tx.rename_column(path, mine[0], "y" + mine[0][1:])
    if kind == "respec":
        target = [] if tx._fold(path).partition_cols == ["p"] else ["p"]
        try:
            return tx.repartition_table(path, target)
        except ValueError:
            return None  # raced to the same spec: already there
    raise AssertionError(kind)


@pytest.mark.parametrize("seed", [11, 29, 47, 61])
def test_racing_writers_serialize(spark, tmp_path, seed):
    path = str(tmp_path / "fuzz")
    base = [(k, 10 * k) for k in range(0, 40, 2)]
    tx.create_table(_df(spark, base), path)

    committed: dict[int, tuple] = {}
    skipped: list[tuple] = []
    lock = threading.Lock()
    errors: list[BaseException] = []

    def run_writer(wid: int):
        try:
            for op in _writer_ops(seed, wid):
                for attempt in range(MAX_RETRIES):
                    try:
                        v = _apply_op(spark, path, op)
                    except ConcurrentWriteError:
                        continue  # stale snapshot — re-resolve and retry
                    except CheckViolation:
                        with lock:
                            skipped.append(op)
                        break  # constraint rejected the batch: no commit
                    with lock:
                        if v is not None:
                            assert v not in committed, (
                                f"version {v} claimed twice: "
                                f"{committed[v]} then {op}"
                            )
                            committed[v] = op
                    break
                else:
                    raise AssertionError(f"op never committed: {op}")
        except BaseException as e:  # surface thread failures in the test
            with lock:
                errors.append(e)

    threads = [
        threading.Thread(target=run_writer, args=(wid,))
        for wid in range(N_WRITERS)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    # --- 1) log accounting: every slot 1..latest is a recorded commit
    latest = tx.latest_version(path)
    assert set(committed) == set(range(1, latest + 1))

    # --- 2) replay in the equivalent serial order reproduces the state
    def effective_key(v: int) -> tuple:
        entry = tx._load_entry(path, v)
        rv = entry.get("read_version")
        if rv is None:  # blind append: serializes at its commit slot
            return (v, 0, v)
        return (rv, 1, v)  # rewrite: serializes at its read snapshot

    replay = str(tmp_path / "replay")
    tx.create_table(_df(spark, base), replay)
    for v in sorted(committed, key=effective_key):
        op = committed[v]
        if op[0] == "dropc":
            # replay must drop the SAME constraint the live run dropped
            # (the name resolution above is stateful); recover it from
            # the live log entry instead of re-resolving.
            live_before = tx._fold(path, v - 1).constraints
            live_after = tx._fold(path, v).constraints
            gone = set(live_before) - set(live_after)
            assert len(gone) == 1
            tx.drop_check_constraint(replay, gone.pop())
        elif op[0] == "rename":
            # same recovery: the live entry records the exact pair
            old, new = tx._load_entry(path, v)["renamed"]
            tx.rename_column(replay, old, new)
        elif op[0] == "respec":
            # the toggle is stateful; the live entry records the spec
            tx.repartition_table(
                replay, tx._load_entry(path, v)["partition_cols"]
            )
        else:
            _apply_op(spark, replay, op)

    live_schema = tx._fold(path).spark_schema()
    replay_schema = tx._fold(replay).spark_schema()
    assert live_schema.fieldNames() == replay_schema.fieldNames()
    assert [f.dataType for f in live_schema.fields] == [
        f.dataType for f in replay_schema.fields
    ]
    assert tx._fold(path).partition_cols == tx._fold(replay).partition_cols
    cols = live_schema.fieldNames()
    got = sorted(
        tuple(r[c] for c in cols)
        for r in tx.read_table(spark, path).collect()
    )
    want = sorted(
        tuple(r[c] for c in cols)
        for r in tx.read_table(spark, replay).collect()
    )
    assert got == want
    assert got  # the arcs never empty the table entirely

    # --- 3) surviving constraint metadata matches the replay's
    assert tx._fold(path).constraints == tx._fold(replay).constraints
