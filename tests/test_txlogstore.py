"""LogStore seam (r10): the commit-claim backend is pluggable.

The tx protocol's only atomicity requirement is PUT-IF-ABSENT of one
immutable blob per commit slot. `LinkingLogStore` (default) implements
it with tmp+fsync+os.link — correct on rename-atomic filesystems. An
object-store deployment swaps in a conditional-PUT backend via
`set_log_store`; the `ConditionalPutStore` double below pins the
semantics such a backend must satisfy — losing a race returns False
with the winner's blob durably in place, transient faults raise
without leaving a partial commit — and the race tests prove the
protocol composes with any compliant backend.
"""

from __future__ import annotations

import json
import os
import threading
import time

import pytest

from bi_utils_spark.operators import txtable as tx


def _rows(spark, *triples):
    return spark.createDataFrame(
        [(k, s, v) for k, s, v in triples], "k int, status string, v long"
    )


def _as_dict(df):
    return {r["k"]: (r["status"], r["v"]) for r in df.collect()}


class ConditionalPutStore(tx.LogStore):
    """S3-conditional-PUT-shaped double: exists-check + atomic replace
    under a mutex (the If-None-Match semantics), with injectable lost
    races (a racing writer's commit lands first) and transient faults
    (raises, leaving NO partial blob)."""

    def __init__(self) -> None:
        self.lock = threading.Lock()
        self.puts = 0
        self.lose_next = 0
        self.fail_next = 0

    def put_if_absent(self, full_path: str, data: bytes) -> bool:
        with self.lock:
            self.puts += 1
            if self.fail_next > 0:
                self.fail_next -= 1
                raise IOError("injected transient store failure")
            if self.lose_next > 0 and not os.path.exists(full_path):
                self.lose_next -= 1
                stem = os.path.basename(full_path).split(".")[0]
                racer = {
                    "version": int(stem),
                    "action": "append",
                    "added": [],
                    "removed": [],
                    "ts": time.time(),
                }
                self._write(full_path, json.dumps(racer).encode())
                return False
            if os.path.exists(full_path):
                return False
            self._write(full_path, data)
            return True

    @staticmethod
    def _write(full_path: str, data: bytes) -> None:
        os.makedirs(os.path.dirname(full_path), exist_ok=True)
        tmp = f"{full_path}.tmp-{threading.get_ident()}"
        with open(tmp, "wb") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, full_path)

    def list_names(self, log_dir: str) -> list[str]:
        if not os.path.isdir(log_dir):
            return []
        return os.listdir(log_dir)


@pytest.fixture()
def cond_store():
    store = ConditionalPutStore()
    prev = tx.set_log_store(store)
    assert isinstance(prev, tx.LinkingLogStore)
    try:
        yield store
    finally:
        restored = tx.set_log_store(None)
        assert restored is store
        assert isinstance(tx._LOG_STORE, tx.LinkingLogStore)


def test_default_store_is_linking(spark, tmp_path):
    assert isinstance(tx._LOG_STORE, tx.LinkingLogStore)
    path = str(tmp_path / "t")
    tx.create_table(_rows(spark, (1, "A", 10)), path)
    assert tx.latest_version(path) == 0


def test_full_arc_through_conditional_put(spark, tmp_path, cond_store):
    path = str(tmp_path / "t")
    tx.create_table(_rows(spark, (1, "A", 10), (2, "A", 20)), path)
    tx.append_table(_rows(spark, (3, "B", 30)), path)
    tx.merge_tx_table(
        spark, path, _rows(spark, (2, "U", 99), (4, "I", 44)), ["k"]
    )
    assert _as_dict(tx.read_table(spark, path)) == {
        1: ("A", 10),
        2: ("U", 99),
        3: ("B", 30),
        4: ("I", 44),
    }
    assert cond_store.puts >= 3
    # time travel folds the same log the double wrote
    assert set(_as_dict(tx.read_table(spark, path, version=0))) == {1, 2}


def test_append_rebases_past_injected_lost_race(spark, tmp_path, cond_store):
    path = str(tmp_path / "t")
    tx.create_table(_rows(spark, (1, "A", 10)), path)
    cond_store.lose_next = 1  # a racer owns the next slot
    v = tx.append_table(_rows(spark, (2, "B", 20)), path)
    assert v == 2  # rebased past the racer's v1
    assert set(_as_dict(tx.read_table(spark, path))) == {1, 2}


def test_rewrite_raises_on_injected_lost_race(spark, tmp_path, cond_store):
    path = str(tmp_path / "t")
    tx.create_table(_rows(spark, (1, "A", 10)), path)
    cond_store.lose_next = 1
    with pytest.raises(tx.ConcurrentWriteError):
        # unpartitioned overwrite reasons about the whole snapshot —
        # ANY interleaved commit is a conflict, same as the default
        # backend's behavior
        tx.overwrite_table(_rows(spark, (9, "Z", 90)), path)
    # the racer's commit is real; the table still reads consistently
    assert set(_as_dict(tx.read_table(spark, path))) == {1}


def test_transient_fault_leaves_no_partial_commit(
    spark, tmp_path, cond_store
):
    path = str(tmp_path / "t")
    tx.create_table(_rows(spark, (1, "A", 10)), path)
    v_before = tx.latest_version(path)
    cond_store.fail_next = 1
    with pytest.raises(IOError, match="transient"):
        tx.append_table(_rows(spark, (2, "B", 20)), path)
    assert tx.latest_version(path) == v_before
    assert set(_as_dict(tx.read_table(spark, path))) == {1}
    # the retry commits cleanly (the failed attempt's staged files are
    # strays for vacuum, never part of the log)
    tx.append_table(_rows(spark, (2, "B", 20)), path)
    assert set(_as_dict(tx.read_table(spark, path))) == {1, 2}


def test_entry_reads_route_through_store(spark, tmp_path):
    """The seam covers the whole log lifecycle: folds and feed reads
    fetch commit blobs via read_bytes, not bare open() — a pure-API
    backend needs no local files for the log."""

    class CountingStore(ConditionalPutStore):
        def __init__(self) -> None:
            super().__init__()
            self.reads = 0

        def read_bytes(self, full_path: str) -> bytes:
            self.reads += 1
            return tx.LogStore.read_bytes(self, full_path)

    store = CountingStore()
    prev = tx.set_log_store(store)
    try:
        path = str(tmp_path / "t")
        tx.create_table(_rows(spark, (1, "A", 10)), path)
        tx.append_table(_rows(spark, (2, "B", 20)), path)
        store.reads = 0
        snap = tx._fold(path)
        assert snap.version == 1 and store.reads >= 2
        store.reads = 0
        tx.table_changes_cdf(spark, path, after_version=-1).count()
        assert store.reads >= 2
    finally:
        tx.set_log_store(prev)


def test_threaded_appends_race_through_double(spark, tmp_path, cond_store):
    path = str(tmp_path / "t")
    tx.create_table(_rows(spark, (0, "A", 0)), path)
    errs: list[Exception] = []

    def worker(k: int) -> None:
        try:
            tx.append_table(_rows(spark, (k, "B", k)), path)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in (1, 2, 3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert tx.latest_version(path) == 3  # three distinct slots claimed
    assert set(_as_dict(tx.read_table(spark, path))) == {0, 1, 2, 3}
