"""Identity columns (r9).

`create_table(identity={col: {"start", "step"}})` declares GENERATED
ALWAYS identity columns: every append/overwrite allocates contiguous
values above the log's high-water mark with no global sort, values
are unique across concurrent writers (a lost race that interleaved
with another allocation re-allocates before rebasing), never reused
after deletes, and the definition survives checkpoints and clones.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from bi_utils_spark.operators import txtable as tx


def _rows(spark, ks):
    return spark.createDataFrame(
        [(f"u{k}", k * 10) for k in ks], "name string, v long"
    )


@pytest.fixture()
def itable(spark, tmp_path):
    path = str(tmp_path / "it")
    tx.create_table(
        _rows(spark, range(20)).repartition(4),
        path,
        identity={"id": {"start": 1, "step": 1}},
    )
    return path


def test_create_allocates_contiguous(spark, itable):
    ids = sorted(r["id"] for r in tx.read_table(spark, itable).collect())
    assert ids == list(range(1, 21))
    snap = tx._fold(itable)
    assert snap.identity_hwm == {"id": 20}
    assert "identityColumns" in snap.protocol["writer"]


def test_append_continues_above_hwm(spark, itable):
    tx.append_table(_rows(spark, range(100, 105)), itable)
    ids = sorted(r["id"] for r in tx.read_table(spark, itable).collect())
    assert ids == list(range(1, 26))


def test_start_step(spark, tmp_path):
    path = str(tmp_path / "ss")
    tx.create_table(
        _rows(spark, range(5)), path, identity={"id": {"start": 100,
                                                       "step": 7}}
    )
    ids = sorted(r["id"] for r in tx.read_table(spark, path).collect())
    assert ids == [100, 107, 114, 121, 128]
    with pytest.raises(ValueError, match="positive"):
        tx.create_table(
            _rows(spark, [1]), str(tmp_path / "neg"),
            identity={"id": {"step": -1}},
        )


def test_supplying_the_column_is_rejected(spark, itable):
    withid = _rows(spark, [500]).withColumn("id", F.lit(999))
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        tx.append_table(withid, itable)
    with pytest.raises(ValueError, match="cannot be SET"):
        tx.update_table(spark, itable, F.col("v") == 0, {"id": F.lit(0)})


def test_delete_never_reuses(spark, itable):
    tx.delete_from_table(spark, itable, F.col("id") > 10)
    tx.append_table(_rows(spark, [200]), itable)
    ids = sorted(r["id"] for r in tx.read_table(spark, itable).collect())
    assert ids == list(range(1, 11)) + [21]


def test_overwrite_continues_not_restarts(spark, itable):
    tx.overwrite_table(_rows(spark, range(3)), itable)
    ids = sorted(r["id"] for r in tx.read_table(spark, itable).collect())
    assert ids == [21, 22, 23]


def test_merge_allocates_inserts_keeps_updates(spark, itable):
    # u3 exists (update — keeps its id), u777/u888 are new (inserts —
    # allocate above the high-water mark)
    before = {
        r["name"]: r["id"]
        for r in tx.read_table(spark, itable).collect()
    }
    src = spark.createDataFrame(
        [("u3", 999), ("u777", 1), ("u888", 2)], "name string, v long"
    )
    tx.merge_tx_table(spark, itable, src, ["name"])
    after = {
        r["name"]: (r["id"], r["v"])
        for r in tx.read_table(spark, itable).collect()
    }
    assert after["u3"] == (before["u3"], 999)  # id stable, value new
    assert {after["u777"][0], after["u888"][0]} == {21, 22}
    ids = [i for i, _ in after.values()]
    assert len(set(ids)) == len(ids)
    assert tx._fold(itable).identity_hwm == {"id": 22}


def test_merge_source_must_not_supply_identity(spark, itable):
    src = spark.createDataFrame(
        [("u1", 1, 5)], "name string, v long, id long"
    )
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        tx.merge_tx_table(spark, itable, src, ["name"])


def test_merge_with_delete_col_allocates_only_landings(spark, itable):
    src = spark.createDataFrame(
        [("u1", 0, True), ("u900", 9, False)],
        "name string, v long, _del boolean",
    )
    tx.merge_tx_table(spark, itable, src, ["name"], delete_col="_del")
    got = {
        r["name"]: r["id"] for r in tx.read_table(spark, itable).collect()
    }
    assert "u1" not in got
    assert got["u900"] == 21
    assert len(got) == 20  # 20 - 1 deleted + 1 inserted


def test_concurrent_merge_and_append_never_duplicate_ids(spark, itable):
    """A merge racing an append either commits cleanly or raises the
    identity-allocation conflict; a retry re-allocates. Either way
    ids stay unique."""
    errs = []

    def _merge():
        src = spark.createDataFrame(
            [("m1", 1), ("m2", 2)], "name string, v long"
        )
        for _ in range(3):
            try:
                tx.merge_tx_table(spark, itable, src, ["name"])
                return
            except tx.ConcurrentWriteError:
                continue
            except Exception as e:  # noqa: BLE001
                errs.append(e)
                return
        errs.append(RuntimeError("merge never committed"))

    def _append():
        try:
            tx.append_table(_rows(spark, range(700, 705)), itable)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    import threading as _t

    ts = [_t.Thread(target=_merge), _t.Thread(target=_append)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    ids = [r["id"] for r in tx.read_table(spark, itable).collect()]
    assert len(ids) == 27
    assert len(set(ids)) == 27, "race allocated duplicate ids"


def test_rename_drop_guards(spark, itable):
    with pytest.raises(ValueError, match="identity column"):
        tx.rename_column(itable, "id", "pk")
    with pytest.raises(ValueError, match="identity column"):
        tx.drop_column(itable, "id")
    tx.rename_column(itable, "v", "val")  # others still fine


def test_concurrent_appends_stay_unique(spark, itable):
    errs = []

    def _one(lo):
        try:
            tx.append_table(_rows(spark, range(lo, lo + 10)), itable)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=_one, args=(1000 * i,)) for i in (1, 2, 3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    ids = [r["id"] for r in tx.read_table(spark, itable).collect()]
    assert len(ids) == 50
    assert len(set(ids)) == 50, "concurrent appends allocated duplicates"
    assert sorted(ids) == list(range(1, 51))
    assert tx._fold(itable).identity_hwm == {"id": 50}


def test_empty_append_moves_nothing(spark, itable):
    tx.append_table(_rows(spark, []), itable)
    assert tx._fold(itable).identity_hwm == {"id": 20}


def test_survives_checkpoint_and_clones(spark, itable, tmp_path):
    for i in range(tx.CHECKPOINT_EVERY + 1):
        tx.append_table(_rows(spark, [300 + i]), itable)
    assert tx._list_log(itable)[1]
    snap = tx._fold(itable)
    assert snap.identity == {"id": {"start": 1, "step": 1}}
    assert snap.identity_hwm == {"id": 20 + tx.CHECKPOINT_EVERY + 1}
    shallow = str(tmp_path / "sc")
    tx.clone_table(spark, itable, shallow)
    tx.append_table(_rows(spark, [900]), shallow)
    clone_ids = {
        r["id"] for r in tx.read_table(spark, shallow).collect()
    }
    assert max(clone_ids) == snap.identity_hwm["id"] + 1
    deep = str(tmp_path / "dc")
    tx.clone_table(spark, itable, deep, shallow=False)
    dsnap = tx._fold(deep)
    assert dsnap.identity == snap.identity
    assert dsnap.identity_hwm == snap.identity_hwm
    tx.append_table(_rows(spark, [901]), deep)
    deep_ids = [r["id"] for r in tx.read_table(spark, deep).collect()]
    assert len(set(deep_ids)) == len(deep_ids)


def test_streaming_sink_allocates_exactly_once(spark, itable):
    """foreach_batch_sink appends ride the same allocation path: each
    micro-batch gets fresh ids and a REDELIVERED batch allocates
    nothing (the idempotence mark short-circuits before staging)."""
    sink = tx.foreach_batch_sink(itable, app_id="ident-stream")
    b0 = _rows(spark, range(100, 105))
    sink(b0, 0)
    hwm_after = tx._fold(itable).identity_hwm["id"]
    assert hwm_after == 25
    sink(b0, 0)  # redelivery: no allocation, no commit
    assert tx._fold(itable).identity_hwm["id"] == 25
    sink(_rows(spark, range(200, 203)), 1)
    ids = [r["id"] for r in tx.read_table(spark, itable).collect()]
    assert sorted(ids) == list(range(1, 29))


def test_identity_cannot_partition_or_double_as_generated(spark, tmp_path):
    with pytest.raises(ValueError, match="partition"):
        tx.create_table(
            _rows(spark, [1]), str(tmp_path / "p"),
            partition_cols=["id"], identity={"id": {}},
        )
    with pytest.raises(ValueError, match="both generated and identity"):
        tx.create_table(
            _rows(spark, [1]), str(tmp_path / "g"),
            generated={"id": "v + 1"}, identity={"id": {}},
        )
