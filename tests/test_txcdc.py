"""Commit-time change data (r10) — the Delta `_change_data` /
`delta.enableChangeDataFeed` analog.

`enable_change_data(path)` makes every rewriting DML commit (merge /
delete / update, both MOR and COW) persist its typed change rows as
parquet under `_change_data/`, referenced by the commit entry. The
change feed then becomes a pure SCAN for those commits: no read-time
pre/post join, no primary-key requirement, and the STREAM ships one
task per change file — the distributed answer to the r9 verdict's
single-task rewriting-commit defect.

Cites the public Delta Lake CDF design (change data files written by
UPDATE/DELETE/MERGE; readers prefer them over join derivation).
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from bi_utils_spark.operators import txtable as tx
from bi_utils_spark.sources import txsource
from bi_utils_spark.sources.txsource import (
    TxCdcFilePartition,
    register_txtable_source,
)


def _rows(spark, *triples):
    return spark.createDataFrame(
        [(k, s, v) for k, s, v in triples], "k int, status string, v long"
    )


def _as_dict(df):
    return {r["k"]: (r["status"], r["v"]) for r in df.collect()}


def _feed_set(df):
    return {
        (r["k"], r["_change_type"], r["_commit_version"], r["status"], r["v"])
        for r in df.collect()
    }


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_txtable_source(spark)


def _arc(spark, path, cdc: bool):
    """create -> (enable) -> append -> merge(update+insert+delete) ->
    MOR delete -> MOR update. Same commits either way; cdc controls
    whether change data is persisted."""
    tx.create_table(
        _rows(spark, (1, "A", 10), (2, "B", 20)),
        path,
        partition_cols=["status"],
    )
    if cdc:
        tx.enable_change_data(path)
    tx.append_table(_rows(spark, (3, "A", 30)), path)
    src = _rows(spark, (1, "A", 11), (4, "B", 40), (3, "A", 0)).withColumn(
        "__del", F.col("k") == 3
    )
    tx.merge_tx_table(spark, path, src, ["k"], delete_col="__del")
    tx.delete_from_table(spark, path, "k = 2", mode="mor")
    tx.update_table(spark, path, "k = 4", {"v": "v + 2"}, mode="mor")


def test_enable_is_idempotent_and_stamps_feature(spark, tmp_path):
    path = str(tmp_path / "t")
    tx.create_table(_rows(spark, (1, "A", 10)), path)
    v1 = tx.enable_change_data(path)
    snap = tx._fold(path)
    assert snap.cdc_enabled
    assert "changeDataFeed" in snap.protocol["writer"]
    assert tx.enable_change_data(path) == v1  # no second commit
    # checkpoints carry the flag
    tx._write_checkpoint(path, v1)
    assert tx._fold(path).cdc_enabled


def test_rewrites_persist_change_files(spark, tmp_path):
    path = str(tmp_path / "t")
    _arc(spark, path, cdc=True)
    kinds = {}
    for v in range(tx.latest_version(path) + 1):
        e = json.loads(open(tx._commit_file(path, v)).read())
        if "cdc" in e:
            kinds[e["action"]] = e["cdc"]
    assert set(kinds) == {"merge", "delete", "update"}
    for recs in kinds.values():
        assert recs, "each rewriting DML recorded at least one file"
        for r in recs:
            full = os.path.join(path, r["path"])
            assert r["path"].startswith(tx.CDC_DIR)
            assert os.path.exists(full)
            assert r["rows"] >= 1 and r["bytes"] > 0


def test_feed_from_change_files_matches_join_derivation(spark, tmp_path):
    """The VERDICT done-criterion: the same DML arc replayed through
    commit-time change files matches the pk-join-derived feed
    row-for-row — with and without preimages."""
    a = str(tmp_path / "cdc")
    b = str(tmp_path / "plain")
    _arc(spark, a, cdc=True)
    _arc(spark, b, cdc=False)

    def _norm(df):
        # the cdc arc has one extra metadata commit (set_cdc at v1),
        # shifting every later version by 1 — compare by change order
        return sorted(
            (r["k"], r["_change_type"], r["status"], r["v"])
            for r in df.collect()
        )

    for pre in (False, True):
        via_files = tx.table_changes_cdf(
            spark, a, after_version=-1, include_preimage=pre
        )  # NO pks — the change-file path
        via_join = tx.table_changes_cdf(
            spark, b, ["k"], after_version=-1, include_preimage=pre
        )
        assert _norm(via_files) == _norm(via_join)
    # spot-check the typed content of the full-fidelity feed
    got = {
        (r["k"], r["_change_type"])
        for r in tx.table_changes_cdf(
            spark, a, after_version=-1, include_preimage=True
        ).collect()
    }
    assert ("1", "update_preimage") not in got  # k is int, sanity
    assert (1, "update_preimage") in got and (1, "update_postimage") in got
    assert (2, "delete") in got and (3, "delete") in got
    assert (4, "update_preimage") in got  # the MOR update pair
    assert (4, "update_postimage") in got


def test_pkless_feed_and_join_fallback_guidance(spark, tmp_path):
    path = str(tmp_path / "nopk")
    _arc(spark, path, cdc=False)
    with pytest.raises(ValueError, match="enable_change_data"):
        tx.table_changes_cdf(spark, path, after_version=-1).collect()
    # append-only ranges never join: pk-less works without change data
    ap = str(tmp_path / "ap")
    tx.create_table(_rows(spark, (1, "A", 10)), ap)
    tx.append_table(_rows(spark, (2, "B", 20)), ap)
    feed = tx.table_changes_cdf(spark, ap, after_version=-1)
    assert {(r["k"], r["_change_type"]) for r in feed.collect()} == {
        (1, "insert"),
        (2, "insert"),
    }


def test_duplicate_key_table_feeds_exactly(spark, tmp_path):
    """The defect change files close: a NON-unique 'pk' misclassifies
    the join-derived feed (dict/struct collisions), while commit-time
    rows record what the DML actually did."""
    path = str(tmp_path / "dup")
    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z")], "k int, s string"
    )
    tx.create_table(df, path)
    tx.enable_change_data(path)
    r = tx.delete_from_table(spark, path, "s = 'y'", mode="cow")
    assert r["rows_deleted"] == 1
    feed = tx.table_changes_cdf(
        spark, path, after_version=0
    )  # pk-less: k alone could not have disambiguated the two k=1 rows
    assert {(r["k"], r["s"], r["_change_type"]) for r in feed.collect()} == {
        (1, "y", "delete")
    }


def test_stream_rewrite_ships_per_file_partitions(spark, tmp_path):
    """The r9 verdict's done-criterion: a merge's change rows span
    >= 4 InputPartitions (one per change file), not one joining
    task."""
    path = str(tmp_path / "fan")
    base = spark.createDataFrame(
        [(i, "d", i) for i in range(400)], "k int, status string, v long"
    )
    tx.create_table(base, path, partition_cols=["status"])
    tx.enable_change_data(path)
    src = spark.createDataFrame(
        [(i, "d", i * 10 + 1) for i in range(400)],
        "k int, status string, v long",
    ).repartition(8)
    # at test scale AQE rightly coalesces the tiny change set to one
    # file; disable coalescing to mirror the at-scale topology, where
    # each advisory-sized shuffle partition lands its own change file
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    try:
        tx.merge_tx_table(spark, path, src, ["k"])
    finally:
        spark.conf.set(coalesce_key, prev)
    merge_v = tx.latest_version(path)
    reader = txsource.TxStreamReader(
        txsource.TxTableDataSource(
            {"path": path, "changeFeed": "true"}
        ).schema(),
        {"path": path, "changeFeed": "true"},
    )
    parts = reader.partitions({"version": merge_v - 1}, {"version": merge_v})
    cdc_parts = [p for p in parts if isinstance(p, TxCdcFilePartition)]
    assert len(cdc_parts) == len(parts) >= 4
    # and the partitions' union is the commit's exact typed rows
    rows = [r for p in cdc_parts for r in reader.read(p)]
    assert len(rows) == 400  # 400 update_postimage (preimages filtered)
    assert {r[-2] for r in rows} == {"update_postimage"}
    assert {r[-1] for r in rows} == {merge_v}


def test_stream_pkless_cdc_table_end_to_end(spark, tmp_path):
    path = str(tmp_path / "pkless")
    ckpt = str(tmp_path / "ckpt")
    _arc(spark, path, cdc=True)
    q = (
        spark.readStream.format("txtable")
        .option("path", path)
        .option("changeFeed", "true")  # NO pks option
        .load()
        .writeStream.format("memory")
        .queryName("cdcstream")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["k"], r["_change_type"], r["status"], r["v"])
        for r in spark.sql("SELECT * FROM cdcstream").collect()
    }
    # same rows as the batch feed without preimages (stream contract)
    want = {
        (r["k"], r["_change_type"], r["status"], r["v"])
        for r in tx.table_changes_cdf(
            spark, path, after_version=-1
        ).collect()
    }
    assert got == want
    assert all(t[1] != "update_preimage" for t in got)


def test_stream_include_preimages(spark, tmp_path):
    """includePreimages=true streams update_preimage rows too — from
    change files (cdc tables) AND from the join fallback — matching
    the batch feed's include_preimage=True rendering."""
    for name, cdc in (("cdcp", True), ("plainp", False)):
        path = str(tmp_path / name)
        ckpt = str(tmp_path / f"{name}_ckpt")
        _arc(spark, path, cdc=cdc)
        opts = {"changeFeed": "true", "includePreimages": "true"}
        if not cdc:
            opts["pks"] = "k"
        stream = spark.readStream.format("txtable").option("path", path)
        for k_, v_ in opts.items():
            stream = stream.option(k_, v_)
        q = (
            stream.load()
            .writeStream.format("memory")
            .queryName(f"pre_{name}")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["k"], r["_change_type"], r["status"], r["v"])
            for r in spark.sql(f"SELECT * FROM pre_{name}").collect()
        }
        want = {
            (r["k"], r["_change_type"], r["status"], r["v"])
            for r in tx.table_changes_cdf(
                spark,
                path,
                None if cdc else ["k"],
                after_version=-1,
                include_preimage=True,
            ).collect()
        }
        assert got == want
        assert any(t[1] == "update_preimage" for t in got)


def test_stream_cdf_sink_replicates_cdc_table(spark, tmp_path):
    up = str(tmp_path / "up")
    down = str(tmp_path / "down")
    ckpt = str(tmp_path / "rckpt")
    _arc(spark, up, cdc=True)
    tx.create_table(
        tx.read_table(spark, up).limit(0), down, partition_cols=["status"]
    )
    sink = tx.foreach_batch_cdf_sink(down, ["k"], app_id="cdc-repl")

    def run_once():
        q = (
            spark.readStream.format("txtable")
            .option("path", up)
            .option("changeFeed", "true")
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert _as_dict(tx.read_table(spark, down)) == _as_dict(
        tx.read_table(spark, up)
    )
    v_after = tx.latest_version(down)
    run_once()  # restart: nothing new -> downstream untouched
    assert tx.latest_version(down) == v_after
    tx.update_table(spark, up, "k = 1", {"v": "v * 100"}, mode="cow")
    run_once()
    assert _as_dict(tx.read_table(spark, down)) == _as_dict(
        tx.read_table(spark, up)
    )


def test_stream_rewrite_footprint_bound(spark, tmp_path):
    """A rewriting commit WITHOUT change data only takes the one-task
    join under maxRewriteBytesPerTask; over it the stream raises with
    guidance instead of funneling the footprint through one worker."""
    path = str(tmp_path / "fat")
    tx.create_table(_rows(spark, *[(i, "A", i) for i in range(50)]), path)
    tx.merge_tx_table(
        spark, path, _rows(spark, (1, "A", 999)), ["k"]
    )
    merge_v = tx.latest_version(path)
    opts = {
        "path": path,
        "changeFeed": "true",
        "pks": "k",
        "maxRewriteBytesPerTask": "10",  # tiny: every real file exceeds
    }
    reader = txsource.TxStreamReader(
        txsource.TxTableDataSource(opts).schema(), opts
    )
    with pytest.raises(ValueError, match="maxRewriteBytesPerTask"):
        reader.partitions({"version": merge_v - 1}, {"version": merge_v})
    # the default bound admits this tiny commit
    opts2 = {"path": path, "changeFeed": "true", "pks": "k"}
    reader2 = txsource.TxStreamReader(
        txsource.TxTableDataSource(opts2).schema(), opts2
    )
    parts = reader2.partitions(
        {"version": merge_v - 1}, {"version": merge_v}
    )
    assert len(parts) == 1  # the bounded in-task join, as documented


def test_stream_max_bytes_per_batch(spark, tmp_path):
    """Byte-denominated admission: a fat commit rides ALONE in its
    batch; thin commits coalesce under the cap."""
    path = str(tmp_path / "mb")
    tx.create_table(_rows(spark, (0, "A", 0)), path)
    # one fat append (many rows), then several thin ones
    fat = spark.createDataFrame(
        [(i, "A", i) for i in range(1, 5000)], "k int, status string, v long"
    ).coalesce(1)
    tx.append_table(fat, path)
    for i in range(3):
        tx.append_table(_rows(spark, (10_000 + i, "A", i)), path)
    snap = tx._fold(path)
    fat_bytes = max(int(m["bytes"]) for m in snap.files.values())
    opts = {"path": path, "maxBytesPerBatch": str(fat_bytes + 1)}
    reader = txsource.TxStreamReader(
        txsource.TxTableDataSource(opts).schema(), opts
    )
    reader._learn_floor(-1)
    offs = []
    while True:
        o = reader.latestOffset()["version"]
        if offs and o == offs[-1]:
            break
        offs.append(o)
        reader.commit({"version": o})
    # batch 1: create alone? (tiny) may coalesce with nothing before
    # the fat commit; the fat commit (v1) must END a batch on its own
    # admission step, and the thin tail coalesces
    assert offs[-1] == tx.latest_version(path)
    assert len(offs) >= 2  # the backlog split
    # the fat commit's batch contains ONLY commits up to v1
    first_batch_end = offs[0]
    assert first_batch_end <= 1


def test_vacuum_reclaims_expired_change_files(spark, tmp_path):
    path = str(tmp_path / "vac")
    tx.create_table(_rows(spark, (1, "A", 10), (2, "A", 20)), path)
    tx.enable_change_data(path)
    tx.update_table(spark, path, "k = 1", {"v": "v + 1"}, mode="cow")
    e = json.loads(
        open(tx._commit_file(path, tx.latest_version(path))).read()
    )
    cdc_files = [r["path"] for r in e["cdc"]]
    assert cdc_files
    # retained window covers the commit: change files stay
    gone = tx.vacuum_table(path, retain_versions=10, stray_age_seconds=0)
    assert not (set(cdc_files) & set(gone))
    # push the commit out of retention: its change files reclaim
    for i in range(3):
        tx.append_table(_rows(spark, (100 + i, "B", i)), path)
    gone = tx.vacuum_table(path, retain_versions=1, stray_age_seconds=0)
    assert set(cdc_files) <= set(gone)
    for rel in cdc_files:
        assert not os.path.exists(os.path.join(path, rel))


def test_vacuumed_change_files_diagnose_clearly(spark, tmp_path):
    """A feed range spanning a commit whose change files were
    vacuumed raises the retention diagnosis at PLANNING time (batch
    and stream), never an executor FileNotFound; a narrowed range
    keeps working."""
    path = str(tmp_path / "vdiag")
    tx.create_table(_rows(spark, (1, "A", 10), (2, "A", 20)), path)
    tx.enable_change_data(path)
    tx.update_table(spark, path, "k = 1", {"v": "11"}, mode="cow")
    v_upd = tx.latest_version(path)
    for i in range(3):
        tx.append_table(_rows(spark, (50 + i, "B", i)), path)
    # reclaim ONLY the update's change files (what a vacuum whose
    # window excludes v_upd does — data files may outlive them when
    # later snapshots still reference them)
    e = json.loads(open(tx._commit_file(path, v_upd)).read())
    for rec in e["cdc"]:
        os.unlink(os.path.join(path, rec["path"]))
    with pytest.raises(ValueError, match="vacuumed"):
        tx.table_changes_cdf(spark, path, after_version=-1)
    # the surviving tail still replays
    feed = tx.table_changes_cdf(spark, path, after_version=v_upd)
    assert {r["k"] for r in feed.collect()} == {50, 51, 52}
    reader = txsource.TxStreamReader(
        txsource.TxTableDataSource(
            {"path": path, "changeFeed": "true"}
        ).schema(),
        {"path": path, "changeFeed": "true"},
    )
    with pytest.raises(ValueError, match="vacuumed"):
        reader.partitions(
            {"version": v_upd - 1}, {"version": v_upd}
        )
    assert reader.partitions(
        {"version": v_upd}, {"version": tx.latest_version(path)}
    )


def test_vacuum_stray_change_files_ride_age_guard(spark, tmp_path):
    path = str(tmp_path / "stray")
    tx.create_table(_rows(spark, (1, "A", 10)), path)
    stray = os.path.join(path, tx.CDC_DIR, "inflight", "part-0.parquet")
    os.makedirs(os.path.dirname(stray))
    open(stray, "wb").write(b"x")
    assert tx.vacuum_table(path, stray_age_seconds=3600.0) == []
    old = time.time() - 7200
    os.utime(stray, (old, old))
    assert tx.vacuum_table(path, stray_age_seconds=3600.0) == [
        os.path.relpath(stray, path)
    ]


def test_drop_feature_stops_emission(spark, tmp_path):
    path = str(tmp_path / "drop")
    tx.create_table(_rows(spark, (1, "A", 10), (2, "A", 20)), path)
    tx.enable_change_data(path)
    tx.drop_table_feature(spark, path, "changeDataFeed")
    snap = tx._fold(path)
    assert not snap.cdc_enabled
    assert "changeDataFeed" not in snap.protocol.get("writer", [])
    tx.update_table(spark, path, "k = 1", {"v": "0"}, mode="cow")
    e = json.loads(
        open(tx._commit_file(path, tx.latest_version(path))).read()
    )
    assert "cdc" not in e


def test_clone_carries_cdc_property(spark, tmp_path):
    src = str(tmp_path / "src")
    tx.create_table(_rows(spark, (1, "A", 10)), src)
    tx.enable_change_data(src)
    for shallow in (True, False):
        dst = str(tmp_path / ("sh" if shallow else "dp"))
        tx.clone_table(spark, src, dst, shallow=shallow)
        assert tx._fold(dst).cdc_enabled
        tx.update_table(spark, dst, "k = 1", {"v": "99"}, mode="cow")
        e = json.loads(
            open(tx._commit_file(dst, tx.latest_version(dst))).read()
        )
        assert e["cdc"], "the clone keeps recording change rows"


def test_rewrite_conflicts_with_interleaved_enable(
    spark, tmp_path, monkeypatch
):
    """A rewrite that lost the race to enable_change_data staged NO
    change rows — rebasing past it would silently starve the feed,
    so it must conflict (the add-constraint race rule, applied to
    the cdc property)."""
    path = str(tmp_path / "race")
    tx.create_table(_rows(spark, (1, "A", 10), (2, "A", 20)), path)
    real_claim = tx._claim
    state = {"done": False}

    def racy(p, version, payload):
        if not state["done"] and payload.get("action") == "update":
            state["done"] = True
            tx.enable_change_data(p)  # claims the slot first
        return real_claim(p, version, payload)

    monkeypatch.setattr(tx, "_claim", racy)
    with pytest.raises(tx.ConcurrentWriteError, match="change data"):
        tx.update_table(spark, path, "k = 1", {"v": "0"}, mode="cow")
    # the re-run sees cdc enabled and records its rows
    tx.update_table(spark, path, "k = 1", {"v": "0"}, mode="cow")
    e = json.loads(
        open(tx._commit_file(path, tx.latest_version(path))).read()
    )
    assert e["cdc"]


def test_pkless_blind_overwrite_and_restore(spark, tmp_path):
    """Without pks, overwrite/restore render join-free as delete-all
    + insert-all (the Delta overwrite CDF shape); with pks the same
    commits refine into update rows — both replay to one snapshot."""
    path = str(tmp_path / "ow")
    tx.create_table(_rows(spark, (1, "A", 10), (2, "A", 20)), path)
    tx.overwrite_table(_rows(spark, (2, "A", 99), (3, "B", 30)), path)
    feed = tx.table_changes_cdf(spark, path, after_version=0)  # pk-less
    got = {
        (r["k"], r["_change_type"], r["v"]) for r in feed.collect()
    }
    assert got == {
        (1, "delete", 10),
        (2, "delete", 20),
        (2, "insert", 99),
        (3, "insert", 30),
    }
    # the pk'd rendering of the SAME commit refines into an update
    got_pk = {
        (r["k"], r["_change_type"], r["v"])
        for r in tx.table_changes_cdf(
            spark, path, ["k"], after_version=0
        ).collect()
    }
    assert (2, "update_postimage", 99) in got_pk
    # restore renders pk-less too
    tx.restore_table(spark, path, version=0)
    feed2 = tx.table_changes_cdf(spark, path, after_version=1)
    got2 = {
        (r["k"], r["_change_type"], r["v"]) for r in feed2.collect()
    }
    assert got2 == {
        (2, "delete", 99),
        (3, "delete", 30),
        (1, "insert", 10),
        (2, "insert", 20),
    }


def test_pkless_insert_only_and_delete_only_rewrites(spark, tmp_path):
    path = str(tmp_path / "io")
    base = spark.createDataFrame(
        [(1, "d1", 10)], "k int, day string, v long"
    )
    tx.create_table(base, path, partition_cols=["day"])
    # merge landing ONLY a brand-new partition: removed=[] -> pure
    # inserts, pk-less and join-free
    src = spark.createDataFrame(
        [(2, "d2", 20), (3, "d2", 30)], "k int, day string, v long"
    )
    tx.merge_tx_table(spark, path, src, ["k"])
    v_merge = tx.latest_version(path)
    feed = tx.table_changes_cdf(
        spark, path, after_version=v_merge - 1
    )  # NO pks
    assert {(r["k"], r["_change_type"]) for r in feed.collect()} == {
        (2, "insert"),
        (3, "insert"),
    }
    # COW delete wiping a whole partition's rows: no survivors ->
    # pure deletes, pk-less
    tx.delete_from_table(
        spark, path, "day = 'd2'", mode="cow",
        partition_filter={"day": "d2"},
    )
    v_del = tx.latest_version(path)
    feed2 = tx.table_changes_cdf(spark, path, after_version=v_del - 1)
    assert {(r["k"], r["_change_type"]) for r in feed2.collect()} == {
        (2, "delete"),
        (3, "delete"),
    }
    # the stream plans these per-file, join-free, without pks
    reader = txsource.TxStreamReader(
        txsource.TxTableDataSource(
            {"path": path, "changeFeed": "true"}
        ).schema(),
        {"path": path, "changeFeed": "true"},
    )
    parts = reader.partitions(
        {"version": v_merge - 1}, {"version": v_del}
    )
    rows = [r for p in parts for r in reader.read(p)]
    assert sorted((r[0], r[-2]) for r in rows) == [
        (2, "delete"),
        (2, "insert"),
        (3, "delete"),
        (3, "insert"),
    ]


def test_pkless_feed_survives_maintenance(spark, tmp_path):
    """Compaction and DV purge are movement-only by construction —
    they emit nothing and must neither demand pks nor plan a no-op
    join task."""
    path = str(tmp_path / "mx")
    tx.create_table(_rows(spark, (1, "A", 10), (2, "A", 20)), path)
    tx.enable_change_data(path)
    tx.append_table(_rows(spark, (3, "A", 30)), path)
    tx.delete_from_table(spark, path, "k = 2", mode="mor")
    tx.materialize_deletes(spark, path)  # 'purge'
    tx.compact_table(spark, path)  # 'compact'
    feed = tx.table_changes_cdf(spark, path, after_version=-1)  # NO pks
    got = {(r["k"], r["_change_type"]) for r in feed.collect()}
    assert got == {(1, "insert"), (2, "insert"), (3, "insert"), (2, "delete")}
    # the stream plans ZERO partitions for the maintenance commits
    reader = txsource.TxStreamReader(
        txsource.TxTableDataSource(
            {"path": path, "changeFeed": "true"}
        ).schema(),
        {"path": path, "changeFeed": "true"},
    )
    tip = tx.latest_version(path)
    assert reader.partitions({"version": tip - 2}, {"version": tip}) == []


def test_cdc_change_files_null_fill_widened_schema(spark, tmp_path):
    """Change files written under an OLDER schema read null-filled
    under the range's FINAL schema — same discipline as data files."""
    path = str(tmp_path / "wide")
    tx.create_table(_rows(spark, (1, "A", 10), (2, "A", 20)), path)
    tx.enable_change_data(path)
    tx.update_table(spark, path, "k = 1", {"v": "11"}, mode="cow")
    tx.add_column(path, "note", "string")
    src = spark.createDataFrame(
        [(2, "A", 22, "hi")], "k int, status string, v long, note string"
    )
    tx.merge_tx_table(spark, path, src, ["k"])
    feed = tx.table_changes_cdf(spark, path, after_version=0)
    got = {
        (r["k"], r["_change_type"], r["v"], r["note"])
        for r in feed.collect()
    }
    # the pre-widen update's change file lacks 'note' -> null-filled
    assert (1, "update_postimage", 11, None) in got
    assert (2, "update_postimage", 22, "hi") in got


def test_cdc_with_identity_columns(spark, tmp_path):
    """Inserted rows' change records carry their ALLOCATED ids (the
    post-image is read back from the staged files, where allocation
    already happened)."""
    path = str(tmp_path / "ident")
    tx.create_table(
        spark.createDataFrame([("a", 1)], "name string, v long"),
        path,
        identity={"id": {"start": 1, "step": 1}},
    )
    tx.enable_change_data(path)
    tx.merge_tx_table(
        spark,
        path,
        spark.createDataFrame([("b", 2)], "name string, v long"),
        ["name"],
    )
    feed = tx.table_changes_cdf(spark, path, after_version=1)
    (row,) = feed.collect()
    assert row["_change_type"] == "insert" and row["name"] == "b"
    assert row["id"] == 2  # allocated above the create's high-water mark


def test_cdc_across_partition_evolution(spark, tmp_path):
    """Change files store partition columns as plain data, so the
    feed is spec-agnostic: a merge AFTER repartition_table (which
    pulls old-spec files into the rewrite) still records exactly its
    net changes, readable pk-less."""
    path = str(tmp_path / "respec")
    base = spark.createDataFrame(
        [(1, "d1", "A", 10), (2, "d2", "B", 20)],
        "k int, day string, status string, v long",
    )
    tx.create_table(base, path, partition_cols=["day"])
    tx.enable_change_data(path)
    tx.repartition_table(path, ["status"])
    src = spark.createDataFrame(
        [(1, "d1", "A", 11), (3, "d3", "B", 30)],
        "k int, day string, status string, v long",
    )
    tx.merge_tx_table(spark, path, src, ["k"])
    v = tx.latest_version(path)
    feed = tx.table_changes_cdf(spark, path, after_version=v - 1)
    got = {(r["k"], r["_change_type"], r["v"]) for r in feed.collect()}
    assert (1, "update_postimage", 11) in got
    assert (3, "insert", 30) in got
    assert not any(t[0] == 2 and t[1] != "insert" for t in got)


def test_cdc_with_generated_columns(spark, tmp_path):
    """Generated columns recompute on the post-image; change rows
    carry the derived values on both sides of an update pair."""
    import datetime as dt

    path = str(tmp_path / "gen")
    df = spark.createDataFrame(
        [(1, dt.datetime(2023, 5, 1)), (2, dt.datetime(2024, 6, 2))],
        "k int, ts timestamp",
    )
    tx.create_table(
        df, path, partition_cols=["y"], generated={"y": "year(ts)"}
    )
    tx.enable_change_data(path)
    tx.update_table(
        spark, path, "k = 1", {"ts": "ts + INTERVAL 370 DAYS"}, mode="cow"
    )
    feed = tx.table_changes_cdf(
        spark, path, after_version=1, include_preimage=True
    )
    got = {(r["k"], r["_change_type"], r["y"]) for r in feed.collect()}
    # the derived partition value moved 2023 -> 2024 across the pair
    assert (1, "update_preimage", 2023) in got
    assert (1, "update_postimage", 2024) in got


def test_cdc_survives_rename_column_mapping(spark, tmp_path):
    """Change files spell PHYSICAL names; a later rename must not
    orphan them (the symlink-export lesson applied here)."""
    path = str(tmp_path / "ren")
    tx.create_table(_rows(spark, (1, "A", 10), (2, "B", 20)), path)
    tx.enable_change_data(path)
    tx.update_table(spark, path, "k = 1", {"v": "11"}, mode="cow")
    tx.rename_column(path, "v", "value")
    feed = tx.table_changes_cdf(spark, path, after_version=-1)
    got = {
        (r["k"], r["_change_type"], r["value"]) for r in feed.collect()
    }
    assert (1, "update_postimage", 11) in got
    assert (1, "insert", 10) in got
