from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from bi_utils_spark.operators import txtable as tx
from bi_utils_spark.sources.txsource import register_txtable_source


def _rows(spark, *triples):
    return spark.createDataFrame(
        [(k, s, v) for k, s, v in triples], "k int, status string, v long"
    )


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_txtable_source(spark)


def _as_dict(df):
    return {r["k"]: (r["status"], r["v"]) for r in df.collect()}


def test_batch_read_matches_read_table(spark, tmp_path):
    path = str(tmp_path / "t")
    tx.create_table(_rows(spark, (1, "A", 10), (2, "A", 20)), path)
    tx.append_table(_rows(spark, (3, "B", 30)), path)
    got = spark.read.format("txtable").option("path", path).load()
    assert _as_dict(got) == _as_dict(tx.read_table(spark, path))
    # batch time travel through the same format
    v0 = (
        spark.read.format("txtable")
        .option("path", path)
        .option("version", 0)
        .load()
    )
    assert set(_as_dict(v0)) == {1, 2}


def test_batch_read_partitioned_restores_partition_cols(spark, tmp_path):
    path = str(tmp_path / "p")
    base = spark.createDataFrame(
        [(1, "d1", 10), (2, "d2", 20)], "k int, day string, v long"
    )
    tx.create_table(base, path, partition_cols=["day"])
    got = spark.read.format("txtable").option("path", path).load()
    assert {(r["k"], r["day"]) for r in got.collect()} == {
        (1, "d1"),
        (2, "d2"),
    }


def test_stream_reads_appends_incrementally(spark, tmp_path):
    path = str(tmp_path / "s")
    ckpt = str(tmp_path / "ckpt")
    tx.create_table(_rows(spark, (1, "A", 10)), path)
    stream = (
        spark.readStream.format("txtable").option("path", path).load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("txstream")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        def _wait_rows(n, timeout=60):
            deadline = time.time() + timeout
            while time.time() < deadline:
                got = spark.sql("SELECT * FROM txstream").count()
                if got >= n:
                    return got
                time.sleep(0.5)
            return spark.sql("SELECT * FROM txstream").count()

        assert _wait_rows(1) == 1  # the create commit replays
        tx.append_table(_rows(spark, (2, "B", 20), (3, "B", 30)), path)
        assert _wait_rows(3) == 3
        ks = {
            r["k"] for r in spark.sql("SELECT * FROM txstream").collect()
        }
        assert ks == {1, 2, 3}
    finally:
        q.stop()


def test_stream_fails_on_rewrite_unless_opted_in(spark, tmp_path):
    path = str(tmp_path / "r")
    tx.create_table(_rows(spark, (1, "A", 10)), path)
    tx.merge_tx_table(
        spark,
        path,
        _rows(spark, (1, "U", 11)),
        ["k"],
        now=F.lit("2024-06-01").cast("timestamp"),
    )
    tx.append_table(_rows(spark, (5, "C", 50)), path)

    from bi_utils_spark.sources.txsource import TxStreamReader

    snap = tx._fold(path)
    strict = TxStreamReader(snap.spark_schema(), {"path": path})
    with pytest.raises(ValueError, match="not an append"):
        strict.partitions({"version": 0}, {"version": snap.version})
    lax = TxStreamReader(
        snap.spark_schema(), {"path": path, "skipRewrites": "true"}
    )
    parts = lax.partitions({"version": 0}, {"version": snap.version})
    rows = [r for p in parts for r in lax.read(p)]
    assert [r[0] for r in rows] == [5]  # only the append's delta


def test_stream_offsets_replay_deterministically(spark, tmp_path):
    path = str(tmp_path / "d")
    tx.create_table(_rows(spark, (1, "A", 10)), path)
    tx.append_table(_rows(spark, (2, "B", 20)), path)

    from bi_utils_spark.sources.txsource import TxStreamReader

    snap = tx._fold(path)
    rd = TxStreamReader(snap.spark_schema(), {"path": path})
    assert rd.initialOffset() == {"version": -1}
    assert rd.latestOffset() == {"version": 1}
    first = [
        r
        for p in rd.partitions({"version": -1}, {"version": 1})
        for r in rd.read(p)
    ]
    second = [
        r
        for p in rd.partitions({"version": -1}, {"version": 1})
        for r in rd.read(p)
    ]
    assert sorted(first) == sorted(second) and len(first) == 2


def test_medallion_stream_tx_to_tx(spark, tmp_path):
    """bronze tx table --readStream--> transform --foreachBatch-->
    silver tx table: exactly-once on both ends (source offsets are
    commit versions; the sink's (app_id, batch_id) high-water mark
    absorbs replays)."""
    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    ckpt = str(tmp_path / "ck")
    tx.create_table(_rows(spark, (1, "A", 10), (2, "B", 20)), bronze)
    tx.create_table(
        spark.createDataFrame([], "k int, v2 long"), silver
    )
    sink = tx.foreach_batch_sink(silver, "medallion")
    stream = (
        spark.readStream.format("txtable").option("path", bronze).load()
    )
    q = (
        stream.select("k", (F.col("v") * 2).alias("v2"))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        def _wait(n, timeout=60):
            deadline = time.time() + timeout
            while time.time() < deadline:
                if tx.read_table(spark, silver).count() >= n:
                    return True
                time.sleep(0.5)
            return False

        assert _wait(2)
        tx.append_table(_rows(spark, (3, "C", 30)), bronze)
        assert _wait(3)
    finally:
        q.stop()
    got = {r["k"]: r["v2"] for r in tx.read_table(spark, silver).collect()}
    assert got == {1: 20, 2: 40, 3: 60}
    # no duplicates despite micro-batch boundaries
    assert tx.read_table(spark, silver).count() == 3


def test_batch_read_date_partitioned(spark, tmp_path):
    """Date-partitioned tx tables read through format('txtable'):
    directory strings coerce to datetime.date (r8 — previously the
    raw string hit the row converter and the read failed)."""
    import datetime as dt

    path = str(tmp_path / "tds")
    df = spark.createDataFrame(
        [
            (1, dt.date(2024, 1, 1), 10.0),
            (2, dt.date(2024, 1, 2), 20.0),
        ],
        "k int, day date, v double",
    )
    tx.create_table(df, path, partition_cols=["day"])
    got = (
        spark.read.format("txtable").option("path", path).load()
    ).collect()
    vals = {r["k"]: r["day"] for r in got}
    assert vals == {1: dt.date(2024, 1, 1), 2: dt.date(2024, 1, 2)}
    assert all(isinstance(v, dt.date) for v in vals.values())


def test_batch_read_timestamp_and_decimal_partitions(spark, tmp_path):
    import datetime as dt
    from decimal import Decimal

    path = str(tmp_path / "tts")
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 12, 30), Decimal("9.50"))],
        "k int, ts timestamp, amt decimal(5,2)",
    )
    tx.create_table(df, path, partition_cols=["ts", "amt"])
    row = (
        spark.read.format("txtable").option("path", path).load()
    ).collect()[0]
    assert row["ts"] == dt.datetime(2024, 1, 1, 12, 30)
    assert row["amt"] == Decimal("9.50")


# ---------------------------------------------------------------------------
# r9: change-feed streaming
# ---------------------------------------------------------------------------


def _cdf_arc(spark, path):
    tx.create_table(
        _rows(spark, (1, "A", 10), (2, "B", 20)), path, partition_cols=["status"]
    )
    tx.append_table(_rows(spark, (3, "A", 30)), path)
    src = _rows(spark, (1, "A", 11), (4, "B", 40), (3, "A", 0)).withColumn(
        "__del", F.col("k") == 3
    )
    tx.merge_tx_table(spark, path, src, ["k"], delete_col="__del")


def test_stream_change_feed_emits_typed_rows(spark, tmp_path):
    path = str(tmp_path / "cf")
    ckpt = str(tmp_path / "cf_ckpt")
    _cdf_arc(spark, path)
    stream = (
        spark.readStream.format("txtable")
        .option("path", path)
        .option("changeFeed", "true")
        .option("pks", "k")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("cfstream")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["k"], r["_change_type"], r["_commit_version"]): (r["status"], r["v"])
        for r in spark.sql("SELECT * FROM cfstream").collect()
    }
    assert got == {
        (1, "insert", 0): ("A", 10),
        (2, "insert", 0): ("B", 20),
        (3, "insert", 1): ("A", 30),
        (1, "update_postimage", 2): ("A", 11),
        (4, "insert", 2): ("B", 40),
        (3, "delete", 2): ("A", 30),
    }


def test_stream_change_feed_requires_pks_rejects_skip(spark, tmp_path):
    # pks are needed only when a commit actually JOINS: a rewriting
    # merge without commit-time change data raises at planning time
    # (r10 — append-only pk-less feeds work, see test_txcdc)
    path = str(tmp_path / "cfbad")
    _cdf_arc(spark, path)
    with pytest.raises(Exception, match="pks"):
        (
            spark.readStream.format("txtable")
            .option("path", path)
            .option("changeFeed", "true")
            .load()
            .writeStream.format("memory")
            .queryName("cfbad1")
            .option("checkpointLocation", str(tmp_path / "c1"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(60)
        )


def test_stream_cdf_replicates_merging_table_exactly_once(spark, tmp_path):
    """The medallion form over an UPSERTING upstream: the change-feed
    stream + foreach_batch_cdf_sink converge a downstream tx table to
    the upstream live snapshot across merges and deletes; restarting
    the stream (same checkpoint) re-delivers nothing, and new
    upstream commits flow through the same checkpoint."""
    up = str(tmp_path / "cfu")
    down = str(tmp_path / "cfd")
    ckpt = str(tmp_path / "cfu_ckpt")
    _cdf_arc(spark, up)
    tx.create_table(
        tx.read_table(spark, up).limit(0), down, partition_cols=["status"]
    )
    sink = tx.foreach_batch_cdf_sink(down, ["k"], app_id="cf-repl")

    def run_once():
        q = (
            spark.readStream.format("txtable")
            .option("path", up)
            .option("changeFeed", "true")
            .option("pks", "k")
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
    run_once()  # restart: no new upstream commits -> downstream untouched
    assert tx.latest_version(down) == v_after
    # more upstream churn: another merge (update + delete) flows through
    src2 = _rows(spark, (4, "B", 41), (1, "A", 0)).withColumn(
        "__del", F.col("k") == 1
    )
    tx.merge_tx_table(spark, up, src2, ["k"], delete_col="__del")
    run_once()
    assert _as_dict(tx.read_table(spark, down)) == _as_dict(
        tx.read_table(spark, up)
    )
    assert 1 not in _as_dict(tx.read_table(spark, down))


def test_stream_max_versions_per_batch_bounds_catchup(spark, tmp_path):
    """A backlogged stream slices its catch-up into bounded
    micro-batches instead of one giant one: 6 commits with
    maxVersionsPerBatch=2 arrive over >= 3 batches, all rows exactly
    once. (The cap governs per-trigger offset advancement —
    availableNow's wrapper plans to a fixed end and is out of scope.)
    """
    path = str(tmp_path / "mv")
    ckpt = str(tmp_path / "mv_ckpt")
    tx.create_table(_rows(spark, (0, "A", 0)), path)
    for i in range(1, 6):
        tx.append_table(_rows(spark, (i, "A", i * 10)), path)
    batches = []
    sink = lambda df, bid: batches.append(  # noqa: E731
        sorted(r["k"] for r in df.collect())
    )
    q = (
        spark.readStream.format("txtable")
        .option("path", path)
        .option("maxVersionsPerBatch", "2")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time as _t

        deadline = _t.time() + 90
        while _t.time() < deadline:
            if sorted(k for b in batches for k in b) == list(range(6)):
                break
            _t.sleep(0.5)
    finally:
        q.stop()
    non_empty = [b for b in batches if b]
    assert sorted(k for b in non_empty for k in b) == list(range(6))
    assert len(non_empty) >= 3  # 6 commits / 2 per batch
    assert max(len(b) for b in non_empty) <= 2
    # RESTART safety: the engine re-primes partitions() with the
    # checkpoint's offsets before asking latestOffset, so the cap's
    # floor catches up to the committed offset — new commits arrive
    # exactly once, still in bounded batches, no replays
    for i in range(6, 9):
        tx.append_table(_rows(spark, (i, "A", i * 10)), path)
    batches.clear()
    q2 = (
        spark.readStream.format("txtable")
        .option("path", path)
        .option("maxVersionsPerBatch", "2")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = _t.time() + 90
        while _t.time() < deadline:
            if sorted(k for b in batches for k in b) == [6, 7, 8]:
                break
            _t.sleep(0.5)
    finally:
        q2.stop()
    tail = [b for b in batches if b]
    assert sorted(k for b in tail for k in b) == [6, 7, 8]  # no dups
    assert max(len(b) for b in tail) <= 2


def test_stream_starting_timestamp(spark, tmp_path):
    """startingTimestamp resolves through the commit stamps: the
    snapshot live AT the instant is the baseline, only later commits
    stream."""
    path = str(tmp_path / "st")
    ckpt = str(tmp_path / "st_ckpt")
    tx.create_table(_rows(spark, (1, "A", 10)), path)
    ts0 = tx._commit_ts(path, 0)
    tx.append_table(_rows(spark, (2, "B", 20)), path)
    stream = (
        spark.readStream.format("txtable")
        .option("path", path)
        .option("startingTimestamp", ts0)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("txstream_ts")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ks = {r["k"] for r in spark.sql("SELECT * FROM txstream_ts").collect()}
    assert ks == {2}  # v0's row predates the baseline
    with pytest.raises(Exception, match="mutually exclusive"):
        (
            spark.readStream.format("txtable")
            .option("path", path)
            .option("startingVersion", 0)
            .option("startingTimestamp", ts0)
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "x"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(60)
        )
