"""Tests for source/sink adapters with fake transports (SURVEY.md §2.1)."""

from __future__ import annotations

import pytest

from bi_utils_spark.sources.rest import (
    ingest_keyset,
    keyset_paginate,
    land_pages,
    offset_paginate,
)
from bi_utils_spark.sources.retry import with_retry
from bi_utils_spark.sources.sheets import load_sheet_to_df, matrix_to_df
from bi_utils_spark.sources.sinks import notify_rows, send_webhook_alert


def make_keyset_transport(records, sort_key="id"):
    """Fake commercetools endpoint honoring sort + where pushdown."""
    calls = []

    def transport(params):
        calls.append(dict(params))
        rows = sorted(records, key=lambda r: r[sort_key])
        where = params.get("where")
        if where:
            op = ">=" if ">=" in where else ">"
            bound = where.split('"')[1]
            rows = [
                r
                for r in rows
                if (r[sort_key] >= bound if op == ">=" else r[sort_key] > bound)
            ]
        limit = params["limit"]
        return {"total": len(rows), "results": rows[:limit]}

    transport.calls = calls
    return transport


RECORDS = [
    {"id": f"{i:03d}", "payload": {"v": i}, "tags": [{"t": f"t{i}"}]}
    for i in range(7)
]


def test_keyset_pagination_pushdown_and_cursor():
    tr = make_keyset_transport(RECORDS)
    pages = list(keyset_paginate(tr, "id", start_value="002", limit=2))
    got = [r["id"] for page in pages for r in page]
    assert got == ["002", "003", "004", "005", "006"]
    # first call pushes >= start, later calls push > last_seen
    assert tr.calls[0]["where"] == 'id >= "002"'
    assert tr.calls[1]["where"] == 'id > "003"'
    assert all(c["sort"] == "id asc" for c in tr.calls)


def test_keyset_limit_validation():
    tr = make_keyset_transport(RECORDS)
    with pytest.raises(ValueError, match="exceeds"):
        list(keyset_paginate(tr, "id", limit=501))  # ct_utils.py:288-290


def test_keyset_max_iterations_cap():
    tr = make_keyset_transport(RECORDS)
    pages = list(keyset_paginate(tr, "id", limit=1, max_iterations=3))
    assert sum(len(p) for p in pages) == 3  # ct_utils.py:199-200 cap


def test_offset_pagination():
    def transport(params):
        rows = [{"id": i} for i in range(5)]
        return {
            "total": 5,
            "results": rows[params["offset"]: params["offset"] + params["limit"]],
        }

    pages = list(offset_paginate(transport, limit=2))
    assert [len(p) for p in pages] == [2, 2, 1]


def test_ingest_keyset_lands_and_flattens(spark, tmp_path):
    tr = make_keyset_transport(RECORDS)
    df = ingest_keyset(
        spark, tr, "id", str(tmp_path / "land"), start_value="000", limit=3
    )
    # nested payload + tags flattened with __ names
    assert set(df.columns) == {"id", "payload__v", "tags__t"}
    assert df.count() == 7


def make_window_transport(records, sort_key="id"):
    """Fake endpoint honoring the compound where of the partitioned
    backfill: `key >= "a" and key < "b"` in any combination."""

    def transport(params):
        rows = sorted(records, key=lambda r: r[sort_key])
        where = params.get("where")
        if where:
            for cond in where.split(" and "):
                bound = cond.split('"')[1]
                if ">=" in cond:
                    rows = [r for r in rows if r[sort_key] >= bound]
                elif ">" in cond:
                    rows = [r for r in rows if r[sort_key] > bound]
                elif "<" in cond:
                    rows = [r for r in rows if r[sort_key] < bound]
        return {"total": len(rows), "results": rows[: params["limit"]]}

    return transport


def test_keyset_windows_disjoint_cover():
    from bi_utils_spark.sources.rest import keyset_windows

    assert keyset_windows(["b", "d"]) == [(None, "b"), ("b", "d"), ("d", None)]
    assert keyset_windows(["d", "b"], start_value="a") == [
        ("a", "b"), ("b", "d"), ("d", None),
    ]


def test_ingest_keyset_partitioned_matches_serial(spark, tmp_path):
    # VERDICT r3 #9 Done-criterion: page-disjointness + union-equality
    # with the serial path
    import json as _json
    import os as _os

    from bi_utils_spark.sources.rest import ingest_keyset_partitioned

    records = [
        {"id": f"{i:03d}", "payload": {"v": i}} for i in range(0, 120)
    ]
    serial = ingest_keyset(
        spark,
        make_window_transport(records),
        "id",
        str(tmp_path / "serial"),
        limit=7,
    )
    part_dir = tmp_path / "part"
    parallel = ingest_keyset_partitioned(
        spark,
        make_window_transport(records),
        "id",
        str(part_dir),
        split_points=["040", "085", "110"],
        limit=7,
    )
    a = {tuple(sorted(r.asDict().items())) for r in serial.collect()}
    b = {tuple(sorted(r.asDict().items())) for r in parallel.collect()}
    assert a == b and len(b) == 120
    # disjointness: every record landed in exactly one page file
    landed = []
    for fn in sorted(_os.listdir(part_dir)):
        with open(part_dir / fn, encoding="utf-8") as fh:
            landed += [_json.loads(line)["id"] for line in fh]
    assert sorted(landed) == [f"{i:03d}" for i in range(0, 120)]
    # windows landed under distinct prefixes (4 windows from 3 splits)
    prefixes = {fn.split("-page-")[0] for fn in _os.listdir(part_dir)}
    assert len(prefixes) == 4


def test_ingest_keyset_partitioned_respects_start_value(spark, tmp_path):
    from bi_utils_spark.sources.rest import ingest_keyset_partitioned

    records = [{"id": f"{i:03d}", "payload": {"v": i}} for i in range(30)]
    df = ingest_keyset_partitioned(
        spark,
        make_window_transport(records),
        "id",
        str(tmp_path / "w"),
        split_points=["020"],
        start_value="010",
        limit=4,
    )
    got = sorted(r["id"] for r in df.collect())
    assert got == [f"{i:03d}" for i in range(10, 30)]


def test_land_pages_writes_jsonl(tmp_path):
    paths = land_pages(iter([[{"a": 1}], [{"a": 2}]]), str(tmp_path / "l"))
    assert len(paths) == 2
    assert open(paths[0]).read() == '{"a": 1}\n'


def test_with_retry_linear_backoff():
    sleeps, attempts = [], []

    def flaky():
        attempts.append(1)
        if len(attempts) < 3:
            raise RuntimeError("boom")
        return "ok"

    out = with_retry(flaky, num_retries=6, interval=10, sleep=sleeps.append)
    assert out == "ok"
    assert sleeps == [10, 20]  # (attempt+1)*interval, gs_utils.py:58


def test_with_retry_exhausts():
    def always_fail():
        raise RuntimeError("nope")

    with pytest.raises(RuntimeError, match="nope"):
        with_retry(always_fail, num_retries=2, interval=1, sleep=lambda s: None)


def test_matrix_header_promotion(spark):
    data = [["name", "age"], ["ann", "3"], ["bo"]]
    df = matrix_to_df(spark, data, header=True)
    assert df.columns == ["name", "age"]
    rows = sorted(df.collect(), key=lambda r: r["name"])
    assert rows[1]["age"] is None  # ragged row padded


def test_sheet_retry_then_success(spark):
    tries = []

    def fetch():
        tries.append(1)
        if len(tries) < 2:
            raise RuntimeError("quota")
        return [["h"], ["v"]]

    df = load_sheet_to_df(spark, fetch, sleep=lambda s: None)
    assert df.first()["h"] == "v"


def test_webhook_sink_logs_not_raises():
    sent = []
    assert send_webhook_alert("http://x", "hi", poster=lambda u, p: sent.append(p) or 200)
    assert sent == [{"text": "hi"}]
    assert not send_webhook_alert("http://x", "hi", poster=lambda u, p: 500)

    def boom(u, p):
        raise OSError("down")

    assert not send_webhook_alert("http://x", "hi", poster=boom)


def test_notify_rows_per_row_sink(spark):
    df = spark.createDataFrame([("t1", "c1")], ["tbl", "col"])
    out = []
    n = notify_rows(df, lambda d: f"{d['tbl']}.{d['col']}", out.append)
    assert n == 1 and out == ["t1.c1"]


def test_configure_object_store_sets_hadoop_conf(spark):
    # S10 analogue: s3a filesystem config instead of per-call clients
    from bi_utils_spark.session import configure_object_store

    configure_object_store(
        spark, access_key="AK", secret_key="SK", region="eu-west-1",
        endpoint="http://localhost:9000",
    )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.access.key") == "AK"
    assert hconf.get("fs.s3a.endpoint.region") == "eu-west-1"
    assert hconf.get("fs.s3a.endpoint") == "http://localhost:9000"
