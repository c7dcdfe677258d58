"""Golden end-to-end pipeline (SURVEY.md §5.2 layer 3): the reference's
two entry points composed — §3.1 delta ingestion (watermark → keyset
fetch → land → flatten) feeding §3.2 upsert (merge into target,
managed timestamps) — run through TWO delta cycles to prove the
incremental contract: cycle 2 fetches only past-watermark records and
merge updates without duplicating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bi_utils_spark.operators.merge import merge_into_path
from bi_utils_spark.operators.relational import max_watermark
from bi_utils_spark.sources.rest import ingest_keyset


def _records(lo, hi):
    return [
        {
            "id": f"{i:03d}",
            "modified_at": f"2024-01-{i + 1:02d}T00:00:00Z",
            "payload": {"v": i},
            "lineItems": [{"sku": f"s{i}", "qty": i}],
        }
        for i in range(lo, hi)
    ]


@pytest.fixture()
def transport_factory():
    from test_sources import make_keyset_transport as mk  # reuse the fake

    return mk


def test_two_cycle_delta_ingest_and_merge(spark, tmp_path, transport_factory):
    target = str(tmp_path / "target")
    t1 = F.lit("2024-02-01 00:00:00").cast("timestamp")
    t2 = F.lit("2024-03-01 00:00:00").cast("timestamp")

    # ---- cycle 1: full load (no watermark) -> merge into empty target
    tr1 = transport_factory(_records(0, 5))
    df1 = ingest_keyset(spark, tr1, "id", str(tmp_path / "land1"), limit=2)
    flat_cols = ["id", "modified_at", "payload__v", "lineItems__sku", "lineItems__qty"]
    assert set(df1.columns) == set(flat_cols)
    merge_into_path(spark, target, df1.select(*flat_cols), ["id", "lineItems__sku"], now=t1)
    snap1 = spark.read.parquet(target)
    assert snap1.count() == 5

    # ---- watermark from the target drives cycle 2's pushdown
    wm = max_watermark(
        snap1.select(F.to_timestamp(F.col("modified_at").substr(1, 19)).alias("m")),
        "m",
        "3 seconds",
    )
    assert wm is not None
    start = wm.strftime("%Y-%m-%dT%H:%M:%SZ")

    # ---- cycle 2: records 3..7 modified later; keyset pushes >= watermark
    tr2 = transport_factory(
        [
            {**r, "payload": {"v": r_i + 100}}
            for r_i, r in zip(range(3, 8), _records(3, 8))
        ],
        sort_key="modified_at",
    )
    df2 = ingest_keyset(
        spark, tr2, "modified_at", str(tmp_path / "land2"), start_value=start, limit=2
    )
    # record 003 (modified Jan 4) predates the watermark (Jan 4
    # 23:59:57, i.e. max Jan 5 − 3 s lookback) → correctly NOT fetched
    fetched = {r["id"] for r in df2.select("id").collect()}
    assert fetched == {"004", "005", "006", "007"}
    # the source-side predicate (P8 pushdown) was actually sent
    assert any("modified_at >=" in c.get("where", "") for c in tr2.calls)

    merge_into_path(spark, target, df2.select(*flat_cols), ["id", "lineItems__sku"], now=t2)
    final = spark.read.parquet(target)

    # upsert contract: 8 distinct ids, updated rows carry new payloads,
    # insert_timestamp preserved for matched, stamped for inserts
    rows = {r["id"]: r for r in final.collect()}
    assert sorted(rows) == [f"{i:03d}" for i in range(8)]
    assert rows["004"]["payload__v"] == 104           # updated in cycle 2
    assert rows["003"]["payload__v"] == 3             # pre-watermark, untouched
    assert rows["001"]["payload__v"] == 1             # untouched
    assert str(rows["004"]["insert_timestamp"]).startswith("2024-02-01")
    assert str(rows["004"]["update_timestamp"]).startswith("2024-03-01")
    assert str(rows["007"]["insert_timestamp"]).startswith("2024-03-01")
