"""Paginated REST ingestion (SURVEY.md §2.1, S3-S5).

The reference fetched commercetools pages in the driver and
pd.concat'd them (`ct_utils.py:126-350`). The Spark-first landing
pattern separates *fetch* (inherently sequential HTTP, driver-side,
but tiny: one cursor loop writing raw JSONL) from *processing*
(distributed: ``spark.read.json`` over the landed files → flatten →
merge). At 100 TB the landing zone is object storage and the fetch
loop is a thin scheduler feeding it; Spark never blocks on HTTP.

Transports are injectable callables so tests (and air-gapped runs)
use fakes — re-implementing commercetools connectivity is an explicit
non-goal (SURVEY.md §7.8).

Pagination contracts reproduced:
- offset mode (S3, `ct_utils.py:126-158`): ``?limit=N&offset=K``
  until ``offset >= total``;
- keyset mode (S4, `ct_utils.py:183-263`): sort by ``sort_key`` asc,
  first page filters ``sort_key >= start`` (`ct_utils.py:213`), later
  pages ``sort_key > last_seen`` (`ct_utils.py:237`), stop on short
  page or ``max_iterations`` (`ct_utils.py:199-200`);
- bounded page size (S5, `ct_utils.py:288-290`): ``limit`` ≤ 500
  raises ValueError above.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession

from bi_utils_spark.session import set_logging
from bi_utils_spark.sources.retry import with_retry

# A transport takes query params and returns the decoded response dict:
# {"total": int, "results": [ {...}, ... ]}
Transport = Callable[[dict], dict]

MAX_PAGE_LIMIT = 500  # ct_utils.py:288-290 contract


def _check_limit(limit: int) -> None:
    if limit > MAX_PAGE_LIMIT:
        raise ValueError(
            f"limit {limit} exceeds the maximum of {MAX_PAGE_LIMIT}"
        )


def offset_paginate(
    transport: Transport,
    limit: int = 500,
    num_retries: int = 6,
    retry_interval: float = 10.0,
    sleep=None,
) -> Iterator[list[dict]]:
    """Yield result pages via offset pagination (S3)."""
    _check_limit(limit)
    offset = 0
    while True:
        params = {"limit": limit, "offset": offset}
        kw = {"sleep": sleep} if sleep is not None else {}
        resp = with_retry(
            lambda p=params: transport(p), num_retries, retry_interval, **kw
        )
        results = resp.get("results", [])
        if results:
            yield results
        offset += limit
        if offset >= int(resp.get("total", 0)):
            return


def keyset_paginate(
    transport: Transport,
    sort_key: str,
    start_value: str | None = None,
    limit: int = 500,
    max_iterations: int = 250,
    num_retries: int = 6,
    retry_interval: float = 10.0,
    sleep=None,
    upper_bound: str | None = None,
) -> Iterator[list[dict]]:
    """Yield result pages via keyset pagination with predicate pushdown
    (S4/S5). The ``where`` param IS the pushdown — only rows newer than
    the watermark ever leave the source (`ct_utils.py:213`).

    ``upper_bound`` (exclusive) bounds the walk to ``sort_key <
    upper_bound`` — the window form :func:`ingest_keyset_partitioned`
    fans out over; ``None`` keeps the reference's open-ended contract
    (identical ``where`` strings)."""
    _check_limit(limit)
    log = set_logging()
    last_seen = None
    kw = {"sleep": sleep} if sleep is not None else {}
    for iteration in range(max_iterations):
        conds = []
        if last_seen is None:
            if start_value is not None:
                conds.append(f'{sort_key} >= "{start_value}"')
        else:
            conds.append(f'{sort_key} > "{last_seen}"')
        if upper_bound is not None:
            conds.append(f'{sort_key} < "{upper_bound}"')
        where = " and ".join(conds) if conds else None
        params = {"limit": limit, "sort": f"{sort_key} asc"}
        if where:
            params["where"] = where
        resp = with_retry(
            lambda p=params: transport(p), num_retries, retry_interval, **kw
        )
        results = resp.get("results", [])
        if not results:
            return
        yield results
        last_seen = results[-1][sort_key]  # ct_utils.py:232,248
        if len(results) < limit:
            return
    log.warning("keyset_paginate: stopped at max_iterations=%d", max_iterations)


def land_pages(pages: Iterator[list[dict]], landing_dir: str) -> list[str]:
    """Write each page as one JSONL file; return the file paths.

    The landing zone decouples sequential HTTP from distributed
    processing — the reference's in-memory page list
    (`ct_utils.py:231-258`) becomes durable files Spark scans in
    parallel."""
    os.makedirs(landing_dir, exist_ok=True)
    paths = []
    for i, page in enumerate(pages):
        path = os.path.join(landing_dir, f"page-{i:06d}.jsonl")
        with open(path, "w", encoding="utf-8") as f:
            for rec in page:
                f.write(json.dumps(rec) + "\n")
        paths.append(path)
    return paths


def read_landed(
    spark: SparkSession,
    landing_dir: str,
    schema=None,
    columns: Sequence[str] | None = None,
    cols_to_exclude: Sequence[str] = (),
) -> DataFrame:
    """Landed JSONL → flattened DataFrame (the distributed half of
    S3-S5 + N4's projection: `ct_utils.py:102-123`)."""
    from bi_utils_spark.operators.nested import flatten, project_normalized

    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(landing_dir)
    if columns is not None:
        return project_normalized(df, columns=columns, exclude=cols_to_exclude)
    return flatten(df, exclude=cols_to_exclude)


def keyset_windows(
    split_points: Sequence[str], start_value: str | None = None
) -> list[tuple[str | None, str | None]]:
    """Half-open fetch windows [lo, hi) from sorted split points:
    ``[p1, p2] → [(start, p1), (p1, p2), (p2, None)]``. Disjoint and
    covering by construction — every key lands in exactly one window,
    so a partitioned fetch unions to exactly the serial result."""
    pts = sorted(split_points)
    lows: list[str | None] = [start_value, *pts]
    highs: list[str | None] = [*pts, None]
    return list(zip(lows, highs))


def ingest_keyset_partitioned(
    spark: SparkSession,
    transport: Transport,
    sort_key: str,
    landing_dir: str,
    split_points: Sequence[str],
    start_value: str | None = None,
    columns: Sequence[str] | None = None,
    cols_to_exclude: Sequence[str] = (),
    **paginate_kwargs,
) -> DataFrame:
    """Backfill form of S4 (VERDICT r3 #9): the key domain is
    pre-split into half-open windows (split points from a cheap key
    probe, histogram, or watermark table) and each window runs its own
    bounded keyset loop in a SEPARATE Spark task, landing pages under
    a window-unique prefix. Window predicates are disjoint and cover
    ``[start_value, ∞)``, so the landed union equals the serial
    :func:`ingest_keyset` exactly (fake-transport-tested).

    The serial loop stays the default for incremental loads — the
    reference's API is rate-bound by etiquette (`ct_utils.py:183-263`)
    — the partitioned form is for provider-sanctioned bulk backfills.
    ``landing_dir`` must be executor-visible (object storage at scale;
    any local path on local[*]); the transport must be picklable and
    thread/process-safe, which stateless HTTP clients are.
    """
    windows = keyset_windows(split_points, start_value)
    os.makedirs(landing_dir, exist_ok=True)

    def fetch(it: Iterator[tuple[int, tuple[str | None, str | None]]]):
        for wi, (lo, hi) in it:
            pages = keyset_paginate(
                transport,
                sort_key,
                start_value=lo,
                upper_bound=hi,
                **paginate_kwargs,
            )
            for j, page in enumerate(pages):
                path = os.path.join(
                    landing_dir, f"win-{wi:05d}-page-{j:06d}.jsonl"
                )
                with open(path, "w", encoding="utf-8") as f:
                    for rec in page:
                        f.write(json.dumps(rec) + "\n")
                yield path

    sc = spark.sparkContext
    # one task per window; collect() returns the (bounded: one path per
    # landed page) file list and fences the fetch before the read
    sc.parallelize(list(enumerate(windows)), max(1, len(windows))).mapPartitions(
        fetch
    ).collect()
    return read_landed(
        spark, landing_dir, columns=columns, cols_to_exclude=cols_to_exclude
    )


def ingest_keyset(
    spark: SparkSession,
    transport: Transport,
    sort_key: str,
    landing_dir: str,
    start_value: str | None = None,
    columns: Sequence[str] | None = None,
    cols_to_exclude: Sequence[str] = (),
    **paginate_kwargs,
) -> DataFrame:
    """End-to-end S4 pipeline: keyset-paginate → land → read → flatten.

    Mirrors ``ct_pagination_by_sort_key`` (`ct_utils.py:183-263`)
    with the fetch/process split described in the module docstring.
    """
    pages = keyset_paginate(
        transport, sort_key, start_value=start_value, **paginate_kwargs
    )
    land_pages(pages, landing_dir)
    return read_landed(
        spark, landing_dir, columns=columns, cols_to_exclude=cols_to_exclude
    )
