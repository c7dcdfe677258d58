"""Measured scale-up curve for the heaviest bench rows (r10 verdict
task 5): run each query at sf0.1 and at a 10x synthetic fanout of the
same tables, and report the per-query scaling exponent
``log(t_10x / t_1x) / log(10)`` next to the exponent its plan shape
PREDICTS — the point is to catch a query whose measured growth beats
its model (a hidden quadratic), not to pretend kNN joins are linear.

Fanout construction (DuckDB, written once under .scale/x<FAN>/):

- ``documents``: <FAN> copies, doc_id offset per copy, and the text
  SALTED with a PER-DOCUMENT-UNIQUE token after every 5th word —
  copies are NOT near-duplicates of each other (a naive copy would
  give every doc <FAN>-1 twins and near-dup pair counts would grow
  quadratically by construction, measuring the dataset, not the
  operator). The salt must be unique per document, not per copy: a
  copy-shared token turns every cross-doc 2-gram match into a shared
  3-shingle, inflating MinHash similarity estimates and exploding
  LSH buckets — the first draft of this harness measured exactly
  that (q_llm_pipeline "exponent 1.62") before the fix.
- ``embeddings``: vec_id offset; first component perturbed per copy
  so no vector has exact twins (ties would distort top-k churn).
- ``events``: event_id/user_id offsets per copy — <FAN>x users with
  the same per-user behavior, the shape a 10x day of traffic has.
- ``orders`` (r12, for the tx-layer arcs): o_orderkey/o_custkey
  offsets per copy — the tx merge/delete/CDF arcs key on orderkey,
  so a fanout without the offset would collapse to duplicate pks.

Usage::

    python scripts/scale_curve.py [fan] [query ...]

Writes one JSON line per query and a summary to stdout; paste the
table into SCALE.md ("Measured scale-up curve" section).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale"
)

# the 10 heaviest BENCH_r10 rows and the growth their plan predicts
# for an N-times fanout (documented in SCALE.md):
#   linear      — map-only / bucketed-shuffle work, t ~ N
#   nlogn       — sort/shuffle bound, t ~ N log N (exponent ~1.1 at N=10)
#   quadratic   — both join sides grow: kNN/bitext flops ~ N^2
DEFAULT_QUERIES = {
    "q_llm_pipeline": "linear",
    "q_resize_roundtrip": "linear",
    "q_simhash_near_dup": "linear",
    "q_bitext_mine_blocked": "quadratic",
    "q_simhash_near_dup_capped": "linear",
    "q_pq_topk": "linear",
    "q_minhash_near_dup_capped": "linear",
    "q_rfm_segments": "linear",
    "q_bpe_encode": "linear",
    "q_minhash_near_dup": "linear",
    # r11 verdict task 5: measured points for the tx layer — the
    # merge/MOR-delete/commit-time-CDF arcs whose 100 TB story
    # (partition-scoped rewrites, kilobyte DV sidecars, change files
    # proportional to the commit) was previously argued from design
    # only. All reset/rebuild per call, so both legs time the same
    # end-to-end arc.
    "q_tx_merge_raw": "linear",
    "q_tx_delete_raw": "linear",
    "q_tx_cdf_raw": "linear",
}

# arcs that reset their scratch table INSIDE the callable: both legs
# get best-of-2 so neither includes the one-time create of a fresh
# scratch dir while the other does not
SELF_RESETTING = {"q_tx_merge_raw", "q_tx_delete_raw", "q_tx_cdf_raw"}

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()
FANNED = {"documents", "embeddings", "events", "orders"}


def build_fanout(fan: int) -> str:
    out_dir = os.path.join(SCALE_ROOT, f"x{fan}")
    marker = os.path.join(out_dir, ".complete-v2")  # v2: +orders fanout
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    import duckdb

    con = duckdb.connect()
    copies = ", ".join(str(c) for c in range(fan))
    print(f"building {fan}x fanout under {out_dir} ...", flush=True)
    con.execute(
        f"""
        COPY (
          SELECT d.doc_id + c.copy * 100_000_000 AS doc_id,
                 CASE WHEN c.copy = 0 THEN d.text
                      ELSE regexp_replace(
                        d.text,
                        '((?:\\S+\\s+){{4}}\\S+)\\s+',
                        '\\1 zq' || c.copy || 'x' || (d.doc_id % 9973)
                          || ' ', 'g')
                 END AS text,
                 d.lang, d.source,
                 CAST(length(CASE WHEN c.copy = 0 THEN d.text
                      ELSE regexp_replace(
                        d.text,
                        '((?:\\S+\\s+){{4}}\\S+)\\s+',
                        '\\1 zq' || c.copy || 'x' || (d.doc_id % 9973)
                          || ' ', 'g') END) AS BIGINT)
                   AS n_chars
          FROM read_parquet('{BASE}/documents.parquet') d,
               (SELECT unnest([{copies}]) AS copy) c
        ) TO '{out_dir}/documents.parquet' (FORMAT parquet)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT e.vec_id + c.copy * 100_000_000 AS vec_id,
                 CAST(
                   [e.embedding[1] + c.copy * 0.0013]
                   || e.embedding[2:] AS FLOAT[]) AS embedding,
                 e.label
          FROM read_parquet('{BASE}/embeddings.parquet') e,
               (SELECT unnest([{copies}]) AS copy) c
        ) TO '{out_dir}/embeddings.parquet' (FORMAT parquet)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT e.event_id + c.copy * 10_000_000_000 AS event_id,
                 e.ts,
                 e.user_id + c.copy * 100_000_000 AS user_id,
                 e.event_type, e.value, e.props
          FROM read_parquet('{BASE}/events.parquet') e,
               (SELECT unnest([{copies}]) AS copy) c
        ) TO '{out_dir}/events.parquet' (FORMAT parquet)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT o.o_orderkey + CAST(c.copy AS BIGINT) * 1_000_000_000
                   AS o_orderkey,
                 o.o_custkey + CAST(c.copy AS BIGINT) * 100_000_000
                   AS o_custkey,
                 o.o_orderstatus, o.o_totalprice, o.o_orderdate,
                 o.o_orderpriority
          FROM read_parquet('{BASE}/orders.parquet') o,
               (SELECT unnest([{copies}]) AS copy) c
        ) TO '{out_dir}/orders.parquet' (FORMAT parquet)
        """
    )
    for t in TABLES:
        if t in FANNED:
            continue
        src = os.path.join(BASE, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)
    with open(marker, "w") as fh:
        fh.write("ok")
    return out_dir


def _run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    fan = int(args[0]) if args and args[0].isdigit() else 10
    names = [a for a in args if not a.isdigit()] or list(DEFAULT_QUERIES)
    fan_dir = build_fanout(fan)

    from bi_utils_spark import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("scale-curve")
    spark.range(1).count()
    queries = dict(entry_mod.queries())
    from bi_utils_spark.entry_queries import RAW_QUERIES

    queries.update(RAW_QUERIES)

    results = []
    for name in names:
        fn = queries[name]
        walls = {}
        for label, d in (("base", BASE), (f"x{fan}", fan_dir)):
            reps = 2 if (label == "base" or name in SELF_RESETTING) else 1
            best = math.inf
            for _ in range(reps):
                t0 = time.monotonic()
                _run(fn(spark, d))
                best = min(best, time.monotonic() - t0)
            walls[label] = best
        ratio = walls[f"x{fan}"] / walls["base"]
        exp = math.log(ratio) / math.log(fan)
        rec = {
            "query": name,
            "t_base_s": round(walls["base"], 3),
            f"t_x{fan}_s": round(walls[f"x{fan}"], 3),
            "ratio": round(ratio, 2),
            "exponent": round(exp, 2),
            "expected": DEFAULT_QUERIES.get(name, "?"),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    print("\n| query | t(sf0.1) | t(x%d) | ratio | exponent | expected |" % fan)
    print("|---|---|---|---|---|---|")
    for r in results:
        print(
            f"| {r['query']} | {r['t_base_s']:.2f} s | "
            f"{r[f't_x{fan}_s']:.2f} s | {r['ratio']:.1f}x | "
            f"{r['exponent']:.2f} | {r['expected']} |"
        )


if __name__ == "__main__":
    main()
