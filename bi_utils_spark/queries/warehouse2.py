"""Warehouse modeling surface: SCD2 arcs, DQ reports, histograms,
fuzzy joins, rolling windows, golden records, CDC, attribution,
A/B tests, graph ops, quantile sketches, Pareto/RFM, PSI drift,
profiling."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bi_utils_spark.queries.core import load, register
from bi_utils_spark.queries.webtext import (
    _BPE_WORDS,
    _PR_EDGES_SQL,
    _bpe_chain_sql,
    _pr_edges,
)



# ---------------------------------------------------------------------------
# X74: SCD Type 2 dimension maintenance. The oracle replays the
# interval construction with window functions (LAG boundary detect,
# running-sum segments, LEAD close-out) and the batch fold as a
# closed-form CASE over the planted update classes.
# ---------------------------------------------------------------------------


@register(
    "q_scd2_history",
    """
    WITH src AS (
      SELECT user_id, ts, event_id, event_type FROM events
      WHERE user_id % 10 = 0
    ),
    o AS (
      SELECT *,
        LAG(event_type) OVER
          (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
        ROW_NUMBER() OVER
          (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM src
    ),
    s AS (
      SELECT *,
        SUM(CASE WHEN rn = 1 OR prev IS DISTINCT FROM event_type
                 THEN 1 ELSE 0 END)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS seg
      FROM o
    ),
    v AS (
      SELECT user_id, seg, min(event_type) AS event_type,
             min(ts) AS valid_from
      FROM s GROUP BY user_id, seg
    )
    SELECT user_id, event_type,
           epoch_us(valid_from) AS valid_from_us,
           epoch_us(LEAD(valid_from) OVER
             (PARTITION BY user_id ORDER BY seg)) AS valid_to_us,
           CAST(LEAD(valid_from) OVER
             (PARTITION BY user_id ORDER BY seg) IS NULL AS INT)
             AS is_current
    FROM v
    """,
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 interval build (X74, r6): each user's event_type history
    collapses into validity intervals — consecutive same-type events
    merge, valid_to = next version's start, exactly one current row
    per user. The oracle reconstructs every interval independently."""
    from bi_utils_spark.operators.scd import scd2_from_history

    src = load(spark, sf_dir, "events").where(
        F.col("user_id") % 10 == 0
    )
    dim = scd2_from_history(
        src, ["user_id"], ["event_type"], "ts",
        tiebreak_cols=["event_id"],
    )
    return dim.select(
        "user_id",
        "event_type",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        F.col("is_current").cast("int").alias("is_current"),
    )


_SCD_T0 = 1700000000000000  # epoch-µs batch clocks (FIXTURES.md §3:
_SCD_T1 = 1700086400000000  # no wall-clock; literal warehouse loads)


@register(
    "q_scd2_apply",
    f"""
    WITH dim AS (
      SELECT c_custkey AS k, c_mktsegment AS seg FROM customer
    )
    SELECT k, seg,
           CAST({_SCD_T0} AS BIGINT) AS valid_from_us,
           CASE WHEN k % 7 = 0 THEN CAST({_SCD_T1} AS BIGINT)
           END AS valid_to_us,
           CAST(k % 7 <> 0 AS INT) AS is_current
    FROM dim
    UNION ALL
    SELECT k, 'MOVED', CAST({_SCD_T1} AS BIGINT), NULL, 1
    FROM dim WHERE k % 7 = 0
    UNION ALL
    SELECT k + 10000000, 'NEWSEG', CAST({_SCD_T1} AS BIGINT), NULL, 1
    FROM dim WHERE k % 97 = 0
    """,
)
def q_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One SCD2 batch fold (X74, r6) over the customer dimension:
    custkey%7==0 changes segment (old row closes at T1, new opens),
    custkey%7==1 re-delivers its current attributes (no-op row
    survives untouched), custkey%97==0 plants a brand-new key.
    The oracle states the expected table closed-form per class."""
    from bi_utils_spark.operators.scd import scd2_apply

    cust = load(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    dim = cust.select(
        k.alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.lit(_SCD_T0).alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = (
        cust.where(k % 7 == 0).select(
            k.alias("k"), F.lit("MOVED").alias("seg")
        )
        .unionByName(
            cust.where(k % 7 == 1).select(
                k.alias("k"), F.col("c_mktsegment").alias("seg")
            )
        )
        .unionByName(
            cust.where(k % 97 == 0).select(
                (k + 10000000).alias("k"), F.lit("NEWSEG").alias("seg")
            )
        )
    )
    out = scd2_apply(dim, updates, ["k"], ["seg"], F.lit(_SCD_T1))
    return out.select(
        "k",
        "seg",
        F.col("valid_from").alias("valid_from_us"),
        F.col("valid_to").alias("valid_to_us"),
        F.col("is_current").cast("int").alias("is_current"),
    )


@register(
    "q_scd2_snapshot",
    """
    WITH src AS (
      SELECT user_id, ts, event_id, event_type FROM events
      WHERE user_id % 10 = 0
    ),
    o AS (
      SELECT *,
        LAG(event_type) OVER
          (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
        ROW_NUMBER() OVER
          (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM src
    ),
    s AS (
      SELECT *,
        SUM(CASE WHEN rn = 1 OR prev IS DISTINCT FROM event_type
                 THEN 1 ELSE 0 END)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS seg
      FROM o
    ),
    v AS (
      SELECT user_id, seg, min(event_type) AS event_type,
             min(ts) AS valid_from
      FROM s GROUP BY user_id, seg
    ),
    d AS (
      SELECT user_id, event_type, valid_from,
             LEAD(valid_from) OVER
               (PARTITION BY user_id ORDER BY seg) AS valid_to
      FROM v
    ),
    wm AS (SELECT max(ts) - INTERVAL 7 DAY AS at FROM events)
    SELECT d.user_id, d.event_type,
           epoch_us(d.valid_from) AS valid_from_us
    FROM d, wm
    WHERE d.valid_from <= wm.at
      AND (d.valid_to IS NULL OR d.valid_to > wm.at)
    """,
)
def q_scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension read (X74, r6): the as-of row per user
    at (global max ts − 7 days) — one row per user active by then,
    interval cover recomputed independently by the oracle. The
    as-of instant rides a broadcast 1-row bounds frame; the filter
    itself is scd2_snapshot's map-only predicate."""
    from bi_utils_spark.operators.scd import scd2_from_history, scd2_snapshot

    events = load(spark, sf_dir, "events")
    src = events.where(F.col("user_id") % 10 == 0)
    dim = scd2_from_history(
        src, ["user_id"], ["event_type"], "ts",
        tiebreak_cols=["event_id"],
    )
    wm = events.agg(
        (F.max("ts") - F.expr("INTERVAL 7 DAYS")).alias("at")
    )
    snap = scd2_snapshot(
        dim.crossJoin(F.broadcast(wm)), F.col("at")
    )
    return snap.select(
        "user_id",
        "event_type",
        F.unix_micros("valid_from").alias("valid_from_us"),
    )


@register(
    "q_scd2_apply_changes",
    """
    WITH src AS (
      SELECT user_id, ts, event_id, event_type FROM events
      WHERE user_id % 10 = 0
    ),
    o AS (
      SELECT *,
        LAG(event_type) OVER
          (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
        ROW_NUMBER() OVER
          (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM src
    ),
    s AS (
      SELECT *,
        SUM(CASE WHEN rn = 1 OR prev IS DISTINCT FROM event_type
                 THEN 1 ELSE 0 END)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS seg
      FROM o
    ),
    v AS (
      SELECT user_id, seg, min(event_type) AS event_type,
             min(ts) AS valid_from
      FROM s GROUP BY user_id, seg
    )
    SELECT user_id, event_type,
           epoch_us(valid_from) AS valid_from_us,
           epoch_us(LEAD(valid_from) OVER
             (PARTITION BY user_id ORDER BY seg)) AS valid_to_us,
           CAST(LEAD(valid_from) OVER
             (PARTITION BY user_id ORDER BY seg) IS NULL AS INT)
             AS is_current
    FROM v
    """,
)
def q_scd2_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 fold equals full rebuild (X106, r7): the
    change log splits at its timestamp midpoint; the first half
    builds the stored dimension, the second half folds in through
    scd2_apply_changes — the multi-timestamp micro-batch primitive
    behind streaming/scd.py::scd2_maintain_stream (same code path;
    file-micro-batch parity is test-asserted in test_streaming).
    The oracle is the ONE-PASS full-history rebuild, so a green row
    proves the incremental fold lands on the identical table."""
    from bi_utils_spark.operators.scd import (
        scd2_apply_changes,
        scd2_from_history,
    )

    src = load(spark, sf_dir, "events").where(
        F.col("user_id") % 10 == 0
    )
    # midpoint cut in epoch-µs: integer arithmetic, engine-exact;
    # one bounded driver fetch (1 row)
    cut = src.agg(
        (
            (F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts")))
            / F.lit(2)
        ).cast("long").alias("cut")
    ).first()["cut"]
    hist = src.where(F.unix_micros("ts") < cut)
    chg = src.where(F.unix_micros("ts") >= cut)
    dim = scd2_from_history(
        hist, ["user_id"], ["event_type"], "ts",
        tiebreak_cols=["event_id"],
    )
    out = scd2_apply_changes(
        dim, chg, ["user_id"], ["event_type"], "ts",
        tiebreak_cols=["event_id"],
    )
    return out.select(
        "user_id",
        "event_type",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        F.col("is_current").cast("int").alias("is_current"),
    )


# ---------------------------------------------------------------------------
# X75: declarative data-quality constraints. The fixture plants
# defect classes on orders (nulled FKs, dangling FKs, duplicated
# rows) and the oracle recomputes every (ok, total) pair and verdict
# with plain conditional aggregation.
# ---------------------------------------------------------------------------

_DQ_FIXTURE_SQL = """
      WITH f0 AS (
        SELECT o_orderkey,
          CASE WHEN o_orderkey % 50 = 0 THEN NULL
               WHEN o_orderkey % 50 = 7 THEN o_custkey + 1000000
               ELSE o_custkey END AS o_custkey,
          o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
      )
      SELECT * FROM f0
      UNION ALL
      SELECT * FROM f0 WHERE o_orderkey % 100 = 0
"""


@register(
    "q_dq_report",
    f"""
    WITH f AS ({_DQ_FIXTURE_SQL}),
    base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS total,
        CAST(SUM(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS c_comp,
        CAST(SUM(CASE WHEN o_totalprice >= 0.0
                       AND o_totalprice <= 250000.0
                 THEN 1 ELSE 0 END) AS BIGINT) AS c_range,
        CAST(SUM(CASE WHEN o_orderstatus IN ('O', 'F')
                 THEN 1 ELSE 0 END) AS BIGINT) AS c_acc,
        CAST(SUM(CASE WHEN regexp_matches(o_orderpriority, '^[1-3]-')
                 THEN 1 ELSE 0 END) AS BIGINT) AS c_re
      FROM f
    ),
    u AS (
      SELECT CAST(SUM(CASE WHEN n = 1 THEN n ELSE 0 END) AS BIGINT)
               AS ok,
             CAST(SUM(n) AS BIGINT) AS total
      FROM (SELECT COUNT(*) AS n FROM f GROUP BY o_orderkey)
    ),
    r AS (
      SELECT CAST(SUM(CASE WHEN c.c_custkey IS NOT NULL
                      THEN 1 ELSE 0 END) AS BIGINT) AS ok,
             CAST(COUNT(*) AS BIGINT) AS total
      FROM f LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        ON f.o_custkey = c.c_custkey
      WHERE f.o_custkey IS NOT NULL
    ),
    m AS (
      SELECT 'completeness(o_custkey)' AS "constraint", c_comp AS ok,
             total, 1.0 AS thr FROM base
      UNION ALL
      SELECT 'in_range(o_totalprice)', c_range, total, 0.4 FROM base
      UNION ALL
      SELECT 'accepted(o_orderstatus)', c_acc, total, 0.9 FROM base
      UNION ALL
      SELECT 'matches(o_orderpriority)', c_re, total, 0.5 FROM base
      UNION ALL
      SELECT 'unique(o_orderkey)', ok, total, 1.0 FROM u
      UNION ALL
      SELECT 'referential(o_custkey)', ok, total, 0.95 FROM r
    )
    SELECT "constraint", ok, total,
           CAST(ok AS DOUBLE) / CAST(total AS DOUBLE) AS value,
           CAST(CAST(ok AS DOUBLE) / CAST(total AS DOUBLE) >= thr
                AS INT) AS passed
    FROM m
    """,
)
def q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative DQ report (X75, r6) over the planted-defect orders
    fixture: nulled FKs (okey%50=0), dangling FKs (okey%50=7, +1M),
    duplicated rows (okey%100=0). Six constraints — four row-local
    (ONE shared aggregation pass), one key-uniqueness, one
    referential — each an exact (ok, total) pair the oracle
    recomputes, with threshold verdicts."""
    from bi_utils_spark.operators.dq import Check, dq_report

    orders = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    mutated = orders.select(
        "o_orderkey",
        F.when(k % 50 == 0, F.lit(None))
        .when(k % 50 == 7, F.col("o_custkey") + 1000000)
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
        "o_orderstatus",
        "o_totalprice",
        "o_orderpriority",
    )
    fixture = mutated.unionByName(mutated.where(k % 100 == 0))
    checks = [
        Check("completeness", "o_custkey"),
        Check("in_range", "o_totalprice", lo=0.0, hi=250000.0,
              min_fraction=0.4),
        Check("accepted", "o_orderstatus", values=("O", "F"),
              min_fraction=0.9),
        Check("matches", "o_orderpriority", pattern="^[1-3]-",
              min_fraction=0.5),
        Check("unique", columns=("o_orderkey",)),
        Check("referential", "o_custkey", ref="customer",
              ref_key="c_custkey", min_fraction=0.95),
    ]
    rep = dq_report(
        fixture, checks,
        refs={"customer": load(spark, sf_dir, "customer")},
    )
    return rep.select(
        F.col("constraint"),
        "ok",
        "total",
        "value",
        F.col("passed").cast("int").alias("passed"),
    )


# ---------------------------------------------------------------------------
# X76: histograms. Equi-width arithmetic is plain IEEE floor
# division both engines compute identically; equi-depth assignment
# is pure integer math over the distinct-value CDF.
# ---------------------------------------------------------------------------


@register(
    "q_hist_width",
    """
    WITH b AS (
      SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
      FROM orders
    ),
    c AS (
      SELECT LEAST(CAST(FLOOR((o_totalprice - b.lo)
                        / ((b.hi - b.lo) / 20.0)) AS BIGINT),
                   19) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders, b
      GROUP BY 1
    )
    SELECT g.i AS bin,
           b.lo + g.i * ((b.hi - b.lo) / 20.0) AS bin_lo,
           b.lo + (g.i + 1) * ((b.hi - b.lo) / 20.0) AS bin_hi,
           COALESCE(c.n, 0) AS n
    FROM range(20) g(i)
    CROSS JOIN b
    LEFT JOIN c ON g.i = c.bin
    """,
)
def q_hist_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bin equi-width histogram of order totals (X76, r6) on data
    bounds — complete grid, max value in the last bin, bin edges and
    counts all recomputed by the oracle."""
    from bi_utils_spark.operators.histogram import equi_width_histogram

    return equi_width_histogram(
        load(spark, sf_dir, "orders"), "o_totalprice", 20
    )


@register(
    "q_hist_depth",
    """
    WITH v AS (
      SELECT l_quantity AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    ),
    p AS (
      SELECT v, c,
             SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c
               AS strt,
             SUM(c) OVER () AS total
      FROM v
    )
    SELECT CAST((strt * 8) // total AS BIGINT) AS bin,
           min(v) AS lo, max(v) AS hi,
           CAST(SUM(c) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_distinct
    FROM p GROUP BY 1
    """,
)
def q_hist_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-bucket equi-depth histogram of lineitem quantities (X76,
    r6) — 50 distinct values with heavy ties, so tie mass visibly
    widens buckets; the integer CDF assignment is replayed by the
    oracle's window."""
    from bi_utils_spark.operators.histogram import equi_depth_histogram

    return equi_depth_histogram(
        load(spark, sf_dir, "lineitem"), "l_quantity", 8
    )


# ---------------------------------------------------------------------------
# X77: unpivot/melt — the inverse of q_pivot_events. The oracle is
# the definitional UNION ALL; revenue uses the exact-DECIMAL
# accumulation rule so both engines agree bit-for-bit.
# ---------------------------------------------------------------------------


@register(
    "q_unpivot_metrics",
    """
    WITH w AS (
      SELECT o_orderstatus,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS custs,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38, 6)))
                  AS DECIMAL(38, 6)) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT o_orderstatus, 'n' AS metric, n AS value FROM w
    UNION ALL
    SELECT o_orderstatus, 'custs', custs FROM w
    UNION ALL
    SELECT o_orderstatus, 'revenue', revenue FROM w
    """,
)
def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-status metrics melted to long form (X77, r6): one
    row per (status, metric). Map-only generator projection over the
    3-row wide frame; the oracle is the definitional UNION ALL."""
    from bi_utils_spark.operators.relational import melt

    wide = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.countDistinct("o_custkey").cast("double").alias("custs"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("decimal(38,6)")
            .cast("double")
            .alias("revenue"),
        )
    )
    return melt(
        wide, ["o_orderstatus"], ["n", "custs", "revenue"],
        var_name="metric", value_name="value",
    )


# ---------------------------------------------------------------------------
# X78: fuzzy entity matching. All fixture edits are substitutions on
# same-length strings, where the pigeonhole blocker is provably
# complete — so the Spark output must EQUAL the oracle's exhaustive
# all-pairs Levenshtein truth (FP=0 by exact verify, recall=1 by the
# theorem). 12-hex-char md5 names keep blocks diverse.
# ---------------------------------------------------------------------------

_FUZZY_FIXTURE_SQL = """
      SELECT doc_id AS id,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS name
      FROM documents
      UNION ALL
      SELECT doc_id + 100000,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) || 'z' ||
             substr(md5(CAST(doc_id AS VARCHAR)), 5, 8)
      FROM documents WHERE doc_id % 5 = 0
"""


@register(
    "q_fuzzy_pairs",
    f"""
    WITH f AS ({_FUZZY_FIXTURE_SQL})
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(levenshtein(a.name, b.name) AS INT) AS dist
    FROM f a JOIN f b ON a.id < b.id
    WHERE levenshtein(a.name, b.name) <= 1
    """,
)
def q_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked Levenshtein dedup pairs (X78, r6) over the dirty
    registry fixture: doc_id%5==0 rows get a one-substitution typo
    twin ('z' ∉ hex, so the edit is always real). The oracle is the
    exhaustive all-pairs truth — the blocker must match it exactly
    on this substitution-only fixture."""
    from bi_utils_spark.operators.fuzzy import levenshtein_dedup_pairs

    d = F.col("doc_id")
    h = F.md5(d.cast("string"))
    base = load(spark, sf_dir, "documents").select(
        d.alias("id"), h.substr(1, 12).alias("name")
    )
    variants = (
        load(spark, sf_dir, "documents")
        .where(d % 5 == 0)
        .select(
            (d + 100000).alias("id"),
            F.concat(
                h.substr(1, 3), F.lit("z"), h.substr(5, 8)
            ).alias("name"),
        )
    )
    fixture = base.unionByName(variants)
    out = levenshtein_dedup_pairs(fixture, "id", "name", max_dist=1)
    return out.select(
        "id_a", "id_b", F.col("dist").cast("int").alias("dist")
    )


# ---------------------------------------------------------------------------
# X79/X80: rolling aggregates and least-squares trend over the X69
# grid. Rolling sums stay exact integers; the trend's Σ terms are
# exact BIGINTs on rebased x, so slope/intercept/r² come out of one
# IEEE division both engines reproduce.
# ---------------------------------------------------------------------------

_DAILY_GRID_SQL = """
    f AS (
      SELECT event_type,
             CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS bucket
      FROM events
    ),
    agg AS (SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS n
            FROM f GROUP BY 1, 2),
    bounds AS (SELECT MIN(bucket) AS lo, MAX(bucket) AS hi FROM f),
    grid AS (
      SELECT g.event_type, u.b AS bucket
      FROM (SELECT DISTINCT event_type FROM f) g
      CROSS JOIN (SELECT unnest(generate_series(
                    (SELECT lo FROM bounds),
                    (SELECT hi FROM bounds))) AS b) u
    ),
    series AS (
      SELECT g.event_type, g.bucket, COALESCE(a.n, 0) AS n
      FROM grid g LEFT JOIN agg a
        ON g.event_type = a.event_type AND g.bucket = a.bucket
    )
"""


@register(
    "q_rolling_daily",
    f"""
    WITH {_DAILY_GRID_SQL}
    SELECT event_type, bucket, n,
           CAST(SUM(n) OVER w AS BIGINT) AS n_roll_sum,
           CAST(SUM(n) OVER w AS DOUBLE) / COUNT(n) OVER w
             AS n_roll_avg,
           CAST(MIN(n) OVER w AS BIGINT) AS n_roll_min,
           CAST(MAX(n) OVER w AS BIGINT) AS n_roll_max
    FROM series
    WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def q_rolling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day rolling stats per event type (X79, r6) on the
    COMPLETE daily grid — zero-filled gaps participate in the
    window, so a quiet day genuinely drags the average down."""
    from bi_utils_spark.operators.timeseries import (
        resample_counts,
        rolling_agg,
    )

    series = resample_counts(
        load(spark, sf_dir, "events"),
        ts_col="ts",
        width_sec=86400,
        group_cols=("event_type",),
    )
    return rolling_agg(
        series, "bucket", ("event_type",), "n", window=7
    )


@register(
    "q_trend_daily",
    f"""
    WITH {_DAILY_GRID_SQL},
    b2 AS (
      SELECT event_type, MIN(bucket) AS x0, MAX(bucket) AS x1
      FROM series GROUP BY 1
    ),
    s AS (
      SELECT s.event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(s.bucket - b2.x0) AS BIGINT) AS sx,
             CAST(SUM(s.n) AS BIGINT) AS sy,
             CAST(SUM((s.bucket - b2.x0) * (s.bucket - b2.x0))
               AS BIGINT) AS sxx,
             CAST(SUM((s.bucket - b2.x0) * s.n) AS BIGINT) AS sxy,
             CAST(SUM(s.n * s.n) AS BIGINT) AS syy,
             MIN(b2.x0) AS x0, MIN(b2.x1) AS x1
      FROM series s JOIN b2 ON s.event_type = b2.event_type
      GROUP BY 1
    )
    SELECT event_type, n, x0,
      CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
           THEN (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
              / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      END AS slope,
      (CAST(sy AS DOUBLE)
        - (CASE WHEN CAST(n AS DOUBLE) * sxx
                     - CAST(sx AS DOUBLE) * sx > 0
                THEN (CAST(n AS DOUBLE) * sxy
                      - CAST(sx AS DOUBLE) * sy)
                   / (CAST(n AS DOUBLE) * sxx
                      - CAST(sx AS DOUBLE) * sx)
           END) * sx) / CAST(n AS DOUBLE) AS intercept,
      CASE WHEN (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
                > 0
           THEN ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 * (CAST(n AS DOUBLE) * sxy
                    - CAST(sx AS DOUBLE) * sy))
              / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 * (CAST(n AS DOUBLE) * syy
                    - CAST(sy AS DOUBLE) * sy))
      END AS r2,
      (CAST(sy AS DOUBLE)
        - (CASE WHEN CAST(n AS DOUBLE) * sxx
                     - CAST(sx AS DOUBLE) * sx > 0
                THEN (CAST(n AS DOUBLE) * sxy
                      - CAST(sx AS DOUBLE) * sy)
                   / (CAST(n AS DOUBLE) * sxx
                      - CAST(sx AS DOUBLE) * sx)
           END) * sx) / CAST(n AS DOUBLE)
        + (CASE WHEN CAST(n AS DOUBLE) * sxx
                     - CAST(sx AS DOUBLE) * sx > 0
                THEN (CAST(n AS DOUBLE) * sxy
                      - CAST(sx AS DOUBLE) * sy)
                   / (CAST(n AS DOUBLE) * sxx
                      - CAST(sx AS DOUBLE) * sx)
           END) * CAST(x1 - x0 + 1 AS DOUBLE) AS yhat_next
    FROM s
    """,
)
def q_trend_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily-count trend line (X80, r6) fitted on the dense
    grid: slope/day, fitted value at the first day, r², and a
    one-day-ahead forecast — every Σ exact, replayed by the oracle
    from the same closed forms."""
    from bi_utils_spark.operators.timeseries import (
        linear_trend,
        resample_counts,
    )

    series = resample_counts(
        load(spark, sf_dir, "events"),
        ts_col="ts",
        width_sec=86400,
        group_cols=("event_type",),
    )
    return linear_trend(series, "bucket", "n", ("event_type",))


# ---------------------------------------------------------------------------
# X81: triangle counting. The oracle enumerates (a<b<c) closed
# triples over the canonical undirected edge set directly — the
# degree-oriented compact-forward plan must produce identical
# per-node counts.
# ---------------------------------------------------------------------------


@register(
    "q_triangles",
    f"""
    WITH e0 AS ({_PR_EDGES_SQL}),
    e AS (
      SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM e0 WHERE src <> dst
    ),
    t AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1
      JOIN e e2 ON e1.b = e2.a
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    n AS (
      SELECT x AS v FROM t
      UNION ALL SELECT y FROM t
      UNION ALL SELECT z FROM t
    ),
    tc AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS triangles
           FROM n GROUP BY 1),
    deg AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS degree
      FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e)
      GROUP BY 1
    )
    SELECT deg.v AS node, deg.degree,
           COALESCE(tc.triangles, 0) AS triangles,
           CASE WHEN deg.degree >= 2
                THEN 2.0 * CAST(COALESCE(tc.triangles, 0) AS DOUBLE)
                   / (CAST(deg.degree AS DOUBLE)
                      * (CAST(deg.degree AS DOUBLE) - 1.0))
           END AS lcc
    FROM deg LEFT JOIN tc ON deg.v = tc.v
    """,
)
def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient
    (X81, r6) on the 21-node doc_id graph: compact-forward
    degree-oriented wedges vs the oracle's direct (a<b<c)
    enumeration."""
    from bi_utils_spark.operators.graph import triangle_counts

    return triangle_counts(_pr_edges(spark, sf_dir), "src", "dst")


# ---------------------------------------------------------------------------
# X82: BPE encoding with the trained merges — the apply half of
# X64. The oracle extends the same v0..v4 replay chain: the final
# symbol state IS each word's encoding, so documents built from the
# training vocab flatten their words' pieces in order.
# ---------------------------------------------------------------------------


def _bpe_encode_replay_sql(n_merges: int) -> str:
    return (
        _bpe_chain_sql(n_merges)
        + f""",
    enc AS (SELECT term, spaced FROM v{n_merges}),
    d AS (
      SELECT doc_id,
             doc_id % 8 AS i1,
             (doc_id + 3) % 8 AS i2,
             (doc_id * 5) % 8 AS i3
      FROM documents
    )
    SELECT d.doc_id,
           replace(e1.spaced || ' ' || e2.spaced || ' ' || e3.spaced,
                   ' ', '|') AS encoded,
           CAST(len(string_split(e1.spaced, ' '))
              + len(string_split(e2.spaced, ' '))
              + len(string_split(e3.spaced, ' ')) AS INT)
             AS n_bpe_tokens
    FROM d
    JOIN w w1 ON w1.i = d.i1 JOIN enc e1 ON e1.term = w1.term
    JOIN w w2 ON w2.i = d.i2 JOIN enc e2 ON e2.term = w2.term
    JOIN w w3 ON w3.i = d.i3 JOIN enc e3 ON e3.term = w3.term
    """
    )


@register("q_bpe_encode", _bpe_encode_replay_sql(4))
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus encoding with trained BPE merges (X82, r6): train the
    X64 four-merge model, then encode three-word documents drawn
    from the training vocab by doc_id arithmetic. Every distinct
    word folds through the merge chain once; occurrences join their
    pieces back. The oracle replays training AND encoding as one
    CTE chain."""
    from bi_utils_spark.operators.lm import bpe_encode, bpe_train

    dcnt = (
        load(spark, sf_dir, "documents")
        .groupBy((F.col("doc_id") % 8).alias("i"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # Arrow-local frame: the pickled-RDD path costs a Python-worker
    # round trip PER SLICE per consumer — coalesce(1) just serialized
    # those 32 round trips into one task (measured 4.5 s of the 4.6 s
    # wall in q_bpe_train); one Arrow batch removes the Python boundary
    from bi_utils_spark.operators.localrel import local_df

    words = local_df(
        spark, [(w, i) for i, w in enumerate(_BPE_WORDS)], "term string, i long"
    )
    model = words.join(dcnt, "i").select(
        "term", (F.col("n") + (8 - F.col("i")) * 7).alias("c")
    )
    merges_df, _state = bpe_train(model, 4)
    merges = [
        tuple(r["pair"].split(" ", 1))
        for r in merges_df.orderBy("rank").collect()
    ]
    d = F.col("doc_id")
    warr = F.array(*[F.lit(w) for w in _BPE_WORDS])
    fixture = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            " ",
            F.element_at(warr, (d % 8 + 1).cast("int")),
            F.element_at(warr, ((d + 3) % 8 + 1).cast("int")),
            F.element_at(warr, ((d * 5) % 8 + 1).cast("int")),
        ).alias("text"),
    )
    enc = bpe_encode(fixture, "doc_id", "text", merges)
    return enc.select(
        "doc_id",
        F.concat_ws("|", F.col("bpe_tokens")).alias("encoded"),
        F.col("n_bpe_tokens").cast("int").alias("n_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# X83: golden-record survivorship. The oracle recomputes the truth
# pair set exhaustively, closes it into clusters with a recursive
# CTE (the q_dedup_clusters pattern), and replays each field's
# latest-non-null pick with an ordered window.
# ---------------------------------------------------------------------------

_GOLDEN_FIXTURE_SQL = """
      SELECT doc_id AS id,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS name,
             'seg' || CAST(doc_id % 4 AS VARCHAR) AS segment,
             CASE WHEN doc_id % 3 = 0 THEN NULL
                  ELSE doc_id * 10 END AS balance,
             doc_id % 97 AS updated
      FROM documents
      UNION ALL
      SELECT doc_id + 100000,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) || 'z' ||
             substr(md5(CAST(doc_id AS VARCHAR)), 5, 8),
             NULL,
             doc_id * 10 + 5,
             doc_id % 97 + 100
      FROM documents WHERE doc_id % 5 = 0
"""


@register(
    "q_golden_record",
    f"""
    WITH RECURSIVE f AS ({_GOLDEN_FIXTURE_SQL}),
    jp AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM f a JOIN f b ON a.id < b.id
      WHERE levenshtein(a.name, b.name) <= 1
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM jp
      UNION ALL SELECT id_b, id_a FROM jp
    ),
    reach(node, lbl) AS (
      SELECT DISTINCT u, u FROM edges
      UNION
      SELECT e.u, r.lbl FROM edges e JOIN reach r ON e.v = r.node
    ),
    comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node),
    cl AS (
      SELECT f.*, COALESCE(c.component, f.id) AS cluster
      FROM f LEFT JOIN comp c ON f.id = c.node
    ),
    pn AS (SELECT cluster, name, ROW_NUMBER() OVER
             (PARTITION BY cluster ORDER BY updated DESC, id DESC) rn
           FROM cl WHERE name IS NOT NULL),
    ps AS (SELECT cluster, segment, ROW_NUMBER() OVER
             (PARTITION BY cluster ORDER BY updated DESC, id DESC) rn
           FROM cl WHERE segment IS NOT NULL),
    pb AS (SELECT cluster, balance, ROW_NUMBER() OVER
             (PARTITION BY cluster ORDER BY updated DESC, id DESC) rn
           FROM cl WHERE balance IS NOT NULL),
    agg AS (
      SELECT cluster, MIN(id) AS canonical_id,
             CAST(COUNT(*) AS BIGINT) AS n_members,
             MAX(updated) AS last_updated
      FROM cl GROUP BY 1
    )
    SELECT a.cluster, a.canonical_id, a.n_members, a.last_updated,
           pn.name, ps.segment, pb.balance
    FROM agg a
    LEFT JOIN (SELECT cluster, name FROM pn WHERE rn = 1) pn
      ON a.cluster = pn.cluster
    LEFT JOIN (SELECT cluster, segment FROM ps WHERE rn = 1) ps
      ON a.cluster = ps.cluster
    LEFT JOIN (SELECT cluster, balance FROM pb WHERE rn = 1) pb
      ON a.cluster = pb.cluster
    """,
)
def q_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution (X83, r6) over the dirty
    registry: blocked fuzzy match → CC clusters → one golden row per
    cluster with latest-non-null survivorship. Typo twins carry a
    newer timestamp but a NULL segment, so the golden row mixes the
    twin's name/balance with the base row's segment — both the
    never-overwrite rule and the recency rule are load-bearing."""
    from bi_utils_spark.operators.fuzzy import resolve_entities

    d = F.col("doc_id")
    h = F.md5(d.cast("string"))
    base = load(spark, sf_dir, "documents").select(
        d.alias("id"),
        h.substr(1, 12).alias("name"),
        F.concat(F.lit("seg"), (d % 4).cast("string")).alias("segment"),
        F.when(d % 3 == 0, F.lit(None).cast("long"))
        .otherwise(d * 10)
        .alias("balance"),
        (d % 97).alias("updated"),
    )
    variants = (
        load(spark, sf_dir, "documents")
        .where(d % 5 == 0)
        .select(
            (d + 100000).alias("id"),
            F.concat(h.substr(1, 3), F.lit("z"), h.substr(5, 8)).alias(
                "name"
            ),
            F.lit(None).cast("string").alias("segment"),
            (d * 10 + 5).alias("balance"),
            (d % 97 + 100).alias("updated"),
        )
    )
    fixture = base.unionByName(variants)
    return resolve_entities(
        fixture, "id", "name", "updated",
        ["name", "segment", "balance"],
    )


# ---------------------------------------------------------------------------
# X84: CDC net-effect apply. The op log derives bijectively from
# o_orderkey (key = okey mod 2000, ordinal = okey div 2000 — no
# ordinal ties by construction), deletes planted on okey%17=0; the
# oracle replays the fold as a ROW_NUMBER arg-max.
# ---------------------------------------------------------------------------


@register(
    "q_cdc_apply",
    """
    WITH log AS (
      SELECT o_orderkey % 2000 AS k,
             o_orderkey // 2000 AS ord,
             CASE WHEN o_orderkey % 17 = 0 THEN 'D' ELSE 'U' END AS op,
             o_totalprice AS price,
             o_orderstatus AS status
      FROM orders
    ),
    w AS (
      SELECT *, ROW_NUMBER() OVER
               (PARTITION BY k ORDER BY ord DESC) AS rn
      FROM log
    )
    SELECT k, price, status, CAST(ord AS BIGINT) AS ord
    FROM w WHERE rn = 1 AND op <> 'D'
    """,
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC fold to final state (X84, r6): 15000 I/U/D changes over
    2000 keys — highest ordinal wins, keys whose last change is a
    delete disappear. One arg-max aggregation; the oracle replays it
    with a window."""
    from bi_utils_spark.operators.cdc import apply_cdc

    k = F.col("o_orderkey")
    log = load(spark, sf_dir, "orders").select(
        (k % 2000).alias("k"),
        F.expr("o_orderkey div 2000").alias("ord"),
        F.when(k % 17 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    return apply_cdc(log, ["k"], ["price", "status"])


# ---------------------------------------------------------------------------
# X85: attribution. Credits are exact integers (counts; linear
# shares quantized 1e7 div k and summed as BIGINTs), so the oracle
# replays all three position models with the same windows.
# ---------------------------------------------------------------------------


@register(
    "q_attribution",
    """
    WITH src AS (
      SELECT event_id, user_id, ts, event_type FROM events
      WHERE user_id % 7 = 0
    ),
    o AS (
      SELECT *,
        CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END
          AS is_t,
        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_c
      FROM src
    ),
    w AS (
      SELECT *,
        SUM(is_t) OVER
          (PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS rc,
        first_value(CASE WHEN is_t = 1 THEN event_id END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS first_tid,
        last_value(CASE WHEN is_t = 1 THEN event_id END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS last_tid
      FROM o
    ),
    lin AS (
      SELECT *,
        SUM(CASE WHEN is_c = 1 AND rc > 0
                 THEN 10000000 // rc ELSE 0 END)
          OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                ROWS UNBOUNDED PRECEDING) AS lq
      FROM w
    ),
    convs AS (SELECT * FROM w WHERE is_c = 1 AND rc > 0),
    fc AS (SELECT first_tid AS event_id,
                  CAST(COUNT(*) AS BIGINT) AS n_first
           FROM convs GROUP BY 1),
    lc AS (SELECT last_tid AS event_id,
                  CAST(COUNT(*) AS BIGINT) AS n_last
           FROM convs GROUP BY 1)
    SELECT t.event_id, t.user_id, epoch_us(t.ts) AS ts_us,
           COALESCE(fc.n_first, 0) AS n_first,
           COALESCE(lc.n_last, 0) AS n_last,
           CAST(t.lq AS DOUBLE) / 10000000 AS linear_credit
    FROM lin t
    LEFT JOIN fc ON t.event_id = fc.event_id
    LEFT JOIN lc ON t.event_id = lc.event_id
    WHERE t.is_t = 1
    """,
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-touch attribution credits (X85, r6) on the raw event
    timelines (user_id % 7 slice): first/last counts and fixed-point
    linear shares across each user's purchases."""
    from bi_utils_spark.operators.attribution import attribute_touches

    src = load(spark, sf_dir, "events").where(F.col("user_id") % 7 == 0)
    out = attribute_touches(src, ("purchase",), ("click", "view"))
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "n_first",
        "n_last",
        "linear_credit",
    )


# ---------------------------------------------------------------------------
# X86: session paths. The oracle rebuilds sessions with the
# q_sessionize windows and the path with an ordered list aggregate
# sliced to k.
# ---------------------------------------------------------------------------


@register(
    "q_session_paths",
    """
    WITH g AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, event_id, event_type,
             SUM(is_new) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid,
             ts
      FROM g
    ),
    p AS (
      SELECT user_id, sid,
             array_to_string(
               (list(event_type ORDER BY ts, event_id))[1:3],
               '>') AS path
      FROM s GROUP BY user_id, sid
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM p GROUP BY path
    ORDER BY n_sessions DESC, path ASC
    LIMIT 20
    """,
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 session-opening paths (X86, r6): 30-minute gap
    sessions, first 3 event types joined by '>' — counts and
    ordering replayed by the oracle's ordered list aggregate."""
    from bi_utils_spark.operators.events import top_session_paths

    return top_session_paths(
        load(spark, sf_dir, "events"), n=20, gap_sec=1800, k=3
    )


# ---------------------------------------------------------------------------
# X87: A/B readouts. Quantized Σv/Σv² are exact HUGEINT/DECIMAL
# integers, so the oracle replays the entire Welch/proportion
# arithmetic as the same double-op sequence — bit-stable
# significance.
# ---------------------------------------------------------------------------


@register(
    "q_ab_welch",
    """
    WITH f AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'c' ELSE 't' END AS grp,
             CASE WHEN user_id % 2 = 0 THEN value
                  ELSE value * 1.1 END AS v
      FROM events
    ),
    q AS (SELECT grp, CAST(FLOOR(v * 1000000) AS HUGEINT) AS vq FROM f),
    m AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(vq) AS s1, SUM(vq * vq) AS s2
          FROM q GROUP BY 1),
    c AS (SELECT n AS n_c, CAST(s1 AS DOUBLE) AS c1,
                 CAST(s2 AS DOUBLE) AS c2 FROM m WHERE grp = 'c'),
    t AS (SELECT n AS n_t, CAST(s1 AS DOUBLE) AS t1,
                 CAST(s2 AS DOUBLE) AS t2 FROM m WHERE grp = 't'),
    j AS (SELECT * FROM c CROSS JOIN t),
    d AS (
      SELECT n_c, n_t,
        c1 / CAST(n_c AS DOUBLE) / 1000000 AS mean_c,
        t1 / CAST(n_t AS DOUBLE) / 1000000 AS mean_t,
        ((c2 - c1 * c1 / CAST(n_c AS DOUBLE))
          / (CAST(n_c AS DOUBLE) - 1.0)) / 1000000000000 AS var_c,
        ((t2 - t1 * t1 / CAST(n_t AS DOUBLE))
          / (CAST(n_t AS DOUBLE) - 1.0)) / 1000000000000 AS var_t
      FROM j
    )
    SELECT n_c, n_t, mean_c, mean_t,
           (mean_t - mean_c) / mean_c AS lift,
           (mean_t - mean_c) / sqrt(var_t / CAST(n_t AS DOUBLE)
                                  + var_c / CAST(n_c AS DOUBLE)) AS z,
           CAST(ABS((mean_t - mean_c)
                / sqrt(var_t / CAST(n_t AS DOUBLE)
                     + var_c / CAST(n_c AS DOUBLE)))
                > 1.959963984540054 AS INT) AS significant
    FROM d
    """,
)
def q_ab_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch z readout (X87, r6) on a planted experiment: treatment
    (odd users) carries a 10% metric uplift. Every moment exact;
    the oracle replays the identical double-op sequence."""
    from bi_utils_spark.operators.abtest import welch_test

    u = F.col("user_id")
    f = load(spark, sf_dir, "events").select(
        F.when(u % 2 == 0, F.lit("c")).otherwise(F.lit("t")).alias(
            "grp"
        ),
        F.when(u % 2 == 0, F.col("value"))
        .otherwise(F.col("value") * 1.1)
        .alias("v"),
    )
    return welch_test(f, "grp", "v", "c", "t")


@register(
    "q_ab_proportion",
    """
    WITH f AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'c' ELSE 't' END AS grp,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ok
      FROM events
    ),
    m AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(ok) AS BIGINT) AS x
          FROM f GROUP BY 1),
    c AS (SELECT n AS n_c, x AS conv_c FROM m WHERE grp = 'c'),
    t AS (SELECT n AS n_t, x AS conv_t FROM m WHERE grp = 't'),
    j AS (SELECT * FROM c CROSS JOIN t),
    d AS (
      SELECT n_c, n_t, conv_c, conv_t,
        CAST(conv_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS rate_c,
        CAST(conv_t AS DOUBLE) / CAST(n_t AS DOUBLE) AS rate_t,
        CAST(conv_c + conv_t AS DOUBLE)
          / (CAST(n_c AS DOUBLE) + CAST(n_t AS DOUBLE)) AS pool
      FROM j
    )
    SELECT n_c, n_t, conv_c, conv_t, rate_c, rate_t,
           (rate_t - rate_c) / rate_c AS lift,
           (rate_t - rate_c)
             / sqrt(pool * (1.0 - pool)
                    * (1.0 / CAST(n_c AS DOUBLE)
                       + 1.0 / CAST(n_t AS DOUBLE))) AS z,
           CAST(ABS((rate_t - rate_c)
                / sqrt(pool * (1.0 - pool)
                       * (1.0 / CAST(n_c AS DOUBLE)
                          + 1.0 / CAST(n_t AS DOUBLE))))
                > 1.959963984540054 AS INT) AS significant
    FROM d
    """,
)
def q_ab_proportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z readout (X87, r6): purchase conversion by
    user parity — four exact counts in, the full decision row out."""
    from bi_utils_spark.operators.abtest import proportion_test

    u = F.col("user_id")
    f = load(spark, sf_dir, "events").select(
        F.when(u % 2 == 0, F.lit("c")).otherwise(F.lit("t")).alias(
            "grp"
        ),
        (F.col("event_type") == "purchase").alias("ok"),
    )
    return proportion_test(f, "grp", F.col("ok"), "c", "t")


# ---------------------------------------------------------------------------
# X88: label propagation. Fixed-round synchronous LPA with
# (count desc, label asc) tie-breaks is pure integer logic, so the
# oracle replays every round as a chained CTE over the PR edge
# fixture.
# ---------------------------------------------------------------------------


def _lpa_replay_sql(n_iter: int) -> str:
    sql = f"""
    WITH e0 AS ({_PR_EDGES_SQL}),
    e AS (
      SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM e0 WHERE src <> dst
    ),
    sym AS (
      SELECT a AS s, b AS d FROM e
      UNION ALL SELECT b, a FROM e
    ),
    l0 AS (SELECT DISTINCT s AS node, s AS label FROM sym)"""
    for i in range(1, n_iter + 1):
        prev = f"l{i - 1}"
        sql += f""",
    c{i} AS (
      SELECT sym.d AS node, l.label, COUNT(*) AS c
      FROM sym JOIN {prev} l ON sym.s = l.node
      GROUP BY 1, 2
    ),
    p{i} AS (
      SELECT node, label FROM (
        SELECT node, label, ROW_NUMBER() OVER
          (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
        FROM c{i}
      ) WHERE rn = 1
    ),
    l{i} AS (
      SELECT l.node, COALESCE(p.label, l.label) AS label
      FROM {prev} l LEFT JOIN p{i} p ON l.node = p.node
    )"""
    return sql + f"\n    SELECT node, label FROM l{n_iter}"


@register("q_label_propagation", _lpa_replay_sql(3))
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three LPA rounds on the 21-node doc_id graph (X88, r6):
    majority labels with smallest-label ties, every round replayed
    by the oracle's CTE chain."""
    from bi_utils_spark.operators.graph import label_propagation

    return label_propagation(
        _pr_edges(spark, sf_dir), n_iter=3, src="src", dst="dst"
    )


# ---------------------------------------------------------------------------
# X89: mergeable quantile sketches. Bound-checking oracle (the
# q_hll_daily_users pattern): the exact rank quantile is
# cross-engine ground truth via the distinct-value CDF; the
# DDSketch estimate must land within α — pinned as an integer flag.
# ---------------------------------------------------------------------------


@register(
    "q_quantile_sketch",
    """
    WITH v AS (
      SELECT l_returnflag AS flag, l_extendedprice AS val,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2
    ),
    tot AS (SELECT flag, SUM(c) AS n FROM v GROUP BY 1),
    cdf AS (
      SELECT flag, val,
             SUM(c) OVER (PARTITION BY flag ORDER BY val
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM v
    ),
    x AS (
      SELECT c.flag, q.q, MIN(c.val) AS exact_q
      FROM cdf c
      JOIN tot t ON c.flag = t.flag
      JOIN (VALUES (0.5), (0.95)) q(q) ON c.cum >= CEIL(q.q * t.n)
      GROUP BY 1, 2
    )
    SELECT flag, q, exact_q, 1 AS within_alpha FROM x
    """,
)
def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag p50/p95 price from daily-mergeable DDSketch
    log buckets (X89, r6): exact rank quantiles are the
    cross-engine truth; the sketch estimates (deterministic given
    the data) must land within α = 1% — attested as flags the
    oracle hashes."""
    from pyspark.sql import Window

    from bi_utils_spark.operators.quantile_sketch import (
        qsketch_build,
        qsketch_quantiles,
    )

    alpha = 0.01
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("val"),
    )
    sk = qsketch_build(li, "val", ("flag",), alpha)
    est = qsketch_quantiles(sk, (0.5, 0.95), ("flag",), alpha)
    # exact rank quantile over the distinct-value CDF (bounded by
    # the value domain; partitioned window)
    v = li.groupBy("flag", "val").agg(F.count(F.lit(1)).alias("c"))
    tot = v.groupBy("flag").agg(F.sum("c").alias("n"))
    w = (
        Window.partitionBy("flag")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cdf = v.withColumn("cum", F.sum("c").over(w)).join(
        F.broadcast(tot), "flag"
    )
    from bi_utils_spark.operators.localrel import local_df

    qs = local_df(spark, [(0.5,), (0.95,)], "q double")
    exact = (
        cdf.join(
            F.broadcast(qs),
            F.col("cum") >= F.ceil(F.col("q") * F.col("n")),
        )
        .groupBy("flag", "q")
        .agg(F.min("val").alias("exact_q"))
    )
    return exact.join(est, ["flag", "q"]).select(
        "flag",
        "q",
        "exact_q",
        (
            F.abs(F.col("est") - F.col("exact_q"))
            <= F.lit(alpha) * F.col("exact_q")
        )
        .cast("int")
        .alias("within_alpha"),
    )


# ---------------------------------------------------------------------------
# X90: TF-IDF keywords. idf quantizes ln((N+1)/(df+1)) to 1e-7
# fixed point (the importance.py discipline), so scores are exact
# integer products and the per-doc ranking replays in SQL.
# ---------------------------------------------------------------------------


@register(
    "q_tfidf_terms",
    r"""
    WITH toks AS (
      SELECT doc_id, unnest(
               regexp_split_to_array(trim(lower(text)), '\s+')) AS t
      FROM documents
    ),
    tf AS (
      SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE t <> '' GROUP BY 1, 2
    ),
    nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n
           FROM documents),
    dfreq AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df
              FROM tf GROUP BY 1),
    idf AS (
      SELECT t,
             CAST(FLOOR(10000000.0 * ln(
               CAST(nd.n + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)))
               AS BIGINT) + 10000000 AS idf_q
      FROM dfreq, nd
    ),
    scored AS (
      SELECT tf.doc_id, tf.t, tf.tf, tf.tf * idf.idf_q AS score_q
      FROM tf JOIN idf ON tf.t = idf.t
    ),
    ranked AS (
      SELECT doc_id, t, tf, score_q,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score_q DESC, t ASC) AS rn
      FROM scored
    )
    SELECT doc_id, CAST(rn AS INT) AS rank, t AS term, tf,
           CAST(score_q AS DOUBLE) / 10000000 AS tfidf
    FROM ranked WHERE rn <= 3
    """,
)
def q_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document (X90, r6) — fixed-point
    idf makes the ranking exact; the oracle replays tf, df, idf and
    the tie-broken window."""
    from bi_utils_spark.operators.ranking import tfidf_top_terms

    out = tfidf_top_terms(
        load(spark, sf_dir, "documents"), "doc_id", "text", k=3
    )
    return out.select(
        "doc_id",
        F.col("rank").cast("int").alias("rank"),
        "term",
        "tf",
        "tfidf",
    )


# ---------------------------------------------------------------------------
# X91: contribution / Pareto. Totals and the cumulative sum stay
# exact DECIMALS; shares divide once into doubles — the oracle
# replays rank, shares, and the vital-few cut identically.
# ---------------------------------------------------------------------------


@register(
    "q_pareto_brands",
    """
    WITH t AS (
      SELECT p.p_brand,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6)))
                  AS DECIMAL(38,6)) AS tot
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    ),
    g AS (SELECT CAST(SUM(tot) AS DECIMAL(38,6)) AS grand FROM t),
    r AS (
      SELECT p_brand, tot,
             ROW_NUMBER() OVER (ORDER BY tot DESC, p_brand ASC)
               AS rank,
             CAST(SUM(tot) OVER (ORDER BY tot DESC, p_brand ASC
                                 ROWS UNBOUNDED PRECEDING)
                  AS DECIMAL(38,6)) AS cum
      FROM t
    )
    SELECT p_brand,
           CAST(tot AS DOUBLE) AS total,
           CAST(tot AS DOUBLE) / CAST(g.grand AS DOUBLE) AS share,
           CAST(cum AS DOUBLE) / CAST(g.grand AS DOUBLE) AS cum_share,
           CAST(rank AS INT) AS rank,
           CAST(CAST(cum - tot AS DOUBLE) / CAST(g.grand AS DOUBLE)
                < 0.8 AS INT) AS vital
    FROM r, g
    """,
)
def q_pareto_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand revenue concentration (X91, r6): the minimal brand set
    covering 80% of line revenue — totals and cumulative sums exact
    DECIMAL, the cut replayed by the oracle."""
    from bi_utils_spark.operators.pareto import contribution_report

    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    joined = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li.l_partkey == part.p_partkey,
    )
    out = contribution_report(
        joined, ["p_brand"], "l_extendedprice", 0.8
    )
    return out.select(
        "p_brand",
        "total",
        "share",
        "cum_share",
        F.col("rank").cast("int").alias("rank"),
        "vital",
    )


# ---------------------------------------------------------------------------
# X92 (r6): the conversion-window funnel form — funnel_counts'
# max_gap path gets its own oracle row (the unwindowed form is
# q_funnel).
# ---------------------------------------------------------------------------


@register(
    "q_funnel_windowed",
    """
    WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t2
           FROM events e JOIN s1 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts >= s1.t1
             AND e.ts <= s1.t1 + INTERVAL 3 DAY
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.ts) AS t3
           FROM events e JOIN s2 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
             AND e.ts <= s2.t2 + INTERVAL 3 DAY
           GROUP BY e.user_id)
    SELECT 1 AS step, 'signup' AS step_name,
           CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
    UNION ALL
    SELECT 2, 'click', CAST((SELECT count(*) FROM s2) AS BIGINT)
    UNION ALL
    SELECT 3, 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT)
    """,
)
def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-window funnel (X92, r6): each step must land
    within 3 days of the previous step's earliest time — the
    deadline form of q_funnel, same join topology."""
    from bi_utils_spark.operators.events import funnel_counts

    return funnel_counts(
        load(spark, sf_dir, "events"),
        ["signup", "click", "purchase"],
        max_gap="3 days",
    )


# ---------------------------------------------------------------------------
# X74b (r6): the SCD2 consumption pattern — facts joined to the
# dimension version covering their timestamp. Oracle = the
# definitional interval BETWEEN join over the replayed intervals.
# ---------------------------------------------------------------------------


@register(
    "q_scd2_fact_join",
    """
    WITH src AS (
      SELECT user_id, ts, event_id, event_type FROM events
      WHERE user_id % 10 = 0
    ),
    o AS (
      SELECT *,
        LAG(event_type) OVER
          (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
        ROW_NUMBER() OVER
          (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM src
    ),
    s AS (
      SELECT *,
        SUM(CASE WHEN rn = 1 OR prev IS DISTINCT FROM event_type
                 THEN 1 ELSE 0 END)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS seg
      FROM o
    ),
    v AS (
      SELECT user_id, seg, min(event_type) AS event_type,
             min(ts) AS valid_from
      FROM s GROUP BY user_id, seg
    ),
    d AS (
      SELECT user_id, event_type, valid_from,
             LEAD(valid_from) OVER
               (PARTITION BY user_id ORDER BY seg) AS valid_to
      FROM v
    )
    SELECT f.event_id, f.user_id, epoch_us(f.ts) AS ts_us,
           d.event_type AS type_at_ts
    FROM src f JOIN d ON f.user_id = d.user_id
      AND f.ts >= d.valid_from
      AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    """,
)
def q_scd2_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Facts joined as-of their SCD2 dimension version (X74b, r6):
    each sliced event takes the event_type version active at its
    own timestamp — exactly one version per fact, boundary rows on
    the newer version. Bucket-exploded interval join, no BNLJ."""
    from bi_utils_spark.operators.scd import (
        scd2_from_history,
        scd2_join_facts,
    )

    src = load(spark, sf_dir, "events").where(
        F.col("user_id") % 10 == 0
    )
    dim = scd2_from_history(
        src, ["user_id"], ["event_type"], "ts",
        tiebreak_cols=["event_id"],
    )
    facts = src.select(
        "event_id", "user_id", F.col("ts").alias("fts")
    )
    joined = scd2_join_facts(
        facts,
        dim.select(
            "user_id",
            F.col("event_type").alias("type_at_ts"),
            "valid_from",
            "valid_to",
            "is_current",
        ),
        ["user_id"],
        "fts",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("fts").alias("ts_us"),
        "type_at_ts",
    )


# ---------------------------------------------------------------------------
# X94: gaps & islands. The two-level bucketed detector must equal
# the oracle's textbook LAG query (fine at oracle scale; at corpus
# scale the LAG form is the global sort the operator avoids).
# ---------------------------------------------------------------------------


@register(
    "q_sequence_gaps",
    """
    WITH x AS (
      SELECT DISTINCT o_orderkey AS id FROM orders
      WHERE NOT (o_orderkey BETWEEN 5000 AND 5999)
        AND o_orderkey % 101 <> 0
    ),
    o AS (SELECT id, LAG(id) OVER (ORDER BY id) AS p FROM x)
    SELECT p + 1 AS gap_start, id - 1 AS gap_end
    FROM o WHERE p IS NOT NULL AND id - p > 1
    """,
)
def q_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing order-key ranges (X94, r6) after planting a purged
    block (5000-5999) and scattered %101 holes — bucketed two-level
    detection vs the oracle's textbook LAG."""
    from bi_utils_spark.operators.sequencing import sequence_gaps

    k = F.col("o_orderkey")
    src = load(spark, sf_dir, "orders").where(
        ~k.between(5000, 5999) & (k % 101 != 0)
    )
    return sequence_gaps(src, "o_orderkey", bucket_size=1024)


# ---------------------------------------------------------------------------
# X95: winsorized metrics. Thresholds are actual data values (rank
# quantiles off the distinct-value CDF), so the clip and the
# DECIMAL-exact means replay bit-for-bit.
# ---------------------------------------------------------------------------


@register(
    "q_winsorized_means",
    """
    WITH v AS (
      SELECT o_totalprice AS val, CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY 1
    ),
    cdf AS (
      SELECT val,
             SUM(c) OVER (ORDER BY val ROWS UNBOUNDED PRECEDING)
               AS cum
      FROM v
    ),
    tot AS (SELECT SUM(c) AS n FROM v),
    thr AS (
      SELECT MIN(CASE WHEN cum >= CEIL(0.05 * tot.n) THEN val END)
               AS lo,
             MIN(CASE WHEN cum >= CEIL(0.95 * tot.n) THEN val END)
               AS hi
      FROM cdf, tot
    )
    SELECT o.o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(LEAST(GREATEST(o.o_totalprice, thr.lo),
                                    thr.hi) AS DECIMAL(38,6)))
                AS DECIMAL(38,6)) AS DOUBLE)
             / COUNT(*) AS mean_wins,
           CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6)))
                AS DECIMAL(38,6)) AS DOUBLE)
             / COUNT(*) AS mean_raw
    FROM orders o, thr
    GROUP BY 1, thr.lo, thr.hi
    """,
)
def q_winsorized_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-status order value means, raw vs 5/95-winsorized (X95,
    r6) — exact rank-quantile thresholds, DECIMAL-exact sums, the
    outlier-robust readout an experiment pipeline feeds abtest."""
    from bi_utils_spark.operators.filtering import winsorize

    orders = load(spark, sf_dir, "orders")
    w = winsorize(orders, "o_totalprice", 0.05, 0.95)
    dec = "decimal(38,6)"
    return w.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.col("o_totalprice_wins").cast(dec))
            .cast(dec)
            .cast("double")
            / F.count(F.lit(1))
        ).alias("mean_wins"),
        (
            F.sum(F.col("o_totalprice").cast(dec))
            .cast(dec)
            .cast("double")
            / F.count(F.lit(1))
        ).alias("mean_raw"),
    )


# ---------------------------------------------------------------------------
# X96: market-basket rules. Items densify via partkey mod 50 so
# pairs actually co-occur; every metric is a ratio of exact counts
# the oracle recomputes.
# ---------------------------------------------------------------------------


@register(
    "q_basket_rules",
    """
    WITH bi AS (
      SELECT DISTINCT l_orderkey AS b, l_partkey % 50 AS i
      FROM lineitem
    ),
    ic AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS c FROM bi GROUP BY 1),
    freq AS (SELECT * FROM ic WHERE c >= 100),
    kept AS (SELECT bi.* FROM bi JOIN freq ON bi.i = freq.i),
    nb AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS n FROM bi),
    p AS (
      SELECT a.i AS item_a, b2.i AS item_b,
             CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM kept a JOIN kept b2 ON a.b = b2.b AND a.i < b2.i
      GROUP BY 1, 2 HAVING COUNT(*) >= 50
    )
    SELECT p.item_a, p.item_b, ca.c AS c_a, cb.c AS c_b, p.c_ab,
           nb.n AS n_baskets,
           CAST(p.c_ab AS DOUBLE) / CAST(nb.n AS DOUBLE) AS support,
           CAST(p.c_ab AS DOUBLE) / CAST(ca.c AS DOUBLE) AS conf_a_b,
           CAST(p.c_ab AS DOUBLE) / CAST(cb.c AS DOUBLE) AS conf_b_a,
           CAST(nb.n AS DOUBLE) * CAST(p.c_ab AS DOUBLE)
             / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)) AS lift
    FROM p
    JOIN freq ca ON p.item_a = ca.i
    JOIN freq cb ON p.item_b = cb.i
    CROSS JOIN nb
    """,
)
def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets (X96, r6): items =
    partkey mod 50, Apriori-pruned pair counts with support /
    confidence / lift — four exact counts per rule, all replayed."""
    from bi_utils_spark.operators.basket import frequent_item_pairs

    baskets = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("basket"),
        (F.col("l_partkey") % 50).alias("item"),
    )
    return frequent_item_pairs(
        baskets, "basket", "item",
        min_item_count=100, min_pair_count=50,
    )


# ---------------------------------------------------------------------------
# X98: RFM segmentation. percent_rank is exact SQL semantics, the
# tile arithmetic floor(pr·5) is one deterministic double op, and
# monetary uses the DECIMAL accumulation rule — full replay.
# ---------------------------------------------------------------------------


@register(
    "q_rfm_segments",
    """
    WITH now_ AS (SELECT epoch_us(max(ts)) AS now_us FROM events),
    pu AS (
      SELECT user_id,
             (SELECT now_us FROM now_) AS now_us,
             epoch_us(max(ts)) AS last_us,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(CAST(SUM(CAST(value AS DECIMAL(38,6)))
                  AS DECIMAL(38,6)) AS DOUBLE) AS monetary
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT user_id,
             CAST((now_us - last_us) // 86400000000 AS BIGINT)
               AS r_days,
             frequency, monetary
      FROM pu
    ),
    pr AS (
      SELECT *,
        percent_rank() OVER (ORDER BY r_days) AS pr_r,
        percent_rank() OVER (ORDER BY frequency) AS pr_f,
        percent_rank() OVER (ORDER BY monetary) AS pr_m
      FROM m
    )
    SELECT user_id, r_days, frequency, monetary,
      CAST(5 - LEAST(CAST(FLOOR(pr_r * 5) AS INT), 4) AS INT)
        AS r_score,
      CAST(LEAST(CAST(FLOOR(pr_f * 5) AS INT), 4) + 1 AS INT)
        AS f_score,
      CAST(LEAST(CAST(FLOOR(pr_m * 5) AS INT), 4) + 1 AS INT)
        AS m_score,
      CAST(5 - LEAST(CAST(FLOOR(pr_r * 5) AS INT), 4) AS VARCHAR)
        || CAST(LEAST(CAST(FLOOR(pr_f * 5) AS INT), 4) + 1 AS VARCHAR)
        || CAST(LEAST(CAST(FLOOR(pr_m * 5) AS INT), 4) + 1 AS VARCHAR)
        AS segment
    FROM pr
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile segments per user (X98, r6): recency inverted,
    exact percent_rank tiles, DECIMAL-exact monetary — every score
    and label replayed by the oracle's windows."""
    from bi_utils_spark.operators.events import rfm_scores

    return rfm_scores(load(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# X97: int8 scalar quantization — the export-format vector
# compression (4× vs float32, decode is two flops/dim). The oracle
# is the recall-bound attestation (the q_pq_topk pattern) plus
# self-retrieval.
# ---------------------------------------------------------------------------


@register(
    "q_sq8_topk",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_corpus,
           CAST(least(10, count(*)) AS BIGINT) AS n_exact,
           1 AS self_first,
           1 AS recall_ge_070
    FROM embeddings
    """,
)
def q_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-bound oracle row for scalar-quantized search (X97,
    r6): per-dim min/max bounds (index metadata), int8 codes,
    asymmetric cosine over midpoint decodes. 8-bit grids are much
    finer than PQ cells, so the asserted floor is 0.7 and the query
    vector must retrieve itself first."""
    from bi_utils_spark.operators.pq import sq8_bounds, sq8_encode, sq8_topk
    from bi_utils_spark.operators.similarity import cosine_topk

    emb = load(spark, sf_dir, "embeddings")
    target = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    bounds = sq8_bounds(emb, "embedding")
    codes = sq8_encode(emb, bounds).select("vec_id", "sq8")
    probe = sq8_topk(codes, bounds, target, k=10).select(
        "vec_id", "sim"
    )
    exact = cosine_topk(emb, target, k=10).select("vec_id")
    n_corpus = emb.agg(F.count("*").alias("n_corpus"))
    n_exact = exact.agg(F.count("*").alias("n_exact"))
    top1 = probe.orderBy(F.desc("sim"), F.asc("vec_id")).limit(1)
    found = probe.join(exact, "vec_id", "left_semi").agg(
        F.count("*").alias("__found")
    )
    return (
        n_corpus.crossJoin(n_exact)
        .crossJoin(F.broadcast(top1.select(F.col("vec_id").alias("__t1"))))
        .crossJoin(found)
        .select(
            "n_corpus",
            "n_exact",
            (F.col("__t1") == 0).cast("int").alias("self_first"),
            (
                F.col("__found").cast("double")
                >= 0.7 * F.col("n_exact").cast("double")
            )
            .cast("int")
            .alias("recall_ge_070"),
        )
    )


# ---------------------------------------------------------------------------
# X99/X100: date spine + chi-square. Calendar attributes are pure
# date arithmetic both engines define identically (ISO weeks); chi²
# terms quantize to 1e-9 fixed point so the fold is exact.
# ---------------------------------------------------------------------------


@register(
    "q_date_spine",
    """
    WITH s AS (
      SELECT CAST(unnest(generate_series(DATE '2024-01-01',
                                         DATE '2024-12-31',
                                         INTERVAL 1 DAY)) AS DATE)
               AS d
    )
    SELECT CAST(d AS VARCHAR) AS d,
           CAST(year(d) AS INT) AS year,
           CAST(quarter(d) AS INT) AS quarter,
           CAST(month(d) AS INT) AS month,
           CAST(day(d) AS INT) AS day,
           CAST(isodow(d) AS INT) AS day_of_week,
           CAST(weekofyear(d) AS INT) AS iso_week,
           CAST(isodow(d) >= 6 AS INT) AS is_weekend,
           CAST(CAST(date_trunc('month', d) AS DATE) AS VARCHAR)
             AS month_start,
           CAST(last_day(d) AS VARCHAR) AS month_end
    FROM s
    """,
)
def q_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2024 calendar dimension (X99, r6): 366 leap-year days with
    ISO weekday/week, weekend flags, month bounds — every attribute
    recomputed by the oracle's date functions."""
    from bi_utils_spark.operators.calendar import date_spine

    sp = date_spine(spark, "2024-01-01", "2024-12-31")
    return sp.select(
        F.col("d").cast("string").alias("d"),
        "year",
        "quarter",
        "month",
        "day",
        "day_of_week",
        "iso_week",
        "is_weekend",
        F.col("month_start").cast("string").alias("month_start"),
        F.col("month_end").cast("string").alias("month_end"),
    )


@register(
    "q_chi2_type_parity",
    """
    WITH cells AS (
      SELECT event_type AS r, user_id % 2 AS c,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    rm AS (SELECT r, SUM(o) AS rmm FROM cells GROUP BY 1),
    cm AS (SELECT c, SUM(o) AS cmm FROM cells GROUP BY 1),
    tot AS (SELECT SUM(o) AS n FROM cells),
    t AS (
      SELECT cells.o, rm.rmm, cm.cmm, tot.n,
             CAST(rm.rmm AS DOUBLE) * CAST(cm.cmm AS DOUBLE)
               / CAST(tot.n AS DOUBLE) AS e
      FROM cells JOIN rm ON cells.r = rm.r
      JOIN cm ON cells.c = cm.c CROSS JOIN tot
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           CAST((SELECT COUNT(*) FROM rm) AS BIGINT) AS rows,
           CAST((SELECT COUNT(*) FROM cm) AS BIGINT) AS cols,
           CAST(((SELECT COUNT(*) FROM rm) - 1)
                * ((SELECT COUNT(*) FROM cm) - 1) AS BIGINT) AS dof,
           CAST(SUM(CAST(FLOOR((CAST(o AS DOUBLE) - e)
                               * (CAST(o AS DOUBLE) - e) / e * 1e9)
                         AS BIGINT)) AS DOUBLE) / 1e9 AS chi2
    FROM t
    """,
)
def q_chi2_type_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of event_type × user parity (X100,
    r6) — the contingency fold with 1e-9-quantized terms, replayed
    exactly."""
    from bi_utils_spark.operators.abtest import chi_square_independence

    f = load(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 2).alias("parity")
    )
    return chi_square_independence(f, "event_type", "parity")


# ---------------------------------------------------------------------------
# Coverage rows for remaining unqueried operator paths: LOCF fill
# (X69), islands (X94), sketch-merge associativity (X89 — integer
# equality, attested).
# ---------------------------------------------------------------------------


@register(
    "q_fill_forward",
    f"""
    WITH {_DAILY_GRID_SQL},
    v AS (
      SELECT event_type, bucket,
             CASE WHEN n > 0 THEN n END AS v
      FROM series
    )
    SELECT event_type, bucket, v,
           MAX(v) OVER w IS NOT NULL AS has_prior,
           last_value(v IGNORE NULLS) OVER w AS v_filled
    FROM v
    WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                 ROWS UNBOUNDED PRECEDING)
    """,
)
def q_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF carry-forward over the daily grid (X69's third leg):
    zero-count days become NULLs then take the last observed count;
    leading NULLs stay NULL (has_prior flags them)."""
    from bi_utils_spark.operators.timeseries import (
        fill_forward,
        resample_counts,
    )
    from pyspark.sql import Window

    series = resample_counts(
        load(spark, sf_dir, "events"),
        ts_col="ts",
        width_sec=86400,
        group_cols=("event_type",),
    ).withColumn(
        "v", F.when(F.col("n") > 0, F.col("n"))
    )
    filled = fill_forward(
        series, "bucket", ("event_type",), "v"
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return filled.select(
        "event_type",
        "bucket",
        "v",
        F.max("v").over(w).isNotNull().alias("has_prior"),
        "v_filled",
    )


@register(
    "q_sequence_islands",
    """
    WITH x AS (
      SELECT DISTINCT o_orderkey AS id FROM orders
      WHERE NOT (o_orderkey BETWEEN 5000 AND 5999)
        AND o_orderkey % 101 <> 0
    ),
    o AS (SELECT id, LAG(id) OVER (ORDER BY id) AS p FROM x),
    starts AS (
      SELECT id AS island_start FROM o
      WHERE p IS NULL OR id - p > 1
    ),
    ends AS (
      SELECT p AS island_end
      FROM (SELECT id, LEAD(id) OVER (ORDER BY id) AS nx,
                   id AS p FROM x)
      WHERE nx IS NULL OR nx - p > 1
    ),
    rs AS (SELECT island_start,
                  ROW_NUMBER() OVER (ORDER BY island_start) AS r
           FROM starts),
    re AS (SELECT island_end,
                  ROW_NUMBER() OVER (ORDER BY island_end) AS r
           FROM ends)
    SELECT rs.island_start, re.island_end,
           re.island_end - rs.island_start + 1 AS n_ids
    FROM rs JOIN re ON rs.r = re.r
    """,
)
def q_sequence_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous present-id runs (X94's complement) over the same
    planted-hole fixture as q_sequence_gaps — the oracle derives
    islands directly from consecutive-id breaks."""
    from bi_utils_spark.operators.sequencing import sequence_islands

    k = F.col("o_orderkey")
    src = load(spark, sf_dir, "orders").where(
        ~k.between(5000, 5999) & (k % 101 != 0)
    )
    return sequence_islands(src, "o_orderkey", bucket_size=1024)


@register(
    "q_qsketch_merge",
    """
    SELECT 1 AS merge_equals_whole,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    """,
)
def q_qsketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-merge associativity attested on real data (X89):
    DDSketch(first half) ⊕ DDSketch(second half) must equal
    DDSketch(whole) EXACTLY (integer bucket counts) — pinned as a
    flag the oracle hashes alongside the row count."""
    from bi_utils_spark.operators.quantile_sketch import (
        qsketch_build,
        qsketch_merge,
    )

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_extendedprice").alias("val")
    )
    lo = li.where(F.col("l_orderkey") % 2 == 0)
    hi = li.where(F.col("l_orderkey") % 2 == 1)
    whole = qsketch_build(li, "val")
    merged = qsketch_merge(
        [qsketch_build(lo, "val"), qsketch_build(hi, "val")]
    )
    diff = whole.unionByName(merged.select("bucket", (-F.col("cnt")).alias("cnt"))) \
        .groupBy("bucket").agg(F.sum("cnt").alias("d")) \
        .where(F.col("d") != 0)
    n = li.agg(F.count(F.lit(1)).alias("n_rows"))
    flag = diff.agg(
        (F.count(F.lit(1)) == 0).cast("int").alias("merge_equals_whole")
    )
    return flag.crossJoin(F.broadcast(n)).select(
        "merge_equals_whole", "n_rows"
    )


# ---------------------------------------------------------------------------
# Composed warehouse pipeline (r6): CDC net-effect fold → DQ
# verdicts on the folded state → Pareto concentration of the
# surviving rows. Each stage's CTE is the already-proven oracle
# form, chained — the q_llm_pipeline composition discipline for the
# warehouse tier.
# ---------------------------------------------------------------------------


@register(
    "q_warehouse_pipeline",
    """
    WITH log AS (
      SELECT o_orderkey % 2000 AS k,
             o_orderkey // 2000 AS ord,
             CASE WHEN o_orderkey % 17 = 0 THEN 'D' ELSE 'U' END AS op,
             o_totalprice AS price,
             o_orderstatus AS status
      FROM orders
    ),
    w AS (
      SELECT *, ROW_NUMBER() OVER
               (PARTITION BY k ORDER BY ord DESC) AS rn
      FROM log
    ),
    state AS (
      SELECT k, price, status FROM w WHERE rn = 1 AND op <> 'D'
    ),
    dq AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS total,
             CAST(SUM(CASE WHEN price IS NOT NULL
                      THEN 1 ELSE 0 END) AS BIGINT) AS ok_price,
             CAST(COUNT(DISTINCT k) AS BIGINT) AS distinct_k
      FROM state
    ),
    t AS (
      SELECT status,
             CAST(SUM(CAST(price AS DECIMAL(38,6)))
                  AS DECIMAL(38,6)) AS tot
      FROM state GROUP BY 1
    ),
    g AS (SELECT CAST(SUM(tot) AS DECIMAL(38,6)) AS grand FROM t),
    r AS (
      SELECT status, tot,
             ROW_NUMBER() OVER (ORDER BY tot DESC, status ASC)
               AS rank,
             CAST(SUM(tot) OVER (ORDER BY tot DESC, status ASC
                                 ROWS UNBOUNDED PRECEDING)
                  AS DECIMAL(38,6)) AS cum
      FROM t
    )
    SELECT r.status,
           CAST(r.tot AS DOUBLE) AS total,
           CAST(r.tot AS DOUBLE) / CAST(g.grand AS DOUBLE) AS share,
           CAST(r.rank AS INT) AS rank,
           CAST(CAST(r.cum - r.tot AS DOUBLE)
                / CAST(g.grand AS DOUBLE) < 0.8 AS INT) AS vital,
           dq.total AS state_rows,
           CAST(dq.ok_price = dq.total AS INT) AS price_complete,
           CAST(dq.distinct_k = dq.total AS INT) AS key_unique
    FROM r, g, dq
    """,
)
def q_warehouse_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed warehouse pipeline (r6): the planted CDC log folds
    to current state (X84), the folded table passes its DQ
    constraints (X75 — completeness + key uniqueness, emitted as
    verdict flags), and the surviving rows report revenue
    concentration by status (X91). Every stage is the oracle form
    of its own query, chained."""
    from bi_utils_spark.operators.cdc import apply_cdc
    from bi_utils_spark.operators.dq import Check, dq_report
    from bi_utils_spark.operators.pareto import contribution_report

    k = F.col("o_orderkey")
    log = load(spark, sf_dir, "orders").select(
        (k % 2000).alias("k"),
        F.expr("o_orderkey div 2000").alias("ord"),
        F.when(k % 17 == 0, F.lit("D")).otherwise(F.lit("U")).alias(
            "op"
        ),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    state = apply_cdc(log, ["k"], ["price", "status"]).select(
        "k", "price", "status"
    )
    rep = dq_report(
        state,
        [
            Check("completeness", "price", name="price_complete"),
            Check("unique", columns=("k",), name="key_unique"),
        ],
    )
    flags = (
        rep.groupBy()
        .pivot("constraint", ["price_complete", "key_unique"])
        .agg(F.first(F.col("passed").cast("int")))
    )
    rows = state.agg(F.count(F.lit(1)).alias("state_rows"))
    pareto = contribution_report(state, ["status"], "price", 0.8)
    return (
        pareto.select(
            "status",
            "total",
            "share",
            F.col("rank").cast("int").alias("rank"),
            "vital",
        )
        .crossJoin(F.broadcast(rows))
        .crossJoin(F.broadcast(flags))
        .select(
            "status",
            "total",
            "share",
            "rank",
            "vital",
            "state_rows",
            "price_complete",
            "key_unique",
        )
    )


# ---------------------------------------------------------------------------
# X101: period-over-period. The dense weekly grid makes "previous
# period" calendar-true; deltas are integers, pct_change one double
# division guarded on zero bases.
# ---------------------------------------------------------------------------


@register(
    "q_week_over_week",
    """
    WITH f AS (
      SELECT event_type,
             CAST(FLOOR(epoch(ts)) AS BIGINT) // 604800 AS bucket
      FROM events
    ),
    agg AS (SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS n
            FROM f GROUP BY 1, 2),
    bounds AS (SELECT MIN(bucket) AS lo, MAX(bucket) AS hi FROM f),
    grid AS (
      SELECT g.event_type, u.b AS bucket
      FROM (SELECT DISTINCT event_type FROM f) g
      CROSS JOIN (SELECT unnest(generate_series(
                    (SELECT lo FROM bounds),
                    (SELECT hi FROM bounds))) AS b) u
    ),
    series AS (
      SELECT g.event_type, g.bucket, COALESCE(a.n, 0) AS n
      FROM grid g LEFT JOIN agg a
        ON g.event_type = a.event_type AND g.bucket = a.bucket
    )
    SELECT event_type, bucket, n,
           LAG(n) OVER w AS prev_n,
           n - LAG(n) OVER w AS delta,
           CASE WHEN LAG(n) OVER w > 0
                THEN CAST(n - LAG(n) OVER w AS DOUBLE)
                   / CAST(LAG(n) OVER w AS DOUBLE)
           END AS pct_change
    FROM series
    WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
    """,
)
def q_week_over_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly per-type counts with calendar-true WoW deltas (X101,
    r6): silent weeks are explicit zeros so -100% weeks exist and
    rebounds off zero report NULL pct (a ratio against nothing is
    not a number) — all replayed on the oracle's grid."""
    from bi_utils_spark.operators.timeseries import period_over_period

    return period_over_period(
        load(spark, sf_dir, "events"),
        "ts",
        604800,
        ("event_type",),
    )


# ---------------------------------------------------------------------------
# X91b: grouped Pareto — the vital-few cut within each region,
# ranking windows partitioned by the report dimension.
# ---------------------------------------------------------------------------


@register(
    "q_pareto_region_suppliers",
    """
    WITH t AS (
      SELECT r.r_name AS region, s.s_name AS supplier,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6)))
                  AS DECIMAL(38,6)) AS tot
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    ),
    g AS (SELECT region, CAST(SUM(tot) AS DECIMAL(38,6)) AS grand
          FROM t GROUP BY 1),
    rr AS (
      SELECT region, supplier, tot,
             ROW_NUMBER() OVER w AS rank,
             CAST(SUM(tot) OVER (w ROWS UNBOUNDED PRECEDING)
                  AS DECIMAL(38,6)) AS cum
      FROM t
      WINDOW w AS (PARTITION BY region
                   ORDER BY tot DESC, supplier ASC)
    )
    SELECT rr.region, rr.supplier,
           CAST(rr.tot AS DOUBLE) AS total,
           CAST(rr.tot AS DOUBLE) / CAST(g.grand AS DOUBLE) AS share,
           CAST(rr.cum AS DOUBLE) / CAST(g.grand AS DOUBLE)
             AS cum_share,
           CAST(rr.rank AS INT) AS rank,
           CAST(CAST(rr.cum - rr.tot AS DOUBLE)
                / CAST(g.grand AS DOUBLE) < 0.8 AS INT) AS vital
    FROM rr JOIN g ON rr.region = g.region
    """,
)
def q_pareto_region_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-region supplier concentration (X91b, r6): the minimal
    supplier set covering 80% of each region's line revenue —
    ranking windows partitioned by region, exact-DECIMAL cumulative
    shares."""
    from bi_utils_spark.operators.pareto import (
        contribution_report_grouped,
    )

    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")
    joined = (
        li.join(
            F.broadcast(sup.select("s_suppkey", "s_name", "s_nationkey")),
            li.l_suppkey == sup.s_suppkey,
        )
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select(
            F.col("r_name").alias("region"),
            F.col("s_name").alias("supplier"),
            "l_extendedprice",
        )
    )
    return contribution_report_grouped(
        joined, ["region"], ["supplier"], "l_extendedprice", 0.8
    )


# ---------------------------------------------------------------------------
# X102/X103: suppression + Benford. Suppression is pure integer
# logic; Benford digits come from a fixed-decimal string both
# engines format identically, and chi² terms are 1e-9-quantized.
# ---------------------------------------------------------------------------


@register(
    "q_suppressed_counts",
    """
    WITH c AS (
      SELECT event_type, user_id % 37 AS cohort,
             CAST(COUNT(*) AS BIGINT) AS n0
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, cohort,
           CASE WHEN n0 >= 5 THEN n0 END AS n,
           CAST(n0 < 5 AS INT) AS suppressed
    FROM c
    """,
)
def q_suppressed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity aggregate release (X102, r6): (type, cohort)
    cells below k=5 keep their row but withhold the count — the
    oracle replays the threshold on the same cells."""
    from bi_utils_spark.operators.dq import suppress_small_groups

    f = load(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 37).alias("cohort")
    )
    return suppress_small_groups(f, ["event_type", "cohort"], k=5)


@register(
    "q_benford_prices",
    """
    WITH d AS (
      SELECT CAST(substring(regexp_replace(
               printf('%.10f', abs(o_totalprice)), '[0.,]*', ''),
               1, 1) AS INT) AS digit
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_totalprice <> 0
    ),
    c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS observed
          FROM d WHERE digit > 0 GROUP BY 1),
    tot AS (SELECT SUM(observed) AS n FROM c),
    grid AS (SELECT unnest(generate_series(1, 9)) AS digit),
    f AS (
      SELECT g.digit,
             COALESCE(c.observed, 0) AS observed,
             log10(1.0 + 1.0 / g.digit)
               * CAST(tot.n AS DOUBLE) AS expected
      FROM grid g LEFT JOIN c ON g.digit = c.digit CROSS JOIN tot
    )
    SELECT CAST(digit AS INT) AS digit, observed, expected,
           CAST(CAST(FLOOR((CAST(observed AS DOUBLE) - expected)
                           * (CAST(observed AS DOUBLE) - expected)
                           / expected * 1e9) AS BIGINT) AS DOUBLE)
             / 1e9 AS chi2_term
    FROM f
    """,
)
def q_benford_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit Benford audit of order totals (X103, r6):
    observed vs log10(1+1/d) expectation with quantized chi²
    terms — the fraud/ETL-damage screen, digit extraction via
    fixed-decimal strings both engines format identically."""
    from bi_utils_spark.operators.dq import benford_audit

    return benford_audit(
        load(spark, sf_dir, "orders"), "o_totalprice"
    )


# ---------------------------------------------------------------------------
# X108: PSI distribution drift. Baseline = even order keys; current =
# odd keys with a planted 1.25× price inflation on half of them
# (drift on price) while o_custkey stays distribution-stable. The
# oracle replays the ENTIRE arithmetic per column: baseline bounds,
# equi-width bin ids (null/under/overflow bins), exact counts over
# the full -2..10 grid, epsilon-floored shares, ln terms quantized
# floor(·1e9) and integer-summed.
# ---------------------------------------------------------------------------


def _psi_col_sql(name: str, expr: str, num_bins: int = 10) -> str:
    """One column's PSI replay as a SELECT (shares the base/curr
    CTEs): bin CASE identical to drift._bin_col, grid from
    range(-2, num_bins+1), GREATEST-epsilon shares, quantized sum."""
    return f"""
    SELECT '{name}' AS "column",
           CAST(SUM(CAST(FLOOR(
             (GREATEST(CAST(nc AS DOUBLE) / ct.n, 1e-6)
              - GREATEST(CAST(nb AS DOUBLE) / bt.n, 1e-6))
             * ln(GREATEST(CAST(nc AS DOUBLE) / ct.n, 1e-6)
                  / GREATEST(CAST(nb AS DOUBLE) / bt.n, 1e-6))
             * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS psi,
           bt.n AS n_base, ct.n AS n_cur
    FROM (
      SELECT g.bin,
             COALESCE(b.nb, 0) AS nb,
             COALESCE(c.nc, 0) AS nc
      FROM (SELECT UNNEST(range(-2, {num_bins + 1})) AS bin) g
      LEFT JOIN (
        SELECT CASE
                 WHEN {expr} IS NULL THEN -2
                 WHEN {expr} < bo.lo THEN -1
                 WHEN {expr} > bo.hi THEN {num_bins}
                 ELSE LEAST(CAST(FLOOR(({expr} - bo.lo)
                        / ((bo.hi - bo.lo) / {num_bins})) AS INT),
                      {num_bins - 1})
               END AS bin, COUNT(*) AS nb
        FROM base, bo_{name} bo GROUP BY 1
      ) b ON g.bin = b.bin
      LEFT JOIN (
        SELECT CASE
                 WHEN {expr} IS NULL THEN -2
                 WHEN {expr} < bo.lo THEN -1
                 WHEN {expr} > bo.hi THEN {num_bins}
                 ELSE LEAST(CAST(FLOOR(({expr} - bo.lo)
                        / ((bo.hi - bo.lo) / {num_bins})) AS INT),
                      {num_bins - 1})
               END AS bin, COUNT(*) AS nc
        FROM curr, bo_{name} bo GROUP BY 1
      ) c ON g.bin = c.bin
    ) grid,
    (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM base) bt,
    (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM curr) ct
    GROUP BY bt.n, ct.n"""


_PSI_SQL = (
    """
    WITH base AS (
      SELECT CAST(o_totalprice AS DOUBLE) AS price,
             CAST(o_custkey AS DOUBLE) AS cust
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    curr AS (
      SELECT CASE WHEN o_orderkey % 4 = 1
                  THEN CAST(o_totalprice AS DOUBLE) * 1.25
                  ELSE CAST(o_totalprice AS DOUBLE) END AS price,
             CAST(o_custkey AS DOUBLE) AS cust
      FROM orders WHERE o_orderkey % 2 = 1
    ),
    bo_price AS (SELECT min(price) AS lo, max(price) AS hi FROM base),
    bo_cust AS (SELECT min(cust) AS lo, max(cust) AS hi FROM base)
    """
    + _psi_col_sql("price", "price")
    + "\n    UNION ALL"
    + _psi_col_sql("cust", "cust")
)


@register("q_psi_drift", _PSI_SQL)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift report (X108, r7): the
    current batch's planted 1.25× price inflation on half its rows
    must read as drift on `price` while `cust` stays stable — the
    distribution-level check the declared-constraint DQ suite can't
    express. Every bin's share and ln term is replayed by the
    oracle; psi crosses engines as a 1e-9-quantized integer sum."""
    from bi_utils_spark.operators.drift import psi_report

    orders = load(spark, sf_dir, "orders")
    base = orders.where(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_totalprice").cast("double").alias("price"),
        F.col("o_custkey").cast("double").alias("cust"),
    )
    cur = orders.where(F.col("o_orderkey") % 2 == 1).select(
        F.when(
            F.col("o_orderkey") % 4 == 1,
            F.col("o_totalprice").cast("double") * 1.25,
        )
        .otherwise(F.col("o_totalprice").cast("double"))
        .alias("price"),
        F.col("o_custkey").cast("double").alias("cust"),
    )
    out = psi_report(base, cur, ["price", "cust"], num_bins=10)
    return out.select(
        "column",
        "psi",
        F.col("n_base").cast("double").alias("n_base"),
        F.col("n_cur").cast("double").alias("n_cur"),
    )


# ---------------------------------------------------------------------------
# X104: skew diagnostics — top heavy keys + level-the-tasks salt
# factor (exact counts, one double division, TakeOrdered).
# ---------------------------------------------------------------------------


@register(
    "q_skew_report",
    """
    WITH c AS (
      SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1
    ),
    t AS (SELECT SUM(n) AS tt FROM c)
    SELECT l_suppkey, n,
           CAST(n AS DOUBLE) / CAST(t.tt AS DOUBLE) AS share,
           CAST(CEIL(CAST(n AS DOUBLE) / 500) AS INT)
             AS recommended_salt
    FROM c, t
    ORDER BY n DESC, l_suppkey ASC
    LIMIT 10
    """,
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaviest supplier keys in lineitem (X104, r6) with row
    shares and the salt factor that levels tasks at 500 rows each —
    the pre-join diagnostic that feeds salted_join/salted_agg."""
    from bi_utils_spark.operators.scale import skew_report

    return skew_report(
        load(spark, sf_dir, "lineitem"),
        ["l_suppkey"],
        top=10,
        target_rows_per_task=500,
    )


# ---------------------------------------------------------------------------
# X105: column profiling — exact counts, stringified min/max, one
# scan for the whole report.
# ---------------------------------------------------------------------------


@register(
    "q_profile_orders",
    """
    SELECT 'o_orderstatus' AS "column",
           CAST(COUNT(*) AS BIGINT) AS total,
           CAST(SUM(CASE WHEN o_orderstatus IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS nulls,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS distinct_n,
           CAST(1 AS BOOLEAN) AS sketch_in_bound,
           MIN(CAST(o_orderstatus AS VARCHAR)) AS min_str,
           MAX(CAST(o_orderstatus AS VARCHAR)) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_orderpriority IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           CAST(1 AS BOOLEAN),
           MIN(CAST(o_orderpriority AS VARCHAR)),
           MAX(CAST(o_orderpriority AS VARCHAR))
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_custkey IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           CAST(1 AS BOOLEAN),
           MIN(CAST(o_custkey AS VARCHAR)),
           MAX(CAST(o_custkey AS VARCHAR))
    FROM orders
    """,
)
def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column intake profile (X105; r7 sketch default): nulls,
    min/max, distincts for three orders columns. The profile's
    distinct counts now default to the HLL++ sketch (bounded
    partial-aggregable state — at 100 TB an exact multi-column
    distinct is a corpus-sized Expand pass); this query is the
    bound ATTESTATION: it runs the sketch profile AND the exact
    replay, reports the exact counts, and asserts the sketch landed
    within 3·rsd of exact (`sketch_in_bound`, the established
    approximate-operator oracle pattern — deterministic: HLL++ has
    no RNG state)."""
    from bi_utils_spark.operators.dq import profile_columns

    cols = ["o_orderstatus", "o_orderpriority", "o_custkey"]
    orders = load(spark, sf_dir, "orders")
    approx = profile_columns(orders, cols).select(
        "column", F.col("distinct").alias("__approx")
    )
    exact = profile_columns(orders, cols, exact_distinct=True)
    return exact.join(approx, "column").select(
        "column",
        "total",
        "nulls",
        F.col("distinct").alias("distinct_n"),
        (
            F.abs(F.col("__approx") - F.col("distinct"))
            <= F.lit(0.15) * F.col("distinct")
        ).alias("sketch_in_bound"),
        "min_str",
        "max_str",
    )
