"""Reference operator surface (SURVEY.md SS2.1-2.13): the flagship
composition plus one oracle row per relational / scalar /
window / nested / merge / drift operator of the reference."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bi_utils_spark.functions import scalars as S
from bi_utils_spark.operators import relational as R
from bi_utils_spark.queries.core import load, register



# ---------------------------------------------------------------------------
# Flagship (SURVEY.md §7.0): watermark (A1) + top-1-per-key (W1)
# + hash (F1) + JSON path (F4) composed on `events`.
# ---------------------------------------------------------------------------

@register(
    "q_latest_event_per_user",
    """
    WITH wm AS (SELECT max(ts) - INTERVAL 7 DAY AS wm FROM events),
    f AS (SELECT e.* FROM events e, wm WHERE e.ts >= wm.wm),
    r AS (SELECT *, row_number() OVER (
              PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM f)
    SELECT sha256(CAST(user_id AS VARCHAR)) AS user_hash,
           user_id,
           event_type,
           value AS last_value,
           epoch_us(ts) AS ts_us,
           coalesce(json_extract_string(props, '$.k'), 'empty') AS prop_k
    FROM r WHERE rn = 1
    """,
)
def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    recent = R.watermark_filter(events, "ts", "7 days")
    latest = R.latest_per_key(recent, ["user_id"], "ts", tiebreak_cols=["event_id"])
    return latest.select(
        S.hash_id_sha2("user_id").alias("user_hash"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value").alias("last_value"),
        F.unix_micros("ts").alias("ts_us"),
        S.check_for_key_json("props", "k").alias("prop_k"),
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q_latest_event_per_user(spark, sf_dir)


# ---------------------------------------------------------------------------
# F1 hash_id — null/empty guard contract (utils.py:46-55)
# ---------------------------------------------------------------------------

@register(
    "q_hash_id",
    """
    SELECT user_id,
           sha256(CASE WHEN user_id % 11 = 0 THEN NULL
                       WHEN user_id % 7 = 0 THEN NULL   -- '' guard → NULL
                       ELSE CAST(user_id AS VARCHAR) END) AS user_hash
    FROM events
    """,
)
def q_hash_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Synthesize NULL and '' inputs from user_id to exercise both guards
    # of hash_id (reference utils.py:52: None and '' both → None).
    events = load(spark, sf_dir, "events")
    raw = (
        F.when(F.col("user_id") % 11 == 0, F.lit(None).cast("string"))
        .when(F.col("user_id") % 7 == 0, F.lit(""))
        .otherwise(F.col("user_id").cast("string"))
    )
    return events.select(
        F.col("user_id"), S.hash_id_sha2(raw).alias("user_hash")
    )


# ---------------------------------------------------------------------------
# F2 parse_timestamp — ISO-8601 'T…Z' → 'date time' string surgery
# (utils.py:428-440)
# ---------------------------------------------------------------------------

@register(
    "q_parse_timestamp",
    """
    WITH iso AS (
      SELECT event_id,
             strftime(ts, '%Y-%m-%dT%H:%M:%S.%g') || 'Z' AS iso_ts
      FROM events
    )
    SELECT event_id,
           CASE WHEN iso_ts IS NULL OR length(iso_ts) < 5 THEN NULL
                ELSE substr(iso_ts, 1, 10) || ' ' ||
                     substr(iso_ts, 12, length(iso_ts) - 12) END AS parsed_ts
    FROM iso
    """,
)
def q_parse_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    iso = F.concat(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSS"), F.lit("Z"))
    return events.select(
        F.col("event_id"), S.parse_timestamp(iso).alias("parsed_ts")
    )


# ---------------------------------------------------------------------------
# F4/F5 extract_key / check_for_key — JSON path with default
# (utils.py:417-425, :443-453)
# ---------------------------------------------------------------------------

@register(
    "q_extract_key",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_value,
           coalesce(json_extract_string(props, '$.missing'), 'empty') AS k_missing
    FROM events
    """,
)
def q_extract_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return events.select(
        F.col("event_id"),
        S.json_path("props", "k").alias("k_value"),
        S.check_for_key_json("props", "missing").alias("k_missing"),
    )


# ---------------------------------------------------------------------------
# A1 watermark filter — delta-load semantics (ct_utils.py:19-37)
# ---------------------------------------------------------------------------

@register(
    "q_watermark",
    """
    SELECT event_id, epoch_us(ts) AS ts_us
    FROM events
    WHERE ts >= (SELECT max(ts) - INTERVAL 3 DAY FROM events)
    """,
)
def q_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    recent = R.watermark_filter(events, "ts", "3 days")
    return recent.select(F.col("event_id"), F.unix_micros("ts").alias("ts_us"))


# ---------------------------------------------------------------------------
# W1 top-1 per key (utils.py:210-224)
# ---------------------------------------------------------------------------

@register(
    "q_alert_top1",
    """
    SELECT event_type, user_id, value AS last_value, epoch_us(ts) AS ts_us
    FROM (SELECT *, row_number() OVER (
             PARTITION BY event_type, user_id
             ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def q_alert_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    latest = R.latest_per_key(
        events, ["event_type", "user_id"], "ts", tiebreak_cols=["event_id"]
    )
    return latest.select(
        "event_type",
        "user_id",
        F.col("value").alias("last_value"),
        F.unix_micros("ts").alias("ts_us"),
    )


# ---------------------------------------------------------------------------
# W2/F6 threshold-gated resend decision (utils.py:225-234):
# per key, compare latest value vs previous; no history → send.
# ---------------------------------------------------------------------------

@register(
    "q_alert_should_send",
    """
    WITH h AS (
      SELECT *, row_number() OVER (
               PARTITION BY event_type, user_id
               ORDER BY ts DESC, event_id DESC) AS rn,
             lead(value) OVER (
               PARTITION BY event_type, user_id
               ORDER BY ts DESC, event_id DESC) AS prev_value
      FROM events
    )
    SELECT event_type, user_id, value AS current_value, prev_value,
           CASE WHEN prev_value IS NULL THEN TRUE
                ELSE abs(value - prev_value) >= 5.0 END AS should_send
    FROM h WHERE rn = 1
    """,
)
def q_alert_should_send(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    h = events.withColumn("rn", F.row_number().over(w)).withColumn(
        "prev_value", F.lead("value").over(w)
    )
    return h.filter(F.col("rn") == 1).select(
        "event_type",
        "user_id",
        F.col("value").alias("current_value"),
        "prev_value",
        S.abs_threshold("value", "prev_value", 5.0).alias("should_send"),
    )


# ---------------------------------------------------------------------------
# P6/A2 same-day count — parameterized pivot date for determinism
# (utils.py:293-294)
# ---------------------------------------------------------------------------

@register(
    "q_daily_count",
    """
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
           count(*) AS n_events
    FROM events
    GROUP BY 1
    """,
)
def q_daily_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return events.groupBy(
        F.to_date("ts").cast("string").alias("event_date")
    ).agg(F.count("*").alias("n_events"))


# ---------------------------------------------------------------------------
# P9 grouped agg + HAVING (utils.py:322-323 contract)
# ---------------------------------------------------------------------------

@register(
    "q_group_having",
    """
    SELECT user_id,
           count(*) AS total_requests,
           count(*) FILTER (WHERE event_type = 'error') AS n_errors,
           100.0 * count(*) FILTER (WHERE event_type = 'error') / count(*)
             AS error_percent
    FROM events
    GROUP BY user_id
    HAVING count(*) > 50
       AND 100.0 * count(*) FILTER (WHERE event_type = 'error') / count(*) > 10.0
    """,
)
def q_group_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    n_errors = F.count(F.when(F.col("event_type") == "error", 1))
    return R.grouped_having(
        events,
        ["user_id"],
        [
            F.count("*").alias("total_requests"),
            n_errors.alias("n_errors"),
            (F.lit(100.0) * n_errors / F.count("*")).alias("error_percent"),
        ],
        having=(F.col("total_requests") > 50) & (F.col("error_percent") > 10.0),
    )


# ---------------------------------------------------------------------------
# U1 union of page batches (ct_utils.py:258)
# ---------------------------------------------------------------------------

@register(
    "q_union_pages",
    "SELECT o_orderkey, o_orderpriority FROM orders",
)
def q_union_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    # Split into "pages" by a driver-known pagination plan (like
    # per-request REST batches — page keys are known a priori, no
    # data-dependent collect), then union back: the multiset must
    # equal the original scan.
    pages = [
        orders.filter(F.col("o_orderkey") % 4 == i).select(
            "o_orderkey", "o_orderpriority"
        )
        for i in range(4)
    ]
    return R.union_pages(pages)


# ---------------------------------------------------------------------------
# O2 top-k (utils.py:217-218)
# ---------------------------------------------------------------------------

@register(
    "q_topk_orders",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# P1 projection ∩ existing (ct_utils.py:116-118)
# ---------------------------------------------------------------------------

@register(
    "q_project_existing",
    "SELECT c_name, c_acctbal FROM customer",
)
def q_project_existing(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    return R.project_existing(customer, ["c_name", "c_acctbal", "not_a_column"])


# ---------------------------------------------------------------------------
# P7 IN-list predicate (utils.py:510-511)
# ---------------------------------------------------------------------------

@register(
    "q_in_list",
    """
    SELECT n_nationkey, n_name
    FROM nation
    WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
    """,
)
def q_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation")
    return R.in_list(nation, "n_name", ["NATION_3", "NATION_7", "NATION_11"]).select(
        "n_nationkey", "n_name"
    )


# ---------------------------------------------------------------------------
# A3 per-column max stringified length, one pass (utils.py:518-522)
# ---------------------------------------------------------------------------

@register(
    "q_schema_maxlen",
    """
    SELECT 'p_name' AS column_name,
           max(length(CAST(p_name AS VARCHAR))) AS new_max_length FROM part
    UNION ALL
    SELECT 'p_brand', max(length(CAST(p_brand AS VARCHAR))) FROM part
    UNION ALL
    SELECT 'p_type', max(length(CAST(p_type AS VARCHAR))) FROM part
    """,
)
def q_schema_maxlen(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    out = R.column_max_lengths(part, ["p_name", "p_brand", "p_type"])
    return out.select(
        "column_name", F.col("new_max_length").cast("long").alias("new_max_length")
    )


# ---------------------------------------------------------------------------
# N1-N3 recursive flatten — nested frame built in-query from the star
# schema so the oracle sees the same bytes (FIXTURES.md §2.5). The
# Spark side really does build array<struct> and flatten it; the
# DuckDB oracle states the equivalent relational identity
# (explode_outer ∘ collect_list == LEFT JOIN).
# ---------------------------------------------------------------------------

@register(
    "q_flatten_lineitems",
    """
    SELECT o.o_orderkey,
           o.o_totalprice,
           l.l_partkey  AS "lineItems__l_partkey",
           l.l_quantity AS "lineItems__l_quantity",
           l.l_extendedprice AS "lineItems__l_extendedprice"
    FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    """,
)
def q_flatten_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators import nested as N

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    items = lineitem.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct("l_partkey", "l_quantity", "l_extendedprice")
        ).alias("lineItems")
    )
    nested = (
        orders.join(items, orders.o_orderkey == items.l_orderkey, "left")
        .drop("l_orderkey")
        .select("o_orderkey", "o_totalprice", "lineItems")
    )
    return N.flatten(nested)


@register(
    "q_flatten_depth2",
    """
    SELECT o.o_orderkey,
           l.l_partkey AS "lineItems__keys__l_partkey",
           l.l_suppkey AS "lineItems__keys__l_suppkey",
           l.l_quantity AS "lineItems__l_quantity"
    FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    """,
)
def q_flatten_depth2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # struct-inside-struct-inside-array: two fixpoint iterations
    from bi_utils_spark.operators import nested as N

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    items = lineitem.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(
                F.struct("l_partkey", "l_suppkey").alias("keys"),
                F.col("l_quantity"),
            )
        ).alias("lineItems")
    )
    nested = (
        orders.join(items, orders.o_orderkey == items.l_orderkey, "left")
        .select("o_orderkey", "lineItems")
    )
    return N.flatten(nested)


@register(
    "q_json_normalize_props",
    """
    SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS props__k
    FROM events
    """,
)
def q_json_normalize_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    # N4 over a JSON-string column with schema supplied (production path)
    from bi_utils_spark.operators import nested as N

    events = load(spark, sf_dir, "events").select("event_id", "props")
    return N.from_json_normalized(events, "props", schema="k BIGINT")


# ---------------------------------------------------------------------------
# M1 MERGE upsert — orders split into target/source (FIXTURES.md §2.4):
# matched keys take source values + restamped update_ts, keep target
# insert_ts; unmatched source keys are inserted with both stamped.
# Oracle states the FULL OUTER JOIN + CASE identity.
# ---------------------------------------------------------------------------

@register(
    "q_merge_upsert",
    """
    WITH target AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             '2020-01-01 00:00:00' AS insert_timestamp,
             '2020-01-01 00:00:00' AS update_timestamp
      FROM orders WHERE o_orderdate < DATE '1998-01-01'
    ),
    source AS (
      SELECT o_orderkey, o_custkey, o_totalprice + 1.0 AS o_totalprice
      FROM orders WHERE o_orderdate >= DATE '1997-01-01'
    )
    SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey
                ELSE t.o_custkey END AS o_custkey,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
                ELSE t.o_totalprice END AS o_totalprice,
           CASE WHEN t.o_orderkey IS NOT NULL THEN t.insert_timestamp
                ELSE '2024-06-01 00:00:00' END AS insert_timestamp,
           CASE WHEN s.o_orderkey IS NOT NULL THEN '2024-06-01 00:00:00'
                ELSE t.update_timestamp END AS update_timestamp
    FROM target t FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.merge import merge_upsert

    orders = load(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderdate") < "1998-01-01").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.lit("2020-01-01 00:00:00").alias("insert_timestamp"),
        F.lit("2020-01-01 00:00:00").alias("update_timestamp"),
    )
    source = orders.filter(F.col("o_orderdate") >= "1997-01-01").select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") + 1.0).alias("o_totalprice"),
    )
    return merge_upsert(
        target, source, ["o_orderkey"], now=F.lit("2024-06-01 00:00:00")
    )


# ---------------------------------------------------------------------------
# M3 schema-length drift — measured vs declared catalog (utils.py:496-538)
# ---------------------------------------------------------------------------

@register(
    "q_schema_drift",
    """
    WITH measured AS (
      SELECT 'p_name' AS column_name,
             CAST(max(length(CAST(p_name AS VARCHAR))) AS BIGINT)
               AS new_max_length FROM part
      UNION ALL
      SELECT 'p_brand', CAST(max(length(CAST(p_brand AS VARCHAR))) AS BIGINT)
      FROM part
      UNION ALL
      SELECT 'p_type', CAST(max(length(CAST(p_type AS VARCHAR))) AS BIGINT)
      FROM part
    ),
    declared AS (
      SELECT * FROM (VALUES ('p_name', CAST(5 AS BIGINT)),
                            ('p_brand', CAST(50 AS BIGINT)),
                            ('p_type', CAST(3 AS BIGINT)))
        AS d(column_name, declared_max_length)
    )
    SELECT m.column_name,
           d.declared_max_length,
           m.new_max_length
    FROM measured m JOIN declared d USING (column_name)
    WHERE m.new_max_length > d.declared_max_length
    """,
)
def q_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.schema_drift import length_drift

    part = load(spark, sf_dir, "part")
    from bi_utils_spark.operators.localrel import local_df

    declared = local_df(
        spark,
        [("p_name", 5), ("p_brand", 50), ("p_type", 3)],
        "column_name string, declared_max_length long",
    )
    drift = length_drift(part, declared, ["p_name", "p_brand", "p_type"])
    return drift.select(
        "column_name",
        F.col("declared_max_length").cast("long").alias("declared_max_length"),
        F.col("new_max_length").cast("long").alias("new_max_length"),
    )


# ---------------------------------------------------------------------------
# C4 alert state machine, batch mode (utils.py:159-234 composed):
# history = events before a pivot; current = latest event per key after
# it; decision joins last history value with the W2 threshold gate.
# ---------------------------------------------------------------------------

@register(
    "q_alert_decide_batch",
    """
    WITH history AS (
      SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
    ),
    current_raw AS (
      SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
    ),
    current AS (
      SELECT event_type, user_id, value FROM (
        SELECT *, row_number() OVER (
          PARTITION BY event_type, user_id
          ORDER BY ts DESC, event_id DESC) AS rn
        FROM current_raw) WHERE rn = 1
    ),
    last_hist AS (
      SELECT event_type, user_id, value AS last_value FROM (
        SELECT *, row_number() OVER (
          PARTITION BY event_type, user_id
          ORDER BY ts DESC, event_id DESC) AS rn
        FROM history) WHERE rn = 1
    )
    SELECT c.event_type, c.user_id, c.value, h.last_value,
           CASE WHEN h.last_value IS NULL THEN TRUE
                ELSE abs(c.value - h.last_value) >= 5.0 END AS should_send
    FROM current c LEFT JOIN last_hist h
      ON c.event_type = h.event_type AND c.user_id = h.user_id
    """,
)
def q_alert_decide_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.streaming.alerts import decide_alerts_batch

    events = load(spark, sf_dir, "events")
    pivot = "2024-01-20 00:00:00"
    history = events.filter(F.col("ts") < pivot)
    current = R.latest_per_key(
        events.filter(F.col("ts") >= pivot),
        ["event_type", "user_id"],
        "ts",
        tiebreak_cols=["event_id"],
    ).select("event_type", "user_id", "value")
    return decide_alerts_batch(
        current,
        history,
        ["event_type", "user_id"],
        "value",
        "value",
        "ts",
        resend_threshold=5.0,
        history_tiebreak_cols=["event_id"],
    )
