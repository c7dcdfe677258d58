"""Registry of oracle-checked queries — one per SURVEY.md §2 operator.

Each entry pairs a Spark plan built from the bi_utils_spark operator
library with the ANSI-SQL DuckDB oracle the driver runs side-by-side.
Determinism rules (FIXTURES.md §3): no wall-clock, explicit aliases,
timestamps as epoch-µs BIGINT or fixed-format strings, float sums
via exact DECIMAL accumulation cast back to DOUBLE.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bi_utils_spark.functions import scalars as S
from bi_utils_spark.operators import relational as R

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn
    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    from bi_utils_spark.sources.tables import load_table

    return load_table(spark, sf_dir, table)


def load_fanout(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """load() + repartition to the session's parallelism — for the
    CPU-heavy per-row pipelines (tokenize / md5-bucket / shingle)
    whose map stage would otherwise inherit the test table's SINGLE
    input split and run one-core. At production scale inputs arrive
    in many splits and the scan parallelizes naturally; here one
    small shuffle buys a full-width map stage (measured ~2× on the
    classifier fit at sf0.1)."""
    return load(spark, sf_dir, table).repartition(
        spark.sparkContext.defaultParallelism
    )


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
    declared = spark.createDataFrame(
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


# ===========================================================================
# LLM-data-pipeline operators (SURVEY.md §2.14) over documents/embeddings
# ===========================================================================

# --- X1 exact dedup --------------------------------------------------------

@register(
    "q_dedup_exact",
    """
    SELECT doc_id, text, lang, source, n_chars
    FROM (SELECT *, row_number() OVER (
            PARTITION BY sha256(text) ORDER BY doc_id ASC) AS rn
          FROM documents)
    WHERE rn = 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.dedup import dedup_exact

    docs = load(spark, sf_dir, "documents")
    return dedup_exact(docs, ["text"], "doc_id")


# --- X5 text stats ---------------------------------------------------------

@register(
    "q_text_stats",
    r"""
    WITH toks AS (
      SELECT doc_id,
             regexp_split_to_array(trim(lower(text)), '\s+') AS t,
             text
      FROM documents
    )
    SELECT doc_id,
           len(t) AS n_tokens,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
             AS n_word_tokens,
           length(text) AS n_chars_measured,
           CASE WHEN length(text) = 0 THEN 0.0
                ELSE CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
                          AS DOUBLE) / length(text) END AS punct_ratio,
           md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS fingerprint
    FROM toks
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators import textstats as T

    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count("text").cast("long").alias("n_tokens"),
        T.word_token_count("text").cast("long").alias("n_word_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
        T.punct_ratio("text").alias("punct_ratio"),
        T.content_fingerprint("text").alias("fingerprint"),
    )


# --- X5 token explode + counts --------------------------------------------

@register(
    "q_token_counts",
    r"""
    SELECT tok, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
          FROM documents)
    GROUP BY tok
    ORDER BY n DESC, tok ASC
    LIMIT 50
    """,
)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.textstats import tokens

    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(50)
    )


# --- X5 language-ID heuristic ---------------------------------------------

def _lang_id_oracle_sql() -> str:
    """DuckDB oracle for q_lang_id, GENERATED from the same
    LANG_MARKERS table the Spark expression scores with — profiles
    and oracle cannot drift. Tie-break mirrors language_id exactly:
    first language in sorted-code order achieving the max wins; all
    zeros → 'und'."""
    from bi_utils_spark.operators.textstats import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    score_lines = ",\n             ".join(
        "len(list_intersect(t, [{}])) AS l_{}".format(
            ",".join("'" + w + "'" for w in LANG_MARKERS[lang]), lang
        )
        for lang in langs
    )
    g = "greatest({})".format(", ".join(f"l_{lang}" for lang in langs))
    arms = "\n                ".join(
        f"WHEN l_{lang} = {g} THEN '{lang}'" for lang in langs[:-1]
    )
    return rf"""
    WITH s AS (
      SELECT doc_id,
             regexp_split_to_array(trim(lower(text)), '\s+') AS t
      FROM documents
    ),
    sc AS (
      SELECT doc_id,
             {score_lines}
      FROM s
    )
    SELECT doc_id,
           CASE WHEN {g} <= 0 THEN 'und'
                {arms}
                ELSE '{langs[-1]}' END AS lang_guess
    FROM sc
    """


@register("q_lang_id", _lang_id_oracle_sql())
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.textstats import language_id

    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", language_id("text").alias("lang_guess"))


# --- X5 quality score ------------------------------------------------------

@register(
    "q_quality_score",
    r"""
    WITH t AS (
      SELECT doc_id, text,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 20 THEN 1.0 ELSE 0.0 END AS length_ok,
             CASE WHEN (CASE WHEN length(text) = 0 THEN 0.0
                   ELSE CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
                        AS DOUBLE) / length(text) END) <= 0.2
                  THEN 1.0 ELSE 0.0 END AS punct_ok,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE CAST(len(list_filter(toks,
                        x -> list_contains(['the','and','of','to','a','is'], x)))
                       AS DOUBLE) / len(toks) END AS sw
      FROM t
    )
    SELECT doc_id,
           (length_ok + punct_ok + least(sw * 5.0, 1.0)) / 3.0 AS quality
    FROM m
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.textstats import quality_score

    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score("text").alias("quality"))


# --- X5/X1 doc stats by lang/source ---------------------------------------

@register(
    "q_doc_stats_by_lang",
    """
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS DOUBLE) / count(*) AS avg_chars,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def q_doc_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


# --- X2a exact Jaccard near-dup join --------------------------------------

# Shared DuckDB CTE: exact pairwise Jaccard over distinct 3-token
# shingle sets (chr(1)-joined strings — the same ("ab","c") vs
# ("a","bc") separation the Spark side gets from its arithmetic hash
# combine). Parameterized by threshold so the q_jaccard_pairs oracle
# and the recall-bound summaries stay one definition.
def _jaccard_pairs_sql(threshold: float, select: str) -> str:
    return rf"""
    WITH toks AS (
      SELECT doc_id,
             regexp_split_to_array(trim(lower(text)), '\s+') AS t
      FROM documents
    ),
    sets AS (
      SELECT doc_id,
             CASE WHEN len(t) < 3 THEN [array_to_string(t, chr(1))]
                  ELSE list_distinct(list_transform(
                         generate_series(1, len(t) - 2),
                         i -> array_to_string(t[i:i+2], chr(1))))
             END AS sh
      FROM toks
    ),
    sizes AS (SELECT doc_id, len(sh) AS sz FROM sets),
    inv AS (SELECT doc_id, unnest(sh) AS tok FROM sets),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS inter
      FROM inv a JOIN inv b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jac AS (
      SELECT id_a, id_b,
             CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) AS jaccard
      FROM pairs
      JOIN sizes sa ON id_a = sa.doc_id
      JOIN sizes sb ON id_b = sb.doc_id
      WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE)
            >= {threshold}
    )
    {select}
    """


def _pair_recall_summary(
    exact: DataFrame, approx: DataFrame, bound: float, recall_col: str
) -> DataFrame:
    """One-row (n_exact, false_positives, <recall_col>) attestation.

    n_exact is cross-engine-checkable ground truth; false_positives
    (approx pairs outside the exact set) must be 0 because every
    approximate operator here verifies candidates exactly; the recall
    flag is 1 iff |approx ∩ exact| ≥ bound · n_exact — computed
    entirely Spark-side from deterministic (seeded) plans, so the
    oracle pins it as a constant. A recall regression or a false
    positive flips an integer and fails the driver's hash match.
    """
    keys = ["id_a", "id_b"]
    e = exact.select(*keys)
    a = approx.select(*keys)
    n_exact = e.agg(F.count("*").alias("n_exact"))
    fp = a.join(e, keys, "left_anti").agg(F.count("*").alias("false_positives"))
    found = a.join(e, keys, "left_semi").agg(F.count("*").alias("__found"))
    return (
        n_exact.crossJoin(fp)
        .crossJoin(found)
        .select(
            "n_exact",
            "false_positives",
            (
                F.col("__found").cast("double")
                >= F.lit(bound) * F.col("n_exact").cast("double")
            )
            .cast("int")
            .alias(recall_col),
        )
    )


@register(
    "q_jaccard_pairs",
    _jaccard_pairs_sql(0.5, "SELECT id_a, id_b, jaccard FROM jac"),
)
def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.dedup import jaccard_similarity_join

    docs = load(spark, sf_dir, "documents")
    # prefix_filter is left at the auto default: at t=0.5 the PPJoin prefix
    # is ~half of every shingle set, so the one-stage co-occurrence plan wins
    # (A/B at sf0.1: 0.80 s vs 3.13 s steady-state); PPJoin kicks in at
    # t >= PPJOIN_MIN_THRESHOLD. Both plans are exact — test_llmdata asserts
    # identical pair sets across them.
    return jaccard_similarity_join(docs, "doc_id", "text", threshold=0.5, shingle_n=3)


# --- text cleaning / PII redaction ----------------------------------------

@register(
    "q_clean_text",
    r"""
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '<[^>]{1,500}>', ' ', 'g'),
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '(?:https?://|www\.)[^\s]+', '<URL>', 'g'),
             '\s+', ' ', 'g')) AS cleaned
    FROM documents
    """,
)
def q_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup strip + email/URL redaction + whitespace normalization —
    one codegen'd projection. Phone/IP classes use lookarounds (not
    RE2-expressible) so they are unit-tested, not oracle-hashed."""
    from bi_utils_spark.operators import textclean as tc

    docs = load(spark, sf_dir, "documents")
    cleaned = tc.normalize_whitespace(
        tc.redact_pii(tc.strip_markup("text"), phone=None, ip=None)
    )
    return docs.select("doc_id", cleaned.alias("cleaned"))


@register(
    "q_pii_audit",
    r"""
    SELECT
      CAST(SUM(len(regexp_extract_all(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) AS total_emails,
      CAST(SUM(len(regexp_extract_all(text,
        '(?:https?://|www\.)[^\s]+'))) AS BIGINT) AS total_urls,
      CAST(COUNT_IF(len(regexp_extract_all(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) > 0) AS BIGINT)
        AS docs_with_email
    FROM documents
    """,
)
def q_pii_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level PII audit: class counts aggregated in one pass."""
    from bi_utils_spark.operators.textclean import pii_counts

    docs = load(spark, sf_dir, "documents")
    cnt = pii_counts("text")
    return docs.agg(
        F.sum(cnt["n_emails"]).alias("total_emails"),
        F.sum(cnt["n_urls"]).alias("total_urls"),
        F.sum((cnt["n_emails"] > 0).cast("long")).alias("docs_with_email"),
    )


# --- deterministic splits & samples ---------------------------------------
# Threshold hexes are computed by the SAME module code the Spark side
# uses, interpolated into the oracle SQL — one source of truth.

def _split_sql_case() -> str:
    from bi_utils_spark.operators.splits import _thresholds

    ths = _thresholds({"train": 0.8, "val": 0.1, "test": 0.1})
    h = "substr(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 16)"
    whens = " ".join(
        f"WHEN {h} < '{bound}' THEN '{name}'" for name, bound in ths[:-1]
    )
    return f"CASE {whens} ELSE '{ths[-1][0]}' END"


@register(
    "q_hash_split",
    f"""
    SELECT {_split_sql_case()} AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY 1
    """,
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split assignment — md5-hex thresholds,
    identical row→split mapping in Spark and the DuckDB oracle."""
    from bi_utils_spark.operators.splits import hash_split

    docs = load(spark, sf_dir, "documents")
    return hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).groupBy(
        "split"
    ).agg(F.count("*").alias("n_docs"))


@register(
    "q_det_sample",
    """
    SELECT doc_id FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR) || 'sample'), 1, 16)
          < '4000000000000000'
    """,
)
def q_det_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """25% deterministic sample — same surviving ids on every run,
    every partitioning, both engines."""
    from bi_utils_spark.operators.splits import deterministic_sample

    docs = load(spark, sf_dir, "documents")
    return deterministic_sample(docs, "doc_id", 0.25).select("doc_id")


# --- composed LLM training-data pipeline ----------------------------------

def _llm_pipeline_oracle_sql() -> str:
    """End-to-end DuckDB oracle for q_llm_pipeline (VERDICT r3 #1),
    composed from the SAME SQL fragments that verify each stage
    individually: q_clean_text's clean expression → q_dedup_exact's
    min-id survivor window → _JACCARD_EDGES_CTE + q_dedup_canonical's
    recursive components → the generated q_lang_id scoring +
    q_quality_score's quality formula. Output is integer-only (lang,
    counts), so the hash match is float-free."""
    from bi_utils_spark.operators.textstats import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    score_lines = ",\n             ".join(
        "len(list_intersect(t, [{}])) AS l_{}".format(
            ",".join("'" + w + "'" for w in LANG_MARKERS[lang]), lang
        )
        for lang in langs
    )
    g = "greatest({})".format(", ".join(f"l_{lang}" for lang in langs))
    arms = "\n                ".join(
        f"WHEN l_{lang} = {g} THEN '{lang}'" for lang in langs[:-1]
    )
    return rf"""
    WITH RECURSIVE cleaned AS (
      SELECT doc_id,
             trim(regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(text, '<[^>]{{1,500}}>', ' ', 'g'),
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
                 '(?:https?://|www\.)[^\s]+', '<URL>', 'g'),
               '\s+', ' ', 'g')) AS text
      FROM documents
    ),
    uniq AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text,
               row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM cleaned)
      WHERE rn = 1
    ),
    toks AS (
      SELECT doc_id,
             regexp_split_to_array(trim(lower(text)), '\s+') AS t
      FROM uniq
    ),
    sets AS (
      SELECT doc_id,
             CASE WHEN len(t) < 3 THEN [array_to_string(t, chr(1))]
                  ELSE list_distinct(list_transform(
                         generate_series(1, len(t) - 2),
                         i -> array_to_string(t[i:i+2], chr(1))))
             END AS sh
      FROM toks
    ),
    sizes AS (SELECT doc_id, len(sh) AS sz FROM sets),
    inv AS (SELECT doc_id, unnest(sh) AS tok FROM sets),
    grouped AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS inter
      FROM inv a JOIN inv b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jp AS (
      SELECT id_a, id_b
      FROM grouped
      JOIN sizes sa ON id_a = sa.doc_id
      JOIN sizes sb ON id_b = sb.doc_id
      WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.5
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM jp
      UNION ALL
      SELECT id_b AS u, id_a AS v FROM jp
    ),
    reach(node, lbl) AS (
      SELECT DISTINCT u, u FROM edges
      UNION
      SELECT e.u, r.lbl FROM edges e JOIN reach r ON e.v = r.node
    ),
    comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node),
    kept AS (
      SELECT u.doc_id, u.text, t.t
      FROM uniq u JOIN toks t USING (doc_id)
      WHERE u.doc_id NOT IN (SELECT node FROM comp WHERE node <> component)
    ),
    sc AS (
      SELECT doc_id, t, text,
             {score_lines}
      FROM kept
    ),
    scored AS (
      SELECT CASE WHEN {g} <= 0 THEN 'und'
                  {arms}
                  ELSE '{langs[-1]}' END AS lang,
             ((CASE WHEN len(t) >= 20 THEN 1.0 ELSE 0.0 END)
              + (CASE WHEN (CASE WHEN length(text) = 0 THEN 0.0
                       ELSE CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
                            AS DOUBLE) / length(text) END) <= 0.2
                     THEN 1.0 ELSE 0.0 END)
              + least((CASE WHEN len(t) = 0 THEN 0.0
                       ELSE CAST(len(list_filter(t,
                             x -> list_contains(['the','and','of','to','a','is'], x)))
                            AS DOUBLE) / len(t) END) * 5.0, 1.0)) / 3.0 AS q,
             len(t) AS n_toks
      FROM sc
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS total_tokens
    FROM scored
    WHERE q >= 0.5
    GROUP BY lang
    """


@register("q_llm_pipeline", _llm_pipeline_oracle_sql())
def q_llm_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data pipeline, composed from stages that
    are each individually oracle-verified: clean (q_clean_text) →
    exact dedup on cleaned content (q_dedup_exact) → near-dup
    canonical retention (q_dedup_canonical) → per-language corpus
    stats gated on quality (q_lang_id / q_quality_score). The DuckDB
    oracle replays the WHOLE composition (see
    :func:`_llm_pipeline_oracle_sql`); the clean stage uses the
    RE2-expressible PII classes (email/URL — same subset q_clean_text
    verifies) so both engines compute the identical corpus; the
    lookaround-based phone/IP classes stay available in
    textclean.clean_text and are unit-tested instead.

    Scale shape: clean is map-only and fuses into the scan; both dedup
    tiers shuffle on small keys (hash / shingle); the final stats are
    one partial-aggregated groupBy on a low-cardinality key.
    """
    from bi_utils_spark.operators import textclean as tc
    from bi_utils_spark.operators.dedup import (
        dedup_exact,
        jaccard_similarity_join,
    )
    from bi_utils_spark.operators.graph import dedup_near_canonical
    from bi_utils_spark.operators.textstats import (
        language_id,
        quality_score,
        token_count,
    )

    docs = load(spark, sf_dir, "documents")
    cleaned = docs.select(
        "doc_id",
        tc.normalize_whitespace(
            tc.redact_pii(tc.strip_markup("text"), phone=None, ip=None)
        ).alias("text"),
    )
    # The deduped corpus feeds TWO consumers (the Jaccard self-join
    # and the final canonical anti-join); checkpoint it so the
    # clean+window-dedup chain runs once, not once per consumer.
    # localCheckpoint storage is freed with the frame (no
    # catalog-cache leak); a production run would write this stage
    # out as the exact-dedup table anyway.
    uniq = dedup_exact(cleaned, ["text"], keep_order_col="doc_id").localCheckpoint()
    pairs = jaccard_similarity_join(uniq, "doc_id", "text", threshold=0.5, shingle_n=3)
    kept = dedup_near_canonical(uniq, pairs)
    return (
        kept.select(
            language_id("text").alias("lang"),
            quality_score("text").alias("q"),
            token_count("text").alias("n_toks"),
        )
        .filter(F.col("q") >= 0.5)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
        )
    )


# --- near-dup clusters: connected components over similarity edges --------

_JACCARD_EDGES_CTE = r"""
    toks AS (
      SELECT doc_id,
             regexp_split_to_array(trim(lower(text)), '\s+') AS t
      FROM documents
    ),
    sets AS (
      SELECT doc_id,
             CASE WHEN len(t) < 3 THEN [array_to_string(t, chr(1))]
                  ELSE list_distinct(list_transform(
                         generate_series(1, len(t) - 2),
                         i -> array_to_string(t[i:i+2], chr(1))))
             END AS sh
      FROM toks
    ),
    sizes AS (SELECT doc_id, len(sh) AS sz FROM sets),
    inv AS (SELECT doc_id, unnest(sh) AS tok FROM sets),
    grouped AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS inter
      FROM inv a JOIN inv b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jp AS (
      SELECT id_a, id_b
      FROM grouped
      JOIN sizes sa ON id_a = sa.doc_id
      JOIN sizes sb ON id_b = sb.doc_id
      WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.5
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM jp
      UNION ALL
      SELECT id_b AS u, id_a AS v FROM jp
    ),
    reach(node, lbl) AS (
      SELECT DISTINCT u, u FROM edges
      UNION
      SELECT e.u, r.lbl FROM edges e JOIN reach r ON e.v = r.node
    ),
    comp AS (
      SELECT node, MIN(lbl) AS component FROM reach GROUP BY node
    )
"""


@register(
    "q_dedup_clusters",
    "WITH RECURSIVE "
    + _JACCARD_EDGES_CTE
    + """
    SELECT node AS doc_id, component FROM comp
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: exact-Jaccard edges → connected components
    (component id = min doc_id). The oracle computes the same fixpoint
    with a recursive transitive-closure CTE."""
    from bi_utils_spark.operators.dedup import jaccard_similarity_join
    from bi_utils_spark.operators.graph import connected_components

    docs = load(spark, sf_dir, "documents")
    pairs = jaccard_similarity_join(docs, "doc_id", "text", threshold=0.5, shingle_n=3)
    return connected_components(pairs).select(
        F.col("node").alias("doc_id"), "component"
    )


@register(
    "q_dedup_canonical",
    "WITH RECURSIVE "
    + _JACCARD_EDGES_CTE
    + """
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> component)
    """,
)
def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level retention: one canonical (min-id) doc survives per
    near-dup cluster; unpaired docs pass through."""
    from bi_utils_spark.operators.dedup import jaccard_similarity_join
    from bi_utils_spark.operators.graph import dedup_near_canonical

    docs = load(spark, sf_dir, "documents")
    pairs = jaccard_similarity_join(docs, "doc_id", "text", threshold=0.5, shingle_n=3)
    return dedup_near_canonical(docs, pairs).select("doc_id")


# --- X3 exact cosine top-k -------------------------------------------------

TARGET_VEC_SQL = """
  (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)
"""

@register(
    "q_topk_cosine_exact",
    f"""
    SELECT vec_id,
           round(list_cosine_similarity(embedding::DOUBLE[], {TARGET_VEC_SQL}), 9)
             AS score
    FROM embeddings
    ORDER BY score DESC, vec_id ASC
    LIMIT 10
    """,
)
def q_topk_cosine_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.similarity import cosine

    emb = load(spark, sf_dir, "embeddings")
    target = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    q = F.array(*[F.lit(float(x)) for x in target])
    scored = emb.select(
        "vec_id", F.round(cosine(F.col("embedding"), q), 9).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.asc("vec_id")).limit(10)


# --- X4 cosine similarity self-join with threshold -------------------------

@register(
    "q_cosine_pairs",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]), 9) AS score
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                       b.embedding::DOUBLE[]), 9) >= 0.45
    """,
)
def q_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.similarity import cosine

    emb = load(spark, sf_dir, "embeddings")
    a = emb.alias("a")
    b = emb.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(
                cosine(F.col("a.embedding"), F.col("b.embedding")), 9
            ).alias("score"),
        )
        .filter(F.col("score") >= 0.45)
    )


# --- X6 embedding grouped stats (order-free aggregates) --------------------

@register(
    "q_emb_label_stats",
    """
    SELECT label,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT vec_id) AS BIGINT) AS n_distinct,
           round(min(embedding[1]::DOUBLE), 9) AS min_e0,
           round(max(embedding[1]::DOUBLE), 9) AS max_e0
    FROM embeddings
    GROUP BY label
    """,
)
def q_emb_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    e0 = F.element_at("embedding", 1).cast("double")
    return emb.groupBy("label").agg(
        F.count("*").alias("n"),
        F.countDistinct("vec_id").alias("n_distinct"),
        F.round(F.min(e0), 9).alias("min_e0"),
        F.round(F.max(e0), 9).alias("max_e0"),
    )


# --- approximate variants: no SQL oracle (rows-only check; recall is
# property-tested against the exact baselines in tests/test_llmdata.py) ----

def raw_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw LSH near-dup pair join (benched; attested by the
    oracle-backed q_minhash_near_dup summary)."""
    from bi_utils_spark.operators.dedup import minhash_near_dup_join

    docs = load(spark, sf_dir, "documents")
    return minhash_near_dup_join(
        docs, "doc_id", "text", threshold=0.6, num_hashes=64, num_bands=16
    )


@register(
    "q_minhash_near_dup",
    _jaccard_pairs_sql(
        0.6,
        """
    SELECT CAST(count(*) AS BIGINT) AS n_exact,
           CAST(0 AS BIGINT) AS false_positives,
           1 AS recall_ge_090
    FROM jac
    """,
    ),
)
def q_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-bound oracle row for MinHash LSH (VERDICT r2 #5): the
    exact Jaccard pair count is ground truth DuckDB recomputes from
    the raw text; the LSH join (same threshold, seeded) must find
    ≥ 90% of those pairs and may not report any pair outside them."""
    from bi_utils_spark.operators.dedup import (
        jaccard_similarity_join,
        minhash_near_dup_join,
    )

    docs = load(spark, sf_dir, "documents")
    exact = jaccard_similarity_join(docs, "doc_id", "text", threshold=0.6, shingle_n=3)
    approx = minhash_near_dup_join(
        docs, "doc_id", "text", threshold=0.6, num_hashes=64, num_bands=16
    )
    return _pair_recall_summary(exact, approx, 0.9, "recall_ge_090")


def raw_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw banded SimHash join (benched; attested by the
    oracle-backed q_simhash_near_dup summary)."""
    from bi_utils_spark.operators.dedup import simhash_near_dup_join

    docs = load(spark, sf_dir, "documents")
    return simhash_near_dup_join(docs, "doc_id", "text", max_hamming=3)


@register(
    "q_simhash_near_dup",
    """
    WITH norm AS (
      SELECT doc_id, trim(lower(text)) AS t FROM documents
    )
    SELECT CAST(count(*) AS BIGINT) AS n_text_dup_pairs,
           CAST(0 AS BIGINT) AS text_dups_missed,
           CAST(0 AS BIGINT) AS banded_vs_brute_mismatch
    FROM norm a JOIN norm b ON a.t = b.t AND a.doc_id < b.doc_id
    """,
)
def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completeness attestation for the banded SimHash join: (1) the
    pigeonhole banding must return EXACTLY the brute-force
    hamming ≤ 3 pair set (symmetric difference = 0 — the hard
    guarantee, checked on the full table, not a sample); (2) every
    identical-normalized-text pair (ground truth DuckDB recomputes)
    has identical fingerprints and must be reported."""
    from bi_utils_spark.operators.dedup import (
        hamming64,
        simhash64_rows,
        simhash_near_dup_join,
    )

    docs = load(spark, sf_dir, "documents")
    banded = simhash_near_dup_join(docs, "doc_id", "text", max_hamming=3).select(
        "id_a", "id_b"
    )
    fp = simhash64_rows(docs, "doc_id", "text")
    a, b = fp.alias("a"), fp.alias("b")
    brute = (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .filter(hamming64(F.col("a.fp"), F.col("b.fp")) <= 3)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    norm = docs.select(
        "doc_id", F.trim(F.lower(F.col("text"))).alias("t")
    )
    na, nb = norm.alias("na"), norm.alias("nb")
    text_dups = (
        na.join(
            nb,
            (F.col("na.t") == F.col("nb.t"))
            & (F.col("na.doc_id") < F.col("nb.doc_id")),
        )
        .select(
            F.col("na.doc_id").alias("id_a"), F.col("nb.doc_id").alias("id_b")
        )
    )
    keys = ["id_a", "id_b"]
    n_text = text_dups.agg(F.count("*").alias("n_text_dup_pairs"))
    missed = text_dups.join(banded, keys, "left_anti").agg(
        F.count("*").alias("text_dups_missed")
    )
    mismatch = (
        banded.join(brute, keys, "left_anti")
        .unionByName(brute.join(banded, keys, "left_anti"))
        .agg(F.count("*").alias("banded_vs_brute_mismatch"))
    )
    return n_text.crossJoin(missed).crossJoin(mismatch)


def raw_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw hyperplane-LSH top-k self-join (benched; attested by
    the oracle-backed q_ann_topk summary)."""
    from bi_utils_spark.operators.similarity import ann_self_join_topk

    emb = load(spark, sf_dir, "embeddings")
    return ann_self_join_topk(emb, k=3, num_planes=16, num_bands=8, dim=64)


@register(
    "q_ann_topk",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(3 * count(*) AS BIGINT) AS n_exact_rows,
           1 AS recall_ge_050
    FROM embeddings WHERE vec_id % 25 = 0
    """,
)
def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-bound oracle row for hyperplane-LSH ANN: exact k-NN is
    computed Spark-side for a deterministic query sample (vec_id %
    25 = 0 — whose size and k·size DuckDB recomputes), and the ANN
    join must recall ≥ 50% of those (query, neighbor) edges — the
    bound the recall property test has enforced since r1."""
    from bi_utils_spark.operators.similarity import ann_self_join_topk, exact_knn_all

    emb = load(spark, sf_dir, "embeddings")
    sampled = F.col("query_id") % 25 == 0
    exact = (
        exact_knn_all(emb, k=3)
        .filter(sampled)
        .select(F.col("query_id").alias("id_a"), F.col("neighbor_id").alias("id_b"))
    )
    ann = (
        ann_self_join_topk(emb, k=3, num_planes=16, num_bands=8, dim=64)
        .filter(sampled)
        .select(F.col("query_id").alias("id_a"), F.col("neighbor_id").alias("id_b"))
    )
    keys = ["id_a", "id_b"]
    n_q = emb.filter(F.col("vec_id") % 25 == 0).agg(
        F.count("*").alias("n_queries")
    )
    n_exact = exact.agg(F.count("*").alias("n_exact_rows"))
    found = ann.join(exact, keys, "left_semi").agg(F.count("*").alias("__found"))
    return (
        n_q.crossJoin(n_exact)
        .crossJoin(found)
        .select(
            "n_queries",
            "n_exact_rows",
            (
                F.col("__found").cast("double")
                >= 0.5 * F.col("n_exact_rows").cast("double")
            )
            .cast("int")
            .alias("recall_ge_050"),
        )
    )


# Shared oracle CTE: two exact-fixed-point Lloyd steps from the
# smallest-id seed (k=8), ending in fin(vec_id, c, d2) — the final
# assignment. Composable: q_kmeans_clusters aggregates it,
# q_cluster_balanced_sample windows over it.
_KMEANS_CTE = """
    WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
    edq AS (
      SELECT vec_id, dim,
             CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT) AS xq,
             CAST(x AS DOUBLE) AS xd
      FROM (SELECT vec_id,
                   UNNEST(range(1, len(v)+1)) AS dim,
                   UNNEST(v) AS x
            FROM e)
    ),
    seed AS (SELECT vec_id,
                    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
                      AS c
             FROM e ORDER BY vec_id LIMIT 8),
    cd0 AS (SELECT s.c, edq.dim, CAST(edq.xq AS DOUBLE) / 1e7 AS cx
            FROM seed s JOIN edq USING (vec_id)),
    d1 AS (SELECT edq.vec_id, cd0.c,
                  sum(CAST(round((edq.xd - cd0.cx) * 1e7) AS BIGINT)
                      * CAST(round((edq.xd - cd0.cx) * 1e7) AS BIGINT)) AS d2
           FROM edq JOIN cd0 USING (dim) GROUP BY edq.vec_id, cd0.c),
    a1 AS (SELECT vec_id, c FROM (
             SELECT vec_id, c,
                    row_number() OVER (PARTITION BY vec_id ORDER BY d2, c)
                      AS rn
             FROM d1) WHERE rn = 1),
    u1 AS (SELECT a1.c, edq.dim,
                  round(CAST(sum(edq.xq) AS DOUBLE) / count(*)) / 1e7 AS cx
           FROM a1 JOIN edq USING (vec_id) GROUP BY a1.c, edq.dim),
    c1 AS (SELECT cd0.c, cd0.dim, coalesce(u1.cx, cd0.cx) AS cx
           FROM cd0 LEFT JOIN u1 ON u1.c = cd0.c AND u1.dim = cd0.dim),
    d2_ AS (SELECT edq.vec_id, c1.c,
                   sum(CAST(round((edq.xd - c1.cx) * 1e7) AS BIGINT)
                       * CAST(round((edq.xd - c1.cx) * 1e7) AS BIGINT)) AS d2
            FROM edq JOIN c1 USING (dim) GROUP BY edq.vec_id, c1.c),
    a2 AS (SELECT vec_id, c FROM (
             SELECT vec_id, c,
                    row_number() OVER (PARTITION BY vec_id ORDER BY d2, c)
                      AS rn
             FROM d2_) WHERE rn = 1),
    u2 AS (SELECT a2.c, edq.dim,
                  round(CAST(sum(edq.xq) AS DOUBLE) / count(*)) / 1e7 AS cx
           FROM a2 JOIN edq USING (vec_id) GROUP BY a2.c, edq.dim),
    c2 AS (SELECT c1.c, c1.dim, coalesce(u2.cx, c1.cx) AS cx
           FROM c1 LEFT JOIN u2 ON u2.c = c1.c AND u2.dim = c1.dim),
    d3 AS (SELECT edq.vec_id, c2.c,
                  sum(CAST(round((edq.xd - c2.cx) * 1e7) AS BIGINT)
                      * CAST(round((edq.xd - c2.cx) * 1e7) AS BIGINT)) AS d2
           FROM edq JOIN c2 USING (dim) GROUP BY edq.vec_id, c2.c),
    fin AS (SELECT vec_id, c, d2 FROM (
              SELECT vec_id, c, d2,
                     row_number() OVER (PARTITION BY vec_id ORDER BY d2, c)
                       AS rn
              FROM d3) WHERE rn = 1)
"""


@register(
    "q_kmeans_clusters",
    _KMEANS_CTE
    + """
    SELECT CAST(c AS INTEGER) AS cluster,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(d2 AS HUGEINT)) AS DOUBLE) / 1e14 AS inertia
    FROM fin GROUP BY c
    """,
)
def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (k=8, 2 update steps from the
    deterministic smallest-id seed) over the embeddings table —
    cluster sizes and exact inertia. The whole iteration runs in
    engine-exact fixed-point (pre-quantized residuals, BIGINT
    distance sums, quantized centroid updates), so the oracle can
    replay both Lloyd steps in SQL and hash-match the result — an
    iterative clustering algorithm held to the same bit-exact
    standard as the relational tier."""
    from bi_utils_spark.operators.clustering import kmeans_summary

    emb = load(spark, sf_dir, "embeddings")
    return kmeans_summary(emb, "vec_id", "embedding", k=8, iters=2)


@register(
    "q_cluster_balanced_sample",
    _KMEANS_CTE
    + """
    SELECT vec_id, CAST(c AS INTEGER) AS cluster FROM (
      SELECT vec_id, c,
             row_number() OVER (
               PARTITION BY c
               ORDER BY md5(CAST(vec_id AS VARCHAR) || 'bal'), vec_id)
               AS rn
      FROM fin) WHERE rn <= 25
    """,
)
def q_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic-balanced subset: ≤ 25 vectors per k-means cluster, chosen
    by smallest md5(id‖salt) — the cluster-quota curation move ("equal
    representation per semantic topic"). The Spark side ranks in two
    levels (per-(cluster, hash-prefix) then per-cluster over ≤ 256·cap
    survivors — no cluster-sized single-task sort); the oracle's
    one-level window over the shared k-means CTE proves the two-level
    result identical."""
    from bi_utils_spark.operators.clustering import cluster_balanced_sample

    emb = load(spark, sf_dir, "embeddings")
    return cluster_balanced_sample(
        emb, "vec_id", "embedding", k=8, iters=2, cap=25
    )


@register(
    "q_embedding_outliers",
    _KMEANS_CTE
    + """
    SELECT vec_id, CAST(c AS INTEGER) AS cluster,
           CAST(d2 AS BIGINT) AS d2q,
           (percent_rank() OVER (ORDER BY d2) > 0.95) AS is_outlier
    FROM fin
    """,
)
def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-hygiene pass: rows whose distance to their k-means
    centroid sits in the top 5% corpus-wide are flagged (corrupt
    decodes / wrong-model vectors land far from every topic). The
    flag comes from the exact two-level percent-rank CDF over the
    fixed-point distances, so the oracle is the shared Lloyd-replay
    CTE plus one percent_rank window."""
    from bi_utils_spark.operators.clustering import embedding_outliers

    emb = load(spark, sf_dir, "embeddings")
    return embedding_outliers(emb, "vec_id", "embedding", k=8, iters=2)


@register(
    "q_centroids_by_label",
    """
    SELECT label, dim,
           (SUM(CAST(round(CAST(v AS DOUBLE) * 1e7) AS BIGINT)) / 1e7)
                / COUNT(*) AS c,
           COUNT(*) AS n
    FROM (
      SELECT label,
             UNNEST(embedding) AS v,
             UNNEST(range(1, len(embedding)+1)) AS dim
      FROM embeddings
    )
    GROUP BY label, dim
    """,
)
def q_centroids_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.similarity import centroid_dims

    emb = load(spark, sf_dir, "embeddings")
    return centroid_dims(emb)


# ===========================================================================
# Headline analytical queries (the GROUP BY / join / HAVING surface the
# reference delegated to Exasol via parameterized SQL scripts, S1/P9 —
# utils.py:312-339, :322-323 — expressed TPC-H-style on the star schema).
# Float determinism: sums accumulate in exact DECIMAL then cast back to
# DOUBLE, so accumulation order can't flip bits on either engine.
# ===========================================================================

@register(
    "q_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
             AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*)
             AS avg_qty,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))
            .cast("double")
            .alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue,
           CAST(epoch_us(o.o_orderdate) AS BIGINT) AS o_orderdate_us,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.filter(F.col("l_shipdate") > "1997-06-01")
        .join(
            orders.filter(F.col("o_orderdate") < "1998-01-01"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_us"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q_revenue_by_nation",
    """
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name
    """,
)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    dims = (
        customer.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name").isin("ASIA", "EUROPE"))),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@register(
    "q_top_suppliers",
    """
    SELECT s.s_suppkey, s.s_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS total_revenue
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY s.s_suppkey, s.s_name
    ORDER BY total_revenue DESC, s_suppkey ASC
    LIMIT 5
    """,
)
def q_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.filter(F.col("l_shipdate") >= "1997-01-01")
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.sum(rev).cast("double").alias("total_revenue"))
        .orderBy(F.desc("total_revenue"), F.asc("s_suppkey"))
        .limit(5)
    )


# ---------------------------------------------------------------------------
# S1 parameterized SQL script (utils.py:312-339) — the engine executes
# the reference's .sql-file surface via Catalyst instead of Exasol.
# ---------------------------------------------------------------------------

@register(
    "q_sql_script",
    """
    SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY CAST(o_orderdate AS DATE)
    HAVING count(*) > 5
    """,
)
def q_sql_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from bi_utils_spark.sources.sql_scripts import (
        register_tables,
        return_df_from_sql_script,
    )

    register_tables(spark, sf_dir, ["orders"])
    script = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "sql", "daily_revenue.sql")
    return return_df_from_sql_script(
        spark, script, start_date="1998-01-01 00:00:00", min_orders=5
    )


# ---------------------------------------------------------------------------
# Sessionization — gap-based sessions via lag + running sum (the
# "common OLAP pattern" the query layer exposes; W-ops generalized).
# ---------------------------------------------------------------------------

@register(
    "q_sessionize",
    """
    WITH g AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, event_id,
             SUM(is_new) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM g
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    g = events.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > 30 * 60), F.lit(1)).otherwise(F.lit(0)),
    )
    s = g.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return s.groupBy("user_id", "session_id").agg(F.count("*").alias("n_events"))


@register(
    "q_session_windows",
    """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``F.session_window`` (the streaming-ready session
    mechanism — same expression works under ``readStream`` +
    watermark, see streaming/watermark.py::session_counts). The
    oracle rebuilds sessions with the classic gaps-and-islands
    construction; Spark's session end = last event + gap."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# ROLLUP / grouping sets (the aggregation surface Spark gives for free,
# SURVEY.md §2.4 "not present in reference ... exposed by the engine")
# ---------------------------------------------------------------------------

@register(
    "q_rollup_flags",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# PIVOT — event counts per date × type (expressed as CASE sums in the
# oracle; Spark uses the native pivot operator).
# ---------------------------------------------------------------------------

@register(
    "q_pivot_events",
    """
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
           CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
           CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
           CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
    FROM events
    GROUP BY 1
    """,
)
def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        events.groupBy(F.to_date("ts").cast("string").alias("event_date"))
        .pivot("event_type", types)
        .count()
    )
    # pivot yields NULL for empty cells; the oracle's FILTER yields 0
    return out.select(
        "event_date",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types],
    )


# ---------------------------------------------------------------------------
# X6 approximate distinct / quantiles — bound-checking oracle (VERDICT
# r3 #2, the q_minhash_near_dup recall-summary pattern): exact ground
# truth is cross-engine-checkable; the approximate answers (HLL++
# distinct, Greenwald–Khanna median — both deterministic given the
# data) are attested via integer within-bound flags the oracle pins.
# ---------------------------------------------------------------------------

@register(
    "q_approx_stats",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           1 AS orders_within_5pct,
           1 AS median_in_p45_p55
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("double")
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("__approx_orders"),
        F.percentile_approx(price, 0.5, 10_000).alias("__approx_median"),
        F.percentile(price, F.lit(0.45)).alias("__p45"),
        F.percentile(price, F.lit(0.55)).alias("__p55"),
    )
    return agg.select(
        "l_returnflag",
        "n",
        "exact_orders",
        (
            F.abs(F.col("__approx_orders") - F.col("exact_orders"))
            <= 0.05 * F.col("exact_orders")
        )
        .cast("int")
        .alias("orders_within_5pct"),
        (
            (F.col("__approx_median") >= F.col("__p45"))
            & (F.col("__approx_median") <= F.col("__p55"))
        )
        .cast("int")
        .alias("median_in_p45_p55"),
    )


# ---------------------------------------------------------------------------
# As-of join (SURVEY.md §2.3 "not present in reference"; operators/joins.py)
# — for each purchase, the user's most recent click at or before it.
# Oracle uses DuckDB's native ASOF LEFT JOIN.
# ---------------------------------------------------------------------------

@register(
    "q_asof_click_before_purchase",
    """
    SELECT p.event_id AS purchase_id,
           p.user_id,
           epoch_us(p.ts) AS ts_us,
           c.event_id AS prior_click_id,
           epoch_us(c.ts) AS prior_click_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.joins import asof_join

    events = load(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols={"event_id": "prior_click_id", "ts": "prior_click_ts"},
        right_tiebreak="event_id",
    )
    return out.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "prior_click_id",
        F.unix_micros("prior_click_ts").alias("prior_click_ts_us"),
    )


# ---------------------------------------------------------------------------
# Range join (bucketed point-in-interval; operators/joins.py) — clicks in
# the hour before each error, counted per error, zero-click errors kept.
# ---------------------------------------------------------------------------

@register(
    "q_range_clicks_before_error",
    """
    WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT e.event_id AS err_id,
           e.user_id,
           CAST(count(c.ts) AS BIGINT) AS n_clicks_1h
    FROM e LEFT JOIN c
      ON c.user_id = e.user_id
     AND c.ts >  e.ts - INTERVAL 1 HOUR
     AND c.ts <= e.ts
    GROUP BY e.event_id, e.user_id
    """,
)
def q_range_clicks_before_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.joins import point_in_interval_join

    events = load(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("start_ts"),
        F.col("ts").alias("end_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    hits = point_in_interval_join(
        clicks,
        errors,
        point_ts="click_ts",
        start_ts="start_ts",
        end_ts="end_ts",
        on=["user_id"],
        bucket_seconds=3600.0,
        closed="right",
    )
    counts = hits.groupBy("err_id").agg(F.count("*").alias("n_clicks_1h"))
    return (
        errors.select("err_id", "user_id")
        .join(counts, "err_id", "left")
        .select(
            "err_id",
            "user_id",
            F.coalesce(F.col("n_clicks_1h"), F.lit(0)).alias("n_clicks_1h"),
        )
    )


# ---------------------------------------------------------------------------
# X7 multimodal columns (operators/multimodal.py) — a deterministic media
# frame derived from `documents` (payload = utf-8 text bytes, modality from
# doc_id, typed metadata struct). Proves the binary-column plumbing:
# metadata-only stats never scan the payload; feature extraction runs the
# Arrow-batched mapInPandas path with the registered (fake) codec.
# ---------------------------------------------------------------------------

def _media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        modality.alias("modality"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 1000).cast("int").alias("width"),
            (F.col("n_chars") % 720).cast("int").alias("height"),
            (F.col("n_chars") * 7 % 60000).cast("int").alias("duration_ms"),
            F.lit(16000).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


_MEDIA_CTE = """
    WITH m AS (
      SELECT CAST(doc_id AS VARCHAR) AS media_id,
             CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
             text,
             octet_length(encode(text)) AS payload_bytes,
             CAST(n_chars % 1000 AS INT) AS width,
             CAST(n_chars * 7 % 60000 AS INT) AS duration_ms
      FROM documents
    )
"""


@register(
    "q_media_stats",
    _MEDIA_CTE
    + """
    SELECT modality,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(payload_bytes) AS BIGINT) AS total_bytes,
           CAST(max(payload_bytes) AS BIGINT) AS max_bytes,
           avg(width) AS avg_width,
           avg(duration_ms) AS avg_duration_ms
    FROM m GROUP BY modality
    """,
)
def q_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media_frame(spark, sf_dir)
    return media.groupBy("modality").agg(
        F.count("*").alias("n"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.max(F.length("payload")).alias("max_bytes"),
        F.avg(F.col("meta.width")).alias("avg_width"),
        F.avg(F.col("meta.duration_ms")).alias("avg_duration_ms"),
    )


@register(
    "q_media_features",
    _MEDIA_CTE
    + """
    SELECT media_id, modality,
           CAST(('0x' || substr(sha256(text), 1, 2))  AS INT) / 255.0 AS f0,
           CAST(('0x' || substr(sha256(text), 3, 2))  AS INT) / 255.0 AS f1,
           CAST(('0x' || substr(sha256(text), 5, 2))  AS INT) / 255.0 AS f2,
           CAST(('0x' || substr(sha256(text), 7, 2))  AS INT) / 255.0 AS f3,
           CAST(('0x' || substr(sha256(text), 9, 2))  AS INT) / 255.0 AS f4,
           CAST(('0x' || substr(sha256(text), 11, 2)) AS INT) / 255.0 AS f5,
           CAST(('0x' || substr(sha256(text), 13, 2)) AS INT) / 255.0 AS f6,
           CAST(('0x' || substr(sha256(text), 15, 2)) AS INT) / 255.0 AS f7
    FROM m
    """,
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.multimodal import (
        DecoderRegistry,
        deterministic_fake_decoder,
        extract_features,
    )

    for modality in ("image", "audio", "video"):
        DecoderRegistry.register(modality, deterministic_fake_decoder(dim=8))
    media = _media_frame(spark, sf_dir)
    feats = extract_features(media, dim=8)
    return feats.select(
        "media_id",
        "modality",
        *[F.element_at("features", i + 1).alias(f"f{i}") for i in range(8)],
    )


@register(
    "q_media_decode",
    """
    WITH m AS (
      SELECT doc_id, CAST(doc_id AS VARCHAR) AS media_id,
             CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS modality,
             n_chars
      FROM documents
    )
    SELECT media_id, modality,
      CASE WHEN modality = 'image' THEN CAST(n_chars % 31 + 1 AS DOUBLE)
           ELSE CAST(n_chars % 50 + 10 AS DOUBLE) END AS f0,
      CASE WHEN modality = 'image' THEN CAST(n_chars % 17 + 1 AS DOUBLE)
           ELSE CAST(8000 + (doc_id % 3) * 4000 AS DOUBLE) END AS f1,
      CASE WHEN modality = 'image'
           THEN (doc_id % 200) + (n_chars % 31) / 2.0
           ELSE CASE WHEN (n_chars % 50 + 10) % 2 = 1
                     THEN CAST(doc_id % 1000 - 500 AS DOUBLE) / (n_chars % 50 + 10)
                     ELSE 0.0 END END AS f2,
      CASE WHEN modality = 'image' THEN CAST(doc_id * 3 % 256 AS DOUBLE)
           ELSE CAST(doc_id % 1000 - 500 AS DOUBLE) END AS f3
    FROM m
    """,
)
def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec round-trip (X7 non-fake tier): synthesize
    PNG/BMP/WAV test patterns with the pure-python encoders, decode
    them back through the registered real parsers, and report header-
    and pixel/PCM-derived features. The oracle recomputes every
    feature in closed form from (doc_id, n_chars) — a decoder that
    does not faithfully parse BMP padding/BGR order, PNG
    DEFLATE+Paeth unfiltering, or RIFF chunks and little-endian int16
    PCM cannot hash-match it (the PNG subset's features must equal
    what the BMP encoding of the same pixels yields).
    """
    from bi_utils_spark.operators.multimodal import (
        DecoderRegistry,
        extract_features,
        image_feature_decoder,
        synthesize_test_media,
        wav_feature_decoder,
    )

    # format-sniffing image decoder: the corpus mixes PNG and BMP
    DecoderRegistry.register("image", image_feature_decoder())
    DecoderRegistry.register("audio", wav_feature_decoder())
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    media = synthesize_test_media(docs)
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "modality",
        *[F.element_at("features", i + 1).alias(f"f{i}") for i in range(4)],
    )


@register(
    "q_jpeg_roundtrip",
    """
    WITH t AS (
      SELECT doc_id,
             (doc_id % 3) + 2 AS tx,
             (doc_id % 2) + 2 AS ty
      FROM documents
    ),
    k AS (
      SELECT doc_id, tx, ty, UNNEST(range(0, tx * ty)) AS k FROM t
    ),
    v AS (
      SELECT doc_id, tx, ty, (doc_id * 31 + k * 97) % 256 AS val FROM k
    )
    SELECT CAST(doc_id AS VARCHAR) AS media_id,
           CAST(tx * 8 AS DOUBLE) AS f0,
           CAST(ty * 8 AS DOUBLE) AS f1,
           avg(val) AS f2,
           avg(val) AS f3
    FROM v GROUP BY doc_id, tx, ty
    """,
)
def q_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG decode, oracle-checked bit-exactly (X7 tier,
    VERDICT r4 "what's missing" #1 closed): synthesize grayscale
    flat-tile mosaics as quality-100 baseline JPEGs (a third of them
    with DRI/RSTn restart markers), decode them back through the full
    T.81 path — marker walk, canonical Huffman, byte un-stuffing,
    dequant, IDCT — and report dims + channel means. Quality 100
    makes every quant entry 1, so flat 8x8 tiles round-trip exactly
    and the oracle recomputes every feature in closed form from
    doc_id alone (see synthesize_jpeg_test_images). Both means are
    the same grayscale mean — asserting the gray->RGB expansion
    contract matches BMP/PNG."""
    from bi_utils_spark.operators.multimodal import (
        DecoderRegistry,
        extract_features,
        image_feature_decoder,
        synthesize_jpeg_test_images,
    )

    DecoderRegistry.register("image", image_feature_decoder())
    # encode+decode is CPU-heavy per row: fan the single test split
    # out to full width (see load_fanout's scale note)
    docs = load_fanout(spark, sf_dir, "documents").select("doc_id")
    media = synthesize_jpeg_test_images(docs)
    feats = extract_features(media)
    return feats.select(
        "media_id",
        *[F.element_at("features", i + 1).alias(f"f{i}") for i in range(4)],
    )


@register(
    "q_resize_roundtrip",
    """
    WITH t AS (
      SELECT doc_id,
             (doc_id % 3) + 2 AS tx,
             (doc_id % 2) + 2 AS ty
      FROM documents
    ),
    k AS (
      SELECT doc_id, tx, ty, UNNEST(range(0, tx * ty)) AS k FROM t
    ),
    v AS (
      SELECT doc_id, tx, ty,
             (doc_id * 31 + k * 97) % 256 AS val,
             k % tx AS cx, k // tx AS cy
      FROM k
    )
    SELECT CAST(doc_id AS VARCHAR) AS media_id,
           CAST(tx * 8 AS DOUBLE) AS f0,
           CAST(ty * 8 AS DOUBLE) AS f1,
           avg(val) AS f2,
           CAST(sum(val * (64 * tx * (64 * cy + 28) + 512 * cx + 224))
                AS DOUBLE) AS f3
    FROM v GROUP BY doc_id, tx, ty
    """,
)
def q_resize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize over the in-repo codecs (X7, r6 — VERDICT r5
    'what's missing' #1 closed): synthesize mixed-format
    (JPEG/PNG/BMP) flat-16×16-tile mosaics, run the registered real
    transcoder — decode → exact integer box-filter scale-2 downsample
    → re-encode in the source format — then decode the RESIZED bytes
    and report dims, gray mean and the position-weighted pixel sum.
    The oracle recomputes all four in closed form from doc_id: the
    resized image is exactly the 8×8 flat-tile mosaic of the source
    tile values (box average of a flat region is exact; JPEG q100
    keeps flat 8-aligned blocks bit-exact), and wsum =
    Σ_tile val·Σ(y·w'+x over the tile) is position-sensitive, so a
    resize that puts right values in wrong places cannot match."""
    from bi_utils_spark.operators.multimodal import (
        DecoderRegistry,
        TranscoderRegistry,
        extract_features,
        image_checksum_decoder,
        real_resize_transcoder,
        resize_media,
        synthesize_resize_test_images,
    )

    TranscoderRegistry.register("resize", real_resize_transcoder())
    DecoderRegistry.register("image", image_checksum_decoder())
    docs = load_fanout(spark, sf_dir, "documents").select("doc_id")
    media = synthesize_resize_test_images(docs)
    resized = resize_media(media, scale=2)
    feats = extract_features(resized)
    return feats.select(
        "media_id",
        *[F.element_at("features", i + 1).alias(f"f{i}") for i in range(4)],
    )


@register(
    "q_audio_features",
    """
    WITH a AS (
      SELECT doc_id, CAST(doc_id AS VARCHAR) AS media_id,
             n_chars % 50 + 10 AS n,
             8000 + (doc_id % 3) * 4000 AS rate,
             doc_id % 1000 - 500 AS amp
      FROM documents WHERE doc_id % 2 = 1
    )
    SELECT media_id,
           CAST(n AS INT) AS n_samples,
           CAST(rate AS INT) AS sample_rate,
           1000.0 * n / rate AS duration_ms,
           CAST(abs(amp) AS DOUBLE) AS rms,
           CAST(n - 1 AS INT) AS zero_crossings,
           CAST(n // 2 AS INT) AS dominant_bin,
           CAST(rate * (n // 2) AS DOUBLE) / n AS peak_freq_hz
    FROM a
    """,
)
def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL spectral analysis, oracle-checked bit-exactly (X56): the
    WAV fixtures are ±a square waves — ALL their spectral energy sits
    at Nyquist, so a real rFFT must report dominant_bin = n//2 for
    every clip (for odd n the Dirichlet peak's only in-range neighbor
    is (n-1)/2), zero_crossings = n-1, rms = |a| exactly (perfect
    integer square), and peak_freq_hz = rate*(n//2)/n — every column
    a closed-form integer expression both engines compute
    identically. An FFT that windowed, truncated, mis-ordered
    channels or mis-parsed RIFF chunks cannot match."""
    from bi_utils_spark.operators.multimodal import (
        audio_spectral_features,
        synthesize_test_media,
    )

    docs = load_fanout(spark, sf_dir, "documents").select("doc_id", "n_chars")
    media = synthesize_test_media(docs).filter(F.col("modality") == "audio")
    return audio_spectral_features(media)


@register(
    "q_phash_near_dup",
    """
    WITH c AS (
      SELECT doc_id % 50 AS cls, (doc_id // 50) % 3 AS tier
      FROM documents
    ),
    g AS (SELECT cls, count(*) AS n FROM c GROUP BY cls),
    e AS (SELECT cls, tier, count(*) AS n FROM c GROUP BY cls, tier)
    SELECT CAST((SELECT count(*) FROM c) AS BIGINT) AS n_images,
           CAST((SELECT count(DISTINCT cls) FROM c) AS BIGINT) AS n_classes,
           CAST((SELECT sum(n * (n - 1) // 2) FROM g) AS BIGINT)
             AS n_near_dup_pairs,
           CAST(0 AS INTEGER) AS max_hamming,
           CAST((SELECT sum(n * (n - 1) // 2) FROM e) AS BIGINT)
             AS n_exact_payload_pairs
    """,
)
def q_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-dup end to end: synthesize a
    deterministic corpus of real BMPs where id arithmetic defines
    perceptual classes (same class = same picture under a uniform
    brightness shift), aHash every image through the real decoder,
    find pairs via 4-band LSH + exact Hamming verify, and report a
    summary the oracle recomputes in closed form. The facts the
    oracle relies on are fixed properties of the synthesis (verified
    offline and in tests/test_phash.py): aHash is exactly
    brightness-invariant (pairs within a class have Hamming 0, so
    max_hamming = 0 and near-dup pairs = same-class pairs — min
    cross-class Hamming of the 50 base images is 18, far above the
    threshold of 3), and payloads are injective in (class, tier)
    (exact pairs = same-(class,tier) pairs)."""
    from bi_utils_spark.operators.phash import (
        perceptual_hashes,
        phash_near_dup_pairs,
        synthesize_phash_test_images,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    # the summary fans out over media (payload dedup, class count)
    # and hashes (pairs consume it twice via the band self-join, plus
    # n_images) — materialize each ONCE (lazy localCheckpoint, the
    # mixing.py lineage-diet pattern) so the codec mapInPandas stages
    # don't re-run per consumer (measured 6.5 -> ~2 s at sf0.1)
    media = synthesize_phash_test_images(docs).localCheckpoint(
        eager=False
    )
    hashes = perceptual_hashes(media).localCheckpoint(eager=False)
    pairs = phash_near_dup_pairs(hashes, max_hamming=3)
    n_images = hashes.agg(F.count("*").alias("n_images"))
    n_classes = media.agg(F.countDistinct("cls").alias("n_classes"))
    pair_stats = pairs.agg(
        F.count("*").alias("n_near_dup_pairs"),
        F.coalesce(F.max("hamming"), F.lit(0)).cast("int").alias("max_hamming"),
    )
    exact = (
        media.groupBy(F.sha2("payload", 256).alias("__h"))
        .agg(F.count("*").alias("__n"))
        .agg(
            F.coalesce(
                F.sum(F.col("__n") * (F.col("__n") - 1) / 2), F.lit(0)
            )
            .cast("long")
            .alias("n_exact_payload_pairs")
        )
    )
    return (
        n_images.crossJoin(F.broadcast(n_classes))
        .crossJoin(F.broadcast(pair_stats))
        .crossJoin(F.broadcast(exact))
    )


@register(
    "q_emb_simhash_pairs",
    r"""
    WITH ed AS (
      SELECT vec_id, dim - 1 AS d, CAST(x AS DOUBLE) AS xd
      FROM (SELECT vec_id, UNNEST(range(1, len(embedding)+1)) AS dim,
                   UNNEST(embedding) AS x FROM embeddings)
    ),
    alld AS (
      SELECT vec_id, d, xd FROM ed
      UNION ALL
      SELECT vec_id + 100000, d, xd + 0.01 * ((d % 3) - 1) FROM ed
    ),
    signs AS (
      SELECT b.range AS b, d.range AS d,
             CASE WHEN CAST('0x' || substr(md5('esim,' || b.range || ','
                                               || d.range), 1, 1) AS INT)
                       % 2 = 0
                  THEN 1 ELSE -1 END AS s
      FROM range(64) b, range(64) d
    ),
    proj AS (
      SELECT a.vec_id, signs.b,
             sum(signs.s * CAST(round(a.xd * 1e7) AS BIGINT)) AS p
      FROM alld a JOIN signs ON signs.d = a.d
      GROUP BY a.vec_id, signs.b
    ),
    sig AS (
      SELECT vec_id,
             CAST(sum(CASE WHEN p > 0 AND b = 0 THEN -9223372036854775808
                           WHEN p > 0 THEN CAST(1 AS BIGINT) << (63 - b)
                           ELSE 0 END) AS BIGINT) AS sig
      FROM proj GROUP BY vec_id
    ),
    sigu AS (SELECT vec_id, sig,
                    CAST(sig AS HUGEINT)
                    + CASE WHEN sig < 0
                           THEN CAST('18446744073709551616' AS HUGEINT)
                           ELSE CAST(0 AS HUGEINT) END AS u
             FROM sig),
    segs AS (
      SELECT vec_id, sig, band,
             CAST((u // CASE band WHEN 0 THEN 1 WHEN 1 THEN 65536
                                  WHEN 2 THEN 4294967296
                                  WHEN 3 THEN 281474976710656 END) % 65536
                  AS BIGINT) AS seg
      FROM sigu, (SELECT UNNEST(range(4)) AS band)
    )
    SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b,
           CAST(bit_count(xor(a.sig, b2.sig)) AS INT) AS hamming
    FROM segs a JOIN segs b2 USING (band, seg)
    WHERE a.vec_id < b2.vec_id
      AND bit_count(xor(a.sig, b2.sig)) <= 3
    """,
)
def q_emb_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding SimHash near-dup end to end: corpus ∪ deterministic
    perturbed copies (+0.01·((dim%3)−1), ids +100000), md5-derived
    hyperplane signatures, shared 4-band Hamming LSH. Every stage is
    engine-exact (fixed-point projections, parity-derived signs), so
    the oracle replays signature construction, banding and the
    Hamming verify wholesale in SQL — the angular LSH tier held to
    the same bit-exact standard as MinHash/SimHash/winnow/aHash."""
    from bi_utils_spark.operators.embsig import embedding_simhash_pairs

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    pert = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: x + F.lit(0.01) * ((i % 3) - 1)
        ).alias("embedding"),
    )
    return embedding_simhash_pairs(emb.unionByName(pert))


@register(
    "q_phash_dedup_clusters",
    """
    WITH c AS (
      SELECT CAST(doc_id AS VARCHAR) AS media_id, doc_id % 50 AS cls
      FROM documents
    )
    SELECT min(media_id) AS canonical,
           CAST(count(*) AS BIGINT) AS size
    FROM c
    GROUP BY cls
    HAVING count(*) >= 2
    ORDER BY canonical
    """,
)
def q_phash_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image dedup end to end: perceptual hashes → banded near-dup
    pairs → connected components (graph.py, same size-tiered engine
    as the text clusters) → per-cluster canonical (min id) and size.
    The oracle's ground truth is the synthesis arithmetic: clusters
    are exactly the perceptual classes with ≥ 2 members (within-class
    Hamming is 0, min cross-class Hamming is 18 — no spurious edges),
    and the component representative is the lexicographic min of the
    string media ids."""
    from bi_utils_spark.operators.graph import connected_components
    from bi_utils_spark.operators.phash import (
        perceptual_hashes,
        phash_near_dup_pairs,
        synthesize_phash_test_images,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    media = synthesize_phash_test_images(docs)
    pairs = phash_near_dup_pairs(perceptual_hashes(media), max_hamming=3)
    comps = connected_components(pairs)
    return (
        comps.groupBy("component")
        .agg(F.count("*").alias("size"))
        .select(F.col("component").alias("canonical"), "size")
        .orderBy("canonical")
    )


# ---------------------------------------------------------------------------
# X2d embedding-cosine dedup: exact keep-list is oracle-checkable; the
# IVF-celled pair variant and IVF top-k probe are approximate (rows-only;
# recall property-tested in tests/test_ivf.py).
# ---------------------------------------------------------------------------

@register(
    "q_emb_dedup_exact",
    """
    SELECT e.vec_id, e.label
    FROM embeddings e
    WHERE NOT EXISTS (
      SELECT 1 FROM embeddings a
      WHERE a.vec_id < e.vec_id
        AND round(list_cosine_similarity(a.embedding::DOUBLE[],
                                         e.embedding::DOUBLE[]), 9) >= 0.45
    )
    """,
)
def q_emb_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.dedup import embedding_dedup_exact

    emb = load(spark, sf_dir, "embeddings")
    return embedding_dedup_exact(emb, threshold=0.45).select("vec_id", "label")


def raw_emb_near_dup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw IVF-celled near-dup pair join (benched; attested by the
    oracle-backed q_emb_near_dup_ivf summary)."""
    from bi_utils_spark.operators.dedup import embedding_near_dup_pairs_ivf

    emb = load(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs_ivf(emb, threshold=0.45, num_cells=8)


@register(
    "q_emb_near_dup_ivf",
    """
    WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0)
    SELECT CAST((SELECT count(*) FROM sub) AS BIGINT) AS n_subset,
           CAST(count(*) AS BIGINT) AS n_exact_pairs,
           CAST(0 AS BIGINT) AS false_positives,
           1 AS recall_ge_080
    FROM sub a JOIN sub b ON a.vec_id < b.vec_id
     AND round(list_cosine_similarity(a.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]), 9) >= 0.45
    """,
)
def q_emb_near_dup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-bound oracle row for IVF-celled embedding near-dup:
    exact all-pairs cosine over the deterministic vec_id % 5 subset
    is ground truth DuckDB recomputes; the IVF pairs restricted to
    that subset may contain no false positive (candidates are scored
    with exact cosine) and must recall ≥ 80% of the exact pairs."""
    from bi_utils_spark.operators.dedup import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_ivf,
    )

    emb = load(spark, sf_dir, "embeddings")
    sub = emb.filter(F.col("vec_id") % 5 == 0)
    exact = embedding_near_dup_pairs(sub, threshold=0.45)
    ivf_sub = (
        embedding_near_dup_pairs_ivf(emb, threshold=0.45, num_cells=8)
        .filter((F.col("id_a") % 5 == 0) & (F.col("id_b") % 5 == 0))
    )
    n_subset = sub.agg(F.count("*").alias("n_subset"))
    return n_subset.crossJoin(
        _pair_recall_summary(exact, ivf_sub, 0.8, "recall_ge_080").withColumnRenamed(
            "n_exact", "n_exact_pairs"
        )
    )


def raw_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw IVF probe (benched; attested by the oracle-backed
    q_ivf_topk summary)."""
    from bi_utils_spark.operators.similarity import ivf_topk

    emb = load(spark, sf_dir, "embeddings")
    target = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    out = ivf_topk(emb, [float(x) for x in target], k=10, num_cells=8, nprobe=3)
    return out.select("vec_id", F.round("score", 9).alias("score"))


@register(
    "q_ivf_topk",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_corpus,
           CAST(least(10, count(*)) AS BIGINT) AS n_exact,
           1 AS recall_ge_050
    FROM embeddings
    """,
)
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-bound oracle row for the IVF top-k probe: exact top-10
    for the same query vector is computed Spark-side (one scan +
    TakeOrdered); the nprobe=3 probe must recall ≥ 50% of it (the
    recall floor that holds across all fixture scales: measured 0.5
    at sf0.001, 0.6 at sf0.01, 0.8 at sf0.1 — near-random synthetic
    embeddings scatter true neighbors across cells, the documented
    IVF weakness on unclustered data). Corpus size anchors the row
    to the data."""
    from bi_utils_spark.operators.similarity import cosine_topk, ivf_topk

    emb = load(spark, sf_dir, "embeddings")
    target = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    probe = ivf_topk(emb, target, k=10, num_cells=8, nprobe=3).select("vec_id")
    exact = cosine_topk(emb, target, k=10).select("vec_id")
    n_corpus = emb.agg(F.count("*").alias("n_corpus"))
    n_exact = exact.agg(F.count("*").alias("n_exact"))
    found = probe.join(exact, "vec_id", "left_semi").agg(
        F.count("*").alias("__found")
    )
    return (
        n_corpus.crossJoin(n_exact)
        .crossJoin(found)
        .select(
            "n_corpus",
            "n_exact",
            (
                F.col("__found").cast("double")
                >= 0.5 * F.col("n_exact").cast("double")
            )
            .cast("int")
            .alias("recall_ge_050"),
        )
    )


def _ivf_index_dir(sf_dir: str) -> str:
    """Per-SF scratch dir for the persisted index (rebuilt when the
    manifest is absent, reused otherwise — so the bench's repeat
    timings measure the PROBE path, which is what serving pays)."""
    import hashlib
    import tempfile

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    return os.path.join(
        tempfile.gettempdir(), f"bi_utils_spark_ivf_{tag}"
    )


@register(
    "q_ivf_index_topk",
    f"""
    SELECT vec_id,
           round(list_cosine_similarity(embedding::DOUBLE[], {TARGET_VEC_SQL}), 6)
             AS score
    FROM embeddings
    ORDER BY score DESC, vec_id ASC
    LIMIT 10
    """,
)
def q_ivf_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted IVF index (X107, r7): build-once parquet index
    (vectors partitioned by cell_id, centroid metadata, manifest),
    then probe. With nprobe = num_cells the probe provably equals
    the EXACT cosine top-k — that is this oracle (not a recall
    bound): a green row proves the index round-trips vectors
    losslessly and the probe arithmetic is exact. The pruned-probe
    serving path (nprobe < cells, PartitionFilters I/O) is
    plan-asserted in test_ivf and benched raw."""
    from bi_utils_spark.operators.vector_index import (
        ivf_index_probe,
        write_ivf_index,
    )

    emb = load(spark, sf_dir, "embeddings")
    target = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    path = _ivf_index_dir(sf_dir)
    write_ivf_index(emb, path, num_cells=8, iters=2)
    out = ivf_index_probe(spark, path, target, k=10, nprobe=8)
    return out.select("vec_id", F.round("score", 6).alias("score"))


def raw_ivf_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serving path alone: probe nprobe=3 of 8 cells against the
    cached persisted index (built on first call per SF) — repeat
    walls measure partition-pruned probe I/O, the per-query cost a
    vector-serving deployment pays."""
    from bi_utils_spark.operators.vector_index import (
        ivf_index_probe,
        write_ivf_index,
    )

    emb = load(spark, sf_dir, "embeddings")
    target = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    path = _ivf_index_dir(sf_dir)
    if not os.path.exists(os.path.join(path, "_MANIFEST.json")):
        write_ivf_index(emb, path, num_cells=8, iters=2)
    return ivf_index_probe(spark, path, target, k=10, nprobe=3)


@register(
    "q_ivf_batch_topk",
    """
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qv FROM embeddings
      WHERE vec_id IN (1, 7, 42, 99, 123)
    ),
    scored AS (
      SELECT q.qid, e.vec_id,
             list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[])
               AS s
      FROM embeddings e, q
    ),
    ranked AS (
      SELECT qid, vec_id, s,
             row_number() OVER (
               PARTITION BY qid ORDER BY s DESC, vec_id ASC
             ) AS rn
      FROM scored
    )
    SELECT qid, vec_id, round(s, 6) AS score FROM ranked WHERE rn <= 5
    """,
)
def q_ivf_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk probe of the persisted IVF index (X107, r8): a query
    TABLE (5 vectors) against the stored layout via
    `vector_index.ivf_index_probe_many` — assignment reuses the
    build's map-only pass, the probed-cell union partition-prunes
    the vector scan, candidates meet in an equi-join on cell_id.
    With nprobe = num_cells the batch probe EQUALS the exact
    per-query cosine top-k — that is this oracle (DuckDB replays
    the full cross scoring + per-query rank). The pruned serving
    config (nprobe=3) is benched raw and plan-asserted in
    test_ivf."""
    from bi_utils_spark.operators.vector_index import (
        ivf_index_probe_many,
        write_ivf_index,
    )

    emb = load(spark, sf_dir, "embeddings")
    path = _ivf_index_dir(sf_dir)
    if not os.path.exists(os.path.join(path, "_MANIFEST.json")):
        write_ivf_index(emb, path, num_cells=8, iters=2)
    queries = emb.where(
        F.col("vec_id").isin([1, 7, 42, 99, 123])
    ).select(F.col("vec_id").alias("qid"), "embedding")
    out = ivf_index_probe_many(
        spark, path, queries, k=5, nprobe=8, query_id_col="qid"
    )
    return out.select(
        "qid", "vec_id", F.round("score", 6).alias("score")
    )


def raw_ivf_batch_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bulk serving path alone: 5 queries × nprobe=3 of 8 cells
    against the cached persisted index — repeat walls measure the
    partition-pruned batch probe, the per-batch cost a bulk
    re-ranking job pays."""
    from bi_utils_spark.operators.vector_index import (
        ivf_index_probe_many,
        write_ivf_index,
    )

    emb = load(spark, sf_dir, "embeddings")
    path = _ivf_index_dir(sf_dir)
    if not os.path.exists(os.path.join(path, "_MANIFEST.json")):
        write_ivf_index(emb, path, num_cells=8, iters=2)
    queries = emb.where(
        F.col("vec_id").isin([1, 7, 42, 99, 123])
    ).select(F.col("vec_id").alias("qid"), "embedding")
    return ivf_index_probe_many(
        spark, path, queries, k=5, nprobe=3, query_id_col="qid"
    )


def raw_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw PQ query path (benched): train → encode (map-only) →
    codegen ADC scan → exact re-rank of the 100-row shortlist."""
    from bi_utils_spark.operators.pq import pq_encode, pq_topk, pq_train

    emb = load(spark, sf_dir, "embeddings")
    target = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    cb = pq_train(emb, num_subspaces=8, num_centroids=256, iters=5)
    codes = pq_encode(emb, cb)
    out = pq_topk(codes, cb, target, k=10, refine_with=emb, refine_factor=10)
    return out.select("vec_id", F.round("score", 9).alias("score"))


@register(
    "q_pq_topk",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_corpus,
           CAST(least(10, count(*)) AS BIGINT) AS n_exact,
           1 AS recall_ge_050
    FROM embeddings
    """,
)
def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-bound oracle row for PQ search (operators/pq.py):
    8×256 codebooks (8 B/vector — 64× compression), codegen ADC
    shortlist of 10k, exact re-rank to top-10. Measured recall@10 vs
    the exact scan: 1.0 at sf0.001/sf0.01, 0.8 at sf0.1
    (near-random synthetic embeddings are PQ's worst case — scores
    are tightly bunched); the asserted floor is 0.5."""
    from bi_utils_spark.operators.pq import pq_encode, pq_topk, pq_train
    from bi_utils_spark.operators.similarity import cosine_topk

    emb = load(spark, sf_dir, "embeddings")
    target = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    cb = pq_train(emb, num_subspaces=8, num_centroids=256, iters=5)
    codes = pq_encode(emb, cb)
    probe = pq_topk(
        codes, cb, target, k=10, refine_with=emb, refine_factor=10
    ).select("vec_id")
    exact = cosine_topk(emb, target, k=10).select("vec_id")
    n_corpus = emb.agg(F.count("*").alias("n_corpus"))
    n_exact = exact.agg(F.count("*").alias("n_exact"))
    found = probe.join(exact, "vec_id", "left_semi").agg(
        F.count("*").alias("__found")
    )
    return (
        n_corpus.crossJoin(n_exact)
        .crossJoin(found)
        .select(
            "n_corpus",
            "n_exact",
            (
                F.col("__found").cast("double")
                >= 0.5 * F.col("n_exact").cast("double")
            )
            .cast("int")
            .alias("recall_ge_050"),
        )
    )


# ---------------------------------------------------------------------------
# Headline star-schema queries, second batch — the grouped-agg / HAVING /
# top-k surface (SURVEY.md §2.4 "free in Spark … engine exposes them")
# exercised across every fixture dimension table. Determinism: money math
# accumulates in DECIMAL, surfaces as DOUBLE.
# ---------------------------------------------------------------------------

@register(
    "q_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q6 shape: pure scan-filter-agg — the pushdown showcase. All four
    # predicates reach the parquet scan (PushedFilters); ReadSchema is
    # 4 columns of 11.
    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * F.col("l_discount").cast(
        "decimal(4,2)"
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q_returned_items",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q10 shape: fact-fact join shuffles on orderkey; customer/nation
    # dims broadcast; top-20 is TakeOrderedAndProject.
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    nation = load(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= "1997-01-01")
                & (F.col("o_orderdate") < "1997-07-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q_large_orders",
    """
    WITH big AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(epoch_us(o.o_orderdate) AS BIGINT) AS o_orderdate_us,
           o.o_totalprice, big.sum_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
    LIMIT 100
    """,
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q18 shape: pre-aggregate the fact table to order grain FIRST
    # (map-side partial agg shrinks the shuffle), then HAVING prunes to
    # a tiny key set that joins orders/customer.
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("qty"))
        .filter(F.col("qty") > 250)
        .select("l_orderkey", F.col("qty").cast("double").alias("sum_qty"))
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "o_orderdate_us"
            ),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q_promo_share",
    """
    SELECT CAST(strftime(l_shipdate, '%Y-%m') AS VARCHAR) AS ship_month,
           CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                   THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
                   ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             * 100.0 AS promo_share_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
    """,
)
def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q14 shape: part is the broadcast dim; ratio of two DECIMAL sums
    # divides once in DOUBLE (deterministic cross-engine).
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            # exact DECIMAL sums; the only float ops are one divide and
            # one multiply, in this order on both engines → bit-equal
            (F.sum(promo).cast("double") / F.sum(rev).cast("double") * F.lit(100.0))
            .alias("promo_share_pct")
        )
    )


# ---------------------------------------------------------------------------
# CUBE and set operations (SURVEY.md §2.4/§2.7 "not present in
# reference … built-in") — exposed as first-class query-layer entries.
# ---------------------------------------------------------------------------

@register(
    "q_cube_flags",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("sum_price"),
    )


@register(
    "q_users_click_not_purchase",
    """
    SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date
    FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date
    FROM events WHERE event_type = 'purchase'
    """,
)
def q_users_click_not_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    # (user, day) pairs with a click but no purchase — EXCEPT is set
    # semantics (Spark: subtract), not exceptAll's multiset difference.
    events = load(spark, sf_dir, "events")
    day = F.to_date("ts").cast("string").alias("event_date")
    clicks = events.filter(F.col("event_type") == "click").select("user_id", day)
    buys = events.filter(F.col("event_type") == "purchase").select("user_id", day)
    return clicks.subtract(buys)


@register(
    "q_users_signup_and_error",
    """
    SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date
    FROM events WHERE event_type = 'signup'
    INTERSECT
    SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date
    FROM events WHERE event_type = 'error'
    """,
)
def q_users_signup_and_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    day = F.to_date("ts").cast("string").alias("event_date")
    a = events.filter(F.col("event_type") == "signup").select("user_id", day)
    b = events.filter(F.col("event_type") == "error").select("user_id", day)
    return a.intersect(b)


# ---------------------------------------------------------------------------
# X2e winnowing fingerprints — rows-only (hash function is engine-
# specific); the winnowing guarantee is property-tested in tests/.
# ---------------------------------------------------------------------------

def raw_winnow_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw winnowing pair join (benched; attested by the
    oracle-backed q_winnow_near_dup summary)."""
    from bi_utils_spark.operators.dedup import winnowing_near_dup_join

    docs = load(spark, sf_dir, "documents")
    return winnowing_near_dup_join(docs, "doc_id", "text", min_shared=3)


@register(
    "q_winnow_near_dup",
    r"""
    WITH toks AS (
      SELECT doc_id,
             regexp_split_to_array(trim(lower(text)), '\s+') AS t
      FROM documents
    ),
    g8 AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, len(t) - 7),
               i -> array_to_string(t[i:i+7], chr(1))))) AS g
      FROM toks WHERE len(t) >= 8
    ),
    guaranteed AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM g8 a JOIN g8 b ON a.g = b.g AND a.doc_id < b.doc_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_guaranteed_pairs,
           CAST(0 AS BIGINT) AS guaranteed_missed
    FROM guaranteed
    """,
)
def q_winnow_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-guarantee oracle row (MOSS, SIGMOD'03): any two
    documents sharing a run of ≥ k + window − 1 = 8 consecutive
    tokens MUST share a fingerprint. DuckDB recomputes the set of
    pairs sharing an 8-gram from raw text (ground truth); the
    winnowing join at min_shared=1 may miss none of them."""
    from bi_utils_spark.operators.dedup import winnowing_near_dup_join
    from bi_utils_spark.operators.textstats import grams, tokens

    docs = load(spark, sf_dir, "documents")
    g8 = (
        docs.select(
            F.col("doc_id"),
            F.explode(
                F.array_distinct(grams(tokens(F.col("text")), 8, sep="\x01"))
            ).alias("g"),
        )
    )
    a, b = g8.alias("a"), g8.alias("b")
    guaranteed = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    found = winnowing_near_dup_join(
        docs, "doc_id", "text", min_shared=1, k=4, window=5
    ).select("id_a", "id_b")
    n_g = guaranteed.agg(F.count("*").alias("n_guaranteed_pairs"))
    missed = guaranteed.join(found, ["id_a", "id_b"], "left_anti").agg(
        F.count("*").alias("guaranteed_missed")
    )
    return n_g.crossJoin(missed)


# ---------------------------------------------------------------------------
# GROUPING SETS (native DataFrame API) — the remaining multi-grain
# aggregation form beside rollup/cube.
# ---------------------------------------------------------------------------

@register(
    "q_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus"
    ).agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# Exact variance/stddev via DECIMAL moment sums — statistical aggregates
# with cross-engine bit-stable results (Welford-vs-naive float drift is
# sidestepped by accumulating Σx, Σx² exactly and doing the two float
# ops in a pinned order).
# ---------------------------------------------------------------------------

@register(
    "q_price_variance",
    """
    WITH m AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s2
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (s2 - s1 * s1 / n) / (n - 1) AS var_price
    FROM m
    """,
)
def q_price_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(p).cast("double").alias("s1"),
        F.sum(p * p).cast("double").alias("s2"),
    )
    return m.select(
        "l_returnflag",
        "n",
        ((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1))
        .alias("var_price"),
    )


# ---------------------------------------------------------------------------
# String function surface — regexp extraction, casing, padding, translate
# over part names (deterministic, engine-portable forms only).
# ---------------------------------------------------------------------------

@register(
    "q_string_funcs",
    """
    SELECT p_partkey,
           upper(p_brand) AS brand_up,
           substr(p_name, 1, 8) AS name_prefix,
           regexp_extract(p_brand, '[0-9]+', 0) AS brand_num,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           replace(p_type, 'PROMO', 'P_') AS type_repl,
           CAST(length(p_name) AS BIGINT) AS name_len
    FROM part
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_up"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.replace(F.col("p_type"), F.lit("PROMO"), F.lit("P_")).alias("type_repl"),
        F.length("p_name").cast("bigint").alias("name_len"),
    )


# ---------------------------------------------------------------------------
# EXISTS / anti-join subquery (TPC-H Q4 shape): orders that shipped at
# least one item in the month after ordering.
# ---------------------------------------------------------------------------

@register(
    "q_priority_with_shipment",
    """
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate
          AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def q_priority_with_shipment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    li = load(spark, sf_dir, "lineitem")
    # left-semi join is the EXISTS plan (no row multiplication)
    matched = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate"))
        & (F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


# ---------------------------------------------------------------------------
# Hypertable-style rollup grain (operators/incremental.py) — the
# continuous-aggregate SELECT; the incremental fold is property-tested
# (apply deltas == full recompute) in tests/test_incremental.py.
# ---------------------------------------------------------------------------

@register(
    "q_hourly_rollup",
    """
    SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS bucket_us,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.incremental import rollup_delta

    events = load(spark, sf_dir, "events").withColumn(
        "value", F.col("value").cast("decimal(18,6)")
    )
    r = rollup_delta(events, "ts", "1 hour", ["event_type"], sum_cols=["value"])
    return r.select(
        F.unix_micros("bucket_start").alias("bucket_us"),
        "event_type",
        "n",
        F.col("sum_value").cast("double").alias("sum_value"),
    )


@register(
    "q_hll_daily_users",
    """
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           1 AS hll_within_5pct
    FROM events
    """,
)
def q_hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch surface: per-day HLL partials unioned to a
    corpus distinct estimate. Bound-checking oracle (VERDICT r3 #2):
    exact_users is cross-engine ground truth; the union-merged
    Datasketches estimate (deterministic given the data) must land
    within 5% — pinned as an integer flag the oracle hashes."""
    events = load(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    est = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("__est")
    )
    exact = events.agg(F.countDistinct("user_id").alias("exact_users"))
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_users",
        (
            F.abs(F.col("__est") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        )
        .cast("int")
        .alias("hll_within_5pct"),
    )


# --- X5c repetition metrics (Gopher-style quality signals) ----------------

@register(
    "q_repetition_stats",
    r"""
    WITH base AS (
      SELECT doc_id,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
             string_split(text, chr(10)) AS lines
      FROM documents
    ),
    arrs AS (
      SELECT doc_id, lines,
             CASE WHEN len(toks) < 2 THEN []::VARCHAR[]
                  ELSE list_transform(generate_series(1, len(toks)-1),
                                      i -> toks[i] || ' ' || toks[i+1]) END AS g2,
             CASE WHEN len(toks) < 5 THEN []::VARCHAR[]
                  ELSE list_transform(generate_series(1, len(toks)-4),
                                      i -> array_to_string(toks[i:i+4], ' ')) END AS g5
      FROM base
    ),
    top2 AS (
      SELECT doc_id, max(cnt) AS top_cnt, sum(cnt) AS tot
      FROM (SELECT doc_id, gram, count(*) AS cnt
            FROM (SELECT doc_id, unnest(g2) AS gram FROM arrs)
            GROUP BY doc_id, gram)
      GROUP BY doc_id
    )
    SELECT a.doc_id,
           CASE WHEN len(a.lines) = 0 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct(a.lines)) AS DOUBLE)
                         / CAST(len(a.lines) AS DOUBLE) END AS dup_line_frac,
           CASE WHEN coalesce(list_aggregate(list_transform(a.lines, x -> length(x)), 'sum'), 0) = 0
                THEN 0.0
                ELSE 1.0 - CAST(list_aggregate(list_transform(list_distinct(a.lines), x -> length(x)), 'sum') AS DOUBLE)
                         / CAST(list_aggregate(list_transform(a.lines, x -> length(x)), 'sum') AS DOUBLE)
           END AS dup_line_char_frac,
           CASE WHEN len(a.g5) = 0 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct(a.g5)) AS DOUBLE)
                         / CAST(len(a.g5) AS DOUBLE) END AS dup_5gram_frac,
           CASE WHEN coalesce(t.tot, 0) = 0 THEN 0.0
                ELSE CAST(t.top_cnt AS DOUBLE) / CAST(t.tot AS DOUBLE) END AS top_2gram_frac
    FROM arrs a LEFT JOIN top2 t USING (doc_id)
    """,
)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.textstats import repetition_stats

    docs = load(spark, sf_dir, "documents")
    return repetition_stats(docs, "doc_id", "text")


# ===========================================================================
# Sequence packing (operators/packing.py): the conservation invariant —
# every doc packed exactly once, token mass preserved — is oracle-checked;
# the per-sequence FFD layout is deterministic but not SQL-expressible
# (rows-only check on the sequence-level output).
# ===========================================================================

@register(
    "q_pack_conservation",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_tokens
    FROM documents
    """,
)
def q_pack_conservation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.packing import pack_sequences

    docs = load(spark, sf_dir, "documents")
    packed = pack_sequences(docs, "doc_id", "n_chars", max_tokens=2048, num_buckets=32)
    return packed.agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("total_tokens").alias("total_tokens"),
    )


@register(
    "q_pack_sequences",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_tokens,
           CAST(count(*) FILTER (WHERE n_chars > 2048) AS BIGINT) AS n_oversize,
           CAST(0 AS BIGINT) AS n_multi_doc_overflow,
           1 AS n_seqs_ge_lower_bound,
           1 AS half_empty_bins_le_buckets
    FROM documents
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bin-packing layout attestation (VERDICT r3 #2): the FFD layout
    itself is engine-specific, but its invariants are not — the oracle
    pins (a) conservation (every doc packed once, token mass
    preserved), (b) the exact oversize count (docs above the budget
    get dedicated bins), (c) zero multi-doc bins over the budget,
    (d) n_sequences ≥ the ceil(total/budget) lower bound, and (e) the
    FFD half-full guarantee: at most one bin per bucket (32 buckets)
    can end less than half full."""
    from bi_utils_spark.operators.packing import pack_sequences

    docs = load(spark, sf_dir, "documents")
    packed = pack_sequences(docs, "doc_id", "n_chars", max_tokens=2048, num_buckets=32)
    over = F.col("total_tokens") > 2048
    agg = packed.agg(
        F.count("*").alias("__n_seqs"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("total_tokens").alias("total_tokens"),
        F.sum(over.cast("long")).alias("n_oversize"),
        F.sum(((F.col("n_docs") > 1) & over).cast("long")).alias(
            "n_multi_doc_overflow"
        ),
        F.sum(F.when(over, F.col("total_tokens")).otherwise(F.lit(0))).alias(
            "__oversize_toks"
        ),
        F.sum((F.col("total_tokens") < 1024).cast("long")).alias("__half_empty"),
    )
    return agg.select(
        "n_docs",
        "total_tokens",
        "n_oversize",
        "n_multi_doc_overflow",
        (
            F.col("__n_seqs")
            >= F.col("n_oversize")
            + F.ceil(
                (F.col("total_tokens") - F.col("__oversize_toks")) / F.lit(2048.0)
            )
        )
        .cast("int")
        .alias("n_seqs_ge_lower_bound"),
        (F.col("__half_empty") <= F.lit(32))
        .cast("int")
        .alias("half_empty_bins_le_buckets"),
    )


# ===========================================================================
# Document chunking (operators/chunking.py): overlapping token windows,
# full-row oracle — DuckDB recomputes every chunk's exact text and token
# counts from the same window math.
# ===========================================================================

@register(
    "q_chunk_documents",
    r"""
    WITH toks AS (
      SELECT doc_id,
             regexp_split_to_array(trim(lower(text)), '\s+') AS t
      FROM documents
    ),
    base AS (
      SELECT doc_id, len(t) AS n, t,
             greatest(CAST(floor((len(t) - 8 + 55) / 56.0) AS INT), 1)
               AS n_chunks
      FROM toks
    ),
    ch AS (
      SELECT doc_id, n, t, unnest(range(0, n_chunks)) AS i FROM base
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_idx,
           CAST(n AS INT) AS n_doc_tokens,
           CAST(least(n - i * 56, 64) AS INT) AS n_chunk_tokens,
           array_to_string(t[i*56+1 : i*56+64], ' ') AS chunk_text
    FROM ch
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.chunking import chunk_documents

    docs = load(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=64, overlap=8)


# ===========================================================================
# BM25 keyword search (operators/ranking.py): corpus stats in one agg
# pass, scoring map-side. Full-match-set output (tf > 0 is an integer
# property) keeps the oracle row set engine-independent; scores are
# computed with the identical expression tree on both sides.
# ===========================================================================

@register(
    "q_bm25_search",
    r"""
    WITH base AS (
      SELECT doc_id,
             len(regexp_split_to_array(trim(lower(text)), '\s+')) AS dl,
             len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                             x -> x = 'vector')) AS tf0,
             len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                             x -> x = 'merge')) AS tf1,
             len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                             x -> x = 'stream')) AS tf2
      FROM documents
    ),
    stats AS (
      SELECT count(*) AS n, avg(dl) AS avgdl,
             sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
             sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
             sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
      FROM base
    )
    SELECT doc_id,
           round(
             0.0
             + ln((CAST(n AS DOUBLE) - df0 + 0.5) / (df0 + 0.5) + 1.0)
               * CAST(tf0 AS DOUBLE) * 2.2
               / (CAST(tf0 AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))
             + ln((CAST(n AS DOUBLE) - df1 + 0.5) / (df1 + 0.5) + 1.0)
               * CAST(tf1 AS DOUBLE) * 2.2
               / (CAST(tf1 AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))
             + ln((CAST(n AS DOUBLE) - df2 + 0.5) / (df2 + 0.5) + 1.0)
               * CAST(tf2 AS DOUBLE) * 2.2
               / (CAST(tf2 AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))
           , 6) AS score
    FROM base, stats
    WHERE greatest(tf0, tf1, tf2) > 0
    """,
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.ranking import bm25_scores

    docs = load(spark, sf_dir, "documents")
    return bm25_scores(docs, ["vector", "merge", "stream"])


# ===========================================================================
# Snapshot diff (operators/snapshot.py): corpus-version audit —
# old = documents minus ids ≡ 0 (mod 7); new = documents minus ids
# ≡ 0 (mod 5), with text rewritten for ids ≡ 0 (mod 11). The oracle
# replays the same synthetic snapshots and classifies with null-safe
# value comparison (the operator's hash is injective over values).
# ===========================================================================

@register(
    "q_snapshot_diff",
    r"""
    WITH old AS (
      SELECT doc_id, text, lang FROM documents WHERE doc_id % 7 != 0
    ),
    new AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 0 THEN upper(text) ELSE text END AS text,
             lang
      FROM documents WHERE doc_id % 5 != 0
    )
    SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
           CASE WHEN old.doc_id IS NULL THEN 'added'
                WHEN new.doc_id IS NULL THEN 'removed'
                WHEN (old.text IS DISTINCT FROM new.text)
                  OR (old.lang IS DISTINCT FROM new.lang) THEN 'changed'
                ELSE 'unchanged' END AS change
    FROM old FULL OUTER JOIN new USING (doc_id)
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot audit: added/removed/changed/unchanged per
    doc_id between two deterministic synthetic versions of the
    documents table (mod-7 deletions vs mod-5 deletions with mod-11
    text rewrites). The operator compares via the injective
    content_hash; the oracle compares raw values null-safely — equal
    classifications prove the hash identity faithful."""
    from bi_utils_spark.operators.snapshot import snapshot_diff

    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    old = docs.filter(F.col("doc_id") % 7 != 0)
    new = docs.filter(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 11 == 0, F.upper("text")).otherwise(
            F.col("text")
        ),
    )
    return snapshot_diff(old, new, ["doc_id"])


# ===========================================================================
# Bitext mining (operators/bitext.py): margin-scored parallel-pair
# candidates between two embedding spaces (label parity splits the
# test table into the two "languages"). The oracle replays both kNN
# directions, the integer neighborhood masses, the exact margin
# ratio, and the mutual-best flag.
# ===========================================================================

@register(
    "q_bitext_mine",
    r"""
    WITH src AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
                 WHERE label % 2 = 0),
    tgt AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            WHERE label % 2 = 1),
    fwd AS (
      SELECT s.vec_id AS sid, t.vec_id AS tid,
             round(list_cosine_similarity(s.v, t.v), 9) AS score,
             row_number() OVER (
               PARTITION BY s.vec_id
               ORDER BY round(list_cosine_similarity(s.v, t.v), 9) DESC,
                        t.vec_id) AS rank
      FROM src s, tgt t
    ),
    bwd AS (
      SELECT t.vec_id AS tid, s.vec_id AS sid,
             round(list_cosine_similarity(t.v, s.v), 9) AS score,
             row_number() OVER (
               PARTITION BY t.vec_id
               ORDER BY round(list_cosine_similarity(t.v, s.v), 9) DESC,
                        s.vec_id) AS rank
      FROM tgt t, src s
    ),
    fk AS (SELECT * FROM fwd WHERE rank <= 4),
    bk AS (SELECT * FROM bwd WHERE rank <= 4),
    fmass AS (SELECT sid, sum(CAST(round(score * 1e9) AS BIGINT)) AS fq,
                     count(*) AS fn
              FROM fk GROUP BY sid),
    bmass AS (SELECT tid, sum(CAST(round(score * 1e9) AS BIGINT)) AS bq,
                     count(*) AS bn
              FROM bk GROUP BY tid),
    mutual AS (
      SELECT f.sid, f.tid FROM fk f JOIN bk b USING (sid, tid)
      WHERE f.rank = 1 AND b.rank = 1
    )
    SELECT fk.sid AS src_id, fk.tid AS tgt_id, fk.score,
           CASE WHEN fmass.fq * bmass.bn + bmass.bq * fmass.fn > 0
                THEN CAST(2 * CAST(round(fk.score * 1e9) AS BIGINT)
                            * fmass.fn * bmass.bn AS DOUBLE)
                     / CAST(fmass.fq * bmass.bn + bmass.bq * fmass.fn
                            AS DOUBLE)
                ELSE NULL END AS margin,
           (mutual.sid IS NOT NULL) AS mutual_best
    FROM fk
    JOIN fmass USING (sid) JOIN bmass USING (tid)
    LEFT JOIN mutual ON mutual.sid = fk.sid AND mutual.tid = fk.tid
    """,
)
def q_bitext_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk ratio margin)
    between the two label-parity halves of the embeddings table:
    forward/backward exact kNN (k=4), BIGINT neighborhood masses, one
    exact integer-ratio margin per candidate pair, mutual-best flag.
    Every number replays in SQL — the whole mining pipeline is
    hash-exact, not a recall bound."""
    from bi_utils_spark.operators.bitext import mine_bitext

    emb = load(spark, sf_dir, "embeddings")
    # the test table is one small file (1 input split); the quadratic
    # scoring needs explicit fan-out to use the cluster — at real
    # scale the corpus arrives already partitioned
    par = spark.sparkContext.defaultParallelism
    src = emb.filter(F.col("label") % 2 == 0).repartition(par)
    tgt = emb.filter(F.col("label") % 2 == 1).repartition(par)
    return mine_bitext(src, tgt, k=4)


@register(
    "q_bitext_mine_blocked",
    r"""
    WITH src AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
                 WHERE label % 2 = 0),
    tgt AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            WHERE label % 2 = 1),
    fwd AS (
      SELECT s.vec_id AS sid, t.vec_id AS tid,
             row_number() OVER (
               PARTITION BY s.vec_id
               ORDER BY round(list_cosine_similarity(s.v, t.v), 9) DESC,
                        t.vec_id) AS rank
      FROM src s, tgt t
    ),
    fk AS (SELECT * FROM fwd WHERE rank <= 4)
    SELECT CAST((SELECT count(*) FROM src) AS BIGINT) AS n_src,
           CAST((SELECT count(*) FROM fk) AS BIGINT) AS n_pairs,
           CAST(0 AS BIGINT) AS only_blocked,
           CAST(0 AS BIGINT) AS only_exact,
           TRUE AS margins_within_tol
    """,
)
def q_bitext_mine_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitext mining through the SCALE kNN primitive
    (similarity.knn_join_blocked: per-partition numpy top-k, shuffle
    shrinks from |src|·|tgt| to |src|·k·partitions, no broadcast-
    nested-loop legs) — attested equivalent to the exact form, the
    substitution-invariance mine_bitext's contract claims (bitext.py):
    the Spark side runs BOTH forms and reports pair-set symmetric
    difference (must be 0/0) and margin agreement within 1e-6; the
    oracle independently recomputes the expected pair count from the
    exact SQL replay. This is the 10⁸+-rows-per-side configuration —
    see SCALE.md (bitext entry)."""
    from bi_utils_spark.operators.bitext import mine_bitext
    from bi_utils_spark.operators.similarity import knn_join_blocked

    emb = load(spark, sf_dir, "embeddings")
    par = spark.sparkContext.defaultParallelism
    src = emb.filter(F.col("label") % 2 == 0).repartition(par)
    tgt = emb.filter(F.col("label") % 2 == 1).repartition(par)
    blocked = mine_bitext(src, tgt, k=4, knn=knn_join_blocked).select(
        "src_id", "tgt_id", F.col("margin").alias("__mb"), F.lit(True).alias("__b")
    )
    exact = mine_bitext(src, tgt, k=4).select(
        "src_id", "tgt_id", F.col("margin").alias("__me"), F.lit(True).alias("__e")
    )
    cmp = blocked.join(exact, ["src_id", "tgt_id"], "full_outer")
    both = F.col("__b").isNotNull() & F.col("__e").isNotNull()
    agree = (
        (F.col("__mb").isNull() & F.col("__me").isNull())
        | (F.abs(F.col("__mb") - F.col("__me")) < 1e-6)
    )
    summary = cmp.agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.col("__e").isNull().cast("bigint")).alias("only_blocked"),
        F.sum(F.col("__b").isNull().cast("bigint")).alias("only_exact"),
        F.coalesce(
            F.every(F.when(both, agree)), F.lit(True)
        ).alias("margins_within_tol"),
    )
    n_src = src.agg(F.count("*").alias("n_src"))
    return summary.crossJoin(n_src).select(
        "n_src", "n_pairs", "only_blocked", "only_exact", "margins_within_tol"
    )


# ===========================================================================
# Hybrid retrieval (operators/retrieval.py): BM25 + dense-cosine legs
# fused by Reciprocal Rank Fusion — the standard RAG first stage.
# Both legs are TakeOrdered(depth); fusion operates on <= 2·depth
# rows; the oracle replays ranks and the fixed-point RRF sum in SQL.
# ===========================================================================

@register(
    "q_hybrid_search",
    r"""
    WITH base AS (
      SELECT doc_id,
             len(regexp_split_to_array(trim(lower(text)), '\s+')) AS dl,
             len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                             x -> x = 'vector')) AS tf0,
             len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                             x -> x = 'merge')) AS tf1,
             len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                             x -> x = 'stream')) AS tf2
      FROM documents
    ),
    stats AS (
      SELECT count(*) AS n, avg(dl) AS avgdl,
             sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
             sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
             sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
      FROM base
    ),
    bm25 AS (
      SELECT doc_id,
             round(
               0.0
               + ln((CAST(n AS DOUBLE) - df0 + 0.5) / (df0 + 0.5) + 1.0)
                 * CAST(tf0 AS DOUBLE) * 2.2
                 / (CAST(tf0 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))
               + ln((CAST(n AS DOUBLE) - df1 + 0.5) / (df1 + 0.5) + 1.0)
                 * CAST(tf1 AS DOUBLE) * 2.2
                 / (CAST(tf1 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))
               + ln((CAST(n AS DOUBLE) - df2 + 0.5) / (df2 + 0.5) + 1.0)
                 * CAST(tf2 AS DOUBLE) * 2.2
                 / (CAST(tf2 AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))
             , 6) AS score
      FROM base, stats
      WHERE greatest(tf0, tf1, tf2) > 0
    ),
    bm25_r AS (
      SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rank
      FROM bm25 ORDER BY score DESC, doc_id LIMIT 50
    ),
    dense AS (
      SELECT vec_id AS doc_id,
             round(list_cosine_similarity(embedding::DOUBLE[],
               (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 9)
               AS score
      FROM embeddings
    ),
    dense_r AS (
      SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rank
      FROM dense ORDER BY score DESC, doc_id LIMIT 50
    ),
    contrib AS (
      SELECT doc_id, 'bm25' AS leg, rank,
             CAST(round(1e7 / (60 + rank)) AS BIGINT) AS q FROM bm25_r
      UNION ALL
      SELECT doc_id, 'dense' AS leg, rank,
             CAST(round(1e7 / (60 + rank)) AS BIGINT) AS q FROM dense_r
    ),
    fused AS (
      SELECT doc_id,
             CAST(sum(q) AS DOUBLE) / 1e7 AS rrf_score,
             CAST(max(CASE WHEN leg = 'bm25' THEN rank END) AS INTEGER) AS bm25_rank,
             CAST(max(CASE WHEN leg = 'dense' THEN rank END) AS INTEGER) AS dense_rank
      FROM contrib GROUP BY doc_id
    )
    SELECT * FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10
    """,
)
def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid RAG retrieval end to end: BM25 over the documents table
    and exact cosine against a query embedding over the embeddings
    table (same id space), each cut to its top-50, fused by RRF
    (k0=60, 1e-7 fixed-point contributions) into the final top-10.
    Every stage past the two corpus scans operates on ≤ 100 rows; the
    oracle replays both rankings and the fusion arithmetic in SQL."""
    from bi_utils_spark.operators.ranking import bm25_scores
    from bi_utils_spark.operators.retrieval import hybrid_topk
    from bi_utils_spark.operators.similarity import cosine

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    target = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    qv = F.array(*[F.lit(float(x)) for x in target])
    dense = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.round(cosine(F.col("embedding"), qv), 9).alias("score"),
    )
    lex = bm25_scores(docs, ["vector", "merge", "stream"])
    return hybrid_topk({"bm25": lex, "dense": dense}, k=10, depth=50)


# ===========================================================================
# Stratified sampling (operators/splits.py): per-stratum md5-threshold
# keep fractions — corpus balancing (downsample the dominant language,
# keep rare strata whole). md5 is identical across engines, so the
# exact kept row set is oracle-checkable.
# ===========================================================================

@register(
    "q_stratified_sample",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR) || chr(31) || lang || 'sample'),
                    1, 16)
          < CASE lang WHEN 'en' THEN '8000000000000000'
                      WHEN 'zh' THEN 'ccccccccccccd000'
                      ELSE 'ffffffffffffffff' END
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.splits import stratified_sample

    docs = load(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "doc_id", "lang", {"en": 0.5, "zh": 0.8}, default_fraction=1.0
    ).select("doc_id", "lang")


# ===========================================================================
# Unigram LM quality scoring (operators/lm.py): avg token log-prob under
# a corpus unigram model — per-token log-probs quantized to fixed point
# before summing so the oracle hash-matches exactly.
# ===========================================================================

@register(
    "q_unigram_logprob",
    r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      FROM documents
    ),
    model AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
    consts AS (SELECT sum(c) AS total, count(*) AS v FROM model),
    scored AS (
      SELECT t.doc_id,
             CAST(round(ln((CAST(m.c AS DOUBLE) + 1.0)
                           / CAST(total + v AS DOUBLE)) * 1e7) AS BIGINT) AS q
      FROM toks t JOIN model m USING (term), consts
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           (CAST(sum(q) AS DOUBLE) / 1e7) / count(*) AS avg_logprob
    FROM scored GROUP BY doc_id
    """,
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.lm import unigram_logprob_scores

    docs = load(spark, sf_dir, "documents")
    return unigram_logprob_scores(docs)


# ===========================================================================
# OOV-rate / vocabulary-coverage scoring (operators/lm.py): fraction of
# each doc's tokens outside the corpus top-200 vocabulary. Vocabulary is
# deterministic (count desc, term asc), so the exact per-doc rates are
# oracle-checkable.
# ===========================================================================

@register(
    "q_oov_rate",
    r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      FROM documents
    ),
    model AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
    vocab AS (SELECT term FROM model ORDER BY c DESC, term ASC LIMIT 200)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS oov_rate
    FROM toks t LEFT JOIN vocab v USING (term)
    GROUP BY t.doc_id
    """,
)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.lm import oov_rate, top_vocab, unigram_model

    docs = load(spark, sf_dir, "documents")
    vocab = top_vocab(unigram_model(docs), 200)
    return oov_rate(docs, vocab)


# ===========================================================================
# Benchmark decontamination (operators/decontam.py): GPT-3-style n-gram
# overlap against a held-out eval set, plus Lee-et-al duplicated-span
# diagnostics. Benchmark split for the fixture: doc_id % 10 == 0 plays
# the eval suite; the rest is the training corpus. n-grams here are
# 64-bit xxhash64 of the space-joined token window — counts equal the
# oracle's string-n-gram counts (tokens contain no whitespace).
# ===========================================================================

_DECONTAM_CTE = r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS a
      FROM documents
    ),
    ng AS (
      SELECT DISTINCT doc_id,
             unnest([array_to_string(a[i:i+4], ' ')
                     for i in range(1, len(a) - 3)]) AS ng
      FROM t WHERE len(a) >= 5
    ),
    bench AS (SELECT DISTINCT ng FROM ng WHERE doc_id % 10 = 0),
    corpus AS (SELECT * FROM ng WHERE doc_id % 10 <> 0)
"""


@register(
    "q_contamination",
    _DECONTAM_CTE
    + """
    SELECT c.doc_id,
           CAST(count(b.ng) AS BIGINT) AS n_shared,
           CAST(count(*) AS BIGINT) AS n_ngrams,
           CAST(count(b.ng) AS DOUBLE) / count(*) AS contamination
    FROM corpus c LEFT JOIN bench b USING (ng)
    GROUP BY c.doc_id
    HAVING count(b.ng) > 0
    """,
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.decontam import contamination_report

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    return contamination_report(corpus, bench, "doc_id", "text", n=5).filter(
        F.col("n_shared") > 0
    )


@register(
    "q_decontaminate",
    _DECONTAM_CTE
    + """
    SELECT d.doc_id, d.lang, d.source
    FROM documents d
    WHERE d.doc_id % 10 <> 0
      AND d.doc_id NOT IN (
        SELECT c.doc_id FROM corpus c JOIN bench b USING (ng)
        GROUP BY c.doc_id HAVING count(*) > 3
      )
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.decontam import decontaminate

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    return decontaminate(corpus, bench, "doc_id", "text", n=5, max_shared=3).select(
        "doc_id", "lang", "source"
    )


# ===========================================================================
# Score-quantile filtering (operators/filtering.py): keep the top half
# of the corpus by quality score, with exact SQL percent_rank semantics
# (ties share a rank) — computed over DISTINCT scores, never a global
# row sort. Oracle = DuckDB's percent_rank over the same quality CTE.
# ===========================================================================

@register(
    "q_quality_tophalf",
    r"""
    WITH t AS (
      SELECT doc_id, text,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 20 THEN 1.0 ELSE 0.0 END AS length_ok,
             CASE WHEN (CASE WHEN length(text) = 0 THEN 0.0
                   ELSE CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
                        AS DOUBLE) / length(text) END) <= 0.2
                  THEN 1.0 ELSE 0.0 END AS punct_ok,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE CAST(len(list_filter(toks,
                        x -> list_contains(['the','and','of','to','a','is'], x)))
                       AS DOUBLE) / len(toks) END AS sw
      FROM t
    ),
    q AS (
      SELECT doc_id,
             (length_ok + punct_ok + least(sw * 5.0, 1.0)) / 3.0 AS quality
      FROM m
    )
    SELECT doc_id, quality, pr
    FROM (SELECT doc_id, quality,
                 percent_rank() OVER (ORDER BY quality) AS pr
          FROM q)
    WHERE pr >= 0.5
    """,
)
def q_quality_tophalf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.filtering import attach_percent_rank
    from bi_utils_spark.operators.textstats import quality_score

    docs = load(spark, sf_dir, "documents")
    scored = docs.select("doc_id", quality_score("text").alias("quality"))
    ranked = attach_percent_rank(scored, "quality", "pr")
    return ranked.filter(F.col("pr") >= 0.5).select("doc_id", "quality", "pr")


@register(
    "q_remove_dup_spans",
    r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS a
      FROM documents
    ),
    tok AS (
      SELECT doc_id, unnest(a) AS tok, unnest(range(1, len(a) + 1)) AS pos
      FROM t
    ),
    ng AS (
      SELECT doc_id,
             unnest([array_to_string(a[i:i+7], ' ')
                     for i in range(1, len(a) - 6)]) AS ng,
             unnest(range(1, len(a) - 6)) AS pos
      FROM t WHERE len(a) >= 8
    ),
    freq AS (SELECT ng, count(DISTINCT doc_id) AS ddf FROM ng GROUP BY ng),
    dupstart AS (
      SELECT doc_id, pos,
             CASE WHEN ddf >= 2 THEN 1 ELSE 0 END AS dup
      FROM ng JOIN freq USING (ng)
    ),
    cov AS (
      SELECT tok.doc_id, tok.pos, tok.tok,
             max(coalesce(d.dup, 0)) OVER (
               PARTITION BY tok.doc_id ORDER BY tok.pos
               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS covered
      FROM tok LEFT JOIN dupstart d
        ON tok.doc_id = d.doc_id AND tok.pos = d.pos
    )
    SELECT doc_id,
           coalesce(array_to_string(
             list(tok ORDER BY pos) FILTER (WHERE covered = 0), ' '), '')
             AS text_deduped,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(covered) AS BIGINT) AS n_removed
    FROM cov
    GROUP BY doc_id
    """,
)
def q_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.decontam import remove_duplicated_spans

    docs = load(spark, sf_dir, "documents")
    return remove_duplicated_spans(docs, "doc_id", "text", k=8)


@register(
    "q_boilerplate_grams",
    r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS a
      FROM documents
    ),
    ng AS (
      SELECT DISTINCT doc_id,
             unnest([array_to_string(a[i:i+4], ' ')
                     for i in range(1, len(a) - 3)]) AS gram
      FROM t WHERE len(a) >= 5
    )
    SELECT gram, CAST(count(*) AS BIGINT) AS n_docs
    FROM ng
    GROUP BY gram
    HAVING count(*) >= 2
    ORDER BY n_docs DESC, gram ASC
    LIMIT 20
    """,
)
def q_boilerplate_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.decontam import top_duplicated_grams

    docs = load(spark, sf_dir, "documents")
    return top_duplicated_grams(docs, "doc_id", "text", k=5, top=20)


@register(
    "q_dup_spans",
    r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS a
      FROM documents
    ),
    ng AS (
      SELECT doc_id,
             unnest([array_to_string(a[i:i+7], ' ')
                     for i in range(1, len(a) - 6)]) AS ng
      FROM t WHERE len(a) >= 8
    ),
    freq AS (SELECT ng, count(DISTINCT doc_id) AS ddf FROM ng GROUP BY ng)
    SELECT ng.doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN ddf >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_spans,
           CAST(sum(CASE WHEN ddf >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS dup_frac
    FROM ng JOIN freq USING (ng)
    GROUP BY ng.doc_id
    """,
)
def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.decontam import duplicated_span_stats

    docs = load(spark, sf_dir, "documents")
    return duplicated_span_stats(docs, "doc_id", "text", k=8)


# ===========================================================================
# DSIR-style importance weighting + resampling (operators/importance.py):
# hashed unigram+bigram features (md5 → 4096 buckets, engine-portable),
# add-one-smoothed target/raw bucket distributions (target = lang='en'
# docs, raw = whole corpus), per-doc Σ log-ratio weights, Gumbel-top-k
# selection. Every number is fixed-point-quantized, so the full DSIR
# pipeline is oracle-checkable end to end.
# ===========================================================================

_DSIR_CTE = r"""
    WITH t AS (
      SELECT doc_id, lang,
             regexp_split_to_array(trim(lower(text)), '\s+') AS a
      FROM documents
    ),
    fb AS (
      SELECT doc_id, lang,
             CAST('0x' || substr(md5(feat), 1, 13) AS BIGINT) % 4096 AS bucket
      FROM (SELECT doc_id, lang,
                   unnest(CASE WHEN len(a) <= 1 THEN a
                          ELSE a || list_transform(
                                 generate_series(1, len(a) - 1),
                                 i -> a[i] || ' ' || a[i+1]) END) AS feat
            FROM t)
    ),
    tc AS (SELECT bucket, count(*) AS ct FROM fb WHERE lang = 'en'
           GROUP BY bucket),
    rc AS (SELECT bucket, count(*) AS cr FROM fb GROUP BY bucket),
    buckets AS (SELECT range AS bucket FROM range(4096)),
    j AS (SELECT b.bucket, coalesce(tc.ct, 0) AS ct, coalesce(rc.cr, 0) AS cr
          FROM buckets b LEFT JOIN tc USING (bucket)
                         LEFT JOIN rc USING (bucket)),
    consts AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM j),
    lr AS (SELECT bucket,
                  CAST(round(ln((CAST(ct + 1 AS DOUBLE) / CAST(tt + 4096 AS DOUBLE))
                              / (CAST(cr + 1 AS DOUBLE) / CAST(tr + 4096 AS DOUBLE)))
                             * 1e7) AS BIGINT) AS lr_q
           FROM j, consts),
    w AS (SELECT fb.doc_id,
                 CAST(count(*) AS BIGINT) AS n_feats,
                 CAST(sum(lr.lr_q) AS DOUBLE) / 1e7 AS weight
          FROM fb JOIN lr USING (bucket)
          GROUP BY fb.doc_id)
"""


@register(
    "q_importance_weights",
    _DSIR_CTE + "SELECT doc_id, n_feats, weight FROM w",
)
def q_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.importance import (
        bucket_logratio_labeled,
        importance_weights,
    )

    docs = load_fanout(spark, sf_dir, "documents")
    lr = bucket_logratio_labeled(docs, F.col("lang") == "en")
    return importance_weights(docs, lr)


@register(
    "q_importance_sample",
    _DSIR_CTE
    + r"""
    SELECT doc_id, n_feats, weight,
           CAST(round((weight + -ln(-ln(
                 (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'gumbel'),
                                      1, 13) AS BIGINT) + 0.5)
                 / 4503599627370496.0))) * 1e7) AS BIGINT) AS key_q
    FROM w
    ORDER BY key_q DESC, doc_id ASC
    LIMIT 100
    """,
)
def q_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.importance import (
        bucket_logratio_labeled,
        importance_resample,
        importance_weights,
    )

    docs = load_fanout(spark, sf_dir, "documents")
    lr = bucket_logratio_labeled(docs, F.col("lang") == "en")
    return importance_resample(importance_weights(docs, lr), k=100)


# ===========================================================================
# fastText-style hashed linear classifier (operators/classifier.py):
# NB-log-odds weights over the same md5 bucket space as DSIR, class-prior
# log-odds, map-only scoring, confusion-matrix eval. pos = lang='en',
# neg = everything else — a stand-in for "curated vs crawl".
# ===========================================================================

_NB_CTE = r"""
    WITH t AS (
      SELECT doc_id, lang,
             regexp_split_to_array(trim(lower(text)), '\s+') AS a
      FROM documents
    ),
    fb AS (
      SELECT doc_id, lang,
             CAST('0x' || substr(md5(feat), 1, 13) AS BIGINT) % 4096 AS bucket
      FROM (SELECT doc_id, lang,
                   unnest(CASE WHEN len(a) <= 1 THEN a
                          ELSE a || list_transform(
                                 generate_series(1, len(a) - 1),
                                 i -> a[i] || ' ' || a[i+1]) END) AS feat
            FROM t)
    ),
    tc AS (SELECT bucket, count(*) AS ct FROM fb WHERE lang = 'en'
           GROUP BY bucket),
    rc AS (SELECT bucket, count(*) AS cr FROM fb WHERE lang <> 'en'
           GROUP BY bucket),
    buckets AS (SELECT range AS bucket FROM range(4096)),
    j AS (SELECT b.bucket, coalesce(tc.ct, 0) AS ct, coalesce(rc.cr, 0) AS cr
          FROM buckets b LEFT JOIN tc USING (bucket)
                         LEFT JOIN rc USING (bucket)),
    consts AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM j),
    lr AS (SELECT bucket,
                  CAST(round(ln((CAST(ct + 1 AS DOUBLE) / CAST(tt + 4096 AS DOUBLE))
                              / (CAST(cr + 1 AS DOUBLE) / CAST(tr + 4096 AS DOUBLE)))
                             * 1e7) AS BIGINT) AS lr_q
           FROM j, consts),
    prior AS (SELECT CAST(round(ln(
                   CAST(count(*) FILTER (WHERE lang = 'en') AS DOUBLE)
                   / CAST(count(*) FILTER (WHERE lang <> 'en') AS DOUBLE)) * 1e7)
                 AS BIGINT) AS prior_q
              FROM documents),
    w AS (SELECT fb.doc_id,
                 CAST(count(*) AS BIGINT) AS n_feats,
                 CAST(sum(lr.lr_q) AS BIGINT) AS wq
          FROM fb JOIN lr USING (bucket)
          GROUP BY fb.doc_id),
    scored AS (SELECT w.doc_id, w.n_feats,
                      CAST(w.wq + prior.prior_q AS DOUBLE) / 1e7 AS logit,
                      (w.wq + prior.prior_q) > 0 AS label
               FROM w, prior)
"""


@register(
    "q_nb_classifier",
    _NB_CTE + "SELECT doc_id, n_feats, logit, label FROM scored",
)
def q_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised quality-classifier scoring: NB log-odds weights fit
    on lang='en' (positive) vs the rest (negative), every document
    scored map-only against the broadcast 4096-row weight table plus
    the class-prior log-odds. Exact fixed-point logits, so the whole
    train-and-apply pipeline hash-matches the oracle."""
    from bi_utils_spark.operators.classifier import (
        class_prior,
        classifier_scores,
        fit_nb_weights_labeled,
    )

    docs = load_fanout(spark, sf_dir, "documents")
    pos = docs.filter(F.col("lang") == "en")
    neg = docs.filter(F.col("lang") != "en")
    w = fit_nb_weights_labeled(docs, F.col("lang") == "en")
    # join-based scoring: the one-shot fit+score fuses into a single
    # job; the inline literal-weight form pays an eager fit collect +
    # plan-compile (~+1.5 s/query at sf0.1) and belongs to the
    # fit-once-score-many / streaming path
    return classifier_scores(docs, w, prior=class_prior(pos, neg))


@register(
    "q_nb_classifier_eval",
    _NB_CTE
    + r"""
    SELECT CAST(sum(CASE WHEN d.lang = 'en' AND s.label THEN 1 ELSE 0 END)
                AS BIGINT) AS tp,
           CAST(sum(CASE WHEN d.lang <> 'en' AND s.label THEN 1 ELSE 0 END)
                AS BIGINT) AS fp,
           CAST(sum(CASE WHEN d.lang = 'en' AND NOT s.label THEN 1 ELSE 0 END)
                AS BIGINT) AS fn,
           CAST(sum(CASE WHEN d.lang <> 'en' AND NOT s.label THEN 1 ELSE 0 END)
                AS BIGINT) AS tn,
           CAST(sum(CASE WHEN (d.lang = 'en') = s.label THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS accuracy
    FROM scored s JOIN documents d USING (doc_id)
    """,
)
def q_nb_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the NB classifier against the true language
    labels — the held-out-evaluation step of the quality-filter loop
    (here evaluated in-sample; the split machinery is splits.py's).
    One scoring pass + one aggregate."""
    from bi_utils_spark.operators.classifier import (
        class_prior,
        classifier_confusion,
        classifier_scores,
        fit_nb_weights_labeled,
    )

    docs = load_fanout(spark, sf_dir, "documents")
    pos = docs.filter(F.col("lang") == "en")
    neg = docs.filter(F.col("lang") != "en")
    w = fit_nb_weights_labeled(docs, F.col("lang") == "en")
    scored = classifier_scores(docs, w, prior=class_prior(pos, neg))
    truth = docs.select("doc_id", (F.col("lang") == "en").alias("__truth"))
    return classifier_confusion(scored.join(truth, "doc_id"), "__truth")


# ===========================================================================
# Zipf diagnostics (operators/lm.py): term rank table and head coverage —
# sizes tokenizer vocabularies from the model table, never the stream.
# ===========================================================================

_MODEL_CTE = r"""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      FROM documents
    ),
    model AS (SELECT term, count(*) AS c FROM toks GROUP BY term)
"""


@register(
    "q_zipf_topk",
    _MODEL_CTE
    + r"""
    , r AS (SELECT term, c,
                   row_number() OVER (ORDER BY c DESC, term ASC) AS rk
            FROM model)
    SELECT term, CAST(c AS BIGINT) AS c, CAST(rk AS INTEGER) AS rank
    FROM r WHERE rk <= 50
    """,
)
def q_zipf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.lm import term_ranks, unigram_model

    docs = load(spark, sf_dir, "documents")
    return term_ranks(unigram_model(docs)).filter(F.col("rank") <= 50)


@register(
    "q_head_coverage",
    _MODEL_CTE
    + r"""
    , head AS (SELECT c FROM model ORDER BY c DESC, term ASC LIMIT 100)
    SELECT 100 AS k,
           CAST((SELECT sum(c) FROM head) AS BIGINT) AS head_tokens,
           CAST((SELECT sum(c) FROM model) AS BIGINT) AS total_tokens,
           CAST((SELECT sum(c) FROM head) AS DOUBLE)
             / CAST((SELECT sum(c) FROM model) AS DOUBLE) AS coverage
    """,
)
def q_head_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.lm import head_coverage, unigram_model

    docs = load(spark, sf_dir, "documents")
    return head_coverage(unigram_model(docs), 100)


# ===========================================================================
# Semantic decontamination (operators/decontam.py): embedding-tier
# benchmark overlap — catches paraphrased eval items the n-gram tier
# misses. Benchmark = vec_id % 10 == 0 plays the eval suite (same
# fixture convention as q_contamination).
# ===========================================================================

@register(
    "q_semantic_contamination",
    """
    SELECT c.vec_id AS corpus_id, b.vec_id AS bench_id,
           round(list_cosine_similarity(c.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]), 9) AS score
    FROM embeddings c, embeddings b
    WHERE c.vec_id % 10 != 0 AND b.vec_id % 10 = 0
      AND round(list_cosine_similarity(c.embedding::DOUBLE[],
                                       b.embedding::DOUBLE[]), 9) >= 0.45
    """,
)
def q_semantic_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.decontam import semantic_contamination_pairs

    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    bench = emb.filter(F.col("vec_id") % 10 == 0)
    return semantic_contamination_pairs(corpus, bench, threshold=0.45)


@register(
    "q_semantic_decontam",
    """
    SELECT c.vec_id, c.label FROM embeddings c
    WHERE c.vec_id % 10 != 0 AND NOT EXISTS (
      SELECT 1 FROM embeddings b
      WHERE b.vec_id % 10 = 0
        AND round(list_cosine_similarity(c.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]), 9) >= 0.45)
    """,
)
def q_semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.decontam import semantic_decontaminate

    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    bench = emb.filter(F.col("vec_id") % 10 == 0)
    return semantic_decontaminate(corpus, bench, threshold=0.45).select(
        "vec_id", "label"
    )


# ===========================================================================
# Interpolated bigram LM scoring (operators/lm.py): CCNet-style
# perplexity one order deeper than unigram — p(w2|w1) = λ·MLE +
# (1−λ)·add-one-unigram backoff. λ literal is written as (1.0 - 0.7)
# on the SQL side so both engines compute the identical double.
# ===========================================================================

@register(
    "q_bigram_logprob",
    r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS a
      FROM documents
    ),
    um AS (SELECT term, count(*) AS c
           FROM (SELECT unnest(a) AS term FROM t) GROUP BY term),
    uc AS (SELECT sum(c) AS total, count(*) AS v FROM um),
    bp AS (SELECT doc_id, a[i] AS w1, a[i+1] AS w2
           FROM t, unnest(generate_series(1, len(a) - 1)) AS u(i)
           WHERE len(a) >= 2),
    bm AS (SELECT w1, w2, count(*) AS c12 FROM bp GROUP BY w1, w2),
    cx AS (SELECT w1, sum(c12) AS c1 FROM bm GROUP BY w1),
    scored AS (
      SELECT bp.doc_id,
             CAST(round(ln(0.7 * (CAST(bm.c12 AS DOUBLE) / CAST(cx.c1 AS DOUBLE))
                           + (1.0 - 0.7) * ((CAST(um.c AS DOUBLE) + 1.0)
                                            / CAST(total + v AS DOUBLE)))
                        * 1e7) AS BIGINT) AS q
      FROM bp JOIN bm USING (w1, w2) JOIN cx USING (w1)
              JOIN um ON um.term = bp.w2, uc
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           (CAST(sum(q) AS DOUBLE) / 1e7) / count(*) AS avg_logprob
    FROM scored GROUP BY doc_id
    """,
)
def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram LM scoring on the skew-hardened path: the
    head of the vocabulary distribution (top-32 terms, one bounded
    TakeOrdered fetch) routes hot pairs through the salted join; the
    split is value-invariant, so the oracle is the plain formula."""
    from bi_utils_spark.operators.lm import (
        bigram_logprob_scores,
        top_vocab,
        unigram_model,
    )

    docs = load(spark, sf_dir, "documents")
    uni = unigram_model(docs)
    hot = [r["term"] for r in top_vocab(uni, 32).collect()]
    return bigram_logprob_scores(docs, unigram=uni, hot_terms=hot)


# ===========================================================================
# Source-mixture quota sampling (operators/mixing.py): per-source token
# quotas (equal shares of a 10k-token budget here) filled by the
# hash-ordered document prefix — deterministic data mixing.
# ===========================================================================

@register(
    "q_mixture_sample",
    r"""
    WITH d AS (
      SELECT doc_id, source,
             len(regexp_split_to_array(trim(lower(text)), '\s+')) AS nt,
             substr(md5(CAST(doc_id AS VARCHAR) || 'mix'), 1, 16) AS h
      FROM documents
    ),
    ng AS (SELECT count(DISTINCT source) AS n FROM d),
    r AS (SELECT d.*, coalesce(sum(nt) OVER (
                PARTITION BY source ORDER BY h, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS cum_before
          FROM d)
    SELECT doc_id, source, CAST(nt AS BIGINT) AS n_tokens
    FROM r, ng
    WHERE cum_before < 10000.0 / ng.n
    """,
)
def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.mixing import mixture_sample

    docs = load(spark, sf_dir, "documents")
    return mixture_sample(
        docs, "doc_id", "source", budget_tokens=10_000
    ).select("doc_id", "source", F.col("n_tokens").cast("long").alias("n_tokens"))


# ===========================================================================
# BPE merge statistics (operators/lm.py): corpus-weighted adjacent
# char-pair counts over the vocabulary — the first tokenizer-training
# merge step, costed by |vocab|, never the token stream.
# ===========================================================================

@register(
    "q_bpe_top_pairs",
    _MODEL_CTE
    + r"""
    , pc AS (
      SELECT substr(term, i, 2) AS pair, sum(c) AS cnt
      FROM model, unnest(generate_series(1, length(term) - 1)) AS u(i)
      WHERE length(term) >= 2
      GROUP BY pair
    ),
    r AS (SELECT pair, cnt,
                 row_number() OVER (ORDER BY cnt DESC, pair ASC) AS rk
          FROM pc)
    SELECT pair, CAST(cnt AS BIGINT) AS cnt, CAST(rk AS INTEGER) AS rank
    FROM r WHERE rk <= 20
    """,
)
def q_bpe_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.lm import bpe_top_pairs, unigram_model

    docs = load(spark, sf_dir, "documents")
    return bpe_top_pairs(unigram_model(docs), 20)


@register(
    "q_ivfpq_residual_topk",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_corpus,
           CAST(least(10, count(*)) AS BIGINT) AS n_exact,
           1 AS recall_ge_050,
           1 AS self_retrieved
    FROM embeddings
    """,
)
def q_ivfpq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-bound oracle row for residual IVF-PQ search
    (operators/pq.py): codes quantize x − anchor[cell] (cell-mean
    anchors), search adds the per-probed-cell q·anchor bias, exact
    shortlist re-rank to top-10. Asserted floors: recall@10 ≥ 0.5 vs
    the exact scan and the query's own vector retrieved."""
    from bi_utils_spark.operators.pq import (
        ivfpq_index_residual,
        ivfpq_topk_residual,
        pq_train_residual,
    )
    from bi_utils_spark.operators.similarity import cosine_topk, kmeans_centroids

    emb = load(spark, sf_dir, "embeddings")
    target = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    cents = kmeans_centroids(emb, 8)
    books, anchors = pq_train_residual(emb, cents, 8, 256)
    idx = ivfpq_index_residual(emb, cents, books, anchors)
    probe = ivfpq_topk_residual(
        emb, target, cents, books, anchors, idx, k=10, nprobe=8,
        refine_factor=10,
    ).select("vec_id")
    exact = cosine_topk(emb, target, k=10).select("vec_id")
    n_corpus = emb.agg(F.count("*").alias("n_corpus"))
    n_exact = exact.agg(F.count("*").alias("n_exact"))
    found = probe.join(exact, "vec_id", "left_semi").agg(
        F.count("*").alias("__found")
    )
    self_hit = probe.filter(F.col("vec_id") == 0).agg(
        F.count("*").alias("__self")
    )
    return (
        n_corpus.crossJoin(n_exact)
        .crossJoin(found)
        .crossJoin(self_hit)
        .select(
            "n_corpus",
            "n_exact",
            (
                F.col("__found").cast("double")
                >= 0.5 * F.col("n_exact").cast("double")
            )
            .cast("int")
            .alias("recall_ge_050"),
            (F.col("__self") >= 1).cast("int").alias("self_retrieved"),
        )
    )


# ===========================================================================
# Event-sequence analytics (operators/events.py): ordered funnel and
# weekly cohort retention — classic product analytics over `events`.
# ===========================================================================

@register(
    "q_funnel",
    """
    WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t2
           FROM events e JOIN s1 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts >= s1.t1
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.ts) AS t3
           FROM events e JOIN s2 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
           GROUP BY e.user_id)
    SELECT 1 AS step, 'signup' AS step_name,
           CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
    UNION ALL
    SELECT 2, 'click', CAST((SELECT count(*) FROM s2) AS BIGINT)
    UNION ALL
    SELECT 3, 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT)
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.events import funnel_counts

    events = load(spark, sf_dir, "events")
    return funnel_counts(events, ["signup", "click", "purchase"])


@register(
    "q_funnel_latency",
    """
    WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (SELECT e.user_id, s1.t1, min(e.ts) AS t2
           FROM events e JOIN s1 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts >= s1.t1
           GROUP BY e.user_id, s1.t1),
    s3 AS (SELECT e.user_id, s2.t2, min(e.ts) AS t3
           FROM events e JOIN s2 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
           GROUP BY e.user_id, s2.t2),
    l2 AS (SELECT (epoch_us(t2) - epoch_us(t1)) / 1e6 AS lat FROM s2),
    l3 AS (SELECT (epoch_us(t3) - epoch_us(t2)) / 1e6 AS lat FROM s3)
    SELECT 2 AS step, 'click' AS step_name,
           CAST((SELECT count(*) FROM l2) AS BIGINT) AS n_converted,
           round(CAST((SELECT quantile_cont(lat, 0.5) FROM l2) AS DOUBLE), 6)
             AS p50_seconds,
           round(CAST((SELECT quantile_cont(lat, 0.9) FROM l2) AS DOUBLE), 6)
             AS p90_seconds
    UNION ALL
    SELECT 3, 'purchase',
           CAST((SELECT count(*) FROM l3) AS BIGINT),
           round(CAST((SELECT quantile_cont(lat, 0.5) FROM l3) AS DOUBLE), 6),
           round(CAST((SELECT quantile_cont(lat, 0.9) FROM l3) AS DOUBLE), 6)
    """,
)
def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.events import funnel_latencies

    events = load(spark, sf_dir, "events")
    return funnel_latencies(events, ["signup", "click", "purchase"])


@register(
    "q_event_transitions",
    """
    WITH p AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events
    ),
    c AS (SELECT from_type, to_type, count(*) AS n
          FROM p WHERE to_type IS NOT NULL
          GROUP BY from_type, to_type)
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE)
             / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS prob
    FROM c
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.events import event_transitions

    events = load(spark, sf_dir, "events")
    return event_transitions(events, tiebreak_col="event_id")


@register(
    "q_cohort_retention",
    """
    WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort
               FROM events GROUP BY user_id),
    a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
    j AS (SELECT a.user_id, f.cohort,
                 CAST(datediff('day', f.cohort, a.wk) / 7 AS INTEGER)
                   AS offset_weeks
          FROM a JOIN f USING (user_id)),
    per AS (SELECT cohort, offset_weeks,
                   count(DISTINCT user_id) AS n_active
            FROM j GROUP BY cohort, offset_weeks),
    sz AS (SELECT cohort, count(*) AS cohort_size FROM f GROUP BY cohort)
    SELECT CAST(per.cohort AS DATE) AS cohort_week, offset_weeks,
           CAST(n_active AS BIGINT) AS n_active,
           CAST(cohort_size AS BIGINT) AS cohort_size,
           CAST(n_active AS DOUBLE) / cohort_size AS retention
    FROM per JOIN sz USING (cohort)
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.events import cohort_retention

    events = load(spark, sf_dir, "events")
    return cohort_retention(events)


# ===========================================================================
# Corpus health report: the per-language curation dashboard — doc and
# token inventory, exact-dup pressure (count − distinct content
# hashes), fixed-point mean quality. One partial-aggregated groupBy.
# ===========================================================================

@register(
    "q_corpus_report",
    r"""
    WITH t AS (
      SELECT doc_id, lang, text,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      FROM documents
    ),
    m AS (
      SELECT lang,
             len(toks) AS nt,
             sha256(text) AS h,
             CAST(round(((CASE WHEN len(toks) >= 20 THEN 1.0 ELSE 0.0 END)
              + (CASE WHEN (CASE WHEN length(text) = 0 THEN 0.0
                    ELSE CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
                         AS DOUBLE) / length(text) END) <= 0.2
                   THEN 1.0 ELSE 0.0 END)
              + least((CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE CAST(len(list_filter(toks,
                        x -> list_contains(['the','and','of','to','a','is'], x)))
                       AS DOUBLE) / len(toks) END) * 5.0, 1.0)) / 3.0
              * 1e7) AS BIGINT) AS qq
      FROM t
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS total_tokens,
           CAST(count(*) - count(DISTINCT h) AS BIGINT) AS n_exact_dups,
           (CAST(sum(qq) AS DOUBLE) / 1e7) / count(*) AS avg_quality
    FROM m GROUP BY lang
    """,
)
def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.textstats import quality_score, token_count

    docs = load(spark, sf_dir, "documents")
    qq = F.round(quality_score("text") * 1e7).cast("long")
    return (
        docs.select(
            "lang",
            token_count("text").alias("nt"),
            F.sha2(F.col("text"), 256).alias("h"),
            qq.alias("qq"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nt").alias("total_tokens"),
            (F.count("*") - F.countDistinct("h")).alias("n_exact_dups"),
            ((F.sum("qq").cast("double") / F.lit(1e7)) / F.count("*")).alias(
                "avg_quality"
            ),
        )
    )


# ===========================================================================
# Retrieval kNN join (operators/similarity.py::knn_join_exact): every
# query vector's top-k corpus neighbors — the RAG/eval retrieval join.
# Query batch = vec_id % 25 == 0; corpus = the rest.
# ===========================================================================

@register(
    "q_knn_join",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
               WHERE vec_id % 25 = 0),
    c AS (SELECT vec_id AS neighbor_id, embedding FROM embeddings
          WHERE vec_id % 25 != 0),
    s AS (SELECT q.query_id, c.neighbor_id,
                 round(list_cosine_similarity(q.embedding::DOUBLE[],
                                              c.embedding::DOUBLE[]), 9)
                   AS score
          FROM q, c),
    r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, neighbor_id ASC) AS rk FROM s)
    SELECT query_id, neighbor_id, score, CAST(rk AS INTEGER) AS rank
    FROM r WHERE rk <= 5
    """,
)
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.similarity import knn_join_exact

    emb = load(spark, sf_dir, "embeddings")
    return knn_join_exact(
        emb.filter(F.col("vec_id") % 25 == 0),
        emb.filter(F.col("vec_id") % 25 != 0),
        k=5,
    )


# ===========================================================================
# Curriculum ordering (operators/mixing.py::curriculum_order): fluency
# percent-rank → 4 phases (phase 0 = most fluent), deterministic
# within-phase positions — easy-to-hard training layout.
# ===========================================================================

@register(
    "q_curriculum_order",
    r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      FROM documents
    ),
    model AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
    consts AS (SELECT sum(c) AS total, count(*) AS v FROM model),
    scored AS (
      SELECT t.doc_id,
             CAST(round(ln((CAST(m.c AS DOUBLE) + 1.0)
                           / CAST(total + v AS DOUBLE)) * 1e7) AS BIGINT) AS q
      FROM toks t JOIN model m USING (term), consts
    ),
    s AS (SELECT doc_id,
                 (CAST(sum(q) AS DOUBLE) / 1e7) / count(*) AS lp
          FROM scored GROUP BY doc_id),
    p AS (SELECT doc_id, lp, percent_rank() OVER (ORDER BY lp) AS pr FROM s),
    ph AS (SELECT doc_id,
                  CAST(least(floor((1.0 - pr) * 4), 3) AS INTEGER) AS phase,
                  substr(md5(CAST(doc_id AS VARCHAR) || 'curr'), 1, 16) AS h
           FROM p)
    SELECT doc_id, phase,
           CAST(row_number() OVER (PARTITION BY phase
                                   ORDER BY h, doc_id) AS INTEGER) AS pos
    FROM ph
    """,
)
def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.lm import unigram_logprob_scores
    from bi_utils_spark.operators.mixing import curriculum_order

    docs = load(spark, sf_dir, "documents")
    # one lazy checkpoint: the scoring subtree feeds the rank-CDF
    # build fetches AND both curriculum branches (the q_llm_pipeline
    # shared-stage discipline) — down to 3 exchanges in the final
    # plan (see BENCH_PLANS.json), from 23 without any reuse
    scores = (
        unigram_logprob_scores(docs)
        .select("doc_id", "avg_logprob")
        .localCheckpoint(eager=False)
    )
    return curriculum_order(scores, "doc_id", "avg_logprob").select(
        "doc_id", "phase", "pos"
    )


# ===========================================================================
# Token-ID encoding (operators/lm.py::encode_tokens): integer-encode
# the token stream against the deterministic top-200 vocabulary
# (OOV → 0) — the step between curation and sequence packing.
# ===========================================================================

@register(
    "q_encode_tokens",
    _MODEL_CTE
    + r"""
    , vocab AS (SELECT term,
                       row_number() OVER (ORDER BY c DESC, term ASC) AS rank
                FROM model ORDER BY c DESC, term ASC LIMIT 200),
    t AS (SELECT doc_id,
                 regexp_split_to_array(trim(lower(text)), '\s+') AS a
          FROM documents),
    pe AS (SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, a[i] AS term
           FROM t, unnest(generate_series(1, len(a))) AS u(i))
    SELECT pe.doc_id, pe.pos,
           CAST(coalesce(v.rank, 0) AS INTEGER) AS token_id
    FROM pe LEFT JOIN vocab v USING (term)
    """,
)
def q_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.lm import (
        encode_tokens,
        term_ranks,
        unigram_model,
    )

    docs = load(spark, sf_dir, "documents")
    vocab = term_ranks(unigram_model(docs)).filter(F.col("rank") <= 200)
    return encode_tokens(docs, vocab)


# ===========================================================================
# Deterministic global shuffle (operators/importance.py::shard_positions):
# (shard, pos) addresses forming a pseudorandom permutation — training
# shard layout with no rand() and no global sort (each shard sorts
# ~n/num_shards rows after one hash shuffle).
# ===========================================================================

def _shard_case_sql(num_shards: int) -> str:
    top = (1 << 64)
    whens = []
    for i in range(num_shards - 1):
        bound = format((i + 1) * top // num_shards, "016x")
        whens.append(f"WHEN hx < '{bound}' THEN {i}")
    return "CASE " + " ".join(whens) + f" ELSE {num_shards - 1} END"


@register(
    "q_global_shuffle",
    r"""
    WITH h AS (
      SELECT doc_id,
             substr(md5(CAST(doc_id AS VARCHAR) || 'shuffle'), 1, 16) AS hx
      FROM documents
    ),
    s AS (SELECT doc_id, hx, """
    + _shard_case_sql(8)
    + r""" AS shard FROM h)
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard
                                   ORDER BY hx, doc_id) AS INTEGER) AS pos
    FROM s
    """,
)
def q_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bi_utils_spark.operators.importance import shard_positions

    docs = load(spark, sf_dir, "documents")
    return shard_positions(docs, "doc_id", num_shards=8).select(
        "doc_id", "shard", "pos"
    )


# ---------------------------------------------------------------------------
# X55: cross-document line dedup (boilerplate removal). The test
# corpus has no newlines, so the fixture synthesizes multi-line
# documents in-plan, closed-form in BOTH engines (the q_jpeg_roundtrip
# discipline): each doc gets n = doc_id%5+3 lines — a rotating member
# of a 7-line shared-header pool (i%3==0), a blank structural line
# (i%4==1), or a doc-unique line. The pool lines recur across ~1/7 of
# the corpus (df >> 5), unique lines have df=1, blanks are exempt by
# contract — so the oracle's expected output exercises removal, keep,
# and blank-preservation paths on every document.
# ---------------------------------------------------------------------------

_MLINES_CTE = """
    WITH d AS (SELECT doc_id, doc_id % 5 + 3 AS n FROM documents),
    ml AS (
      SELECT doc_id, i,
             CASE WHEN i % 3 = 0
                  THEN 'shared header ' || CAST((doc_id + i * 5) % 7 AS VARCHAR)
                  WHEN i % 4 = 1 THEN ''
                  ELSE 'unique ' || CAST(doc_id AS VARCHAR)
                       || ' line ' || CAST(i AS VARCHAR)
             END AS line
      FROM (SELECT doc_id, n, UNNEST(range(0, n)) AS i FROM d)
    )
"""


def _multiline_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark half of _MLINES_CTE — one codegen projection."""
    docs = load(spark, sf_dir, "documents").select("doc_id")

    def line(i):
        return (
            F.when(
                i % 3 == 0,
                F.concat(
                    F.lit("shared header "),
                    ((F.col("doc_id") + i * 5) % 7).cast("string"),
                ),
            )
            .when(i % 4 == 1, F.lit(""))
            .otherwise(
                F.concat(
                    F.lit("unique "),
                    F.col("doc_id").cast("string"),
                    F.lit(" line "),
                    i.cast("string"),
                )
            )
        )

    return docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(F.lit(0).cast("long"), F.col("doc_id") % 5 + 2),
                line,
            ),
            "\n",
        ).alias("text"),
    )


@register(
    "q_boilerplate_lines",
    _MLINES_CTE
    + """
    SELECT line, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
    FROM ml WHERE trim(line) <> ''
    GROUP BY line HAVING count(DISTINCT doc_id) >= 5
    ORDER BY df DESC, line
    """,
)
def q_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate inventory: non-blank lines recurring in >= 5
    distinct documents, worst offenders first (X55 report half)."""
    from bi_utils_spark.operators.dedup import line_doc_freq

    return line_doc_freq(_multiline_docs(spark, sf_dir), min_df=5)


@register(
    "q_line_dedup",
    _MLINES_CTE
    + """
    , f AS (
      SELECT line FROM ml WHERE trim(line) <> ''
      GROUP BY line HAVING count(DISTINCT doc_id) >= 5
    )
    SELECT ml.doc_id,
           coalesce(array_to_string(
             list(ml.line ORDER BY ml.i) FILTER (WHERE f.line IS NULL),
             chr(10)), '') AS text_cleaned,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN f.line IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_removed
    FROM ml LEFT JOIN f ON ml.line = f.line
    GROUP BY ml.doc_id
    """,
)
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style line-level boilerplate removal, full-row
    oracle: every document's reconstructed text (shared-header lines
    deleted, blank + unique lines kept in order) plus removal counts
    (X55 removal half)."""
    from bi_utils_spark.operators.dedup import remove_boilerplate_lines

    return remove_boilerplate_lines(_multiline_docs(spark, sf_dir), min_df=5)


# ---------------------------------------------------------------------------
# X57: URL / domain curation tier. The corpus has no URL column, so
# the fixture synthesizes one in-plan from doc_id, closed-form in
# both engines (the X55 discipline), deliberately covering every
# normalization branch: mixed-case scheme/host, default vs non-default
# vs scheme-mismatched ports, empty paths, tracking-only and mixed
# query strings, fragments (including '?' INSIDE a fragment, which
# must not parse as a query), multi-label public suffixes, bracketed
# IPv6 authorities (with and without ports), dotted-quad IPv4 hosts,
# and trailing-dot FQDNs (r6 — the r5 wrong-answer classes). The
# oracle derives the expected canonical form from the CONSTRUCTION
# parts — an independent derivation, not a re-parse — so a parser
# that mishandles any component cannot hash-match.
# ---------------------------------------------------------------------------

_URLS_CTE = """
    WITH u AS (
      SELECT doc_id,
        CASE WHEN doc_id % 4 = 0 THEN 'HTTPS'
             WHEN doc_id % 4 = 1 THEN 'https' ELSE 'http' END AS scheme,
        CASE doc_id % 8 WHEN 0 THEN 'Example.COM'
                        WHEN 1 THEN 'news.Example.co.uk'
                        WHEN 2 THEN 'cdn.site.org'
                        WHEN 3 THEN 'sub.blog.example.com'
                        WHEN 4 THEN 'shop.example.com'
                        WHEN 5 THEN '[2001:DB8::1]'
                        WHEN 6 THEN '93.184.216.34'
                        ELSE 'www.Example.co.uk.' END AS host,
        CASE WHEN doc_id % 7 = 0 THEN ':443'
             WHEN doc_id % 11 = 0 THEN ':8080' ELSE '' END AS port,
        CASE WHEN doc_id % 13 = 0 THEN ''
             ELSE '/p/' || CAST(doc_id % 13 AS VARCHAR) END AS path,
        CASE WHEN doc_id % 2 = 0
             THEN '?utm_source=x&b=' || CAST(doc_id % 3 AS VARCHAR) || '&a=1'
             WHEN doc_id % 9 = 0 THEN '?gclid=abc' ELSE '' END AS query,
        CASE WHEN doc_id % 3 = 0
             THEN '#sec' || CAST(doc_id % 2 AS VARCHAR)
             WHEN doc_id % 5 = 1 THEN '#a?b=1' ELSE '' END AS frag
      FROM documents
    ),
    norm AS (
      SELECT doc_id,
        scheme || '://' || host || port || path || query || frag AS url,
        lower(scheme) || '://'
          || regexp_replace(lower(host), '\\.$', '')
          || CASE WHEN port = ':443' AND lower(scheme) = 'https'
                  THEN '' ELSE port END
          || CASE WHEN path = '' THEN '/' ELSE path END
          || CASE WHEN query LIKE '?utm%'
                  THEN '?a=1&b=' || CAST(doc_id % 3 AS VARCHAR)
                  ELSE '' END AS url_norm,
        regexp_replace(lower(host), '\\.$', '') AS host,
        CASE doc_id % 8 WHEN 0 THEN 'example.com'
                        WHEN 1 THEN 'example.co.uk'
                        WHEN 2 THEN 'site.org'
                        WHEN 3 THEN 'example.com'
                        WHEN 4 THEN 'example.com'
                        WHEN 5 THEN '[2001:db8::1]'
                        WHEN 6 THEN '93.184.216.34'
                        ELSE 'example.co.uk' END AS domain
      FROM u
    )
"""


def _url_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark half of _URLS_CTE's `u` — one codegen projection
    building the raw (pre-normalization) URL string."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    return docs.select("doc_id", _url_col().alias("url"))


def _url_col() -> "Column":
    """The raw-URL construction as a bare Column over doc_id (shared
    by _url_docs and the composed q_web_pipeline fixture)."""
    d = F.col("doc_id")
    scheme = (
        F.when(d % 4 == 0, F.lit("HTTPS"))
        .when(d % 4 == 1, F.lit("https"))
        .otherwise(F.lit("http"))
    )
    host = (
        F.when(d % 8 == 0, F.lit("Example.COM"))
        .when(d % 8 == 1, F.lit("news.Example.co.uk"))
        .when(d % 8 == 2, F.lit("cdn.site.org"))
        .when(d % 8 == 3, F.lit("sub.blog.example.com"))
        .when(d % 8 == 4, F.lit("shop.example.com"))
        .when(d % 8 == 5, F.lit("[2001:DB8::1]"))
        .when(d % 8 == 6, F.lit("93.184.216.34"))
        .otherwise(F.lit("www.Example.co.uk."))
    )
    port = (
        F.when(d % 7 == 0, F.lit(":443"))
        .when(d % 11 == 0, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path = F.when(d % 13 == 0, F.lit("")).otherwise(
        F.concat(F.lit("/p/"), (d % 13).cast("string"))
    )
    query = (
        F.when(
            d % 2 == 0,
            F.concat(
                F.lit("?utm_source=x&b="),
                (d % 3).cast("string"),
                F.lit("&a=1"),
            ),
        )
        .when(d % 9 == 0, F.lit("?gclid=abc"))
        .otherwise(F.lit(""))
    )
    frag = (
        F.when(d % 3 == 0, F.concat(F.lit("#sec"), (d % 2).cast("string")))
        .when(d % 5 == 1, F.lit("#a?b=1"))
        .otherwise(F.lit(""))
    )
    return F.concat(scheme, F.lit("://"), host, port, path, query, frag)


@register(
    "q_url_normalize",
    _URLS_CTE
    + """
    SELECT doc_id, url, url_norm, host, domain FROM norm
    """,
)
def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC-3986 parse + canonicalization + registered-domain
    extraction per URL (X57), full-row oracle via the independent
    closed-form derivation in _URLS_CTE."""
    from bi_utils_spark.operators.weburl import attach_url_columns

    return attach_url_columns(_url_docs(spark, sf_dir)).select(
        "doc_id", "url", "url_norm", "host", "domain"
    )


@register(
    "q_domain_stats",
    _URLS_CTE
    + """
    SELECT domain,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT url_norm) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
    FROM norm GROUP BY domain
    """,
)
def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registered-domain curation panel: row pressure vs distinct
    canonical resources vs host fan-out (X57)."""
    from bi_utils_spark.operators.weburl import domain_stats

    return domain_stats(_url_docs(spark, sf_dir))


@register(
    "q_domain_blocklist",
    _URLS_CTE
    + """
    SELECT doc_id, domain FROM norm
    WHERE domain NOT IN ('site.org', 'example.co.uk', '93.184.216.34')
    """,
)
def q_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast anti-join blocklist filter on the registered domain
    (X57): site.org, example.co.uk and an IPv4-literal host dropped
    (an IP blocklist entry must match the address itself, not a fake
    'last two octets' domain — the r5 defect class), survivors tagged
    with their domain."""
    from bi_utils_spark.operators.weburl import (
        attach_url_columns,
        filter_blocked_domains,
    )

    blocklist = spark.createDataFrame(
        [("site.org",), ("example.co.uk",), ("93.184.216.34",)],
        "domain string",
    )
    survivors = filter_blocked_domains(
        _url_docs(spark, sf_dir), blocklist
    )
    return attach_url_columns(survivors).select("doc_id", "domain")


# Public-suffix-list fixture (r6): hosts exercising every PSL rule
# type — private multi-label suffix (github.io), wildcard (*.ck),
# exception (!www.ck), classic ccTLD (co.uk), public-suffix-only
# hosts (no registrable domain -> passthrough) — with the expected
# registrable domain derived from the CONSTRUCTION, not a re-parse.
_PSL_CTE = """
    WITH h AS (
      SELECT doc_id,
        CASE doc_id % 6 WHEN 0 THEN 'a.b.GitHub.IO'
                        WHEN 1 THEN 'WWW.CK'
                        WHEN 2 THEN 'x.y.z.ck'
                        WHEN 3 THEN 'news.bbc.co.uk'
                        WHEN 4 THEN 'github.io'
                        ELSE 'foo.example.com' END AS host,
        CASE doc_id % 6 WHEN 0 THEN 'b.github.io'
                        WHEN 1 THEN 'www.ck'
                        WHEN 2 THEN 'y.z.ck'
                        WHEN 3 THEN 'bbc.co.uk'
                        WHEN 4 THEN 'github.io'
                        ELSE 'example.com' END AS domain
      FROM documents
    )
"""

_PSL_RULES = [
    "com", "uk", "co.uk", "io", "github.io", "ck", "*.ck", "!www.ck",
    "// comment lines and blanks are ignored", "",
]


def _psl_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    host = (
        F.when(d % 6 == 0, F.lit("a.b.GitHub.IO"))
        .when(d % 6 == 1, F.lit("WWW.CK"))
        .when(d % 6 == 2, F.lit("x.y.z.ck"))
        .when(d % 6 == 3, F.lit("news.bbc.co.uk"))
        .when(d % 6 == 4, F.lit("github.io"))
        .otherwise(F.lit("foo.example.com"))
    )
    return docs.select("doc_id", host.alias("host"))


def _psl_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([(r,) for r in _PSL_RULES], "rule string")


@register(
    "q_registered_domain_psl",
    _PSL_CTE
    + """
    SELECT doc_id, host, domain FROM h
    """,
)
def q_registered_domain_psl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full public-suffix-algorithm registered domain (X57, r6):
    longest-rule-wins with wildcard and exception rules, via K
    broadcast joins of the host's label tails against the prevailing-
    rule table (weburl.attach_registered_domain) — zero corpus
    shuffle. Full-row oracle from the construction-derived expected
    domains."""
    from bi_utils_spark.operators.weburl import attach_registered_domain

    return attach_registered_domain(
        _psl_hosts(spark, sf_dir), "host", psl=_psl_df(spark)
    ).select("doc_id", "host", "domain")


@register(
    "q_domain_stats_psl",
    _PSL_CTE
    + """
    SELECT domain,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT 'http://' || lower(host) || '/p/'
                      || CAST(doc_id % 5 AS VARCHAR)) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT lower(host)) AS BIGINT) AS n_hosts
    FROM h GROUP BY domain
    """,
)
def q_domain_stats_psl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """domain_stats keyed by PSL-correct registered domains (X57,
    r6): the per-domain curation panel where the grouping unit is the
    publicsuffix.org registrable domain, not the 2-label heuristic."""
    from bi_utils_spark.operators.weburl import domain_stats

    urls = _psl_hosts(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("http://"),
            F.col("host"),
            F.lit("/p/"),
            (F.col("doc_id") % 5).cast("string"),
        ).alias("url"),
    )
    return domain_stats(urls, psl=_psl_df(spark))


@register(
    "q_domain_cap",
    _URLS_CTE
    + """
    SELECT doc_id, domain FROM (
      SELECT doc_id, domain,
             row_number() OVER (
               PARTITION BY domain
               ORDER BY md5(CAST(doc_id AS VARCHAR) || 'domcap'), doc_id
             ) AS rn
      FROM norm
    ) WHERE rn <= 7
    """,
)
def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registered-domain document cap (X58, r6): keep the 7
    smallest md5(doc_id‖salt) rows per domain via the two-level
    ranking (no domain-sized single-task sort). Exact-kept-set oracle:
    DuckDB replays the same portable md5 order in one window."""
    from bi_utils_spark.operators.weburl import cap_per_domain

    return cap_per_domain(_url_docs(spark, sf_dir), cap=7).select(
        "doc_id", "domain"
    )


# ---------------------------------------------------------------------------
# X59: HTML → text extraction. The fixture synthesizes an HTML page
# per document IN-PLAN (closed-form in both engines): real corpus
# text wrapped in <p>, a <head> with title + style, a comment, a
# script block whose body contains '<' and '>' (the trap a naive
# tag-stripper falls into), entity-encoded characters, and 0-3 <a>
# outlinks. The oracle derives title/text/links from the
# CONSTRUCTION pieces — an independent derivation, not a re-parse.
# ---------------------------------------------------------------------------

_HTML_CTE = r"""
    WITH hsrc AS (
      SELECT doc_id,
        regexp_replace(trim(substr(text, 1, 120)), '\s+', ' ', 'g') AS frag,
        doc_id % 4 AS nl,
        doc_id % 5 AS site
      FROM documents
    ),
    links AS (
      SELECT doc_id, frag, nl, site,
        CASE WHEN nl >= 1
             THEN '<a class="x" href="http://ex' || site || '.com/'
                  || doc_id || '/0">link0</a>' ELSE '' END
        || CASE WHEN nl >= 2
             THEN '<a class="x" href="http://ex' || site || '.com/'
                  || doc_id || '/1">link1</a>' ELSE '' END
        || CASE WHEN nl >= 3
             THEN '<a class="x" href="http://ex' || site || '.com/'
                  || doc_id || '/2">link2</a>' ELSE '' END AS ahtml,
        CASE WHEN nl >= 1 THEN ' link0' ELSE '' END
        || CASE WHEN nl >= 2 THEN ' link1' ELSE '' END
        || CASE WHEN nl >= 3 THEN ' link2' ELSE '' END AS atext
      FROM hsrc
    ),
    pages AS (
      SELECT doc_id, frag, nl, site,
        '<html><head><title> Doc ' || doc_id || ' </title>'
        || '<style>p {color: red}</style></head>'
        || '<body><!-- c' || doc_id || ' -->'
        || '<script>if (1 < 2 && x > 3) { bad() }</script>'
        || '<h1>Doc &#39;' || doc_id || '&#39;</h1>'
        || '<p>' || frag || '</p>'
        || '<p>Tom &amp; Jerry &lt;3</p>'
        || ahtml || '</body></html>' AS html,
        'Doc ' || doc_id AS exp_title,
        trim(regexp_replace(
          'Doc ''' || doc_id || ''' ' || frag || ' Tom & Jerry <3' || atext,
          '\s+', ' ', 'g')) AS exp_text
      FROM links
    )
"""


def _html_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark half of _HTML_CTE's `pages` — one codegen projection
    building the raw HTML string from (doc_id, text)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select("doc_id", _html_col().alias("html"))


def _html_col() -> "Column":
    """The synthesized-page construction as a bare Column over
    (doc_id, text) — shared by _html_docs and q_web_pipeline."""
    d = F.col("doc_id")
    frag = F.regexp_replace(
        F.trim(F.substring("text", 1, 120)), r"\s+", " "
    )
    site = (d % 5).cast("string")
    did = d.cast("string")

    def link(k: int):
        return F.when(
            d % 4 >= k + 1,
            F.concat(
                F.lit('<a class="x" href="http://ex'), site, F.lit(".com/"),
                did, F.lit(f'/{k}">link{k}</a>'),
            ),
        ).otherwise(F.lit(""))

    html = F.concat(
        F.lit("<html><head><title> Doc "), did, F.lit(" </title>"),
        F.lit("<style>p {color: red}</style></head>"),
        F.lit("<body><!-- c"), did, F.lit(" -->"),
        F.lit("<script>if (1 < 2 && x > 3) { bad() }</script>"),
        F.lit("<h1>Doc &#39;"), did, F.lit("&#39;</h1>"),
        F.lit("<p>"), frag, F.lit("</p>"),
        F.lit("<p>Tom &amp; Jerry &lt;3</p>"),
        link(0), link(1), link(2),
        F.lit("</body></html>"),
    )
    return html


@register(
    "q_html_extract",
    _HTML_CTE
    + """
    SELECT doc_id, exp_title AS title, exp_text AS text,
           CAST(nl AS INT) AS n_links
    FROM pages
    """,
)
def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → (title, visible text, outlink count) extraction (X59):
    head/script/style/comment removal (a '<' inside JavaScript must
    not derail tag stripping), tags → spaces, entity decode, and
    whitespace normalization. The oracle recomputes every value from
    the fixture CONSTRUCTION, so a parser that leaks script bodies,
    drops entity decode or mangles whitespace cannot hash-match."""
    from bi_utils_spark.operators.htmltext import attach_html_columns

    out = attach_html_columns(_html_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        "title",
        "text",
        F.size("links").cast("int").alias("n_links"),
    )


@register(
    "q_outlink_domains",
    _HTML_CTE
    + """
    SELECT 'ex' || site || '.com' AS domain,
           CAST(sum(nl) AS BIGINT) AS n_links,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM pages WHERE nl > 0 GROUP BY site
    """,
)
def q_outlink_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph domain pressure (X59 ∘ X57): extract every <a href>
    outlink, key it by registered TARGET domain, count links and
    distinct linking documents — the 'which domains does the crawl
    point at' curation panel. Explode is per-page-bounded; one
    partial-aggregable groupBy."""
    from bi_utils_spark.operators.htmltext import outlink_domains

    return outlink_domains(_html_docs(spark, sf_dir))


@register(
    "q_web_pipeline",
    _URLS_CTE
    + _HTML_CTE.replace("WITH hsrc AS (", ", hsrc AS (", 1)
    + """
    SELECT doc_id, domain, title,
           CAST(n_tokens AS INT) AS n_tokens,
           CAST(n_links AS INT) AS n_links
    FROM (
      SELECT n.doc_id, n.domain, p.exp_title AS title,
             len(string_split(p.exp_text, ' ')) AS n_tokens,
             p.nl AS n_links,
             row_number() OVER (
               PARTITION BY n.domain
               ORDER BY md5(CAST(n.doc_id AS VARCHAR) || 'domcap'), n.doc_id
             ) AS rn
      FROM norm n JOIN pages p ON n.doc_id = p.doc_id
      WHERE n.domain NOT IN ('site.org', '93.184.216.34')
    ) WHERE rn <= 20
    """,
)
def q_web_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed END-TO-END web-curation pipeline (X57 ∘ X58 ∘ X59 —
    the crawl-side sibling of q_llm_pipeline): raw (url, html) pages →
    registered-domain blocklist (broadcast anti-join, IP entry
    matches the address itself) → HTML text extraction (title,
    visible text, outlinks) → per-domain document cap (two-level
    ranking, ≤20/domain) → per-doc curation record (domain, title,
    token count, outlink count). Every stage is closed-form from the
    fixture constructions, so the oracle replays the WHOLE pipeline:
    one wrong component anywhere breaks the hash."""
    from bi_utils_spark.operators.htmltext import attach_html_columns
    from bi_utils_spark.operators.weburl import (
        cap_per_domain,
        filter_blocked_domains,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    web = docs.select(
        "doc_id", _url_col().alias("url"), _html_col().alias("html")
    )
    blocklist = spark.createDataFrame(
        [("site.org",), ("93.184.216.34",)], "domain string"
    )
    survivors = filter_blocked_domains(web, blocklist)
    extracted = attach_html_columns(survivors).drop("html")
    capped = cap_per_domain(extracted, cap=20)
    return capped.select(
        "doc_id",
        "domain",
        "title",
        F.size(F.split("text", " ", -1)).cast("int").alias("n_tokens"),
        F.size("links").cast("int").alias("n_links"),
    )


# ---------------------------------------------------------------------------
# X60: robots.txt compliance. The fixture synthesizes one robots.txt
# file per host IN-PLAN (6 hosts, g = doc_id % 6): a '*' group with a
# prefix disallow + longer allow, then a two-agent group (Bot{g%2} +
# extra{g}) with a '*'-wildcard disallow and a '$'-anchored allow,
# plus the traps — comment line, blank line, unknown keys
# (Crawl-delay, Sitemap), an empty Disallow, mixed key case. The
# oracles derive the parsed rule rows and the per-URL RFC 9309
# decision from the CONSTRUCTION tuples — closed-form, not a re-parse.
# ---------------------------------------------------------------------------


def _robots_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One synthesized robots.txt per host h<g>.example.com."""
    docs = (
        load(spark, sf_dir, "documents")
        .select((F.col("doc_id") % 6).alias("g"))
        .distinct()
    )
    gs = F.col("g").cast("string")
    ps = (F.col("g") % 2).cast("string")
    host = F.concat(F.lit("h"), gs, F.lit(".example.com"))
    txt = F.concat(
        F.lit("# fixture robots\nUser-agent: *\nDisallow: /g"),
        gs,
        F.lit("/\nAllow: /g"),
        gs,
        F.lit("/ok\nCrawl-delay: 5\n\nUser-agent: Bot"),
        ps,
        F.lit("\nUser-agent: extra"),
        gs,
        F.lit("\nDisallow: /x"),
        gs,
        F.lit("/* # trailing comment\nAllow: /x"),
        gs,
        F.lit("/keep$\nDisallow:\nSitemap: http://sm.example/x.xml\n"),
    )
    return docs.select(host.alias("host"), txt.alias("robots_txt"))


_ROBOTS_HOSTS_SQL = """
    g AS (SELECT DISTINCT doc_id % 6 AS g FROM documents),
    h AS (SELECT 'h' || CAST(g AS VARCHAR) || '.example.com' AS host,
                 CAST(g AS VARCHAR) AS gs,
                 CAST(g % 2 AS VARCHAR) AS ps
          FROM g)
"""


@register(
    "q_robots_rules",
    "WITH "
    + _ROBOTS_HOSTS_SQL
    + """
    SELECT host, '*' AS agent, 'disallow' AS rule,
           '/g' || gs || '/' AS path FROM h
    UNION ALL SELECT host, '*', 'allow', '/g' || gs || '/ok' FROM h
    UNION ALL SELECT host, 'bot' || ps, 'disallow',
                     '/x' || gs || '/*' FROM h
    UNION ALL SELECT host, 'bot' || ps, 'allow',
                     '/x' || gs || '/keep$' FROM h
    UNION ALL SELECT host, 'extra' || gs, 'disallow',
                     '/x' || gs || '/*' FROM h
    UNION ALL SELECT host, 'extra' || gs, 'allow',
                     '/x' || gs || '/keep$' FROM h
    """,
)
def q_robots_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt corpus -> RFC 9309 rule table (X60, r6): group
    assembly (consecutive UA lines share a group), comment/blank/
    unknown-key dropping, empty-Disallow dropping, agent lowercasing.
    The oracle lists the construction's rule tuples directly."""
    from bi_utils_spark.operators.robots import parse_robots

    return parse_robots(_robots_corpus(spark, sf_dir))


@register(
    "q_robots_decisions",
    """
    SELECT doc_id,
           CAST(NOT ((doc_id % 6) % 2 = 0 AND doc_id % 5 = 2
                  OR (doc_id % 6) % 2 = 1 AND doc_id % 5 = 0)
                AS INT) AS allowed
    FROM documents
    """,
)
def q_robots_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-URL RFC 9309 fetch decision for agent 'Bot0' (X60, r6).
    Even-g hosts have a bot0 group (wildcard disallow /x<g>/*,
    '$'-anchored allow /x<g>/keep$ — and the '*' group is IGNORED);
    odd-g hosts fall back to the '*' group (prefix disallow /g<g>/
    overridden by the longer allow /g<g>/ok). doc_id % 5 picks the
    path: 0 -> /g<g>/a, 1 -> /g<g>/ok/x, 2 -> /x<g>/a,
    3 -> /x<g>/keep, 4 -> '' (empty path defaults to '/'). The oracle
    is the closed-form truth table of (g % 2, doc_id % 5)."""
    from bi_utils_spark.operators.robots import (
        parse_robots,
        robots_decisions,
    )

    d = F.col("doc_id")
    gs = (d % 6).cast("string")
    pc = d % 5
    path = (
        F.when(pc == 0, F.concat(F.lit("/g"), gs, F.lit("/a")))
        .when(pc == 1, F.concat(F.lit("/g"), gs, F.lit("/ok/x")))
        .when(pc == 2, F.concat(F.lit("/x"), gs, F.lit("/a")))
        .when(pc == 3, F.concat(F.lit("/x"), gs, F.lit("/keep")))
        .otherwise(F.lit(""))
    )
    urls = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("http://h"), gs, F.lit(".example.com"), path
        ).alias("url"),
    )
    rules = parse_robots(_robots_corpus(spark, sf_dir))
    return robots_decisions(urls, rules, user_agent="Bot0").select(
        "doc_id", F.col("allowed").cast("int").alias("allowed")
    )


# ---------------------------------------------------------------------------
# X61: Z-order layout keys. The oracle evaluates the IDENTICAL bit-
# interleave expression (zorder_key_sql emits the same clamp + shift
# terms both engines run with plain integer operators) over the same
# bucketed dimensions — a bit-exact cross-engine check of the Morton
# arithmetic that drives the layout rewrite.
# ---------------------------------------------------------------------------


def _zorder_oracle_sql() -> str:
    from bi_utils_spark.operators.layout import zorder_key_sql

    return (
        """
    WITH b AS (
      SELECT o_orderkey,
             o_custkey % 256 AS x,
             CAST(FLOOR(o_totalprice) AS BIGINT) % 256 AS y
      FROM orders
    )
    SELECT o_orderkey, x, y,
           """
        + zorder_key_sql(["x", "y"], bits=8)
        + """ AS zkey
    FROM b
    """
    )


@register("q_zorder_key", _zorder_oracle_sql())
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton layout key over two bucketed order dimensions (X61,
    r6): customer bucket x price bucket, 8 bits each, interleaved to
    one BIGINT. Bit-exact oracle: DuckDB evaluates the same generated
    shift/mask expression."""
    from bi_utils_spark.operators.layout import zorder_key

    orders = load(spark, sf_dir, "orders")
    b = orders.select(
        "o_orderkey",
        (F.col("o_custkey") % 256).alias("x"),
        (F.floor("o_totalprice").cast("long") % 256).alias("y"),
    )
    return b.select(
        "o_orderkey", "x", "y", zorder_key(["x", "y"], bits=8).alias("zkey")
    )


# ---------------------------------------------------------------------------
# X62: count-min sketch. Hashing is the portable-md5 bucket (52-bit
# exact), so the oracles replay the WHOLE sketch in SQL — cell sums,
# collisions, min-over-rows, threshold — bit-exactly. q_countmin_hh
# uses a skewed synthetic key (half the corpus mass on 5 hot keys);
# q_countmin_bound attests the one-sided guarantee (est >= exact)
# against the exact groupBy on a real column.
# ---------------------------------------------------------------------------

_CM_KEY_SQL = (
    "CASE WHEN doc_id % 2 = 0 THEN 'k' || CAST(doc_id % 5 AS VARCHAR) "
    "ELSE 'u' || CAST(doc_id AS VARCHAR) END"
)


def _cm_replay_sql(key_sql: str, src: str, depth: int, width: int) -> str:
    """DuckDB replay of countmin_table + countmin_estimate over
    ``key_sql`` drawn from table ``src`` (bit-exact: same md5 row
    salts, same 13-hex 52-bit bucket arithmetic)."""
    return f"""
    k AS (SELECT {key_sql} AS key FROM {src}),
    cells AS (
      SELECT r AS row,
             CAST('0x' || substr(md5('cm' || CAST(r AS VARCHAR) || '|' || key),
                                 1, 13) AS BIGINT) % {width} AS bucket
      FROM k CROSS JOIN (SELECT unnest(range({depth})) AS r)
    ),
    sketch AS (
      SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM cells GROUP BY row, bucket
    ),
    probes AS (
      SELECT d.key, r AS row,
             CAST('0x' || substr(md5('cm' || CAST(r AS VARCHAR) || '|' || d.key),
                                 1, 13) AS BIGINT) % {width} AS bucket
      FROM (SELECT DISTINCT key FROM k) d
      CROSS JOIN (SELECT unnest(range({depth})) AS r)
    ),
    est AS (
      SELECT p.key, MIN(COALESCE(s.cnt, 0)) AS est
      FROM probes p LEFT JOIN sketch s
        ON p.row = s.row AND p.bucket = s.bucket
      GROUP BY p.key
    )
    """


@register(
    "q_countmin_hh",
    "WITH "
    + _cm_replay_sql(_CM_KEY_SQL, "documents", depth=3, width=64)
    + """
    SELECT key, est,
           est / (SELECT COUNT(*) FROM documents) AS share_est
    FROM est
    WHERE est >= 0.05 * (SELECT COUNT(*) FROM documents)
    """,
)
def q_countmin_hh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via count-min sketch (X62, r6): skewed key (5
    hot keys share half the mass, the rest unique), depth 3 x width
    64, threshold share 5%. The oracle replays build, collisions,
    min-over-rows and threshold bit-exactly, so even sketch
    FALSE-POSITIVES match across engines."""
    from bi_utils_spark.operators.sketches import heavy_hitters

    d = F.col("doc_id")
    keyed = load(spark, sf_dir, "documents").select(
        F.when(
            d % 2 == 0, F.concat(F.lit("k"), (d % 5).cast("string"))
        )
        .otherwise(F.concat(F.lit("u"), d.cast("string")))
        .alias("key")
    )
    return heavy_hitters(keyed, "key", min_share=0.05, depth=3, width=64)


@register(
    "q_countmin_bound",
    "WITH "
    + _cm_replay_sql("event_type", "events", depth=3, width=32)
    + """
    , exact AS (
      SELECT event_type AS key, CAST(COUNT(*) AS BIGINT) AS exact
      FROM events GROUP BY event_type
    )
    SELECT e.key AS event_type, e.est, x.exact,
           CAST(e.est >= x.exact AS INT) AS one_sided
    FROM est e JOIN exact x ON e.key = x.key
    """,
)
def q_countmin_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sidedness attestation (X62, r6): per event type, the CMS
    estimate never undercounts the exact count — (est, exact,
    est >= exact) all replayed/recomputed in the oracle."""
    from bi_utils_spark.operators.sketches import (
        countmin_estimate,
        countmin_table,
    )

    events = load(spark, sf_dir, "events")
    sketch = countmin_table(events, "event_type", depth=3, width=32)
    keys = events.select("event_type").distinct()
    est = countmin_estimate(keys, sketch, "event_type", depth=3, width=32)
    exact = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "est",
        "exact",
        (F.col("est") >= F.col("exact")).cast("int").alias("one_sided"),
    )


# ---------------------------------------------------------------------------
# X63: Unicode hygiene. The fixture plants one damage class per
# doc_id % 4 — decomposed NFD sequence, cp1252 mojibake, zero-width
# space, clean — on an ascii-only corpus fragment. The oracle derives
# the REPAIRED/COMPOSED text closed-form from the construction
# (chr(233) etc.), an independent derivation, not a re-normalization.
# ---------------------------------------------------------------------------

_UNI_FRAG_SQL = (
    "regexp_replace(substr(text, 1, 40), '[^ -~]', '', 'g')"
)


def _uni_frag_col() -> "Column":
    return F.regexp_replace(
        F.substring("text", 1, 40), "[^ -~]", ""
    )


def _uni_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("doc_id")
    frag = _uni_frag_col()
    dirty = (
        F.when(d % 4 == 0, F.concat(frag, F.lit(" Café")))
        .when(d % 4 == 1, F.concat(F.lit("CafÃ© "), frag))
        .when(d % 4 == 2, F.concat(frag, F.lit("​x")))
        .otherwise(frag)
    )
    return load(spark, sf_dir, "documents").select(
        "doc_id", dirty.alias("text")
    )


@register(
    "q_unicode_nfc",
    f"""
    WITH f AS (SELECT doc_id, {_UNI_FRAG_SQL} AS frag FROM documents)
    SELECT doc_id,
      CASE WHEN doc_id % 4 = 0 THEN frag || ' Caf' || chr(233)
           WHEN doc_id % 4 = 1 THEN 'Caf' || chr(233) || ' ' || frag
           WHEN doc_id % 4 = 2 THEN frag || 'x'
           ELSE frag END AS text_norm
    FROM f
    """,
)
def q_unicode_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed hygiene projection (X63, r6): mojibake repair (gated
    on marker + strict round-trip) -> NFC -> invisible-char strip.
    doc_id%4 plants: 0 = decomposed e+U+0301 (composes to é), 1 =
    'CafÃ©' cp1252 mojibake (repairs to 'Café'), 2 = zero-width space
    (stripped), 3 = clean (byte-identical passthrough)."""
    from bi_utils_spark.operators.textnorm import attach_normalized_text

    return attach_normalized_text(_uni_fixture(spark, sf_dir)).select(
        "doc_id", "text_norm"
    )


# ---------------------------------------------------------------------------
# X73: MAD series anomalies over the X69 grid. Exact interpolated
# medians (percentile == quantile_cont, the funnel-latency identity)
# make the flags engine-portable.
# ---------------------------------------------------------------------------


@register(
    "q_series_outliers",
    """
    WITH b AS (
      SELECT event_type,
             CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    med AS (SELECT event_type, quantile_cont(n, 0.5) AS med
            FROM b GROUP BY event_type),
    dev AS (SELECT b.event_type, b.bucket, b.n, m.med,
                   ABS(CAST(b.n AS DOUBLE) - m.med) AS dv
            FROM b JOIN med m ON b.event_type = m.event_type),
    mad AS (SELECT event_type, quantile_cont(dv, 0.5) AS mad
            FROM dev GROUP BY event_type)
    SELECT d.event_type, d.bucket, d.n, d.med, m.mad,
           CAST(CASE WHEN m.mad > 0 THEN d.dv > 3.0 * m.mad
                     ELSE d.dv > 0 END AS INT) AS is_outlier
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    """,
)
def q_series_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-count anomalies per type (X73, r6): MAD detector
    over the bucketed series; flags, medians and MADs all recomputed
    independently by the oracle."""
    from bi_utils_spark.operators.timeseries import (
        attach_time_bucket,
        mad_outliers,
    )

    counts = (
        attach_time_bucket(
            load(spark, sf_dir, "events"), "ts", width_sec=86400
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = mad_outliers(counts, value_col="n", group_cols=("event_type",))
    return out.select(
        "event_type",
        "bucket",
        "n",
        "med",
        "mad",
        F.col("is_outlier").cast("int").alias("is_outlier"),
    )


# ---------------------------------------------------------------------------
# X72: IPv4/CIDR blocklists. The oracle replays the integer address
# arithmetic (strict octet regex, base-256 fold) and the
# longest-prefix-first decision as an ordered CASE over the literal
# rule ranges. doc_id % 5 = 0 rows with doc_id % 200 = 5 hit BOTH
# 10.0.0.0/8 and 10.5.0.0/16 — the /16 must win.
# ---------------------------------------------------------------------------

_IP_FIXTURE_SQL = """
      SELECT doc_id,
        CASE WHEN doc_id % 5 = 0
             THEN '10.' || CAST(doc_id % 200 AS VARCHAR) || '.3.4'
             WHEN doc_id % 5 = 1
             THEN '203.0.113.' || CAST(doc_id % 256 AS VARCHAR)
             WHEN doc_id % 5 = 2
             THEN '8.8.' || CAST(doc_id % 256 AS VARCHAR) || '.8'
             WHEN doc_id % 5 = 3
             THEN '192.168.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
             ELSE '999.1.2.' || CAST(doc_id AS VARCHAR) END AS ip
      FROM documents
"""

_IP_CIDRS = (
    "10.0.0.0/8",
    "10.5.0.0/16",
    "203.0.113.0/24",
    "192.168.0.0/16",
)

_OCT = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"


@register(
    "q_cidr_match",
    f"""
    WITH x AS ({_IP_FIXTURE_SQL}),
    n AS (
      SELECT doc_id, ip,
        CASE WHEN regexp_matches(ip,
               '^{_OCT}\\.{_OCT}\\.{_OCT}\\.{_OCT}$')
             THEN CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
                + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
                + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
                + CAST(string_split(ip, '.')[4] AS BIGINT)
        END AS ipn
      FROM x
    )
    SELECT doc_id, ip,
      CASE WHEN ipn IS NULL THEN NULL
           WHEN ipn BETWEEN 3405803776 AND 3405804031
             THEN '203.0.113.0/24'
           WHEN ipn BETWEEN 168099840 AND 168165375
             THEN '10.5.0.0/16'
           WHEN ipn BETWEEN 3232235520 AND 3232301055
             THEN '192.168.0.0/16'
           WHEN ipn BETWEEN 167772160 AND 184549375
             THEN '10.0.0.0/8'
      END AS matched_cidr
    FROM n
    """,
)
def q_cidr_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-prefix CIDR tagging (X72, r6) over the planted IP
    fixture: /16 beats /8 on overlap, 8.8.x.8 stays unmatched,
    999.x addresses are invalid and tag NULL."""
    from bi_utils_spark.operators.ipnet import attach_cidr_match

    d = F.col("doc_id")
    ips = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            d % 5 == 0,
            F.concat(
                F.lit("10."), (d % 200).cast("string"), F.lit(".3.4")
            ),
        )
        .when(
            d % 5 == 1,
            F.concat(F.lit("203.0.113."), (d % 256).cast("string")),
        )
        .when(
            d % 5 == 2,
            F.concat(
                F.lit("8.8."), (d % 256).cast("string"), F.lit(".8")
            ),
        )
        .when(
            d % 5 == 3,
            F.concat(
                F.lit("192.168."), (d % 256).cast("string"), F.lit(".1")
            ),
        )
        .otherwise(F.concat(F.lit("999.1.2."), d.cast("string")))
        .alias("ip"),
    )
    cidrs = spark.createDataFrame(
        [(c,) for c in _IP_CIDRS], "cidr string"
    )
    return attach_cidr_match(ips, "ip", cidrs)


# ---------------------------------------------------------------------------
# X71: stream-stream interval join, batch-parity form. The oracle is
# a plain SQL interval join; the streaming semantics (watermarks,
# bounded state, left_outer null emission) are proven in
# tests/test_streaming.py on the IDENTICAL plan.
# ---------------------------------------------------------------------------


@register(
    "q_stream_attribution",
    """
    SELECT c.user_id,
           CAST(FLOOR(epoch(c.ts)) AS BIGINT) AS earlier_s,
           CAST(FLOOR(epoch(p.ts)) AS BIGINT) AS later_s,
           CAST(FLOOR(epoch(p.ts)) - FLOOR(epoch(c.ts)) AS BIGINT)
             AS lag_sec
    FROM events p JOIN events c
      ON c.user_id = p.user_id
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
)
def q_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click -> purchase attribution within 30 minutes (X71, r6):
    the stream-stream interval join run in its batch form (same
    code path; withWatermark is a no-op on static frames)."""
    from bi_utils_spark.streaming.joins import attribute_events

    events = load(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts"
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    out = attribute_events(clicks, purchases, window_sec=1800)
    return out.select(
        "user_id",
        F.unix_timestamp("earlier_ts").alias("earlier_s"),
        F.unix_timestamp("later_ts").alias("later_s"),
        "lag_sec",
    )


# ---------------------------------------------------------------------------
# X70: paragraph-level boilerplate removal. Fixture paragraphs are
# MULTI-LINE (internal single \n) so the unit granularity is proven:
# a line-level pass would split them, the paragraph pass must not.
# ---------------------------------------------------------------------------

_MPARA_CTE = """
    WITH d AS (SELECT doc_id, doc_id % 4 + 2 AS n FROM documents),
    mp AS (
      SELECT doc_id, i,
             CASE WHEN i % 3 = 0
                  THEN 'shared para ' || CAST((doc_id + i) % 6 AS VARCHAR)
                       || chr(10) || 'cont ' || CAST((doc_id + i) % 6 AS VARCHAR)
                  ELSE 'unique ' || CAST(doc_id AS VARCHAR)
                       || ' para ' || CAST(i AS VARCHAR)
             END AS para
      FROM (SELECT doc_id, n, UNNEST(range(0, n)) AS i FROM d)
    )
"""


def _multipara_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id")

    def para(i):
        k = ((F.col("doc_id") + i) % 6).cast("string")
        return F.when(
            i % 3 == 0,
            F.concat(
                F.lit("shared para "), k, F.lit("\ncont "), k
            ),
        ).otherwise(
            F.concat(
                F.lit("unique "),
                F.col("doc_id").cast("string"),
                F.lit(" para "),
                i.cast("string"),
            )
        )

    return docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(
                    F.lit(0).cast("long"), F.col("doc_id") % 4 + 1
                ),
                para,
            ),
            "\n\n",
        ).alias("text"),
    )


@register(
    "q_paragraph_dedup",
    _MPARA_CTE
    + """
    , f AS (
      SELECT para FROM mp
      GROUP BY para HAVING count(DISTINCT doc_id) >= 5
    )
    SELECT mp.doc_id,
           coalesce(array_to_string(
             list(mp.para ORDER BY mp.i) FILTER (WHERE f.para IS NULL),
             chr(10) || chr(10)), '') AS text_cleaned,
           CAST(count(*) AS BIGINT) AS n_paragraphs,
           CAST(sum(CASE WHEN f.para IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_removed
    FROM mp LEFT JOIN f ON mp.para = f.para
    GROUP BY mp.doc_id
    """,
)
def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document paragraph boilerplate removal (X70, r6):
    multi-line shared paragraphs deleted whole, unique paragraphs
    kept in order, canonical blank-line rejoin — full reconstructed
    text per document in the oracle."""
    from bi_utils_spark.operators.dedup import (
        remove_boilerplate_paragraphs,
    )

    return remove_boilerplate_paragraphs(
        _multipara_docs(spark, sf_dir), min_df=5
    )


# ---------------------------------------------------------------------------
# X69: time-series resample + gap fill. The value > 200 filter
# sparsifies the hourly series, so the zero-filled grid genuinely
# differs from the bare groupBy; bounds derive from the filtered data.
# ---------------------------------------------------------------------------


@register(
    "q_resample_gaps",
    """
    WITH f AS (
      SELECT event_type,
             CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS bucket
      FROM events WHERE value > 200
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
    )
    SELECT g.event_type, g.bucket, COALESCE(a.n, 0) AS n
    FROM grid g LEFT JOIN agg a
      ON g.event_type = a.event_type AND g.bucket = a.bucket
    """,
)
def q_resample_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly high-value event counts per type on the COMPLETE
    bucket grid (X69, r6) — missing hours appear as explicit zeros.
    The oracle rebuilds the grid with generate_series."""
    from bi_utils_spark.operators.timeseries import resample_counts

    events = load(spark, sf_dir, "events").where(F.col("value") > 200)
    return resample_counts(
        events, ts_col="ts", width_sec=3600, group_cols=("event_type",)
    )


# ---------------------------------------------------------------------------
# X68: PageRank. Exact integer fixed-point power iteration, so the
# oracle replays every iteration as a chained CTE — bit-exact ranks.
# Fixture: a 21-node graph from doc_id arithmetic with node 20
# dangling (appears only as a target).
# ---------------------------------------------------------------------------

_PR_EDGES_SQL = """
      SELECT DISTINCT doc_id % 20 AS src,
        CASE WHEN doc_id % 5 = 0 THEN 20
             ELSE (doc_id * 7) % 20 END AS dst
      FROM documents
"""


def _pr_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("doc_id")
    return (
        load(spark, sf_dir, "documents")
        .select(
            (d % 20).alias("src"),
            F.when(d % 5 == 0, F.lit(20).cast("long"))
            .otherwise((d * 7) % 20)
            .alias("dst"),
        )
        .distinct()
    )


def _pagerank_replay_sql(n_iter: int, p: int = 85) -> str:
    from bi_utils_spark.operators.graph import PR_SCALE

    sql = f"""
    WITH e0 AS ({_PR_EDGES_SQL}),
    nodes AS (SELECT DISTINCT n FROM
        (SELECT src AS n FROM e0 UNION ALL SELECT dst FROM e0)),
    deg AS (SELECT src, COUNT(*) AS deg FROM e0 GROUP BY src),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (SELECT n AS node,
                  CAST({PR_SCALE} // (SELECT n FROM nn) AS BIGINT) AS rq
           FROM nodes)"""
    base = f"(({PR_SCALE} - {p} * {PR_SCALE} // 100) // (SELECT n FROM nn))"
    for k in range(1, n_iter + 1):
        prev = f"r{k - 1}"
        sql += f""",
    c{k} AS (SELECT e.dst AS node, SUM(r.rq // d.deg) AS s
             FROM e0 e JOIN {prev} r ON e.src = r.node
             JOIN deg d ON e.src = d.src
             GROUP BY e.dst),
    d{k} AS (SELECT COALESCE(SUM(rq), 0) AS dang FROM {prev}
             WHERE node NOT IN (SELECT src FROM deg)),
    r{k} AS (SELECT n.n AS node,
               CAST({base}
                 + ({p} * (COALESCE(c.s, 0)
                    + (SELECT dang FROM d{k}) // (SELECT n FROM nn)))
                   // 100 AS BIGINT) AS rq
             FROM nodes n LEFT JOIN c{k} c ON n.n = c.node)"""
    sql += f"""
    SELECT node, rq AS rank_q,
           CAST(rq AS DOUBLE) / {float(PR_SCALE)} AS rank
    FROM r{n_iter}
    """
    return sql


@register("q_pagerank_domains", _pagerank_replay_sql(5))
def q_pagerank_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five PageRank power iterations over the synthesized domain
    graph (X68, r6): exact fixed-point ranks incl. dangling-mass
    redistribution — the domain-authority signal for crawl frontier
    and quota ranking. Oracle replays all iterations bit-exactly."""
    from bi_utils_spark.operators.graph import pagerank

    return pagerank(_pr_edges(spark, sf_dir), n_iter=5)


# ---------------------------------------------------------------------------
# X67: Gopher quality rules. doc_id % 3 plants: 0 = raw corpus text,
# 1 = a 4-word fragment (fails word count), 2 = 60 identical bullet
# lines (fails bullet fraction + stopwords). The oracle recomputes
# every rule in SQL over the same construction.
# ---------------------------------------------------------------------------

_GOPHER_FIXTURE_SQL = """
      SELECT doc_id,
        CASE WHEN doc_id % 3 = 0 THEN text
             WHEN doc_id % 3 = 1 THEN 'only four words here'
             ELSE repeat('- itm' || chr(10), 60) END AS text
      FROM documents
"""


def _gopher_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("doc_id")
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(d % 3 == 0, F.col("text"))
        .when(d % 3 == 1, F.lit("only four words here"))
        .otherwise(F.repeat(F.lit("- itm\n"), 60))
        .alias("text"),
    )


_GOPHER_RULES_SQL = f"""
    WITH fx AS ({_GOPHER_FIXTURE_SQL}),
    w AS (
      SELECT doc_id, text,
        list_filter(string_split_regex(trim(text), '\\s+'),
                    x -> x <> '') AS words,
        list_filter(string_split(text, chr(10)),
                    l -> trim(l) <> '') AS lines
      FROM fx
    ),
    m AS (
      SELECT doc_id,
        len(words) AS n_words,
        CASE WHEN len(words) > 0
             THEN CAST(list_sum(list_transform(words, x -> length(x)))
                       AS DOUBLE) / len(words) ELSE 0.0 END AS mean_len,
        CASE WHEN len(words) > 0
             THEN CAST(length(text)
                       - length(regexp_replace(text, '[#…]', '', 'g'))
                       AS DOUBLE) / len(words) ELSE 0.0 END AS sym_ratio,
        CASE WHEN len(lines) > 0
             THEN CAST(len(list_filter(lines,
                        l -> regexp_matches(trim(l), '^[-*•]')))
                       AS DOUBLE) / len(lines) ELSE 0.0 END AS bullet_frac,
        CASE WHEN len(lines) > 0
             THEN CAST(len(list_filter(lines,
                        l -> regexp_matches(trim(l), '(\\.\\.\\.|…)$')))
                       AS DOUBLE) / len(lines) ELSE 0.0 END AS ellipsis_frac,
        CASE WHEN len(words) > 0
             THEN CAST(len(list_filter(words,
                        x -> regexp_matches(x, '[A-Za-z]')))
                       AS DOUBLE) / len(words) ELSE 0.0 END AS alpha_frac,
        (SELECT COUNT(*) FROM (SELECT unnest(['the','be','to','of',
           'and','that','have','with']) AS s) st
         WHERE list_contains(list_transform(words, x -> lower(x)), st.s)
        ) AS stop_hits
      FROM w
    ),
    fl AS (
      SELECT doc_id, n_words,
        CAST(n_words >= 50 AND n_words <= 100000 AS INT) AS ok_word_count,
        CAST(mean_len >= 3.0 AND mean_len <= 10.0 AS INT) AS ok_mean_word_len,
        CAST(sym_ratio <= 0.1 AS INT) AS ok_symbol_ratio,
        CAST(bullet_frac <= 0.9 AS INT) AS ok_bullet_lines,
        CAST(ellipsis_frac <= 0.3 AS INT) AS ok_ellipsis_lines,
        CAST(alpha_frac >= 0.8 AS INT) AS ok_alpha_words,
        CAST(stop_hits >= 2 AS INT) AS ok_stopwords
      FROM m
    )
"""


@register(
    "q_gopher_flags",
    _GOPHER_RULES_SQL
    + """
    SELECT doc_id, CAST(n_words AS INT) AS n_words, ok_word_count,
           ok_mean_word_len, ok_symbol_ratio, ok_bullet_lines,
           ok_ellipsis_lines, ok_alpha_words, ok_stopwords,
           CAST(ok_word_count + ok_mean_word_len + ok_symbol_ratio
                + ok_bullet_lines + ok_ellipsis_lines + ok_alpha_words
                + ok_stopwords = 7 AS INT) AS gopher_keep
    FROM fl
    """,
)
def q_gopher_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Gopher rule verdicts (X67, r6) over the planted
    fixture — every rule recomputed independently by the oracle."""
    from bi_utils_spark.operators.gopher import gopher_flags

    out = gopher_flags(_gopher_fixture(spark, sf_dir))
    cols = [
        "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
        "ok_bullet_lines", "ok_ellipsis_lines", "ok_alpha_words",
        "ok_stopwords", "gopher_keep",
    ]
    return out.select(
        "doc_id",
        "n_words",
        *[F.col(c).cast("int").alias(c) for c in cols],
    )


@register(
    "q_gopher_report",
    _GOPHER_RULES_SQL
    + """
    SELECT CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(CASE WHEN ok_word_count + ok_mean_word_len
                + ok_symbol_ratio + ok_bullet_lines + ok_ellipsis_lines
                + ok_alpha_words + ok_stopwords = 7
                THEN 1 ELSE 0 END) AS BIGINT) AS kept,
           CAST(SUM(1 - ok_word_count) AS BIGINT) AS fail_word_count,
           CAST(SUM(1 - ok_mean_word_len) AS BIGINT) AS fail_mean_word_len,
           CAST(SUM(1 - ok_symbol_ratio) AS BIGINT) AS fail_symbol_ratio,
           CAST(SUM(1 - ok_bullet_lines) AS BIGINT) AS fail_bullet_lines,
           CAST(SUM(1 - ok_ellipsis_lines) AS BIGINT) AS fail_ellipsis_lines,
           CAST(SUM(1 - ok_alpha_words) AS BIGINT) AS fail_alpha_words,
           CAST(SUM(1 - ok_stopwords) AS BIGINT) AS fail_stopwords
    FROM fl
    """,
)
def q_gopher_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level Gopher kill counts (X67, r6): which rule removes
    how much — the curation-debugging audit."""
    from bi_utils_spark.operators.gopher import gopher_report

    return gopher_report(_gopher_fixture(spark, sf_dir))


# ---------------------------------------------------------------------------
# X66: sentence segmentation. The oracle replays the exact same
# three RE2-safe regexps + split (split_sentences_sql) over the real
# corpus text — wholesale SQL replay, the embsig.py pattern.
# ---------------------------------------------------------------------------


def _sentences_oracle_sql() -> str:
    from bi_utils_spark.operators.sentences import split_sentences_sql

    return (
        f"""
    WITH d AS (SELECT doc_id, {split_sentences_sql("text")} AS ss
               FROM documents)
    SELECT doc_id, CAST(j - 1 AS INT) AS sent_idx, ss[j] AS sentence
    FROM d, unnest(range(1, len(ss) + 1)) AS u(j)
    """
    )


@register("q_sentences", _sentences_oracle_sql())
def q_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence unit table over the real corpus (X66, r6):
    terminator-keeping splits with initial/abbreviation guards, in
    document order. Oracle replays the identical regexps in DuckDB."""
    from bi_utils_spark.operators.sentences import explode_sentences

    return explode_sentences(load(spark, sf_dir, "documents"))


def _sentence_stats_oracle_sql() -> str:
    from bi_utils_spark.operators.sentences import split_sentences_sql

    return (
        f"""
    WITH d AS (SELECT doc_id, {split_sentences_sql("text")} AS ss
               FROM documents),
    lens AS (SELECT doc_id, len(ss) AS n,
                    list_transform(ss, s -> length(s)) AS ls
             FROM d)
    SELECT doc_id, CAST(n AS INT) AS n_sentences,
           CASE WHEN n > 0
                THEN CAST(list_sum(ls) AS DOUBLE) / n
                ELSE 0.0 END AS mean_sentence_chars,
           CAST(COALESCE(list_max(ls), 0) AS INT) AS max_sentence_chars
    FROM lens
    """
    )


@register("q_sentence_stats", _sentence_stats_oracle_sql())
def q_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc sentence-shape profile (X66, r6): count, mean chars,
    max chars — array arithmetic on the split, no explode."""
    from bi_utils_spark.operators.sentences import sentence_stats

    return sentence_stats(load(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# X65: mergeable distinct sketches. Attestation oracle: the exact
# per-week distinct counts come from SQL; the Spark side must emit
# merged_eq_direct = 1 (union(sketch) == sketch(union) identity) and
# err_ok = 1 (estimate within 5% of exact) for every row or the hash
# breaks. The sketches themselves are engine-internal (DataSketches),
# so the attested properties — not the registers — are the contract.
# ---------------------------------------------------------------------------


@register(
    "q_sketch_rollup",
    """
    SELECT CAST(FLOOR(datediff('day', DATE '1970-01-01',
                               CAST(ts AS DATE)) / 7) AS BIGINT) AS week,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact,
           1 AS merge_consistent,
           1 AS err_ok
    FROM events
    GROUP BY 1
    """,
)
def q_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily HLL user sketches unioned to weekly rollups (X65, r6):
    the raw stream is read once at day grain; the week numbers come
    from kilobyte sketch unions. Attested per week: merged estimate
    == direct coarse-grain estimate (exact mergeability) and within
    5% of the true distinct count."""
    from bi_utils_spark.operators.distinct_sketch import (
        sketch_rollup_report,
    )

    events = load(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").cast("string").alias("day"),
        F.floor(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")) / 7
        ).alias("week"),
    )
    return sketch_rollup_report(
        events,
        fine_cols=["day", "week"],
        coarse_cols=["week"],
        key_col="user_id",
        lgk=12,
        rel_error_bound=0.05,
    )


# ---------------------------------------------------------------------------
# X64: iterative BPE training. The fixture vocab uses DISTINCT-char
# words, so every candidate pair occurs at most once per word and a
# single string replace equals the exact left-to-right merge — which
# lets the oracle replay the WHOLE training loop (pair counts, argmax
# with tie-break, merge application) as a chained CTE per step. The
# Spark operator itself uses an exact fold (pending-register state
# machine) that is correct for ANY input, including repeated-char
# words (pytest covers those against a Python reference).
# ---------------------------------------------------------------------------

_BPE_WORDS = ["abcd", "abce", "bcd", "acd", "abd", "bce", "ade", "ce"]


def _bpe_chain_sql(n_merges: int) -> str:
    """WITH-chain replaying bpe_train's merge loop: v0 (spaced
    chars) .. v{n} (state after n merges), t1..tn (the argmax pair
    per step) — shared by the train and encode oracles."""
    words = ", ".join(
        f"('{w}', {i})" for i, w in enumerate(_BPE_WORDS)
    )
    sql = f"""
    WITH w(term, i) AS (VALUES {words}),
    dcnt AS (SELECT doc_id % 8 AS i, COUNT(*) AS n
             FROM documents GROUP BY 1),
    v0 AS (SELECT term,
                  trim(regexp_replace(term, '(.)', '\\1 ', 'g')) AS spaced,
                  CAST(dcnt.n + (8 - w.i) * 7 AS BIGINT) AS c
           FROM w JOIN dcnt ON w.i = dcnt.i)"""
    for k in range(1, n_merges + 1):
        prev = f"v{k - 1}"
        sql += f""",
    p{k} AS (
      SELECT t.pair, SUM(c) AS cnt
      FROM {prev}, unnest(list_transform(
             range(1, len(string_split(spaced, ' '))),
             j -> string_split(spaced, ' ')[j] || ' ' ||
                  string_split(spaced, ' ')[j + 1])) AS t(pair)
      GROUP BY t.pair
    ),
    t{k} AS (SELECT pair, cnt FROM p{k}
             ORDER BY cnt DESC, pair LIMIT 1),
    v{k} AS (
      SELECT term,
             trim(replace(' ' || spaced || ' ',
                          ' ' || (SELECT pair FROM t{k}) || ' ',
                          ' ' || replace((SELECT pair FROM t{k}), ' ', '')
                              || ' ')) AS spaced,
             c
      FROM {prev}
    )"""
    return sql


def _bpe_replay_sql(n_merges: int) -> str:
    selects = [
        f"SELECT {k} AS rank, pair, replace(pair, ' ', '') AS merged, "
        f"CAST(cnt AS BIGINT) AS cnt FROM t{k}"
        for k in range(1, n_merges + 1)
    ]
    return (
        _bpe_chain_sql(n_merges)
        + "\n    "
        + "\n    UNION ALL ".join(selects)
    )


@register("q_bpe_train", _bpe_replay_sql(4))
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four BPE merges learned end-to-end (X64, r6): per step, the
    corpus-weighted pair argmax (ties by pair text) and the exact
    left-to-right merge rewrite. Counts couple to the corpus via
    doc_id % 8 host-word weights. The oracle replays every step as a
    chained CTE — bit-exact iterative tokenizer training."""
    from bi_utils_spark.operators.lm import bpe_train

    dcnt = (
        load(spark, sf_dir, "documents")
        .groupBy((F.col("doc_id") % 8).alias("i"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    words = spark.createDataFrame(
        [(w, i) for i, w in enumerate(_BPE_WORDS)], "term string, i long"
    )
    model = words.join(dcnt, "i").select(
        "term", (F.col("n") + (8 - F.col("i")) * 7).alias("c")
    )
    merges, _state = bpe_train(model, 4)
    return merges


@register(
    "q_unicode_stats",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS non_nfc_docs,
           CAST(SUM(CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS mojibake_docs,
           CAST(SUM(CASE WHEN doc_id % 4 = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS invisible_docs
    FROM documents
    """,
)
def q_unicode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus hygiene audit (X63, r6) over the planted fixture: the
    per-class counts follow doc_id % 4 closed-form."""
    from bi_utils_spark.operators.textnorm import unicode_stats

    return unicode_stats(_uni_fixture(spark, sf_dir))


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
    words = spark.createDataFrame(
        [(w, i) for i, w in enumerate(_BPE_WORDS)], "term string, i long"
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
    qs = spark.createDataFrame([(0.5,), (0.95,)], ["q"])
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


# ---------------------------------------------------------------------------
# X110: manifest-log transactional tables — the ACID merge EXECUTES.
# Fixture arc (per-SF scratch, rebuilt only when absent, "v1"
# construction fingerprint in the dir name):
#   v0 create  : orders k%5 in {2,3,4}, partitioned by status
#   v1 append  : orders k%5 = 1
#   v2 merge   : updates (k%10 = 1 -> cents doubled, status kept —
#                partition-stable) + inserts (k%5 = 0, new status 'N')
# The oracle replays the fold in pure SQL; a green row proves the
# log-resolved snapshot (fold -> file list -> per-group reads ->
# union) equals the declarative relational result at every version.
# ---------------------------------------------------------------------------


def _tx_demo_dir(sf_dir: str) -> str:
    import hashlib
    import tempfile

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"bi_utils_spark_tx_{tag}_v1")


def _tx_order_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") * F.lit(100.0))
        .cast("long")
        .alias("cents"),
    )


def _tx_demo_table(spark: SparkSession, sf_dir: str) -> str:
    from bi_utils_spark.operators import txtable as tx

    path = _tx_demo_dir(sf_dir)
    if tx.latest_version(path) >= 2:
        return path
    rows = _tx_order_rows(spark, sf_dir)
    if tx.latest_version(path) < 0:
        tx.create_table(
            rows.where(F.col("k") % 5 >= 2), path, partition_cols=["status"]
        )
    if tx.latest_version(path) < 1:
        tx.append_table(rows.where(F.col("k") % 5 == 1), path)
    if tx.latest_version(path) < 2:
        src = (
            rows.where(F.col("k") % 10 == 1)
            .withColumn("cents", F.col("cents") * 2)
            .unionByName(
                rows.where(F.col("k") % 5 == 0).withColumn(
                    "status", F.lit("N")
                )
            )
        )
        tx.merge_tx_table(spark, path, src, ["k"])
    return path


_TX_ROWS_SQL = """
    SELECT o_orderkey AS k, o_orderstatus AS status,
           CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents
    FROM orders
"""

_TX_MERGED_SQL = f"""
    WITH rows0 AS ({_TX_ROWS_SQL}),
    tbl AS (SELECT * FROM rows0 WHERE k % 5 >= 1),
    src AS (
      SELECT k, status, cents * 2 AS cents FROM rows0 WHERE k % 10 = 1
      UNION ALL
      SELECT k, 'N' AS status, cents FROM rows0 WHERE k % 5 = 0
    )
    SELECT COALESCE(s.k, t.k) AS k,
           COALESCE(s.status, t.status) AS status,
           COALESCE(s.cents, t.cents) AS cents
    FROM tbl t FULL OUTER JOIN src s ON t.k = s.k
"""


@register("q_tx_merge_table", _TX_MERGED_SQL)
def q_tx_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactional MERGE executed through the manifest log (X110,
    r7): create -> append -> partition-scoped copy-on-write merge,
    then read the resolved snapshot. Closes the r4-r6 'ACID merge
    stays codegen-gated' gap — `merge.merge_upsert`'s reference M1
    semantics (`utils.py:237-296`) now run against an in-repo table
    format with a real commit log, no Delta/Iceberg jars needed."""
    from bi_utils_spark.operators.txtable import read_table

    path = _tx_demo_table(spark, sf_dir)
    return read_table(spark, path).select("k", "status", "cents")


@register(
    "q_tx_timetravel",
    f"""
    WITH rows0 AS ({_TX_ROWS_SQL}),
    v0 AS (SELECT * FROM rows0 WHERE k % 5 >= 2),
    v1 AS (SELECT * FROM rows0 WHERE k % 5 >= 1),
    src AS (
      SELECT k, status, cents * 2 AS cents FROM rows0 WHERE k % 10 = 1
      UNION ALL
      SELECT k, 'N' AS status, cents FROM rows0 WHERE k % 5 = 0
    ),
    v2 AS (
      SELECT COALESCE(s.k, t.k) AS k,
             COALESCE(s.status, t.status) AS status,
             COALESCE(s.cents, t.cents) AS cents
      FROM v1 t FULL OUTER JOIN src s ON t.k = s.k
    ),
    d1 AS (
      SELECT
        CAST(SUM(CASE WHEN o.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_added,
        CAST(SUM(CASE WHEN n.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_removed,
        CAST(SUM(CASE WHEN n.k IS NOT NULL AND o.k IS NOT NULL
                      AND (n.status <> o.status OR n.cents <> o.cents)
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_changed
      FROM v1 n FULL OUTER JOIN v0 o ON n.k = o.k
    ),
    d2 AS (
      SELECT
        CAST(SUM(CASE WHEN o.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_added,
        CAST(SUM(CASE WHEN n.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_removed,
        CAST(SUM(CASE WHEN n.k IS NOT NULL AND o.k IS NOT NULL
                      AND (n.status <> o.status OR n.cents <> o.cents)
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_changed
      FROM v2 n FULL OUTER JOIN v1 o ON n.k = o.k
    )
    SELECT 0 AS version, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(COUNT(*) AS BIGINT) AS n_added,
           CAST(0 AS BIGINT) AS n_removed, CAST(0 AS BIGINT) AS n_changed
    FROM v0
    UNION ALL
    SELECT 1, CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT),
           d1.n_added, d1.n_removed, d1.n_changed
    FROM v1, d1
    GROUP BY d1.n_added, d1.n_removed, d1.n_changed
    UNION ALL
    SELECT 2, CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT),
           d2.n_added, d2.n_removed, d2.n_changed
    FROM v2, d2
    GROUP BY d2.n_added, d2.n_removed, d2.n_changed
    """,
)
def q_tx_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel + change feed over the tx log (X110, r7): every
    retained version resolves independently from the same commit
    fold (count + cents-sum per version), and each transition's
    row-level diff (`table_diff` = snapshot_diff over two time-travel
    reads) is classified added/removed/changed — all replayed
    relationally by the oracle. A green row proves both the
    per-version snapshot isolation and the change-feed
    classification."""
    from bi_utils_spark.operators.txtable import read_table, table_diff

    path = _tx_demo_table(spark, sf_dir)

    def _stats(v: int) -> DataFrame:
        return read_table(spark, path, version=v).agg(
            F.lit(v).alias("version"),
            F.count("*").alias("n"),
            F.sum("cents").alias("sum_cents"),
        )

    def _diff_counts(v: int) -> DataFrame:
        d = table_diff(spark, path, ["k"], from_version=v - 1, to_version=v)
        return d.agg(
            F.sum((F.col("change") == "added").cast("long")).alias("n_added"),
            F.sum((F.col("change") == "removed").cast("long")).alias(
                "n_removed"
            ),
            F.sum((F.col("change") == "changed").cast("long")).alias(
                "n_changed"
            ),
        )

    v0 = _stats(0).select(
        "version",
        "n",
        "sum_cents",
        F.col("n").alias("n_added"),
        F.lit(0).cast("long").alias("n_removed"),
        F.lit(0).cast("long").alias("n_changed"),
    )
    parts = [v0]
    for v in (1, 2):
        parts.append(_stats(v).crossJoin(_diff_counts(v)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "q_tx_changes",
    f"""
    WITH rows0 AS ({_TX_ROWS_SQL})
    SELECT k, status, cents FROM rows0 WHERE k % 5 = 1
    """,
)
def q_tx_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental change consumption (X110, r8 attestation):
    `table_changes(after_version=0, up_to=1)` reads EXACTLY the rows
    commit 1 appended — from exactly the files that commit added,
    never the table (the batch pole of the change feed; the
    streaming pole is the txtable source whose offsets are commit
    versions). The demo arc's v1 append is the k%5==1 slice, which
    the oracle states declaratively."""
    from bi_utils_spark.operators.txtable import table_changes

    path = _tx_demo_table(spark, sf_dir)
    return table_changes(spark, path, after_version=0, up_to=1).select(
        "k", "status", "cents"
    )


@register(
    "q_tx_skip",
    f"""
    WITH merged AS ({_TX_MERGED_SQL})
    SELECT k, status, cents FROM merged
    WHERE cents BETWEEN 5000000 AND 9000000
    """,
)
def q_tx_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map data skipping under the hard gate (X110, r8
    attestation): `read_table(skip={cents: (lo, hi)})` drops files
    whose footer min/max cannot intersect the range — I/O-ONLY
    pruning, so with the row predicate applied the result is
    byte-identical to the declarative filter over the merged
    snapshot. (File-level proof lives in test_txtable; this row
    proves result-invariance officially.)"""
    from bi_utils_spark.operators.txtable import read_table

    path = _tx_demo_table(spark, sf_dir)
    lo, hi = 5_000_000, 9_000_000
    return (
        read_table(spark, path, skip={"cents": (lo, hi)})
        .where(F.col("cents").between(lo, hi))
        .select("k", "status", "cents")
    )


@register(
    "q_tx_point",
    f"""
    WITH merged AS ({_TX_MERGED_SQL})
    SELECT k, status, cents FROM merged WHERE k = 41
    """,
)
def q_tx_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom point-lookup under the hard gate (X110, r8): build the
    per-file bloom index over the pk (incremental — after the first
    call the sidecar already covers every live file, so the rebuild
    scans nothing), then `read_table(point={k: 41})` prunes files
    whose filter PROVES the key absent. Pruning is I/O-only and the
    probe value re-renders through the column type (int vs bigint),
    so the filtered result equals the declarative point query.
    k=41 is k%10==1: an UPDATED key, so the row also witnesses the
    merge's doubled cents through the bloom-pruned path."""
    from bi_utils_spark.operators.txtable import (
        build_bloom_index,
        read_table,
    )

    path = _tx_demo_table(spark, sf_dir)
    build_bloom_index(spark, path, "k", only_new=True)
    return (
        read_table(spark, path, point={"k": 41})
        .where(F.col("k") == 41)
        .select("k", "status", "cents")
    )


@register(
    "q_tx_compact",
    f"""
    WITH rows0 AS ({_TX_ROWS_SQL})
    SELECT k, status, cents FROM rows0
    """,
)
def q_tx_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scoped compaction under the hard gate (X110, r8):
    a fragmented arc (create + two appends, status-partitioned) is
    folded by `compact_partitions` — only over-threshold partitions
    rewrite, the commit is a metadata swap — and the compacted
    snapshot must equal the declarative union of everything ever
    appended. (File-identity of healthy partitions and the no-op
    fast path are asserted in test_txtable; this row proves row
    content survives the rewrite officially.)"""
    from bi_utils_spark.operators import txtable as tx

    path = _tx_demo_dir(sf_dir) + "_compact"
    if tx.latest_version(path) < 3:
        rows = _tx_order_rows(spark, sf_dir)
        if tx.latest_version(path) < 0:
            tx.create_table(
                rows.where(F.col("k") % 5 >= 2),
                path,
                partition_cols=["status"],
            )
        if tx.latest_version(path) < 1:
            tx.append_table(rows.where(F.col("k") % 5 == 1), path)
        if tx.latest_version(path) < 2:
            tx.append_table(rows.where(F.col("k") % 5 == 0), path)
        if tx.latest_version(path) < 3:
            tx.compact_partitions(spark, path, max_files=1)
    return tx.read_table(spark, path).select("k", "status", "cents")


def _tx_restore_demo_table(spark: SparkSession, sf_dir: str) -> str:
    """Per-SF restore-arc fixture (idempotent, deterministic):
    v0 create (k%5>=2, status-partitioned) -> v1 append (k%5=1) ->
    v2 merge (same source as the merge arc) -> v3 RESTORE to v1
    (metadata-only re-point) -> v4 append (k%5=0, status 'Z') on top
    of the RESTORED snapshot."""
    from bi_utils_spark.operators import txtable as tx

    path = _tx_demo_dir(sf_dir) + "_restore"
    if tx.latest_version(path) >= 4:
        return path
    rows = _tx_order_rows(spark, sf_dir)
    if tx.latest_version(path) < 0:
        tx.create_table(
            rows.where(F.col("k") % 5 >= 2), path, partition_cols=["status"]
        )
    if tx.latest_version(path) < 1:
        tx.append_table(rows.where(F.col("k") % 5 == 1), path)
    if tx.latest_version(path) < 2:
        src = (
            rows.where(F.col("k") % 10 == 1)
            .withColumn("cents", F.col("cents") * 2)
            .unionByName(
                rows.where(F.col("k") % 5 == 0).withColumn(
                    "status", F.lit("N")
                )
            )
        )
        tx.merge_tx_table(spark, path, src, ["k"])
    if tx.latest_version(path) < 3:
        tx.restore_table(spark, path, 1)
    if tx.latest_version(path) < 4:
        tx.append_table(
            rows.where(F.col("k") % 5 == 0).withColumn(
                "status", F.lit("Z")
            ),
            path,
        )
    return path


@register(
    "q_tx_restore",
    f"""
    WITH rows0 AS ({_TX_ROWS_SQL}),
    v0 AS (SELECT * FROM rows0 WHERE k % 5 >= 2),
    v1 AS (SELECT * FROM rows0 WHERE k % 5 >= 1),
    src AS (
      SELECT k, status, cents * 2 AS cents FROM rows0 WHERE k % 10 = 1
      UNION ALL
      SELECT k, 'N' AS status, cents FROM rows0 WHERE k % 5 = 0
    ),
    v2 AS (
      SELECT COALESCE(s.k, t.k) AS k,
             COALESCE(s.status, t.status) AS status,
             COALESCE(s.cents, t.cents) AS cents
      FROM v1 t FULL OUTER JOIN src s ON t.k = s.k
    ),
    v4 AS (
      SELECT * FROM v1
      UNION ALL
      SELECT k, 'Z' AS status, cents FROM rows0 WHERE k % 5 = 0
    )
    SELECT 0 AS version, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS sum_cents FROM v0
    UNION ALL
    SELECT 1, CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT) FROM v1
    UNION ALL
    SELECT 2, CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT) FROM v2
    UNION ALL
    SELECT 3, CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT) FROM v1
    UNION ALL
    SELECT 4, CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT) FROM v4
    """,
)
def q_tx_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE as a commit (X110, r8): after a merge, `restore_table`
    re-points the live set to the pre-merge version as pure metadata
    (v3 == v1's files, nothing moved), the merge stays inspectable
    (v2 still resolves), and a subsequent append builds on the
    RESTORED snapshot (v4 = v1 + delta, the merge's effects gone).
    The oracle replays all five versions relationally — commit
    content is deterministic, so DuckDB derives each snapshot from
    the same set algebra the log fold encodes. A green row proves
    rollback semantics under the same hard gate as the merge and
    time-travel rows."""
    from bi_utils_spark.operators.txtable import read_table

    path = _tx_restore_demo_table(spark, sf_dir)
    parts = [
        read_table(spark, path, version=v).agg(
            F.lit(v).alias("version"),
            F.count("*").alias("n"),
            F.sum("cents").alias("sum_cents"),
        )
        for v in range(5)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "q_tx_zorder",
    f"""
    WITH rows0 AS ({_TX_ROWS_SQL})
    SELECT k, status, cents FROM rows0
    WHERE cents BETWEEN 5000000 AND 9000000
    """,
)
def q_tx_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scoped OPTIMIZE ZORDER under the hard gate (r9): a
    fragmented arc (create + three appends, status-partitioned) is
    compacted with `compact_partitions(zorder_by=["cents"])` — the
    r9 grouped topology range-partitions each hot partition along the
    Morton curve with bucket bounds derived from the MANIFEST's
    footer stats (no extra data pass), so the rewritten files carry
    selective zone maps. The read then goes through
    `read_table(skip=...)` + the row predicate: pruning is I/O-only,
    so the result must equal the declarative range filter over
    everything ever written — which the oracle states directly.
    (File-level selectivity and the exact per-partition file counts
    are asserted in test_txtable; this row proves result invariance
    through the zorder'd layout officially.)"""
    from bi_utils_spark.operators import txtable as tx

    path = _tx_demo_dir(sf_dir) + "_zorder"
    if tx.latest_version(path) < 4:
        rows = _tx_order_rows(spark, sf_dir)
        if tx.latest_version(path) < 0:
            tx.create_table(
                rows.where(F.col("k") % 4 == 0),
                path,
                partition_cols=["status"],
            )
        for m in (1, 2, 3):
            if tx.latest_version(path) < m:
                tx.append_table(rows.where(F.col("k") % 4 == m), path)
        if tx.latest_version(path) < 4:
            tx.compact_partitions(
                spark, path, max_files=1, target_files=2,
                zorder_by=["cents"],
            )
    lo, hi = 5_000_000, 9_000_000
    return (
        tx.read_table(spark, path, skip={"cents": (lo, hi)})
        .where(F.col("cents").between(lo, hi))
        .select("k", "status", "cents")
    )


def _tx_cdf_demo_table(spark: SparkSession, sf_dir: str) -> str:
    """Per-SF CDF-arc fixture (idempotent): v0 create (k%5>=2,
    status-partitioned) -> v1 append (k%5=1) -> v2 merge carrying all
    three clause kinds at once — updates (k%10=1, cents doubled),
    inserts (k%5=0 into the new 'N' partition), and deletes
    (k%10=6 via the delete flag)."""
    from bi_utils_spark.operators import txtable as tx

    path = _tx_demo_dir(sf_dir) + "_cdf"
    if tx.latest_version(path) >= 2:
        return path
    rows = _tx_order_rows(spark, sf_dir)
    if tx.latest_version(path) < 0:
        tx.create_table(
            rows.where(F.col("k") % 5 >= 2), path, partition_cols=["status"]
        )
    if tx.latest_version(path) < 1:
        tx.append_table(rows.where(F.col("k") % 5 == 1), path)
    if tx.latest_version(path) < 2:
        src = (
            rows.where(F.col("k") % 10 == 1)
            .withColumn("cents", F.col("cents") * 2)
            .unionByName(
                rows.where(F.col("k") % 5 == 0).withColumn(
                    "status", F.lit("N")
                )
            )
            .withColumn("__del", F.lit(False))
            .unionByName(
                rows.where(F.col("k") % 10 == 6).withColumn(
                    "__del", F.lit(True)
                )
            )
        )
        tx.merge_tx_table(spark, path, src, ["k"], delete_col="__del")
    return path


@register(
    "q_tx_cdf",
    f"""
    WITH rows0 AS ({_TX_ROWS_SQL})
    SELECT k, status, cents, 'insert' AS _change_type,
           CAST(0 AS BIGINT) AS _commit_version
    FROM rows0 WHERE k % 5 >= 2
    UNION ALL
    SELECT k, status, cents, 'insert', CAST(1 AS BIGINT)
    FROM rows0 WHERE k % 5 = 1
    UNION ALL
    SELECT k, status, cents * 2, 'update_postimage', CAST(2 AS BIGINT)
    FROM rows0 WHERE k % 10 = 1
    UNION ALL
    SELECT k, 'N', cents, 'insert', CAST(2 AS BIGINT)
    FROM rows0 WHERE k % 5 = 0
    UNION ALL
    SELECT k, status, cents, 'delete', CAST(2 AS BIGINT)
    FROM rows0 WHERE k % 10 = 6
    """,
)
def q_tx_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level change data feed over REWRITING commits (X110, r9):
    `table_changes_cdf` replays a create -> append -> merge(+delete)
    arc as typed change rows — per commit, the removed files are the
    pre-image and the genuinely-new files the post-image, pk-joined
    into insert / update_postimage / delete rows (deletes carry the
    PRE-image payload; rows a rewrite merely MOVED emit nothing).
    The Delta readChangeFeed analog over the manifest log; the oracle
    states every commit's net change declaratively, so a green row
    proves the classification AND the payload of all three change
    kinds at once. Cost per commit is the commit's own footprint —
    the feed's steady-state cost tracks the write rate, never the
    table."""
    from bi_utils_spark.operators.txtable import table_changes_cdf

    path = _tx_cdf_demo_table(spark, sf_dir)
    return table_changes_cdf(spark, path, ["k"], after_version=-1).select(
        "k", "status", "cents", "_change_type", "_commit_version"
    )


def _tx_cdc_demo_table(spark: SparkSession, sf_dir: str) -> str:
    """Per-SF COMMIT-TIME change-data arc fixture (idempotent, r10):
    v0 create (k%5>=2, status-partitioned) -> v1 enable_change_data ->
    v2 append (k%5=1) -> v3 merge (updates k%10=1 cents doubled,
    inserts k%5=0 into 'N', deletes k%10=6) -> v4 MOR UPDATE
    (k%10=2, cents+7). The merge and update commits persist their
    typed rows as _change_data files (the Delta
    enableChangeDataFeed pattern), so the feed below reads as a pure
    scan — NO pks passed anywhere."""
    from bi_utils_spark.operators import txtable as tx

    path = _tx_demo_dir(sf_dir) + "_cdc"
    if tx.latest_version(path) >= 4:
        return path
    rows = _tx_order_rows(spark, sf_dir)
    if tx.latest_version(path) < 0:
        tx.create_table(
            rows.where(F.col("k") % 5 >= 2), path, partition_cols=["status"]
        )
    if tx.latest_version(path) < 1:
        tx.enable_change_data(path)
    if tx.latest_version(path) < 2:
        tx.append_table(rows.where(F.col("k") % 5 == 1), path)
    if tx.latest_version(path) < 3:
        src = (
            rows.where(F.col("k") % 10 == 1)
            .withColumn("cents", F.col("cents") * 2)
            .unionByName(
                rows.where(F.col("k") % 5 == 0).withColumn(
                    "status", F.lit("N")
                )
            )
            .withColumn("__del", F.lit(False))
            .unionByName(
                rows.where(F.col("k") % 10 == 6).withColumn(
                    "__del", F.lit(True)
                )
            )
        )
        tx.merge_tx_table(spark, path, src, ["k"], delete_col="__del")
    if tx.latest_version(path) < 4:
        tx.update_table(
            spark, path, "k % 10 = 2", {"cents": "cents + 7"}, mode="mor"
        )
    return path


@register(
    "q_tx_cdc",
    f"""
    WITH rows0 AS ({_TX_ROWS_SQL})
    SELECT k, status, cents, 'insert' AS _change_type,
           CAST(0 AS BIGINT) AS _commit_version
    FROM rows0 WHERE k % 5 >= 2
    UNION ALL
    SELECT k, status, cents, 'insert', CAST(2 AS BIGINT)
    FROM rows0 WHERE k % 5 = 1
    UNION ALL
    SELECT k, status, cents * 2, 'update_postimage', CAST(3 AS BIGINT)
    FROM rows0 WHERE k % 10 = 1
    UNION ALL
    SELECT k, 'N', cents, 'insert', CAST(3 AS BIGINT)
    FROM rows0 WHERE k % 5 = 0
    UNION ALL
    SELECT k, status, cents, 'delete', CAST(3 AS BIGINT)
    FROM rows0 WHERE k % 10 = 6
    UNION ALL
    SELECT k, status, cents + 7, 'update_postimage', CAST(4 AS BIGINT)
    FROM rows0 WHERE k % 10 = 2
    """,
)
def q_tx_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMMIT-TIME change data (X110, r10 — the Delta
    ``enableChangeDataFeed`` / ``_change_data`` analog): the same
    create -> append -> merge -> row-level UPDATE arc as `q_tx_cdf`,
    but every rewriting commit PERSISTED its typed change rows at
    commit time, so this feed is read with NO primary keys at all —
    `table_changes_cdf(path)` — as a pure scan of the recorded
    change files (appends derive their inserts from the added files,
    as before). A green row proves the writer-side classification
    (merge join, update pre/post pairing) matches the declaratively
    stated net change of every commit, row for row — the done
    criterion for replacing the read-time pk-join with commit-time
    recording. At 100 TB the feed's stream pole ships one task per
    change file (see test_txcdc), closing the r9 single-task
    verdict."""
    from bi_utils_spark.operators.txtable import table_changes_cdf

    path = _tx_cdc_demo_table(spark, sf_dir)
    return table_changes_cdf(spark, path, after_version=-1).select(
        "k", "status", "cents", "_change_type", "_commit_version"
    )


def _tx_ow_demo_table(spark: SparkSession, sf_dir: str) -> str:
    """Per-SF blind-rewrite feed fixture (idempotent, r10): v0 create
    (k%3=0) -> v1 OVERWRITE (k%3<=1, cents+5) -> v2 RESTORE to v0.
    Neither commit records change data and the feed is read with NO
    pks — blind rewrites render join-free as delete-all+insert-all,
    the Delta overwrite readChangeFeed shape."""
    from bi_utils_spark.operators import txtable as tx

    path = _tx_demo_dir(sf_dir) + "_ow"
    if tx.latest_version(path) >= 2:
        return path
    rows = _tx_order_rows(spark, sf_dir)
    if tx.latest_version(path) < 0:
        tx.create_table(rows.where(F.col("k") % 3 == 0), path)
    if tx.latest_version(path) < 1:
        tx.overwrite_table(
            rows.where(F.col("k") % 3 <= 1).withColumn(
                "cents", F.col("cents") + 5
            ),
            path,
        )
    if tx.latest_version(path) < 2:
        tx.restore_table(spark, path, version=0)
    return path


@register(
    "q_tx_ow_cdf",
    f"""
    WITH rows0 AS ({_TX_ROWS_SQL})
    SELECT k, status, cents, 'insert' AS _change_type,
           CAST(0 AS BIGINT) AS _commit_version
    FROM rows0 WHERE k % 3 = 0
    UNION ALL
    SELECT k, status, cents, 'delete', CAST(1 AS BIGINT)
    FROM rows0 WHERE k % 3 = 0
    UNION ALL
    SELECT k, status, cents + 5, 'insert', CAST(1 AS BIGINT)
    FROM rows0 WHERE k % 3 <= 1
    UNION ALL
    SELECT k, status, cents + 5, 'delete', CAST(2 AS BIGINT)
    FROM rows0 WHERE k % 3 <= 1
    UNION ALL
    SELECT k, status, cents, 'insert', CAST(2 AS BIGINT)
    FROM rows0 WHERE k % 3 = 0
    """,
)
def q_tx_ow_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pk-less BLIND-REWRITE change feed (r10): an overwrite and a
    restore replay with NO primary keys and NO commit-time change
    data — every removed live row reads back as a delete and every
    genuinely-new row as an insert, join-free (the Delta overwrite
    readChangeFeed rendering; a pk'd feed refines the same commits
    into update rows). The oracle states each commit's net change
    declaratively, so a green row pins the rendering's classification
    AND payloads across both blind verbs, including restore's
    re-added-file inserts."""
    from bi_utils_spark.operators.txtable import table_changes_cdf

    path = _tx_ow_demo_table(spark, sf_dir)
    return table_changes_cdf(spark, path, after_version=-1).select(
        "k", "status", "cents", "_change_type", "_commit_version"
    )


def _tx_dv_demo_table(spark: SparkSession, sf_dir: str) -> str:
    """Per-SF deletion-vector arc fixture (idempotent): v0 create
    (ALL order rows, status-partitioned) -> v1 MOR delete (k%7=0 —
    sidecar masks across every partition, no file rewritten) -> v2
    MOR delete (k%10=3 — unions onto v1's sidecars) -> v3 COW delete
    (k%10=4 in status 'P' — file-granularity rewrite of only the hit
    files). The final snapshot deliberately MIXES masked files, a
    rewritten partition, and untouched files, so the read exercises
    both reader legs plus their union."""
    from bi_utils_spark.operators import txtable as tx

    path = _tx_demo_dir(sf_dir) + "_dv"
    if tx.latest_version(path) >= 3:
        return path
    rows = _tx_order_rows(spark, sf_dir)
    if tx.latest_version(path) < 0:
        tx.create_table(rows, path, partition_cols=["status"])
    if tx.latest_version(path) < 1:
        tx.delete_from_table(spark, path, F.col("k") % 7 == 0)
    if tx.latest_version(path) < 2:
        tx.delete_from_table(spark, path, F.col("k") % 10 == 3)
    if tx.latest_version(path) < 3:
        tx.delete_from_table(
            spark,
            path,
            (F.col("k") % 10 == 4) & (F.col("status") == "P"),
            mode="cow",
        )
    return path


@register(
    "q_tx_delete",
    f"""
    WITH rows0 AS ({_TX_ROWS_SQL}),
    v1 AS (SELECT * FROM rows0 WHERE NOT (k % 7 = 0)),
    v2 AS (SELECT * FROM v1 WHERE NOT (k % 10 = 3)),
    v3 AS (SELECT * FROM v2 WHERE NOT (k % 10 = 4 AND status = 'P'))
    SELECT 1 AS version, k, status, cents FROM v1
    UNION ALL
    SELECT 2 AS version, k, status, cents FROM v2
    UNION ALL
    SELECT 3 AS version, k, status, cents FROM v3
    """,
)
def q_tx_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE with merge-on-read deletion vectors (X110,
    r9): two MOR deletes mask rows in per-file DV sidecars — zero
    data files rewritten, the 100 TB delete shape — then a COW delete
    rewrites only the files its predicate hits. Reading versions 1-3
    proves (a) the DV anti-join read path (masked + plain legs
    unioned) equals the declarative filter, (b) sidecar UNION
    semantics across stacked deletes, and (c) time travel resolves
    every intermediate DV pointer — all value-level against the
    oracle's nested NOT-filters. Delta-protocol deletion-vector
    analog; design per the public spec, engine re-derived on parquet
    `_metadata.row_index`."""
    from bi_utils_spark.operators.txtable import read_table

    path = _tx_dv_demo_table(spark, sf_dir)
    parts = [
        read_table(spark, path, version=v).select(
            F.lit(v).alias("version"), "k", "status", "cents"
        )
        for v in (1, 2, 3)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "q_tx_dv_cdf",
    f"""
    WITH rows0 AS ({_TX_ROWS_SQL})
    SELECT k, status, cents, 'delete' AS _change_type,
           CAST(1 AS BIGINT) AS _commit_version
    FROM rows0 WHERE k % 7 = 0
    UNION ALL
    SELECT k, status, cents, 'delete', CAST(2 AS BIGINT)
    FROM rows0 WHERE k % 10 = 3 AND NOT (k % 7 = 0)
    UNION ALL
    SELECT k, status, cents, 'delete', CAST(3 AS BIGINT)
    FROM rows0
    WHERE k % 10 = 4 AND status = 'P'
      AND NOT (k % 7 = 0) AND NOT (k % 10 = 3)
    """,
)
def q_tx_dv_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed over deletion-vector commits (X110, r9): a
    MOR delete emits exactly its NEWLY masked rows (new sidecar minus
    previous, diffed in executors, payloads via one LEFT SEMI join on
    physical row addresses) — re-deleted rows never re-emit; the COW
    delete flows through the generic pre/post join. The oracle
    states each commit's delete set declaratively with the
    prior-delete exclusions, so a green row proves exactly-once
    delete emission across stacked MOR deletes AND payload fidelity
    of masked rows."""
    from bi_utils_spark.operators.txtable import table_changes_cdf

    path = _tx_dv_demo_table(spark, sf_dir)
    return table_changes_cdf(spark, path, ["k"], after_version=0).select(
        "k", "status", "cents", "_change_type", "_commit_version"
    )


@register(
    "q_tx_update",
    f"""
    WITH rows0 AS ({_TX_ROWS_SQL}),
    v1 AS (
      SELECT k, status,
             CASE WHEN k % 9 = 2 THEN cents * 2 ELSE cents END AS cents
      FROM rows0
    ),
    v2 AS (
      SELECT k, status,
             CASE WHEN status = 'O' AND k % 9 = 5 THEN cents + 7
                  ELSE cents END AS cents
      FROM v1
    )
    SELECT 1 AS version, k, status, cents FROM v1
    UNION ALL
    SELECT 2 AS version, k, status, cents FROM v2
    """,
)
def q_tx_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level UPDATE (X111, r9): a merge-on-read update masks the
    matched rows via deletion vectors and stages their post-images in
    ONE commit — cost is the matched rows, not a rewrite of every
    touched file — then a copy-on-write update rewrites only hit
    files in place. Reading both versions proves the MOR read path
    (mask + post-image union), the stacked-DV interplay, and time
    travel through an update — value-level against the oracle's CASE
    projections. Completes the DML verb set (INSERT/MERGE/DELETE/
    UPDATE) on the manifest-log tier."""
    from bi_utils_spark.operators import txtable as tx

    path = _tx_demo_dir(sf_dir) + "_upd"
    if tx.latest_version(path) < 2:
        rows = _tx_order_rows(spark, sf_dir)
        if tx.latest_version(path) < 0:
            tx.create_table(rows, path, partition_cols=["status"])
        if tx.latest_version(path) < 1:
            tx.update_table(
                spark, path, F.col("k") % 9 == 2, {"cents": "cents * 2"}
            )
        if tx.latest_version(path) < 2:
            tx.update_table(
                spark,
                path,
                (F.col("status") == "O") & (F.col("k") % 9 == 5),
                {"cents": "cents + 7"},
                mode="cow",
            )
    parts = [
        tx.read_table(spark, path, version=v).select(
            F.lit(v).alias("version"), "k", "status", "cents"
        )
        for v in (1, 2)
    ]
    return parts[0].unionByName(parts[1])


@register(
    "q_tx_rename",
    f"""
    WITH rows0 AS ({_TX_ROWS_SQL})
    SELECT k, status,
           CASE WHEN k % 11 = 4 THEN cents + 1 ELSE cents END AS amount
    FROM rows0
    """,
)
def q_tx_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only column RENAME via column mapping (X111, r9):
    every column carries a stable PHYSICAL name (what the parquet
    bytes are keyed by), so renaming relabels the manifest in commit
    time — zero files rewritten. The arc reads files written BEFORE
    the rename (physical name 'cents'), files appended AFTER it
    (still written as 'cents' physically, labeled 'amount'), and a
    MOR update flowing through the new label — one result under the
    final schema, stated declaratively by the oracle. The Delta
    column-mapping 'name' mode analog."""
    from bi_utils_spark.operators import txtable as tx

    path = _tx_demo_dir(sf_dir) + "_ren"
    if tx.latest_version(path) < 3:
        rows = _tx_order_rows(spark, sf_dir)
        if tx.latest_version(path) < 0:
            tx.create_table(
                rows.where(F.col("k") % 3 > 0),
                path,
                partition_cols=["status"],
            )
        if tx.latest_version(path) < 1:
            tx.rename_column(path, "cents", "amount")
        if tx.latest_version(path) < 2:
            tx.append_table(
                rows.where(F.col("k") % 3 == 0).withColumnRenamed(
                    "cents", "amount"
                ),
                path,
            )
        if tx.latest_version(path) < 3:
            tx.update_table(
                spark, path, F.col("k") % 11 == 4, {"amount": "amount + 1"}
            )
    return tx.read_table(spark, path).select("k", "status", "amount")


@register(
    "q_tx_clone",
    f"""
    WITH rows0 AS ({_TX_ROWS_SQL}),
    v1 AS (SELECT * FROM rows0 WHERE NOT (k % 7 = 0)),
    v2 AS (SELECT * FROM v1 WHERE NOT (k % 10 = 3)),
    v3 AS (SELECT * FROM v2 WHERE NOT (k % 10 = 4 AND status = 'P'))
    SELECT k, status, cents FROM v3 WHERE NOT (k % 10 = 8)
    """,
)
def q_tx_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-copy SHALLOW CLONE (X111, r9): the deletion-vector arc's
    final snapshot clones in metadata time — commit 0 references the
    source's files AND deletion-vector sidecars in place, nothing
    copied — then the clone DIVERGES with its own MOR delete
    (k%10=8). Reading the clone proves (a) borrowed files + borrowed
    DVs resolve through relative paths, (b) the clone's own commits
    compose on top, and (c) the source is untouched (its fixture
    re-attests under q_tx_delete in the same run). The Delta CLONE
    analog — the dev/test branch-and-discard workflow verb."""
    from bi_utils_spark.operators import txtable as tx

    src = _tx_dv_demo_table(spark, sf_dir)
    dst = _tx_demo_dir(sf_dir) + "_dvclone"
    if tx.latest_version(dst) < 0:
        tx.clone_table(spark, src, dst)
    if tx.latest_version(dst) < 1:
        tx.delete_from_table(spark, dst, F.col("k") % 10 == 8)
    return tx.read_table(spark, dst).select("k", "status", "cents")


@register(
    "q_tx_stats",
    f"""
    WITH rows0 AS ({_TX_ROWS_SQL}),
    v1 AS (SELECT * FROM rows0 WHERE NOT (k % 7 = 0)),
    v2 AS (SELECT * FROM v1 WHERE NOT (k % 10 = 3)),
    v3 AS (SELECT * FROM v2 WHERE NOT (k % 10 = 4 AND status = 'P'))
    SELECT CAST(0 AS BIGINT) AS version, 'all' AS scope,
           CAST(COUNT(*) AS BIGINT) AS num_rows,
           CAST(MIN(cents) AS BIGINT) AS cents_min,
           CAST(MAX(cents) AS BIGINT) AS cents_max
    FROM rows0
    UNION ALL
    SELECT 1, 'all', CAST(COUNT(*) AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM v1
    UNION ALL
    SELECT 2, 'all', CAST(COUNT(*) AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM v2
    UNION ALL
    SELECT 3, 'all', CAST(COUNT(*) AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM v3
    UNION ALL
    SELECT 3, 'P', CAST(COUNT(*) AS BIGINT),
           CAST(MIN(cents) AS BIGINT), CAST(MAX(cents) AS BIGINT)
    FROM v3 WHERE status = 'P'
    UNION ALL
    SELECT 3, 'O', CAST(COUNT(*) AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
    FROM v3 WHERE status = 'O'
    """,
)
def q_tx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only statistics (X113, r9): COUNT(*) across the
    deletion-vector arc's four versions — and a partition-scoped
    count — answered from the manifest fold alone, ZERO data files
    opened (the Delta metadata-only-query analog; on a 100 TB table
    this is driver milliseconds vs a full scan). Counts stay exact
    under merge-on-read deletes because sidecars record exact
    cardinality; column min/max is reported only when provably exact
    (every live file contributes a zone map and none carries a DV) —
    version 0 qualifies, the DV'd versions honestly return NULL
    rather than a zone-map bound presented as a value. Version 3's
    two partition-scoped rows split exactly on that gate: the COW
    delete rewrote every 'P' file (fresh zone maps, no DVs — exact
    min/max again) while 'O' still carries the earlier MOR sidecars
    (NULL). The oracle states every count declaratively, so a green
    row proves the manifest row-count arithmetic, the DV cardinality
    subtraction, the partition-filter scoping, and the exactness
    gate at once."""
    from bi_utils_spark.operators.txtable import table_stats

    path = _tx_dv_demo_table(spark, sf_dir)
    rows = []
    for version, scope, pf in [
        (0, "all", None),
        (1, "all", None),
        (2, "all", None),
        (3, "all", None),
        (3, "P", {"status": "P"}),
        (3, "O", {"status": "O"}),
    ]:
        st = table_stats(
            path, version=version, columns=["cents"], partition_filter=pf
        )
        mm = st["columns"]["cents"]
        rows.append(
            (
                version,
                scope,
                st["num_rows"],
                mm["min"] if mm else None,
                mm["max"] if mm else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "version bigint, scope string, num_rows bigint, "
        "cents_min bigint, cents_max bigint",
    )


@register(
    "q_tx_generated",
    """
    WITH rows0 AS (
      SELECT o_orderkey AS k, o_orderdate AS d,
             CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents
      FROM orders
    ),
    upd AS (
      SELECT k, d,
             CASE WHEN k % 10 = 1 THEN cents * 2 ELSE cents END AS cents
      FROM rows0
    )
    SELECT k, CAST(year(d) AS INTEGER) AS y, cents
    FROM upd
    WHERE d BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                AND TIMESTAMP '1996-12-31 23:59:59'
    """,
)
def q_tx_generated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERATED columns with derived partition pruning (X114, r9):
    the table is partitioned by ``y = year(d)`` which no writer ever
    supplies — create computes it, append computes it, the MOR update
    recomputes it on post-images — and the read filters ONLY on the
    base timestamp ``d``. The range on ``d`` extends through the
    monotone generated expression to a range on ``y``, which prunes
    partitions at the MANIFEST level (a partition value is an exact
    zone map): the 100 TB ``partition by date, filter by timestamp``
    pattern with no user-visible denormalization, the Delta
    generated-column pruning analog. The oracle restates table
    contents and filter declaratively, proving compute-on-write,
    recompute-on-update, and that pruning dropped no qualifying
    row."""
    from bi_utils_spark.operators import txtable as tx

    path = _tx_demo_dir(sf_dir) + "_gen"
    if tx.latest_version(path) < 2:
        rows = load(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderdate").alias("d"),
            F.floor(F.col("o_totalprice") * F.lit(100.0))
            .cast("long")
            .alias("cents"),
        )
        if tx.latest_version(path) < 0:
            tx.create_table(
                rows.where(F.col("k") % 3 > 0),
                path,
                partition_cols=["y"],
                generated={"y": "year(d)"},
            )
        if tx.latest_version(path) < 1:
            tx.append_table(rows.where(F.col("k") % 3 == 0), path)
        if tx.latest_version(path) < 2:
            tx.update_table(
                spark, path, F.col("k") % 10 == 1, {"cents": "cents * 2"}
            )
    return tx.read_table(
        spark,
        path,
        where="d BETWEEN '1995-01-01 00:00:00' AND '1996-12-31 23:59:59'",
    ).select("k", "y", "cents")


@register(
    "q_tx_identity",
    f"""
    WITH rows0 AS ({_TX_ROWS_SQL}),
    live12 AS (SELECT * FROM rows0 WHERE NOT k % 7 = 0),
    b3 AS (SELECT * FROM rows0 WHERE k % 5 = 2)
    SELECT
      CAST((SELECT COUNT(*) FROM live12)
           + (SELECT COUNT(*) FROM b3) AS BIGINT) AS n_rows,
      CAST((SELECT COUNT(*) FROM live12)
           + (SELECT COUNT(*) FROM b3) AS BIGINT) AS n_distinct,
      CAST((SELECT COUNT(*) FROM rows0)
           + (SELECT COUNT(*) FROM b3) AS BIGINT) AS max_id,
      CAST((SELECT COUNT(*) FROM b3) AS BIGINT) AS n_above
    """,
)
def q_tx_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTITY columns (X115, r9): GENERATED ALWAYS surrogate keys
    allocated contiguously above the log's high-water mark with no
    global sort — create takes ids 1..n0, the second append continues
    at n0+1, a MOR delete retires rows WITHOUT freeing their ids, and
    the third append starts above the mark regardless. Assignment
    order across partitions is deliberately unspecified (the Delta
    identity contract), so the oracle pins the order-free invariants:
    every live row has an id, all distinct, the maximum equals TOTAL
    EVER ALLOCATED (proving post-delete allocation never reuses), and
    exactly the last batch sits above the pre-delete mark."""
    from bi_utils_spark.operators import txtable as tx

    path = _tx_demo_dir(sf_dir) + "_ident"
    rows = _tx_order_rows(spark, sf_dir)
    if tx.latest_version(path) < 0:
        tx.create_table(
            rows.where(F.col("k") % 2 == 0),
            path,
            identity={"id": {"start": 1, "step": 1}},
        )
    if tx.latest_version(path) < 1:
        tx.append_table(rows.where(F.col("k") % 2 == 1), path)
    if tx.latest_version(path) < 2:
        tx.delete_from_table(spark, path, F.col("k") % 7 == 0)
    if tx.latest_version(path) < 3:
        tx.append_table(rows.where(F.col("k") % 5 == 2), path)
    n_pre = rows.count()  # ids allocated before the third append
    return tx.read_table(spark, path).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.countDistinct("id").cast("long").alias("n_distinct"),
        F.max("id").cast("long").alias("max_id"),
        F.sum(
            F.when(F.col("id") > n_pre, 1).otherwise(0)
        ).cast("long").alias("n_above"),
    )


@register(
    "q_tx_evolve",
    f"""
    WITH rows0 AS ({_TX_ROWS_SQL})
    SELECT CAST(k AS INTEGER) AS k, status,
           CASE WHEN k % 3 = 0 THEN cents * 1000
                ELSE cents % 1000000 END AS amount,
           CASE WHEN k % 3 = 0 THEN 'n' || CAST(k AS VARCHAR)
                ELSE NULL END AS note
    FROM rows0
    """,
)
def q_tx_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-time schema evolution (X116, r9): the arc creates an
    INT amount column, WIDENS it to BIGINT (`widen_column_type` — one
    JSON commit, Spark's parquet reader upcasts the narrow files'
    physical values at scan), ADDs a string column
    (`add_column` — old files null-fill), then appends rows that
    need both (amounts beyond int32, notes populated). One read under
    the final schema must see the narrow-era rows upcast, the
    pre-ADD rows as NULL, and the new rows verbatim — the oracle
    states all three eras declaratively. Zero files rewritten by
    either ALTER."""
    from bi_utils_spark.operators import txtable as tx

    path = _tx_demo_dir(sf_dir) + "_evolve"
    if tx.latest_version(path) < 3:
        rows = _tx_order_rows(spark, sf_dir)
        if tx.latest_version(path) < 0:
            tx.create_table(
                rows.where(F.col("k") % 3 > 0).select(
                    F.col("k").cast("int").alias("k"),
                    "status",
                    (F.col("cents") % 1000000)
                    .cast("int")
                    .alias("amount"),
                ),
                path,
                partition_cols=["status"],
            )
        if tx.latest_version(path) < 1:
            tx.widen_column_type(path, "amount", "bigint")
        if tx.latest_version(path) < 2:
            tx.add_column(path, "note", "string")
        if tx.latest_version(path) < 3:
            tx.append_table(
                rows.where(F.col("k") % 3 == 0).select(
                    F.col("k").cast("int").alias("k"),
                    "status",
                    (F.col("cents") * 1000).alias("amount"),
                    F.concat(
                        F.lit("n"), F.col("k").cast("string")
                    ).alias("note"),
                ),
                path,
            )
    return tx.read_table(spark, path).select("k", "status", "amount", "note")


@register(
    "q_tx_respec",
    f"""
    WITH rows0 AS ({_TX_ROWS_SQL})
    SELECT k, status,
           CASE WHEN k % 10 = 3 THEN cents * 2 ELSE cents END AS cents,
           CAST(k % 5 AS INTEGER) AS bucket
    FROM rows0
    WHERE k % 5 = 3
    """,
)
def q_tx_respec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION EVOLUTION (X118, r9 — the Iceberg analog Delta
    lacks): the table is created partitioned by status, respec'd to
    bucket in ONE metadata commit (zero files rewritten), appended
    under the new spec, then a MOR UPDATE masks rows across BOTH
    spec eras. The read scopes to ``partition_filter={"bucket": 3}``:
    new-spec files prune at the manifest, old-spec files survive
    fail-open (bucket is plain data there) and the automatic
    row-level filter scopes them — so a green row proves the respec
    commit, mixed-spec unioned reads, manifest-prune + row-filter
    equivalence, and deletion-vector masking across spec eras, all
    against the oracle's declarative restatement."""
    from bi_utils_spark.operators import txtable as tx

    path = _tx_demo_dir(sf_dir) + "_respec"
    if tx.latest_version(path) < 3:
        rows = _tx_order_rows(spark, sf_dir).withColumn(
            "bucket", (F.col("k") % 5).cast("int")
        )
        if tx.latest_version(path) < 0:
            tx.create_table(
                rows.where(F.col("k") % 2 == 0),
                path,
                partition_cols=["status"],
            )
        if tx.latest_version(path) < 1:
            tx.repartition_table(path, ["bucket"])
        if tx.latest_version(path) < 2:
            tx.append_table(rows.where(F.col("k") % 2 == 1), path)
        if tx.latest_version(path) < 3:
            tx.update_table(
                spark, path, F.col("k") % 10 == 3, {"cents": "cents * 2"}
            )
    return tx.read_table(
        spark, path, partition_filter={"bucket": 3}
    ).select("k", "status", "cents", "bucket")


from bi_utils_spark.operators.fim import fim_oracle_sql as _fim_sql  # noqa: E402


@register(
    "q_fim",
    _fim_sql("documents", "doc_id", "text", rate=0.5),
)
def q_fim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-Middle transformation (X119, r9): a deterministic
    half of the corpus rewrites to the PSM layout
    ``<PRE> prefix <SUF> suffix <MID> middle`` with md5-derived cut
    points — map-only column arithmetic that fuses into the feeding
    scan, zero Python, zero shuffle, re-run/retry stable by
    construction. The oracle SQL is generated from the SAME module
    (`fim_oracle_sql`) so the two derivations cannot drift; a green
    row proves gating, cut-point selection, and all three splice
    segments byte-for-byte across every document."""
    from bi_utils_spark.operators.fim import fim_transform

    docs = load(spark, sf_dir, "documents")
    return fim_transform(docs, "doc_id", "text", rate=0.5).select(
        "doc_id", "fim_text", "fim_text_applied"
    )


def raw_tx_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The honest MOR DELETE wall (bench-only): each repeat resets a
    scratch tx table via metadata-only RESTORE (+ vacuum, which also
    reclaims the prior repeat's sidecars), then times
    `delete_from_table` end-to-end — predicate scan with physical
    row addresses, executor-side position packing, sidecar write,
    commit. The registry row `q_tx_delete` times reads of the
    pre-built fixture (its oracle proves delete CORRECTNESS); this
    row is the delete COST."""
    from bi_utils_spark.operators import txtable as tx

    path = _tx_demo_dir(sf_dir) + "_rawdelete"
    rows = _tx_order_rows(spark, sf_dir)
    if tx.latest_version(path) < 0:
        tx.create_table(rows, path, partition_cols=["status"])
    else:
        tx.restore_table(spark, path, 0)
        tx.vacuum_table(path, retain_versions=1, stray_age_seconds=0.0)
    tx.delete_from_table(spark, path, F.col("k") % 7 == 0)
    return tx.read_table(spark, path).groupBy("status").agg(
        F.count("*").alias("n"), F.sum("cents").alias("sum_cents")
    )


def raw_tx_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The honest MERGE wall (bench-only): each repeat resets a
    scratch tx table to its base snapshot via a metadata-only
    RESTORE (plus a vacuum so repeat files don't accumulate), then
    times `merge_tx_table`'s full copy-on-write path — source
    partition discovery, touched-partition read, merge fold, stage
    write, commit. The registry row `q_tx_merge_table` times a READ
    of the pre-built fixture (its oracle proves merge CORRECTNESS);
    this row is the merge COST, the split the capped near-dup
    variants established."""
    from bi_utils_spark.operators import txtable as tx

    path = _tx_demo_dir(sf_dir) + "_rawmerge"
    rows = _tx_order_rows(spark, sf_dir)
    if tx.latest_version(path) < 0:
        tx.create_table(
            rows.where(F.col("k") % 5 >= 1), path, partition_cols=["status"]
        )
    else:
        tx.restore_table(spark, path, 0)
        tx.vacuum_table(path, retain_versions=1, stray_age_seconds=0.0)
    src = (
        rows.where(F.col("k") % 10 == 1)
        .withColumn("cents", F.col("cents") * 2)
        .unionByName(
            rows.where(F.col("k") % 5 == 0).withColumn("status", F.lit("N"))
        )
    )
    tx.merge_tx_table(spark, path, src, ["k"])
    return tx.read_table(spark, path).groupBy("status").agg(
        F.count("*").alias("n"), F.sum("cents").alias("sum_cents")
    )


# ===========================================================================
# r11: the five formerly BENCH-only rows, promoted into the oracle
# registry (r10 verdict task 3). The three capped near-dup variants
# get bound attestations in the q_pq_topk discipline — the query runs
# the CAPPED operator and its ground truth and pins the recall flag
# (caps structurally cannot add pairs: they only drop candidates and
# verification stays exact, so the zero-extras column is a hard
# invariant, not a measurement). The two raw tx arcs get direct SQL
# oracles — their group-by summaries are exactly the registry twins'
# merged/deleted relations re-aggregated.
# ===========================================================================


@register(
    "q_iceberg_export",
    f"""
    WITH rows0 AS ({_TX_ROWS_SQL}),
    live AS (SELECT * FROM rows0 WHERE k % 9 <> 5)
    SELECT status, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS sum_amount
    FROM live GROUP BY status
    """,
)
def q_iceberg_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-format metadata export arc (r10 verdict task 1,
    operators/iceberg.py): create partitioned -> append -> RENAME a
    column (column mapping, the case write_symlink_manifest refuses)
    -> merge-on-read DELETE (deletion vectors, the other refused
    case) -> export with materialize=True -> read the table back THE
    ICEBERG WAY (version-hint -> metadata.json -> manifest-list ->
    manifests; partition values from the manifest, physical->logical
    projection from the exported schema.name-mapping.default) and
    aggregate. DuckDB recomputes the expected content from orders, so
    a hash match pins export == log fold across rename + DVs."""
    import shutil

    from bi_utils_spark.operators import txtable as tx
    from bi_utils_spark.operators.iceberg import (
        export_iceberg_metadata,
        read_iceberg_export,
    )

    path = _tx_demo_dir(sf_dir) + "_iceberg"
    if os.path.isdir(path):
        shutil.rmtree(path)  # full rebuild: the arc IS the fixture
    rows = _tx_order_rows(spark, sf_dir)
    tx.create_table(
        rows.where(F.col("k") % 4 != 3), path, partition_cols=["status"]
    )
    tx.append_table(rows.where(F.col("k") % 4 == 3), path)
    tx.rename_column(path, "cents", "amount")
    tx.delete_from_table(spark, path, "k % 9 = 5", mode="mor")
    export_iceberg_metadata(path, spark=spark, materialize=True)
    export = read_iceberg_export(path)
    phys = export["physical_of"]
    logical = [f["name"] for f in export["schema_fields"]]
    by_part: dict[str, list[str]] = {}
    for f in export["files"]:
        by_part.setdefault(f["partition"]["status"], []).append(f["path"])
    parts = []
    for status_v, paths in sorted(by_part.items()):
        df = spark.read.parquet(*paths)
        cols = [
            F.lit(status_v).alias(c)
            if c == "status"  # identity partition value from the manifest
            else F.col(phys[c]).alias(c)
            for c in logical
        ]
        parts.append(df.select(*cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("status").agg(
        F.count("*").alias("n"),
        F.sum("amount").cast("long").alias("sum_amount"),
    )


@register(
    "q_sql_dml_arc",
    f"""
    WITH rows0 AS ({_TX_ROWS_SQL}),
    base AS (SELECT * FROM rows0 WHERE k % 5 >= 1),
    ins AS (SELECT k, status, cents FROM rows0
            WHERE k % 5 = 0 AND k % 10 <> 0),
    after_ins AS (SELECT * FROM base UNION ALL SELECT * FROM ins),
    after_upd AS (
      SELECT k, status,
             CASE WHEN k % 3 = 0 THEN cents + 7 ELSE cents END AS cents
      FROM after_ins),
    after_del AS (SELECT * FROM after_upd WHERE NOT (k % 11 = 4)),
    src AS (
      SELECT k, status, cents * 2 AS cents, k % 13 = 2 AS is_del
      FROM rows0 WHERE k % 10 = 1
      UNION ALL
      SELECT k, 'N' AS status, cents, k % 13 = 2 AS is_del
      FROM rows0 WHERE k % 10 = 0
    ),
    merged AS (
      SELECT COALESCE(s.k, t.k) AS k,
             COALESCE(s.status, t.status) AS status,
             COALESCE(s.cents, t.cents) AS cents,
             COALESCE(s.is_del, FALSE) AS is_del
      FROM after_del t FULL OUTER JOIN src s ON t.k = s.k
    ),
    final AS (SELECT k, status, cents FROM merged WHERE NOT is_del),
    cur AS (SELECT status, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(cents) AS BIGINT) AS sum_cents
            FROM final GROUP BY status),
    v0 AS (SELECT CAST(count(*) AS BIGINT) AS n0 FROM base)
    SELECT cur.status, cur.n, cur.sum_cents, v0.n0
    FROM cur CROSS JOIN v0
    """,
)
def q_sql_dml_arc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-string DML front-end arc (r10 verdict task 2,
    operators/sqldml.py): the write-side completion of the
    reference's S1/S2 script semantics (`utils.py:265-290`) — INSERT,
    UPDATE, DELETE, MERGE (upsert + flagged delete), and a VERSION AS
    OF read, every step driven purely through SQL STRINGS dispatched
    to the tx verbs. DuckDB recomputes the whole chain from orders;
    the verb-driven arc is attested separately (q_tx_merge_table et
    al.), so a hash match here pins string-path == verb-path."""
    from bi_utils_spark.operators import txtable as tx
    from bi_utils_spark.operators.sqldml import tx_sql

    path = _tx_demo_dir(sf_dir) + "_sqldml"
    rows = _tx_order_rows(spark, sf_dir)
    if tx.latest_version(path) < 0:
        tx.create_table(
            rows.where(F.col("k") % 5 >= 1), path, partition_cols=["status"]
        )
    else:
        tx.restore_table(spark, path, 0)
        tx.vacuum_table(path, retain_versions=1, stray_age_seconds=0.0)
    rows.createOrReplaceTempView("sqldml_rows")
    t = {"orders_tx": path}
    tx_sql(
        spark,
        "INSERT INTO orders_tx SELECT k, status, cents FROM sqldml_rows "
        "WHERE k % 5 = 0 AND k % 10 <> 0",
        t,
    )
    tx_sql(
        spark,
        "UPDATE orders_tx SET cents = cents + 7 WHERE k % 3 = 0",
        t,
    )
    tx_sql(spark, "DELETE FROM orders_tx WHERE k % 11 = 4", t)
    tx_sql(
        spark,
        """
        MERGE INTO orders_tx AS t
        USING (
          SELECT k, status, cents * 2 AS cents, k % 13 = 2 AS is_del
          FROM sqldml_rows WHERE k % 10 = 1
          UNION ALL
          SELECT k, 'N' AS status, cents, k % 13 = 2 AS is_del
          FROM sqldml_rows WHERE k % 10 = 0
        ) AS s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        WHEN MATCHED AND s.is_del THEN DELETE
        """,
        t,
    )
    return tx_sql(
        spark,
        """
        WITH cur AS (
          SELECT status, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(cents) AS BIGINT) AS sum_cents
          FROM orders_tx GROUP BY status
        ),
        v0 AS (
          SELECT CAST(count(*) AS BIGINT) AS n0
          FROM orders_tx VERSION AS OF 0
        )
        SELECT cur.status, cur.n, cur.sum_cents, v0.n0
        FROM cur CROSS JOIN v0
        """,
        t,
    )


@register(
    "q_tx_merge_raw",
    f"""
    WITH merged AS ({_TX_MERGED_SQL})
    SELECT status,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM merged GROUP BY status
    """,
)
def q_tx_merge_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direct oracle for the full copy-on-write MERGE arc the bench
    times (restore-to-base + vacuum + merge + read): the resulting
    per-status summary must equal the registry twin q_tx_merge_table's
    merged relation re-aggregated — DuckDB recomputes it from orders
    via the same full-outer fold."""
    return raw_tx_merge(spark, sf_dir)


@register(
    "q_tx_delete_raw",
    f"""
    WITH rows0 AS ({_TX_ROWS_SQL})
    SELECT status,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM rows0 WHERE k % 7 <> 0 GROUP BY status
    """,
)
def q_tx_delete_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direct oracle for the full DELETE arc the bench times
    (restore-to-base + vacuum + predicate delete + read): the
    per-status summary of survivors must equal DuckDB's k % 7 <> 0
    filter over the same base rows."""
    return raw_tx_delete(spark, sf_dir)


@register(
    "q_minhash_near_dup_capped",
    _jaccard_pairs_sql(
        0.6,
        """
    SELECT CAST(count(*) AS BIGINT) AS n_exact,
           CAST(0 AS BIGINT) AS false_positives,
           1 AS recall_ge_090
    FROM jac
    """,
    ),
)
def q_minhash_near_dup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-under-cap attestation for the hot-bucket-capped MinHash
    join (the 100 TB production config benched as
    q_minhash_near_dup_capped): DuckDB recomputes the exact Jaccard
    ≥ 0.6 pair set from raw text; the capped LSH join
    (max_bucket_size=50) must report no pair outside it and find
    ≥ 90% of it. Measured 1.0 at sf0.01/sf0.1 (the caps don't bind
    on this corpus); the asserted floor is 0.9."""
    from bi_utils_spark.operators.dedup import (
        jaccard_similarity_join,
        minhash_near_dup_join,
    )

    docs = load(spark, sf_dir, "documents")
    exact = jaccard_similarity_join(
        docs, "doc_id", "text", threshold=0.6, shingle_n=3
    )
    capped = minhash_near_dup_join(
        docs, "doc_id", "text", threshold=0.6, num_hashes=64, num_bands=16,
        max_bucket_size=50,
    )
    return _pair_recall_summary(exact, capped, 0.9, "recall_ge_090")


@register(
    "q_simhash_near_dup_capped",
    """
    WITH norm AS (
      SELECT doc_id, trim(lower(text)) AS t FROM documents
    )
    SELECT CAST(count(*) AS BIGINT) AS n_text_dup_pairs,
           CAST(0 AS BIGINT) AS text_dups_missed,
           CAST(0 AS BIGINT) AS capped_extra_pairs,
           1 AS recall_ge_090
    FROM norm a JOIN norm b ON a.t = b.t AND a.doc_id < b.doc_id
    """,
)
def q_simhash_near_dup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attestation for the hot-chunk-capped SimHash join: (1) every
    identical-normalized-text pair (ground truth DuckDB recomputes)
    is still reported — identical text means identical fingerprints,
    and the hamming-0 tier stays exact under the cap; (2) the capped
    set adds NOTHING over the uncapped banded set (caps only drop
    candidates, hamming verification stays exact); (3) it retains
    ≥ 90% of the uncapped pairs (measured 1.0 at sf0.01/sf0.1)."""
    from bi_utils_spark.operators.dedup import simhash_near_dup_join

    docs = load(spark, sf_dir, "documents")
    keys = ["id_a", "id_b"]
    uncapped = simhash_near_dup_join(
        docs, "doc_id", "text", max_hamming=3
    ).select(*keys)
    capped = simhash_near_dup_join(
        docs, "doc_id", "text", max_hamming=3, max_chunk_bucket_size=200
    ).select(*keys)
    norm = docs.select("doc_id", F.trim(F.lower(F.col("text"))).alias("t"))
    na, nb = norm.alias("na"), norm.alias("nb")
    text_dups = na.join(
        nb,
        (F.col("na.t") == F.col("nb.t"))
        & (F.col("na.doc_id") < F.col("nb.doc_id")),
    ).select(F.col("na.doc_id").alias("id_a"), F.col("nb.doc_id").alias("id_b"))
    n_text = text_dups.agg(F.count("*").alias("n_text_dup_pairs"))
    missed = text_dups.join(capped, keys, "left_anti").agg(
        F.count("*").alias("text_dups_missed")
    )
    extra = capped.join(uncapped, keys, "left_anti").agg(
        F.count("*").alias("capped_extra_pairs")
    )
    n_un = uncapped.agg(F.count("*").alias("__n_un"))
    found = capped.join(uncapped, keys, "left_semi").agg(
        F.count("*").alias("__found")
    )
    return (
        n_text.crossJoin(missed)
        .crossJoin(extra)
        .crossJoin(n_un)
        .crossJoin(found)
        .select(
            "n_text_dup_pairs",
            "text_dups_missed",
            "capped_extra_pairs",
            (
                F.col("__found").cast("double")
                >= 0.9 * F.col("__n_un").cast("double")
            )
            .cast("int")
            .alias("recall_ge_090"),
        )
    )


@register(
    "q_winnow_near_dup_capped",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(0 AS BIGINT) AS capped_extra_pairs,
           1 AS recall_ge_090
    FROM documents
    """,
)
def q_winnow_near_dup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attestation for the fingerprint-frequency-capped winnowing
    join: dropping fingerprints that occur in > max_fp_doc_freq docs
    can only LOWER a pair's shared count, so the capped min_shared=3
    result is a subset of the uncapped one (capped_extra_pairs is a
    hard 0) and must retain ≥ 90% of it (measured 1.0 at
    sf0.01/sf0.1 — stop-gram fingerprints this cap sheds never carry
    3+ shared prints alone on this corpus). n_docs anchors the
    corpus cardinality cross-engine."""
    from bi_utils_spark.operators.dedup import winnowing_near_dup_join

    docs = load(spark, sf_dir, "documents")
    keys = ["id_a", "id_b"]
    uncapped = winnowing_near_dup_join(
        docs, "doc_id", "text", min_shared=3
    ).select(*keys)
    capped = winnowing_near_dup_join(
        docs, "doc_id", "text", min_shared=3, max_fp_doc_freq=50
    ).select(*keys)
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    extra = capped.join(uncapped, keys, "left_anti").agg(
        F.count("*").alias("capped_extra_pairs")
    )
    n_un = uncapped.agg(F.count("*").alias("__n_un"))
    found = capped.join(uncapped, keys, "left_semi").agg(
        F.count("*").alias("__found")
    )
    return (
        n_docs.crossJoin(extra)
        .crossJoin(n_un)
        .crossJoin(found)
        .select(
            "n_docs",
            "capped_extra_pairs",
            (
                F.col("__found").cast("double")
                >= 0.9 * F.col("__n_un").cast("double")
            )
            .cast("int")
            .alias("recall_ge_090"),
        )
    )


# ===========================================================================
# Registration-order priority (round 11 window).
#
# The driver's correctness run evaluates the first 50 queries in dict
# order. Standing rule (VERDICT r2 #2): every query whose
# implementation changed since its last official CORRECTNESS row is
# promoted into the window; remaining slots re-attest the queries
# whose official green row is OLDEST. The r11 window:
#
# (1) NEW in r11: the five formerly BENCH-only rows promoted per the
#     r10 verdict (capped minhash/simhash/winnow bound attestations;
#     the two raw tx DML arcs with direct SQL oracles), plus the SQL
#     DML front-end and Iceberg-export rows added this round.
# (2) r11-changed implementation: the five queries whose operators
#     gained BNLJ size guards (knn_join_exact, semantic pair/
#     decontaminate, bm25, hybrid fusion) — the guard probe is a new
#     code path in front of each plan.
# (3) re-attestation, oldest official row first: the r5-era tier
#     resuming at q_audio_features (exactly where r10's ledger left
#     off), registry order, skipping names already in tier 2.
# Demoted: the r10 tx tier (attested officially in r10) and everything
# attested r8-r9.
# ===========================================================================

_PROMOTED: list[str] = [
    # ---- tier 1: new in r11 ----
    "q_sql_dml_arc",
    "q_iceberg_export",
    "q_tx_merge_raw",
    "q_tx_delete_raw",
    "q_minhash_near_dup_capped",
    "q_simhash_near_dup_capped",
    "q_winnow_near_dup_capped",
    # ---- tier 2: r11-changed implementation (BNLJ guards) ----
    "q_knn_join",
    "q_semantic_contamination",
    "q_semantic_decontam",
    "q_bm25_search",
    "q_hybrid_search",
    # ---- tier 3: re-attestation, oldest official rows first,
    # resuming at q_audio_features per the r10 ledger note ----
    "q_audio_features",
    "q_phash_near_dup",
    "q_emb_simhash_pairs",
    "q_phash_dedup_clusters",
    "q_emb_dedup_exact",
    "q_emb_near_dup_ivf",
    "q_ivf_topk",
    "q_ivf_index_topk",
    "q_ivf_batch_topk",
    "q_pq_topk",
    "q_forecast_revenue",
    "q_returned_items",
    "q_large_orders",
    "q_promo_share",
    "q_cube_flags",
    "q_users_click_not_purchase",
    "q_users_signup_and_error",
    "q_winnow_near_dup",
    "q_grouping_sets",
    "q_price_variance",
    "q_string_funcs",
    "q_priority_with_shipment",
    "q_hourly_rollup",
    "q_hll_daily_users",
    "q_repetition_stats",
    "q_pack_conservation",
    "q_pack_sequences",
    "q_chunk_documents",
    "q_snapshot_diff",
    "q_bitext_mine",
    "q_bitext_mine_blocked",
    "q_stratified_sample",
    "q_unigram_logprob",
    "q_oov_rate",
    "q_contamination",
    "q_decontaminate",
    "q_quality_tophalf",
    "q_remove_dup_spans",
    # (q_boilerplate_grams onward: next in line for r12)
]


def _reorder() -> None:
    global QUERIES, ORACLES
    order = [n for n in _PROMOTED if n in QUERIES]
    order += [n for n in QUERIES if n not in _PROMOTED]
    QUERIES = {n: QUERIES[n] for n in order}
    ORACLES = {n: ORACLES[n] for n in order if n in ORACLES}


_reorder()


# ===========================================================================
# Raw approximate operators for the bench. The registry entries of the
# same names are oracle-backed recall/completeness SUMMARIES (they run
# the approximate operator AND its exact ground truth); the bench
# times the raw operator alone so walls stay comparable across rounds.
# ===========================================================================

def raw_minhash_near_dup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-bucket-capped MinHash join — the 100 TB production config
    (recall under caps property-tested in tests/test_llmdata.py)."""
    from bi_utils_spark.operators.dedup import minhash_near_dup_join

    docs = load(spark, sf_dir, "documents")
    return minhash_near_dup_join(
        docs, "doc_id", "text", threshold=0.6, num_hashes=64, num_bands=16,
        max_bucket_size=50,
    )


def raw_simhash_near_dup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-chunk-capped SimHash join (hamming-0 tier stays exact)."""
    from bi_utils_spark.operators.dedup import simhash_near_dup_join

    docs = load(spark, sf_dir, "documents")
    return simhash_near_dup_join(
        docs, "doc_id", "text", max_hamming=3, max_chunk_bucket_size=200
    )


def raw_winnow_near_dup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint-frequency-capped winnowing join."""
    from bi_utils_spark.operators.dedup import winnowing_near_dup_join

    docs = load(spark, sf_dir, "documents")
    return winnowing_near_dup_join(
        docs, "doc_id", "text", min_shared=3, max_fp_doc_freq=50
    )


def raw_bitext_mine_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked-kNN bitext mining alone — the 10⁸+-per-side production
    config (the registry entry of the same name is the attestation
    that this equals the exact form; the bench times the raw scale
    path, the established approximate-operator split)."""
    from bi_utils_spark.operators.bitext import mine_bitext
    from bi_utils_spark.operators.similarity import knn_join_blocked

    emb = load(spark, sf_dir, "embeddings")
    par = spark.sparkContext.defaultParallelism
    src = emb.filter(F.col("label") % 2 == 0).repartition(par)
    tgt = emb.filter(F.col("label") % 2 == 1).repartition(par)
    return mine_bitext(src, tgt, k=4, knn=knn_join_blocked)


RAW_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_bitext_mine_blocked": raw_bitext_mine_blocked,
    "q_ivf_index_topk": raw_ivf_index_probe,
    "q_ivf_batch_topk": raw_ivf_batch_probe,
    "q_tx_merge_raw": raw_tx_merge,
    "q_tx_delete_raw": raw_tx_delete,
    "q_minhash_near_dup": raw_minhash_near_dup,
    "q_simhash_near_dup": raw_simhash_near_dup,
    "q_winnow_near_dup": raw_winnow_near_dup,
    "q_ann_topk": raw_ann_topk,
    "q_ivf_topk": raw_ivf_topk,
    "q_emb_near_dup_ivf": raw_emb_near_dup_ivf,
    "q_pq_topk": raw_pq_topk,
    "q_minhash_near_dup_capped": raw_minhash_near_dup_capped,
    "q_simhash_near_dup_capped": raw_simhash_near_dup_capped,
    "q_winnow_near_dup_capped": raw_winnow_near_dup_capped,
}
