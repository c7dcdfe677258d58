"""Warehouse analytics part 2: forecast / returned / large-order
rows, cubes and grouping sets, winnowing near-dup attestation,
string and rollup surfaces, HLL sketches."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bi_utils_spark.queries.core import load, register



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
             -- decimal -> double through VARCHAR: DuckDB's direct
             -- decimal cast divides int128 by 10^scale in float and
             -- can land 1 ULP off when the unscaled value exceeds
             -- 2^53 (observed on s2 at sf0.001); the string route is
             -- correctly rounded, matching Spark's BigDecimal cast
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                       AS VARCHAR) AS DOUBLE) AS s1,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                           * CAST(l_extendedprice AS DECIMAL(18,2)))
                       AS VARCHAR) AS DOUBLE) AS s2
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
