"""Relational operators (SURVEY.md §2.2, §2.4, §2.5, §2.6, §2.7).

Thin, typed wrappers making the reference's code-generated SQL
semantics first-class DataFrame plans. The reference shipped SQL
strings to Exasol (e.g. ``utils.py:210-224``, ``ct_utils.py:29``);
here Catalyst plans the same semantics over parquet.

Scale notes: every function returns a *lazy* plan. Top-1-per-key is a
window (single hash shuffle on the key, map-side partial where
possible); watermark is an aggregate that parquet footer statistics
can answer via aggregate pushdown; unions are plan nodes (zero copy,
the v1 quadratic-concat problem — ``commercetools_utils.py:238`` —
cannot exist here).
"""

from __future__ import annotations

from functools import reduce
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# --- projections / filters (P-ops) -------------------------------------------

def project_existing(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Select requested columns that exist, silently dropping missing.

    Reference: ct_utils.py:116-118 (``df.loc[:, df.columns.isin(cols)]``).
    Keeps the df's column order like the pandas original.
    """
    requested = set(columns)
    keep = [c for c in df.columns if c in requested]
    return df.select(*keep)


def not_null(df: DataFrame, column: str) -> DataFrame:
    """Reference: ct_utils.py:85 (dropna before normalize)."""
    return df.filter(F.col(column).isNotNull())


def in_list(df: DataFrame, column: str, values: Sequence) -> DataFrame:
    """IN-list predicate (reference: utils.py:510-511)."""
    return df.filter(F.col(column).isin(list(values)))


# --- aggregates / watermark (A-ops) ------------------------------------------

def max_watermark(df: DataFrame, ts_col: str, lookback: str = "3 seconds"):
    """Delta-load cursor: ``MAX(ts) − INTERVAL lookback``; None if empty.

    Reference: ct_utils.py:19-37 (3-second lookback; the v1 variant
    commercetools_utils.py:29 used 60 minutes). The reference could
    not exceed 99 interval units (Exasol literal limit,
    ct_utils.py:28); Spark intervals have no such cap.

    Returns a Python value (datetime or None) — this is a deliberate
    action: the watermark is a scalar pushed into the *next* query's
    predicate, exactly how the reference used it to build the REST
    ``where=`` clause (ct_utils.py:213).
    """
    row = df.select(
        (F.max(F.col(ts_col)) - F.expr(f"INTERVAL {lookback}")).alias("wm")
    ).first()
    return row["wm"] if row is not None else None


def watermark_filter(df: DataFrame, ts_col: str, lookback: str = "3 seconds") -> DataFrame:
    """Plan-level form of the delta-load semantics: keep rows with
    ``ts >= MAX(ts) − lookback`` in one lazy plan (no driver scalar).

    At 100 TB the scalar subquery is a tiny footer-stats aggregate
    broadcast into the filter; with date-partitioned data Catalyst
    additionally prunes partitions.
    """
    wm = df.select(
        (F.max(F.col(ts_col)) - F.expr(f"INTERVAL {lookback}")).alias("wm")
    )
    return df.join(F.broadcast(wm), F.col(ts_col) >= F.col("wm"), "inner").drop("wm")


def filtered_count(df: DataFrame, predicate: Column) -> int:
    """COUNT(*) with predicate — load verification
    (reference: utils.py:293-295)."""
    return df.filter(predicate).count()


def count_on_date(df: DataFrame, ts_col: str, pivot_date) -> int:
    """``COUNT(*) WHERE TO_DATE(ts) = date`` (reference: utils.py:293-294
    used CURRENT_DATE; parameterized here for determinism)."""
    return df.filter(F.to_date(F.col(ts_col)) == F.lit(pivot_date)).count()


def column_max_lengths(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """Per-column max stringified length, in ONE pass.

    Reference: utils.py:518-522 ran one pandas full scan *per column*
    (``astype(str).str.len().max()`` inside a loop). Here a single
    aggregate computes all columns in one job; output is long-form
    (column_name, new_max_length) like the reference's accumulator df.
    """
    cols = list(columns) if columns else df.columns
    agg = df.agg(
        *[
            F.max(F.length(F.col(c).cast("string"))).alias(c)
            for c in cols
        ]
    )
    # unpivot to (column_name, new_max_length)
    stack_expr = ", ".join(f"'{c}', `{c}`" for c in cols)
    return agg.selectExpr(
        f"stack({len(cols)}, {stack_expr}) as (column_name, new_max_length)"
    )


def grouped_having(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
    having: Column | None = None,
) -> DataFrame:
    """GROUP BY … HAVING … (the utils.py:322-323 docstring contract:
    ``HAVING TOTAL_REQUESTS > x AND ERROR_PERCENT > y``)."""
    out = df.groupBy(*[F.col(c) for c in group_cols]).agg(*aggs)
    return out.filter(having) if having is not None else out


# --- window / ordered analytics (W-ops, O-ops) -------------------------------

def latest_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Top-1 per key by recency (reference: utils.py:210-224 —
    ``ORDER BY LAST_ALERT DESC LIMIT 1`` per (identifier, dedup_key)).

    Window + row_number: one shuffle on the key, then a per-partition
    sort — Spark's TakeOrdered-like pattern for grouped top-1.
    ``tiebreak_cols`` make the result deterministic when order_col
    ties (the reference's LIMIT 1 was nondeterministic on ties).
    """
    order = [F.desc(order_col)] + [F.desc(c) for c in tiebreak_cols]
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_k(df: DataFrame, order_col: str, k: int, ascending: bool = False) -> DataFrame:
    """ORDER BY … LIMIT k (reference: utils.py:217-218, k=1).

    Spark plans TakeOrderedAndProject — a true distributed top-k
    (per-partition heap + driver merge), never a full sort.
    """
    order = F.asc(order_col) if ascending else F.desc(order_col)
    return df.orderBy(order).limit(k)


def top_k_per_group(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    k: int,
    ascending: bool = False,
) -> DataFrame:
    """Generalized W1: top-k rows per key (rank ≤ k)."""
    order = F.asc(order_col) if ascending else F.desc(order_col)
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


# --- set ops (U-ops) ---------------------------------------------------------

def melt(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide → long unpivot: one output row per (id row, value
    column). The inverse of ``groupBy().pivot()`` (q_pivot_events).

    Value columns must share a castable common type (the caller
    casts — implicit widening would silently lose precision).
    Map-only: Spark's native ``unpivot`` is a generator projection,
    no shuffle, row count multiplies by ``len(value_cols)``.
    """
    return df.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c) for c in value_cols],
        var_name,
        value_name,
    )


def union_pages(pages: Sequence[DataFrame], allow_missing: bool = True) -> DataFrame:
    """Union N page-batches by column name.

    Reference: ct_utils.py:231-258 accumulated pandas pages and
    concat'd once (v2's fix of v1's O(n²) loop concat,
    commercetools_utils.py:238). Spark unions are lazy plan nodes —
    linear by construction. ``allow_missing`` fills absent columns
    with NULL (pandas concat semantics).
    """
    if not pages:
        raise ValueError("union_pages: need at least one page")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing), pages
    )
