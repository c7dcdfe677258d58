"""Slowly-changing-dimension Type 2 maintenance (X74).

The reference maintains warehouse dimensions by staged MERGE upsert
(bi_utils/database.py:125-214 ``upsert`` — last-write-wins, history
destroyed). The standard warehouse evolution of that pattern keeps
every attribute version with a validity interval — SCD Type 2 — so
facts can join the dimension *as of* their own timestamp. This tier
provides the three operations a Type-2 dimension needs:

- :func:`scd2_from_history` — collapse a change-event history into
  versioned rows ``(key..., attrs..., valid_from, valid_to,
  is_current)``: consecutive rows with identical tracked attributes
  merge into one interval; ``valid_to`` is the next version's start
  (NULL while current).
- :func:`scd2_apply` — fold one update batch into an existing SCD2
  table: changed keys close their current row and open a new one,
  unchanged-attribute updates are no-ops, brand-new keys insert.
- :func:`scd2_snapshot` — point-in-time reconstruction: the rows
  whose interval covers ``at`` (map-only filter, no window).

Scale shape: ``scd2_from_history`` is one shuffle on the key with
two windows over each key's OWN rows (version count per key, never
corpus-wide). ``scd2_apply`` is a key-equi full-outer join of the
CURRENT slice against the batch — closed history rows pass through
untouched (at 100 TB: the current slice is ≈|keys| rows and the
batch is the day's changes; history, the bulk, is never shuffled).
``scd2_snapshot`` is a predicate — partition-prunable when the
table is stored partitioned on ``valid_to IS NULL``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _changed(tracked_cols: list[str], a: str, b: str) -> Column:
    """Null-safe any-attribute-differs predicate between two
    prefixed column sets."""
    cond = F.lit(False)
    for c in tracked_cols:
        cond = cond | ~F.col(f"{a}.{c}").eqNullSafe(F.col(f"{b}.{c}"))
    return cond


def scd2_from_history(
    df: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    ts_col: str = "ts",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Versioned dimension from a raw change history.

    Per key, ordered by ``ts_col`` (+ tiebreaks), a new version
    starts whenever any tracked attribute differs (null-safe) from
    the previous event; runs of identical attributes collapse into
    one interval keeping the EARLIEST timestamp. Emits
    ``key..., tracked..., valid_from, valid_to, is_current`` with
    ``valid_to`` = next version's ``valid_from`` (NULL on the
    current version).

    One hash shuffle on the key; both windows scan only each key's
    own rows. Multiple events on the same (key, ts) are ordered by
    the tiebreaks so the result is deterministic.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    # Version boundary: first event of the key, or any tracked
    # attribute differs (null-safely) from the previous event.
    boundary = F.lit(False)
    for c in tracked_cols:
        boundary = boundary | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    first = F.row_number().over(w) == 1
    seg = F.sum(
        F.when(first | boundary, 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    segged = df.withColumn("__seg", seg)
    versions = segged.groupBy(*key_cols, "__seg").agg(
        *[F.first(c).alias(c) for c in tracked_cols],
        F.min(ts_col).alias("valid_from"),
    )
    wv = Window.partitionBy(*key_cols).orderBy("__seg")
    return (
        versions.withColumn("valid_to", F.lead("valid_from").over(wv))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__seg")
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    batch_ts,
) -> DataFrame:
    """Fold one update batch (one row per key, attribute snapshot at
    ``batch_ts``) into an existing SCD2 table.

    - changed key: current row closes (``valid_to = batch_ts``), a
      new current row opens at ``batch_ts``;
    - identical attributes: no-op (idempotent re-delivery is safe);
    - new key: inserts as current;
    - closed history rows pass through UNTOUCHED — only the current
      slice joins the batch, so at scale the shuffle is
      ≈|keys| + |batch| rows, never the history.

    ``batch_ts`` must be strictly later than the touched keys'
    ``valid_from`` (warehouse batch clock); a Column or literal.
    """
    bts = batch_ts if isinstance(batch_ts, Column) else F.lit(batch_ts)
    out_cols = [*key_cols, *tracked_cols, "valid_from", "valid_to",
                "is_current"]
    closed = dim.where(~F.col("is_current"))
    cur = dim.where(F.col("is_current")).alias("c")
    # one row per key, deterministically (dropDuplicates would pick
    # an arbitrary survivor under repartitioning): lexicographic
    # struct max over the tracked attributes
    upd = (
        updates.groupBy(*key_cols)
        .agg(
            F.max(
                F.struct(*[F.col(c).alias(c) for c in tracked_cols])
            ).alias("__t")
        )
        .select(*key_cols, *[F.col(f"__t.{c}").alias(c) for c in tracked_cols])
        .alias("u")
    )
    on = F.lit(True)
    for c in key_cols:
        on = on & (F.col(f"c.{c}") == F.col(f"u.{c}"))
    j = cur.join(upd, on, "full_outer")
    has_cur = F.col(f"c.{key_cols[0]}").isNotNull()
    has_upd = F.col(f"u.{key_cols[0]}").isNotNull()
    changed = _changed(tracked_cols, "c", "u")
    # Surviving version of the previously-current row: closed if the
    # batch changed it, untouched otherwise.
    keep_cur = j.where(has_cur).select(
        *[F.col(f"c.{c}").alias(c) for c in key_cols + tracked_cols],
        F.col("c.valid_from").alias("valid_from"),
        F.when(has_upd & changed, bts)
        .otherwise(F.col("c.valid_to"))
        .alias("valid_to"),
        (~(has_upd & changed)).alias("is_current"),
    )
    opened = j.where(has_upd & (~has_cur | changed)).select(
        *[F.coalesce(f"u.{c}", f"c.{c}").alias(c) for c in key_cols],
        *[F.col(f"u.{c}").alias(c) for c in tracked_cols],
        bts.alias("valid_from"),
        F.lit(None).cast(dim.schema["valid_to"].dataType).alias(
            "valid_to"
        ),
        F.lit(True).alias("is_current"),
    )
    return (
        closed.select(*out_cols)
        .unionByName(keep_cur.select(*out_cols))
        .unionByName(opened.select(*out_cols))
    )


def _rebuild_touched(
    cur: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(rebuilt, cur_untouched): re-derive SCD2 versions for exactly
    the keys the change batch touches, passing every other current
    row through untouched.

    Each touched key's current row seeds the rebuild as a
    pseudo-change at its own ``valid_from``, then
    :func:`scd2_from_history` folds seed + batch changes in
    timestamp order — so a no-op redelivery collapses into the seed
    (idempotent), several changes to one key inside one batch each
    open a version, and a late change older than the current
    version's start folds in as if it had arrived in order WITHIN
    the current segment (closed history is never reopened — the
    bounded-lateness contract; full rebuild parity holds whenever
    changes arrive with ts >= their key's current ``valid_from``).

    Scale: |touched current rows| + |batch| rows shuffle; the
    untouched current slice moves via one left_anti join on the
    touched-key set (broadcast when the batch is small).
    """
    keys = changes.select(*key_cols).distinct()
    cur_touched = cur.join(keys, key_cols, "left_semi")
    cur_untouched = cur.join(keys, key_cols, "left_anti")
    # The seed carries NULL tiebreaks (NULLS FIRST under the ascending
    # version order), so at an equal timestamp the seed sorts before
    # the batch's own changes — the stored version is the
    # already-folded past.
    tbs = list(tiebreak_cols or [])
    seed = cur_touched.select(
        *key_cols,
        *tracked_cols,
        F.col("valid_from").alias(ts_col),
        *[
            F.lit(None).cast(changes.schema[c].dataType).alias(c)
            for c in tbs
        ],
    )
    hist = seed.unionByName(
        changes.select(*key_cols, *tracked_cols, ts_col, *tbs)
    )
    rebuilt = scd2_from_history(
        hist, key_cols, tracked_cols, ts_col, tiebreak_cols
    )
    return rebuilt, cur_untouched


def scd2_apply_changes(
    dim: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    ts_col: str = "ts",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Fold a MULTI-timestamp change batch into an existing SCD2
    table — the micro-batch primitive behind
    ``streaming/scd.py::scd2_maintain_stream``, and the batch form
    of the same code path.

    Where :func:`scd2_apply` treats the batch as one attribute
    snapshot at a single ``batch_ts``, this operator accepts raw
    change events (several per key, each at its own ``ts_col``) and
    versions them all: per touched key the current row plus the
    batch's changes replay through the :func:`scd2_from_history`
    collapse. Properties (test-asserted): applying a ts-ordered
    partition of a change log batch-by-batch equals one
    ``scd2_from_history`` over the whole log; redelivering a batch
    is a no-op; closed history rows pass through untouched (only
    the current slice of touched keys is ever shuffled).
    """
    rebuilt, cur_untouched = _rebuild_touched(
        dim.where(F.col("is_current")),
        changes,
        key_cols,
        tracked_cols,
        ts_col,
        tiebreak_cols,
    )
    out_cols = [*key_cols, *tracked_cols, "valid_from", "valid_to",
                "is_current"]
    return (
        dim.where(~F.col("is_current")).select(*out_cols)
        .unionByName(cur_untouched.select(*out_cols))
        .unionByName(rebuilt.select(*out_cols))
    )


def scd2_snapshot(dim: DataFrame, at) -> DataFrame:
    """The dimension as of ``at``: rows with
    ``valid_from <= at < coalesce(valid_to, +inf)``. Map-only."""
    a = at if isinstance(at, Column) else F.lit(at)
    return dim.where(
        (F.col("valid_from") <= a)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > a))
    ).drop("is_current")


def scd2_join_facts(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    fact_ts: str,
    bucket_seconds: float = 86400.0,
) -> DataFrame:
    """As-of dimension join — the SCD2 consumption pattern: each
    fact row takes the dimension version whose
    ``[valid_from, valid_to)`` interval covers its timestamp
    (boundary facts belong to the NEWER version).

    Current versions (NULL ``valid_to``) close at the facts' max
    timestamp + 1µs (one bounded agg, broadcast), so the interval
    join's bucket explosion stays finite. The join itself is
    operators/joins.py::point_in_interval_join — bucket-exploded
    equi-join, never a BroadcastNestedLoopJoin, AQE-sizeable at
    fact scale.
    """
    from bi_utils_spark.operators.joins import point_in_interval_join

    hi = facts.agg(
        (F.unix_micros(F.max(fact_ts)) + 1).alias("__hi_us")
    )
    dimc = dim.crossJoin(F.broadcast(hi)).select(
        *[F.col(c) for c in dim.columns if c != "is_current"],
        F.coalesce(
            F.col("valid_to"),
            F.timestamp_micros(F.col("__hi_us")),
        ).alias("__vto"),
    )
    out = point_in_interval_join(
        facts,
        dimc.drop("valid_to"),
        fact_ts,
        "valid_from",
        "__vto",
        on=key_cols,
        bucket_seconds=bucket_seconds,
        closed="left",
    )
    return out.drop("__vto", "__hi_us")
