"""Marketing attribution over event timelines (X85).

Which touchpoints (clicks, views) get credit for a conversion
(purchase)? The three standard position models, computed exactly:

- **first-touch**: the user's first touch before the conversion
  takes credit 1;
- **last-touch**: the latest touch before the conversion takes
  credit 1;
- **linear**: every touch before the conversion shares the credit
  equally (1/k each).

Linear shares are fixed-point (``1e7 div k`` — the operators/lm.py
quantization), so per-touch totals are exact integer sums and the
final division is one reproducible double op: no float-accumulation
ambiguity between engines.

Scale shape: everything rides windows PARTITIONED BY user (one hash
shuffle on user_id; per-user timelines are small by nature — a user
with 10⁶ events is bot traffic for the DQ tier, not this one). The
linear model needs one ascending pass (running touch count, the
per-conversion k) and one descending pass (suffix sum of conversion
shares onto the touches); first/last ride the ascending window.
Credits aggregate per touch id, never per (touch, conversion) pair —
no pair blow-up for heavy converters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_Q = 10_000_000  # fixed-point quantum for linear shares


def attribute_touches(
    events: DataFrame,
    conversion_types: tuple[str, ...],
    touch_types: tuple[str, ...],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-touch credit table: ``(event_id, user_id, ts, n_first,
    n_last, linear_credit)``. Conversions with no preceding touch
    are unattributable and credit nobody (count them with
    :func:`unattributed_conversions`)."""
    is_t = F.col(type_col).isin(list(touch_types))
    is_c = F.col(type_col).isin(list(conversion_types))
    asc = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    desc = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).desc(), F.col(id_col).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tid = F.when(is_t, F.col(id_col))
    base = events.select(
        F.col(id_col),
        F.col(user_col),
        F.col(ts_col),
        is_t.alias("__is_t"),
        is_c.alias("__is_c"),
        F.sum(is_t.cast("long")).over(asc).alias("__rc"),
        F.first(tid, ignorenulls=True).over(asc).alias("__first_tid"),
        F.last(tid, ignorenulls=True).over(asc).alias("__last_tid"),
    )
    conv_q = F.when(
        F.col("__is_c") & (F.col("__rc") > 0),
        F.expr(f"{_Q} div __rc"),
    ).otherwise(F.lit(0))
    with_lin = base.withColumn(
        "__lq", F.sum(conv_q).over(desc)
    )
    convs = base.where(F.col("__is_c") & (F.col("__rc") > 0))
    fc = convs.groupBy(
        F.col("__first_tid").alias(id_col)
    ).agg(F.count(F.lit(1)).alias("n_first"))
    lc = convs.groupBy(
        F.col("__last_tid").alias(id_col)
    ).agg(F.count(F.lit(1)).alias("n_last"))
    touches = with_lin.where(F.col("__is_t"))
    zero = F.lit(0).cast("long")
    return (
        touches.join(fc, id_col, "left")
        .join(lc, id_col, "left")
        .select(
            id_col,
            user_col,
            ts_col,
            F.coalesce(F.col("n_first"), zero).alias("n_first"),
            F.coalesce(F.col("n_last"), zero).alias("n_last"),
            (F.col("__lq").cast("double") / F.lit(float(_Q))).alias(
                "linear_credit"
            ),
        )
    )


def unattributed_conversions(
    events: DataFrame,
    conversion_types: tuple[str, ...],
    touch_types: tuple[str, ...],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Conversions with zero preceding touches — the rows every
    attribution report must disclose rather than silently drop."""
    is_t = F.col(type_col).isin(list(touch_types))
    is_c = F.col(type_col).isin(list(conversion_types))
    asc = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        events.withColumn(
            "__rc", F.sum(is_t.cast("long")).over(asc)
        )
        .where(is_c & (F.col("__rc") == 0))
        .select(id_col, user_col, ts_col)
    )
