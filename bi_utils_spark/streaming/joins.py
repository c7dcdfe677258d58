"""Stream-stream event-time joins (X71).

The attribution shape: purchases join the clicks that preceded them
within an event-time window, both sides arriving as streams. In
Structured Streaming this is the watermarked interval join — state
for each side is bounded by its watermark plus the join window, so
the state store holds hours of keys, never history.

The SAME function runs in batch mode unchanged (``withWatermark`` is
a no-op on static frames), which is what makes the operator
oracle-checkable: the registry runs the batch form against a DuckDB
interval-join oracle, and the streaming e2e test (two file-source
streams -> memory sink) proves watermark/state semantics on the
identical plan.

Scale shape: the join shuffles both streams on the user key; the
range predicate prunes state by event time. At 100 TB/day the state
is (watermark + window) x arrival rate per side — a tuning knob, not
a corpus multiple.

Reference: Flaconi/bi_utils has no streaming tier (north-star
surface); semantics follow the Structured Streaming stream-stream
join contract (SPARK-19926).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_events(
    earlier: DataFrame,
    later: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_sec: int = 3600,
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join each ``later`` row to every ``earlier`` row of the same
    key with ``earlier.ts`` in ``[later.ts - window_sec, later.ts]``
    — click→purchase attribution, error→deploy blame, etc.

    Output: (key, earlier_ts, later_ts, lag_sec) plus the non-key
    payload columns of both sides suffixed ``_earlier``/``_later``.
    ``how='left_outer'`` keeps unattributed ``later`` rows (NULL
    earlier columns) — supported by Structured Streaming because both
    sides carry watermarks AND the join has an event-time range.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner or left_outer, got {how!r}")
    e = earlier.withWatermark(ts_col, watermark).alias("e")
    l = later.withWatermark(ts_col, watermark).alias("l")
    cond = (
        (F.col(f"e.{key_col}") == F.col(f"l.{key_col}"))
        & (F.col(f"e.{ts_col}") <= F.col(f"l.{ts_col}"))
        & (
            F.col(f"e.{ts_col}")
            >= F.col(f"l.{ts_col}")
            - F.expr(f"INTERVAL {int(window_sec)} SECONDS")
        )
    )
    # left_outer: the LATER side must be the preserved one
    joined = l.join(e, cond, how)
    e_payload = [
        c for c in earlier.columns if c not in (key_col, ts_col)
    ]
    l_payload = [c for c in later.columns if c not in (key_col, ts_col)]
    return joined.select(
        F.col(f"l.{key_col}").alias(key_col),
        F.col(f"e.{ts_col}").alias("earlier_ts"),
        F.col(f"l.{ts_col}").alias("later_ts"),
        (
            F.unix_timestamp(F.col(f"l.{ts_col}"))
            - F.unix_timestamp(F.col(f"e.{ts_col}"))
        ).alias("lag_sec"),
        *[F.col(f"e.{c}").alias(f"{c}_earlier") for c in e_payload],
        *[F.col(f"l.{c}").alias(f"{c}_later") for c in l_payload],
    )
