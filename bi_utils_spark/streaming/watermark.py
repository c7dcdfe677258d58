"""Streaming watermark / window helpers (SURVEY.md §2.12).

The reference's delta-load lookback — ``MAX(ts) − INTERVAL n`` to
tolerate late or clock-skewed records (`ct_utils.py:19-37` 3 s;
`commercetools_utils.py:29` 60 min) — is exactly Structured
Streaming's event-time watermark. These helpers name that mapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_lookback_watermark(
    stream: DataFrame, ts_col: str, lookback: str = "60 minutes"
) -> DataFrame:
    """``withWatermark`` with the reference's lookback semantics."""
    return stream.withWatermark(ts_col, lookback)


def windowed_counts(
    stream: DataFrame,
    ts_col: str,
    window: str = "10 minutes",
    slide: str | None = None,
    *group_cols: str,
) -> DataFrame:
    """Tumbling/sliding windowed counts + sums over an event stream."""
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    return stream.groupBy(win, *[F.col(c) for c in group_cols]).agg(
        F.count("*").alias("n"), F.sum("value").alias("total_value")
    )


def session_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "60 minutes",
    *group_cols: str,
) -> DataFrame:
    """Session-window aggregation over an event stream: events of the
    same keys within ``gap`` of each other merge into one session
    (session end = last event + gap). The watermark bounds state:
    sessions whose end falls behind it are finalized and evicted —
    without it, session state grows forever. Identical expression
    works on a batch frame (q_session_windows is the oracle-checked
    batch form)."""
    win = F.session_window(F.col(ts_col), gap)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), *[F.col(c) for c in group_cols])
        .agg(F.count("*").alias("n_events"))
        .select(
            *group_cols,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def run_stream_to_memory(stream_df: DataFrame, name: str) -> None:
    """Drive a bounded streaming query to completion synchronously
    (file-source smoke pattern): memory sink + processAllAvailable."""
    q = (
        stream_df.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
