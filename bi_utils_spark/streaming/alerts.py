"""Alert-dedup state machine (SURVEY.md C4/W1/W2) — batch + streaming.

Reference composition (`utils.py:159-234`):
1. look up the most recent history row for (identifier, dedup_key)
   — ``ORDER BY LAST_ALERT DESC LIMIT 1`` (`utils.py:210-224`);
2. decide: no history → send; else send iff
   ``abs(current − last) >= resend_threshold`` (`utils.py:225-234`);
3. on send, append to history (`utils.py:159-188`).

Batch mode runs the decision set-wise over a history table (one
window shuffle, arbitrarily many keys at once — the reference did one
SQL round-trip *per alert*). Streaming mode keeps per-key state in
``applyInPandasWithState`` so decisions ride an unbounded stream.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from bi_utils_spark.functions.scalars import abs_threshold
from bi_utils_spark.operators.relational import latest_per_key


def decide_alerts_batch(
    current: DataFrame,
    history: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    history_value_col: str,
    history_ts_col: str,
    resend_threshold: float,
    history_tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Set-wise alert decision: ``current`` (one row per key) against
    the most recent ``history`` row per key.

    Output: current columns + ``last_value`` + boolean ``should_send``.
    History side is reduced by a window top-1 before a left join —
    the join is on the (usually low-cardinality) alert key, and the
    reduced history is tiny → Catalyst broadcasts it.
    """
    latest = latest_per_key(
        history, key_cols, history_ts_col, tiebreak_cols=history_tiebreak_cols
    )
    last_vals = latest.select(
        *key_cols, F.col(history_value_col).alias("last_value")
    )
    joined = current.join(last_vals, on=list(key_cols), how="left")
    return joined.withColumn(
        "should_send",
        abs_threshold(value_col, "last_value", resend_threshold),
    )


def make_alert_state_fn(value_pos: int, resend_threshold: float):
    """Build the per-group stateful function for streaming mode.

    State = last sent value per key. Each micro-batch: take the
    newest observation per key, apply the W2 decision, update state
    only when sending (matching the reference: history rows are only
    written for *sent* alerts, `utils.py:165-168`).
    """

    def fn(
        key,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        current = float(rows.iloc[-1, value_pos])
        if state.exists:
            (last,) = state.get
            send = abs(current - last) >= resend_threshold
        else:
            send = True  # no history ⇒ send (utils.py:225-227)
        if send:
            state.update((current,))
        yield pd.DataFrame(
            {
                "key": ["|".join(str(k) for k in key)],
                "current_value": [current],
                "should_send": [send],
            }
        )

    return fn


ALERT_STREAM_OUTPUT_SCHEMA = "key string, current_value double, should_send boolean"
ALERT_STREAM_STATE_SCHEMA = "last_value double"


def decide_alerts_stream(
    stream: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    resend_threshold: float,
) -> DataFrame:
    """Streaming alert decision over an unbounded keyed stream.

    ``applyInPandasWithState`` keyed by ``key_cols``; state is the
    last *sent* value. Use with ``outputMode("update")`` and a
    ``foreachBatch`` webhook sink.
    """
    value_pos = stream.columns.index(value_col)
    return (
        stream.groupBy(*[F.col(c) for c in key_cols])
        .applyInPandasWithState(
            make_alert_state_fn(value_pos, resend_threshold),
            outputStructType=ALERT_STREAM_OUTPUT_SCHEMA,
            stateStructType=ALERT_STREAM_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
