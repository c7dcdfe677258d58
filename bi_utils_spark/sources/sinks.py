"""Sink adapters (SURVEY.md S11-S13): webhook + append-only history.

Reference: ``send_slack_alert_to_webhook`` (`utils.py:138-156`)
POSTed ``{'text': msg}``; ``update_slack_alert_history``
(`utils.py:159-188`) INSERTed an audit row; ``notify_schema_changes``
(`dlt_utils.py:8-40`) posted one message per schema change. Network
posters are injectable; the durable part (history) is a Spark append.
"""

from __future__ import annotations

import json
import urllib.request
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bi_utils_spark.session import set_logging

Poster = Callable[[str, dict], int]  # (url, payload) -> HTTP status


def http_poster(url: str, payload: dict) -> int:
    """Default JSON POST (only used when real connectivity exists)."""
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode("utf-8"),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as resp:  # noqa: S310
        return resp.status


def send_webhook_alert(
    hook_url: str, text: str, poster: Poster = http_poster
) -> bool:
    """S11: POST ``{'text': text}``; log-and-continue on failure
    (`utils.py:149-156` logged HTTP errors without raising)."""
    log = set_logging()
    try:
        status = poster(hook_url, {"text": text})
    except Exception as exc:  # noqa: BLE001
        log.error("webhook alert failed: %s", exc)
        return False
    if status >= 400:
        log.error("webhook alert failed with HTTP %d", status)
        return False
    return True


ALERT_HISTORY_SCHEMA = (
    "alert_identifier string, last_alert timestamp, "
    "alert_deduplication_key string, alert_deduplication_value double, "
    "alert_message string"
)


def append_alert_history(
    spark: SparkSession,
    history_path: str,
    alert_identifier: str,
    dedup_key: str,
    dedup_value: float,
    message: str,
    now=None,
) -> None:
    """S13: append one audit row (`utils.py:177-180` INSERT VALUES
    (id, CURRENT_TIMESTAMP, key, value, msg)) to a parquet history."""
    row = spark.createDataFrame(
        [(alert_identifier, None, dedup_key, float(dedup_value), message)],
        ALERT_HISTORY_SCHEMA,
    ).withColumn(
        "last_alert", now if now is not None else F.current_timestamp()
    ).select(
        "alert_identifier",
        "last_alert",
        "alert_deduplication_key",
        "alert_deduplication_value",
        "alert_message",
    )
    row.write.mode("append").parquet(history_path)


def notify_rows(
    df: DataFrame,
    format_row: Callable[[dict], str],
    send: Callable[[str], None],
    max_rows: int = 1000,
) -> int:
    """S12: per-row notification sink (`dlt_utils.py:34-40` posted one
    chat message per changed column). Collect is bounded — alert
    streams are small by construction; raise if not."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"notify_rows: more than {max_rows} alert rows — refusing to spam"
        )
    for r in rows:
        send(format_row(r.asDict()))
    return len(rows)
