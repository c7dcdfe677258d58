"""Retry with linear backoff (SURVEY.md C6).

Reference: gs_utils.py:51-63 — 6 attempts, ``sleep((attempt+1) *
interval)`` between failures, raise after the last. Generalized to a
decorator/wrapper usable by every source adapter.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import TypeVar

from bi_utils_spark.session import set_logging

T = TypeVar("T")


def with_retry(
    fn: Callable[[], T],
    num_retries: int = 6,
    interval: float = 10.0,
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Call ``fn`` up to ``num_retries`` times with linearly growing
    backoff. ``sleep`` is injectable for tests."""
    log = set_logging()
    last_exc: Exception | None = None
    for attempt in range(num_retries):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 — source errors are opaque
            last_exc = exc
            log.warning(
                "attempt %d/%d failed: %s", attempt + 1, num_retries, exc
            )
            if attempt + 1 < num_retries:
                sleep((attempt + 1) * interval)
    assert last_exc is not None
    raise last_exc
