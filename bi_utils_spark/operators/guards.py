"""Entry-point size guards for operators whose plans legitimately
carry a BroadcastNestedLoopJoin (r10 verdict task 7).

A BNLJ is the RIGHT plan when one side is small by contract — a query
batch, a benchmark set, a one-row stats frame. It is a runaway when
that contract is silently violated: broadcasting 10⁸ rows OOMs every
executor, and even when it fits, the join evaluates |big|·|broadcast|
predicate folds. These operators therefore refuse to PLAN the join
once the broadcast side exceeds a documented row bound, and the error
names the blocked/bucketed form to use instead:

- ``similarity.knn_join_exact``    → ``knn_join_blocked``
- ``decontam.semantic_contamination_pairs`` / ``semantic_decontaminate``
                                   → IVF probe per bench item
- ``ranking.bm25_topk`` / ``bm25_scores`` (term-count guard)
                                   → ``bm25_from_index``
- ``retrieval.hybrid_topk`` (depth guard) — legs are pre-cut, so the
  only unbounded knob is the fusion depth itself.

The probe is ``limit(max_rows + 1).count()`` — a bounded job that
early-stops the scan, so a side that honors its contract pays one
cheap pass, never a full count of an unexpectedly huge input. Pass
``max_broadcast_rows=None`` to skip the probe when the caller has
already sized the side (e.g. it came off a ``limit``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class BroadcastSizeError(ValueError):
    """Broadcast side of a nested-loop join exceeds its size contract."""


def require_broadcastable(
    df: DataFrame,
    max_rows: int | None,
    side: str,
    op: str,
    scale_alt: str,
) -> DataFrame:
    """Return ``df`` unchanged iff it has at most ``max_rows`` rows;
    otherwise raise :class:`BroadcastSizeError` naming the scale path.

    ``max_rows=None`` disables the probe (caller-attested size).
    """
    if max_rows is None:
        return df
    if max_rows < 1:
        raise ValueError(f"{op}: max_broadcast_rows must be >= 1 or None")
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise BroadcastSizeError(
            f"{op}: the {side} side exceeds {max_rows} rows and is about "
            f"to be broadcast into a BroadcastNestedLoopJoin — at that "
            f"size the plan is a runaway (every executor holds the whole "
            f"side; the join evaluates |big|x|broadcast| predicate "
            f"folds). Use {scale_alt} instead, or pass a larger "
            f"max_broadcast_rows (or None) if this side genuinely fits "
            f"in executor memory."
        )
    return df
