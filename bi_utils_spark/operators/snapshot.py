"""Dataset snapshot diffing — "what changed between corpus v1 and
v2": the audit step of training-data versioning. Every re-crawl /
re-filter / re-dedup run produces a new snapshot; the diff (added /
removed / changed per key) is what a data card, an incremental
re-embedding job, or a cache-invalidation step actually consumes —
re-process 2% of documents, not 100%.

Shape at 100 TB: one full-outer join on the key hash (both sides
shuffle keyed — pre-bucket both snapshots by key to make it
map-side), with content equality decided by the dedup tier's
``content_hash`` computed map-side BEFORE the join, so the join
carries (key, 32-byte digest) per side, never the payloads. The
`changed_only` form prunes `unchanged` rows inside the join's
projection — the common consumer ("what do I re-embed?") never
materializes the unchanged 98%.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bi_utils_spark.operators.dedup import content_hash


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    content_cols: Sequence[str] | None = None,
    changed_only: bool = False,
) -> DataFrame:
    """(key..., change) with change ∈ added | removed | changed |
    unchanged, comparing ``new`` against ``old`` per key.

    ``content_cols`` defaults to every non-key column the two
    snapshots share. Content identity is the engine's one
    ``content_hash`` (JSON-struct sha2 — NULL-safe, boundary-safe),
    so "changed" means the column VALUES differ, with NULL ≠ '' and
    no field-boundary collisions. The key must be unique per snapshot
    — a diff over an ambiguous key is meaningless and the join would
    silently fan out; probe with :func:`assert_unique_keys` (or run
    dedup_exact first) when provenance doesn't guarantee it.

    ``changed_only=True`` drops the unchanged rows inside the join
    projection — the incremental-reprocessing consumer's form.
    """
    keys = list(key_cols)
    if not keys:
        raise ValueError("snapshot_diff needs at least one key column")
    if content_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        content_cols = [c for c in shared if c not in keys]
    cols = list(content_cols)
    if not cols:
        raise ValueError("no content columns to compare")

    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            *[F.col(k).alias(f"__k{i}") for i, k in enumerate(keys)],
            content_hash(cols).alias(f"__h_{tag}"),
            F.lit(1).alias(f"__p_{tag}"),
        )

    o = side(old, "o")
    n = side(new, "n")
    kn = [f"__k{i}" for i in range(len(keys))]
    joined = o.join(n, kn, "full_outer")
    change = (
        F.when(F.col("__p_o").isNull(), F.lit("added"))
        .when(F.col("__p_n").isNull(), F.lit("removed"))
        .when(F.col("__h_o") != F.col("__h_n"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(
        *[F.col(f"__k{i}").alias(k) for i, k in enumerate(keys)],
        change.alias("change"),
    )
    if changed_only:
        out = out.filter(F.col("change") != "unchanged")
    return out


def assert_unique_keys(df: DataFrame, key_cols: Sequence[str]) -> None:
    """Raise if any key tuple repeats — the precondition probe for
    :func:`snapshot_diff` (one keyed aggregate; run it when the
    snapshot's provenance doesn't already guarantee uniqueness)."""
    dup = (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        vals = {k: dup[0][k] for k in key_cols}
        raise ValueError(f"duplicate key in snapshot: {vals}")
