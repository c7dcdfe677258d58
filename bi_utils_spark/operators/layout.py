"""Multi-dimensional data layout (Z-order) for scan pruning (X61).

At 100 TB the cheapest query is the one that never reads the file:
parquet keeps min/max stats per file and row group, and Spark prunes
scans against them — but a layout sorted on ONE column gives tight
stats on that column only. Interleaving the bits of several bucketed
dimensions (a Z-order / Morton curve) and range-partitioning + sorting
on the interleaved key keeps EVERY participating dimension's per-file
range narrow, so predicates on any of them prune files. This is the
same mechanism behind Delta/Iceberg's ``OPTIMIZE ZORDER BY``,
implemented here as plain Column arithmetic + a range repartition —
engine-neutral, no table format required.

Everything is JVM-side integer bit arithmetic (shiftleft/bitwise-or
folds, whole-stage codegen); the only non-map stage is the final
range exchange that the rewrite needs anyway.

Reference: Flaconi/bi_utils has no layout tier (north-star surface,
same as X57-X60). Morton order: Morton (1966); pruning mechanics:
parquet-format §Statistics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton key: interleave the low ``bits`` bits of each integer
    column into one BIGINT (column i owns bit positions
    ``j * len(cols) + i`` for bit j). Inputs must already be bucketed
    to non-negative ints < 2**bits — see :func:`minmax_bucket`;
    values are clamped defensively so an out-of-range row lands on
    the curve's edge instead of corrupting unrelated key bits.

    ``len(cols) * bits`` must stay <= 63 (BIGINT). The expression is
    a fold of ``2 * bits * len(cols)`` shift/mask terms — constant
    per-row work, fully codegen'd, no shuffle.
    """
    n = len(cols)
    if n < 1:
        raise ValueError("zorder_key needs at least one column")
    if n * bits > 63:
        raise ValueError(
            f"{n} cols x {bits} bits = {n * bits} key bits; max 63"
        )
    key = F.lit(0).cast("long")
    hi = (1 << bits) - 1
    for i, c in enumerate(cols):
        v = (F.col(c) if isinstance(c, str) else c).cast("long")
        v = F.greatest(F.lit(0), F.least(v, F.lit(hi)))
        for j in range(bits):
            bit = F.shiftright(v, j).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, j * n + i))
    return key


def minmax_bucket(
    col: Column | str, lo: float, hi: float, bits: int = 16
) -> Column:
    """Uniform bucket of a numeric column into [0, 2**bits): the
    bucketization feeding :func:`zorder_key` when the dimension is
    not already a small int. ``lo``/``hi`` are DATA bounds supplied
    by the caller (one bounded min/max agg, or known domain limits) —
    passing literals keeps this map-only. Out-of-range values clamp
    to the edge buckets."""
    c = F.col(col) if isinstance(col, str) else col
    n = 1 << bits
    span = float(hi) - float(lo)
    if span <= 0:
        return F.lit(0).cast("long")
    raw = F.floor((c.cast("double") - F.lit(float(lo))) / F.lit(span) * n)
    return F.greatest(
        F.lit(0).cast("long"), F.least(raw.cast("long"), F.lit(n - 1).cast("long"))
    )


def zorder_layout(
    df: DataFrame,
    bucket_cols: list[Column | str],
    bits: int = 16,
    num_partitions: int | None = None,
    key_col: str = "_zkey",
) -> DataFrame:
    """Rewrite layout: range-partition + sort the frame by the Morton
    key of the given (already bucketed) columns, then drop the key.
    Writing the result gives every file tight min/max ranges on ALL
    participating dimensions. One range exchange — the shuffle any
    layout rewrite pays — then a within-partition sort; no global
    sort, no driver involvement beyond range-boundary sampling."""
    keyed = df.withColumn(key_col, zorder_key(bucket_cols, bits))
    parts = (
        [num_partitions, key_col] if num_partitions else [key_col]
    )
    return (
        keyed.repartitionByRange(*parts)
        .sortWithinPartitions(key_col)
        .drop(key_col)
    )


def layout_span_stats(
    df: DataFrame, cols: list[str]
) -> DataFrame:
    """Diagnostic: per-partition (≈ per-output-file) min/max span of
    each dimension — the quantity parquet pruning sees. Run it on a
    candidate layout to compare against a baseline; spans shrink on
    every z-ordered dimension, not just the first sort key. One
    partial-aggregable groupBy on the bounded partition id."""
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
            (F.max(c) - F.min(c)).alias(f"{c}_span"),
        ]
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(*aggs)
    )


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    """The EXACT SQL-text equivalent of :func:`zorder_key` (same
    clamp, same bit placement) for cross-engine oracles — DuckDB and
    Spark SQL both evaluate it with plain integer bit operators."""
    n = len(cols)
    hi = (1 << bits) - 1
    terms = []
    for i, c in enumerate(cols):
        v = f"LEAST(GREATEST(CAST({c} AS BIGINT), 0), {hi})"
        for j in range(bits):
            terms.append(f"((({v} >> {j}) & 1) << {j * n + i})")
    return "(" + " | ".join(terms) + ")"
