"""Sequence gap & island detection (X94).

Warehouse integrity: "order keys should be dense — which ranges are
missing?" (dropped loads, purged partitions, upstream resets). The
textbook gaps-and-islands query is LAG over the totally-ordered key
column — a corpus-wide single-partition sort at scale. This
implementation is two-level:

1. bucket every id by ``id div bucket_size`` (map-only) and
   aggregate per bucket: min, max, distinct count, and each
   bucket's internal gaps found by a window over that bucket's OWN
   rows;
2. stitch bucket boundaries with one LAG over the BUCKET TABLE
   (|ids| / bucket_size rows): a gap between consecutive non-empty
   buckets spans (prev bucket's max + 1, this bucket's min − 1);
   fully-missing buckets fall out of the same boundary arithmetic.

Shuffle shape: one hash shuffle on the bucket key (windows
partition BY BUCKET — bounded frames), then a bucket-table window.
No global sort, no corpus-wide window — the exact trade
filtering.py makes for percent-rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sequence_gaps(
    df: DataFrame,
    id_col: str,
    bucket_size: int = 1 << 20,
) -> DataFrame:
    """(gap_start, gap_end) for every maximal missing id range
    STRICTLY INSIDE the observed [min, max] span (duplicates are
    fine; NULLs drop). Endpoints inclusive."""
    i = F.col(id_col).cast("long")
    ids = df.where(i.isNotNull()).select(
        i.alias("__id"),
        F.expr(f"CAST({id_col} AS BIGINT) div {bucket_size}").alias(
            "__b"
        ),
    ).dropDuplicates(["__id"])
    wb = Window.partitionBy("__b").orderBy("__id")
    with_prev = ids.withColumn("__prev", F.lag("__id").over(wb))
    inner = with_prev.where(
        F.col("__prev").isNotNull()
        & (F.col("__id") - F.col("__prev") > 1)
    ).select(
        (F.col("__prev") + 1).alias("gap_start"),
        (F.col("__id") - 1).alias("gap_end"),
    )
    buckets = ids.groupBy("__b").agg(
        F.min("__id").alias("__lo"), F.max("__id").alias("__hi")
    )
    wg = Window.orderBy("__b")  # bucket table: |ids|/bucket_size rows
    boundary = (
        buckets.withColumn("__phi", F.lag("__hi").over(wg))
        .where(
            F.col("__phi").isNotNull()
            & (F.col("__lo") - F.col("__phi") > 1)
        )
        .select(
            (F.col("__phi") + 1).alias("gap_start"),
            (F.col("__lo") - 1).alias("gap_end"),
        )
    )
    return inner.unionByName(boundary)


def sequence_islands(
    df: DataFrame,
    id_col: str,
    bucket_size: int = 1 << 20,
) -> DataFrame:
    """(island_start, island_end, n_ids) — maximal contiguous runs
    of present ids, derived from :func:`sequence_gaps` plus the
    global bounds (gaps partition the span, so islands are the
    complement — computed from the GAP table, which is small when
    the sequence is healthy)."""
    i = F.col(id_col).cast("long")
    ids = df.where(i.isNotNull()).select(i.alias("__id"))
    bounds = ids.agg(
        F.min("__id").alias("__lo"), F.max("__id").alias("__hi")
    )
    gaps = sequence_gaps(df, id_col, bucket_size)
    # island starts: global min + every gap_end + 1;
    # island ends:   global max + every gap_start - 1
    starts = gaps.select(
        (F.col("gap_end") + 1).alias("island_start")
    ).unionByName(
        bounds.select(F.col("__lo").alias("island_start"))
    )
    ends = gaps.select(
        (F.col("gap_start") - 1).alias("island_end")
    ).unionByName(bounds.select(F.col("__hi").alias("island_end")))
    w = Window.orderBy("island_start")  # gap-table-sized
    ranked_s = starts.withColumn("__r", F.row_number().over(w))
    ranked_e = ends.withColumn(
        "__r", F.row_number().over(Window.orderBy("island_end"))
    )
    paired = ranked_s.join(ranked_e, "__r")
    # an island is contiguous by construction, so every id inside is
    # present: the count is pure interval arithmetic, no corpus join
    return paired.select(
        "island_start",
        "island_end",
        (F.col("island_end") - F.col("island_start") + 1).alias(
            "n_ids"
        ),
    )
