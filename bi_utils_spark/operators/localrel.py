"""Driver-local row sets → DataFrames without the pickled-RDD tax.

``spark.createDataFrame(list_of_tuples)`` parallelizes the rows into
``defaultParallelism`` pickled RDD slices; every downstream
``collect()`` (and every broadcast build) then launches a full-width
job whose tasks each pay a Python-worker round trip. For the small
index-metadata tables this engine passes around — PQ codebooks, IVF
centroids, BPE merge tables, component labels — that is pure
overhead: measured at local[32], collect of a 2 048-row list-backed
frame costs ~0.47 s steady-state vs ~0.08 s through the
pandas/Arrow path (guide §6: Arrow for driver transfers), and the
cost repeats for EVERY consumer of the frame.

``local_df`` routes such row sets through one Arrow batch. Results
are identical — only the physical source of the rows changes.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def local_df(
    spark: SparkSession, rows: Iterable[tuple], schema: str | StructType
) -> DataFrame:
    """Bounded driver-side ``rows`` (tuples matching ``schema``) → a
    DataFrame backed by a single Arrow batch. Use ONLY for metadata-
    sized row sets (the caller attests boundedness — same contract as
    collecting them back)."""
    rows = list(rows)
    st = (
        StructType.fromDDL(schema) if isinstance(schema, str) else schema
    )
    if not rows:
        return spark.createDataFrame([], st)
    import pandas as pd

    pdf = pd.DataFrame.from_records(rows, columns=st.fieldNames())
    return spark.createDataFrame(pdf, schema=st)


def collect_limited(df: DataFrame, n: int) -> list:
    """``df.limit(n).collect()`` in ONE job. CollectLimitExec's
    default take() escalation (1 partition, then 4x more per round,
    re-running the child subtree each round) is the right trade when
    the child is a cheap scan, but a bounded PROBE over an expensive
    subtree (a similarity join, a distinct over a merge source) pays
    that subtree several times over — measured ~2 s of duplicated
    task time on q_llm_pipeline's edge probe at sf0.1. Temporarily
    raising ``spark.sql.limit.initialNumPartitions`` makes the first
    round scan every partition, so the child runs exactly once.

    Results are unchanged: when the input has <= n rows (the only
    case callers act on), every row is returned under either
    strategy; an over-bound probe's extra rows are discarded."""
    spark = df.sparkSession
    key = "spark.sql.limit.initialNumPartitions"
    old = spark.conf.get(key, "1")
    spark.conf.set(key, str(2**31 - 1))
    try:
        return df.limit(n).collect()
    finally:
        spark.conf.set(key, old)
