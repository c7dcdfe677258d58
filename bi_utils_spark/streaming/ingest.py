"""Streaming ingestion over landed page files (SURVEY.md §2.12 + §3.1).

The reference's keyset-pagination loop (ct_utils.py:183-263) lands
pages and re-reads them batch-style; the streaming analogue watches
the landing directory with a file source, so ingestion becomes a
continuously running query instead of a cron'd batch:

- ``maxFilesPerTrigger`` reproduces the bounded page-size semantics
  (S5's limit≤500 guard) at micro-batch granularity;
- the lookback watermark (with_lookback_watermark) carries the delta-
  load late-data tolerance;
- nested payloads flatten with the SAME operator as batch
  (operators/nested.py::flatten is schema-driven and stateless, so it
  is streaming-safe as-is).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def stream_landed(
    spark: SparkSession,
    landing_dir: str,
    schema: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over a JSONL landing directory with an explicit
    schema (file streams must not infer). New files = new micro-batch.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(landing_dir)
