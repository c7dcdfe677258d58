"""Source & sink adapters (SURVEY.md §2.1)."""

from bi_utils_spark.sources.tables import load_table  # noqa: F401
