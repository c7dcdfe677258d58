"""bi_utils_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of Flaconi/bi_utils
(reference snapshot at /root/reference, surveyed in SURVEY.md) as a
composable PySpark operator library, extended with LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
columns). Architecture: DataFrame/SQL plans that Catalyst optimizes;
Pandas UDFs only where built-ins can't express the semantics.

Layout
------
- ``session``    : SparkSession factory tuned for local + cluster use
- ``functions``  : scalar Column builders (hash, timestamps, paths)
- ``operators``  : relational / nested / merge / drift / LLM-data ops
- ``sources``    : source & sink adapters (REST landing, sheets, retry)
- ``streaming``  : watermark + stateful alert-dedup streaming variants
"""

from bi_utils_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
