"""Scalar Column builders — the engine's function library.

Every reference scalar (SURVEY.md §2.8, F1-F11) re-expressed as a
native Spark Column expression: JVM-side, codegen'd, never a Python
UDF. Import surface: ``from bi_utils_spark.functions import hash_id``.
"""

from bi_utils_spark.functions.scalars import (  # noqa: F401
    abs_threshold,
    check_for_key,
    extract_path,
    format_timestamp,
    get_or_default,
    hash_id,
    hash_id_sha2,
    parse_timestamp,
    strip_column_names,
)
