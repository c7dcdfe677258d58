"""Shared filesystem + partition-overwrite primitives for the table
maintenance tier (merge, widening, compaction) — one copy of the two
disciplines those operators must never let diverge:

1. Hadoop FileSystem access (works on file://, hdfs://, s3a:// —
   local-only ``shutil``/``pathlib`` calls silently no-op on object
   storage);
2. the read-then-overwrite safety dance: MATERIALIZE (cache + count)
   before dynamically overwriting partition directories the plan just
   read from, restoring the session's overwrite mode afterwards.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def hadoop_fs(spark, path: str):
    """(FileSystem, Path) for ``path`` through the Hadoop API."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def fs_delete(spark, path: str) -> bool:
    """Recursive delete through the Hadoop FileSystem API."""
    fs, hpath = hadoop_fs(spark, path)
    return bool(fs.delete(hpath, True))


def overwrite_partitions(
    spark, df: DataFrame, partition_cols: Sequence[str], path: str
) -> None:
    """Dynamic-partition-overwrite ``df`` into ``path``: only the
    partition directories present in ``df`` are replaced; every other
    directory's files stay byte-identical. The frame is materialized
    (cache + count) FIRST because the caller just read those same
    directories — no job may read and overwrite the same files."""
    df.cache()
    df.count()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        df.unpersist()
