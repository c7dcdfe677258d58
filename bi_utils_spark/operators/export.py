"""Training-dataset export — sharded materialization with a manifest.

The last step of the curation pipeline: write the selected corpus out
as deterministic shards (the :func:`bi_utils_spark.operators.
importance.shard_positions` addresses) plus a small manifest table a
trainer can trust — per-shard row counts, token mass, and an
order-insensitive content checksum that re-verifies a shard without
re-reading the rest of the dataset.

Scale: one hash shuffle into shards (each task sorts only its own
shard), one pass for the manifest aggregation that reuses the same
partitioning, dynamic-overwrite semantics for re-runs. The checksum
is an XOR-fold of per-row xxhash64 — associative, commutative and
overflow-free (ANSI-safe), so it is partial-aggregated map-side and
any subset of shards can be audited independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bi_utils_spark.operators.importance import shard_positions
from bi_utils_spark.operators.textstats import token_count


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    text_col: str = "text",
    num_shards: int = 32,
    salt: str = "shuffle",
) -> DataFrame:
    """Write ``df`` to ``path`` partitioned into pseudorandom shards
    and return the manifest (also persisted at ``path``/_manifest):
    (shard, n_rows, n_tokens, content_hash). Deterministic: the same
    input produces byte-identical shard membership and manifest on
    every run.

    content_hash = XOR-fold of xxhash64(id, text) per shard — order-
    insensitive and associative, so a trainer (or a later audit) can
    recompute it for one shard in isolation and compare. (XOR, not
    sum: overflow-free under ANSI SQL; ids are unique so pairwise
    cancellation cannot occur.)
    """
    addressed = shard_positions(df, id_col, num_shards=num_shards, salt=salt)
    addressed.write.mode("overwrite").partitionBy("shard").parquet(
        f"{path}/data"
    )
    spark = df.sparkSession
    back = spark.read.parquet(f"{path}/data")
    manifest = (
        back.groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(token_count(text_col)).alias("n_tokens"),
            F.expr(
                f"bit_xor(xxhash64({id_col}, {text_col}))"
            ).alias("content_hash"),
        )
        .orderBy("shard")
    )
    manifest.write.mode("overwrite").parquet(f"{path}/_manifest")
    return spark.read.parquet(f"{path}/_manifest")


def verify_training_shards(
    spark, path: str, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Recompute the manifest from the shard data and diff it against
    the stored one: returns rows (shard, ok, stored_hash,
    actual_hash, stored_rows, actual_rows) — ``ok`` false means the
    shard's bytes no longer match what was written (corruption,
    partial overwrite, manual edits). Reads shards in one pass;
    auditing a single shard is a partition-pruned variant of the same
    plan."""
    back = spark.read.parquet(f"{path}/data")
    actual = back.groupBy("shard").agg(
        F.count("*").alias("actual_rows"),
        F.expr(f"bit_xor(xxhash64({id_col}, {text_col}))").alias("actual_hash"),
    )
    stored = spark.read.parquet(f"{path}/_manifest").select(
        "shard",
        F.col("n_rows").alias("stored_rows"),
        F.col("content_hash").alias("stored_hash"),
    )
    return (
        stored.join(actual, "shard", "full_outer")
        .select(
            "shard",
            # eqNullSafe: a shard missing from either side (full_outer
            # NULLs) must report ok=false, not NULL — a plain == would
            # null-propagate and hide wholly-deleted shards from
            # callers filtering ok == False
            (
                F.col("stored_rows").eqNullSafe(F.col("actual_rows"))
                & F.col("stored_hash").eqNullSafe(F.col("actual_hash"))
            ).alias("ok"),
            "stored_hash",
            "actual_hash",
            "stored_rows",
            "actual_rows",
        )
        .orderBy("shard")
    )
