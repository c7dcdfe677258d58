"""Streaming distribution-drift monitoring (X109, r7) — the
continuous form of ``operators/drift.py::psi_report``.

A scoring/serving pipeline wants to know the moment its input mix
leaves the training distribution, not at the nightly batch audit.
This monitor profiles the BASELINE once at stream-build time (bounds
+ per-bin shares, a bounded driver fetch — index-metadata-sized:
|columns| × |bins| doubles shipped as literals) and then evaluates
every micro-batch STATELESSLY: one partial-aggregable (column, bin)
count over the batch, terms against the baked baseline shares, one
PSI row per column per batch. Stateless means no state store, no
watermark coupling, restart-safe for free — the baseline is plan
metadata, exactly like a broadcast dimension.

Emits ``(window_start, window_end, column, psi, verdict, n_cur)``
per micro-batch trigger when used windowed, or
``(batch_id, column, psi, verdict, n_cur)`` through
:func:`monitor_drift_foreach` — the foreachBatch form that can feed
``sinks.send_webhook_alert`` on a 'major_shift' verdict.

Batch parity (test-asserted): a micro-batch evaluated by the stream
fold equals ``psi_report(baseline, batch)`` on the same frames —
same bins, same epsilon floor, same 1e-9 term quantization.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bi_utils_spark.operators.drift import _bin_col


def baseline_profile(
    baseline: DataFrame,
    columns: list[str],
    num_bins: int = 10,
) -> dict:
    """Bounds + per-bin baseline shares as a plain dict — the
    monitor's plan metadata (|columns| × (num_bins + 3) doubles).
    Computed with the exact batch-operator binning, one aggregation
    per step, both bounded driver fetches."""
    brow = baseline.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__lo_{c}") for c in columns],
        *[F.max(F.col(c).cast("double")).alias(f"__hi_{c}") for c in columns],
    ).first()
    bounds = {
        c: (
            float(brow[f"__lo_{c}"]) if brow[f"__lo_{c}"] is not None else 0.0,
            float(brow[f"__hi_{c}"]) if brow[f"__hi_{c}"] is not None else 0.0,
        )
        for c in columns
    }
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            _bin_col(c, *bounds[c], num_bins).alias("bin"),
        )
        for c in columns
    ]
    counts = (
        baseline.select(F.explode(F.array(*structs)).alias("cb"))
        .groupBy("cb.column", "cb.bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    totals: dict[str, int] = {c: 0 for c in columns}
    per_bin: dict[str, dict[int, int]] = {c: {} for c in columns}
    for r in counts:
        per_bin[r["column"]][r["bin"]] = r["n"]
        totals[r["column"]] += r["n"]
    shares = {
        c: {
            b: (per_bin[c].get(b, 0) / totals[c] if totals[c] else 0.0)
            for b in range(-2, num_bins + 1)
        }
        for c in columns
    }
    return {
        "columns": list(columns),
        "num_bins": num_bins,
        "bounds": bounds,
        "shares": shares,
    }


def _psi_against_profile(
    batch: DataFrame, profile: dict, epsilon: float
) -> DataFrame:
    """(column, psi, verdict, n_cur) for one bounded frame against
    the baked baseline profile — the shared fold used by both the
    windowed stream and the foreachBatch monitor."""
    cols = profile["columns"]
    num_bins = profile["num_bins"]
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            _bin_col(c, *profile["bounds"][c], num_bins).alias("bin"),
        )
        for c in cols
    ]
    counts = (
        batch.select(F.explode(F.array(*structs)).alias("cb"))
        .groupBy("cb.column", "cb.bin")
        .agg(F.count(F.lit(1)).alias("nc"))
    )
    # complete (column, bin) grid so bins empty in the batch still
    # contribute against a non-empty baseline share
    spark = batch.sparkSession
    from bi_utils_spark.operators.localrel import local_df

    grid = local_df(
        spark,
        [(c, b) for c in cols for b in range(-2, num_bins + 1)],
        "column string, bin int",
    )
    base_share = F.coalesce(
        *[
            F.when(
                F.col("column") == c,
                F.element_at(
                    F.create_map(
                        *[
                            F.lit(x)
                            for b in range(-2, num_bins + 1)
                            for x in (b, float(profile["shares"][c][b]))
                        ]
                    ),
                    F.col("bin"),
                ),
            )
            for c in cols
        ]
    )
    j = grid.join(counts, ["column", "bin"], "left").select(
        "column",
        "bin",
        F.coalesce("nc", F.lit(0)).alias("nc"),
        base_share.alias("pb_raw"),
    )
    totals = j.groupBy("column").agg(F.sum("nc").alias("n_cur"))
    t = j.join(totals, "column")
    pb = F.greatest(F.col("pb_raw"), F.lit(float(epsilon)))
    pc = F.greatest(
        F.col("nc").cast("double") / F.col("n_cur").cast("double"),
        F.lit(float(epsilon)),
    )
    term = (pc - pb) * F.log(pc / pb)
    termq = F.floor(term * 1e9).cast("long")
    psi = F.col("__psi_q").cast("double") / 1e9
    return (
        t.groupBy("column", "n_cur")
        .agg(F.sum(termq).alias("__psi_q"))
        .select(
            "column",
            psi.alias("psi"),
            F.when(psi < 0.1, F.lit("stable"))
            .when(psi < 0.25, F.lit("moderate_shift"))
            .otherwise(F.lit("major_shift"))
            .alias("verdict"),
            "n_cur",
        )
    )


def monitor_drift_foreach(
    stream: DataFrame,
    profile: dict,
    checkpoint_dir: str,
    on_report: Callable[[DataFrame, int], None],
    epsilon: float = 1e-6,
    query_name: str = "drift_monitor",
):
    """Start the per-micro-batch monitor: each batch folds through
    the shared PSI evaluation against the baked baseline profile and
    the resulting report frame (column, psi, verdict, n_cur) is
    handed to ``on_report(report_df, batch_id)`` — wire it to a
    webhook sink, an audit append, or a metrics push. Empty batches
    are skipped."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        on_report(_psi_against_profile(batch_df, profile, epsilon), batch_id)

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .queryName(query_name)
        .start()
    )
