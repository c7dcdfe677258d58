"""Distribution-drift detection (X108, r7): Population Stability
Index between a baseline table and a current batch.

The DQ suite (dq.py) checks each batch against DECLARED constraints;
this module checks it against the DISTRIBUTION the pipeline was
built/trained on — the ML-data failure mode where every row is
individually valid but the mix shifted (price inflation, a new
traffic source, an upstream unit change). PSI is the industry
standard readout: PSI = Σ_bins (p_cur − p_base)·ln(p_cur/p_base),
with < 0.1 read as stable, 0.1–0.25 as moderate shift, > 0.25 as
major shift.

Determinism (the chi2/abtest discipline): bin edges are equi-width
over the BASELINE's [min, max] — one bounded driver fetch, baked
back as literals, so the downstream plan is static; shares come from
exact BIGINT counts over explicit bins (underflow/overflow/null bins
included, so out-of-range or newly-null current values are COUNTED
drift, not dropped rows); shares are epsilon-floored before the log
so empty bins contribute a finite, documented penalty; and each
bin's term quantizes to 1e-9 fixed point before an integer sum —
order-independent and engine-replayable (the oracle replays every
bin in SQL).

Scale: per frame, ONE partial-aggregable count per (column, bin) —
shuffle volume is |columns| × |bins| rows regardless of corpus size.
The bounds fetch is parquet-statistics-cheap on plain scans. Nothing
driver-side grows with the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bin ids for values outside the regular grid
NULL_BIN = -2
UNDER_BIN = -1


def _bin_col(c: str, lo: float, hi: float, num_bins: int) -> Column:
    """Static-literal bin id: -2 null, -1 below lo, num_bins above hi
    (the baseline max x == hi closes the LAST regular bin, standard
    histogram closure), else floor((x − lo)/width) clamped to the
    grid. Degenerate lo == hi puts all non-null in-range mass in
    bin 0."""
    x = F.col(c).cast("double")
    if hi <= lo:
        return F.when(x.isNull(), F.lit(NULL_BIN)).otherwise(
            F.when(x < F.lit(lo), F.lit(UNDER_BIN))
            .when(x > F.lit(hi), F.lit(num_bins))
            .otherwise(F.lit(0))
        ).cast("int")
    width = (hi - lo) / num_bins
    raw = F.floor((x - F.lit(lo)) / F.lit(width))
    return F.when(x.isNull(), F.lit(NULL_BIN)).otherwise(
        F.when(x < F.lit(lo), F.lit(UNDER_BIN))
        .when(x > F.lit(hi), F.lit(num_bins))
        .otherwise(F.least(raw, F.lit(num_bins - 1)))
    ).cast("int")


def _bin_counts(
    df: DataFrame, cols: list[str], bounds: dict, num_bins: int
) -> DataFrame:
    """(column, bin, n): ONE aggregation for every requested column —
    the long-form explode trick (cf. dq.profile_columns), partial-
    aggregable so the shuffle is |columns| × |bins| rows."""
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            _bin_col(c, *bounds[c], num_bins).alias("bin"),
        )
        for c in cols
    ]
    return (
        df.select(F.explode(F.array(*structs)).alias("cb"))
        .groupBy("cb.column", "cb.bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def psi_report(
    baseline: DataFrame,
    current: DataFrame,
    columns: list[str],
    num_bins: int = 10,
    epsilon: float = 1e-6,
) -> DataFrame:
    """(column, psi, verdict, n_base, n_cur) per requested numeric
    column. Verdicts: 'stable' (< 0.1), 'moderate_shift' (< 0.25),
    'major_shift' (the standard cutoffs). See module docstring for
    the determinism and scale contract."""
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
    bc = _bin_counts(baseline, columns, bounds, num_bins).withColumnRenamed(
        "n", "n_base_bin"
    )
    cc = _bin_counts(current, columns, bounds, num_bins).withColumnRenamed(
        "n", "n_cur_bin"
    )
    # full outer on (column, bin): a bin empty on one side still
    # contributes (via the epsilon floor) — that asymmetry IS drift
    j = bc.join(cc, ["column", "bin"], "full_outer").select(
        "column",
        "bin",
        F.coalesce("n_base_bin", F.lit(0)).alias("nb"),
        F.coalesce("n_cur_bin", F.lit(0)).alias("nc"),
    )
    totals = j.groupBy("column").agg(
        F.sum("nb").alias("n_base"), F.sum("nc").alias("n_cur")
    )
    t = j.join(totals, "column")
    pb = F.greatest(
        F.col("nb").cast("double") / F.col("n_base").cast("double"),
        F.lit(float(epsilon)),
    )
    pc = F.greatest(
        F.col("nc").cast("double") / F.col("n_cur").cast("double"),
        F.lit(float(epsilon)),
    )
    term = (pc - pb) * F.log(pc / pb)
    termq = F.floor(term * 1e9).cast("long")
    psi = F.col("__psi_q").cast("double") / 1e9
    out = t.groupBy("column", "n_base", "n_cur").agg(
        F.sum(termq).alias("__psi_q")
    )
    return out.select(
        "column",
        psi.alias("psi"),
        F.when(psi < 0.1, F.lit("stable"))
        .when(psi < 0.25, F.lit("moderate_shift"))
        .otherwise(F.lit("major_shift"))
        .alias("verdict"),
        "n_base",
        "n_cur",
    )
