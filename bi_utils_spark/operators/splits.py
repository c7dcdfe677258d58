"""Deterministic dataset splits & samples for training pipelines.

`df.randomSplit` / `rand()` sampling are not reproducible across
re-runs, repartitions, or shard boundaries — a training pipeline
needs the SAME document to land in the SAME split forever (else
eval contamination). The standard fix: hash the stable id, compare
against fixed thresholds. No reference counterpart (the reference
has no sampling at all); this is north-star pipeline surface.

Mechanics: md5(id || salt) → first 16 hex chars compared
LEXICOGRAPHICALLY against precomputed hex thresholds. Lowercase hex
compare == numeric compare, md5 is identical everywhere (Spark,
DuckDB, Python), so the assignment is portable and oracle-checkable
— and it is one map-only projection: zero shuffles, fuses into the
scan, works identically on a 100 TB corpus because each row's
assignment depends on nothing but the row.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 16  # 64 bits of the digest: threshold quantization ~2^-64


def _bucket_hex(id_col: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(salt))), 1, _HEX_DIGITS)


def _thresholds(weights: Mapping[str, float]) -> list[tuple[str, str]]:
    """[(split_name, upper_hex_bound)] with cumulative bounds; the last
    bound is forced to 'f'*16 so rounding never drops a row."""
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive number")
    names = list(weights)
    out: list[tuple[str, str]] = []
    acc = 0.0
    top = (1 << (4 * _HEX_DIGITS)) - 1
    for name in names[:-1]:
        acc += float(weights[name]) / total
        bound = min(int(acc * (top + 1)), top)
        out.append((name, format(bound, f"0{_HEX_DIGITS}x")))
    out.append((names[-1], format(top, f"0{_HEX_DIGITS}x") + "g"))  # > any hex
    return out


def split_assignment(
    id_col: Column | str,
    weights: Mapping[str, float],
    salt: str = "split",
) -> Column:
    """Column expression assigning each row a split label with the
    given weights (normalized). Deterministic in (id, salt) only."""
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    h = _bucket_hex(idc, salt)
    expr = None
    for name, bound in _thresholds(weights):
        cond = h < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: Mapping[str, float],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Attach a deterministic split column (e.g. {'train': .98,
    'val': .01, 'test': .01}). Re-running on any repartitioning of
    any superset/subset of the data gives every row the same label."""
    return df.withColumn(out_col, split_assignment(id_col, weights, salt))


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    salt: str = "sample",
) -> DataFrame:
    """Keep ~fraction of rows, chosen by id hash — reproducible and
    stable under repartitioning, unlike ``df.sample``. Map-only."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    top = (1 << (4 * _HEX_DIGITS)) - 1
    bound = format(min(int(fraction * (top + 1)), top), f"0{_HEX_DIGITS}x")
    idc = F.col(id_col)
    return df.filter(_bucket_hex(idc, salt) < F.lit(bound))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 1.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-balancing
    operator (e.g. downsample the dominant language to a fraction
    while keeping rare strata whole). Each stratum gets its own keep
    fraction; strata not listed keep ``default_fraction``.

    Same md5-threshold mechanics as :func:`deterministic_sample`
    (map-only, repartition-stable, superset-stable), with the stratum
    mixed into the hash so changing one stratum's fraction never
    reshuffles another's kept set.
    """
    for k, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {f}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1]")
    top = (1 << (4 * _HEX_DIGITS)) - 1

    def hex_bound(f: float) -> str:
        return format(min(int(f * (top + 1)), top), f"0{_HEX_DIGITS}x")

    bound = None
    for k, f in fractions.items():
        cond = F.col(stratum_col).cast("string") == k
        lit = F.lit(hex_bound(f))
        bound = F.when(cond, lit) if bound is None else bound.when(cond, lit)
    bound = (
        F.lit(hex_bound(default_fraction))
        if bound is None
        else bound.otherwise(F.lit(hex_bound(default_fraction)))
    )
    idc = F.concat(
        F.col(id_col).cast("string"), F.lit("\x1f"), F.col(stratum_col).cast("string")
    )
    return df.filter(_bucket_hex(idc, salt) < bound)


def stratified_hash_split(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    weights: Mapping[str, float],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Per-stratum deterministic split: salting the hash with the
    stratum makes the weight targets hold within every stratum
    (up to hash variance) instead of only globally. Still map-only."""
    idc = F.concat(F.col(id_col).cast("string"), F.lit("\x1f"), F.col(stratum_col).cast("string"))
    return df.withColumn(out_col, split_assignment(idc, weights, salt))
