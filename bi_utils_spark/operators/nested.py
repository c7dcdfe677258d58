"""Semi-structured normalization operators (SURVEY.md §2.9, N1-N4).

The heart of the reference: commercetools JSON responses flattened to
relational form via a fixpoint of explode + json_normalize
(`ct_utils.py:54-180`). The pandas implementation needed an elaborate
index-join dance (`ct_utils.py:71-99`: reset_index, record the
pre-explode index, dropna, normalize, merge right_index/left_index,
left-join back, prune `_2` duplicates) because pandas ``explode``
drops nothing but ``json_normalize`` needs non-null dicts. Spark's
``explode_outer`` + struct expansion subsume the whole dance:

- ``explode_outer`` keeps parent rows whose array is NULL or empty
  (the J2 left-join semantics, `ct_utils.py:92`) — child columns
  become NULL, exactly like the reference's merged result;
- struct expansion with ``parent__child`` aliases reproduces the
  ``add_prefix(f"{col}__")`` naming contract (F8, `ct_utils.py:86`);
- detection is pure schema metadata (`check_list_cols_in_df`'s
  full-column data scan at `ct_utils.py:65` becomes O(1)).

Scale notes (100 TB): flatten emits ONE lazy plan — no data passes
until an action; Catalyst prunes unexploded columns down to the
parquet scan. ``explode_outer`` is a codegen'd Generate node: no
shuffle, no Python. Each explode multiplies rows; the ``exclude``
knob (reference's ``cols_to_exclude``, `ct_utils.py:58-61`) remains
the way to keep known-fat arrays packed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType


def list_columns(df: DataFrame, exclude: Sequence[str] = ()) -> list[str]:
    """Names of array-typed columns, minus an exclude list.

    Reference: N2 ``check_list_cols_in_df`` (`ct_utils.py:54-68`) —
    which scanned every value (``applymap(type) == list``). Here the
    schema already knows; no job runs.
    """
    ex = set(exclude)
    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, ArrayType) and f.name not in ex
    ]


def struct_columns(df: DataFrame, exclude: Sequence[str] = ()) -> list[str]:
    """Names of struct-typed columns, minus an exclude list."""
    ex = set(exclude)
    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, StructType) and f.name not in ex
    ]


def _unique(name: str, taken: set[str]) -> str:
    # Collision policy mirrors the reference's merge suffixes ('', '_2'),
    # ct_utils.py:92-98: first duplicate gets _2, then _3, ...
    if name not in taken:
        return name
    i = 2
    while f"{name}_{i}" in taken:
        i += 1
    return f"{name}_{i}"


def expand_struct(df: DataFrame, column: str, sep: str = "__") -> DataFrame:
    """Expand one struct column into ``parent__child`` columns (F8)."""
    field = df.schema[column]
    if not isinstance(field.dataType, StructType):
        raise ValueError(f"expand_struct: {column} is not a struct")
    taken = {c for c in df.columns if c != column}
    cols = []
    for c in df.columns:
        if c != column:
            cols.append(F.col(f"`{c}`"))
        else:
            for sub in field.dataType.fields:
                out = _unique(f"{column}{sep}{sub.name}", taken)
                taken.add(out)
                cols.append(F.col(f"`{column}`").getField(sub.name).alias(out))
    return df.select(*cols)


def explode_and_normalize(df: DataFrame, column: str, sep: str = "__") -> DataFrame:
    """Explode one array column to rows; expand struct elements.

    Reference: N1 ``explode_and_normalize`` (`ct_utils.py:71-99`).
    ``explode_outer`` preserves parent rows with NULL/empty arrays
    (the reference's left-join-back step, `ct_utils.py:92`); struct
    payloads get ``column__field`` names, scalar payloads keep the
    column name.
    """
    field = df.schema[column]
    if not isinstance(field.dataType, ArrayType):
        raise ValueError(f"explode_and_normalize: {column} is not an array")
    out = df.withColumn(column, F.explode_outer(F.col(f"`{column}`")))
    if isinstance(out.schema[column].dataType, StructType):
        out = expand_struct(out, column, sep=sep)
    return out


def flatten(
    df: DataFrame,
    exclude: Sequence[str] = (),
    sep: str = "__",
    max_depth: int = 20,
) -> DataFrame:
    """Fixpoint flatten: repeat explode/expand until no nested columns.

    Reference: N3 ``normalize_final_df`` (`ct_utils.py:161-180`) —
    ``while check_list_cols_in_df: explode_and_normalize`` — plus the
    struct expansion json_normalize performed implicitly. Excluded
    columns stay packed (``cols_to_exclude``, `ct_utils.py:58-61`).

    ``max_depth`` caps pathological/recursive schemas (the reference
    could loop forever on adversarial input; we raise instead).
    Builds a single lazy plan; iteration is schema-metadata-driven.
    """
    for _ in range(max_depth):
        structs = struct_columns(df, exclude)
        for c in structs:
            df = expand_struct(df, c, sep=sep)
        arrays = list_columns(df, exclude)
        if not arrays and not struct_columns(df, exclude):
            return df
        for c in arrays:
            df = explode_and_normalize(df, c, sep=sep)
    if list_columns(df, exclude) or struct_columns(df, exclude):
        raise RecursionError(
            f"flatten: schema still nested after max_depth={max_depth}"
        )
    return df


def from_json_normalized(
    df: DataFrame,
    column: str,
    schema=None,
    sample_ratio: float = 1.0,
    exclude: Sequence[str] = (),
    sep: str = "__",
) -> DataFrame:
    """Parse a JSON *string* column and flatten it (N4 analogue).

    Reference: ``process_response_from_commercetools``
    (`ct_utils.py:102-123`) json_normalized raw API dicts. Here the
    JSON may live in a column (e.g. ``events.props``); schema is
    either supplied or inferred from the data via ``schema_of_json``
    on a sample (inference = one extra job — supply the schema in
    production pipelines).
    """
    if schema is None:
        sample = [
            r[0]
            for r in df.select(column).filter(F.col(column).isNotNull())
            .sample(fraction=min(sample_ratio, 1.0), seed=42)
            .limit(1000)
            .collect()
        ]
        if not sample:
            return df
        rdd_free = df.sparkSession.createDataFrame(
            [(s,) for s in sample], [column]
        )
        schema = (
            df.sparkSession.read.json(
                rdd_free.rdd.map(lambda r: r[0])  # type: ignore[union-attr]
            ).schema
        )
    parsed = df.withColumn(column, F.from_json(F.col(column), schema))
    return flatten(parsed, exclude=exclude, sep=sep)


def project_normalized(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    exclude: Sequence[str] = (),
    sep: str = "__",
) -> DataFrame:
    """Flatten then keep requested ∩ existing columns (N4,
    `ct_utils.py:102-123`: normalize then projection-limited)."""
    flat = flatten(df, exclude=exclude, sep=sep)
    if columns is None:
        return flat
    requested = set(columns)
    return flat.select(*[c for c in flat.columns if c in requested])
