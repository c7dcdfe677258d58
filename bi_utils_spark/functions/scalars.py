"""Scalar functions (SURVEY.md §2.8).

Each builder returns a ``pyspark.sql.Column`` so Catalyst folds it
into whole-stage codegen — the reference applied these per-row via
``Series.apply`` in the driver process (e.g. ``utils.py:48``); here
they are distributed, vectorized JVM expressions. No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def hash_id(c: ColumnOrName) -> Column:
    """SHA-1 hex digest of a string id; NULL/'' → NULL.

    Reference: utils.py:46-55 (hash_id) — sha1 of utf-8 text, with
    an explicit None/empty-string guard. ``F.sha1`` is null-safe
    already; the '' guard is added to match the reference exactly.
    """
    c = _col(c)
    s = c.cast("string")
    return F.when(c.isNull() | (s == ""), F.lit(None).cast("string")).otherwise(
        F.sha1(s)
    )


def hash_id_sha2(c: ColumnOrName, num_bits: int = 256) -> Column:
    """SHA-2 variant of :func:`hash_id` (same null/'' contract).

    Offered because modern pipelines prefer SHA-256 for content
    addressing (and the DuckDB oracle lacks sha1).
    """
    c = _col(c)
    s = c.cast("string")
    return F.when(c.isNull() | (s == ""), F.lit(None).cast("string")).otherwise(
        F.sha2(s, num_bits)
    )


def parse_timestamp(c: ColumnOrName) -> Column:
    """ISO-8601 ``2019-12-12T15:22:04.558Z`` → ``2019-12-12 15:22:04.558``.

    Reference: utils.py:428-440 (parse_timestamp) — pure string
    surgery (``[0:10] + ' ' + [11:-1]``) with None and len<5 → None
    guards. Reproduced as a codegen'd expression; the same slicing
    semantics (drop the 'T', drop the trailing char) rather than a
    timestamp round-trip, so any reference input maps byte-identically.
    """
    c = _col(c).cast("string")
    sliced = F.concat(
        F.substring(c, 1, 10),
        F.lit(" "),
        c.substr(F.lit(12), F.length(c) - F.lit(12)),
    )
    return F.when(c.isNull() | (F.length(c) < 5), F.lit(None).cast("string")).otherwise(
        sliced
    )


def format_timestamp(c: ColumnOrName, fmt: str = "yyyy-MM-dd'T'HH:mm:ss") -> Column:
    """Timestamp → API string form (reference: ct_utils.py:9-16
    parse_exa_to_ct_timestamp, strftime '%Y-%m-%dT%H:%M:%S%Z')."""
    return F.date_format(_col(c), fmt)


def extract_path(c: ColumnOrName, path: str) -> Column:
    """Dotted-path extraction through nested structs/arrays.

    Reference: utils.py:417-425 (extract_key) — ``reduce`` over a
    dotted path where integer segments index lists; missing → None.
    Spark nested access is null-safe by construction; integer
    segments become 1-based ``element_at`` (reference is 0-based, so
    +1 here).
    """
    cur = _col(c)
    for seg in path.split("."):
        if seg.lstrip("-").isdigit():
            cur = F.element_at(cur, int(seg) + 1)
        else:
            cur = cur.getField(seg)
    return cur


def json_path(c: ColumnOrName, path: str) -> Column:
    """Dotted-path extraction from a JSON *string* column.

    The JSON-string twin of :func:`extract_path` for columns like
    ``events.props`` (reference consumed parsed dicts; at scale we
    keep JSON as strings and let ``get_json_object`` prune).
    """
    return F.get_json_object(_col(c), "$." + path)


def check_for_key(c: ColumnOrName, key: str = "id", default: str = "empty") -> Column:
    """Struct/map field lookup with default (reference: utils.py:443-453
    check_for_key — ``x.get(key, 'empty') if isinstance(x, dict) else None``).

    Null input stays NULL (the reference returns None for non-dicts);
    a present row with a missing key yields ``default``.
    """
    c = _col(c)
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        F.coalesce(c.getField(key).cast("string"), F.lit(default))
    )


def check_for_key_json(c: ColumnOrName, key: str = "id", default: str = "empty") -> Column:
    """JSON-string variant of :func:`check_for_key`."""
    c = _col(c)
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        F.coalesce(F.get_json_object(c, "$." + key), F.lit(default))
    )


def get_or_default(c: ColumnOrName, default) -> Column:
    """``coalesce(col, default)`` convenience."""
    return F.coalesce(_col(c), F.lit(default))


def abs_threshold(current: ColumnOrName, last: ColumnOrName, threshold: float) -> Column:
    """Resend decision: no prior value → True, else |cur − last| ≥ t.

    Reference: utils.py:225-234 — "no history ⇒ send"
    (utils.py:225-227) and ``abs(current - last) >= resend_threshold``
    (utils.py:231).
    """
    last_c = _col(last)
    return F.when(last_c.isNull(), F.lit(True)).otherwise(
        F.abs(_col(current) - last_c) >= F.lit(threshold)
    )


def strip_column_names(df: DataFrame) -> DataFrame:
    """Strip whitespace from every column name (reference:
    utils.py:276, :479 ``columns.map(str.strip)``). Pure metadata
    rename — no job runs."""
    return df.toDF(*[c.strip() for c in df.columns])
