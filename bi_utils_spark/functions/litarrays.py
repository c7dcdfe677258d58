"""One-call literal arrays — plan-build time is driver time.

``F.array(*[F.lit(x) for x in vals])`` costs one py4j round trip per
element (~1.5 ms each at local[32]); a 2 048-entry PQ lookup table
spends ~3 s of pure driver time building the SAME folded literal the
SQL parser produces from one string in ~20 ms (guide §1.2: per-task
work includes the driver's plan build; §7.3: planning is single-
threaded driver work). Rendering each double with ``repr`` — the
shortest decimal that round-trips — and parsing with Spark's
correctly-rounding parser yields bit-identical values (pinned by
tests/test_litarrays.py), so plans and results are unchanged; only
the number of JVM calls drops.

Non-finite doubles fall back to the per-element path (the SQL
grammar has no NaN/Infinity literal); so do empty lists (``array()``
would type as array<string>).
"""

from __future__ import annotations

import math
from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_double_array(vals: Iterable[float]) -> Column:
    """Literal ``array<double>`` built in one JVM call."""
    fv = [float(v) for v in vals]
    if fv and all(map(math.isfinite, fv)):
        return F.expr("array(" + ",".join(repr(v) + "D" for v in fv) + ")")
    return F.array(*[F.lit(v) for v in fv])


def lit_long_array(vals: Iterable[int]) -> Column:
    """Literal ``array<bigint>`` built in one JVM call."""
    iv = [int(v) for v in vals]
    if iv:
        return F.expr("array(" + ",".join(f"{v}L" for v in iv) + ")")
    return F.array(*[F.lit(v) for v in iv])


def lit_string_array(vals: Iterable[str]) -> Column:
    """Literal ``array<string>`` built in one JVM call.

    Values are rendered as single-quoted SQL string literals with
    backslash/quote escaping (the default parser mode processes
    escapes, so the parsed value is byte-identical — pinned by
    tests/test_litarrays.py over quotes, backslashes and non-ASCII).
    Control characters fall back to the per-element path rather than
    betting on parser whitespace handling."""
    sv = [str(v) for v in vals]
    if sv and all(ord(ch) >= 32 for s in sv for ch in s):
        quoted = (
            "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
            for s in sv
        )
        return F.expr("array(" + ",".join(quoted) + ")")
    if not sv:
        return F.array().cast("array<string>")
    return F.array(*[F.lit(v) for v in sv])
