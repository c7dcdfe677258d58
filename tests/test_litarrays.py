"""lit_double_array / lit_long_array — bit-identity with the
per-element F.lit path (the plan-build fast path must never change a
value; guide §1.2 driver-time diet only)."""

from __future__ import annotations

import math
import random
import struct

from pyspark.sql import functions as F

from bi_utils_spark.functions.litarrays import lit_double_array, lit_long_array


def _bits(x: float) -> int:
    return struct.unpack("<q", struct.pack("<d", float(x)))[0]


def test_double_bit_identity(spark):
    rng = random.Random(12)
    vals = (
        [0.0, -0.0, 1.0, -1.5, 1e-308, 1.7976931348623157e308, 3.3e-4]
        + [rng.uniform(-1e6, 1e6) for _ in range(500)]
        + [rng.gauss(0, 1) for _ in range(500)]
    )
    row = spark.range(1).select(
        lit_double_array(vals).alias("fast"),
        F.array(*[F.lit(float(v)) for v in vals]).alias("slow"),
    ).first()
    assert [_bits(a) for a in row["fast"]] == [_bits(b) for b in row["slow"]]
    assert [_bits(a) for a in row["fast"]] == [_bits(v) for v in vals]


def test_double_nonfinite_fallback(spark):
    vals = [1.0, float("nan"), float("inf"), float("-inf")]
    row = spark.range(1).select(lit_double_array(vals).alias("a")).first()
    assert row["a"][0] == 1.0
    assert math.isnan(row["a"][1])
    assert row["a"][2] == float("inf")
    assert row["a"][3] == float("-inf")


def test_double_empty(spark):
    df = spark.range(1).select(lit_double_array([]).alias("a"))
    assert df.first()["a"] == []


def test_double_type(spark):
    df = spark.range(1).select(lit_double_array([1.0, 2.5]).alias("a"))
    assert dict(df.dtypes)["a"] == "array<double>"


def test_long_identity_and_type(spark):
    vals = [0, 1, -1, 2**62, -(2**62), 42]
    df = spark.range(1).select(lit_long_array(vals).alias("a"))
    assert dict(df.dtypes)["a"] == "array<bigint>"
    assert list(df.first()["a"]) == vals
    assert spark.range(1).select(lit_long_array([]).alias("e")).first()["e"] == []


def test_string_identity(spark):
    from bi_utils_spark.functions.litarrays import lit_string_array

    vals = [
        "the", "el", "für", "が", "و", "中文", "a'b", "x\\y", "it's",
        "back\\\\slash", "quote'in'side", "mixed '\\' both", "", " ",
        "tab\tinside", "ünïcodé £€", "emoji 🙂",
    ]
    row = spark.range(1).select(
        lit_string_array(vals).alias("fast"),
        F.array(*[F.lit(v) for v in vals]).alias("slow"),
    ).first()
    assert list(row["fast"]) == list(row["slow"]) == vals


def test_string_control_char_fallback(spark):
    from bi_utils_spark.functions.litarrays import lit_string_array

    vals = ["line\nbreak", "bell\x07", "ok"]
    row = spark.range(1).select(lit_string_array(vals).alias("a")).first()
    assert list(row["a"]) == vals


def test_string_empty(spark):
    from bi_utils_spark.functions.litarrays import lit_string_array

    df = spark.range(1).select(lit_string_array([]).alias("a"))
    assert df.first()["a"] == []
    assert dict(df.dtypes)["a"] == "array<string>"
