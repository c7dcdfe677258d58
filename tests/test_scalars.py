"""Unit tests for the scalar layer (SURVEY.md §2.8, F1-F11)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from bi_utils_spark.functions import (
    abs_threshold,
    check_for_key,
    extract_path,
    format_timestamp,
    hash_id,
    hash_id_sha2,
    parse_timestamp,
    strip_column_names,
)
from bi_utils_spark.functions.scalars import check_for_key_json, json_path


def test_hash_id_matches_reference_semantics(spark):
    # reference utils.py:46-55: sha1 hexdigest; None and '' → None
    df = spark.createDataFrame(
        [("12345",), (None,), ("",), ("abc",)], ["id"]
    ).select(hash_id("id").alias("h"))
    rows = [r["h"] for r in df.collect()]
    assert rows[0] == hashlib.sha1(b"12345").hexdigest()
    assert rows[1] is None
    assert rows[2] is None
    assert rows[3] == hashlib.sha1(b"abc").hexdigest()


def test_hash_id_sha2(spark):
    df = spark.createDataFrame([("x",), ("",)], ["id"]).select(
        hash_id_sha2("id").alias("h")
    )
    rows = [r["h"] for r in df.collect()]
    assert rows[0] == hashlib.sha256(b"x").hexdigest()
    assert rows[1] is None


def test_parse_timestamp_string_surgery(spark):
    # reference utils.py:428-440: '2019-12-12T15:22:04.558Z' →
    # '2019-12-12 15:22:04.558'; None / len<5 → None
    df = spark.createDataFrame(
        [("2019-12-12T15:22:04.558Z",), (None,), ("abc",)], ["t"]
    ).select(parse_timestamp("t").alias("p"))
    rows = [r["p"] for r in df.collect()]
    assert rows[0] == "2019-12-12 15:22:04.558"
    assert rows[1] is None
    assert rows[2] is None


def test_format_timestamp(spark):
    df = spark.sql(
        "SELECT timestamp'2020-05-01 10:20:30' AS ts"
    ).select(format_timestamp("ts").alias("f"))
    assert df.first()["f"] == "2020-05-01T10:20:30"


def test_extract_path_nested(spark):
    # reference utils.py:417-425: dotted path, int segments index lists
    df = spark.sql(
        "SELECT named_struct('name', named_struct('surname', 'smith'),"
        " 'tags', array('a', 'b')) AS d"
    )
    out = df.select(
        extract_path("d", "name.surname").alias("s"),
        extract_path("d", "tags.1").alias("t"),
    ).first()
    assert out["s"] == "smith"
    assert out["t"] == "b"  # 0-based index like the reference


def test_check_for_key_default(spark):
    # reference utils.py:443-453: missing key → 'empty'; non-dict → None
    df = spark.sql("SELECT named_struct('id', cast(null as string), 'x', 'v') AS d")
    assert df.select(check_for_key("d", "id").alias("o")).first()["o"] == "empty"
    js = spark.createDataFrame([('{"a": 1}',), (None,)], ["j"])
    rows = [
        r["o"] for r in js.select(check_for_key_json("j", "id").alias("o")).collect()
    ]
    assert rows == ["empty", None]
    assert (
        js.limit(1).select(json_path("j", "a").alias("o")).first()["o"] == "1"
    )


def test_abs_threshold_no_history_sends(spark):
    # reference utils.py:225-234
    df = spark.createDataFrame(
        [(10.0, None), (10.0, 6.0), (10.0, 8.0)], ["cur", "last"]
    ).select(abs_threshold("cur", "last", 4.0).alias("send"))
    assert [r["send"] for r in df.collect()] == [True, True, False]


def test_strip_column_names(spark):
    df = spark.createDataFrame([(1, 2)], [" a ", "b "])
    assert strip_column_names(df).columns == ["a", "b"]
