"""Unit tests for the nested/flatten layer (SURVEY.md §2.9, N1-N4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType

from bi_utils_spark.operators import nested as N


@pytest.fixture(scope="module")
def nested_df(spark):
    # order 1: two items; order 2: NULL list; order 3: empty list —
    # the reference preserved both null and empty parents (ct_utils.py:92)
    return spark.sql(
        """
        SELECT * FROM VALUES
          (1, array(named_struct('sku', 'a', 'qty', 2),
                    named_struct('sku', 'b', 'qty', 3))),
          (2, cast(null as array<struct<sku:string, qty:int>>)),
          (3, array())
        AS t(order_id, lineItems)
        """
    )


def test_list_columns_is_metadata_only(spark, nested_df):
    assert N.list_columns(nested_df) == ["lineItems"]
    assert N.list_columns(nested_df, exclude=["lineItems"]) == []


def test_explode_preserves_null_and_empty_parents(nested_df):
    out = N.explode_and_normalize(nested_df, "lineItems")
    rows = sorted(
        out.select("order_id", "lineItems__sku", "lineItems__qty").collect(),
        key=lambda r: (r[0], r[1] or ""),
    )
    # 2 child rows for order 1; orders 2 and 3 kept with NULL children
    assert [(r[0], r[1], r[2]) for r in rows] == [
        (1, "a", 2),
        (1, "b", 3),
        (2, None, None),
        (3, None, None),
    ]


def test_flatten_deep_nesting_terminates(spark):
    df = spark.sql(
        """
        SELECT 1 AS id,
               named_struct('inner', array(named_struct('x', 1)),
                            'flat', 'v') AS outer
        """
    )
    out = N.flatten(df)
    assert set(out.columns) == {"id", "outer__inner__x", "outer__flat"}
    assert out.first()["outer__inner__x"] == 1
    # no nested types remain
    assert not any(
        isinstance(f.dataType, (ArrayType, StructType)) for f in out.schema.fields
    )


def test_flatten_honors_exclude(spark, nested_df):
    out = N.flatten(nested_df, exclude=["lineItems"])
    assert out.columns == ["order_id", "lineItems"]
    assert isinstance(out.schema["lineItems"].dataType, ArrayType)


def test_flatten_name_collision_gets_suffix(spark):
    df = spark.sql(
        "SELECT 1 AS a__b, named_struct('b', 2) AS a"
    )
    out = N.flatten(df)
    assert set(out.columns) == {"a__b", "a__b_2"}
    row = out.first()
    assert row["a__b"] == 1 and row["a__b_2"] == 2


def test_flatten_scalar_arrays(spark):
    df = spark.sql("SELECT 1 AS id, array(10, 20) AS xs")
    out = N.flatten(df)
    assert sorted(r["xs"] for r in out.collect()) == [10, 20]


def test_flatten_depth_cap(spark):
    df = spark.sql("SELECT named_struct('a', named_struct('b', 1)) AS s")
    with pytest.raises(RecursionError):
        N.flatten(df, max_depth=1)


def test_from_json_normalized_infers_schema(spark):
    df = spark.createDataFrame(
        [('{"a": 1, "b": {"c": "x"}}',), (None,)], ["props"]
    )
    out = N.from_json_normalized(df, "props")
    assert set(out.columns) == {"props__a", "props__b__c"}
    rows = sorted(out.collect(), key=lambda r: (r[0] is None, r[0] or 0))
    assert rows[0]["props__a"] == 1 and rows[0]["props__b__c"] == "x"
    assert rows[1]["props__a"] is None


def test_project_normalized(spark, nested_df):
    out = N.project_normalized(
        nested_df, columns=["order_id", "lineItems__sku", "nope"]
    )
    assert out.columns == ["order_id", "lineItems__sku"]
