from __future__ import annotations

import datetime as dt

import pytest

from bi_utils_spark.operators.attribution import (
    attribute_touches,
    unattributed_conversions,
)


def _ts(m: int):
    return dt.datetime(2024, 1, 1, 0, m)


@pytest.fixture(scope="module")
def timeline(spark):
    rows = [
        # user 1: t1, t2, CONV, t3, CONV  (ids = minutes)
        (1, 1, _ts(1), "click"),
        (2, 1, _ts(2), "view"),
        (3, 1, _ts(3), "purchase"),
        (4, 1, _ts(4), "click"),
        (5, 1, _ts(5), "purchase"),
        # user 2: conversion with no touches
        (6, 2, _ts(1), "purchase"),
        # user 3: touch only, no conversion
        (7, 3, _ts(1), "click"),
    ]
    return spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type"]
    )


def test_position_models(timeline):
    out = {
        r["event_id"]: r
        for r in attribute_touches(
            timeline, ("purchase",), ("click", "view")
        ).collect()
    }
    # first-touch: both conversions of user 1 credit touch 1
    assert out[1]["n_first"] == 2 and out[2]["n_first"] == 0
    assert out[4]["n_first"] == 0
    # last-touch: conv at 3 credits touch 2; conv at 5 credits touch 4
    assert out[2]["n_last"] == 1 and out[4]["n_last"] == 1
    assert out[1]["n_last"] == 0
    # linear: conv1 k=2 -> 0.5 each to touches 1,2;
    # conv2 k=3 -> 1/3 each to 1,2,4 (quantized 1e7 div 3)
    third = (10_000_000 // 3) / 1e7
    assert out[1]["linear_credit"] == pytest.approx(0.5 + third)
    assert out[2]["linear_credit"] == pytest.approx(0.5 + third)
    assert out[4]["linear_credit"] == pytest.approx(third)
    # untouched-by-conversion touch: all zeros
    assert out[7]["n_first"] == 0 and out[7]["linear_credit"] == 0.0


def test_total_linear_credit_conserves_conversions(timeline):
    out = attribute_touches(
        timeline, ("purchase",), ("click", "view")
    ).collect()
    total = sum(r["linear_credit"] for r in out)
    # 2 attributable conversions; quantization may round down by <1e-6 each
    assert total == pytest.approx(2.0, abs=1e-6)


def test_unattributed_listed(timeline):
    out = unattributed_conversions(
        timeline, ("purchase",), ("click", "view")
    ).collect()
    assert [r["event_id"] for r in out] == [6]
