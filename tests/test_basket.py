from __future__ import annotations

import pytest

from bi_utils_spark.operators.basket import frequent_item_pairs


@pytest.fixture(scope="module")
def baskets(spark):
    rows = [
        (1, "bread"), (1, "butter"), (1, "milk"),
        (2, "bread"), (2, "butter"),
        (3, "bread"), (3, "milk"),
        (4, "butter"), (4, "milk"),
        (5, "bread"), (5, "caviar"),     # caviar infrequent
        (6, "bread"), (6, "bread"),      # duplicate item in basket
    ]
    return spark.createDataFrame(rows, ["basket", "item"])


def test_counts_and_metrics(baskets):
    out = {
        (r["item_a"], r["item_b"]): r
        for r in frequent_item_pairs(
            baskets, "basket", "item", min_item_count=2, min_pair_count=2
        ).collect()
    }
    bb = out[("bread", "butter")]
    # bread in baskets {1,2,3,5,6}=5; butter in {1,2,4}=3; both {1,2}=2
    assert (bb["c_a"], bb["c_b"], bb["c_ab"], bb["n_baskets"]) == (5, 3, 2, 6)
    assert bb["support"] == pytest.approx(2 / 6)
    assert bb["conf_a_b"] == pytest.approx(2 / 5)
    assert bb["conf_b_a"] == pytest.approx(2 / 3)
    assert bb["lift"] == pytest.approx(6 * 2 / (5 * 3))
    # caviar pruned before pair enumeration
    assert not any("caviar" in k for k in out)


def test_duplicates_count_once_per_basket(baskets):
    out = frequent_item_pairs(
        baskets, "basket", "item", min_item_count=1, min_pair_count=1
    ).collect()
    for r in out:
        assert r["c_ab"] <= r["n_baskets"]


def test_pair_floor(baskets):
    out = {
        (r["item_a"], r["item_b"])
        for r in frequent_item_pairs(
            baskets, "basket", "item", min_item_count=2, min_pair_count=3
        ).collect()
    }
    assert out == set()  # no pair co-occurs 3 times
