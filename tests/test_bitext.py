"""operators/bitext.py — margin-based bitext mining."""

from __future__ import annotations

import pytest

from bi_utils_spark.operators.bitext import mine_bitext


def _sides(spark):
    # src 1 ≈ tgt 11 (true pair); src 2 sits in a dense hub; tgt 13 far
    src = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.70710678, 0.70710678])],
        "vec_id long, embedding array<double>",
    )
    tgt = spark.createDataFrame(
        [
            (11, [0.99875234, 0.04993762]),  # ~x of src 1
            (12, [0.70710678, 0.70710678]),  # exact dup of src 2
            (13, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    return src, tgt


def test_margin_prefers_true_pairs_over_hub(spark):
    src, tgt = _sides(spark)
    out = mine_bitext(src, tgt, k=2)
    rows = {(r["src_id"], r["tgt_id"]): r for r in out.collect()}
    assert len(rows) == 4  # 2 src × k=2
    # both true pairs exist, margin > 1 (closer than neighborhood avg)
    assert rows[(1, 11)]["margin"] > 1.0
    assert rows[(2, 12)]["margin"] > 1.0
    # true pairs are mutual bests; cross pairs are not
    assert rows[(1, 11)]["mutual_best"] is True
    assert rows[(2, 12)]["mutual_best"] is True
    assert all(
        not r["mutual_best"] for key, r in rows.items() if key not in ((1, 11), (2, 12))
    )


def test_min_margin_filters(spark):
    src, tgt = _sides(spark)
    all_rows = mine_bitext(src, tgt, k=2).count()
    kept = mine_bitext(src, tgt, k=2, min_margin=1.0).count()
    assert kept < all_rows and kept >= 2


def test_margin_is_exact_integer_ratio(spark):
    # hand math on a 1-src / 2-tgt setup with k=2: margin =
    # 2·sq·fn·bn / (fq·bn + bq·fn) with all quantities integer-exact
    # — and the backward side has only ONE possible neighbor (|src| <
    # k), so the averages must divide by the real counts, not k
    src = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    tgt = spark.createDataFrame(
        [(11, [1.0, 0.0]), (12, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {r["tgt_id"]: r for r in mine_bitext(src, tgt, k=2).collect()}
    # forward: cos(1,11)=1.0, cos(1,12)=0.0 -> fq=1e9, fn=2
    # backward: each tgt has the single src neighbor -> bn=1;
    # bq(11)=1e9, bq(12)=0
    # margin(1,11) = 2·1e9·2·1 / (1e9·1 + 1e9·2) = 4/3 — exactly the
    # docstring formula cos / ((avg_f + avg_b)/2) = 1/((0.5+1.0)/2)
    assert rows[11]["margin"] == pytest.approx(4.0 / 3.0, abs=1e-12)
    assert rows[12]["margin"] == 0.0


def test_margin_null_on_zero_neighborhood(spark):
    # fully orthogonal sides: every score quantizes to 0, the
    # denominator is 0, margin must be NULL (not a crash, not inf)
    # and a min_margin filter must drop such pairs
    src = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    tgt = spark.createDataFrame(
        [(11, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    rows = mine_bitext(src, tgt, k=2).collect()
    assert len(rows) == 1 and rows[0]["margin"] is None
    assert mine_bitext(src, tgt, k=2, min_margin=0.5).count() == 0


def test_k_validation(spark):
    src, tgt = _sides(spark)
    with pytest.raises(ValueError, match="k must be"):
        mine_bitext(src, tgt, k=0)


def test_blocked_knn_substitution_same_pairs(spark):
    """The scale-path kNN primitive must slot in without changing the
    mined pair set or mutual flags (scores agree to rounding)."""
    from bi_utils_spark.operators.similarity import knn_join_blocked

    src, tgt = _sides(spark)
    a = {
        (r["src_id"], r["tgt_id"], r["mutual_best"])
        for r in mine_bitext(src, tgt, k=2).collect()
    }
    b = {
        (r["src_id"], r["tgt_id"], r["mutual_best"])
        for r in mine_bitext(src, tgt, k=2, knn=knn_join_blocked).collect()
    }
    assert a == b


def test_blocked_knn_plan_has_no_nested_loop_legs(spark):
    """The point of the blocked primitive at 10⁸+ per side: the
    |src|·|tgt| BroadcastNestedLoopJoin scoring legs of the exact form
    are gone — scoring happens in per-partition BLAS batches and only
    |Q|·k·partitions candidate rows reach the shuffle."""
    from bi_utils_spark.operators.similarity import knn_join_blocked

    src, tgt = _sides(spark)
    blocked = mine_bitext(src, tgt, k=2, knn=knn_join_blocked)
    plan = blocked._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "BroadcastNestedLoopJoin" not in plan
    # r12: the exact form's scoring leg no longer plans a BNLJ either
    # (vectorized Arrow scoring stage); what distinguishes the blocked
    # primitive now is the shuffle volume — the exact leg ranks ALL
    # |src|·|tgt| pairs through its rank window, the blocked one only
    # per-partition winners. Assert the exact leg still carries the
    # full-pair rank shuffle shape (window over MapInPandas scores).
    from bi_utils_spark.operators.similarity import knn_join_exact

    leg = knn_join_exact(src, tgt, 2, "vec_id", "vec_id", "embedding")
    plan_exact = leg._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "MapInPandas" in plan_exact
    assert "BroadcastNestedLoopJoin" not in plan_exact
