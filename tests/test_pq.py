"""Product quantization (operators/pq.py): codebook/encode/ADC
semantics against numpy ground truth, recall on real testdata, and
map-only plan shape for the encode pass."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bi_utils_spark.operators import pq as P
from bi_utils_spark.operators.similarity import cosine_topk
from bi_utils_spark.plans import inspect as pi
from bi_utils_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def codebooks(emb):
    return P.pq_train(emb, num_subspaces=8, num_centroids=16, iters=3)


def test_codebook_shape(codebooks, emb):
    rows = codebooks.collect()
    dim = len(emb.first()["embedding"])
    assert {r["subspace"] for r in rows} == set(range(8))
    assert all(len(r["centroid"]) == dim // 8 for r in rows)
    assert max(r["code"] for r in rows) <= 15


def test_train_rejects_indivisible_dim(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="divisible"):
        P.pq_train(df, num_subspaces=2, num_centroids=2)


def test_encode_codes_valid_and_deterministic(emb, codebooks):
    codes = P.pq_encode(emb, codebooks)
    rows = codes.collect()
    assert len(rows) == emb.count()
    for r in rows[:20]:
        assert len(r["codes"]) == 8
        assert all(0 <= c <= 15 for c in r["codes"])
    again = {
        r["vec_id"]: list(r["codes"])
        for r in P.pq_encode(emb.repartition(7), codebooks).collect()
    }
    first = {r["vec_id"]: list(r["codes"]) for r in rows}
    assert first == again


def test_encode_is_map_only(emb, codebooks):
    codes = P.pq_encode(emb, codebooks)
    assert pi.num_exchanges(codes) == 0
    assert pi.join_kinds(codes) == {}


def test_adc_matches_numpy(emb, codebooks):
    T = P._codebook_tensor(codebooks)
    m, k, sub = T.shape
    target = np.asarray(emb.filter(F.col("vec_id") == 1).first()["embedding"])
    lookup = np.einsum("sd,skd->sk", target.reshape(m, sub), T)
    codes = P.pq_encode(emb.limit(50), codebooks)
    got = {
        r["vec_id"]: r["score"]
        for r in codes.select(
            "vec_id",
            P.adc_score(F.col("codes"), [float(x) for x in lookup.ravel()], k).alias(
                "score"
            ),
        ).collect()
    }
    raw = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    for vid, cs in raw.items():
        expect = float(sum(lookup[s, c] for s, c in enumerate(cs)))
        assert abs(got[vid] - expect) < 1e-9


def test_refined_topk_recall(emb, spark):
    cb = P.pq_train(emb, num_subspaces=8, num_centroids=256, iters=5)
    codes = P.pq_encode(emb, cb)
    target = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = {r["vec_id"] for r in cosine_topk(emb, target, k=10).collect()}
    ref = {
        r["vec_id"]
        for r in P.pq_topk(
            codes, cb, target, k=10, refine_with=emb, refine_factor=10
        ).collect()
    }
    assert len(ref & exact) / len(exact) >= 0.7


def test_finer_codebooks_reduce_mse(emb):
    cb16 = P.pq_train(emb, num_subspaces=8, num_centroids=16, iters=3)
    cb256 = P.pq_train(emb, num_subspaces=8, num_centroids=256, iters=3)
    mse16 = P.pq_reconstruction_error(emb, cb16).first()["mse"]
    mse256 = P.pq_reconstruction_error(emb, cb256).first()["mse"]
    assert mse256 < mse16


def test_ivfpq_index_single_pass_and_consistency(emb, codebooks, spark):
    from bi_utils_spark.operators.similarity import ivf_assign, kmeans_centroids

    cents = kmeans_centroids(emb, num_cells=4)
    idx = P.ivfpq_index(emb, cents, codebooks)
    assert pi.num_exchanges(idx) == 0 and pi.join_kinds(idx) == {}
    # cell assignment must agree with the IVF operator's own
    via_ivf = {r["id"]: r["cell_id"] for r in ivf_assign(emb, cents).collect()}
    via_idx = {r["vec_id"]: r["cell_id"] for r in idx.collect()}
    assert via_idx == via_ivf
    # codes must agree with the plain PQ encoder
    via_pq = {r["vec_id"]: list(r["codes"]) for r in P.pq_encode(emb, codebooks).collect()}
    assert {k: list(v) for k, v in
            ((r["vec_id"], r["codes"]) for r in idx.collect())} == via_pq


def test_ivfpq_topk_recall(emb):
    from pyspark.sql import functions as FF

    target = [float(x) for x in emb.filter(FF.col("vec_id") == 0).first()["embedding"]]
    exact = {r["vec_id"] for r in cosine_topk(emb, target, k=10).collect()}
    got = {
        r["vec_id"]
        for r in P.ivfpq_topk(
            emb, target, k=10, num_cells=4, nprobe=3,
            num_subspaces=8, num_centroids=64, refine_factor=10,
        ).collect()
    }
    assert len(got & exact) / len(exact) >= 0.5


# --- index persistence / append / serve -----------------------------------


def test_ivfpq_save_load_search_roundtrip(spark, sf_dir, tmp_path):
    from bi_utils_spark.operators.pq import (
        ivfpq_index,
        ivfpq_search,
        ivfpq_topk,
        load_ivfpq,
        pq_train,
        save_ivfpq,
    )
    from bi_utils_spark.operators.similarity import kmeans_centroids
    from bi_utils_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(emb, 4)
    books = pq_train(emb, 8, 16)
    idx = ivfpq_index(emb, cents, books)
    path = str(tmp_path / "ivfpq")
    save_ivfpq(cents, books, idx, path)
    _, _, back = load_ivfpq(spark, path)
    assert back.count() == emb.count()

    q = [float(x) for x in emb.first()["embedding"]]
    served = {r["vec_id"] for r in
              ivfpq_search(spark, path, q, k=5, nprobe=4,
                           refine_with=emb).collect()}
    direct = {r["vec_id"] for r in
              ivfpq_topk(emb, q, k=5, num_cells=4, nprobe=4,
                         num_subspaces=8, num_centroids=16,
                         centroids=cents, codebooks=books,
                         index=idx).collect()}
    assert served == direct and len(served) == 5


def test_ivfpq_append_serves_new_vectors(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from bi_utils_spark.operators.pq import (
        ivfpq_append,
        ivfpq_index,
        ivfpq_search,
        load_ivfpq,
        pq_train,
        save_ivfpq,
    )
    from bi_utils_spark.operators.similarity import kmeans_centroids
    from bi_utils_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    delta = emb.filter(F.col("vec_id") % 5 == 0)
    cents = kmeans_centroids(base, 4)
    books = pq_train(base, 8, 16)
    path = str(tmp_path / "ivfpq2")
    save_ivfpq(cents, books, ivfpq_index(base, cents, books), path)
    ivfpq_append(spark, path, delta)
    _, _, idx = load_ivfpq(spark, path)
    assert idx.count() == emb.count()
    # a query identical to an appended vector must retrieve it
    target = delta.first()
    q = [float(x) for x in target["embedding"]]
    got = {r["vec_id"] for r in
           ivfpq_search(spark, path, q, k=3, nprobe=4,
                        refine_with=emb).collect()}
    assert target["vec_id"] in got


# --- residual IVF-PQ -------------------------------------------------------


def test_residual_reconstruction_beats_plain(spark, sf_dir):
    import numpy as np

    from bi_utils_spark.operators.pq import (
        _codebook_tensor,
        _collect_anchor_matrix,
        ivfpq_index_residual,
        pq_train,
        pq_train_residual,
    )
    from bi_utils_spark.operators.similarity import (
        _collect_centroid_matrix,
        kmeans_centroids,
    )
    from bi_utils_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(emb, 8)
    plain_books = pq_train(emb, 8, 16)
    res_books, anchors = pq_train_residual(emb, cents, 8, 16)

    X = np.asarray([list(r["embedding"]) for r in emb.collect()], dtype=np.float64)
    _, cent = _collect_centroid_matrix(cents)
    A = _collect_anchor_matrix(anchors)
    U = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
    cells = np.argmax(U @ cent.T, axis=1)
    R = X - A[cells]
    # anchors are cell means: residual energy strictly below raw
    assert (R ** 2).sum(1).mean() < (X ** 2).sum(1).mean()

    def mse(books, target):
        T = _codebook_tensor(books)
        m, kc, sub = T.shape
        err = 0.0
        for s in range(m):
            Xs = target[:, s * sub : (s + 1) * sub]
            d2 = (T[s] * T[s]).sum(1)[None, :] - 2.0 * (Xs @ T[s].T)
            code = np.argmin(d2, axis=1)
            err += ((Xs - T[s][code]) ** 2).sum()
        return err / target.shape[0]

    # quantizing residuals with residual codebooks beats quantizing
    # raw vectors with raw codebooks (the point of residual PQ)
    assert mse(res_books, R) < mse(plain_books, X)
    idx = ivfpq_index_residual(emb, cents, res_books, anchors)
    assert idx.count() == emb.count()
    assert idx.agg({"cell_id": "max"}).first()[0] < 8


def test_residual_search_recall(spark, sf_dir):
    from bi_utils_spark.operators.pq import (
        ivfpq_index_residual,
        ivfpq_topk_residual,
        pq_train_residual,
    )
    from bi_utils_spark.operators.similarity import cosine_topk, kmeans_centroids
    from bi_utils_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(emb, 8)
    books, anchors = pq_train_residual(emb, cents, 8, 16)
    idx = ivfpq_index_residual(emb, cents, books, anchors)
    recall = 0.0
    rows = emb.limit(5).collect()
    for row in rows:
        q = [float(x) for x in row["embedding"]]
        got = {r["vec_id"] for r in
               ivfpq_topk_residual(emb, q, cents, books, anchors, idx,
                                   k=5, nprobe=8).collect()}
        assert row["vec_id"] in got  # self-retrieval
        exact = {r["vec_id"] for r in cosine_topk(emb, q, 5).collect()}
        recall += len(got & exact) / 5
    assert recall / len(rows) >= 0.8


def test_sq8_roundtrip_error_bounded(spark):
    from bi_utils_spark.operators.pq import (
        sq8_bounds,
        sq8_decode_col,
        sq8_encode,
    )
    from pyspark.sql import functions as F

    rows = [(i, [float(i), float(100 - i), 7.0]) for i in range(101)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    bounds = sq8_bounds(df, "embedding")
    assert bounds[0] == (0.0, 100.0) and bounds[2] == (7.0, 7.0)
    enc = sq8_encode(df, bounds)
    dec = enc.withColumn("rec", sq8_decode_col(bounds)).collect()
    for r in dec:
        for orig, rc in zip(r["embedding"], r["rec"]):
            # midpoint reconstruction error <= span/512
            assert abs(orig - rc) <= 100.0 / 512 + 1e-9
    # codes stay in the int8 range
    for r in enc.collect():
        assert all(0 <= c <= 255 for c in r["sq8"])


def test_sq8_topk_recall(spark):
    import math

    from bi_utils_spark.operators.pq import sq8_bounds, sq8_encode, sq8_topk

    rows = [
        (i, [math.cos(i * 0.37 + d) for d in range(8)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    bounds = sq8_bounds(df, "embedding")
    enc = sq8_encode(df, bounds)
    query = rows[42][1]
    got = [r["vec_id"] for r in sq8_topk(enc, bounds, query, k=5).collect()]
    # exact truth by brute force
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    truth = [
        v for v, _ in sorted(
            ((v, cos(e, query)) for v, e in rows), key=lambda t: (-t[1], t[0])
        )[:5]
    ]
    # self-retrieval first, recall@5 >= 0.8 after 8-bit quantization
    assert got[0] == 42
    assert len(set(got) & set(truth)) >= 4
