"""Product quantization (PQ) — compressed-domain vector search.

Jégou/Douze/Schmid, "Product Quantization for Nearest Neighbor
Search" (IEEE TPAMI 2011): split each d-dim vector into ``m``
subspaces, vector-quantize each subspace against its own ``k``-entry
codebook, and represent the vector as ``m`` small codes. With
m=8, k=256 a 64-dim float64 vector (512 B) becomes 8 bytes — the
64× compression that lets a 100 TB embedding corpus live as a
~1.6 TB code table that scans from memory.

Spark shape (mirrors similarity.kmeans_centroids / ivf_*):
- **train** on a bounded hash-drawn sample collected to the driver
  (codebooks are index METADATA — m·k·(d/m) doubles — and training
  cost must not grow with the corpus);
- **encode** is map-only: one Arrow batch → one numpy distance
  matrix per subspace → argmin codes; no shuffle, no join — a
  single pass over the corpus;
- **query (ADC)** is pure codegen: the query's m×k lookup table of
  subspace inner products is a literal array baked into the plan,
  and each row's score is ``Σ_m table[m, code_m]`` via
  zip_with/element_at — scan + project + TakeOrdered(k), with the
  option of an exact re-rank of a small shortlist (the standard
  recall fix: ADC ranks a ``refine``-times-k shortlist, true dot
  products re-rank it).

Asymmetric distance (query stays unquantized) is the paper's ADC
variant — strictly more accurate than symmetric code-to-code.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bi_utils_spark.functions.litarrays import lit_double_array

from bi_utils_spark.operators.similarity import _as_double, dot


def _bounded_sample(df: DataFrame, id_col: str, vec_col: str, n: int) -> list:
    """Hash-thresholded, hash-ordered draw of ~n rows (same mechanics
    as kmeans_centroids — partitioning-independent, never a
    full-corpus sort: the threshold filter keeps ~2n rows before the
    top-n heap)."""
    base = df.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
    n_total = base.count()
    if n_total > n * 4:
        m = 1 << 20
        thr = -(-(n * 2 * m) // n_total)  # ceil
        base = base.filter(F.pmod(F.xxhash64(F.col("id")), F.lit(m)) < thr)
    return base.orderBy(F.xxhash64(F.col("id")), F.col("id")).limit(n).collect()


def pq_train(
    df: DataFrame,
    num_subspaces: int = 8,
    num_centroids: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 5,
    train_sample: int | None = None,
) -> DataFrame:
    """Train per-subspace codebooks → DataFrame (subspace, code,
    centroid array<double>): m·k rows of index metadata, storable /
    broadcastable like the IVF centroid table.

    Deterministic: the sample draw is hash-ordered, Lloyd starts from
    the first k sample sub-vectors, and ties in assignment break
    toward the lower code. The vector dim must divide evenly into
    ``num_subspaces``.
    """
    import numpy as np

    if train_sample is None:
        train_sample = max(num_centroids * 64, 4096)
    sample = _bounded_sample(df, id_col, vec_col, train_sample)
    X = np.asarray([list(r["v"]) for r in sample], dtype=np.float64)
    d = X.shape[1]
    if d % num_subspaces:
        raise ValueError(
            f"vector dim {d} is not divisible by num_subspaces {num_subspaces}"
        )
    sub = d // num_subspaces
    k = min(num_centroids, X.shape[0])
    rows = []
    for s in range(num_subspaces):
        Xs = X[:, s * sub : (s + 1) * sub]
        C = Xs[:k].copy()
        for _ in range(iters):
            # L2 assignment: argmin ||x - c||² = argmin (||c||² − 2x·c)
            d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (Xs @ C.T)
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                members = Xs[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        rows.extend(
            (s, c, [float(x) for x in C[c]]) for c in range(k)
        )
    from bi_utils_spark.operators.localrel import local_df

    return local_df(
        df.sparkSession, rows, "subspace int, code int, centroid array<double>"
    )


def _codebook_tensor(codebooks: DataFrame):
    """(m, k, sub) numpy tensor from the codebook table — bounded
    index metadata, safe to collect and ship in task closures."""
    import numpy as np

    rows = codebooks.collect()
    m = 1 + max(r["subspace"] for r in rows)
    k = 1 + max(r["code"] for r in rows)
    sub = len(rows[0]["centroid"])
    T = np.zeros((m, k, sub), dtype=np.float64)
    for r in rows:
        T[r["subspace"], r["code"]] = r["centroid"]
    return T


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — the compressed corpus. Map-only: one
    numpy distance computation per (Arrow batch × subspace); the
    codebook tensor rides in the task closure like the IVF centroid
    matrix. At 100 TB write this table out once (optionally bucketed
    by an IVF cell for a full IVF-PQ index) and scan codes, not
    vectors, at query time."""
    import pandas as pd

    T = _codebook_tensor(codebooks)
    m, k, sub = T.shape
    src = df.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
    id_field = src.schema["id"]

    def run(batches):
        import numpy as np

        norms = (T * T).sum(axis=2)  # (m, k)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray([list(v) for v in pdf["v"]], dtype=np.float64)
            codes = np.empty((X.shape[0], m), dtype=np.int64)
            for s in range(m):
                Xs = X[:, s * sub : (s + 1) * sub]
                d2 = norms[s][None, :] - 2.0 * (Xs @ T[s].T)
                codes[:, s] = np.argmin(d2, axis=1)
            yield pd.DataFrame({"id": pdf["id"], "codes": list(codes)})

    out_type = "array<bigint>"
    return src.mapInPandas(
        run, schema=f"id {id_field.dataType.simpleString()}, codes {out_type}"
    ).select(F.col("id").alias(id_col), "codes")


def adc_score(codes: Column, lookup_flat: list[float], k: int) -> Column:
    """Codegen ADC score of a codes array against a flattened (m·k)
    query lookup table: Σ_s table[s·k + codes[s]]. Pure JVM
    expression — no Python at query time."""
    tbl = lit_double_array(lookup_flat)
    m = len(lookup_flat) // k
    return F.aggregate(
        F.zip_with(
            codes,
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, i: F.element_at(tbl, (i * k + c + 1).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_topk(
    codes_df: DataFrame,
    codebooks: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    refine_with: DataFrame | None = None,
    refine_factor: int = 5,
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by asymmetric PQ inner product over the compressed
    corpus. With ``refine_with`` (the original vector table), an ADC
    shortlist of ``refine_factor·k`` rows is exactly re-ranked by
    true dot product — the shortlist join touches refine_factor·k
    rows, so the full-precision vectors are read for a handful of
    ids, never scanned.

    Returns (id_col, score): ADC estimate, or the exact score after
    refinement.
    """
    import numpy as np

    T = _codebook_tensor(codebooks)
    m, kc, sub = T.shape
    q = np.asarray(query_vec, dtype=np.float64)
    lookup = np.einsum("s d, s k d -> s k", q.reshape(m, sub), T)
    scored = codes_df.select(
        F.col(id_col),
        adc_score(F.col("codes"), [float(x) for x in lookup.ravel()], kc).alias(
            "score"
        ),
    )
    if refine_with is None:
        return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
    shortlist = scored.orderBy(F.desc("score"), F.asc(id_col)).limit(
        refine_factor * k
    )
    qcol = lit_double_array(query_vec)
    exact = refine_with.select(
        F.col(id_col), dot(_as_double(F.col(vec_col)), qcol).alias("score")
    )
    return (
        shortlist.select(id_col)
        .join(exact, id_col)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def ivfpq_index(
    df: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell_id, codes) — the IVF-PQ index build as ONE map-only
    pass: each Arrow batch computes the nearest coarse cell (spherical,
    matching similarity.ivf_assign) and the PQ codes together, so the
    corpus is read once and never shuffled. At 100 TB write this out
    ``partitionBy(cell_id)``: a probe then reads nprobe partitions of
    8-byte codes — partition pruning × 64 B→8 B compression stacked.

    This quantizes raw vectors (shared codebooks across cells); the
    per-cell residual refinement of Jégou et al. §IV is a drop-in
    follow-up — swap the encode input for (x − centroid[cell]) and
    train codebooks on residual samples.
    """
    import numpy as np
    import pandas as pd

    from bi_utils_spark.operators.similarity import _collect_centroid_matrix

    _, cent = _collect_centroid_matrix(centroids)
    T = _codebook_tensor(codebooks)
    m, kc, sub = T.shape
    src = df.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
    id_field = src.schema["id"]

    def run(batches):
        norms = (T * T).sum(axis=2)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray([list(v) for v in pdf["v"]], dtype=np.float64)
            U = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
            cells = np.argmax(U @ cent.T, axis=1)
            codes = np.empty((X.shape[0], m), dtype=np.int64)
            for s in range(m):
                Xs = X[:, s * sub : (s + 1) * sub]
                d2 = norms[s][None, :] - 2.0 * (Xs @ T[s].T)
                codes[:, s] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {"id": pdf["id"], "cell_id": cells.astype("int32"), "codes": list(codes)}
            )

    return src.mapInPandas(
        run,
        schema=(
            f"id {id_field.dataType.simpleString()}, cell_id int, codes array<bigint>"
        ),
    ).select(F.col("id").alias(id_col), "cell_id", "codes")


def ivfpq_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    num_cells: int = 8,
    nprobe: int = 4,
    num_subspaces: int = 8,
    num_centroids: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_factor: int = 10,
    centroids: DataFrame | None = None,
    codebooks: DataFrame | None = None,
    index: DataFrame | None = None,
) -> DataFrame:
    """IVF-pruned ADC search: rank cells against the query on the
    driver (centroid table = index metadata), filter the code table to
    the ``nprobe`` nearest cells, ADC-score the survivors in codegen,
    exact-re-rank the shortlist. Pass a prebuilt ``index`` (from
    :func:`ivfpq_index`, ideally written partitioned by cell_id) to
    skip the build — the query itself then touches
    ~(nprobe/num_cells) of the corpus at 8 B/vector."""
    from bi_utils_spark.operators.similarity import kmeans_centroids

    if centroids is None:
        centroids = kmeans_centroids(df, num_cells, id_col, vec_col)
    if codebooks is None:
        codebooks = pq_train(df, num_subspaces, num_centroids, id_col, vec_col)
    if index is None:
        index = ivfpq_index(df, centroids, codebooks, id_col, vec_col)

    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0
    qu = [float(x) / qn for x in query_vec]
    cells = centroids.collect()
    ranked = sorted(
        cells,
        key=lambda r: (-sum(a * b for a, b in zip(qu, r["centroid"])), r["cell_id"]),
    )
    probe = [r["cell_id"] for r in ranked[:nprobe]]
    pruned = index.filter(F.col("cell_id").isin(probe)).select(id_col, "codes")
    return pq_topk(
        pruned,
        codebooks,
        query_vec,
        k,
        id_col,
        refine_with=df,
        refine_factor=refine_factor,
        vec_col=vec_col,
    )


def pq_reconstruction_error(
    df: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-row quality probe: mean squared reconstruction error of the
    codebooks over the corpus (the metric PQ training minimizes).
    Map-only encode+decode per Arrow batch, then a scalar agg."""
    import pandas as pd

    T = _codebook_tensor(codebooks)
    m, kc, sub = T.shape
    src = df.select(_as_double(F.col(vec_col)).alias("v"))

    def run(batches):
        import numpy as np

        norms = (T * T).sum(axis=2)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray([list(v) for v in pdf["v"]], dtype=np.float64)
            err = np.zeros(X.shape[0])
            for s in range(m):
                Xs = X[:, s * sub : (s + 1) * sub]
                d2 = norms[s][None, :] - 2.0 * (Xs @ T[s].T)
                code = np.argmin(d2, axis=1)
                err += ((Xs - T[s][code]) ** 2).sum(axis=1)
            yield pd.DataFrame({"se": err})

    return src.mapInPandas(run, schema="se double").agg(
        F.avg("se").alias("mse"), F.count("*").alias("n")
    )


# ---------------------------------------------------------------------------
# Index persistence — the IVF-PQ index as a durable artifact. Build
# once, serve many queries, append deltas without retraining.
# ---------------------------------------------------------------------------


def save_ivfpq(
    centroids: DataFrame, codebooks: DataFrame, index: DataFrame, path: str
) -> None:
    """Persist an IVF-PQ index: centroid + codebook metadata tables
    and the code table PARTITIONED BY cell_id — a probe then reads
    only its nprobe partitions (partition pruning × the 8 B/vector
    compression, stacked). Overwrites any index at ``path``.

    Compressed/lossy tier of the persisted-index pair: when the
    corpus fits storage uncompressed and exact scores matter, the
    lossless sibling is ``operators/vector_index.py`` (same
    partitioned-by-cell layout, exact unit vectors, probe ==
    exact top-k at full nprobe)."""
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    codebooks.write.mode("overwrite").parquet(f"{path}/codebooks")
    index.write.mode("overwrite").partitionBy("cell_id").parquet(f"{path}/index")


def load_ivfpq(spark, path: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(centroids, codebooks, index) read back from :func:`save_ivfpq`."""
    return (
        spark.read.parquet(f"{path}/centroids"),
        spark.read.parquet(f"{path}/codebooks"),
        spark.read.parquet(f"{path}/index"),
    )


def ivfpq_append(
    spark,
    path: str,
    new_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Add a vector delta to a persisted index WITHOUT retraining:
    encode the new vectors against the stored centroids/codebooks
    (one map-only pass over the delta — the existing corpus is never
    touched) and append their codes into the cell partitions. The
    standard trade: quantizers drift as the distribution shifts;
    retrain + rebuild when recall probes degrade, append in between.
    """
    cents, books, _ = load_ivfpq(spark, path)
    new_idx = ivfpq_index(new_df, cents, books, id_col, vec_col)
    new_idx.write.mode("append").partitionBy("cell_id").parquet(f"{path}/index")


def ivfpq_search(
    spark,
    path: str,
    query_vec: list,
    k: int = 10,
    nprobe: int = 4,
    refine_with: DataFrame | None = None,
    refine_factor: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve a query from a persisted index: rank stored centroids on
    the driver (index metadata), scan only the ``nprobe`` probed cell
    partitions (PushedFilters prunes the rest), ADC-score in codegen,
    optionally exact-re-rank against ``refine_with``.
    """
    cents, books, index = load_ivfpq(spark, path)
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0
    qu = [float(x) / qn for x in query_vec]
    ranked = sorted(
        cents.collect(),
        key=lambda r: (-sum(a * b for a, b in zip(qu, r["centroid"])), r["cell_id"]),
    )
    probe = [r["cell_id"] for r in ranked[:nprobe]]
    pruned = index.filter(F.col("cell_id").isin(probe)).select(id_col, "codes")
    return pq_topk(
        pruned,
        books,
        query_vec,
        k,
        id_col,
        refine_with=refine_with,
        refine_factor=refine_factor,
        vec_col=vec_col,
    )


# ---------------------------------------------------------------------------
# Residual IVF-PQ (Jégou et al. §IV): quantize x − anchor[cell]
# instead of x, where the anchor is the cell MEAN (not the unit-norm
# spherical centroid: for unit vectors E‖x − μ‖² = E‖x‖² − ‖μ‖² < E‖x‖²
# always, while subtracting the unit centroid overshoots dispersed
# cells — measured ‖r‖² of 1.35–1.6 vs ‖x‖² = 1 on the fixture).
# Residuals are smaller and better centered, so the same code budget
# buys a finer quantization; the query-side correction is one scalar
# per probed cell.
# ---------------------------------------------------------------------------


def pq_train_residual(
    df: DataFrame,
    centroids: DataFrame,
    num_subspaces: int = 8,
    num_centroids: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 5,
    train_sample: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(codebooks, anchors): per-subspace codebooks trained on
    residuals x − anchor[cell], plus the (cell_id, anchor) table —
    anchors are sample cell MEANS (unit-centroid fallback for empty
    cells). Same bounded deterministic sample draw as
    :func:`pq_train`; both outputs are index metadata."""
    import numpy as np

    from bi_utils_spark.operators.similarity import _collect_centroid_matrix

    if train_sample is None:
        train_sample = max(num_centroids * 64, 4096)
    sample = _bounded_sample(df, id_col, vec_col, train_sample)
    X = np.asarray([list(r["v"]) for r in sample], dtype=np.float64)
    _, cent = _collect_centroid_matrix(centroids)
    U = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
    cells = np.argmax(U @ cent.T, axis=1)
    anchors = cent.copy()
    for c in range(cent.shape[0]):
        members = X[cells == c]
        if len(members):
            anchors[c] = members.mean(axis=0)
    R = X - anchors[cells]
    d = R.shape[1]
    if d % num_subspaces:
        raise ValueError(
            f"vector dim {d} is not divisible by num_subspaces {num_subspaces}"
        )
    sub = d // num_subspaces
    k = min(num_centroids, R.shape[0])
    rows = []
    for s in range(num_subspaces):
        Xs = R[:, s * sub : (s + 1) * sub]
        C = Xs[:k].copy()
        for _ in range(iters):
            d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (Xs @ C.T)
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                members = Xs[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        rows.extend((s, c, [float(x) for x in C[c]]) for c in range(k))
    from bi_utils_spark.operators.localrel import local_df

    spark = df.sparkSession
    books = local_df(
        spark, rows, "subspace int, code int, centroid array<double>"
    )
    anchor_df = local_df(
        spark,
        [(c, [float(x) for x in anchors[c]]) for c in range(anchors.shape[0])],
        "cell_id int, anchor array<double>",
    )
    return books, anchor_df


def _collect_anchor_matrix(anchors: DataFrame):
    import numpy as np

    rows = sorted(anchors.collect(), key=lambda r: r["cell_id"])
    return np.asarray([list(r["anchor"]) for r in rows], dtype=np.float64)


def ivfpq_index_residual(
    df: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    anchors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell_id, codes) with codes quantizing the RESIDUAL
    x − anchor[cell]. Cell assignment stays spherical (unit
    centroids, matching ivf_assign); same one-pass map-only build as
    :func:`ivfpq_index`."""
    import numpy as np
    import pandas as pd

    from bi_utils_spark.operators.similarity import _collect_centroid_matrix

    _, cent = _collect_centroid_matrix(centroids)
    A = _collect_anchor_matrix(anchors)
    T = _codebook_tensor(codebooks)
    m, kc, sub = T.shape
    src = df.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
    id_field = src.schema["id"]

    def run(batches):
        norms = (T * T).sum(axis=2)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray([list(v) for v in pdf["v"]], dtype=np.float64)
            U = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
            cells = np.argmax(U @ cent.T, axis=1)
            R = X - A[cells]
            codes = np.empty((R.shape[0], m), dtype=np.int64)
            for s in range(m):
                Xs = R[:, s * sub : (s + 1) * sub]
                d2 = norms[s][None, :] - 2.0 * (Xs @ T[s].T)
                codes[:, s] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {"id": pdf["id"], "cell_id": cells.astype("int32"),
                 "codes": list(codes)}
            )

    return src.mapInPandas(
        run,
        schema=(
            f"id {id_field.dataType.simpleString()}, cell_id int, codes array<bigint>"
        ),
    ).select(F.col("id").alias(id_col), "cell_id", "codes")


def ivfpq_topk_residual(
    df: DataFrame,
    query_vec: list,
    centroids: DataFrame,
    codebooks: DataFrame,
    anchors: DataFrame,
    index: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_factor: int = 10,
) -> DataFrame:
    """Residual-ADC search: score(q, x) ≈ q·anchor[cell] +
    adc(residual codes). The per-cell bias is one literal per probed
    cell (a when-chain over ≤ nprobe values — codegen, no join);
    everything else matches :func:`ivfpq_topk`: centroid ranking on
    the driver, cell-pruned scan, exact shortlist re-rank."""
    import numpy as np

    T = _codebook_tensor(codebooks)
    m, kc, sub = T.shape
    q = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    lookup = np.einsum("s d, s k d -> s k", q.reshape(m, sub), T)
    qn = math.sqrt(float(q @ q)) or 1.0
    qu = q / qn
    A = _collect_anchor_matrix(anchors)
    ranked = sorted(
        centroids.collect(),
        key=lambda r: (-sum(a * b for a, b in zip(qu, r["centroid"])), r["cell_id"]),
    )
    probe = ranked[:nprobe]
    bias = None
    for r in probe:
        b = float(q @ A[r["cell_id"]])
        cond = F.col("cell_id") == r["cell_id"]
        bias = F.when(cond, F.lit(b)) if bias is None else bias.when(cond, F.lit(b))
    bias = bias.otherwise(F.lit(0.0))
    pruned = index.filter(
        F.col("cell_id").isin([r["cell_id"] for r in probe])
    )
    scored = pruned.select(
        F.col(id_col),
        (
            adc_score(F.col("codes"), [float(x) for x in lookup.ravel()], kc)
            + bias
        ).alias("score"),
    )
    shortlist = scored.orderBy(F.desc("score"), F.asc(id_col)).limit(
        refine_factor * k
    )
    qcol = lit_double_array(query_vec)
    exact = df.select(
        F.col(id_col), dot(_as_double(F.col(vec_col)), qcol).alias("score")
    )
    return (
        shortlist.select(id_col)
        .join(exact, id_col)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def sq8_bounds(df: DataFrame, vec_col: str = "embedding") -> list[tuple[float, float]]:
    """Per-dimension (min, max) for scalar quantization — one
    posexplode aggregation; the result is index METADATA (d pairs),
    the codebook-collect discipline."""
    rows = (
        df.select(F.posexplode(vec_col).alias("d", "x"))
        .groupBy("d")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .orderBy("d")
        .collect()
    )
    return [(float(r["lo"]), float(r["hi"])) for r in rows]


def sq8_encode(
    df: DataFrame,
    bounds: list[tuple[float, float]],
    vec_col: str = "embedding",
    out_col: str = "sq8",
) -> DataFrame:
    """int8-range scalar quantization (X97): code_i =
    clamp(floor((x_i − lo_i)·256/(hi_i − lo_i)), 0, 255) — 4×
    smaller than float32, map-only with the bounds baked as
    literals (constant dims collapse to code 0). The export format
    vector stores ingest."""
    lo = lit_double_array([l for l, _ in bounds])
    span = lit_double_array(
        [(h - l) if h > l else 1.0 for l, h in bounds]
    )
    codes = F.transform(
        F.col(vec_col),
        lambda x, i: F.least(
            F.greatest(
                F.floor(
                    (x.cast("double") - F.element_at(lo, i + 1))
                    * 256.0
                    / F.element_at(span, i + 1)
                ),
                F.lit(0.0),
            ),
            F.lit(255.0),
        ).cast("int"),
    )
    return df.withColumn(out_col, codes)


def sq8_decode_col(
    bounds: list[tuple[float, float]], code_col: str = "sq8"
) -> "F.Column":
    """Midpoint reconstruction column: lo_i + (c+0.5)·span_i/256."""
    lo = lit_double_array([l for l, _ in bounds])
    span = lit_double_array(
        [(h - l) if h > l else 1.0 for l, h in bounds]
    )
    return F.transform(
        F.col(code_col),
        lambda c, i: F.element_at(lo, i + 1)
        + (c.cast("double") + 0.5)
        * F.element_at(span, i + 1)
        / 256.0,
    )


def sq8_topk(
    df: DataFrame,
    bounds: list[tuple[float, float]],
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "sq8",
) -> DataFrame:
    """Top-k by cosine against the DECODED codes — asymmetric
    search (query stays float). Map-only fold + TakeOrdered; ties
    broken by id for determinism."""
    dec = sq8_decode_col(bounds, code_col)
    q = lit_double_array(query)
    qn = sum(x * x for x in query) ** 0.5
    dot = F.aggregate(
        F.zip_with(dec, q, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform(dec, lambda a: a * a),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    sim = dot / (nrm * F.lit(float(qn)))
    return (
        df.select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )
