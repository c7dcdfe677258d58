"""Property-based tests (SURVEY.md §5.2 layer 4, hypothesis).

Each property runs a bounded number of examples — every example spins
real Spark jobs, so budgets are small but the input space (nested
shapes, null/empty lists, merge batches) is the part unit fixtures
under-cover.
"""

import json

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType

from bi_utils_spark.operators.merge import merge_upsert
from bi_utils_spark.operators.nested import flatten
from bi_utils_spark.operators.relational import watermark_filter

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# --- nested document strategy ----------------------------------------------

scalars = st.one_of(
    st.integers(-1000, 1000),
    st.text("abc", min_size=0, max_size=4),
    st.none(),
)


def docs_strategy(depth: int):
    if depth == 0:
        return st.dictionaries(
            st.sampled_from(["a", "b", "c"]), scalars, min_size=1, max_size=3
        )
    inner = docs_strategy(depth - 1)
    return st.dictionaries(
        st.sampled_from(["a", "b", "c", "items", "meta"]),
        st.one_of(
            scalars,
            inner,
            st.lists(inner, min_size=0, max_size=3),
        ),
        min_size=1,
        max_size=4,
    )


@SETTINGS
@given(st.lists(docs_strategy(2), min_size=1, max_size=5))
def test_flatten_fixpoint_terminates_and_is_flat(spark, docs):
    payload = [json.dumps({"row_id": i, **d}) for i, d in enumerate(docs)]
    df = spark.read.json(spark.sparkContext.parallelize(payload, 1))
    out = flatten(df)
    for f in out.schema.fields:
        assert not isinstance(f.dataType, (ArrayType, StructType)), (
            f"column {f.name} still nested: {f.dataType}"
        )


@SETTINGS
@given(st.lists(docs_strategy(2), min_size=1, max_size=5))
def test_flatten_preserves_every_parent_row(spark, docs):
    # explode_outer semantics: null/empty lists must not drop parents
    payload = [json.dumps({"row_id": i, **d}) for i, d in enumerate(docs)]
    df = spark.read.json(spark.sparkContext.parallelize(payload, 1))
    out = flatten(df)
    parent_ids = {r["row_id"] for r in out.select("row_id").distinct().collect()}
    assert parent_ids == set(range(len(docs)))


# --- merge upsert properties ------------------------------------------------

batch = st.lists(
    st.tuples(st.integers(0, 5), st.text("xyz", min_size=1, max_size=3)),
    min_size=1,
    max_size=6,
    unique_by=lambda t: t[0],
)

T0 = "2024-01-01 00:00:00"
T1 = "2024-02-01 00:00:00"


def _mk(spark, rows, ts):
    return spark.createDataFrame(
        [(k, v, ts, ts) for k, v in rows],
        ["id", "payload", "insert_timestamp", "update_timestamp"],
    ).withColumn("insert_timestamp", F.col("insert_timestamp").cast("timestamp")) \
     .withColumn("update_timestamp", F.col("update_timestamp").cast("timestamp"))


@SETTINGS
@given(batch, batch)
def test_merge_idempotent_and_pk_union(spark, target_rows, source_rows):
    target = _mk(spark, target_rows, T0)
    source = spark.createDataFrame(source_rows, ["id", "payload"])
    once = merge_upsert(target, source, ["id"], now=F.lit(T1).cast("timestamp"))
    twice = merge_upsert(once, source, ["id"], now=F.lit(T1).cast("timestamp"))

    def snap(df):
        return {
            (r["id"], r["payload"], r["insert_timestamp"], r["update_timestamp"])
            for r in df.collect()
        }

    assert snap(once) == snap(twice)                       # idempotence
    assert {r["id"] for r in once.select("id").collect()} == (
        {k for k, _ in target_rows} | {k for k, _ in source_rows}
    )                                                      # PK union
    # matched rows keep the target's insert_timestamp
    matched = {k for k, _ in target_rows} & {k for k, _ in source_rows}
    by_id = {r["id"]: r for r in once.collect()}
    for k in matched:
        assert str(by_id[k]["insert_timestamp"]).startswith("2024-01-01")
        assert str(by_id[k]["update_timestamp"]).startswith("2024-02-01")


# --- watermark property ------------------------------------------------------

@SETTINGS
@given(
    st.lists(
        st.integers(0, 10_000),
        min_size=1,
        max_size=20,
    )
)
def test_watermark_filter_keeps_max_and_window(spark, offsets):
    df = spark.createDataFrame(
        [(i, o) for i, o in enumerate(offsets)], ["row_id", "off"]
    ).select(
        "row_id",
        (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(
            secs=F.col("off")
        )).alias("ts"),
    )
    out = watermark_filter(df, "ts", "60 seconds").collect()
    got_offsets = sorted(offsets[r["row_id"]] for r in out)
    hi = max(offsets)
    expected = sorted(o for o in offsets if o >= hi - 60)
    assert got_offsets == expected
    assert hi in got_offsets                              # max row always kept


# --- portable-hash layer properties (importance/mixing/splits) -------------
# The engine-portability contract (md5-derived buckets, Gumbel keys,
# shard assignment identical in Spark / DuckDB / Python) is the
# correctness backbone of the data-selection operators — fuzz it
# against a pure-Python reference over arbitrary ids.

import hashlib
import math as _math


@SETTINGS
@given(ids=st.lists(st.integers(0, 2**40), min_size=1, max_size=30, unique=True))
def test_shard_assignment_matches_python_reference(spark, ids):
    from bi_utils_spark.operators.importance import shard_positions

    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = {r["doc_id"]: (r["shard"], r["pos"])
           for r in shard_positions(df, "doc_id", num_shards=4).collect()}

    def ref_shard(i):
        h = hashlib.md5(f"{i}shuffle".encode()).hexdigest()[:16]
        return int(h, 16) * 4 >> 64, h

    by_shard = {}
    for i in ids:
        s, h = ref_shard(i)
        by_shard.setdefault(s, []).append((h, i))
    want = {}
    for s, rows in by_shard.items():
        for pos, (_, i) in enumerate(sorted(rows), start=1):
            want[i] = (s, pos)
    assert got == want


@SETTINGS
@given(
    ids=st.lists(st.integers(0, 2**40), min_size=2, max_size=20, unique=True),
    k=st.integers(1, 5),
)
def test_gumbel_topk_matches_python_reference(spark, ids, k):
    from bi_utils_spark.operators.importance import importance_resample

    rows = [(i, float(i % 7) / 3.0) for i in ids]
    df = spark.createDataFrame(rows, ["doc_id", "weight"])
    got = sorted(r["doc_id"] for r in importance_resample(df, k=k).collect())

    def key(i, w):
        h = int(hashlib.md5(f"{i}gumbel".encode()).hexdigest()[:13], 16)
        u = (h + 0.5) / float(1 << 52)
        return round((w + -_math.log(-_math.log(u))) * 1e7)

    ranked = sorted(rows, key=lambda r: (-key(r[0], r[1]), r[0]))
    want = sorted(i for i, _ in ranked[:k])
    assert got == want


@SETTINGS
@given(
    toks=st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]),
                  min_size=1, max_size=8),
)
def test_feature_buckets_match_python_reference(spark, toks):
    from bi_utils_spark.operators.importance import hashed_feature_rows

    text = " ".join(toks)
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = sorted(
        r["bucket"]
        for r in hashed_feature_rows(df, "doc_id", "text", 4096).collect()
    )
    feats = list(toks)
    if len(toks) > 1:
        feats += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    want = sorted(
        int(hashlib.md5(f.encode()).hexdigest()[:13], 16) % 4096 for f in feats
    )
    assert got == want


# --- perceptual hash (operators/phash.py) ----------------------------------


@given(
    w=st.integers(1, 24),
    h=st.integers(1, 20),
    seed=st.integers(0, 10**6),
    shift=st.integers(0, 50),
)
@settings(max_examples=50, deadline=None)
def test_ahash_brightness_invariance_property(w, h, seed, shift):
    # pure-Python property (no Spark jobs): for ANY image whose
    # channels leave headroom, a uniform brightness shift never flips
    # an aHash bit — the exact-integer mean comparison guarantees it
    import hashlib

    from bi_utils_spark.operators.multimodal import encode_bmp
    from bi_utils_spark.operators.phash import average_hash_64

    def px(x, y, add):
        d = hashlib.md5(f"{seed},{x},{y}".encode()).digest()
        return (d[0] % 200 + add, d[1] % 200 + add, d[2] % 200 + add)

    base = encode_bmp(w, h, [[px(x, y, 0) for x in range(w)] for y in range(h)])
    shifted = encode_bmp(
        w, h, [[px(x, y, shift) for x in range(w)] for y in range(h)]
    )
    assert average_hash_64(base) == average_hash_64(shifted)


@given(
    w=st.integers(8, 24),
    h=st.integers(8, 20),
    seed=st.integers(0, 10**6),
)
@settings(max_examples=30, deadline=None)
def test_ahash_bit_count_bounded(w, h, seed):
    # structural sanity: a hash is 64 bits and not all-ones (some cell
    # must sit at-or-below the global mean by pigeonhole)
    import hashlib

    from bi_utils_spark.operators.multimodal import encode_bmp
    from bi_utils_spark.operators.phash import average_hash_64

    def px(x, y):
        d = hashlib.md5(f"{seed},{x},{y}".encode()).digest()
        return (d[0], d[1], d[2])

    hv = average_hash_64(
        encode_bmp(w, h, [[px(x, y) for x in range(w)] for y in range(h)])
    )
    assert 0 <= hv < 1 << 64
    assert bin(hv).count("1") < 64


# --- k-means fixed-point geometry (operators/clustering.py) ----------------


@given(
    pts=st.lists(
        st.tuples(
            st.floats(-5, 5, allow_nan=False, width=32),
            st.floats(-5, 5, allow_nan=False, width=32),
        ),
        min_size=3,
        max_size=12,
    ),
    k=st.integers(2, 3),
)
@SETTINGS
def test_kmeans_inertia_never_increases_after_update(spark, pts, k):
    # Lloyd monotonicity survives the quantization: total inertia
    # after (assign, update, re-assign) is <= inertia after the first
    # assignment, up to the 1e-7 grid resolution per coordinate
    from bi_utils_spark.operators.clustering import (
        kmeans_assign,
        kmeans_fit,
        kmeans_init,
    )

    rows = [(i + 1, [a, b]) for i, (a, b) in enumerate(pts)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    k = min(k, len(rows))
    c0 = kmeans_init(df, "vec_id", "embedding", k)
    i0 = sum(r["d2q"] for r in kmeans_assign(df, c0).collect())
    c1 = kmeans_fit(df, k=k, iters=1)
    i1 = sum(r["d2q"] for r in kmeans_assign(df, c1).collect())
    # quantizing a centroid moves it < 1e-7 per dim; allow that slack
    n, dim = len(rows), 2
    slack = n * dim * (4 * 10**7 + 4)  # (|q_eps|·(2·maxdist·1e7)+eps²) bound
    assert i1 <= i0 + slack


# --- percent-rank two-level CDF ≡ SQL percent_rank -------------------------
# VERDICT r4 #7: the subtlest arithmetic in the repo (bucketed CDF
# with literal-baked offsets) pinned against the naive single-window
# definition on hostile shapes: ties, NULLs, single row, constant
# column, tiny bucket counts.


@given(
    scores=st.lists(
        st.one_of(
            st.none(),
            st.integers(-3, 3).map(float),
            st.floats(-100, 100, allow_nan=False),
        ),
        min_size=1,
        max_size=40,
    ),
    num_buckets=st.sampled_from([1, 2, 3, 256]),
)
@SETTINGS
def test_percent_rank_matches_single_window(spark, scores, num_buckets):
    from pyspark.sql import Window

    from bi_utils_spark.operators.filtering import attach_percent_rank

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(scores)], "id long, s double"
    )
    got = {
        r["id"]: r["pr"]
        for r in attach_percent_rank(df, "s", num_buckets=num_buckets).collect()
    }
    want = {
        r["id"]: r["pr"]
        for r in df.withColumn(
            "pr", F.percent_rank().over(Window.orderBy("s"))
        ).collect()
    }
    assert got.keys() == want.keys()
    for i in got:
        assert abs(got[i] - want[i]) < 1e-12, (i, got[i], want[i], scores)
