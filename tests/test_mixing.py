"""Tests for bigram LM scoring (operators/lm.py) and source-mixture
quota sampling (operators/mixing.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bi_utils_spark.operators.lm import (
    bigram_logprob_scores,
    bigram_model,
    bigram_pairs,
)
from bi_utils_spark.operators.mixing import mixture_sample, source_token_counts


def test_bigram_pairs_adjacency(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "x")], ["doc_id", "text"])
    got = {(r["doc_id"], r["w1"], r["w2"]) for r in bigram_pairs(df).collect()}
    assert got == {(1, "a", "b"), (1, "b", "c")}  # 1-token doc: no rows


def test_bigram_hand_math(spark):
    # corpus "a b" ×2 + "a c": c(a,b)=2, c(a,c)=1, c(a,·)=3;
    # unigrams a:3 b:2 c:1 -> total 6, V 3
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in bigram_logprob_scores(df, lam=0.7).collect()}
    p_ab = 0.7 * (2 / 3) + (1.0 - 0.7) * ((2 + 1) / (6 + 3))
    p_ac = 0.7 * (1 / 3) + (1.0 - 0.7) * ((1 + 1) / (6 + 3))
    q = lambda p: round(math.log(p) * 1e7) / 1e7  # noqa: E731
    assert got[1]["n_bigrams"] == 1
    assert got[1]["avg_logprob"] == pytest.approx(q(p_ab), abs=1e-9)
    assert got[3]["avg_logprob"] == pytest.approx(q(p_ac), abs=1e-9)
    # the rarer continuation scores lower
    assert got[3]["avg_logprob"] < got[1]["avg_logprob"]


def test_bigram_cross_corpus_unseen_backoff(spark):
    ref = spark.createDataFrame([(1, "the cat sat")], ["doc_id", "text"])
    model = bigram_model(ref)
    from bi_utils_spark.operators.lm import unigram_model

    uni = unigram_model(ref)
    cand = spark.createDataFrame(
        [(10, "the cat"), (11, "cat the")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["avg_logprob"] for r in
           bigram_logprob_scores(cand, model=model, unigram=uni).collect()}
    # seen bigram ("the cat") must outscore the reversed unseen one,
    # which only gets backoff mass — the word-salad detector property
    assert got[10] > got[11]


def test_bigram_word_salad_scores_lower_than_original(spark, sf_dir):
    from bi_utils_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    scores = bigram_logprob_scores(docs)
    row = scores.agg(F.min("avg_logprob").alias("lo"),
                     F.max("avg_logprob").alias("hi")).first()
    assert row["lo"] < row["hi"] < 0.0


def test_bigram_deterministic_under_repartition(spark, sf_dir):
    from bi_utils_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {(r["doc_id"], r["avg_logprob"])
         for r in bigram_logprob_scores(docs).collect()}
    b = {(r["doc_id"], r["avg_logprob"])
         for r in bigram_logprob_scores(docs.repartition(11)).collect()}
    assert a == b


def test_mixture_quota_met_not_undershot(spark, sf_dir):
    from bi_utils_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    budget = 2000
    sel = mixture_sample(docs, "doc_id", "source", budget_tokens=budget)
    inv = {r["group"]: r["n_tokens"] for r in
           source_token_counts(docs, "source").collect()}
    quota = budget / len(inv)
    per = {r["source"]: r["tot"] for r in
           sel.groupBy("source").agg(F.sum("n_tokens").alias("tot")).collect()}
    for src, avail in inv.items():
        if avail >= quota:
            # prefix rule: kept mass reaches the quota (boundary doc kept)
            assert per.get(src, 0) >= quota
        else:
            assert per.get(src, 0) == avail


def test_mixture_deterministic_and_prefix_stable(spark, sf_dir):
    from bi_utils_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"] for r in
         mixture_sample(docs, "doc_id", "source", 3000).collect()}
    b = {r["doc_id"] for r in
         mixture_sample(docs.repartition(17), "doc_id", "source", 3000).collect()}
    assert a == b
    # a bigger budget strictly extends each source's prefix
    big = {r["doc_id"] for r in
           mixture_sample(docs, "doc_id", "source", 6000).collect()}
    assert a <= big


def test_mixture_explicit_weights(spark):
    rows = [(i, "w " * 10, "a") for i in range(20)] + [
        (100 + i, "w " * 10, "b") for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    sel = mixture_sample(
        df, "doc_id", "source", budget_tokens=100,
        weights={"a": 3.0, "b": 1.0},
    )
    per = {r["source"]: r["tot"] for r in
           sel.groupBy("source").agg(F.sum("n_tokens").alias("tot")).collect()}
    # quotas 75/25 over 10-token docs -> 80/30 after boundary overshoot
    assert per["a"] == 80
    assert per["b"] == 30
    # a group with zero weight is excluded entirely
    sel0 = mixture_sample(
        df, "doc_id", "source", budget_tokens=100, weights={"a": 1.0}
    )
    assert sel0.filter(F.col("source") == "b").count() == 0


# --- BPE pair statistics (lm.py) ------------------------------------------


def test_bpe_pair_counts_hand_math(spark):
    from bi_utils_spark.operators.lm import bpe_pair_counts, unigram_model

    df = spark.createDataFrame(
        [(1, "abc abc ab"), (2, "abc")], ["doc_id", "text"]
    )
    # model: abc:3, ab:1 -> pairs ab:3+1=4, bc:3
    got = {r["pair"]: r["cnt"] for r in
           bpe_pair_counts(unigram_model(df)).collect()}
    assert got == {"ab": 4, "bc": 3}


def test_bpe_top_pairs_rank_and_ties(spark):
    from bi_utils_spark.operators.lm import bpe_top_pairs, unigram_model

    df = spark.createDataFrame([(1, "xy yx xy yx")], ["doc_id", "text"])
    rows = bpe_top_pairs(unigram_model(df), 2).collect()
    # xy:2 and yx:2 tie -> lexicographic order breaks it
    assert [(r["pair"], r["rank"]) for r in rows] == [("xy", 1), ("yx", 2)]


# --- incremental unigram-model maintenance (lm.py) ------------------------


def test_apply_model_delta_equals_full_rebuild(spark, tmp_path):
    from bi_utils_spark.operators.lm import (
        apply_model_delta,
        read_model,
        unigram_model,
    )

    path = str(tmp_path / "model")
    b1 = spark.createDataFrame([(1, "a b a"), (2, "c")], ["doc_id", "text"])
    b2 = spark.createDataFrame([(3, "a d")], ["doc_id", "text"])
    apply_model_delta(spark, path, unigram_model(b1))
    apply_model_delta(spark, path, unigram_model(b2))
    got = {(r["term"], r["c"]) for r in read_model(spark, path).collect()}
    full = unigram_model(b1.unionByName(b2))
    want = {(r["term"], r["c"]) for r in full.collect()}
    assert got == want


def test_apply_model_delta_untouched_buckets_not_rewritten(spark, tmp_path):
    import glob
    import os

    from bi_utils_spark.operators.lm import apply_model_delta, unigram_model

    path = str(tmp_path / "model2")
    base = spark.createDataFrame(
        [(1, " ".join(f"tok{i}" for i in range(200)))], ["doc_id", "text"]
    )
    apply_model_delta(spark, path, unigram_model(base), num_buckets=16)
    mtimes = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{path}/term_bucket=*/*.parquet")
    }
    # single-term delta -> exactly one bucket partition rewritten
    delta = spark.createDataFrame([(2, "tok0 tok0")], ["doc_id", "text"])
    apply_model_delta(spark, path, unigram_model(delta), num_buckets=16)
    changed = {
        os.path.dirname(p)
        for p, t in (
            (p, os.path.getmtime(p))
            for p in glob.glob(f"{path}/term_bucket=*/*.parquet")
        )
        if p not in mtimes or t != mtimes[p]
    }
    assert len(changed) == 1


def test_mixture_bucketed_equals_one_level(spark, sf_dir):
    from bi_utils_spark.operators.mixing import (
        mixture_sample,
        mixture_sample_bucketed,
    )
    from bi_utils_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    for budget in (1500, 4000):
        one = {(r["doc_id"], r["n_tokens"]) for r in
               mixture_sample(docs, "doc_id", "source", budget).collect()}
        two = {(r["doc_id"], r["n_tokens"]) for r in
               mixture_sample_bucketed(docs, "doc_id", "source", budget,
                                       bucket_hex_chars=1).collect()}
        assert one == two


def test_mixture_bucketed_explicit_weights(spark):
    from bi_utils_spark.operators.mixing import (
        mixture_sample,
        mixture_sample_bucketed,
    )

    rows = [(i, "w " * 7, "a") for i in range(30)] + [
        (100 + i, "w " * 7, "b") for i in range(30)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    kw = dict(budget_tokens=120, weights={"a": 2.0, "b": 1.0})
    one = {r["doc_id"] for r in
           mixture_sample(df, "doc_id", "source", **kw).collect()}
    two = {r["doc_id"] for r in
           mixture_sample_bucketed(df, "doc_id", "source",
                                   bucket_hex_chars=1, **kw).collect()}
    assert one == two and len(one) > 0


def test_encode_tokens_roundtrip_and_oov(spark):
    from bi_utils_spark.operators.lm import (
        encode_tokens,
        term_ranks,
        unigram_model,
    )

    df = spark.createDataFrame([(1, "b a b zz")], ["doc_id", "text"])
    vocab = term_ranks(unigram_model(df)).filter("rank <= 2")  # b:1, a:2
    got = sorted(
        (r["pos"], r["token_id"]) for r in encode_tokens(df, vocab).collect()
    )
    assert got == [(0, 1), (1, 2), (2, 1), (3, 0)]  # zz -> OOV 0


def test_curriculum_order_phases_and_positions(spark, sf_dir):
    from bi_utils_spark.operators.lm import unigram_logprob_scores
    from bi_utils_spark.operators.mixing import curriculum_order
    from bi_utils_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    scores = unigram_logprob_scores(docs).select("doc_id", "avg_logprob")
    out = curriculum_order(scores, "doc_id", "avg_logprob", num_phases=4)
    rows = out.collect()
    assert len(rows) == scores.count()
    # phase 0 holds the most fluent docs: its min score >= phase 3's max
    by_phase = {}
    for r in rows:
        by_phase.setdefault(r["phase"], []).append(r["avg_logprob"])
    assert set(by_phase) <= {0, 1, 2, 3}
    assert min(by_phase[0]) >= max(by_phase[3])
    # positions are 1..n within each phase
    for ph, vals in by_phase.items():
        ps = sorted(r["pos"] for r in rows if r["phase"] == ph)
        assert ps == list(range(1, len(vals) + 1))


def test_curriculum_order_deterministic(spark, sf_dir):
    from bi_utils_spark.operators.lm import unigram_logprob_scores
    from bi_utils_spark.operators.mixing import curriculum_order
    from bi_utils_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    s = unigram_logprob_scores(docs).select("doc_id", "avg_logprob")
    a = {(r["doc_id"], r["phase"], r["pos"]) for r in
         curriculum_order(s, "doc_id", "avg_logprob").collect()}
    b = {(r["doc_id"], r["phase"], r["pos"]) for r in
         curriculum_order(s.repartition(9), "doc_id", "avg_logprob").collect()}
    assert a == b


def test_curriculum_order_no_single_partition_window(spark, sf_dir):
    # VERDICT r3 #3: continuous scores must not produce an
    # unpartitioned window (corpus-/phase-sized single-task sort)
    from bi_utils_spark.operators.lm import unigram_logprob_scores
    from bi_utils_spark.operators.mixing import curriculum_order
    from bi_utils_spark.plans.inspect import assert_no_global_window
    from bi_utils_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    s = unigram_logprob_scores(docs).select("doc_id", "avg_logprob")
    assert_no_global_window(curriculum_order(s, "doc_id", "avg_logprob"))


def test_curriculum_order_matches_one_level_layout(spark):
    # two-level positions must equal the brute-force single-window
    # layout (phase-wide row_number over (hash, id))
    from pyspark.sql import Window

    from bi_utils_spark.operators.mixing import curriculum_order
    from bi_utils_spark.operators.splits import _bucket_hex

    import random

    random.seed(3)
    df = spark.createDataFrame(
        [(i, random.gauss(0, 1)) for i in range(2000)], ["doc_id", "sc"]
    )
    got = {
        (r["doc_id"], r["phase"], r["pos"])
        for r in curriculum_order(df, "doc_id", "sc").collect()
    }
    pr = df.withColumn("__pr", F.percent_rank().over(Window.orderBy("sc")))
    phase = F.least(
        F.floor((F.lit(1.0) - F.col("__pr")) * 4), F.lit(3)
    ).cast("int")
    brute = (
        pr.withColumn("phase", phase)
        .withColumn("__h", _bucket_hex(F.col("doc_id"), "curr"))
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("phase").orderBy("__h", "doc_id")
            ),
        )
    )
    exp = {(r["doc_id"], r["phase"], r["pos"]) for r in brute.collect()}
    assert got == exp


def test_bigram_salted_split_value_invariant(spark):
    """VERDICT r4 #9: routing hot pairs through the salted join must
    not change a single value, for any salt count or hot list."""
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat ate the cat food"),
        (3, "a dog barked"),
        (4, "the the the the"),
        (5, "solo"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    base = sorted(map(tuple, bigram_logprob_scores(df).collect()))
    for hot, salts in ((["the", "cat"], 4), (["the"], 1), (["zzz"], 8)):
        got = sorted(
            map(
                tuple,
                bigram_logprob_scores(df, hot_terms=hot, salts=salts).collect(),
            )
        )
        assert got == base, (hot, salts)


def test_bigram_salted_plan_shape(spark):
    """The hot path must actually salt: the head join keys on
    (w1, w2, __salt) — visible as a salted exchange — and the
    vocab-sized margins/unigram joins must be broadcast, never a
    corpus shuffle on w1/w2 alone."""
    from bi_utils_spark.plans.inspect import executed_plan, join_kinds

    df = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(20)], ["doc_id", "text"]
    )
    plan = executed_plan(
        bigram_logprob_scores(df, hot_terms=["the", "cat"], salts=4)
    )
    assert "__salt" in plan, "salted join key missing from the plan"
    # ctx + uni2 broadcast once after the branch union; consts is the
    # single 1-row constant broadcast
    kinds = join_kinds(bigram_logprob_scores(df, hot_terms=["the"], salts=2))
    assert kinds.get("BroadcastHashJoin", 0) >= 2
    assert kinds.get("BroadcastNestedLoopJoin", 0) <= 1


def test_bigram_salts_validation(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="salts"):
        bigram_logprob_scores(df, hot_terms=["a"], salts=0)


# ---------------------------------------------------------------------------
# X64: iterative BPE training (lm.bpe_train)
# ---------------------------------------------------------------------------


def _ref_bpe(vocab, n):
    """Reference BPE (Sennrich et al. 2016): exact left-to-right
    merge with scan-resume-after-replacement semantics."""
    v = {t: list(t) for t, _ in vocab}
    cs = dict(vocab)
    merges = []
    for step in range(n):
        cnt = {}
        for t, syms in v.items():
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                cnt[k] = cnt.get(k, 0) + cs[t]
        if not cnt:
            break
        (a, b), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step + 1, f"{a} {b}", a + b, c))
        for t, syms in v.items():
            i, ns = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            v[t] = ns
    return merges, {t: " ".join(s) for t, s in v.items()}


def _run_bpe(spark, vocab, n, **kw):
    from bi_utils_spark.operators.lm import bpe_train

    model = spark.createDataFrame(vocab, "term string, c long")
    merges, state = bpe_train(model, n, **kw)
    got_m = [
        (r["rank"], r["pair"], r["merged"], r["cnt"])
        for r in merges.orderBy("rank").collect()
    ]
    got_v = {r["term"]: r["spaced"] for r in state.collect()}
    return got_m, got_v


def test_bpe_train_matches_reference(spark):
    vocab = [
        ("abcd", 40), ("abce", 30), ("bcd", 25), ("acd", 15),
        ("abd", 10), ("bce", 8), ("ade", 5), ("ce", 3),
    ]
    exp_m, exp_v = _ref_bpe(vocab, 5)
    got_m, got_v = _run_bpe(spark, vocab, 5)
    assert got_m == exp_m
    assert got_v == exp_v


def test_bpe_train_overlapping_runs_and_self_pairs(spark):
    # repeated chars: 'a a a a' merges to 'aa aa' (scan resumes after
    # each replacement, never re-merging fresh symbols in-step)
    vocab = [("aaaa", 50), ("aaab", 20), ("abab", 10)]
    exp_m, exp_v = _ref_bpe(vocab, 4)
    got_m, got_v = _run_bpe(spark, vocab, 4)
    assert got_m == exp_m
    assert got_v == exp_v


def test_bpe_train_exhausts_and_checkpoints(spark):
    # more merges requested than exist -> stops when no pair remains.
    # driver_max_vocab=0 pins the DISTRIBUTED loop (with per-step
    # checkpoints) — the r12 driver tier would otherwise bypass it.
    vocab = [("ab", 5), ("cd", 1)]
    exp_m, exp_v = _ref_bpe(vocab, 10)
    got_m, got_v = _run_bpe(
        spark, vocab, 10, checkpoint_every=1, driver_max_vocab=0
    )
    assert got_m == exp_m and len(got_m) == 2
    assert got_v == {"ab": "ab", "cd": "cd"}


def test_bpe_train_driver_tier_equals_distributed(spark):
    # r12 size-tier: the driver-side merge loop must produce the
    # byte-identical (merges, vocab) pair as the distributed loop,
    # including count-tie pairs broken by pair string and self-pair
    # runs ('aaaa')
    vocab = [
        ("abcd", 40), ("abce", 30), ("bcd", 25), ("acd", 15),
        ("aaaa", 15), ("abd", 10), ("bce", 8), ("ade", 5), ("ce", 3),
    ]
    dist_m, dist_v = _run_bpe(spark, vocab, 6, driver_max_vocab=0)
    drv_m, drv_v = _run_bpe(spark, vocab, 6)  # tier engages (|V| <= bound)
    assert drv_m == dist_m
    assert drv_v == dist_v


def test_bpe_encode_applies_merges_in_rank_order(spark):
    from bi_utils_spark.operators.lm import bpe_encode

    df = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "new newer low")], ["id", "text"]
    )
    merges = [("l", "o"), ("lo", "w"), ("e", "r")]
    out = {r["id"]: r for r in bpe_encode(df, "id", "text", merges).collect()}
    assert out[1]["bpe_tokens"] == ["low", "low", "er", "low", "e", "s", "t"]
    assert out[2]["bpe_tokens"] == ["n", "e", "w", "n", "e", "w", "er", "low"]
    assert out[1]["n_bpe_tokens"] == 7


def test_bpe_encode_train_roundtrip(spark):
    """Encoding the training vocab with its own merges reproduces
    bpe_train's final symbol state."""
    from bi_utils_spark.operators.lm import bpe_encode, bpe_train

    model = spark.createDataFrame(
        [("abab", 10), ("abc", 5), ("bc", 3)], ["term", "c"]
    )
    merges_df, state = bpe_train(model, 3)
    merges = [
        tuple(r["pair"].split(" ", 1))
        for r in merges_df.orderBy("rank").collect()
    ]
    docs = model.select(F.col("term").alias("id"), F.col("term").alias("text"))
    enc = {
        r["id"]: r["bpe_tokens"]
        for r in bpe_encode(docs, "id", "text", merges).collect()
    }
    final = {r["term"]: r["spaced"].split(" ") for r in state.collect()}
    assert enc == final


def test_bpe_encode_oov_words_stay_character_level(spark):
    from bi_utils_spark.operators.lm import bpe_encode

    df = spark.createDataFrame([(1, "zzq")], ["id", "text"])
    out = bpe_encode(df, "id", "text", [("a", "b")]).collect()[0]
    assert out["bpe_tokens"] == ["z", "z", "q"]


def test_bpe_encode_keeps_wordless_docs(spark):
    from bi_utils_spark.operators.lm import bpe_encode

    df = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, "   ")], ["id", "text"]
    )
    out = {r["id"]: r for r in bpe_encode(df, "id", "text", [("a", "b")]).collect()}
    assert out[1]["bpe_tokens"] == ["ab"]
    assert out[2]["bpe_tokens"] == [] and out[2]["n_bpe_tokens"] == 0
    assert out[3]["bpe_tokens"] == []
