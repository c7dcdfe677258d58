"""Connected components / canonical dedup (operators/graph.py)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bi_utils_spark.operators.graph import connected_components, dedup_near_canonical


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical: min node per set
    comp = {}
    for n in list(parent):
        root = find(n)
        comp.setdefault(root, []).append(n)
    out = {}
    for members in comp.values():
        lo = min(members)
        for n in members:
            out[n] = lo
    return out


def test_components_chain_and_triangle(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 10), (20, 20)],
        ["id_a", "id_b"],
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    # self-loop (20,20) contributes no node; chain collapses to min=1
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_components_diameter_guard(spark):
    # the convergence guard belongs to the distributed loop — force it
    edges = spark.createDataFrame([(i, i + 1) for i in range(6)], ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, max_iter=1, driver_max_edges=0)
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, driver_max_edges=0).collect()
    }
    assert set(got.values()) == {0}


def test_driver_and_distributed_paths_agree(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 10), (7, 7), (5, 4)],
        ["id_a", "id_b"],
    )
    fast = {
        r["node"]: r["component"] for r in connected_components(edges).collect()
    }
    dist = {
        r["node"]: r["component"]
        for r in connected_components(edges, driver_max_edges=0).collect()
    }
    assert fast == dist
    # schema/type parity (bigint nodes in, bigint labels out of both)
    assert (
        connected_components(edges).dtypes
        == connected_components(edges, driver_max_edges=0).dtypes
    )


def test_driver_path_string_ids(spark):
    edges = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], ["id_a", "id_b"]
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_components_match_union_find(spark, edge_list):
    expected = _union_find([e for e in edge_list if e[0] != e[1]])
    df = spark.createDataFrame(edge_list, ["id_a", "id_b"])
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == expected


def test_dedup_near_canonical_keeps_min_and_unpaired(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(7)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 5), (3, 4)], ["id_a", "id_b"])
    kept = sorted(
        r["doc_id"] for r in dedup_near_canonical(docs, pairs).collect()
    )
    # clusters {1,2,5} -> keep 1; {3,4} -> keep 3; 0 and 6 unpaired
    assert kept == [0, 1, 3, 6]


def test_components_on_real_near_dup_pairs(spark, sf_dir):
    from bi_utils_spark.operators.dedup import jaccard_similarity_join
    from bi_utils_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_similarity_join(docs, "doc_id", "text", threshold=0.5, shingle_n=3)
    comp = connected_components(pairs)
    rows = comp.collect()
    nodes = {r["node"] for r in rows}
    pair_nodes = set()
    for r in pairs.collect():
        pair_nodes |= {r["id_a"], r["id_b"]}
    assert nodes == pair_nodes                      # every paired doc labeled
    by_comp = {r["node"]: r["component"] for r in rows}
    assert all(by_comp[c] == c for c in set(by_comp.values()))  # roots are members


# ---------------------------------------------------------------------------
# X68: PageRank (graph.pagerank)
# ---------------------------------------------------------------------------


def _pr_ref(edges, n_iter, p=85):
    from bi_utils_spark.operators.graph import PR_SCALE

    nodes = sorted({a for a, b in edges} | {b for a, b in edges})
    n = len(nodes)
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
    rq = {x: PR_SCALE // n for x in nodes}
    base = (PR_SCALE - p * PR_SCALE // 100) // n
    for _ in range(n_iter):
        s = {x: 0 for x in nodes}
        for a, b in edges:
            s[b] += rq[a] // deg[a]
        dang = sum(rq[x] for x in nodes if x not in deg)
        rq = {x: base + (p * (s[x] + dang // n)) // 100 for x in nodes}
    return rq


def test_pagerank_matches_integer_reference(spark):
    from bi_utils_spark.operators.graph import pagerank

    edges = [(0, 1), (1, 2), (2, 0), (0, 2), (3, 0), (1, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_q"] for r in pagerank(df, n_iter=6).collect()}
    assert got == _pr_ref(edges, 6)


def test_pagerank_hub_outranks_leaf_and_dangling_mass_flows(spark):
    from bi_utils_spark.operators.graph import pagerank

    # stars pointing at 0; node 9 dangling
    edges = [(i, 0) for i in range(1, 9)] + [(0, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    ranks = {r["node"]: r["rank"] for r in pagerank(df, n_iter=10).collect()}
    assert ranks[0] > ranks[9] > ranks[1]
    # total mass stays ~1 (floors lose at most ~1e-10 here)
    assert abs(sum(ranks.values()) - 1.0) < 1e-6


def test_pagerank_empty_and_shuffle_form(spark):
    from bi_utils_spark.operators.graph import pagerank

    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty, n_iter=3).count() == 0
    edges = [(0, 1), (1, 0), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r["node"]: r["rank_q"]
         for r in pagerank(df, n_iter=4, broadcast_ranks=True).collect()}
    b = {r["node"]: r["rank_q"]
         for r in pagerank(df, n_iter=4, broadcast_ranks=False).collect()}
    assert a == b == _pr_ref(edges, 4)


def test_pagerank_repartition_invariant(spark):
    from bi_utils_spark.operators.graph import pagerank

    edges = [(i % 7, (i * 3) % 7) for i in range(30)]
    edges = list({e for e in edges if e[0] != e[1]})
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r["node"]: r["rank_q"] for r in pagerank(df, n_iter=5).collect()}
    b = {r["node"]: r["rank_q"]
         for r in pagerank(df.repartition(13), n_iter=5).collect()}
    assert a == b == _pr_ref(edges, 5)


def test_triangle_counts_known_graph(spark):
    from bi_utils_spark.operators.graph import triangle_counts

    # K4 on 1-4 (4 triangles, every node in 3) + pendant 5 + an
    # isolated edge 6-7; duplicate/reversed/self-loop noise mixed in
    edges = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges += [(4, 5), (6, 7), (2, 1), (3, 3), (1, 2)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {r["node"]: r for r in triangle_counts(df).collect()}

    for v in (1, 2, 3):
        assert out[v]["triangles"] == 3 and out[v]["degree"] == 3
        assert out[v]["lcc"] == pytest.approx(1.0)
    # node 4 has degree 4 (K4 + pendant): 3 triangles of C(4,2)=6 pairs
    assert out[4]["triangles"] == 3
    assert out[4]["lcc"] == pytest.approx(0.5)
    # pendant and isolated edge: no triangles, lcc NULL (degree 1)
    assert out[5]["triangles"] == 0 and out[5]["lcc"] is None
    assert out[6]["triangles"] == 0 and out[7]["triangles"] == 0
    # global count = sum/3
    assert sum(r["triangles"] for r in out.values()) == 4 * 3


def test_triangle_counts_no_double_count_on_ties(spark):
    from bi_utils_spark.operators.graph import triangle_counts

    # single triangle, all degrees equal (orientation tie-break by id)
    df = spark.createDataFrame(
        [(10, 20), (20, 30), (10, 30)], ["src", "dst"]
    )
    out = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    assert out == {10: 1, 20: 1, 30: 1}


def test_label_propagation_two_communities(spark):
    from bi_utils_spark.operators.graph import label_propagation

    # K4 on 1-4 and K4 on 11-14, joined by a single bridge 4-11
    edges = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges += [
        (a, b) for a in range(11, 15) for b in range(11, 15) if a < b
    ]
    edges += [(4, 11)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {
        r["node"]: r["label"]
        for r in label_propagation(df, n_iter=4).collect()
    }
    # dense cliques converge to their min id; the bridge does not
    # merge them (each side's majority is internal)
    assert {out[v] for v in (1, 2, 3)} == {1}
    assert {out[v] for v in (12, 13, 14)} == {11}


def test_label_propagation_deterministic_ties(spark):
    from bi_utils_spark.operators.graph import label_propagation

    # path 1-2-3: node 2 sees labels {1, 3} equally -> min (1) wins
    df = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    out = {
        r["node"]: r["label"]
        for r in label_propagation(df, n_iter=1).collect()
    }
    assert out[2] == 1
    # and the run is repartition-stable
    out2 = {
        r["node"]: r["label"]
        for r in label_propagation(
            df.repartition(5), n_iter=1
        ).collect()
    }
    assert out == out2


def test_cc_and_triangles_random_parity_with_brute_force(spark):
    """Seeded random graphs: components equal a union-find reference,
    per-node triangle counts equal exhaustive triple enumeration."""
    import itertools
    import random

    from bi_utils_spark.operators.graph import (
        connected_components,
        triangle_counts,
    )

    rng = random.Random(42)
    for _ in range(6):
        n = rng.randrange(2, 12)
        edges = set()
        for _ in range(rng.randrange(1, 18)):
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        if not edges:
            continue
        df = spark.createDataFrame(sorted(edges), ["id_a", "id_b"])
        nodes = sorted({x for e in edges for x in e})
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        exp_comp: dict[int, list[int]] = {}
        for v in nodes:
            exp_comp.setdefault(find(v), []).append(v)
        exp_sets = sorted(sorted(v) for v in exp_comp.values())
        comp: dict[int, list[int]] = {}
        for r in connected_components(df).collect():
            comp.setdefault(r["component"], []).append(r["node"])
        assert sorted(sorted(v) for v in comp.values()) == exp_sets, edges

        adj = {v: set() for v in nodes}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        exp_tri = {v: 0 for v in nodes}
        for a, b, c in itertools.combinations(nodes, 3):
            if b in adj[a] and c in adj[a] and c in adj[b]:
                for v in (a, b, c):
                    exp_tri[v] += 1
        got_tri = {
            r["node"]: r["triangles"]
            for r in triangle_counts(df, "id_a", "id_b").collect()
        }
        assert all(
            got_tri.get(v, 0) == exp_tri[v] for v in nodes
        ), edges
