"""KG-analytics operators (operators/kg.py): degree/support profile,
weakly-connected components, fixed-iteration integer PageRank over the
canonical triple store. Cross-engine exactness is gated by the driver
(registry kg_degree_stats / kg_components / kg_pagerank); these tests pin
the semantics on hand-checked graphs plus a pure-Python PageRank twin on
a random graph — including the shapes the sf corpus doesn't produce
(dangling nodes, isolated self-loop entities, long paths)."""

from __future__ import annotations

import random

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from dygiepp_spark.operators import kg


def _canon(spark, rows):
    return spark.createDataFrame(
        rows, "subj_canonical string, pred string, obj_canonical string, n_support long"
    )


def test_degree_stats_counts_both_sides_and_self_loops(spark):
    canon = _canon(
        spark,
        [
            ("A", "P", "B", 3),
            ("A", "Q", "B", 1),  # parallel edge under another predicate
            ("B", "P", "C", 2),
            ("D", "P", "D", 5),  # self-loop: counts on both sides
        ],
    )
    got = {r["entity"]: r.asDict() for r in kg.degree_stats(canon).collect()}
    assert got["A"] == {"entity": "A", "out_degree": 2, "in_degree": 0, "total_support": 4}
    assert got["B"] == {"entity": "B", "out_degree": 1, "in_degree": 2, "total_support": 6}
    assert got["C"] == {"entity": "C", "out_degree": 0, "in_degree": 1, "total_support": 2}
    assert got["D"] == {"entity": "D", "out_degree": 1, "in_degree": 1, "total_support": 10}


def test_kg_components_two_islands_and_isolated_self_loop(spark):
    canon = _canon(
        spark,
        [
            ("B", "P", "A", 1),
            ("B", "P", "C", 1),  # island 1: {A, B, C} -> min A
            ("Y", "P", "Z", 1),  # island 2: {Y, Z} -> min Y
            ("Q", "P", "Q", 1),  # self-loop only: isolated -> own component
        ],
    )
    got = {r["entity"]: r["component"] for r in kg.kg_components(canon).collect()}
    assert got == {"A": "A", "B": "A", "C": "A", "Y": "Y", "Z": "Y", "Q": "Q"}


def test_kg_components_long_path_converges(spark):
    # a 64-node path needs O(log n) star rounds; naive min-propagation
    # with a too-small iteration budget would leave stale labels
    rows = [(f"N{i:03d}", "P", f"N{i + 1:03d}", 1) for i in range(63)]
    got = kg.kg_components(_canon(spark, rows)).collect()
    assert len(got) == 64
    assert {r["component"] for r in got} == {"N000"}


def _pagerank_reference(edges, nodes, iterations, scale, damping_num):
    """Pure-Python integer twin of kg.pagerank_quantized."""
    out_deg = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    base = ((100 - damping_num) * scale) // 100
    rank = {n: scale for n in nodes}
    for _ in range(iterations):
        contrib = {n: 0 for n in nodes}
        for s, d in edges:
            contrib[d] += rank[s] // out_deg[s]
        rank = {n: base + (damping_num * contrib[n]) // 100 for n in nodes}
    return rank


@pytest.mark.parametrize("iterations", [1, 3])
def test_pagerank_matches_python_reference_on_random_graph(spark, iterations):
    rng = random.Random(42)
    nodes = [f"E{i:02d}" for i in range(20)]
    edges = set()
    while len(edges) < 45:
        s, d = rng.sample(nodes, 2)
        edges.add((s, d))
    # E19 dangling (no out-edges): receives mass, contributes none
    edges = {(s, d) for (s, d) in edges if s != "E19"}
    edges.add(("E00", "E19"))
    canon = _canon(spark, [(s, "P", d, 1) for s, d in sorted(edges)])
    got = {
        r["entity"]: r["rank_q"]
        for r in kg.pagerank_quantized(canon, iterations=iterations).collect()
    }
    want = _pagerank_reference(
        sorted(edges), nodes, iterations, kg.PAGERANK_SCALE, kg.PAGERANK_DAMPING_NUM
    )
    # only nodes that appear in the canonical table exist in the KG
    want = {n: v for n, v in want.items() if n in got}
    assert got == want
    assert len(got) == 20


def test_pagerank_hub_outranks_leaf(spark):
    # star pointing at H: H's rank grows, leaves' ranks shrink to base+tail
    rows = [(f"L{i}", "P", "H", 1) for i in range(5)]
    got = {
        r["entity"]: r["rank_q"]
        for r in kg.pagerank_quantized(_canon(spark, rows), iterations=3).collect()
    }
    assert got["H"] > got["L0"]
    assert all(got[f"L{i}"] == got["L0"] for i in range(5))


def test_triangle_stats_hand_checked(spark):
    # K3 {A,B,C} + pendant D on A + isolated self-loop Q:
    #   A: 3 neighbors (B, C, D) -> 3 wedges, 1 triangle
    #   B, C: 2 neighbors -> 1 wedge, 1 triangle
    #   D: 1 neighbor -> 0 wedges, 0 triangles
    #   Q: isolated -> (0, 0, 0)
    canon = _canon(
        spark,
        [
            ("A", "P", "B", 1),
            ("B", "P", "C", 1),
            ("C", "P", "A", 1),  # direction must not matter
            ("A", "Q", "D", 1),
            ("B", "R", "A", 2),  # parallel reverse edge: still ONE undirected edge
            ("Q", "P", "Q", 1),
        ],
    )
    got = {r["entity"]: r.asDict() for r in kg.triangle_stats(canon).collect()}
    assert got["A"] == {"entity": "A", "n_neighbors": 3, "n_wedges": 3, "n_triangles": 1}
    assert got["B"] == {"entity": "B", "n_neighbors": 2, "n_wedges": 1, "n_triangles": 1}
    assert got["C"] == {"entity": "C", "n_neighbors": 2, "n_wedges": 1, "n_triangles": 1}
    assert got["D"] == {"entity": "D", "n_neighbors": 1, "n_wedges": 0, "n_triangles": 0}
    assert got["Q"] == {"entity": "Q", "n_neighbors": 0, "n_wedges": 0, "n_triangles": 0}
    assert len(got) == 5


def test_triangle_stats_matches_brute_force_on_random_graph(spark):
    # degree-ordered enumeration vs an O(n^3) brute force, on a graph
    # dense enough to contain hubs and many overlapping triangles
    rng = random.Random(7)
    nodes = [f"E{i:02d}" for i in range(16)]
    edges = set()
    while len(edges) < 50:
        s, d = rng.sample(nodes, 2)
        edges.add((s, d))
    und = {frozenset((s, d)) for s, d in edges}
    neigh = {n: set() for n in nodes}
    for e in und:
        a, b = sorted(e)
        neigh[a].add(b)
        neigh[b].add(a)
    tri = {n: 0 for n in nodes}
    for x in nodes:
        for y in neigh[x]:
            for z in neigh[x]:
                if y < z and z in neigh[y]:
                    tri[x] += 1
    canon = _canon(spark, [(s, "P", d, 1) for s, d in sorted(edges)])
    got = {r["entity"]: r.asDict() for r in kg.triangle_stats(canon).collect()}
    for n in nodes:
        if n not in got:  # node never appeared in an edge
            assert not neigh[n]
            continue
        d = len(neigh[n])
        assert got[n]["n_neighbors"] == d
        assert got[n]["n_wedges"] == d * (d - 1) // 2
        assert got[n]["n_triangles"] == tri[n]


# ------------------------------------------- incremental component merge

def _cc_map(df):
    return {r["entity"]: r["component"] for r in df.collect()}


def test_components_increment_hand_checked(spark):
    # base: islands {A,B,C} and {Y,Z}, isolated self-loop Q
    base = _canon(
        spark,
        [("B", "P", "A", 1), ("B", "P", "C", 1), ("Y", "P", "Z", 1), ("Q", "P", "Q", 1)],
    )
    mapping = kg.kg_components(base)
    # delta: bridges the two islands via a BRAND-NEW node M, adds a fresh
    # island {V, W}, and a new isolated self-loop entity R
    delta = _canon(
        spark,
        [("C", "P", "M", 1), ("M", "P", "Z", 1), ("V", "P", "W", 1), ("R", "P", "R", 1)],
    )
    got = _cc_map(kg.kg_components_increment(mapping, delta))
    assert got == {
        "A": "A", "B": "A", "C": "A", "M": "A", "Y": "A", "Z": "A",
        "V": "V", "W": "V", "Q": "Q", "R": "R",
    }


def test_components_increment_untouched_island_passes_through(spark):
    base = _canon(spark, [("B", "P", "A", 1), ("Y", "P", "Z", 1)])
    mapping = kg.kg_components(base)
    delta = _canon(spark, [("Z", "P", "Y", 2)])  # touches island 2 only
    got = _cc_map(kg.kg_components_increment(mapping, delta))
    assert got == {"A": "A", "B": "A", "Y": "Y", "Z": "Y"}


@given(st.data())
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_components_increment_fold_equals_full_recompute(spark, data):
    # K-way fold over arbitrary batch assignments of a random edge set
    # (incl. self-loops → isolated entities, empty batches, brand-new
    # nodes per batch) ≡ kg_components over the union — the same
    # adversarial-split contract the canonical MERGE carries
    # (tests/test_canonicalize.py), on the graph side.
    k = data.draw(st.integers(min_value=1, max_value=4))
    nodes = [f"N{i}" for i in range(8)]
    edges = data.draw(
        st.lists(
            st.tuples(st.sampled_from(nodes), st.sampled_from(nodes)),
            min_size=0,
            max_size=14,
        )
    )
    batches = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=k - 1),
            min_size=len(edges),
            max_size=len(edges),
        )
    )
    schema = "subj_canonical string, pred string, obj_canonical string, n_support long"

    def canon(rows):
        return spark.createDataFrame(rows, schema)

    per_batch = [
        canon([(s, "P", o, 1) for (s, o), b in zip(edges, batches) if b == i])
        for i in range(k)
    ]
    mapping = kg.kg_components(per_batch[0])
    for b in per_batch[1:]:
        mapping = kg.kg_components_increment(mapping, b)
    full = kg.kg_components(canon([(s, "P", o, 1) for s, o in edges]))
    assert _cc_map(mapping) == _cc_map(full)
