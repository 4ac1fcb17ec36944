"""Coref clustering: golden clusters + greedy ≡ connected-components
equivalence (SURVEY.md §7 hard-part 3; reference greedy walk
dygie/models/coref.py:387-459)."""

from pyspark.sql import functions as F

from dygiepp_spark.operators import coref
from dygiepp_spark.operators.graph import connected_components


def _cluster_sets(df):
    rows = df.groupBy("conv_id", "cluster_id").agg(
        F.sort_array(F.collect_list("doc_pos")).alias("members")
    ).collect()
    return {(r["conv_id"], tuple(r["members"])) for r in rows}


def test_clusters_golden(tiny_turns):
    cc = coref.clusters_via_components(tiny_turns)
    got = _cluster_sets(cc)
    # customer: doc_pos 1 (t0) and 16 (t2); table: 6 (t0) and 10 (t1 pos 3)
    assert got == {("A", (1, 16)), ("A", (6, 10))}
    # cluster_id is the min member position
    ids = {r["cluster_id"] for r in cc.collect()}
    assert ids == {1, 6}


def test_greedy_equals_components(tiny_turns):
    cc = _cluster_sets(coref.clusters_via_components(tiny_turns))
    greedy = _cluster_sets(coref.clusters_via_greedy(tiny_turns))
    assert cc == greedy


def test_greedy_equals_components_chain(spark):
    """Chained mentions across many turns: transitivity must hold."""
    rows = [("C", i, "u", "customer data", None) for i in range(6)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    cc = _cluster_sets(coref.clusters_via_components(df))
    greedy = _cluster_sets(coref.clusters_via_greedy(df))
    assert cc == greedy
    # one chain per surface: customer at 0,2,4,...; data at 1,3,5,...
    assert cc == {("C", (0, 2, 4, 6, 8, 10)), ("C", (1, 3, 5, 7, 9, 11))}


def test_connected_components_generic(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "src string, dst string"
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comp == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
