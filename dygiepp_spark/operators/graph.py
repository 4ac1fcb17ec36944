"""Distributed connected components over an edge DataFrame.

Used for coreference cluster formation (E4) and cross-mention
canonicalization (coref ∪ alias edges). The reference forms clusters by a
sequential greedy walk (reference: dygie/models/coref.py:387-459); because
every span emits at most one antecedent edge the edge set is a forest, and
connected components produce exactly the greedy clusters — order-independent
(equivalence pinned by a pytest).

Algorithm: iterative hash-to-min label propagation. Each node starts with
label = its own id; every round each node takes the min label in its closed
neighborhood; converges in O(diameter) rounds. Each round is one
groupBy-shuffle on node id; lineage is cut per-round with localCheckpoint so
plans stay bounded at 10^12-edge scale (no GraphFrames dependency — this is
plain DataFrame ops and ships with --py-files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Return (node, component) with component = min node id in the component.

    `edges` must have two long-typed columns `src`, `dst`. Isolated nodes
    are callers' responsibility (left-join the result and coalesce to self).
    """
    # undirected closure + self-loops so every node appears as a key
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    nodes = sym.select(F.col("u").alias("node")).distinct()
    labels = nodes.withColumn("label", F.col("node"))

    for _ in range(max_iter):
        # min label over closed neighborhood
        neighbor_labels = (
            sym.join(labels, sym["v"] == labels["node"], "inner")
            .select(F.col("u").alias("node"), F.col("label"))
        )
        new_labels = (
            labels.select("node", "label")
            .unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=True)

        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))
