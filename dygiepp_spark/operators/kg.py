"""Knowledge-graph analytics over the canonical triple store.

North-star follow-through (BASELINE.json: "canonicalized via broadcast
alias dictionaries plus GraphFrames connected-components ... materialized
as deduplicated (subj, pred, obj) triples"): once the KG is materialized,
the first consumers are graph-shaped — component structure (is the graph
one blob or many islands?), degree/support profiles (hub detection,
skew-aware downstream planning), and centrality (entity ranking for
KG-grounded retrieval). These are the ops a 10^12-turn KG store needs on
day one, expressed Spark-first:

- ``degree_stats``: one union + one partial-agg shuffle; no joins.
- ``kg_components``: weakly-connected components via the alternating
  large-star/small-star algorithm (operators/graph.py) — O(log n)
  rounds of two shuffles each, the same public algorithm GraphFrames
  implements; this gates the generic ITERATIVE path cross-engine (the
  grouped union-find twin is gated via coref_clusters).
- ``pagerank_quantized``: fixed-iteration PageRank in scaled INTEGER
  arithmetic (the repo's standard trick for hash-exact cross-engine
  scores — see similarity.py's quantized cosine / integer k-means):
  rank ≡ bigint at scale 10^6, per-edge contribution = rank DIV
  out_degree, update = 0.15·S + (85·Σcontrib) DIV 100. Every operand is
  a non-negative BIGINT, so Spark's truncating ``div`` and DuckDB's
  floor ``//`` agree exactly and the driver's value hash matches.

Scale notes (100 TB): the canonical table is already deduplicated with
support counts, so |KG| ≪ |corpus|; every op here shuffles on entity
hash with map-side partial aggregation. PageRank's per-iteration shape
is the standard message-passing pair (join ranks→edges on src, partial
agg on dst); hub entities (high in-degree) are absorbed by the partial
agg — the sum is associative, so mappers pre-combine before the hub's
reducer sees anything. Dangling entities (no out-edges) contribute no
mass, the documented lost-mass simplification; their own rank still
updates from in-edges. Callers persist the canonical input once
(plans.cache.maybe_persist) so the extraction lineage never re-runs per
iteration — pinned in tests/test_plan_quality.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PAGERANK_SCALE = 1_000_000  # rank fixed-point scale (1.0 ≡ 10^6)
PAGERANK_DAMPING_NUM = 85  # damping 0.85 as the exact fraction 85/100


def kg_edges(canonical: DataFrame) -> DataFrame:
    """Distinct directed entity edges (src=subj, dst=obj); self-loops
    dropped (they are support-count artifacts, not graph structure)."""
    return (
        canonical.select(
            F.col("subj_canonical").alias("src"), F.col("obj_canonical").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def kg_nodes(canonical: DataFrame) -> DataFrame:
    """All entities appearing in the KG (either side, incl. pure
    self-loop entities that kg_edges drops)."""
    return (
        canonical.select(F.col("subj_canonical").alias("entity"))
        .unionByName(canonical.select(F.col("obj_canonical").alias("entity")))
        .distinct()
    )


def degree_stats(canonical: DataFrame) -> DataFrame:
    """Per-entity degree/support profile: out_degree = distinct
    (pred, obj) edges where the entity is subject (canonical rows are
    already distinct on the triple key, so a plain count is that),
    in_degree symmetric, total_support = triple support mass touching
    the entity (self-loops count on both sides, consistently in both
    engines). ONE union + ONE partial-agg shuffle on entity hash."""
    out_side = canonical.select(
        F.col("subj_canonical").alias("entity"),
        F.lit(1).alias("is_out"),
        F.lit(0).alias("is_in"),
        "n_support",
    )
    in_side = canonical.select(
        F.col("obj_canonical").alias("entity"),
        F.lit(0).alias("is_out"),
        F.lit(1).alias("is_in"),
        "n_support",
    )
    return (
        out_side.unionByName(in_side)
        .groupBy("entity")
        .agg(
            F.sum("is_out").cast("bigint").alias("out_degree"),
            F.sum("is_in").cast("bigint").alias("in_degree"),
            F.sum("n_support").cast("bigint").alias("total_support"),
        )
    )


def kg_components(canonical: DataFrame) -> DataFrame:
    """Weakly-connected components of the entity graph: (entity,
    component), component = lexicographic min entity in the component
    (ASCII ids → bytewise min agrees across engines). Iterative
    large/small-star CC (graph.py) on the edge set; entities with only
    self-loops are isolated → their own component."""
    from dygiepp_spark.operators import graph

    comp = graph.connected_components(kg_edges(canonical), src="src", dst="dst")
    return (
        kg_nodes(canonical)
        .join(comp, F.col("entity") == F.col("node"), "left")
        .select(
            "entity", F.coalesce(F.col("component"), F.col("entity")).alias("component")
        )
    )


def pagerank_quantized(
    canonical: DataFrame,
    iterations: int = 3,
    scale: int = PAGERANK_SCALE,
) -> DataFrame:
    """Fixed-``iterations`` PageRank over the entity graph in scaled
    integer arithmetic → (entity, rank_q BIGINT), hash-exact vs the
    DuckDB unrolled-CTE oracle (registry 'kg_pagerank').

    rank_0 = scale for every node; each iteration:
      contrib(dst) = Σ_{(src,dst)∈E} rank(src) DIV out_deg(src)
      rank(n)      = (15·scale) DIV 100 + (85·contrib(n)) DIV 100
    Dangling nodes contribute nothing (lost mass — documented, exact in
    both engines). All operands non-negative BIGINT: truncating DIV ==
    floor //. Overflow headroom: 85·contrib < 2^63 for in-degree·scale
    < 10^17 — at scale 10^6 that allows 10^11 in-edges per entity.

    Per-iteration plan: one join of the (node-sized) rank table to the
    edge list on src + one partial agg on dst + one left join back to
    nodes — the canonical message-passing shape. ``canonical`` should be
    persisted by the caller; edges/nodes/out-degrees are derived once
    here and reused by reference (same cached plan) each iteration."""
    edges = kg_edges(canonical)
    nodes = kg_nodes(canonical)
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    edge_deg = edges.join(out_deg, on="src")
    base = ((100 - PAGERANK_DAMPING_NUM) * scale) // 100
    ranks = nodes.select("entity", F.lit(scale).cast("bigint").alias("rank_q"))
    for _ in range(iterations):
        contrib = (
            edge_deg.join(ranks, edge_deg["src"] == ranks["entity"])
            .select(
                F.col("dst"), F.expr("rank_q div out_deg").alias("c")
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, F.col("entity") == F.col("dst"), "left")
            .select(
                "entity",
                (
                    F.lit(base)
                    + F.expr(
                        f"({PAGERANK_DAMPING_NUM} * coalesce(contrib, 0)) div 100"
                    )
                )
                .cast("bigint")
                .alias("rank_q"),
            )
        )
    return ranks
