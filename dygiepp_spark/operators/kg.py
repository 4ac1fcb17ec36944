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


def kg_components(
    canonical: DataFrame, single_task_max_edges: int = 4_000_000
) -> DataFrame:
    """Weakly-connected components of the entity graph: (entity,
    component), component = lexicographic min entity in the component
    (ASCII ids → bytewise min agrees across engines). Entities with only
    self-loops are isolated → their own component.

    Physical strategy is size-gated (graph.connected_components): entity
    graphs are vocabulary-bounded (≪ corpus), so most KGs fit the
    one-shuffle single-task union-find — default threshold 4M edges
    (~hundreds of MB in one task); larger stores run the iterative
    large/small-star rounds. Pass 0 to force the iterative engine (the
    registry's kg_components gate does, so the iterative path stays
    cross-engine-gated; the union-find path is gated via
    kg_components_increment and coref_clusters)."""
    from dygiepp_spark.operators import graph

    comp = graph.connected_components(
        kg_edges(canonical),
        src="src",
        dst="dst",
        single_task_max_edges=single_task_max_edges,
    )
    return (
        kg_nodes(canonical)
        .join(comp, F.col("entity") == F.col("node"), "left")
        .select(
            "entity", F.coalesce(F.col("component"), F.col("entity")).alias("component")
        )
    )


def kg_components_increment(
    mapping: DataFrame, new_canonical: DataFrame
) -> DataFrame:
    """Fold a new canonical-triple batch into an existing (entity,
    component) mapping — incremental component maintenance for daily
    ingest over the accumulated KG store (the graph counterpart of the
    canonical-store MERGE). Result ≡ ``kg_components`` over the union of
    all batches (gated cross-engine against the exact reachability
    oracle in the registry; K-way fold property pinned in
    tests/test_kg.py).

    Scale: graph.merge_components touches only delta-affected components
    (broadcast anti-join pass-through for the rest). The isolated-entity
    top-up first drops the delta's own edge nodes (broadcast anti-join,
    delta-sized both sides), then anti-joins the survivors against the
    mapping — delta-sized left vs the store; at 10^12-turn scale the
    store is bucketed by entity, so that exchange is one-sided."""
    from dygiepp_spark.operators import graph

    delta_edges = kg_edges(new_canonical)
    merged = graph.merge_components(
        mapping.select(F.col("entity").alias("node"), "component"),
        delta_edges,
    ).select(F.col("node").alias("entity"), "component")
    # entities introduced by this batch with no (non-self-loop) edge:
    # absent from the delta's edge-node set AND from the old mapping
    # (merge_components already covers everything else) → own component
    edge_nodes = (
        delta_edges.select(F.col("src").alias("entity"))
        .unionByName(delta_edges.select(F.col("dst").alias("entity")))
        .distinct()
    )
    # (r7 note: a variant that semi-filtered the mapping by the batch's
    # node set and broadcast that delta-sized result was A/B-measured
    # ~40% SLOWER at the 2M-edge anchor — the extra broadcast-build job
    # sits on the critical path — so the direct anti join stays; at
    # store scale it degrades to the one-sided exchange documented above.)
    isolated = (
        kg_nodes(new_canonical)
        .join(F.broadcast(edge_nodes), "entity", "left_anti")
        .join(mapping.select("entity"), "entity", "left_anti")
        .select("entity", F.col("entity").alias("component"))
    )
    return merged.unionByName(isolated)


def triangle_stats(
    canonical: DataFrame,
    persist: bool | str = "auto",
    decide_on: DataFrame | None = None,
) -> DataFrame:
    """Per-entity triangle/wedge profile of the undirected entity graph:
    (entity, n_neighbors, n_wedges, n_triangles) — the integer
    ingredients of the local clustering coefficient
    (n_triangles / n_wedges), kept as exact BIGINTs so the cross-engine
    hash gate applies (registry 'kg_triangles'; the float ratio is a
    trivial client-side division).

    Spark plan is DEGREE-ORDERED triangle enumeration: every undirected
    edge is oriented from its lower- to its higher-(degree, id) endpoint,
    wedges are enumerated only at each triangle's minimum vertex, and a
    single equi-join against the oriented edge set closes them. The
    orientation bounds every node's out-neighborhood by O(√m), so wedge
    fan-out cannot blow up on hub entities — the standard m^{3/2}
    triangle bound — where naive id-ordering would square the hub
    degree. The DuckDB oracle enumerates the same triangles by plain id
    ordering (exact at oracle scale), so the gate cross-checks the
    optimized enumeration against the naive one, not merely Spark
    against Spark.

    Shuffle shape: one partial-agg shuffle for degrees, two broadcast-or
    -shuffle hash joins to attach orientation keys, one self-join on the
    wedge apex, one closing equi-join on (v, w), one credit explode +
    partial agg. No cartesian products; every join key is an entity
    hash. Self-loops are dropped by kg_edges; isolated entities report
    (0, 0, 0).

    The oriented edge table feeds THREE branches (both wedge sides and
    the closing join) and its lineage (distinct + degree agg + two
    orientation joins) is the expensive part, so it is persisted
    adaptively (``persist="auto"`` → plans.cache.maybe_persist on
    ``decide_on`` or ``canonical``) — at KG scale this is the difference
    between building the oriented edge set once and three times."""
    from dygiepp_spark.plans import cache as _cache
    und = (
        kg_edges(canonical)
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("entity"))
        .unionByName(und.select(F.col("b").alias("entity")))
        .groupBy("entity")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_neighbors"))
    )
    # total-order key (degree, id) as one sortable string: degree
    # zero-padded to 12 digits (10^12 neighbors is beyond any entity
    # vocabulary) + entity id as tie-break — bytewise comparison agrees
    # across engines on ASCII ids.
    ordk = deg.select(
        "entity",
        F.concat(
            F.lpad(F.col("n_neighbors").cast("string"), 12, "0"), F.col("entity")
        ).alias("ordk"),
    )
    lo_hi = (
        und.join(ordk.select(F.col("entity").alias("a"), F.col("ordk").alias("ord_a")), "a")
        .join(ordk.select(F.col("entity").alias("b"), F.col("ordk").alias("ord_b")), "b")
        .select(
            F.when(F.col("ord_a") < F.col("ord_b"), F.col("a"))
            .otherwise(F.col("b"))
            .alias("lo"),
            F.when(F.col("ord_a") < F.col("ord_b"), F.col("b"))
            .otherwise(F.col("a"))
            .alias("hi"),
            F.greatest("ord_a", "ord_b").alias("ord_hi"),
        )
    )
    lo_hi = _cache.maybe_persist(
        lo_hi, decide_on=decide_on if decide_on is not None else canonical,
        persist=persist,
    )
    e1 = lo_hi.select(
        F.col("lo").alias("u"), F.col("hi").alias("v"), F.col("ord_hi").alias("ord_v")
    )
    e2 = lo_hi.select(
        F.col("lo").alias("u"), F.col("hi").alias("w"), F.col("ord_hi").alias("ord_w")
    )
    wedges = (
        e1.join(e2, "u").where(F.col("ord_v") < F.col("ord_w")).select("u", "v", "w")
    )
    closing = lo_hi.select(F.col("lo").alias("v"), F.col("hi").alias("w"))
    tris = wedges.join(closing, ["v", "w"])  # each triangle exactly once
    credit = (
        tris.select(F.explode(F.array("u", "v", "w")).alias("entity"))
        .groupBy("entity")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return (
        kg_nodes(canonical)
        .join(deg, "entity", "left")
        .join(credit, "entity", "left")
        .select(
            "entity",
            F.coalesce("n_neighbors", F.lit(0)).cast("bigint").alias("n_neighbors"),
            F.expr(
                "coalesce(n_neighbors, 0) * (coalesce(n_neighbors, 0) - 1) div 2"
            )
            .cast("bigint")
            .alias("n_wedges"),
            F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles"),
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
