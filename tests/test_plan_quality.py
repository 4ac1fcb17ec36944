"""Physical-plan regression tests: pin the scale properties the operators
were designed for (column pruning, broadcast dictionary joins, zero-shuffle
stateless heads). A refactor that silently reintroduces a shuffle or a
full-width scan fails here, not in production."""

import pytest

from dygiepp_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name].build(spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def _key_shuffles(plan: str) -> list[str]:
    """Exchange nodes that move data BY KEY (hash/range partitioning).
    Round-robin exchanges are excluded: the only one the engine emits is
    the r7 scale-adaptive scan-parallelism floor (tables.load_table), which
    exists only when the planned scan parallelism is below the session
    default — a deliberate fan-out of tiny single-row-group inputs, not a
    reintroduced keyed shuffle (at production scan sizes it is absent)."""
    import re

    lines = plan.splitlines()
    ids = []
    for line in lines:
        m = re.match(r"^\((\d+)\) Exchange", line.strip())
        if m and m.group(1) not in ids:
            ids.append(m.group(1))
    out = []
    for node_id in ids:
        # detail block starts at "(id) Exchange" in the details section;
        # find its Arguments line
        for i, line in enumerate(lines):
            if line.strip() == f"({node_id}) Exchange":
                for d in lines[i + 1 : i + 6]:
                    if d.startswith("Arguments:"):
                        if "roundrobin" not in d.lower():
                            out.append(d.strip())
                        break
    return out


def test_scans_are_column_pruned(spark):
    """Extraction reads only (doc_id, text) from the documents table."""
    plan = _plan(spark, "ner_mentions")
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "doc_id" in line and "text" in line
            assert "lang" not in line and "source" not in line and "n_chars" not in line


@pytest.mark.parametrize("name", ["relation_triples", "event_arguments", "ner_mentions"])
def test_stateless_heads_have_no_shuffle(spark, name):
    """The single-pass array formulation keeps the stateless extraction
    heads free of KEYED shuffles (r7: ner_mentions' lead() window was also
    rewritten to array algebra, so all three heads are pure maps; the only
    allowed exchange is the round-robin scan-parallelism floor, excluded
    by _key_shuffles)."""
    plan = _plan(spark, name)
    shuffles = _key_shuffles(plan)
    assert not shuffles, f"{name}: {shuffles}\n{plan[:2000]}"


def test_alias_link_is_broadcast(spark):
    """Entity linking must broadcast the alias dictionary, never shuffle
    the triple table."""
    plan = _plan(spark, "canonical_triples")
    assert "BroadcastHashJoin" in plan
    # the only keyed exchange is the final dedup aggregation
    shuffles = _key_shuffles(plan)
    assert len(shuffles) <= 2, shuffles  # pred tie-break window was removed; agg remains


def test_exact_dedup_single_shuffle(spark):
    plan = _plan(spark, "exact_dedup")
    shuffles = _key_shuffles(plan)
    assert len(shuffles) <= 1, shuffles


def test_ivf_topk_no_redundant_shuffle(spark):
    """(qid, nid) scored pairs are unique by construction (each corpus
    vector lives in exactly one inverted list), so the IVF plan must not
    contain a distinct/dedup aggregate over the scored pairs — only the
    assignment/probe windows and the final top-k window shuffle."""
    plan = _plan(spark, "embedding_ivf_topk")
    # a reintroduced .distinct() shows up as a HashAggregate on (qid, nid)
    bad = [
        line for line in plan.splitlines()
        if "HashAggregate" in line and "qid" in line and "nid" in line
    ]
    assert not bad, bad


def test_cosine_topk_broadcasts_queries(spark):
    """The bounded query side must broadcast; the corpus side must never
    shuffle before scoring (only the per-query top-k window exchanges)."""
    plan = _plan(spark, "embedding_cosine_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    shuffles = _key_shuffles(plan)
    assert len(shuffles) <= 1, shuffles


def test_near_dup_single_corpus_scan(spark):
    """The shingle table feeds 5 branches; the persisted pipeline must read
    the corpus ONCE and serve every branch from cache (was 8 full scans).
    Forced persist=True here: this pins the SCALE plan (the branch auto
    mode picks for any production-size input — see the auto tests below)."""
    from dygiepp_spark.operators import dedup
    from dygiepp_spark.plans import cache
    from dygiepp_spark.tables import load_table

    docs = load_table(spark, "documents", SF)
    with cache.scoped():  # don't leak the cache mark into later plan tests
        df = dedup.near_dup_pairs(docs, persist_shingles=True)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    scans = sum(
        1 for line in plan.splitlines()
        if "Scan parquet" in line and line.strip().startswith("(")
    )
    assert scans == 1, f"{scans} parquet scans\n"
    assert "InMemoryTableScan" in plan


def test_near_dup_auto_persist_decision(spark):
    """`persist_shingles="auto"` (the default) must pick the measured
    winner at each scale: no persist below the crossover (tiny parquet
    inputs, where the materialization job dominates — bench near_dup_small
    speedup 0.53×), persist above it (bench near_dup_big speedup 3.1×).
    The threshold itself is exercised by shrinking it rather than
    synthesizing a >4 MB corpus in the suite."""
    from dygiepp_spark.operators import dedup
    from dygiepp_spark.tables import load_table

    docs = load_table(spark, "documents", SF)
    choice, est = dedup.persist_decision(docs)
    assert est > 0  # parquet scans always carry a file-size estimate
    assert choice is False  # sf0.001 is far below the measured crossover
    # same estimate, production-side of the threshold → persist
    choice_big, est2 = dedup.persist_decision(docs, threshold_bytes=est)
    assert (choice_big, est2) == (True, est)
    # the default plan at tiny scale is the 8-scan no-persist plan: cheaper
    # end-to-end than materializing the cache (measured), and auto must
    # actually produce it
    plan = _plan(spark, "near_dup_pairs")
    assert "InMemoryTableScan" not in plan


def test_embedding_near_dup_single_corpus_scan(spark):
    """(id, q, |q|², bucket) is one projection persisted for both sides of
    the bucket self-join: exactly ONE parquet scan (the r3 lsh_buckets
    rewrite removed a self-join that multiplied scans to 12)."""
    plan = _plan(spark, "embedding_near_dup")
    scans = sum(
        1 for line in plan.splitlines()
        if "Scan parquet" in line and line.strip().startswith("(")
    )
    assert scans == 1, f"{scans} parquet scans"
    assert "InMemoryTableScan" in plan


def test_lsh_buckets_is_joinless_projection(spark):
    """Sign-LSH bucketing must be a pure projection — no join anywhere."""
    plan = _plan(spark, "embedding_lsh_buckets")
    assert "Join" not in plan


def test_ivf_single_corpus_scan(spark):
    """The quantized corpus and the final assignment persist (tracked), so
    the whole IVF pipeline — Lloyd iterations, seed centroids, probes,
    inverted-list join — reads the parquet ONCE (was 8 scans)."""
    plan = _plan(spark, "embedding_ivf_topk")
    scans = sum(
        1 for line in plan.splitlines()
        if "Scan parquet" in line and line.strip().startswith("(")
    )
    assert scans <= 1, f"{scans} parquet scans"
    assert "InMemoryTableScan" in plan


def test_ivf_fixed_single_scan_no_corpus_window(spark):
    """The fixed-centroid IVF must keep its two scale properties: ONE
    parquet scan (the quantized+dots projection persists for both the
    corpus and query branches), and NO per-vector window over the corpus —
    list assignment is a projection argmax, so the only window in the plan
    is the per-query top-k (partitioned by qid, bounded by n_queries)."""
    plan = _plan(spark, "embedding_ivf_fixed")
    scans = sum(
        1 for line in plan.splitlines()
        if "Scan parquet" in line and line.strip().startswith("(")
    )
    assert scans <= 1, f"{scans} parquet scans"
    assert "InMemoryTableScan" in plan
    import re

    # exactly the top-k Window; the k-means variant needs one per Lloyd
    # pass. WindowGroupLimit nodes are the rank<=k pushdown, not windows.
    windows = [
        l for l in plan.splitlines() if re.match(r"^\(\d+\) Window(Exec)?\s*$", l.strip())
    ]
    assert len(windows) <= 1, windows


def test_lang_id_two_pass_no_join(spark):
    """r7 plan: the profile pass collects the (bounded,
    n_langs × PROFILE_SIZE) profile dict to the driver and the scoring
    pass folds it into a scan-local kernel — so the FINAL plan is ONE
    corpus scan with NO join, NO window, and NO cached intermediate (the
    profile pass is a separate, already-executed job). The old plan's
    broadcast scoring join + per-doc ranking window are pinned out."""
    plan = _plan(spark, "lang_id_predict")
    scans = sum(
        1 for line in plan.splitlines()
        if "Scan parquet" in line and line.strip().startswith("(")
    )
    assert scans == 1, f"{scans} parquet scans"
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert "InMemoryTableScan" not in plan


def _count_scans(plan: str) -> int:
    return sum(
        1 for line in plan.splitlines()
        if "Scan parquet" in line and line.strip().startswith("(")
    )


def test_canonical_merge_increment_single_triples_materialization(spark):
    """SCALE regime (persist=True — what auto picks above the crossover):
    the incremental-merge query fans the extracted triples into two batch
    branches; the tracked persist must serve both from cache — at most
    the turns scan plus cache reads, never a re-extraction per branch
    (at 100 TB that would run the inference UDF twice)."""
    from dygiepp_spark import registry
    from dygiepp_spark.plans import cache

    with cache.scoped():
        df = registry.canonical_merge_increment(spark, SF, persist=True)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    assert _count_scans(plan) <= 1, plan
    assert "InMemoryTableScan" in plan


def test_canonical_merge_increment_auto_tiny_skips_persist(spark):
    """TINY regime (r5 VERDICT #4): at sf0.001 the auto decision must
    skip the materialization job — the plan recomputes the extraction
    per batch branch (2 turns scans, no cache), which is measurably
    cheaper below the crossover. The registry default is auto, so this
    pins what the driver's correctness run actually executes at small
    scale."""
    plan = _plan(spark, "canonical_merge_increment")
    assert "InMemoryTableScan" not in plan
    assert _count_scans(plan) == 2, plan


def test_coref_propagation_persist_regimes(spark):
    """Both regimes of the adaptive mention-table persist (r5 VERDICT
    #4): forced persist = the scale plan — the mention table serves the
    edge derivation and both propagation branches from cache, so the
    only parquet scans left are the ≤2 INSIDE the single cached
    coref_mentions lineage (materialized once; the mention builder
    itself reads turns twice, span path + pruning-window path). Auto at
    sf0.001 = the tiny-input no-persist plan: no cache, the full 6-scan
    recompute the r4 audit measured — cheaper than materialization below
    the crossover."""
    from dygiepp_spark import registry
    from dygiepp_spark.plans import cache

    with cache.scoped():
        df = registry.coref_propagation(spark, SF, persist=True)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    assert "InMemoryTableScan" in plan
    assert _count_scans(plan) <= 2, plan

    auto_plan = _plan(spark, "coref_propagation")
    assert "InMemoryTableScan" not in auto_plan
    assert _count_scans(auto_plan) == 6, auto_plan


def test_kg_family_persist_regimes(spark):
    """The KG-analytics family branches over the canonical triple store
    (degree: 2-way union; components: edges + nodes; pagerank: edges,
    out-degrees, nodes, and a rank join per iteration). SCALE regime
    (persist=True — what auto picks above the crossover): the tracked
    persist serves every branch from cache, so at most ONE parquet scan
    survives — re-running the extraction lineage once per branch (7+
    times for 3-iteration pagerank) is the 100 TB failure mode this
    pins out. TINY regime (registry default auto at sf0.001): no cache,
    recompute per branch — cheaper below the measured crossover."""
    from dygiepp_spark import registry
    from dygiepp_spark.operators import kg
    from dygiepp_spark.plans import cache

    with cache.scoped():
        canon = registry._kg_canonical(spark, SF, persist=True)
        plan = kg.pagerank_quantized(canon, iterations=3)._jdf.queryExecution(
        ).explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "InMemoryTableScan" in plan
        assert _count_scans(plan) <= 1, plan

    # auto at sf0.001: below the crossover -> no materialization job
    plan_auto = _plan(spark, "kg_degree_stats")
    assert "InMemoryTableScan" not in plan_auto


def test_kg_triangles_persist_regimes(spark):
    """triangle_stats' oriented edge table feeds three branches (two
    wedge sides + the closing join). SCALE regime (persist=True): the
    tracked lo_hi persist serves all three from cache — the plan keeps
    InMemoryTableScans and no parquet re-scan of the corpus beyond the
    (also cached) canonical input. TINY regime (auto at sf0.001): no
    cache anywhere — recompute beats materialization below the
    crossover."""
    from dygiepp_spark import registry
    from dygiepp_spark.operators import kg
    from dygiepp_spark.plans import cache

    with cache.scoped():
        canon = registry._kg_canonical(spark, SF, persist=True)
        plan = kg.triangle_stats(canon, persist=True)._jdf.queryExecution(
        ).explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "InMemoryTableScan" in plan
        assert _count_scans(plan) <= 1, plan

    plan_auto = _plan(spark, "kg_triangles")
    assert "InMemoryTableScan" not in plan_auto


def test_merge_components_untouched_passthrough_is_broadcast(spark):
    """Incremental CC maintenance must never shuffle the stored mapping
    for the untouched pass-through: the touched-component id set is
    delta-sized, so both the semi (touched) and anti (untouched) joins
    against the mapping must be broadcast hash joins. A refactor that
    degrades them to sort-merge would shuffle the full 10^12-scale store
    per daily fold."""
    from pyspark.sql import functions as F

    from dygiepp_spark.operators import graph

    mapping = spark.createDataFrame(
        [("A", "A"), ("B", "A"), ("Y", "Y"), ("Z", "Y")], "node string, component string"
    )
    delta = spark.createDataFrame([("Z", "Q")], "src string, dst string")
    out = graph.merge_components(mapping, delta)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # every join against the mapping must be a broadcast hash join (the
    # delta side is explicitly F.broadcast); the touched-id SEMI filter
    # moved into the r7 touched_ids localCheckpoint's own lineage (it is
    # the same broadcast-semi shape, just materialized once for its three
    # consumers), so the final plan shows the untouched ANTI pass-through
    # and the touched semi-join of the mapping
    node_joins = [
        line.strip()
        for line in plan.splitlines()
        if line.strip().startswith("(") and "Join" in line
    ]
    assert node_joins, plan
    for line in node_joins:
        assert "BroadcastHashJoin" in line, line + "\n" + plan[:3000]
    assert "LeftAnti" in plan, plan
    # and the mapping's columns are never exchanged by key — the only keyed
    # exchange allowed is the delta-sized union-find groupBy("group")
    bad = [s for s in _key_shuffles(plan) if "group" not in s]
    assert not bad, bad


def test_kg_components_increment_persist_regimes(spark):
    """SCALE regime (persist=True): both batch canonicalizations and the
    base mapping branch from ONE extraction — a single parquet scan,
    served from cache everywhere else (recomputing the inference lineage
    per branch is the failure mode the pin forbids). TINY regime (auto
    at sf0.001): no cache — recompute beats materialization below the
    measured crossover."""
    from dygiepp_spark import registry
    from dygiepp_spark.plans import cache

    def _scans(plan: str) -> int:
        return sum(
            1
            for line in plan.splitlines()
            if line.strip().startswith("(") and "Scan parquet" in line
        )

    def _explain(df) -> str:
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    with cache.scoped():
        plan = _explain(registry.kg_components_increment(spark, SF, persist=True))
        assert _scans(plan) <= 1, plan
        assert "InMemoryTableScan" in plan

    plan_auto = _explain(registry.kg_components_increment(spark, SF))
    assert "InMemoryTableScan" not in plan_auto
