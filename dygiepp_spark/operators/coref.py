"""Within-document coreference: antecedent decode + cluster formation
(SURVEY.md §2 D7-D10, E3-E4).

Rule model (stand-in for the learned antecedent scorer): a mention's
antecedent is the nearest PREVIOUS mention with the same surface form in
the same conversation. Like the reference decode (coref.py:332-342) each
mention selects at most one antecedent, so the edge set is a forest and
greedy cluster formation (coref.py:387-459) equals connected components —
the equivalence is pinned by a pytest.

Coordinates: mentions are flattened to doc-level positions via the B1
sentence offsets (reference coref.py:671-689 flattens with cumsum_shifted).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

from dygiepp_spark.operators.assembly import with_sentence_starts
from dygiepp_spark.operators.extract import ner_mentions

# node ids are conv-local strings "conv_id#<zero-padded doc position>" so
# lexicographic min == positional min and components never cross convs.
_POS_PAD = 9


def _node_id(conv, doc_pos):
    return F.concat_ws("#", conv, F.lpad(doc_pos.cast("string"), _POS_PAD, "0"))


def coref_mentions(turns: DataFrame) -> DataFrame:
    """Single-token entity mentions with doc-level positions (D7)."""
    m = ner_mentions(turns, include_modifier_spans=False)
    starts = with_sentence_starts(turns).select("conv_id", "turn_idx", "sentence_start")
    return m.join(starts, on=["conv_id", "turn_idx"]).withColumn(
        "doc_pos", (F.col("sentence_start") + F.col("start")).cast("bigint")
    )


def antecedent_edges(mentions: DataFrame, max_gap: int | None = None) -> DataFrame:
    """E3 stand-in decode — one edge per mention to its nearest previous
    same-surface mention (NULL-antecedent mentions emit no edge).
    `max_gap` bounds the doc-position distance, the analogue of the
    reference's max_antecedents window (coref.py:471-526)."""
    w = Window.partitionBy("conv_id", "surface").orderBy("doc_pos")
    e = (
        mentions.withColumn("ant_doc_pos", F.lag("doc_pos").over(w))
        .where(F.col("ant_doc_pos").isNotNull())
    )
    if max_gap is not None:
        e = e.where(F.col("doc_pos") - F.col("ant_doc_pos") <= max_gap)
    return e.select("conv_id", "doc_pos", "ant_doc_pos")


def clusters_via_components(
    turns: DataFrame,
    max_gap: int | None = None,
    global_cc: bool = False,
    persist_mentions: bool = True,
) -> DataFrame:
    """E4 — cluster formation as distributed connected components.

    Coref graphs never cross conversations, so this uses the grouped CC
    (one shuffle, per-conversation union-find) rather than the iterative
    global algorithm — at any corpus size the cost is one hash shuffle of
    the edge list. Returns (conv_id, cluster_id, turn_idx, start, end,
    surface); cluster_id = min doc-position member; singleton mentions drop
    (reference clusters have ≥2 members).

    `global_cc=True` switches to the iterative large/small-star algorithm
    instead of per-conversation union-find — the escape hatch for corpora
    whose largest conversation outgrows a single task (the grouped path
    holds one conversation's mention graph in one Python worker; at ~10^7+
    mentions per conversation prefer the global path, whose per-round
    shuffles have no per-conversation hotspot). Both paths are pinned equal
    by pytest.

    The grouped path is FUSED (r7 optimization): the old plan ran the
    mention pipeline (lead window + offsets join), persisted it, derived
    antecedent edges with a second window, shipped edges to a per-conv
    union-find, and joined components back to the persisted mentions —
    6 shuffles + a materialization job. But edge derivation (nearest
    previous same-surface mention) and the membership join are both
    conversation-local, so one groupBy(conv) Python pass does all three:
    the plan is now ONE window shuffle (doc offsets, whose hash(conv)
    partitioning the groupBy reuses — no second exchange) + the Python
    stage. `persist_mentions` is accepted for API compatibility; the fused
    plan has no multi-branch reuse to persist."""
    if global_cc:
        from dygiepp_spark.operators.graph import connected_components

        mentions = coref_mentions(turns)
        if persist_mentions:
            # mentions feed BOTH the edge derivation and the final component
            # join — without a persist the extraction pipeline runs twice
            # (spill-safe; one row per entity token). Registered with
            # plans.cache so long-lived sessions can release it.
            from pyspark import StorageLevel

            from dygiepp_spark.plans import cache

            mentions = cache.track(mentions.persist(StorageLevel.MEMORY_AND_DISK))
        edges = antecedent_edges(mentions, max_gap=max_gap)
        e = edges.select(
            _node_id(F.col("conv_id"), F.col("doc_pos")).alias("src"),
            _node_id(F.col("conv_id"), F.col("ant_doc_pos")).alias("dst"),
        )
        comp = (
            mentions.withColumn("node", _node_id(F.col("conv_id"), F.col("doc_pos")))
            .join(connected_components(e, "src", "dst"), on="node", how="inner")
            .select(
                "conv_id",
                "doc_pos",
                F.split(F.col("component"), "#")[1].cast("bigint").alias("cluster_id"),
            )
        )
        return mentions.join(comp, on=["conv_id", "doc_pos"], how="inner").select(
            "conv_id", "cluster_id", "turn_idx", "start", "end", "surface", "doc_pos"
        )

    from dygiepp_spark.functions.lexicons import ENTITY_TYPES

    # r7 second fusion step: the previous fused plan still computed the
    # per-turn offsets window and the mention explode as JVM expressions —
    # and Catalyst evaluates the interpreted HOF mention filter in the
    # map-side project BELOW the window exchange (measured 14.2 s of
    # executor CPU at sf0.1 — the 17-branch label CASE per token again).
    # But offsets (a cumsum over turn_idx order), mention extraction (a
    # dictionary lookup per token), edge derivation, and union-find are ALL
    # conversation-local, so the ONE groupBy(conv) Python pass now does all
    # four directly from raw (conv_id, turn_idx, text): the plan is one
    # hash(conv) exchange carrying the text it would have carried into the
    # window anyway, and zero interpreted expression evaluation. Rows are
    # identical: dict lookup ≡ the label CASE (parity-pinned for the
    # kernels in test_extract), Python cumsum ≡ the rowsBetween(-∞,-1)
    # window (with size(split(NULL))'s NULL contributing 0), and the
    # union-find/lag logic is byte-for-byte the previous kernel's.
    gap = max_gap
    ent_set = frozenset(ENTITY_TYPES)

    def _fused(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx")
        conv_ids, turn_idxs, starts, surfaces, doc_positions = [], [], [], [], []
        offset = 0
        for conv, turn, text in zip(
            pdf["conv_id"].tolist(), pdf["turn_idx"].tolist(), pdf["text"].tolist()
        ):
            if text is None:
                continue  # size(split(NULL)) is NULL: the window sum skips it
            toks = text.split(" ")
            for i, tk in enumerate(toks):
                if tk in ent_set:
                    conv_ids.append(conv)
                    turn_idxs.append(turn)
                    starts.append(i)
                    surfaces.append(tk)
                    doc_positions.append(offset + i)
            offset += len(toks)

        parent: dict = {}

        def find(x):
            root = x
            while parent.setdefault(root, root) != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        last: dict = {}  # surface -> previous mention doc_pos (lag semantics)
        for dp, surf in zip(doc_positions, surfaces):
            ant = last.get(surf)
            if ant is not None and (gap is None or dp - ant <= gap):
                ra, rb = find(dp), find(ant)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            last[surf] = dp
        cols = ["conv_id", "cluster_id", "turn_idx", "start", "end", "surface", "doc_pos"]
        if not parent:
            return pd.DataFrame({c: [] for c in cols})
        comp = {n: find(n) for n in parent}
        out = {c: [] for c in cols}
        for conv, turn, s, surf, dp in zip(
            conv_ids, turn_idxs, starts, surfaces, doc_positions
        ):
            root = comp.get(dp)
            if root is None:  # singleton: no edge ever touched it
                continue
            out["conv_id"].append(conv)
            out["cluster_id"].append(root)
            out["turn_idx"].append(turn)
            out["start"].append(s)
            out["end"].append(s)
            out["surface"].append(surf)
            out["doc_pos"].append(dp)
        return pd.DataFrame(out)

    return turns.select("conv_id", "turn_idx", "text").groupBy("conv_id").applyInPandas(
        _fused,
        schema=(
            "conv_id string, cluster_id long, turn_idx int, start int, end int, "
            "surface string, doc_pos long"
        ),
    )


def propagate_scores(
    mentions: DataFrame, edges: DataFrame, iterations: int = 1
) -> DataFrame:
    """D10 — coref propagation: iteratively blend each mention's score with
    its antecedent's (reference coref.py:114-157: gated update
    f·span + (1−f)·entity, `coref_prop` iterations from config; the
    lightweight configs set 0 and skip it, README.md:321-323).

    Stand-in update with gate f = 1/2: score ← (score + antecedent_score)/2
    (dyadic, so bitwise-stable). Each iteration is one self-join on the
    antecedent edge list — the distributed analogue of the reference's
    in-tensor attention pass; iteration count is a config constant, so the
    plan depth is bounded."""
    out = mentions
    for _ in range(iterations):
        ant = out.select(
            "conv_id",
            F.col("doc_pos").alias("ant_doc_pos"),
            F.col("raw_score").alias("_ant_score"),
        )
        out = (
            out.join(edges, on=["conv_id", "doc_pos"], how="left")
            .join(ant, on=["conv_id", "ant_doc_pos"], how="left")
            .withColumn(
                "raw_score",
                F.when(
                    F.col("_ant_score").isNotNull(),
                    (F.col("raw_score") + F.col("_ant_score")) / 2,
                ).otherwise(F.col("raw_score")),
            )
            .drop("ant_doc_pos", "_ant_score")
        )
    return out


def clusters_via_greedy(turns: DataFrame) -> DataFrame:
    """E4 twin — the reference's sequential greedy walk, per conversation,
    inside applyInPandas (document-at-a-time exactly like the reference;
    used to prove CC equivalence, SURVEY.md §7 hard-part 3)."""
    mentions = coref_mentions(turns)
    edges = antecedent_edges(mentions).withColumnRenamed("doc_pos", "m_doc_pos")

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("m_doc_pos")
        cluster_of: dict[int, int] = {}
        for m, a in zip(pdf["m_doc_pos"], pdf["ant_doc_pos"]):
            # greedy: antecedent already clustered → join; else new cluster
            cid = cluster_of.get(a)
            if cid is None:
                cid = a
                cluster_of[a] = cid
            cluster_of[m] = cid
        out = pd.DataFrame(
            {"doc_pos": list(cluster_of.keys()), "cluster_id": list(cluster_of.values())}
        )
        out["conv_id"] = pdf["conv_id"].iloc[0]
        return out[["conv_id", "doc_pos", "cluster_id"]]

    assigned = edges.groupBy("conv_id").applyInPandas(
        walk, schema="conv_id string, doc_pos long, cluster_id long"
    )
    return mentions.join(assigned, on=["conv_id", "doc_pos"], how="inner").select(
        "conv_id", "cluster_id", "turn_idx", "start", "end", "surface", "doc_pos"
    )
