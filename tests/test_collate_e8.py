"""B6/B7 collate-uncollate roundtrip + E8 prediction merge
(reference: collate_test.py:57-106 roundtrip; dygie.py:289-334 merge)."""

import json

from pyspark.sql import functions as F

from dygiepp_spark.operators import extract
from dygiepp_spark.operators.collate import collate, uncollate
from dygiepp_spark.sources.jsonl import predictions_to_doc_json
from dygiepp_spark.synth import synth_turns


def test_collate_uncollate_roundtrip(spark):
    turns = synth_turns(spark, n_convs=15, seed=6)
    col = collate(turns, max_sentences_per_doc=4)
    # pseudo-docs are length-homogeneous and ≤ 4 sentences
    stats = col.groupBy("pseudo_doc_key").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("n_tokens").alias("n_lens"),
    )
    assert stats.where("n > 4 OR n_lens > 1").count() == 0
    # roundtrip restores the corpus exactly (invariant 4, FIXTURES.md §5)
    back = uncollate(col)
    assert back.where("NOT is_dense").count() == 0
    orig = {(r["conv_id"], r["turn_idx"]): r["text"] for r in turns.collect()}
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in back.collect()}
    assert got == orig


def test_prediction_merge_reference_format(tiny_turns, spark):
    """E8 — merged JSON carries predicted_* with DOC-LEVEL offsets and
    4-decimal scores (doc/data.md:108-116)."""
    mentions = extract.ner_mentions(tiny_turns)
    triples = extract.relation_triples(tiny_turns)
    out = predictions_to_doc_json(tiny_turns, mentions, triples)
    docs = {r["conv_id"]: json.loads(r["json"]) for r in out.collect()}
    a = docs["A"]
    assert [len(s) for s in a["sentences"]] == [7, 9, 2]
    # turn 1 starts at doc offset 7; mention "big table" (2,3) → (9,10)
    ner_t1 = a["predicted_ner"][1]
    assert [9, 10] in [m[:2] for m in ner_t1]
    # entries are TYPED per the reference format: [int, int, str, float, float]
    for sent in a["predicted_ner"]:
        for m in sent:
            assert isinstance(m[0], int) and isinstance(m[2], str)
            assert isinstance(m[3], float) and isinstance(m[4], float)
    # entries sort in numeric span order, not lexicographic
    for sent in a["predicted_ner"]:
        assert [m[:2] for m in sent] == sorted(m[:2] for m in sent)
    # relations on turn 0: customer(1) JOIN order(5) at doc level
    rel_t0 = a["predicted_relations"][0]
    assert any(r[:5] == [1, 1, 5, 5, "JOIN"] for r in rel_t0)
    # turn with no predictions yields empty lists, not nulls
    assert a["predicted_ner"][2] == [[16, 16, "ACTOR", 1.6875, 0.8438]]
    b = docs["B"]
    assert b["predicted_relations"] == [[], []]


def test_prediction_merge_events_and_meta(tiny_turns, spark):
    """predicted_events per doc/data.md:108-116 ([[trig, type, logit,
    softmax], [as, ae, role, logit, softmax], ...]) plus weight and
    _-prefixed metadata passthrough (document.py:155, 160-173)."""
    triggers = extract.event_triggers(tiny_turns)
    args = extract.event_arguments(tiny_turns)
    meta = spark.createDataFrame(
        [("A", 0.5, {"_idx": "[0,1]", "_note": "hi"})],
        "doc_key string, weight double, _meta map<string,string>",
    )
    out = predictions_to_doc_json(
        tiny_turns, triggers=triggers, arguments=args, docs_meta=meta
    )
    docs = {r["conv_id"]: json.loads(r["json"]) for r in out.collect()}
    a = docs["A"]
    assert a["weight"] == 0.5
    assert a["_idx"] == [0, 1] and a["_note"] == "hi"  # typed re-emission
    evs = [e for sent in a["predicted_events"] for e in sent]
    assert evs, "tiny_turns has predicate tokens, events must decode"
    for ev in evs:
        trig = ev[0]
        assert isinstance(trig[0], int) and isinstance(trig[1], str)
        assert isinstance(trig[2], float) and isinstance(trig[3], float)
        for arg in ev[1:]:
            assert isinstance(arg[0], int) and isinstance(arg[2], str)
    # docs without meta row: no weight/_ fields emitted
    assert "weight" not in docs["B"] and "_idx" not in docs["B"]


def test_collate_span_budget_property(spark):
    """Reference cost model (collate.py:33-40): no pseudo-doc may exceed
    n_sents × longest_len² = max_spans_per_doc, while the sentence cap
    still holds and the corpus round-trips."""
    turns = synth_turns(spark, n_convs=20, seed=13)
    budget = 800
    col = collate(turns, max_sentences_per_doc=16, max_spans_per_doc=budget)
    stats = col.groupBy("pseudo_doc_key").agg(
        F.count(F.lit(1)).alias("n_sents"),
        F.max("n_tokens").alias("longest"),
    )
    over = stats.where(
        (F.col("n_sents") * F.col("longest") * F.col("longest") > budget)
        & (F.col("n_sents") > 1)  # a single over-budget sentence is unavoidable
    )
    assert over.count() == 0
    assert stats.where("n_sents > 16").count() == 0
    # budget actually binds on this corpus (some group capped below 16)
    assert stats.where("n_sents < 16").count() > 0
    back = uncollate(col)
    assert back.count() == turns.count()
    assert back.where("NOT is_dense").count() == 0


def test_predicted_clusters_roundtrip(spark, tmp_path):
    """E8 — predicted_clusters written by the prediction merge must parse
    back (via the gold-side located-members reader) to the exact cluster
    memberships the E4 operator produced (reference merge
    dygie/models/dygie.py:289-317 writes doc-level [[s,e],...] clusters)."""
    from dygiepp_spark.operators import coref
    from dygiepp_spark.sources.jsonl import (
        predicted_clusters_from_docs,
        read_jsonl_docs,
    )

    turns = synth_turns(spark, n_convs=8, seed=7)
    clusters = coref.clusters_via_components(turns)
    assert clusters.count() > 0
    out = predictions_to_doc_json(turns, clusters=clusters)
    p = tmp_path / "preds.jsonl"
    p.write_text("\n".join(r["json"] for r in out.collect()) + "\n")
    back = predicted_clusters_from_docs(read_jsonl_docs(spark, str(p)))

    def membership(df):
        by: dict = {}
        for r in df.collect():
            by.setdefault((r["conv_id"], r["cluster_id"]), set()).add(
                (r["turn_idx"], r["start"], r["end"])
            )
        return {(conv, frozenset(v)) for (conv, _), v in by.items()}

    assert membership(back) == membership(
        clusters.select("conv_id", "cluster_id", "turn_idx", "start", "end")
    )
    # a doc with zero clusters still emits the key as [] (reference shape)
    import json as _json

    for r in out.collect():
        assert "predicted_clusters" in _json.loads(r["json"])


def test_prediction_merge_clusters_weight_meta_compose(tiny_turns, spark):
    """predicted_clusters (head struct) + per-sentence predicted_* + weight
    + _-metadata splices must compose into ONE valid JSON object — the
    head/parts/meta concatenation is textual, so pin every-feature-on."""
    from dygiepp_spark.operators import coref
    from dygiepp_spark.sources.jsonl import predictions_to_doc_json

    mentions = extract.ner_mentions(tiny_turns)
    meta = spark.createDataFrame(
        [("A", 0.25, {"_src": "x"})],
        "doc_key string, weight double, _meta map<string,string>",
    )
    out = predictions_to_doc_json(
        tiny_turns,
        mentions=mentions,
        clusters=coref.clusters_via_components(tiny_turns),
        docs_meta=meta,
    )
    docs = {r["conv_id"]: json.loads(r["json"]) for r in out.collect()}
    a = docs["A"]
    assert isinstance(a["predicted_clusters"], list)
    assert a["weight"] == 0.25 and a["_src"] == "x"
    assert a["predicted_ner"], "mentions present"
    for conv, d in docs.items():
        assert d["doc_key"] == conv  # every line parsed cleanly
