"""A7 — brat standoff converter (reference scripts/new-dataset/
brat_to_input.py + annotated_doc.py): char→token alignment by exact
boundary, drop rules (disjoint, tokenization mismatch, cross-sentence),
Equiv→clusters, events with first-token triggers, and emission to
reference-format JSONL through annotations_to_doc_json."""

import json

import pytest

from pyspark.sql import functions as F

from dygiepp_spark.sources import brat, jsonl

TXT = "the customer joined the order table\nscan the big table now\n"
# char offsets:      4..12 customer, 24..29 order, 30..35 table(sent0)
# sent1 starts at 36: 36..40 scan-> 'scan'(36..40) 'the'(41..44) 'big'(45..48)
# 'table'(49..54) 'now'(55..58)
ANN = "\n".join(
    [
        "T1\tCustomer 4 12\tcustomer",
        "T2\tTable 24 35\torder table",
        "T3\tTable 49 54\ttable",
        "T4\tBad 5 12\tustomer",  # start not on a token boundary -> dropped
        "T5\tBad 4 12;24 29\tcustomer order",  # disjoint -> dropped
        "T6\tSpan 30 40\ttable scan",  # crosses the sentence break -> dropped
        "T7\tTrigger 13 19\tjoined",
        "R1\tUses Arg1:T1 Arg2:T2",
        "R2\tUses Arg1:T1 Arg2:T3",  # cross-sentence relation -> dropped
        "*\tEquiv T2 T3",
        "E1\tJoin:T7 Who:T1 What:T2",
        "E2\tJoin:T7 What:T6",  # arg unalignable -> whole event dropped
    ]
)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("brat")
    (d / "doc1.txt").write_text(TXT)
    (d / "doc1.ann").write_text(ANN + "\n")
    return brat.brat_gold(spark, str(d))


def test_turns_rebuild_text(corpus):
    rows = {r["turn_idx"]: r["text"] for r in corpus["turns"].collect()}
    assert rows[0] == "the customer joined the order table"
    assert rows[1] == "scan the big table now"


def test_entity_alignment_and_drops(corpus):
    ner = {
        (r["turn_idx"], r["start"], r["end"]): r["label"]
        for r in corpus["ner"].collect()
    }
    assert ner[(0, 1, 1)] == "Customer"
    assert ner[(0, 4, 5)] == "Table"  # 'order table' = tokens 4..5 inclusive
    assert ner[(1, 3, 3)] == "Table"
    assert ner[(0, 2, 2)] == "Trigger"
    assert len(ner) == 4
    dropped = {
        (r["kind"], r["drop_reason"]): r["n"] for r in corpus["dropped"].collect()
    }
    assert dropped == {
        ("entity", "tokenization_mismatch"): 1,  # T4
        ("entity", "disjoint"): 1,  # T5
        ("entity", "cross_sentence"): 1,  # T6
        ("relation", "cross_sentence"): 1,  # R2
        ("event", "bad_argument"): 1,  # E2 (arg T6 unalignable)
    }


def test_relations_within_sentence_only(corpus):
    rels = corpus["relations"].collect()
    assert len(rels) == 1
    r = rels[0]
    assert (r["turn_idx"], r["subj_start"], r["subj_end"], r["obj_start"],
            r["obj_end"], r["label"]) == (0, 1, 1, 4, 5, "Uses")


def test_equiv_clusters_cross_sentence(corpus):
    cl = corpus["clusters"].collect()
    assert len(cl) == 2
    assert len({r["cluster_id"] for r in cl}) == 1
    assert {(r["turn_idx"], r["start"], r["end"]) for r in cl} == {
        (0, 4, 5), (1, 3, 3)
    }


def test_events_first_token_trigger_and_whole_event_drop(corpus):
    ev = corpus["events"].collect()
    # E2 dropped entirely (unalignable arg); E1 has 2 args
    assert {r["role"] for r in ev} == {"Who", "What"}
    assert all(r["event_type"] == "Join" and r["trigger_ix"] == 2 for r in ev)
    assert all(r["turn_idx"] == 0 for r in ev)


def test_brat_to_reference_jsonl(corpus, spark):
    """The converted gold emits valid reference-format JSONL that parses
    back to the same rows (closing the loop with the A1/A2 machinery)."""
    out = jsonl.annotations_to_doc_json(
        corpus["turns"],
        ner=corpus["ner"],
        relations=corpus["relations"],
        events=corpus["events"],
        clusters=corpus["clusters"],
    )
    doc = json.loads(out.head()["json"])
    assert [len(s) for s in doc["sentences"]] == [6, 5]
    assert doc["ner"][0] == sorted(doc["ner"][0])
    back = out.select(
        F.from_json("json", jsonl.DOC_JSON_SCHEMA).alias("d")
    ).select("d.*")
    got_ner = {tuple(r) for r in jsonl.gold_ner_from_docs(back).collect()}
    want_ner = {tuple(r) for r in corpus["ner"].collect()}
    assert got_ner == want_ner
    got_ev = {
        tuple(r)
        for r in jsonl.gold_events_from_docs(back).drop("event_ix").collect()
    }
    want_ev = {tuple(r) for r in corpus["events"].collect()}
    assert got_ev == want_ev
