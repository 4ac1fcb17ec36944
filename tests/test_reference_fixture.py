"""Data-layer parity against the reference's OWN hand-checked fixture.

Reads /root/reference/dygie/tests/fixtures/scierc_article.json (read-only
input data) and asserts the goldens the reference's test suite documents
(dygie/tests/data/dygie_test.py:12-98): sentence lengths, token text at
offsets, NER labels landing on exact spans under max_span_width=5, the
sentence-5 USED-FOR relation at (19,20)-(22,24), per-sentence cluster
mappings, and vocab sizes — all through the Spark data layer."""

import os

import pytest

from pyspark.sql import functions as F

from dygiepp_spark.config import PipelineConfig
from dygiepp_spark.operators.spans import align_ner_labels, enumerate_spans
from dygiepp_spark.sources import jsonl

FIXTURE = "/root/reference/dygie/tests/fixtures/scierc_article.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="reference fixture not present"
)

LENGTHS = [20, 23, 36, 14, 14, 30, 31, 15]


@pytest.fixture(scope="module")
def docs(spark):
    return jsonl.read_jsonl_docs(spark, FIXTURE)


@pytest.fixture(scope="module")
def turns(docs):
    return jsonl.docs_to_turns(docs)


def test_sentence_lengths_and_offsets(turns):
    from dygiepp_spark.operators.assembly import with_sentence_starts

    rows = sorted(
        with_sentence_starts(turns).collect(), key=lambda r: r["turn_idx"]
    )
    assert [r["n_tokens"] for r in rows] == LENGTHS
    # cumulative starts: [0, 20, 43, 79, 93, 107, 137, 168]
    assert [r["sentence_start"] for r in rows] == [0, 20, 43, 79, 93, 107, 137, 168]


def test_tokens_correct(turns):
    # dygie_test.py:27-30 — sentence 4 has 14 tokens starting "Thirdly the
    # learned intrinsic object structure"
    t4 = turns.where("turn_idx = 4").head()["text"].split(" ")
    assert len(t4) == 14
    assert t4[:6] == ["Thirdly", "the", "learned", "intrinsic", "object", "structure"]


def test_ner_alignment_correct(turns, docs):
    # dygie_test.py:32-44 — sentence 3: Method at (2,3) and (11,12),
    # every other span gets the null label ''
    cfg = PipelineConfig(max_span_width=5)
    spans = enumerate_spans(turns, cfg).where("turn_idx = 3")
    gold = jsonl.gold_ner_from_docs(docs)
    aligned = align_ner_labels(spans, gold)
    got = {
        (r["start"], r["end"]): r["gold_label"]
        for r in aligned.collect()
    }
    assert got[(2, 3)] == "Method"
    assert got[(11, 12)] == "Method"
    assert all(
        lab == "" for (s, e), lab in got.items() if (s, e) not in [(2, 3), (11, 12)]
    )


def test_relation_correct(docs):
    # dygie_test.py:46-62 — sentence 5 has exactly one relation:
    # (19,20)-(22,24) USED-FOR (sentence-relative)
    rels = jsonl.gold_relations_from_docs(docs).where("turn_idx = 5").collect()
    assert len(rels) == 1
    r = rels[0]
    assert (r["subj_start"], r["subj_end"], r["obj_start"], r["obj_end"], r["label"]) == (
        19, 20, 22, 24, "USED-FOR",
    )


def test_coref_cluster_mappings(docs):
    # dygie_test.py:64-87 — per-sentence span→cluster-id mapping
    got = {}
    for r in jsonl.gold_clusters_from_docs(docs).collect():
        got.setdefault(r["turn_idx"], {})[(r["start"], r["end"])] = r["cluster_id"]
    expected = {
        0: {(6, 6): 1},
        2: {(19, 21): 0},
        3: {(11, 12): 0, (2, 3): 2},
        4: {(3, 5): 0},
        5: {(5, 7): 0, (19, 20): 2, (22, 24): 3},
        6: {(5, 5): 3},
        7: {(2, 2): 1},
    }
    assert got == expected


def test_vocab_sizes(docs):
    # dygie_test.py:89-97 — 4 unique NER labels (+1 null), 6 relation labels
    ner_labels = {
        r["label"] for r in jsonl.gold_ner_from_docs(docs).select("label").distinct().collect()
    }
    assert len(ner_labels) + 1 == 5
    rel_labels = jsonl.gold_relations_from_docs(docs).select("label").distinct().count()
    assert rel_labels == 6
