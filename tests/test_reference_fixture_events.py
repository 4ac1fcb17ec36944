"""Event-format parity against the reference's OWN ACE event fixture
(dygie/tests/fixtures/ace_event_article.json, used by the reference's
document tests): per-turn text equality through docs_to_turns, gold event
parsing vs an independent pure-python flatten of the documented format
(doc/data.md:64-78), and the write→read inverse on real reference data.
Also covers the metadata whitelist (document.py:160-173): _-prefixed
fields pass through, unknown fields are reported."""

import json
import os

import pytest

from pyspark.sql import functions as F

from dygiepp_spark.sources import jsonl

FIXTURE = "/root/reference/dygie/tests/fixtures/ace_event_article.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="reference fixture not present"
)


@pytest.fixture(scope="module")
def docs(spark):
    return jsonl.read_jsonl_docs(spark, FIXTURE)


@pytest.fixture(scope="module")
def raw_doc():
    return json.loads(open(FIXTURE).readline())


def test_per_turn_text_equality(docs, raw_doc):
    """input_hint invariant: per-turn text equality under stable ordering."""
    turns = jsonl.docs_to_turns(docs)
    got = {r["turn_idx"]: r["text"] for r in turns.collect()}
    assert got == {
        i: " ".join(toks) for i, toks in enumerate(raw_doc["sentences"])
    }


def _flatten_events_py(doc):
    starts, off = [], 0
    for s in doc["sentences"]:
        starts.append(off)
        off += len(s)
    out = []
    for six, sent_events in enumerate(doc["events"]):
        for eix, ev in enumerate(sent_events):
            trig, typ = ev[0]
            args = ev[1:]
            base = (doc["doc_key"], six, eix, trig - starts[six], typ)
            if not args:
                out.append(base + (None, None, None))
            for a in args:
                out.append(base + (a[0] - starts[six], a[1] - starts[six], a[2]))
    return sorted(out)


def test_gold_events_match_pure_python(docs, raw_doc):
    got = sorted(tuple(r) for r in jsonl.gold_events_from_docs(docs).collect())
    assert got == _flatten_events_py(raw_doc)
    # spot-check a documented shape: triggers are single tokens, every
    # event_type is non-empty
    assert all(r[4] for r in got)


def test_annotations_write_read_inverse_on_reference_data(docs, spark):
    """Emit the parsed gold back through annotations_to_doc_json and re-parse:
    rows must be identical (the sink is the exact inverse of the parser)."""
    turns = jsonl.docs_to_turns(docs)
    ner = jsonl.gold_ner_from_docs(docs)
    rel = jsonl.gold_relations_from_docs(docs).selectExpr(
        "conv_id", "turn_idx", "subj_start", "subj_end", "obj_start", "obj_end",
        "label",
    )
    ev = jsonl.gold_events_from_docs(docs).drop("event_ix")
    cl = jsonl.gold_clusters_from_docs(docs)
    out = jsonl.annotations_to_doc_json(turns, ner=ner, relations=rel, events=ev, clusters=cl)
    back = out.select(F.from_json("json", jsonl.DOC_JSON_SCHEMA).alias("d")).select("d.*")
    assert {tuple(r) for r in jsonl.gold_ner_from_docs(back).collect()} == {
        tuple(r) for r in ner.collect()
    }
    assert {tuple(r) for r in jsonl.gold_relations_from_docs(back).collect()} == {
        tuple(r) for r in rel.selectExpr(
            "conv_id", "turn_idx", "subj_start", "subj_end", "obj_start",
            "obj_end", "label"
        ).collect()
    }
    assert {
        tuple(r) for r in jsonl.gold_events_from_docs(back).drop("event_ix").collect()
    } == {tuple(r) for r in ev.collect()}
    # clusters round-trip up to cluster relabeling: compare member-set sets
    def cluster_sets(df):
        rows = df.collect()
        by_cluster = {}
        for r in rows:
            by_cluster.setdefault((r["conv_id"], r["cluster_id"]), set()).add(
                (r["turn_idx"], r["start"], r["end"])
            )
        return {frozenset(v) for v in by_cluster.values()}

    assert cluster_sets(jsonl.gold_clusters_from_docs(back)) == cluster_sets(cl)


def test_metadata_whitelist(spark, tmp_path):
    """_-prefixed fields pass through typed; unknown fields are reported
    (reference document.py:160-173 raises — we quarantine)."""
    p = str(tmp_path / "docs.jsonl")
    with open(p, "w") as f:
        f.write(
            json.dumps(
                {
                    "doc_key": "d1",
                    "dataset": "x",
                    "sentences": [["a", "b"]],
                    "weight": 0.25,
                    "_sentence_index": [0],
                    "_tag": "keep me",
                    "_when": "3 days",  # digit-leading STRING, must re-quote
                    "_count": 7,
                    "bogus_field": 1,
                }
            )
            + "\n"
        )
    docs = jsonl.read_jsonl_docs(spark, p, with_meta=True)
    row = docs.head()
    assert row["weight"] == 0.25
    assert set(row["_meta"].keys()) == {"_sentence_index", "_tag", "_when", "_count"}
    rep = jsonl.doc_field_report(docs).collect()
    assert [(r["doc_key"], r["unknown_field"]) for r in rep] == [("d1", "bogus_field")]
    # full passthrough: emit predictions JSON, metadata comes back typed
    turns = jsonl.docs_to_turns(docs)
    out = jsonl.predictions_to_doc_json(
        turns, docs_meta=docs.select("doc_key", "weight", "_meta")
    )
    back = json.loads(out.head()["json"])
    assert back["weight"] == 0.25
    assert back["_sentence_index"] == [0] and back["_tag"] == "keep me"
    assert back["_when"] == "3 days"  # not the number 3
    assert back["_count"] == 7  # stays a number


def test_metadata_splice_never_emits_invalid_json(spark, tmp_path):
    """Adversarial metadata values: almost-JSON strings must re-quote, real
    JSON must splice typed, and every emitted line must parse."""
    import json as _json

    p = str(tmp_path / "adv.jsonl")
    meta = {
        "_a": "[draft",
        "_b": "007",
        "_c": "3 days",
        "_d": "true",
        "_e": [1, 2],
        "_f": {"k": "v"},
        "_g": -1.5e-3,
        "_h": "line\nbreak",
    }
    with open(p, "w") as f:
        f.write(
            _json.dumps(
                {"doc_key": "d", "dataset": "x", "sentences": [["a", "b"]], **meta}
            )
            + "\n"
        )
    from dygiepp_spark.sources import jsonl as J

    docs = J.read_jsonl_docs(spark, p, with_meta=True)
    out = J.predictions_to_doc_json(
        J.docs_to_turns(docs), docs_meta=docs.select("doc_key", "_meta")
    )
    line = out.head()["json"]
    back = _json.loads(line)  # must not raise
    assert back["_a"] == "[draft" and back["_b"] == "007" and back["_c"] == "3 days"
    assert back["_d"] is True  # string 'true' is valid JSON — round-trips typed
    assert back["_e"] == [1, 2] and back["_f"] == {"k": "v"}
    assert back["_g"] == -1.5e-3
    assert back["_h"] == "line\nbreak"
    assert "\n" not in line  # one-doc-per-line contract holds


def test_predicted_clusters_write_read_inverse_on_reference_data(docs, spark, tmp_path):
    """Feed the fixture's own 77 gold clusters through the PREDICTION
    writer (as if the coref head had emitted them) and parse back: same
    memberships. Covers the reference's predicted_clusters output path
    (dygie/models/dygie.py:289-317; converter coref.py:702-726)."""
    gold = jsonl.gold_clusters_from_docs(docs)
    turns = jsonl.docs_to_turns(docs)
    out = jsonl.predictions_to_doc_json(turns, clusters=gold)
    p = tmp_path / "pred_clusters.jsonl"
    p.write_text("\n".join(r["json"] for r in out.collect()) + "\n")
    back = jsonl.predicted_clusters_from_docs(jsonl.read_jsonl_docs(spark, str(p)))

    def membership(df):
        by = {}
        for r in df.collect():
            by.setdefault((r["conv_id"], r["cluster_id"]), set()).add(
                (r["turn_idx"], r["start"], r["end"])
            )
        return {(conv, frozenset(v)) for (conv, _), v in by.items()}

    assert membership(back) == membership(gold)
    assert back.count() == gold.count()
