"""Partitioned sink layout tests (A2/A3)."""

import os
import shutil
import tempfile

from dygiepp_spark.operators import canonicalize, extract
from dygiepp_spark.sources import sinks
from dygiepp_spark.synth import synth_turns


def test_triples_sink_bucketed_layout(spark):
    d = tempfile.mkdtemp()
    try:
        turns = synth_turns(spark, n_convs=30, seed=8)
        triples = extract.relation_triples(turns)
        sinks.write_triples(triples, f"{d}/t", n_buckets=8)
        buckets = sorted(
            p for p in os.listdir(f"{d}/t") if p.startswith("bucket=")
        )
        assert 1 <= len(buckets) <= 8
        back = spark.read.parquet(f"{d}/t")
        assert back.count() == triples.count()
        # every conversation lands in exactly one bucket
        multi = (
            back.groupBy("conv_id")
            .agg({"bucket": "min"})
            .join(back.groupBy("conv_id").agg({"bucket": "max"}), on="conv_id")
        )
        assert all(r["min(bucket)"] == r["max(bucket)"] for r in multi.collect())
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_canonical_sink_partitioned_by_pred(spark):
    d = tempfile.mkdtemp()
    try:
        turns = synth_turns(spark, n_convs=20, seed=8)
        canonical = canonicalize.canonical_triples(
            extract.relation_triples(turns), canonicalize.alias_dict(spark)
        )
        sinks.write_canonical_triples(canonical, f"{d}/c")
        preds = sorted(p for p in os.listdir(f"{d}/c") if p.startswith("pred="))
        assert preds  # one directory per predicate → partition pruning works
        assert spark.read.parquet(f"{d}/c").where("pred = 'JOIN'").count() > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_predictions_jsonl_sink_deterministic_and_parseable(spark, tmp_path):
    """A3 — the prediction-JSONL sink writes the reference artifact: every
    line parses, predicted_clusters is present, and two writes of the same
    input produce byte-identical content (the determinism goal the parquet
    sinks already pin)."""
    import json as _json
    import pathlib

    from dygiepp_spark.operators import coref, extract
    from dygiepp_spark.sources import sinks
    from dygiepp_spark.sources.jsonl import predictions_to_doc_json, read_jsonl_docs
    from dygiepp_spark.synth import synth_turns

    turns = synth_turns(spark, n_convs=10, seed=8)
    docs_json = predictions_to_doc_json(
        turns,
        mentions=extract.ner_mentions(turns),
        triples=extract.relation_triples(turns),
        clusters=coref.clusters_via_components(turns),
    )

    def write_and_read(path):
        sinks.write_predictions_jsonl(docs_json, str(path), n_files=2)
        lines = []
        for f in sorted(pathlib.Path(path).glob("part-*")):
            lines += f.read_text().splitlines()
        return lines

    a = write_and_read(tmp_path / "p1")
    b = write_and_read(tmp_path / "p2")
    assert a == b and len(a) == 10
    for line in a:
        d = _json.loads(line)
        assert "predicted_clusters" in d and "predicted_ner" in d
    # the artifact round-trips through the reader
    back = read_jsonl_docs(spark, str(tmp_path / "p1"))
    assert back.count() == 10
