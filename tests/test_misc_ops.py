"""D10 coref propagation, A6 raw-text source, F7 per-namespace metrics."""

import os
import tempfile

from pyspark.sql import functions as F

from dygiepp_spark.operators import coref, extract, metrics
from dygiepp_spark.sources.rawtext import read_raw_text
from dygiepp_spark.synth import synth_turns


def test_coref_propagation(spark, tiny_turns):
    mentions = coref.coref_mentions(tiny_turns)
    edges = coref.antecedent_edges(mentions)
    zero = coref.propagate_scores(mentions, edges, iterations=0)
    assert sorted(zero.select("doc_pos", "raw_score").collect()) == sorted(
        mentions.select("doc_pos", "raw_score").collect()
    )
    one = coref.propagate_scores(mentions, edges, iterations=1)
    base = {r["doc_pos"]: r["raw_score"] for r in mentions.where("conv_id='A'").collect()}
    got = {r["doc_pos"]: r["raw_score"] for r in one.where("conv_id='A'").collect()}
    # customer@16 has antecedent customer@1 → blended; customer@1 unchanged
    assert got[16] == (base[16] + base[1]) / 2
    assert got[1] == base[1]
    # clusters are score-independent: propagation never changes membership
    assert (
        coref.clusters_via_components(tiny_turns).count()
        == coref.clusters_via_components(tiny_turns).count()
    )


def test_raw_text_source(spark):
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "convA.txt"), "w") as f:
        f.write("the customer will join the order.  then scan the table!\n")
    with open(os.path.join(d, "convB.txt"), "w") as f:
        f.write("sort the key?\n")
    turns = read_raw_text(spark, d)
    rows = {(r["conv_id"], r["turn_idx"]): r["text"] for r in turns.collect()}
    assert rows[("convA", 0)] == "the customer will join the order."
    assert rows[("convA", 1)] == "then scan the table!"
    assert rows[("convB", 0)] == "sort the key?"
    # flows into extraction unchanged
    m = extract.ner_mentions(turns)
    assert m.where("surface = 'customer'").count() == 1


def test_per_namespace_metrics(spark):
    turns = synth_turns(spark, n_convs=10, seed=1)
    m = extract.ner_mentions(turns, include_modifier_spans=False)
    tagged = m.withColumn(
        "dataset",
        F.when(F.col("conv_id").substr(5, 9).cast("int") % 2 == 0, "even").otherwise("odd"),
    ).withColumn("task", F.lit("ner"))
    pred = tagged.where("surface != 'vector'")
    out = metrics.per_namespace_metrics(
        pred, tagged, ["conv_id", "turn_idx", "start", "end", "label"]
    )
    rows = {(r["dataset"], r["task"]): r for r in out.collect()}
    assert ("even", "ner") in rows and ("odd", "ner") in rows
    assert ("MEAN__", "all") in rows  # reference MEAN__ row (dygie.py:336-366)
    for k, r in rows.items():
        assert r["precision"] == 1.0  # pred ⊂ gold
        if k != ("MEAN__", "all"):
            assert r["recall"] <= 1.0
