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
