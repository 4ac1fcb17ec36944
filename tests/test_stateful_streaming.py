"""applyInPandasWithState incremental coref edges ≡ batch antecedent edges
across micro-batch boundaries."""

import shutil
import tempfile
import time

from pyspark.sql import functions as F

from dygiepp_spark.operators import coref
from dygiepp_spark.streaming import ingest, stateful
from dygiepp_spark.synth import synth_turns

from test_streaming_jsonl import _write_flat


def test_incremental_edges_match_batch(spark):
    d = tempfile.mkdtemp()
    try:
        turns = synth_turns(spark, n_convs=12, seed=4)
        # split MID-conversation so state must carry across micro-batches
        _write_flat(turns.where("turn_idx < 3"), f"{d}/in", "a")
        time.sleep(1.1)  # file source orders batches by mod time
        _write_flat(turns.where("turn_idx >= 3"), f"{d}/in", "b")

        stream = ingest.read_turns_stream(spark, f"{d}/in", max_files=1)
        edges = stateful.incremental_coref_edges(stream)
        q = (
            edges.writeStream.format("memory")
            .queryName("inc_edges")
            .outputMode("append")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        got = {
            (r["conv_id"], r["doc_pos"], r["ant_doc_pos"])
            for r in spark.sql("select * from inc_edges").collect()
        }
        want = {
            (r["conv_id"], r["doc_pos"], r["ant_doc_pos"])
            for r in coref.antecedent_edges(coref.coref_mentions(turns)).collect()
        }
        assert got == want and len(want) > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)
