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


def test_timed_out_state_is_removed():
    """ProcessingTimeTimeout firing must REMOVE state and emit nothing —
    re-arming the timeout would keep idle-conversation state alive forever
    on a continuous stream."""
    import pandas as pd

    from dygiepp_spark.streaming.stateful import _edges_for_group

    class FakeState:
        hasTimedOut = True
        exists = True
        removed = False
        updated = False

        def remove(self):
            self.removed = True

        def update(self, v):
            self.updated = True

        def setTimeoutDuration(self, ms):
            self.updated = True

    st = FakeState()
    frames = list(_edges_for_group(("c1",), iter([]), st))
    assert st.removed and not st.updated
    assert sum(len(f) for f in frames) == 0


def test_batch_writer_retry_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running the same batch_id must not
    duplicate triples (dynamic overwrite keyed by batch_id)."""
    from dygiepp_spark.streaming.ingest import make_batch_writer
    from dygiepp_spark.synth import synth_turns

    out = str(tmp_path / "triples")
    writer = make_batch_writer(out)
    turns = synth_turns(spark, n_convs=4, seed=3)
    writer(turns, 0)
    n1 = spark.read.parquet(out).count()
    writer(turns, 0)  # simulated retry of the same micro-batch
    assert spark.read.parquet(out).count() == n1
    # a new batch appends its own partition
    writer(synth_turns(spark, n_convs=2, seed=4), 1)
    total = spark.read.parquet(out)
    assert total.where("batch_id = 0").count() == n1
    assert total.where("batch_id = 1").count() > 0


def test_late_turn_arrival_mispositions_not_drops(spark):
    """Documented late-arrival behavior (stateful.py module docstring): a
    turn arriving AFTER later turns of its conversation is neither dropped
    nor fatal — its tokens take doc positions at the conversation's running
    offset, i.e. exactly as if the conversation had happened in ARRIVAL
    order. Asserted precisely: incremental edges on out-of-order input ==
    the batch operator on the arrival-order re-indexed conversation.
    Producers needing true-order positions must bound disorder upstream
    (watermarked buffer/sort before this operator)."""
    from pyspark.sql import Window

    d = tempfile.mkdtemp()
    try:
        turns = synth_turns(spark, n_convs=6, seed=5)
        # batch 1 carries the LATER turns; batch 2 the earlier ones (late)
        _write_flat(turns.where("turn_idx >= 3"), f"{d}/in", "a")
        time.sleep(1.1)
        _write_flat(turns.where("turn_idx < 3"), f"{d}/in", "b")

        stream = ingest.read_turns_stream(spark, f"{d}/in", max_files=1)
        q = (
            stateful.incremental_coref_edges(stream)
            .writeStream.format("memory")
            .queryName("late_edges")
            .outputMode("append")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r["conv_id"], r["doc_pos"], r["ant_doc_pos"])
            for r in spark.sql("select * from late_edges").collect()
        }

        # batch twin on the arrival-order re-indexed conversation
        w = Window.partitionBy("conv_id").orderBy("arr", "turn_idx")
        reordered = (
            turns.withColumn(
                "arr", F.when(F.col("turn_idx") < 3, 1).otherwise(0)
            )
            .withColumn("new_idx", F.row_number().over(w) - 1)
            .drop("turn_idx", "arr")
            .withColumnRenamed("new_idx", "turn_idx")
        )
        want = {
            (r["conv_id"], r["doc_pos"], r["ant_doc_pos"])
            for r in coref.antecedent_edges(coref.coref_mentions(reordered)).collect()
        }
        assert got == want and len(want) > 0
        # and nothing was dropped relative to in-order processing: same
        # NUMBER of edges as the true-order batch result (positions shift,
        # same-surface adjacency pairs do not)
        n_true = coref.antecedent_edges(coref.coref_mentions(turns)).count()
        assert len(got) == n_true
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_reorder_turns_restores_true_order(spark):
    """The stateful reorderer releases turns in contiguous turn_idx order
    regardless of arrival order: feeding the LATER turns first, the full
    reordered output equals the true-order conversation, and nothing is
    emitted out of order within any micro-batch."""
    d = tempfile.mkdtemp()
    try:
        turns = synth_turns(spark, n_convs=6, seed=5)
        _write_flat(turns.where("turn_idx >= 3"), f"{d}/in", "a")
        time.sleep(1.1)
        _write_flat(turns.where("turn_idx < 3"), f"{d}/in", "b")

        stream = ingest.read_turns_stream(spark, f"{d}/in", max_files=1)
        q = (
            stateful.reorder_turns(stream)
            .writeStream.format("memory")
            .queryName("reordered")
            .outputMode("append")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r["conv_id"], r["turn_idx"], r["text"])
            for r in spark.sql("select * from reordered").collect()
        }
        want = {
            (r["conv_id"], r["turn_idx"], r["text"])
            for r in turns.select("conv_id", "turn_idx", "text").collect()
        }
        assert got == want and len(want) > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_reorder_buffers_gaps_and_flushes_on_timeout():
    """Unit-level: a gap holds later turns in state (bounded by disorder,
    not conversation length); the idle-timeout flush drains the buffer in
    order and removes state."""
    import pandas as pd

    from dygiepp_spark.streaming.stateful import _reorder_group

    class FakeState:
        def __init__(self, value=None):
            self._v = value
            self.hasTimedOut = False
            self.removed = False

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def remove(self):
            self.removed = True

        def setTimeoutDuration(self, ms):
            pass

    # batch 1: turns 0 and 2 arrive (1 missing) → only 0 releases
    st = FakeState()
    pdf = pd.DataFrame({"turn_idx": [2, 0], "text": ["t2", "t0"]})
    out = pd.concat(list(_reorder_group(("c",), iter([pdf]), st)))
    assert list(out["turn_idx"]) == [0]
    next_idx, buffered = st.get
    assert next_idx == 1 and "2" in buffered  # only the gap turn is held

    # batch 2: turn 1 arrives → 1 and the buffered 2 release in order
    pdf2 = pd.DataFrame({"turn_idx": [1], "text": ["t1"]})
    out2 = pd.concat(list(_reorder_group(("c",), iter([pdf2]), st)))
    assert list(out2["turn_idx"]) == [1, 2]

    # timeout with a still-missing gap: drain buffer in order, drop state
    st3 = FakeState((5, '{"7": "t7", "6": "t6"}'))
    st3.hasTimedOut = True
    out3 = pd.concat(list(_reorder_group(("c",), iter([]), st3)))
    assert list(out3["turn_idx"]) == [6, 7] and st3.removed
