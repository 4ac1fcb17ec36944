"""Checkpoint edge case: a run whose transform emits ZERO rows must still
commit lineage (so resume skips) and not crash on the empty data dir."""

import shutil
import tempfile

from pyspark.sql import functions as F

from dygiepp_spark.plans import checkpoint as cp
from dygiepp_spark.synth import synth_turns


def test_zero_output_run_commits_lineage(spark):
    d = tempfile.mkdtemp()
    try:
        turns = synth_turns(spark, n_convs=6, seed=21)

        def empty_transform(df):
            from dygiepp_spark.operators.extract import relation_triples

            return relation_triples(df).where(F.lit(False))

        n_occupied = (
            cp.with_partition_key(turns, 4).select(cp.PART_COL).distinct().count()
        )
        s1 = cp.run_with_checkpoint(
            spark, turns, d, "z1", n_partitions=4, transform=empty_transform
        )
        assert s1["n_todo"] == n_occupied and s1.get("n_rows_out", 0) == 0
        # resume: nothing recomputes
        s2 = cp.run_with_checkpoint(
            spark, turns, d, "z2", n_partitions=4, transform=empty_transform
        )
        assert s2["n_todo"] == 0
        lin = cp.read_lineage(spark, d)
        assert lin.where("status = 'done'").count() == n_occupied
        assert lin.agg(F.sum("n_rows_out")).head()[0] == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)
