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


def test_recompute_to_zero_rows_purges_stale_partition(spark):
    """A partition whose input changed and whose recompute yields ZERO rows
    must not serve the previous run's files (dynamic overwrite only rewrites
    partitions present in the new output — the purge handles the rest)."""
    d = tempfile.mkdtemp()
    try:
        turns = synth_turns(spark, n_convs=6, seed=22)

        def real(df):
            from dygiepp_spark.operators.extract import relation_triples

            return relation_triples(df)

        s1 = cp.run_with_checkpoint(spark, turns, d, "p1", n_partitions=4, transform=real)
        assert s1["n_rows_out"] > 0
        assert cp.read_stage(spark, d, "triples").count() == s1["n_rows_out"]

        # change every partition's input fingerprint, recompute to zero rows
        changed = turns.withColumn("text", F.concat(F.col("text"), F.lit(" zz")))

        def empty(df):
            return real(df).where(F.lit(False))

        s2 = cp.run_with_checkpoint(spark, changed, d, "p2", n_partitions=4, transform=empty)
        assert s2["n_todo"] > 0 and s2.get("n_rows_out", 0) == 0
        # stale rows must be gone, and lineage must record 0 for the new run
        try:
            n_now = cp.read_stage(spark, d, "triples").count()
        except Exception:  # noqa: BLE001 — all partitions purged, dir empty
            n_now = 0
        assert n_now == 0
        lin = cp.read_lineage(spark, d)
        assert lin.where("run_id = 'p2'").agg(F.sum("n_rows_out")).head()[0] == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_file_uri_out_dir_purges_and_resumes(spark):
    """file:// out_dirs must behave exactly like plain local paths:
    os.path.exists('file:///...') is always False, so an unstripped URI
    would (a) silently skip the stale-partition purge and (b) make
    read_lineage treat every run as the first (no resume)."""
    local = tempfile.mkdtemp()
    d = "file://" + local
    try:
        turns = synth_turns(spark, n_convs=6, seed=23)

        def real(df):
            from dygiepp_spark.operators.extract import relation_triples

            return relation_triples(df)

        s1 = cp.run_with_checkpoint(spark, turns, d, "f1", n_partitions=4, transform=real)
        assert s1["n_rows_out"] > 0
        # resume must SEE the lineage through the URI (b)
        s2 = cp.run_with_checkpoint(spark, turns, d, "f2", n_partitions=4, transform=real)
        assert s2["n_todo"] == 0

        # recompute-to-zero through the URI must purge stale files (a)
        changed = turns.withColumn("text", F.concat(F.col("text"), F.lit(" zz")))

        def empty(df):
            return real(df).where(F.lit(False))

        s3 = cp.run_with_checkpoint(spark, changed, d, "f3", n_partitions=4, transform=empty)
        assert s3["n_todo"] > 0 and s3.get("n_rows_out", 0) == 0
        try:
            n_now = cp.read_stage(spark, d, "triples").count()
        except Exception:  # noqa: BLE001 — all partitions purged, dir empty
            n_now = 0
        assert n_now == 0
    finally:
        shutil.rmtree(local, ignore_errors=True)


def test_checkpoint_write_does_not_mutate_session_conf(spark):
    """The dynamic-partition overwrite must be a per-write option; the
    session-level partitionOverwriteMode must keep its default (static), or
    unrelated overwrites in the same session change semantics silently."""
    d = tempfile.mkdtemp()
    try:
        turns = synth_turns(spark, n_convs=4, seed=24)
        cp.run_with_checkpoint(spark, turns, d, "c1", n_partitions=2)
        assert (
            spark.conf.get("spark.sql.sources.partitionOverwriteMode").lower()
            == "static"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
