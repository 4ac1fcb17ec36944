"""Iceberg wiring: availability detection + a clear error (not a crash)
when the runtime jar is absent (true in this sandbox)."""

import pytest

from dygiepp_spark.sources import iceberg
from dygiepp_spark.synth import synth_turns


def test_availability_detection(spark):
    assert iceberg.iceberg_available(spark) in (True, False)


def test_write_raises_cleanly_without_runtime(spark):
    turns = synth_turns(spark, n_convs=2)
    if iceberg.iceberg_available(spark):
        pytest.skip("iceberg present; write path exercised in deployment")
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        iceberg.write_turns_table(turns)


def test_read_and_merge_raise_cleanly_without_runtime(spark):
    """The read and MERGE paths carry the same availability gate as the
    write path — a deployment missing the jar fails with the actionable
    message, never a ClassNotFound stack."""
    if iceberg.iceberg_available(spark):
        pytest.skip("iceberg present; paths exercised in deployment")
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        iceberg.read_turns_table(spark)
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        iceberg.merge_canonical_triples(spark, "updates")
