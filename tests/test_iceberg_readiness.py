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


def test_merge_sql_columns_match_canonical_triples_schema(spark):
    """r4 VERDICT #3: the MERGE statement's column set is validated against
    the REAL canonical_triples output schema (no jar needed — string-level
    is the point: a column rename in the engine or a typo in the SQL fails
    here instead of at deployment).

    Contract checked: every t./u. column reference exists in the schema;
    the ON keys are exactly the dedup grouping keys (schema minus the
    accumulator) — `INSERT *` positionally requires updates-view schema ==
    table schema, so a key set that under-covers the schema would upsert
    duplicate rows."""
    import re

    from dygiepp_spark.inference import udf as iudf
    from dygiepp_spark.operators import canonicalize
    from dygiepp_spark.tables import read_turns

    turns = read_turns(spark, sf_dir="/root/testdata/sf0.001")
    triples = iudf.triples_from(iudf.infer(turns))
    out = canonicalize.canonical_triples(triples, canonicalize.alias_dict(spark))
    schema_cols = set(out.columns)

    sql = iceberg.canonical_triples_merge_sql("updates_v", "kg.db.triples")
    referenced = set(re.findall(r"\b[tu]\.(\w+)", sql))
    assert referenced <= schema_cols, referenced - schema_cols
    assert set(iceberg.MERGE_KEY_COLS) | {iceberg.MERGE_ACCUM_COL} == schema_cols
    assert set(iceberg.MERGE_KEY_COLS) == schema_cols - {iceberg.MERGE_ACCUM_COL}
    assert "updates_v" in sql and "kg.db.triples" in sql


def test_bucketed_create_matches_turns_schema(spark):
    """The bucketed-create contract against the real turns schema: the
    bucket column exists with the expected type, and a frame missing it
    fails the schema check BEFORE the availability gate would let a real
    deployment build a mis-bucketed table."""
    from dygiepp_spark.tables import read_turns

    turns = read_turns(spark, sf_dir="/root/testdata/sf0.001")
    assert iceberg.TURNS_BUCKET_COL in turns.columns
    assert dict(turns.dtypes)[iceberg.TURNS_BUCKET_COL] == "string"

    bad = turns.drop(iceberg.TURNS_BUCKET_COL)
    if iceberg.iceberg_available(spark):
        with pytest.raises(ValueError, match="bucket column"):
            iceberg.write_turns_table(bad)
    else:
        # jar absent: the availability gate fires first by design (the
        # schema check guards the real write, which can't run here)
        with pytest.raises(RuntimeError, match="Iceberg runtime"):
            iceberg.write_turns_table(bad)


def test_merge_canonical_executable_twin_matches_full_recompute(spark):
    """The batch `merge_canonical` operator EXECUTES the MERGE semantics
    the Iceberg statement declares (same key/accumulator constants):
    incrementally merging per-batch canonical tables must reproduce the
    full recompute exactly, for any batch split — matched keys accumulate
    n_support, unmatched insert."""
    from dygiepp_spark.inference import udf as iudf
    from dygiepp_spark.operators import canonicalize
    from dygiepp_spark.tables import read_turns
    from pyspark.sql import functions as F

    turns = read_turns(spark, sf_dir="/root/testdata/sf0.001")
    triples = iudf.triples_from(iudf.infer(turns)).persist()
    aliases = canonicalize.alias_dict(spark)
    try:
        a = triples.where(F.abs(F.hash("conv_id")) % 2 == 0)
        b = triples.where(F.abs(F.hash("conv_id")) % 2 == 1)
        inc = canonicalize.merge_canonical(
            canonicalize.canonical_triples(a, aliases),
            canonicalize.canonical_triples(b, aliases),
        )
        full = canonicalize.canonical_triples(triples, aliases)
        assert sorted(map(tuple, inc.collect())) == sorted(
            map(tuple, full.collect())
        )
        # merging an empty increment is the identity
        empty = full.limit(0)
        again = canonicalize.merge_canonical(full, empty)
        assert sorted(map(tuple, again.collect())) == sorted(
            map(tuple, full.collect())
        )
        # column drift fails loud, mirroring the SQL contract test above
        with pytest.raises(ValueError, match="missing merge columns"):
            canonicalize.merge_canonical(full.drop("n_support"), full)
    finally:
        triples.unpersist()
