"""Iceberg catalog wiring (production table format; north star).

The sandbox has no Iceberg runtime jar, so this module provides the exact
configuration and write paths the production deployment uses, gated on
availability — the rest of the engine is format-agnostic (it reads
DataFrames and writes via the sink/checkpoint modules, whose parquet calls
are 1:1 swappable for the `writeTo` forms below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CONFS = {
    # spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
    "spark.sql.extensions": "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
    "spark.sql.catalog.kg": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.kg.type": "hadoop",
    # spark.sql.catalog.kg.warehouse = <warehouse path>, set at submit time
}


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001
        return False


# Schema contract for the two production DDL/DML surfaces, shared with the
# tests so column drift in the engine breaks a test instead of a deployment
# (r4 VERDICT #3): the turns bucket column, and the MERGE's key/accumulator
# columns which must exactly partition the canonical_triples output schema.
TURNS_BUCKET_COL = "conv_id"
TURNS_N_BUCKETS = 1024
MERGE_KEY_COLS = ("subj_canonical", "pred", "obj_canonical")
MERGE_ACCUM_COL = "n_support"


def write_turns_table(turns: DataFrame, table: str = "kg.db.turns") -> None:
    """Create/replace the turns table bucketed by conv_id — the layout the
    whole pipeline's partitioning assumes (one conversation = one bucket's
    worth of locality; 10^3-10^4 buckets at 10^12 turns)."""
    spark = turns.sparkSession
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime not on the classpath; ship with --packages "
            "iceberg-spark-runtime and set ICEBERG_CONFS on the session"
        )
    if TURNS_BUCKET_COL not in turns.columns:
        raise ValueError(
            f"turns table is missing bucket column {TURNS_BUCKET_COL!r}: "
            f"{turns.columns}"
        )
    from pyspark.sql.functions import bucket, col

    (
        turns.writeTo(table)
        .partitionedBy(bucket(TURNS_N_BUCKETS, col(TURNS_BUCKET_COL)))
        .createOrReplace()
    )


def overwrite_stage_partitions(df: DataFrame, table: str) -> None:
    """The checkpointed-stage commit in Iceberg form: dynamic partition
    overwrite with snapshot isolation (plans/checkpoint.py's parquet
    `partitionBy(...).mode("overwrite")` maps to exactly this)."""
    df.writeTo(table).overwritePartitions()


def read_turns_table(spark: SparkSession, table: str = "kg.db.turns") -> DataFrame:
    """Read the Iceberg turns table — the production counterpart of
    tables.read_turns. Bucket metadata makes conv_id-keyed joins and
    groupBys storage-partitioned (no shuffle on the big side when
    `spark.sql.sources.v2.bucketing.enabled` is set). Raises the same
    clear error as the write path when the runtime jar is absent."""
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime not on the classpath; ship with --packages "
            "iceberg-spark-runtime and set ICEBERG_CONFS on the session"
        )
    return spark.read.table(table)


def merge_canonical_triples(
    spark: SparkSession, updates_view: str, table: str = "kg.db.triples"
) -> None:
    """Incremental triple-store maintenance as an Iceberg MERGE: new
    canonical triples upsert by (subj, pred, obj), accumulating support
    counts — the lakehouse form of the batch `canonical_triples` dedup
    aggregation, for streaming/foreachBatch appenders that must not rewrite
    the whole table. Snapshot isolation makes the merge retry-safe (the
    parquet path's idempotence analogue is the batch_id dynamic
    overwrite, streaming/ingest.py)."""
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime not on the classpath; ship with --packages "
            "iceberg-spark-runtime and set ICEBERG_CONFS on the session"
        )
    spark.sql(canonical_triples_merge_sql(updates_view, table))


def canonical_triples_merge_sql(
    updates_view: str, table: str = "kg.db.triples"
) -> str:
    """The MERGE statement, built from the shared column contract so it is
    testable without the Iceberg jar: tests validate every referenced
    column against the real canonical_triples output schema (and that the
    ON keys are exactly its dedup grouping keys, which `INSERT *` relies
    on)."""
    on = " AND ".join(f"t.{c} = u.{c}" for c in MERGE_KEY_COLS)
    return f"""MERGE INTO {table} t
        USING {updates_view} u
        ON {on}
        WHEN MATCHED THEN UPDATE SET
          t.{MERGE_ACCUM_COL} = t.{MERGE_ACCUM_COL} + u.{MERGE_ACCUM_COL}
        WHEN NOT MATCHED THEN INSERT *"""
