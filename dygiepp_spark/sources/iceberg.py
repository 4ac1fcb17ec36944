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
    from pyspark.sql.functions import bucket, col

    (
        turns.writeTo(table)
        .partitionedBy(bucket(1024, col("conv_id")))
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
    spark.sql(
        f"""MERGE INTO {table} t
        USING {updates_view} u
        ON t.subj_canonical = u.subj_canonical AND t.pred = u.pred
           AND t.obj_canonical = u.obj_canonical
        WHEN MATCHED THEN UPDATE SET t.n_support = t.n_support + u.n_support
        WHEN NOT MATCHED THEN INSERT *"""
    )
