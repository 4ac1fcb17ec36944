"""Per-partition checkpointing with lineage + metrics (north rule:
"resumable from checkpoint with per-partition lineage + metrics").

Pattern (the Iceberg-style incremental commit, done with parquet in this
sandbox; swap the writes for Iceberg `df.writeTo(...).overwritePartitions()`
in production — semantics identical):

  1. partition_key = pmod(xxhash64(conv_id), n_partitions): conversations
     never straddle partitions (the reference's document-at-a-time unit).
  2. lineage table records (run_id, stage, partition_key, counts, status,
     input_fingerprint) for every COMMITTED partition.
  3. a (re)run processes only partitions missing from lineage, writing data
     with dynamic-partition overwrite (idempotent: a partition interrupted
     mid-write is simply rewritten), then appends lineage in one atomic-ish
     append AFTER the data commit.
  4. input_fingerprint = order-insensitive xor of row hashes per partition;
     resume verifies it so stale checkpoints of changed inputs recompute.

One job writes all missing partitions (no per-partition driver loop — at
4096 partitions a loop of jobs would dominate wall clock).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession, functions as F

# note: not "_lineage" — Spark's file source silently ignores _-prefixed paths
LINEAGE_DIR = "lineage"
PART_COL = "partition_key"


def with_partition_key(turns: DataFrame, n_partitions: int) -> DataFrame:
    return turns.withColumn(
        PART_COL, F.pmod(F.xxhash64("conv_id"), F.lit(n_partitions)).cast("bigint")
    )


def partition_fingerprints(keyed_turns: DataFrame) -> DataFrame:
    """(partition_key, input_fingerprint, n_conversations, n_turns)."""
    return keyed_turns.groupBy(PART_COL).agg(
        F.expr("bit_xor(xxhash64(conv_id, turn_idx, text))").alias("input_fingerprint"),
        F.countDistinct("conv_id").cast("bigint").alias("n_conversations"),
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
    )


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame | None:
    path = os.path.join(out_dir, LINEAGE_DIR)
    # strip a file:// scheme for the local existence probe (os.path.isdir
    # on a URI is always False → resume would silently recompute everything)
    local = urlparse(path).path if path.startswith("file://") else path
    if not os.path.isdir(local):  # first run: no lineage yet (local FS /
        return None  # driver-visible DFS mount; Iceberg catalogs instead)
    try:
        return spark.read.parquet(path)
    except Exception:  # noqa: BLE001 — dir exists but no committed files
        return None


def run_with_checkpoint(
    spark: SparkSession,
    turns: DataFrame,
    out_dir: str,
    run_id: str,
    stage: str = "triples",
    n_partitions: int = 16,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> dict:
    """Run `transform` (default: relation-triple extraction) over only the
    partitions not yet committed for `stage`; returns a summary dict.

    Data lands in {out_dir}/data/{stage}/ partitioned by partition_key;
    lineage in {out_dir}/lineage/.
    """
    if transform is None:
        from dygiepp_spark.operators.extract import relation_triples

        transform = relation_triples

    keyed = with_partition_key(turns, n_partitions)
    fps = partition_fingerprints(keyed)

    lineage = read_lineage(spark, out_dir)
    if lineage is not None:
        done = lineage.where(
            (F.col("stage") == stage) & (F.col("status") == "done")
        ).select(PART_COL, "input_fingerprint")
        # a partition is skippable iff SOME committed lineage row matches
        # the current input fingerprint (recomputed partitions leave their
        # stale rows behind — append-only lineage)
        todo_keys = fps.join(
            done, on=[PART_COL, "input_fingerprint"], how="left_anti"
        ).select(PART_COL)
    else:
        todo_keys = fps.select(PART_COL)

    todo = [r[PART_COL] for r in todo_keys.collect()]
    summary = {
        "run_id": run_id,
        "stage": stage,
        "n_partitions": n_partitions,
        "n_todo": len(todo),
        "n_skipped": n_partitions - len(todo),
    }
    if not todo:
        return summary

    subset = keyed.where(F.col(PART_COL).isin(todo))
    out = transform(subset.drop(PART_COL))
    out_keyed = out.withColumn(
        PART_COL, F.pmod(F.xxhash64("conv_id"), F.lit(n_partitions)).cast("bigint")
    )

    data_path = os.path.join(out_dir, "data", stage)
    # Dynamic overwrite only replaces partitions PRESENT in the new output:
    # a todo partition whose recompute yields zero rows would keep its stale
    # files (and the lineage row below would record the stale count). Purge
    # every todo partition explicitly before the write — an interrupted run
    # just recomputes them (lineage commits last). Iceberg's
    # overwritePartitions() does this with delete predicates; the
    # parquet-on-FS stand-in needs an explicit local delete, and it must
    # FAIL LOUDLY if it can't delete — a swallowed error here would
    # resurrect the stale-data bug silently.
    if "://" in out_dir and not out_dir.startswith("file://"):
        raise NotImplementedError(
            "parquet-on-FS checkpoint purge is local-FS only; use the "
            "Iceberg backend (overwritePartitions) for remote storage"
        )
    # os.path.exists("file:///...") is always False — strip the URI scheme
    # for the local purge, or the stale-partition fix silently no-ops for
    # file:// out_dirs (the exact bug the purge exists to prevent)
    local_data_path = (
        urlparse(data_path).path if data_path.startswith("file://") else data_path
    )
    for k in todo:
        part_dir = os.path.join(local_data_path, f"{PART_COL}={k}")
        if os.path.exists(part_dir):
            shutil.rmtree(part_dir)  # raises on failure — never skip silently
    (
        out_keyed.repartition(PART_COL)
        .write.mode("overwrite")
        # per-write option, NOT session conf: mutating the shared session's
        # partitionOverwriteMode would change overwrite semantics for
        # unrelated writes in the same session
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(PART_COL)
        .parquet(data_path)
    )

    # lineage append AFTER the data commit (metrics per partition)
    try:
        row_counts = (
            spark.read.parquet(data_path)
            .where(F.col(PART_COL).isin(todo))
            .groupBy(PART_COL)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows_out"))
        )
        row_counts.head(1)
    except Exception:  # noqa: BLE001 — zero output rows: dir has no
        # partition files to infer a schema from; lineage still commits
        # (n_rows_out = 0) so the empty partitions skip on resume
        row_counts = spark.createDataFrame(
            [], f"{PART_COL} bigint, n_rows_out bigint"
        )
    new_lineage = (
        fps.where(F.col(PART_COL).isin(todo))
        .join(row_counts, on=PART_COL, how="left")
        .na.fill({"n_rows_out": 0})
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            F.col(PART_COL),
            "n_conversations",
            "n_turns",
            "n_rows_out",
            F.lit("done").alias("status"),
            "input_fingerprint",
        )
    )
    new_lineage.write.mode("append").parquet(os.path.join(out_dir, LINEAGE_DIR))
    summary["n_rows_out"] = sum(r["n_rows_out"] for r in row_counts.collect())
    return summary


def read_stage(spark: SparkSession, out_dir: str, stage: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "data", stage))
