"""Output sinks (SURVEY.md §2 A2/A3).

The production sink is an Iceberg table partitioned by a bucket of
conv_id; this sandbox writes the exact same layout as parquet (swap
`write.partitionBy(...).parquet(path)` for
`writeTo(table).partitionedBy(bucket(N, "conv_id")).createOrReplace()` —
semantics identical). Partition count is a knob: at 10^12 turns you want
O(10^3-10^4) buckets so per-partition files stay in the GB range.

Writes sort within partitions by the natural key so output files are
deterministic run-to-run (the reference's bitwise-determinism goal,
SURVEY.md appendix) and range-readable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BUCKET_COL = "bucket"


def with_bucket(df: DataFrame, n_buckets: int, key: str = "conv_id") -> DataFrame:
    return df.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(key), F.lit(n_buckets)).cast("int")
    )


def write_triples(
    triples: DataFrame, path: str, n_buckets: int = 64, mode: str = "overwrite"
) -> None:
    """A3 — triples table (subj, pred, obj, conv_id, scores, provenance)
    partitioned by hash(conv_id) bucket."""
    out = with_bucket(triples, n_buckets)
    (
        out.repartition(BUCKET_COL)
        .sortWithinPartitions("conv_id", "turn_idx", "subj_start", "obj_start")
        .write.mode(mode)
        .partitionBy(BUCKET_COL)
        .parquet(path)
    )


def write_canonical_triples(canonical: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Canonical triple store: small relative to the corpus; partition by
    predicate so common query patterns (per-relation scans) prune."""
    (
        canonical.repartition("pred")
        .sortWithinPartitions("subj_canonical", "obj_canonical")
        .write.mode(mode)
        .partitionBy("pred")
        .parquet(path)
    )


def write_mentions(
    mentions: DataFrame, path: str, n_buckets: int = 64, mode: str = "overwrite"
) -> None:
    out = with_bucket(mentions, n_buckets)
    (
        out.repartition(BUCKET_COL)
        .sortWithinPartitions("conv_id", "turn_idx", "start", "end")
        .write.mode(mode)
        .partitionBy(BUCKET_COL)
        .parquet(path)
    )


def write_predictions_jsonl(
    json_docs: DataFrame, path: str, n_files: int = 16, mode: str = "overwrite"
) -> None:
    """A3 — the reference's prediction artifact (one JSON doc per line,
    doc/data.md:108-116; `allennlp predict` output), produced by
    predictions_to_doc_json. Range-partitioned by doc key and sorted
    within partitions so the file contents are deterministic run-to-run;
    `n_files` bounds file count at corpus scale (10^3-10^4 for 10^12
    turns, like the parquet sinks)."""
    (
        json_docs.repartitionByRange(n_files, "conv_id")
        .sortWithinPartitions("conv_id")
        .select("json")
        .write.mode(mode)
        .text(path)
    )
