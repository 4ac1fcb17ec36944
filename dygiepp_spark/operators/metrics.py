"""Micro P/R/F1 metric aggregations (SURVEY.md §2.F).

Reference math: p = matched/predicted, r = matched/gold,
f1 = 2pr/(p+r), all zero-safe (dygie/training/f1.py:6-17). Matching is an
inner join on task-specific keys: NER (doc, sent, span) + label
(ner_metrics.py:30-36), relations both spans + label — the triple-match
criterion (relation_metrics.py:19-27, README.md:419-424), triggers offset
[+ label], arguments (span, event_type, role) (event_metrics.py:47-89).

All metrics are single-pass groupBy aggregations with map-side combine; the
pred↔gold joins run under AQE with skew splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def micro_prf(
    pred: DataFrame,
    gold: DataFrame,
    keys: list[str],
    dataset: str = "transcripts",
    task: str = "ner",
) -> DataFrame:
    """One metrics row: counts + P/R/F1 (rounded to 4 decimals, matching the
    reference's score rounding convention, document.py:10-11)."""
    p = pred.select(*keys).distinct()
    g = gold.select(*keys).distinct()
    m = p.join(g, on=keys, how="inner")
    counts = (
        p.agg(F.count(F.lit(1)).alias("n_pred"))
        .crossJoin(g.agg(F.count(F.lit(1)).alias("n_gold")))
        .crossJoin(m.agg(F.count(F.lit(1)).alias("n_matched")))
    )
    prec = F.when(F.col("n_pred") > 0, F.col("n_matched") / F.col("n_pred")).otherwise(0.0)
    rec = F.when(F.col("n_gold") > 0, F.col("n_matched") / F.col("n_gold")).otherwise(0.0)
    return counts.select(
        F.lit(dataset).alias("dataset"),
        F.lit(task).alias("task"),
        F.col("n_pred").cast("bigint"),
        F.col("n_gold").cast("bigint"),
        F.col("n_matched").cast("bigint"),
        F.round(prec, 4).alias("precision"),
        F.round(rec, 4).alias("recall"),
        F.round(
            F.when(
                (prec + rec) > 0, 2 * prec * rec / (prec + rec)
            ).otherwise(0.0),
            4,
        ).alias("f1"),
    )


def per_namespace_metrics(pred: DataFrame, gold: DataFrame, keys: list[str]) -> DataFrame:
    """F7 — metric fan-out per (dataset, task) namespace plus a MEAN__ row
    (reference: dygie/models/dygie.py:336-366). Inputs must carry
    `dataset` and `task` columns."""
    join_keys = ["dataset", "task", *keys]
    p = pred.select(*join_keys).distinct()
    g = gold.select(*join_keys).distinct()
    m = p.join(g, on=join_keys, how="inner")

    def counts(df: DataFrame, name: str) -> DataFrame:
        return df.groupBy("dataset", "task").agg(F.count(F.lit(1)).alias(name))

    joined = (
        counts(p, "n_pred")
        .join(counts(g, "n_gold"), on=["dataset", "task"], how="full")
        .join(counts(m, "n_matched"), on=["dataset", "task"], how="full")
        .na.fill(0)
    )
    prec = F.when(F.col("n_pred") > 0, F.col("n_matched") / F.col("n_pred")).otherwise(0.0)
    rec = F.when(F.col("n_gold") > 0, F.col("n_matched") / F.col("n_gold")).otherwise(0.0)
    per_ns = joined.select(
        "dataset",
        "task",
        F.col("n_pred").cast("bigint"),
        F.col("n_gold").cast("bigint"),
        F.col("n_matched").cast("bigint"),
        F.round(prec, 4).alias("precision"),
        F.round(rec, 4).alias("recall"),
        F.round(
            F.when((prec + rec) > 0, 2 * prec * rec / (prec + rec)).otherwise(0.0), 4
        ).alias("f1"),
    )
    mean_row = per_ns.groupBy().agg(
        F.lit("MEAN__").alias("dataset"),
        F.lit("all").alias("task"),
        F.sum("n_pred").cast("bigint").alias("n_pred"),
        F.sum("n_gold").cast("bigint").alias("n_gold"),
        F.sum("n_matched").cast("bigint").alias("n_matched"),
        F.round(F.avg("precision"), 4).alias("precision"),
        F.round(F.avg("recall"), 4).alias("recall"),
        F.round(F.avg("f1"), 4).alias("f1"),
    )
    return per_ns.unionByName(mean_row)


def multi_trigger_stats(arguments: DataFrame) -> DataFrame:
    """F8 — fraction of argument spans attached to more than one trigger
    (reference event_metrics.py:126-163)."""
    per_arg = arguments.groupBy("conv_id", "turn_idx", "arg_start", "arg_end").agg(
        F.countDistinct("trigger_ix").alias("n_triggers")
    )
    return per_arg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_args"),
        F.sum(F.when(F.col("n_triggers") > 1, 1).otherwise(0)).cast("bigint").alias("n_multi"),
        F.round(F.avg(F.when(F.col("n_triggers") > 1, 1.0).otherwise(0.0)), 4).alias(
            "multi_frac"
        ),
    )
