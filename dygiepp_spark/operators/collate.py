"""Table-level collate / uncollate (SURVEY.md §2 B6/B7).

The reference packs sentences from many documents into pseudo-documents so
batch compute is length-homogeneous (scripts/data/shared/collate.py:26-66,
cost model n_sents × longest_len²; cap max_sentences_per_doc=16), tagging
each sentence with its origin (`_orig_doc_key`, `_orig_sent_ix`);
uncollate restores the original corpus (uncollate.py:53-94, with a
missing-sentence check).

Distributed formulation: rank turns WITHIN their exact token-length group
(the window partitions by n_tokens, so ranking parallelizes over length
groups — a global sort would be one task); pseudo-doc =
(n_tokens, floor(rank / max_sentences)). Pseudo-docs are then exactly
length-homogeneous, which is a strictly stronger version of the
reference's sort-by-length objective. The in-UDF analogue
(inference.batching) does the same inside each Arrow batch; this operator
exists for pipelines that materialize collated corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dygiepp_spark.operators.assembly import with_token_counts


def collate(
    turns: DataFrame,
    max_sentences_per_doc: int = 16,
    max_spans_per_doc: int | None = None,
) -> DataFrame:
    """Assign each turn to a pseudo-doc. Output keeps the origin columns
    (orig_conv_id, orig_turn_idx) exactly like the reference's tags.

    ``max_spans_per_doc`` adds the reference's span-budget cost model
    (collate.py:33-40, default 50000 there): a doc of n sentences of the
    longest length L costs n·L² candidate spans. Because our pseudo-docs
    are exactly length-homogeneous, the budget reduces to a per-length-group
    sentence cap min(max_sentences, floor(max_spans / L²)) — one column
    expression, no change to the shuffle structure (still a single
    rank-within-length-group window)."""
    df = with_token_counts(turns)
    cap = F.lit(max_sentences_per_doc)
    if max_spans_per_doc is not None:
        cap = F.greatest(
            F.lit(1),
            F.least(
                cap,
                F.floor(F.lit(max_spans_per_doc) / (F.col("n_tokens") * F.col("n_tokens"))),
            ),
        )
    w = Window.partitionBy("n_tokens").orderBy(
        F.col("conv_id").asc(), F.col("turn_idx").asc()
    )
    ranked = df.withColumn("_rank", F.row_number().over(w) - 1).withColumn("_cap", cap)
    return ranked.select(
        F.concat_ws(
            "_",
            F.lit("pseudo"),
            F.col("n_tokens").cast("string"),
            F.floor(F.col("_rank") / F.col("_cap")).cast("string"),
        ).alias("pseudo_doc_key"),
        (F.col("_rank") % F.col("_cap")).cast("int").alias("pseudo_sent_ix"),
        F.col("conv_id").alias("orig_conv_id"),
        F.col("turn_idx").alias("orig_turn_idx"),
        "text",
        "n_tokens",
    )


def uncollate(collated: DataFrame) -> DataFrame:
    """Restore the original (conv_id, turn_idx, text) corpus; the
    completeness check (reference uncollate.py:78-86 errors on missing
    sentences) surfaces as `is_dense` = turn indices form 0..max."""
    out = collated.select(
        F.col("orig_conv_id").alias("conv_id"),
        F.col("orig_turn_idx").alias("turn_idx"),
        "text",
    )
    check = out.groupBy("conv_id").agg(
        (F.count(F.lit(1)) == F.max("turn_idx") + 1).alias("is_dense")
    )
    return out.join(check, on="conv_id")
