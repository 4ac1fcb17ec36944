"""Beam pruning (SURVEY.md §2.D4).

The reference keeps the top ceil(spans_per_word × sentence_length) spans per
sentence by a unary mention score, then RE-SORTS survivors by original span
order because downstream antecedent indexing is positional
(reference: dygie/models/entity_beam_pruner.py:55-192, order restore at
150-171; per-task ratios template.libsonnet:88-106, caps events.py:143-162).

Tie-breaking: torch.topk tie order is framework-specific, so parity is
defined on deterministic tie-breaks (score DESC, start ASC, end ASC) —
SURVEY.md §7 hard-part 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def prune_topk(
    spans: DataFrame,
    spans_per_word: float,
    min_keep: int = 1,
    cap: int | None = None,
    score_col: str = "raw_score",
) -> DataFrame:
    """Keep top-k spans per (conv_id, turn_idx), k = clamp(ceil(ratio·n_tokens)).

    Requires columns: n_tokens, start, end, `score_col`. Output keeps a
    `beam_rank` (1-based, score order) and is re-sorted by (start, end) via
    an explicit ordering column so downstream positional ops see original
    order (reference entity_beam_pruner.py:166-171).
    """
    k = F.greatest(
        F.lit(min_keep),
        F.ceil(F.lit(spans_per_word) * F.col("n_tokens")).cast("int"),
    )
    if cap is not None:
        k = F.least(k, F.lit(cap))
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.col(score_col).desc(), F.col("start").asc(), F.col("end").asc()
    )
    pruned = (
        spans.withColumn("beam_rank", F.row_number().over(w))
        .where(F.col("beam_rank") <= k)
        .drop()
    )
    # order-restore rank: position of the surviving span in original order
    w_pos = Window.partitionBy("conv_id", "turn_idx").orderBy("start", "end")
    return pruned.withColumn("span_order", F.row_number().over(w_pos))


def antecedent_pairs(pruned_spans: DataFrame, max_antecedents: int = 100) -> DataFrame:
    """D8 — candidate antecedents: for the i-th surviving span (document
    order), candidates are the previous min(max_antecedents, i) spans
    (reference: dygie/models/coref.py:471-526; max_antecedents=100 from
    template.libsonnet:91).

    Input must carry a doc-level position; we compute doc_rank over
    (conv_id) ordered by (turn_idx, start, end). The pair generation is a
    bounded-offset self-join on rank — a range join that stays
    partition-local per conversation.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "start", "end")
    ranked = pruned_spans.withColumn("doc_rank", F.row_number().over(w))
    # Linear formulation: each span EXPLODES its ≤max_antecedents candidate
    # ranks, then two equi-joins on (conv_id, rank) resolve the endpoints.
    # A join-then-range-filter would be a per-conversation cross join —
    # O(k²) per conv, a straggler bomb on mega-conversations; this is
    # O(k·max_antecedents) with plain hash joins.
    cand = ranked.where(F.col("doc_rank") > 1).select(
        F.col("conv_id").alias("c_conv"),
        F.col("doc_rank").alias("a_rank"),
        F.explode(
            F.sequence(
                F.greatest(F.col("doc_rank") - max_antecedents, F.lit(1)),
                F.col("doc_rank") - 1,
            )
        ).alias("b_rank"),
    )
    a = ranked.alias("a")
    b = ranked.alias("b")
    return (
        cand.join(
            a, (F.col("c_conv") == F.col("a.conv_id")) & (F.col("a_rank") == F.col("a.doc_rank"))
        )
        .join(
            b, (F.col("c_conv") == F.col("b.conv_id")) & (F.col("b_rank") == F.col("b.doc_rank"))
        )
        .select(
            F.col("c_conv").alias("conv_id"),
            F.col("a.turn_idx").alias("turn_idx"),
            F.col("a.start").alias("start"),
            F.col("a.end").alias("end"),
            F.col("a.doc_rank").alias("doc_rank"),
            F.col("b.turn_idx").alias("ant_turn_idx"),
            F.col("b.start").alias("ant_start"),
            F.col("b.end").alias("ant_end"),
            F.col("b.doc_rank").alias("ant_doc_rank"),
            (F.col("a.doc_rank") - F.col("b.doc_rank")).cast("int").alias("offset"),
        )
    )


def distance_bucket_expr(o) -> F.Column:
    """Column-input variant of distance_bucket."""
    return (
        F.when(o <= 4, o)
        .when(o <= 7, F.lit(5))
        .when(o <= 15, F.lit(6))
        .when(o <= 31, F.lit(7))
        .when(o <= 63, F.lit(8))
        .otherwise(F.lit(9))
        .cast("int")
    )


def distance_bucket(offset_col: str = "offset") -> F.Column:
    """Reference's 10-bucket log distance embedding index
    (util.bucket_values semantics: [1,2,3,4,5-7,8-15,16-31,32-63,64+] style).
    """
    o = F.col(offset_col)
    return (
        F.when(o <= 4, o)
        .when(o <= 7, F.lit(5))
        .when(o <= 15, F.lit(6))
        .when(o <= 31, F.lit(7))
        .when(o <= 63, F.lit(8))
        .otherwise(F.lit(9))
        .cast("int")
    )
