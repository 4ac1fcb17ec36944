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


def prune_topk_local(
    turns: DataFrame,
    spans_per_word: float,
    min_keep: int = 1,
    cap: int | None = None,
    cfg=None,
) -> DataFrame:
    """Fused enumerate→score→prune, scan-local (r7): the row formulation
    shuffled the FULL enumerated span table (surfaces included — ~50 MB at
    sf0.1 for 5 k turns) into a row_number window and then a second window
    for the order restore. But the beam group key (conv, turn) IS the input
    row key, so top-k per turn is array algebra on the same row: enumerate
    span structs, array_sort by (−score, start, end), slice k, index for
    beam_rank, re-sort by (start, end), index for span_order. ZERO
    shuffles, identical rows (same dyadic score expression, same
    deterministic tie-breaks — spans are unique per (start, end)).

    Output matches ``prune_topk(scored_enumerated_spans, ...)``:
    (conv_id, turn_idx, n_tokens, start, end, surface, width, raw_score,
    beam_rank, span_order)."""
    from dygiepp_spark.config import PipelineConfig
    from dygiepp_spark.functions import scoring

    cfg = cfg or PipelineConfig()
    w = cfg.max_span_width
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)

    def _span(s, e):
        surface = F.array_join(F.slice(toks, s + 1, e - s + 1), " ")
        width = (e - s + 1).cast("int")
        return F.struct(
            (-scoring.raw_score_col(surface, width)).alias("_neg"),
            s.cast("int").alias("start"),
            e.cast("int").alias("end"),
            surface.alias("surface"),
        )

    spans_arr = F.flatten(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda s: F.transform(
                F.sequence(s, F.least(s + F.lit(w - 1), n - 1)),
                lambda e: _span(s, e),
            ),
        )
    )
    k = F.greatest(
        F.lit(min_keep), F.ceil(F.lit(spans_per_word) * n).cast("int")
    )
    if cap is not None:
        k = F.least(k, F.lit(cap))
    beam = F.transform(
        F.slice(F.array_sort(spans_arr), F.lit(1), k),
        lambda x, i: F.struct(
            x["start"].alias("start"),
            x["end"].alias("end"),
            x["surface"].alias("surface"),
            (i + 1).cast("int").alias("beam_rank"),
        ),
    )
    restored = F.transform(
        F.array_sort(beam),
        lambda x, i: F.struct(
            x["start"], x["end"], x["surface"], x["beam_rank"],
            (i + 1).cast("int").alias("span_order"),
        ),
    )
    width = (F.col("end") - F.col("start") + 1).cast("int")
    return (
        turns.select(
            "conv_id",
            "turn_idx",
            n.cast("int").alias("n_tokens"),
            F.explode(restored).alias("sp"),
        )
        .select("conv_id", "turn_idx", "n_tokens", "sp.*")
        .select(
            "conv_id",
            "turn_idx",
            "n_tokens",
            "start",
            "end",
            "surface",
            width.alias("width"),
            scoring.raw_score_col(F.col("surface"), width).alias("raw_score"),
            "beam_rank",
            "span_order",
        )
    )


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
