"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Generated DISTRIBUTIVELY — `spark.range` plus pure column expressions, no
driver-side data, no Python RNG — so the same generator scales from unit
tests (10 conversations) to throughput benches (10^9+ turns) and always
produces identical content for a given (n_convs, seed).

Corpus shape: conversation c has 3 + (hash(c) % 18) turns; every
`mega_every`-th conversation is a mega-conversation with `mega_turns` turns
(the skew case the north rule requires handling). Token i of turn t is
vocab[(c·31 + t·17 + i·7 + seed) mod |vocab|] — entity/predicate placements
are therefore known in closed form, which is what the gold-alignment tests
rely on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dygiepp_spark.functions.lexicons import ENTITY_TYPES, MODIFIERS, PREDICATES, STOPWORDS

VOCAB: tuple[str, ...] = tuple(
    sorted(ENTITY_TYPES) + list(PREDICATES) + list(MODIFIERS) + list(STOPWORDS)
)


def synth_turns(
    spark: SparkSession,
    n_convs: int = 100,
    seed: int = 42,
    mega_every: int = 0,
    mega_turns: int = 512,
    tokens_per_turn: int = 12,
) -> DataFrame:
    """Turns table with the input_hint schema. mega_every=0 disables
    mega-conversations; mega_every=k makes every k-th conversation huge."""
    convs = spark.range(n_convs).select(F.col("id").alias("c"))
    n_turns = (F.lit(3) + F.pmod(F.col("c") * 2654435761 + seed, F.lit(18))).cast("int")
    if mega_every:
        n_turns = F.when(
            F.col("c") % mega_every == 0, F.lit(mega_turns)
        ).otherwise(n_turns)
    turns = convs.select(
        "c", F.explode(F.sequence(F.lit(0), n_turns - 1)).alias("t")
    )
    vocab_arr = F.array(*[F.lit(v) for v in VOCAB])
    n_tok = (F.lit(2) + F.pmod(F.col("c") * 7 + F.col("t") * 13 + seed, F.lit(tokens_per_turn - 1))).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(0), n_tok - 1),
        lambda i: F.element_at(
            vocab_arr,
            (F.pmod(F.col("c") * 31 + F.col("t") * 17 + i * 7 + seed, F.lit(len(VOCAB))) + 1).cast("int"),
        ),
    )
    return turns.select(
        F.concat(F.lit("conv"), F.col("c").cast("string")).alias("conv_id"),
        F.col("t").cast("int").alias("turn_idx"),
        F.when(F.col("t") % 2 == 0, F.lit("user")).otherwise(F.lit("assistant")).alias("role"),
        F.array_join(tokens, " ").alias("text"),
        F.when(F.col("t") % 4 == 3, F.lit("search")).alias("tool"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=(F.col("c") * 1000 + F.col("t")).cast("double"))
        ).alias("ts"),
    )


def synth_docs(
    spark: SparkSession,
    n_docs: int = 100_000,
    seed: int = 42,
    dup_every: int = 10,
    tokens_per_doc: int = 40,
) -> DataFrame:
    """Deterministic documents table (doc_id bigint, text string) with
    CONTROLLED near-duplicate structure: every ``dup_every``-th doc copies
    the previous doc's token stream and perturbs its last token, so
    MinHash-LSH near-dup recall is non-trivial at any size. Generated
    distributively (spark.range + column exprs), like synth_turns — the
    same generator serves unit tests and the multi-hundred-thousand-doc
    near-dup bench anchor."""
    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    is_dup = F.col("doc_id") % dup_every == 1
    src = F.when(is_dup, F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    vocab_arr = F.array(*[F.lit(v) for v in VOCAB])
    n_tok = (
        F.lit(tokens_per_doc // 2)
        + F.pmod(src * 2654435761 + seed, F.lit(tokens_per_doc))
    ).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(0), n_tok - 1),
        lambda i: F.element_at(
            vocab_arr,
            (F.pmod(src * 31 + i * 7 + seed, F.lit(len(VOCAB))) + 1).cast("int"),
        ),
    )
    # perturb the dup's tail so pairs are NEAR (Jaccard < 1), not exact
    text = F.when(
        is_dup,
        F.concat(
            F.array_join(F.slice(tokens, 1, F.greatest(n_tok - 1, F.lit(1))), " "),
            F.lit(" perturbed"),
        ),
    ).otherwise(F.array_join(tokens, " "))
    return docs.select("doc_id", text.alias("text"))
