"""Reference-format JSONL source/sink (SURVEY.md §2 A1/A2).

The reference reads/writes one JSON document per line with fields
{doc_key, dataset, sentences, ner, relations, clusters, events, weight, _*}
(reference: doc/data.md:17-91; reader document.py:77-85, writer 87-91).
This module round-trips that format against the engine's turns/document
DataFrames so a reference-corpus fixture can flow through the Spark
pipeline and predictions can be emitted in the reference's shape
(predicted_* fields per doc/data.md:108-116).

Everything is `from_json`/`to_json` + explode — JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

DOC_JSON_SCHEMA = T.StructType(
    [
        T.StructField("doc_key", T.StringType(), False),
        T.StructField("dataset", T.StringType(), True),
        T.StructField("sentences", T.ArrayType(T.ArrayType(T.StringType())), False),
        T.StructField(
            "ner",
            T.ArrayType(T.ArrayType(T.ArrayType(T.StringType()))),  # [start, end, label]
            True,
        ),
        T.StructField(
            "relations",
            T.ArrayType(T.ArrayType(T.ArrayType(T.StringType()))),  # [s1,e1,s2,e2,label]
            True,
        ),
        T.StructField(
            "clusters",
            T.ArrayType(T.ArrayType(T.ArrayType(T.LongType()))),  # [[start,end],...]
            True,
        ),
        T.StructField("weight", T.DoubleType(), True),
    ]
)


def read_jsonl_docs(spark: SparkSession, path: str) -> DataFrame:
    """A1 — one JSON doc per line → document rows."""
    return spark.read.schema(DOC_JSON_SCHEMA).json(path)


def docs_to_turns(docs: DataFrame) -> DataFrame:
    """Reference documents → engine turns (one turn per sentence).

    Mirrors the transcript mapping: doc_key = conv_id, sentence index =
    turn_idx; tokens joined by single spaces (per-turn text equality is
    preserved because reference tokens never contain spaces —
    doc/data.md:29 bans empty tokens)."""
    return docs.select(
        F.col("doc_key").alias("conv_id"),
        F.coalesce(F.col("dataset"), F.lit("transcripts")).alias("dataset"),
        F.posexplode("sentences").alias("turn_idx", "tokens"),
    ).select(
        "conv_id",
        F.col("turn_idx").cast("int"),
        F.lit(None).cast("string").alias("role"),
        F.array_join("tokens", " ").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
        "dataset",
    )


def turns_to_doc_json(turns: DataFrame, dataset: str = "transcripts") -> DataFrame:
    """B2 + A2 — turns → one JSON line per document (column `json`)."""
    packed = (
        turns.withColumn("tokens", F.split("text", " "))
        .groupBy("conv_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("turn_idx", "tokens"))).alias("_t")
        )
        .select(
            F.to_json(
                F.struct(
                    F.col("conv_id").alias("doc_key"),
                    F.lit(dataset).alias("dataset"),
                    F.expr("transform(_t, x -> x.tokens)").alias("sentences"),
                )
            ).alias("json")
        )
    )
    return packed


def write_jsonl_docs(turns: DataFrame, path: str, dataset: str = "transcripts") -> None:
    """A2 — JSONL sink (one doc per line). Text-file write so golden files
    diff cleanly against reference-produced JSONL."""
    turns_to_doc_json(turns, dataset).coalesce(1).write.mode("overwrite").text(path)


def _sentence_offsets(docs: DataFrame) -> DataFrame:
    """(doc_key, sent_ix, sentence_start, n_tokens) via the B1 cumsum."""
    from pyspark.sql import Window

    sent = docs.select(
        "doc_key", F.posexplode("sentences").alias("sent_ix", "tokens")
    ).withColumn("n_tokens", F.size("tokens"))
    w = Window.partitionBy("doc_key").orderBy("sent_ix").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return sent.withColumn(
        "sentence_start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    ).select("doc_key", "sent_ix", "sentence_start", "n_tokens")


def gold_relations_from_docs(docs: DataFrame) -> DataFrame:
    """Reference-format gold relations ([s1,e1,s2,e2,label] with DOC-level
    indices per sentence, doc/data.md:44-51) → turn-relative rows."""
    offs = _sentence_offsets(docs)
    rel = docs.select(
        "doc_key", F.posexplode("relations").alias("sent_ix", "sent_rel")
    ).select("doc_key", "sent_ix", F.explode("sent_rel").alias("r"))
    return rel.join(offs, on=["doc_key", "sent_ix"]).select(
        F.col("doc_key").alias("conv_id"),
        F.col("sent_ix").cast("int").alias("turn_idx"),
        (F.col("r")[0].cast("int") - F.col("sentence_start")).cast("int").alias("subj_start"),
        (F.col("r")[1].cast("int") - F.col("sentence_start")).cast("int").alias("subj_end"),
        (F.col("r")[2].cast("int") - F.col("sentence_start")).cast("int").alias("obj_start"),
        (F.col("r")[3].cast("int") - F.col("sentence_start")).cast("int").alias("obj_end"),
        F.col("r")[4].alias("label"),
    )


def gold_clusters_from_docs(docs: DataFrame) -> DataFrame:
    """Reference-format coref clusters (doc-level spans, cross-sentence;
    cluster id = list index, doc/data.md:52-62) → located turn-relative
    member rows; members crossing a sentence boundary are dropped exactly
    like the reference (document.py:685-689) via the B3 range join."""
    offs = _sentence_offsets(docs)
    members = docs.select(
        "doc_key", F.posexplode("clusters").alias("cluster_id", "members")
    ).select("doc_key", "cluster_id", F.explode("members").alias("m"))
    located = members.join(offs, on="doc_key").where(
        (F.col("m")[0] >= F.col("sentence_start"))
        & (F.col("m")[1] <= F.col("sentence_start") + F.col("n_tokens") - 1)
    )
    return located.select(
        F.col("doc_key").alias("conv_id"),
        F.col("cluster_id").cast("bigint"),
        F.col("sent_ix").cast("int").alias("turn_idx"),
        (F.col("m")[0] - F.col("sentence_start")).cast("int").alias("start"),
        (F.col("m")[1] - F.col("sentence_start")).cast("int").alias("end"),
    )


def predictions_to_doc_json(
    turns: DataFrame,
    mentions: DataFrame | None = None,
    triples: DataFrame | None = None,
    dataset: str = "transcripts",
) -> DataFrame:
    """E8 — merge predictions back onto per-document JSON in the reference's
    prediction format: per-sentence ``predicted_ner`` = [start, end, label,
    raw_score, softmax_score] with DOC-LEVEL offsets, ``predicted_relations``
    = [s1, e1, s2, e2, label, raw, softmax]
    (reference: dygie/models/dygie.py:289-334; format doc/data.md:108-116;
    scores rounded to 4 decimals per document.py:10-11).
    """
    from dygiepp_spark.operators.assembly import with_sentence_starts

    base = with_sentence_starts(turns).select(
        "conv_id", "turn_idx", "text", "sentence_start"
    )

    def _nest(pred: DataFrame, cols: list, name: str) -> DataFrame:
        per_turn = pred.groupBy("conv_id", "turn_idx").agg(
            F.sort_array(F.collect_list(F.array(*cols))).alias(name)
        )
        return per_turn

    df = base
    if mentions is not None:
        m = mentions.join(
            base.select("conv_id", "turn_idx", "sentence_start"),
            on=["conv_id", "turn_idx"],
        )
        nested = _nest(
            m,
            [
                (F.col("start") + F.col("sentence_start")).cast("string"),
                (F.col("end") + F.col("sentence_start")).cast("string"),
                F.col("label"),
                F.round("raw_score", 4).cast("string"),
                F.round("softmax_score", 4).cast("string"),
            ],
            "predicted_ner",
        )
        df = df.join(nested, on=["conv_id", "turn_idx"], how="left")
    if triples is not None:
        t = triples.join(
            base.select("conv_id", "turn_idx", "sentence_start"),
            on=["conv_id", "turn_idx"],
        )
        nested = _nest(
            t,
            [
                (F.col("subj_start") + F.col("sentence_start")).cast("string"),
                (F.col("subj_end") + F.col("sentence_start")).cast("string"),
                (F.col("obj_start") + F.col("sentence_start")).cast("string"),
                (F.col("obj_end") + F.col("sentence_start")).cast("string"),
                F.col("pred"),
                F.round("raw_score", 4).cast("string"),
                F.round("softmax_score", 4).cast("string"),
            ],
            "predicted_relations",
        )
        df = df.join(nested, on=["conv_id", "turn_idx"], how="left")

    packed = df.groupBy("conv_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "turn_idx",
                    F.split("text", " ").alias("tokens"),
                    F.coalesce("predicted_ner", F.array()).alias("pner"),
                    F.coalesce("predicted_relations", F.array()).alias("prel"),
                )
            )
        ).alias("_t")
    )
    return packed.select(
        F.to_json(
            F.struct(
                F.col("conv_id").alias("doc_key"),
                F.lit(dataset).alias("dataset"),
                F.expr("transform(_t, x -> x.tokens)").alias("sentences"),
                F.expr("transform(_t, x -> x.pner)").alias("predicted_ner"),
                F.expr("transform(_t, x -> x.prel)").alias("predicted_relations"),
            )
        ).alias("json"),
        F.col("conv_id"),
    )


def gold_ner_from_docs(docs: DataFrame) -> DataFrame:
    """Explode reference-format gold NER ([doc-level start, end, label] per
    sentence, doc/data.md:35-43) into engine mention rows with turn-relative
    offsets (uses the sentence-offset cumsum, B1)."""
    sent = docs.select(
        "doc_key",
        F.posexplode("sentences").alias("sent_ix", "tokens"),
    ).withColumn("n_tokens", F.size("tokens"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_key").orderBy("sent_ix").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = sent.withColumn(
        "sentence_start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    ).select("doc_key", "sent_ix", "sentence_start")

    ner = docs.select(
        "doc_key", F.posexplode("ner").alias("sent_ix", "sent_ner")
    ).select("doc_key", "sent_ix", F.explode("sent_ner").alias("m"))
    return ner.join(offs, on=["doc_key", "sent_ix"]).select(
        F.col("doc_key").alias("conv_id"),
        F.col("sent_ix").cast("int").alias("turn_idx"),
        (F.col("m")[0].cast("int") - F.col("sentence_start")).cast("int").alias("start"),
        (F.col("m")[1].cast("int") - F.col("sentence_start")).cast("int").alias("end"),
        F.col("m")[2].alias("label"),
    )
