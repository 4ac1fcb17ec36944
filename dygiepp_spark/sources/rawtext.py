"""Raw-text source (SURVEY.md §2 A6).

The reference converts a directory of .txt files into documents by spaCy
sentence/token splitting (scripts/new-dataset/format_new_dataset.py:12-31).
Engine analogue: `spark.read.text` with file provenance, a deterministic
regex sentence splitter, whitespace tokenization — pure column expressions
(the reference's spaCy pass becomes a pandas-UDF slot when real NLP
splitting is needed; the plumbing here is the same either way).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_raw_text(spark: SparkSession, path: str) -> DataFrame:
    """Directory of .txt files → turns table: one conversation per file
    (doc_key = file stem), one turn per sentence (split on [.?!] followed
    by whitespace), text normalized to single-spaced tokens."""
    lines = (
        spark.read.text(path)
        .withColumn("_file", F.input_file_name())
        .groupBy("_file")
        .agg(F.concat_ws(" ", F.collect_list("value")).alias("full_text"))
    )
    sentences = lines.select(
        F.regexp_extract(F.col("_file"), r"([^/]+)\.txt$", 1).alias("conv_id"),
        F.posexplode(
            F.filter(
                F.split(F.col("full_text"), r"(?<=[.?!])\s+"),
                lambda s: F.trim(s) != "",
            )
        ).alias("turn_idx", "raw_sentence"),
    )
    return sentences.select(
        "conv_id",
        F.col("turn_idx").cast("int"),
        F.lit(None).cast("string").alias("role"),
        F.regexp_replace(F.trim(F.col("raw_sentence")), r"\s+", " ").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
