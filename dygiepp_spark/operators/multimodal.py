"""Multimodal column plumbing: opaque binary payloads with typed metadata,
decoded/feature-extracted via Arrow-batched pandas UDFs over mapInPandas.

The Spark-side architecture is real and tested — binary columns, schemas,
batching, partitioning, UDF signatures. The actual media decode is a
clearly-marked deterministic STAND-IN (`fake=True` default) because no
image/audio libraries exist in this container; `fake=False` raises
NotImplementedError where a real decoder (PIL/torchaudio/ffmpeg) would
plug in. At 100 TB the pattern matters: binary stays columnar-compressed
in parquet/Iceberg, decode happens executor-side per Arrow batch, feature
vectors come back as array<float> — no driver involvement, no per-row
Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from dygiepp_spark.functions.hashing import char_hash_sql


def attach_binary(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Simulate a media column: utf-8 payload bytes + typed metadata.
    (In production this column comes from the lakehouse table directly.)"""
    return docs.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


def binary_metadata(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Typed metadata over the opaque payload: byte length + integer
    checksum — pure column expressions, oracle-checkable."""
    withbin = attach_binary(docs, id_col, text_col)
    return withbin.select(
        "doc_id",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.expr(char_hash_sql("CAST(payload AS STRING)", "spark")).alias("checksum"),
    )


_FEATURE_DIM = 8


def decode_features(
    media: DataFrame, fake: bool = True, batch_note: str = "image"
) -> DataFrame:
    """Decode + feature-extract per Arrow batch.

    Output: (doc_id, width, height, features array<float>). With
    ``fake=True`` the decode is a deterministic stand-in (dimensions from
    byte length, features from the first bytes); ``fake=False`` is the
    production slot for a real decoder.
    """
    if not fake:
        raise NotImplementedError(
            f"real {batch_note} decode requires media libraries not present "
            "in this environment; plug a decoder into _decode_batch"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payloads = pdf["payload"]
            n_bytes = payloads.map(len).to_numpy()
            feats = np.zeros((len(pdf), _FEATURE_DIM), dtype=np.float32)
            for i, p in enumerate(payloads):
                head = np.frombuffer(bytes(p[:_FEATURE_DIM]), dtype=np.uint8)
                feats[i, : len(head)] = head / 255.0
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": (n_bytes % 64 + 1).astype("int64"),
                    "height": (n_bytes % 48 + 1).astype("int64"),
                    "features": list(feats),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        fn, schema="doc_id long, width long, height long, features array<float>"
    )


def decode_check(media: DataFrame) -> DataFrame:
    """Scalar evidence over the DECODE OUTPUT, for the oracle gate: the
    rows-only `multimodal_decode` query emits array<float> features (not
    portable through the gate's value hash), so this twin re-derives
    hash-exact integers FROM the mapInPandas decode itself — width, height,
    and each feature quantized as round(1e6·f). The stand-in decode is
    byte arithmetic (f_i = byte_i/255 as float32), which DuckDB replicates
    from hex digits of the utf-8 payload — so a wrong batch shape, byte
    order, or padding bug in the UDF breaks the hash. The production
    (fake=False) decoder keeps only the rows-only check, as real media
    decoding has no SQL twin."""
    feats = decode_features(media)
    qcols = [
        F.round(F.lit(1_000_000.0) * F.col("features")[i])
        .cast("bigint")
        .alias(f"f{i}_q")
        for i in range(_FEATURE_DIM)
    ]
    return feats.select("doc_id", "width", "height", *qcols)


def frame_sample(media: DataFrame, every_n_bytes: int = 32, fake: bool = True) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled 'frame' (byte
    window stand-in). Shows the 1→N mapInPandas fan-out shape used for
    video frame extraction."""
    if not fake:
        raise NotImplementedError("real video frame sampling not available here")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for fi, off in enumerate(range(0, len(b), every_n_bytes)):
                    chunk = b[off : off + every_n_bytes]
                    rows.append((doc_id, fi, len(chunk), float(sum(chunk)) / max(len(chunk), 1)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_ix", "n_bytes", "mean_byte"]
            )

    return media.select("doc_id", "payload").mapInPandas(
        fn, schema="doc_id long, frame_ix long, n_bytes long, mean_byte double"
    )
