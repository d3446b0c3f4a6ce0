"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow batch shapes, partitioning,
UDF signatures — while the actual media decode is stubbed (no image/audio
libraries in this environment): ``decode_image`` raises NotImplementedError
behind a clearly-marked gate, and ``fake_feature_extract`` produces a
deterministic feature vector from the bytes so downstream operators
(similarity, dedup) can be exercised end-to-end.

At 100 TB the pattern is: binary column + metadata struct in parquet
(column pruning means metadata-only queries never read the payload bytes);
decode/resize/frame-sample run as mapInPandas over Arrow batches, sized by
``spark.sql.execution.arrow.maxRecordsPerBatch`` to bound executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "attach_binary_payload",
    "binary_metadata",
    "decode_image",
    "fake_feature_extract",
    "frame_sample_plan",
]

# Flip when a real decoder (PIL / torchaudio / pyav) is on the executors.
MEDIA_DECODERS_AVAILABLE = False


def attach_binary_payload(df: DataFrame, source_col: str = "text", payload_col: str = "payload") -> DataFrame:
    """Deterministic fake payload: utf-8 bytes of a source column, plus a
    media_type tag. Stands in for real image/audio bytes in tests."""
    return df.withColumn(payload_col, F.encode(F.col(source_col), "utf-8")).withColumn(
        "media_type", F.lit("application/fake")
    )


def binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata extracted JVM-side — no Python, no payload decode:
    byte length, first byte, md5 of the payload."""
    return (
        df.withColumn("byte_len", F.length(F.col(payload_col)))
        .withColumn("payload_md5", F.md5(F.col(payload_col)))
    )


def decode_image(df: DataFrame, payload_col: str = "payload", out_col: str = "pixels"):
    """Decode binary image payloads to pixel arrays (STUB).

    The mapInPandas plumbing below is the real production shape; only the
    decode call itself is gated.
    """
    if not MEDIA_DECODERS_AVAILABLE:
        raise NotImplementedError(
            "media decoders not available in this environment; "
            "use fake_feature_extract for pipeline testing"
        )
    # pragma: no cover — real decoder path
    def decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raise NotImplementedError

    return df.mapInPandas(decode, schema=f"{out_col} array<int>")


def fake_feature_extract(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id", dim: int = 8
) -> DataFrame:
    """Deterministic 'feature extraction': dim floats derived from the md5
    of the payload bytes. Real Arrow-batched mapInPandas over binary —
    the exact shape a CLIP/audio embedder runs in, minus the model."""

    def extract(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            feats = []
            for payload in pdf[payload_col]:
                h = hashlib.md5(bytes(payload)).digest()
                vals = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
                feats.append((vals.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32).tolist())
            yield pd.DataFrame({id_col: ids, "feature": feats})

    return df.select(id_col, payload_col).mapInPandas(
        extract, schema=f"{id_col} long, feature array<float>"
    )


def frame_sample_plan(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n_bytes: int = 64,
) -> DataFrame:
    """'Frame sampling' stand-in: one row per sampled offset of the payload
    (what video frame extraction produces: (id, frame_no, frame_bytes)).
    JVM-side: sequence + transform over the binary, no Python."""
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, greatest(cast(floor((length({payload_col}) - 1) / {every_n_bytes}) as int), 0)), "
                f"i -> substring({payload_col}, i * {every_n_bytes} + 1, {every_n_bytes}))"
            )
        ).alias("frame_no", "frame_bytes"),
    )
