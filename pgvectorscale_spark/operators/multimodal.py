"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow batch shapes, partitioning,
UDF signatures — and so is the decode path for UNCOMPRESSED containers:
``decode_ppm_image`` (binary P6 PPM) and ``decode_wav_audio`` (RIFF/WAVE
PCM) are genuine pure-numpy parsers running in Arrow-batched mapInPandas.
Only compressed-format decode (JPEG/MP3/H.264 — needs PIL/torchaudio/pyav,
absent in this environment) stays behind the ``MEDIA_DECODERS_AVAILABLE``
gate in ``decode_image``; ``fake_feature_extract`` remains the
deterministic stand-in for a learned embedder.

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
    "attach_ppm_payload",
    "attach_wav_payload",
    "binary_metadata",
    "decode_image",
    "decode_ppm_image",
    "decode_wav_audio",
    "fake_feature_extract",
    "frame_sample_plan",
    "parse_ppm",
    "parse_wav",
]

# Flip when a real decoder for COMPRESSED formats (PIL / torchaudio / pyav)
# is on the executors; uncompressed PPM/WAV decode below needs none.
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


# -- pure-numpy container parsers (no media libraries) ------------------------


def parse_ppm(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse a binary (P6) PPM image: returns (width, height, maxval,
    pixels (h, w, 3) uint8). Real parser — whitespace/comment-tolerant
    header, strict payload-length validation — so a torn or mislabeled
    payload fails loudly instead of yielding garbage features."""
    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    if data[:2] != b"P6":
        raise ValueError(f"not a binary PPM (magic {data[:2]!r})")
    # header tokens: magic, width, height, maxval — separated by whitespace,
    # with '#' comments running to end-of-line (netpbm spec)
    pos, tokens = 2, []
    while len(tokens) < 3 and pos < len(data):
        c = data[pos : pos + 1]
        if c == b"#":
            eol = data.find(b"\n", pos)
            pos = len(data) if eol < 0 else eol + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(data) and not data[end : end + 1].isspace():
                end += 1
            tokens.append(data[pos:end])
            pos = end
    if len(tokens) < 3:
        raise ValueError("truncated PPM header")
    width, height, maxval = (int(t) for t in tokens)
    if not (0 < maxval < 65536):
        raise ValueError(f"PPM maxval {maxval} out of range")
    pos += 1  # single whitespace byte after maxval, then raw samples
    bps = 1 if maxval < 256 else 2
    need = width * height * 3 * bps
    body = data[pos : pos + need]
    if len(body) != need:
        raise ValueError(f"PPM payload {len(body)}B, header implies {need}B")
    dt = np.uint8 if bps == 1 else np.dtype(">u2")
    px = np.frombuffer(body, dtype=dt).reshape(height, width, 3)
    return width, height, maxval, px


def parse_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a RIFF/WAVE PCM file: returns (channels, sample_rate,
    samples (n, channels) int16). Walks the chunk list properly (a WAV
    writer may put LIST/INFO chunks before 'data'), validates PCM16."""
    import struct

    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, body = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", payload[:16])
        elif cid == b"data":
            body = payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or body is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (format={audio_format}, bits={bits})")
    n = len(body) // (2 * channels)
    samples = np.frombuffer(body[: n * 2 * channels], dtype="<i2").reshape(n, channels)
    return channels, rate, samples


def _wav_header_hex(data_len: int, rate: int = 8000, channels: int = 1, bits: int = 16) -> str:
    """Canonical 44-byte RIFF/WAVE PCM header for a given payload size."""
    import struct

    block = channels * bits // 8
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + data_len)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, rate, rate * block, block, bits)
        + b"data"
        + struct.pack("<I", data_len)
    )
    return hdr.hex()


# deterministic payload geometry: body bytes tile md5(text) with a stride
# that is COPRIME to the digest length, so each RGB channel sees a DISTINCT
# subset of digest bytes (w*h*3 = 45 = 15 bytes per channel at stride 3 mod
# 16) — a decoder that de-interleaves channels wrong produces different
# means, which the closed-form DuckDB oracle catches.
PPM_W, PPM_H, PPM_MAXVAL = 5, 3, 255
WAV_RATE, WAV_TILE = 8000, 2  # 2 x 16 digest bytes = 16 PCM16 samples


def attach_ppm_payload(df: DataFrame, source_col: str = "text", payload_col: str = "payload") -> DataFrame:
    """Deterministic REAL P6 PPM payload per row, built JVM-side: header +
    md5(source) digest bytes tiled to w*h*3 samples. No Python in the synth;
    the bytes are a genuine image file any PPM reader decodes."""
    header = f"P6\n{PPM_W} {PPM_H}\n{PPM_MAXVAL}\n"
    body_len = PPM_W * PPM_H * 3
    reps = -(-body_len // 16)
    u = f"unhex(md5(`{source_col}`))"
    return df.withColumn(
        payload_col,
        F.expr(
            f"concat(encode('{header}', 'utf-8'), "
            f"substring(concat({', '.join([u] * reps)}), 1, {body_len}))"
        ),
    ).withColumn("media_type", F.lit("image/x-portable-pixmap"))


def attach_wav_payload(df: DataFrame, source_col: str = "text", payload_col: str = "payload") -> DataFrame:
    """Deterministic REAL RIFF/WAVE PCM16 payload per row, built JVM-side:
    canonical 44-byte header + md5(source) digest bytes tiled as
    little-endian samples."""
    data_len = 16 * WAV_TILE
    u = f"unhex(md5(`{source_col}`))"
    return df.withColumn(
        payload_col,
        F.expr(
            f"concat(unhex('{_wav_header_hex(data_len, WAV_RATE)}'), "
            f"{', '.join([u] * WAV_TILE)})"
        ),
    ).withColumn("media_type", F.lit("audio/wav"))


def decode_ppm_image(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Decode P6 PPM payloads to typed image features — Arrow-batched
    mapInPandas, pure numpy, no media libraries. Returns (id, width,
    height, maxval, mean_r, mean_g, mean_b) with per-channel means over
    the decoded pixel grid (what a preprocessing stage feeds a model
    normalizer). A malformed payload fails the task loudly."""

    def decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"width": [], "height": [], "maxval": [], "mean_r": [], "mean_g": [], "mean_b": []}
            for payload in pdf[payload_col]:
                w, h, mx, px = parse_ppm(payload)
                means = px.reshape(-1, 3).mean(axis=0, dtype=np.float64)
                out["width"].append(w)
                out["height"].append(h)
                out["maxval"].append(mx)
                out["mean_r"].append(round(float(means[0]), 6))
                out["mean_g"].append(round(float(means[1]), 6))
                out["mean_b"].append(round(float(means[2]), 6))
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), **out})

    return df.select(id_col, payload_col).mapInPandas(
        decode,
        schema=(
            f"{id_col} long, width long, height long, maxval long, "
            "mean_r double, mean_g double, mean_b double"
        ),
    )


def decode_wav_audio(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Decode RIFF/WAVE PCM16 payloads to typed audio features — Arrow-
    batched mapInPandas, pure numpy. Returns (id, channels, sample_rate,
    n_samples, mean_amp) with the mean signed amplitude (the DC offset a
    feature extractor removes first)."""

    def decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"channels": [], "sample_rate": [], "n_samples": [], "mean_amp": []}
            for payload in pdf[payload_col]:
                ch, rate, samples = parse_wav(payload)
                out["channels"].append(ch)
                out["sample_rate"].append(rate)
                out["n_samples"].append(samples.shape[0])
                out["mean_amp"].append(round(float(samples.mean(dtype=np.float64)), 6))
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), **out})

    return df.select(id_col, payload_col).mapInPandas(
        decode,
        schema=(
            f"{id_col} long, channels long, sample_rate long, "
            "n_samples long, mean_amp double"
        ),
    )


def decode_image(df: DataFrame, payload_col: str = "payload", out_col: str = "pixels"):
    """Decode COMPRESSED binary image payloads to pixel arrays (STUB —
    JPEG/PNG-class formats need PIL, absent here; uncompressed PPM decode
    is fully implemented in ``decode_ppm_image``).

    The mapInPandas plumbing below is the real production shape; only the
    compressed-codec call itself is gated.
    """
    if not MEDIA_DECODERS_AVAILABLE:
        raise NotImplementedError(
            "compressed-format media decoders not available in this "
            "environment; use decode_ppm_image/decode_wav_audio for real "
            "uncompressed decode, or fake_feature_extract for pipeline tests"
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
