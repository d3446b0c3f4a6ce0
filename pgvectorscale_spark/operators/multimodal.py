"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow batch shapes, partitioning,
UDF signatures — and so is the decode path for three container formats:
``decode_ppm_image`` (binary P6 PPM), ``decode_wav_audio`` (RIFF/WAVE PCM),
and ``decode_png_image`` (8-bit PNG: chunk walk with CRC-32 verification,
zlib DEFLATE inflate via the stdlib, and all five scanline defilters) —
genuine pure-numpy/stdlib parsers running in Arrow-batched mapInPandas.
Baseline JPEG (Huffman + IDCT, ``operators/jpeg.py``) decodes natively
too, and ``decode_image`` dispatches on magic bytes across all three image
formats. Only lossy AUDIO/VIDEO sample decode (MP3/H.264 — needs
torchaudio/pyav, absent in this environment) stays behind the
``MEDIA_DECODERS_AVAILABLE`` gate in ``decode_av_samples``;
``fake_feature_extract`` remains the deterministic stand-in for a learned
embedder.

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

from pgvectorscale_spark.operators.jpeg import decode_jpeg_image, parse_jpeg  # noqa: F401 (re-export)

__all__ = [
    "attach_binary_payload",
    "attach_bmp_payload",
    "attach_float_wav_payload",
    "attach_g711_payload",
    "attach_ima_payload",
    "attach_png_payload",
    "attach_ppm_payload",
    "attach_aiff_payload",
    "attach_wav_payload",
    "decode_aiff_audio",
    "parse_au",
    "attach_au_payload",
    "attach_qoi_payload",
    "attach_tga_payload",
    "parse_tga",
    "decode_tga_image",
    "decode_au_audio",
    "parse_aiff",
    "parse_bmp",
    "binary_metadata",
    "decode_ima_adpcm",
    "decode_ms_adpcm",
    "attach_mp3_payload",
    "attach_mp4_payload",
    "decode_av_samples",
    "decode_image",
    "decode_jpeg_image",
    "decode_meta_features",
    "decode_mp3_meta",
    "decode_h264_meta",
    "decode_mp4_meta",
    "decode_png_image",
    "decode_ppm_image",
    "decode_wav_audio",
    "fake_feature_extract",
    "frame_sample_plan",
    "parse_image",
    "parse_jpeg",
    "parse_h264_meta",
    "parse_mp3_meta",
    "parse_mp4_meta",
    "parse_png",
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


def _pnm_header(data: bytes, n_tokens: int) -> tuple[list[int], int]:
    """Netpbm header tokenizer (shared by P4/P5): whitespace-separated
    integers with '#' comments to end-of-line; returns (tokens, pos of the
    raw payload — one whitespace byte past the last token)."""
    pos, tokens = 2, []
    while len(tokens) < n_tokens and pos < len(data):
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
            tokens.append(int(data[pos:end]))
            pos = end
    if len(tokens) < n_tokens:
        raise ValueError("truncated PNM header")
    return tokens, pos + 1


def parse_pnm(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse binary PGM (P5, 8-bit grayscale) and PBM (P4, 1-bit packed
    MSB-first, 1 = black per the netpbm spec — mapped to 0, white to 255)
    images: returns (width, height, 1, pixels (h, w, 1) uint8). The P6
    color sibling is :func:`parse_ppm`."""
    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    magic = data[:2]
    if magic == b"P5":
        (width, height, maxval), pos = _pnm_header(data, 3)
        if not (0 < maxval < 256):
            raise ValueError(f"unsupported PGM maxval {maxval} (8-bit only)")
        need = width * height
        body = data[pos : pos + need]
        if len(body) != need:
            raise ValueError(f"PGM payload {len(body)}B, header implies {need}B")
        px = np.frombuffer(body, dtype=np.uint8).reshape(height, width, 1)
        return width, height, 1, px
    if magic == b"P4":
        (width, height), pos = _pnm_header(data, 2)
        stride = (width + 7) // 8
        need = stride * height
        body = data[pos : pos + need]
        if len(body) != need:
            raise ValueError(f"PBM payload {len(body)}B, header implies {need}B")
        rows = np.frombuffer(body, dtype=np.uint8).reshape(height, stride)
        bits = np.unpackbits(rows, axis=1)[:, :width]  # MSB first per spec
        px = np.where(bits == 1, 0, 255).astype(np.uint8)[:, :, None]
        return width, height, 1, px
    raise ValueError(f"not a binary PGM/PBM (magic {magic!r})")


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
    audio_format, channels, rate, _byte_rate, block_align, bits = fmt
    if audio_format == 1 and bits == 16:
        n = len(body) // (2 * channels)
        samples = np.frombuffer(body[: n * 2 * channels], dtype="<i2").reshape(n, channels)
        return channels, rate, samples
    if audio_format in (6, 7) and bits == 8:  # G.711 A-law / mu-law
        table = ALAW_TABLE if audio_format == 6 else ULAW_TABLE
        n = len(body) // channels
        enc = np.frombuffer(body[: n * channels], dtype=np.uint8).reshape(n, channels)
        return channels, rate, table[enc]
    if audio_format == 0x11 and bits == 4:  # IMA/DVI ADPCM
        return channels, rate, decode_ima_adpcm(body, channels, block_align)
    if audio_format == 0x02 and bits == 4:  # Microsoft ADPCM
        return channels, rate, decode_ms_adpcm(body, channels, block_align)
    if audio_format == 3 and bits == 32:  # IEEE float32
        n = len(body) // (4 * channels)
        x = np.frombuffer(body[: n * 4 * channels], dtype="<f4").reshape(n, channels)
        # NaN -> 0, +/-inf -> full scale (a conformant writer emits
        # neither; a fuzzer can), then the conventional round-to-nearest
        # int16 mapping with clip
        x = np.nan_to_num(x.astype(np.float64), nan=0.0, posinf=1.0, neginf=-1.0)
        samples = np.clip(np.rint(x * 32767.0), -32768, 32767).astype(np.int16)
        return channels, rate, samples
    raise ValueError(
        f"unsupported WAV encoding (format={audio_format}, bits={bits}): "
        "only PCM16, float32, G.711 ulaw/alaw, and IMA/MS ADPCM decode "
        "natively"
    )


# ---------------------------------------------------------------------------
# Lossy audio codecs with REAL sample decode, pure numpy, zero dependencies:
# ITU-T G.711 mu-law/A-law companding (WAV format tags 7/6) and IMA/DVI +
# Microsoft ADPCM (tags 0x11/0x02). These are genuine lossy codecs — after
# them the decode_av_samples gate covers ONLY transform codecs (MP3 Layer
# III synthesis filterbank, H.264 macroblock reconstruction). The decode
# tables are COMPUTED from the published companding formulas, not typed in,
# so the DuckDB oracle (which replays the same formulas in SQL, written
# independently) cross-checks the arithmetic, not a shared constant.
# ---------------------------------------------------------------------------


def _build_ulaw_table() -> np.ndarray:
    """ITU-T G.711 mu-law byte -> linear int16 (the canonical BIAS=0x84
    segment expansion; e.g. 0xFF -> 0, 0x00 -> -32124)."""
    out = np.empty(256, dtype=np.int16)
    for b in range(256):
        u = ~b & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
        out[b] = (0x84 - t) if u & 0x80 else (t - 0x84)
    return out


def _build_alaw_table() -> np.ndarray:
    """ITU-T G.711 A-law byte -> linear int16 (XOR 0x55 then segment
    expansion; e.g. 0x55 -> -8, 0xAA -> +32256)."""
    out = np.empty(256, dtype=np.int16)
    for b in range(256):
        a = b ^ 0x55
        m, seg = a & 0x0F, (a >> 4) & 0x07
        if seg == 0:
            t = (m << 4) + 8
        elif seg == 1:
            t = (m << 4) + 0x108
        else:
            t = ((m << 4) + 0x108) << (seg - 1)
        out[b] = t if a & 0x80 else -t
    return out


ULAW_TABLE = _build_ulaw_table()
ALAW_TABLE = _build_alaw_table()

# IMA/DVI ADPCM quantizer tables (public spec data: IMA "Recommended
# Practices for Enhancing Digital Audio Compatibility", rev 3.00)
IMA_STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
        19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
        50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
        130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
        337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
        876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
        5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
        15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int64,
)
IMA_INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64
)


def _ima_decode_nibbles(nibbles: np.ndarray, pred0: np.ndarray, idx0: np.ndarray) -> np.ndarray:
    """Vectorized-over-blocks IMA ADPCM core: ``nibbles`` is (n_blocks, T)
    uint8 in decode order, ``pred0``/``idx0`` are per-block seeds. Returns
    (n_blocks, T + 1) int16 — sample 0 is the block-header predictor (the
    IMA block contract). Sequential in T (the codec's data dependence),
    vector across blocks: one numpy pass per nibble position, so the work
    per Arrow batch is O(T) numpy ops, not O(rows * T) Python."""
    pred = pred0.astype(np.int64).copy()
    idx = np.clip(idx0.astype(np.int64), 0, 88)
    out = np.empty((nibbles.shape[0], nibbles.shape[1] + 1), dtype=np.int16)
    out[:, 0] = pred
    for t in range(nibbles.shape[1]):
        nib = nibbles[:, t].astype(np.int64)
        step = IMA_STEP_TABLE[idx]
        diff = (step >> 3) + np.where(nib & 4, step, 0)
        diff += np.where(nib & 2, step >> 1, 0) + np.where(nib & 1, step >> 2, 0)
        pred = np.clip(pred + np.where(nib & 8, -diff, diff), -32768, 32767)
        idx = np.clip(idx + IMA_INDEX_TABLE[nib], 0, 88)
        out[:, t + 1] = pred
    return out


def _ima_block_nibbles(data: np.ndarray) -> np.ndarray:
    """(n_blocks, n_bytes) uint8 -> (n_blocks, 2 * n_bytes) nibbles in IMA
    decode order: LOW nibble of each byte first."""
    nib = np.empty((data.shape[0], data.shape[1] * 2), dtype=np.uint8)
    nib[:, 0::2] = data & 0x0F
    nib[:, 1::2] = data >> 4
    return nib


def decode_ima_adpcm(body: bytes, channels: int, block_align: int) -> np.ndarray:
    """Decode an IMA/DVI ADPCM WAV 'data' payload to (n, channels) int16.

    Block layout (WAV format registry, tag 0x11): per channel a 4-byte
    header (int16 LE predictor = output sample 0, uint8 step index,
    reserved), then 4-byte sub-blocks (8 nibbles, low first) interleaved
    channel by channel. A short trailing block decodes to its actual
    nibble count (what stream writers produce on flush)."""
    if channels not in (1, 2):
        raise ValueError(f"IMA ADPCM: 1 or 2 channels supported, got {channels}")
    if block_align < 4 * channels or block_align % (4 * channels):
        raise ValueError(f"IMA ADPCM: bad block_align {block_align} for {channels}ch")
    raw = np.frombuffer(body, dtype=np.uint8)
    n_full = len(raw) // block_align
    chunks = []
    tail = raw[n_full * block_align :]
    blocks_list = [raw[: n_full * block_align].reshape(n_full, block_align)]
    # a partial final block still carries headers + whole 4-byte groups
    tail_groups = (len(tail) - 4 * channels) // (4 * channels) if len(tail) >= 4 * channels else -1
    if tail_groups >= 0:
        blocks_list.append(tail[: 4 * channels + tail_groups * 4 * channels][None, :])
    for blocks in blocks_list:
        if blocks.shape[0] == 0:
            continue
        hdr = blocks[:, : 4 * channels].reshape(blocks.shape[0], channels, 4)
        pred0 = (
            hdr[:, :, 0].astype(np.int64) | (hdr[:, :, 1].astype(np.int64) << 8)
        )
        pred0 = np.where(pred0 >= 32768, pred0 - 65536, pred0)
        idx0 = hdr[:, :, 2]
        data = blocks[:, 4 * channels :]
        if data.shape[1]:
            # groups of 4 bytes alternate channels: (blocks, groups, ch, 4)
            grouped = data.reshape(blocks.shape[0], -1, channels, 4)
            per_ch = []
            for c in range(channels):
                nib = _ima_block_nibbles(
                    grouped[:, :, c, :].reshape(blocks.shape[0], -1)
                )
                per_ch.append(_ima_decode_nibbles(nib, pred0[:, c], idx0[:, c]))
            samples = np.stack(per_ch, axis=2)  # (blocks, T+1, ch)
        else:
            samples = pred0.astype(np.int16)[:, None, :]
        chunks.append(samples.reshape(-1, channels))
    if not chunks:
        return np.empty((0, channels), dtype=np.int16)
    return np.concatenate(chunks, axis=0)


# Microsoft ADPCM tables (public spec data: MS "Multimedia Programmer's
# Reference", WAVE_FORMAT_ADPCM)
MS_ADAPTATION_TABLE = np.array(
    [230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307, 230, 230, 230],
    dtype=np.int64,
)
MS_COEF1 = np.array([256, 512, 0, 192, 240, 460, 392], dtype=np.int64)
MS_COEF2 = np.array([0, -256, 0, 64, 0, -208, -232], dtype=np.int64)


def decode_ms_adpcm(body: bytes, channels: int, block_align: int) -> np.ndarray:
    """Decode a Microsoft ADPCM WAV 'data' payload to (n, channels) int16.

    Block layout (tag 0x02), headers interleaved per channel: uint8
    predictor-coefficient index, int16 LE idelta, int16 sample1 (newer),
    int16 sample2 (older); then nibbles HIGH-first, alternating channels
    for stereo. Output per block starts sample2 then sample1, then one
    sample per nibble via the adaptive two-tap predictor. Vectorized
    across blocks, sequential in the nibble axis (the codec's recurrence)."""
    if channels not in (1, 2):
        raise ValueError(f"MS ADPCM: 1 or 2 channels supported, got {channels}")
    hdr_len = 7 * channels
    if block_align < hdr_len:
        raise ValueError(f"MS ADPCM: bad block_align {block_align} for {channels}ch")
    raw = np.frombuffer(body, dtype=np.uint8)
    n_blocks = len(raw) // block_align
    if n_blocks == 0:
        return np.empty((0, channels), dtype=np.int16)
    blocks = raw[: n_blocks * block_align].reshape(n_blocks, block_align)

    def i16(lo, hi):
        v = lo.astype(np.int64) | (hi.astype(np.int64) << 8)
        return np.where(v >= 32768, v - 65536, v)

    bpred = np.clip(blocks[:, 0:channels].astype(np.int64), 0, 6)
    # after the bpred bytes: three int16 LE fields (idelta, sample1,
    # sample2), each stored for all channels in turn — (blocks, field,
    # channel, lo/hi byte)
    fields = blocks[:, channels:hdr_len].reshape(n_blocks, 3, channels, 2)
    idelta = i16(fields[:, 0, :, 0], fields[:, 0, :, 1])
    s1 = i16(fields[:, 1, :, 0], fields[:, 1, :, 1])
    s2 = i16(fields[:, 2, :, 0], fields[:, 2, :, 1])
    data = blocks[:, hdr_len:]
    nib = np.empty((n_blocks, data.shape[1] * 2), dtype=np.uint8)
    nib[:, 0::2] = data >> 4  # HIGH nibble first (opposite of IMA)
    nib[:, 1::2] = data & 0x0F
    # per-channel nibble streams: stereo alternates L,R per nibble
    n_per_ch = nib.shape[1] // channels
    c1, c2 = MS_COEF1[bpred], MS_COEF2[bpred]  # (blocks, ch)
    out = np.empty((n_blocks, 2 + n_per_ch, channels), dtype=np.int16)
    out[:, 0, :] = s2
    out[:, 1, :] = s1
    # initial idelta is used AS READ for the first expanded nibble; the
    # >=16 floor applies only in the adaptation step (MS spec / canonical
    # C decoders, which also truncate the /256 toward zero rather than
    # flooring — the two differ by 1 LSB on negative coefficient sums)
    s1w, s2w, idw = s1.copy(), s2.copy(), idelta.copy()
    for t in range(n_per_ch):
        for c in range(channels):
            nb = nib[:, t * channels + c].astype(np.int64)
            signed = np.where(nb >= 8, nb - 16, nb)
            psum = s1w[:, c] * c1[:, c] + s2w[:, c] * c2[:, c]
            predictor = np.sign(psum) * (np.abs(psum) >> 8)  # trunc, not floor
            sample = np.clip(predictor + signed * idw[:, c], -32768, 32767)
            out[:, 2 + t, c] = sample
            s2w[:, c] = s1w[:, c]
            s1w[:, c] = sample
            idw[:, c] = np.maximum((MS_ADAPTATION_TABLE[nb] * idw[:, c]) >> 8, 16)
    return out.reshape(-1, channels)


_PNG_SIG = b"\x89PNG\r\n\x1a\x0a"
# samples-per-pixel by PNG color type (bit depth 8 only; no palette)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


# Adam7 pass grid (PNG spec §8.2): per pass, (x_start, y_start, x_step,
# y_step) — the fixed 8x8 sampling pattern, structural like JPEG's zigzag
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_defilter(raw: bytes, width: int, height: int, ch: int) -> np.ndarray:
    """Reconstruct one filtered sub-image (all five PNG filter types) from
    ``height`` scanlines of 1 filter byte + width*ch samples. Returns
    (height, width*ch) uint8."""
    stride = width * ch
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(height):
        line = raw[r * (1 + stride) : (r + 1) * (1 + stride)]
        ftype, row = line[0], np.frombuffer(line[1:], dtype=np.uint8).copy()
        if ftype == 0:
            rec = row
        elif ftype == 1:  # Sub: per-channel cumulative sum along the row
            rec = row.reshape(width, ch).cumsum(axis=0, dtype=np.uint64).astype(np.uint8).reshape(stride)
        elif ftype == 2:  # Up
            rec = row + prev
        elif ftype == 3:  # Average: sequential (depends on reconstructed left)
            rec = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(rec[x - ch]) if x >= ch else 0
                rec[x] = (int(row[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth: sequential
            rec = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[r] = rec
        prev = rec
    return out


def parse_png(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse an 8-bit PNG: returns (width, height, channels, pixels
    (h, w, channels) uint8). REAL decoder, no media libraries: signature
    check, chunk walk with per-chunk CRC-32 verification, IDAT
    concatenation, zlib inflate (stdlib — genuine DEFLATE, any compression
    level), scanline defiltering for all five PNG filter types
    (None/Sub/Up/Average/Paeth), and Adam7 interlacing (each of the seven
    passes is its own independently-filtered sub-image, scattered onto
    the canvas through the fixed 8x8 pass grid). Grayscale, RGB,
    gray+alpha and RGBA color types are supported; palette images and bit
    depths other than 8 raise (out of scope, loudly)."""
    import struct
    import zlib

    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    if data[:8] != _PNG_SIG:
        raise ValueError(f"not a PNG (signature {data[:8]!r})")
    pos, ihdr, idat, ended = 8, None, [], False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            ended = True
            break
        pos += 12 + length
    if ihdr is None or not idat or not ended:
        raise ValueError("PNG missing IHDR, IDAT, or IEND")
    width, height, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG (bit depth {depth}, color type {color})")
    if comp != 0 or filt != 0 or interlace not in (0, 1):
        raise ValueError("unsupported PNG compression/filter/interlace method")
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))  # verifies the stream's adler32
    if interlace == 0:
        stride = width * ch
        if len(raw) != height * (1 + stride):
            raise ValueError(f"PNG raw data {len(raw)}B, header implies {height * (1 + stride)}B")
        out = _png_defilter(raw, width, height, ch)
        return width, height, ch, out.reshape(height, width, ch)
    # Adam7: seven consecutive sub-images, each filtered independently
    # (the previous-row state resets per pass), empty passes are absent
    canvas = np.zeros((height, width, ch), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx if width > x0 else 0
        ph = (height - y0 + dy - 1) // dy if height > y0 else 0
        if pw == 0 or ph == 0:
            continue
        need = ph * (1 + pw * ch)
        sub = raw[pos : pos + need]
        if len(sub) != need:
            raise ValueError("PNG Adam7 pass data truncated")
        pos += need
        rec = _png_defilter(sub, pw, ph, ch).reshape(ph, pw, ch)
        canvas[y0::dy, x0::dx] = rec
    if pos != len(raw):
        raise ValueError("PNG Adam7 data longer than the pass grid implies")
    return width, height, ch, canvas


def parse_bmp(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse an uncompressed Windows BMP (BITMAPINFOHEADER or the V4/V5
    extensions, BI_RGB, 24/32 bpp): returns (width, height, channels,
    pixels (h, w, ch) uint8 in RGB/RGBA order).  Handles 4-byte row
    padding, bottom-up (positive height) and top-down (negative height)
    layouts, and the BGR(A) channel order.  RLE/bitfields compression and
    palette depths raise loudly — the dispatcher's honest gate."""
    import struct

    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP file")
    (data_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP DIB header size {hdr_size}")
    width, height = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if planes != 1:
        raise ValueError(f"bad BMP planes {planes}")
    if compression != 0:
        raise ValueError(
            f"unsupported BMP compression {compression}: only BI_RGB decodes"
        )
    if bpp not in (24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}: only 24/32 bpp")
    if width <= 0 or height == 0 or abs(width) * abs(height) > (1 << 26):
        raise ValueError(f"implausible BMP dimensions {width}x{height}")
    if data_off < 14 + hdr_size:
        raise ValueError(
            f"BMP pixel offset {data_off} points inside the header "
            f"(ends at {14 + hdr_size})"
        )
    top_down = height < 0
    h = abs(height)
    ch = bpp // 8
    stride = (width * ch + 3) & ~3  # rows pad to 4 bytes
    need = data_off + stride * h
    if need > len(data):
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(data[data_off : data_off + stride * h], dtype=np.uint8)
    px = rows.reshape(h, stride)[:, : width * ch].reshape(h, width, ch)
    if not top_down:
        px = px[::-1]
    # BGR(A) -> RGB(A)
    if ch == 3:
        px = px[:, :, ::-1]
    else:
        px = px[:, :, [2, 1, 0, 3]]
    return width, h, ch, np.ascontiguousarray(px)


def _png_prefix_hex(width: int, height: int, color: int = 2, depth: int = 8) -> str:
    """PNG signature + complete IHDR chunk (fixed for a given geometry,
    CRC included) as a hex literal."""
    import struct
    import zlib

    body = struct.pack(">IIBBBBB", width, height, depth, color, 0, 0, 0)
    chunk = struct.pack(">I", len(body)) + b"IHDR" + body + struct.pack(
        ">I", zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF
    )
    return (_PNG_SIG + chunk).hex()


_PNG_IEND_HEX = "0000000049454e44ae426082"


def _wav_header_hex(
    data_len: int,
    rate: int = 8000,
    channels: int = 1,
    bits: int = 16,
    fmt_tag: int = 1,
    block_align: int | None = None,
    samples_per_block: int | None = None,
) -> str:
    """Canonical RIFF/WAVE header for a given payload size. ``fmt_tag`` 1
    (PCM), 6/7 (G.711 A-law/mu-law, bits=8), 0x11 (IMA ADPCM, bits=4 with
    the 2-byte wSamplesPerBlock fmt extension)."""
    import struct

    block = block_align if block_align is not None else channels * bits // 8
    ext = b""
    if samples_per_block is not None:
        ext = struct.pack("<HH", 2, samples_per_block)  # cbSize=2 + wSamplesPerBlock
    fmt = struct.pack(
        "<IHHIIHH", 16 + len(ext), fmt_tag, channels, rate, rate * block, block, bits
    ) + ext
    hdr = (
        b"RIFF"
        + struct.pack("<I", 16 + len(fmt) + data_len)
        + b"WAVEfmt "
        + fmt
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
# PNG geometry: 5x3 RGB, one scanline per filter type None/Sub/Up — the
# FILTERED bytes tile the digest, so the DECODED pixels are closed-form
# (mod-256 partial sums of digest bytes) and the oracle exercises real
# defiltering, not just container framing. Average/Paeth (floor-division
# predictors, awkward as closed forms) are covered by pytest round-trips.
PNG_W, PNG_H, PNG_FILTERS = 5, 3, (0, 1, 2)


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


#: PGM/PBM synth geometry: 8x2. PGM = the 16 md5(text) bytes as gray
#: samples (mean = digest-byte average); PBM = the first 2 digest bytes as
#: packed MSB-first bits, 1 = black = 0 (mean = 255 * zero-bit fraction) —
#: a bit-order or polarity bug on either side breaks the hash.
PNM_W, PNM_H = 8, 2


def attach_pgm_payload(
    df: DataFrame, source_col: str = "text", payload_col: str = "payload"
) -> DataFrame:
    """Deterministic REAL binary PGM (P5) per row, built JVM-side."""
    header = f"P5\n{PNM_W} {PNM_H}\n255\n"
    return df.withColumn(
        payload_col,
        F.expr(f"concat(encode('{header}', 'utf-8'), unhex(md5(`{source_col}`)))"),
    ).withColumn("media_type", F.lit("image/x-portable-graymap"))


def attach_pbm_payload(
    df: DataFrame, source_col: str = "text", payload_col: str = "payload"
) -> DataFrame:
    """Deterministic REAL binary PBM (P4) per row, built JVM-side."""
    header = f"P4\n{PNM_W} {PNM_H}\n"
    return df.withColumn(
        payload_col,
        F.expr(
            f"concat(encode('{header}', 'utf-8'), "
            f"substring(unhex(md5(`{source_col}`)), 1, 2))"
        ),
    ).withColumn("media_type", F.lit("image/x-portable-bitmap"))


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


def parse_aiff(data: bytes) -> tuple[int, int, np.ndarray]:
    """Parse an AIFF/AIFF-C file (the big-endian IFF twin of RIFF/WAVE):
    returns (channels, sample_rate, samples (n, channels) int16) — the
    ``parse_wav`` contract. Walks the chunk list (COMM before or after
    SSND), decodes the COMM chunk's 80-bit extended-float sample rate
    from its sign/exponent/mantissa fields (no struct support for
    float80 — spec arithmetic), honors SSND's offset field, and supports
    PCM16 including AIFF-C streams whose compressionType is 'NONE'/
    'twos' (big-endian) or 'sowt' (little-endian). Other compression
    types raise loudly."""
    import struct

    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    if len(data) < 12 or data[:4] != b"FORM" or data[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF/AIFF-C file")
    pos, comm, body = 12, None, None
    little = False
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack(">I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + size]
        if len(payload) < size:
            raise ValueError("truncated AIFF chunk")
        if cid == b"COMM":
            if size < 18:
                raise ValueError("COMM chunk too short")
            channels, _frames, bits = struct.unpack(">HIH", payload[:8])
            # 80-bit extended float: 1 sign + 15 exponent (bias 16383),
            # 64-bit mantissa with explicit integer bit
            (se,) = struct.unpack(">H", payload[8:10])
            (mant,) = struct.unpack(">Q", payload[10:18])
            exp = se & 0x7FFF
            if mant == 0 or exp == 0:
                rate = 0
            elif exp == 0x7FFF:
                raise ValueError("non-finite AIFF sample rate")
            elif exp > 16383 + 64:
                # 2**(exp-16446) would overflow float (OverflowError);
                # no plausible sample rate needs an exponent past 2**64
                raise ValueError(f"implausible AIFF sample-rate exponent {exp}")
            else:
                rate = int(round(mant * 2.0 ** (exp - 16383 - 63)))
            if se & 0x8000 or rate <= 0:
                raise ValueError(f"bad AIFF sample rate {rate}")
            if size >= 22:  # AIFF-C: compressionType fourcc
                ctype = payload[18:22]
                if ctype == b"sowt":
                    little = True
                elif ctype not in (b"NONE", b"twos"):
                    raise ValueError(
                        f"unsupported AIFF-C compression {ctype!r}: only "
                        "uncompressed PCM ('NONE'/'twos'/'sowt') decodes"
                    )
            comm = (channels, rate, bits)
        elif cid == b"SSND":
            if size < 8:
                raise ValueError("SSND chunk too short")
            offset, _block = struct.unpack(">II", payload[:8])
            if 8 + offset > size:
                raise ValueError("SSND offset beyond chunk")
            body = payload[8 + offset :]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if comm is None or body is None:
        raise ValueError("AIFF missing COMM or SSND chunk")
    channels, rate, bits = comm
    if bits != 16 or channels < 1:
        raise ValueError(
            f"unsupported AIFF encoding (bits={bits}, channels={channels}): "
            "only PCM16 decodes natively"
        )
    n = len(body) // (2 * channels)
    dtype = "<i2" if little else ">i2"
    samples = np.frombuffer(body[: n * 2 * channels], dtype=dtype).reshape(n, channels)
    return channels, rate, samples.astype(np.int16)


def _f80_hex(rate: int) -> str:
    """Encode a positive integer as an 80-bit extended float (hex)."""
    import struct

    e = rate.bit_length() - 1
    mant = rate << (63 - e)
    return struct.pack(">HQ", 16383 + e, mant).hex()


def attach_aiff_payload(
    df: DataFrame, source_col: str = "text", payload_col: str = "payload"
) -> DataFrame:
    """Deterministic REAL AIFF payload per row, built JVM-side: canonical
    FORM/AIFF header with an 80-bit extended-float COMM rate + md5(source)
    digest bytes tiled as BIG-endian PCM16 samples — the byte-order twin
    of attach_wav_payload, so an endianness bug on either side diverges
    every amplitude (oracles.aiff_decode_oracle replays the BE layout)."""
    import struct

    data_len = 16 * WAV_TILE
    n_frames = data_len // 2
    comm = b"COMM" + struct.pack(">IHIH", 18, 1, n_frames, 16) + bytes.fromhex(
        _f80_hex(WAV_RATE)
    )
    ssnd_hdr = b"SSND" + struct.pack(">III", data_len + 8, 0, 0)
    form_len = 4 + len(comm) + len(ssnd_hdr) + data_len
    hdr = (b"FORM" + struct.pack(">I", form_len) + b"AIFF" + comm + ssnd_hdr).hex()
    u = f"unhex(md5(`{source_col}`))"
    return df.withColumn(
        payload_col,
        F.expr(f"concat(unhex('{hdr}'), {', '.join([u] * WAV_TILE)})"),
    ).withColumn("media_type", F.lit("audio/aiff"))


def parse_au(data: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a Sun AU (.au/.snd) file: returns (channels, rate, samples
    (n, ch) int16). REAL decoder, no media libraries: big-endian header
    (magic '.snd', data offset >= 24 with an optional annotation the
    decoder must SKIP, data size or 0xffffffff for 'to end of file',
    encoding, rate, channels) and the linear/companded encodings —
    1 = G.711 mu-law (shared ULAW_TABLE), 2 = signed linear PCM8
    (value << 8), 3 = linear PCM16 BIG-endian, 6 = IEEE float32
    big-endian (same round(x*32767) int16 mapping as float WAV),
    27 = G.711 A-law. Anything else (ADPCM/G.72x encodings) raises
    loudly."""
    import struct

    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    if len(data) < 24 or data[:4] != b".snd":
        raise ValueError(f"not an AU file (magic {data[:4]!r})")
    data_off, data_size, encoding, rate, channels = struct.unpack(
        ">IIIII", data[4:24]
    )
    if data_off < 24:
        raise ValueError(f"AU data offset {data_off} points inside the header")
    if channels < 1 or channels > 64 or rate <= 0:
        raise ValueError(f"implausible AU geometry ({channels} ch @ {rate} Hz)")
    if data_off > len(data):
        raise ValueError("truncated AU file (offset past end)")
    body = data[data_off:]
    if data_size != 0xFFFFFFFF:
        if data_size > len(body):
            raise ValueError("truncated AU data")
        body = body[:data_size]
    if encoding in (1, 27):  # G.711 mu-law / A-law
        table = ULAW_TABLE if encoding == 1 else ALAW_TABLE
        n = len(body) // channels
        enc = np.frombuffer(body[: n * channels], dtype=np.uint8).reshape(n, channels)
        return channels, rate, table[enc]
    if encoding == 2:  # signed linear PCM8
        n = len(body) // channels
        s8 = np.frombuffer(body[: n * channels], dtype=np.int8).reshape(n, channels)
        return channels, rate, (s8.astype(np.int16) << 8)
    if encoding == 3:  # linear PCM16 big-endian
        n = len(body) // (2 * channels)
        samples = np.frombuffer(body[: n * 2 * channels], dtype=">i2").reshape(
            n, channels
        ).astype(np.int16)
        return channels, rate, samples
    if encoding == 6:  # IEEE float32 big-endian
        n = len(body) // (4 * channels)
        x = np.frombuffer(body[: n * 4 * channels], dtype=">f4").reshape(n, channels)
        x = np.nan_to_num(x.astype(np.float64), nan=0.0, posinf=1.0, neginf=-1.0)
        return channels, rate, np.clip(
            np.rint(x * 32767.0), -32768, 32767
        ).astype(np.int16)
    raise ValueError(
        f"unsupported AU encoding {encoding}: only mu-law(1), PCM8(2), "
        "PCM16-BE(3), float32-BE(6), and A-law(27) decode natively"
    )


#: AU synth: the header carries an 8-byte annotation ('sparkau\\x00') so
#: the decoder's data_off skip is actually exercised, and the body tiles
#: the digest bytes as mu-law samples — the container twin of the G.711
#: WAV synth (same companding closed form, big-endian header walk).
AU_ANNOTATION = b"sparkau\x00"


def attach_au_payload(
    df: DataFrame, source_col: str = "text", payload_col: str = "payload"
) -> DataFrame:
    """Deterministic REAL Sun AU payload per row, built JVM-side:
    big-endian .snd header with data offset 32 (24 + the 8-byte
    annotation the parser must skip) + md5(source) digest bytes tiled
    WAV_TILE x as G.711 mu-law samples. The closed-form oracle
    (oracles.au_decode_oracle) replays the ITU-T mu-law segment formula
    over the digest hex — the WAV G.711 oracle's container twin, so an
    offset/endianness bug in the AU header walk breaks the hash."""
    import struct

    data_len = 16 * WAV_TILE
    hdr = (
        b".snd"
        + struct.pack(">IIIII", 24 + len(AU_ANNOTATION), data_len, 1, WAV_RATE, 1)
        + AU_ANNOTATION
    ).hex()
    u = f"unhex(md5(`{source_col}`))"
    return df.withColumn(
        payload_col,
        F.expr(f"concat(unhex('{hdr}'), {', '.join([u] * WAV_TILE)})"),
    ).withColumn("media_type", F.lit("audio/basic"))


def decode_au_audio(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """AU twin of ``decode_wav_audio`` (same feature contract) over
    ``parse_au``."""
    return _decode_audio_features(df, parse_au, payload_col, id_col)


#: BMP synth geometry: 3x2 at 24bpp — stride pads 9 row bytes to 12, so the
#: body is 24 bytes (digest + its first half) and the decoder must SKIP the
#: 3 pad bytes per row; each RGB channel sees a DISTINCT digest-byte subset
#: (w*3=9 is not coprime-trivial against the 16-byte digest), so a BGR-order
#: or stride bug diverges the closed-form channel means.
BMP_W, BMP_H = 3, 2


def attach_bmp_payload(
    df: DataFrame, source_col: str = "text", payload_col: str = "payload"
) -> DataFrame:
    """Deterministic REAL 24bpp bottom-up BMP per row, built JVM-side: a
    canonical BITMAPINFOHEADER + md5(source) digest bytes as raw padded
    BGR pixel rows (BMP needs no byte escaping, so digest bytes embed
    directly).  Per-channel means have closed forms over the digest hex
    (oracles.bmp_decode_oracle) — a stride, padding, or BGR-order bug on
    either side breaks the hash (the bottom-up flip is mean-invariant and
    covered by pytest's top-down round-trips instead)."""
    import struct

    stride = (BMP_W * 3 + 3) & ~3
    body_len = stride * BMP_H
    assert body_len == 24, "synth geometry: digest + first half exactly"
    hdr = (
        b"BM"
        + struct.pack("<IHHI", 54 + body_len, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, BMP_W, BMP_H, 1, 24, 0, body_len, 2835, 2835, 0, 0)
    ).hex()
    d = f"md5(`{source_col}`)"
    return df.withColumn(
        payload_col,
        F.expr(f"concat(unhex('{hdr}'), unhex({d}), unhex(substr({d}, 1, 16)))"),
    ).withColumn("media_type", F.lit("image/bmp"))


def parse_tga(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse a Truevision TGA: returns (width, height, channels, pixels
    (h, w, ch) uint8, RGB(A) order). REAL decoder, no media libraries:
    18-byte little-endian header, id-field skip, uncompressed (types 2/3)
    and RLE (types 10/11) at 8 (gray) / 24 (BGR) / 32 (BGRA) bits,
    bottom-up (default) and top-down (descriptor bit 5) row orders. The
    RLE layer is genuine run-length decompression — packets are a header
    byte (bit 7 = RLE, low 7 bits = count-1) then one pixel (RLE) or
    count pixels (raw), and packets may cross scanlines. Colormapped
    types, 15/16-bit depths, and right-to-left order raise loudly."""
    import struct

    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    if len(data) < 18:
        raise ValueError("not a TGA file (header short)")
    (id_len, cmap_type, img_type, _cm_first, _cm_len, _cm_size,
     _x0, _y0, width, height, depth, desc) = struct.unpack(
        "<BBBHHBHHHHBB", data[:18]
    )
    if img_type not in (2, 3, 10, 11):
        raise ValueError(
            f"unsupported TGA image type {img_type}: only truecolor/gray "
            "(2/3) and their RLE forms (10/11) decode natively"
        )
    if cmap_type != 0:
        raise ValueError("colormapped TGA does not decode natively")
    if depth not in (8, 24, 32):
        raise ValueError(f"unsupported TGA depth {depth}: only 8/24/32")
    if (img_type in (3, 11)) != (depth == 8):
        raise ValueError(f"TGA type {img_type} with depth {depth} mismatched")
    if desc & 0x10:
        raise ValueError("right-to-left TGA order does not decode natively")
    if width == 0 or height == 0 or width * height > (1 << 26):
        raise ValueError(f"implausible TGA dimensions {width}x{height}")
    ch = depth // 8
    n_px = width * height
    body = data[18 + id_len :]
    if img_type in (2, 3):  # uncompressed
        need = n_px * ch
        if len(body) < need:
            raise ValueError("truncated TGA pixel data")
        px = np.frombuffer(body[:need], dtype=np.uint8).reshape(n_px, ch)
    else:  # RLE
        out = np.empty((n_px, ch), dtype=np.uint8)
        pos, filled = 0, 0
        while filled < n_px:
            if pos >= len(body):
                raise ValueError("truncated TGA RLE stream")
            hdrb = body[pos]
            pos += 1
            count = (hdrb & 0x7F) + 1
            if filled + count > n_px:
                raise ValueError("TGA RLE packet overruns the pixel count")
            if hdrb & 0x80:  # RLE packet: one pixel repeated
                if pos + ch > len(body):
                    raise ValueError("truncated TGA RLE packet")
                out[filled : filled + count] = np.frombuffer(
                    body[pos : pos + ch], dtype=np.uint8
                )
                pos += ch
            else:  # raw packet: count literal pixels
                need = count * ch
                if pos + need > len(body):
                    raise ValueError("truncated TGA raw packet")
                out[filled : filled + count] = np.frombuffer(
                    body[pos : pos + need], dtype=np.uint8
                ).reshape(count, ch)
                pos += need
            filled += count
        px = out
    px = px.reshape(height, width, ch)
    if not desc & 0x20:  # default bottom-up; bit 5 = top-down
        px = px[::-1]
    if ch >= 3:  # BGR(A) -> RGB(A)
        px = px[:, :, [2, 1, 0] + ([3] if ch == 4 else [])]
    return width, height, ch, np.ascontiguousarray(px)


#: TGA synth geometry: 5x2 24bpp top-down RLE (type 10) — one raw packet
#: of 5 digest-BGR pixels (px j: B=b_{3j}, G=b_{3j+1}, R=b_{3j+2}) then
#: one RLE run of 5 copies of (B=b15, G=b0, R=b1), so each channel mean
#: is a closed form over specific digest bytes and both packet kinds are
#: exercised (oracles.tga_decode_oracle).
TGA_W, TGA_H = 5, 2


def attach_tga_payload(
    df: DataFrame, source_col: str = "text", payload_col: str = "payload"
) -> DataFrame:
    """Deterministic REAL RLE TGA per row, built JVM-side (see geometry
    note): a conformant type-10 stream any TGA reader reproduces — a
    packet-kind, count-bias, BGR-order, or row-order bug on either side
    breaks the hash."""
    import struct

    hdr = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, 10, 0, 0, 0, 0, 0, TGA_W, TGA_H, 24, 0x20
    ).hex()
    d = f"md5(`{source_col}`)"
    return df.withColumn(
        payload_col,
        F.expr(
            f"unhex(concat('{hdr}', '04', substr({d}, 1, 30), "
            f"'84', substr({d}, 31, 2), substr({d}, 1, 4)))"
        ),
    ).withColumn("media_type", F.lit("image/tga"))


#: QOI synth geometry: 20x2 RGB, one pixel stream exercising EVERY op —
#: p0 explicit RGB(10,20,30); p1 = QOI_OP_INDEX slot 9 (the hash of p0,
#: (10*3+20*5+30*7+255*11)%64, read back before any digest pixel can
#: clobber the slot); p2..p17 explicit RGB from rotated digest bytes
#: (r=b_j, g=b_{j+1 mod 16}, b=b_{j+2 mod 16}); p18 = QOI_OP_DIFF
#: (+1,+1,+1) with mod-256 wraparound; p19 = QOI_OP_LUMA all-zero deltas;
#: p20..p39 = QOI_OP_RUN 20. Channel means then have closed forms over
#: the digest hex (oracles.qoi_decode_oracle).
QOI_W, QOI_H = 20, 2
QOI_MAGIC_HEX = b"qoif".hex()


def attach_qoi_payload(
    df: DataFrame, source_col: str = "text", payload_col: str = "payload"
) -> DataFrame:
    """Deterministic REAL QOI file per row, built JVM-side (see the
    geometry note above): a conformant stream any QOI decoder reproduces
    bit-exactly, covering the index/diff/luma/run ops — an index-hash,
    bias, wraparound, or run-length bug on either side breaks the hash."""
    hdr = (
        QOI_MAGIC_HEX  # 'qoif'
        + f"{QOI_W:08x}{QOI_H:08x}" + "0300"  # w, h BE; channels 3; srgb
        + "fe0a141e"  # p0 = RGB(10, 20, 30)
        + "09"  # p1 = INDEX slot 9 = hash(10,20,30,255)
    )
    d = f"md5(`{source_col}`)"
    chunks = []
    for j in range(16):
        r = f"substr({d}, {2 * j + 1}, 2)"
        g = f"substr({d}, {2 * ((j + 1) % 16) + 1}, 2)"
        b = f"substr({d}, {2 * ((j + 2) % 16) + 1}, 2)"
        chunks.append(f"'fe', {r}, {g}, {b}")
    tail = "7fa088d3" + "0000000000000001"  # DIFF+1, LUMA 0, RUN 20, end
    return df.withColumn(
        payload_col,
        F.expr(
            f"unhex(concat('{hdr}', {', '.join(chunks)}, '{tail}'))"
        ),
    ).withColumn("media_type", F.lit("image/qoi"))


#: float32 WAV synth: 32 mono samples, one per digest nibble, value
#: (nib - 7.5) / 8 — exact in binary (16ths), never a .5 rounding boundary
#: after the int16 mapping, so Spark/numpy and DuckDB agree bit-for-bit.
F32_WAV_N_SAMPLES = 32


def attach_float_wav_payload(
    df: DataFrame, source_col: str = "text", payload_col: str = "payload"
) -> DataFrame:
    """Deterministic REAL IEEE-float32 WAV (format tag 3) per row, built
    JVM-side: each digest nibble selects one of 16 pre-encoded float32
    little-endian patterns for (nib - 7.5)/8.  parse_wav decodes the
    floats and maps them to int16 by the conventional round(x*32767)
    with clip; the oracle replays that arithmetic in SQL
    (oracles.f32_wav_decode_oracle)."""
    import struct

    hdr = _wav_header_hex(4 * F32_WAV_N_SAMPLES, WAV_RATE, bits=32, fmt_tag=3)
    pats = ", ".join(
        f"'{struct.pack('<f', (v - 7.5) / 8.0).hex()}'" for v in range(16)
    )
    nib = lambda k: f"cast(conv(substring(md5(`{source_col}`), {k}, 1), 16, 10) as int)"
    body = ", ".join(f"elt({nib(k)} + 1, {pats})" for k in range(1, 33))
    return df.withColumn(
        payload_col,
        F.expr(f"unhex(concat('{hdr}', {body}))"),
    ).withColumn("media_type", F.lit("audio/wav-f32"))


def attach_g711_payload(
    df: DataFrame, law: str = "ulaw", source_col: str = "text", payload_col: str = "payload"
) -> DataFrame:
    """Deterministic REAL G.711 WAV payload per row, built JVM-side: a
    format-tag 7 (mu-law) or 6 (A-law) RIFF header + md5(source) digest
    bytes tiled WAV_TILE x as 8-bit companded samples. Every byte value is
    a legal G.711 code, so the payload is a genuine lossy-audio file any
    G.711-capable WAV reader decodes."""
    if law not in ("ulaw", "alaw"):
        raise ValueError(f"law must be 'ulaw' or 'alaw', got {law!r}")
    data_len = 16 * WAV_TILE
    hdr = _wav_header_hex(data_len, WAV_RATE, bits=8, fmt_tag=7 if law == "ulaw" else 6)
    u = f"unhex(md5(`{source_col}`))"
    return df.withColumn(
        payload_col,
        F.expr(f"concat(unhex('{hdr}'), {', '.join([u] * WAV_TILE)})"),
    ).withColumn("media_type", F.lit(f"audio/wav-{law}"))


# IMA ADPCM synth geometry: one mono block of block_align 20 = 4-byte
# header + the 16 digest bytes as 32 nibbles -> 33 decoded samples.
IMA_BLOCK_ALIGN = 4 + 16
IMA_SAMPLES_PER_BLOCK = (IMA_BLOCK_ALIGN - 4) * 2 + 1


def attach_ima_payload(
    df: DataFrame, source_col: str = "text", payload_col: str = "payload"
) -> DataFrame:
    """Deterministic REAL IMA ADPCM WAV payload per row, built JVM-side:
    format-tag 0x11 header (with the wSamplesPerBlock fmt extension) + one
    mono block whose predictor seed is digest bytes 0-1 (int16 LE), step
    index is byte 2 mod 89, and whose 32 nibbles are the digest itself —
    so the full adaptive-quantizer recurrence has a closed form over the
    digest hex that the DuckDB oracle replays step by step
    (oracles.ima_adpcm_decode_oracle)."""
    hdr = _wav_header_hex(
        IMA_BLOCK_ALIGN,
        WAV_RATE,
        bits=4,
        fmt_tag=0x11,
        block_align=IMA_BLOCK_ALIGN,
        samples_per_block=IMA_SAMPLES_PER_BLOCK,
    )
    d = f"md5(`{source_col}`)"
    idx_byte = (
        f"unhex(lpad(hex(cast(conv(substr({d}, 5, 2), 16, 10) as int) % 89), 2, '0'))"
    )
    return df.withColumn(
        payload_col,
        F.expr(
            f"concat(unhex('{hdr}'), unhex(substr({d}, 1, 4)), {idx_byte}, "
            f"unhex('00'), unhex({d}))"
        ),
    ).withColumn("media_type", F.lit("audio/wav-ima-adpcm"))


# MPEG-1 Layer III header tables (ISO/IEC 11172-3): bitrate index 1..14 and
# sampling-rate index 0..2. The synth draws from these via md5 nibbles and
# the closed-form oracle replays the same CASE tables.
MP3_BITRATES = (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
MP3_RATES = (44100, 48000, 32000)
MP3_SAMPLES_PER_FRAME = 1152  # MPEG-1 Layer III
MP3_MAX_FRAMES = 5  # synth: 2..5 frames per payload


def parse_mp3_meta(data: bytes) -> tuple[int, int, float, int, int, int, float]:
    """MP3 frame-HEADER scan — metadata without sample decode: walk the
    MPEG-1 Layer III frame chain (optional ID3v2 prefix skipped via its
    synchsafe size) and return (version, layer, mean bitrate kbps,
    sample_rate, channels, n_frames, duration_ms). VBR streams report the
    frame-average bitrate. Sample synthesis (the lossy part) stays behind
    ``decode_av_samples``; everything here is container arithmetic.
    Malformed chains fail loudly — truncated frames, mid-stream sample-rate
    or mode changes, non-MPEG-1-Layer-III frames, trailing garbage."""
    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    pos = 0
    if data[:3] == b"ID3":  # ID3v2: 10-byte header + synchsafe 28-bit size
        if len(data) < 10:
            raise ValueError("truncated ID3v2 header")
        size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
        pos = 10 + size
    rates: set[int] = set()
    modes: set[int] = set()
    bitrates: list[int] = []
    while pos < len(data):
        if data[pos : pos + 3] == b"TAG":  # ID3v1 trailer: fixed 128 bytes
            if len(data) - pos != 128:
                raise ValueError("malformed ID3v1 trailer")
            break
        if pos + 4 > len(data):
            raise ValueError(f"truncated frame header at {pos}")
        b1, b2, b3 = data[pos + 1], data[pos + 2], data[pos + 3]
        if data[pos] != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"lost frame sync at {pos}")
        version_bits, layer_bits = (b1 >> 3) & 3, (b1 >> 1) & 3
        if version_bits != 3 or layer_bits != 1:
            raise ValueError("only MPEG-1 Layer III frames supported")
        bidx, ridx, padding = b2 >> 4, (b2 >> 2) & 3, (b2 >> 1) & 1
        if not 1 <= bidx <= 14 or ridx > 2:
            raise ValueError(f"bad bitrate/rate index at {pos}")
        rate = MP3_RATES[ridx]
        bitrate = MP3_BITRATES[bidx - 1]
        rates.add(rate)
        modes.add((b3 >> 6) & 3)
        bitrates.append(bitrate)
        pos += 144 * bitrate * 1000 // rate + padding
    if pos > len(data):
        raise ValueError("last frame truncated")
    if not bitrates:
        raise ValueError("no MPEG audio frames")
    if len(rates) > 1 or len(modes) > 1:
        raise ValueError("mid-stream sample-rate/channel-mode change")
    rate, mode = rates.pop(), modes.pop()
    n = len(bitrates)
    return (
        1,  # MPEG version
        3,  # layer
        round(float(np.mean(bitrates)), 6),
        rate,
        1 if mode == 3 else 2,
        n,
        round(n * MP3_SAMPLES_PER_FRAME * 1000.0 / rate, 6),
    )


def decode_meta_features(
    df: DataFrame,
    parse_fn,
    fields: "dict[str, str]",
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Shared metadata-decode shape (the ``decode_image_features`` analog
    for header scans): Arrow-batched mapInPandas over any
    ``parse_fn(bytes) -> tuple`` whose positional outputs map onto
    ``fields`` ({column name: spark type}, insertion-ordered). Extra
    leading tuple elements beyond ``fields`` are ignored by passing a
    parse_fn wrapper that slices them off — the three codec scanners below
    each adapt their parser in one lambda instead of re-implementing the
    batch loop."""
    names = list(fields)

    def decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {name: [] for name in names}
            for payload in pdf[payload_col]:
                values = parse_fn(payload)
                for name, v in zip(names, values):
                    out[name].append(v)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), **out})

    schema = f"{id_col} long, " + ", ".join(f"{n} {t}" for n, t in fields.items())
    return df.select(id_col, payload_col).mapInPandas(decode, schema=schema)


def decode_mp3_meta(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """MP3 stream metadata without sample decode — Arrow-batched scan over
    ``parse_mp3_meta``. Returns (id, sample_rate, channels, bitrate_kbps,
    n_frames, duration_ms): what a training-data audio pipeline filters on
    (length, rate, channel layout) before paying for any sample decode."""

    def scan(payload):
        _v, _l, kbps, rate, ch, n, dur = parse_mp3_meta(payload)
        return rate, ch, kbps, n, dur

    return decode_meta_features(
        df,
        scan,
        {
            "sample_rate": "long",
            "channels": "long",
            "bitrate_kbps": "double",
            "n_frames": "long",
            "duration_ms": "double",
        },
        payload_col,
        id_col,
    )


def attach_mp3_payload(df: DataFrame, source_col: str = "text", payload_col: str = "payload") -> DataFrame:
    """Deterministic REAL MPEG-1 Layer III stream per row, built JVM-side:
    md5 nibbles pick bitrate index (1..14), sample-rate index (0..2),
    channel mode (0..3) and frame count (2..5); each frame is the genuine
    4-byte header (sync 0xFFFB = MPEG-1 Layer III, no CRC) followed by
    144000*bitrate/rate - 4 body bytes tiling the digest. Any framing error
    makes the strict ``parse_mp3_meta`` walk lose sync — synth and parser
    check each other, and the closed-form DuckDB oracle replays the nibble
    draws (mp3_meta_oracle)."""
    u = f"unhex(md5(`{source_col}`))"
    nib = lambda k: f"cast(conv(substring(md5(`{source_col}`), {k}, 1), 16, 10) as int)"
    bidx = f"(1 + {nib(1)} % 14)"
    bitrate = "element_at(array(32,40,48,56,64,80,96,112,128,160,192,224,256,320), _bidx)"
    rate = f"element_at(array(44100,48000,32000), 1 + {nib(2)} % 3)"
    mode = f"({nib(3)} % 4)"
    n_frames = f"(2 + {nib(4)} % 4)"
    # header: 0xFF 0xFB, byte3 = bitrate_idx<<4 | rate_idx<<2 (padding 0),
    # byte4 = mode<<6
    hdr = (
        "concat(unhex('fffb'), "
        f"unhex(lpad(hex(_bidx * 16 + ({nib(2)} % 3) * 4), 2, '0')), "
        "unhex(lpad(hex(_mode * 64), 2, '0')))"
    )
    frame_len = "cast(floor(144000.0 * _kbps / _rate) as int)"
    # max frame 1440 bytes -> 90 digest tiles cover any body
    tile = f"concat({', '.join([u] * 90)})"
    frame = "concat(_hdr, substring(_tile, 1, _flen - 4))"
    stream = (
        f"substring(concat({', '.join(['_frame'] * MP3_MAX_FRAMES)}), 1, _n * _flen)"
    )
    return (
        df.withColumn("_bidx", F.expr(bidx))
        .withColumn("_kbps", F.expr(bitrate))
        .withColumn("_rate", F.expr(rate))
        .withColumn("_mode", F.expr(mode))
        .withColumn("_n", F.expr(n_frames))
        .withColumn("_hdr", F.expr(hdr))
        .withColumn("_flen", F.expr(frame_len))
        .withColumn("_tile", F.expr(tile))
        .withColumn("_frame", F.expr(frame))
        .withColumn(payload_col, F.expr(stream))
        .drop("_bidx", "_kbps", "_rate", "_mode", "_n", "_hdr", "_flen", "_tile", "_frame")
        .withColumn("media_type", F.lit("audio/mpeg"))
    )


MP4_BRAND = "isom"
# 3x3 fixed-point unity transform matrix every mvhd/tkhd carries (ISO 14496-12)
_MP4_UNITY_MATRIX = (
    "000100000000000000000000"
    "000000000001000000000000"
    "000000000000000040000000"
)


def _u32be(data: bytes, off: int) -> int:
    return int.from_bytes(data[off : off + 4], "big")


def parse_mp4_meta(data: bytes) -> tuple[str, int, float, int, float, float]:
    """ISO-BMFF (MP4/MOV) box walk — container metadata without any codec
    sample decode: returns (major_brand, movie timescale, duration_ms,
    n_tracks, width, height) from ftyp + moov>mvhd + moov>trak>tkhd.
    Width/height are tkhd's 16.16 fixed-point values of the FIRST track.
    Handles 64-bit largesize and to-EOF (size 0) boxes, mvhd/tkhd version
    0 and 1; unknown boxes are skipped by size; truncated or ill-sized
    boxes fail loudly. Sample-level H.264 reconstruction stays behind
    ``decode_av_samples`` — everything here is byte-aligned arithmetic."""
    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    data = bytes(data)

    def walk(buf: bytes):
        pos = 0
        while pos < len(buf):
            if len(buf) - pos < 8:
                raise ValueError(f"truncated box header at {pos}")
            size = _u32be(buf, pos)
            btype = buf[pos + 4 : pos + 8]
            body_off = pos + 8
            if size == 0:
                size = len(buf) - pos
            elif size == 1:
                if len(buf) - pos < 16:
                    raise ValueError(f"truncated largesize at {pos}")
                size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
                body_off = pos + 16
            if size < body_off - pos or pos + size > len(buf):
                raise ValueError(f"bad box size {size} at {pos}")
            yield btype, buf[body_off : pos + size]
            pos += size

    brand = None
    timescale = duration = None
    n_tracks = 0
    width = height = None
    for btype, body in walk(data):
        if btype == b"ftyp":
            if len(body) < 4:
                raise ValueError("truncated ftyp")
            brand = body[:4].decode("ascii")
        elif btype == b"moov":
            for ctype, cbody in walk(body):
                if ctype == b"mvhd":
                    ver = cbody[0] if cbody else None
                    need = 32 if ver == 1 else 20
                    if ver not in (0, 1) or len(cbody) < need:
                        raise ValueError(f"truncated or malformed mvhd body ({len(cbody)}B)")
                    if ver == 1:
                        timescale = _u32be(cbody, 20)
                        duration = int.from_bytes(cbody[24:32], "big")
                    else:
                        timescale = _u32be(cbody, 12)
                        duration = _u32be(cbody, 16)
                elif ctype == b"trak":
                    n_tracks += 1
                    for ttype, tbody in walk(cbody):
                        if ttype == b"tkhd" and width is None:
                            ver = tbody[0] if tbody else None
                            off = 84 if ver == 1 else 72
                            if ver not in (0, 1) or len(tbody) < off + 12:
                                raise ValueError(
                                    f"truncated or malformed tkhd body ({len(tbody)}B)"
                                )
                            width = _u32be(tbody, off + 4) / 65536.0
                            height = _u32be(tbody, off + 8) / 65536.0
    if brand is None or timescale is None:
        raise ValueError("missing ftyp or moov/mvhd box")
    if not timescale:
        raise ValueError("zero movie timescale")
    return (
        brand,
        int(timescale),
        round(duration * 1000.0 / timescale, 6),
        n_tracks,
        float(width) if width is not None else 0.0,
        float(height) if height is not None else 0.0,
    )


def decode_mp4_meta(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """MP4 container metadata without sample decode — Arrow-batched
    mapInPandas over ``parse_mp4_meta``. Returns (id, brand, timescale,
    duration_ms, n_tracks, width, height): what a video curation pipeline
    filters on (length, resolution, track layout) before paying for any
    frame decode."""

    return decode_meta_features(
        df,
        parse_mp4_meta,
        {
            "brand": "string",
            "timescale": "long",
            "duration_ms": "double",
            "n_tracks": "long",
            "width": "double",
            "height": "double",
        },
        payload_col,
        id_col,
    )


def attach_mp4_payload(df: DataFrame, source_col: str = "text", payload_col: str = "payload") -> DataFrame:
    """Deterministic REAL ISO-BMFF (MP4) file per row, built JVM-side:
    ftyp(isom) + moov(mvhd + 1-2 trak/tkhd) + mdat, every dynamic field a
    big-endian u32 from md5-nibble draws (movie timescale, duration,
    16.16 track dimensions, track count) and the mdat body digest-tiled.
    Any framing error breaks the strict ``parse_mp4_meta`` walk — synth
    and parser check each other, and the closed-form DuckDB oracle
    replays the nibble draws (mp4_meta_oracle)."""
    nib = lambda k: f"cast(conv(substring(md5(`{source_col}`), {k}, 1), 16, 10) as int)"
    u32 = lambda e: f"lpad(hex({e}), 8, '0')"
    Z = lambda n: "00" * n  # n zero BYTES as hex
    mvhd = (
        f"concat('0000006c6d766864', '{Z(12)}', {u32('_ts')}, {u32('_dur')}, "
        f"'00010000', '01000000', '{Z(8)}', '{_MP4_UNITY_MATRIX}', '{Z(24)}', "
        "'00000002')"
    )

    def trak(track_id: int) -> str:
        return (
            f"concat('000000647472616b', '0000005c746b6864', '00000007', "
            f"'{Z(8)}', {u32(str(track_id))}, '{Z(4)}', {u32('_dur')}, "
            f"'{Z(8)}', '{Z(8)}', '{_MP4_UNITY_MATRIX}', "
            f"{u32('_w * 65536')}, {u32('_h * 65536')})"
        )

    moov = (
        f"concat({u32('116 + _ntr * 100')}, '6d6f6f76', {mvhd}, {trak(1)}, "
        f"case when _ntr = 2 then {trak(2)} else '' end)"
    )
    mdat_hdr = f"concat({u32('_blen + 8')}, '6d646174')"
    ftyp = "000000186674797069736f6d0000000069736f6d6d703431"
    u = f"unhex(md5(`{source_col}`))"
    body = f"substring(concat({', '.join([u] * 8)}), 1, _blen)"
    return (
        df.withColumn("_ts", F.expr(f"(600 * (1 + {nib(5)} % 4))"))
        .withColumn("_dur", F.expr(f"(_ts * (1 + {nib(6)} % 10) + {nib(7)})"))
        .withColumn("_w", F.expr(f"(16 * (1 + {nib(8)} % 32))"))
        .withColumn("_h", F.expr(f"(16 * (1 + {nib(9)} % 32))"))
        .withColumn("_ntr", F.expr(f"(1 + {nib(10)} % 2)"))
        .withColumn("_blen", F.expr(f"(16 * (1 + {nib(11)} % 8))"))
        .withColumn(
            payload_col,
            F.expr(f"concat(unhex(concat('{ftyp}', {moov}, {mdat_hdr})), {body})"),
        )
        .drop("_ts", "_dur", "_w", "_h", "_ntr", "_blen")
        .withColumn("media_type", F.lit("video/mp4"))
    )


class _SpsBitReader:
    """MSB-first bit reader over an RBSP (emulation-prevention bytes
    already stripped) with Exp-Golomb decode (H.264 spec 9.1)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        out = 0
        for _ in range(n):
            byte_i, bit_i = divmod(self.pos, 8)
            if byte_i >= len(self.data):
                raise ValueError("truncated SPS bitstream")
            out = (out << 1) | ((self.data[byte_i] >> (7 - bit_i)) & 1)
            self.pos += 1
        return out

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("malformed Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


_H264_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}


def parse_h264_meta(data: bytes) -> tuple[int, int, int, int, int]:
    """H.264 Annex-B elementary-stream METADATA without sample decode:
    walk start-coded NAL units, strip emulation-prevention bytes from the
    first SPS (type 7), and Exp-Golomb-decode it (spec 7.3.2.1.1) for
    (profile_idc, level_idc, width, height, n_nal_units). Handles
    baseline/main and the high-profile chroma branch, POC types 0/1/2,
    interlaced map units, and frame cropping with chroma-dependent crop
    units. Scaling matrices and streams without an SPS raise loudly.
    Macroblock reconstruction lives in ``operators/h264.py`` for the
    closed-form I-frame subclass (I_PCM + intra prediction with parsed
    zero residual); entropy-coded residual levels stay behind
    ``decode_av_samples`` — everything HERE is header arithmetic."""
    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    data = bytes(data)
    # Annex B: NAL units delimited by 0x000001 / 0x00000001 start codes
    starts = []
    i = 0
    while i + 3 <= len(data):
        if data[i : i + 3] == b"\x00\x00\x01":
            starts.append(i + 3)
            i += 3
        else:
            i += 1
    if not starts:
        raise ValueError("no Annex-B start codes")
    nals = []
    for j, s0 in enumerate(starts):
        end = (starts[j + 1] - 3) if j + 1 < len(starts) else len(data)
        # a 4-byte start code (00 00 00 01) owns exactly ONE leading zero:
        # trim only the single byte immediately preceding a following
        # start code — never a whole zero run. Stripping every trailing
        # zero (the pre-round-8 behavior) over-trimmed legitimate
        # zero-ending payloads (cabac_zero_words) and dropped all-zero
        # NAL units entirely, under-counting n_nal_units on real streams.
        if j + 1 < len(starts) and end > s0 and data[end - 1] == 0:
            end -= 1
        if end > s0:
            nals.append(data[s0:end])
    sps = next((n for n in nals if (n[0] & 0x1F) == 7), None)
    if sps is None:
        raise ValueError("no SPS NAL unit in stream")
    # strip emulation-prevention bytes (00 00 03 xx -> 00 00 xx)
    rbsp = bytearray()
    k = 1  # skip the NAL header byte
    while k < len(sps):
        if k + 2 < len(sps) and sps[k] == 0 and sps[k + 1] == 0 and sps[k + 2] == 3:
            rbsp += sps[k : k + 2]
            k += 3
        else:
            rbsp.append(sps[k])
            k += 1
    br = _SpsBitReader(bytes(rbsp))
    profile_idc = br.u(8)
    br.u(8)  # constraint flags + reserved
    level_idc = br.u(8)
    br.ue()  # seq_parameter_set_id
    chroma_format_idc = 1  # default 4:2:0 for non-high profiles
    if profile_idc in _H264_HIGH_PROFILES:
        chroma_format_idc = br.ue()
        if chroma_format_idc > 3:
            raise ValueError(f"malformed SPS: chroma_format_idc {chroma_format_idc}")
        if chroma_format_idc == 3:
            br.u(1)  # separate_colour_plane_flag
        br.ue()  # bit_depth_luma_minus8
        br.ue()  # bit_depth_chroma_minus8
        br.u(1)  # qpprime_y_zero_transform_bypass_flag
        if br.u(1):
            raise ValueError("seq_scaling_matrix unsupported")
    br.ue()  # log2_max_frame_num_minus4
    poc_type = br.ue()
    if poc_type == 0:
        br.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        br.u(1)  # delta_pic_order_always_zero_flag
        br.se()  # offset_for_non_ref_pic
        br.se()  # offset_for_top_to_bottom_field
        for _ in range(br.ue()):
            br.se()  # offset_for_ref_frame
    br.ue()  # max_num_ref_frames
    br.u(1)  # gaps_in_frame_num_value_allowed_flag
    pw_mbs = br.ue() + 1
    ph_units = br.ue() + 1
    frame_mbs_only = br.u(1)
    if not frame_mbs_only:
        br.u(1)  # mb_adaptive_frame_field_flag
    br.u(1)  # direct_8x8_inference_flag
    crop_l = crop_r = crop_t = crop_b = 0
    if br.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = br.ue(), br.ue(), br.ue(), br.ue()
    sub_wh = {0: (1, 1), 1: (2, 2), 2: (2, 1), 3: (1, 1)}[chroma_format_idc]
    crop_ux = sub_wh[0]
    crop_uy = sub_wh[1] * (2 - frame_mbs_only)
    width = pw_mbs * 16 - crop_ux * (crop_l + crop_r)
    height = (2 - frame_mbs_only) * ph_units * 16 - crop_uy * (crop_t + crop_b)
    return profile_idc, level_idc, width, height, len(nals)


def decode_h264_meta(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """H.264 stream metadata without sample decode — Arrow-batched
    mapInPandas over ``parse_h264_meta``. Returns (id, profile_idc,
    level_idc, width, height, n_nal_units). SPS bitstreams are bit-packed
    Exp-Golomb, so (like JPEG's Huffman streams) there is no JVM-side SQL
    synthesis path — correctness is pytest round-trips against an
    independent test-side bit-writer, not a driver DuckDB oracle."""

    return decode_meta_features(
        df,
        parse_h264_meta,
        {
            "profile_idc": "long",
            "level_idc": "long",
            "width": "long",
            "height": "long",
            "n_nal_units": "long",
        },
        payload_col,
        id_col,
    )


def attach_png_payload(df: DataFrame, source_col: str = "text", payload_col: str = "payload") -> DataFrame:
    """Deterministic REAL PNG payload per row, built entirely JVM-side: a
    complete 8-bit RGB PNG whose zlib stream uses a stored (uncompressed)
    DEFLATE block — the one deflate form constructible by byte concatenation.
    The filtered scanline bytes tile md5(source); per-scanline filter types
    come from ``PNG_FILTERS``. Everything dynamic is computed with built-in
    expressions: the adler32 checksum as its closed-form weighted byte sums
    and the IDAT CRC via Spark's ``crc32``. Any error in the framing,
    checksums, or filter bytes makes the strict ``parse_png`` (CRC + adler
    verification) reject the payload — the synth and decoder check each
    other."""
    stride = PNG_W * 3
    raw_len = PNG_H * (1 + stride)
    u = f"unhex(md5(`{source_col}`))"
    body_len = PNG_H * stride
    reps = -(-body_len // 16)
    tiled = f"substring(concat({', '.join([u] * reps)}), 1, {body_len})"
    parts = []
    for r, ftype in enumerate(PNG_FILTERS[: PNG_H]):
        parts.append(f"unhex('{ftype:02x}')")
        parts.append(f"substring(_t, {r * stride + 1}, {stride})")
    raw = f"concat({', '.join(parts)})"
    # adler32 over the raw scanline data, closed form: a = (1 + sum d_i),
    # b = (n + sum (n-i+1) * d_i), both mod 65521 (the per-byte recurrence
    # telescoped — n=48 keeps the exact sums far below overflow)
    byte_i = "cast(conv(substring(_hx, 2*i-1, 2), 16, 10) as bigint)"
    a_sum = f"aggregate(sequence(1, {raw_len}), 1L, (acc, i) -> acc + {byte_i})"
    b_sum = (
        f"aggregate(sequence(1, {raw_len}), cast({raw_len} as long), "
        f"(acc, i) -> acc + ({raw_len} - i + 1) * {byte_i})"
    )
    adler = f"(({b_sum}) % 65521) * 65536 + (({a_sum}) % 65521)"
    # zlib stream: 0x7801 header, stored-block marker 0x01 + LEN/NLEN (LE),
    # the raw data, then the big-endian adler32
    stored_hdr = f"01{raw_len & 0xFF:02x}{raw_len >> 8:02x}{(~raw_len) & 0xFF:02x}{((~raw_len) >> 8) & 0xFF:02x}"
    zstream = (
        f"concat(unhex('7801{stored_hdr}'), _raw, "
        f"unhex(lpad(hex({adler}), 8, '0')))"
    )
    idat_len = 2 + 5 + raw_len + 4
    idat = (
        f"concat(unhex(lpad(hex({idat_len}), 8, '0')), encode('IDAT', 'utf-8'), _z, "
        f"unhex(lpad(hex(crc32(concat(encode('IDAT', 'utf-8'), _z))), 8, '0')))"
    )
    return (
        df.withColumn("_t", F.expr(tiled))
        .withColumn("_raw", F.expr(raw))
        .withColumn("_hx", F.expr("hex(_raw)"))
        .withColumn("_z", F.expr(zstream))
        .withColumn(
            payload_col,
            F.expr(
                f"concat(unhex('{_png_prefix_hex(PNG_W, PNG_H)}'), {idat}, "
                f"unhex('{_PNG_IEND_HEX}'))"
            ),
        )
        .drop("_t", "_raw", "_hx", "_z")
        .withColumn("media_type", F.lit("image/png"))
    )


def decode_image_features(
    df: DataFrame, parse_fn, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Shared image-feature decode shape: Arrow-batched mapInPandas over
    any ``parse_fn(bytes) -> (width, height, channels, pixels)`` parser
    (parse_png / parse_jpeg). Returns (id, width, height, channels,
    mean_r, mean_g, mean_b) with per-channel means over the decoded
    pixels; gray images report their single channel in all three means."""

    def decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"width": [], "height": [], "channels": [], "mean_r": [], "mean_g": [], "mean_b": []}
            for payload in pdf[payload_col]:
                w, h, ch, px = parse_fn(payload)
                means = px.reshape(-1, ch).mean(axis=0, dtype=np.float64)
                rgb = means[:3] if ch >= 3 else np.repeat(means[0], 3)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                out["mean_r"].append(round(float(rgb[0]), 6))
                out["mean_g"].append(round(float(rgb[1]), 6))
                out["mean_b"].append(round(float(rgb[2]), 6))
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), **out})

    return df.select(id_col, payload_col).mapInPandas(
        decode,
        schema=(
            f"{id_col} long, width long, height long, channels long, "
            "mean_r double, mean_g double, mean_b double"
        ),
    )


def decode_png_image(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Decode PNG payloads to typed image features (see
    ``decode_image_features``) with ``parse_png`` — real chunk-walk + CRC +
    zlib inflate + defilter decode."""
    return decode_image_features(df, parse_png, payload_col, id_col)


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
    """Decode RIFF/WAVE payloads to typed audio features — Arrow-batched
    mapInPandas, pure numpy. Returns (id, channels, sample_rate,
    n_samples, mean_amp) with the mean signed amplitude (the DC offset a
    feature extractor removes first)."""
    return _decode_audio_features(df, parse_wav, payload_col, id_col)


def decode_aiff_audio(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """AIFF twin of ``decode_wav_audio`` (same feature contract) over
    ``parse_aiff``."""
    return _decode_audio_features(df, parse_aiff, payload_col, id_col)


def _decode_audio_features(
    df: DataFrame, parse_fn, payload_col: str, id_col: str
) -> DataFrame:
    def decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "channels": [],
                "sample_rate": [],
                "n_samples": [],
                "mean_amp": [],
                "last_amp": [],
            }
            for payload in pdf[payload_col]:
                ch, rate, samples = parse_fn(payload)
                out["channels"].append(ch)
                out["sample_rate"].append(rate)
                out["n_samples"].append(samples.shape[0])
                out["mean_amp"].append(round(float(samples.mean(dtype=np.float64)), 6))
                out["last_amp"].append(
                    round(float(samples[-1].mean(dtype=np.float64)), 6)
                    if samples.shape[0]
                    else 0.0
                )
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), **out})

    return df.select(id_col, payload_col).mapInPandas(
        decode,
        schema=(
            f"{id_col} long, channels long, sample_rate long, "
            "n_samples long, mean_amp double, last_amp double"
        ),
    )


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def parse_image(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Magic-bytes image dispatch — P6 PPM, PNG, and baseline JPEG/JFIF are
    all genuinely decoded by this package's pure numpy/stdlib parsers (no
    PIL). Returns the unified (width, height, channels, pixels) tuple.
    Unknown formats raise NotImplementedError naming the gate."""
    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    if data[:2] == b"P6":
        w, h, _maxval, px = parse_ppm(data)
        return w, h, 3, px
    if data[:2] in (b"P4", b"P5"):
        return parse_pnm(data)
    if data[:8] == _PNG_MAGIC:
        return parse_png(data)
    if data[:2] == b"\xff\xd8":
        return parse_jpeg(data)
    if data[:2] == b"BM":
        return parse_bmp(data)
    if data[:4] == b"GIF8":
        from pgvectorscale_spark.operators.gif import parse_gif

        return parse_gif(data)
    if data[:4] == b"qoif":
        from pgvectorscale_spark.operators.qoi import parse_qoi

        return parse_qoi(data)
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        from pgvectorscale_spark.operators.tiff import parse_tiff

        return parse_tiff(data)
    if data[:1] == b"\x0a":
        from pgvectorscale_spark.operators.pcx import parse_pcx

        return parse_pcx(data)
    if data[:4] == b"\x00\x00\x01\x00":
        from pgvectorscale_spark.operators.ico import parse_ico

        return parse_ico(data)
    if data[:4] == b"\x59\xa6\x6a\x95":
        from pgvectorscale_spark.operators.sunras import parse_ras

        return parse_ras(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        from pgvectorscale_spark.operators.vp8l import parse_webp

        return parse_webp(data)
    raise NotImplementedError(
        f"unsupported image format (magic {bytes(data[:4])!r}); PPM, PNG, "
        "BMP, GIF, QOI, TIFF, PCX, ICO, Sun Raster, lossless WebP and "
        "baseline JPEG decode natively — other codecs need external media "
        "decoders (MEDIA_DECODERS_AVAILABLE)"
    )


def decode_tga_image(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """TGA twin of ``decode_image`` over ``parse_tga`` — TGA carries no
    magic bytes (only an optional v2 footer), so it cannot ride the
    parse_image dispatcher and gets its own typed entry point."""
    return decode_image_features(df, parse_tga, payload_col, id_col)


def decode_image(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Decode image payloads to typed image features, dispatching on magic
    bytes (``parse_image``): P6 PPM, PNG (chunk walk + CRC + zlib inflate +
    defilter), and baseline JPEG/JFIF (Huffman + IDCT + chroma upsample —
    operators/jpeg.py) all decode for real, pure numpy/stdlib. Only
    MP3/H.264-class lossy AUDIO/VIDEO sample decode remains gated (see
    ``decode_av_samples``); mixed-format image corpora decode in one pass."""
    return decode_image_features(df, parse_image, payload_col, id_col)


def decode_av_samples(df: DataFrame, payload_col: str = "payload"):
    """Sample-level decode of the REMAINING entropy/transform-coded A/V —
    STUB: needs decoders absent here. The gate is narrow and precisely
    bounded: MJPEG video decodes real SAMPLES natively
    (``mjpeg.decode_mjpeg_frames`` — AVI/concatenated-JFIF container walk
    feeding every frame through the pure-numpy baseline JPEG decoder);
    H.264 I-frame PIXELS decode natively for the closed-form subclass
    (``h264.parse_h264_picture`` — I_PCM + all intra prediction modes with
    parsed zero residual); WAV audio decodes real SAMPLES for PCM16 AND
    the lossy G.711 mu-law/A-law and IMA/MS ADPCM codecs
    (``decode_wav_audio`` / ``parse_wav``, spec-exact integer decode); and
    MP3/MP4/H.264 container METADATA is genuinely parsed without sample
    decode (``decode_mp3_meta``, ``decode_mp4_meta``, ``decode_h264_meta``).
    What stays gated: MP3 Layer III (the ISO Huffman tables + 512-entry
    synthesis window are tabulated spec data, not closed-form, and are
    unavailable offline) and H.264 entropy-coded residual LEVELS / CABAC /
    inter prediction / deblocking (same reason: table 9-5/9-6/9-7 and the
    alpha/beta/tC0 tables)."""
    if not MEDIA_DECODERS_AVAILABLE:
        raise NotImplementedError(
            "entropy-table codecs gated: MP3 Layer III audio and H.264 "
            "streams with entropy-coded residuals/CABAC/inter prediction "
            "need decoder tables unavailable in this environment. "
            "Natively decodable instead: MJPEG video samples "
            "(mjpeg.decode_mjpeg_frames), H.264 intra/zero-residual/I_PCM "
            "pictures (h264.decode_h264_picture), FLAC lossless audio "
            "(flac.decode_flac_audio), WAV PCM16/float32/G.711/ADPCM "
            "audio (decode_wav_audio); decode_mp3_meta/decode_mp4_meta/"
            "decode_h264_meta give MP3/MP4/H.264 header-scan metadata and "
            "fake_feature_extract covers pipeline tests"
        )
    raise NotImplementedError  # pragma: no cover — real decoder path


def resize_image(
    df: DataFrame,
    out_w: int,
    out_h: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Nearest-neighbor image resize over decoded payloads — the third
    member of the decode / feature-extract / resize / frame-sample
    multimodal quartet. Dispatches on magic bytes via ``parse_image``
    (every raster format this repo decodes), then samples source pixels
    with the PURE-INTEGER floor mapping ``src = (dst * src_dim) //
    dst_dim`` on each axis — no float grid, so the pick pattern (and
    therefore every resized statistic the oracle replays) is
    engine-exact. Up- and down-scaling both work (the mapping repeats or
    skips source indices).

    Returns (id, width, height, channels, mean_r, mean_g, mean_b) of the
    RESIZED image. Arrow-batched ``mapInPandas``; rows are independent,
    so the operator scales with input partitions and never shuffles."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError(f"target dims must be positive, got {out_w}x{out_h}")

    schema = (
        f"{id_col} long, width int, height int, channels int, "
        "mean_r double, mean_g double, mean_b double"
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, ch, px = parse_image(bytes(payload))
                rs = np.array([(r * h) // out_h for r in range(out_h)])
                cs = np.array([(c * w) // out_w for c in range(out_w)])
                out = px[np.ix_(rs, cs)]
                means = out.reshape(-1, out.shape[-1]).mean(axis=0, dtype=np.float64)
                # gray / gray+alpha images replicate the single luma
                # channel, mirroring decode_image_features' convention
                rgb = means[:3] if ch >= 3 else np.repeat(means[0], 3)
                rows.append(
                    (
                        int(did),
                        out_w,
                        out_h,
                        int(ch),
                        float(rgb[0]),
                        float(rgb[1]),
                        float(rgb[2]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "width", "height", "channels",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema)


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
