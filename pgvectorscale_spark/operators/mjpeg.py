"""MJPEG video — real SAMPLE decode with zero media dependencies.

Motion-JPEG stores every video frame as an independent baseline JPEG, so
the pure-numpy JPEG decoder (operators/jpeg.py) decodes real video
*samples*, not just container metadata: this module walks the two common
MJPEG containers — an AVI (RIFF 'AVI ' with a 'movi' LIST of '00dc'
frame chunks) and a bare concatenated-JFIF stream — and feeds each frame
through ``parse_jpeg``. It narrows the ``decode_av_samples`` gate to the
genuinely-lossy interframe codecs (MP3 synthesis filterbank, H.264
macroblock reconstruction); MJPEG video now decodes end-to-end.

Scale shape: one video payload is one row; ``decode_mjpeg_frames`` is an
Arrow-batched ``mapInPandas`` that explodes it to one row per frame — the
same partition-parallel decode shape a 100 TB frame-extraction pipeline
runs (each task decodes its own payloads; no shuffle is introduced until
the caller aggregates).

Reference behavior analog: none in /root/reference (pgvectorscale stores
vectors, not media); this serves the training-data-pipeline brief.

The JVM-side synthesis path (``attach_mjpeg_payload``) sidesteps the
"Huffman bit-packing is not SQL" limitation noted in jpeg.py: flat
(single-DC-coefficient) frames have a tiny closed-form entropy coding, so
the 16 possible frames per geometry are Huffman-packed ONCE in Python at
SQL-construction time and the per-row expression merely selects among the
precomputed hex constants with md5-nibble draws. The resulting bytes are
genuine AVI/MJPEG files, and the DuckDB oracle replays the same nibble
draws in closed form (oracles.mjpeg_decode_oracle): a flat block's
reconstruction is exactly its encoded gray value when (v - 128) is a
multiple of quant_step/8 — here v = 16*nibble + 8 with a uniform quant
table of 16, so D = (v-128)/2 is an integer, the dequantized DC is 16*D,
and the IDCT returns 16*D/8 + 128 = v with no rounding.
"""

from __future__ import annotations

import struct
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgvectorscale_spark.operators.jpeg import parse_jpeg

__all__ = [
    "build_flat_jpeg",
    "jpeg_extent",
    "split_jfif_stream",
    "build_avi_mjpeg",
    "parse_avi_mjpeg",
    "parse_mjpeg",
    "decode_mjpeg_frames",
    "attach_mjpeg_payload",
]

# synth geometry/value draws (mirrored by oracles.mjpeg_decode_oracle):
# nibble 1 -> geometry (8x8 / 16x16), nibble 2 -> n_frames in 2..5,
# nibble 3+i -> frame i's gray value v = 16*nib + 8
MJPEG_DIMS = ((8, 8), (16, 16))
MJPEG_MAX_FRAMES = 5


# --------------------------------------------------------------------------
# flat-frame encoder (codegen-time only: builds the synth's hex constants
# and the pytest fixtures; the row-level path never runs Python encoding)

_STD_QUANT = 16  # uniform quant table: dequantized DC = 16 * D


def _entropy_bits(d: int, n_blocks: int) -> list[int]:
    """DC-only entropy coding under the module's minimal Huffman tables:
    DC category s is coded in 3 bits (code == s), followed by s magnitude
    bits; EOB is the single AC code '0'. Blocks after the first have DC
    diff 0."""
    bits: list[int] = []

    def put(value: int, width: int) -> None:
        for i in range(width - 1, -1, -1):
            bits.append((value >> i) & 1)

    s = abs(d).bit_length()
    put(s, 3)
    if s:
        put(d if d > 0 else d + (1 << s) - 1, s)
    bits.append(0)  # EOB
    for _ in range(n_blocks - 1):
        put(0, 3)  # DC diff 0
        bits.append(0)  # EOB
    return bits


def build_flat_jpeg(width: int, height: int, value: int, pad_to: int | None = None) -> bytes:
    """A genuine baseline grayscale JPEG whose every pixel decodes to
    exactly ``value`` (which must satisfy value % 16 == 8 so the quantized
    DC round-trips losslessly; see module docstring). ``pad_to`` pads the
    entropy segment with spec-legal 0xFF fill bytes before EOI so all
    variants of one geometry share a byte length (fixed-size '00dc'
    chunks => the AVI header depends only on (geometry, n_frames))."""
    if width % 8 or height % 8:
        raise ValueError("flat synth frames must be multiples of 8")
    if value % 16 != 8:
        raise ValueError("value must be 16*k + 8 for lossless round-trip")
    d = (value - 128) // 2  # quantized DC under Q=16: round(8*(v-128)/16)
    n_blocks = (width // 8) * (height // 8)
    bits = _entropy_bits(d, n_blocks)
    while len(bits) % 8:
        bits.append(1)  # pad with 1-bits (F.2.1.1)
    ent = bytearray()
    for i in range(0, len(bits), 8):
        b = int("".join(map(str, bits[i : i + 8])), 2)
        ent.append(b)
        if b == 0xFF:
            ent.append(0x00)  # byte stuffing
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes([_STD_QUANT] * 64)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1) + bytes([1, 0x11, 0])
    # DC table 0: eight codes of length 3 for categories 0..7
    counts_dc = [0] * 16
    counts_dc[2] = 8
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 8) + bytes([0x00]) + bytes(counts_dc) + bytes(range(8))
    # AC table 0: one code of length 1 for EOB (symbol 0x00)
    counts_ac = [0] * 16
    counts_ac[0] = 1
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 1) + bytes([0x10]) + bytes(counts_ac) + bytes([0x00])
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    out += ent
    if pad_to is not None:
        fill = pad_to - (len(out) + 2)
        if fill < 0:
            raise ValueError(f"pad_to {pad_to} smaller than frame {len(out) + 2}")
        out += b"\xff" * fill  # spec-legal fill bytes before a marker (B.1.1.2)
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# concatenated-JFIF stream split

_STANDALONE = frozenset({0x01, *range(0xD0, 0xD8)})  # TEM, RST0-7


def jpeg_extent(data: bytes, start: int = 0) -> int:
    """End offset (exclusive) of the JPEG starting at ``start``: a marker
    walk that skips headered segments by their length fields and scans
    entropy data with byte-unstuffing awareness, so a 0xFFD9 appearing as
    literal bytes inside an APPn/COM payload never truncates the frame."""
    if data[start : start + 2] != b"\xff\xd8":
        raise ValueError(f"no SOI at {start}")
    pos = start + 2
    while True:
        if pos + 2 > len(data):
            raise ValueError(f"truncated JPEG (marker scan at {pos})")
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1  # fill bytes
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            return pos
        if marker in _STANDALONE:
            continue
        if pos + 2 > len(data):
            raise ValueError(f"truncated segment header at {pos}")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        pos += seglen
        if marker == 0xDA:  # SOS: scan entropy for the next true marker
            while True:
                if pos + 1 >= len(data):
                    raise ValueError("truncated entropy-coded scan")
                if data[pos] == 0xFF and data[pos + 1] != 0x00 and data[pos + 1] not in range(0xD0, 0xD8):
                    break  # a real marker (EOI, next SOS, DNL, ...)
                pos += 2 if data[pos] == 0xFF else 1


def split_jfif_stream(data: bytes) -> list[bytes]:
    """Split a bare concatenated-JFIF MJPEG stream (frame after frame of
    SOI..EOI with nothing in between) into per-frame byte slices."""
    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    frames = []
    pos = 0
    while pos < len(data):
        end = jpeg_extent(data, pos)
        frames.append(bytes(data[pos:end]))
        pos = end
    if not frames:
        raise ValueError("empty MJPEG stream")
    return frames


# --------------------------------------------------------------------------
# AVI container (RIFF): writer + strict walk

def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def build_avi_mjpeg(frames: list[bytes], width: int, height: int, fps: int = 25) -> bytes:
    """A minimal genuine AVI/MJPEG file: RIFF('AVI ') with an 'hdrl' LIST
    (avih + one 'vids'/'MJPG' stream's strh/strf) and a 'movi' LIST of
    one '00dc' chunk per frame. Readable by any AVI demuxer; the sink
    shape for exporting sampled frames back out of the pipeline."""
    n = len(frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0, 0, 0,           # maxbytespersec, padding, flags (no idx1 written)
        n, 0, 1, 0,        # totalframes, initialframes, streams, sugbufsize
        width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps,            # dwScale / dwRate
        0, n, 0, 0xFFFFFFFF, 0,
        0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi)


def parse_avi_mjpeg(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """Strict RIFF walk of an AVI/MJPEG file: returns the avih-declared
    (width, height, total_frames) and the '00dc'/'00db' frame payloads
    from the 'movi' LIST. Malformed containers fail loudly (bad magic,
    truncated chunks, missing avih/movi)."""
    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if 8 + riff_size > len(data):
        raise ValueError("truncated RIFF payload")
    avih = None
    frames: list[bytes] = []

    def walk(buf: bytes, in_movi: bool, in_hdrl: bool) -> None:
        nonlocal avih
        pos = 0
        while pos + 8 <= len(buf):
            fourcc = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body = buf[pos + 8 : pos + 8 + size]
            if len(body) != size:
                raise ValueError(f"truncated chunk {fourcc!r}")
            if fourcc == b"LIST":
                walk(body[4:], in_movi or body[:4] == b"movi", in_hdrl or body[:4] == b"hdrl")
            elif fourcc == b"avih" and in_hdrl:
                if size < 56:
                    raise ValueError("short avih")
                fields = struct.unpack("<14I", body[:56])
                avih = (fields[8], fields[9], fields[4])  # width, height, totalframes
            elif in_movi and fourcc[2:] in (b"dc", b"db"):
                frames.append(bytes(body))
            pos += 8 + size + (size % 2)

    walk(data[12 : 8 + riff_size], False, False)
    if avih is None:
        raise ValueError("AVI missing avih header")
    if not frames:
        raise ValueError("AVI 'movi' has no video frames")
    return (*avih, frames)


# --------------------------------------------------------------------------
# unified sample decode

def parse_mjpeg(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode an MJPEG video to samples: dispatches on magic bytes (RIFF
    AVI container vs bare concatenated JFIF), decodes every frame with
    the pure-numpy baseline JPEG decoder, and cross-checks consistency
    (all frames share one geometry; an AVI's avih must agree with the
    decoded dimensions and frame count). Returns (width, height,
    channels, pixels (n_frames, h, w, channels) uint8)."""
    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    if data[:4] == b"RIFF":
        aw, ah, an, frame_bytes = parse_avi_mjpeg(data)
    elif data[:2] == b"\xff\xd8":
        aw = ah = an = None
        frame_bytes = split_jfif_stream(data)
    else:
        raise ValueError(f"not an MJPEG payload (magic {bytes(data[:4])!r})")
    decoded = [parse_jpeg(fb) for fb in frame_bytes]
    dims = {(w, h, ch) for w, h, ch, _px in decoded}
    if len(dims) != 1:
        raise ValueError(f"mixed frame geometries in MJPEG stream: {sorted(dims)}")
    (w, h, ch) = dims.pop()
    if aw is not None and (aw, ah) != (w, h):
        raise ValueError(f"avih says {aw}x{ah} but frames decode {w}x{h}")
    if an not in (None, 0, len(decoded)):
        raise ValueError(f"avih declares {an} frames, found {len(decoded)}")
    return w, h, ch, np.stack([px for _w, _h, _c, px in decoded])


def decode_mjpeg_frames(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Explode MJPEG video payloads to one row per decoded frame:
    (id, frame_no, width, height, channels, mean_px) — real sample decode,
    Arrow-batched ``mapInPandas``, partition-parallel over payload rows."""

    def decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fnos, ws, hs, chs, means = [], [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col].to_numpy(), pdf[payload_col]):
                w, h, ch, px = parse_mjpeg(payload)
                for i in range(px.shape[0]):
                    ids.append(doc_id)
                    fnos.append(i)
                    ws.append(w)
                    hs.append(h)
                    chs.append(ch)
                    means.append(float(px[i].mean()))
            yield pd.DataFrame(
                {
                    id_col: np.asarray(ids, dtype=np.int64),
                    "frame_no": np.asarray(fnos, dtype=np.int64),
                    "width": np.asarray(ws, dtype=np.int64),
                    "height": np.asarray(hs, dtype=np.int64),
                    "channels": np.asarray(chs, dtype=np.int64),
                    "mean_px": np.asarray(means, dtype=np.float64),
                }
            )

    schema = f"{id_col} long, frame_no long, width long, height long, channels long, mean_px double"
    return df.select(id_col, payload_col).mapInPandas(decode, schema=schema)


# --------------------------------------------------------------------------
# JVM-side synthesis (driver oracle path)

def attach_mjpeg_payload(df: DataFrame, source_col: str = "text", payload_col: str = "payload") -> DataFrame:
    """Deterministic REAL AVI/MJPEG file per row, built JVM-side: md5
    nibbles draw the geometry (8x8 or 16x16), the frame count (2..5) and
    each frame's flat gray value (16*nib + 8); the per-row expression
    selects among hex constants Huffman-packed once at SQL-construction
    time (module docstring explains why that is exact). The bytes are a
    complete AVI any demuxer reads, and every frame is a genuine baseline
    JPEG the entropy decoder must walk — a Huffman, IDCT, container or
    chunk-size bug on either side breaks the closed-form oracle hash."""
    nib = lambda k: f"cast(conv(substring(md5(`{source_col}`), {k}, 1), 16, 10) as int)"
    values = [16 * v + 8 for v in range(16)]
    frame_hex: list[list[str]] = []  # [geometry][value] -> '00dc' chunk hex
    header_hex: list[list[str]] = []  # [geometry][n_frames-2] -> bytes before first chunk
    for w, h in MJPEG_DIMS:
        raw = [build_flat_jpeg(w, h, v) for v in values]
        pad_to = max(len(r) for r in raw)
        pad_to += pad_to % 2  # even chunk bodies: no RIFF pad byte to model
        jpegs = [build_flat_jpeg(w, h, v, pad_to=pad_to) for v in values]
        frame_hex.append([_chunk(b"00dc", j).hex() for j in jpegs])
        per_n = []
        for n in range(2, MJPEG_MAX_FRAMES + 1):
            full = build_avi_mjpeg([jpegs[0]] * n, w, h)
            per_n.append(full[: full.index(b"00dc")].hex())
        header_hex.append(per_n)
    head = (
        "case _d "
        + " ".join(
            f"when {d} then (case _n " + " ".join(f"when {n} then '{header_hex[d][n - 2]}'" for n in range(2, MJPEG_MAX_FRAMES + 1)) + " end)"
            for d in range(len(MJPEG_DIMS))
        )
        + " end"
    )

    def frame(i: int) -> str:
        pick = (
            "case _d "
            + " ".join(f"when {d} then elt({nib(3 + i)} + 1, " + ", ".join(f"'{fh}'" for fh in frame_hex[d]) + ")" for d in range(len(MJPEG_DIMS)))
            + " end"
        )
        return f"case when {i} < _n then ({pick}) else '' end"

    expr = "unhex(concat(" + head + ", " + ", ".join(frame(i) for i in range(MJPEG_MAX_FRAMES)) + "))"
    return (
        df.withColumn("_d", F.expr(f"{nib(1)} % {len(MJPEG_DIMS)}"))
        .withColumn("_n", F.expr(f"2 + {nib(2)} % {MJPEG_MAX_FRAMES - 1}"))
        .withColumn(payload_col, F.expr(expr))
        .drop("_d", "_n")
        .withColumn("media_type", F.lit("video/x-motion-jpeg"))
    )
