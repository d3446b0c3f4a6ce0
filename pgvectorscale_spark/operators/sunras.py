"""Sun Raster (.ras) decode — pure stdlib/numpy, no media libraries.

The SunOS rasterfile format (public rasterfile.h layout): eight
big-endian int32 header words (magic 0x59a66a95, width, height, depth,
length, type, maptype, maplength), an optional planar RGB color map,
then image rows padded to 16-bit boundaries. All algorithmic — no
tabulated data:

- **Types**: 0 (old, length may be 0), 1 (standard), 2 (RT_BYTE_ENCODED
  run-length), 3 (RT_FORMAT_RGB — 24-bit rows in RGB instead of the
  default BGR).
- **RLE (type 2)**: the 0x80 marker byte — ``0x80 0x00`` is a literal
  0x80, ``0x80 n v`` repeats v exactly n+1 times, anything else is a
  literal byte. Runs may cross row boundaries; the decoder decompresses
  the stream continuously and reshapes after.
- **Depths**: 8-bit (grayscale, or indexed through the planar color map
  — all R bytes, then all G, then all B) and 24-bit (BGR default / RGB
  for type 3). 1- and 32-bit raise ValueError (malformed-input
  contract), as do unknown types/maptypes.

Reference parity: no analog in pgvectorscale (vector indexing, no
media); serves the multimodal pipeline brief alongside
operators/{tiff,pcx,ico}.py.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["RAS_MAGIC", "attach_ras_payload", "parse_ras", "ras_rle_encode"]

RAS_MAGIC = 0x59A66A95


def ras_rle_encode(data: bytes) -> bytes:
    """Test/build-side RT_BYTE_ENCODED encoder: runs of >= 3 (or any run
    of the 0x80 marker) become ``0x80 count-1 value``; lone 0x80 bytes
    escape as ``0x80 0x00``."""
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while i + run < len(data) and data[i + run] == data[i] and run < 256:
            run += 1
        if run >= 3 or (data[i] == 0x80 and run >= 2):
            out += bytes([0x80, run - 1, data[i]])
            i += run
        elif data[i] == 0x80:
            out += b"\x80\x00"
            i += 1
        else:
            out.append(data[i])
            i += 1
    return bytes(out)


def _ras_rle_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0
    while len(out) < expected:
        if pos >= len(data):
            raise ValueError("truncated Sun Raster RLE stream")
        b = data[pos]
        pos += 1
        if b != 0x80:
            out.append(b)
            continue
        if pos >= len(data):
            raise ValueError("truncated Sun Raster RLE marker")
        n = data[pos]
        pos += 1
        if n == 0:
            out.append(0x80)
            continue
        if pos >= len(data):
            raise ValueError("truncated Sun Raster RLE run")
        out += bytes([data[pos]]) * (n + 1)
        pos += 1
    if len(out) != expected:
        raise ValueError("Sun Raster RLE run overshoots the image data")
    return bytes(out)


def parse_ras(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse a Sun Raster file: returns (width, height, channels, pixels
    (h, w, ch) uint8)."""
    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    if len(data) < 32:
        raise ValueError("not a Sun Raster file (header short)")
    magic, w, h, depth, _length, rtype, maptype, maplen = struct.unpack(
        ">8i", data[:32]
    )
    if magic != RAS_MAGIC:
        raise ValueError("not a Sun Raster file (bad magic)")
    if rtype not in (0, 1, 2, 3):
        raise ValueError(f"unsupported Sun Raster type {rtype}")
    if depth not in (8, 24):
        raise ValueError(f"unsupported Sun Raster depth {depth} (8/24 only)")
    if maptype not in (0, 1) or (maptype == 0) != (maplen == 0):
        raise ValueError("unsupported/inconsistent Sun Raster color map")
    if maptype == 1 and (maplen % 3 or maplen > 768):
        raise ValueError(f"bad Sun Raster color-map length {maplen}")
    if w <= 0 or h <= 0 or w * h > (1 << 26):
        raise ValueError(f"implausible Sun Raster dimensions {w}x{h}")
    palette = None
    pos = 32
    if maptype == 1:
        if pos + maplen > len(data):
            raise ValueError("truncated Sun Raster color map")
        n = maplen // 3
        planes = np.frombuffer(data[pos : pos + maplen], dtype=np.uint8)
        palette = np.stack([planes[:n], planes[n : 2 * n], planes[2 * n :]], axis=1)
        pos += maplen
    ch = depth // 8
    stride = ((w * ch + 1) // 2) * 2  # rows pad to 16 bits
    total = stride * h
    if rtype == 2:
        raw = _ras_rle_decode(data[pos:], total)
    else:
        if pos + total > len(data):
            raise ValueError("truncated Sun Raster image data")
        raw = data[pos : pos + total]
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    px = rows[:, : w * ch].reshape(h, w, ch)
    if ch == 3 and rtype != 3:  # default byte order is BGR; type 3 is RGB
        px = px[:, :, ::-1]
    if ch == 1 and palette is not None:
        if int(px.max()) >= palette.shape[0]:
            raise ValueError("Sun Raster index exceeds the color map")
        px = palette[px[:, :, 0]]
    return w, h, px.shape[2], np.ascontiguousarray(px)


#: Synth geometry: 5x2 24-bit type-1 (uncompressed BGR), rows padded to 16
#: bytes — row r's 5 pixels are digest bytes 3j..3j+2 of md5(text) (r=0) /
#: md5(text || ':ras') (r=1), the 16th byte being the exercised row pad.
#: Channel means are closed forms: mean_c = avg over both digests of
#: bytes {3j + (2-c)} (BGR order), j in 0..4 (oracles.ras_decode_oracle).
RAS_W, RAS_H = 5, 2


def attach_ras_payload(df, source_col: str = "text", payload_col: str = "payload"):
    """Deterministic REAL Sun Raster per row, built JVM-side: a conformant
    big-endian type-1 24-bit file whose odd width exercises the 16-bit row
    pad — a byte-order, BGR, or padding bug on either side breaks the
    hash."""
    from pyspark.sql import functions as F

    stride = ((RAS_W * 3 + 1) // 2) * 2  # 16
    hdr = struct.pack(
        ">8i", RAS_MAGIC, RAS_W, RAS_H, 24, stride * RAS_H, 1, 0, 0
    ).hex()
    d1 = f"md5(`{source_col}`)"
    d2 = f"md5(concat(`{source_col}`, ':ras'))"
    return df.withColumn(
        payload_col,
        F.expr(f"unhex(concat('{hdr}', {d1}, {d2}))"),
    ).withColumn("media_type", F.lit("image/x-sun-raster"))
