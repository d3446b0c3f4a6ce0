"""PCX (ZSoft Paintbrush) decode — pure stdlib/numpy, no media libraries.

The PCX 5 format (public ZSoft technical reference): a 128-byte header,
byte-oriented RLE image data, optional trailing 256-color VGA palette.
Everything is algorithmic — no tabulated spec data — so it joins the
closed-form decode family:

- **RLE** (encoding 1): a byte with the top two bits set (>= 0xC0) is a
  run marker — count = byte & 0x3F, the next byte repeats count times;
  any other byte is a literal. Encoders MUST run-encode literal values
  >= 0xC0 (they are indistinguishable from markers), which the test-side
  encoder honors.
- **Planar layout**: each scanline stores ``nplanes`` consecutive planes
  of ``bytes_per_line`` bytes (R plane, G plane, B plane for 24-bit);
  runs may cross plane/scanline boundaries in real files, so the decoder
  decompresses the stream continuously and reshapes after.
- **VGA palette**: for 8-bit single-plane files, a 769-byte trailer
  (0x0C marker + 256*3 RGB) maps indices to colors; absent a trailer the
  plane is grayscale.

Supported: 8 bits per plane, 1 plane (gray or VGA-palette indexed) and
3 planes (RGB), encoding 1. Other depths/plane counts raise ValueError
(the malformed-input contract).

Reference parity: no analog in pgvectorscale (vector indexing, no media);
serves the multimodal pipeline brief alongside operators/{tiff,qoi}.py.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["attach_pcx_payload", "parse_pcx", "pcx_rle_encode"]


def pcx_rle_encode(data: bytes) -> bytes:
    """Test/build-side PCX RLE: greedy runs up to 63; literals >= 0xC0 are
    emitted as 1-runs per the spec requirement."""
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while i + run < len(data) and data[i + run] == data[i] and run < 63:
            run += 1
        if run > 1 or data[i] >= 0xC0:
            out += bytes([0xC0 | run, data[i]])
        else:
            out.append(data[i])
        i += run
    return bytes(out)


def parse_pcx(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse a PCX file: returns (width, height, channels, pixels (h, w,
    ch) uint8). Palette-indexed files return 3 channels; gray returns 1."""
    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    if len(data) < 128:
        raise ValueError("not a PCX file (header short)")
    (man, version, encoding, bpp, xmin, ymin, xmax, ymax) = struct.unpack(
        "<BBBBHHHH", data[:12]
    )
    nplanes = data[65]
    (bytes_per_line,) = struct.unpack("<H", data[66:68])
    if man != 0x0A:
        raise ValueError("not a PCX file (manufacturer byte != 0x0A)")
    if version not in (0, 2, 3, 4, 5):
        raise ValueError(f"unsupported PCX version {version}")
    if encoding != 1:
        raise ValueError(f"unsupported PCX encoding {encoding} (RLE only)")
    if bpp != 8:
        raise ValueError(f"unsupported PCX bits-per-plane {bpp} (8 only)")
    if nplanes not in (1, 3):
        raise ValueError(f"unsupported PCX plane count {nplanes} (1/3 only)")
    width = xmax - xmin + 1
    height = ymax - ymin + 1
    if width <= 0 or height <= 0 or width * height > (1 << 26):
        raise ValueError(f"implausible PCX dimensions {width}x{height}")
    if bytes_per_line < width:
        raise ValueError("PCX bytes_per_line smaller than the image width")

    # trailing VGA palette (version 5, 1 plane): 0x0C + 768 bytes
    palette = None
    body_end = len(data)
    if nplanes == 1 and len(data) >= 128 + 769 and data[-769] == 0x0C:
        palette = np.frombuffer(data[-768:], dtype=np.uint8).reshape(256, 3)
        body_end = len(data) - 769

    total = height * nplanes * bytes_per_line
    out = bytearray()
    pos = 128
    while len(out) < total:
        if pos >= body_end:
            raise ValueError("truncated PCX RLE stream")
        b = data[pos]
        pos += 1
        if b >= 0xC0:
            if pos >= body_end:
                raise ValueError("truncated PCX run")
            out += bytes([data[pos]]) * (b & 0x3F)
            pos += 1
        else:
            out.append(b)
    if len(out) != total:
        raise ValueError("PCX run overshoots the image data")
    rows = np.frombuffer(bytes(out), dtype=np.uint8).reshape(
        height, nplanes, bytes_per_line
    )[:, :, :width]
    px = np.ascontiguousarray(rows.transpose(0, 2, 1))  # (h, w, planes)
    if nplanes == 1 and palette is not None:
        px = palette[px[:, :, 0]]
    return width, height, px.shape[2], np.ascontiguousarray(px)


#: Synth geometry: 4x2 24-bit (3 planes, bytes_per_line 4). Row 0 is three
#: 4-byte RUNS (plane p = digest byte b_p repeated); row 1 is twelve
#: LITERALS (plane p byte k = b_{3+4p+k} % 192 — reduced below 0xC0 so a
#: literal can carry it). Channel means are closed forms over the digest:
#: mean_c = (4*b_c + sum_k(b_{3+4c+k} % 192)) / 8.
PCX_W, PCX_H = 4, 2


def attach_pcx_payload(df, source_col: str = "text", payload_col: str = "payload"):
    """Deterministic REAL PCX per row, built JVM-side: a conformant
    version-5 24-bit RLE file exercising both packet kinds — a run-flag,
    count-mask, plane-interleave or literal-threshold bug on either side
    breaks the hash (oracles.pcx_decode_oracle)."""
    from pyspark.sql import functions as F

    hdr = bytearray(128)
    hdr[0:12] = struct.pack(
        "<BBBBHHHH", 0x0A, 5, 1, 8, 0, 0, PCX_W - 1, PCX_H - 1
    )
    hdr[12:16] = struct.pack("<HH", 72, 72)  # dpi (ignored)
    hdr[65] = 3  # planes
    hdr[66:68] = struct.pack("<H", PCX_W)
    hdr[68:70] = struct.pack("<H", 1)  # palette info: color
    d = f"md5(`{source_col}`)"

    def byte_hex(j: int) -> str:
        return f"substr({d}, {2 * j + 1}, 2)"

    def lit_hex(j: int) -> str:
        # (b_j % 192) as two hex chars, JVM-side
        return (
            f"lpad(conv(cast(conv({byte_hex(j)}, 16, 10) as int) % 192, 10, 16), 2, '0')"
        )

    runs = ", ".join(f"'c{PCX_W:x}', {byte_hex(p)}" for p in range(3))
    lits = ", ".join(lit_hex(3 + 4 * p + k) for p in range(3) for k in range(4))
    return df.withColumn(
        payload_col,
        F.expr(f"unhex(concat('{bytes(hdr).hex()}', {runs}, {lits}))"),
    ).withColumn("media_type", F.lit("image/pcx"))
