"""QOI ("Quite OK Image") decode — pure Python/numpy, zero dependencies.

REAL decompression of a real public format (the one-page QOI
specification, qoiformat.org): a 14-byte big-endian header then a
byte-aligned stream of six chunk ops over a running 64-slot color index —

  QOI_OP_RGB   0xFE r g b          explicit RGB (alpha carried over)
  QOI_OP_RGBA  0xFF r g b a        explicit RGBA
  QOI_OP_INDEX 0b00iiiiii          running-index lookup, slot i
  QOI_OP_DIFF  0b01drdgdb          per-channel diff -2..1 (bias 2), mod 256
  QOI_OP_LUMA  0b10dddddd ds       dg -32..31 (bias 32); second byte packs
                                   (dr-dg, db-dg) each -8..7 (bias 8)
  QOI_OP_RUN   0b11rrrrrr          repeat previous pixel 1..62 times

with index slot = (r*3 + g*5 + b*7 + a*11) % 64, every decoded pixel
written back into its slot, previous pixel seeded (0,0,0,255), and an
8-byte end marker (seven 0x00 then 0x01). Everything above is algorithmic
— the spec carries no tables — so the decoder is honestly closed-form,
like the GIF LZW dictionary (built from the stream) and unlike MP3/H.264
residuals (gated: their tables have no closed form).

Reference parity: none — pgvectorscale is a vector-index extension with no
media surface; this extends the multimodal ingest plane (SURVEY §2's
"beyond the reference" pipeline operators).
"""
from __future__ import annotations

import struct

import numpy as np

__all__ = ["parse_qoi", "QOI_MAGIC"]

QOI_MAGIC = b"qoif"
_END_MARKER = b"\x00" * 7 + b"\x01"


def parse_qoi(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a QOI file: returns (width, height, channels, pixels
    (h, w, channels) uint8). channels is the header's 3 (RGB) or 4 (RGBA);
    for 3, the alpha state still participates in index hashing per spec,
    it is just not emitted. Malformed streams (bad magic, zero/implausible
    dims, truncated chunks, missing end marker, pixel over/underrun) raise
    ValueError loudly."""
    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    if len(data) < 22 or data[:4] != QOI_MAGIC:
        raise ValueError(f"not a QOI file (magic {data[:4]!r})")
    width, height = struct.unpack(">II", data[4:12])
    channels, colorspace = data[12], data[13]
    if channels not in (3, 4):
        raise ValueError(f"bad QOI channels {channels} (must be 3 or 4)")
    if colorspace not in (0, 1):
        raise ValueError(f"bad QOI colorspace {colorspace}")
    if width == 0 or height == 0 or width * height > (1 << 26):
        raise ValueError(f"implausible QOI dimensions {width}x{height}")
    n_px = width * height
    out = np.empty((n_px, 4), dtype=np.uint8)
    index = np.zeros((64, 4), dtype=np.uint8)
    r, g, b, a = 0, 0, 0, 255
    pos, filled = 14, 0
    end = len(data) - 8
    if data[end:] != _END_MARKER:
        raise ValueError("QOI end marker missing")
    while filled < n_px:
        if pos >= end:
            raise ValueError("QOI pixel underrun (stream ended early)")
        byte = data[pos]
        pos += 1
        if byte == 0xFE:  # QOI_OP_RGB
            if pos + 3 > end:
                raise ValueError("truncated QOI_OP_RGB")
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif byte == 0xFF:  # QOI_OP_RGBA
            if pos + 4 > end:
                raise ValueError("truncated QOI_OP_RGBA")
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            tag = byte >> 6
            if tag == 0:  # QOI_OP_INDEX
                r, g, b, a = (int(x) for x in index[byte & 0x3F])
            elif tag == 1:  # QOI_OP_DIFF, bias 2, wraparound
                r = (r + ((byte >> 4) & 3) - 2) & 0xFF
                g = (g + ((byte >> 2) & 3) - 2) & 0xFF
                b = (b + (byte & 3) - 2) & 0xFF
            elif tag == 2:  # QOI_OP_LUMA
                if pos + 1 > end:
                    raise ValueError("truncated QOI_OP_LUMA")
                dg = (byte & 0x3F) - 32
                ds = data[pos]
                pos += 1
                r = (r + dg + ((ds >> 4) & 15) - 8) & 0xFF
                g = (g + dg) & 0xFF
                b = (b + dg + (ds & 15) - 8) & 0xFF
            else:  # QOI_OP_RUN (0xFE/0xFF already peeled above)
                run = (byte & 0x3F) + 1
                if filled + run > n_px:
                    raise ValueError("QOI run overruns the pixel count")
                out[filled : filled + run] = (r, g, b, a)
                filled += run
                # the reference decoder indexes the pixel after EVERY
                # chunk, runs included — observable when the first chunk
                # is a run of the never-yet-indexed seed (0,0,0,255)
                index[(r * 3 + g * 5 + b * 7 + a * 11) % 64] = (r, g, b, a)
                continue
        out[filled] = (r, g, b, a)
        filled += 1
        index[(r * 3 + g * 5 + b * 7 + a * 11) % 64] = (r, g, b, a)
    if pos != end:
        raise ValueError("QOI trailing bytes before the end marker")
    px = out.reshape(height, width, 4)
    return width, height, channels, (px if channels == 4 else px[:, :, :3])
