"""Windows ICO decode — pure stdlib/numpy, no media libraries.

The ICO container (public Windows resource format): an ICONDIR header,
one ICONDIRENTRY per image, then per-image payloads that are either a
complete PNG (magic-dispatched to the package's real PNG decoder) or a
headerless DIB — a BITMAPINFOHEADER whose biHeight is DOUBLED to cover
the XOR color bitmap plus the 1-bit AND transparency mask, rows
bottom-up and 4-byte aligned, pixels BGR(A).

Decode policy: the LARGEST image (max w*h, ties to the earliest entry)
decodes; 32bpp returns RGBA straight from the XOR bitmap (the mask is
vestigial when an alpha channel exists), 24bpp synthesizes alpha from
the AND mask (0 where masked out — what real icon renderers do).
Palette/1/4/8-bit DIB entries raise ValueError (malformed-input
contract), PNG entries support whatever parse_png supports.

Reference parity: no analog in pgvectorscale (vector indexing, no
media); serves the multimodal pipeline brief alongside
operators/{tiff,pcx,qoi}.py.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["attach_ico_payload", "parse_ico"]

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _mask_rows(data: bytes, off: int, w: int, h: int) -> np.ndarray:
    """1-bit AND mask, rows bottom-up and padded to 32 bits: returns (h, w)
    bool (True = masked out / transparent)."""
    stride = ((w + 31) // 32) * 4
    need = stride * h
    if off + need > len(data):
        raise ValueError("truncated ICO AND mask")
    rows = np.frombuffer(data[off : off + need], dtype=np.uint8).reshape(h, stride)
    bits = np.unpackbits(rows, axis=1)[:, :w]
    return bits[::-1].astype(bool)


def parse_ico(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse an ICO: returns (width, height, channels, pixels (h, w, ch)
    uint8) for the largest contained image."""
    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    if len(data) < 6:
        raise ValueError("not an ICO file (header short)")
    reserved, rtype, count = struct.unpack("<HHH", data[:6])
    if reserved != 0 or rtype != 1 or count == 0:
        raise ValueError("not an ICO file (bad ICONDIR)")
    if 6 + 16 * count > len(data):
        raise ValueError("truncated ICO directory")
    entries = []
    for i in range(count):
        w8, h8, _colors, _res, _planes, _bpp, size, off = struct.unpack(
            "<BBBBHHII", data[6 + 16 * i : 22 + 16 * i]
        )
        w, h = w8 or 256, h8 or 256
        entries.append((w * h, -i, w, h, size, off))
    _, _, w, h, size, off = max(entries)
    if off + size > len(data):
        raise ValueError("ICO image payload extends past end of file")
    payload = data[off : off + size]
    if payload[:8] == _PNG_MAGIC:
        from pgvectorscale_spark.operators.multimodal import parse_png

        return parse_png(payload)
    if len(payload) < 40:
        raise ValueError("truncated ICO DIB header")
    (hdr_size, biw, bih, planes, bpp, comp) = struct.unpack(
        "<IiiHHI", payload[:20]
    )
    if hdr_size != 40 or comp != 0:
        raise ValueError(
            f"unsupported ICO DIB (header {hdr_size}, compression {comp})"
        )
    if biw != w or bih != 2 * h:
        raise ValueError(
            f"ICO DIB geometry {biw}x{bih} inconsistent with entry {w}x{2 * h}"
        )
    if bpp not in (24, 32):
        raise ValueError(f"unsupported ICO bit depth {bpp} (24/32 only)")
    ch = bpp // 8
    stride = ((w * ch + 3) // 4) * 4
    need = 40 + stride * h
    if len(payload) < need:
        raise ValueError("truncated ICO XOR bitmap")
    rows = np.frombuffer(payload[40:need], dtype=np.uint8).reshape(h, stride)
    px = rows[:, : w * ch].reshape(h, w, ch)[::-1]  # bottom-up
    if ch == 4:  # BGRA -> RGBA; alpha channel supersedes the AND mask
        px = px[:, :, [2, 1, 0, 3]]
        return w, h, 4, np.ascontiguousarray(px)
    mask = _mask_rows(payload, need, w, h)
    rgba = np.empty((h, w, 4), dtype=np.uint8)
    rgba[:, :, :3] = px[:, :, [2, 1, 0]]  # BGR -> RGB
    rgba[:, :, 3] = np.where(mask, 0, 255)
    return w, h, 4, rgba


#: Synth geometry: one 4x2 32bpp DIB entry; the 8 BGRA pixels are the 16
#: md5(text) bytes followed by the 16 md5(text || ':ico') bytes, rows
#: bottom-up (means are order-invariant), AND mask all-zero. Channel mean
#: closed forms: mean of bytes 4j+2 (R), 4j+1 (G), 4j (B) across the two
#: digests (oracles.ico_decode_oracle).
ICO_W, ICO_H = 4, 2


def attach_ico_payload(df, source_col: str = "text", payload_col: str = "payload"):
    """Deterministic REAL ICO per row, built JVM-side: ICONDIR + one
    32bpp DIB entry (doubled-height BITMAPINFOHEADER, bottom-up BGRA XOR
    bitmap from two digests, all-zero AND mask) — a direction, layout,
    doubled-height or BGRA-order bug on either side breaks the hash."""
    from pyspark.sql import functions as F

    n_px = ICO_W * ICO_H
    xor_bytes = n_px * 4  # 32 = two md5 digests
    mask_stride = ((ICO_W + 31) // 32) * 4
    size = 40 + xor_bytes + mask_stride * ICO_H
    hdr = (
        struct.pack("<HHH", 0, 1, 1)
        + struct.pack("<BBBBHHII", ICO_W, ICO_H, 0, 0, 1, 32, size, 22)
        + struct.pack("<IiiHHIIiiII", 40, ICO_W, 2 * ICO_H, 1, 32, 0, 0, 0, 0, 0, 0)
    ).hex()
    mask = ("00" * mask_stride) * ICO_H
    d1 = f"md5(`{source_col}`)"
    d2 = f"md5(concat(`{source_col}`, ':ico'))"
    return df.withColumn(
        payload_col,
        F.expr(f"unhex(concat('{hdr}', {d1}, {d2}, '{mask}'))"),
    ).withColumn("media_type", F.lit("image/x-icon"))
