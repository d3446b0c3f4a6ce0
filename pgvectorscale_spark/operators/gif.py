"""GIF decode — header walk, color tables, interlace, and a spec-exact
LZW decompressor, pure numpy/stdlib.

GIF's compression is LZW with variable-width codes (GIF89a spec
appendix F / the original GIF87a document): the dictionary is built
dynamically from the stream itself, so — unlike JPEG's Huffman tables or
MP3's synthesis window — there is NO tabulated spec data to transcribe;
everything here is algorithmic and reproducible from the published spec
text alone. That puts GIF in the same honestly-decodable class as PNG
(stored/dynamic deflate via stdlib zlib), BMP, PPM and baseline JPEG.

Supported: GIF87a/GIF89a, global and local color tables, interlaced and
sequential row order, extension-block skipping (GCE/comment/application),
multi-image streams (each image decoded in its own rect; the first frame
is composited onto a background-color canvas for the ``parse_image``
contract).  Malformed streams raise ValueError; there is nothing to gate
— the format has no entropy variant outside LZW.

Reference parity: timescale/pgvectorscale has no media decode — this
extends the LLM-pipeline multimodal surface (SURVEY.md §2 "multimodal
columns") like operators/jpeg.py and operators/h264.py do.
"""
from __future__ import annotations

import struct

import numpy as np

__all__ = ["parse_gif", "parse_gif_frames", "build_flat_gif", "attach_gif_payload"]

_MAX_PIXELS = 1 << 26


def _lzw_decode(data: bytes, min_code: int, max_pixels: int) -> list[int]:
    """GIF-variant LZW: variable code width starting min_code+1, LSB-first
    bit packing, CLEAR/END control codes, width grows when the next free
    code would not fit, capped at 12 bits until the next CLEAR."""
    if not 2 <= min_code <= 11:
        raise ValueError(f"bad LZW minimum code size {min_code}")
    clear = 1 << min_code
    end = clear + 1
    big = int.from_bytes(data, "little")
    total_bits = 8 * len(data)
    pos = 0
    code_size = min_code + 1
    prefix: list[tuple[int, ...]] = [(i,) for i in range(clear)] + [(), ()]
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    while pos + code_size <= total_bits:
        code = (big >> pos) & ((1 << code_size) - 1)
        pos += code_size
        if code == clear:
            prefix = prefix[: clear + 2]
            code_size = min_code + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            if code >= clear:
                raise ValueError("LZW stream starts with a non-literal code")
            entry = prefix[code]
        elif code < len(prefix):
            entry = prefix[code]
        elif code == len(prefix):
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise ValueError(f"LZW code {code} beyond dictionary")
        out.extend(entry)
        if len(out) > max_pixels:
            raise ValueError("LZW output exceeds declared pixel count")
        if prev is not None and len(prefix) < 4096:
            prefix.append(prev + (entry[0],))
        if len(prefix) == (1 << code_size) and code_size < 12:
            code_size += 1
        prev = entry
    raise ValueError("LZW stream ended without an END code")


def _read_color_table(data: bytes, pos: int, size_field: int) -> tuple[np.ndarray, int]:
    n = 2 << size_field  # 2^(size+1) entries
    need = 3 * n
    if pos + need > len(data):
        raise ValueError("truncated GIF color table")
    table = np.frombuffer(data[pos : pos + need], dtype=np.uint8).reshape(n, 3)
    return table, pos + need


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF data sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        if pos + n > len(data):
            raise ValueError("truncated GIF data sub-block")
        chunks.append(data[pos : pos + n])
        pos += n


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def parse_gif_frames(
    data: bytes,
) -> tuple[int, int, list[tuple[int, int, np.ndarray]], np.ndarray | None]:
    """Decode every image block of a GIF: returns (canvas_w, canvas_h,
    [(left, top, rgb (h, w, 3) uint8), ...], bg_rgb-or-None).  The
    background color resolves through the GLOBAL color table (None
    without one).  Each frame is decoded in its own rect through its own
    (or the global) color table; animation DISPOSAL semantics are the
    caller's concern — this returns the decoded pixel data, like
    mjpeg.parse_mjpeg does."""
    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    data = bytes(data)
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    cw, ch = struct.unpack("<HH", data[6:10])
    packed, bg = data[10], data[11]
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _read_color_table(data, pos, packed & 7)
    if cw * ch > _MAX_PIXELS:
        raise ValueError(f"implausible GIF canvas {cw}x{ch}")
    frames: list[tuple[int, int, np.ndarray]] = []
    while True:
        if pos >= len(data):
            raise ValueError("GIF ended without trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= len(data):
                raise ValueError("truncated GIF extension")
            pos += 1  # label
            _, pos = _read_subblocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated GIF image descriptor")
        left, top, w, h = struct.unpack("<HHHH", data[pos : pos + 8])
        ipacked = data[pos + 8]
        pos += 9
        table = gct
        if ipacked & 0x80:
            table, pos = _read_color_table(data, pos, ipacked & 7)
        if table is None:
            raise ValueError("GIF image without any color table")
        if w == 0 or h == 0 or w * h > _MAX_PIXELS:
            raise ValueError(f"implausible GIF image rect {w}x{h}")
        if pos >= len(data):
            raise ValueError("truncated GIF image data")
        min_code = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        idx = _lzw_decode(lzw, min_code, w * h)
        if len(idx) < w * h:
            raise ValueError(f"GIF image short {len(idx)}/{w * h} pixels")
        arr = np.asarray(idx[: w * h], dtype=np.int64)
        if int(arr.max(initial=0)) >= len(table):
            raise ValueError("GIF pixel index beyond color table")
        grid = arr.reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            rows = np.empty(h, dtype=np.int64)
            r = 0
            for start, step in _INTERLACE_PASSES:
                for y in range(start, h, step):
                    rows[y] = r
                    r += 1
            grid = grid[rows]
        frames.append((left, top, table[grid]))
    if not frames:
        raise ValueError("GIF has no image blocks")
    bg_rgb = gct[bg] if gct is not None and bg < len(gct) else None
    return cw, ch, frames, bg_rgb


def parse_gif(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """First-frame GIF decode under the ``parse_image`` contract: returns
    (width, height, 3, rgb pixels) with the first image block composited
    onto a background-color canvas (frames smaller than the canvas are
    padded with the background color)."""
    cw, ch, frames, bg_rgb = parse_gif_frames(data)
    left, top, px = frames[0]
    h, w = px.shape[:2]
    if (left, top, w, h) == (0, 0, cw, ch):
        return cw, ch, 3, px
    if left + w > cw or top + h > ch:
        raise ValueError("GIF frame rect exceeds canvas")
    # GIFs without a global table but with a frame rect smaller than the
    # canvas are pathological — pad 0 there
    canvas = np.zeros((ch, cw, 3), dtype=np.uint8)
    if bg_rgb is not None:
        canvas[:] = bg_rgb
    canvas[top : top + h, left : left + w] = px
    return cw, ch, 3, canvas


# ---------------------------------------------------------------------------
# synthesis (driver-oracle path)
# ---------------------------------------------------------------------------


def _lzw_encode(indices: list[int], min_code: int) -> bytes:
    """Build-time LZW encoder (runs on the driver while constructing SQL
    literals; also the test-side round-trip partner)."""
    clear = 1 << min_code
    end = clear + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code + 1
    bits: list[tuple[int, int]] = [(clear, code_size)]
    cur: tuple[int, ...] = ()
    for sym in indices:
        cand = cur + (sym,)
        if cand in table:
            cur = cand
            continue
        bits.append((table[cur], code_size))
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        cur = (sym,)
    if cur:
        bits.append((table[cur], code_size))
    bits.append((end, code_size))
    big = 0
    pos = 0
    for code, width in bits:
        big |= code << pos
        pos += width
    return big.to_bytes((pos + 7) // 8, "little")


def build_flat_gif(w: int, h: int, value: int) -> bytes:
    """A complete GIF89a whose single full-canvas frame is the flat gray
    (value, value, value): 2-entry global color table [0, value], all-index-1
    pixels through real LZW. Deterministic bytes for the SQL-literal synth."""
    gct = bytes([0, 0, 0, value, value, value])  # size field 0 -> 2 entries
    lzw = _lzw_encode([1] * (w * h), 2)
    sub = b"".join(
        bytes([min(255, len(lzw) - i)]) + lzw[i : i + 255]
        for i in range(0, len(lzw), 255)
    ) + b"\x00"
    return (
        b"GIF89a"
        + struct.pack("<HH", w, h)
        + bytes([0x80, 0, 0])  # GCT present, size field 0 (2 entries)
        + gct
        + b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        + bytes([2])  # LZW minimum code size
        + sub
        + b"\x3b"
    )


GIF_DIM = 10  # 10x10 flat frame per document


def attach_gif_payload(df, source_col: str = "text", payload_col: str = "payload"):
    """Deterministic REAL GIF per row, built JVM-side: md5 nibble 1 draws
    the flat gray value (16*nib + 8) and the per-row expression selects
    among 16 complete GIFs LZW-encoded once at SQL-construction time —
    every payload is a genuine GIF any decoder reads, and the decoded
    mean has the closed form 16*nib+8 (oracles.gif_decode_oracle).  A
    color-table, LZW, sub-block, or framing bug on either side breaks
    the hash."""
    from pyspark.sql import functions as F

    nib = f"cast(conv(substring(md5(`{source_col}`), 1, 1), 16, 10) as int)"
    variants = ", ".join(
        f"'{build_flat_gif(GIF_DIM, GIF_DIM, 16 * v + 8).hex()}'" for v in range(16)
    )
    return df.withColumn(
        payload_col, F.expr(f"unhex(elt({nib} + 1, {variants}))")
    ).withColumn("media_type", F.lit("image/gif"))
