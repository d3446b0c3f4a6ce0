"""GIF decode (operators/gif.py) vs an INDEPENDENT test-side encoder:
LZW round-trips, interlace, local color tables, multi-frame rects,
extension skipping, and the JVM-synth closed form."""
from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from pgvectorscale_spark.operators.gif import (
    GIF_DIM,
    build_flat_gif,
    parse_gif,
    parse_gif_frames,
)

rng = np.random.default_rng(0x61F)


def _pack_lsb(codes):
    big, pos = 0, 0
    for code, width in codes:
        big |= code << pos
        pos += width
    return big.to_bytes((pos + 7) // 8, "little")


def lzw_encode_ref(indices, min_code):
    """Independent LZW encoder (different structure from the production
    build-time one: explicit string-table walk emitting (code,width)
    pairs, interleaving CLEAR resets when the table fills)."""
    clear, end = 1 << min_code, (1 << min_code) + 1

    def fresh():
        return {(i,): i for i in range(clear)}

    table, next_code, width = fresh(), end + 1, min_code + 1
    out = [(clear, width)]
    cur = ()
    for s in indices:
        if cur + (s,) in table:
            cur += (s,)
            continue
        out.append((table[cur], width))
        if next_code == 4096:
            out.append((clear, width))
            table, next_code, width = fresh(), end + 1, min_code + 1
        else:
            table[cur + (s,)] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        cur = (s,)
    if cur:
        out.append((table[cur], width))
    out.append((end, width))
    return _pack_lsb(out)


def _subblocks(raw):
    return b"".join(
        bytes([min(255, len(raw) - i)]) + raw[i : i + 255]
        for i in range(0, len(raw), 255)
    ) + b"\x00"


def encode_gif(frames, canvas=None, palette=None, interlace=False,
               local_tables=False, with_extensions=False, bg=0):
    """Independent GIF writer. frames = [(left, top, idx (h, w) array)];
    palette = (n, 3) uint8 (global unless local_tables)."""
    if palette is None:
        palette = rng.integers(0, 256, (8, 3)).astype(np.uint8)
    n = len(palette)
    size_field = max(0, (n - 1).bit_length() - 1)
    full = 2 << size_field
    pal = np.vstack([palette, np.zeros((full - n, 3), np.uint8)])
    cw, ch = canvas or (
        max(l + f.shape[1] for l, t, f in frames),
        max(t + f.shape[0] for l, t, f in frames),
    )
    min_code = max(2, (n - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", cw, ch)
    if local_tables:
        out += bytes([0x00, 0, 0])
    else:
        out += bytes([0x80 | size_field, bg, 0]) + pal.tobytes()
    if with_extensions:
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE
        out += b"\x21\xfe" + _subblocks(b"a comment")
    for left, top, idx in frames:
        h, w = idx.shape
        packed = (0x80 | size_field if local_tables else 0) | (0x40 if interlace else 0)
        out += b"\x2c" + struct.pack("<HHHH", left, top, w, h) + bytes([packed])
        if local_tables:
            out += pal.tobytes()
        rows = idx
        if interlace:
            order = []
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                order += list(range(start, h, step))
            rows = idx[order]
        out += bytes([min_code]) + _subblocks(
            lzw_encode_ref(rows.reshape(-1).tolist(), min_code)
        )
    out += b"\x3b"
    return bytes(out)


class TestGifRoundTrip:
    @pytest.mark.parametrize("w,h", [(1, 1), (7, 5), (33, 9), (16, 16)])
    def test_random_image(self, w, h):
        pal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
        idx = rng.integers(0, 8, (h, w))
        w2, h2, ch, px = parse_gif(encode_gif([(0, 0, idx)], palette=pal))
        assert (w2, h2, ch) == (w, h, 3)
        np.testing.assert_array_equal(px, pal[idx])

    def test_interlaced(self):
        pal = rng.integers(0, 256, (4, 3)).astype(np.uint8)
        idx = rng.integers(0, 4, (13, 6))
        _, _, _, px = parse_gif(encode_gif([(0, 0, idx)], interlace=True, palette=pal))
        np.testing.assert_array_equal(px, pal[idx])

    def test_local_color_table_and_extensions(self):
        pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
        idx = rng.integers(0, 16, (4, 4))
        stream = encode_gif([(0, 0, idx)], palette=pal, local_tables=True,
                            with_extensions=True)
        _, _, _, px = parse_gif(stream)
        np.testing.assert_array_equal(px, pal[idx])

    def test_multi_frame_rects(self):
        pal = rng.integers(0, 256, (4, 3)).astype(np.uint8)
        f0 = rng.integers(0, 4, (6, 8))
        f1 = rng.integers(0, 4, (2, 3))
        stream = encode_gif([(0, 0, f0), (2, 1, f1)], canvas=(8, 6), palette=pal)
        cw, ch, frames, _ = parse_gif_frames(stream)
        assert (cw, ch) == (8, 6) and len(frames) == 2
        np.testing.assert_array_equal(frames[0][2], pal[f0])
        assert frames[1][:2] == (2, 1)
        np.testing.assert_array_equal(frames[1][2], pal[f1])
        # parse_gif returns the composited FIRST frame
        _, _, _, px = parse_gif(stream)
        np.testing.assert_array_equal(px, pal[f0])

    def test_small_first_frame_composites_on_background(self):
        """A first frame smaller than the canvas pads with the global
        table's background color under the parse_image contract."""
        pal = rng.integers(0, 256, (4, 3)).astype(np.uint8)
        idx = rng.integers(0, 4, (2, 2))
        stream = encode_gif([(1, 1, idx)], canvas=(4, 4), palette=pal, bg=3)
        w, h, ch, px = parse_gif(stream)
        assert (w, h) == (4, 4)
        np.testing.assert_array_equal(px[1:3, 1:3], pal[idx])
        np.testing.assert_array_equal(px[0, 0], pal[3])
        np.testing.assert_array_equal(px[3, 3], pal[3])

    def test_kwkwk_case(self):
        """Index stream [0,0,0] forces code == next_code at the decoder."""
        pal = np.array([[5, 6, 7], [8, 9, 10]], np.uint8)
        idx = np.zeros((1, 3), dtype=np.int64)
        _, _, _, px = parse_gif(encode_gif([(0, 0, idx)], palette=pal))
        np.testing.assert_array_equal(px, pal[idx])

    def test_dictionary_reset_long_stream(self):
        """A stream long enough to fill the 4096-code table and force the
        reference encoder's CLEAR reset mid-stream."""
        pal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
        idx = rng.integers(0, 8, (80, 80))
        _, _, _, px = parse_gif(encode_gif([(0, 0, idx)], palette=pal))
        np.testing.assert_array_equal(px, pal[idx])

    def test_production_encoder_interops(self):
        """build_flat_gif's production LZW bytes decode through the
        independent path too (the test encoder and production encoder are
        distinct implementations of the same spec)."""
        for v in (8, 136, 248):
            w, h, ch, px = parse_gif(build_flat_gif(5, 4, v))
            assert (w, h, ch) == (5, 4, 3) and (px == v).all()


class TestGifErrors:
    def test_malformed(self):
        pal = np.zeros((4, 3), np.uint8)
        idx = np.zeros((2, 2), dtype=np.int64)
        good = encode_gif([(0, 0, idx)], palette=pal)
        with pytest.raises(ValueError, match="not a GIF"):
            parse_gif(b"NOPE" + good[4:])
        with pytest.raises(ValueError, match="trailer|truncated|ended"):
            parse_gif(good[:-2])
        bad_block = bytearray(good)
        bad_block[bad_block.index(0x2C)] = 0x7F
        with pytest.raises(ValueError, match="unknown GIF block"):
            parse_gif(bytes(bad_block))

    def test_short_pixel_data(self):
        from pgvectorscale_spark.operators.gif import _lzw_encode

        lzw = _lzw_encode([1] * 3, 2)  # 3 pixels for a 2x2 frame
        sub = bytes([len(lzw)]) + lzw + b"\x00"
        stream = (
            b"GIF89a" + struct.pack("<HH", 2, 2) + bytes([0x80, 0, 0])
            + bytes([0, 0, 0, 1, 1, 1])
            + b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + b"\x00"
            + bytes([2]) + sub + b"\x3b"
        )
        with pytest.raises(ValueError, match="short"):
            parse_gif(stream)

    def test_dispatches_via_parse_image(self):
        from pgvectorscale_spark.operators.multimodal import parse_image

        assert parse_image(build_flat_gif(3, 3, 24))[:3] == (3, 3, 3)


def test_attach_and_decode_spark(spark):
    from pgvectorscale_spark.operators.gif import attach_gif_payload
    from pgvectorscale_spark.operators.multimodal import decode_image

    df = spark.createDataFrame(
        [(i, f"gif doc {i}") for i in range(5)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in decode_image(attach_gif_payload(df)).collect()}
    for i in range(5):
        nib = int(hashlib.md5(f"gif doc {i}".encode()).hexdigest()[0], 16)
        r = rows[i]
        assert (r["width"], r["height"], r["channels"]) == (GIF_DIM, GIF_DIM, 3)
        for c in "rgb":
            assert r[f"mean_{c}"] == float(16 * nib + 8)
