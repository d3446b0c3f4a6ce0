"""TGA decode (multimodal.parse_tga): independent test-side encoder (raw +
RLE with greedy run detection), round-trips over both row orders and all
depths, RLE packets crossing scanlines, malformed gates, and the JVM-synth
closed form."""
from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from pgvectorscale_spark.operators.multimodal import (
    TGA_H,
    TGA_W,
    parse_tga,
)


def encode_tga(px: np.ndarray, rle: bool, top_down: bool = True) -> bytes:
    """Independent TGA writer: px is (h, w, ch) uint8 in RGB(A)/gray."""
    h, w, ch = px.shape
    img_type = (11 if rle else 3) if ch == 1 else (10 if rle else 2)
    hdr = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, img_type, 0, 0, 0, 0, 0, w, h, ch * 8,
        0x20 if top_down else 0,
    )
    rows = px if top_down else px[::-1]
    if ch >= 3:
        rows = rows[:, :, [2, 1, 0] + ([3] if ch == 4 else [])]  # BGR(A)
    flat = rows.reshape(-1, ch)
    if not rle:
        return hdr + flat.tobytes()
    out = bytearray(hdr)
    i = 0
    while i < len(flat):
        j = i + 1
        while j < len(flat) and j - i < 128 and np.array_equal(flat[j], flat[i]):
            j += 1
        if j - i >= 2:  # run
            out.append(0x80 | (j - i - 1))
            out += flat[i].tobytes()
        else:  # literal run until next repeat
            j = i + 1
            while (
                j < len(flat) and j - i < 128
                and not (j + 1 < len(flat) and np.array_equal(flat[j], flat[j + 1]))
            ):
                j += 1
            out.append(j - i - 1)
            out += flat[i:j].tobytes()
        i = j
    return bytes(out)


rng = np.random.default_rng(0x7A6A)


class TestParseTga:
    @pytest.mark.parametrize("rle", [False, True])
    @pytest.mark.parametrize("top_down", [False, True])
    @pytest.mark.parametrize("ch", [1, 3, 4])
    def test_roundtrip(self, rle, top_down, ch):
        px = (rng.integers(0, 4, (5, 7, ch), dtype=np.uint8)) * 80
        w, h, got_ch, got = parse_tga(encode_tga(px, rle, top_down))
        assert (w, h, got_ch) == (7, 5, ch)
        assert np.array_equal(got, px)

    def test_rle_packet_crossing_scanlines(self):
        # one 200-pixel run across a 10x20 image: a single RLE packet can
        # cover at most 128 px, so the encoder emits 128 + 72 — both cross
        # row boundaries and the decoder must treat the stream as flat
        px = np.full((20, 10, 3), 99, dtype=np.uint8)
        data = encode_tga(px, rle=True)
        w, h, ch, got = parse_tga(data)
        assert np.array_equal(got, px)

    def test_gates_and_malformed(self):
        good = encode_tga(np.zeros((2, 2, 3), np.uint8), rle=True)
        cmapped = bytearray(good)
        cmapped[1] = 1
        with pytest.raises(ValueError, match="colormapped"):
            parse_tga(bytes(cmapped))
        t1 = bytearray(good)
        t1[2] = 1
        with pytest.raises(ValueError, match="image type"):
            parse_tga(bytes(t1))
        d16 = bytearray(good)
        d16[16] = 16
        with pytest.raises(ValueError, match="depth"):
            parse_tga(bytes(d16))
        r2l = bytearray(good)
        r2l[17] |= 0x10
        with pytest.raises(ValueError, match="right-to-left"):
            parse_tga(bytes(r2l))
        with pytest.raises(ValueError, match="truncated"):
            parse_tga(good[:-2])
        overrun = good[:18] + bytes([0x80 | 127]) + bytes(3)  # run 128 > 4 px
        with pytest.raises(ValueError, match="overruns"):
            parse_tga(overrun)

    def test_gray_and_mismatch_gate(self):
        g = rng.integers(0, 255, (3, 4, 1), dtype=np.uint8)
        w, h, ch, got = parse_tga(encode_tga(g, rle=False))
        assert ch == 1 and np.array_equal(got, g)
        bad = bytearray(encode_tga(g, rle=False))
        bad[16] = 24  # gray type with 24-bit depth
        with pytest.raises(ValueError, match="mismatched"):
            parse_tga(bytes(bad))

    def test_synth_closed_form(self):
        digest = hashlib.md5(b"doc").digest()
        b = list(digest)
        hdr = struct.pack(
            "<BBBHHBHHHHBB", 0, 0, 10, 0, 0, 0, 0, 0, TGA_W, TGA_H, 24, 0x20
        )
        data = hdr + bytes([0x04]) + digest[:15] + bytes([0x84, b[15], b[0], b[1]])
        w, h, ch, px = parse_tga(data)
        assert (w, h, ch) == (TGA_W, TGA_H, 3)
        flat = px.reshape(-1, 3).astype(np.int64)
        for c, (raw_off, run_b) in enumerate(((2, 1), (1, 0), (0, 15))):
            want = (sum(b[3 * j + raw_off] for j in range(5)) + 5 * b[run_b]) / 10
            assert abs(flat[:, c].mean() - want) < 1e-9


def test_attach_and_decode_spark(spark):
    from pgvectorscale_spark.operators.multimodal import (
        attach_tga_payload,
        decode_tga_image,
    )

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "zzz")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in decode_tga_image(attach_tga_payload(df)).collect()}
    for doc_id, text in ((1, "hello world"), (2, "zzz")):
        b = list(hashlib.md5(text.encode()).digest())
        r = out[doc_id]
        assert (r["width"], r["height"], r["channels"]) == (TGA_W, TGA_H, 3)
        assert abs(r["mean_r"] - round((sum(b[3 * j + 2] for j in range(5)) + 5 * b[1]) / 10, 6)) < 1e-9
        assert abs(r["mean_g"] - round((sum(b[3 * j + 1] for j in range(5)) + 5 * b[0]) / 10, 6)) < 1e-9
        assert abs(r["mean_b"] - round((sum(b[3 * j] for j in range(5)) + 5 * b[15]) / 10, 6)) < 1e-9
