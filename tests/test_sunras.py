"""Tests for operators/sunras.py — Sun Raster decode (BGR/RGB 24-bit,
8-bit gray + colormap, RT_BYTE_ENCODED RLE, 16-bit row padding). The
builder here is independent of the module's synth (per-image RLE, color
maps, type-3 RGB ordering)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pgvectorscale_spark.operators.sunras import (
    RAS_MAGIC,
    parse_ras,
    ras_rle_encode,
)


def build_ras(
    px: np.ndarray,
    rtype: int = 1,
    palette: np.ndarray | None = None,
    rgb_order: bool = False,
) -> bytes:
    h, w, ch = px.shape
    body_px = px if (ch == 1 or rgb_order) else px[:, :, ::-1]  # default BGR
    stride = ((w * ch + 1) // 2) * 2
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * ch] = body_px.reshape(h, w * ch)
    raw = rows.tobytes()
    body = ras_rle_encode(raw) if rtype == 2 else raw
    maptype, mapbytes = 0, b""
    if palette is not None:
        maptype = 1
        mapbytes = (
            palette[:, 0].tobytes() + palette[:, 1].tobytes() + palette[:, 2].tobytes()
        )
    hdr = struct.pack(
        ">8i", RAS_MAGIC, w, h, ch * 8, len(body),
        3 if rgb_order else rtype, maptype, len(mapbytes),
    )
    return hdr + mapbytes + body


def _img(h, w, ch, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, ch), dtype=np.uint8)


def test_rle_codec_contract():
    # lone 0x80 escapes; runs become 0x80 n v with count n+1
    assert ras_rle_encode(b"\x80") == b"\x80\x00"
    assert ras_rle_encode(b"\x07\x07\x07\x07") == b"\x80\x03\x07"
    assert ras_rle_encode(b"ab") == b"ab"


@pytest.mark.parametrize("rtype", [0, 1, 2])
@pytest.mark.parametrize("w", [4, 5])  # even + odd (16-bit row pad)
def test_24bit_roundtrip(rtype, w):
    px = _img(3, w, 3, seed=rtype * 10 + w)
    got = parse_ras(build_ras(px, rtype=rtype))
    assert got[:3] == (w, 3, 3)
    assert np.array_equal(got[3], px)


def test_type3_rgb_order():
    px = _img(2, 3, 3, seed=5)
    got = parse_ras(build_ras(px, rgb_order=True))
    assert np.array_equal(got[3], px)


def test_gray_and_colormap():
    g = _img(3, 5, 1, seed=6)
    got = parse_ras(build_ras(g))
    assert got[:3] == (5, 3, 1) and np.array_equal(got[3], g)
    palette = _img(256, 3, 1, seed=7).reshape(256, 3)
    got = parse_ras(build_ras(g, palette=palette))
    assert got[:3] == (5, 3, 3)
    assert np.array_equal(got[3], palette[g[:, :, 0]])


def test_rle_run_crossing_rows():
    px = np.full((4, 5, 3), 0x42, dtype=np.uint8)
    data = build_ras(px, rtype=2)
    got = parse_ras(data)
    assert np.array_equal(got[3], px)
    # RLE of a flat image must actually compress
    assert len(data) < 32 + 4 * 16


def test_malformed_rejections():
    px = _img(3, 3, 3)
    good = build_ras(px)
    with pytest.raises(ValueError):
        parse_ras(b"\x00" + good[1:])  # bad magic
    with pytest.raises(ValueError):
        parse_ras(good[:32] + good[32:40])  # truncated image data
    bad = bytearray(good)
    bad[12:16] = struct.pack(">i", 32)  # depth 32 unsupported
    with pytest.raises(ValueError):
        parse_ras(bytes(bad))
    bad = bytearray(good)
    bad[20:24] = struct.pack(">i", 4)  # unknown type
    with pytest.raises(ValueError):
        parse_ras(bytes(bad))
    rle = bytearray(build_ras(px, rtype=2))
    with pytest.raises(ValueError):
        parse_ras(bytes(rle[:-1]))  # truncated RLE


def test_dispatcher_routes_ras():
    from pgvectorscale_spark.operators.multimodal import parse_image

    px = _img(4, 5, 3, seed=8)
    got = parse_image(build_ras(px, rtype=2))
    assert got[:3] == (5, 4, 3) and np.array_equal(got[3], px)


def test_synth_payload_matches_closed_form(spark, documents):
    import hashlib

    from pgvectorscale_spark.operators.multimodal import decode_image
    from pgvectorscale_spark.operators.sunras import attach_ras_payload

    docs = documents.limit(30)
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    got = {r["doc_id"]: r for r in decode_image(attach_ras_payload(docs)).collect()}
    for doc_id, text in texts.items():
        h1 = bytes.fromhex(hashlib.md5(text.encode()).hexdigest())
        h2 = bytes.fromhex(hashlib.md5((text + ":ras").encode()).hexdigest())
        r = got[doc_id]
        assert (r["width"], r["height"], r["channels"]) == (5, 2, 3)
        for name, cofs in (("mean_r", 2), ("mean_g", 1), ("mean_b", 0)):
            exp = round(
                sum(h[3 * j + cofs] for h in (h1, h2) for j in range(5)) / 10.0, 6
            )
            assert abs(r[name] - exp) < 1e-9, (doc_id, name)
