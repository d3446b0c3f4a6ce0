"""Tests for operators/ico.py — Windows ICO decode (32bpp/24bpp DIB
entries with doubled-height headers and AND masks, PNG-embedded entries,
largest-entry selection). The builder here is independent of the module's
synth (multi-entry directories, 24bpp + masks, PNG payloads)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from pgvectorscale_spark.operators.ico import parse_ico


def _dib_payload(px: np.ndarray, mask: np.ndarray | None = None) -> bytes:
    """px (h, w, 3|4) RGB(A) -> headerless DIB: doubled-height header,
    bottom-up BGR(A) rows 4-byte aligned, then the AND mask (default all
    visible)."""
    h, w, ch = px.shape
    bgr = px[:, :, [2, 1, 0] + ([3] if ch == 4 else [])]
    stride = ((w * ch + 3) // 4) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * ch] = bgr.reshape(h, w * ch)
    body = rows[::-1].tobytes()
    if mask is None:
        mask = np.zeros((h, w), dtype=bool)
    mstride = ((w + 31) // 32) * 4
    mrows = np.zeros((h, mstride), dtype=np.uint8)
    packed = np.packbits(mask.astype(np.uint8), axis=1)
    mrows[:, : packed.shape[1]] = packed
    mbody = mrows[::-1].tobytes()
    hdr = struct.pack("<IiiHHIIiiII", 40, w, 2 * h, 1, ch * 8, 0, 0, 0, 0, 0, 0)
    return hdr + body + mbody


def build_ico(images: list[tuple[np.ndarray, bytes]]) -> bytes:
    """images: [(px, payload_bytes)] — px only supplies the entry's w/h."""
    out = struct.pack("<HHH", 0, 1, len(images))
    off = 6 + 16 * len(images)
    body = b""
    for px, payload in images:
        h, w = px.shape[:2]
        out += struct.pack(
            "<BBBBHHII", w % 256, h % 256, 0, 0, 1, px.shape[2] * 8, len(payload), off
        )
        body += payload
        off += len(payload)
    return out + body


def _img(h, w, ch, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, ch), dtype=np.uint8)


def test_32bpp_roundtrip():
    px = _img(6, 5, 4, seed=1)
    data = build_ico([(px, _dib_payload(px))])
    w, h, c, got = parse_ico(data)
    assert (w, h, c) == (5, 6, 4)
    assert np.array_equal(got, px)


def test_24bpp_mask_becomes_alpha():
    px = _img(4, 4, 3, seed=2)
    mask = np.zeros((4, 4), dtype=bool)
    mask[0, 0] = mask[3, 3] = True
    data = build_ico([(px, _dib_payload(px, mask))])
    w, h, c, got = parse_ico(data)
    assert (w, h, c) == (4, 4, 4)
    assert np.array_equal(got[:, :, :3], px)
    assert got[0, 0, 3] == 0 and got[3, 3, 3] == 0 and got[1, 1, 3] == 255


def test_largest_entry_wins():
    small = _img(2, 2, 4, seed=3)
    big = _img(8, 8, 4, seed=4)
    data = build_ico([(small, _dib_payload(small)), (big, _dib_payload(big))])
    w, h, c, got = parse_ico(data)
    assert (w, h) == (8, 8) and np.array_equal(got, big)


def test_png_embedded_entry():
    """Modern ICOs embed whole PNGs; the entry must route to parse_png.
    Stored-deflate PNG built inline (the multimodal synth recipe)."""
    px = _img(3, 3, 3, seed=5)
    raw = b"".join(b"\x00" + px[r].tobytes() for r in range(3))
    comp = zlib.compress(raw, 0)

    def chunk(tag, body):
        c = struct.pack(">I", len(body)) + tag + body
        return c + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", comp)
        + chunk(b"IEND", b"")
    )
    data = build_ico([(px, png)])
    w, h, c, got = parse_ico(data)
    assert (w, h) == (3, 3) and np.array_equal(got[:, :, :3], px)


def test_malformed_rejections():
    px = _img(3, 3, 4)
    good = build_ico([(px, _dib_payload(px))])
    with pytest.raises(ValueError):
        parse_ico(b"\x01" + good[1:])  # reserved != 0
    with pytest.raises(ValueError):
        parse_ico(good[:2] + b"\x02\x00" + good[4:])  # type 2 (cursor)
    with pytest.raises(ValueError):
        parse_ico(good[: len(good) - 8])  # truncated payload
    # 8bpp palette DIB: unsupported
    bad_dib = struct.pack("<IiiHHIIiiII", 40, 3, 6, 1, 8, 0, 0, 0, 0, 0, 0) + b"\0" * 64
    bad = build_ico([(px, bad_dib)])
    with pytest.raises(ValueError):
        parse_ico(bad)


def test_dispatcher_routes_ico():
    from pgvectorscale_spark.operators.multimodal import parse_image

    px = _img(4, 4, 4, seed=6)
    w, h, c, got = parse_image(build_ico([(px, _dib_payload(px))]))
    assert (w, h, c) == (4, 4, 4) and np.array_equal(got, px)


def test_synth_payload_matches_closed_form(spark, documents):
    import hashlib

    from pgvectorscale_spark.operators.ico import attach_ico_payload
    from pgvectorscale_spark.operators.multimodal import decode_image

    docs = documents.limit(30)
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    got = {r["doc_id"]: r for r in decode_image(attach_ico_payload(docs)).collect()}
    for doc_id, text in texts.items():
        b = bytes.fromhex(hashlib.md5(text.encode()).hexdigest()) + bytes.fromhex(
            hashlib.md5((text + ":ico").encode()).hexdigest()
        )
        r = got[doc_id]
        assert (r["width"], r["height"], r["channels"]) == (4, 2, 4)
        for name, cofs in (("mean_r", 2), ("mean_g", 1), ("mean_b", 0)):
            exp = round(sum(b[4 * j + cofs] for j in range(8)) / 8.0, 6)
            assert abs(r[name] - exp) < 1e-9, (doc_id, name)
