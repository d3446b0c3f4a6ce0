"""Tests for operators/pcx.py — ZSoft PCX RLE decode (24-bit planar,
8-bit gray, VGA-palette indexed). The file builder here is independent of
the module's synth path (greedy multi-byte runs, per-scanline encoding,
palette trailers) so round-trips cross-check the decoder."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pgvectorscale_spark.operators.pcx import parse_pcx, pcx_rle_encode


def build_pcx(
    px: np.ndarray,
    palette: np.ndarray | None = None,
    bytes_per_line: int | None = None,
) -> bytes:
    """Independent PCX writer: encodes each scanline's planes as one RLE
    unit (the spec's recommended shape — the module decodes continuously,
    which must accept both)."""
    h, w, ch = px.shape
    bpl = bytes_per_line or (w + (w % 2))  # spec: even bytes_per_line
    hdr = bytearray(128)
    hdr[0:12] = struct.pack("<BBBBHHHH", 0x0A, 5, 1, 8, 0, 0, w - 1, h - 1)
    hdr[65] = ch
    hdr[66:68] = struct.pack("<H", bpl)
    body = bytearray()
    for r in range(h):
        line = bytearray()
        for p in range(ch):
            row = px[r, :, p].tobytes().ljust(bpl, b"\0")
            line += row
        body += pcx_rle_encode(bytes(line))
    out = bytes(hdr) + bytes(body)
    if palette is not None:
        out += b"\x0c" + palette.astype(np.uint8).tobytes()
    return out


def _img(h, w, ch, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, ch), dtype=np.uint8)


def test_rle_encoder_contract():
    # literals >= 0xC0 MUST be emitted as 1-runs
    assert pcx_rle_encode(b"\xc5") == b"\xc1\xc5"
    assert pcx_rle_encode(b"ab") == b"ab"
    assert pcx_rle_encode(b"a" * 65) == b"\xff" + b"a" + b"\xc2" + b"a"  # 63 + 2


@pytest.mark.parametrize("ch", [1, 3])
def test_roundtrip(ch):
    px = _img(5, 6, ch, seed=ch)
    w, h, c, got = parse_pcx(build_pcx(px))
    assert (w, h, c) == (6, 5, ch)
    assert np.array_equal(got, px)


def test_odd_width_padding():
    """bytes_per_line > width: the pad byte decodes but is cropped."""
    px = _img(3, 5, 3, seed=4)
    w, h, c, got = parse_pcx(build_pcx(px))  # bpl = 6 for w = 5
    assert (w, h, c) == (5, 3, 3)
    assert np.array_equal(got, px)


def test_vga_palette_mapping():
    idx = _img(4, 4, 1, seed=7)
    palette = _img(256, 3, 1, seed=8)[:, :, 0].reshape(256, 3)
    w, h, c, got = parse_pcx(build_pcx(idx, palette=palette))
    assert (w, h, c) == (4, 4, 3)
    assert np.array_equal(got, palette[idx[:, :, 0]])


def test_runs_crossing_scanlines_decode():
    """A flat image encoded as ONE continuous run stream (not per-line)
    must decode too — real encoders emit runs across plane boundaries."""
    w, h = 6, 4
    hdr = bytearray(128)
    hdr[0:12] = struct.pack("<BBBBHHHH", 0x0A, 5, 1, 8, 0, 0, w - 1, h - 1)
    hdr[65] = 1
    hdr[66:68] = struct.pack("<H", w)
    body = pcx_rle_encode(b"\x55" * (w * h))  # runs of 63 cross rows
    got = parse_pcx(bytes(hdr) + bytes(body))
    assert got[:3] == (w, h, 1) and (got[3] == 0x55).all()


def test_malformed_rejections():
    px = _img(3, 3, 3)
    good = build_pcx(px)
    with pytest.raises(ValueError):
        parse_pcx(b"\x0b" + good[1:])  # manufacturer byte
    with pytest.raises(ValueError):
        parse_pcx(good[:1] + b"\x09" + good[2:])  # bad version
    with pytest.raises(ValueError):
        parse_pcx(good[:2] + b"\x00" + good[3:])  # uncompressed unsupported
    with pytest.raises(ValueError):
        parse_pcx(good[:3] + b"\x04" + good[4:])  # 4bpp unsupported
    with pytest.raises(ValueError):
        parse_pcx(good[: len(good) - 4])  # truncated RLE
    bad = bytearray(good)
    bad[65] = 2  # 2 planes unsupported
    with pytest.raises(ValueError):
        parse_pcx(bytes(bad))


def test_dispatcher_routes_pcx():
    from pgvectorscale_spark.operators.multimodal import parse_image

    px = _img(4, 4, 3, seed=3)
    w, h, c, got = parse_image(build_pcx(px))
    assert (w, h, c) == (4, 4, 3) and np.array_equal(got, px)


def test_synth_payload_matches_closed_form(spark, documents):
    import hashlib

    from pgvectorscale_spark.operators.multimodal import decode_image
    from pgvectorscale_spark.operators.pcx import attach_pcx_payload

    docs = documents.limit(30)
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    got = {r["doc_id"]: r for r in decode_image(attach_pcx_payload(docs)).collect()}
    for doc_id, text in texts.items():
        b = bytes.fromhex(hashlib.md5(text.encode()).hexdigest())
        r = got[doc_id]
        assert (r["width"], r["height"], r["channels"]) == (4, 2, 3)
        for c, name in enumerate(("mean_r", "mean_g", "mean_b")):
            exp = round((4 * b[c] + sum(b[3 + 4 * c + k] % 192 for k in range(4))) / 8.0, 6)
            assert abs(r[name] - exp) < 1e-9, (doc_id, name)
