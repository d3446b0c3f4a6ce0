"""Tests for multimodal.parse_pnm — binary PGM (P5) and PBM (P4)."""

from __future__ import annotations

import numpy as np
import pytest

from pgvectorscale_spark.operators.multimodal import parse_image, parse_pnm


def _pgm(px: np.ndarray, header_extra: bytes = b"") -> bytes:
    h, w = px.shape
    return f"P5\n{header_extra.decode() if header_extra else ''}{w} {h}\n255\n".encode() + px.tobytes()


def _pbm(bits: np.ndarray) -> bytes:
    h, w = bits.shape
    stride = (w + 7) // 8
    rows = np.zeros((h, stride), dtype=np.uint8)
    packed = np.packbits(bits.astype(np.uint8), axis=1)
    rows[:, : packed.shape[1]] = packed
    return f"P4\n{w} {h}\n".encode() + rows.tobytes()


def test_pgm_roundtrip_and_comment():
    px = np.random.default_rng(1).integers(0, 256, (3, 5), dtype=np.uint8)
    w, h, c, got = parse_pnm(_pgm(px))
    assert (w, h, c) == (5, 3, 1) and np.array_equal(got[:, :, 0], px)
    data = b"P5\n# a comment\n5 3\n255\n" + px.tobytes()
    assert np.array_equal(parse_pnm(data)[3][:, :, 0], px)


def test_pbm_polarity_bitorder_and_padding():
    bits = np.zeros((2, 9), dtype=np.uint8)  # odd width: row pads to 2 bytes
    bits[0, 0] = 1  # MSB of the first byte
    bits[1, 8] = 1  # MSB of the second row's second byte
    w, h, c, got = parse_pnm(_pbm(bits))
    assert (w, h, c) == (9, 2, 1)
    assert got[0, 0, 0] == 0 and got[1, 8, 0] == 0  # 1 = black
    assert got[0, 1, 0] == 255 and int((got == 0).sum()) == 2


def test_malformed_rejections():
    px = np.zeros((2, 2), dtype=np.uint8)
    with pytest.raises(ValueError):
        parse_pnm(b"P7" + _pgm(px)[2:])
    with pytest.raises(ValueError):
        parse_pnm(_pgm(px)[:-1])  # short payload
    with pytest.raises(ValueError):
        parse_pnm(b"P5\n2 2\n65535\n" + b"\0" * 8)  # 16-bit unsupported


def test_dispatcher_routes_pnm():
    px = np.random.default_rng(2).integers(0, 256, (2, 4), dtype=np.uint8)
    assert np.array_equal(parse_image(_pgm(px))[3][:, :, 0], px)
    bits = np.eye(4, dtype=np.uint8)
    assert parse_image(_pbm(bits))[2] == 1


def test_synth_payloads_match_closed_form(spark, documents):
    import hashlib

    from pgvectorscale_spark.operators.multimodal import (
        attach_pbm_payload,
        attach_pgm_payload,
        decode_image,
    )

    docs = documents.limit(30)
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    pgm = {r["doc_id"]: r for r in decode_image(attach_pgm_payload(docs)).collect()}
    pbm = {r["doc_id"]: r for r in decode_image(attach_pbm_payload(docs)).collect()}
    for doc_id, text in texts.items():
        b = bytes.fromhex(hashlib.md5(text.encode()).hexdigest())
        r = pgm[doc_id]
        assert (r["width"], r["height"], r["channels"]) == (8, 2, 1)
        assert abs(r["mean_r"] - round(sum(b) / 16.0, 6)) < 1e-9
        ones = bin(b[0]).count("1") + bin(b[1]).count("1")
        r = pbm[doc_id]
        assert (r["width"], r["height"], r["channels"]) == (8, 2, 1)
        assert abs(r["mean_r"] - round(255.0 * (16 - ones) / 16.0, 6)) < 1e-9
