"""QOI decode (qoi.parse_qoi): independent test-side ENCODER implementing
the op-selection side of the spec from scratch (run -> index -> diff ->
luma -> rgb/rgba), random round-trips, per-op hand fixtures, the
first-chunk-run index edge, malformed gates, and the JVM-synth closed
form."""
from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from pgvectorscale_spark.operators.qoi import parse_qoi


def qoi_hash(r, g, b, a):
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(px: np.ndarray, channels: int) -> bytes:
    """Independent QOI encoder (greedy op selection, as in the reference
    encoder)."""
    h, w, _ = px.shape
    out = bytearray(b"qoif" + struct.pack(">II", w, h) + bytes([channels, 0]))
    index = np.zeros((64, 4), dtype=np.int64)
    prev = (0, 0, 0, 255)
    run = 0
    flat = px.reshape(-1, px.shape[2])
    for p in flat:
        cur = (int(p[0]), int(p[1]), int(p[2]), int(p[3]) if channels == 4 else 255)
        if cur == prev:
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        slot = qoi_hash(*cur)
        if tuple(index[slot]) == cur:
            out.append(slot)
        else:
            dr = (cur[0] - prev[0]) & 0xFF
            dg = (cur[1] - prev[1]) & 0xFF
            db = (cur[2] - prev[2]) & 0xFF
            s = lambda d: d - 256 if d > 127 else d  # noqa: E731
            dr, dg, db = s(dr), s(dg), s(db)
            if cur[3] == prev[3] and -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            elif (
                cur[3] == prev[3]
                and -32 <= dg <= 31
                and -8 <= dr - dg <= 7
                and -8 <= db - dg <= 7
            ):
                out.append(0x80 | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            elif cur[3] == prev[3]:
                out += bytes([0xFE, cur[0], cur[1], cur[2]])
            else:
                out += bytes([0xFF, *cur])
        index[slot] = cur
        prev = cur
    if run:
        out.append(0xC0 | (run - 1))
    return bytes(out) + b"\x00" * 7 + b"\x01"


rng = np.random.default_rng(0x901F)


class TestParseQoi:
    @pytest.mark.parametrize("channels", [3, 4])
    def test_random_roundtrip(self, channels):
        for _ in range(5):
            w, h = int(rng.integers(1, 24)), int(rng.integers(1, 24))
            # small value range => dense runs/index/diff hits
            px = rng.integers(0, 6, (h, w, channels), dtype=np.uint8) * 40
            got = parse_qoi(encode_qoi(px, channels))
            assert got[:3] == (w, h, channels)
            assert np.array_equal(got[3], px)

    def test_every_op_hand_fixture(self):
        # p0 RGB(10,20,30); p1 INDEX(slot of p0); p2 DIFF(+1,0,-2);
        # p3 LUMA(dg=5, dr-dg=-3, db-dg=7); p4..p6 RUN 3
        slot = qoi_hash(10, 20, 30, 255)
        body = bytes([0xFE, 10, 20, 30, slot,
                      0x40 | (3 << 4) | (2 << 2) | 0,
                      0x80 | (5 + 32), ((-3 + 8) << 4) | (7 + 8),
                      0xC0 | 2])
        data = b"qoif" + struct.pack(">II", 7, 1) + bytes([3, 0]) + body \
            + b"\x00" * 7 + b"\x01"
        w, h, ch, px = parse_qoi(data)
        want = [
            (10, 20, 30), (10, 20, 30), (11, 20, 28),
            (11 + 5 - 3, 20 + 5, 28 + 5 + 7),
        ]
        want += [want[-1]] * 3
        assert [tuple(p) for p in px[0]] == want

    def test_diff_wraparound_mod_256(self):
        # prev = (0,0,0): DIFF(-1,-2,+1) must wrap to (255, 254, 1)
        body = bytes([0x40 | (1 << 4) | (0 << 2) | 3])
        data = b"qoif" + struct.pack(">II", 1, 1) + bytes([3, 0]) + body \
            + b"\x00" * 7 + b"\x01"
        _, _, _, px = parse_qoi(data)
        assert tuple(px[0, 0]) == (255, 254, 1)

    def test_first_chunk_run_indexes_the_seed(self):
        # RUN of the seed (0,0,0,255) as the FIRST chunk, then INDEX of the
        # seed's slot: the reference decoder indexes after every chunk, so
        # the INDEX must return the seed, not the zero-initialized slot
        seed_slot = qoi_hash(0, 0, 0, 255)
        assert seed_slot != qoi_hash(0, 0, 0, 0)  # zero-init differs
        body = bytes([0xC0 | 0, seed_slot])  # run 1, then index
        data = b"qoif" + struct.pack(">II", 2, 1) + bytes([4, 0]) + body \
            + b"\x00" * 7 + b"\x01"
        _, _, _, px = parse_qoi(data)
        assert tuple(px[0, 1]) == (0, 0, 0, 255)

    def test_rgba_alpha_participates_in_hash(self):
        px = np.zeros((1, 3, 4), dtype=np.uint8)
        px[0, 0] = (7, 7, 7, 31)
        px[0, 1] = (9, 9, 9, 255)
        px[0, 2] = (7, 7, 7, 31)  # should come back via INDEX
        enc = encode_qoi(px, 4)
        got = parse_qoi(enc)
        assert np.array_equal(got[3], px)

    def test_gates_and_malformed(self):
        good = encode_qoi(np.zeros((2, 2, 3), dtype=np.uint8) + 50, 3)
        with pytest.raises(ValueError, match="not a QOI"):
            parse_qoi(b"XXXX" + good[4:])
        with pytest.raises(ValueError, match="channels"):
            parse_qoi(good[:12] + bytes([7]) + good[13:])
        with pytest.raises(ValueError, match="end marker"):
            parse_qoi(good[:-1] + b"\x02")
        with pytest.raises(ValueError, match="underrun|truncated"):
            # claim 99x99 pixels but keep the tiny stream
            parse_qoi(good[:4] + struct.pack(">II", 99, 99) + good[12:])
        run_over = (
            b"qoif" + struct.pack(">II", 2, 1) + bytes([3, 0])
            + bytes([0xC0 | 10]) + b"\x00" * 7 + b"\x01"
        )
        with pytest.raises(ValueError, match="overruns"):
            parse_qoi(run_over)
        trailing = good[:-8] + bytes([0x00]) + good[-8:]
        with pytest.raises(ValueError, match="trailing|underrun"):
            parse_qoi(trailing)

    def test_synth_closed_form(self):
        from pgvectorscale_spark.operators.multimodal import QOI_H, QOI_W

        digest = hashlib.md5(b"doc").digest()
        b = list(digest)
        hdr = bytes.fromhex("716f6966") + struct.pack(">II", QOI_W, QOI_H) \
            + bytes([3, 0])
        chunks = bytearray([0xFE, 10, 20, 30, qoi_hash(10, 20, 30, 255)])
        for j in range(16):
            chunks += bytes([0xFE, b[j], b[(j + 1) % 16], b[(j + 2) % 16]])
        chunks += bytes([0x7F, 0xA0, 0x88, 0xD3])
        data = hdr + bytes(chunks) + b"\x00" * 7 + b"\x01"
        w, h, ch, px = parse_qoi(data)
        assert (w, h, ch) == (QOI_W, QOI_H, 3)
        flat = px.reshape(-1, 3)
        mean_r = (2 * 10 + sum(b) + 22 * ((b[15] + 1) % 256)) / 40
        mean_g = (2 * 20 + sum(b) + 22 * ((b[0] + 1) % 256)) / 40
        mean_b = (2 * 30 + sum(b) + 22 * ((b[1] + 1) % 256)) / 40
        got = flat.mean(axis=0, dtype=np.float64)
        assert abs(got[0] - mean_r) < 1e-9
        assert abs(got[1] - mean_g) < 1e-9
        assert abs(got[2] - mean_b) < 1e-9


def test_attach_and_decode_spark(spark):
    from pgvectorscale_spark.operators.multimodal import (
        QOI_H,
        QOI_W,
        attach_qoi_payload,
        decode_image,
    )

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "zzz")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in decode_image(attach_qoi_payload(df)).collect()}
    for doc_id, text in ((1, "hello world"), (2, "zzz")):
        b = list(hashlib.md5(text.encode()).digest())
        r = out[doc_id]
        assert (r["width"], r["height"], r["channels"]) == (QOI_W, QOI_H, 3)
        assert abs(r["mean_r"] - round((20 + sum(b) + 22 * ((b[15] + 1) % 256)) / 40, 6)) < 1e-9
        assert abs(r["mean_g"] - round((40 + sum(b) + 22 * ((b[0] + 1) % 256)) / 40, 6)) < 1e-9
        assert abs(r["mean_b"] - round((60 + sum(b) + 22 * ((b[1] + 1) % 256)) / 40, 6)) < 1e-9
