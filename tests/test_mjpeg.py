"""MJPEG video sample decode (operators/mjpeg.py).

Round-trips against the INDEPENDENT test-side JPEG encoder
(tests/test_jpeg.py:encode_jpeg) so a correlated encoder/decoder bug in
the product can't self-confirm, plus container-walk edge cases and the
Spark decode shape. Closes the `decode_av_samples` gate for MJPEG video:
real frame pixels, zero media dependencies.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pgvectorscale_spark.operators.jpeg import parse_jpeg
from pgvectorscale_spark.operators.mjpeg import (
    attach_mjpeg_payload,
    build_avi_mjpeg,
    build_flat_jpeg,
    decode_mjpeg_frames,
    jpeg_extent,
    parse_avi_mjpeg,
    parse_mjpeg,
    split_jfif_stream,
)
from tests.test_jpeg import encode_jpeg


def _gradient_frames(n, h, w, ch, seed=7):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, ch), dtype=np.uint8) for _ in range(n)]


class TestAviRoundTrip:
    def test_avi_mjpeg_frames_decode_to_source_pixels(self):
        """Every frame in a built AVI decodes to exactly what parse_jpeg
        gives for that frame's standalone JPEG (the per-frame oracle from
        the independent test-side encoder)."""
        px_frames = _gradient_frames(4, 16, 24, 3)
        jpegs = [encode_jpeg(p) for p in px_frames]
        avi = build_avi_mjpeg(jpegs, 24, 16, fps=30)
        w, h, ch, decoded = parse_mjpeg(avi)
        assert (w, h, ch) == (24, 16, 3)
        assert decoded.shape == (4, 16, 24, 3)
        for i, j in enumerate(jpegs):
            _w, _h, _c, single = parse_jpeg(j)
            assert np.array_equal(decoded[i], single), f"frame {i} diverges"

    def test_avi_walk_recovers_declared_geometry(self):
        jpegs = [encode_jpeg(p) for p in _gradient_frames(3, 8, 8, 1)]
        aw, ah, an, frames = parse_avi_mjpeg(build_avi_mjpeg(jpegs, 8, 8))
        assert (aw, ah, an) == (8, 8, 3)
        assert frames == jpegs  # chunk payloads byte-identical

    def test_avi_odd_frame_length_pad_byte(self):
        """RIFF chunks pad odd bodies with one byte; the walk must skip it
        and the padded frame must still decode."""
        j = encode_jpeg(_gradient_frames(1, 8, 8, 1)[0])
        if len(j) % 2 == 0:
            j = j[:-2] + b"\xff" + j[-2:]  # legal fill byte => odd length
        assert len(j) % 2 == 1
        avi = build_avi_mjpeg([j, j], 8, 8)
        _, _, _, decoded = parse_mjpeg(avi)
        assert decoded.shape[0] == 2

    def test_mismatched_avih_dims_fail_loudly(self):
        jpegs = [encode_jpeg(p) for p in _gradient_frames(2, 8, 8, 1)]
        avi = build_avi_mjpeg(jpegs, 32, 32)  # header lies about geometry
        with pytest.raises(ValueError, match="avih"):
            parse_mjpeg(avi)

    def test_truncated_and_non_avi_fail_loudly(self):
        jpegs = [encode_jpeg(p) for p in _gradient_frames(2, 8, 8, 1)]
        avi = build_avi_mjpeg(jpegs, 8, 8)
        with pytest.raises(ValueError):
            parse_avi_mjpeg(avi[: len(avi) // 2])
        with pytest.raises(ValueError):
            parse_mjpeg(b"\x00\x01\x02\x03garbage")


class TestJfifStream:
    def test_concatenated_jfif_splits_and_decodes(self):
        px_frames = _gradient_frames(5, 8, 16, 3)
        jpegs = [encode_jpeg(p) for p in px_frames]
        stream = b"".join(jpegs)
        assert split_jfif_stream(stream) == jpegs
        w, h, ch, decoded = parse_mjpeg(stream)
        assert decoded.shape == (5, 8, 16, 3)
        for i, j in enumerate(jpegs):
            assert np.array_equal(decoded[i], parse_jpeg(j)[3])

    def test_extent_ignores_eoi_bytes_inside_app_segment(self):
        """A literal FF D9 inside an APP0 payload must not truncate the
        frame: the walk skips headered segments by length."""
        j = encode_jpeg(_gradient_frames(1, 8, 8, 1)[0])
        app = b"\xff\xe0" + (6).to_bytes(2, "big") + b"\xff\xd9\x00\x00"
        patched = j[:2] + app + j[2:]
        assert jpeg_extent(patched) == len(patched)
        two = patched + patched
        assert len(split_jfif_stream(two)) == 2

    def test_mixed_geometry_stream_fails_loudly(self):
        a = encode_jpeg(_gradient_frames(1, 8, 8, 1)[0])
        b = encode_jpeg(_gradient_frames(1, 16, 16, 1)[0])
        with pytest.raises(ValueError, match="geometr"):
            parse_mjpeg(a + b)

    def test_restart_marker_frames_split_correctly(self):
        """Entropy data containing RST markers (FF D0-D7) must not be
        mistaken for frame boundaries by the extent scan."""
        px = _gradient_frames(1, 16, 16, 1, seed=9)[0]
        j = encode_jpeg(px, restart_interval=1)
        assert b"\xff\xd0" in j or b"\xff\xd1" in j  # RSTs actually present
        stream = j + j
        assert split_jfif_stream(stream) == [j, j]
        _, _, _, decoded = parse_mjpeg(stream)
        assert np.array_equal(decoded[0], parse_jpeg(j)[3])


class TestFlatSynthFrames:
    def test_flat_frame_decodes_lossless(self):
        for w, h in ((8, 8), (16, 16)):
            for v in range(8, 256, 16):
                _w, _h, ch, px = parse_jpeg(build_flat_jpeg(w, h, v))
                assert (_w, _h, ch) == (w, h, 1)
                assert px.min() == px.max() == v

    def test_pad_to_keeps_decode_and_equalizes_length(self):
        raw = [build_flat_jpeg(16, 16, 16 * i + 8) for i in range(16)]
        pad = max(map(len, raw))
        pad += pad % 2
        padded = [build_flat_jpeg(16, 16, 16 * i + 8, pad_to=pad) for i in range(16)]
        assert {len(p) for p in padded} == {pad}
        for i, j in enumerate(padded):
            assert parse_jpeg(j)[3].min() == 16 * i + 8

    def test_rejects_non_roundtrippable_value(self):
        with pytest.raises(ValueError, match="16"):
            build_flat_jpeg(8, 8, 100)  # 100 % 16 != 8: DC would round


class TestSparkDecode:
    def test_decode_mjpeg_frames_spark_shape(self, spark):
        """The Arrow-batched explode: one row per frame, geometry and
        means matching the local decode of the same synthesized payloads."""
        docs = spark.createDataFrame(
            [(i, f"mjpeg doc {i}") for i in range(12)], "doc_id long, text string"
        )
        pay = attach_mjpeg_payload(docs)
        frames = decode_mjpeg_frames(pay).collect()
        local = {r["doc_id"]: parse_mjpeg(bytes(r["payload"])) for r in pay.collect()}
        by_doc = {}
        for r in frames:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert set(by_doc) == set(local)
        for doc_id, rows in by_doc.items():
            w, h, ch, px = local[doc_id]
            rows.sort(key=lambda r: r["frame_no"])
            assert [r["frame_no"] for r in rows] == list(range(px.shape[0]))
            for r in rows:
                assert (r["width"], r["height"], r["channels"]) == (w, h, ch)
                assert r["mean_px"] == pytest.approx(float(px[r["frame_no"]].mean()))

    def test_synth_is_single_projection_no_python(self, spark):
        """The payload synthesis stays JVM-side: the plan is a pure
        Project over the scan — no Python/Arrow eval node before decode."""
        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        plan = attach_mjpeg_payload(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan, plan
