"""BMP image decode and IEEE-float32 WAV decode (multimodal.py): test-side
independent encoders, layout edge cases, and the JVM-synth closed forms."""
from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from pgvectorscale_spark.operators.multimodal import (
    BMP_H,
    BMP_W,
    F32_WAV_N_SAMPLES,
    WAV_RATE,
    _wav_header_hex,
    parse_bmp,
    parse_image,
    parse_wav,
)


def encode_bmp(px_rgb: np.ndarray, top_down: bool = False, bpp: int = 24) -> bytes:
    """Independent test-side BMP writer: RGB(A) (h, w, ch) -> file bytes."""
    h, w, ch = px_rgb.shape
    assert ch == bpp // 8
    stride = (w * ch + 3) & ~3
    rows = px_rgb if top_down else px_rgb[::-1]
    body = bytearray()
    for r in range(h):
        row = rows[r]
        if ch == 3:
            bgr = row[:, ::-1]
        else:
            bgr = row[:, [2, 1, 0, 3]]
        body += bgr.tobytes() + b"\x00" * (stride - w * ch)
    hdr = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII",
            40, w, -h if top_down else h, 1, bpp, 0, len(body), 2835, 2835, 0, 0,
        )
    )
    return hdr + bytes(body)


class TestParseBmp:
    @pytest.mark.parametrize("top_down", [False, True])
    @pytest.mark.parametrize("w,h", [(4, 4), (5, 3), (1, 7)])
    def test_roundtrip_24bpp(self, w, h, top_down):
        rng = np.random.default_rng(w * 100 + h + top_down)
        px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        w2, h2, ch, out = parse_bmp(encode_bmp(px, top_down=top_down))
        assert (w2, h2, ch) == (w, h, 3)
        np.testing.assert_array_equal(out, px)

    def test_roundtrip_32bpp_rgba(self):
        rng = np.random.default_rng(32)
        px = rng.integers(0, 256, (3, 5, 4)).astype(np.uint8)
        w, h, ch, out = parse_bmp(encode_bmp(px, bpp=32))
        assert (w, h, ch) == (5, 3, 4)
        np.testing.assert_array_equal(out, px)

    def test_dispatches_via_parse_image(self):
        px = np.full((2, 2, 3), 9, np.uint8)
        assert parse_image(encode_bmp(px))[:3] == (2, 2, 3)

    def test_gates_and_malformed(self):
        px = np.zeros((2, 2, 3), np.uint8)
        good = bytearray(encode_bmp(px))
        rle = bytearray(good)
        rle[30:34] = struct.pack("<I", 1)  # BI_RLE8
        with pytest.raises(ValueError, match="compression"):
            parse_bmp(bytes(rle))
        pal = bytearray(good)
        pal[28:30] = struct.pack("<H", 8)  # palette depth
        with pytest.raises(ValueError, match="bit depth"):
            parse_bmp(bytes(pal))
        with pytest.raises(ValueError, match="truncated"):
            parse_bmp(bytes(good[:-4]))
        with pytest.raises(ValueError, match="not a BMP"):
            parse_bmp(b"XX" + bytes(good[2:]))
        inhdr = bytearray(good)
        inhdr[10:14] = struct.pack("<I", 30)  # data_off inside the header
        with pytest.raises(ValueError, match="inside the header"):
            parse_bmp(bytes(inhdr))

    def test_synth_closed_form(self):
        """Mirror of oracles.bmp_decode_oracle: padded digest rows."""
        for text in (b"a", b"bmp doc"):
            d = hashlib.md5(text).digest()
            body = d + d[:8]
            stride = 12
            hdr = (
                b"BM" + struct.pack("<IHHI", 54 + 24, 0, 0, 54)
                + struct.pack("<IiiHHIIiiII", 40, BMP_W, BMP_H, 1, 24, 0, 24, 2835, 2835, 0, 0)
            )
            w, h, ch, px = parse_bmp(hdr + body)
            assert (w, h, ch) == (BMP_W, BMP_H, 3)
            for c in range(3):
                exp = np.mean([
                    body[r * stride + 3 * p + (2 - c)]
                    for r in range(BMP_H) for p in range(BMP_W)
                ])
                assert abs(px[:, :, c].mean() - exp) < 1e-9


class TestFloatWav:
    def test_roundtrip_and_mapping(self):
        vals = np.array([0.0, 1.0, -1.0, 0.5, -0.25, 2.0, -3.5], dtype="<f4")
        body = vals.tobytes()
        wav = bytes.fromhex(_wav_header_hex(len(body), 44100, bits=32, fmt_tag=3)) + body
        ch, rate, samples = parse_wav(wav)
        assert (ch, rate) == (1, 44100)
        # conventional round(x*32767) with clip; out-of-range clips
        exp = [0, 32767, -32767, 16384, -8192, 32767, -32768]
        assert samples[:, 0].tolist() == exp

    def test_nan_maps_to_zero(self):
        body = struct.pack("<fff", float("nan"), 0.5, float("inf"))
        wav = bytes.fromhex(_wav_header_hex(len(body), 8000, bits=32, fmt_tag=3)) + body
        _, _, samples = parse_wav(wav)
        assert samples[:, 0].tolist() == [0, 16384, 32767]

    def test_stereo(self):
        body = struct.pack("<ffff", 0.5, -0.5, 0.25, -0.25)
        hdr = _wav_header_hex(len(body), 8000, channels=2, bits=32, fmt_tag=3)
        ch, _, samples = parse_wav(bytes.fromhex(hdr) + body)
        assert ch == 2 and samples.shape == (2, 2)
        assert samples[0].tolist() == [16384, -16384]

    def test_synth_closed_form(self):
        """Mirror of oracles.f32_wav_decode_oracle — never a .5 boundary."""
        for text in (b"x", b"float wav"):
            nibs = [int(c, 16) for c in hashlib.md5(text).hexdigest()]
            body = b"".join(struct.pack("<f", (v - 7.5) / 8.0) for v in nibs)
            wav = bytes.fromhex(
                _wav_header_hex(len(body), WAV_RATE, bits=32, fmt_tag=3)
            ) + body
            ch, rate, samples = parse_wav(wav)
            assert (ch, rate, len(samples)) == (1, WAV_RATE, F32_WAV_N_SAMPLES)
            exp = [round((v - 7.5) / 8.0 * 32767) for v in nibs]
            assert samples[:, 0].tolist() == exp
            for v in nibs:  # the mapping never lands on a rounding tie
                assert abs(((v - 7.5) / 8.0 * 32767) % 1 - 0.5) > 1e-9


def test_attach_and_decode_spark(spark):
    """JVM-synth payloads decode to the oracle closed forms end-to-end."""
    from pgvectorscale_spark.operators.multimodal import (
        attach_bmp_payload,
        attach_float_wav_payload,
        decode_image,
        decode_wav_audio,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(4)], "doc_id long, text string"
    )
    bmp = {r["doc_id"]: r for r in decode_image(attach_bmp_payload(df)).collect()}
    f32 = {r["doc_id"]: r for r in decode_wav_audio(attach_float_wav_payload(df)).collect()}
    for i in range(4):
        d = hashlib.md5(f"doc {i}".encode()).digest()
        body = d + d[:8]
        r = bmp[i]
        assert (r["width"], r["height"], r["channels"]) == (BMP_W, BMP_H, 3)
        for c, name in ((0, "mean_r"), (1, "mean_g"), (2, "mean_b")):
            exp = np.mean([body[rr * 12 + 3 * p + (2 - c)]
                           for rr in range(BMP_H) for p in range(BMP_W)])
            assert abs(r[name] - round(float(exp), 6)) < 1e-9
        nibs = [int(c2, 16) for c2 in hashlib.md5(f"doc {i}".encode()).hexdigest()]
        amps = [round((v - 7.5) / 8.0 * 32767) for v in nibs]
        a = f32[i]
        assert (a["channels"], a["sample_rate"], a["n_samples"]) == (1, WAV_RATE, 32)
        assert a["last_amp"] == float(amps[-1])
        assert abs(a["mean_amp"] - np.mean(amps)) < 1e-6
