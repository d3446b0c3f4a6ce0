"""Sun AU (.au/.snd) decode (multimodal.parse_au): independent test-side
encoder, all five supported encodings, annotation-offset skip, unknown-size
sentinel, malformed gates, and the JVM-synth closed form."""
from __future__ import annotations

import struct

import numpy as np
import pytest

from pgvectorscale_spark.operators.multimodal import (
    ALAW_TABLE,
    ULAW_TABLE,
    WAV_RATE,
    WAV_TILE,
    parse_au,
)


def encode_au(body: bytes, encoding: int, rate: int, channels: int,
              annotation: bytes = b"", size: int | None = None) -> bytes:
    """Independent AU writer (struct-based, unlike the production hex
    builder)."""
    off = 24 + len(annotation)
    sz = len(body) if size is None else size
    return (
        b".snd" + struct.pack(">IIIII", off, sz, encoding, rate, channels)
        + annotation + body
    )


rng = np.random.default_rng(0xA0)


class TestParseAu:
    def test_ulaw_and_alaw_roundtrip(self):
        codes = bytes(range(256))
        for enc, table in ((1, ULAW_TABLE), (27, ALAW_TABLE)):
            ch, rate, s = parse_au(encode_au(codes, enc, 8000, 1))
            assert (ch, rate, s.shape) == (1, 8000, (256, 1))
            assert np.array_equal(s[:, 0], table[np.arange(256)])

    def test_pcm8_signed_and_pcm16_be(self):
        s8 = rng.integers(-128, 128, 40, dtype=np.int8)
        ch, rate, s = parse_au(encode_au(s8.tobytes(), 2, 11025, 1))
        assert np.array_equal(s[:, 0], s8.astype(np.int16) << 8)
        s16 = rng.integers(-32768, 32768, 30, dtype=np.int16)
        ch, rate, s = parse_au(encode_au(s16.astype(">i2").tobytes(), 3, 16000, 2))
        assert s.shape == (15, 2)
        assert np.array_equal(s.reshape(-1), s16)

    def test_float32_be_matches_wav_mapping(self):
        x = np.array([0.5, -0.25, 1.5, -2.0, np.nan], dtype=np.float32)
        ch, rate, s = parse_au(encode_au(x.astype(">f4").tobytes(), 6, 8000, 1))
        want = np.clip(np.rint(np.nan_to_num(x.astype(np.float64)) * 32767.0),
                       -32768, 32767).astype(np.int16)
        # nan_to_num inside parse_au maps nan->0 BEFORE scaling
        want[4] = 0
        assert np.array_equal(s[:, 0], want)

    def test_annotation_offset_skip_and_unknown_size(self):
        codes = bytes([0x80, 0x7F] * 8)
        au = encode_au(codes, 1, 8000, 1, annotation=b"notes\x00\x00\x00",
                       size=0xFFFFFFFF)
        ch, rate, s = parse_au(au)
        assert s.shape == (16, 1)
        assert np.array_equal(s[:, 0], ULAW_TABLE[np.frombuffer(codes, np.uint8)])

    def test_size_field_truncates_trailing_garbage(self):
        codes = bytes([0x55] * 10)
        au = encode_au(codes + b"GARBAGE!", 1, 8000, 1, size=10)
        ch, rate, s = parse_au(au)
        assert s.shape == (10, 1)

    def test_gates_and_malformed(self):
        good = encode_au(bytes(8), 1, 8000, 1)
        with pytest.raises(ValueError, match="not an AU"):
            parse_au(b"XXXX" + good[4:])
        with pytest.raises(ValueError, match="unsupported AU encoding"):
            parse_au(encode_au(bytes(8), 23, 8000, 1))  # G.721 ADPCM
        bad_off = bytearray(good)
        bad_off[4:8] = struct.pack(">I", 12)
        with pytest.raises(ValueError, match="inside the header"):
            parse_au(bytes(bad_off))
        past = bytearray(good)
        past[4:8] = struct.pack(">I", 9999)
        with pytest.raises(ValueError, match="offset past end"):
            parse_au(bytes(past))
        with pytest.raises(ValueError, match="truncated AU data"):
            parse_au(encode_au(bytes(4), 1, 8000, 1, size=400))
        with pytest.raises(ValueError, match="implausible"):
            parse_au(encode_au(bytes(8), 1, 0, 1))

    def test_synth_closed_form(self):
        """The JVM synth geometry: offset 32 (8-byte annotation), mu-law
        digest bytes tiled WAV_TILE x."""
        import hashlib

        from pgvectorscale_spark.operators.multimodal import AU_ANNOTATION

        digest = hashlib.md5(b"some document").digest()
        au = (
            b".snd"
            + struct.pack(">IIIII", 24 + len(AU_ANNOTATION), 16 * WAV_TILE, 1,
                          WAV_RATE, 1)
            + AU_ANNOTATION + digest * WAV_TILE
        )
        ch, rate, s = parse_au(au)
        assert (ch, rate, s.shape[0]) == (1, WAV_RATE, 16 * WAV_TILE)
        want = ULAW_TABLE[np.frombuffer(digest, np.uint8)]
        assert np.array_equal(s[:16, 0], want)
        assert float(s.mean()) == float(want.mean())  # tiling preserves mean


def test_attach_and_decode_spark(spark):
    from pyspark.sql import functions as F

    from pgvectorscale_spark.operators.multimodal import (
        attach_au_payload,
        decode_au_audio,
    )

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "zzz")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in decode_au_audio(attach_au_payload(df)).collect()}
    import hashlib

    for doc_id, text in ((1, "hello world"), (2, "zzz")):
        digest = hashlib.md5(text.encode()).digest()
        want = ULAW_TABLE[np.frombuffer(digest, np.uint8)]
        r = out[doc_id]
        assert r["channels"] == 1 and r["sample_rate"] == WAV_RATE
        assert r["n_samples"] == 16 * WAV_TILE
        assert abs(r["mean_amp"] - round(float(want.mean()), 6)) < 1e-9
        assert r["last_amp"] == float(want[-1])
