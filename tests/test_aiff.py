"""AIFF decode (multimodal.parse_aiff): independent test-side encoder,
80-bit extended-float rates, sowt/twos byte orders, SSND offsets, and the
JVM-synth closed form."""
from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from pgvectorscale_spark.operators.multimodal import (
    WAV_RATE,
    WAV_TILE,
    parse_aiff,
)


def f80(rate: float) -> bytes:
    """Independent 80-bit extended-float encoder (frexp-based, unlike the
    production bit-length form)."""
    import math

    m, e = math.frexp(rate)  # rate = m * 2^e with 0.5 <= m < 1
    return struct.pack(">HQ", 16382 + e, int(m * (1 << 64)))


def encode_aiff(samples: np.ndarray, rate: int, form=b"AIFF", ctype=None,
                ssnd_offset=0, extra_chunk=False) -> bytes:
    n, ch = samples.shape
    comm_body = struct.pack(">HIH", ch, n, 16) + f80(rate)
    if ctype is not None:
        comm_body += ctype + b"\x00"  # empty pascal-string name
    comm = b"COMM" + struct.pack(">I", len(comm_body)) + comm_body
    comm += b"\x00" * (len(comm_body) & 1)  # IFF chunks pad to even
    dtype = "<i2" if ctype == b"sowt" else ">i2"
    body = b"\x00" * ssnd_offset + samples.astype(dtype).tobytes()
    ssnd = b"SSND" + struct.pack(">III", len(body) + 8, ssnd_offset, 0) + body
    chunks = comm + ssnd
    if extra_chunk:
        chunks = b"ANNO" + struct.pack(">I", 5) + b"hello" + b"\x00" + chunks
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + form + chunks


rng = np.random.default_rng(0xA1FF)


class TestParseAiff:
    @pytest.mark.parametrize("rate", [8000, 22050, 44100, 48000, 96000])
    def test_roundtrip_and_f80_rates(self, rate):
        s = rng.integers(-32768, 32768, (40, 1)).astype(np.int16)
        ch, r, out = parse_aiff(encode_aiff(s, rate))
        assert (ch, r) == (1, rate)
        np.testing.assert_array_equal(out, s)

    def test_stereo_and_ssnd_offset_and_extra_chunks(self):
        s = rng.integers(-32768, 32768, (10, 2)).astype(np.int16)
        stream = encode_aiff(s, 44100, ssnd_offset=6, extra_chunk=True)
        ch, r, out = parse_aiff(stream)
        assert ch == 2
        np.testing.assert_array_equal(out, s)

    def test_aifc_sowt_little_endian(self):
        s = rng.integers(-32768, 32768, (7, 2)).astype(np.int16)
        stream = encode_aiff(s, 8000, form=b"AIFC", ctype=b"sowt")
        _, _, out = parse_aiff(stream)
        np.testing.assert_array_equal(out, s)

    def test_aifc_twos_big_endian(self):
        s = rng.integers(-32768, 32768, (7, 1)).astype(np.int16)
        stream = encode_aiff(s, 8000, form=b"AIFC", ctype=b"twos")
        np.testing.assert_array_equal(parse_aiff(stream)[2], s)

    def test_gates_and_malformed(self):
        s = np.zeros((4, 1), np.int16)
        with pytest.raises(ValueError, match="compression"):
            parse_aiff(encode_aiff(s, 8000, form=b"AIFC", ctype=b"ima4"))
        with pytest.raises(ValueError, match="not an AIFF"):
            parse_aiff(b"RIFF" + encode_aiff(s, 8000)[4:])
        with pytest.raises(ValueError, match="COMM or SSND"):
            parse_aiff(b"FORM" + struct.pack(">I", 4) + b"AIFF")
        bad = bytearray(encode_aiff(s, 8000))
        # f80 sign+exponent: 12 (FORM hdr) + 8 (COMM id+size) + 8 (ch/frames/bits)
        bad[28:30] = struct.pack(">H", 0xFFFF)  # exponent all-ones
        with pytest.raises(ValueError, match="sample rate"):
            parse_aiff(bytes(bad))
        huge = bytearray(encode_aiff(s, 8000))
        # exp just under all-ones would make 2.0**(exp-16446) overflow
        # float; must raise the documented ValueError, not OverflowError
        huge[28:30] = struct.pack(">H", 0x7FFE)
        with pytest.raises(ValueError, match="exponent"):
            parse_aiff(bytes(huge))

    def test_synth_closed_form(self):
        """Mirror of oracles.aiff_decode_oracle: BE samples from digest."""
        from pgvectorscale_spark.operators.multimodal import _f80_hex

        for text in (b"a", b"aiff doc"):
            d = hashlib.md5(text).digest()
            body = d * WAV_TILE
            n = len(body) // 2
            comm = b"COMM" + struct.pack(">IHIH", 18, 1, n, 16) + bytes.fromhex(
                _f80_hex(WAV_RATE)
            )
            ssnd = b"SSND" + struct.pack(">III", len(body) + 8, 0, 0)
            stream = (
                b"FORM"
                + struct.pack(">I", 4 + len(comm) + len(ssnd) + len(body))
                + b"AIFF" + comm + ssnd + body
            )
            ch, r, out = parse_aiff(stream)
            exp = np.frombuffer(body, dtype=">i2")
            assert (ch, r) == (1, WAV_RATE)
            np.testing.assert_array_equal(out[:, 0], exp)


def test_attach_and_decode_spark(spark):
    from pgvectorscale_spark.operators.multimodal import (
        attach_aiff_payload,
        decode_aiff_audio,
    )

    df = spark.createDataFrame(
        [(i, f"aiff {i}") for i in range(4)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in decode_aiff_audio(attach_aiff_payload(df)).collect()}
    for i in range(4):
        d = hashlib.md5(f"aiff {i}".encode()).digest()
        samples = np.frombuffer(d * WAV_TILE, dtype=">i2").astype(np.float64)
        r = rows[i]
        assert (r["channels"], r["sample_rate"], r["n_samples"]) == (1, WAV_RATE, 16)
        assert abs(r["mean_amp"] - round(float(samples.mean()), 6)) < 1e-9
        assert r["last_amp"] == float(samples[-1])
