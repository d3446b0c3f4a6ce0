"""Pure-numpy PPM/WAV decode (round-5 item #2): real container parsers for
the uncompressed formats, no media libraries. The env gate now covers only
compressed codecs (JPEG/MP3-class)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pgvectorscale_spark.operators.multimodal import parse_ppm, parse_wav


def _ppm(w, h, maxval, body, header_extra=b""):
    return f"P6{header_extra.decode()}\n{w} {h}\n{maxval}\n".encode() + body


def _wav(samples: np.ndarray, rate=8000, channels=1, pre_chunks=b""):
    body = samples.astype("<i2").tobytes()
    fmt = struct.pack("<IHHIIHH", 16, 1, channels, rate, rate * 2 * channels, 2 * channels, 16)
    chunks = b"fmt " + fmt + pre_chunks + b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


class TestParsePpm:
    def test_roundtrip(self):
        rng = np.random.default_rng(1)
        px = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
        w, h, mx, out = parse_ppm(_ppm(6, 4, 255, px.tobytes()))
        assert (w, h, mx) == (6, 4, 255)
        np.testing.assert_array_equal(out, px)

    def test_header_comments_and_whitespace(self):
        px = np.arange(2 * 1 * 3, dtype=np.uint8)
        data = b"P6\n# a comment\n 2\t1 # trailing\n255\n" + px.tobytes()
        w, h, mx, out = parse_ppm(data)
        assert (w, h, mx) == (2, 1, 255)
        np.testing.assert_array_equal(out.reshape(-1), px)

    def test_16bit_maxval(self):
        px = np.array([[[1, 2, 3], [60000, 5, 6]]], dtype=">u2")
        w, h, mx, out = parse_ppm(_ppm(2, 1, 65535, px.tobytes()))
        assert mx == 65535
        assert int(out[0, 1, 0]) == 60000

    def test_rejects_bad_magic(self):
        with pytest.raises(ValueError, match="not a binary PPM"):
            parse_ppm(b"P5\n1 1\n255\n\x00")

    def test_rejects_truncated_payload(self):
        with pytest.raises(ValueError, match="header implies"):
            parse_ppm(_ppm(4, 4, 255, b"\x00" * 10))

    def test_rejects_truncated_header(self):
        with pytest.raises(ValueError, match="truncated PPM header"):
            parse_ppm(b"P6\n5 ")

    def test_rejects_maxval_out_of_range(self):
        with pytest.raises(ValueError, match="out of range"):
            parse_ppm(_ppm(1, 1, 70000, b"\x00" * 6))


class TestParseWav:
    def test_roundtrip_mono(self):
        s = np.array([0, 100, -100, 32767, -32768], dtype=np.int16)
        ch, rate, out = parse_wav(_wav(s))
        assert (ch, rate) == (1, 8000)
        np.testing.assert_array_equal(out[:, 0], s)

    def test_stereo_deinterleave(self):
        inter = np.array([1, -1, 2, -2, 3, -3], dtype=np.int16)  # L R L R L R
        ch, rate, out = parse_wav(_wav(inter, channels=2, rate=44100))
        assert (ch, rate) == (2, 44100)
        np.testing.assert_array_equal(out[:, 0], [1, 2, 3])
        np.testing.assert_array_equal(out[:, 1], [-1, -2, -3])

    def test_skips_extra_chunks_before_data(self):
        # a LIST/INFO chunk (odd size -> word-alignment padding) before data
        extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
        s = np.array([7, -7], dtype=np.int16)
        ch, rate, out = parse_wav(_wav(s, pre_chunks=extra))
        np.testing.assert_array_equal(out[:, 0], s)

    def test_rejects_non_riff(self):
        with pytest.raises(ValueError, match="not a RIFF/WAVE"):
            parse_wav(b"OggS" + b"\x00" * 40)

    def test_rejects_non_pcm(self):
        fmt = struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)  # float32
        raw = b"RIFF" + struct.pack("<I", 28) + b"WAVEfmt " + fmt + b"data" + struct.pack("<I", 0)
        with pytest.raises(ValueError, match="only PCM16"):
            parse_wav(raw)

    def test_rejects_missing_data_chunk(self):
        fmt = struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        raw = b"RIFF" + struct.pack("<I", 24) + b"WAVEfmt " + fmt
        with pytest.raises(ValueError, match="missing fmt or data"):
            parse_wav(raw)


def test_decode_pipeline_matches_duckdb_oracle(spark):
    """End-to-end: JVM-side payload synthesis -> mapInPandas container
    decode -> long-format features == the closed-form DuckDB oracle."""
    import duckdb

    import __spark_entry__ as e

    sf_dir = "/root/testdata/sf0.001"
    got = (
        e.queries()["multimodal_decode"](spark, sf_dir)
        .toPandas()
        .sort_values(["doc_id", "media", "metric"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    want = con.execute(e.oracle_sql()["multimodal_decode"]).df()
    con.close()
    assert len(got) == len(want)
    assert got["metric"].tolist() == want["metric"].tolist()
    np.testing.assert_allclose(got["value"].to_numpy(), want["value"].to_numpy(), atol=1e-6)


def test_synthesized_payloads_are_real_containers(spark):
    """The JVM-built payloads decode with the strict parsers — i.e. they are
    genuine P6/RIFF files, not look-alikes."""
    from pgvectorscale_spark.operators.multimodal import (
        PPM_H,
        PPM_W,
        attach_ppm_payload,
        attach_wav_payload,
    )

    df = spark.createDataFrame([(1, "hello world"), (2, "spark")], "doc_id long, text string")
    for row in attach_ppm_payload(df).collect():
        w, h, mx, px = parse_ppm(bytes(row["payload"]))
        assert (w, h, mx) == (PPM_W, PPM_H, 255)
        assert px.shape == (PPM_H, PPM_W, 3)
    for row in attach_wav_payload(df).collect():
        ch, rate, samples = parse_wav(bytes(row["payload"]))
        assert (ch, rate) == (1, 8000)
        assert samples.shape == (16, 1)
