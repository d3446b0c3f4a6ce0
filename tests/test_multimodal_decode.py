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
        fmt = struct.pack("<IHHIIHH", 16, 0x55, 1, 8000, 32000, 4, 32)  # MP3-in-WAV
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
    want = (
        con.execute(e.oracle_sql()["multimodal_decode"])
        .df()
        .sort_values(["doc_id", "media", "metric"])
        .reset_index(drop=True)
    )
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


def _filter_subimage(px: np.ndarray, filters: list[int]) -> bytes:
    """Filter one (sub-)image's scanlines by the inverse of each defilter
    rule (previous-row state local to the sub-image)."""
    h, w, ch = px.shape
    stride = w * ch
    raw = b""
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        ft = filters[r % len(filters)]
        row = px[r].reshape(stride).astype(np.int32)
        if ft == 0:
            fl = row.copy()
        elif ft == 1:
            fl = row.copy()
            fl[ch:] = (row[ch:] - row[:-ch]) % 256
        elif ft == 2:
            fl = (row - prev) % 256
        elif ft == 3:
            fl = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = row[x - ch] if x >= ch else 0
                fl[x] = (row[x] - (left + prev[x]) // 2) % 256
        elif ft == 4:
            fl = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = row[x - ch] if x >= ch else 0
                b, c = prev[x], (prev[x - ch] if x >= ch else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                fl[x] = (row[x] - pred) % 256
        raw += bytes([ft]) + bytes(fl.astype(np.uint8))
        prev = row
    return raw


# the spec's fixed Adam7 grid, restated independently for the test encoder
_ADAM7_REF = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _encode_png(
    px: np.ndarray, color: int, filters: list[int], interlace: int = 0
) -> bytes:
    """Reference PNG encoder (tests only): real zlib compression, filters
    applied per scanline by the inverse of each defilter rule; Adam7
    gathers each pass's pixels and filters it as its own sub-image."""
    import zlib

    h, w, ch = px.shape
    if interlace == 0:
        raw = _filter_subimage(px, filters)
    else:
        raw = b""
        for x0, y0, dx, dy in _ADAM7_REF:
            sub = px[y0::dy, x0::dx]
            if sub.size:
                raw += _filter_subimage(np.ascontiguousarray(sub), filters)

    def chunk(t: bytes, d: bytes) -> bytes:
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\x0a"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


class TestParsePng:
    def test_roundtrip_all_filters_and_color_types(self):
        from pgvectorscale_spark.operators.multimodal import parse_png

        rng = np.random.default_rng(11)
        for color, ch in [(0, 1), (2, 3), (4, 2), (6, 4)]:
            px = rng.integers(0, 256, (9, 7, ch), dtype=np.uint8)
            data = _encode_png(px, color, filters=[0, 1, 2, 3, 4])
            w, h, ch2, out = parse_png(data)
            assert (w, h, ch2) == (7, 9, ch)
            assert (out == px).all(), f"color type {color}"

    def test_multiple_idat_chunks_concatenate(self):
        import zlib

        from pgvectorscale_spark.operators.multimodal import parse_png

        rng = np.random.default_rng(12)
        px = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
        data = _encode_png(px, 2, filters=[4])
        # split the single IDAT into two chunks at an arbitrary byte
        pos = 8
        chunks = []
        while pos + 8 <= len(data):
            (length,) = struct.unpack(">I", data[pos : pos + 4])
            chunks.append((data[pos + 4 : pos + 8], data[pos + 8 : pos + 8 + length]))
            pos += 12 + length
        out = data[:8]
        for t, d in chunks:
            parts = [d[: len(d) // 2], d[len(d) // 2 :]] if t == b"IDAT" else [d]
            for p in parts:
                out += struct.pack(">I", len(p)) + t + p + struct.pack(
                    ">I", zlib.crc32(t + p) & 0xFFFFFFFF
                )
        w, h, ch, px2 = parse_png(out)
        assert (px2 == px).all()

    def test_rejects_bad_signature(self):
        from pgvectorscale_spark.operators.multimodal import parse_png

        with pytest.raises(ValueError, match="signature"):
            parse_png(b"NOTPNG" + b"\x00" * 40)

    def test_rejects_corrupt_chunk_crc(self):
        from pgvectorscale_spark.operators.multimodal import parse_png

        px = np.zeros((2, 2, 3), dtype=np.uint8)
        data = bytearray(_encode_png(px, 2, filters=[0]))
        data[40] ^= 0xFF  # inside IDAT payload: CRC no longer matches
        with pytest.raises(ValueError):
            parse_png(bytes(data))

    def test_rejects_unsupported_depth_palette_interlace(self):
        import zlib

        from pgvectorscale_spark.operators.multimodal import parse_png

        def with_ihdr(depth, color, interlace):
            body = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, interlace)
            chunk = (
                struct.pack(">I", len(body))
                + b"IHDR"
                + body
                + struct.pack(">I", zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF)
            )
            idat = zlib.compress(b"\x00" * 14)
            ich = (
                struct.pack(">I", len(idat))
                + b"IDAT"
                + idat
                + struct.pack(">I", zlib.crc32(b"IDAT" + idat) & 0xFFFFFFFF)
            )
            iend = struct.pack(">I", 0) + b"IEND" + struct.pack(
                ">I", zlib.crc32(b"IEND") & 0xFFFFFFFF
            )
            return b"\x89PNG\r\n\x1a\x0a" + chunk + ich + iend

        for depth, color, inter in [(16, 2, 0), (8, 3, 0), (8, 2, 2)]:
            with pytest.raises(ValueError, match="unsupported"):
                parse_png(with_ihdr(depth, color, inter))

    def test_adam7_roundtrip_all_color_types_and_filters(self):
        from pgvectorscale_spark.operators.multimodal import parse_png

        rng = np.random.default_rng(21)
        for color, ch in [(0, 1), (2, 3), (4, 2), (6, 4)]:
            px = rng.integers(0, 256, (9, 7, ch), dtype=np.uint8)
            data = _encode_png(px, color, filters=[0, 1, 2, 3, 4], interlace=1)
            w, h, ch2, out = parse_png(data)
            assert (w, h, ch2) == (7, 9, ch)
            assert (out == px).all(), f"adam7 color type {color}"

    def test_adam7_edge_geometries(self):
        """Sizes where whole passes are empty: 1x1 (only pass 1 exists),
        8x8 (every pass non-empty), 2x3, 5x1."""
        from pgvectorscale_spark.operators.multimodal import parse_png

        rng = np.random.default_rng(22)
        for h, w in [(1, 1), (8, 8), (3, 2), (1, 5), (5, 1)]:
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            data = _encode_png(px, 2, filters=[0, 2], interlace=1)
            got = parse_png(data)
            assert got[:3] == (w, h, 3)
            assert (got[3] == px).all(), (h, w)

    def test_adam7_truncated_pass_data(self):
        import zlib

        from pgvectorscale_spark.operators.multimodal import parse_png

        px = np.zeros((8, 8, 3), dtype=np.uint8)
        data = _encode_png(px, 2, filters=[0], interlace=1)
        # re-compress the raw stream minus its last byte; CRCs stay valid
        pos, chunks = 8, []
        while pos + 8 <= len(data):
            (length,) = struct.unpack(">I", data[pos : pos + 4])
            chunks.append((data[pos + 4 : pos + 8], data[pos + 8 : pos + 8 + length]))
            pos += 12 + length
        out = data[:8]
        for t, d in chunks:
            if t == b"IDAT":
                d = zlib.compress(zlib.decompress(d)[:-1])
            out += struct.pack(">I", len(d)) + t + d + struct.pack(
                ">I", zlib.crc32(t + d) & 0xFFFFFFFF
            )
        with pytest.raises(ValueError, match="Adam7"):
            parse_png(out)

    def test_rejects_wrong_raw_length(self):
        from pgvectorscale_spark.operators.multimodal import parse_png

        px = np.zeros((3, 3, 3), dtype=np.uint8)
        ok = _encode_png(px, 2, filters=[0])
        # claim a 4x4 geometry over the 3x3 raw stream
        bad = _encode_png(np.zeros((4, 4, 3), dtype=np.uint8), 2, filters=[0])
        hybrid = bad[:33] + ok[33:]  # IHDR from 4x4, IDAT from 3x3 -> CRC ok, len wrong
        with pytest.raises(ValueError):
            parse_png(hybrid)


def test_png_synth_is_real_and_decodes_to_reference_pixels(spark):
    """attach_png_payload emits complete, strictly-valid PNGs (CRC and
    adler32 verified by the decoder), and the decoded pixels equal an
    independent Python reconstruction from the digest bytes."""
    import hashlib

    from pgvectorscale_spark.operators.multimodal import (
        PNG_FILTERS,
        PNG_H,
        PNG_W,
        attach_png_payload,
        decode_png_image,
        parse_png,
    )

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta gamma"), (3, "")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in attach_png_payload(df).collect()}
    stride = PNG_W * 3
    for doc_id, r in rows.items():
        w, h, ch, px = parse_png(bytes(r["payload"]))
        assert (w, h, ch) == (PNG_W, PNG_H, 3)
        dig = hashlib.md5(r["text"].encode()).digest()
        body = (dig * (stride * PNG_H // 16 + 1))[: stride * PNG_H]
        exp = np.zeros((PNG_H, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        for rr, ft in enumerate(PNG_FILTERS[:PNG_H]):
            raw = np.frombuffer(body[rr * stride : (rr + 1) * stride], dtype=np.uint8).copy()
            if ft == 0:
                rec = raw
            elif ft == 1:
                rec = (
                    raw.reshape(PNG_W, 3)
                    .cumsum(axis=0, dtype=np.uint64)
                    .astype(np.uint8)
                    .reshape(stride)
                )
            else:
                rec = raw + prev
            exp[rr] = rec
            prev = rec
        assert (px.reshape(PNG_H, stride) == exp).all(), doc_id
    # the decode operator reports the same means
    feats = {r["doc_id"]: r for r in decode_png_image(attach_png_payload(df)).collect()}
    for doc_id, r in rows.items():
        _, _, _, px = parse_png(bytes(r["payload"]))
        means = px.reshape(-1, 3).mean(axis=0)
        assert abs(feats[doc_id]["mean_r"] - means[0]) < 1e-6
        assert abs(feats[doc_id]["mean_b"] - means[2]) < 1e-6


class TestParseMp3Meta:
    """Frame-header scan: genuine MPEG-1 Layer III arithmetic, strict walk."""

    @staticmethod
    def _frame(kbps=128, rate_idx=0, mode=0, padding=0, fill=b"\x5a"):
        from pgvectorscale_spark.operators.multimodal import MP3_BITRATES, MP3_RATES

        bidx = MP3_BITRATES.index(kbps) + 1
        rate = MP3_RATES[rate_idx]
        hdr = bytes([0xFF, 0xFB, (bidx << 4) | (rate_idx << 2) | (padding << 1), mode << 6])
        flen = 144 * kbps * 1000 // rate + padding
        return hdr + fill * (flen - 4)

    def test_basic_stream(self):
        from pgvectorscale_spark.operators.multimodal import parse_mp3_meta

        raw = self._frame() * 4
        v, layer, kbps, rate, ch, n, dur = parse_mp3_meta(raw)
        assert (v, layer, kbps, rate, ch, n) == (1, 3, 128.0, 44100, 2, 4)
        assert dur == round(4 * 1152 * 1000.0 / 44100, 6)

    def test_vbr_mean_and_mono(self):
        from pgvectorscale_spark.operators.multimodal import parse_mp3_meta

        raw = self._frame(64, 1, mode=3) + self._frame(128, 1, mode=3) * 2
        _, _, kbps, rate, ch, n, _ = parse_mp3_meta(raw)
        assert (kbps, rate, ch, n) == (round((64 + 128 + 128) / 3.0, 6), 48000, 1, 3)

    def test_padding_byte_advances_walk(self):
        from pgvectorscale_spark.operators.multimodal import parse_mp3_meta

        raw = self._frame(padding=1) + self._frame(padding=0)
        assert parse_mp3_meta(raw)[5] == 2

    def test_id3v2_prefix_and_id3v1_trailer(self):
        from pgvectorscale_spark.operators.multimodal import parse_mp3_meta

        tag_body = b"\x00" * 200
        id3v2 = b"ID3\x04\x00\x00" + bytes([0, 0, 200 >> 7, 200 & 0x7F]) + tag_body
        id3v1 = b"TAG" + b"\x00" * 125
        raw = id3v2 + self._frame() * 2 + id3v1
        assert parse_mp3_meta(raw)[5] == 2

    def test_rejects_truncated_and_desync(self):
        import pytest as _pytest

        from pgvectorscale_spark.operators.multimodal import parse_mp3_meta

        with _pytest.raises(ValueError, match="truncated|lost frame sync"):
            parse_mp3_meta(self._frame()[:-10])
        with _pytest.raises(ValueError, match="lost frame sync"):
            parse_mp3_meta(self._frame() + b"junk-after-frames")
        with _pytest.raises(ValueError, match="sample-rate/channel-mode"):
            parse_mp3_meta(self._frame(rate_idx=0) + self._frame(rate_idx=1))
        with _pytest.raises(ValueError, match="only MPEG-1 Layer III"):
            parse_mp3_meta(bytes([0xFF, 0xF3, 0x90, 0x00]) + b"\x00" * 200)

    def test_synth_payloads_are_real_streams(self, spark):
        """The JVM-built streams parse with the strict walk, and the scan's
        outputs equal the nibble draws the synth made."""
        from pgvectorscale_spark.operators.multimodal import (
            MP3_BITRATES,
            MP3_RATES,
            attach_mp3_payload,
            parse_mp3_meta,
        )
        import hashlib

        df = spark.createDataFrame(
            [(1, "hello world"), (2, "spark"), (3, "")], "doc_id long, text string"
        )
        for row in attach_mp3_payload(df).collect():
            _, _, kbps, rate, ch, n, _ = parse_mp3_meta(bytes(row["payload"]))
            h = hashlib.md5(row["text"].encode()).hexdigest()
            nib = [int(c, 16) for c in h[:4]]
            assert kbps == MP3_BITRATES[nib[0] % 14]
            assert rate == MP3_RATES[nib[1] % 3]
            assert ch == (1 if nib[2] % 4 == 3 else 2)
            assert n == 2 + nib[3] % 4


class TestParseMp4Meta:
    """ISO-BMFF box walk: byte-aligned container arithmetic, strict."""

    @staticmethod
    def _box(btype: bytes, body: bytes, largesize=False) -> bytes:
        if largesize:
            return (
                struct.pack(">I", 1) + btype + struct.pack(">Q", 16 + len(body)) + body
            )
        return struct.pack(">I", 8 + len(body)) + btype + body

    @classmethod
    def _mvhd(cls, ts, dur, version=0):
        m = (
            struct.pack(">I", 0x00010000) + b"\x00" * 12
        ) * 2 + struct.pack(">I", 0x40000000)  # 36-byte unity matrix
        if version == 1:
            body = bytes([1, 0, 0, 0]) + b"\x00" * 16 + struct.pack(">IQ", ts, dur)
        else:
            body = b"\x00" * 12 + struct.pack(">II", ts, dur)
        body += struct.pack(">I", 0x00010000) + struct.pack(">HH", 0x0100, 0)
        body += b"\x00" * 8 + m + b"\x00" * 24 + struct.pack(">I", 2)
        return cls._box(b"mvhd", body)

    @classmethod
    def _trak(cls, w, h, version=0):
        m = (
            struct.pack(">I", 0x00010000) + b"\x00" * 12
        ) * 2 + struct.pack(">I", 0x40000000)
        if version == 1:
            body = bytes([1, 0, 0, 7]) + b"\x00" * 16 + struct.pack(">II", 1, 0)
            body += struct.pack(">Q", 0)
        else:
            body = bytes([0, 0, 0, 7]) + b"\x00" * 8 + struct.pack(">III", 1, 0, 0)
        body += b"\x00" * 16 + m + struct.pack(">II", w << 16, h << 16)
        return cls._box(b"trak", cls._box(b"tkhd", body))

    @classmethod
    def _file(cls, ts=600, dur=1500, w=320, h=240, tracks=1, mvhd_v=0, tkhd_v=0):
        from pgvectorscale_spark.operators.multimodal import parse_mp4_meta  # noqa: F401

        ftyp = cls._box(b"ftyp", b"isom" + b"\x00" * 4 + b"isommp41")
        moov = cls._box(
            b"moov",
            cls._mvhd(ts, dur, mvhd_v)
            + b"".join(cls._trak(w, h, tkhd_v) for _ in range(tracks)),
        )
        return ftyp + moov + cls._box(b"mdat", b"\x5a" * 32)

    def test_v0_roundtrip(self):
        from pgvectorscale_spark.operators.multimodal import parse_mp4_meta

        brand, ts, dur, ntr, w, h = parse_mp4_meta(self._file(tracks=2))
        assert (brand, ts, ntr, w, h) == ("isom", 600, 2, 320.0, 240.0)
        assert dur == round(1500 * 1000.0 / 600, 6)

    def test_version1_and_largesize_boxes(self):
        from pgvectorscale_spark.operators.multimodal import parse_mp4_meta

        raw = self._file(ts=90000, dur=123456789, mvhd_v=1, tkhd_v=1)
        brand, ts, dur, ntr, w, h = parse_mp4_meta(raw)
        assert (ts, ntr, w, h) == (90000, 1, 320.0, 240.0)
        assert dur == round(123456789 * 1000.0 / 90000, 6)
        # wrap the mdat payload in a 64-bit largesize box
        raw2 = self._file()[: -(8 + 32)] + self._box(b"mdat", b"\x00" * 32, largesize=True)
        assert parse_mp4_meta(raw2)[1] == 600

    def test_size_zero_means_to_eof(self):
        from pgvectorscale_spark.operators.multimodal import parse_mp4_meta

        raw = self._file()[: -(8 + 32)]
        raw += struct.pack(">I", 0) + b"mdat" + b"\x77" * 100
        assert parse_mp4_meta(raw)[3] == 1

    def test_rejects_truncated_and_malformed(self):
        from pgvectorscale_spark.operators.multimodal import parse_mp4_meta

        with pytest.raises(ValueError, match="bad box size"):
            parse_mp4_meta(self._file()[:-20])  # mdat size > remaining bytes
        with pytest.raises(ValueError, match="truncated box header"):
            parse_mp4_meta(self._file() + b"\x00\x00\x00")
        with pytest.raises(ValueError, match="missing ftyp"):
            parse_mp4_meta(self._box(b"free", b"\x00" * 8))
        with pytest.raises(ValueError, match="zero movie timescale"):
            parse_mp4_meta(self._file(ts=0))
        # size-consistent but SHORT mvhd/tkhd bodies: typed error, never
        # garbage metadata from stray bytes (review finding)
        short_mvhd = self._box(b"ftyp", b"isom" + b"\x00" * 12) + self._box(
            b"moov", self._box(b"mvhd", b"\x00" * 14)
        )
        with pytest.raises(ValueError, match="malformed mvhd"):
            parse_mp4_meta(short_mvhd)
        short_tkhd = self._box(b"ftyp", b"isom" + b"\x00" * 12) + self._box(
            b"moov", self._mvhd(600, 600) + self._box(b"trak", self._box(b"tkhd", b"\x00" * 10))
        )
        with pytest.raises(ValueError, match="malformed tkhd"):
            parse_mp4_meta(short_tkhd)

    def test_synth_payloads_parse_with_strict_walk(self, spark):
        from pgvectorscale_spark.operators.multimodal import (
            attach_mp4_payload,
            parse_mp4_meta,
        )

        df = spark.createDataFrame(
            [(1, "hello world"), (2, "spark"), (3, "")], "doc_id long, text string"
        )
        for row in attach_mp4_payload(df).collect():
            brand, ts, dur, ntr, w, h = parse_mp4_meta(bytes(row["payload"]))
            assert brand == "isom" and ts in (600, 1200, 1800, 2400)
            assert ntr in (1, 2) and w % 16 == 0 and h % 16 == 0 and dur > 0


class _SpsBitWriter:
    """Independent test-side bit writer with Exp-Golomb encode — the
    parser's adversary (round-trip catches bit-order/crop/branch bugs)."""

    def __init__(self):
        self.bits = []

    def u(self, val, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)

    def ue(self, k):
        code = k + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def se(self, v):
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def rbsp(self):
        bits = self.bits + [1]  # rbsp_stop_one_bit
        while len(bits) % 8:
            bits.append(0)
        raw = bytearray()
        for i in range(0, len(bits), 8):
            raw.append(int("".join(map(str, bits[i : i + 8])), 2))
        # emulation prevention: 00 00 00/01/02/03 -> 00 00 03 xx
        out = bytearray()
        zeros = 0
        for b in raw:
            if zeros >= 2 and b <= 3:
                out.append(3)
                zeros = 0
            out.append(b)
            zeros = zeros + 1 if b == 0 else 0
        return bytes(out)


def _make_sps(profile=66, level=31, pw_mbs=120, ph_units=68, frame_mbs_only=1,
              crop=(0, 0, 0, 4), poc_type=0, chroma=1):
    w = _SpsBitWriter()
    w.u(profile, 8)
    w.u(0, 8)
    w.u(level, 8)
    w.ue(0)  # sps_id
    if profile in (100, 110):
        w.ue(chroma)
        if chroma == 3:
            w.u(0, 1)
        w.ue(0); w.ue(0); w.u(0, 1); w.u(0, 1)
    w.ue(4)  # log2_max_frame_num_minus4
    w.ue(poc_type)
    if poc_type == 0:
        w.ue(4)
    elif poc_type == 1:
        w.u(0, 1); w.se(-1); w.se(2)
        w.ue(2); w.se(3); w.se(-4)
    w.ue(3)  # max_num_ref_frames
    w.u(0, 1)
    w.ue(pw_mbs - 1)
    w.ue(ph_units - 1)
    w.u(frame_mbs_only, 1)
    if not frame_mbs_only:
        w.u(0, 1)
    w.u(1, 1)  # direct_8x8
    if any(crop):
        w.u(1, 1)
        for c in crop:
            w.ue(c)
    else:
        w.u(0, 1)
    w.u(0, 1)  # vui absent
    return b"\x67" + w.rbsp()  # NAL header: type 7, nal_ref_idc 3


def _annexb(*nals, four_byte_first=True):
    out = b""
    for i, n in enumerate(nals):
        out += (b"\x00\x00\x00\x01" if (i == 0 and four_byte_first) else b"\x00\x00\x01") + n
    return out


class TestParseH264Meta:
    def test_baseline_1080p(self):
        from pgvectorscale_spark.operators.multimodal import parse_h264_meta

        stream = _annexb(_make_sps(), b"\x68\xce\x38\x80", b"\x65\x88\x84\x00")
        pr, lv, w, h, n = parse_h264_meta(stream)
        assert (pr, lv, w, h, n) == (66, 31, 1920, 1080, 3)  # 1088 - 2*4 crop

    def test_high_profile_and_interlaced(self):
        from pgvectorscale_spark.operators.multimodal import parse_h264_meta

        sps = _make_sps(profile=100, level=40, pw_mbs=80, ph_units=36,
                        frame_mbs_only=0, crop=(0, 0, 0, 0), poc_type=1)
        pr, lv, w, h, n = parse_h264_meta(_annexb(sps))
        assert (pr, lv, w, h) == (100, 40, 1280, 2 * 36 * 16)

    def test_emulation_prevention_round_trip(self):
        from pgvectorscale_spark.operators.multimodal import parse_h264_meta

        # pw_mbs chosen so the RBSP contains long zero runs that force
        # emulation-prevention bytes; round-trip must strip them exactly
        sps = _make_sps(pw_mbs=257, ph_units=256, crop=(0, 0, 0, 0))
        pr, lv, w, h, n = parse_h264_meta(_annexb(sps))
        assert (w, h) == (257 * 16, 256 * 16)

    def test_rejects_bad_chroma_format(self):
        from pgvectorscale_spark.operators.multimodal import parse_h264_meta

        w = _SpsBitWriter()
        w.u(100, 8); w.u(0, 8); w.u(40, 8)
        w.ue(0)     # sps_id
        w.ue(4)     # chroma_format_idc out of range
        with pytest.raises(ValueError, match="chroma_format_idc"):
            parse_h264_meta(_annexb(b"\x67" + w.rbsp()))

    def test_rejects_streams_without_sps(self):
        from pgvectorscale_spark.operators.multimodal import parse_h264_meta

        with pytest.raises(ValueError, match="no SPS"):
            parse_h264_meta(_annexb(b"\x68\xce\x38\x80"))
        with pytest.raises(ValueError, match="no Annex-B"):
            parse_h264_meta(b"\xff\xfe\xfd" * 10)

    def test_operator_shape(self, spark):
        from pgvectorscale_spark.operators.multimodal import decode_h264_meta

        stream = _annexb(_make_sps(), b"\x68\xce\x38\x80")
        df = spark.createDataFrame(
            [(1, bytearray(stream))], "doc_id long, payload binary"
        )
        row = decode_h264_meta(df).collect()[0]
        assert (row["width"], row["height"], row["n_nal_units"]) == (1920, 1080, 2)


class TestResizeImage:
    def test_nearest_floor_pick_pattern(self, spark):
        """10x10 checker -> 5x5 picks even rows/cols only (flat g);
        -> 3x3 mixes 5 g with 4 g+4 pixels ((9g+16)/9)."""
        from pgvectorscale_spark.operators.multimodal import resize_image
        from pgvectorscale_spark.operators.vp8l import build_checker_webp

        g = 40
        df = spark.createDataFrame(
            [(1, bytearray(build_checker_webp(10, 10, g, g + 4)))],
            "doc_id long, payload binary",
        )
        r5 = resize_image(df, 5, 5).collect()[0]
        assert (r5["width"], r5["height"], r5["channels"]) == (5, 5, 4)
        assert r5["mean_r"] == r5["mean_g"] == r5["mean_b"] == float(g)
        r3 = resize_image(df, 3, 3).collect()[0]
        assert r3["mean_r"] == (9.0 * g + 16.0) / 9.0

    def test_upscale_repeats_pixels(self, spark):
        """2x1 two-pixel image -> 4x1: each source pixel appears twice,
        so the mean is unchanged and the pick pattern is [0,0,1,1]."""
        from pgvectorscale_spark.operators.multimodal import parse_image, resize_image

        # P6 PPM, 2x1, pixels (10,10,10) and (30,30,30)
        ppm = b"P6\n2 1\n255\n" + bytes([10] * 3 + [30] * 3)
        w, h, ch, px = parse_image(ppm)
        assert (w, h) == (2, 1)
        df = spark.createDataFrame(
            [(7, bytearray(ppm))], "doc_id long, payload binary"
        )
        row = resize_image(df, 4, 1).collect()[0]
        assert (row["width"], row["height"]) == (4, 1)
        assert row["mean_r"] == 20.0  # [10, 10, 30, 30]

    def test_validation(self):
        import pytest as _pytest

        from pgvectorscale_spark.operators.multimodal import resize_image

        with _pytest.raises(ValueError, match="target dims"):
            resize_image(None, 0, 4)

    def test_grayscale_replicates_luma(self, spark):
        """ch < 3 images (PGM here) resize without crashing: the single
        luma channel replicates into all three mean slots."""
        from pgvectorscale_spark.operators.multimodal import resize_image

        pgm = b"P5\n2 2\n255\n" + bytes([10, 30, 50, 70])
        df = spark.createDataFrame(
            [(9, bytearray(pgm))], "doc_id long, payload binary"
        )
        row = resize_image(df, 1, 1).collect()[0]
        assert row["channels"] < 3
        assert row["mean_r"] == row["mean_g"] == row["mean_b"] == 10.0
