"""Baseline JPEG decoder round-trips against an independent test-side
encoder (forward DCT + quantize + Huffman, written from the spec — shares
no code with the decoder), plus strictness rejections.

JPEG is lossy, so round-trips assert error bounds, not equality: with a
flat quantization table of 1 the only loss is DCT float rounding (tight
bounds); coarser tables get statistical bounds. 4:2:0 subsampling and
restart markers exercise the decoder's MCU/plane assembly and resync."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pgvectorscale_spark.operators.jpeg import parse_jpeg

# ---- independent encoder (tests only) --------------------------------------

_ZZ = [
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = (np.sqrt(0.125) if _u == 0 else 0.5) * np.cos(
            (2 * _x + 1) * _u * np.pi / 16
        )

# simple uniform-length canonical Huffman tables (valid JPEG; the decoder
# must build them from the DHT segment, not assume Annex K): 12 DC symbols
# at 4 bits, 162 AC symbols at 8 bits — all-ones codes left unused
_DC_COUNTS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [16 * r + s for r in range(16) for s in range(1, 11)] + [0x00, 0xF0]
_AC_COUNTS = [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMBOLS), 0, 0, 0, 0, 0, 0, 0, 0]


def _huff_codes(counts, symbols):
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            codes[symbols[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # pad with 1s


def _encode_block(bw, block, q, pred, dc_codes, ac_codes):
    coef = _C @ (block - 128.0) @ _C.T
    qc = np.round(coef / q.reshape(8, 8)).astype(np.int64)
    zz = qc.reshape(64)[_ZZ]
    diff = int(zz[0]) - pred
    s = int(diff).bit_length() if diff else 0
    bw.write(*dc_codes[s])
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last = max([k for k in range(1, 64) if zz[k]] or [0])
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*ac_codes[0xF0])
            run -= 16
        s = abs(v).bit_length()
        bw.write(*ac_codes[16 * run + s])
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        bw.write(*ac_codes[0x00])  # EOB
    return int(zz[0])


def encode_jpeg(px: np.ndarray, qluma=1.0, qchroma=1.0, subsample=False,
                restart_interval=0) -> bytes:
    """Minimal baseline JPEG encoder: grayscale (h,w,1) or RGB (h,w,3),
    4:4:4 or 4:2:0 (subsample=True), flat quantization tables, uniform
    Huffman tables, optional restart markers."""
    h, w, ch = px.shape
    gray = ch == 1
    qt0 = np.full(64, qluma)
    qt1 = np.full(64, qchroma)
    if gray:
        planes = [px[:, :, 0].astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        rgb = px.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
        if subsample:
            def down(p):
                hh = (p.shape[0] + 1) // 2 * 2
                ww = (p.shape[1] + 1) // 2 * 2
                p2 = np.pad(p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])), mode="edge")
                return (p2[0::2, 0::2] + p2[1::2, 0::2] + p2[0::2, 1::2] + p2[1::2, 1::2]) / 4.0
            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qsel = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for (sh, sv), p in zip(samp, planes):
        ph, pw = mcuy * 8 * sv, mcux * 8 * sh
        padded.append(np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"))
    dc_codes = _huff_codes(_DC_COUNTS, _DC_SYMBOLS)
    ac_codes = _huff_codes(_AC_COUNTS, _AC_SYMBOLS)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0]) + bytes(qt0.astype(np.uint8).tolist()))
    if not gray:
        out += seg(0xDB, bytes([1]) + bytes(qt1.astype(np.uint8).tolist()))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(planes)])
    for i, (sh, sv) in enumerate(samp):
        sof += bytes([i + 1, (sh << 4) | sv, qsel[i]])
    out += seg(0xC0, sof)
    for tc in (0, 1):
        counts = _DC_COUNTS if tc == 0 else _AC_COUNTS
        syms = _DC_SYMBOLS if tc == 0 else _AC_SYMBOLS
        for th in ([0] if gray else [0, 1]):
            out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(planes)])
    for i in range(len(planes)):
        t = 0 if (gray or i == 0) else 1
        sos += bytes([i + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    bw = _BitWriter()
    preds = [0] * len(planes)
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            out += bytes(bw.out) + bytes([0xFF, 0xD0 + (rst & 7)])
            bw = _BitWriter()
            rst += 1
            preds = [0] * len(planes)
        my, mx = divmod(m, mcux)
        for i, ((sh, sv), p) in enumerate(zip(samp, padded)):
            q = qt0 if qsel[i] == 0 else qt1
            for by in range(sv):
                for bx in range(sh):
                    y0 = (my * sv + by) * 8
                    x0 = (mx * sh + bx) * 8
                    preds[i] = _encode_block(
                        bw, p[y0 : y0 + 8, x0 : x0 + 8], q, preds[i], dc_codes, ac_codes
                    )
    bw.flush()
    out += bytes(bw.out) + b"\xff\xd9"
    return out


def _smooth(h, w, ch, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, ch))
    for c in range(ch):
        img[:, :, c] = (
            128
            + 90 * np.sin(xx / (9 + 3 * c) + c)
            + 30 * np.cos(yy / (7 + 2 * c))
        )
    return np.clip(img + rng.normal(0, 2, img.shape), 0, 255).astype(np.uint8)


# ---- round-trips -----------------------------------------------------------


class TestParseJpeg:
    def test_constant_image_near_exact(self):
        px = np.full((13, 9, 3), 77, dtype=np.uint8)
        w, h, ch, out = parse_jpeg(encode_jpeg(px))
        assert (w, h, ch) == (9, 13, 3)
        assert np.abs(out.astype(int) - 77).max() <= 1

    def test_smooth_rgb_444_flat_q1(self):
        px = _smooth(24, 17, 3)
        w, h, ch, out = parse_jpeg(encode_jpeg(px))
        assert (w, h, ch) == (17, 24, 3)
        # flat q=1: loss is DCT rounding + colorspace round-trip only
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 6
        assert np.abs(out.astype(float) - px).mean() < 1.5

    def test_grayscale_roundtrip(self):
        px = _smooth(16, 16, 1, seed=2)
        w, h, ch, out = parse_jpeg(encode_jpeg(px))
        assert (w, h, ch) == (16, 16, 1)
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 3

    def test_420_subsampling(self):
        px = _smooth(32, 23, 3, seed=3)
        w, h, ch, out = parse_jpeg(encode_jpeg(px, subsample=True))
        assert (w, h, ch) == (23, 32, 3)
        # chroma is 2x2-averaged: statistical bound, luma still tight
        assert np.abs(out.astype(float) - px).mean() < 4.0

    def test_coarse_quantization_still_bounded(self):
        px = _smooth(16, 16, 3, seed=4)
        out = parse_jpeg(encode_jpeg(px, qluma=16.0, qchroma=24.0))[3]
        assert np.abs(out.astype(float) - px).mean() < 10.0

    def test_restart_markers(self):
        px = _smooth(40, 33, 3, seed=5)
        data = encode_jpeg(px, restart_interval=2)
        assert b"\xff\xd0" in data or b"\xff\xd1" in data
        out = parse_jpeg(data)[3]
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 6

    def test_rejects_non_jpeg(self):
        with pytest.raises(ValueError, match="SOI"):
            parse_jpeg(b"\x89PNG\r\n\x1a\x0a" + b"\x00" * 20)

    def test_rejects_progressive(self):
        px = np.zeros((8, 8, 1), dtype=np.uint8)
        data = bytearray(encode_jpeg(px))
        i = data.index(bytes([0xFF, 0xC0]))
        data[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
        with pytest.raises(ValueError, match="SOF2"):
            parse_jpeg(bytes(data))

    def test_rejects_16bit_quant(self):
        px = np.zeros((8, 8, 1), dtype=np.uint8)
        data = bytearray(encode_jpeg(px))
        i = data.index(bytes([0xFF, 0xDB]))
        data[i + 4] = 0x10  # Pq=1: 16-bit table
        with pytest.raises(ValueError, match="16-bit"):
            parse_jpeg(bytes(data))

    def test_rejects_truncated_entropy(self):
        px = _smooth(16, 16, 3, seed=6)
        data = encode_jpeg(px)
        with pytest.raises(ValueError):
            parse_jpeg(data[: len(data) // 2])


def test_decode_jpeg_image_operator(spark):
    """The mapInPandas operator reports the same features as a direct
    parse — Arrow binary round-trip included."""
    from pgvectorscale_spark.operators.jpeg import decode_jpeg_image

    imgs = {i: _smooth(16, 16, 3, seed=10 + i) for i in range(3)}
    payloads = {i: encode_jpeg(px) for i, px in imgs.items()}
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in payloads.items()], "doc_id long, payload binary"
    )
    rows = {r["doc_id"]: r for r in decode_jpeg_image(df).collect()}
    assert len(rows) == 3
    for i, p in payloads.items():
        w, h, ch, px = parse_jpeg(p)
        means = px.reshape(-1, 3).mean(axis=0)
        assert rows[i]["width"] == w and rows[i]["channels"] == 3
        assert abs(rows[i]["mean_r"] - means[0]) < 1e-6
        assert abs(rows[i]["mean_b"] - means[2]) < 1e-6


def test_marker_scan_accepts_fill_bytes():
    """Spec B.1.1.2: any number of 0xFF fill bytes may pad before a marker
    code — the marker walk must skip them, not raise on 'bad alignment'."""
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, size=(8, 8, 3)).astype(np.uint8)
    raw = encode_jpeg(px)
    i = raw.index(b"\xff\xdb")  # first DQT, right after SOI/segments
    padded = raw[:i] + b"\xff" * 3 + raw[i:]
    w, h, ch, a = parse_jpeg(raw)
    w2, h2, ch2, b = parse_jpeg(padded)
    assert (w, h, ch) == (w2, h2, ch2)
    assert np.array_equal(a, b)


def test_fill_run_to_eof_raises_valueerror():
    """A stream that is all fill bytes (or truncated just after a fill run)
    must fail with the parser's documented ValueError, not IndexError."""
    with pytest.raises(ValueError, match="truncated stream in marker scan"):
        parse_jpeg(b"\xff\xd8" + b"\xff" * 6)
