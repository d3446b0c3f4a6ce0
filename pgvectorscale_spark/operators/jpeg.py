"""Baseline JPEG decode — pure numpy/stdlib, no media libraries.

``parse_jpeg`` decodes baseline sequential JFIF (SOF0, 8-bit, Huffman):
marker walk, DQT/DHT/SOF0/SOS/DRI parsing, entropy decode with byte
unstuffing and restart markers, dequantization, zigzag reorder, 2-D IDCT
(separable DCT-III basis matmul), per-component plane assembly with
chroma upsampling (any H/V sampling factors incl. 4:2:0 and 4:2:2), and
YCbCr→RGB conversion. Grayscale and 3-component images are supported;
progressive (SOF2), arithmetic coding, 12-bit precision, and hierarchical
modes raise loudly.

This closes the image half of the lossy-codec gap noted in NOTES.md —
``multimodal.decode_image`` dispatches to this parser by magic bytes, so
PNG (lossless DEFLATE) and JPEG (lossy DCT) both decode through the public
API with no PIL. General JPEG has no JVM-side synthesis path (arbitrary
Huffman bit-packing is not expressible as SQL byte concatenation, unlike
PNG's stored-deflate), so its primary correctness gate is the pytest
round-trip against an independent test-side encoder; flat single-DC frames
DO have a closed-form encoding, which operators/mjpeg.py exploits to give
the decoder a driver DuckDB oracle as well (every MJPEG frame passes
through this module's entropy decode and IDCT).

Reference behavior analog: none in /root/reference (pgvectorscale stores
vectors, not media); this module serves the training-data-pipeline brief
(multimodal column decode at 100 TB: Arrow-batched mapInPandas, payload
bytes only read when the decode stage runs).
"""

from __future__ import annotations

import struct
import numpy as np
from pyspark.sql import DataFrame

__all__ = ["parse_jpeg", "decode_jpeg_image"]

# zigzag scan order: index i of the scan -> natural position in the 8x8 block
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# DCT-III (inverse DCT) basis: pixel = C^T . coef . C with C[u, x] =
# c(u) * cos((2x+1) u pi / 16), c(0)=sqrt(1/8), else sqrt(2/8)
_IDCT_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _IDCT_C[_u, _x] = (np.sqrt(0.125) if _u == 0 else 0.5) * np.cos(
            (2 * _x + 1) * _u * np.pi / 16
        )


class _HuffTable:
    """Canonical Huffman decode table from the DHT (counts, symbols) lists:
    per code length, the first code value and the symbol offset — decode is
    a walk extending the code one bit at a time (max 16)."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.symbols = symbols
        code, k = 0, 0
        for ln in range(1, 17):
            n = counts[ln - 1]
            self.valptr[ln] = k
            self.mincode[ln] = code
            self.maxcode[ln] = code + n - 1 if n else -1
            code = (code + n) << 1
            k += n

    def decode(self, br: "_BitReader") -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.bit()
            if self.maxcode[ln] >= 0 and code <= self.maxcode[ln]:
                return self.symbols[self.valptr[ln] + (code - self.mincode[ln])]
        raise ValueError("invalid JPEG Huffman code")


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing; stops (raises StopIteration-like ValueError) at any real
    marker. ``align_restart`` consumes an expected RSTn marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1  # stuffed 0xFF data byte
                else:
                    raise ValueError("hit marker inside entropy segment")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = 0
        for _ in range(s):
            v = (v << 1) | self.bit()
        # EXTEND (spec F.2.2.1): top bit 0 means negative branch
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    def align_restart(self, n: int) -> None:
        self.nbits = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + (n & 7)
        ):
            raise ValueError("expected JPEG restart marker")
        self.pos += 2


def _decode_block(br: _BitReader, dc_tab: _HuffTable, ac_tab: _HuffTable,
                  pred: int, qt: np.ndarray) -> tuple[np.ndarray, int]:
    """One 8x8 block: Huffman-decode DC diff + AC run-lengths, dequantize,
    un-zigzag, IDCT. Returns (8x8 float pixels centered at 0, new DC pred)."""
    coef = np.zeros(64, dtype=np.float64)
    t = dc_tab.decode(br)
    pred += br.receive_extend(t)
    coef[0] = pred
    k = 1
    while k < 64:
        rs = ac_tab.decode(br)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16  # ZRL: sixteen zeros
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC coefficient index out of range")
        coef[k] = br.receive_extend(s)
        k += 1
    block = np.zeros(64, dtype=np.float64)
    block[_ZIGZAG] = coef * qt
    m = block.reshape(8, 8)
    return _IDCT_C.T @ m @ _IDCT_C, pred


def parse_jpeg(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a baseline JPEG: returns (width, height, channels, pixels
    (h, w, channels) uint8) — channels 1 (grayscale) or 3 (RGB, converted
    from YCbCr with the JFIF coefficients)."""
    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    frame = None  # (width, height, comps) with comps = [(id, h, v, tq)]
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        # spec-legal fill: any number of 0xFF bytes may pad before the
        # marker code (B.1.1.2) — skip to the last one
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(data):
            # EOI is a bare marker (no length word): a spec-legal stream
            # may end ...FF FF D9 with fill right before it, needing only
            # 2 bytes of headroom — accept that before the 4-byte check
            if pos + 2 <= len(data) and data[pos + 1] == 0xD9:
                break
            # the fill run consumed the remaining headroom: a stream that
            # is all fill (or truncated just after it) must fail with the
            # parser's documented error, not IndexError/struct.error
            raise ValueError(f"truncated stream in marker scan at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # stray RST
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                qtables[tq] = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8).astype(np.float64)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                htables[(tc, th)] = _HuffTable(counts, seg[p + 17 : p + 17 + n])
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision, height, width, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if precision != 8:
                raise ValueError("only 8-bit JPEG precision supported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (width, height, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode (SOF{marker - 0xC0}): only baseline sequential (SOF0)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS -> entropy decode follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            ns = seg[0]
            scan = []  # per scan component: (frame comp index, dc table, ac table)
            for i in range(ns):
                cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                ci = next(j for j, c in enumerate(frame[2]) if c[0] == cid)
                scan.append((ci, htables[(0, tt >> 4)], htables[(1, tt & 15)]))
            width, height, comps = frame
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-width // (8 * hmax))
            mcuy = -(-height // (8 * vmax))
            planes = [
                np.zeros((mcuy * 8 * c[2], mcux * 8 * c[1]), dtype=np.float64)
                for c in comps
            ]
            br = _BitReader(data, pos + seglen)
            preds = [0] * len(comps)
            for m in range(mcux * mcuy):
                if restart_interval and m and m % restart_interval == 0:
                    br.align_restart(m // restart_interval - 1)
                    preds = [0] * len(comps)
                my, mx = divmod(m, mcux)
                for ci, dc_tab, ac_tab in scan:
                    _, ch, cv, tq = comps[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            blk, preds[ci] = _decode_block(
                                br, dc_tab, ac_tab, preds[ci], qtables[tq]
                            )
                            y0 = (my * cv + by) * 8
                            x0 = (mx * ch + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
            out_planes = []
            for (cid, ch, cv, _tq), plane in zip(comps, planes):
                up = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
                out_planes.append(up[:height, :width] + 128.0)
            if len(out_planes) == 1:
                px = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
                return width, height, 1, px[:, :, None]
            if len(out_planes) != 3:
                raise ValueError(f"unsupported JPEG component count {len(out_planes)}")
            y, cb, cr = out_planes
            r = y + 1.402 * (cr - 128.0)
            g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
            b = y + 1.772 * (cb - 128.0)
            px = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
            return width, height, 3, px
        # APPn / COM / others: skip
        pos += seglen
    raise ValueError("JPEG missing SOS scan")


def decode_jpeg_image(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Decode baseline JPEG payloads to typed image features with
    ``parse_jpeg`` (see ``multimodal.decode_image_features`` for the
    shared Arrow-batched shape and output schema)."""
    # lazy import: multimodal re-exports this module's symbols at import
    # time, so a module-level import back would be circular
    from pgvectorscale_spark.operators.multimodal import decode_image_features

    return decode_image_features(df, parse_jpeg, payload_col, id_col)
