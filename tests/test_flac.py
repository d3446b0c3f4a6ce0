"""FLAC decode (operators/flac.py): build/parse round-trips, an
independent scalar reference for the predictor+Rice layer, stereo
decorrelation identities, CRC enforcement, and the JVM-synth closed form."""
from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from pgvectorscale_spark.operators.flac import (
    FLAC_BLOCK,
    FLAC_RATE,
    _Bits,
    _crc8,
    _crc16,
    build_flac,
    parse_flac,
)

rng = np.random.default_rng(0xF1AC)


class TestRoundTrip:
    @pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
    def test_fixed_orders(self, order):
        B = 32
        warm = rng.integers(-1000, 1000, order).tolist()
        res = rng.integers(-50, 50, B - order).tolist()
        stream = build_flac([{"blocksize": B, "subframes": [("fixed", order, warm, res, 4)]}])
        out = parse_flac(stream)[2][:, 0].tolist()
        # independent reference: explicit difference-equation replay
        coefs = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}[order]
        exp = list(warm)
        for r in res:
            exp.append(sum(c * exp[-i - 1] for i, c in enumerate(coefs)) + r)
        assert out == exp

    def test_verbatim_and_constant(self):
        B = 24
        vals = rng.integers(-32768, 32768, B).tolist()
        stream = build_flac(
            [
                {"blocksize": B, "subframes": [("verbatim", vals)]},
                {"blocksize": B, "subframes": [("constant", -9999)]},
            ]
        )
        out = parse_flac(stream)[2][:, 0]
        assert out[:B].tolist() == vals and (out[B:] == -9999).all()

    @pytest.mark.parametrize("k", [0, 1, 4, 10])
    def test_rice_parameters(self, k):
        B = 40
        res = rng.integers(-(1 << k) - 3, (1 << k) + 3, B - 1).tolist()
        stream = build_flac([{"blocksize": B, "subframes": [("fixed", 1, [0], res, k)]}])
        out = parse_flac(stream)[2][:, 0].tolist()
        exp = [0]
        for r in res:
            exp.append(exp[-1] + r)
        assert out == exp

    def test_multi_channel_independent(self):
        B = 16
        stream = build_flac(
            [{"blocksize": B, "subframes": [("constant", 3), ("constant", -4), ("constant", 5)]}],
            channels=3,
        )
        ch, rate, out = parse_flac(stream)
        assert ch == 3 and out.shape == (B, 3)
        assert (out == np.array([3, -4, 5])).all()


class _W:
    """Independent writer for hand-built frames (stereo modes, LPC,
    partitions) the production encoder does not emit."""

    def __init__(self):
        self.bits = []

    def u(self, v, n):
        self.bits += [(v >> i) & 1 for i in range(n - 1, -1, -1)]
        return self

    def s(self, v, n):
        return self.u(v & ((1 << n) - 1), n)

    def rice(self, r, k):
        v = (r << 1) if r >= 0 else ((-r) << 1) - 1
        self.u(0, v >> k) if v >> k else None
        self.u(1, 1)
        if k:
            self.u(v & ((1 << k) - 1), k)
        return self

    def bytes_(self):
        while len(self.bits) % 8:
            self.bits.append(0)
        return bytes(
            int("".join(map(str, self.bits[i : i + 8])), 2)
            for i in range(0, len(self.bits), 8)
        )


def _stream(frame_body_fn, channels=2, depth=16, B=8):
    si = _W()
    si.u(B, 16).u(B, 16).u(0, 24).u(0, 24)
    si.u(8000, 20).u(channels - 1, 3).u(depth - 1, 5).u(B, 36)
    meta = si.bytes_() + b"\x00" * 16
    w = _W()
    frame_body_fn(w)
    hdr_len_bits = None
    return b"fLaC" + bytes([0x80]) + len(meta).to_bytes(3, "big") + meta, w


def _frame(chan_code, sub_fns, B=8, depth_code=4):
    """Assemble one frame with explicit channel assignment."""
    w = _W()
    w.u(0x3FFE, 14).u(0, 1).u(0, 1)
    w.u(7, 4).u(0, 4).u(chan_code, 4).u(depth_code, 3).u(0, 1)
    w.u(0, 8)  # frame number 0
    w.u(B - 1, 16)
    hdr = w.bytes_()
    w2 = _W()
    w2.bits = w.bits[:]
    w2.u(_crc8(hdr), 8)
    for fn in sub_fns:
        fn(w2)
    body = w2.bytes_()
    w3 = _W()
    w3.bits = w2.bits[:]
    while len(w3.bits) % 8:
        w3.bits.append(0)
    w3.u(_crc16(body), 16)
    return w3.bytes_()


def _si(channels, B=8, depth=16):
    si = _W()
    si.u(B, 16).u(B, 16).u(0, 24).u(0, 24)
    si.u(8000, 20).u(channels - 1, 3).u(depth - 1, 5).u(B, 36)
    meta = si.bytes_() + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + len(meta).to_bytes(3, "big") + meta


def _const_sub(v, depth):
    def fn(w):
        w.u(0, 1).u(0, 6).u(0, 1)
        w.s(v, depth)

    return fn


class TestStereoAndLpc:
    @pytest.mark.parametrize("mode,code", [("ls", 8), ("rs", 9), ("ms", 10)])
    def test_stereo_decorrelation(self, mode, code):
        """Hand-built decorrelated frames reconstruct the (l, r) pair the
        encoder-side identities produce — side channels carry depth+1."""
        B = 8
        for l, r in ((100, 40), (-5, 9), (32767, -32768), (7, 7)):
            side = l - r
            if code == 8:
                subs = [_const_sub(l, 16), _const_sub(side, 17)]
            elif code == 9:
                subs = [_const_sub(side, 17), _const_sub(r, 16)]
            else:
                mid = (l + r) >> 1
                subs = [_const_sub(mid, 16), _const_sub(side, 17)]
            stream = _si(2, B) + _frame(code, subs, B)
            ch, _, out = parse_flac(stream)
            assert ch == 2
            assert (out[:, 0] == l).all() and (out[:, 1] == r).all(), (mode, l, r)

    def test_lpc_subframe(self):
        """Hand-built LPC order-2 subframe vs an explicit scalar replay."""
        B = 12
        warm = [500, 520]
        coefs = [3, -1]  # precision 4, shift 1: pred = (3*a - b) >> 1
        res = rng.integers(-8, 8, B - 2).tolist()

        def lpc(w):
            w.u(0, 1).u(32 + 1, 6).u(0, 1)  # LPC order 2 (type 100001)
            for v in warm:
                w.s(v, 16)
            w.u(3, 4)  # precision-1 -> 4 bits
            w.s(1, 5)  # shift
            for c in coefs:
                w.s(c, 4)
            w.u(0, 2).u(0, 4)  # RICE, 1 partition
            w.u(3, 4)
            for r in res:
                w.rice(r, 3)

        stream = _si(1, B) + _frame(0, [lpc], B)
        out = parse_flac(stream)[2][:, 0].tolist()
        exp = list(warm)
        for r in res:
            exp.append(((3 * exp[-1] - exp[-2]) >> 1) + r)
        assert out == exp

    def test_rice_partitions_and_escape(self):
        """Two partitions, the second escaped to raw 7-bit residuals."""
        B = 8
        res1 = [1, -2, 3]  # order-1: first partition has B/2 - 1
        res2 = [40, -50, 60, -63]

        def fx(w):
            w.u(0, 1).u(8 + 1, 6).u(0, 1)  # FIXED order 1
            w.s(9, 16)  # warmup
            w.u(0, 2).u(1, 4)  # RICE, partition order 1 (2 partitions)
            w.u(2, 4)
            for r in res1:
                w.rice(r, 2)
            w.u(15, 4)  # escape
            w.u(7, 5)
            for r in res2:
                w.s(r, 7)

        stream = _si(1, B) + _frame(0, [fx], B)
        out = parse_flac(stream)[2][:, 0].tolist()
        exp = [9]
        for r in res1 + res2:
            exp.append(exp[-1] + r)
        assert out == exp


class TestIntegrity:
    def test_crc8_and_crc16_enforced(self):
        stream = bytearray(build_flac([{"blocksize": 8, "subframes": [("constant", 1)]}]))
        body_off = 4 + 4 + 34
        hdr_crc_pos = body_off + 6  # 4 bytes fixed header + number + ... locate by flip
        # flip a bit in the frame header -> CRC-8 must catch it
        bad = bytearray(stream)
        bad[body_off + 4] ^= 0x01  # inside the coded number
        with pytest.raises(ValueError, match="CRC-8|sync|coded number"):
            parse_flac(bytes(bad))
        # flip a bit in the subframe payload -> CRC-16 must catch it
        bad2 = bytearray(stream)
        bad2[-3] ^= 0x10
        with pytest.raises(ValueError, match="CRC-16"):
            parse_flac(bytes(bad2))

    def test_malformed(self):
        with pytest.raises(ValueError, match="not a FLAC"):
            parse_flac(b"fLaX\x00\x00")
        good = build_flac([{"blocksize": 8, "subframes": [("constant", 1)]}])
        with pytest.raises(ValueError, match="truncated"):
            parse_flac(good[:20])

    def test_crc_anchors(self):
        """Published-polynomial anchors: CRC-8(0x07) and CRC-16(0x8005)
        of '123456789' are the classic check values."""
        assert _crc8(b"123456789") == 0xF4
        assert _crc16(b"123456789") == 0xFEE8  # CRC-16/BUYPASS check value


class TestSynth:
    def test_synth_closed_form(self):
        """Mirror of oracles.flac_decode_oracle and the attach expression."""
        from pgvectorscale_spark.operators.flac import attach_flac_payload  # noqa: F401

        B = FLAC_BLOCK
        for text in (b"a", b"flac doc"):
            nibs = [int(c, 16) for c in hashlib.md5(text).hexdigest()]
            v = 128 * (16 * nibs[0] + 8)
            s = 16 * nibs[1] + 8
            stream = build_flac(
                [
                    {"blocksize": B, "subframes": [("constant", v)]},
                    {"blocksize": B, "subframes": [("fixed", 1, [0], [s] * (B - 1), 6)]},
                ],
                rate=FLAC_RATE,
            )
            ch, rate, out = parse_flac(stream)
            assert (ch, rate, out.shape[0]) == (1, FLAC_RATE, 2 * B)
            assert abs(out.mean() - (v + 63 * s / 2.0) / 2.0) < 1e-9
            assert out[-1, 0] == 63 * s

    def test_attach_and_decode_spark(self, spark):
        from pgvectorscale_spark.operators.flac import (
            attach_flac_payload,
            decode_flac_audio,
        )

        df = spark.createDataFrame(
            [(i, f"flac {i}") for i in range(5)], "doc_id long, text string"
        )
        rows = {r["doc_id"]: r for r in decode_flac_audio(attach_flac_payload(df)).collect()}
        for i in range(5):
            nibs = [int(c, 16) for c in hashlib.md5(f"flac {i}".encode()).hexdigest()]
            v, s = 128 * (16 * nibs[0] + 8), 16 * nibs[1] + 8
            r = rows[i]
            assert (r["channels"], r["sample_rate"], r["n_samples"]) == (1, FLAC_RATE, 128)
            assert abs(r["mean_amp"] - (v + 63 * s / 2.0) / 2.0) < 1e-9
            assert r["last_amp"] == float(63 * s)
