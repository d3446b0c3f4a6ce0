"""H.264 I-frame pixel decode (operators/h264.py) vs an INDEPENDENT
test-side encoder + scalar reference predictors.

The encoder below re-implements the slice/MB syntax (bit writer, Exp-Golomb,
I_PCM alignment, 8.3.1.1 mode-prediction signaling, 9.2.1 nC tracking for
the zero coeff_token codes) from the spec text, in a different style from
the production decoder; the reference predictors are straightforward
per-pixel loops, independent from the production numpy forms.  Agreement
between the two sides is the correctness bar — same pattern as
tests/test_jpeg.py and tests/test_g711_adpcm.py.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pytest

from pgvectorscale_spark.operators.h264 import parse_h264_picture

rng = np.random.default_rng(0x264)


# --------------------------------------------------------------------------
# independent bit writer + parameter sets
# --------------------------------------------------------------------------


class W:
    def __init__(self):
        self.bits = []

    def u(self, v, n):
        self.bits += [(v >> i) & 1 for i in range(n - 1, -1, -1)]
        return self

    def ue(self, k):
        z = (k + 1).bit_length() - 1
        return self.u(0, z).u(k + 1, z + 1)

    def se(self, v):
        return self.ue(2 * v - 1 if v > 0 else -2 * v)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)
        return self

    def bytes_(self, data):
        self.align()
        for b in data:
            self.u(int(b), 8)
        return self

    def nal(self, header, stop=True):
        if stop:
            self.u(1, 1)
        self.align()
        raw = bytes(
            int("".join(map(str, self.bits[i : i + 8])), 2)
            for i in range(0, len(self.bits), 8)
        )
        out, zeros = bytearray([header]), 0
        for b in raw:
            if zeros >= 2 and b <= 3:
                out.append(3)
                zeros = 0
            out.append(b)
            zeros = zeros + 1 if b == 0 else 0
        return bytes(out)


def annexb(*nals):
    out = b""
    for i, n in enumerate(nals):
        out += (b"\x00\x00\x00\x01" if i == 0 else b"\x00\x00\x01") + n
    return out


def make_sps(w_mbs, h_mbs, crop=(0, 0, 0, 0)):
    w = W()
    w.u(66, 8).u(0, 8).u(20, 8)
    w.ue(0)  # sps_id
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(0)  # poc_type
    w.ue(0)  # log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)
    w.ue(w_mbs - 1).ue(h_mbs - 1)
    w.u(1, 1)  # frame_mbs_only
    w.u(1, 1)  # direct_8x8_inference
    if any(crop):
        w.u(1, 1)
        for c in crop:
            w.ue(c)
    else:
        w.u(0, 1)
    w.u(0, 1)  # no VUI
    return w.nal(0x67)


def make_pps(cabac=False, deblock_control=True):
    w = W()
    w.ue(0).ue(0)
    w.u(1 if cabac else 0, 1)
    w.u(0, 1)
    w.ue(0)  # one slice group
    w.ue(0).ue(0)
    w.u(0, 1).u(0, 2)
    w.se(0).se(0).se(0)
    w.u(1 if deblock_control else 0, 1)
    w.u(0, 1).u(0, 1)
    return w.nal(0x68)


# --------------------------------------------------------------------------
# independent encoder over per-MB specs
# --------------------------------------------------------------------------
# spec forms: ("pcm", y16x16, cb8x8, cr8x8) | ("i16", pred, chroma)
#           | ("i4", [16 modes], chroma)


class _Track:
    """Encoder-side bookkeeping: per-4x4 TotalCoeff (0, or 16 for PCM) and
    per-block i4 modes, with slice ids — an independent 9.2.1/8.3.1.1."""

    def __init__(self, w_mbs, h_mbs):
        self.w, self.h = w_mbs, h_mbs
        self.kind = {}  # (mbx,mby) -> 'pcm'|'i16'|'i4'
        self.slice = {}
        self.modes = {}  # (mbx,mby) -> [16]

    def blk_tc(self, gx, gy, sl):
        mb = (gx // 4, gy // 4)
        if gx < 0 or gy < 0 or mb not in self.kind or self.slice[mb] != sl:
            return None
        return 16 if self.kind[mb] == "pcm" else 0

    def nC(self, mbx, mby, blk, sl):
        bx = 2 * ((blk >> 2) & 1) + (blk & 1)
        by = 2 * ((blk >> 3) & 1) + ((blk >> 1) & 1)
        gx, gy = 4 * mbx + bx, 4 * mby + by
        # within-MB earlier blocks have tc 0 (never PCM mid-MB)
        def at(x, y):
            if (x // 4, y // 4) == (mbx, mby):
                return 0
            return self.blk_tc(x, y, sl)

        a, b = at(gx - 1, gy) if gx > 0 else None, at(gx, gy - 1) if gy > 0 else None
        if a is not None and b is not None:
            return (a + b + 1) >> 1
        return a if a is not None else (b if b is not None else 0)

    def pred_mode4(self, mbx, mby, blk, sl, cur_modes):
        bx = 2 * ((blk >> 2) & 1) + (blk & 1)
        by = 2 * ((blk >> 3) & 1) + ((blk >> 1) & 1)
        gx, gy = 4 * mbx + bx, 4 * mby + by

        def mode_at(x, y):
            if x < 0 or y < 0:
                return 2
            mb = (x // 4, y // 4)
            if mb == (mbx, mby):
                i = {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3,
                     (2, 0): 4, (3, 0): 5, (2, 1): 6, (3, 1): 7,
                     (0, 2): 8, (1, 2): 9, (0, 3): 10, (1, 3): 11,
                     (2, 2): 12, (3, 2): 13, (2, 3): 14, (3, 3): 15}[(x % 4, y % 4)]
                return cur_modes[i] if cur_modes[i] is not None else 2
            if mb not in self.kind or self.slice[mb] != sl or self.kind[mb] != "i4":
                return 2
            return self.modes[mb][
                {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3,
                 (2, 0): 4, (3, 0): 5, (2, 1): 6, (3, 1): 7,
                 (0, 2): 8, (1, 2): 9, (0, 3): 10, (1, 3): 11,
                 (2, 2): 12, (3, 2): 13, (2, 3): 14, (3, 3): 15}[(x % 4, y % 4)]
            ]

        return min(mode_at(gx - 1, gy), mode_at(gx, gy - 1))


def _zero_token(w, nC):
    if nC == -1:
        w.u(0b01, 2)
    elif nC < 2:
        w.u(1, 1)
    elif nC < 4:
        w.u(0b11, 2)
    elif nC < 8:
        w.u(0b1111, 4)
    else:
        w.u(0b000011, 6)


def encode_picture(w_mbs, h_mbs, mb_specs, slice_starts=(0,), crop=(0, 0, 0, 0),
                   deblock_idc=1, slice_nal_types=None):
    """Encode a full I picture as Annex-B SPS+PPS+slice NALs."""
    track = _Track(w_mbs, h_mbs)
    nals = [make_sps(w_mbs, h_mbs, crop), make_pps()]
    n_mbs = w_mbs * h_mbs
    bounds = list(slice_starts) + [n_mbs]
    for si in range(len(slice_starts)):
        nal_type = (slice_nal_types or [5] * len(slice_starts))[si]
        w = W()
        w.ue(bounds[si])  # first_mb_in_slice
        w.ue(7)  # slice_type I
        w.ue(0)  # pps_id
        w.u(0, 4)  # frame_num
        if nal_type == 5:
            w.ue(0)  # idr_pic_id
        w.u(0, 4)  # pic_order_cnt_lsb
        if nal_type == 5:
            w.u(0, 1).u(0, 1)
        else:
            w.u(0, 1)  # adaptive_ref_pic_marking_mode_flag
        w.se(0)  # slice_qp_delta
        w.ue(deblock_idc)
        for addr in range(bounds[si], bounds[si + 1]):
            mbx, mby = addr % w_mbs, addr // w_mbs
            spec = mb_specs[addr]
            if spec[0] == "pcm":
                w.ue(25)
                w.bytes_(bytes(spec[1].reshape(-1)))
                w.bytes_(bytes(spec[2].reshape(-1)))
                w.bytes_(bytes(spec[3].reshape(-1)))
                track.kind[(mbx, mby)] = "pcm"
            elif spec[0] == "i16":
                _, pred, chroma = spec
                w.ue(1 + pred)  # cbp (0,0)
                w.ue(chroma)
                w.se(0)  # mb_qp_delta
                track.kind[(mbx, mby)] = "i16"
                track.slice[(mbx, mby)] = si
                _zero_token(w, track.nC(mbx, mby, 0, si))
            else:  # i4
                _, modes, chroma = spec
                track.kind[(mbx, mby)] = "i4"
                track.slice[(mbx, mby)] = si
                track.modes[(mbx, mby)] = modes
                w.ue(0)
                cur = [None] * 16
                for blk in range(16):
                    pm = track.pred_mode4(mbx, mby, blk, si, cur)
                    if modes[blk] == pm:
                        w.u(1, 1)
                    else:
                        w.u(0, 1)
                        w.u(modes[blk] - (1 if modes[blk] > pm else 0), 3)
                    cur[blk] = modes[blk]
                w.ue(chroma)
                w.ue(3)  # coded_block_pattern me(v): codeNum 3 -> cbp 0
            track.slice[(mbx, mby)] = si
        nals.append(w.nal(0x65 if nal_type == 5 else 0x41))
    return annexb(*nals)


# --------------------------------------------------------------------------
# independent scalar reference predictors + reference decode
# --------------------------------------------------------------------------


def _clip(v):
    return max(0, min(255, v))


def ref_pred16(Y, mx, my, mode, l_ok, t_ok, tl_ok):
    out = np.zeros((16, 16), int)
    if mode == 0:
        for y in range(16):
            for x in range(16):
                out[y, x] = Y[my - 1, mx + x]
    elif mode == 1:
        for y in range(16):
            for x in range(16):
                out[y, x] = Y[my + y, mx - 1]
    elif mode == 2:
        if t_ok and l_ok:
            dc = (sum(Y[my - 1, mx + i] for i in range(16))
                  + sum(Y[my + i, mx - 1] for i in range(16)) + 16) // 32
        elif l_ok:
            dc = (sum(Y[my + i, mx - 1] for i in range(16)) + 8) // 16
        elif t_ok:
            dc = (sum(Y[my - 1, mx + i] for i in range(16)) + 8) // 16
        else:
            dc = 128
        out[:, :] = dc
    else:
        Hs = sum((x + 1) * (int(Y[my - 1, mx + 8 + x]) - int(Y[my - 1, mx + 6 - x]))
                 for x in range(8))
        Vs = sum((y + 1) * (int(Y[my + 8 + y, mx - 1]) - int(Y[my + 6 - y, mx - 1]))
                 for y in range(8))
        a = 16 * (int(Y[my + 15, mx - 1]) + int(Y[my - 1, mx + 15]))
        b, c = (5 * Hs + 32) >> 6, (5 * Vs + 32) >> 6
        for y in range(16):
            for x in range(16):
                out[y, x] = _clip((a + b * (x - 7) + c * (y - 7) + 16) >> 5)
    return out


def ref_pred_chroma(P, cx, cy, mode, l_ok, t_ok, tl_ok):
    out = np.zeros((8, 8), int)
    if mode == 0:
        for yo in (0, 4):
            for xo in (0, 4):
                t = sum(int(P[cy - 1, cx + xo + i]) for i in range(4)) if t_ok else None
                l = sum(int(P[cy + yo + i, cx - 1]) for i in range(4)) if l_ok else None
                if (xo, yo) in ((0, 0), (4, 4)):
                    if t is not None and l is not None:
                        dc = (t + l + 4) >> 3
                    elif t is not None:
                        dc = (t + 2) >> 2
                    elif l is not None:
                        dc = (l + 2) >> 2
                    else:
                        dc = 128
                elif (xo, yo) == (4, 0):
                    dc = (t + 2) >> 2 if t is not None else ((l + 2) >> 2 if l is not None else 128)
                else:  # (0, 4)
                    dc = (l + 2) >> 2 if l is not None else ((t + 2) >> 2 if t is not None else 128)
                out[yo : yo + 4, xo : xo + 4] = dc
    elif mode == 1:
        for y in range(8):
            out[y, :] = P[cy + y, cx - 1]
    elif mode == 2:
        for x in range(8):
            out[:, x] = P[cy - 1, cx + x]
    else:
        Hs = sum((x + 1) * (int(P[cy - 1, cx + 4 + x]) - int(P[cy - 1, cx + 2 - x]))
                 for x in range(4))
        Vs = sum((y + 1) * (int(P[cy + 4 + y, cx - 1]) - int(P[cy + 2 - y, cx - 1]))
                 for y in range(4))
        a = 16 * (int(P[cy + 7, cx - 1]) + int(P[cy - 1, cx + 7]))
        b, c = (34 * Hs + 32) >> 6, (34 * Vs + 32) >> 6
        for y in range(8):
            for x in range(8):
                out[y, x] = _clip((a + b * (x - 3) + c * (y - 3) + 16) >> 5)
    return out


def ref_pred4(Y, bx, by, mode, l_ok, t_ok, tl_ok, tr_ok):
    """Per-pixel 8.3.1.2 with explicit neighbor arrays."""
    p_t = [int(Y[by - 1, bx + i]) for i in range(4)] if t_ok else [0] * 4
    if t_ok and tr_ok:
        p_tr = [int(Y[by - 1, bx + 4 + i]) for i in range(4)]
    elif t_ok:
        p_tr = [p_t[3]] * 4
    else:
        p_tr = [0] * 4
    top = p_t + p_tr
    left = [int(Y[by + i, bx - 1]) for i in range(4)] if l_ok else [0] * 4
    tl = int(Y[by - 1, bx - 1]) if tl_ok else 0
    out = np.zeros((4, 4), int)
    for y in range(4):
        for x in range(4):
            if mode == 0:
                v = top[x]
            elif mode == 1:
                v = left[y]
            elif mode == 2:
                if t_ok and l_ok:
                    v = (sum(top[:4]) + sum(left) + 4) >> 3
                elif l_ok:
                    v = (sum(left) + 2) >> 2
                elif t_ok:
                    v = (sum(top[:4]) + 2) >> 2
                else:
                    v = 128
            elif mode == 3:
                if x == 3 and y == 3:
                    v = (top[6] + 3 * top[7] + 2) >> 2
                else:
                    v = (top[x + y] + 2 * top[x + y + 1] + top[x + y + 2] + 2) >> 2
            elif mode == 4:
                if x > y:
                    v = (top[x - y - 2] + 2 * top[x - y - 1] + top[x - y] + 2) >> 2
                elif x < y:
                    v = (left[y - x - 2] + 2 * left[y - x - 1] + left[y - x] + 2) >> 2
                else:
                    v = (top[0] + 2 * tl + left[0] + 2) >> 2
                # x-y-2 == -1 / y-x-2 == -1 touch the corner sample
                if x == y + 1:
                    v = (tl + 2 * top[0] + top[1] + 2) >> 2
                if y == x + 1:
                    v = (tl + 2 * left[0] + left[1] + 2) >> 2
            elif mode == 5:
                z = 2 * x - y
                t_ext = [tl] + top  # t_ext[i] = p[i-1, -1]
                if z >= 0 and z % 2 == 0:
                    v = (t_ext[x - (y >> 1)] + t_ext[x - (y >> 1) + 1] + 1) >> 1
                elif z >= 0:
                    v = (t_ext[x - (y >> 1) - 1] + 2 * t_ext[x - (y >> 1)]
                         + t_ext[x - (y >> 1) + 1] + 2) >> 2
                elif z == -1:
                    v = (left[0] + 2 * tl + top[0] + 2) >> 2
                else:
                    lx = [tl] + left  # lx[i] = p[-1, i-1]
                    v = (lx[y] + 2 * lx[y - 1] + lx[y - 2] + 2) >> 2
            elif mode == 6:
                z = 2 * y - x
                l_ext = [tl] + left
                if z >= 0 and z % 2 == 0:
                    v = (l_ext[y - (x >> 1)] + l_ext[y - (x >> 1) + 1] + 1) >> 1
                elif z >= 0:
                    v = (l_ext[y - (x >> 1) - 1] + 2 * l_ext[y - (x >> 1)]
                         + l_ext[y - (x >> 1) + 1] + 2) >> 2
                elif z == -1:
                    v = (top[0] + 2 * tl + left[0] + 2) >> 2
                else:
                    tx = [tl] + top  # tx[i] = p[i-1, -1]
                    v = (tx[x] + 2 * tx[x - 1] + tx[x - 2] + 2) >> 2
            elif mode == 7:
                i = x + (y >> 1)
                if y % 2 == 0:
                    v = (top[i] + top[i + 1] + 1) >> 1
                else:
                    v = (top[i] + 2 * top[i + 1] + top[i + 2] + 2) >> 2
            else:  # mode 8
                z = x + 2 * y
                if z > 5:
                    v = left[3]
                elif z == 5:
                    v = (left[2] + 3 * left[3] + 2) >> 2
                elif z % 2 == 0:
                    v = (left[y + (x >> 1)] + left[y + (x >> 1) + 1] + 1) >> 1
                else:
                    v = (left[y + (x >> 1)] + 2 * left[y + (x >> 1) + 1]
                         + left[y + (x >> 1) + 2] + 2) >> 2
            out[y, x] = v
    return out


_BX = [2 * ((i >> 2) & 1) + (i & 1) for i in range(16)]
_BY = [2 * ((i >> 3) & 1) + ((i >> 1) & 1) for i in range(16)]


def ref_decode(w_mbs, h_mbs, mb_specs, slice_starts=(0,)):
    """Reference reconstruction: per-pixel predictors, explicit raster/
    6.4.3 ordering and slice-aware availability."""
    Y = np.zeros((16 * h_mbs, 16 * w_mbs), int)
    Cb = np.zeros((8 * h_mbs, 8 * w_mbs), int)
    Cr = np.zeros((8 * h_mbs, 8 * w_mbs), int)
    bounds = list(slice_starts) + [w_mbs * h_mbs]
    slice_of = {}
    decoded = set()
    for si in range(len(slice_starts)):
        for addr in range(bounds[si], bounds[si + 1]):
            slice_of[(addr % w_mbs, addr // w_mbs)] = si
    kind = {}
    for addr, spec in enumerate(mb_specs):
        mbx, mby = addr % w_mbs, addr // w_mbs
        si = slice_of[(mbx, mby)]
        mx, my, cx, cy = 16 * mbx, 16 * mby, 8 * mbx, 8 * mby

        def mb_ok(x, y):
            return (x, y) in decoded and slice_of[(x, y)] == si

        l_ok, t_ok, tl_ok = mb_ok(mbx - 1, mby), mb_ok(mbx, mby - 1), mb_ok(mbx - 1, mby - 1)
        if spec[0] == "pcm":
            Y[my : my + 16, mx : mx + 16] = spec[1]
            Cb[cy : cy + 8, cx : cx + 8] = spec[2]
            Cr[cy : cy + 8, cx : cx + 8] = spec[3]
        elif spec[0] == "i16":
            Y[my : my + 16, mx : mx + 16] = ref_pred16(Y, mx, my, spec[1], l_ok, t_ok, tl_ok)
            Cb[cy : cy + 8, cx : cx + 8] = ref_pred_chroma(Cb, cx, cy, spec[2], l_ok, t_ok, tl_ok)
            Cr[cy : cy + 8, cx : cx + 8] = ref_pred_chroma(Cr, cx, cy, spec[2], l_ok, t_ok, tl_ok)
        else:
            blk_index = {(_BX[i], _BY[i]): i for i in range(16)}
            for blk in range(16):
                bx, by = mx + 4 * _BX[blk], my + 4 * _BY[blk]
                gx, gy = 4 * mbx + _BX[blk], 4 * mby + _BY[blk]

                def b_ok(nx, ny):
                    if nx < 0 or ny < 0 or nx >= 4 * w_mbs:
                        return False
                    nmb = (nx // 4, ny // 4)
                    if nmb == (mbx, mby):
                        return blk_index[(nx % 4, ny % 4)] < blk
                    return mb_ok(*nmb)

                Y[by : by + 4, bx : bx + 4] = ref_pred4(
                    Y, bx, by, spec[1][blk],
                    b_ok(gx - 1, gy), b_ok(gx, gy - 1),
                    b_ok(gx - 1, gy - 1), b_ok(gx + 1, gy - 1),
                )
            Cb[cy : cy + 8, cx : cx + 8] = ref_pred_chroma(Cb, cx, cy, spec[2], l_ok, t_ok, tl_ok)
            Cr[cy : cy + 8, cx : cx + 8] = ref_pred_chroma(Cr, cx, cy, spec[2], l_ok, t_ok, tl_ok)
        decoded.add((mbx, mby))
        kind[(mbx, mby)] = spec[0]
    return Y, Cb, Cr


def _rand_pcm():
    return (
        rng.integers(0, 256, (16, 16)).astype(np.uint8),
        rng.integers(0, 256, (8, 8)).astype(np.uint8),
        rng.integers(0, 256, (8, 8)).astype(np.uint8),
    )


def _check(stream, w_mbs, h_mbs, specs, slice_starts=(0,)):
    w, h, Y, Cb, Cr, _ = parse_h264_picture(stream)
    assert (w, h) == (16 * w_mbs, 16 * h_mbs)
    eY, eCb, eCr = ref_decode(w_mbs, h_mbs, specs, slice_starts)
    np.testing.assert_array_equal(Y.astype(int), eY)
    np.testing.assert_array_equal(Cb.astype(int), eCb)
    np.testing.assert_array_equal(Cr.astype(int), eCr)


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------


class TestPcm:
    def test_pcm_roundtrip_exact(self):
        """I_PCM content round-trips bit-exactly — including bytes 0x00-0x03
        that force emulation-prevention escapes inside the PCM payload."""
        specs = []
        for i in range(4):
            y, cb, cr = _rand_pcm()
            y[0, :8] = [0, 0, 1, 0, 0, 2, 0, 3]  # EP-pattern bytes
            specs.append(("pcm", y, cb, cr))
        stream = encode_picture(2, 2, specs)
        w, h, Y, Cb, Cr, n = parse_h264_picture(stream)
        assert (w, h, n) == (32, 32, 3)
        for addr, (_, ey, ecb, ecr) in enumerate(specs):
            mbx, mby = addr % 2, addr // 2
            np.testing.assert_array_equal(Y[16 * mby : 16 * mby + 16, 16 * mbx : 16 * mbx + 16], ey)
            np.testing.assert_array_equal(Cb[8 * mby : 8 * mby + 8, 8 * mbx : 8 * mbx + 8], ecb)
            np.testing.assert_array_equal(Cr[8 * mby : 8 * mby + 8, 8 * mbx : 8 * mbx + 8], ecr)


class TestI16:
    @pytest.mark.parametrize("pred,chroma", [(0, 2), (1, 1), (2, 0), (3, 3)])
    def test_i16_modes_vs_reference(self, pred, chroma):
        """Each I_16x16 luma mode + each chroma mode, predicted from random
        I_PCM neighbors, matches the per-pixel reference."""
        specs = [("pcm", *_rand_pcm()) for _ in range(3)] + [("i16", pred, chroma)]
        _check(encode_picture(2, 2, specs), 2, 2, specs)

    def test_i16_dc_partial_neighbors(self):
        """DC with only-top, only-left and no neighbors (first MB)."""
        specs = [("i16", 2, 0), ("i16", 2, 0), ("i16", 2, 0), ("pcm", *_rand_pcm())]
        _check(encode_picture(2, 2, specs), 2, 2, specs)

    def test_i16_grid_mixed(self):
        """3x3 grid mixing PCM and all four I_16x16 modes — full-frame
        equality against the reference decode."""
        specs = [
            ("pcm", *_rand_pcm()), ("pcm", *_rand_pcm()), ("pcm", *_rand_pcm()),
            ("i16", 0, 2), ("i16", 3, 3), ("i16", 1, 1),
            ("i16", 2, 0), ("i16", 2, 3), ("i16", 3, 2),
        ]
        _check(encode_picture(3, 3, specs), 3, 3, specs)


class TestI4:
    def test_i4_all_nine_modes_vs_reference(self):
        """All nine 4x4 modes inside one MB with random PCM neighbors on
        both sides (top/left), exercising in-MB reconstruction order and
        above-right availability/substitution."""
        modes = [2, 0, 1, 2, 3, 4, 5, 6, 7, 8, 3, 5, 4, 6, 8, 7]
        specs = [
            ("pcm", *_rand_pcm()), ("pcm", *_rand_pcm()),
            ("pcm", *_rand_pcm()), ("i4", modes, 0),
        ]
        _check(encode_picture(2, 2, specs), 2, 2, specs)

    def test_i4_first_mb_dc_only(self):
        """I_4x4 with no neighbors: every mode that survives is DC (128)."""
        specs = [("i4", [2] * 16, 0)]
        stream = encode_picture(1, 1, specs)
        _, _, Y, Cb, Cr, _ = parse_h264_picture(stream)
        assert (Y == 128).all() and (Cb == 128).all() and (Cr == 128).all()

    def test_i4_mode_prediction_signaling(self):
        """Adjacent I_4x4 MBs: the second MB's mode predictor derives from
        the first MB's modes across the MB boundary (8.3.1.1)."""
        # MB2 sits at the left picture edge: its x4==0 blocks avoid the
        # left-needing modes; MB3 has full neighbors (left=MB2 i4, top=PCM)
        specs = [
            ("pcm", *_rand_pcm()), ("pcm", *_rand_pcm()),
            ("i4", [2, 0, 3, 4, 5, 7, 6, 8, 0, 1, 2, 8, 3, 4, 5, 6], 2),
            ("i4", [1, 0, 2, 3, 4, 5, 6, 7, 8, 0, 1, 2, 3, 4, 5, 6], 2),
        ]
        _check(encode_picture(2, 2, specs), 2, 2, specs)


class TestSlices:
    def test_multi_slice_availability(self):
        """Two slices: the second slice's first MB must NOT predict from the
        first slice's pixels (DC falls back to 128 despite a decoded MB
        above)."""
        y = np.full((16, 16), 200, np.uint8)
        c = np.full((8, 8), 50, np.uint8)
        specs = [("pcm", y, c, c), ("i16", 2, 0)]
        stream = encode_picture(1, 2, specs, slice_starts=(0, 1))
        _, _, Y, Cb, Cr, _ = parse_h264_picture(stream)
        assert (Y[16:] == 128).all() and (Cb[8:] == 128).all()
        # sanity: same picture in ONE slice predicts 200/50 from above
        stream1 = encode_picture(1, 2, specs)
        _, _, Y1, Cb1, _, _ = parse_h264_picture(stream1)
        assert (Y1[16:] == 200).all() and (Cb1[8:] == 50).all()

    def test_multi_slice_reference_parity(self):
        """2x2 picture split into two slices of one MB row each."""
        # slice 2 covers the bottom MB row: its MBs must not predict from
        # the top row, so the i4 MB at (1,1) only uses left/DC-safe modes
        specs = [
            ("pcm", *_rand_pcm()), ("i16", 1, 1),
            ("i16", 2, 0), ("i4", [1, 1, 2, 8, 1, 2, 8, 1, 2, 8, 1, 2, 8, 1, 1, 2], 0),
        ]
        stream = encode_picture(2, 2, specs, slice_starts=(0, 2))
        _check(stream, 2, 2, specs, slice_starts=(0, 2))

    def test_multi_picture_stream(self):
        """Two all-intra pictures in one stream decode independently —
        picture 2 must NOT predict from picture 1's pixels, and
        parse_h264_picture returns picture 1."""
        from pgvectorscale_spark.operators.h264 import (
            parse_h264_picture,
            parse_h264_stream,
        )

        specs1 = [("pcm", *_rand_pcm()), ("pcm", *_rand_pcm())]
        specs2 = [("pcm", *_rand_pcm()), ("i16", 2, 0)]  # DC from pic2's own MB0
        s1 = encode_picture(1, 2, specs1)
        s2 = encode_picture(1, 2, specs2)
        from pgvectorscale_spark.operators.h264 import split_annexb_nals

        nals1, nals2 = split_annexb_nals(s1), split_annexb_nals(s2)
        stream = annexb(nals1[0], nals1[1], nals1[2], nals2[2])
        w, h, pics, n = parse_h264_stream(stream)
        assert (w, h, len(pics), n) == (16, 32, 2, 4)
        np.testing.assert_array_equal(pics[0][0][:16], specs1[0][1])
        np.testing.assert_array_equal(pics[1][0][:16], specs2[0][1])
        # pic2 MB1 is DC-predicted from pic2's MB0 bottom row, not pic1
        exp_dc = (int(specs2[0][1][15].astype(int).sum()) + 8) >> 4
        assert (pics[1][0][16:] == exp_dc).all()
        first = parse_h264_picture(stream)
        np.testing.assert_array_equal(first[2], pics[0][0])

    def test_incomplete_picture_before_next_raises(self):
        from pgvectorscale_spark.operators.h264 import (
            parse_h264_stream,
            split_annexb_nals,
        )

        # a 1x2 picture whose slice covers 1 MB, followed by a new picture
        one_mb = encode_picture(1, 1, [("i16", 2, 0)])
        nals = split_annexb_nals(one_mb)
        bad = annexb(make_sps(1, 2), nals[1], nals[2], nals[2])
        with pytest.raises(ValueError, match="not fully covered"):
            parse_h264_stream(bad)

    def test_non_idr_i_slice(self):
        """nal type 1 I slices (non-IDR) parse the dec_ref_pic_marking
        branch."""
        specs = [("pcm", *_rand_pcm()), ("i16", 2, 0)]
        stream = encode_picture(1, 2, specs, slice_starts=(0, 1),
                                slice_nal_types=[5, 1])
        _, _, Y, _, _, _ = parse_h264_picture(stream)
        assert Y.shape == (32, 16)


class TestFraming:
    def test_cropping(self):
        specs = [("pcm", *_rand_pcm()) for _ in range(2)]
        stream = encode_picture(2, 1, specs, crop=(1, 2, 1, 1))
        w, h, Y, Cb, Cr, _ = parse_h264_picture(stream)
        assert (w, h) == (32 - 2 * 3, 16 - 2 * 2)
        assert Y.shape == (h, w) and Cb.shape == (h // 2, w // 2)
        full = np.hstack([specs[0][1], specs[1][1]])
        np.testing.assert_array_equal(Y, full[2 : 2 + h, 2 : 2 + w])

    def test_meta_parser_agrees(self):
        from pgvectorscale_spark.operators.multimodal import parse_h264_meta

        specs = [("pcm", *_rand_pcm())]
        stream = encode_picture(1, 1, specs)
        _, _, w_m, h_m, n_m = parse_h264_meta(stream)
        w, h, _, _, _, n = parse_h264_picture(stream)
        assert (w, h, n) == (w_m, h_m, n_m)


class TestGates:
    def _slice_stream(self, **pps_kw):
        specs = [("i16", 2, 0)]
        stream = encode_picture(1, 1, specs)
        return stream

    def test_cabac_gated(self):
        nals = [make_sps(1, 1), make_pps(cabac=True)]
        with pytest.raises(NotImplementedError, match="CABAC"):
            parse_h264_picture(annexb(*nals, b"\x65\x88"))

    def test_inter_slices_gated(self):
        w = W()
        w.ue(0).ue(5)  # slice_type P
        nals = [make_sps(1, 1), make_pps(), w.nal(0x65)]
        with pytest.raises(NotImplementedError, match="I slices"):
            parse_h264_picture(annexb(*nals))

    def test_deblocking_enabled_gated(self):
        specs = [("i16", 2, 0)]
        stream = encode_picture(1, 1, specs, deblock_idc=0)
        with pytest.raises(NotImplementedError, match="deblocking"):
            parse_h264_picture(stream)

    def test_nonzero_residual_gated(self):
        """An I_16x16 DC coeff_token of '01' (TotalCoeff 1) gates."""
        w = W()
        w.ue(0).ue(7).ue(0)
        w.u(0, 4)
        w.ue(0)
        w.u(0, 4)
        w.u(0, 1).u(0, 1)
        w.se(0)
        w.ue(1)
        w.ue(1)  # I_16x16 Vertical... but first MB has no top; use DC
        w.bits[-3:] = []  # rewrite: drop ue(1), write ue(3) = DC mode
        w.ue(3)
        w.ue(0)
        w.se(0)
        w.u(0b01, 2)  # coeff_token TotalCoeff=1 at nC=0
        nals = [make_sps(1, 1), make_pps(), w.nal(0x65)]
        with pytest.raises(NotImplementedError, match="residual levels"):
            parse_h264_picture(annexb(*nals))

    def test_missing_parameter_sets(self):
        with pytest.raises(ValueError, match="no SPS"):
            parse_h264_picture(annexb(b"\x65\x88\x80"))
        with pytest.raises(ValueError, match="no PPS"):
            parse_h264_picture(annexb(make_sps(1, 1), b"\x65\x88\x80"))

    def test_undercovered_picture(self):
        """A slice that stops before covering the picture raises."""
        specs = [("i16", 2, 0)]
        stream = encode_picture(1, 1, specs)
        # reuse the 1x1 slice NAL against a 1x2 SPS
        from pgvectorscale_spark.operators.h264 import split_annexb_nals

        parts = split_annexb_nals(stream)
        bad = annexb(make_sps(1, 2), parts[1], parts[2])
        with pytest.raises(ValueError, match="not fully covered"):
            parse_h264_picture(bad)


class TestGenerative:
    def test_random_mb_grids_match_reference(self):
        """Hypothesis-style generative sweep (fixed rng for determinism):
        random W x H grids mixing I_PCM / I_16x16 / I_4x4 with
        availability-valid modes, one and two slices — encode with the
        independent test encoder, decode, compare to the per-pixel
        reference."""
        g = np.random.default_rng(0xC0DEC)
        for trial in range(12):
            w_mbs = int(g.integers(1, 4))
            h_mbs = int(g.integers(1, 4))
            specs = []
            for addr in range(w_mbs * h_mbs):
                mbx, mby = addr % w_mbs, addr // w_mbs
                kind = int(g.integers(0, 3))
                if kind == 0:
                    specs.append((
                        "pcm",
                        g.integers(0, 256, (16, 16)).astype(np.uint8),
                        g.integers(0, 256, (8, 8)).astype(np.uint8),
                        g.integers(0, 256, (8, 8)).astype(np.uint8),
                    ))
                    continue
                # availability-safe mode pools (single slice, raster order)
                has_l, has_t = mbx > 0, mby > 0
                has_tl = has_l and has_t
                if kind == 1:  # i16
                    pool = [2]
                    if has_t:
                        pool.append(0)
                    if has_l:
                        pool.append(1)
                    if has_tl:
                        pool.append(3)
                    cpool = [0]
                    if has_t:
                        cpool.append(2)
                    if has_l:
                        cpool.append(1)
                    if has_tl:
                        cpool.append(3)
                    specs.append((
                        "i16",
                        int(g.choice(pool)),
                        int(g.choice(cpool)),
                    ))
                else:  # i4: per-block pools from block-level availability
                    modes = []
                    for blk in range(16):
                        bx = 2 * ((blk >> 2) & 1) + (blk & 1)
                        by = 2 * ((blk >> 3) & 1) + ((blk >> 1) & 1)
                        b_l = has_l or bx > 0
                        b_t = has_t or by > 0
                        b_tl = (b_l and b_t) and (has_tl or (bx > 0 and by > 0)
                                                  or (bx > 0 and has_t)
                                                  or (by > 0 and has_l))
                        pool = [2]
                        if b_t:
                            pool += [0, 3, 7]
                        if b_l:
                            pool += [1, 8]
                        if b_l and b_t and b_tl:
                            pool += [4, 5, 6]
                        modes.append(int(g.choice(pool)))
                    cpool = [0]
                    if has_t:
                        cpool.append(2)
                    if has_l:
                        cpool.append(1)
                    if has_tl:
                        cpool.append(3)
                    specs.append(("i4", modes, int(g.choice(cpool))))
            # sometimes split into two slices at a random MB-row boundary;
            # slice-2 MBs then lose cross-boundary neighbors, so only keep
            # the split when every affected MB stays availability-valid
            slice_starts = (0,)
            if h_mbs > 1 and g.integers(0, 2) and all(
                s[0] == "pcm" or (s[0] == "i16" and s[1] == 2 and s[2] == 0)
                or (s[0] == "i4" and all(m == 2 for m in s[1]) and s[2] == 0)
                for s in specs
            ):
                slice_starts = (0, int(g.integers(1, h_mbs)) * w_mbs)
            stream = encode_picture(w_mbs, h_mbs, specs, slice_starts=slice_starts)
            _check(stream, w_mbs, h_mbs, specs, slice_starts=slice_starts)


class TestSynthAndSpark:
    def test_synth_closed_form(self):
        """The JVM-synth layout decodes to the digest closed form the
        DuckDB oracle replays (mirrors oracles.h264_decode_oracle)."""
        from pgvectorscale_spark.operators.h264 import _synth_fixed_parts

        prefix_hex, suffix_hex = _synth_fixed_parts()
        for text in (b"a", b"doc 42", b"\xe2\x82\xac utf8"):
            nibs = [int(c, 16) for c in hashlib.md5(text).hexdigest()]
            rowA = bytes(16 * n + 8 for n in nibs[:16])
            rowB = bytes(16 * n + 8 for n in nibs[16:])
            payload = bytes.fromhex(prefix_hex) + (rowA + rowB) * 8 + bytes.fromhex(suffix_hex)
            from pgvectorscale_spark.operators.h264 import parse_h264_stream

            w, h, pics, n = parse_h264_stream(payload)
            assert (w, h, n, len(pics)) == (16, 32, 4, 2)
            Y, Cb, Cr = pics[0]
            Y2, Cb2, Cr2 = pics[1]
            assert (Y2 == 128).all() and (Cb2 == 128).all() and (Cr2 == 128).all()
            sA, sB = sum(nibs[:16]), sum(nibs[16:])
            assert Y[0, 0] == 16 * nibs[0] + 8
            assert Y[-1, -1] == 16 * nibs[31] + 8
            assert abs(Y.mean() - (128 * sA + 384 * sB + 4096) / 512) < 1e-12
            assert (Cb == 128).all() and (Cr == 128).all()

    def test_attach_and_decode_spark(self, spark):
        from pgvectorscale_spark.operators.h264 import (
            attach_h264_payload,
            decode_h264_picture,
        )

        df = spark.createDataFrame(
            [(i, f"document {i}") for i in range(6)], "doc_id long, text string"
        )
        rows = {r["doc_id"]: r for r in decode_h264_picture(attach_h264_payload(df)).collect()}
        assert len(rows) == 6
        for i in range(6):
            nibs = [int(c, 16) for c in hashlib.md5(f"document {i}".encode()).hexdigest()]
            sA, sB = sum(nibs[:16]), sum(nibs[16:])
            r = rows[i]
            assert (
                r["width"], r["height"], r["n_mbs"], r["n_pictures"], r["n_nal_units"]
            ) == (16, 32, 2, 2, 4)
            assert r["y00"] == 16 * nibs[0] + 8 and r["y_last"] == 16 * nibs[31] + 8
            assert abs(r["mean_y"] - (128 * sA + 384 * sB + 4096) / 512) < 1e-9
            assert r["mean_cb"] == 128.0 and r["mean_cr"] == 128.0
