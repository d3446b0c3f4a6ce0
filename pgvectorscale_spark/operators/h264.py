"""H.264/AVC I-frame PIXEL decode — the closed-form subclass, pure numpy.

This module reconstructs real pixels from genuine H.264 Annex-B streams for
the subclass of the spec that is fully defined by closed-form arithmetic
(no large entropy-coding tables): IDR I-slices coded with CAVLC whose
macroblocks are either

  * ``I_PCM`` (raw samples, spec 7.3.5 / 8.3.5),
  * ``I_16x16`` with any of the four luma prediction modes
    (Vertical / Horizontal / DC / Plane, spec 8.3.3) and zero residual, or
  * ``I_NxN`` (I_4x4) with any of the nine 4x4 prediction modes
    (spec 8.3.1) and zero residual,

plus any of the four chroma prediction modes (DC / Horizontal / Vertical /
Plane, spec 8.3.4).  "Zero residual" is *parsed, not assumed*: the CAVLC
``coeff_token`` codes for TotalCoeff==0 are read bit-exactly from the
stream (the '1' / '11' / '1111' prefixes, the 6-bit FLC ``000011`` for
nC>=8 and the ``01`` chroma-DC code — the only rows of table 9-5 that are
small enough to be reproduced reliably without the printed table).  Any
other ``coeff_token`` means the stream carries entropy-coded residual
LEVELS, which need the full 9-5/9-6/9-7 code tables and therefore stay
behind the honest ``NotImplementedError`` gate, exactly like CABAC,
inter prediction and the in-loop deblocking filter (streams must set
``disable_deblocking_filter_idc == 1``).

Everything implemented here is header/prediction arithmetic published as
formulas in ITU-T H.264 (7.3.2.x parameter sets, 7.3.3 slice header,
7.3.5 macroblock layer, 8.3 intra prediction, 9.1 Exp-Golomb, 9.2.1 nC
derivation) — there is no table data to transcribe and nothing to copy.

Reference parity: timescale/pgvectorscale has no media decode at all —
this extends the LLM-training-pipeline multimodal surface (SURVEY.md §2,
"multimodal columns") the same way operators/jpeg.py and operators/mjpeg.py
do, narrowing the ``decode_av_samples`` gate (multimodal.py) to
entropy-coded residual decode (CAVLC level tables / CABAC) and MP3
Layer III only.
"""
from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "parse_h264_picture",
    "parse_h264_stream",
    "decode_h264_picture",
    "attach_h264_payload",
]


# --------------------------------------------------------------------------
# bitstream plumbing
# --------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over an RBSP with Exp-Golomb decode (spec 9.1)
    and the byte-alignment + raw-byte reads I_PCM needs (spec 7.3.5)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        out = 0
        for _ in range(n):
            byte_i, bit_i = divmod(self.pos, 8)
            if byte_i >= len(self.data):
                raise ValueError("truncated H.264 bitstream")
            out = (out << 1) | ((self.data[byte_i] >> (7 - bit_i)) & 1)
            self.pos += 1
        return out

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("malformed Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def align(self) -> None:
        """pcm_alignment_zero_bit* — spec requires the skipped bits be 0."""
        while self.pos % 8:
            if self.u(1) != 0:
                raise ValueError("nonzero pcm_alignment_zero_bit")

    def bytes_(self, n: int) -> bytes:
        if self.pos % 8:
            raise ValueError("byte read at unaligned position")
        byte_i = self.pos // 8
        if byte_i + n > len(self.data):
            raise ValueError("truncated I_PCM samples")
        self.pos += 8 * n
        return self.data[byte_i : byte_i + n]

    def more_rbsp_data(self) -> bool:
        """True while bits before the rbsp_stop_one_bit remain (spec 7.2):
        the stop bit is the LAST 1 bit in the RBSP."""
        i = len(self.data) - 1
        while i >= 0 and self.data[i] == 0:
            i -= 1
        if i < 0:
            return False
        b = self.data[i]
        low = 0
        while (b >> low) & 1 == 0:
            low += 1
        last_one = i * 8 + (7 - low)
        return self.pos < last_one


def split_annexb_nals(data: bytes) -> list[bytes]:
    """Annex-B NAL walk with exact 4-byte-start-code zero ownership (the
    same rule parse_h264_meta uses — multimodal.py)."""
    starts = []
    i = 0
    while i + 3 <= len(data):
        if data[i : i + 3] == b"\x00\x00\x01":
            starts.append(i + 3)
            i += 3
        else:
            i += 1
    if not starts:
        raise ValueError("no Annex-B start codes")
    nals = []
    for j, s0 in enumerate(starts):
        end = (starts[j + 1] - 3) if j + 1 < len(starts) else len(data)
        if j + 1 < len(starts) and end > s0 and data[end - 1] == 0:
            end -= 1
        if end > s0:
            nals.append(data[s0:end])
    return nals


def strip_emulation(nal: bytes) -> bytes:
    """NAL → RBSP: drop emulation-prevention bytes (00 00 03 xx → 00 00 xx),
    skipping the 1-byte NAL header (spec 7.3.1/7.4.1.1)."""
    rbsp = bytearray()
    k = 1
    while k < len(nal):
        if k + 2 < len(nal) and nal[k] == 0 and nal[k + 1] == 0 and nal[k + 2] == 3:
            rbsp += nal[k : k + 2]
            k += 3
        else:
            rbsp.append(nal[k])
            k += 1
    return bytes(rbsp)


# --------------------------------------------------------------------------
# parameter sets (spec 7.3.2.1.1 / 7.3.2.2)
# --------------------------------------------------------------------------

_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}


def _parse_sps(rbsp: bytes) -> dict:
    br = _BitReader(rbsp)
    sps: dict = {}
    sps["profile_idc"] = br.u(8)
    br.u(8)  # constraint flags + reserved
    sps["level_idc"] = br.u(8)
    sps["sps_id"] = br.ue()
    chroma_format_idc = 1
    if sps["profile_idc"] in _HIGH_PROFILES:
        chroma_format_idc = br.ue()
        if chroma_format_idc != 1:
            raise NotImplementedError(
                f"chroma_format_idc {chroma_format_idc} gated — only 4:2:0 decodes"
            )
        bd_l, bd_c = br.ue(), br.ue()
        if bd_l or bd_c:
            raise NotImplementedError("bit depths beyond 8 gated")
        br.u(1)  # qpprime_y_zero_transform_bypass_flag
        if br.u(1):
            raise NotImplementedError("seq_scaling_matrix gated")
    sps["chroma_format_idc"] = chroma_format_idc
    sps["log2_max_frame_num"] = br.ue() + 4
    poc_type = br.ue()
    sps["poc_type"] = poc_type
    if poc_type == 0:
        sps["log2_max_poc_lsb"] = br.ue() + 4
    elif poc_type == 1:
        br.u(1)
        br.se()
        br.se()
        for _ in range(br.ue()):
            br.se()
    sps["max_num_ref_frames"] = br.ue()
    br.u(1)  # gaps_in_frame_num_value_allowed_flag
    sps["pic_width_in_mbs"] = br.ue() + 1
    sps["pic_height_in_map_units"] = br.ue() + 1
    sps["frame_mbs_only"] = br.u(1)
    if not sps["frame_mbs_only"]:
        raise NotImplementedError("interlaced (field/MBAFF) decode gated")
    br.u(1)  # direct_8x8_inference_flag
    if br.u(1):  # frame_cropping_flag
        sps["crop"] = (br.ue(), br.ue(), br.ue(), br.ue())
    else:
        sps["crop"] = (0, 0, 0, 0)
    return sps


def _parse_pps(rbsp: bytes) -> dict:
    br = _BitReader(rbsp)
    pps: dict = {}
    pps["pps_id"] = br.ue()
    pps["sps_id"] = br.ue()
    if br.u(1):
        raise NotImplementedError("CABAC entropy coding gated — CAVLC only")
    pps["bottom_field_pic_order_in_frame_present"] = br.u(1)
    if br.ue() != 0:  # num_slice_groups_minus1
        raise NotImplementedError("slice groups (FMO) gated")
    pps["num_ref_idx_l0_default"] = br.ue() + 1
    pps["num_ref_idx_l1_default"] = br.ue() + 1
    pps["weighted_pred_flag"] = br.u(1)
    pps["weighted_bipred_idc"] = br.u(2)
    pps["pic_init_qp"] = br.se() + 26
    pps["pic_init_qs"] = br.se() + 26
    pps["chroma_qp_index_offset"] = br.se()
    pps["deblocking_filter_control_present"] = br.u(1)
    pps["constrained_intra_pred"] = br.u(1)
    pps["redundant_pic_cnt_present"] = br.u(1)
    if br.more_rbsp_data():
        # PPS extension (transform_8x8_mode_flag ...) implies 8x8 transforms
        # or extra scaling lists — both outside the closed-form subclass.
        raise NotImplementedError("PPS extension (transform_8x8 mode) gated")
    return pps


# --------------------------------------------------------------------------
# intra prediction (spec 8.3) — all formulas, no tables
# --------------------------------------------------------------------------


def _pred16x16(
    plane: np.ndarray,
    mx: int,
    my: int,
    mode: int,
    left_ok: bool,
    top_ok: bool,
    topleft_ok: bool,
) -> np.ndarray:
    """Intra_16x16 luma prediction (spec 8.3.3). plane is the reconstructed
    luma plane; (mx,my) the MB origin in pixels; availability flags are
    slice-aware (neighbors in another slice are unavailable, 8.3.1.1)."""
    if mode == 0:  # Vertical
        if not top_ok:
            raise ValueError("16x16 Vertical pred without top neighbor")
        return np.tile(plane[my - 1, mx : mx + 16].astype(np.int32), (16, 1))
    if mode == 1:  # Horizontal
        if not left_ok:
            raise ValueError("16x16 Horizontal pred without left neighbor")
        return np.tile(
            plane[my : my + 16, mx - 1].astype(np.int32)[:, None], (1, 16)
        )
    if mode == 2:  # DC
        if top_ok and left_ok:
            dc = (
                int(plane[my - 1, mx : mx + 16].sum())
                + int(plane[my : my + 16, mx - 1].sum())
                + 16
            ) >> 5
        elif left_ok:
            dc = (int(plane[my : my + 16, mx - 1].sum()) + 8) >> 4
        elif top_ok:
            dc = (int(plane[my - 1, mx : mx + 16].sum()) + 8) >> 4
        else:
            dc = 128
        return np.full((16, 16), dc, dtype=np.int32)
    if mode == 3:  # Plane
        if not (top_ok and left_ok and topleft_ok):
            raise ValueError("16x16 Plane pred without full neighbors")
        top = plane[my - 1, mx - 1 : mx + 16].astype(np.int64)  # top[0] = p[-1,-1]
        left = plane[my - 1 : my + 16, mx - 1].astype(np.int64)
        hsum = sum((x + 1) * (int(top[9 + x]) - int(top[7 - x])) for x in range(8))
        vsum = sum((y + 1) * (int(left[9 + y]) - int(left[7 - y])) for y in range(8))
        a = 16 * (int(left[16]) + int(top[16]))
        b = (5 * hsum + 32) >> 6
        c = (5 * vsum + 32) >> 6
        xs = np.arange(16)
        grid = a + b * (xs[None, :] - 7) + c * (xs[:, None] - 7) + 16
        return np.clip(grid >> 5, 0, 255).astype(np.int32)
    raise ValueError(f"bad Intra16x16 pred mode {mode}")


def _pred_chroma(
    plane: np.ndarray,
    cx: int,
    cy: int,
    mode: int,
    left_ok: bool,
    top_ok: bool,
    topleft_ok: bool,
) -> np.ndarray:
    """Intra chroma prediction for one 8x8 (4:2:0) block (spec 8.3.4),
    slice-aware availability flags as for luma."""
    if mode == 0:  # DC, per 4x4 quadrant (8.3.4.1)
        out = np.empty((8, 8), dtype=np.int32)
        top = plane[cy - 1, cx : cx + 8].astype(np.int64) if top_ok else None
        left = plane[cy : cy + 8, cx - 1].astype(np.int64) if left_ok else None
        for yo in (0, 4):
            for xo in (0, 4):
                t = int(top[xo : xo + 4].sum()) if top_ok else None
                l = int(left[yo : yo + 4].sum()) if left_ok else None
                corner = (xo == 0 and yo == 0) or (xo == 4 and yo == 4)
                if corner and top_ok and left_ok:
                    dc = (t + l + 4) >> 3
                elif (xo == 4 and yo == 0 and top_ok) or (
                    corner and top_ok and not left_ok
                ):
                    dc = (t + 2) >> 2
                elif (xo == 0 and yo == 4 and left_ok) or (
                    corner and left_ok and not top_ok
                ):
                    dc = (l + 2) >> 2
                elif xo == 4 and yo == 0 and left_ok:
                    dc = (l + 2) >> 2
                elif xo == 0 and yo == 4 and top_ok:
                    dc = (t + 2) >> 2
                else:
                    dc = 128
                out[yo : yo + 4, xo : xo + 4] = dc
        return out
    if mode == 1:  # Horizontal
        if not left_ok:
            raise ValueError("chroma Horizontal pred without left neighbor")
        return np.tile(plane[cy : cy + 8, cx - 1].astype(np.int32)[:, None], (1, 8))
    if mode == 2:  # Vertical
        if not top_ok:
            raise ValueError("chroma Vertical pred without top neighbor")
        return np.tile(plane[cy - 1, cx : cx + 8].astype(np.int32), (8, 1))
    if mode == 3:  # Plane (8.3.4.4, 4:2:0)
        if not (top_ok and left_ok and topleft_ok):
            raise ValueError("chroma Plane pred without full neighbors")
        top = plane[cy - 1, cx - 1 : cx + 8].astype(np.int64)  # top[0] = p[-1,-1]
        left = plane[cy - 1 : cy + 8, cx - 1].astype(np.int64)
        hsum = sum((x + 1) * (int(top[5 + x]) - int(top[3 - x])) for x in range(4))
        vsum = sum((y + 1) * (int(left[5 + y]) - int(left[3 - y])) for y in range(4))
        a = 16 * (int(left[8]) + int(top[8]))
        b = (34 * hsum + 32) >> 6
        c = (34 * vsum + 32) >> 6
        xs = np.arange(8)
        grid = a + b * (xs[None, :] - 3) + c * (xs[:, None] - 3) + 16
        return np.clip(grid >> 5, 0, 255).astype(np.int32)
    raise ValueError(f"bad chroma pred mode {mode}")


def _pred4x4(
    plane: np.ndarray,
    bx: int,
    by: int,
    mode: int,
    left_ok: bool,
    top_ok: bool,
    topleft_ok: bool,
    topright_ok: bool,
) -> np.ndarray:
    """Intra_4x4 luma prediction (spec 8.3.1.2).  (bx,by) is the block
    origin in pixels; availability flags are the caller's neighbor
    derivation.  Top-right substitution (p[x,-1] x=4..7 ← p[3,-1]) is
    applied per 8.3.1.2 when the above-right samples are unavailable."""
    # gather neighbor samples
    top = np.zeros(8, dtype=np.int64)
    left = np.zeros(4, dtype=np.int64)
    tl = 0
    if top_ok:
        top[:4] = plane[by - 1, bx : bx + 4]
        if topright_ok:
            top[4:] = plane[by - 1, bx + 4 : bx + 8]
        else:
            top[4:] = plane[by - 1, bx + 3]
    if left_ok:
        left[:] = plane[by : by + 4, bx - 1]
    if topleft_ok:
        tl = int(plane[by - 1, bx - 1])

    out = np.empty((4, 4), dtype=np.int32)
    if mode == 0:  # Vertical
        if not top_ok:
            raise ValueError("4x4 Vertical pred without top neighbor")
        return np.tile(top[:4].astype(np.int32), (4, 1))
    if mode == 1:  # Horizontal
        if not left_ok:
            raise ValueError("4x4 Horizontal pred without left neighbor")
        return np.tile(left.astype(np.int32)[:, None], (1, 4))
    if mode == 2:  # DC
        if top_ok and left_ok:
            dc = (int(top[:4].sum()) + int(left.sum()) + 4) >> 3
        elif left_ok:
            dc = (int(left.sum()) + 2) >> 2
        elif top_ok:
            dc = (int(top[:4].sum()) + 2) >> 2
        else:
            dc = 128
        out[:] = dc
        return out
    if mode == 3:  # Diagonal-Down-Left
        if not top_ok:
            raise ValueError("4x4 DDL pred without top neighbor")
        for y in range(4):
            for x in range(4):
                if x == 3 and y == 3:
                    out[y, x] = (top[6] + 3 * top[7] + 2) >> 2
                else:
                    out[y, x] = (top[x + y] + 2 * top[x + y + 1] + top[x + y + 2] + 2) >> 2
        return out
    if mode == 4:  # Diagonal-Down-Right
        if not (top_ok and left_ok and topleft_ok):
            raise ValueError("4x4 DDR pred without full neighbors")
        for y in range(4):
            for x in range(4):
                if x > y:
                    a, b, c = (
                        top[x - y - 2] if x - y - 2 >= 0 else tl,
                        top[x - y - 1] if x - y - 1 >= 0 else tl,
                        top[x - y],
                    )
                elif x < y:
                    a, b, c = (
                        left[y - x - 2] if y - x - 2 >= 0 else tl,
                        left[y - x - 1] if y - x - 1 >= 0 else tl,
                        left[y - x],
                    )
                else:
                    a, b, c = top[0], tl, left[0]
                out[y, x] = (a + 2 * b + c + 2) >> 2
        return out
    if mode == 5:  # Vertical-Right
        if not (top_ok and left_ok and topleft_ok):
            raise ValueError("4x4 VR pred without full neighbors")
        t = np.concatenate(([tl], top[:4]))  # t[i] = p[i-1,-1]
        for y in range(4):
            for x in range(4):
                z = 2 * x - y
                if z >= 0 and z % 2 == 0:
                    out[y, x] = (t[x - (y >> 1)] + t[x - (y >> 1) + 1] + 1) >> 1
                elif z >= 0:
                    out[y, x] = (
                        t[x - (y >> 1) - 1] + 2 * t[x - (y >> 1)] + t[x - (y >> 1) + 1] + 2
                    ) >> 2
                elif z == -1:
                    out[y, x] = (left[0] + 2 * tl + top[0] + 2) >> 2
                else:
                    # p[-1, y-1..y-3]: index -1 is the corner p[-1,-1]
                    l_ext = (tl, left[0], left[1], left[2], left[3])
                    out[y, x] = (l_ext[y] + 2 * l_ext[y - 1] + l_ext[y - 2] + 2) >> 2
        return out
    if mode == 6:  # Horizontal-Down
        if not (top_ok and left_ok and topleft_ok):
            raise ValueError("4x4 HD pred without full neighbors")
        l = np.concatenate(([tl], left))  # l[i] = p[-1,i-1]
        for y in range(4):
            for x in range(4):
                z = 2 * y - x
                if z >= 0 and z % 2 == 0:
                    out[y, x] = (l[y - (x >> 1)] + l[y - (x >> 1) + 1] + 1) >> 1
                elif z >= 0:
                    out[y, x] = (
                        l[y - (x >> 1) - 1] + 2 * l[y - (x >> 1)] + l[y - (x >> 1) + 1] + 2
                    ) >> 2
                elif z == -1:
                    out[y, x] = (top[0] + 2 * tl + left[0] + 2) >> 2
                else:
                    # p[x-1..x-3, -1]: index -1 is the corner p[-1,-1]
                    t_ext = (tl, top[0], top[1], top[2], top[3])
                    out[y, x] = (t_ext[x] + 2 * t_ext[x - 1] + t_ext[x - 2] + 2) >> 2
        return out
    if mode == 7:  # Vertical-Left
        if not top_ok:
            raise ValueError("4x4 VL pred without top neighbor")
        for y in range(4):
            for x in range(4):
                i = x + (y >> 1)
                if y % 2 == 0:
                    out[y, x] = (top[i] + top[i + 1] + 1) >> 1
                else:
                    out[y, x] = (top[i] + 2 * top[i + 1] + top[i + 2] + 2) >> 2
        return out
    if mode == 8:  # Horizontal-Up
        if not left_ok:
            raise ValueError("4x4 HU pred without left neighbor")
        for y in range(4):
            for x in range(4):
                z = x + 2 * y
                if z > 5:
                    out[y, x] = left[3]
                elif z == 5:
                    out[y, x] = (left[2] + 3 * left[3] + 2) >> 2
                elif z % 2 == 0:
                    out[y, x] = (left[y + (x >> 1)] + left[y + (x >> 1) + 1] + 1) >> 1
                else:
                    out[y, x] = (
                        left[y + (x >> 1)] + 2 * left[y + (x >> 1) + 1] + left[y + (x >> 1) + 2] + 2
                    ) >> 2
        return out
    raise ValueError(f"bad Intra4x4 pred mode {mode}")


# inverse 4x4 luma block scan (spec 6.4.3): blkIdx -> (x4, y4) in 4-pel units
_BLK4_X = [2 * ((i >> 2) & 1) + (i & 1) for i in range(16)]
_BLK4_Y = [2 * ((i >> 3) & 1) + ((i >> 1) & 1) for i in range(16)]


# --------------------------------------------------------------------------
# CAVLC — the TotalCoeff==0 subclass (spec 9.2.1, table 9-5 zero rows)
# --------------------------------------------------------------------------

_GATE_MSG = (
    "entropy-coded residual levels gated: coeff_token signals TotalCoeff>0, "
    "whose CAVLC suffix decode needs the full table 9-5/9-6/9-7 data "
    "(decode_av_samples gate); only zero-residual / I_PCM streams decode"
)


def _read_zero_coeff_token(br: _BitReader, nC: int) -> None:
    """Read coeff_token and require TotalCoeff==0 (the closed-form rows of
    table 9-5): nC<2 → '1'; 2<=nC<4 → '11'; 4<=nC<8 → '1111';
    nC>=8 → 6-bit FLC '000011'; nC==-1 (chroma DC, 4:2:0) → '01'."""
    if nC == -1:
        if br.u(1) != 0 or br.u(1) != 1:
            raise NotImplementedError(_GATE_MSG)
        return
    if nC < 2:
        n = 1
    elif nC < 4:
        n = 2
    elif nC < 8:
        n = 4
    else:
        if br.u(6) != 0b000011:
            raise NotImplementedError(_GATE_MSG)
        return
    for _ in range(n):
        if br.u(1) != 1:
            raise NotImplementedError(_GATE_MSG)


class _MbState:
    """Per-MB bookkeeping for nC derivation and 4x4 mode prediction."""

    __slots__ = ("mb_type", "slice_id", "luma_tc", "cb_tc", "cr_tc", "i4_modes")

    def __init__(self, mb_type: str, slice_id: int):
        self.mb_type = mb_type  # 'pcm' | 'i16' | 'i4'
        self.slice_id = slice_id
        tc = 16 if mb_type == "pcm" else 0
        self.luma_tc = [tc] * 16  # per-4x4-block TotalCoeff (9.2.1: I_PCM=16)
        self.cb_tc = [tc] * 4
        self.cr_tc = [tc] * 4
        self.i4_modes = [2] * 16  # DC default; only meaningful for 'i4'


def _luma_nC(
    mbs: dict[tuple[int, int], _MbState], mbx: int, mby: int, blk: int, sl: int
) -> int:
    """nC for luma block blk of MB (mbx,mby) — spec 9.2.1 with raster 4x4
    addressing across MB boundaries; neighbors outside the current slice
    ``sl`` are unavailable."""

    def tc_at(gx: int, gy: int) -> int | None:
        if gx < 0 or gy < 0:
            return None
        st = mbs.get((gx >> 2, gy >> 2))
        if st is None or st.slice_id != sl:
            return None
        return st.luma_tc[_BLK4_INDEX[(gy & 3, gx & 3)]]

    gx = (mbx << 2) + _BLK4_X[blk]
    gy = (mby << 2) + _BLK4_Y[blk]
    nA = tc_at(gx - 1, gy)
    nB = tc_at(gx, gy - 1)
    if nA is not None and nB is not None:
        return (nA + nB + 1) >> 1
    if nA is not None:
        return nA
    if nB is not None:
        return nB
    return 0


def _chroma_nC(
    mbs: dict[tuple[int, int], _MbState],
    mbx: int,
    mby: int,
    blk: int,
    comp: str,
    sl: int,
) -> int:
    """nC for a chroma AC 4x4 block (2x2 grid per MB, raster blk order)."""

    def tc_at(gx: int, gy: int) -> int | None:
        if gx < 0 or gy < 0:
            return None
        st = mbs.get((gx >> 1, gy >> 1))
        if st is None or st.slice_id != sl:
            return None
        arr = st.cb_tc if comp == "cb" else st.cr_tc
        return arr[(gy & 1) * 2 + (gx & 1)]

    gx = (mbx << 1) + (blk & 1)
    gy = (mby << 1) + (blk >> 1)
    nA = tc_at(gx - 1, gy)
    nB = tc_at(gx, gy - 1)
    if nA is not None and nB is not None:
        return (nA + nB + 1) >> 1
    if nA is not None:
        return nA
    if nB is not None:
        return nB
    return 0


# (y4, x4) -> blkIdx inverse of the 6.4.3 scan
_BLK4_INDEX = {(_BLK4_Y[i], _BLK4_X[i]): i for i in range(16)}

# table 9-4 (coded_block_pattern me(v) mapping), intra column — only the
# entries reproducible with confidence; everything else gates loudly.  The
# zero-residual subclass only ever needs codeNum 3 (cbp == 0).
_CBP_INTRA = {0: 47, 1: 31, 2: 15, 3: 0}


def _read_cbp_intra(br: _BitReader) -> int:
    code = br.ue()
    cbp = _CBP_INTRA.get(code)
    if cbp is None:
        raise NotImplementedError(
            f"coded_block_pattern codeNum {code} gated — only the table 9-4 "
            "entries needed by the zero-residual subclass are mapped"
        )
    return cbp


# --------------------------------------------------------------------------
# picture decode
# --------------------------------------------------------------------------


def parse_h264_picture(data: bytes) -> tuple[int, int, np.ndarray, np.ndarray, np.ndarray, int]:
    """Decode the FIRST coded picture of an Annex-B H.264 stream to pixel
    planes: returns (width, height, Y, Cb, Cr, n_nal_units).  Thin wrapper
    over :func:`parse_h264_stream`."""
    w, h, pictures, n_nals = parse_h264_stream(data)
    Y, Cb, Cr = pictures[0]
    return w, h, Y, Cb, Cr, n_nals


def parse_h264_stream(
    data: bytes,
) -> tuple[int, int, list[tuple[np.ndarray, np.ndarray, np.ndarray]], int]:
    """Decode EVERY coded picture of an all-intra Annex-B H.264 stream:
    returns (width, height, [(Y, Cb, Cr), ...], n_nal_units).  A new
    picture starts at each slice with first_mb_in_slice == 0 once the
    previous picture is fully covered (all-intra streams need no POC
    reordering — decode order is output order).  Supports the closed-form
    I-frame subclass (module docstring); anything beyond it raises
    NotImplementedError naming the gate, malformed streams raise
    ValueError."""
    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    data = bytes(data)
    nals = split_annexb_nals(data)
    sps_by_id: dict[int, dict] = {}
    pps_by_id: dict[int, dict] = {}
    slice_nals: list[bytes] = []
    for nal in nals:
        t = nal[0] & 0x1F
        if t == 7:
            s = _parse_sps(strip_emulation(nal))
            sps_by_id[s["sps_id"]] = s
        elif t == 8:
            p = _parse_pps(strip_emulation(nal))
            pps_by_id[p["pps_id"]] = p
        elif t in (1, 5):
            slice_nals.append(nal)
    if not sps_by_id:
        raise ValueError("no SPS NAL unit in stream")
    if not pps_by_id:
        raise ValueError("no PPS NAL unit in stream")
    if not slice_nals:
        raise ValueError("no coded slice NAL units in stream")

    W = H = 0
    mbs: dict[tuple[int, int], _MbState] = {}
    Y = Cb = Cr = None
    sps = None
    crop = (0, 0, 0, 0)
    n_decoded = 0
    pic_size = 0
    pictures: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    for sl, nal in enumerate(slice_nals):
        idr = (nal[0] & 0x1F) == 5
        br = _BitReader(strip_emulation(nal))
        first_mb = br.ue()
        slice_type = br.ue()
        if slice_type % 5 != 2:
            raise NotImplementedError(
                f"slice_type {slice_type} gated — only I slices (inter "
                "prediction needs reference pictures; decode_av_samples gate)"
            )
        pps = pps_by_id.get(br.ue())
        if pps is None:
            raise ValueError("slice references unknown PPS")
        sps = sps_by_id.get(pps["sps_id"])
        if sps is None:
            raise ValueError("PPS references unknown SPS")
        if W == 0:
            W = sps["pic_width_in_mbs"]
            H = sps["pic_height_in_map_units"]
            pic_size = W * H
            crop = sps["crop"]
            # level 5.2 caps MaxFS at 36,864 MBs; anything far beyond that
            # is a malformed SPS — refuse before allocating planes
            if pic_size > (1 << 20):
                raise ValueError(f"implausible picture size {W}x{H} MBs")
        elif (sps["pic_width_in_mbs"], sps["pic_height_in_map_units"]) != (W, H):
            raise ValueError("mid-stream picture-dimension change")
        if first_mb == 0:
            # a fresh picture start; the previous one must be complete
            if Y is not None:
                if n_decoded < pic_size:
                    raise ValueError(
                        f"picture not fully covered: {n_decoded}/{pic_size} "
                        "macroblocks before next picture"
                    )
                pictures.append(_crop_planes(Y, Cb, Cr, W, H, crop))
            Y = np.zeros((H * 16, W * 16), dtype=np.int32)
            Cb = np.zeros((H * 8, W * 8), dtype=np.int32)
            Cr = np.zeros((H * 8, W * 8), dtype=np.int32)
            mbs = {}
            n_decoded = 0
        elif Y is None:
            raise ValueError("first slice does not start at macroblock 0")
        br.u(sps["log2_max_frame_num"])  # frame_num
        if idr:
            br.ue()  # idr_pic_id
        if sps["poc_type"] == 0:
            br.u(sps["log2_max_poc_lsb"])  # pic_order_cnt_lsb
            if pps["bottom_field_pic_order_in_frame_present"]:
                br.se()  # delta_pic_order_cnt_bottom
        if pps["redundant_pic_cnt_present"]:
            if br.ue() != 0:
                raise NotImplementedError("redundant coded pictures gated")
        # I slices: no ref list modification; dec_ref_pic_marking
        if idr:
            br.u(1)  # no_output_of_prior_pics_flag
            br.u(1)  # long_term_reference_flag
        elif (nal[0] >> 5) & 3:  # nal_ref_idc != 0
            if br.u(1):  # adaptive_ref_pic_marking_mode_flag
                raise NotImplementedError("adaptive ref-pic marking gated")
        br.se()  # slice_qp_delta
        if pps["deblocking_filter_control_present"]:
            idc = br.ue()
            if idc != 1:
                raise NotImplementedError(
                    "in-loop deblocking filter gated (alpha/beta/tC0 tables "
                    "are not closed-form) — streams must set "
                    "disable_deblocking_filter_idc == 1"
                )
            # idc == 1: no alpha/beta offsets follow
        else:
            raise NotImplementedError(
                "deblocking defaults ON when the PPS carries no control flag "
                "— gated (set deblocking_filter_control_present_flag and "
                "disable_deblocking_filter_idc == 1)"
            )

        addr = first_mb
        if addr != n_decoded:
            raise ValueError("slices out of order / overlapping")

        def mb_avail(x: int, y: int) -> bool:
            st = mbs.get((x, y))
            return st is not None and st.slice_id == sl

        while addr < pic_size:
            mbx, mby = addr % W, addr // W
            mx, my = mbx * 16, mby * 16
            cx, cy = mbx * 8, mby * 8
            l_ok = mb_avail(mbx - 1, mby)
            t_ok = mb_avail(mbx, mby - 1)
            tl_ok = mb_avail(mbx - 1, mby - 1)
            mb_type = br.ue()
            if mb_type == 25:  # I_PCM
                br.align()
                luma = np.frombuffer(br.bytes_(256), dtype=np.uint8)
                Y[my : my + 16, mx : mx + 16] = luma.reshape(16, 16)
                cb = np.frombuffer(br.bytes_(64), dtype=np.uint8)
                cr = np.frombuffer(br.bytes_(64), dtype=np.uint8)
                Cb[cy : cy + 8, cx : cx + 8] = cb.reshape(8, 8)
                Cr[cy : cy + 8, cx : cx + 8] = cr.reshape(8, 8)
                mbs[(mbx, mby)] = _MbState("pcm", sl)
            elif 1 <= mb_type <= 24:  # I_16x16
                pred_mode = (mb_type - 1) % 4
                cbp_chroma = ((mb_type - 1) // 4) % 3
                cbp_luma = 15 if mb_type > 12 else 0
                chroma_mode = br.ue()
                if chroma_mode > 3:
                    raise ValueError(f"bad intra_chroma_pred_mode {chroma_mode}")
                br.se()  # mb_qp_delta
                mbs[(mbx, mby)] = _MbState("i16", sl)
                # residual: Intra16x16DCLevel always; nC as for luma blk 0
                _read_zero_coeff_token(br, _luma_nC(mbs, mbx, mby, 0, sl))
                if cbp_luma:
                    for blk in range(16):
                        _read_zero_coeff_token(br, _luma_nC(mbs, mbx, mby, blk, sl))
                if cbp_chroma:
                    _read_zero_coeff_token(br, -1)  # Cb DC
                    _read_zero_coeff_token(br, -1)  # Cr DC
                if cbp_chroma == 2:
                    for comp in ("cb", "cr"):
                        for blk in range(4):
                            _read_zero_coeff_token(
                                br, _chroma_nC(mbs, mbx, mby, blk, comp, sl)
                            )
                Y[my : my + 16, mx : mx + 16] = _pred16x16(
                    Y, mx, my, pred_mode, l_ok, t_ok, tl_ok
                )
                Cb[cy : cy + 8, cx : cx + 8] = _pred_chroma(
                    Cb, cx, cy, chroma_mode, l_ok, t_ok, tl_ok
                )
                Cr[cy : cy + 8, cx : cx + 8] = _pred_chroma(
                    Cr, cx, cy, chroma_mode, l_ok, t_ok, tl_ok
                )
            elif mb_type == 0:  # I_NxN (I_4x4: no 8x8 transform in this PPS)
                st = _MbState("i4", sl)
                mbs[(mbx, mby)] = st
                # 4x4 pred modes (8.3.1.1): predictor is min(left, above)
                modes = [0] * 16
                for blk in range(16):
                    pm = _pred_mode4(mbs, mbx, mby, blk, sl)
                    if br.u(1):  # prev_intra4x4_pred_mode_flag
                        modes[blk] = pm
                    else:
                        rem = br.u(3)
                        modes[blk] = rem if rem < pm else rem + 1
                    st.i4_modes[blk] = modes[blk]
                chroma_mode = br.ue()
                if chroma_mode > 3:
                    raise ValueError(f"bad intra_chroma_pred_mode {chroma_mode}")
                cbp = _read_cbp_intra(br)
                cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
                if cbp:
                    br.se()  # mb_qp_delta
                # predict + reconstruct 4x4 blocks in scan order — residual
                # is all-zero in this subclass, and in-MB neighbors must be
                # reconstructed before later blocks read them
                for blk in range(16):
                    bx = mx + 4 * _BLK4_X[blk]
                    by = my + 4 * _BLK4_Y[blk]
                    b_l, b_t, b_tl, b_tr = _avail4(mbs, W, mbx, mby, blk, sl)
                    Y[by : by + 4, bx : bx + 4] = _pred4x4(
                        Y, bx, by, modes[blk], b_l, b_t, b_tl, b_tr
                    )
                for g in range(4):
                    if cbp_luma & (1 << g):
                        for sub in range(4):
                            blk = 4 * g + sub
                            _read_zero_coeff_token(
                                br, _luma_nC(mbs, mbx, mby, blk, sl)
                            )
                if cbp_chroma:
                    _read_zero_coeff_token(br, -1)
                    _read_zero_coeff_token(br, -1)
                if cbp_chroma == 2:
                    for comp in ("cb", "cr"):
                        for blk in range(4):
                            _read_zero_coeff_token(
                                br, _chroma_nC(mbs, mbx, mby, blk, comp, sl)
                            )
                Cb[cy : cy + 8, cx : cx + 8] = _pred_chroma(
                    Cb, cx, cy, chroma_mode, l_ok, t_ok, tl_ok
                )
                Cr[cy : cy + 8, cx : cx + 8] = _pred_chroma(
                    Cr, cx, cy, chroma_mode, l_ok, t_ok, tl_ok
                )
            else:
                raise ValueError(f"bad I-slice mb_type {mb_type}")
            addr += 1
            n_decoded += 1
            if addr < pic_size and not br.more_rbsp_data():
                break  # next slice continues the picture
    if n_decoded < pic_size:
        raise ValueError(
            f"picture not fully covered: {n_decoded}/{pic_size} macroblocks"
        )
    pictures.append(_crop_planes(Y, Cb, Cr, W, H, crop))
    cl, cr_, ct, cb_ = crop
    w = W * 16 - 2 * (cl + cr_)
    h = H * 16 - 2 * (ct + cb_)
    return w, h, pictures, len(nals)


def _crop_planes(
    Y: np.ndarray, Cb: np.ndarray, Cr: np.ndarray, W: int, H: int, crop
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Apply SPS frame cropping: 4:2:0 crop units — x2 luma horizontally,
    x2 vertically for frame_mbs_only streams (the only kind decoded
    here)."""
    cl, cr_, ct, cb_ = crop
    w = W * 16 - 2 * (cl + cr_)
    h = H * 16 - 2 * (ct + cb_)
    return (
        Y[2 * ct : 2 * ct + h, 2 * cl : 2 * cl + w].astype(np.uint8),
        Cb[ct : ct + h // 2, cl : cl + w // 2].astype(np.uint8),
        Cr[ct : ct + h // 2, cl : cl + w // 2].astype(np.uint8),
    )


def _pred_mode4(
    mbs: dict[tuple[int, int], _MbState],
    mbx: int,
    mby: int,
    blk: int,
    sl: int,
) -> int:
    """predIntra4x4PredMode (spec 8.3.1.1): min of the left and above
    blocks' modes; unavailable, other-slice, or non-I_4x4 neighbors
    contribute 2 (DC)."""

    def mode_at(gx: int, gy: int) -> int:
        if gx < 0 or gy < 0:
            return 2
        st = mbs.get((gx >> 2, gy >> 2))
        if st is None or st.slice_id != sl or st.mb_type != "i4":
            return 2
        return st.i4_modes[_BLK4_INDEX[(gy & 3, gx & 3)]]

    gx = (mbx << 2) + _BLK4_X[blk]
    gy = (mby << 2) + _BLK4_Y[blk]
    return min(mode_at(gx - 1, gy), mode_at(gx, gy - 1))


def _avail4(
    mbs: dict[tuple[int, int], _MbState],
    W: int,
    mbx: int,
    mby: int,
    blk: int,
    sl: int,
) -> tuple[bool, bool, bool, bool]:
    """(left, top, top-left, top-right) availability for luma 4x4 block blk
    in MB (mbx,mby) — spec 6.4.11/8.3.1.2: a neighboring 4x4 block is
    available iff it lies in the picture, belongs to the SAME slice, and
    precedes the current block in decode order."""

    def blk_avail(nx: int, ny: int) -> bool:
        if nx < 0 or ny < 0 or nx >= 4 * W:
            return False
        nmb = (nx >> 2, ny >> 2)
        if nmb == (mbx, mby):  # same MB: earlier in the 6.4.3 scan?
            return _BLK4_INDEX[(ny & 3, nx & 3)] < blk
        st = mbs.get(nmb)
        return st is not None and st.slice_id == sl

    gx = (mbx << 2) + _BLK4_X[blk]
    gy = (mby << 2) + _BLK4_Y[blk]
    left = blk_avail(gx - 1, gy)
    top = blk_avail(gx, gy - 1)
    topleft = blk_avail(gx - 1, gy - 1)
    tr = blk_avail(gx + 1, gy - 1)  # the 4 samples above-right live there
    return left, top, topleft, tr


# --------------------------------------------------------------------------
# DataFrame operator
# --------------------------------------------------------------------------


def decode_h264_picture(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched H.264 all-intra pixel decode over
    ``parse_h264_stream``: returns (id, width, height, n_mbs, n_pictures,
    n_nal_units, mean_y, mean_cb, mean_cr, y00, y_last) — pixel features
    of the FIRST picture plus the stream's decoded picture count.  Scale
    shape: mapInPandas, one payload per row, no shuffle — the same
    contract as every other decoder in this package."""

    def decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "width": [], "height": [], "n_mbs": [], "n_pictures": [],
                "n_nal_units": [], "mean_y": [], "mean_cb": [], "mean_cr": [],
                "y00": [], "y_last": [],
            }
            for payload in pdf[payload_col]:
                w, h, pictures, n_nals = parse_h264_stream(bytes(payload))
                Y, Cb, Cr = pictures[0]
                out["width"].append(w)
                out["height"].append(h)
                out["n_mbs"].append((w // 16) * (h // 16))
                out["n_pictures"].append(len(pictures))
                out["n_nal_units"].append(n_nals)
                out["mean_y"].append(float(Y.mean()))
                out["mean_cb"].append(float(Cb.mean()))
                out["mean_cr"].append(float(Cr.mean()))
                out["y00"].append(int(Y[0, 0]))
                out["y_last"].append(int(Y[-1, -1]))
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), **out})

    return df.select(id_col, payload_col).mapInPandas(
        decode,
        schema=(
            f"{id_col} long, width long, height long, n_mbs long, "
            "n_pictures long, n_nal_units long, mean_y double, "
            "mean_cb double, mean_cr double, y00 long, y_last long"
        ),
    )


# --------------------------------------------------------------------------
# JVM-side synthesis (driver-oracle path)
# --------------------------------------------------------------------------


class _BitWriter:
    """Build-time bit writer for the FIXED parts of the synthesized stream
    (runs once on the driver while constructing the SQL expression)."""

    def __init__(self):
        self.bits: list[int] = []

    def u(self, val: int, n: int) -> "_BitWriter":
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)
        return self

    def ue(self, k: int) -> "_BitWriter":
        z = (k + 1).bit_length() - 1
        return self.u(0, z).u(k + 1, z + 1)

    def se(self, v: int) -> "_BitWriter":
        return self.ue(2 * v - 1 if v > 0 else -2 * v)

    def align_zero(self) -> "_BitWriter":
        while len(self.bits) % 8:
            self.bits.append(0)
        return self

    def raw_bytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        return bytes(
            int("".join(map(str, self.bits[i : i + 8])), 2)
            for i in range(0, len(self.bits), 8)
        )


def _ep_escape(raw: bytes) -> bytes:
    """Emulation-prevention escape for a whole RBSP segment."""
    out = bytearray()
    zeros = 0
    for b in raw:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _rbsp_nal(header: int, w: _BitWriter) -> bytes:
    w.u(1, 1)  # rbsp_stop_one_bit
    w.align_zero()
    return bytes([header]) + _ep_escape(w.raw_bytes())


def _synth_fixed_parts() -> tuple[str, str]:
    """Build the digest-independent bytes of the synthesized stream: a
    16x32 IDR picture, MB0 = I_PCM (luma bytes injected JVM-side, chroma
    0x80), MB1 = I_16x16 Vertical + chroma DC + cbp 0.  Returns
    (prefix_hex, suffix_hex) with the 256 luma PCM bytes as the hole."""
    # ---- SPS: baseline, 1x2 MBs, poc_type 0, no crop
    s = _BitWriter()
    s.u(66, 8).u(0, 8).u(20, 8)  # profile/flags/level
    s.ue(0)  # sps_id
    s.ue(0)  # log2_max_frame_num_minus4 -> u(4)
    s.ue(0)  # poc_type 0
    s.ue(0)  # log2_max_pic_order_cnt_lsb_minus4 -> u(4)
    s.ue(1)  # max_num_ref_frames
    s.u(0, 1)  # gaps_in_frame_num
    s.ue(0)  # pic_width_in_mbs_minus1 = 0 -> 16 px
    s.ue(1)  # pic_height_in_map_units_minus1 = 1 -> 32 px
    s.u(1, 1)  # frame_mbs_only
    s.u(1, 1)  # direct_8x8_inference
    s.u(0, 1)  # no cropping
    s.u(0, 1)  # no VUI
    sps = _rbsp_nal(0x67, s)
    # ---- PPS: CAVLC, one slice group, deblock control present
    p = _BitWriter()
    p.ue(0).ue(0)  # pps_id, sps_id
    p.u(0, 1)  # entropy_coding_mode_flag = CAVLC
    p.u(0, 1)  # bottom_field_pic_order_in_frame_present
    p.ue(0)  # num_slice_groups_minus1
    p.ue(0).ue(0)  # num_ref_idx defaults
    p.u(0, 1).u(0, 2)  # weighted_pred, weighted_bipred
    p.se(0).se(0).se(0)  # qp, qs, chroma offset
    p.u(1, 1)  # deblocking_filter_control_present
    p.u(0, 1)  # constrained_intra_pred
    p.u(0, 1)  # redundant_pic_cnt_present
    pps = _rbsp_nal(0x68, p)
    # ---- IDR slice up to the PCM hole
    h = _BitWriter()
    h.ue(0)  # first_mb_in_slice
    h.ue(7)  # slice_type I (all slices)
    h.ue(0)  # pps_id
    h.u(0, 4)  # frame_num
    h.ue(0)  # idr_pic_id
    h.u(0, 4)  # pic_order_cnt_lsb
    h.u(0, 1).u(0, 1)  # no_output_of_prior_pics, long_term_reference
    h.se(0)  # slice_qp_delta
    h.ue(1)  # disable_deblocking_filter_idc = 1
    h.ue(25)  # MB0: mb_type I_PCM
    h.align_zero()  # pcm_alignment_zero_bit*
    pre_pcm = h.raw_bytes()  # byte-aligned; luma PCM bytes follow
    # hole: 256 luma bytes (values 16*nib+8: never 0x00-0x03, so no
    # emulation-prevention interaction with the fixed segments)
    # ---- after the hole: chroma PCM (0x80 x 128) + MB1 + stop bit
    t = _BitWriter()
    for b in b"\x80" * 128:
        t.u(b, 8)
    t.ue(1)  # MB1: mb_type I_16x16, pred Vertical, cbp (0,0)
    t.ue(0)  # intra_chroma_pred_mode DC
    t.se(0)  # mb_qp_delta
    # Intra16x16DCLevel coeff_token: above MB is I_PCM -> nB=16, left
    # unavailable -> nC=16 -> 6-bit FLC '000011' (TotalCoeff 0)
    t.u(0b000011, 6)
    t.u(1, 1)  # rbsp_stop_one_bit
    t.align_zero()
    post_pcm = t.raw_bytes()
    # ---- picture 2 (fixed): both MBs I_16x16 DC with no usable neighbors
    # in row 0 / only-i16 above in row 1 -> flat 128 planes; exercises the
    # multi-picture walk and the nC=0 zero coeff_token on both MBs
    p2 = _BitWriter()
    p2.ue(0)  # first_mb_in_slice
    p2.ue(7)  # slice_type I
    p2.ue(0)  # pps_id
    p2.u(0, 4)  # frame_num (IDR resets)
    p2.ue(1)  # idr_pic_id (differs from picture 1)
    p2.u(0, 4)  # pic_order_cnt_lsb
    p2.u(0, 1).u(0, 1)  # no_output_of_prior_pics, long_term_reference
    p2.se(0)  # slice_qp_delta
    p2.ue(1)  # disable_deblocking_filter_idc
    for _ in range(2):  # MB0 then MB1
        p2.ue(3)  # mb_type I_16x16, pred DC, cbp (0,0)
        p2.ue(0)  # intra_chroma_pred_mode DC
        p2.se(0)  # mb_qp_delta
        p2.u(1, 1)  # coeff_token '1' (nC=0, TotalCoeff 0)
    pic2 = _rbsp_nal(0x65, p2)
    # the PCM bytes end with values >= 8 so no zero-run crosses the seam;
    # escape the fixed segments independently
    prefix = (
        b"\x00\x00\x00\x01" + sps + b"\x00\x00\x01" + pps
        + b"\x00\x00\x01\x65" + _ep_escape(pre_pcm)
    )
    suffix = _ep_escape(post_pcm) + b"\x00\x00\x01" + pic2
    # seam safety for the PCM hole: the luma bytes are all >= 0x08, so an
    # emulation-prevention pattern (00 00 00..03) can only cross the seam if
    # the prefix ends with TWO zero bytes (a single trailing alignment zero
    # is harmless); the suffix starts with 0x80 chroma bytes, same argument
    assert not prefix.endswith(b"\x00\x00")
    return prefix.hex(), suffix.hex()


#: synthesized-stream geometry (decode_h264_picture metric contract)
H264_SYNTH_WIDTH = 16
H264_SYNTH_HEIGHT = 32
H264_SYNTH_N_NALS = 4  # SPS + PPS + two IDR pictures
H264_SYNTH_N_PICTURES = 2


def attach_h264_payload(
    df: DataFrame, source_col: str = "text", payload_col: str = "payload"
) -> DataFrame:
    """Deterministic REAL H.264 Annex-B stream per row, built JVM-side:
    SPS + PPS + TWO 16x32 IDR pictures.  Picture 1's top macroblock is
    I_PCM with digest-derived luma (rows alternate the two digest halves,
    each nibble mapped to 16*nib+8 — never an emulation-prevention
    pattern) and its bottom macroblock is I_16x16 VERTICAL prediction with
    chroma DC and a parsed all-zero residual (the nC=16 FLC coeff_token
    path); picture 2 is all-DC flat 128 (the nC=0 token path + the
    multi-picture walk).  Every byte is a conformant stream any H.264
    decoder reproduces bit-exactly, and the closed-form oracle
    (oracles.h264_decode_oracle) recomputes the decoded means from the
    digest hex — a syntax, alignment, prediction, or reconstruction bug
    on either side breaks the hash."""
    prefix_hex, suffix_hex = _synth_fixed_parts()
    nib = lambda k: f"cast(conv(substring(md5(`{source_col}`), {k}, 1), 16, 10) as int)"
    vals = ", ".join(f"'{16 * v + 8:02x}'" for v in range(16))
    row_a = "concat(" + ", ".join(f"elt({nib(k)} + 1, {vals})" for k in range(1, 17)) + ")"
    row_b = "concat(" + ", ".join(f"elt({nib(k)} + 1, {vals})" for k in range(17, 33)) + ")"
    luma = f"repeat(concat({row_a}, {row_b}), 8)"  # 16 rows of 16 bytes
    return df.withColumn(
        payload_col,
        F.expr(f"unhex(concat('{prefix_hex}', {luma}, '{suffix_hex}'))"),
    ).withColumn("media_type", F.lit("video/h264"))
