"""WebP-lossless (VP8L) decode — RIFF chunk walk, stream-carried canonical
prefix codes, the four VP8L transforms, color cache, and LZ77 backward
references, pure numpy/stdlib.

VP8L is the last notable raster format whose entropy coding is fully
stream-carried: every prefix code is either a "simple" code (its 1-2
symbols ride in the stream) or a canonical code built from code LENGTHS
that are themselves coded with a small stream-carried code-length code —
the same honestly-decodable class as GIF's LZW (dictionary built from the
stream) and PNG's Deflate (stdlib zlib). All per-pixel math (the 14
spatial predictors, the color-transform deltas, subtract-green, palette
delta-coding, the LZ77 length/distance extra-bit formula, the color-cache
multiplicative hash) is closed-form pseudo-code in the public spec
(RFC 9649) and is implemented here.

Distance codes 1..120 map to a close-neighbor (dx, dy) window through a
120-entry table the spec prints as a list — but the list IS a closed
form, so it is derived here rather than transcribed: the candidates are
exactly the causal 8-row neighborhood {(dx, dy): 0 <= dy <= 7,
-7 <= dx <= 8, dy > 0 or dx > 0} (120 offsets), ordered by squared
euclidean distance dx² + dy², ties by |dx| ascending, then positive dx
before negative (see ``_NEAR_DIST`` and the anchor test
tests/test_vp8l.py::test_near_distance_table_closed_form, which pins the
spec's own first rows, last rows, and the densest tie groups). Distance
codes > 120 are plain 1-D distances. The Select predictor's tie (equal
L/T distance) resolves to T per the spec's single strict comparison,
and the rightmost column's top-right pixel is the contiguous buffer's
next element — the current row's leftmost pixel — both noted at the
implementation.

Reference parity: timescale/pgvectorscale has no media decode — this
extends the LLM-pipeline multimodal surface (SURVEY.md §2 "multimodal
columns") like operators/gif.py and operators/jpeg.py do.
"""
from __future__ import annotations

import struct

import numpy as np

__all__ = ["parse_webp", "build_checker_webp", "attach_webp_payload", "WEBP_DIM"]

_MAX_PIXELS = 1 << 26

# order in which the 3-bit code-length-code lengths arrive (spec §"Decoding
# the Code Lengths" — a structural permutation like Deflate's, not data)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# Near-distance map (spec §"Distance Mapping"): distance codes 1..120 name a
# pixel in the causal 8-row neighborhood above/left of the current one. The
# spec prints the mapping as a 120-row (dx, dy) list, but the list is a
# closed form — the neighborhood {(dx, dy): 0 <= dy <= 7, -7 <= dx <= 8,
# dy > 0 or dx > 0} sorted "by closeness": squared euclidean distance
# ascending, ties by |dx| ascending, then +dx before -dx. The anchor test
# pins this derivation against the spec's own rows (first 10, last 8, and
# the 6-way tie groups at dx²+dy² = 25, 50, 65).
_NEAR_DIST: tuple[tuple[int, int], ...] = tuple(
    sorted(
        ((x, y) for y in range(8) for x in range(-7, 9) if y > 0 or x > 0),
        key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0),
    )
)


class _Bits:
    """LSB-first bit reader over the whole payload (VP8L packs bits into
    bytes little-endian-first, like GIF/Deflate)."""

    def __init__(self, data: bytes):
        self._big = int.from_bytes(data, "little")
        self._n = 8 * len(data)
        self.pos = 0

    def read(self, k: int) -> int:
        if self.pos + k > self._n:
            raise ValueError("VP8L bitstream truncated")
        v = (self._big >> self.pos) & ((1 << k) - 1)
        self.pos += k
        return v

    def bit(self) -> int:
        return self.read(1)


class _Prefix:
    """Canonical prefix decoder. Codes are assigned Deflate-style from the
    length array (lengths sorted ascending, ties by symbol order) and read
    most-significant-bit first from the LSB-first stream — the Deflate
    convention VP8L shares. A code with exactly one used symbol is
    trivial: it consumes zero bits."""

    def __init__(self, lengths: list[int]):
        used = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ValueError("VP8L prefix code with no symbols")
        if len(used) == 1:
            self.trivial = used[0][1]
            return
        self.trivial = None
        # Kraft completeness: an under- or over-subscribed code leaves
        # bit patterns undecodable / ambiguous — fail-stop like zlib
        kraft = sum(2 ** -ln for ln, _ in used)
        if abs(kraft - 1.0) > 1e-12:
            raise ValueError(f"incomplete/oversubscribed prefix code (Kraft {kraft})")
        self.table: dict[tuple[int, int], int] = {}
        code = 0
        prev_len = 0
        for ln, sym in sorted(used):
            code <<= ln - prev_len
            prev_len = ln
            self.table[(ln, code)] = sym
            code += 1
        self.max_len = used and max(ln for ln, _ in used)

    @classmethod
    def simple(cls, symbols: list[int]) -> "_Prefix":
        p = cls.__new__(cls)
        if len(symbols) == 1:
            p.trivial = symbols[0]
            return p
        p.trivial = None
        p.table = {(1, 0): symbols[0], (1, 1): symbols[1]}
        p.max_len = 1
        return p

    def read(self, br: _Bits) -> int:
        if self.trivial is not None:
            return self.trivial
        code = 0
        ln = 0
        while True:
            code = (code << 1) | br.bit()
            ln += 1
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
            if ln > self.max_len:
                raise ValueError("invalid VP8L prefix code in stream")


def _read_prefix_code(br: _Bits, alphabet_size: int) -> _Prefix:
    """One prefix code: 'simple' (1-2 stream-carried symbols) or 'normal'
    (canonical code from code lengths, themselves coded by a stream-carried
    code-length code with zero-run symbols 16/17/18 — Deflate's scheme with
    VP8L's arrival order and optional max-symbol limit)."""
    if br.bit():  # simple
        num_symbols = 1 + br.bit()
        if br.bit():  # first symbol is 8 bits
            s0 = br.read(8)
        else:
            s0 = br.read(1)
        syms = [s0]
        if num_symbols == 2:
            syms.append(br.read(8))
        for s in syms:
            if s >= alphabet_size:
                raise ValueError(f"simple-code symbol {s} >= alphabet {alphabet_size}")
        return _Prefix.simple(syms)
    num_code_lengths = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _Prefix(cl_lengths)
    if br.bit():  # explicit number of coded symbols
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    i = 0
    while i < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        cl = cl_code.read(br)
        if cl < 16:
            lengths[i] = cl
            i += 1
            if cl:
                prev_len = cl
        else:
            if cl == 16:
                repeat, val = 3 + br.read(2), prev_len
            elif cl == 17:
                repeat, val = 3 + br.read(3), 0
            else:
                repeat, val = 11 + br.read(7), 0
            if i + repeat > alphabet_size:
                raise ValueError("VP8L code-length repeat overruns alphabet")
            for _ in range(repeat):
                lengths[i] = val
                i += 1
    return _Prefix(lengths)


def _lz77_value(prefix: int, br: _Bits) -> int:
    """LZ77 length/distance from its prefix symbol + extra bits (the
    spec's closed-form rule)."""
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.read(extra) + 1


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _cache_key(argb: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


def _decode_image_stream(br: _Bits, w: int, h: int, top_level: bool):
    """Decode one (sub-)image stream. Returns (argb ndarray (h, w) uint32,
    transforms list) — transforms non-empty only at top level, in stream
    order, each carrying what its inverse needs."""
    transforms: list[tuple] = []
    seen_types: set[int] = set()
    if top_level:
        while br.bit():
            ttype = br.read(2)
            if ttype in seen_types:
                raise ValueError(f"VP8L transform {ttype} appears twice")
            seen_types.add(ttype)
            if ttype in (0, 1):  # predictor / color
                size_bits = br.read(3) + 2
                bw, bh = _sub_size(w, size_bits), _sub_size(h, size_bits)
                timg, _ = _decode_image_stream(br, bw, bh, False)
                transforms.append((ttype, size_bits, timg))
            elif ttype == 2:  # subtract green
                transforms.append((2,))
            else:  # color indexing
                n_colors = br.read(8) + 1
                pal_img, _ = _decode_image_stream(br, n_colors, 1, False)
                # palette entries are componentwise delta-coded
                pal = pal_img[0].astype(np.uint32)
                out = np.zeros(n_colors, dtype=np.uint32)
                prev = 0
                for i in range(n_colors):
                    cur = 0
                    for shift in (24, 16, 8, 0):
                        c = (((prev >> shift) & 0xFF) + ((int(pal[i]) >> shift) & 0xFF)) & 0xFF
                        cur |= c << shift
                    out[i] = cur
                    prev = cur
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((3, width_bits, out, w))
                w = _sub_size(w, width_bits)  # spatial decode runs packed
    cache_bits = 0
    if br.bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L color-cache bits {cache_bits} out of [1, 11]")
    meta = None
    huff_bits = 0
    num_groups = 1
    if top_level and br.bit():
        huff_bits = br.read(3) + 2
        mw, mh = _sub_size(w, huff_bits), _sub_size(h, huff_bits)
        meta, _ = _decode_image_stream(br, mw, mh, False)
        num_groups = int(((meta >> 8) & 0xFFFF).max()) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(num_groups):
        g = _read_prefix_code(br, 256 + 24 + cache_size)
        r = _read_prefix_code(br, 256)
        b = _read_prefix_code(br, 256)
        a = _read_prefix_code(br, 256)
        d = _read_prefix_code(br, 40)
        groups.append((g, r, b, a, d))
    npix = w * h
    out = np.zeros(npix, dtype=np.uint32)
    cache = [0] * cache_size
    pos = 0
    x = 0
    y = 0
    while pos < npix:
        if meta is not None:
            gi = int((int(meta[y >> huff_bits, x >> huff_bits]) >> 8) & 0xFFFF)
            if gi >= num_groups:
                raise ValueError("VP8L meta group index out of range")
        else:
            gi = 0
        cg, cr, cb, ca, cd = groups[gi]
        s = cg.read(br)
        if s < 256:  # literal
            red = cr.read(br)
            blue = cb.read(br)
            alpha = ca.read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            if cache_size:
                cache[_cache_key(px, cache_bits)] = px
            pos += 1
            x += 1
            if x == w:
                x, y = 0, y + 1
        elif s < 256 + 24:  # backward reference
            length = _lz77_value(s - 256, br)
            dist_code = _lz77_value(cd.read(br), br)
            if dist_code <= 120:
                # 2-D neighbor offset; a left-of-origin offset on row 0..
                # small widths can go non-positive — the spec clamps to 1
                dx, dy = _NEAR_DIST[dist_code - 1]
                dist = max(1, dy * w + dx)
            else:
                dist = dist_code - 120
            if dist > pos:
                raise ValueError("VP8L backward reference before image start")
            if pos + length > npix:
                raise ValueError("VP8L backward reference overruns image")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                if cache_size:
                    cache[_cache_key(px, cache_bits)] = px
                pos += 1
                x += 1
                if x == w:
                    x, y = 0, y + 1
        else:  # color-cache reference
            if not cache_size:
                raise ValueError("VP8L cache symbol without a color cache")
            px = cache[s - 256 - 24]
            out[pos] = px
            cache[_cache_key(px, cache_bits)] = px
            pos += 1
            x += 1
            if x == w:
                x, y = 0, y + 1
    return out.reshape(h, w), transforms


def _avg2(a: int, b: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        out |= ((((a >> shift) & 0xFF) + ((b >> shift) & 0xFF)) >> 1) << shift
    return out


def _add_pixels(a: int, b: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        out |= ((((a >> shift) & 0xFF) + ((b >> shift) & 0xFF)) & 0xFF) << shift
    return out


def _select(left: int, top: int, topleft: int) -> int:
    p_l = p_t = 0
    for shift in (24, 16, 8, 0):
        lc = (left >> shift) & 0xFF
        tc = (top >> shift) & 0xFF
        tlc = (topleft >> shift) & 0xFF
        p = lc + tc - tlc
        p_l += abs(p - lc)
        p_t += abs(p - tc)
    # the spec's pseudo-code decides with a single strict comparison
    # (`if (pL < pT) return L; else return T`), so the tie (p_l == p_t)
    # resolves to TOP
    return left if p_l < p_t else top


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        v = ((l >> shift) & 0xFF) + ((t >> shift) & 0xFF) - ((tl >> shift) & 0xFF)
        out |= max(0, min(255, v)) << shift
    return out


def _clamp_add_sub_half(l: int, t: int, tl: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        a = (((l >> shift) & 0xFF) + ((t >> shift) & 0xFF)) >> 1
        b = (tl >> shift) & 0xFF
        v = a + int((a - b) / 2)  # C-style truncation toward zero
        out |= max(0, min(255, v)) << shift
    return out


def _predict(mode: int, l: int, t: int, tr: int, tl: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(l, t, tl)
    raise ValueError(f"VP8L predictor mode {mode} out of range")


def _inv_predictor(img: np.ndarray, size_bits: int, timg: np.ndarray) -> np.ndarray:
    h, w = img.shape
    out = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[0, x - 1])  # row 0: Left
            elif x == 0:
                pred = int(out[y - 1, 0])  # column 0: Top
            else:
                mode = (int(timg[y >> size_bits, x >> size_bits]) >> 8) & 0xFF
                l = int(out[y, x - 1])
                t = int(out[y - 1, x])
                tl = int(out[y - 1, x - 1])
                # top-right of the last column: top[x+1] in the spec's
                # contiguous buffer is argb[(y-1)*w + w] = argb[y*w] —
                # the CURRENT row's leftmost pixel (already decoded,
                # x > 0 here)
                tr = int(out[y - 1, x + 1]) if x + 1 < w else int(out[y, 0])
                pred = _predict(mode, l, t, tr, tl)
            out[y, x] = _add_pixels(int(img[y, x]), pred)
    return out


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _inv_color(img: np.ndarray, size_bits: int, timg: np.ndarray) -> np.ndarray:
    h, w = img.shape
    out = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            cte = int(timg[y >> size_bits, x >> size_bits])
            g2r = cte & 0xFF
            g2b = (cte >> 8) & 0xFF
            r2b = (cte >> 16) & 0xFF
            px = int(img[y, x])
            a = (px >> 24) & 0xFF
            r = (px >> 16) & 0xFF
            g = (px >> 8) & 0xFF
            b = px & 0xFF
            r = (r + ((_s8(g2r) * _s8(g)) >> 5)) & 0xFF
            b = (b + ((_s8(g2b) * _s8(g)) >> 5) + ((_s8(r2b) * _s8(r)) >> 5)) & 0xFF
            out[y, x] = (a << 24) | (r << 16) | (g << 8) | b
    return out


def _inv_subtract_green(img: np.ndarray) -> np.ndarray:
    a = (img >> 24) & 0xFF
    r = (img >> 16) & 0xFF
    g = (img >> 8) & 0xFF
    b = img & 0xFF
    r = (r + g) & 0xFF
    b = (b + g) & 0xFF
    return (a << 24) | (r << 16) | (g << 8) | b


def _inv_color_index(
    img: np.ndarray, width_bits: int, palette: np.ndarray, full_w: int
) -> np.ndarray:
    h, packed_w = img.shape
    out = np.zeros((h, full_w), dtype=np.uint32)
    bits_per_px = 8 >> width_bits
    mask = (1 << bits_per_px) - 1 if width_bits else 0xFF
    per = 1 << width_bits
    for y in range(h):
        for x in range(full_w):
            packed = int(img[y, x >> width_bits]) if width_bits else int(img[y, x])
            green = (packed >> 8) & 0xFF
            if width_bits:
                idx = (green >> ((x % per) * bits_per_px)) & mask
            else:
                idx = green
            # spec: out-of-range palette index decodes transparent black
            out[y, x] = palette[idx] if idx < len(palette) else 0
    return out


def parse_webp(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """WebP-lossless decode under the ``parse_image`` contract: returns
    (width, height, 4, RGBA uint8 pixels). Lossy VP8 payloads gate with
    NotImplementedError (VP8 intra decode is H.264-class entropy coding);
    a VP8X extended container is walked for a VP8L chunk."""
    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError(f"not a WebP file (magic {bytes(data[:4])!r})")
    riff_size = struct.unpack("<I", data[4:8])[0]
    if riff_size + 8 > len(data):
        raise ValueError("WebP RIFF size exceeds payload")
    pos = 12
    vp8l = None
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"WebP chunk {fourcc!r} truncated")
        if fourcc == b"VP8L":
            vp8l = body
            break
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "lossy WebP (VP8) needs boolean-arithmetic entropy decode "
                "with tabulated probability defaults — only lossless VP8L "
                "decodes natively"
            )
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if vp8l is None:
        raise ValueError("WebP container has no VP8L chunk")
    if not vp8l or vp8l[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _Bits(vp8l[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.bit()  # alpha-is-used hint (informational)
    version = br.read(3)
    if version != 0:
        raise ValueError(f"unsupported VP8L version {version}")
    if w * h > _MAX_PIXELS:
        raise ValueError(f"implausible VP8L dimensions {w}x{h}")
    # color-indexing shrinks the spatially-coded width; the stream is
    # decoded at the packed size and inverses restore full width
    img, transforms = _decode_image_stream(br, w, h, True)
    for tr in reversed(transforms):
        if tr[0] == 0:
            img = _inv_predictor(img, tr[1], tr[2])
        elif tr[0] == 1:
            img = _inv_color(img, tr[1], tr[2])
        elif tr[0] == 2:
            img = _inv_subtract_green(img)
        else:
            img = _inv_color_index(img, tr[1], tr[2], tr[3])
    if img.shape != (h, w):
        raise ValueError("VP8L transform chain produced wrong dimensions")
    rgba = np.zeros((h, w, 4), dtype=np.uint8)
    rgba[..., 0] = (img >> 16) & 0xFF
    rgba[..., 1] = (img >> 8) & 0xFF
    rgba[..., 2] = img & 0xFF
    rgba[..., 3] = (img >> 24) & 0xFF
    return w, h, 4, rgba


# ---------------------------------------------------------------------------
# synthesis (driver-oracle path + test-side round-trip partner)
# ---------------------------------------------------------------------------


class _BitsW:
    """LSB-first bit writer (the encoder half of _Bits)."""

    def __init__(self):
        self.big = 0
        self.pos = 0

    def write(self, v: int, k: int) -> None:
        if v >> k:
            raise ValueError(f"value {v} does not fit {k} bits")
        self.big |= v << self.pos
        self.pos += k

    def write_code(self, code: int, k: int) -> None:
        """Prefix-code bits go MSB-first (the Deflate convention VP8L
        shares), unlike plain values which pack LSB-first."""
        for i in range(k - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        return self.big.to_bytes((self.pos + 7) // 8, "little")


def _write_zero_run(bw: _BitsW, cl_codes: dict[int, tuple[int, int]], n: int) -> None:
    """Emit n zero code-lengths via symbols 17 (3-10 zeros) / 18 (11-138):
    any n >= 3 is representable; the synth chooses symbol positions so
    runs of 1-2 never occur."""
    while n:
        if n >= 11:
            take = min(n, 138)
            if 0 < n - take < 3:
                take -= 3 - (n - take)
            if take >= 11:
                code, ln = cl_codes[18]
                bw.write_code(code, ln)
                bw.write(take - 11, 7)
                n -= take
                continue
        if 3 <= n <= 10:
            code, ln = cl_codes[17]
            bw.write_code(code, ln)
            bw.write(n - 3, 3)
            n = 0
            continue
        raise ValueError(f"zero run of {n} is not representable (needs >= 3)")


def _write_two_symbol_normal_code(bw: _BitsW, alphabet: int, s0: int, s1: int) -> None:
    """A NORMAL (code-length-coded) prefix code assigning length-1 codes to
    s0 < s1 — deliberately exercises the stream-carried code-length-code
    machinery the driver oracle hash-verifies. Gaps between/around the
    symbols must be 0 or >= 3 zeros (run-length symbols can't say 1-2)."""
    if not (0 <= s0 < s1 < alphabet):
        raise ValueError("need two ascending symbols inside the alphabet")
    bw.write(0, 1)  # not simple
    bw.write(0, 4)  # num_code_lengths = 4: order positions 17, 18, 0, 1
    # code-length-code lengths: sym17 -> 2, sym18 -> 2, sym0 -> 0, sym1 -> 1
    for ln in (2, 2, 0, 1):
        bw.write(ln, 3)
    bw.write(0, 1)  # no explicit max-symbol: runs cover the full alphabet
    # canonical cl-code: sym1 = '0' (1 bit); sym17 = '10', sym18 = '11'
    cl = {1: (0b0, 1), 17: (0b10, 2), 18: (0b11, 2)}
    pos = 0
    for s in (s0, s1):
        if s - pos:
            _write_zero_run(bw, cl, s - pos)
        code, ln = cl[1]
        bw.write_code(code, ln)  # length 1 at this symbol
        pos = s + 1
    if alphabet - pos:
        _write_zero_run(bw, cl, alphabet - pos)


def _write_three_symbol_normal_code(
    bw: _BitsW, alphabet: int, s0: int, s1: int, s2: int
) -> None:
    """A NORMAL prefix code with lengths (1, 2, 2) at s0 < s1 < s2 —
    canonical assignment: s0 -> 0, s1 -> 10, s2 -> 11. Same zero-run
    constraint as the two-symbol writer: every gap must be 0 or >= 3."""
    if not (0 <= s0 < s1 < s2 < alphabet):
        raise ValueError("need three ascending symbols inside the alphabet")
    bw.write(0, 1)  # not simple
    bw.write(1, 4)  # num_code_lengths = 5: order positions 17, 18, 0, 1, 2
    # cl-code lengths: sym17 -> 2, sym18 -> 2, sym0 -> 0, sym1 -> 2, sym2 -> 2
    for ln in (2, 2, 0, 2, 2):
        bw.write(ln, 3)
    bw.write(0, 1)  # no explicit max-symbol
    # canonical cl-code (all length 2, by symbol): 1->00, 2->01, 17->10, 18->11
    cl = {1: (0b00, 2), 2: (0b01, 2), 17: (0b10, 2), 18: (0b11, 2)}
    pos = 0
    for s, ln_sym in ((s0, 1), (s1, 2), (s2, 2)):
        if s - pos:
            _write_zero_run(bw, cl, s - pos)
        code, ln = cl[ln_sym]
        bw.write_code(code, ln)
        pos = s + 1
    if alphabet - pos:
        _write_zero_run(bw, cl, alphabet - pos)


def _lz77_code(value: int) -> tuple[int, int, int]:
    """Inverse of ``_lz77_value``: (prefix symbol, extra-bit payload,
    number of extra bits) for an LZ77 length/distance value >= 1."""
    if value <= 4:
        return value - 1, 0, 0
    p = 4
    while True:
        extra = (p - 2) >> 1
        off = (2 + (p & 1)) << extra
        if off + 1 <= value <= off + (1 << extra):
            return p, value - off - 1, extra
        p += 1


def _write_simple_code(bw: _BitsW, symbols: list[int]) -> None:
    bw.write(1, 1)  # simple
    bw.write(len(symbols) - 1, 1)
    bw.write(1, 1)  # first symbol in 8 bits
    bw.write(symbols[0], 8)
    if len(symbols) == 2:
        bw.write(symbols[1], 8)


def _wrap_riff(vp8l_payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(vp8l_payload)) + vp8l_payload
    if len(vp8l_payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def build_checker_webp(w: int, h: int, g1: int, g2: int) -> bytes:
    """A complete lossless WebP whose pixels checker between the grays g1
    and g2 ((x+y) even -> g1): rows 0-1 are literals, every row >= 2 is one
    LZ77 backward reference at NEAR-distance code 5 = offset (0, 2) (the
    checker's vertical period), so green is a three-symbol NORMAL code
    (g1, g2, and the row-length prefix — canonical codes built from
    code-length-coded lengths), red/blue are two-symbol NORMAL codes,
    alpha and distance are simple codes. The decode therefore exercises
    the stream-carried canonical-code machinery AND the derived
    120-entry near-distance map on every payload. Requires only the
    zero-run constraint: g1 >= 3 and g2 - g1 - 1 >= 3 (the synth uses
    g2 = g1 + 4). Deterministic bytes for the SQL-literal synth."""
    if g2 - g1 - 1 < 3 or g1 < 3:
        raise ValueError("symbol gaps must be >= 3 zeros for the run coder")
    bw = _BitsW()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes
    len_prefix, len_extra, len_extra_bits = _lz77_code(w)  # row-copy length
    _write_three_symbol_normal_code(bw, 256 + 24, g1, g2, 256 + len_prefix)
    _write_two_symbol_normal_code(bw, 256, g1, g2)  # red
    _write_two_symbol_normal_code(bw, 256, g1, g2)  # blue
    _write_simple_code(bw, [255])  # alpha
    # distance code 5 -> near offset (0, 2) -> dist = 2w: prefix 4 + 1 extra
    _write_simple_code(bw, [4])  # distance (trivial: reads zero bits)
    for y in range(min(h, 2)):
        for x in range(w):
            bit = (x + y) & 1  # canonical: g1 -> '0', g2 -> '10'
            bw.write_code((0b0, 0b10)[bit], 1 + bit)  # green
            bw.write_code(bit, 1)  # red
            bw.write_code(bit, 1)  # blue
    for _ in range(h - 2):  # one backward reference per remaining row
        bw.write_code(0b11, 2)  # green: the length-prefix symbol
        if len_extra_bits:
            bw.write(len_extra, len_extra_bits)
        bw.write(0, 1)  # distance extra bit: code 4 + 0 + 1 = 5
    return _wrap_riff(b"\x2f" + bw.bytes())


WEBP_DIM = 10  # 10x10 checkerboard per document


def attach_webp_payload(df, source_col: str = "text", payload_col: str = "payload"):
    """Deterministic REAL lossless WebP per row, built JVM-side: md5
    nibble 1 draws the base gray g = 16*nib + 8 and the per-row expression
    selects among 16 complete files encoded once at SQL-construction time.
    Each is a g/(g+4) checkerboard through NORMAL prefix codes with rows
    >= 2 as near-distance backward references, so the decoded mean has the
    closed form g + 2 (oracles.webp_decode_oracle) — a bit-order,
    canonical-assignment, zero-run, RIFF-walk, or near-distance-map bug
    on either side breaks the hash."""
    from pyspark.sql import functions as F

    nib = f"cast(conv(substring(md5(`{source_col}`), 1, 1), 16, 10) as int)"
    variants = ", ".join(
        f"'{build_checker_webp(WEBP_DIM, WEBP_DIM, 16 * v + 8, 16 * v + 12).hex()}'"
        for v in range(16)
    )
    return df.withColumn(
        payload_col, F.expr(f"unhex(elt({nib} + 1, {variants}))")
    ).withColumn("media_type", F.lit("image/webp"))
