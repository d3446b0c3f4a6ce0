"""WebP-lossless (VP8L) decode (operators/vp8l.py).

The test-side encoder here is written from the declared bit conventions
(values LSB-first, prefix-code bits in read order via an explicit bit
STRING, canonical two-symbol codes hardcoded as '0'/'1', the code-length
code hardcoded as sym1='0', sym17='10', sym18='11'), independently of the
operator's _BitsW/_write helpers — a bit-order or canonical-assignment
bug in the decoder cannot cancel against the synth path.
"""
from __future__ import annotations

import struct

import numpy as np
import pytest

from pgvectorscale_spark.operators.vp8l import (
    WEBP_DIM,
    build_checker_webp,
    parse_webp,
)


class W:
    """Test-side bit writer: write(v, k) packs k bits LSB-first (values);
    code('10') writes bits in DECODER READ ORDER (first char = first bit
    the decoder consumes = the code's MSB)."""

    def __init__(self):
        self.big, self.pos = 0, 0

    def write(self, v, k):
        assert v >> k == 0
        self.big |= v << self.pos
        self.pos += k

    def code(self, bits: str):
        for ch in bits:
            self.write(int(ch), 1)

    def payload(self) -> bytes:
        return self.big.to_bytes((self.pos + 7) // 8, "little")


def riff(vp8l: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def header(w, width, height):
    w.write(width - 1, 14)
    w.write(height - 1, 14)
    w.write(0, 1)  # alpha hint
    w.write(0, 3)  # version


def simple1(w, sym):
    """Simple prefix code, one 8-bit symbol (0-bit code)."""
    w.write(1, 1)
    w.write(0, 1)
    w.write(1, 1)
    w.write(sym, 8)


def simple2(w, s0, s1):
    """Simple prefix code, two 8-bit symbols (1-bit codes: s0='0')."""
    w.write(1, 1)
    w.write(1, 1)
    w.write(1, 1)
    w.write(s0, 8)
    w.write(s1, 8)


def zeros(w, n):
    """Zero-length runs through code-length symbols 17 ('10') / 18 ('11')."""
    while n:
        if n >= 11:
            take = min(n, 138)
            if 0 < n - take < 3:
                take -= 3 - (n - take)
            if take >= 11:
                w.code("11")
                w.write(take - 11, 7)
                n -= take
                continue
        assert 3 <= n <= 10, n
        w.code("10")
        w.write(n - 3, 3)
        n = 0


def normal2(w, alphabet, s0, s1):
    """Normal (code-length-coded) prefix code giving s0 < s1 length-1
    codes (s0='0', s1='1'); leading/middle gaps must be 0 or >= 3. Uses
    the EXPLICIT max-symbol path (unlike the operator's synth, which
    covers the run-to-end-of-alphabet route), so trailing zeros need no
    run symbols and both stop rules get exercised across the suite."""
    ops: list[tuple] = []

    def zr(n):
        while n:
            if n >= 11:
                take = min(n, 138)
                if 0 < n - take < 3:
                    take -= 3 - (n - take)
                if take >= 11:
                    ops.append(("code", "11"))
                    ops.append(("bits", take - 11, 7))
                    n -= take
                    continue
            assert 3 <= n <= 10, n
            ops.append(("code", "10"))
            ops.append(("bits", n - 3, 3))
            n = 0

    zr(s0)
    ops.append(("code", "0"))  # cl symbol 1: length 1 at this position
    zr(s1 - s0 - 1)
    ops.append(("code", "0"))
    nreads = sum(1 for o in ops if o[0] == "code")
    w.write(0, 1)  # not simple
    w.write(0, 4)  # 4 code lengths arrive: order positions 17, 18, 0, 1
    for ln in (2, 2, 0, 1):
        w.write(ln, 3)
    w.write(1, 1)  # explicit max-symbol count follows
    w.write(3, 3)  # length_nbits = 2 + 2*3 = 8
    w.write(nreads - 2, 8)  # max_symbol = 2 + this = number of cl reads
    for o in ops:
        if o[0] == "code":
            w.code(o[1])
        else:
            w.write(o[1], o[2])


def decode(vp8l_bits: W):
    return parse_webp(riff(b"\x2f" + vp8l_bits.payload()))


def no_extras(w):
    w.write(0, 1)  # no transforms (top level call sites only)
    w.write(0, 1)  # no color cache
    w.write(0, 1)  # no meta


def test_checker_roundtrip_and_mean():
    data = build_checker_webp(10, 10, 40, 44)
    w, h, ch, px = parse_webp(data)
    assert (w, h, ch) == (10, 10, 4)
    exp = np.fromfunction(lambda y, x: np.where((x + y) % 2 == 0, 40, 44), (10, 10))
    for c in range(3):
        assert (px[..., c] == exp).all()
    assert (px[..., 3] == 255).all()
    assert px[..., :3].mean() == 42.0


def test_driver_variants_closed_form():
    for nib in range(16):
        g = 16 * nib + 8
        _, _, _, px = parse_webp(build_checker_webp(WEBP_DIM, WEBP_DIM, g, g + 4))
        assert px[..., :3].mean() == g + 2


def test_literal_rgba_simple_codes():
    """2x2 with distinct per-channel simple codes; exact pixel compare."""
    w = W()
    header(w, 2, 2)
    no_extras(w)
    simple2(w, 10, 20)  # green
    simple2(w, 30, 40)  # red
    simple2(w, 50, 60)  # blue
    simple2(w, 200, 255)  # alpha
    simple1(w, 0)  # distance
    # pixels: (g,r,b,a) picks: p0 all-first, p1 all-second, p2 mixed, p3 mixed
    picks = [(0, 0, 0, 0), (1, 1, 1, 1), (0, 1, 0, 1), (1, 0, 1, 0)]
    for pg, pr, pb, pa in picks:
        w.code(str(pg))
        w.code(str(pr))
        w.code(str(pb))
        w.code(str(pa))
    ww, hh, ch, px = decode(w)
    assert (ww, hh, ch) == (2, 2, 4)
    g = [10, 20]
    r = [30, 40]
    b = [50, 60]
    a = [200, 255]
    flat = px.reshape(-1, 4)
    for i, (pg, pr, pb, pa) in enumerate(picks):
        assert tuple(flat[i]) == (r[pr], g[pg], b[pb], a[pa]), i


def test_color_cache_hit():
    """Literal pixel, then a cache reference reproducing it: the cache
    symbol index is the spec's multiplicative hash of the ARGB value."""
    cache_bits = 4
    g, r, b, a = 7, 9, 11, 255
    argb = (a << 24) | (r << 16) | (g << 8) | b
    key = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)
    w = W()
    header(w, 2, 1)
    w.write(0, 1)  # no transforms
    w.write(1, 1)  # color cache
    w.write(cache_bits, 4)
    w.write(0, 1)  # no meta
    normal2(w, 256 + 24 + 16, g, 256 + 24 + key)  # green: literal + cache hit
    simple1(w, r)
    simple1(w, b)
    simple1(w, a)
    simple1(w, 0)
    w.code("0")  # literal pixel
    w.code("1")  # cache reference
    _, _, _, px = decode(w)
    assert tuple(px[0, 0]) == (r, g, b, a)
    assert tuple(px[0, 1]) == (r, g, b, a)


def test_subtract_green_inverse():
    w = W()
    header(w, 1, 1)
    w.write(1, 1)  # a transform follows
    w.write(2, 2)  # subtract-green
    w.write(0, 1)  # no more transforms
    w.write(0, 1)  # no cache
    w.write(0, 1)  # no meta
    simple1(w, 100)  # green
    simple1(w, 30)  # red (stored = r - g mod 256)
    simple1(w, 250)  # blue
    simple1(w, 255)  # alpha
    simple1(w, 0)  # distance
    _, _, _, px = decode(w)
    assert tuple(px[0, 0]) == ((30 + 100) % 256, 100, (250 + 100) % 256, 255)


def test_predictor_transform_left_mode():
    """4x1 image under predictor mode 1 (Left): pixel 0 predicts from
    0xff000000, the rest accumulate the stored residuals mod 256."""
    w = W()
    header(w, 4, 1)
    w.write(1, 1)
    w.write(0, 2)  # predictor transform
    w.write(0, 3)  # size_bits = 2 -> one 4x4 block for a 4x1 image
    # sub-image (1x1): mode rides the GREEN channel
    w.write(0, 1)  # (sub-image) no cache
    simple1(w, 1)  # green = mode 1 (Left)
    simple1(w, 0)
    simple1(w, 0)
    simple1(w, 0)
    simple1(w, 0)
    w.write(0, 1)  # no more transforms
    w.write(0, 1)  # no cache
    w.write(0, 1)  # no meta
    # residuals: greens 5, reds 3, blues 2, alpha 0 every pixel
    simple1(w, 5)
    simple1(w, 3)
    simple1(w, 2)
    simple1(w, 0)
    simple1(w, 0)
    _, _, _, px = decode(w)
    # pixel 0: pred 0xff000000 -> (3, 5, 2, 0xff+0 mod 256 = 255)
    assert tuple(px[0, 0]) == (3, 5, 2, 255)
    for x in range(1, 4):
        prev = px[0, x - 1].astype(int)
        assert tuple(px[0, x]) == (
            (prev[0] + 3) % 256,
            (prev[1] + 5) % 256,
            (prev[2] + 2) % 256,
            (prev[3] + 0) % 256,
        )


def test_color_transform_inverse():
    """1x1 under a color transform: r += (g2r*g)>>5, then
    b += (g2b*g)>>5 + (r2b*r_new)>>5, all signed-8-bit products."""
    g2r, g2b, r2b = 64, 32, 0xF0  # r2b negative as int8 (-16)
    w = W()
    header(w, 1, 1)
    w.write(1, 1)
    w.write(1, 2)  # color transform
    w.write(0, 3)  # size_bits = 2
    w.write(0, 1)  # (sub-image) no cache
    # cte pixel: blue = g2r, green = g2b, red = r2b
    simple1(w, g2b)  # green
    simple1(w, r2b)  # red
    simple1(w, g2r)  # blue
    simple1(w, 0)  # alpha
    simple1(w, 0)
    w.write(0, 1)
    w.write(0, 1)
    w.write(0, 1)
    g, r_st, b_st = 40, 10, 20
    simple1(w, g)
    simple1(w, r_st)
    simple1(w, b_st)
    simple1(w, 255)
    simple1(w, 0)
    _, _, _, px = decode(w)

    def s8(v):
        return v - 256 if v >= 128 else v

    r_new = (r_st + ((s8(g2r) * s8(g)) >> 5)) & 0xFF
    b_new = (b_st + ((s8(g2b) * s8(g)) >> 5) + ((s8(r2b) * s8(r_new)) >> 5)) & 0xFF
    assert tuple(px[0, 0]) == (r_new, g, b_new, 255)


def test_color_indexing_packed():
    """4x1 image, 3-color palette (width_bits=2: four 2-bit indices per
    packed green byte, so the spatial image is ONE packed pixel wide);
    palette entries are delta-coded; index 3 is out of range and decodes
    transparent black per spec."""
    w = W()
    header(w, 4, 1)
    w.write(1, 1)
    w.write(3, 2)  # color indexing
    w.write(2, 8)  # 3 colors
    # palette sub-image 3x1, DELTA coded: entries e0, e0+d1, e0+d1+d2
    w.write(0, 1)  # (sub-image) no cache
    simple2(w, 10, 5)  # greens: e0.g=10, deltas 5, 5
    simple2(w, 100, 50)  # reds
    simple2(w, 1, 2)  # blues
    simple2(w, 255, 0)  # alphas: e0.a=255, deltas 0
    simple1(w, 0)
    for bit_g, bit_r, bit_b, bit_a in ((0, 0, 0, 0), (1, 1, 1, 1), (1, 1, 1, 1)):
        w.code(str(bit_g))
        w.code(str(bit_r))
        w.code(str(bit_b))
        w.code(str(bit_a))
    w.write(0, 1)  # no more transforms
    w.write(0, 1)  # no cache
    w.write(0, 1)  # no meta
    # packed main image: one packed pixel; indices 0,1,2,3 ride the green
    # byte two bits each (lowest bits = leftmost x)
    packed = 0 | (1 << 2) | (2 << 4) | (3 << 6)
    simple1(w, packed)  # green
    simple1(w, 0)  # red
    simple1(w, 0)  # blue
    simple1(w, 255)  # alpha
    simple1(w, 0)
    ww, _, _, px = decode(w)
    assert ww == 4
    pal = [
        (100, 10, 1, 255),
        (150, 15, 3, 255),
        (200, 20, 5, 255),
    ]
    assert tuple(px[0, 0]) == pal[0]
    assert tuple(px[0, 1]) == pal[1]
    assert tuple(px[0, 2]) == pal[2]
    assert tuple(px[0, 3]) == (0, 0, 0, 0)  # out-of-range index


def test_lz77_plain_distance_copy():
    """Literal pixel then a length-3 distance-1 copy (distance code 121 =
    plain distance 1): four identical pixels."""
    w = W()
    header(w, 4, 1)
    no_extras(w)
    normal2(w, 256 + 24, 33, 258)  # green: literal 33, length-prefix 2 (len 3)
    simple1(w, 44)
    simple1(w, 55)
    simple1(w, 255)
    simple1(w, 13)  # distance prefix 13: offset 96 + extra(5 bits) + 1
    w.code("0")  # literal
    w.code("1")  # length symbol 258 -> length prefix 2 -> length 3
    w.write(24, 5)  # distance extra bits: 96 + 24 + 1 = 121 -> dist 1
    _, _, _, px = decode(w)
    for x in range(4):
        assert tuple(px[0, x]) == (44, 33, 55, 255)


def test_near_distance_table_closed_form():
    """The derived 120-entry map reproduces the spec's printed table: the
    causal 8-row neighborhood sorted by dx²+dy², ties |dx| then +dx first.
    Anchors are spec rows transcribed as CHECKS (first 10, last 8, and the
    6-way tie groups at squared distance 25, 50, and 65)."""
    from pgvectorscale_spark.operators.vp8l import _NEAR_DIST

    assert len(_NEAR_DIST) == 120
    assert len(set(_NEAR_DIST)) == 120
    # spec table rows 1..10
    assert _NEAR_DIST[:10] == (
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2),
        (2, 0), (1, 2), (-1, 2), (2, 1), (-2, 1),
    )
    # spec table rows 113..120
    assert _NEAR_DIST[-8:] == (
        (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
    )
    # the 6-way ties: dx²+dy² = 25 (rows 35-40), 50 (rows 41-46 area),
    # 65 (around row 98) — exactly the places a wrong tie rule shows up
    i25 = _NEAR_DIST.index((0, 5))
    assert _NEAR_DIST[i25 : i25 + 6] == (
        (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    )
    i50 = _NEAR_DIST.index((1, 7))
    assert _NEAR_DIST[i50 : i50 + 6] == (
        (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    )
    i65 = _NEAR_DIST.index((4, 7))
    assert _NEAR_DIST[i65 : i65 + 5] == (
        (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1),
    )
    # and (8, 0) at squared distance 64 sits immediately before that group
    assert _NEAR_DIST[i65 - 1] == (8, 0)


def test_lz77_near_distance_row_copy():
    """dist_code 1 = offset (0, 1) -> dist = w: a length-2 backward
    reference copies row 0 onto row 1 IN ORDER (red disambiguates dist = w
    from dist = 1, which would smear the last pixel instead)."""
    w = W()
    header(w, 2, 2)
    no_extras(w)
    normal2(w, 256 + 24, 33, 257)  # green: literal 33, length-prefix 1 (len 2)
    simple2(w, 44, 45)  # red: two literals to make order observable
    simple1(w, 55)
    simple1(w, 255)
    simple1(w, 0)  # distance prefix 0 -> dist_code 1 (near map: (0, 1))
    w.code("0")  # (0,0) green literal
    w.code("0")  # (0,0) red 44
    w.code("0")  # (1,0) green literal
    w.code("1")  # (1,0) red 45
    w.code("1")  # length symbol 257 -> length 2; distance reads 0 bits
    _, _, _, px = decode(w)
    assert tuple(px[0, 0]) == (44, 33, 55, 255)
    assert tuple(px[0, 1]) == (45, 33, 55, 255)
    assert tuple(px[1, 0]) == (44, 33, 55, 255)
    assert tuple(px[1, 1]) == (45, 33, 55, 255)


def test_lz77_near_distance_clamps_to_one():
    """dist_code 4 = offset (-1, 1): at width 1 that is dist 0, which the
    spec clamps to 1 — the reference degenerates to repeat-previous."""
    w = W()
    header(w, 1, 3)
    no_extras(w)
    normal2(w, 256 + 24, 33, 257)  # green: literal 33, length 2
    simple1(w, 44)
    simple1(w, 55)
    simple1(w, 255)
    simple1(w, 3)  # distance prefix 3 -> dist_code 4 (near map: (-1, 1))
    w.code("0")  # (0,0) literal
    w.code("1")  # length 2 backward ref at clamped dist 1
    _, _, _, px = decode(w)
    for y in range(3):
        assert tuple(px[y, 0]) == (44, 33, 55, 255)


def test_container_rejects_and_vp8x_walk():
    with pytest.raises(ValueError, match="not a WebP"):
        parse_webp(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(NotImplementedError, match="lossy WebP"):
        parse_webp(
            b"RIFF" + struct.pack("<I", 12) + b"WEBP"
            + b"VP8 " + struct.pack("<I", 0)
        )
    with pytest.raises(ValueError, match="no VP8L"):
        parse_webp(
            b"RIFF" + struct.pack("<I", 14) + b"WEBP"
            + b"ALPH" + struct.pack("<I", 2) + b"ab"
        )
    with pytest.raises(ValueError, match="signature"):
        parse_webp(
            b"RIFF" + struct.pack("<I", 13) + b"WEBP"
            + b"VP8L" + struct.pack("<I", 1) + b"\x00\x00"
        )
    # VP8X extended container: walk past it to the VP8L chunk
    good = build_checker_webp(4, 4, 8, 12)
    vp8l_chunk = good[12:]
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    body = b"WEBP" + vp8x + vp8l_chunk
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    ww, hh, ch, px = parse_webp(data)
    assert (ww, hh, ch) == (4, 4, 4)
    assert px[..., :3].mean() == 10.0


def test_truncated_stream_raises():
    good = bytearray(build_checker_webp(6, 6, 8, 12))
    with pytest.raises(ValueError):
        parse_webp(bytes(good[:-4]) )  # RIFF size now exceeds payload


def test_kraft_incomplete_code_rejected():
    """A normal code whose lengths are under-subscribed must fail-stop,
    not decode garbage: one symbol of length 2 and nothing else."""
    w = W()
    header(w, 1, 1)
    no_extras(w)
    w.write(0, 1)
    w.write(0, 4)
    for ln in (2, 2, 0, 2):  # sym17 -> 2, sym18 -> 2, sym0 -> 0, sym1 -> 2
        w.write(ln, 3)
    # the code-length code itself has lengths {17: 2, 18: 2, 1: 2} ->
    # Kraft 0.75 (incomplete) -> the decoder must fail-stop right here
    with pytest.raises(ValueError, match="prefix code"):
        decode(w)


def normal3(w, alphabet, s0, s1, s2):
    """Normal prefix code with lengths (1, 2, 2) at s0 < s1 < s2
    (canonical: s0='0', s1='10', s2='11'); cl-code symbols {1,2,17,18}
    all length 2 ('00','01','10','11'). Gaps must be 0 or >= 3. Uses the
    explicit max-symbol stop like normal2."""
    ops: list[tuple] = []

    def zr(n):
        while n:
            if n >= 11:
                take = min(n, 138)
                if 0 < n - take < 3:
                    take -= 3 - (n - take)
                if take >= 11:
                    ops.append(("code", "11"))
                    ops.append(("bits", take - 11, 7))
                    n -= take
                    continue
            assert 3 <= n <= 10, n
            ops.append(("code", "10"))
            ops.append(("bits", n - 3, 3))
            n = 0

    zr(s0)
    ops.append(("code", "00"))  # cl symbol 1: code length 1 here
    zr(s1 - s0 - 1)
    ops.append(("code", "01"))  # cl symbol 2: code length 2 here
    zr(s2 - s1 - 1)
    ops.append(("code", "01"))
    nreads = sum(1 for o in ops if o[0] == "code")
    w.write(0, 1)  # not simple
    w.write(1, 4)  # 5 code lengths arrive: order slots 17, 18, 0, 1, 2
    for ln in (2, 2, 0, 2, 2):
        w.write(ln, 3)
    w.write(1, 1)  # explicit max-symbol count follows
    w.write(3, 3)  # length_nbits = 8
    w.write(nreads - 2, 8)
    for o in ops:
        if o[0] == "code":
            w.code(o[1])
        else:
            w.write(o[1], o[2])


def test_predictor_top_right_wraps_to_current_row_start():
    """Mode 3 (top-right) at the rightmost column: top[x+1] in the
    spec's contiguous buffer is the CURRENT row's leftmost pixel — not
    the top row's. The red channel makes the two candidates differ."""
    w = W()
    header(w, 2, 2)
    w.write(1, 1)
    w.write(0, 2)  # predictor transform
    w.write(0, 3)  # size_bits=2: one block covers the 2x2 image
    w.write(0, 1)  # (sub-image) no cache
    simple1(w, 3)  # green = mode 3 (top-right)
    simple1(w, 0)
    simple1(w, 0)
    simple1(w, 0)
    simple1(w, 0)
    w.write(0, 1)  # no more transforms
    w.write(0, 1)  # no cache
    w.write(0, 1)  # no meta
    simple2(w, 0, 10)  # green residuals: {0, 10}
    simple2(w, 0, 7)  # red residuals: {0, 7}
    simple1(w, 0)  # blue
    simple1(w, 0)  # alpha
    simple1(w, 0)  # distance
    # raster order p(0,0) p(1,0) / p(0,1) p(1,1): greens 10,0,0,0; reds 0,0,7,0
    for gbit, rbit in ((1, 0), (0, 0), (0, 1), (0, 0)):
        w.code(str(gbit))
        w.code(str(rbit))
    _, _, _, px = decode(w)
    assert tuple(px[0, 0]) == (0, 10, 0, 255)
    assert tuple(px[0, 1]) == (0, 10, 0, 255)  # row 0: Left
    assert tuple(px[1, 0]) == (7, 10, 0, 255)  # col 0: Top, red +7
    # TR for (1,1) is px[1,0] (current row start), NOT px[0,0]
    assert tuple(px[1, 1]) == (7, 10, 0, 255)


def test_select_tie_resolves_to_top():
    """Mode 11 at a constructed exact tie (|T-TL| == |L-TL|, L != T):
    the spec's strict comparison returns T."""
    w = W()
    header(w, 2, 2)
    w.write(1, 1)
    w.write(0, 2)
    w.write(0, 3)
    w.write(0, 1)
    simple1(w, 11)  # mode 11 (Select)
    simple1(w, 0)
    simple1(w, 0)
    simple1(w, 0)
    simple1(w, 0)
    w.write(0, 1)
    w.write(0, 1)
    w.write(0, 1)
    normal3(w, 256 + 24, 0, 6, 250)  # green residuals {0, 6, 250}
    simple1(w, 0)  # red
    simple1(w, 0)  # blue
    simple1(w, 0)  # alpha
    simple1(w, 0)  # distance
    # greens: p(0,0)=6 -> TL g=6; p(1,0)=6 -> T g=12 (Left chain);
    # p(0,1)=250 -> L g=(6+250)%256=0 (Top chain); p(1,1)=0
    for code in ("10", "10", "11", "0"):
        w.code(code)
    _, _, _, px = decode(w)
    assert px[0, 0][1] == 6 and px[0, 1][1] == 12 and px[1, 0][1] == 0
    # pred = L+T-TL = 6 per green: |p-L| == |p-T| == 6 -> tie -> TOP
    assert px[1, 1][1] == 12
