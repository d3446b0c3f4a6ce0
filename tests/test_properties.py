"""Property-based invariants for the pure-numpy kernels (no Spark session).

The reference's kernel-level guarantees, checked over generated inputs:
distance symmetry/identity, normalization, quantizer determinism and
monotonicity, prune bounds.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pgvectorscale_spark.functions.distance import (
    np_cosine_distance,
    np_hamming,
    np_l2_squared,
    np_normalize,
)
from pgvectorscale_spark.operators.sbq import SbqQuantizer
from pgvectorscale_spark.operators.vamana import VamanaGraph

floats = st.floats(min_value=-100, max_value=100, allow_nan=False, width=32)


def vec(dim):
    return st.lists(floats, min_size=dim, max_size=dim)


@given(vec(8), vec(8))
@settings(max_examples=50, deadline=None)
def test_l2_symmetric_and_identity(a, b):
    a, b = np.array(a), np.array(b)
    d_ab = np_l2_squared(a.reshape(1, -1), b)[0]
    d_ba = np_l2_squared(b.reshape(1, -1), a)[0]
    assert abs(d_ab - d_ba) < 1e-6
    assert np_l2_squared(a.reshape(1, -1), a)[0] == 0.0
    assert d_ab >= 0.0


@given(vec(8))
@settings(max_examples=50, deadline=None)
def test_normalize_unit_or_zero(a):
    n = np.linalg.norm(np_normalize(np.array(a).reshape(1, -1))[0])
    assert abs(n - 1.0) < 1e-9 or n == 0.0  # zero vectors pass through


@given(vec(8), vec(8))
@settings(max_examples=50, deadline=None)
def test_cosine_range(a, b):
    d = np_cosine_distance(np.array(a).reshape(1, -1), np.array(b))[0]
    assert 0.0 <= d <= 2.0 + 1e-9


@given(st.integers(1, 2), st.lists(vec(16), min_size=3, max_size=8))
@settings(max_examples=30, deadline=None)
def test_quantizer_deterministic_self_zero(bits, rows):
    mat = np.array(rows)
    q = SbqQuantizer(mat.mean(axis=0), mat.var(axis=0), bits_per_dimension=bits)
    c1, c2 = q.quantize_matrix(mat), q.quantize_matrix(mat)
    assert (c1 == c2).all()
    assert (np_hamming(c1, c1[0]) == np_hamming(c1, c1[0])).all()
    assert np_hamming(c1[:1], c1[0])[0] == 0  # self-distance zero


@given(st.lists(st.floats(-10, 10, allow_nan=False), min_size=4, max_size=4))
@settings(max_examples=50, deadline=None)
def test_thermometer_monotone(base):
    """2-bit code popcount per dimension never decreases as the value grows."""
    dim = len(base)
    mat = np.array([base, base], dtype=np.float64)
    q = SbqQuantizer(np.zeros(dim), np.ones(dim), bits_per_dimension=2)
    for d in range(dim):
        lo, hi = np.array(base), np.array(base)
        hi[d] += 5.0
        c_lo = q.quantize_matrix(lo.reshape(1, -1))[0]
        c_hi = q.quantize_matrix(hi.reshape(1, -1))[0]
        pop = lambda c: int(np.bitwise_count(c).sum()) if hasattr(np, "bitwise_count") else bin(int(c[0])).count("1")
        assert pop(c_hi) >= pop(c_lo)


@given(st.lists(vec(8), min_size=5, max_size=30), st.integers(2, 6))
@settings(max_examples=20, deadline=None)
def test_robust_prune_bounds(rows, r):
    mat = np.unique(np.array(rows, dtype=np.float32), axis=0)
    if len(mat) < 3:
        return
    g = VamanaGraph(mat, distance_type="l2", num_neighbors=r)
    cand = np.arange(len(mat))
    dists = np_l2_squared(mat, mat[0])
    res = g.robust_prune(0, cand, dists)
    assert len(res) <= r
    assert 0 not in res  # no self-loop
    assert len(res) == len(set(res))  # no duplicates
    assert res[0] == int(np.lexsort((cand[cand != 0], dists[cand != 0]))[0] + 1) or len(mat) <= 1


# -- media codec round-trips (PNG lossless; JPEG bounded-loss) ----------------


@given(
    st.integers(min_value=1, max_value=12),   # width
    st.integers(min_value=1, max_value=12),   # height
    st.sampled_from([(0, 1), (2, 3), (4, 2), (6, 4)]),  # (color type, channels)
    st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=5),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_lossless(w, h, color_ch, filters, seed):
    """PNG is lossless: ANY image, geometry, color type, and per-scanline
    filter choice must decode back bit-identically through the real
    deflate + defilter path."""
    from pgvectorscale_spark.operators.multimodal import parse_png
    from tests.test_multimodal_decode import _encode_png

    color, ch = color_ch
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    w2, h2, ch2, out = parse_png(_encode_png(px, color, filters))
    assert (w2, h2, ch2) == (w, h, ch)
    assert (out == px).all()


@given(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=20, deadline=None)
def test_jpeg_constant_blocks_near_exact(w, h, seed):
    """Flat-quantization JPEG of a blockwise-smooth image: decoded pixels
    stay within the DCT-rounding budget at any (non-multiple-of-8)
    geometry — exercises edge-block padding and cropping."""
    from pgvectorscale_spark.operators.jpeg import parse_jpeg
    from tests.test_jpeg import encode_jpeg

    rng = np.random.default_rng(seed)
    base = rng.integers(30, 226, (1, 1, 1), dtype=np.uint8)
    px = np.broadcast_to(base, (h, w, 1)).copy()
    w2, h2, ch2, out = parse_jpeg(encode_jpeg(px))
    assert (w2, h2, ch2) == (w, h, 1)
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 1


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=300, deadline=None)
def test_media_parsers_fail_only_with_valueerror(data):
    """Fuzz contract: on ARBITRARY bytes every container/stream parser
    either succeeds or raises ValueError — never IndexError/KeyError/
    struct.error — so decode pipelines can catch the documented type."""
    from pgvectorscale_spark.operators.jpeg import parse_jpeg
    from pgvectorscale_spark.operators.multimodal import (
        parse_aiff,
        parse_bmp,
        parse_h264_meta,
        parse_image,
        parse_mp3_meta,
        parse_mp4_meta,
        parse_png,
        parse_ppm,
        parse_wav,
    )

    from pgvectorscale_spark.operators.flac import parse_flac
    from pgvectorscale_spark.operators.gif import parse_gif
    from pgvectorscale_spark.operators.h264 import parse_h264_picture
    from pgvectorscale_spark.operators.vp8l import parse_webp

    for fn in (parse_ppm, parse_wav, parse_png, parse_jpeg,
               parse_mp3_meta, parse_mp4_meta, parse_h264_meta,
               parse_h264_picture, parse_bmp, parse_gif, parse_flac,
               parse_aiff, parse_webp):
        try:
            fn(data)
        except (ValueError, NotImplementedError):
            pass
    try:
        parse_image(data)
    except (ValueError, NotImplementedError):
        pass


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=15),
)
@settings(max_examples=40, deadline=None)
def test_vp8l_checker_roundtrip_any_geometry(w, h, nib):
    """VP8L is lossless: the two-gray checkerboard (NORMAL code-length-
    coded prefix codes) decodes bit-identically at ANY geometry —
    exercises row wrap, odd widths, and the 1-pixel degenerate case."""
    from pgvectorscale_spark.operators.vp8l import build_checker_webp, parse_webp

    g = 16 * nib + 8
    w2, h2, ch, px = parse_webp(build_checker_webp(w, h, g, g + 4))
    assert (w2, h2, ch) == (w, h, 4)
    exp = np.fromfunction(lambda y, x: np.where((x + y) % 2 == 0, g, g + 4), (h, w))
    for c in range(3):
        assert (px[..., c] == exp).all()
    assert (px[..., 3] == 255).all()


@given(st.binary(min_size=0, max_size=300), st.integers(0, 4))
@settings(max_examples=150, deadline=None)
def test_media_parsers_reject_plausible_prefixes_cleanly(tail, which):
    """Same contract with VALID magic bytes followed by garbage — the
    deeper header/walk paths, not just the magic check, must stay typed."""
    from pgvectorscale_spark.operators.jpeg import parse_jpeg
    from pgvectorscale_spark.operators.multimodal import (
        parse_h264_meta,
        parse_mp3_meta,
        parse_mp4_meta,
    )

    from pgvectorscale_spark.operators.h264 import parse_h264_picture
    from pgvectorscale_spark.operators.vp8l import parse_webp

    prefixed = [
        (parse_jpeg, b"\xff\xd8" + tail),
        (parse_mp3_meta, b"\xff\xfb" + tail),
        (parse_mp4_meta, (8 + len(tail)).to_bytes(4, "big") + b"ftyp" + tail),
        (parse_h264_meta, b"\x00\x00\x01\x67" + tail),
        (
            parse_webp,
            b"RIFF" + (13 + len(tail)).to_bytes(4, "little") + b"WEBP"
            + b"VP8L" + (1 + len(tail)).to_bytes(4, "little") + b"\x2f" + tail,
        ),
    ]
    fn, data = prefixed[which]
    try:
        fn(data)
    except (ValueError, NotImplementedError):
        pass
    # the pixel decoder sees the same prefixed garbage; its contract adds
    # NotImplementedError for honestly-gated syntax reached mid-stream
    if which == 3:
        try:
            parse_h264_picture(data)
        except (ValueError, NotImplementedError):
            pass


_warc_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["response", "resource", "request", "metadata"]),
            _warc_text,
            st.sampled_from(["1.0", "1.1"]),
        ),
        max_size=6,
    )
)
@settings(max_examples=150, deadline=None)
def test_warc_random_records_round_trip(recs):
    """parse_warc_bytes inverts a record writer for ANY unicode payloads,
    record types, versions, and record counts: Content-Length drives the
    walk, so payloads embedding CRLFs, fake 'WARC/1.0' headers, or HTTP
    terminators never desynchronize it."""
    from pgvectorscale_spark.sources.warc import parse_warc_bytes

    data = b""
    for i, (wtype, text, version) in enumerate(recs):
        body = text.encode("utf-8")
        headers = f"WARC-Type: {wtype}\r\nWARC-Record-ID: <urn:fuzz:{i}>\r\n"
        if wtype == "response":
            body = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=utf-8\r\n\r\n"
                + body
            )
            headers += "Content-Type: application/http;msgtype=response\r\n"
        data += (
            f"WARC/{version}\r\n{headers}Content-Length: {len(body)}\r\n\r\n".encode()
            + body
            + b"\r\n\r\n"
        )
    out = parse_warc_bytes(data)
    assert len(out) == len(recs)
    for i, ((wtype, text, _), rec) in enumerate(zip(recs, out)):
        assert rec["rec_index"] == i
        assert rec["warc_type"] == wtype
        assert rec["record_id"] == f"<urn:fuzz:{i}>"
        assert rec["payload"] == text
        assert rec["payload_len"] == len(text.encode("utf-8"))
        assert rec["http_status"] == (200 if wtype == "response" else None)


@given(st.binary(max_size=300))
@settings(max_examples=150, deadline=None)
def test_warc_garbage_rejects_cleanly(data):
    """Arbitrary bytes either parse (only the empty prefix can) or raise
    a typed ValueError — never an unhandled exception type."""
    from pgvectorscale_spark.sources.warc import parse_warc_bytes

    try:
        out = parse_warc_bytes(data)
    except ValueError:
        return
    assert data == b"" and out == []
