"""Tests for operators/tiff.py — baseline TIFF decode (both byte orders,
none/PackBits/LZW compression, gray + RGB, multi-strip, predictor 2).

The encoder here (`build_tiff`) is written INDEPENDENTLY from the module's
synth path (different IFD layout: values >4 bytes go through real offset
pointers, strips are per-row, tags include extras the decoder must skip),
so round-trips cross-check the decoder, and the PackBits anchor is the
worked example printed in the TIFF 6.0 spec §9 itself."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pgvectorscale_spark.operators.tiff import (
    parse_tiff,
    tiff_lzw_decode,
    tiff_lzw_encode,
    unpackbits,
)

# ---------------------------------------------------------------------------
# independent encoder
# ---------------------------------------------------------------------------


def _packbits_encode(row: bytes) -> bytes:
    """Simple greedy PackBits: runs of >=3 become repeat packets."""
    out = bytearray()
    i = 0
    while i < len(row):
        run = 1
        while i + run < len(row) and row[i + run] == row[i] and run < 128:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
        else:
            j = i + run
            while j < len(row) and j - i < 128:
                nxt = 1
                while j + nxt < len(row) and row[j + nxt] == row[j] and nxt < 3:
                    nxt += 1
                if nxt >= 3:
                    break
                j += nxt
            out += bytes([j - i - 1]) + row[i:j]
            i = j
    return bytes(out)


def build_tiff(
    px: np.ndarray,
    order: str = "<",
    compression: int = 1,
    rows_per_strip: int | None = None,
    predictor: int = 1,
    photometric: int | None = None,
) -> bytes:
    """Write a real TIFF: header, data region, value arrays for >4-byte
    IFD values, ascending-tag IFD at the END of the file (the layout the
    module's synth does NOT use)."""
    h, w, ch = px.shape
    rps = rows_per_strip or h
    if photometric is None:
        photometric = 2 if ch == 3 else 1
    src = px
    if predictor == 2:
        diff = src.astype(np.int16)
        diff[:, 1:, :] = diff[:, 1:, :] - diff[:, :-1, :]
        src = (diff % 256).astype(np.uint8)
    strips = []
    for r0 in range(0, h, rps):
        raw = src[r0 : r0 + rps].tobytes()
        if compression == 32773:
            strips.append(_packbits_encode(raw))
        elif compression == 5:
            strips.append(tiff_lzw_encode(raw))
        elif compression in (8, 32946):
            import zlib

            strips.append(zlib.compress(raw))
        else:
            strips.append(raw)
    body = bytearray(struct.pack(order + "2sHI", b"II" if order == "<" else b"MM", 42, 0))
    strip_offs = []
    for s in strips:
        strip_offs.append(len(body))
        body += s

    def val_or_offset(typ: int, vals: list[int]) -> bytes:
        fmt = {3: "H", 4: "I"}[typ]
        raw = struct.pack(f"{order}{len(vals)}{fmt}", *vals)
        if len(raw) <= 4:
            return raw.ljust(4, b"\0")
        off = len(body)
        body.extend(raw)
        return struct.pack(order + "I", off)

    entries = [
        (256, 3, [w]),
        (257, 3, [h]),
        (258, 3, [8] * ch),
        (259, 3, [compression]),
        (262, 3, [photometric]),
        (273, 4, strip_offs),
        (277, 3, [ch]),
        (278, 3, [rps]),
        (279, 4, [len(s) for s in strips]),
        (296, 3, [2]),  # ResolutionUnit: an extra tag the decoder must skip
    ]
    if predictor == 2:
        entries.insert(9, (317, 3, [2]))
    entries.sort()
    vbytes = [val_or_offset(typ, vals) for _, typ, vals in entries]
    ifd_off = len(body)
    body += struct.pack(order + "H", len(entries))
    for (tag, typ, vals), vb in zip(entries, vbytes):
        body += struct.pack(order + "HHI", tag, typ, len(vals)) + vb
    body += struct.pack(order + "I", 0)
    body[4:8] = struct.pack(order + "I", ifd_off)
    return bytes(body)


def _img(h, w, ch, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, ch), dtype=np.uint8)


# ---------------------------------------------------------------------------
# published anchors
# ---------------------------------------------------------------------------


def test_packbits_spec_worked_example():
    """TIFF 6.0 §9 prints this exact pack of 24 bytes into 15."""
    packed = bytes.fromhex("feaa0280002afdaa0380002a22f7aa")
    unpacked = bytes.fromhex("aaaaaa80002aaaaaaaaa80002a22" + "aa" * 10)
    assert unpackbits(packed, 24) == unpacked
    assert len(unpacked) == 24


def test_packbits_noop_and_errors():
    assert unpackbits(b"\x80\x00a", 1) == b"a"  # -128 no-op skipped
    with pytest.raises(ValueError):
        unpackbits(b"\x05ab", 6)  # truncated literal
    with pytest.raises(ValueError):
        unpackbits(b"\xfe", 3)  # truncated repeat
    with pytest.raises(ValueError):
        unpackbits(b"\xfdx", 2)  # 4-byte run overshoots a 2-byte strip


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def test_lzw_roundtrip_past_early_change():
    """3000 incompressible bytes force ~1500 table adds — the code width
    must bump 9->10->11 at the early-change points on BOTH sides or the
    stream desynchronizes into garbage."""
    rng = np.random.default_rng(11)
    data = bytes(rng.integers(0, 256, 3000, dtype=np.uint8))
    assert tiff_lzw_decode(tiff_lzw_encode(data), len(data)) == data


def test_lzw_flat_and_kwkwk():
    for data in (b"\x07" * 64, b"ababababab" * 9, bytes(range(256)) * 4):
        assert tiff_lzw_decode(tiff_lzw_encode(data), len(data)) == data


def test_lzw_width_bump_is_early():
    """The 9->10 bump must happen exactly when entry 511 is assigned (one
    code EARLIER than the GIF variant): decoding with a GIF-style
    late-change decoder desynchronizes. We assert the encoder emits a
    10-bit code before the natural 512-entry boundary by checking total
    bit length against a late-change replay."""
    # 600 distinct 2-grams -> ~600 table adds, crossing 511
    data = bytes(
        b for pair in ((i % 256, (i * 7 + 3) % 256) for i in range(600)) for b in pair
    )
    enc = tiff_lzw_encode(data)
    assert tiff_lzw_decode(enc, len(data)) == data
    # late-change replay: same decoder but bumping at 512/1024/2048
    import pgvectorscale_spark.operators.tiff as tiff_mod

    src = tiff_mod.tiff_lzw_decode.__doc__
    assert "511/1023/2047" in src  # the documented early-change points

    def late_decode(buf: bytes, expected: int) -> bytes:
        out = bytearray()
        bitpos = 0
        width = 9
        table: list[bytes] = []
        prev = None
        while True:
            byte0 = bitpos // 8
            chunk = int.from_bytes(buf[byte0 : byte0 + 3].ljust(3, b"\0"), "big")
            code = (chunk >> (24 - (bitpos % 8) - width)) & ((1 << width) - 1)
            bitpos += width
            if code == 257:
                break
            if code == 256:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("desync")
            out += entry
            prev = entry
            if len(table) in (512, 1024, 2048) and width < 12:  # LATE change
                width += 1
            if len(out) >= expected:
                break
        return bytes(out)

    try:
        late = late_decode(enc, len(data))
    except (ValueError, IndexError):
        late = b""
    assert late != data  # late-change decoding must NOT reproduce the stream


# ---------------------------------------------------------------------------
# full-file round-trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("order", ["<", ">"])
@pytest.mark.parametrize("compression", [1, 5, 8, 32773, 32946])
@pytest.mark.parametrize("ch", [1, 3])
def test_roundtrip_grid(order, compression, ch):
    px = _img(5, 7, ch, seed=compression + ch)
    data = build_tiff(px, order=order, compression=compression)
    w, h, c, got = parse_tiff(data)
    assert (w, h, c) == (7, 5, ch)
    assert np.array_equal(got, px)


def test_multistrip_and_predictor():
    px = _img(6, 4, 3, seed=9)
    for comp in (1, 5, 8, 32773):
        data = build_tiff(px, compression=comp, rows_per_strip=2)
        assert np.array_equal(parse_tiff(data)[3], px)
    for comp in (5, 8):
        data = build_tiff(px, compression=comp, predictor=2, rows_per_strip=3)
        assert np.array_equal(parse_tiff(data)[3], px)


def test_deflate_bad_stream_rejected():
    px = _img(3, 3, 1, seed=4)
    data = bytearray(build_tiff(px, compression=8))
    # corrupt the zlib header byte of the (first) strip, which the
    # independent encoder placed right after the 8-byte TIFF header
    data[8] ^= 0xFF
    with pytest.raises(ValueError, match="Deflate"):
        parse_tiff(bytes(data))


def test_whitesiszero_inverts():
    px = _img(3, 3, 1, seed=2)
    data = build_tiff(px, photometric=0)
    got = parse_tiff(data)[3]
    assert np.array_equal(got, 255 - px)


def test_bigendian_lzw_gray_matches_synth_class():
    """The driver synth class: MM order, flat gray, one strip, LZW."""
    for v in (0, 17, 255):
        px = np.full((2, 4, 1), v, dtype=np.uint8)
        data = build_tiff(px, order=">", compression=5)
        w, h, c, got = parse_tiff(data)
        assert (w, h, c) == (4, 2, 1) and np.array_equal(got, px)


# ---------------------------------------------------------------------------
# malformed inputs
# ---------------------------------------------------------------------------


def test_malformed_rejections():
    px = _img(3, 3, 1)
    good = build_tiff(px)
    with pytest.raises(ValueError):
        parse_tiff(b"XX" + good[2:])  # bad byte-order mark
    with pytest.raises(ValueError):
        parse_tiff(good[:2] + struct.pack("<H", 43) + good[4:])  # magic != 42
    with pytest.raises(ValueError):
        parse_tiff(good[:20])  # truncated IFD
    bad = bytearray(build_tiff(px, compression=32773))
    with pytest.raises(ValueError):
        parse_tiff(bytes(bad[: len(bad) // 2]))  # strip/IFD past EOF


def test_unsupported_classes_raise():
    px = _img(3, 3, 1)
    # 16-bit samples
    data = bytearray(build_tiff(px))
    # find the BitsPerSample entry (tag 258) and set its value to 16
    ifd_off = struct.unpack("<I", data[4:8])[0]
    n = struct.unpack("<H", data[ifd_off : ifd_off + 2])[0]
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag = struct.unpack("<H", data[base : base + 2])[0]
        if tag == 258:
            data[base + 8 : base + 10] = struct.pack("<H", 16)
        if tag == 259:
            comp_base = base
    with pytest.raises(ValueError):
        parse_tiff(bytes(data))
    # unsupported compression (CCITT G3 = 2)
    data = bytearray(build_tiff(px))
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        if struct.unpack("<H", data[base : base + 2])[0] == 259:
            data[base + 8 : base + 10] = struct.pack("<H", 2)
    with pytest.raises(ValueError):
        parse_tiff(bytes(data))


def test_dispatcher_routes_tiff():
    from pgvectorscale_spark.operators.multimodal import parse_image

    px = _img(4, 4, 3, seed=5)
    for order in ("<", ">"):
        w, h, c, got = parse_image(build_tiff(px, order=order, compression=32773))
        assert (w, h, c) == (4, 4, 3) and np.array_equal(got, px)


def test_synth_payload_decodes_and_matches_closed_form(spark, documents):
    """The driver synth classes end-to-end on the real corpus sample:
    PackBits means equal the digest closed form; LZW means equal nib*17."""
    import hashlib

    from pgvectorscale_spark.operators.multimodal import decode_image
    from pgvectorscale_spark.operators.tiff import (
        attach_tiff_lzw_payload,
        attach_tiff_payload,
    )

    docs = documents.limit(40)
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    pb = {r["doc_id"]: r for r in decode_image(attach_tiff_payload(docs)).collect()}
    lz = {r["doc_id"]: r for r in decode_image(attach_tiff_lzw_payload(docs)).collect()}
    for doc_id, text in texts.items():
        h = hashlib.md5(text.encode()).hexdigest()
        b = bytes.fromhex(h)
        exp = round((sum(b[:6]) + 6 * b[6]) / 12.0, 6)
        r = pb[doc_id]
        assert (r["width"], r["height"], r["channels"]) == (6, 2, 1)
        assert abs(r["mean_r"] - exp) < 1e-9 and r["mean_r"] == r["mean_b"]
        v = int(h[0], 16) * 17.0
        r = lz[doc_id]
        assert (r["width"], r["height"], r["channels"]) == (4, 2, 1)
        assert r["mean_r"] == v == r["mean_g"] == r["mean_b"]
