"""Baseline TIFF decode — pure stdlib/numpy, no media libraries.

TIFF 6.0 (the 1992 Aldus/Adobe spec, public) is the one major raster
container still missing from the decode family: the header + IFD tag
walk in either byte order ('II' little / 'MM' big endian), strip
assembly, and the baseline compressions whose algorithms are fully
specified in prose with NO tabulated data:

- **PackBits** (Compression 32773, §9): the classic byte-oriented RLE —
  header n in [0, 127] copies n+1 literal bytes, n in [-127, -1] repeats
  the next byte 1-n times, -128 is a no-op.
- **LZW** (Compression 5, §13): the TIFF variant of the same
  dictionary-from-the-stream algorithm as GIF (operators/gif.py) but
  with OPPOSITE bit packing (MSB-first), fixed root width (256 roots +
  Clear 256 + EOI 257, codes start at 9 bits) and the spec's
  **early-change** quirk: the code width bumps when the NEXT entry would
  be 511/1023/2047 (one entry earlier than the natural power-of-two
  boundary — TIFF writers shipped with this off-by-one and the spec
  canonized it). The dictionary is built from the stream itself, so
  this stays within the closed-form decode policy.
- **Deflate** (Compression 8, plus the pre-standard code 32946, TIFF
  Technical Note #2): each strip is an independent zlib stream — the
  same stdlib inflate PNG already rides.
- **Horizontal-differencing predictor** (tag 317, value 2, §14): each
  sample stores the delta to its left neighbor; decode is a per-row
  per-channel cumulative sum mod 256.

Supported image classes: 8-bit grayscale (PhotometricInterpretation
0/1 — 0 is WhiteIsZero and inverts) and 8-bit RGB (2), one or more
strips, both byte orders. Tiled TIFF, other bit depths, and other
compressions raise loudly (ValueError), keeping the module's
malformed-input contract.

Reference parity: no analog in pgvectorscale (a Rust vector-index
Postgres extension with no media handling); this serves the multimodal
training-data-pipeline brief alongside operators/{jpeg,gif,qoi}.py.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "attach_tiff_lzw_payload",
    "attach_tiff_payload",
    "parse_tiff",
    "tiff_lzw_decode",
    "tiff_lzw_encode",
    "unpackbits",
]

# IFD field types we honor: BYTE, SHORT, LONG (all the baseline tags use
# these). size-per-element keyed by type id.
_TYPE_SIZE = {1: 1, 3: 2, 4: 4}


def unpackbits(data: bytes, expected: int) -> bytes:
    """PackBits decompression (TIFF §9) to exactly ``expected`` bytes."""
    out = bytearray()
    pos = 0
    while len(out) < expected:
        if pos >= len(data):
            raise ValueError("truncated PackBits stream")
        n = data[pos]
        pos += 1
        if n < 128:  # n+1 literal bytes
            if pos + n + 1 > len(data):
                raise ValueError("truncated PackBits literal run")
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if pos >= len(data):
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op
    if len(out) != expected:
        raise ValueError(
            f"PackBits run overshoots the strip: {len(out)} > {expected}"
        )
    return bytes(out)


def tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW (TIFF 6.0 §13) to exactly ``expected`` bytes:
    MSB-first bit packing, 256 single-byte roots, Clear=256, EOI=257,
    9-bit initial codes, and the early-change width bump (at next-entry
    511/1023/2047, capped at 12 bits). The dictionary is rebuilt from the
    stream — no tabulated data."""
    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            raise ValueError("truncated TIFF LZW stream")
        byte0 = bitpos // 8
        # up to 12 bits span at most 3 bytes; read 3 and shift (MSB first)
        chunk = int.from_bytes(data[byte0 : byte0 + 3].ljust(3, b"\0"), "big")
        val = (chunk >> (24 - (bitpos % 8) - width)) & ((1 << width) - 1)
        bitpos += width
        return val

    CLEAR, EOI = 256, 257
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None
    while True:
        code = read_code(width)
        if code == EOI:
            break
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                raise ValueError("TIFF LZW stream starts with a non-root code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"TIFF LZW code {code} beyond table {len(table)}")
        out += entry
        prev = entry
        # early change: bump when the NEXT table entry would need more bits
        if len(table) in (511, 1023, 2047) and width < 12:
            width += 1
        if len(out) >= expected:
            break
    if len(out) != expected:
        raise ValueError(
            f"TIFF LZW decode produced {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


def _read_ifd_value(order: str, typ: int, cnt: int, raw4: bytes, data: bytes):
    """One IFD entry's value list (inline when it fits 4 bytes, else at
    the pointed offset)."""
    if typ not in _TYPE_SIZE:
        raise ValueError(f"unsupported TIFF field type {typ}")
    size = _TYPE_SIZE[typ] * cnt
    if size <= 4:
        buf = raw4[:size]
    else:
        (off,) = struct.unpack(order + "I", raw4)
        if off + size > len(data):
            raise ValueError("TIFF IFD value offset out of range")
        buf = data[off : off + size]
    fmt = {1: "B", 3: "H", 4: "I"}[typ]
    return list(struct.unpack(f"{order}{cnt}{fmt}", buf))


def parse_tiff(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse a baseline TIFF: returns (width, height, channels, pixels
    (h, w, ch) uint8). See the module docstring for the supported class;
    everything else raises ValueError (malformed-input contract)."""
    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    if len(data) < 8:
        raise ValueError("not a TIFF file (header short)")
    if data[:2] == b"II":
        order = "<"
    elif data[:2] == b"MM":
        order = ">"
    else:
        raise ValueError("not a TIFF file (no II/MM byte-order mark)")
    magic, ifd_off = struct.unpack(order + "HI", data[2:8])
    if magic != 42:
        raise ValueError(f"not a TIFF file (magic {magic} != 42)")
    if ifd_off + 2 > len(data):
        raise ValueError("TIFF IFD offset out of range")
    (n_entries,) = struct.unpack(order + "H", data[ifd_off : ifd_off + 2])
    if ifd_off + 2 + 12 * n_entries + 4 > len(data):
        raise ValueError("truncated TIFF IFD")
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack(order + "HHI", data[base : base + 8])
        tags[tag] = _read_ifd_value(order, typ, cnt, data[base + 8 : base + 12], data)

    def one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            if len(tags[tag]) != 1:
                raise ValueError(f"TIFF tag {tag}: expected a single value")
            return tags[tag][0]
        if default is None:
            raise ValueError(f"TIFF missing required tag {tag}")
        return default

    if 322 in tags or 323 in tags:
        raise ValueError("tiled TIFF does not decode natively (strips only)")
    width = one(256)
    height = one(257)
    spp = one(277, 1)
    photometric = one(262)
    compression = one(259, 1)
    predictor = one(317, 1)
    rows_per_strip = one(278, 2**32 - 1)
    bits = tags.get(258, [8] * spp)
    if spp not in (1, 3):
        raise ValueError(f"unsupported TIFF SamplesPerPixel {spp} (1/3 only)")
    if photometric not in (0, 1, 2):
        raise ValueError(
            f"unsupported TIFF PhotometricInterpretation {photometric}"
        )
    if (photometric == 2) != (spp == 3):
        raise ValueError("TIFF photometric/SamplesPerPixel mismatch")
    if len(bits) != spp or any(b != 8 for b in bits):
        raise ValueError(f"unsupported TIFF BitsPerSample {bits} (8-bit only)")
    if compression not in (1, 5, 8, 32773, 32946):
        raise ValueError(
            f"unsupported TIFF compression {compression}: only none (1), "
            "LZW (5), Deflate (8 / legacy 32946) and PackBits (32773) "
            "decode natively"
        )
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    if width == 0 or height == 0 or width * height > (1 << 26):
        raise ValueError(f"implausible TIFF dimensions {width}x{height}")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF StripOffsets/StripByteCounts missing or unequal")
    n_strips = -(-height // min(rows_per_strip, height))
    if len(offsets) != n_strips:
        raise ValueError(
            f"TIFF strip count {len(offsets)} inconsistent with "
            f"RowsPerStrip (expected {n_strips})"
        )

    row_bytes = width * spp
    out = bytearray()
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(data):
            raise ValueError("TIFF strip extends past end of file")
        rows_here = min(rows_per_strip, height - i * rows_per_strip)
        expected = rows_here * row_bytes
        raw = data[off : off + cnt]
        if compression == 1:
            if cnt < expected:
                raise ValueError("truncated uncompressed TIFF strip")
            out += raw[:expected]
        elif compression == 32773:
            out += unpackbits(raw, expected)
        elif compression in (8, 32946):
            # Adobe Deflate (8) / legacy code 32946: each strip is an
            # independent zlib stream (TIFF TN#2) — same stdlib inflate
            # PNG rides; the byte count must come out exact
            import zlib

            try:
                blob = zlib.decompress(raw)
            except zlib.error as exc:
                raise ValueError(f"bad TIFF Deflate strip: {exc}") from None
            if len(blob) < expected:
                raise ValueError("truncated TIFF Deflate strip")
            out += blob[:expected]
        else:
            out += tiff_lzw_decode(raw, expected)
    px = np.frombuffer(bytes(out), dtype=np.uint8).reshape(height, width, spp)
    if predictor == 2:
        px = np.cumsum(px.astype(np.uint32), axis=1).astype(np.uint8)
    if photometric == 0:  # WhiteIsZero
        px = 255 - px
    return width, height, spp, np.ascontiguousarray(px)


def tiff_lzw_encode(data: bytes) -> bytes:
    """Build-time/test-side TIFF LZW encoder (the round-trip partner of
    :func:`tiff_lzw_decode`): MSB-first packing, CLEAR first, early-change
    width bumps when the just-assigned entry index hits 511/1023/2047 —
    exactly one code position earlier than the GIF variant
    (operators/gif.py), per TIFF 6.0 §13."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    bits: list[tuple[int, int]] = [(256, width)]  # CLEAR
    cur = b""
    for b in data:
        cand = cur + bytes([b])
        if cand in table:
            cur = cand
            continue
        bits.append((table[cur], width))
        if next_code < 4094:  # stay clear of the table cap (no mid-stream CLEAR)
            table[cand] = next_code
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
            next_code += 1
        cur = bytes([b])
    if cur:
        bits.append((table[cur], width))
    bits.append((257, width))  # EOI
    big = 0
    pos = 0
    for code, w in bits:
        big = (big << w) | code
        pos += w
    pad = (-pos) % 8
    return (big << pad).to_bytes((pos + pad) // 8, "big")


def _ifd(order: str, entries: list[tuple[int, int, int, int]], ifd_off: int) -> bytes:
    """Serialize one IFD whose every value fits inline (count*size <= 4):
    entries are (tag, type, count, value); tags must already be ascending."""
    out = struct.pack(order + "H", len(entries))
    for tag, typ, cnt, val in entries:
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        raw = struct.pack(f"{order}{fmt}", val)
        raw = raw + b"\0" * (4 - len(raw)) if order == "<" else raw.ljust(4, b"\0")
        out += struct.pack(order + "HHI", tag, typ, cnt) + raw
    return out + struct.pack(order + "I", 0)


#: PackBits synth geometry: 6x2 8-bit grayscale, little-endian, ONE strip
#: (RowsPerStrip=2) holding a literal packet of digest bytes b0..b5 (row 0)
#: and a repeat packet of 6 x b6 (row 1), so the mean is
#: (b0+..+b5 + 6*b6)/12 — a packet-kind, count-bias, strip-assembly or
#: byte-order bug on either side breaks the hash (oracles side:
#: tiff_decode_oracle).
TIFF_W, TIFF_H = 6, 2


def attach_tiff_payload(df, source_col: str = "text", payload_col: str = "payload"):
    """Deterministic REAL PackBits TIFF per row, built JVM-side: a
    conformant little-endian baseline file (header, 9-entry IFD, one
    compressed strip) any TIFF reader reproduces."""
    from pyspark.sql import functions as F

    strip_len = 1 + TIFF_W + 2  # literal hdr + 6 bytes + repeat hdr + 1
    data_off = 8 + 2 + 9 * 12 + 4  # header + IFD(9 entries) = 122
    hdr = (
        struct.pack("<2sHI", b"II", 42, 8)
        + _ifd(
            "<",
            [
                (256, 3, 1, TIFF_W),       # ImageWidth
                (257, 3, 1, TIFF_H),       # ImageLength
                (258, 3, 1, 8),            # BitsPerSample
                (259, 3, 1, 32773),        # Compression: PackBits
                (262, 3, 1, 1),            # Photometric: BlackIsZero
                (273, 4, 1, data_off),     # StripOffsets
                (277, 3, 1, 1),            # SamplesPerPixel
                (278, 3, 1, TIFF_H),       # RowsPerStrip (single strip)
                (279, 4, 1, strip_len),    # StripByteCounts
            ],
            8,
        )
    ).hex()
    d = f"md5(`{source_col}`)"
    return df.withColumn(
        payload_col,
        F.expr(
            f"unhex(concat('{hdr}', '05', substr({d}, 1, 12), "
            f"'fb', substr({d}, 13, 2)))"
        ),
    ).withColumn("media_type", F.lit("image/tiff"))


#: LZW synth geometry: 4x2 8-bit grayscale FLAT image, BIG-endian 'MM'
#: (exercising the other byte order in the driver row), Compression 5.
#: The gray value is nibble0 * 17 (0, 17, ..., 255), so there are 16
#: pre-encoded LZW strips selected per document by the digest's first hex
#: char; the decoded mean IS the value (oracles.tiff_lzw_decode_oracle).
TIFF_LZW_W, TIFF_LZW_H = 4, 2


def attach_tiff_lzw_payload(df, source_col: str = "text", payload_col: str = "payload"):
    """Deterministic REAL LZW TIFF per row: genuine big-endian Compression-5
    files whose strips were LZW-encoded by tiff_lzw_encode at SQL-build
    time; the per-document digest nibble picks one of 16 flat gray levels.
    parse_tiff runs the real MSB-first early-change LZW decode on every
    row."""
    from pyspark.sql import functions as F

    n_px = TIFF_LZW_W * TIFF_LZW_H
    strips = [tiff_lzw_encode(bytes([v * 17]) * n_px) for v in range(16)]
    strip_len = {len(s) for s in strips}
    assert len(strip_len) == 1, "flat-image LZW strips must share a length"
    data_off = 8 + 2 + 9 * 12 + 4
    hdr = (
        struct.pack(">2sHI", b"MM", 42, 8)
        + _ifd(
            ">",
            [
                (256, 3, 1, TIFF_LZW_W),
                (257, 3, 1, TIFF_LZW_H),
                (258, 3, 1, 8),
                (259, 3, 1, 5),            # Compression: LZW
                (262, 3, 1, 1),
                (273, 4, 1, data_off),
                (277, 3, 1, 1),
                (278, 3, 1, TIFF_LZW_H),
                (279, 4, 1, strip_len.pop()),
            ],
            8,
        )
    ).hex()
    d = f"md5(`{source_col}`)"
    cases = " ".join(
        f"WHEN '{c}' THEN '{strips[i].hex()}'"
        for i, c in enumerate("0123456789abcdef")
    )
    return df.withColumn(
        payload_col,
        F.expr(
            f"unhex(concat('{hdr}', CASE substr({d}, 1, 1) {cases} END))"
        ),
    ).withColumn("media_type", F.lit("image/tiff"))
