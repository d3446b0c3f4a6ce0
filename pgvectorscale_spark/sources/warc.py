"""WARC (Web ARChive, ISO 28500 / WARC/1.0-1.1) ingestion — the format a
100 TB training-data pipeline actually reads (Common Crawl ships as WARC
files of HTTP responses).

Spark-first shape: a WARC file is a byte blob; record extraction is
per-blob and stateless, so the parse is one Arrow-batched
``mapInPandas`` over a binary column — embarrassingly parallel, no
shuffle, no driver state. At crawl scale the blobs come from
``spark.read.format("binaryFile").load("s3a://.../segments/*.warc")``
(one task per file; size tasks with ``maxPartitionBytes``) or from a
manifest of (path, offset, length) ranges for record-level splits; the
parser here consumes whatever bytes arrive in the column either way.

The parser is spec-honest and fail-stop like the media decoders:
mandatory ``Content-Length`` drives the record walk (bodies are NOT
scanned for separators — a body may contain anything, including fake
record headers), header names are case-insensitive, WARC/1.0 and 1.1
are accepted, and ``response`` records carrying
``application/http`` blocks get their HTTP status parsed and headers
stripped (the payload a text pipeline wants). Truncated blocks, missing
separators, and unknown versions raise ``ValueError`` with the offset.

No reference analog (pgvectorscale ingests from Postgres tables); this
serves the training-data-pipeline brief's source surface next to
sources/tables.py.
"""

from __future__ import annotations

from typing import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "WARC_GROUP_SIZE",
    "WARCINFO_BLOCK",
    "attach_warc_payload",
    "gunzip_warc_bytes",
    "gzip_warc_bytes",
    "iter_warc_gz_members",
    "iter_warc_spans",
    "parse_warc_bytes",
    "parse_warc_records",
    "read_warc_dir",
    "read_warc_manifest",
    "warc_split_manifest",
]

WARC_GROUP_SIZE = 50  # docs per synthesized WARC file

# the warcinfo block every synthesized file opens with (ends in CRLF,
# as real crawlers write field blocks)
WARCINFO_BLOCK = "software: pgvectorscale-spark-synth/1.0\r\nformat: WARC File Format 1.0\r\n"

_HTTP_HEADER = "HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=utf-8\r\n\r\n"


def parse_warc_bytes(data: bytes) -> list[dict]:
    """All records of one WARC file: [{rec_index, warc_type, record_id,
    target_uri, http_status, content_length, payload, payload_len}].

    ``payload`` is the record block with HTTP headers stripped for
    ``application/http`` response records (status captured separately);
    other record types pass their block through. ``payload_len`` is the
    payload's OCTET length (UTF-8), not its character count."""
    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    pos = 0
    out: list[dict] = []
    idx = 0
    n = len(data)
    while pos < n:
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError(f"WARC header block unterminated at offset {pos}")
        try:
            head = data[pos:head_end].decode("utf-8")
        except UnicodeDecodeError as ex:
            raise ValueError(f"WARC header bytes not UTF-8 at offset {pos}: {ex}") from ex
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(
                f"not a WARC record at offset {pos}: {lines[0][:24]!r}"
            )
        version = lines[0][5:]
        if version not in ("1.0", "1.1"):
            raise ValueError(f"unsupported WARC version {version!r} at offset {pos}")
        hdrs: dict[str, str] = {}
        last_name: str | None = None
        for ln in lines[1:]:
            if ln[:1] in (" ", "\t"):
                # RFC 2616 LWS folding (inherited by ISO 28500 named
                # fields): a SP/TAB-led line continues the previous value
                if last_name is None:
                    raise ValueError(
                        f"WARC continuation line before any header at offset {pos}"
                    )
                hdrs[last_name] = f"{hdrs[last_name]} {ln.strip()}".strip()
                continue
            name, sep, value = ln.partition(":")
            if not sep:
                raise ValueError(f"malformed WARC header line {ln!r} at offset {pos}")
            last_name = name.strip().lower()
            hdrs[last_name] = value.strip()
        if "content-length" not in hdrs:
            raise ValueError(f"record at offset {pos} missing mandatory Content-Length")
        clen = int(hdrs["content-length"])
        if clen < 0:
            # a negative length would move the cursor BACKWARD into the
            # header just parsed, letting body bytes masquerade as record
            # headers — the exact attack Content-Length walking prevents
            raise ValueError(f"negative Content-Length {clen} at offset {pos}")
        body_start = head_end + 4
        block = data[body_start : body_start + clen]
        if len(block) < clen:
            raise ValueError(
                f"WARC block truncated at offset {body_start} "
                f"(Content-Length {clen}, {len(block)} available)"
            )
        wtype = hdrs.get("warc-type", "")
        http_status = None
        payload = block
        if wtype == "response" and hdrs.get("content-type", "").startswith(
            "application/http"
        ):
            he = block.find(b"\r\n\r\n")
            if he < 0:
                raise ValueError(
                    f"HTTP block without header terminator at offset {body_start}"
                )
            status_line = block[: block.find(b"\r\n")].decode("utf-8", "replace")
            parts = status_line.split(" ")
            if len(parts) < 2 or not parts[0].startswith("HTTP/"):
                raise ValueError(f"malformed HTTP status line {status_line!r}")
            http_status = int(parts[1])
            payload = block[he + 4 :]
        try:
            payload_text = payload.decode("utf-8")
        except UnicodeDecodeError as ex:
            # this reader serves TEXT pipelines; a binary resource block
            # (valid WARC) is out of contract — fail stop, don't mangle
            raise ValueError(
                f"record {idx} ({wtype}) payload is not UTF-8 text: {ex}"
            ) from ex
        out.append(
            {
                "rec_index": idx,
                "warc_type": wtype,
                "record_id": hdrs.get("warc-record-id", ""),
                "target_uri": hdrs.get("warc-target-uri", ""),
                "http_status": http_status,
                "content_length": clen,
                "payload": payload_text,
                "payload_len": len(payload),
            }
        )
        pos = body_start + clen
        if data[pos : pos + 4] != b"\r\n\r\n":
            raise ValueError(f"missing CRLFCRLF record separator at offset {pos}")
        pos += 4
        idx += 1
    return out


_RECORD_SCHEMA = StructType(
    [
        StructField("warc_id", LongType()),
        StructField("rec_index", LongType()),
        StructField("warc_type", StringType()),
        StructField("record_id", StringType()),
        StructField("target_uri", StringType()),
        StructField("http_status", IntegerType()),
        StructField("content_length", LongType()),
        StructField("payload", StringType()),
        StructField("payload_len", LongType()),
    ]
)


def parse_warc_records(
    df: DataFrame, payload_col: str = "payload", id_col: str = "warc_id"
) -> DataFrame:
    """Explode each WARC blob into its records (one output row per
    record, ``id_col`` passed through). Arrow-batched ``mapInPandas``;
    blobs are independent, so the operator scales with input partitions
    and never shuffles."""
    import pandas as pd

    names = [f.name for f in _RECORD_SCHEMA.fields]

    def run(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for wid, blob in zip(pdf[id_col], pdf[payload_col]):
                for rec in parse_warc_bytes(blob):
                    rows.append({"warc_id": int(wid), **rec})
            yield pd.DataFrame(rows, columns=names)

    return df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(payload_col)
    ).mapInPandas(run, _RECORD_SCHEMA)


def attach_warc_payload(
    docs: DataFrame,
    group_size: int = WARC_GROUP_SIZE,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic REAL WARC file per ``group_size`` docs, built
    JVM-side: (warc_id, payload binary). Each file opens with a warcinfo
    record and carries one ``application/http`` response record per doc
    (doc_id order; Content-Length computed from octet lengths), so
    ``parse_warc_records ∘ attach_warc_payload`` must reproduce every
    document's exact text — the DuckDB oracle replays the expected
    records straight from the source table, and a length/separator/
    header bug on either side breaks the hash."""
    lit = F.lit
    http_block = F.concat(lit(_HTTP_HEADER), F.col(text_col))
    rec = F.concat(
        lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:doc:"),
        F.col(id_col).cast("string"),
        lit(">\r\nWARC-Target-URI: https://example.org/doc/"),
        F.col(id_col).cast("string"),
        lit("\r\nContent-Type: application/http;msgtype=response\r\nContent-Length: "),
        F.octet_length(http_block).cast("string"),
        lit("\r\n\r\n"),
        http_block,
        lit("\r\n\r\n"),
    )
    info = (
        "WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Type: application/warc-fields"
        f"\r\nContent-Length: {len(WARCINFO_BLOCK.encode())}\r\n\r\n{WARCINFO_BLOCK}\r\n\r\n"
    )
    grouped = (
        docs.select(
            F.floor(F.col(id_col) / group_size).cast("long").alias("warc_id"),
            F.struct(F.col(id_col).alias("o"), rec.alias("r")).alias("s"),
        )
        .groupBy("warc_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("s")), lambda s: s["r"]), ""
            ).alias("_recs")
        )
        .select(
            "warc_id",
            F.encode(F.concat(lit(info), F.col("_recs")), "UTF-8").alias("payload"),
        )
    )
    return grouped


# ---------------------------------------------------------------------------
# Real-file scale path (round 12). parse_warc_records above consumes blobs
# already in a column — right when upstream hands you bytes, but a 100 TB
# crawl arrives as multi-GB .warc FILES. Two shapes:
#
# - read_warc_dir: spark.read.format("binaryFile") over a dir/glob — one
#   task per file, the canonical whole-file path. Fine while single files
#   fit an executor; the ceiling is the biggest file.
# - warc_split_manifest + read_warc_manifest: a header-walk builds a
#   (path, offset, length, first_rec_index) manifest whose splits align
#   to RECORD boundaries (iter_warc_spans reads only header blocks and
#   SEEKS over bodies — O(#records) small reads per file, never a full
#   scan), then the ranged read fans out one task per split. Each split
#   re-parses independently, so a 40 GB segment becomes ~40 1 GB-ish
#   tasks instead of one. Ranged access here uses local file IO (what
#   the container offers); the contract is any seekable binary stream —
#   at deployment the opener is fsspec/S3 ranged GETs, the walk and the
#   maths are identical.
# ---------------------------------------------------------------------------

_HEADER_CAP = 1 << 20  # a WARC header block beyond 1 MiB is corruption


def iter_warc_spans(fh) -> Iterator[tuple[int, int]]:
    """Yield (offset, length) of every record in a seekable binary
    stream, where ``length`` includes the trailing CRLFCRLF — consecutive
    spans tile the file exactly. Reads ONLY header blocks (buffered 4 KiB
    chunks until the blank line) and seeks over bodies, so a multi-GB
    file costs O(#records) small reads. Validation here is span-level
    (WARC/ version line, mandatory non-negative Content-Length, trailing
    separator present); field-level validation happens when a span is
    actually parsed (``parse_warc_bytes``). Fail-stop like the parser:
    truncation or a malformed header raises with the offset."""
    size = fh.seek(0, 2)
    pos = 0
    while pos < size:
        fh.seek(pos)
        buf = b""
        while True:
            chunk = fh.read(4096)
            if not chunk:
                raise ValueError(f"WARC header block unterminated at offset {pos}")
            buf += chunk
            he = buf.find(b"\r\n\r\n")
            if he >= 0:
                break
            if len(buf) > _HEADER_CAP:
                raise ValueError(f"WARC header block over 1 MiB at offset {pos}")
        try:
            head = buf[:he].decode("utf-8")
        except UnicodeDecodeError as ex:
            raise ValueError(
                f"WARC header bytes not UTF-8 at offset {pos}: {ex}"
            ) from ex
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record at offset {pos}: {lines[0][:24]!r}")
        if lines[0][5:] not in ("1.0", "1.1"):
            # mirror parse_warc_bytes' version whitelist: a manifest that
            # walks what the parser will reject reports a valid-looking
            # split set for an unreadable file (round-12 review finding)
            raise ValueError(
                f"unsupported WARC version {lines[0][5:]!r} at offset {pos}"
            )
        # the SAME LWS-folding rule as parse_warc_bytes: a SP/TAB-led line
        # continues the previous header's VALUE — it must neither register
        # as a header of its own (a folded continuation that happens to
        # start with 'content-length:' is data, not a length) nor be
        # dropped (a folded Content-Length value must fail int() here
        # exactly as it does in the parser, or the walk and the parse
        # disagree about which files are valid)
        last_name = None
        values: dict[str, str] = {}
        for ln in lines[1:]:
            if ln[:1] in (" ", "\t"):
                if last_name is not None:
                    values[last_name] = f"{values[last_name]} {ln.strip()}".strip()
                continue
            name, sep, value = ln.partition(":")
            if not sep:
                # parse_warc_bytes rejects separator-less lines; reject here
                # too so manifest success implies parseability (round-12
                # review finding — the walk and the parser must agree on
                # which files are valid, not just where records end)
                raise ValueError(f"malformed WARC header line {ln!r} at offset {pos}")
            last_name = name.strip().lower()
            values[last_name] = value.strip()
        clen_raw = values.get("content-length")
        if clen_raw is None:
            raise ValueError(f"record at offset {pos} missing mandatory Content-Length")
        clen = int(clen_raw)
        if clen < 0:
            raise ValueError(f"negative Content-Length {clen} at offset {pos}")
        body_start = pos + he + 4
        sep_at = body_start + clen
        fh.seek(sep_at)
        tail = fh.read(4)
        if tail != b"\r\n\r\n":
            raise ValueError(f"missing CRLFCRLF record separator at offset {sep_at}")
        yield pos, (sep_at + 4) - pos
        pos = sep_at + 4


# ---------------------------------------------------------------------------
# .warc.gz (round 13): every production Common Crawl file is gzip with ONE
# MEMBER PER RECORD (ISO 28500 annex D record-at-time compression), so
# member boundaries ARE record boundaries — the split manifest packs whole
# members and every split still parses independently. Member ends come from
# stdlib zlib alone: decompressobj(wbits=31) sets .eof at the member
# trailer and .unused_data holds the bytes past it, so the walk gets EXACT
# compressed offsets with no tabulated format data. A well-formed member
# may also carry several records (the spec permits it); the walk counts
# records inside each member so first_rec_index stays file-global either
# way.
# ---------------------------------------------------------------------------

_GZIP_MAGIC = b"\x1f\x8b"
_GZ_CHUNK = 1 << 16
# max bytes fed to a decompressobj per call: bounds the unused_data copy
# zlib makes at each member boundary (per-member memcpy waste <= this),
# while staying large enough that big members don't loop excessively
_GZ_FEED = 1 << 13


def gzip_warc_bytes(data: bytes, level: int = 6) -> bytes:
    """Compress a plain WARC blob into the production ``.warc.gz`` layout:
    one gzip member per record, in record order, so a reader can split the
    compressed file at member boundaries without inflating upstream bytes.
    (Fixture/synthesis helper — the read path never needs it.)"""
    import io
    import zlib

    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    out = bytearray()
    for off, ln in iter_warc_spans(io.BytesIO(data)):
        c = zlib.compressobj(level, zlib.DEFLATED, 31)
        out += c.compress(data[off : off + ln])
        out += c.flush()
    return bytes(out)


def gunzip_warc_bytes(blob: bytes) -> bytes:
    """Inflate every concatenated gzip member of a ``.warc.gz`` blob back
    to the plain WARC byte stream. Because record-at-time compression puts
    each record (with its trailing CRLFCRLF) in its own member, the
    concatenation of inflated members IS the plain ``.warc`` file — the
    parser needs no gz-specific logic. Fail-stop (ValueError carrying the
    compressed offset) on a truncated OR corrupt member — bad magic and
    CRC mismatches follow the same contract as truncation, not a raw
    ``zlib.error`` (round-13 advice)."""
    import zlib

    if not isinstance(blob, (bytes, bytearray)):
        blob = bytes(blob)
    data = bytes(blob)
    # bounded-feed loop (round 15, guide §1.2/§5): the old form fed the
    # WHOLE remaining blob to each member's decompressobj — zlib copies
    # everything after the member into ``unused_data``, so an M-member
    # blob paid O(M x blob) memcpy (a 64 MB split of 1 KB members is
    # ~4 TB of copying). Feeding <= _GZ_FEED memoryview slices keeps the
    # per-member waste one bounded copy; output bytes and the
    # corrupt/truncated error contract (member-start offsets) unchanged.
    out = bytearray()
    n = len(data)
    pos = 0
    with memoryview(data) as mv:
        while pos < n:
            member_off = pos
            d = zlib.decompressobj(wbits=31)
            while True:
                if pos >= n:
                    raise ValueError(
                        f"truncated gzip member at compressed offset {member_off}"
                    )
                end = min(n, pos + _GZ_FEED)
                try:
                    out += d.decompress(mv[pos:end])
                except zlib.error as e:
                    raise ValueError(
                        f"corrupt gzip member at compressed offset {member_off}: {e}"
                    ) from e
                pos = end - len(d.unused_data)
                if d.eof:
                    break
    return bytes(out)


def iter_warc_gz_members(fh, chunk_size: int = _GZ_CHUNK) -> Iterator[tuple[int, int, bytes]]:
    """Yield (compressed_offset, compressed_length, plain_bytes) for each
    gzip member of a seekable ``.warc.gz`` stream — the gz twin of
    ``iter_warc_spans``, with the same exact-tiling contract on COMPRESSED
    offsets. Streams in ``chunk_size`` reads; worker memory is one
    member's inflated bytes (one record, in production crawls). Unlike the
    plain walk there is no header-seek shortcut — gzip carries no member
    length up front, so finding a boundary costs inflating the member —
    but the walk still never holds more than one member at a time.

    Bounded-feed loop (round 15, guide §1.2/§5): the old form fed each
    member's decompressobj everything buffered — zlib copies the bytes
    after the member into ``unused_data``, so M members inside one chunk
    paid O(M x chunk) memcpy. Each decompress call now sees <= _GZ_FEED
    bytes of a memoryview over the buffer; offsets, yielded bytes and
    the corrupt/truncated error contract are unchanged."""
    import zlib

    buf = bytearray()
    base = 0  # file offset of buf[0]
    cur = 0  # index into buf of the next unfed byte
    file_done = False

    def _ensure_data() -> bool:
        nonlocal buf, base, cur, file_done
        if cur < len(buf):
            return True
        if file_done:
            return False
        if cur:
            del buf[:cur]
            base += cur
            cur = 0
        data = fh.read(chunk_size)
        if not data:
            file_done = True
            return len(buf) > 0
        buf += data
        return True

    while _ensure_data():
        member_off = base + cur
        d = zlib.decompressobj(wbits=31)
        out = bytearray()
        while True:
            if cur == len(buf) and not _ensure_data():
                raise ValueError(
                    f"truncated gzip member at compressed offset {member_off}"
                )
            end = min(len(buf), cur + _GZ_FEED)
            with memoryview(buf) as mv:
                try:
                    out += d.decompress(mv[cur:end])
                except zlib.error as e:
                    raise ValueError(
                        f"corrupt gzip member at compressed offset {member_off}: {e}"
                    ) from e
            cur = end - len(d.unused_data)
            if d.eof:
                break
        yield member_off, (base + cur) - member_off, bytes(out)


def _iter_split_units(fh) -> Iterator[tuple[int, int, int]]:
    """(offset, length, n_records) units the manifest packer consumes:
    plain files yield one unit per record span; gz files yield one unit
    per gzip member (offset/length in COMPRESSED bytes), with the member's
    inflated bytes span-walked so n_records is exact and the walk keeps
    the parser's validation guarantees on gz input too."""
    import io

    magic = fh.read(2)
    fh.seek(0)
    if magic == _GZIP_MAGIC:
        for off, clen, plain in iter_warc_gz_members(fh):
            n = sum(1 for _ in iter_warc_spans(io.BytesIO(plain)))
            yield off, clen, n
    else:
        for off, ln in iter_warc_spans(fh):
            yield off, ln, 1


_MANIFEST_SCHEMA = StructType(
    [
        StructField("warc_path", StringType()),
        StructField("split_id", LongType()),
        StructField("offset", LongType()),
        StructField("length", LongType()),
        StructField("first_rec_index", LongType()),
        StructField("n_records", LongType()),
    ]
)


def warc_split_manifest(
    paths_df: DataFrame,
    target_bytes: int,
    path_col: str = "warc_path",
) -> DataFrame:
    """Build the record-aligned split manifest for a set of WARC files:
    one output row per split of ~``target_bytes`` (greedy packing of
    whole records — a split always starts AND ends on a record boundary,
    so every split parses independently). One header-walk task per file
    (``iter_warc_spans``); the walk reads headers only, so bytes moved
    scale with RECORD COUNT, not file size, and worker memory stays O(1)
    (the packer consumes the span stream left-to-right without ever
    materializing it). ``first_rec_index`` carries the file-
    global record numbering into each split so the ranged parse is
    bit-identical to the whole-file parse.

    ``.warc.gz`` files (sniffed per file by gzip magic, mixed dirs fine)
    pack whole GZIP MEMBERS instead — member boundaries are record
    boundaries under the spec's record-at-time compression, offsets and
    lengths are in compressed bytes, and the walk inflates one member at
    a time (no header shortcut exists in gzip), so worker memory stays
    one record either way."""
    import pandas as pd

    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    names = [f.name for f in _MANIFEST_SCHEMA.fields]

    def run(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for path in pdf[path_col]:
                # greedy packing consumes spans strictly left-to-right, so
                # the walk streams in O(1) memory — a 40 GB file of ~1 KB
                # records never materializes its ~40M span tuples
                split_id, first_rec = 0, 0
                cur_off, cur_len, cur_n = None, 0, 0
                with open(path, "rb") as fh:
                    for off, ln, nrec in _iter_split_units(fh):
                        if cur_off is not None and cur_len + ln > target_bytes:
                            rows.append(
                                {
                                    "warc_path": path,
                                    "split_id": split_id,
                                    "offset": cur_off,
                                    "length": cur_len,
                                    "first_rec_index": first_rec,
                                    "n_records": cur_n,
                                }
                            )
                            split_id += 1
                            first_rec += cur_n
                            cur_off, cur_len, cur_n = None, 0, 0
                        if cur_off is None:
                            cur_off = off
                        cur_len += ln
                        cur_n += nrec
                if cur_off is not None:
                    rows.append(
                        {
                            "warc_path": path,
                            "split_id": split_id,
                            "offset": cur_off,
                            "length": cur_len,
                            "first_rec_index": first_rec,
                            "n_records": cur_n,
                        }
                    )
            yield pd.DataFrame(rows, columns=names)

    return paths_df.select(F.col(path_col).cast("string").alias(path_col)).mapInPandas(
        run, _MANIFEST_SCHEMA
    )


_PATH_RECORD_SCHEMA = StructType(
    [StructField("warc_path", StringType())] + _RECORD_SCHEMA.fields[1:]
)


def read_warc_manifest(manifest_df: DataFrame) -> DataFrame:
    """Ranged WARC read: one task per manifest split — open, seek to
    ``offset``, read ``length`` bytes, parse. Because splits are
    record-aligned and carry ``first_rec_index``, the union over splits
    equals the whole-file parse row-for-row (pytest-pinned). This is the
    shape that keeps task size bounded when single files outgrow
    executors. Splits whose bytes start with the gzip magic (manifests
    built over ``.warc.gz``) inflate their whole members first — split
    boundaries are member boundaries, so the inflated concatenation is a
    plain record-aligned WARC slice."""
    import pandas as pd

    names = [f.name for f in _PATH_RECORD_SCHEMA.fields]

    def run(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            # one yield PER SPLIT: an Arrow batch can carry thousands of
            # manifest rows, and holding every split's decoded payloads
            # until one final yield would put (rows x target_bytes) in
            # the worker at once — the opposite of what the manifest is
            # for. Worker memory stays ~one split this way.
            for path, off, ln, base in zip(
                pdf["warc_path"], pdf["offset"], pdf["length"], pdf["first_rec_index"]
            ):
                with open(path, "rb") as fh:
                    fh.seek(int(off))
                    blob = fh.read(int(ln))
                if len(blob) != int(ln):
                    raise ValueError(
                        f"{path}: ranged read at {off} got {len(blob)} of {ln} bytes"
                    )
                if blob[:2] == _GZIP_MAGIC:
                    blob = gunzip_warc_bytes(blob)
                rows = []
                for rec in parse_warc_bytes(blob):
                    rec["rec_index"] += int(base)
                    rows.append({"warc_path": str(path), **rec})
                yield pd.DataFrame(rows, columns=names)

    return manifest_df.select(
        "warc_path", "offset", "length", "first_rec_index"
    ).mapInPandas(run, _PATH_RECORD_SCHEMA)


def read_warc_dir(spark, path: str) -> DataFrame:
    """Whole-file WARC ingestion: ``binaryFile`` scan (one task per
    file) exploded to records — same output schema as
    ``read_warc_manifest`` so the two paths are interchangeable and
    directly comparable. ``.warc.gz`` files are sniffed per blob by the
    gzip magic and inflated first (mixed plain/gz dirs are fine)."""
    import pandas as pd

    blobs = spark.read.format("binaryFile").load(path).select(
        F.col("path").alias("warc_path"), F.col("content").alias("payload")
    )
    names = [f.name for f in _PATH_RECORD_SCHEMA.fields]

    def run(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            # one yield PER FILE, matching read_warc_manifest's per-split
            # yield: an Arrow batch can carry several whole files, and
            # holding every file's decoded records until one final yield
            # would put the batch's entire decompressed payload in the
            # worker at once (round-12 review finding)
            for p, blob in zip(pdf["warc_path"], pdf["payload"]):
                data = bytes(blob)
                if data[:2] == _GZIP_MAGIC:
                    data = gunzip_warc_bytes(data)
                yield pd.DataFrame(
                    [{"warc_path": str(p), **rec} for rec in parse_warc_bytes(data)],
                    columns=names,
                )

    return blobs.mapInPandas(run, _PATH_RECORD_SCHEMA)
