"""Real-file WARC scale path (sources/warc.py round 12): binaryFile
whole-file reads, the header-walk split manifest, and the ranged read —
whose union must equal the whole-file parse row-for-row."""
from __future__ import annotations

import io

import pytest
from pyspark.sql import functions as F

from pgvectorscale_spark.sources.warc import (
    attach_warc_payload,
    iter_warc_spans,
    parse_warc_bytes,
    read_warc_dir,
    read_warc_manifest,
    warc_split_manifest,
)
from tests.test_warc import _http, _rec


@pytest.fixture(scope="module")
def warc_dir(spark, tmp_path_factory):
    """Three real .warc files on disk, synthesized from the documents
    table (40 docs per file, each file opens with a warcinfo record)."""
    from pgvectorscale_spark.sources.tables import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001").filter(
        "doc_id < 120"
    )
    blobs = attach_warc_payload(docs, group_size=40).collect()
    assert len(blobs) == 3
    d = tmp_path_factory.mktemp("warcs")
    for r in blobs:
        (d / f"seg-{int(r['warc_id']):05d}.warc").write_bytes(bytes(r["payload"]))
    return d


def _row_key(r):
    return (r["warc_path"], r["rec_index"])


def _row_val(r):
    return (
        r["warc_type"],
        r["record_id"],
        r["target_uri"],
        r["http_status"],
        r["content_length"],
        r["payload"],
        r["payload_len"],
    )


def test_read_warc_dir_matches_blob_parse(spark, warc_dir):
    got = {
        _row_key(r): _row_val(r)
        for r in read_warc_dir(spark, str(warc_dir) + "/*.warc").collect()
    }
    want = {}
    for p in sorted(warc_dir.glob("*.warc")):
        for rec in parse_warc_bytes(p.read_bytes()):
            want[(f"file:{p}", rec["rec_index"])] = (
                rec["warc_type"],
                rec["record_id"],
                rec["target_uri"],
                rec["http_status"],
                rec["content_length"],
                rec["payload"],
                rec["payload_len"],
            )
    # binaryFile reports file: URIs; compare on the path tail
    got_norm = {(k[0].split("/")[-1], k[1]): v for k, v in got.items()}
    want_norm = {(k[0].split("/")[-1], k[1]): v for k, v in want.items()}
    assert got_norm == want_norm
    assert len(got_norm) == 3 * 41  # warcinfo + 40 responses per file


def test_manifest_splits_tile_and_ranged_parse_equals_whole_file(spark, warc_dir):
    paths = sorted(str(p) for p in warc_dir.glob("*.warc"))
    paths_df = spark.createDataFrame([(p,) for p in paths], "warc_path string")
    manifest = warc_split_manifest(paths_df, target_bytes=2000).collect()
    by_path: dict[str, list] = {}
    for m in manifest:
        by_path.setdefault(m["warc_path"], []).append(m)
    assert set(by_path) == set(paths)
    import os

    for p, ms in by_path.items():
        ms.sort(key=lambda m: m["split_id"])
        assert ms[0]["offset"] == 0
        assert len(ms) > 1, "target_bytes=2000 must split these files"
        for a, b in zip(ms, ms[1:]):
            assert b["offset"] == a["offset"] + a["length"]  # exact tiling
        assert ms[-1]["offset"] + ms[-1]["length"] == os.path.getsize(p)
        assert ms[0]["first_rec_index"] == 0
        for a, b in zip(ms, ms[1:]):
            assert b["first_rec_index"] == a["first_rec_index"] + a["n_records"]
    manifest_df = spark.createDataFrame(manifest, warc_split_manifest(paths_df, 2000).schema)
    got = {
        _row_key(r): _row_val(r) for r in read_warc_manifest(manifest_df).collect()
    }
    whole = {
        (k[0].replace("file:", ""), k[1]): v
        for k, v in (
            (_row_key(r), _row_val(r))
            for r in read_warc_dir(spark, str(warc_dir) + "/*.warc").collect()
        )
    }
    assert got == whole


def test_spans_are_length_driven_not_scanned():
    """A body containing a fake WARC header must not fool the walk —
    spans come from Content-Length arithmetic, never from searching
    bodies for separators."""
    fake = b"WARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    data = _rec({"WARC-Type": "response", "Content-Type": "application/http"}, _http(fake)) + _rec(
        {"WARC-Type": "metadata"}, b"tail"
    )
    spans = list(iter_warc_spans(io.BytesIO(data)))
    assert len(spans) == 2
    assert spans[0][0] == 0
    assert spans[0][1] + spans[1][1] == len(data)
    # and the parse agrees record-for-record
    assert len(parse_warc_bytes(data)) == 2


def test_span_walk_rejections():
    good = _rec({"WARC-Type": "metadata"}, b"x" * 32)
    with pytest.raises(ValueError, match="separator"):
        list(iter_warc_spans(io.BytesIO(good[:-2])))
    with pytest.raises(ValueError, match="unterminated"):
        list(iter_warc_spans(io.BytesIO(b"WARC/1.0\r\nContent-Length: 4\r\n")))
    with pytest.raises(ValueError, match="not a WARC record"):
        list(iter_warc_spans(io.BytesIO(b"HTTP/1.1 200 OK\r\n\r\n\r\n\r\n")))
    with pytest.raises(ValueError, match="Content-Length"):
        list(iter_warc_spans(io.BytesIO(b"WARC/1.0\r\nWARC-Type: x\r\n\r\n\r\n\r\n")))


def test_record_larger_than_target_gets_own_split(spark, tmp_path):
    """Greedy packing never emits an empty split: a record bigger than
    target_bytes becomes a single-record split and tiling still holds."""
    big = _rec({"WARC-Type": "metadata"}, b"y" * 5000)
    small = _rec({"WARC-Type": "metadata"}, b"z" * 10)
    p = tmp_path / "big.warc"
    p.write_bytes(big + small + big)
    paths_df = spark.createDataFrame([(str(p),)], "warc_path string")
    ms = sorted(
        warc_split_manifest(paths_df, target_bytes=100).collect(),
        key=lambda m: m["split_id"],
    )
    assert [m["n_records"] for m in ms] == [1, 1, 1]
    assert sum(m["length"] for m in ms) == len(big) * 2 + len(small)
    got = read_warc_manifest(
        spark.createDataFrame(ms, warc_split_manifest(paths_df, 100).schema)
    ).collect()
    assert sorted(r["rec_index"] for r in got) == [0, 1, 2]


def test_span_walk_folds_headers_like_the_parser():
    """Review finding (round 12): a folded continuation line that happens
    to start with 'content-length:' is DATA of the previous header, not a
    length — the span walk must apply the same LWS folding as
    parse_warc_bytes or the two disagree about where records end on a
    perfectly valid file."""
    body = _http(b"hello")
    head = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"Content-Type: application/http\r\n"
        b"WARC-Custom: x\r\n content-length: 20\r\n"  # folded continuation
        + f"Content-Length: {len(body)}\r\n".encode()
        + b"\r\n"
    )
    data = head + body + b"\r\n\r\n" + _rec({"WARC-Type": "metadata"}, b"t")
    spans = list(iter_warc_spans(io.BytesIO(data)))
    recs = parse_warc_bytes(data)
    assert len(spans) == len(recs) == 2
    assert spans[0][1] == len(head) + len(body) + 4
    # and a FOLDED Content-Length VALUE is rejected by both sides alike
    bad = (
        b"WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 1\r\n 0\r\n\r\n"
        + b"x" * 10
        + b"\r\n\r\n"
    )
    with pytest.raises(ValueError):
        parse_warc_bytes(bad)
    with pytest.raises(ValueError):
        list(iter_warc_spans(io.BytesIO(bad)))


# ---------------------------------------------------------------------------
# .warc.gz (round 13): production Common Crawl layout — one gzip member per
# record. gz parse must equal plain parse of the same records; the manifest
# packs whole members (compressed offsets tile exactly); mixed dirs sniff
# per file; truncation fail-stops.
# ---------------------------------------------------------------------------

from pgvectorscale_spark.sources.warc import (  # noqa: E402
    gunzip_warc_bytes,
    gzip_warc_bytes,
    iter_warc_gz_members,
)


def _three_records() -> bytes:
    return (
        _rec({"WARC-Type": "response", "Content-Type": "application/http",
              "WARC-Target-URI": "https://example.org/a"}, _http(b"alpha body"))
        + _rec({"WARC-Type": "metadata"}, b"meta " * 40)
        + _rec({"WARC-Type": "response", "Content-Type": "application/http",
              "WARC-Target-URI": "https://example.org/b"}, _http(b"beta " * 30))
    )


def test_gz_roundtrip_and_member_walk():
    plain = _three_records()
    gz = gzip_warc_bytes(plain)
    assert gz[:2] == b"\x1f\x8b"
    assert gunzip_warc_bytes(gz) == plain
    members = list(iter_warc_gz_members(io.BytesIO(gz)))
    # one member per record, compressed offsets tile the gz file exactly
    assert len(members) == 3
    assert members[0][0] == 0
    for (ao, al, _), (bo, _, _) in zip(members, members[1:]):
        assert bo == ao + al
    assert members[-1][0] + members[-1][1] == len(gz)
    # each member's inflated bytes are exactly one record span of the plain
    spans = list(iter_warc_spans(io.BytesIO(plain)))
    for (_, _, body), (off, ln) in zip(members, spans):
        assert body == plain[off : off + ln]


def test_gz_truncated_member_fail_stop():
    gz = gzip_warc_bytes(_three_records())
    with pytest.raises(ValueError, match="truncated gzip member"):
        list(iter_warc_gz_members(io.BytesIO(gz[:-4])))
    with pytest.raises(ValueError, match="truncated gzip member"):
        gunzip_warc_bytes(gz[:-4])


@pytest.fixture(scope="module")
def warc_gz_dir(warc_dir, tmp_path_factory):
    """The warc_dir fixture's exact files, recompressed one-member-per-record."""
    d = tmp_path_factory.mktemp("warcs_gz")
    for p in sorted(warc_dir.glob("*.warc")):
        (d / (p.name + ".gz")).write_bytes(gzip_warc_bytes(p.read_bytes()))
    return d


def _norm(rows):
    # compare on the path tail (binaryFile reports file: URIs) with the
    # .gz/.warc suffix stripped so plain and gz reads align
    out = {}
    for r in rows:
        tail = r["warc_path"].split("/")[-1].removesuffix(".gz").removesuffix(".warc")
        out[(tail, r["rec_index"])] = _row_val(r)
    return out


def test_gz_dir_read_equals_plain_dir_read(spark, warc_dir, warc_gz_dir):
    plain = _norm(read_warc_dir(spark, str(warc_dir) + "/*.warc").collect())
    gz = _norm(read_warc_dir(spark, str(warc_gz_dir) + "/*.warc.gz").collect())
    assert gz == plain
    assert len(gz) == 3 * 41


def test_gz_manifest_tiles_and_ranged_equals_whole(spark, warc_gz_dir):
    import os

    paths = sorted(str(p) for p in warc_gz_dir.glob("*.warc.gz"))
    paths_df = spark.createDataFrame([(p,) for p in paths], "warc_path string")
    manifest = warc_split_manifest(paths_df, target_bytes=1200).collect()
    by_path: dict[str, list] = {}
    for m in manifest:
        by_path.setdefault(m["warc_path"], []).append(m)
    assert set(by_path) == set(paths)
    for p, ms in by_path.items():
        ms.sort(key=lambda m: m["split_id"])
        assert ms[0]["offset"] == 0 and ms[0]["first_rec_index"] == 0
        assert len(ms) > 1, "target_bytes=1200 must split these gz files"
        for a, b in zip(ms, ms[1:]):
            assert b["offset"] == a["offset"] + a["length"]  # compressed tiling
            assert b["first_rec_index"] == a["first_rec_index"] + a["n_records"]
        assert ms[-1]["offset"] + ms[-1]["length"] == os.path.getsize(p)
    got = _norm(
        read_warc_manifest(
            spark.createDataFrame(manifest, warc_split_manifest(paths_df, 1200).schema)
        ).collect()
    )
    whole = _norm(read_warc_dir(spark, str(warc_gz_dir) + "/*.warc.gz").collect())
    assert got == whole and len(got) == 3 * 41


def test_mixed_dir_plain_plus_gz(spark, tmp_path):
    plain = _three_records()
    (tmp_path / "a.warc").write_bytes(plain)
    (tmp_path / "b.warc.gz").write_bytes(gzip_warc_bytes(plain))
    rows = read_warc_dir(spark, str(tmp_path) + "/*").collect()
    assert len(rows) == 6
    paths_df = spark.createDataFrame(
        [(str(tmp_path / "a.warc"),), (str(tmp_path / "b.warc.gz"),)],
        "warc_path string",
    )
    ms = warc_split_manifest(paths_df, target_bytes=150).collect()
    got = read_warc_manifest(
        spark.createDataFrame(ms, warc_split_manifest(paths_df, 150).schema)
    ).collect()
    assert _norm(got) != {}
    assert len(got) == 6
    # the same record content arrives from both files
    a = {(k[1],): v for k, v in _norm(got).items() if k[0] == "a"}
    b = {(k[1],): v for k, v in _norm(got).items() if k[0] == "b"}
    assert a == b and len(a) == 3


def test_multi_record_gz_member_counts_records(spark, tmp_path):
    """The spec permits a member holding several records; first_rec_index
    must still be file-global and the ranged parse correct."""
    import zlib

    plain = _three_records()
    spans = list(iter_warc_spans(io.BytesIO(plain)))
    # member 1 = records 0+1 together, member 2 = record 2
    cut = spans[1][0] + spans[1][1]
    gz = b""
    for part in (plain[:cut], plain[cut:]):
        c = zlib.compressobj(6, zlib.DEFLATED, 31)
        gz += c.compress(part) + c.flush()
    p = tmp_path / "multi.warc.gz"
    p.write_bytes(gz)
    paths_df = spark.createDataFrame([(str(p),)], "warc_path string")
    ms = sorted(
        warc_split_manifest(paths_df, target_bytes=1).collect(),
        key=lambda m: m["split_id"],
    )
    assert [m["n_records"] for m in ms] == [2, 1]
    assert ms[1]["first_rec_index"] == 2
    got = read_warc_manifest(
        spark.createDataFrame(ms, warc_split_manifest(paths_df, 1).schema)
    ).collect()
    assert sorted(r["rec_index"] for r in got) == [0, 1, 2]


def test_span_walk_mirrors_parser_strictness():
    """Round-12 review findings: the walk must reject what the parser
    rejects — unknown versions and separator-less header lines — so a
    manifest's success implies the ranged parse will succeed."""
    bad_version = b"WARC/0.9\r\nContent-Length: 1\r\n\r\nx\r\n\r\n"
    with pytest.raises(ValueError, match="unsupported WARC version"):
        list(iter_warc_spans(io.BytesIO(bad_version)))
    with pytest.raises(ValueError):
        parse_warc_bytes(bad_version)
    no_colon = b"WARC/1.0\r\nContent-Length: 1\r\nbogusline\r\n\r\nx\r\n\r\n"
    with pytest.raises(ValueError, match="malformed WARC header line"):
        list(iter_warc_spans(io.BytesIO(no_colon)))
    with pytest.raises(ValueError, match="malformed WARC header line"):
        parse_warc_bytes(no_colon)


def test_gz_members_with_fname_and_mtime_headers():
    """Real crawlers write gzip members with FNAME/MTIME header fields;
    zlib's wbits=31 parses them transparently — the member walk and the
    inflate must both cope (the synthesis helper writes bare headers, so
    this pins the read side against gzip-module-authored members)."""
    import gzip

    plain = _three_records()
    spans = list(iter_warc_spans(io.BytesIO(plain)))
    gz = b""
    for off, ln in spans:
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", filename="r.warc", mtime=1234567) as g:
            g.write(plain[off : off + ln])
        gz += buf.getvalue()
    assert gunzip_warc_bytes(gz) == plain
    members = list(iter_warc_gz_members(io.BytesIO(gz)))
    assert len(members) == 3
    assert members[-1][0] + members[-1][1] == len(gz)
    assert b"".join(m[2] for m in members) == plain
