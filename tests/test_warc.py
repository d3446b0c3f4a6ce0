"""WARC ingestion source (sources/warc.py): spec-honest record walk on
hand-written fixtures (independent of the synth path) plus the
attach → parse round trip on the real corpus."""
from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pgvectorscale_spark.sources.warc import (
    WARCINFO_BLOCK,
    attach_warc_payload,
    parse_warc_bytes,
    parse_warc_records,
)


def _rec(headers: dict[str, str], block: bytes, version: str = "1.0") -> bytes:
    head = f"WARC/{version}\r\n" + "".join(
        f"{k}: {v}\r\n" for k, v in headers.items()
    )
    return (
        head.encode() + f"Content-Length: {len(block)}\r\n".encode() + b"\r\n"
        + block + b"\r\n\r\n"
    )


def _http(body: bytes, status: str = "200 OK") -> bytes:
    return (
        f"HTTP/1.1 {status}\r\nContent-Type: text/plain; charset=utf-8\r\n\r\n".encode()
        + body
    )


def test_parse_two_records_mixed_case_and_versions():
    data = _rec(
        {"WARC-Type": "warcinfo", "Content-Type": "application/warc-fields"},
        b"software: x\r\n",
    ) + _rec(
        {
            "warc-type": "response",  # header names are case-insensitive
            "WARC-TARGET-URI": "https://example.org/doc/7",
            "WARC-Record-ID": "<urn:doc:7>",
            "content-type": "application/http;msgtype=response",
        },
        _http("café body".encode("utf-8")),
        version="1.1",
    )
    recs = parse_warc_bytes(data)
    assert [r["rec_index"] for r in recs] == [0, 1]
    assert recs[0]["warc_type"] == "warcinfo"
    assert recs[0]["http_status"] is None
    assert recs[0]["payload"] == "software: x\r\n"
    r = recs[1]
    assert r["warc_type"] == "response"
    assert r["target_uri"] == "https://example.org/doc/7"
    assert r["record_id"] == "<urn:doc:7>"
    assert r["http_status"] == 200
    assert r["payload"] == "café body"
    # octet length, not character count: é is 2 bytes in UTF-8
    assert r["payload_len"] == len("café body".encode("utf-8"))
    # content_length covers the HTTP headers too
    assert r["content_length"] > r["payload_len"]


def test_body_containing_fake_record_header_is_not_resplit():
    # Content-Length drives the walk — a body embedding the bytes
    # "WARC/1.0\r\n\r\n" must stay one record's payload
    evil = b"before WARC/1.0\r\n\r\nContent-Length: 0\r\n\r\nafter"
    data = _rec({"WARC-Type": "resource"}, evil)
    recs = parse_warc_bytes(data)
    assert len(recs) == 1
    assert recs[0]["payload"].encode() == evil


def test_non_http_response_block_passes_through():
    # a response record whose Content-Type is NOT application/http keeps
    # its block verbatim (no HTTP strip, no status)
    data = _rec(
        {"WARC-Type": "response", "Content-Type": "text/plain"}, b"raw block"
    )
    r = parse_warc_bytes(data)[0]
    assert r["http_status"] is None and r["payload"] == "raw block"


def test_parse_rejections():
    good_block = _http(b"x")
    with pytest.raises(ValueError, match="unsupported WARC version"):
        parse_warc_bytes(_rec({"WARC-Type": "response"}, b"x", version="0.9"))
    with pytest.raises(ValueError, match="not a WARC record"):
        parse_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="header block unterminated"):
        parse_warc_bytes(b"WARC/1.0\r\nWARC-Type: response\r\n")
    with pytest.raises(ValueError, match="missing mandatory Content-Length"):
        parse_warc_bytes(b"WARC/1.0\r\nWARC-Type: x\r\n\r\n\r\n\r\n")
    with pytest.raises(ValueError, match="malformed WARC header line"):
        parse_warc_bytes(b"WARC/1.0\r\nbogusline\r\nContent-Length: 0\r\n\r\n\r\n\r\n")
    truncated = _rec({"WARC-Type": "resource"}, b"0123456789")[:-8]
    with pytest.raises(ValueError, match="block truncated"):
        parse_warc_bytes(truncated)
    no_sep = _rec({"WARC-Type": "resource"}, b"abc")[:-4] + b"\r\n"
    with pytest.raises(ValueError, match="missing CRLFCRLF record separator"):
        parse_warc_bytes(no_sep)
    with pytest.raises(ValueError, match="malformed HTTP status line"):
        parse_warc_bytes(
            _rec(
                {"WARC-Type": "response", "Content-Type": "application/http"},
                b"NOTHTTP\r\n\r\nbody",
            )
        )
    with pytest.raises(ValueError, match="HTTP block without header terminator"):
        parse_warc_bytes(
            _rec(
                {"WARC-Type": "response", "Content-Type": "application/http"},
                b"HTTP/1.1 200 OK\r\nno-terminator",
            )
        )


def test_attach_parse_round_trip(spark, documents):
    recs = parse_warc_records(attach_warc_payload(documents, group_size=50)).cache()
    n_docs = documents.count()
    n_files = documents.select(
        F.floor(F.col("doc_id") / 50).alias("w")
    ).distinct().count()
    by_type = {r["warc_type"]: r["count"] for r in recs.groupBy("warc_type").agg(F.count("*").alias("count")).collect()}
    assert by_type == {"response": n_docs, "warcinfo": n_files}
    # warcinfo opens every file at rec_index 0 with the exact block
    infos = recs.filter("warc_type = 'warcinfo'").collect()
    assert all(r["rec_index"] == 0 and r["payload"] == WARCINFO_BLOCK for r in infos)
    # every document's text survives byte-exact, responses in doc order
    resp = recs.filter("warc_type = 'response'").select(
        "warc_id",
        "rec_index",
        F.regexp_extract("target_uri", "([0-9]+)$", 1).cast("long").alias("doc_id"),
        "payload",
        F.col("http_status"),
    )
    joined = resp.join(documents, "doc_id")
    assert joined.count() == n_docs
    assert joined.filter("payload != text").count() == 0
    assert joined.filter("http_status != 200").count() == 0
    order_violations = (
        resp.withColumn(
            "_prev",
            F.lag("doc_id").over(Window.partitionBy("warc_id").orderBy("rec_index")),
        )
        .filter("_prev is not null and _prev >= doc_id")
        .count()
    )
    assert order_violations == 0


def test_negative_content_length_rejected():
    """A negative Content-Length would walk the cursor backward into the
    header, letting body bytes masquerade as records — fail stop."""
    data = (
        b"WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: -4\r\n\r\n"
        b"WARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    )
    with pytest.raises(ValueError, match="negative Content-Length"):
        parse_warc_bytes(data)


def test_folded_header_continuation_lines():
    """ISO 28500 named fields inherit RFC 2616 LWS folding: SP/TAB-led
    lines continue the previous header's value (joined by one space);
    a continuation before any header fails stop."""
    long_uri_folded = (
        b"WARC/1.0\r\nWARC-Type: resource\r\n"
        b"WARC-Target-URI: https://example.org/a\r\n very/long: path\r\n"
        b"Content-Length: 2\r\n\r\nok\r\n\r\n"
    )
    r = parse_warc_bytes(long_uri_folded)[0]
    assert r["target_uri"] == "https://example.org/a very/long: path"
    assert r["payload"] == "ok"
    with pytest.raises(ValueError, match="continuation line before any header"):
        parse_warc_bytes(b"WARC/1.0\r\n folded-first\r\nContent-Length: 0\r\n\r\n\r\n\r\n")
