"""Round-15 optimization pins.

Each test guards one round-15 change:
- mega-bucket pair paths emit pairs via a two-level explode (per-value
  memory O(c), never the c²/2 in-row pair array) with the pair SET
  unchanged — including a planted hot bucket the old shape would have
  materialized as one quadratic array value;
- the gz member walk / gunzip are linear in member count (bounded-feed),
  byte-identical to the old whole-buffer feed;
- _assign_nearest routes length-mismatched vectors to the old SQL fold's
  NULL-distance path instead of raising;
- VamanaGraph.search accepts a pre-quantized qcode bit-identically;
- winnowing emits the h60('') fingerprint for NULL text (the documented
  behavior the removed dead filter never changed).
"""

from __future__ import annotations

import io

import numpy as np
import pytest
from pyspark.sql import functions as F

from pgvectorscale_spark.operators import dedup


@pytest.fixture(scope="module")
def hot_bucket_docs(spark):
    """300 IDENTICAL docs (every LSH band collides into one bucket) plus a
    handful of distinct rows — the mega-bucket shape that made the old
    flatten(transform(...)) pair expression materialize C(300,2) = 44,850
    structs in a single row value."""
    rows = [(i, "common boilerplate page body repeated across the crawl") for i in range(300)]
    rows += [(1000 + i, f"unique document number {i} with its own words entirely") for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_pairs_hot_bucket_exact_and_bounded(spark, hot_bucket_docs):
    pairs = dedup.minhash_candidate_pairs(hot_bucket_docs, num_hashes=16, bands=4)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    # the 300 identical docs share every bucket: exactly C(300,2) pairs
    # among them, each a < b; no clone ever pairs with a unique doc
    # (disjoint token sets), though two unique docs may share a band by
    # LSH chance
    want = {(a, b) for a in range(300) for b in range(a + 1, 300)}
    assert {(a, b) for a, b in got if a < 300 or b < 300} == want
    # plan shape: pairing is a two-level explode (posexplode + suffix
    # slice), NOT one in-row flatten of the full pair array
    pairs.count()
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "posexplode" in final
    assert "flatten(transform(_m" not in final


def test_simhash_pairs_hot_bucket_exact(spark, hot_bucket_docs):
    sp = dedup.simhash_pairs(hot_bucket_docs, max_hamming=3)
    got = {(r["doc_a"], r["doc_b"]) for r in sp.collect()}
    want = {(a, b) for a in range(300) for b in range(a + 1, 300)}
    # identical docs have identical fingerprints (hamming 0); unique docs
    # may or may not collide with each other but never with the clones at
    # hamming <= 3 given disjoint token sets — check the clone block only
    assert want <= got
    assert all(r["hamming"] == 0 for r in sp.filter("doc_a < 300 and doc_b < 300").collect())


def test_embedding_lsh_hot_bucket_exact(spark):
    # 200 identical vectors: every band collides; pair set must be exactly
    # C(200,2) with cosine 1.0
    rows = [(i, [1.0, 0.5, -0.25, 0.125]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = dedup.embedding_neardup_lsh(df, threshold=0.99, bands=4, rows_per_band=4)
    got = {(r["id_a"], r["id_b"], r["cosine_sim"]) for r in out.collect()}
    assert got == {(a, b, 1.0) for a in range(200) for b in range(a + 1, 200)}


def test_ngram_prefix_hot_shingle_pairs_exact(spark, hot_bucket_docs):
    out = dedup.ngram_jaccard_pairs(hot_bucket_docs, threshold=0.9)
    got = {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in out.collect()}
    assert got == {(a, b, 1.0) for a in range(300) for b in range(a + 1, 300)}


def test_multiprobe_two_level_explode_matches_flatten(spark, hot_bucket_docs):
    """The multiprobe a×b pairing rewritten as explode-per-member must equal
    the r14 flatten(transform(...)) form — replicated verbatim here."""
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup.simhash_pairs_multiprobe(hot_bucket_docs, max_hamming=6).collect()
    }
    want = {(a, b, 0) for a in range(300) for b in range(a + 1, 300)}
    assert want <= got
    assert all(h <= 6 for _, _, h in got)


# ---- gz walkers: bounded-feed rewrite ----------------------------------


def _one_record(i: int, body_len: int = 120) -> bytes:
    body = bytes([120]) * body_len
    hdr = (
        b"WARC/1.0\r\nWARC-Type: resource\r\nWARC-Record-ID: <urn:r15:%d>\r\n"
        b"Content-Length: %d\r\n\r\n" % (i, body_len)
    )
    return hdr + body + b"\r\n\r\n"


def test_gz_walk_many_members_linear_parity():
    from pgvectorscale_spark.sources.warc import (
        gunzip_warc_bytes,
        gzip_warc_bytes,
        iter_warc_gz_members,
    )

    plain_members = [_one_record(i) for i in range(3000)]
    gz_members = [gzip_warc_bytes(m) for m in plain_members]
    blob = b"".join(gz_members)
    # gunzip: concatenation of inflated members, byte-exact
    assert gunzip_warc_bytes(blob) == b"".join(plain_members)
    # member walk: exact compressed-offset tiling + per-member bytes
    out = list(iter_warc_gz_members(io.BytesIO(blob)))
    assert len(out) == 3000
    off = 0
    for (o, ln, plain), gz, want_plain in zip(out, gz_members, plain_members):
        assert o == off and ln == len(gz) and plain == want_plain
        off += ln
    assert off == len(blob)


def test_gz_walk_error_contracts():
    from pgvectorscale_spark.sources.warc import (
        gunzip_warc_bytes,
        gzip_warc_bytes,
        iter_warc_gz_members,
    )

    m = gzip_warc_bytes(_one_record(0))
    with pytest.raises(ValueError, match="truncated gzip member"):
        gunzip_warc_bytes(m + m[:-4])
    with pytest.raises(ValueError, match=f"corrupt gzip member at compressed offset {len(m)}"):
        gunzip_warc_bytes(m + b"not gzip at all....")
    with pytest.raises(ValueError, match="truncated gzip member"):
        list(iter_warc_gz_members(io.BytesIO(m[:-4])))
    assert gunzip_warc_bytes(b"") == b""
    assert list(iter_warc_gz_members(io.BytesIO(b""))) == []


# ---- _assign_nearest length-mismatch path -------------------------------


def test_assign_nearest_length_mismatch_takes_null_path(spark):
    from pgvectorscale_spark.operators.similarity import ivf_assign

    mix = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0]), (2, [0.5]), (3, None), (4, [0.0, 0.0, 9.0])],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(10, [0.0, 0.0]), (11, [1.0, 1.0])], "centroid_id long, centroid array<double>"
    )
    got = {
        r["vec_id"]: (r["centroid_id"], r["assign_dist"])
        for r in ivf_assign(mix, distance_type="l2", centroids_df=cents).collect()
    }
    # matched lengths assign normally; short/long/NULL all fall to the
    # lowest centroid id with NULL distance (the old zip_with fold's
    # null-padding semantics), instead of raising in np.stack
    assert got == {0: (10, 0.0), 1: (11, 0.0), 2: (10, None), 3: (10, None), 4: (10, None)}


# ---- Vamana qcode pass-through ------------------------------------------


def test_search_with_precomputed_qcode_bit_identical():
    from pgvectorscale_spark.operators.sbq import SbqQuantizer
    from pgvectorscale_spark.operators.vamana import VamanaGraph

    rng = np.random.default_rng(7)
    mat = rng.random((400, 16), dtype=np.float32)
    q = SbqQuantizer(mat.mean(axis=0), mat.var(axis=0), bits_per_dimension=2)
    codes = q.quantize_matrix(mat)
    g = VamanaGraph(
        mat, distance_type="l2", codes=codes, quantize_fn=lambda v: q.quantize(v)
    )
    g.build_bulk()
    queries = rng.random((20, 16))
    qcodes = q.quantize_matrix(queries)
    for i in range(len(queries)):
        idx_a, d_a = g.search(queries[i], k=0, search_list_size=30, rescore=0)
        idx_b, d_b = g.search(
            queries[i], k=0, search_list_size=30, rescore=0, qcode=qcodes[i]
        )
        np.testing.assert_array_equal(idx_a, idx_b)
        np.testing.assert_array_equal(d_a, d_b)


# ---- winnowing NULL text ------------------------------------------------


def test_winnowing_null_text_emits_empty_string_fingerprint(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    rows = dedup.winnowing_fingerprints(df).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["doc_id"], []).append((r["pos"], r["gram_hash"]))
    # NULL text and empty text both shingle to [''] -> one fingerprint at
    # pos 1 with identical hash (h60(''))
    assert by_id[1] == by_id[2]
    assert len(by_id[1]) == 1 and by_id[1][0][0] == 1
