"""Round-14 pins for the round-13 ADVICE lows.

1. bm25_topk's zero-corpus early return must carry the SAME schema as
   the non-empty path (`rank` was IntegerType on the empty path, Long on
   the normal one — a union over the two branches would break).
2. hybrid_topk_served's labels=[] early return: same drift, same fix.
3. hybrid_topk_served must accept a one-shot iterable for `labels` —
   the old code exhausted a generator in the empty-check and the arms
   then saw an empty filter.
4. warc gz fail-stop contract: corrupt-but-complete member bytes (bad
   magic mid-stream, CRC mismatch) must surface as the same
   ValueError-with-compressed-offset the truncation path raises, not a
   raw zlib.error.
"""
from __future__ import annotations

import io

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def test_bm25_empty_corpus_schema_matches_nonempty(spark):
    from pgvectorscale_spark.operators.bm25 import bm25_topk

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    queries = spark.createDataFrame([(10, "beta")], "query_id long, q_text string")
    nonempty = bm25_topk(docs, queries, k=3)
    empty = bm25_topk(docs.filter("doc_id < 0"), queries, k=3)
    assert empty.count() == 0
    # names + types must match (nullability legitimately differs: the
    # non-empty rank comes from row_number and is non-nullable)
    assert [(f.name, f.dataType) for f in empty.schema] == [
        (f.name, f.dataType) for f in nonempty.schema
    ]
    assert isinstance(empty.schema["rank"].dataType, LongType)
    # and the two branches union cleanly (the failure mode the drift caused)
    assert nonempty.unionByName(empty).count() == nonempty.count()


def test_hybrid_served_empty_labels_schema(spark):
    """labels=[] short-circuits before the index is touched, so a dummy
    index object proves the early return alone; its schema must match
    rrf_fuse's output (rank long), not declare its own integer rank."""
    from pgvectorscale_spark.operators.hybrid import hybrid_topk_served, rrf_fuse

    corpus = spark.createDataFrame(
        [(1, "alpha beta", [1])], "doc_id long, text string, labels array<smallint>"
    )
    queries = spark.createDataFrame(
        [(10, "beta", [0.1, 0.2])],
        "query_id long, q_text string, q_vec array<double>",
    )
    out = hybrid_topk_served(object(), corpus, queries, k=3, labels=[])
    assert out.count() == 0
    fused = rrf_fuse(
        [spark.createDataFrame([(10, 1, 1)], "query_id long, doc_id long, rank long")],
        k=3,
    )
    assert [(f.name, f.dataType) for f in out.schema] == [
        (f.name, f.dataType) for f in fused.schema
    ]
    assert isinstance(out.schema["rank"].dataType, LongType)


def test_hybrid_served_labels_accepts_generator(spark, tmp_path):
    """A generator for `labels` must behave exactly like the equivalent
    list — materialized once, then reused by the empty-check, the
    lexical-arm filter, and the index search kwargs."""
    import numpy as np

    from pgvectorscale_spark.operators.diskann import DiskannIndex
    from pgvectorscale_spark.operators.hybrid import hybrid_topk_served

    rng = np.random.default_rng(14)
    words = ["apple", "banana", "cherry", "date", "elder", "fig", "grape", "kiwi"]
    rows = [
        (
            i,
            " ".join(rng.choice(words, 6).tolist()),
            rng.random(8).astype("float64").tolist(),
            [1, int(i % 3 + 2)],
        )
        for i in range(40)
    ]
    corpus = spark.createDataFrame(
        rows,
        "doc_id long, text string, embedding array<double>, labels array<smallint>",
    )
    idx = DiskannIndex.build(
        corpus.select(F.col("doc_id").alias("vec_id"), "embedding", "labels"),
        str(tmp_path / "gen_lbl_idx"),
        distance_type="cosine",
        num_shards=2,
        label_col="labels",
    )
    queries = corpus.filter("doc_id < 3").select(
        F.col("doc_id").alias("query_id"),
        F.expr("concat_ws(' ', slice(split(text, ' '), 1, 3))").alias("q_text"),
        F.col("embedding").alias("q_vec"),
    )
    want_list = sorted(
        tuple(r)
        for r in hybrid_topk_served(
            idx, corpus.select("doc_id", "text", "labels"), queries,
            k=5, arm_k=10, labels=[3],
        ).collect()
    )
    want_gen = sorted(
        tuple(r)
        for r in hybrid_topk_served(
            idx, corpus.select("doc_id", "text", "labels"), queries,
            k=5, arm_k=10, labels=(x for x in [3]),
        ).collect()
    )
    assert want_list, "labeled hybrid returned nothing — fixture too small"
    assert want_gen == want_list


def _gz_fixture() -> bytes:
    from tests.test_warc_scale import _three_records

    from pgvectorscale_spark.sources.warc import gzip_warc_bytes

    return gzip_warc_bytes(_three_records())


def test_gz_corrupt_member_raises_valueerror_with_offset():
    from pgvectorscale_spark.sources.warc import (
        gunzip_warc_bytes,
        iter_warc_gz_members,
    )

    gz = bytearray(_gz_fixture())
    members = list(iter_warc_gz_members(io.BytesIO(bytes(gz))))
    assert len(members) == 3
    # bad magic: stomp the second member's gzip header. The walk must
    # fail-stop with the member's compressed offset, like truncation.
    off2 = members[1][0]
    bad_magic = bytes(gz[:off2]) + b"XX" + bytes(gz[off2 + 2 :])
    with pytest.raises(ValueError, match=f"corrupt gzip member at compressed offset {off2}"):
        list(iter_warc_gz_members(io.BytesIO(bad_magic)))
    with pytest.raises(ValueError, match="corrupt gzip member"):
        gunzip_warc_bytes(bad_magic)
    # CRC mismatch: flip a byte in the first member's stored CRC32
    # (the 8 trailing bytes of a member are CRC32 + ISIZE)
    end1 = members[0][0] + members[0][1]
    crc_pos = end1 - 8
    crc_bad = bytearray(gz)
    crc_bad[crc_pos] ^= 0xFF
    with pytest.raises(ValueError, match="corrupt gzip member at compressed offset 0"):
        list(iter_warc_gz_members(io.BytesIO(bytes(crc_bad))))
    with pytest.raises(ValueError, match="corrupt gzip member"):
        gunzip_warc_bytes(bytes(crc_bad))
