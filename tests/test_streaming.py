"""Structured Streaming plane: windowed aggs, micro-batch index ingest,
stream-static near-dup screening. Streams are driven with availableNow
triggers over file sources so each test is deterministic and bounded."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pgvectorscale_spark.operators.diskann import DiskannIndex
from pgvectorscale_spark.operators.dedup import lsh_band_buckets, minhash_signatures
from pgvectorscale_spark.operators.relational import events_hourly
from pgvectorscale_spark.streaming.ingest import stream_delete, stream_insert
from pgvectorscale_spark.streaming.windows import (
    events_windowed_stream,
    streaming_neardup_candidates,
)
from tests.conftest import make_vectors


def _ts(h, m=0):
    return dt.datetime(2026, 1, 1, h, m)


@pytest.fixture()
def event_rows(spark, tmpdir):
    rows = [
        (1, _ts(9, 5), 7, "click", 1.25),
        (2, _ts(9, 40), 7, "click", 2.50),
        (3, _ts(9, 55), 8, "view", 0.75),
        (4, _ts(10, 10), 7, "click", 4.00),
        (5, _ts(10, 20), 9, "view", 3.10),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    path = str(tmpdir.join("events_in"))
    df.coalesce(1).write.parquet(path)
    return df, path


def test_events_windowed_stream_matches_batch(spark, tmpdir, event_rows):
    batch_df, path = event_rows
    stream = spark.readStream.schema(batch_df.schema).parquet(path)
    out = events_windowed_stream(stream, window_duration="1 hour", watermark_delay="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("ev_windows")
        .outputMode("complete")  # append would hold windows until the watermark passes
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmpdir.join("ckpt_ev")))
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r["event_type"], r["hour_epoch"]): (r["event_count"], r["value_cents"])
        for r in spark.sql("SELECT * FROM ev_windows").collect()
    }
    exp = {
        (r["event_type"], r["hour_epoch"]): (r["event_count"], r["value_cents"])
        for r in events_hourly(batch_df).collect()
    }
    assert got == exp  # the batch rollup is the stream's backfill


def test_stream_insert_then_search(spark, tmpdir):
    base = make_vectors(spark, n=120, dim=16, seed=7)
    idx = DiskannIndex.build(
        base, str(tmpdir.join("idx")), distance_type="l2", num_shards=2, target_shard_size=100
    )
    new = make_vectors(spark, n=140, dim=16, seed=7).filter("vec_id >= 120")
    in_path = str(tmpdir.join("stream_in"))
    new.coalesce(1).write.parquet(in_path)

    stream = spark.readStream.schema(new.schema).parquet(in_path)
    q = stream_insert(idx, stream, checkpoint_dir=str(tmpdir.join("ckpt_ins")))
    q.awaitTermination(120)
    assert idx.full_scan().count() == 140

    target = new.filter("vec_id = 130").first()["embedding"]
    got = [r["node_id"] for r in idx.search(target, k=3).collect()]
    assert got[0] == 130  # streamed vector is its own nearest neighbor


def test_stream_delete_tombstones(spark, tmpdir):
    base = make_vectors(spark, n=60, dim=8, seed=3)
    idx = DiskannIndex.build(
        base, str(tmpdir.join("idx_d")), distance_type="l2", num_shards=2, target_shard_size=50
    )
    dels = spark.createDataFrame([(0,), (1,)], "vec_id long")
    in_path = str(tmpdir.join("del_in"))
    dels.coalesce(1).write.parquet(in_path)
    stream = spark.readStream.schema(dels.schema).parquet(in_path)
    q = stream_delete(idx, stream, checkpoint_dir=str(tmpdir.join("ckpt_del")))
    q.awaitTermination(120)
    assert idx.full_scan().count() == 58
    q0 = base.filter("vec_id = 0").first()["embedding"]
    top = [r["node_id"] for r in idx.search(q0, k=5).collect()]
    assert 0 not in top and 1 not in top


def test_streaming_neardup_screen(spark, tmpdir, documents):
    static_docs = documents.limit(50)
    static_buckets = lsh_band_buckets(
        minhash_signatures(static_docs, num_hashes=8), bands=4, rows_per_band=2
    )
    # stream two docs: one exact copy of doc 7, one novel
    dup_text = documents.filter("doc_id = 7").first()["text"]
    new_docs = spark.createDataFrame(
        [(1000, dup_text), (1001, "entirely novel text never seen before xyzzy")],
        "doc_id long, text string",
    )
    in_path = str(tmpdir.join("docs_in"))
    new_docs.coalesce(1).write.parquet(in_path)
    stream = spark.readStream.schema(new_docs.schema).parquet(in_path)
    out = streaming_neardup_candidates(stream, static_buckets, num_hashes=8, bands=4)
    q = (
        out.writeStream.format("memory")
        .queryName("neardup")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmpdir.join("ckpt_nd")))
        .start()
    )
    q.awaitTermination(120)
    pairs = {(r["new_doc_id"], r["dup_of"]) for r in spark.sql("SELECT * FROM neardup").collect()}
    assert (1000, 7) in pairs
    assert all(a != 1001 for a, _ in pairs)  # novel doc matches nothing


def test_stream_insert_into_kmeans_index(spark, tmpdir):
    """Streaming ingest into a Voronoi-sharded index: micro-batch inserts
    route by the centroid table, searches see every streamed vector."""
    import numpy as np

    from pgvectorscale_spark.operators.diskann import DiskannIndex
    from pgvectorscale_spark.streaming.ingest import stream_insert

    rng = np.random.default_rng(23)
    base = rng.normal(size=(120, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, base[i].tolist()) for i in range(120)], "vec_id long, embedding array<float>"
    )
    idx = DiskannIndex.build(
        df, str(tmpdir.join("idx_kstream")), distance_type="l2", num_shards=2,
        shard_assignment="kmeans",
    )
    new = rng.normal(size=(10, 8)).astype(np.float32)
    src = str(tmpdir.join("kstream_in"))
    ndf = spark.createDataFrame(
        [(200 + i, new[i].tolist()) for i in range(10)], "vec_id long, embedding array<float>"
    )
    ndf.filter("vec_id < 205").coalesce(1).write.parquet(src)
    ndf.filter("vec_id >= 205").coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(ndf.schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = stream_insert(
        idx, stream, checkpoint_dir=str(tmpdir.join("ckpt_kstream"))
    )
    q.awaitTermination(120)
    assert idx.full_scan().count() == 130
    got = [r["node_id"] for r in idx.search(new[3].tolist(), k=3, search_list_size=256).collect()]
    assert got[0] == 203  # streamed vector findable, routed to the right cell


def test_sessionize_stream_matches_batch(spark, tmpdir):
    from pgvectorscale_spark.streaming.sessionize import sessionize_batch, sessionize_stream

    rows = [
        # user 7: two sessions separated by a 40-min gap
        (1, _ts(9, 0), 7, "click", 1.0),
        (2, _ts(9, 10), 7, "click", 1.0),
        (3, _ts(9, 50), 7, "view", 1.0),
        (4, _ts(9, 55), 7, "view", 1.0),
        # user 8: one session
        (5, _ts(9, 20), 8, "click", 1.0),
        # sentinel far in the future: advances the watermark so all real
        # sessions time out and emit within the availableNow run
        (6, _ts(23, 0), 99, "click", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    path = str(tmpdir.join("sess_in"))
    # two files -> two micro-batches: state must carry across batches
    df.filter("event_id <= 2").coalesce(1).write.parquet(path)
    df.filter("event_id > 2").coalesce(1).write.mode("append").parquet(path)

    stream = spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(path)
    out = sessionize_stream(stream, gap_seconds=1800, watermark_delay="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmpdir.join("ckpt_sess")))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["event_count"])
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    exp_all = {
        (r["user_id"], r["session_start"], r["session_end"], r["event_count"])
        for r in sessionize_batch(df, gap_seconds=1800).collect()
    }
    # every emitted session must be a true session; users 7 and 8 must have
    # fully closed (the sentinel's own session stays open past end-of-stream)
    assert got <= exp_all
    closed_users = {u for (u, *_rest) in got}
    assert {7, 8} <= closed_users
    assert sum(1 for (u, *_r) in got if u == 7) == 2  # both of user 7's sessions


def test_sessionize_stream_update_mode(spark, tmpdir):
    """emit='update': open sessions surface a live snapshot every
    micro-batch (is_final=False) before the closing row (is_final=True) —
    the outputMode=update variant for live-session dashboards."""
    from pgvectorscale_spark.streaming.sessionize import sessionize_batch, sessionize_stream

    rows = [
        (1, _ts(9, 0), 7, "click", 1.0),
        (2, _ts(9, 10), 7, "click", 1.0),
        (3, _ts(9, 50), 7, "view", 1.0),
        (4, _ts(9, 55), 7, "view", 1.0),
        (5, _ts(23, 0), 99, "click", 1.0),  # watermark sentinel
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    path = str(tmpdir.join("sessu_in"))
    df.filter("event_id <= 2").coalesce(1).write.parquet(path)
    df.filter("event_id > 2").coalesce(1).write.mode("append").parquet(path)

    stream = spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(path)
    out = sessionize_stream(stream, gap_seconds=1800, watermark_delay="0 seconds", emit="update")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_upd")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmpdir.join("ckpt_sessu")))
        .start()
    )
    q.awaitTermination(120)
    rows_out = spark.sql("SELECT * FROM sessions_upd").collect()
    snaps = [r for r in rows_out if not r["is_final"] and r["user_id"] == 7]
    finals = {
        (r["user_id"], r["session_start"], r["session_end"], r["event_count"])
        for r in rows_out
        if r["is_final"]
    }
    # batch 1 saw only user 7's first two events: a live snapshot at count 2
    assert any(r["event_count"] == 2 for r in snaps), snaps
    # every closed session is a true session from the batch twin
    exp_all = {
        (r["user_id"], r["session_start"], r["session_end"], r["event_count"])
        for r in sessionize_batch(df, gap_seconds=1800).collect()
    }
    assert finals <= exp_all
    assert sum(1 for (u, *_r) in finals if u == 7) == 2


def test_stream_dedup_exact_first_arrival_wins(spark, tmpdir):
    """Cross-micro-batch exact dedup: within a batch the smallest id keeps
    (the batch operator's canonical rule); a later batch's copy of content
    already seen is dropped entirely."""
    from pgvectorscale_spark.streaming.dedup import stream_dedup_exact

    rows = [
        # batch 1: 'aaa' twice (ids 3, 1 -> 1 keeps), 'bbb' once
        (3, "aaa"), (1, "aaa"), (2, "bbb"),
        # batch 2: 'aaa' again (dropped), 'ccc' new (kept), 'bbb' again (dropped)
        (10, "aaa"), (11, "ccc"), (12, "bbb"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmpdir.join("sdd_in"))
    df.filter("doc_id <= 3").coalesce(1).write.parquet(path)
    df.filter("doc_id >= 10").coalesce(1).write.mode("append").parquet(path)

    stream = spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(path)
    out = stream_dedup_exact(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sdd")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmpdir.join("ckpt_sdd")))
        .start()
    )
    q.awaitTermination(120)
    got = {r["text"]: r["doc_id"] for r in spark.sql("SELECT * FROM sdd").collect()}
    assert got == {"aaa": 1, "bbb": 2, "ccc": 11}
    # hashes match the batch operator's h60 fragment (cross-engine family)
    hashes = {r["text"]: r["content_hash"] for r in spark.sql("SELECT * FROM sdd").collect()}
    from pgvectorscale_spark.functions.hashing import SPARK, h60

    expected = {
        r["text"]: r["h"]
        for r in spark.createDataFrame([(t,) for t in hashes], "text string")
        .selectExpr("text", f"{h60('text', SPARK)} as h")
        .collect()
    }
    assert hashes == expected


def test_stream_dedup_ttl_expires_state(spark, tmpdir):
    """With a processing-time TTL, a hash's state expires after quiet time
    and the content is re-admitted (bounded-state mode)."""
    import time

    from pgvectorscale_spark.streaming.dedup import stream_dedup_exact

    path = str(tmpdir.join("sdt_in"))
    df1 = spark.createDataFrame([(1, "xxx")], "doc_id long, text string")
    df1.coalesce(1).write.parquet(path)
    stream = spark.readStream.schema(df1.schema).option("maxFilesPerTrigger", 1).parquet(path)
    out = stream_dedup_exact(stream, state_ttl_seconds=1)
    q = (
        out.writeStream.format("memory")
        .queryName("sdt")
        .outputMode("append")
        .trigger(processingTime="2 seconds")
        .option("checkpointLocation", str(tmpdir.join("ckpt_sdt")))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.sql("SELECT * FROM sdt").count() < 1:
            time.sleep(1)
        time.sleep(5)  # TTL (1 s) passes; timeout fires on a later trigger
        df2 = spark.createDataFrame([(2, "xxx")], "doc_id long, text string")
        df2.coalesce(1).write.mode("append").parquet(path)
        while time.time() < deadline and spark.sql("SELECT * FROM sdt").count() < 2:
            time.sleep(1)
        rows = sorted(r["doc_id"] for r in spark.sql("SELECT * FROM sdt").collect())
        assert rows == [1, 2]  # re-admitted after state expiry
    finally:
        q.stop()


def test_stream_neardup_parity_with_batch_lsh(spark, tmpdir):
    """Incremental MinHash-LSH over id-ordered micro-batches == the batch
    operator: a doc is dropped iff it is the LARGER side of at least one
    batch candidate pair (any shared band bucket with an earlier doc) —
    exactly dedup.minhash_candidate_pairs' pair set replayed first-arrival.
    Run over the sf0.01 documents table split into 5 micro-batches."""
    from pgvectorscale_spark.operators import dedup
    from pgvectorscale_spark.streaming.dedup import stream_neardup_band_verdicts

    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text")
    )
    n = docs.count()
    path = str(tmpdir.join("snd_in"))
    # 5 id-ordered files -> 5 micro-batches (arrival order = id order)
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    cuts = [ids[i * len(ids) // 5] for i in range(1, 5)] + [ids[-1] + 1]
    lo = ids[0]
    for hi in cuts:
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        lo = hi
    stream = spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(path)
    q = (
        stream_neardup_band_verdicts(stream)
        .writeStream.format("memory")
        .queryName("snd")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmpdir.join("ckpt_snd")))
        .start()
    )
    q.awaitTermination(180)
    hit_ids = {
        r["doc_id"]
        for r in spark.sql("SELECT DISTINCT doc_id FROM snd WHERE bucket_hit").collect()
    }
    stream_keepers = set(ids) - hit_ids
    # batch twin: dropped = larger element of any candidate pair
    dropped_batch = {
        r["doc_b"] for r in dedup.minhash_candidate_pairs(docs).collect()
    }
    batch_keepers = set(ids) - dropped_batch
    assert stream_keepers == batch_keepers
    assert 0 < len(stream_keepers) < n  # corpus has near-dups AND survivors


def test_stream_neardup_within_batch_and_keepers_helper(spark, tmpdir):
    """Within one micro-batch the smallest id claims each bucket; the
    neardup_keepers fold keeps exactly the docs with no hit verdict. A
    short text yields one whole-text shingle and buckets normally — doc 9
    keeps because its buckets are fresh, not because it is skipped."""
    from pgvectorscale_spark.streaming.dedup import (
        neardup_keepers,
        stream_neardup_band_verdicts,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (5, base),
        (2, base),                # same content, smaller id -> 2 keeps, 5 drops
        (7, "completely different words entirely unrelated content here now"),
        (9, "xy"),                # short text: one whole-text shingle, fresh buckets
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmpdir.join("sndw_in"))
    df.coalesce(1).write.parquet(path)
    stream = spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(path)
    q = (
        stream_neardup_band_verdicts(stream)
        .writeStream.format("memory")
        .queryName("sndw")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmpdir.join("ckpt_sndw")))
        .start()
    )
    q.awaitTermination(120)
    verdicts = spark.sql("SELECT * FROM sndw")
    keepers = {r["doc_id"] for r in neardup_keepers(df, verdicts).collect()}
    assert keepers == {2, 7, 9}


def test_stream_dedup_neardup_end_to_end(spark, tmpdir):
    """The packaged pipeline emits exactly the batch LSH keeper set (with
    payloads) across id-ordered micro-batches of sf0.01 documents."""
    from pgvectorscale_spark.operators import dedup
    from pgvectorscale_spark.streaming.dedup import stream_dedup_neardup

    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text")
        .filter("doc_id < 200")
    )
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    path = str(tmpdir.join("snde_in"))
    cuts = [ids[len(ids) // 2], ids[-1] + 1]
    lo = ids[0]
    for hi in cuts:
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        lo = hi
    got = {}

    def sink(keepers_df, batch_id):
        for r in keepers_df.collect():
            got[r["doc_id"]] = r["text"]

    stream = spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(path)
    q = stream_dedup_neardup(
        stream, sink, checkpoint_dir=str(tmpdir.join("ckpt_snde"))
    )
    q.awaitTermination(180)
    dropped = {r["doc_b"] for r in dedup.minhash_candidate_pairs(docs).collect()}
    want = set(ids) - dropped
    assert set(got) == want
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert all(got[i] == texts[i] for i in got)  # payloads intact


def test_stream_neardup_out_of_order_one_survivor_per_clique(spark, tmpdir):
    """Arrival order != id order: the stream keeps EXACTLY ONE member of
    every pairwise-bucket-sharing near-dup cluster under shuffled arrival
    (the operator's documented out-of-order invariant), and the survivor
    is the FIRST ARRIVAL (here: the cluster's largest id, fed in the
    earliest micro-batch), not the batch pass's min id. Singleton docs
    always survive."""
    import random

    from pgvectorscale_spark.operators import dedup
    from pgvectorscale_spark.streaming.dedup import stream_dedup_neardup

    words = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu one two three four"
    ).split()
    rng = random.Random(99)
    rows = []
    n_clusters, n_members = 4, 4
    for c in range(n_clusters):
        base = list(words)
        rng.shuffle(base)
        base = [f"c{c}{w}" for w in base]  # cluster marker: no cross-match
        for j in range(n_members):
            # append-only variation: members stay pairwise near-identical
            # (high Jaccard => every pair shares band buckets, asserted
            # below), which is the boilerplate-cluster shape the invariant
            # covers
            variant = base + [f"edit{c}{j}"]
            rows.append((10 * j + c, " ".join(variant)))
    for s in range(4):  # singletons: unrelated content
        rows.append((100 + s, " ".join(f"solo{s}{w}" for w in words[s : s + 12])))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # precondition for the invariant: every cluster is a CLIQUE in the
    # batch candidate-pair graph (members pairwise share a band bucket)
    pair_set = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_candidate_pairs(df).collect()
    }
    for c in range(n_clusters):
        members = sorted(10 * j + c for j in range(n_members))
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                assert (members[x], members[y]) in pair_set, (c, members[x], members[y])
    assert not any(a >= 100 or b >= 100 for a, b in pair_set)  # singletons clean

    # arrival order REVERSES id order: batch k carries ids {30-k*10 + c}
    # (so the largest-id member of every cluster arrives first); the
    # singletons ride the third batch
    path = str(tmpdir.join("sndo_in"))
    for k, j in enumerate(reversed(range(n_members))):
        batch_ids = [10 * j + c for c in range(n_clusters)]
        if k == 2:
            batch_ids += [100 + s for s in range(4)]
        df.filter(F.col("doc_id").isin(batch_ids)).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    got = {}

    def sink(keepers_df, batch_id):
        for r in keepers_df.collect():
            got[r["doc_id"]] = batch_id

    stream = spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(path)
    q = stream_dedup_neardup(stream, sink, checkpoint_dir=str(tmpdir.join("ckpt_sndo")))
    q.awaitTermination(180)

    survivors = set(got)
    # exactly one survivor per clique-cluster: the FIRST ARRIVAL, which by
    # construction is the largest id (30 + c), proving the stream follows
    # arrival order, not id order
    for c in range(n_clusters):
        cluster_survivors = survivors & {10 * j + c for j in range(n_members)}
        assert cluster_survivors == {30 + c}, (c, cluster_survivors)
    # singletons all survive
    assert {100 + s for s in range(4)} <= survivors
    assert len(survivors) == n_clusters + 4


def test_stream_paragraph_dedup_parity_with_batch(spark, tmpdir):
    """Per-paragraph first-arrival dedup over (doc, idx)-ordered
    micro-batches equals the batch operator (dedup.paragraph_dedup):
    same normalization, same hash groups, same keeper occurrence — and
    empty-normalized paragraphs are always keepers in both."""
    from pgvectorscale_spark.operators import dedup as bdedup
    from pgvectorscale_spark.streaming.dedup import stream_paragraph_dedup

    docs = [
        (0, "alpha beta\n\nSubscribe NOW!!\n\ndelta"),
        (1, "zeta eta\n\n...subscribe, now\n\nalpha beta"),
        # batch 2 (cross-batch duplicates + the content-free '###')
        (10, "SUBSCRIBE now\n\n###\n\nzeta eta"),
        (11, "fresh paragraph only"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    path = str(tmpdir.join("spd_in"))
    df.filter("doc_id < 10").coalesce(1).write.parquet(path)
    df.filter("doc_id >= 10").coalesce(1).write.mode("append").parquet(path)
    stream = spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(path)
    q = (
        stream_paragraph_dedup(stream)
        .writeStream.format("memory")
        .queryName("spd")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmpdir.join("ckpt_spd")))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["para_idx"]): r["is_keeper"]
        for r in spark.sql("SELECT * FROM spd").collect()
    }
    # batch twin over the whole corpus: arrival order == (doc, idx) order,
    # so keeper sets must be identical
    batch = {
        r["doc_id"]: r["kept_str"]
        for r in bdedup.paragraph_dedup(df).collect()
    }
    want_kept = {
        (d, int(i)) for d, kept in batch.items() for i in kept.split(",") if kept
    }
    stream_kept = {k for k, keep in got.items() if keep}
    assert stream_kept == want_kept
    # every paragraph got exactly one verdict row
    n_paras = sum(t.count("\n\n") + 1 for _, t in docs)
    assert len(got) == n_paras
    # the content-free '###' paragraph is a keeper even though another
    # empty-normalized paragraph could share its group later
    assert got[(10, 1)] is True


def test_stream_as_of_join_matches_batch_in_order(spark, tmpdir):
    """Single in-order batch: the streaming enrichment equals the batch
    as_of_join row for row (inclusive boundary, tie rule, tolerance)."""
    from pgvectorscale_spark.operators.relational import as_of_join
    from pgvectorscale_spark.streaming.asof import stream_as_of_join

    rows = [
        # (key, ts, is_right, rid)
        (1, 100, True, 7),
        (1, 100, False, 0),   # equal ts: right sorts first -> matches 7
        (1, 200, True, 8),
        (1, 200, True, 9),    # tie on ts: largest rid wins
        (1, 205, False, 0),
        (1, 400, False, 0),   # best match age 200 > tolerance 150 -> none
        (2, 50, False, 0),    # no right at all
    ]
    df = spark.createDataFrame(rows, "key long, ts long, is_right boolean, rid long")
    path = str(tmpdir.join("asof_in"))
    df.coalesce(1).write.parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    out = stream_as_of_join(
        stream, on="key", ts_col="ts", is_right_col="is_right",
        right_id_col="rid", tolerance=150,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("asof_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmpdir.join("ckpt_asof")))
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r["key"], r["ts"]): (r["matched_ts"], r["matched_id"])
        for r in spark.sql("SELECT * FROM asof_stream").collect()
    }
    left = df.filter("NOT is_right").select("key", "ts")
    right = df.filter("is_right").select("key", "ts", "rid")
    expect = {
        (r["key"], r["ts"]): (r["ts_matched"], r["rid_matched"])
        for r in as_of_join(
            left, right, on="key", left_ts="ts", right_ts="ts",
            value_cols=["rid"], right_tiebreak="rid", tolerance=150,
        ).collect()
    }
    assert got == expect
    assert got[(1, 100)] == (100, 7)
    assert got[(1, 205)] == (200, 9)
    assert got[(1, 400)] == (None, None)


def test_stream_as_of_join_state_carries_across_batches(spark, tmpdir):
    """A right row from an earlier micro-batch matches left rows in
    later batches through the two-long state."""
    from pgvectorscale_spark.streaming.asof import stream_as_of_join

    schema = "key long, ts long, is_right boolean, rid long"
    path = str(tmpdir.join("asof_in2"))
    spark.createDataFrame([(1, 100, True, 7)], schema).coalesce(1).write.parquet(path)
    spark.createDataFrame(
        [(1, 150, False, 0), (1, 90, False, 0)], schema
    ).coalesce(1).write.mode("append").parquet(path)
    stream = (
        spark.readStream.schema(spark.read.parquet(path).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = stream_as_of_join(
        stream, on="key", ts_col="ts", is_right_col="is_right", right_id_col="rid"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("asof_stream2")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmpdir.join("ckpt_asof2")))
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r["key"], r["ts"]): (r["matched_ts"], r["matched_id"])
        for r in spark.sql("SELECT * FROM asof_stream2").collect()
    }
    assert got[(1, 150)] == (100, 7)  # batch-1 view enriches a batch-2 click
    # a stored right NEWER than a late-arriving left never matches
    # (no anti-causal enrichment); what a late left row loses is only
    # rights that arrived after it — the batch operator is the replay tool
    assert got[(1, 90)] == (None, None)
