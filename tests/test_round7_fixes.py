"""Round-7 regression tests.

1. The snapshot protocol's fail-stop guarantee on the Spark read path for
   MAPPED partitions: a meta 2+ cycles stale that maps a shard to a
   fold-override gen dir whose copy of that shard was later superseded and
   swept (while the gen dir stays live for other shards) must raise
   StaleIndexReadError from snapshot_base_dirs — the executor path already
   did; previously the Spark ``nodes()`` view silently served zero rows.
2. Swept-marker write failures must not silently disable the staleness
   signal: sweep_trash writes the marker BEFORE deleting the data and
   RETAINS the trash entry (data unreclaimed) when the write fails.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from types import SimpleNamespace

import numpy as np
import pytest

from pgvectorscale_spark.operators import index_util
from pgvectorscale_spark.operators.diskann import DiskannIndex, StaleIndexReadError


@pytest.fixture(scope="module")
def tmpdir():
    d = tempfile.mkdtemp(prefix="round7_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _ids_for_shard(spark, shard, num_shards, start, count):
    """ids >= start whose hash assignment lands in `shard` (diskann.py
    _hash_shard_expr: pmod(xxhash64(id), num_shards))."""
    from pyspark.sql import functions as F

    rows = (
        spark.range(start, start + 50 * count)
        .withColumn("s", F.pmod(F.xxhash64(F.col("id").cast("long")), F.lit(num_shards)))
        .filter(F.col("s") == shard)
        .limit(count)
        .collect()
    )
    assert len(rows) == count
    return [int(r["id"]) for r in rows]


def _fold_only_shard(spark, idx, rng, shard, start, d=16):
    """Drive one full fold cycle whose delta chain touches ONLY `shard`."""
    ids = iter(_ids_for_shard(spark, shard, idx.meta.num_shards, start, 64))
    while True:
        vid = next(ids)
        idx.insert(
            spark.createDataFrame(
                [(vid, rng.random(d).astype(np.float32).tolist())],
                "vec_id long, embedding array<float>",
            )
        )
        if not idx.meta.delta_gens:
            return vid + 1


def test_stale_meta_mapping_partially_swept_override_raises_on_spark_path(spark, tmpdir):
    """2-cycle-stale meta maps shard 0 to a gen dir that a later fold
    partially swept (gen dir still live for shard 1): the Spark nodes()
    view must fail stop, not serve a view silently missing shard 0."""
    rng = np.random.default_rng(70)
    df = spark.createDataFrame(
        [(i, rng.random(16).tolist()) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    idx = DiskannIndex.build(
        df, f"{tmpdir}/partial_sweep", distance_type="l2", num_shards=2,
        id_col="vec_id", vector_col="embedding",
    )
    # fold 1 touches BOTH shards -> one gen dir mapped for shard 0 AND 1
    nxt = 9000
    while True:
        idx.insert(
            spark.createDataFrame(
                [(nxt, rng.random(16).tolist()), (nxt + 1, rng.random(16).tolist())],
                "vec_id long, embedding array<float>",
            )
        )
        nxt += 2
        if not idx.meta.delta_gens:
            break
    gen1 = idx.meta.shard_base["0"]
    assert gen1 == idx.meta.shard_base["1"]  # both shards share fold-1's dir
    stale = DiskannIndex.load(spark, idx.path)  # meta maps 0 AND 1 -> gen1
    # fold 2 touches only shard 0 -> gen1/shard=0 superseded (trash);
    # fold 3 (shard 0 again) sweeps it + writes gen1.swept/shard=0.
    nxt = _fold_only_shard(spark, idx, rng, 0, nxt)
    nxt = _fold_only_shard(spark, idx, rng, 0, nxt)
    assert idx.meta.shard_base["1"] == gen1  # gen1 still LIVE for shard 1
    marker = os.path.join(idx.path, f"{gen1}.swept", "shard=0")
    assert os.path.exists(marker)
    assert os.path.isdir(os.path.join(idx.path, gen1))  # parent not reclaimed
    with pytest.raises(StaleIndexReadError):
        stale.nodes().count()  # Spark path (driver view), not executor load
    # the CURRENT handle and a cold reload stay fully functional
    assert idx.nodes().select("node_id").distinct().count() > 200
    assert DiskannIndex.load(spark, idx.path).search(
        rng.random(16).tolist(), k=5
    ).count() == 5


def _sweep_meta(trash):
    return SimpleNamespace(
        trash_dirs=list(trash), shard_base={}, base_rel="nodes",
        delta_gens=[], centroids_rel=None,
    )


def test_failed_marker_write_retains_trash_entry(tmpdir, monkeypatch):
    """If the swept-marker write fails, sweep_trash must NOT delete the
    partition copy (the marker is the only thing standing between a stale
    reader and a silent empty shard) — the entry stays in trash_dirs for a
    later sweep."""
    root = os.path.join(tmpdir, "marker_fail")
    part = os.path.join(root, "nodes_gens", "aaaa00000000", "shard=0")
    os.makedirs(part)
    with open(os.path.join(part, "part.parquet"), "wb") as f:
        f.write(b"x")
    rel = "nodes_gens/aaaa00000000/shard=0"

    monkeypatch.setattr(index_util, "touch_file", lambda path: False)
    meta = _sweep_meta([rel])
    # keep the parent dir live so the marker branch is exercised
    meta.shard_base = {"1": "nodes_gens/aaaa00000000"}
    index_util.sweep_trash(root, meta)
    assert os.path.isdir(part)  # data NOT reclaimed
    assert meta.trash_dirs == [rel]  # entry retained for the next sweep
    assert not os.path.exists(index_util.swept_marker_path(part))

    monkeypatch.undo()
    meta2 = _sweep_meta(meta.trash_dirs)
    meta2.shard_base = {"1": "nodes_gens/aaaa00000000"}
    index_util.sweep_trash(root, meta2)
    assert not os.path.exists(part)  # reclaimed once the marker can be written
    assert os.path.exists(index_util.swept_marker_path(part))
    assert meta2.trash_dirs == []


def test_snapshot_base_dirs_probes_mapped_override_markers(tmpdir):
    """Unit twin of the fail-stop test: snapshot_base_dirs raises for a
    meta mapping a partition to an override dir whose .swept sibling marks
    that partition, and passes when only OTHER partitions are marked."""
    root = os.path.join(tmpdir, "probe_unit")
    os.makedirs(os.path.join(root, "nodes", "shard=2"))
    gen = "nodes_gens/bbbb00000000"
    os.makedirs(os.path.join(root, gen, "shard=1"))
    os.makedirs(os.path.join(root, f"{gen}.swept"))
    with open(os.path.join(root, f"{gen}.swept", "shard=0"), "wb"):
        pass
    ok_meta = SimpleNamespace(base_rel="nodes", shard_base={"1": gen})
    dirs = index_util.snapshot_base_dirs(root, ok_meta, "shard")
    assert (os.path.join(root, gen), [1]) in dirs  # marker for shard 0 ignored
    stale_meta = SimpleNamespace(base_rel="nodes", shard_base={"0": gen, "1": gen})
    with pytest.raises(index_util.StaleIndexReadError, match=r"\[0\]"):
        index_util.snapshot_base_dirs(root, stale_meta, "shard")


def _scan_partition_filters(df):
    """[(scan line, its PartitionFilters payload)] from the executed plan."""
    txt = df._jdf.queryExecution().executedPlan().toString()
    out = []
    for line in txt.splitlines():
        if "PartitionFilters: [" in line:
            out.append(line.split("PartitionFilters: [", 1)[1].split("]", 1)[0])
    return out


def test_mutation_membership_probe_is_partition_pruned(spark, tmpdir):
    """Round-5 #2 / round-6 carry-over: insert/delete bookkeeping must read
    only the touched shards' partitions — every parquet scan under the
    shard-restricted merge view carries a shard PartitionFilter (aminsert
    touches only affected pages, build.rs:537-558)."""
    from pyspark.sql import functions as F

    rng = np.random.default_rng(71)
    df = spark.createDataFrame(
        [(i, rng.random(8).tolist()) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    idx = DiskannIndex.build(
        df, f"{tmpdir}/prune", distance_type="l2", num_shards=4,
        id_col="vec_id", vector_col="embedding",
    )
    # open a delta chain so the pruned path covers base + delta scans
    idx.insert(
        spark.createDataFrame(
            [(9001, rng.random(8).tolist())], "vec_id long, embedding array<float>"
        )
    )
    assert idx.meta.delta_gens
    s = int(
        spark.range(9001, 9002)
        .select(F.pmod(F.xxhash64(F.col("id").cast("long")), F.lit(4)).cast("int").alias("s"))
        .first()["s"]
    )
    pruned = idx.nodes(shards=[s])
    filters = _scan_partition_filters(pruned.select("node_id"))
    assert filters, "expected parquet scans in the merge view"
    assert all("shard" in f for f in filters), filters  # every scan pruned
    # the unrestricted view's base scan is NOT shard-filtered (sanity: the
    # assertion above isn't vacuously true)
    unfiltered = _scan_partition_filters(idx.nodes().select("node_id"))
    assert any("shard" not in f for f in unfiltered)
    # semantics: the pruned view IS the shard's slice of the full view
    a = sorted(r["node_id"] for r in pruned.select("node_id").collect())
    b = sorted(
        r["node_id"] for r in idx.nodes().filter(F.col("shard") == s).select("node_id").collect()
    )
    assert a == b and 9001 in a


def test_delete_prunes_and_stays_correct(spark, tmpdir):
    """Hash-sharded delete computes candidate shards from the ids alone
    (pure function) and tombstones exactly those rows; search never
    resurfaces them."""
    rng = np.random.default_rng(72)
    df = spark.createDataFrame(
        [(i, rng.random(8).tolist()) for i in range(150)],
        "vec_id long, embedding array<float>",
    )
    idx = DiskannIndex.build(
        df, f"{tmpdir}/delprune", distance_type="l2", num_shards=4,
        id_col="vec_id", vector_col="embedding",
    )
    idx.delete([3, 7])
    live = {r["node_id"] for r in idx.full_scan().select("node_id").collect()}
    assert 3 not in live and 7 not in live and len(live) == 148
    got = [r["node_id"] for r in idx.search(rng.random(8).tolist(), k=10).collect()]
    assert 3 not in got and 7 not in got and len(got) == 10


def test_reader_lease_survives_two_maintenance_cycles(spark, tmpdir):
    """NOTES gap #3: a reader paused across TWO cycles normally fail-stops;
    holding a lease, the sweep retains its dirs and the read completes on
    both read paths with identical content. After release, the next cycle
    reclaims and the ordinary fail-stop returns."""
    from pgvectorscale_spark.operators.diskann import _read_shard_pdf
    from tests.test_snapshot_store import COLS, _build, _fold_chain

    idx, mat, rng = _build(spark, tmpdir, "lease", n=250)
    nxt = _fold_chain(spark, idx, rng, 9000)  # fold 1: shard override-mapped
    stale = DiskannIndex.load(spark, idx.path)  # pre-fold-2 meta snapshot
    stale_store = stale._store()
    before = (
        _read_shard_pdf(stale_store, 0, COLS).sort_values("node_id").reset_index(drop=True)
    )
    with stale.reader_lease(ttl_seconds=3600):
        nxt = _fold_chain(spark, idx, rng, nxt)  # fold 2: gen1 -> trash
        nxt = _fold_chain(spark, idx, rng, nxt)  # fold 3: would sweep gen1
        # both read paths complete, content identical to the pre-pause read
        after = (
            _read_shard_pdf(stale_store, 0, COLS)
            .sort_values("node_id")
            .reset_index(drop=True)
        )
        assert before["node_id"].tolist() == after["node_id"].tolist()
        assert stale.nodes().count() == len(before)  # Spark path, no raise
    # lease released: the NEXT cycle sweeps the (twice-retained) trash
    nxt = _fold_chain(spark, idx, rng, nxt)
    with pytest.raises(StaleIndexReadError):
        _read_shard_pdf(stale_store, 0, COLS)
    # current handle unaffected throughout
    assert idx.nodes().select("node_id").distinct().count() >= 250


def test_expired_lease_gives_no_pin(spark, tmpdir):
    """An expired lease is reaped and does not defer reclamation — the
    stale reader degrades to the ordinary fail-stop (never wrong data)."""
    from pgvectorscale_spark.operators.diskann import _read_shard_pdf
    from tests.test_snapshot_store import COLS, _build, _fold_chain

    idx, mat, rng = _build(spark, tmpdir, "lease_exp", n=200)
    nxt = _fold_chain(spark, idx, rng, 9000)
    stale = DiskannIndex.load(spark, idx.path)
    stale_store = stale._store()
    lease_cm = stale.reader_lease(ttl_seconds=0.0)  # born expired
    lease_cm.__enter__()
    nxt = _fold_chain(spark, idx, rng, nxt)
    nxt = _fold_chain(spark, idx, rng, nxt)  # sweep runs, lease expired
    with pytest.raises(StaleIndexReadError):
        _read_shard_pdf(stale_store, 0, COLS)
    lease_cm.__exit__(None, None, None)
    # lease files are reaped in passing by the sweep's scan
    assert index_util._live_lease_min_epoch(idx.path) is None


def test_ivf_reader_lease_survives_two_cycles(spark, tmpdir):
    """The lease protocol covers both index types: an IVF handle paused
    across two fold cycles completes under a lease and fail-stops after
    release."""
    from pgvectorscale_spark.operators.ivf_index import IvfIndex

    rng = np.random.default_rng(73)
    df = spark.createDataFrame(
        [(i, rng.random(8).tolist()) for i in range(120)],
        "vec_id long, embedding array<float>",
    )
    idx = IvfIndex.build(df, f"{tmpdir}/ivf_lease", num_centroids=3, kmeans_iterations=1)
    c1 = next(list(r["centroid"]) for r in idx.centroids().collect() if r["centroid_id"] == 1)

    def fold(start=[7000]):
        while True:
            idx.insert(
                spark.createDataFrame([(start[0], c1)], "vec_id long, embedding array<float>")
            )
            start[0] += 1
            if not idx.meta.delta_gens:
                return

    fold()
    stale = IvfIndex.load(spark, idx.path)
    n0 = stale.nodes().count()
    with stale.reader_lease(ttl_seconds=3600):
        fold()
        fold()
        assert stale.nodes().count() == n0  # paused reader completes
    fold()
    with pytest.raises(StaleIndexReadError):
        stale.nodes().count()
    assert idx.live_nodes().count() > 120  # current handle fine


def test_stream_neardup_ttl_readmits(spark, tmpdir):
    """With a processing-time TTL, a quiet bucket's state expires and the
    same near-dup content is re-admitted (bounded-state mode)."""
    import time

    from pgvectorscale_spark.streaming.dedup import stream_neardup_band_verdicts

    text = "the quick brown fox jumps over the lazy dog again and again"
    path = str(tmpdir) + "/sndttl_in"
    spark.createDataFrame([(1, text)], "doc_id long, text string").coalesce(1).write.parquet(path)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = (
        stream_neardup_band_verdicts(stream, state_ttl_seconds=1)
        .writeStream.format("memory")
        .queryName("sndttl")
        .outputMode("append")
        .trigger(processingTime="2 seconds")
        .option("checkpointLocation", str(tmpdir) + "/ckpt_sndttl")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline and spark.sql(
            "SELECT count(*) c FROM sndttl WHERE doc_id = 1"
        ).first()["c"] == 0:
            time.sleep(1)
        time.sleep(5)  # TTL passes; timeout fires on a later trigger
        spark.createDataFrame([(2, text)], "doc_id long, text string").coalesce(1).write.mode(
            "append"
        ).parquet(path)
        while time.time() < deadline and spark.sql(
            "SELECT count(*) c FROM sndttl WHERE doc_id = 2"
        ).first()["c"] == 0:
            time.sleep(1)
        hit2 = spark.sql(
            "SELECT count(*) c FROM sndttl WHERE doc_id = 2 AND bucket_hit"
        ).first()["c"]
        assert hit2 == 0  # state expired: doc 2's buckets were fresh again
    finally:
        q.stop()


def test_leased_readers_stress_through_continuous_folds(spark, tmpdir):
    """Protocol stress: reader threads that load a handle, lease it, pause
    across multiple fold cycles, and then read must EITHER see their exact
    snapshot row set or raise StaleIndexReadError — never wrong/partial
    data — while a writer folds continuously."""
    import threading

    from pgvectorscale_spark.operators.diskann import _read_shard_pdf
    from tests.test_snapshot_store import COLS, _build, _fold_chain

    idx, mat, rng = _build(spark, tmpdir, "lease_stress", n=200)
    nxt = [_fold_chain(spark, idx, rng, 9000)]
    stop = threading.Event()
    writer_err = []

    def writer():
        try:
            while not stop.is_set():
                nxt[0] = _fold_chain(spark, idx, rng, nxt[0])
        except Exception as ex:  # pragma: no cover
            writer_err.append(ex)

    results = []

    def reader(i):
        try:
            handle = DiskannIndex.load(spark, idx.path)
            with handle.reader_lease(ttl_seconds=3600):
                store = handle._store()
                expect = set(
                    _read_shard_pdf(store, 0, ["node_id"])["node_id"].tolist()
                )
                stop.wait(2.0 + 0.7 * i)  # pause across fold cycles
                got = set(_read_shard_pdf(store, 0, ["node_id"])["node_id"].tolist())
                results.append(("ok", expect == got))
        except StaleIndexReadError:
            results.append(("stale", True))  # fail-stop is acceptable
        except Exception as ex:
            results.append((f"BAD {type(ex).__name__}: {ex}", False))

    wt = threading.Thread(target=writer)
    rts = [threading.Thread(target=reader, args=(i,)) for i in range(4)]
    wt.start()
    for t in rts:
        t.start()
    for t in rts:
        t.join(timeout=180)
    stop.set()
    wt.join(timeout=180)
    assert not writer_err, writer_err
    assert len(results) == 4 and all(ok for _, ok in results), results
    # leased readers must have completed consistently, not just fail-stopped
    assert any(kind == "ok" for kind, _ in results), results
    # index healthy afterwards
    assert DiskannIndex.load(spark, idx.path).search(
        rng.random(16).tolist(), k=5
    ).count() == 5
