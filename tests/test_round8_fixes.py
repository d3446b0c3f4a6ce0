"""Round-8 regression tests.

1. id -> shard/cell ROUTING SIDECAR (operators/routing_store.py): mutation
   membership probes on data-dependent sharding (kmeans DiskANN, IVF) read
   the rb-bucket-pruned sidecar plus the touched cells' files — never every
   cell's node_id pages (the round-7 `weak` scale finding; reference
   semantics: aminsert/ambulkdelete touch only affected pages,
   build.rs:537-558, vacuum.rs:23-136).
2. STAR-reduced LSH candidate edges for cluster dedup (dedup.py
   minhash_star_edges): a mega-bucket of c near-identical docs contributes
   O(c) edges, not c²/2 pairs, with identical connected components.
3. ADVICE fixes: strict FS probes in snapshot_base_dirs (transient errors
   propagate instead of masquerading as staleness), atomic+conservative
   reader-lease handling, JPEG fill-bytes-before-EOI, H.264 trailing-zero
   NAL trimming.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from types import SimpleNamespace

import numpy as np
import pytest
from pyspark.sql import functions as F

from pgvectorscale_spark.operators import index_util, routing_store
from pgvectorscale_spark.operators.diskann import DiskannIndex
from pgvectorscale_spark.operators.ivf_index import IvfIndex


@pytest.fixture(scope="module")
def tmpdir():
    d = tempfile.mkdtemp(prefix="round8_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _scan_partition_filters(df):
    """[(PartitionFilters payload)] from the executed plan, one per scan."""
    txt = df._jdf.queryExecution().executedPlan().toString()
    out = []
    for line in txt.splitlines():
        if "PartitionFilters: [" in line:
            out.append(line.split("PartitionFilters: [", 1)[1].split("]", 1)[0])
    return out


def _clustered_vectors(rng, n, d, n_clusters):
    """Vectors in n_clusters well-separated blobs so kmeans sharding is
    data-dependent and stable."""
    centers = rng.random((n_clusters, d)) * 10
    rows = []
    for i in range(n):
        c = centers[i % n_clusters]
        rows.append((i, (c + rng.random(d) * 0.1).astype(np.float32).tolist()))
    return rows


# ---- 1. routing sidecar ------------------------------------------------------


def test_kmeans_delete_probe_reads_sidecar_not_corpus(spark, tmpdir):
    """The round-7 done-bar: a 1-id delete on a kmeans-sharded DiskANN
    index answers 'which shard holds this id' from the rb-pruned routing
    sidecar alone — its scan's input files are sidecar files in the id's
    rb partition, never node parquet — and the subsequent row fetch is
    shard-PartitionFilter-pruned to that one shard."""
    rng = np.random.default_rng(80)
    df = spark.createDataFrame(
        _clustered_vectors(rng, 240, 8, 4), "vec_id long, embedding array<float>"
    )
    idx = DiskannIndex.build(
        df, f"{tmpdir}/kdel", distance_type="l2", num_shards=4,
        shard_assignment="kmeans", id_col="vec_id", vector_col="embedding",
    )
    assert routing_store.is_present(idx.meta)
    ids_df = spark.createDataFrame([(17,)], "node_id long")
    probe = routing_store.lookup(spark, idx.path, idx.meta, ids_df)
    # the probe scans the sidecar relation, not node parquet (executed plan;
    # NB inputFiles() ignores PartitionFilters so it cannot assert pruning)
    plan_txt = probe._jdf.queryExecution().executedPlan().toString()
    assert "id_routing_gens" in plan_txt, plan_txt
    assert "nodes_gens" not in plan_txt, plan_txt  # never node parquet
    # rb-pruned: only the id's bucket partition is opened
    b = int(
        spark.range(17, 18)
        .select(F.pmod(F.xxhash64(F.col("id").cast("long")), F.lit(idx.meta.routing_ids_buckets)).alias("b"))
        .first()["b"]
    )
    probe_filters = _scan_partition_filters(probe)
    assert probe_filters, plan_txt
    assert all("rb" in f and f"= {b})" in f for f in probe_filters), (b, probe_filters)
    # the probe answers the true stored shard
    true_shard = int(
        idx.nodes().filter(F.col("node_id") == 17).select("shard").first()["shard"]
    )
    got = probe.collect()
    assert {(r["node_id"], r["part"]) for r in got} == {(17, true_shard)}
    # the row fetch under nodes(shards=[...]) is partition-pruned
    fetch = idx.nodes(shards=[true_shard]).join(F.broadcast(ids_df), "node_id")
    filters = _scan_partition_filters(fetch)
    assert filters and all("shard" in f for f in filters), filters
    # end-to-end: delete works and the id never resurfaces
    idx.delete([17])
    q = idx.nodes().filter(F.col("node_id") == 17).select("deleted").collect()
    assert q and all(r["deleted"] for r in q)
    res = idx.search(rng.random(8).tolist(), k=240)
    assert 17 not in {r["node_id"] for r in res.collect()}


def test_kmeans_insert_upsert_pinned_via_sidecar(spark, tmpdir):
    """Upserts stay pinned to the stored shard (no duplicate node_id in a
    different shard) with the sidecar-backed probe, and each insert
    appends an O(batch) sidecar delta committed with the node delta."""
    rng = np.random.default_rng(81)
    df = spark.createDataFrame(
        _clustered_vectors(rng, 160, 8, 4), "vec_id long, embedding array<float>"
    )
    idx = DiskannIndex.build(
        df, f"{tmpdir}/kups", distance_type="l2", num_shards=4,
        shard_assignment="kmeans", id_col="vec_id", vector_col="embedding",
    )
    before = int(
        idx.nodes().filter(F.col("node_id") == 3).select("shard").first()["shard"]
    )
    n_deltas = len(idx.meta.routing_ids_deltas)
    # move id 3 far away: nearest centroid changes, the row must NOT
    far = (np.full(8, 50.0) + rng.random(8)).astype(np.float32).tolist()
    idx.insert(
        spark.createDataFrame([(3, far)], "vec_id long, embedding array<float>")
    )
    assert len(idx.meta.routing_ids_deltas) == n_deltas + 1
    rows = idx.nodes().filter(F.col("node_id") == 3).select("shard").collect()
    assert {int(r["shard"]) for r in rows} == {before}  # pinned, no duplicate
    # new vector is served
    res = idx.search(far, k=1).collect()
    assert res and res[0]["node_id"] == 3
    # fresh ids append to the sidecar and become probe-able
    idx.insert(
        spark.createDataFrame(
            [(9001, rng.random(8).astype(np.float32).tolist())],
            "vec_id long, embedding array<float>",
        )
    )
    probe = routing_store.lookup(
        spark, idx.path, idx.meta, spark.createDataFrame([(9001,)], "node_id long")
    ).collect()
    assert len(probe) == 1 and probe[0]["node_id"] == 9001


def test_kmeans_presidecar_index_backfills_once(spark, tmpdir):
    """An index whose meta predates the sidecar fields (simulated by
    clearing them) backfills ONE corpus pass on the next mutation, then
    probes the sidecar; results stay correct."""
    rng = np.random.default_rng(82)
    df = spark.createDataFrame(
        _clustered_vectors(rng, 120, 8, 3), "vec_id long, embedding array<float>"
    )
    idx = DiskannIndex.build(
        df, f"{tmpdir}/kback", distance_type="l2", num_shards=3,
        shard_assignment="kmeans", id_col="vec_id", vector_col="embedding",
    )
    # simulate a pre-round-8 index: drop the sidecar pointers
    idx.meta.routing_ids_rel = None
    idx.meta.routing_ids_deltas = []
    idx.meta.routing_ids_buckets = 0
    idx.meta.save(idx.path)
    idx = DiskannIndex.load(spark, idx.path)
    assert not routing_store.is_present(idx.meta)
    idx.delete([5])
    assert routing_store.is_present(idx.meta)  # backfilled + committed
    assert 5 not in {
        r["node_id"] for r in idx.search(rng.random(8).tolist(), k=120).collect()
    }
    # reloaded handle sees the committed sidecar
    assert routing_store.is_present(DiskannIndex.load(spark, idx.path).meta)


def test_ivf_mutation_probe_is_cell_pruned(spark, tmpdir):
    """IVF insert/delete membership probes restrict the merge view to the
    sidecar's cells for the batch ids: every parquet scan under the probe
    carries a centroid_id PartitionFilter, and a 1-id probe's node files
    come from that id's cell(s) only."""
    rng = np.random.default_rng(83)
    df = spark.createDataFrame(
        _clustered_vectors(rng, 200, 8, 8), "vec_id long, embedding array<float>"
    )
    idx = IvfIndex.build(df, f"{tmpdir}/ivfp", num_centroids=8, distance_type="l2")
    assert routing_store.is_present(idx.meta)
    ids_df = spark.createDataFrame([(11,)], "node_id long")
    cells = idx._routing_cells_for(ids_df)
    true_cell = int(
        idx.live_nodes().filter(F.col("node_id") == 11).select("centroid_id").first()[0]
    )
    assert cells == [true_cell]
    probe = idx._live_rows_for(ids_df, cells=cells)
    # executed-plan PartitionFilters carry the centroid_id restriction
    # (inputFiles() ignores PartitionFilters, so assert on the plan)
    filters = _scan_partition_filters(probe)
    assert filters and all("centroid_id" in f for f in filters), filters
    assert any(f"= {true_cell})" in f or f"IN ({true_cell})" in f for f in filters), (
        true_cell,
        filters,
    )
    # mutations through the pruned probes stay correct
    v = idx.live_nodes().filter(F.col("node_id") == 11).first()["vector"]
    idx.insert(
        spark.createDataFrame([(11, list(v))], "vec_id long, embedding array<float>")
    )
    assert idx.meta.num_rows == 200  # upsert counted as replace, not new
    idx.delete([11])
    assert idx.meta.num_rows == 199
    assert 11 not in {
        r["node_id"] for r in idx.search(list(v), k=50, nprobe=8).collect()
    }


def test_routing_sidecar_compaction_preserves_lookups(spark, tmpdir, monkeypatch):
    """Once the sidecar delta chain passes ROUTING_FOLD_GENS, the fold
    compacts it into one base dir; lookups are unchanged and superseded
    dirs ride trash_dirs (reclaimed by the next sweep, crash-safe)."""
    monkeypatch.setattr(routing_store, "ROUTING_FOLD_GENS", 2)
    rng = np.random.default_rng(84)
    df = spark.createDataFrame(
        _clustered_vectors(rng, 120, 8, 3), "vec_id long, embedding array<float>"
    )
    idx = DiskannIndex.build(
        df, f"{tmpdir}/kcomp", distance_type="l2", num_shards=3,
        shard_assignment="kmeans", id_col="vec_id", vector_col="embedding",
    )
    for i in range(3):
        idx.insert(
            spark.createDataFrame(
                [(8000 + i, rng.random(8).astype(np.float32).tolist())],
                "vec_id long, embedding array<float>",
            )
        )
    assert len(idx.meta.routing_ids_deltas) >= 2
    old_dirs = [idx.meta.routing_ids_rel, *idx.meta.routing_ids_deltas]
    idx._fold_deltas()
    assert idx.meta.routing_ids_deltas == []
    assert idx.meta.routing_ids_rel not in old_dirs
    for rel in old_dirs:
        assert rel in idx.meta.trash_dirs  # grace-cycle reclamation
    probe = routing_store.lookup(
        spark, idx.path, idx.meta,
        spark.createDataFrame([(8000,), (8002,), (1,)], "node_id long"),
    ).collect()
    assert {r["node_id"] for r in probe} == {8000, 8002, 1}
    # reload + search still green
    idx2 = DiskannIndex.load(spark, idx.path)
    assert idx2.search(rng.random(8).tolist(), k=5).count() == 5


# ---- 2. star-reduced LSH cluster edges ---------------------------------------


def test_star_edges_linear_in_mega_bucket(spark):
    """A cluster of c identical docs yields exactly c-1 star edges (every
    member linked to the min id) instead of c(c-1)/2 pairs, and
    dedup_clusters keeps exactly one canonical survivor."""
    from pgvectorscale_spark.operators import dedup

    c = 5000
    docs = spark.createDataFrame(
        [(i, "the same boilerplate page body repeated verbatim") for i in range(c)]
        + [(c + 1, "a completely different unique document body here")],
        "doc_id long, text string",
    )
    star = dedup.minhash_star_edges(docs)
    assert star.count() == c - 1  # O(c), not c²/2 = 12.5M
    assert star.agg(F.min("doc_a"), F.max("doc_a")).first() == (0, 0)
    clusters = dedup.dedup_clusters(docs)
    canon = clusters.filter("is_canonical").select("doc_id").collect()
    assert {r["doc_id"] for r in canon} == {0, c + 1}


def test_star_edges_components_equal_full_pairs(spark, documents):
    """Connectivity equivalence on a real corpus: connected components over
    star edges == components over the full candidate pair set, so
    dedup_clusters' output is unchanged by the star reduction."""
    from pgvectorscale_spark.operators import dedup

    docs = documents.select("doc_id", "text")
    pairs = dedup.minhash_candidate_pairs(docs)
    star = dedup.minhash_star_edges(docs)
    cp = {
        (r["id"], r["component"])
        for r in dedup.connected_components(pairs, "doc_a", "doc_b").collect()
    }
    cs = {
        (r["id"], r["component"])
        for r in dedup.connected_components(star, "doc_a", "doc_b").collect()
    }
    assert cp == cs and len(cp) > 0


# ---- 3. ADVICE fixes -----------------------------------------------------------


class _FlakyFS:
    """pyarrow-filesystem stand-in whose get_file_info raises (transient
    remote-FS error)."""

    def get_file_info(self, *_a, **_k):
        raise OSError("simulated transient remote-FS error")


def test_snapshot_base_dirs_transient_fs_error_propagates(tmpdir, monkeypatch):
    """ADVICE medium: a transient FS error probing a mapped override dir
    must PROPAGATE as itself, not be misreported as StaleIndexReadError
    ('reclaimed — reload and retry')."""
    root = os.path.join(tmpdir, "strict_probe")
    os.makedirs(os.path.join(root, "nodes", "shard=0"))
    gen = "nodes_gens/cccc00000000"
    os.makedirs(os.path.join(root, gen, "shard=1"))
    meta = SimpleNamespace(base_rel="nodes", shard_base={"1": gen})
    # healthy FS: the override resolves
    dirs = index_util.snapshot_base_dirs(root, meta, "shard")
    assert (os.path.join(root, gen), [1]) in dirs
    # flaky FS on the override's existence probe: the original error
    # surfaces, NOT StaleIndexReadError
    real = index_util._pa_fs

    def flaky(path):
        if path.rstrip("/").endswith(gen):
            return _FlakyFS(), path
        return real(path)

    monkeypatch.setattr(index_util, "_pa_fs", flaky)
    with pytest.raises(OSError, match="simulated transient"):
        index_util.snapshot_base_dirs(root, meta, "shard")


def test_unreadable_fresh_lease_pins_trash(tmpdir, monkeypatch):
    """ADVICE low: a fresh .lease file that cannot be parsed (transient
    read corruption) pins the sweep conservatively; one older than 2x the
    default TTL is reaped instead of pinning forever."""
    root = os.path.join(tmpdir, "lease_pin")
    data = os.path.join(root, "nodes_gens", "dddd00000000")
    os.makedirs(data)
    leases = os.path.join(root, index_util.LEASES_DIR)
    os.makedirs(leases)
    bad = os.path.join(leases, "broken.lease")
    with open(bad, "wb") as f:
        f.write(b"{not json")
    meta = SimpleNamespace(
        trash_dirs=["nodes_gens/dddd00000000"], shard_base={}, base_rel="nodes",
        delta_gens=[], centroids_rel=None, trash_epoch=5,
    )
    index_util.sweep_trash(root, meta)
    assert os.path.isdir(data)  # pinned: fresh unreadable lease
    assert meta.trash_dirs == ["nodes_gens/dddd00000000"]
    # age the file beyond 2x TTL: reaped, trash reclaimed
    old = 1.0  # epoch 1970: definitely older than 2x TTL
    os.utime(bad, (old, old))
    index_util.sweep_trash(root, meta)
    assert not os.path.exists(bad)
    assert not os.path.exists(data)
    assert meta.trash_dirs == []


def test_lease_publish_is_atomic_tmp_then_move(tmpdir):
    """The lease file appears only complete (tmp + move): while held it
    parses as JSON with the epoch; .tmp leftovers are not leases."""
    import json

    root = os.path.join(tmpdir, "lease_atomic")
    with index_util.reader_lease(root, epoch=7) as lease_path:
        assert lease_path.endswith(".lease")
        with open(lease_path) as f:
            rec = json.load(f)
        assert rec["epoch"] == 7 and rec["expires"] > 0
        assert not os.path.exists(lease_path + ".tmp")
    assert not os.path.exists(lease_path)


def test_jpeg_fill_bytes_before_final_eoi(spark):
    """ADVICE low: a spec-legal stream ending ...FF FF D9 (fill run, then
    EOI) must parse, not be rejected as truncated."""
    from pgvectorscale_spark.operators.jpeg import parse_jpeg
    from tests.test_jpeg import encode_jpeg

    px = np.full((8, 8, 1), 128, dtype=np.uint8)
    data = encode_jpeg(px)
    assert data.endswith(b"\xff\xd9")
    padded = data[:-2] + b"\xff" + data[-2:]  # ...FF FF D9
    w, h, ch, out = parse_jpeg(padded)
    assert (w, h, ch) == (8, 8, 1)
    base = parse_jpeg(data)[3]
    assert np.array_equal(out, base)


def test_h264_zero_ending_nal_not_overtrimmed():
    """ADVICE low: only the single zero owned by a following 4-byte start
    code is trimmed — a NAL payload legitimately ending in zeros
    (cabac_zero_words) keeps them, and an all-zero NAL still counts."""
    from pgvectorscale_spark.operators.multimodal import parse_h264_meta
    from tests.test_multimodal_decode import _annexb, _make_sps

    base = _annexb(_make_sps(), b"\x68\xce\x38\x80", b"\x65\x88\x84\x00")
    profile, level, w, h, n_base = parse_h264_meta(base)
    # append: 4-byte start code + NAL ending in two zero bytes, then a
    # 4-byte start code + an all-zero-payload NAL (type 12, filler-like)
    tail = (
        b"\x00\x00\x00\x01" + bytes([0x0C]) + b"\xaa\x00\x00"
        + b"\x00\x00\x00\x01" + bytes([0x0C]) + b"\x00\x00\x00"
    )
    got = parse_h264_meta(base + tail)
    assert got[:4] == (profile, level, w, h)
    assert got[4] == n_base + 2  # both appended NALs counted
