"""Snapshot isolation for the node store (round-5 hardening).

Every data directory is immutable once its meta is committed: folds and
rebuilds write FRESH generation dirs and flip pointers in the meta save —
nothing is ever rewritten in place, so an unsynchronized reader sees the
pre- or post-maintenance snapshot, never a torn mix. Superseded dirs wait
one maintenance cycle in meta.trash_dirs before the next fold/rebuild
sweeps them, so a reader holding the PREVIOUS meta still completes
consistently; a reader two cycles stale raises StaleIndexReadError rather
than silently serving a reassembled pre-mutation (or empty) shard.

Because folds are content-preserving AND every mutation already rotates
its touched shards' cache nonces, folds no longer rotate nonces at all —
warm executor caches survive a fold (asserted below).

Reference analog: Postgres gives the reference MVCC page snapshots for
free; this is the plain-parquet equivalent (Iceberg-style snapshot flip).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pytest

from pgvectorscale_spark.operators.diskann import (
    DiskannIndex,
    StaleIndexReadError,
    _load_shard_graph,
    _read_shard_pdf,
)


@pytest.fixture(scope="module")
def tmpdir():
    d = tempfile.mkdtemp(prefix="snapshot_store_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _build(spark, tmpdir, name, n=300, d=16, **kw):
    rng = np.random.default_rng(hash(name) % 2**31)
    mat = rng.random((n, d), dtype=np.float32)
    df = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(n)], "vec_id long, embedding array<float>"
    )
    idx = DiskannIndex.build(
        df, f"{tmpdir}/{name}", distance_type="l2", num_shards=1,
        id_col="vec_id", vector_col="embedding", **kw,
    )
    return idx, mat, rng


def _insert_one(spark, idx, rng, vid, d=16):
    v = rng.random(d).astype(np.float32)
    idx.insert(
        spark.createDataFrame([(vid, v.tolist())], "vec_id long, embedding array<float>")
    )
    return v


def _fold_chain(spark, idx, rng, start_vid, d=16):
    """Insert until the chain folds (delta_gens drops back to empty)."""
    vid = start_vid
    while True:
        _insert_one(spark, idx, rng, vid, d)
        vid += 1
        if not idx.meta.delta_gens:
            return vid


def _canon(pdf):
    return pdf.sort_values("node_id").reset_index(drop=True)


COLS = ["node_id", "vector", "neighbors", "deleted"]


def test_pre_fold_reader_sees_identical_content_through_grace(spark, tmpdir):
    """A reader holding the pre-fold store handle reads the SAME merged
    content after the fold commits: its dirs are all still on disk (one
    grace cycle) and the fold is content-preserving."""
    idx, mat, rng = _build(spark, tmpdir, "grace", n=250)
    nxt = _fold_chain(spark, idx, rng, 9000)
    # open a chain again and capture the handle mid-chain
    _insert_one(spark, idx, rng, nxt)
    old_store = idx._store()
    assert idx.meta.delta_gens  # chain open
    before = _canon(_read_shard_pdf(old_store, 0, COLS))
    # drive the NEXT fold; the old handle's dirs move to trash (not deleted)
    _fold_chain(spark, idx, rng, nxt + 1)
    assert not idx.meta.delta_gens
    after_old_handle = _canon(_read_shard_pdf(old_store, 0, COLS))
    # the old snapshot is still fully readable and byte-identical
    assert before["node_id"].tolist() == after_old_handle["node_id"].tolist()
    assert [list(x) for x in before["neighbors"]] == [
        list(x) for x in after_old_handle["neighbors"]
    ]
    # and the CURRENT handle serves the superset (rows from the later fold)
    now = _canon(_read_shard_pdf(idx._store(), 0, COLS))
    assert set(before["node_id"]) < set(now["node_id"])


def test_two_cycles_stale_reader_raises_not_empty(spark, tmpdir):
    """After the grace cycle expires (two folds later), a stale handle
    raises StaleIndexReadError instead of silently reassembling a
    pre-mutation or empty shard."""
    idx, mat, rng = _build(spark, tmpdir, "stale", n=250)
    nxt = _fold_chain(spark, idx, rng, 9000)  # fold #1: shard now override-mapped
    stale_store = idx._store()  # references fold #1's gen dir
    nxt = _fold_chain(spark, idx, rng, nxt)  # fold #2: gen dir -> trash
    nxt = _fold_chain(spark, idx, rng, nxt)  # fold #3: sweeps it
    with pytest.raises(StaleIndexReadError):
        _read_shard_pdf(stale_store, 0, COLS)


def test_fold_preserves_cache_tokens_and_warm_entries(spark, tmpdir):
    """Folds are content-preserving, so they no longer rotate the per-shard
    cache nonces: a graph cached before the fold is served (cache hit,
    no reload) after it."""
    idx, mat, rng = _build(spark, tmpdir, "warmfold", n=250, storage_type="plain")
    meta_d = {
        "distance_type": idx.meta.distance_type,
        "storage_type": idx.meta.storage_type,
        "num_dimensions": idx.meta.num_dimensions,
        "num_dimensions_to_index": idx.meta.num_dimensions_to_index,
        "num_neighbors": idx.meta.num_neighbors,
        "search_list_size": idx.meta.search_list_size,
        "max_alpha": idx.meta.max_alpha,
        "has_labels": idx.meta.has_labels,
    }

    def token():
        return (
            idx.meta.build_id,
            idx.meta.shard_mutations.get("0") or idx.meta.mutation_id,
        )

    # open a chain and warm this process's cache under the current token
    for j in range(3):
        _insert_one(spark, idx, rng, 9100 + j)
    assert idx.meta.delta_gens
    pre_token = token()
    g, gids, dead, fullmat, hit = _load_shard_graph(
        idx._store(), 0, pre_token, meta_d, None
    )
    assert not hit  # cold in this (driver) process — now cached
    pre_nonces = dict(idx.meta.shard_mutations)
    # fold directly (no accompanying mutation): tokens must NOT rotate
    idx._fold_deltas()
    assert not idx.meta.delta_gens  # folded
    assert idx.meta.shard_mutations == pre_nonces
    assert token() == pre_token
    # the pre-fold cache entry is served warm after the fold — and it is
    # CORRECT to serve it: the fold is content-preserving
    g2, gids2, dead2, fm2, hit2 = _load_shard_graph(
        idx._store(), 0, token(), meta_d, None
    )
    assert hit2
    now = _canon(_read_shard_pdf(idx._store(), 0, ["node_id"]))
    assert sorted(int(x) for x in gids2) == now["node_id"].tolist()


def test_rebuild_at_live_path_is_snapshot_flipped(spark, tmpdir):
    """A rebuild at a live path writes its base into a FRESH generation dir
    and trashes the old index's dirs — a reader of the OLD index keeps
    reading its own snapshot through the grace cycle."""
    idx, mat, rng = _build(spark, tmpdir, "rebuild", n=200)
    _insert_one(spark, idx, rng, 7777)
    old_store = idx._store()
    old_rows = _canon(_read_shard_pdf(old_store, 0, ["node_id"]))
    # rebuild over DIFFERENT data at the same path
    df2 = spark.createDataFrame(
        [(i + 10_000, mat[i].tolist()) for i in range(100)],
        "vec_id long, embedding array<float>",
    )
    idx2 = DiskannIndex.build(
        df2, idx.path, distance_type="l2", num_shards=1,
        id_col="vec_id", vector_col="embedding",
    )
    assert idx2.meta.base_rel.startswith("nodes_gens/")
    assert "nodes" in idx2.meta.trash_dirs
    # old reader: unchanged snapshot, fully readable post-rebuild
    still = _canon(_read_shard_pdf(old_store, 0, ["node_id"]))
    assert still["node_id"].tolist() == old_rows["node_id"].tolist()
    # new reader: the new corpus only
    new_rows = _canon(_read_shard_pdf(idx2._store(), 0, ["node_id"]))
    assert new_rows["node_id"].min() >= 10_000
    assert idx2.nodes().count() == 100
    # a THIRD build sweeps the first index's dirs
    idx3 = DiskannIndex.build(
        df2, idx.path, distance_type="l2", num_shards=1,
        id_col="vec_id", vector_col="embedding",
    )
    assert idx3.nodes().count() == 100
    with pytest.raises((StaleIndexReadError, FileNotFoundError, OSError)):
        _read_shard_pdf(old_store, 0, ["node_id"])


def test_sweep_removes_aged_trash_and_orphans(spark, tmpdir):
    """The next maintenance cycle deletes (a) dirs trashed by the previous
    fold and (b) orphan generation dirs no committed meta references
    (crash leftovers)."""
    idx, mat, rng = _build(spark, tmpdir, "sweep", n=250)
    nxt = _fold_chain(spark, idx, rng, 9000)
    trashed = list(idx.meta.trash_dirs)
    assert trashed
    for t in trashed:
        assert os.path.exists(os.path.join(idx.path, t))
    # plant a crash orphan: a gen dir never referenced by any meta
    orphan = os.path.join(idx.path, "nodes_gens", "deadbeefcafe")
    os.makedirs(os.path.join(orphan, "shard=0"))
    with open(os.path.join(orphan, "shard=0", "junk.parquet"), "wb") as f:
        f.write(b"x")
    _fold_chain(spark, idx, rng, nxt)  # next fold sweeps
    for t in trashed:
        assert not os.path.exists(os.path.join(idx.path, t)), t
    assert not os.path.exists(orphan)


def test_v4_meta_migrates_to_v5_layout(tmpdir):
    """A V4 meta (implicit nodes/ + seq=1..delta_seq chain) loads as V5
    with exactly that layout expressed in the explicit fields."""
    import json

    from pgvectorscale_spark.types import CURRENT_META_VERSION, IndexMeta

    assert CURRENT_META_VERSION == 5
    path = os.path.join(tmpdir, "v4meta")
    os.makedirs(path)
    raw = {
        "distance_type": "l2",
        "storage_type": "plain",
        "num_dimensions": 8,
        "num_shards": 2,
        "num_rows": 10,
        "version": 4,
        "epoch": 3,
        "build_id": "b",
        "mutation_id": "m",
        "shard_mutations": {"0": "n0"},
        "has_tombstones": False,
        "has_mutations": True,
        "shard_assignment": "hash",
        "delta_seq": 2,
    }
    with open(os.path.join(path, "_index_meta.json"), "w") as f:
        json.dump(raw, f)
    meta = IndexMeta.load(path)
    assert meta.version == 5
    assert meta.base_rel == "nodes"
    assert meta.shard_base == {}
    assert meta.delta_gens == ["nodes_delta/seq=1", "nodes_delta/seq=2"]
    assert meta.delta_seq == 2  # derived property
    assert meta.delta_counter == 2  # next mutation writes seq=3, no reuse
    assert meta.trash_dirs == []
    # round-trips in the V5 format
    meta.save(path)
    again = IndexMeta.load(path)
    assert again.delta_gens == meta.delta_gens and again.version == 5


def test_ivf_fold_is_snapshot_flipped_with_empty_cell_sentinel(spark, tmpdir):
    """IVF folds write survivors to a fresh gen dir and map fully
    tombstoned cells to the "" sentinel; a pre-fold DataFrame plan keeps
    executing against its own dirs through the grace cycle."""
    from pgvectorscale_spark.operators.ivf_index import IvfIndex

    rng = np.random.default_rng(29)
    df = spark.createDataFrame(
        [(i, rng.random(8).tolist()) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    idx = IvfIndex.build(df, f"{tmpdir}/ivf_snap", num_centroids=4, kmeans_iterations=1)
    # find one whole cell and tombstone every row in it
    cell_rows = idx.nodes().filter("centroid_id = 0").select("node_id").collect()
    victim_ids = [int(r["node_id"]) for r in cell_rows]
    assert victim_ids
    pre_view = idx.live_nodes()  # lazy plan over the PRE-fold dirs
    pre_count = pre_view.count()
    idx.delete(victim_ids)
    # route the chain-driving inserts AWAY from cell 0 (a vector at cell
    # 1's centroid lands in cell 1), so cell 0 stays fully tombstoned
    c1 = next(
        list(r["centroid"]) for r in idx.centroids().collect() if r["centroid_id"] == 1
    )
    for j in range(IvfIndex.DELTA_FOLD_SEQS):
        idx.insert(
            spark.createDataFrame(
                [(900 + j, c1)], "vec_id long, embedding array<float>"
            )
        )
        if not idx.meta.delta_gens:
            break
    assert not idx.meta.delta_gens  # folded
    assert idx.meta.shard_base.get("0") == ""  # emptied-cell sentinel
    # grace: the pre-fold plan still executes, over its own snapshot
    assert pre_view.count() == pre_count
    # current view: cell 0 gone, inserts present, tombstones dropped
    assert idx.nodes().filter("centroid_id = 0").count() == 0
    assert idx.nodes().filter("deleted").count() == 0
    assert idx.live_nodes().filter("node_id >= 900").count() >= 1
    cold = IvfIndex.load(spark, idx.path)
    assert cold.live_nodes().count() == idx.meta.num_rows


def test_concurrent_readers_through_folds_and_rebuild(spark, tmpdir):
    """The race the snapshot protocol exists to kill, exercised for real:
    reader threads run searches in a tight loop (reloading their index
    handle each iteration, as an unsynchronized executor would) while the
    writer thread drives inserts through MULTIPLE folds and then a full
    rebuild.

    Deterministic form (round 10 — the round-9 run showed a lease-less
    "fresh" reader CAN be descheduled across 2+ maintenance cycles between
    load and collect under a loaded JVM, which is exactly the documented
    fail-stop, so asserting it never happens was a timing-sensitive bar):

    * the LEASED reader peeks the current epoch, acquires a reader lease,
      and only then loads + searches — the lease pins every trash entry
      its snapshot could reference, so it must NEVER fail, no matter how
      long the thread is descheduled. Zero tolerance; full tracebacks
      recorded.
    * the LEASE-LESS reader may hit the documented fail-stop when it falls
      behind: the typed StaleIndexReadError (plan-time detection) or a
      missing-file scan error (the JVM half — the sweep deleted a file
      after the driver listed it). Both count as `stale` and the reader
      reloads and retries. Anything else — wrong-shaped results, foreign
      exception types — is a failure with the full traceback.

    Wrong data (short/malformed result sets) is never allowed for either
    reader."""
    import re
    import threading
    import traceback

    from pgvectorscale_spark.operators.index_util import reader_lease
    from pgvectorscale_spark.types import IndexMeta

    idx, mat, rng = _build(spark, tmpdir, "conc", n=300)
    stop = threading.Event()
    failures: list[str] = []
    reads = {"leased_ok": 0, "plain_ok": 0, "stale": 0}

    def check(res) -> bool:
        if len(res) != 5 or any(r["node_id"] is None for r in res):
            failures.append(f"malformed result: {res}")
            return False
        return True

    def leased_reader():
        q = mat[0].tolist()
        while not stop.is_set():
            try:
                # epoch peek BEFORE acquire: if folds land between peek
                # and acquire, the lease's (older) epoch pins strictly
                # more trash — the load below is then fully covered
                epoch = IndexMeta.load(idx.path).epoch
                with reader_lease(idx.path, epoch=epoch, ttl_seconds=600):
                    cold = DiskannIndex.load(spark, idx.path)
                    if not check(cold.search(q, k=5).collect()):
                        return
                reads["leased_ok"] += 1
            except Exception:  # noqa: BLE001 — leased reads never fail
                failures.append(f"LEASED reader failed:\n{traceback.format_exc()}")
                return

    # the JVM/pyarrow half of the fail-stop: a swept file vanishing
    # between the driver's listing and the task's read
    _SWEPT_SCAN = re.compile(
        r"FileNotFound|does not exist|No such file|PATH_NOT_FOUND"
        r"|FAILED_READ_FILE|was folded away|was reclaimed",
        re.IGNORECASE,
    )

    def plain_reader():
        q = mat[1].tolist()
        while not stop.is_set():
            try:
                cold = DiskannIndex.load(spark, idx.path)
                if not check(cold.search(q, k=5).collect()):
                    return
                reads["plain_ok"] += 1
            except StaleIndexReadError:
                reads["stale"] += 1  # documented fail-stop: reload + retry
            except Exception as e:  # noqa: BLE001
                if _SWEPT_SCAN.search(f"{type(e).__name__}: {e}"):
                    reads["stale"] += 1  # scan-time half of the fail-stop
                    continue
                failures.append(
                    f"plain reader, foreign error:\n{traceback.format_exc()}"
                )
                return

    threads = [
        threading.Thread(target=leased_reader),
        threading.Thread(target=plain_reader),
    ]
    for t in threads:
        t.start()
    try:
        nxt = 50_000
        for _ in range(2):  # two full fold cycles under concurrent reads
            nxt = _fold_chain(spark, idx, rng, nxt)
        # full rebuild at the live path while readers run
        df = spark.createDataFrame(
            [(i, mat[i].tolist()) for i in range(300)],
            "vec_id long, embedding array<float>",
        )
        idx2 = DiskannIndex.build(
            df, idx.path, distance_type="l2", num_shards=1,
            id_col="vec_id", vector_col="embedding",
        )
        nxt = _fold_chain(spark, idx2, rng, nxt)  # and one more fold after
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=120)
    assert not failures, failures[:3]
    assert reads["leased_ok"] > 0  # the leased reader overlapped maintenance
    assert reads["plain_ok"] > 0  # and the plain reader did real reads too


def test_base_dir_with_all_populated_shards_folded_away(spark, tmpdir):
    """A kmeans index where one cell holds EVERY row (identical vectors ->
    coincident centroids -> tie-break to one cell): after two fold cycles
    the base dir holds no parquet at all while other shards were never
    populated. The FS-aware base view must keep working — a
    range(num_shards)-style 'is every shard overridden' check would scan
    the schema-less base dir and crash every read."""
    v = [0.5] * 16
    df = spark.createDataFrame(
        [(i, v) for i in range(60)], "vec_id long, embedding array<float>"
    )
    idx = DiskannIndex.build(
        df, f"{tmpdir}/allfold", distance_type="l2", num_shards=2,
        id_col="vec_id", vector_col="embedding", shard_assignment="kmeans",
    )
    populated = [int(r["shard"]) for r in idx.nodes().select("shard").distinct().collect()]
    assert len(populated) == 1  # one cell owns everything, the other is empty
    rng = np.random.default_rng(1)
    nxt = 9000
    for _ in range(2):  # two fold cycles: override, then sweep the base copy
        while True:
            idx.insert(
                spark.createDataFrame([(nxt, v)], "vec_id long, embedding array<float>")
            )
            nxt += 1
            if not idx.meta.delta_gens:
                break
    base_abs = os.path.join(idx.path, idx.meta.base_rel)
    from pgvectorscale_spark.operators.index_util import list_subdirs

    assert list_subdirs(base_abs, "shard=") == []  # base truly emptied
    # reads must keep working (count, search, cold reload)
    assert idx.nodes().count() == 60 + (nxt - 9000)
    assert len(idx.search(v, k=5).collect()) == 5
    cold = DiskannIndex.load(spark, idx.path)
    assert cold.nodes().count() == idx.nodes().count()


def test_pre_fold_meta_raises_after_sweep_not_empty(spark, tmpdir):
    """The swept-marker staleness check: a reader whose meta predates the
    FIRST fold (no overrides, empty chain) must raise StaleIndexReadError
    once the base copy of the folded shard is reclaimed — without the
    marker, 'missing subdir under a live parent' would be mistaken for a
    never-populated cell and served as an empty shard."""
    idx, mat, rng = _build(spark, tmpdir, "marker", n=200)
    store0 = idx._store()  # pre-any-fold handle: base only, no overrides
    nxt = _fold_chain(spark, idx, rng, 9000)   # fold 1: trash base shard copy
    _fold_chain(spark, idx, rng, nxt)          # fold 2: sweep it + marker
    assert os.path.exists(
        os.path.join(idx.path, f"{idx.meta.base_rel}.swept", "shard=0")
    )
    with pytest.raises(StaleIndexReadError):
        _read_shard_pdf(store0, 0, COLS)


def test_ivf_build_takes_writer_lock(spark, tmpdir):
    """IvfIndex.build is a writer like insert/delete: it must refuse to run
    (not sweep a concurrent writer's uncommitted dirs) while another
    writer holds the lock."""
    from pgvectorscale_spark.operators.index_util import ConcurrentWriterError, writer_lock
    from pgvectorscale_spark.operators.ivf_index import IvfIndex

    rng = np.random.default_rng(5)
    df = spark.createDataFrame(
        [(i, rng.random(8).tolist()) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    path = f"{tmpdir}/ivf_lock"
    IvfIndex.build(df, path, num_centroids=2, kmeans_iterations=1)
    with writer_lock(path):
        with pytest.raises(ConcurrentWriterError):
            IvfIndex.build(df, path, num_centroids=2, kmeans_iterations=1)


def test_ivf_rebuild_flips_centroids_generation(spark, tmpdir):
    """A rebuild changes what every centroid_id MEANS, so the centroid
    table gets its own generation dir and meta pointer — a reader of the
    old index keeps resolving ITS centroids through its own meta while the
    new index uses the new table."""
    from pgvectorscale_spark.operators.ivf_index import IvfIndex

    rng = np.random.default_rng(6)
    df = spark.createDataFrame(
        [(i, rng.random(8).tolist()) for i in range(80)],
        "vec_id long, embedding array<float>",
    )
    path = f"{tmpdir}/ivf_cents"
    idx1 = IvfIndex.build(df, path, num_centroids=3, kmeans_iterations=2)
    old_cents = sorted(
        (int(r["centroid_id"]), tuple(r["centroid"])) for r in idx1.centroids().collect()
    )
    df2 = spark.createDataFrame(
        [(i + 1000, rng.random(8).tolist()) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    idx2 = IvfIndex.build(df2, path, num_centroids=3, kmeans_iterations=2)
    assert idx2.meta.centroids_rel.startswith("centroids_gens/")
    assert idx2.meta.centroids_rel != idx1.meta.centroids_rel
    # old handle: same centroids, still readable through the grace cycle
    still = sorted(
        (int(r["centroid_id"]), tuple(r["centroid"])) for r in idx1.centroids().collect()
    )
    assert still == old_cents
    # new handle: a genuinely different clustering, and search works
    res = idx2.search(df2.first()["embedding"], k=3).collect()
    assert len(res) == 3 and all(r["node_id"] >= 1000 for r in res)


def test_strict_base_listing_raises_on_fs_error(monkeypatch, tmpdir):
    """A transient FS error while listing the base dir must RAISE from the
    snapshot view (an empty answer would drop the base rows from a fold's
    merge and commit the loss); non-strict callers keep the lenient []."""
    import pyarrow.fs as pafs

    from pgvectorscale_spark.operators import index_util

    base = os.path.join(tmpdir, "strictbase")
    os.makedirs(os.path.join(base, "shard=0"))
    assert index_util.list_subdirs(base, "shard=", strict=True) == ["shard=0"]
    real = index_util._pa_fs

    class FlakyFS:
        def __init__(self, inner):
            self.inner = inner

        def get_file_info(self, arg):
            if isinstance(arg, pafs.FileSelector):
                raise OSError("transient listing failure")
            return self.inner.get_file_info(arg)  # dir_exists probe works

    def flaky(path):
        fsys, p = real(path)
        return FlakyFS(fsys), p

    monkeypatch.setattr(index_util, "_pa_fs", flaky)
    with pytest.raises(OSError, match="transient"):
        index_util.list_subdirs(base, "shard=", strict=True)
    assert index_util.list_subdirs(base, "shard=", strict=False) == []


def test_stale_ivf_handle_raises_via_markers(spark, tmpdir):
    """R3: the Spark-scan path consults swept markers too — an IvfIndex
    HANDLE whose meta predates the fold raises StaleIndexReadError at view
    construction once the folded cell's base copy is reclaimed, instead of
    silently serving results missing that cell."""
    from pgvectorscale_spark.operators.ivf_index import IvfIndex

    rng = np.random.default_rng(17)
    df = spark.createDataFrame(
        [(i, rng.random(8).tolist()) for i in range(120)],
        "vec_id long, embedding array<float>",
    )
    idx = IvfIndex.build(df, f"{tmpdir}/ivf_stale", num_centroids=3, kmeans_iterations=1)
    stale = IvfIndex.load(spark, idx.path)  # pre-fold meta snapshot
    c1 = next(list(r["centroid"]) for r in idx.centroids().collect() if r["centroid_id"] == 1)
    j = 0
    for _ in range(2):  # two fold cycles: override cell 1, then sweep its base copy
        while True:
            idx.insert(
                spark.createDataFrame([(7000 + j, c1)], "vec_id long, embedding array<float>")
            )
            j += 1
            if not idx.meta.delta_gens:
                break
    marker = os.path.join(idx.path, f"{idx.meta.base_rel}.swept", "centroid_id=1")
    assert os.path.exists(marker)
    with pytest.raises(StaleIndexReadError):
        stale.nodes().count()
    # the CURRENT handle (and a fresh load) stay fully functional
    assert idx.nodes().count() == 120 + j
    assert IvfIndex.load(spark, idx.path).live_nodes().count() > 0


def test_sweep_cleans_sidecar_tmp_and_centroid_orphans(spark, tmpdir):
    """Crashed atomic sidecar writes (*.parquet.*.tmp) and crashed-rebuild
    centroid generations are reclaimed by the sweep."""
    idx, mat, rng = _build(spark, tmpdir, "orphans", n=150)
    with open(os.path.join(idx.path, "routing.parquet.deadbeef.tmp"), "wb") as f:
        f.write(b"x")
    orphan_gen = os.path.join(idx.path, "centroids_gens", "cafebabe0000")
    os.makedirs(orphan_gen)
    with open(os.path.join(orphan_gen, "part.parquet"), "wb") as f:
        f.write(b"x")
    _fold_chain(spark, idx, rng, 9000)  # fold -> sweep
    assert not os.path.exists(os.path.join(idx.path, "routing.parquet.deadbeef.tmp"))
    assert not os.path.exists(orphan_gen)
