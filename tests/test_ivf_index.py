"""IvfIndex: persisted cells, partition-pruned probes, batch search."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest

from pgvectorscale_spark.functions.distance import np_l2_squared
from pgvectorscale_spark.operators.ivf_index import IvfIndex
from tests.conftest import make_vectors


@pytest.fixture(scope="module")
def tmpd():
    d = tempfile.mkdtemp(prefix="ivfidx_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def built(spark, tmpd):
    df = make_vectors(spark, n=500, dim=16, seed=21)
    mat = np.array([r["embedding"] for r in df.orderBy("vec_id").collect()], dtype=np.float64)
    idx = IvfIndex.build(df, f"{tmpd}/idx", num_centroids=16, kmeans_iterations=2)
    return idx, mat


def test_roundtrip_full_probe_exact(spark, built, tmpd):
    idx, mat = built
    idx2 = IvfIndex.load(spark, f"{tmpd}/idx")
    assert idx2.meta.num_rows == 500
    for qi in (0, 7):
        got = [r["node_id"] for r in idx2.search(mat[qi].tolist(), k=10, nprobe=16).collect()]
        true = np.lexsort((np.arange(500), np_l2_squared(mat, mat[qi])))[:10].tolist()
        assert got == [int(x) for x in true]  # probing every cell = exact


def test_partial_probe_recall(spark, built):
    idx, mat = built
    hits = 0
    for qi in range(10):
        got = {r["node_id"] for r in idx.search(mat[qi].tolist(), k=10, nprobe=6).collect()}
        true = set(np.lexsort((np.arange(500), np_l2_squared(mat, mat[qi])))[:10].tolist())
        hits += len(got & true)
    assert hits / 100 >= 0.8


def test_insert_delete_lifecycle(spark, tmpd):
    """IVF mutations: inserts land in their nearest cell (probing finds
    them), upserts of moved vectors erase the old copy from its previous
    cell, deletes drop rows — and a concurrent writer is rejected."""
    from pgvectorscale_spark.operators.index_util import (
        ConcurrentWriterError,
        writer_lock,
    )

    df = make_vectors(spark, n=300, dim=8, seed=33)
    mat = np.array([r["embedding"] for r in df.orderBy("vec_id").collect()], dtype=np.float64)
    idx = IvfIndex.build(df, f"{tmpd}/idx_mut", num_centroids=8, kmeans_iterations=1)
    new = spark.createDataFrame(
        [(500, mat[7].tolist())], "vec_id long, embedding array<float>"
    )
    idx.insert(new)
    assert idx.meta.num_rows == 301
    got = [r["node_id"] for r in idx.search(mat[7].tolist(), k=2, nprobe=8).collect()]
    assert set(got) == {7, 500}  # the clone ties with the original
    # move vector 500 far away: the upsert must erase the old-cell copy
    moved = spark.createDataFrame(
        [(500, (mat[3] * 100.0).tolist())], "vec_id long, embedding array<float>"
    )
    idx.insert(moved)
    assert idx.meta.num_rows == 301  # upsert, not append
    # exactly one LIVE copy; the old cell holds only a tombstone marker
    # (the delta sink writes a marker instead of rewriting the old cell)
    assert idx.live_nodes().filter("node_id = 500").count() == 1
    old_copies = idx.nodes().filter("node_id = 500").collect()
    assert sum(1 for r in old_copies if not r["deleted"]) == 1
    idx.delete([500, 7])
    assert idx.meta.num_rows == 299
    got2 = [r["node_id"] for r in idx.search(mat[7].tolist(), k=2, nprobe=8).collect()]
    assert 7 not in got2 and 500 not in got2
    # writer lock shared with the other index types
    with writer_lock(idx.path):
        import pytest as _pytest

        with _pytest.raises(ConcurrentWriterError):
            idx.delete([1])


def test_probe_is_partition_filter(spark, built):
    idx, mat = built
    df = idx.search(mat[0].tolist(), k=5, nprobe=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    import re

    # unprobed cells never read: probe list is a partition filter, and the
    # scan carries no row-level filters at all
    assert re.search(r"PartitionFilters: \[centroid_id#\d+ IN \(", scan)
    assert "DataFilters: []" in scan


def test_batch_matches_single(spark, built):
    idx, mat = built
    qdf = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(3)], "query_id long, query_vec array<float>"
    )
    batch = idx.search_batch(qdf, k=5, nprobe=6).collect()
    assert len(batch) == 15
    for qid in range(3):
        single = [r["node_id"] for r in idx.search(mat[qid].tolist(), k=5, nprobe=6).collect()]
        got = [r["node_id"] for r in sorted(batch, key=lambda r: r["rank"]) if r["query_id"] == qid]
        assert got == single
