"""Round-3 hardening: ADVICE.md items from the round-2 review.

1. post_filter refill grows the beam (search_list_size), not just fetch k,
   and closes with an exact scan — arbitrarily selective predicates really
   do yield k rows (amgettuple stream-more, scan.rs:370-436).
2. Executor shard caches key on a per-build uuid, so rebuilding after an
   out-of-band directory wipe can never serve stale graphs.
3. build() holds the single-writer lock like every other writer.
4. probe_shards routing is refused (warn + full fan-out) on hash-sharded
   indexes, whose centroids are all ≈ the global mean.
5. vs.sql() only rewrites `&&` to arrays_overlap for array-shaped operands;
   boolean `a && b` stays logical AND.
6. The shard-graph cache evicts by last access under a byte budget.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import warnings

import numpy as np
import pytest

from pgvectorscale_spark.functions.distance import np_cosine_distance, np_normalize
from pgvectorscale_spark.operators import diskann as diskann_mod
from pgvectorscale_spark.operators.diskann import ConcurrentWriterError, DiskannIndex
from pgvectorscale_spark.plans.sql_frontend import VectorSql


@pytest.fixture(scope="module")
def tmpdir():
    d = tempfile.mkdtemp(prefix="round3_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _corpus(spark, n=400, d=32, seed=7):
    rng = np.random.default_rng(seed)
    mat = rng.random((n, d), dtype=np.float32)
    df = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(n)], "vec_id long, embedding array<float>"
    )
    return df, mat


# -- 1. post_filter refill ---------------------------------------------------


def test_post_filter_selective_predicate_yields_k(spark, tmpdir):
    """Predicate selecting only the FARTHEST vectors from the query: the
    default beam never visits them, so a fetch-only refill dries up below k.
    The fixed loop widens the beam with fetch and finishes with an exact
    scan, so exactly k rows come back and they match the filtered oracle."""
    df, mat = _corpus(spark, n=400, d=32)
    idx = DiskannIndex.build(
        df, f"{tmpdir}/selective", distance_type="cosine", num_shards=2,
        id_col="vec_id", vector_col="embedding",
    )
    q = np.full(32, 0.5, dtype=np.float32)
    matn = np_normalize(mat.astype(np.float64))
    qn = np_normalize(q.reshape(1, -1).astype(np.float64))[0]
    d = np_cosine_distance(matn, qn, assume_normalized=True)
    far = np.lexsort((np.arange(len(d)), -d))[:12]  # 12 farthest ids
    far_ids = sorted(int(x) for x in far)
    pred = f"node_id in ({', '.join(str(x) for x in far_ids)})"
    got = idx.search(q.tolist(), k=5, post_filter=pred).collect()
    assert len(got) == 5, f"stream dried up: {len(got)} < 5 rows"
    # the 5 survivors are the 5 NEAREST of the 12 allowed ids
    allowed = np.array(far_ids)
    want = allowed[np.lexsort((allowed, d[allowed]))[:5]]
    assert [r["node_id"] for r in got] == [int(x) for x in want]


def test_post_filter_fewer_matches_than_k_returns_all(spark, tmpdir):
    df, mat = _corpus(spark, n=200, d=16, seed=11)
    idx = DiskannIndex.build(
        df, f"{tmpdir}/sparse", distance_type="cosine", num_shards=1,
        id_col="vec_id", vector_col="embedding",
    )
    got = idx.search(
        mat[0].tolist(), k=10, post_filter="node_id in (3, 77, 150)"
    ).collect()
    assert sorted(r["node_id"] for r in got) == [3, 77, 150]


# -- 2. rebuild at same path never serves stale cache ------------------------


def test_rebuild_after_wipe_is_not_stale(spark, tmpdir):
    path = f"{tmpdir}/wipe"
    df1, mat1 = _corpus(spark, n=120, d=16, seed=1)
    idx1 = DiskannIndex.build(
        df1, path, distance_type="cosine", num_shards=2, id_col="vec_id",
        vector_col="embedding",
    )
    q = mat1[5]
    first = idx1.search(q.tolist(), k=3).collect()
    assert first[0]["node_id"] == 5  # self-match warms every worker cache

    shutil.rmtree(path)  # out-of-band wipe: epoch counter restarts at 0
    rng = np.random.default_rng(99)
    mat2 = rng.random((120, 16), dtype=np.float32)
    mat2[77] = q  # in the NEW corpus the query's twin lives at id 77
    mat2[5] = 1.0 - q  # ...and id 5 is now far away
    df2 = spark.createDataFrame(
        [(i, mat2[i].tolist()) for i in range(120)], "vec_id long, embedding array<float>"
    )
    idx2 = DiskannIndex.build(
        df2, path, distance_type="cosine", num_shards=2, id_col="vec_id",
        vector_col="embedding",
    )
    assert idx2.meta.build_id and idx2.meta.build_id != idx1.meta.build_id
    got = idx2.search(q.tolist(), k=3).collect()
    assert got[0]["node_id"] == 77, "stale shard graph served after rebuild"


def test_insert_chain_serves_fresh_rows_warm(spark, tmpdir):
    """search → insert → search → insert → search across reused workers:
    every search must see exactly the rows present at that moment (a stale
    pre-populated cache entry would hide fresh rows or resurrect replaced
    vectors). Inserts shuffle only the micro-batch; stored rows are read
    executor-locally."""
    rng = np.random.default_rng(21)
    d = 16
    mat = rng.random((60, d), dtype=np.float32)
    df = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(60)], "vec_id long, embedding array<float>"
    )
    path = f"{tmpdir}/chain"
    idx = DiskannIndex.build(
        df, path, distance_type="l2", num_shards=2, id_col="vec_id",
        vector_col="embedding",
    )
    probe = mat[0] + 0.001
    assert idx.search(probe.tolist(), k=1, search_list_size=100).first()["node_id"] == 0

    # micro-batch 1: a brand-new exact twin of the probe at id 100
    b1 = spark.createDataFrame([(100, probe.tolist())], "vec_id long, embedding array<float>")
    idx.insert(b1)
    assert idx.search(probe.tolist(), k=1, search_list_size=100).first()["node_id"] == 100

    # micro-batch 2: UPSERT moves id 100 far away; id 0 is closest again
    b2 = spark.createDataFrame(
        [(100, (1.0 - probe).tolist())], "vec_id long, embedding array<float>"
    )
    idx.insert(b2)
    got = idx.search(probe.tolist(), k=2, search_list_size=100).collect()
    assert got[0]["node_id"] == 0, f"stale vector for upserted id: {got}"
    # a reloaded index (cold meta) agrees with the in-session one
    reloaded = DiskannIndex.load(spark, path)
    cold = reloaded.search(probe.tolist(), k=2, search_list_size=100).collect()
    assert [r["node_id"] for r in cold] == [r["node_id"] for r in got]


# -- 3. build() is a writer --------------------------------------------------


def test_build_respects_writer_lock(spark, tmpdir):
    path = f"{tmpdir}/locked"
    os.makedirs(path)
    with open(os.path.join(path, "_writer.lock"), "w") as f:
        f.write("pid=99999")
    df, _ = _corpus(spark, n=50, d=8)
    with pytest.raises(ConcurrentWriterError):
        DiskannIndex.build(df, path, id_col="vec_id", vector_col="embedding")
    os.remove(os.path.join(path, "_writer.lock"))
    idx = DiskannIndex.build(df, path, id_col="vec_id", vector_col="embedding")
    assert idx.meta.num_rows == 50  # lock released on success
    assert not os.path.exists(os.path.join(path, "_writer.lock"))


# -- 4. probe_shards refused on hash shards ----------------------------------


def test_probe_shards_ignored_on_hash_sharding(spark, tmpdir):
    df, mat = _corpus(spark, n=200, d=16, seed=3)
    idx = DiskannIndex.build(
        df, f"{tmpdir}/hashrouted", distance_type="cosine", num_shards=4,
        id_col="vec_id", vector_col="embedding", shard_assignment="hash",
    )
    q = mat[17].tolist()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        routed = idx.search(q, k=5, probe_shards=1).collect()
    assert any("probe_shards ignored" in str(w.message) for w in caught)
    full = idx.search(q, k=5).collect()
    assert [r["node_id"] for r in routed] == [r["node_id"] for r in full]


# -- 5. && rewrite is array-gated ---------------------------------------------


def test_boolean_and_becomes_conjunction(spark):
    vs = VectorSql(spark)
    df = spark.createDataFrame(
        [(1, True, True, [1, 2]), (2, True, False, [3]), (3, False, True, [1])],
        "id long, flag_a boolean, flag_b boolean, labels array<smallint>",
    )
    vs.register_table("flags", df)
    got = vs.sql("SELECT id FROM flags WHERE flag_a && flag_b").collect()
    assert [r["id"] for r in got] == [1]
    # non-identifier operands (comparisons) also stay conjunctions
    got = vs.sql("SELECT id FROM flags WHERE id > 1 && flag_b").collect()
    assert [r["id"] for r in got] == [3]
    # && inside string literals is untouched
    got = vs.sql("SELECT count(*) AS n FROM flags WHERE 'a && b' = 'a && b'").collect()
    assert got[0]["n"] == 3
    # array operands still rewrite to overlap semantics
    got = vs.sql("SELECT id FROM flags WHERE labels && [1] ORDER BY id").collect()
    assert [r["id"] for r in got] == [1, 3]
    # literal-only overlap (no registered column involved on the left)
    got = vs.sql("SELECT id FROM flags WHERE [1, 9] && labels ORDER BY id").collect()
    assert [r["id"] for r in got] == [1, 3]


def test_unregistered_boolean_and_not_rewritten(spark):
    """An && between identifiers not known to be arrays stays a conjunction
    even when OTHER tables have array columns registered."""
    vs = VectorSql(spark)
    arr_df = spark.createDataFrame([(1, [1])], "id long, tags array<int>")
    bool_df = spark.createDataFrame(
        [(1, True, False)], "id long, ok boolean, ready boolean"
    )
    vs.register_table("tagged", arr_df)
    vs.register_table("bools", bool_df)
    assert vs.sql("SELECT id FROM bools WHERE ok && ready").count() == 0
    assert vs.sql("SELECT id FROM tagged WHERE tags && [1]").count() == 1


# -- 6. cache LRU + byte budget ----------------------------------------------


def test_shard_cache_lru_eviction(monkeypatch):
    monkeypatch.setattr(diskann_mod, "_SHARD_GRAPH_CACHE", type(diskann_mod._SHARD_GRAPH_CACHE)())
    cache = diskann_mod._SHARD_GRAPH_CACHE
    entry_bytes = 1000
    monkeypatch.setattr(diskann_mod, "_SHARD_GRAPH_CACHE_MAX_BYTES", 2 * entry_bytes + 100)

    def put(name):
        diskann_mod._cache_put(
            (name, 0, ("b", 0)),
            (None, np.array([], dtype=np.int64), np.array([], dtype=bool), None),
            entry_bytes,
        )

    put("a")
    put("b")
    cache.move_to_end(("a", 0, ("b", 0)))  # touch a — the hit path does this
    put("c")  # over budget: evicts least-recently-used = b, not a
    keys = {k[0] for k in cache}
    assert keys == {"a", "c"}, f"LRU violated: {keys}"


def test_shard_cache_byte_budget_counts_fullmat(monkeypatch):
    """A plain-storage entry's resident full matrix dominates its size."""
    g = None
    gids = np.arange(10, dtype=np.int64)
    dead = np.zeros(10, dtype=bool)
    fullmat = np.zeros((1000, 64), dtype=np.float32)
    assert diskann_mod._entry_nbytes(g, gids, dead, fullmat) >= fullmat.nbytes
