"""Pure-numpy Vamana core: connectivity, recall, prune semantics.

Mirrors the reference accuracy scaffolds (build.rs:1179-1416 recall bar,
:1755-1852 small-dim connectivity)."""

from __future__ import annotations

import numpy as np
import pytest

from pgvectorscale_spark.functions.distance import np_distance, np_normalize
from pgvectorscale_spark.operators.sbq import SbqQuantizer
from pgvectorscale_spark.operators.vamana import VamanaGraph


def _recall_at_10(g: VamanaGraph, mat, distance_type, n_queries=20, seed=3, **kw):
    rng = np.random.default_rng(seed)
    hits = 0
    for _ in range(n_queries):
        q = rng.random(mat.shape[1]).astype(np.float32)
        if distance_type == "cosine":
            q = np_normalize(q.reshape(1, -1))[0].astype(np.float32)
        d = np_distance(mat, q, distance_type, assume_normalized=True)
        expect = set(np.lexsort((np.arange(len(d)), d))[:10])
        got, _ = g.search(q, k=10, **kw)
        hits += len(set(got.tolist()) & expect)
    return hits / (10 * n_queries)


def _reachable(g: VamanaGraph) -> int:
    seen = {g.start_default}
    stack = [g.start_default]
    while stack:
        u = stack.pop()
        for v in g.adj[u]:
            if v not in seen:
                seen.add(v)
                stack.append(v)
    return len(seen)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(42)
    mat = rng.random((300, 64), dtype=np.float32)
    return np_normalize(mat).astype(np.float32)


def test_plain_build_recall_and_connectivity(corpus):
    g = VamanaGraph(corpus, distance_type="cosine", num_neighbors=50, search_list_size=100)
    g.build()
    g.finalize()
    assert _reachable(g) == 300  # full-scan completeness analog
    assert all(len(a) <= 50 for a in g.adj)
    r = _recall_at_10(g, corpus, "cosine")
    assert r >= 0.9, f"recall {r}"


def test_small_dim_connectivity():
    # F2: N=1000, d=2, R=10, L=10 — disconnection stress (build.rs:1755-1852)
    rng = np.random.default_rng(42)
    mat = rng.random((1000, 2), dtype=np.float32)
    g = VamanaGraph(mat, distance_type="l2", num_neighbors=10, search_list_size=10)
    g.build()
    g.finalize()
    assert _reachable(g) == 1000
    r = _recall_at_10(g, mat, "l2", search_list_size=100)
    assert r >= 0.9, f"recall {r}"


def test_sbq_build_recall(corpus):
    quant = SbqQuantizer(corpus.mean(axis=0), corpus.var(axis=0), 2)
    codes = quant.quantize_matrix(corpus)
    g = VamanaGraph(
        corpus, distance_type="cosine", num_neighbors=50, search_list_size=100,
        codes=codes, quantize_fn=quant.quantize,
    )
    g.build()
    g.finalize()
    assert _reachable(g) == 300
    # Reference scaffold queries (build.rs:1248-1252) at reference defaults:
    # the all-ones vector and one seeded random query, >= 9/10 each.
    from pgvectorscale_spark.functions.distance import np_normalize as _nn

    for q in [np.ones(64, dtype=np.float32), np.random.default_rng(1).random(64).astype(np.float32)]:
        qn = _nn(q.reshape(1, -1))[0].astype(np.float32)
        d = np_distance(corpus, qn, "cosine", assume_normalized=True)
        expect = set(np.lexsort((np.arange(len(d)), d))[:10])
        got, _ = g.search(qn, k=10, rescore=50)
        assert len(set(got.tolist()) & expect) >= 9
    # Average recall over 20 uniform queries: uniform data is the distance-
    # concentration worst case — the quantization ceiling (full-scan Hamming
    # top-50 contains only ~86% of the true top-10) binds, not the walk.
    # rescore=100 clears it; the walk itself matches the full-scan ceiling.
    r = _recall_at_10(g, corpus, "cosine", rescore=100)
    assert r >= 0.9, f"recall {r}"


def test_robust_prune_occlusion():
    # collinear points: b occludes c (factor = d(c,point)/d(c,b) > alpha)
    mat = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [0.0, 2.5]], dtype=np.float32)
    g = VamanaGraph(mat, distance_type="l2", num_neighbors=2, max_alpha=1.0)
    cand = np.array([1, 2, 3])
    dists = np_distance(mat[cand], mat[0], "l2")
    res = g.robust_prune(0, cand, dists)
    # point 1 selected first; point 2 occluded (d(2,0)=4 / d(2,1)=1 = 4 > 1.0);
    # point 3 survives (far from point 1)
    assert res == [1, 3]


def test_robust_prune_alpha_rounds():
    # with max_alpha wide enough, occluded candidates return in later rounds
    mat = np.array([[0.0, 0.0], [1.0, 0.0], [1.6, 0.0], [10.0, 10.0]], dtype=np.float32)
    g = VamanaGraph(mat, distance_type="l2", num_neighbors=3, max_alpha=10.0)
    cand = np.array([1, 2, 3])
    dists = np_distance(mat[cand], mat[0], "l2")
    res = g.robust_prune(0, cand, dists)
    assert res[0] == 1 and set(res) == {1, 2, 3}


def test_labeled_search_filters(corpus):
    labels = [frozenset({1}) if i % 2 == 0 else frozenset({2}) for i in range(len(corpus))]
    g = VamanaGraph(corpus, distance_type="cosine", num_neighbors=20, search_list_size=50, labels=labels)
    g.build()
    g.finalize()
    q = corpus[7]
    got, _ = g.search(q, k=10, query_labels=frozenset({1}))
    assert len(got) == 10
    assert all(int(i) % 2 == 0 for i in got)
    # filtered recall vs filtered oracle
    d = np_distance(corpus, q, "cosine", assume_normalized=True)
    mask = np.array([i % 2 == 0 for i in range(len(corpus))])
    idx = np.arange(len(corpus))[mask]
    expect = set(idx[np.lexsort((idx, d[mask]))][:10].tolist())
    assert len(set(got.tolist()) & expect) >= 9
