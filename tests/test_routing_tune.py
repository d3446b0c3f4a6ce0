"""Auto-tuned routed probes (DiskannIndex.tune_routing / recall_target).

The curve is the ROUTING term of routed recall: fraction of exact top-k
neighbors whose home shard is among each sample query's p nearest
centroids. Verified against an independent numpy recomputation from the
raw artifacts (node table + routing centroids), not against the operator's
own intermediates.
"""
from __future__ import annotations

import numpy as np
import pytest

from pgvectorscale_spark.operators.diskann import DiskannIndex


@pytest.fixture(scope="module")
def overlapped(spark, tmp_path_factory):
    """Clusters close enough that true neighbors spill across Voronoi
    cells — the curve must be non-trivial (below 1.0 at p=1)."""
    rng = np.random.default_rng(42)
    centers = rng.normal(0, 1.0, (8, 12))  # overlapping
    rows = [
        (i, (centers[i % 8] + rng.normal(0, 1.0, 12)).tolist())
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path_factory.mktemp("tune") / "idx")
    idx = DiskannIndex.build(
        df, path, distance_type="l2", num_shards=8, shard_assignment="kmeans"
    )
    return idx, dict(rows)


def test_curve_shape_and_independent_recount(overlapped):
    idx, vecs = overlapped
    curve = idx.meta.routing_recall_curve
    assert idx.meta.routing_recall_k == 10
    ps = sorted(int(p) for p in curve)
    assert ps[-1] == idx.meta.num_shards == 8
    vals = [curve[str(p)] for p in ps]
    assert vals == sorted(vals), "curve must be monotone in probe count"
    assert vals[-1] == 1.0, "probing every shard must have routing recall 1"
    assert vals[0] < 1.0, "overlapping clusters: p=1 must lose neighbors"

    # independent recount from the raw artifacts
    nodes = {
        int(r["node_id"]): (np.array(r["vector"], float), int(r["shard"]))
        for r in idx.nodes().select("node_id", "vector", "shard").collect()
    }
    sids, cents = idx._routing_table()
    mat = np.stack([v for v, _ in nodes.values()])
    ids = np.array(list(nodes))
    qids = sorted(nodes)[:16]
    for p_str, want in curve.items():
        p, tot, hit = int(p_str), 0, 0
        for qid in qids:
            qv = nodes[qid][0]
            topk = ids[np.lexsort((ids, ((mat - qv) ** 2).sum(axis=1)))[:10]]
            near = np.argsort(((cents - qv) ** 2).sum(axis=1))[:p]
            probed = {int(sids[c]) for c in near}
            tot += len(topk)
            hit += sum(nodes[int(n)][1] in probed for n in topk)
        # stored curve values are round(x, 4)
        assert abs(hit / tot - want) <= 5e-5 + 1e-9, (p, hit / tot, want)


def test_recall_target_picks_smallest_adequate_p(overlapped):
    idx, _ = overlapped
    curve = idx.meta.routing_recall_curve
    for target in (0.5, 0.9, 0.999):
        p = idx.auto_probe_shards(target)
        assert curve[str(p)] >= target
        smaller = [q for q in sorted(int(x) for x in curve) if q < p]
        assert all(curve[str(q)] < target for q in smaller)


def test_recall_target_search_matches_explicit_probes(overlapped):
    idx, vecs = overlapped
    q = vecs[3]
    p = idx.auto_probe_shards(0.9)
    auto = [r["node_id"] for r in idx.search(q, k=5, recall_target=0.9).collect()]
    expl = [r["node_id"] for r in idx.search(q, k=5, probe_shards=p).collect()]
    assert auto == expl and len(auto) == 5


def test_recall_target_and_probe_shards_conflict(overlapped):
    idx, vecs = overlapped
    with pytest.raises(ValueError, match="not both"):
        idx.search(vecs[0], k=5, probe_shards=2, recall_target=0.9)


def test_hash_sharded_recall_target_degrades_to_full_fanout(spark, tmp_path):
    rng = np.random.default_rng(1)
    rows = [(i, rng.normal(0, 1, 8).tolist()) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    idx = DiskannIndex.build(
        df, str(tmp_path / "hash_idx"), distance_type="l2", num_shards=4
    )
    assert idx.meta.routing_recall_curve == {}
    got = idx.search(rows[0][1], k=5, recall_target=0.99).collect()
    full = idx.search(rows[0][1], k=5).collect()
    assert [r["node_id"] for r in got] == [r["node_id"] for r in full]
    with pytest.raises(ValueError, match="curve"):
        idx.auto_probe_shards(0.9)


def test_tune_routing_opt_out(spark, tmp_path):
    rng = np.random.default_rng(2)
    rows = [(i, rng.normal(0, 1, 8).tolist()) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    idx = DiskannIndex.build(
        df, str(tmp_path / "notune"), distance_type="l2", num_shards=4,
        shard_assignment="kmeans", tune_routing=False,
    )
    assert idx.meta.routing_recall_curve == {}
    idx.tune_routing(sample_queries=8, k=5)  # on-demand tune still works
    assert idx.meta.routing_recall_curve[str(idx.meta.num_shards)] == 1.0
    # and the saved meta carries it for fresh loads
    cold = DiskannIndex.load(spark, idx.path)
    assert cold.meta.routing_recall_curve == idx.meta.routing_recall_curve
