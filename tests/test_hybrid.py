"""Hybrid BM25+vector retrieval with Reciprocal Rank Fusion
(operators/hybrid.py). The fusion rule is checked against a pure-python
reference on constructed arms; the end-to-end operator is checked for
arm-consistency invariants on the real sf0.001 corpus."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgvectorscale_spark.operators.hybrid import RRF_K, hybrid_topk, rrf_fuse


def _py_rrf(arms, k, rrf_k):
    """Reference fusion: arms are lists of (query_id, doc_id, rank)."""
    acc: dict[tuple, float] = {}
    for arm in arms:
        for q, d, r in arm:
            acc[(q, d)] = acc.get((q, d), 0.0) + 1.0 / (rrf_k + r)
    rows = [(q, d, round(s, 6)) for (q, d), s in acc.items()]
    out = []
    for q in sorted({r[0] for r in rows}):
        ranked = sorted(
            ((d, s) for qq, d, s in rows if qq == q), key=lambda x: (-x[1], x[0])
        )
        out.extend((q, d, s, i + 1) for i, (d, s) in enumerate(ranked[:k]))
    return sorted(out)


def test_rrf_fuse_matches_python_reference(spark):
    # arm A and arm B agree on doc 10, disagree elsewhere; doc 30 is
    # A-only, doc 40 is B-only; query 2 exists in one arm only
    arm_a = [(1, 10, 1), (1, 20, 2), (1, 30, 3), (2, 50, 1)]
    arm_b = [(1, 10, 2), (1, 40, 1), (1, 20, 3)]
    schema = "query_id long, doc_id long, rank long"
    dfa = spark.createDataFrame(arm_a, schema)
    dfb = spark.createDataFrame(arm_b, schema)
    got = sorted(
        tuple(r)
        for r in rrf_fuse([dfa, dfb], k=3, rrf_k=RRF_K)
        .select("query_id", "doc_id", "rrf_score", "rank")
        .collect()
    )
    assert got == _py_rrf([arm_a, arm_b], k=3, rrf_k=RRF_K)


def test_rrf_fuse_tie_breaks_on_doc_id(spark):
    # identical contributions -> identical scores -> smaller doc_id first
    arm = [(7, 200, 1), (7, 100, 1)]
    # two single-row arms at the same rank produce equal scores
    dfa = spark.createDataFrame(arm[:1], "query_id long, doc_id long, rank long")
    dfb = spark.createDataFrame(arm[1:], "query_id long, doc_id long, rank long")
    rows = (
        rrf_fuse([dfa, dfb], k=2)
        .orderBy("rank")
        .select("doc_id", "rank")
        .collect()
    )
    assert [(r["doc_id"], r["rank"]) for r in rows] == [(100, 1), (200, 2)]


def test_rrf_fuse_validates():
    with pytest.raises(ValueError, match="k must be positive"):
        rrf_fuse([None], k=0)
    with pytest.raises(ValueError, match="rrf_k must be positive"):
        rrf_fuse([None], k=1, rrf_k=0)
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([], k=1)


def _py_mmr(cands, k, lam=0.5, round_to=4):
    """Reference MMR: cands = [(qid, vid, rel, vec)] for ONE query."""
    import numpy as np

    cands = sorted(cands, key=lambda c: c[1])
    vecs = np.array([c[3] for c in cands], dtype=np.float64)
    nrm = np.linalg.norm(vecs, axis=1, keepdims=True)
    nrm[nrm == 0] = 1
    unit = vecs / nrm
    sims = np.round(unit @ unit.T, round_to)
    rel = np.round(np.array([c[2] for c in cands]), round_to)
    picked, out = [], []
    for step in range(min(k, len(cands))):
        best, best_s = None, None
        for i in range(len(cands)):
            if i in picked:
                continue
            pen = max((sims[i][j] for j in picked), default=0.0)
            s = round(lam * rel[i] - (1 - lam) * pen, 6)
            if best is None or s > best_s:
                best, best_s = i, s
        picked.append(best)
        out.append((cands[best][0], cands[best][1], best_s, step + 1))
    return out


def test_mmr_rerank_matches_python_reference(spark):
    import random

    rng = random.Random(7)
    rows = []
    for q in range(3):
        for d in range(8):
            vec = [rng.uniform(-1, 1) for _ in range(6)]
            rows.append((q, q * 100 + d, round(rng.uniform(0, 1), 4), vec))
    df = spark.createDataFrame(
        rows, "query_id long, vec_id long, relevance double, embedding array<double>"
    )
    from pgvectorscale_spark.operators.hybrid import mmr_rerank

    got = sorted(
        tuple(r)
        for r in mmr_rerank(df, k=4).select(
            "query_id", "vec_id", "mmr_score", "rank"
        ).collect()
    )
    expected = sorted(
        t for q in range(3) for t in _py_mmr([r for r in rows if r[0] == q], k=4)
    )
    assert [(a, b, round(c, 6), d) for a, b, c, d in got] == [
        (a, b, round(c, 6), d) for a, b, c, d in expected
    ]


def test_mmr_diversifies_against_duplicates(spark):
    # two near-identical high-relevance docs: plain top-2 takes both,
    # MMR takes one of them plus the distinct lower-relevance doc
    rows = [
        (1, 10, 0.99, [1.0, 0.0, 0.0]),
        (1, 11, 0.98, [1.0, 0.001, 0.0]),  # duplicate of 10
        (1, 12, 0.60, [0.0, 1.0, 0.0]),  # orthogonal
    ]
    df = spark.createDataFrame(
        rows, "query_id long, vec_id long, relevance double, embedding array<double>"
    )
    from pgvectorscale_spark.operators.hybrid import mmr_rerank

    picked = [
        r["vec_id"] for r in mmr_rerank(df, k=2).orderBy("rank").collect()
    ]
    assert picked == [10, 12]


def test_mmr_validates(spark):
    from pgvectorscale_spark.operators.hybrid import mmr_rerank

    with pytest.raises(ValueError, match="k must be positive"):
        mmr_rerank(None, k=0)
    with pytest.raises(ValueError, match="lambda_"):
        mmr_rerank(None, k=1, lambda_=1.5)


@pytest.fixture(scope="module")
def corpus(spark, documents, embeddings):
    emb = embeddings.select(F.col("vec_id").alias("doc_id"), "embedding")
    return documents.join(emb, "doc_id").select("doc_id", "text", "embedding").cache()


def test_hybrid_topk_end_to_end(spark, corpus):
    queries = corpus.filter("doc_id % 53 = 0").select(
        F.col("doc_id").alias("query_id"),
        F.expr("concat_ws(' ', slice(split(text, ' '), 1, 4))").alias("q_text"),
        F.col("embedding").alias("q_vec"),
    )
    fused = hybrid_topk(corpus, queries, k=5, arm_k=10).cache()
    rows = fused.collect()
    assert rows, "hybrid search returned nothing"
    # per-query: ranks are 1..n without gaps, scores non-increasing
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["rrf_score"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert len(rs) <= 5
    # a query doc is its own nearest vector (distance 0, vector rank 1)
    # and shares all its query terms with itself (a BM25 candidate), so
    # self-retrieval must appear in the fused top-k
    for q, rs in by_q.items():
        assert q in {r["doc_id"] for r in rs}, f"query {q} did not retrieve itself"
    # every fused doc came from at least one arm's top-arm_k
    from pgvectorscale_spark.operators.bm25 import bm25_topk
    from pgvectorscale_spark.operators.knn import search_exact_batch

    lex = {
        (r["query_id"], r["doc_id"])
        for r in bm25_topk(corpus, queries, k=10).collect()
    }
    vec = {
        (r["query_id"], r["doc_id"])
        for r in search_exact_batch(
            corpus.select("doc_id", "embedding"),
            queries.select("query_id", F.col("q_vec").alias("query_vec")),
            k=10,
            impl="sql",
            round_to=4,
            id_col="doc_id",
        ).collect()
    }
    for r in rows:
        assert (r["query_id"], r["doc_id"]) in (lex | vec)
    # agreement beats single-arm: any doc in BOTH arms' top-10 must
    # outscore any doc found by only one arm at rank >= 2 for that query
    fused_by_key = {(r["query_id"], r["doc_id"]): r["rrf_score"] for r in rows}
    both = lex & vec
    for (q, d), s in fused_by_key.items():
        if (q, d) in both:
            assert s > 1.0 / (RRF_K + 1), "two-arm doc scored below a single arm's best"


def test_hybrid_topk_served_matches_exact_arm_hybrid(spark, corpus, tmp_path):
    """hybrid_topk_served swaps the exact vector arm for a built
    DiskannIndex; the lexical arm and the fusion are shared code, so the
    fused top-k must track the exact-arm hybrid's fused top-k at the
    index's recall — near-identical at full fan-out on this corpus."""
    from pgvectorscale_spark.operators.diskann import DiskannIndex
    from pgvectorscale_spark.operators.hybrid import hybrid_topk_served

    queries = corpus.filter("doc_id % 53 = 0").select(
        F.col("doc_id").alias("query_id"),
        F.expr("concat_ws(' ', slice(split(text, ' '), 1, 4))").alias("q_text"),
        F.col("embedding").alias("q_vec"),
    )
    idx = DiskannIndex.build(
        corpus.select(F.col("doc_id").alias("vec_id"), "embedding"),
        str(tmp_path / "hybrid_idx"),
        distance_type="cosine",
        num_shards=4,
    )
    exact = hybrid_topk(corpus, queries, k=5, arm_k=10).collect()
    served = hybrid_topk_served(
        idx, corpus.select("doc_id", "text"), queries, k=5, arm_k=10
    ).collect()
    ex_by_q: dict[int, set] = {}
    for r in exact:
        ex_by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    sv_by_q: dict[int, set] = {}
    for r in served:
        sv_by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert set(sv_by_q) == set(ex_by_q)
    recall = sum(
        len(sv_by_q[q] & ex_by_q[q]) / len(ex_by_q[q]) for q in ex_by_q
    ) / len(ex_by_q)
    assert recall >= 0.9, f"served-hybrid fused recall {recall}"
    # ranks well-formed per query
    by_q: dict[int, list] = {}
    for r in served:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert q in {r["doc_id"] for r in rs}, f"query {q} did not retrieve itself"


def test_hybrid_topk_served_routed_kwargs(spark, corpus, tmp_path):
    """search_kwargs pass through to search_batch: a kmeans-sharded index
    served with probe_shards=2 of 4 still fuses a full per-query top-k."""
    from pgvectorscale_spark.operators.diskann import DiskannIndex
    from pgvectorscale_spark.operators.hybrid import hybrid_topk_served

    queries = corpus.filter("doc_id % 101 = 0").select(
        F.col("doc_id").alias("query_id"),
        F.expr("concat_ws(' ', slice(split(text, ' '), 1, 4))").alias("q_text"),
        F.col("embedding").alias("q_vec"),
    )
    idx = DiskannIndex.build(
        corpus.select(F.col("doc_id").alias("vec_id"), "embedding"),
        str(tmp_path / "hybrid_routed"),
        distance_type="cosine",
        num_shards=4,
        shard_assignment="kmeans",
    )
    fused = hybrid_topk_served(
        idx, corpus.select("doc_id", "text"), queries, k=5, arm_k=10,
        probe_shards=2,
    ).collect()
    n_queries = queries.count()
    by_q: dict[int, list] = {}
    for r in fused:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == n_queries
    for q, rs in by_q.items():
        assert len(rs) == 5
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))


def test_hybrid_topk_served_over_ivf(spark, corpus, tmp_path):
    """hybrid_topk_served's contract is search_batch-shaped, not
    Diskann-specific: an IvfIndex arm (full probe) fuses with the same
    recall bar against the exact-arm hybrid."""
    from pgvectorscale_spark.operators.hybrid import hybrid_topk_served
    from pgvectorscale_spark.operators.ivf_index import IvfIndex

    queries = corpus.filter("doc_id % 53 = 0").select(
        F.col("doc_id").alias("query_id"),
        F.expr("concat_ws(' ', slice(split(text, ' '), 1, 4))").alias("q_text"),
        F.col("embedding").alias("q_vec"),
    )
    idx = IvfIndex.build(
        corpus.select(F.col("doc_id").alias("vec_id"), "embedding"),
        str(tmp_path / "hybrid_ivf"),
        num_centroids=8,
        distance_type="cosine",
    )
    exact = hybrid_topk(corpus, queries, k=5, arm_k=10).collect()
    served = hybrid_topk_served(
        idx, corpus.select("doc_id", "text"), queries, k=5, arm_k=10, nprobe=8
    ).collect()
    ex_by_q: dict[int, set] = {}
    for r in exact:
        ex_by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    sv_by_q: dict[int, set] = {}
    for r in served:
        sv_by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    recall = sum(
        len(sv_by_q.get(q, set()) & ex_by_q[q]) / len(ex_by_q[q]) for q in ex_by_q
    ) / len(ex_by_q)
    assert recall >= 0.9, f"IVF served-hybrid fused recall {recall}"


def test_hybrid_topk_served_labeled_filters_both_arms(spark, corpus, tmp_path):
    """Labeled served hybrid (round 13): `labels=[...]` must filter BOTH
    arms — the vector arm through the index's label routing AND the
    lexical arm by the same `&&` overlap rule — so every fused doc bears
    the label, and the fused set tracks the exact-arm hybrid computed
    over the label-filtered corpus (shared fusion: the delta is the
    index arm's recall)."""
    from pgvectorscale_spark.operators.diskann import DiskannIndex
    from pgvectorscale_spark.operators.hybrid import hybrid_topk_served

    lab = corpus.withColumn(
        "labels",
        F.array(F.lit(1).cast("smallint"), (F.col("doc_id") % 4 + 2).cast("smallint")),
    ).cache()
    queries = lab.filter("doc_id % 53 = 0").select(
        F.col("doc_id").alias("query_id"),
        F.expr("concat_ws(' ', slice(split(text, ' '), 1, 4))").alias("q_text"),
        F.col("embedding").alias("q_vec"),
    )
    idx = DiskannIndex.build(
        lab.select(F.col("doc_id").alias("vec_id"), "embedding", "labels"),
        str(tmp_path / "hybrid_lbl_idx"),
        distance_type="cosine",
        num_shards=4,
        label_col="labels",
    )
    lbl = 3
    served = hybrid_topk_served(
        idx, lab.select("doc_id", "text", "labels"), queries, k=5, arm_k=10,
        labels=[lbl],
    )
    rows = served.collect()
    in_label = {r["doc_id"] for r in lab.filter(f"doc_id % 4 + 2 = {lbl}").collect()}
    got_docs = {r["doc_id"] for r in rows}
    assert rows and got_docs <= in_label, "fused result leaked out-of-label docs"
    # exact-arm twin over the label-filtered corpus: shared fusion, so
    # the served fused set keeps >= 0.9 of it per query
    exact = hybrid_topk(
        lab.filter(f"doc_id % 4 + 2 = {lbl}").select("doc_id", "text", "embedding"),
        queries, k=5, arm_k=10,
    ).collect()
    ex_by_q: dict[int, set] = {}
    for r in exact:
        ex_by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    sv_by_q: dict[int, set] = {}
    for r in rows:
        sv_by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    recall = sum(
        len(sv_by_q.get(q, set()) & ex_by_q[q]) / len(ex_by_q[q]) for q in ex_by_q
    ) / len(ex_by_q)
    assert recall >= 0.9, f"labeled served-hybrid fused recall {recall}"
    # labels=[] matches nothing on either arm
    assert (
        hybrid_topk_served(
            idx, lab.select("doc_id", "text", "labels"), queries, k=5, arm_k=10,
            labels=[],
        ).count()
        == 0
    )
    # a corpus without the labels column cannot honor the filter: raise
    import pytest as _pytest

    with _pytest.raises(ValueError, match="labels"):
        hybrid_topk_served(
            idx, lab.select("doc_id", "text"), queries, k=5, arm_k=10, labels=[lbl]
        )
    lab.unpersist()


def test_hybrid_distributed_queries_matches_serving_path(spark, corpus, tmp_path):
    """distributed_queries=True (corpus x corpus shape: ann_join vector
    arm + shuffle-join lexical arm, no forced broadcasts, no driver
    collect of queries) must produce the SAME fused result as the
    serving path on identical inputs — the flag changes physical
    strategy, never semantics. Pinned on both index families."""
    from pgvectorscale_spark.operators.diskann import DiskannIndex
    from pgvectorscale_spark.operators.hybrid import hybrid_topk_served
    from pgvectorscale_spark.operators.ivf_index import IvfIndex

    queries = corpus.filter("doc_id % 53 = 0").select(
        F.col("doc_id").alias("query_id"),
        F.expr("concat_ws(' ', slice(split(text, ' '), 1, 4))").alias("q_text"),
        F.col("embedding").alias("q_vec"),
    )

    def _key(rows):
        return {
            (r["query_id"], r["rank"]): (r["doc_id"], round(r["rrf_score"], 6))
            for r in rows
        }

    didx = DiskannIndex.build(
        corpus.select(F.col("doc_id").alias("vec_id"), "embedding"),
        str(tmp_path / "dq_didx"),
        distance_type="cosine",
        num_shards=4,
    )
    serve = _key(
        hybrid_topk_served(
            didx, corpus.select("doc_id", "text"), queries, k=5, arm_k=10
        ).collect()
    )
    dist = _key(
        hybrid_topk_served(
            didx, corpus.select("doc_id", "text"), queries, k=5, arm_k=10,
            distributed_queries=True,
        ).collect()
    )
    assert dist == serve and len(dist) > 0

    iidx = IvfIndex.build(
        corpus.select(F.col("doc_id").alias("vec_id"), "embedding"),
        str(tmp_path / "dq_iidx"),
        num_centroids=4,
        distance_type="cosine",
        tune_probing=False,
    )
    serve_i = _key(
        hybrid_topk_served(
            iidx, corpus.select("doc_id", "text"), queries, k=5, arm_k=10, nprobe=2
        ).collect()
    )
    dist_i = _key(
        hybrid_topk_served(
            iidx, corpus.select("doc_id", "text"), queries, k=5, arm_k=10, nprobe=2,
            distributed_queries=True,
        ).collect()
    )
    assert dist_i == serve_i and len(dist_i) > 0


def test_bm25_shuffle_join_matches_broadcast(spark, corpus):
    """bm25_topk(broadcast_queries=False) — the corpus x corpus lexical
    shape — returns the identical ranked result as the forced-broadcast
    serving shape."""
    from pgvectorscale_spark.operators.bm25 import bm25_topk

    docs = corpus.select("doc_id", "text")
    queries = corpus.filter("doc_id % 31 = 0").select(
        F.col("doc_id").alias("query_id"),
        F.expr("concat_ws(' ', slice(split(text, ' '), 1, 5))").alias("q_text"),
    )

    def _key(rows):
        return {
            (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 6))
            for r in rows
        }

    a = _key(bm25_topk(docs, queries, k=8).collect())
    b = _key(bm25_topk(docs, queries, k=8, broadcast_queries=False).collect())
    assert a == b and len(a) > 0
