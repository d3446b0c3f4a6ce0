"""vs.sql() front-end: operator rewrite, index routing, post-filter refill.

Mirrors the reference's SQL surface: the distance opclasses plan
`ORDER BY embedding <=> $q LIMIT k` as an index scan (mod.rs:207-263,
cost_estimate.rs:6-50) and amgettuple streams more results under residual
filters (README.md:291-303)."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from pgvectorscale_spark.functions.distance import np_l2_squared
from pgvectorscale_spark.operators.diskann import DiskannIndex
from pgvectorscale_spark.plans import VectorSql
from tests.conftest import make_fixture_f1


@pytest.fixture(scope="module")
def tmpdir():
    d = tempfile.mkdtemp(prefix="sqlfe_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def ctx(spark, tmpdir):
    df, mat = make_fixture_f1(spark, n=300, d=16)
    idx = DiskannIndex.build(
        df, f"{tmpdir}/idx", distance_type="l2", num_shards=2, id_col="id"
    )
    vs = VectorSql(spark)
    vs.register_table("vecs", df)
    # sls >= n: routed searches are provably exact (build.rs:1363-1414 method)
    vs.register_index("vecs", "embedding", idx, id_col="id", search_list_size=512)
    return vs, df, mat


def _qlit(v) -> str:
    return "[" + ", ".join(repr(float(x)) for x in v) + "]"


def _true_topk_l2(mat, q, k, pred=None):
    d = np_l2_squared(mat.astype(np.float64), q.astype(np.float64))
    order = np.lexsort((np.arange(len(d)), d))
    if pred is not None:
        order = [i for i in order if pred(i)]
    return [int(i) for i in order[:k]]


def test_index_route_matches_exact(ctx):
    vs, df, mat = ctx
    q = mat[7]
    res = vs.sql(
        f"SELECT id, embedding <-> {_qlit(q)} AS distance "
        f"FROM vecs ORDER BY embedding <-> {_qlit(q)} LIMIT 5"
    )
    got = [r["id"] for r in res.collect()]
    assert got == _true_topk_l2(mat, q, 5)
    # the plan went through the index probe, not a brute-force scan
    p = res._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in p  # the round-14 probe stage (was FlatMapGroupsInPandas)


def test_fallback_without_index_matches_exact(spark, ctx):
    vs, df, mat = ctx
    q = mat[3]
    df.createOrReplaceTempView("vecs_noidx")
    res = vs.sql(
        f"SELECT id, embedding <-> {_qlit(q)} AS distance "
        f"FROM vecs_noidx ORDER BY embedding <-> {_qlit(q)} LIMIT 5"
    )
    got = [r["id"] for r in res.collect()]
    assert got == _true_topk_l2(mat, q, 5)
    # fallback is pure spark.sql: JVM expressions, no Python stage
    p = res._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in p and "FlatMapGroupsInPandas" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_cosine_and_ip_spellings(spark, ctx):
    vs, df, mat = ctx
    q = mat[0]
    # <=> (cosine) has no registered cosine index -> metric-mismatch fallback
    res = vs.sql(f"SELECT id FROM vecs ORDER BY embedding <=> {_qlit(q)} LIMIT 3")
    assert [r["id"] for r in res.collect()][0] == 0  # self is nearest
    # <#> inner product via named function spelling
    res2 = vs.sql(
        f"SELECT id FROM vecs ORDER BY inner_product_distance(embedding, array({', '.join(repr(float(x)) for x in q)})) LIMIT 3"
    )
    dots = mat.astype(np.float64) @ q.astype(np.float64)
    best = int(np.lexsort((np.arange(len(dots)), -dots))[0])
    assert [r["id"] for r in res2.collect()][0] == best


def test_post_filter_overfetch_yields_k_rows(ctx):
    """A 50%-selective residual WHERE must still produce k rows, equal to
    the filtered exact top-k (over-fetch + refill loop)."""
    vs, df, mat = ctx
    q = mat[11]
    res = vs.sql(
        f"SELECT id, embedding <-> {_qlit(q)} AS distance "
        f"FROM vecs WHERE id % 2 = 0 ORDER BY embedding <-> {_qlit(q)} LIMIT 10"
    )
    got = [r["id"] for r in res.collect()]
    assert len(got) == 10
    assert got == _true_topk_l2(mat, q, 10, pred=lambda i: i % 2 == 0)


def test_label_overlap_operator_in_sql(spark, tmpdir):
    """The reference's canonical filtered shape `WHERE labels && '{..}'
    ORDER BY embedding <=> q LIMIT k` (filtering_tests.rs) runs through
    vs.sql: && rewrites to arrays_overlap and the residual predicate goes
    through the post-filter refill loop on the index route."""
    rows = [
        (1, [1.0, 2.0, 3.0], [1, 2]),
        (2, [4.0, 5.0, 6.0], [1, 3]),
        (3, [7.0, 8.0, 9.0], [2, 3]),
        (4, [1.5, 2.5, 3.5], [3]),
    ]
    df = spark.createDataFrame(rows, "id long, embedding array<float>, labels array<smallint>")
    idx = DiskannIndex.build(
        df, f"{tmpdir}/idx_ovl", distance_type="l2", num_shards=1,
        id_col="id", label_col="labels",
    )
    vs = VectorSql(spark)
    vs.register_table("lvecs", df)
    vs.register_index("lvecs", "embedding", idx, id_col="id", search_list_size=64)
    res = vs.sql(
        "SELECT id FROM lvecs WHERE labels && [3] "
        "ORDER BY embedding <-> [1.0, 2.0, 3.0] LIMIT 2"
    )
    assert [r["id"] for r in res.collect()] == [4, 2]  # label-3 rows by distance
    # fallback path (no index): same operator, plain spark.sql
    df.createOrReplaceTempView("lvecs_noidx")
    res2 = vs.sql(
        "SELECT id FROM lvecs_noidx WHERE labels && [2] "
        "ORDER BY embedding <-> [1.0, 2.0, 3.0] LIMIT 2"
    )
    assert [r["id"] for r in res2.collect()] == [1, 3]


def test_search_post_filter_api(spark, tmpdir):
    """DiskannIndex.search(post_filter=...) refills until k survivors."""
    df, mat = make_fixture_f1(spark, n=200, d=8)
    idx = DiskannIndex.build(
        df, f"{tmpdir}/idx_pf", distance_type="l2", num_shards=2, id_col="id"
    )
    q = mat[5]
    res = idx.search(
        q.tolist(), k=10, search_list_size=256, post_filter="node_id % 2 = 1"
    ).collect()
    got = [r["node_id"] for r in res]
    assert len(got) == 10
    assert all(i % 2 == 1 for i in got)
    assert got == _true_topk_l2(mat, q, 10, pred=lambda i: i % 2 == 1)


# ---------------------------------------------------------------------------
# LATERAL ANN-join rewrite (round 14): top-k per row of a query TABLE maps
# onto the index's corpus x corpus ann_join; non-matching shapes fall
# through to spark.sql's lateral subquery (exact, slower, never wrong).
# ---------------------------------------------------------------------------


def test_lateral_routes_to_ann_join_and_matches_exact(ctx, spark):
    vs, df, mat = ctx
    qdf = df.filter("id < 6").select(
        F.col("id").alias("qid"), F.col("embedding").alias("qvec")
    )
    vs.register_table("qtab", qdf)
    res = vs.sql(
        """
        SELECT q.qid, nn.id, nn.distance
        FROM qtab q, LATERAL (
          SELECT id, embedding <-> q.qvec AS distance
          FROM vecs ORDER BY distance LIMIT 5
        ) nn
        """
    )
    rows = res.collect()
    assert len(rows) == 6 * 5
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append((r["id"], r["distance"]))
    for qid, pairs in by_q.items():
        want = _true_topk_l2(mat, mat[qid], 5)
        got = [i for i, _ in sorted(pairs, key=lambda p: (p[1], p[0]))]
        assert got == want, (qid, got, want)
    # the routed plan is the ann_join shape: no per-query exact corpus
    # scan (the fallback decorrelates into a window over a full join)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan, plan


def test_lateral_falls_through_without_index(ctx, spark):
    """A lateral over an UNREGISTERED corpus column must still answer
    (spark.sql's decorrelated lateral subquery) with the same rows."""
    vs, df, mat = ctx
    qdf = df.filter("id < 3").select(
        F.col("id").alias("qid"), F.col("embedding").alias("qvec")
    )
    vs.register_table("qtab2", qdf)
    # vecs2 has no registered index
    vs.register_table("vecs2", df)
    res = vs.sql(
        """
        SELECT q.qid, nn.id, nn.distance
        FROM qtab2 q, LATERAL (
          SELECT id, embedding <-> q.qvec AS distance
          FROM vecs2 ORDER BY distance LIMIT 4
        ) nn
        """
    )
    rows = res.collect()
    assert len(rows) == 3 * 4
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append((r["id"], r["distance"]))
    for qid, pairs in by_q.items():
        want = _true_topk_l2(mat, mat[qid], 4)
        got = [i for i, _ in sorted(pairs, key=lambda p: (p[1], p[0]))]
        assert got == want, (qid, got, want)
