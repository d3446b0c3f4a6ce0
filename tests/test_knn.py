"""Exact k-NN operator vs numpy ground truth (FIXTURES.md F1/F4/F6)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pgvectorscale_spark.functions.distance import np_cosine_distance, np_l2_squared
from pgvectorscale_spark.operators.knn import knn_join, search_exact, search_exact_batch
from tests.conftest import make_fixture_f1, make_fixture_f4


@pytest.fixture(scope="module")
def f1(spark):
    return make_fixture_f1(spark, n=300, d=64)


def _numpy_topk(mat, q, k, kind="cosine"):
    d = np_cosine_distance(mat, q) if kind == "cosine" else np_l2_squared(mat, q)
    order = np.lexsort((np.arange(len(d)), d))
    return list(order[:k])


def test_search_exact_cosine_matches_numpy(f1):
    df, mat = f1
    rng = np.random.default_rng(7)
    q = rng.random(64, dtype=np.float32)
    got = [r["id"] for r in search_exact(df, q.tolist(), k=10, id_col="id").collect()]
    assert got == _numpy_topk(mat, q, 10)


def test_search_exact_l2_matches_numpy(f1):
    df, mat = f1
    q = np.ones(64, dtype=np.float32)
    got = [r["id"] for r in search_exact(df, q.tolist(), k=10, distance_type="l2", id_col="id").collect()]
    assert got == _numpy_topk(mat, q, 10, kind="l2")


def test_null_vectors_excluded_and_null_query_scans(spark):
    # F6: NULL vectors never indexed (build.rs:493-497); NULL query → all rows
    df = spark.createDataFrame(
        [(1, [1.0, 1.0]), (2, None), (3, [3.0, 3.0])], "id long, embedding array<float>"
    )
    assert search_exact(df, [1.0, 0.0], k=10, id_col="id").count() == 2
    assert search_exact(df, None, k=10, id_col="id").count() == 2


def test_label_filtered_search(spark):
    df, mat, rows = make_fixture_f4(spark, n=50)
    res = search_exact(df, mat[0].tolist(), k=5, id_col="id", labels=[1], label_col="labels")
    got_ids = {r["id"] for r in res.collect()}
    eligible = {i for i, _, ls in rows if ls and 1 in ls}
    assert got_ids <= eligible
    # NULL / empty / never match (labels/mod.rs:188-204)
    assert all(i not in got_ids for i, _, ls in rows if not ls)


def test_batch_numpy_matches_sql(f1):
    df, mat = f1
    rng = np.random.default_rng(11)
    qrows = [(int(i), rng.random(64).astype(np.float32).tolist()) for i in range(5)]
    qdf = df.sparkSession.createDataFrame(qrows, "query_id long, query_vec array<float>")
    a = search_exact_batch(df, qdf, k=10, id_col="id", impl="numpy").orderBy("query_id", "rank")
    b = search_exact_batch(df, qdf, k=10, id_col="id", impl="sql").orderBy("query_id", "rank")
    ra = [(r["query_id"], r["id"]) for r in a.collect()]
    rb = [(r["query_id"], r["id"]) for r in b.collect()]
    assert ra == rb


def test_matryoshka_slice_changes_ranking_dims(f1):
    df, mat = f1
    q = np.ones(64, dtype=np.float32)
    got = [r["id"] for r in search_exact(df, q.tolist(), k=5, id_col="id", num_dims=32).collect()]
    d = np_cosine_distance(mat[:, :32], q[:32])
    expect = list(np.lexsort((np.arange(len(d)), d))[:5])
    assert got == expect


def test_knn_join_self(spark):
    df, mat = make_fixture_f1(spark, n=40, d=8)
    res = knn_join(df.limit(5), df, k=2, id_col="id").collect()
    assert len(res) == 10
    for r in res:
        assert r["left_id"] != r["right_id"]
