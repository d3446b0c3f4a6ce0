"""SbqFlatIndex: persisted quantized scan + rescore, plan pruning proof."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from pgvectorscale_spark.functions.distance import np_l2_squared
from pgvectorscale_spark.operators.sbq_index import SbqFlatIndex
from tests.conftest import make_vectors


@pytest.fixture(scope="module")
def tmpd():
    d = tempfile.mkdtemp(prefix="sbqidx_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def built(spark, tmpd):
    df = make_vectors(spark, n=400, dim=32, seed=11)
    mat = np.array([r["embedding"] for r in df.orderBy("vec_id").collect()], dtype=np.float64)
    idx = SbqFlatIndex.build(df, f"{tmpd}/idx", distance_type="l2")  # default 2 bits/dim
    return idx, mat


def test_roundtrip_and_recall(spark, built, tmpd):
    idx, mat = built
    idx2 = SbqFlatIndex.load(spark, f"{tmpd}/idx")
    assert idx2.meta.num_rows == 400
    hits = 0
    for qi in (0, 5, 17):
        got = [r["node_id"] for r in idx2.search(mat[qi].tolist(), k=10, rescore=50).collect()]
        true = set(np.lexsort((np.arange(400), np_l2_squared(mat, mat[qi])))[:10].tolist())
        hits += len(set(got) & true)
        assert got[0] == qi  # self is nearest
    assert hits / 30 >= 0.9  # the reference's own accuracy bar


def test_batch_matches_single(spark, built):
    idx, mat = built
    qdf = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(3)], "query_id long, query_vec array<float>"
    )
    batch = idx.search_batch(qdf, k=5).collect()
    assert len(batch) == 15
    by_q = {qid: [r["node_id"] for r in sorted(batch, key=lambda r: r["rank"]) if r["query_id"] == qid] for qid in range(3)}
    for qid in range(3):
        single = [r["node_id"] for r in idx.search(mat[qid].tolist(), k=5).collect()]
        assert by_q[qid] == single


def test_stage1_reads_only_codes(spark, built):
    """Column pruning: the candidate pass's FileScan must not read vectors."""
    idx, mat = built
    qdf = spark.createDataFrame([(0, mat[0].tolist())], "query_id long, query_vec array<float>")
    plan = idx.search_batch(qdf, k=5)._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "FileScan" in l]
    code_scans = [l for l in scans if "bq_code" in l]
    assert code_scans, "no code-column scan found"
    assert all("vector" not in l.split("ReadSchema")[-1] for l in code_scans)


def test_cosine_normalizes(spark, tmpd):
    df = make_vectors(spark, n=100, dim=16, seed=5)
    idx = SbqFlatIndex.build(df, f"{tmpd}/idx_cos", distance_type="cosine")
    q = df.filter("vec_id = 3").first()["embedding"]
    got = idx.search([x * 7.0 for x in q], k=3).collect()  # scale-invariant
    assert got[0]["node_id"] == 3
    assert got[0]["distance"] < 1e-9
