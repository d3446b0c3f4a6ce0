"""Physical-plan quality gates.

Correctness tests prove the values; these prove the *plans* — the properties
that decide whether an operator survives a 100x scale-up: filters and
projections reach the parquet scan, dimension joins broadcast, JVM-side
operators stay out of Python, hash-heavy stages parallelize, and LSH
candidate generation never degenerates to a cartesian product.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgvectorscale_spark.functions.text import with_text_features
from pgvectorscale_spark.operators import dedup, relational
from pgvectorscale_spark.operators.knn import search_exact, search_exact_batch
from tests.conftest import SF_DIR


def plan(df, execute: bool = False) -> str:
    if execute:
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df) -> str:
    """explain('formatted') as a string — the only mode that prints codegen ids."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


def test_pricing_summary_pushdown_and_pruning(spark, lineitem):
    df = relational.pricing_summary(lineitem)
    p = plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in p
    # projection pruning: untouched columns never leave the scan
    assert "l_partkey" not in p
    # exactly 2 exchanges (agg shuffle + final sort) and a map-side partial
    # aggregate: the shuffle carries group partials, not 600k rows
    assert p.count("Exchange") == 2
    assert "partial_sum" in p


def test_top_customers_broadcasts_dims(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    p = plan(relational.top_customers(orders, customer, nation))
    assert p.count("BroadcastHashJoin") == 2  # both dims broadcast, fact never shuffled for the join
    assert "SortMergeJoin" not in p


def test_exact_knn_is_jvm_only(spark, embeddings):
    q = [0.0] * 64
    p = plan(search_exact(embeddings, q, k=10))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "TakeOrderedAndProject" in p  # top-k = per-partition partial + driver merge, no global sort


def test_exact_knn_null_filter_pushed(spark, tmpdir):
    # scan a copied file: the session-cached fixture would substitute an
    # InMemoryTableScan for any scan of the original path
    import shutil

    path = str(tmpdir.join("emb.parquet"))
    shutil.copy(f"{SF_DIR}/embeddings.parquet", path)
    emb = spark.read.parquet(path)
    p = plan(search_exact(emb, [0.0] * 64, k=10))
    assert "PushedFilters: [IsNotNull(embedding)]" in p


def test_batch_knn_numpy_reduces_before_shuffle(spark, embeddings):
    qdf = embeddings.filter("vec_id < 4").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = search_exact_batch(embeddings, qdf, k=5, impl="numpy")
    p = plan(res)
    # the Python stage (BLAS scoring + local top-k) runs before the window's
    # exchange: candidates shuffled = k per (query, scan task), not the corpus
    assert p.index("MapInPandas") > p.index("Exchange")  # plan prints top-down


def test_text_features_jvm_only(spark, documents):
    p = plan(with_text_features(documents))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_minhash_no_cartesian_and_parallel(spark, documents):
    pairs = dedup.minhash_candidate_pairs(documents, num_hashes=8, bands=4)
    p = plan(pairs)
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    sig = dedup.minhash_signatures(documents, num_hashes=8)
    assert sig.rdd.getNumPartitions() >= 2  # widened: hashing parallelizes


def test_simhash_single_md5_pass(spark, documents):
    # per-row fold: one md5 per token, no aggregation exchange at all
    p = plan(dedup.simhash(documents, num_bits=16))
    assert p.count("md5") <= 2  # once in the fold (+1 possible reuse print)
    assert "HashAggregate" not in p  # fingerprint is map-only


def test_simhash_pairs_banded_no_cartesian(spark, documents):
    """Pigeonhole banding: pairs come from an equi-join on (band_id,
    band_value), never an n² fingerprint cross join."""
    p = plan(dedup.simhash_pairs(documents, max_hamming=6))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_diskann_build_one_task_per_shard(spark, tmpdir):
    from pgvectorscale_spark.operators.diskann import DiskannIndex
    from tests.conftest import make_vectors

    idx = DiskannIndex.build(
        make_vectors(spark, n=200, dim=8),
        str(tmpdir.join("idx")),
        distance_type="l2",
        num_shards=4,
    )
    nodes = idx.nodes().repartition(idx.meta.num_shards, "shard")
    assert nodes.rdd.getNumPartitions() == 4


def test_diskann_serve_io_is_codes_and_adjacency_only(spark, tmpdir):
    """The serving plan must not scan the corpus: stage 1 reads shard
    graphs via pyarrow projected to codes+adjacency (no full-precision
    vectors under SBQ — they are fetched per visited node inside the
    probe), and stage 2 is a window over tiny candidate rows with no join
    against the node table at all."""
    from pgvectorscale_spark.operators.diskann import (
        DiskannIndex,
        _stage1_columns,
    )
    from tests.conftest import make_vectors

    # column projection contract: SBQ probes never read `vector`
    assert "vector" not in _stage1_columns({"storage_type": "memory_optimized"})
    assert "vector" in _stage1_columns({"storage_type": "plain"})

    idx = DiskannIndex.build(
        make_vectors(spark, n=200, dim=8),
        str(tmpdir.join("idx_serve_plan")),
        distance_type="l2",
        num_shards=2,
    )
    qdf = spark.createDataFrame([(0, [0.1] * 8)], "query_id long, query_vec array<float>")
    p = plan(idx.search_batch(qdf, k=5))
    assert "FlatMapGroupsInPandas" in p  # shard probe
    # no corpus-sized scan or join anywhere in the serving plan
    assert "Scan parquet" not in p
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
