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
    assert "MapInPandas" in p  # shard probe (range-partitioned, round 14)
    # round 14: the probe fan-out is one range partition per shard with NO
    # exchange at all — the only exchange left is the query_id window's
    assert p.count("Exchange") == 1
    # no corpus-sized scan or join anywhere in the serving plan
    assert "Scan parquet" not in p
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p


def test_hybrid_corpus_path_broadcast_only(spark, documents, embeddings):
    """Neither hybrid arm shuffles the corpus: the BM25 postings subtree
    meets only BroadcastHashJoins, the vector arm broadcasts the query
    batch, and the fusion's window is cut by WindowGroupLimit."""
    from pgvectorscale_spark.operators.hybrid import hybrid_topk

    corpus = documents.join(
        embeddings.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    )
    queries = corpus.filter("doc_id % 53 = 0").select(
        F.col("doc_id").alias("query_id"),
        F.expr("concat_ws(' ', slice(split(text, ' '), 1, 4))").alias("q_text"),
        F.col("embedding").alias("q_vec"),
    )
    p = plan(hybrid_topk(corpus, queries, k=5, arm_k=10))
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert "WindowGroupLimit" in p
    # the only join strategies present are broadcast-based
    assert p.count("BroadcastHashJoin") >= 4


def test_warc_parse_no_shuffle_below_mapinpandas(spark, documents):
    """Record extraction is embarrassingly parallel: once the blobs
    exist (here a fixture synth; at crawl scale a binaryFile scan), the
    parse adds NO exchange of its own — MapInPandas sits directly on its
    child."""
    from pgvectorscale_spark.sources.warc import attach_warc_payload, parse_warc_records

    p = plan(parse_warc_records(attach_warc_payload(documents)))
    # exactly the synth's one groupBy exchange; the parse adds none
    assert p.count("Exchange") == 1
    assert "MapInPandas" in p
    pre, post = p.split("MapInPandas", 1)
    assert "Exchange" not in pre  # nothing above the parse


def test_temperature_resample_two_phase_salted(spark, documents):
    """Phase 1 partitions on (stratum, salt) so a hot stratum fans out;
    the final per-stratum window runs over at most buckets*max_target
    survivors, and the per-stratum targets arrive as a map literal (no
    join against a targets table)."""
    from pgvectorscale_spark.operators.curation import temperature_resample

    p = plan(temperature_resample(documents, "source", temperature=2, total_n=120))
    assert "hashpartitioning(source" in p and "_salt" in p
    assert "map(keys:" in p or "map(" in p  # broadcast literal, not a join
    assert p.count("BroadcastHashJoin") == 0
