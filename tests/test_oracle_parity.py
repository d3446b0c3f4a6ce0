"""Cross-engine parity: every Spark operator vs its DuckDB oracle twin.

This mirrors the driver's t2 correctness gate (row count + schema + order-
insensitive value hash) at sf0.001, so a pass here predicts CORRECTNESS_r{N}.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pgvectorscale_spark import oracles
from pgvectorscale_spark.functions.hashing import SPARK
from pgvectorscale_spark.functions.text import (
    document_fingerprint_sql,
    lang_id_sql,
    punct_ratio_sql,
    quality_score_sql,
    stopword_ratio_sql,
    token_count_sql,
)
from pgvectorscale_spark.operators import dedup
from pgvectorscale_spark.operators.knn import knn_join, search_exact, search_exact_batch
from pgvectorscale_spark.operators.sbq import search_sbq, train_quantizer
from pgvectorscale_spark.operators.similarity import ivf_search
from tests.conftest import SF_DIR

TABLES = ["documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def assert_match(spark_df, ddb_res: pd.DataFrame, float_tol=1e-9):
    got = spark_df.toPandas()
    exp = ddb_res
    assert sorted(got.columns) == sorted(exp.columns), f"schema: {got.columns} vs {exp.columns}"
    cols = sorted(got.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    exp = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(got) == len(exp), f"rows: {len(got)} vs {len(exp)}"
    for c in cols:
        if got[c].dtype.kind == "f" or exp[c].dtype.kind == "f":
            pd.testing.assert_series_equal(
                got[c].astype(float), exp[c].astype(float), check_exact=False, rtol=float_tol,
                check_names=False,
            )
        elif got[c].dtype == object:
            assert got[c].map(str).tolist() == exp[c].map(str).tolist(), f"col {c}"
        else:
            assert got[c].tolist() == exp[c].tolist(), f"col {c}"


def _query_vec(embeddings, qid):
    return embeddings.filter(F.col("vec_id") == qid).collect()[0]["embedding"]


# -- vector ops --------------------------------------------------------------


@pytest.mark.parametrize("dist", ["cosine", "l2", "inner_product"])
def test_knn_exact_parity(spark, embeddings, ddb, dist):
    q = _query_vec(embeddings, 0)
    res = (
        search_exact(embeddings, q, k=10, distance_type=dist)
        .withColumn("distance", F.round("distance", 4))
        .select("vec_id", "distance")
    )
    exp = ddb.execute(oracles.knn_exact_oracle(0, 10, dist)).df()
    assert_match(res, exp)


def test_knn_matryoshka_parity(spark, embeddings, ddb):
    q = _query_vec(embeddings, 3)
    res = (
        search_exact(embeddings, q, k=10, distance_type="l2", num_dims=32)
        .withColumn("distance", F.round("distance", 4))
        .select("vec_id", "distance")
    )
    exp = ddb.execute(oracles.knn_exact_oracle(3, 10, "l2", max_dim=32)).df()
    assert_match(res, exp)


def test_knn_label_filtered_parity(spark, embeddings, ddb):
    q = _query_vec(embeddings, 0)
    res = (
        search_exact(embeddings, q, k=10, labels=[3, 4], label_col="label")
        .withColumn("distance", F.round("distance", 4))
        .select("vec_id", "distance")
    )
    exp = ddb.execute(oracles.knn_label_filtered_oracle(0, 10, [3, 4])).df()
    assert_match(res, exp)


def test_knn_batch_parity(spark, embeddings, ddb):
    qdf = embeddings.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = search_exact_batch(embeddings, qdf, k=5, impl="sql", round_to=4).select(
        "query_id", "vec_id", "distance", "rank"
    )
    exp = ddb.execute(oracles.knn_batch_oracle(5, 5)).df()
    assert_match(res, exp)


def test_knn_join_parity(spark, embeddings, ddb):
    res = knn_join(embeddings.filter("vec_id < 10"), embeddings, k=3, round_to=4).select(
        "left_id", "right_id", "distance", "rank"
    )
    exp = ddb.execute(oracles.knn_join_oracle(10, 3)).df()
    assert_match(res, exp)


def test_sbq_means_parity(spark, embeddings, ddb):
    q = train_quantizer(embeddings, bits_per_dimension=1)
    got = spark.createDataFrame(
        [(i, round(float(m), 6), round(float(v), 6)) for i, (m, v) in enumerate(zip(q.means, q.variances), start=1)],
        "dim int, mean double, variance double",
    )
    exp = ddb.execute(oracles.sbq_means_oracle()).df()
    exp["dim"] = exp["dim"].astype("int32")
    assert_match(got, exp, float_tol=1e-6)


def test_sbq_hamming_parity(spark, embeddings, ddb):
    q = _query_vec(embeddings, 5)
    res = search_sbq(
        embeddings, q, k=20, rescore=0, search_list_size=20,
        quantizer=train_quantizer(embeddings, bits_per_dimension=1),
        distance_type="l2",
    ).select("vec_id", F.col("distance").cast("long").alias("hamming"))
    exp = ddb.execute(oracles.sbq_hamming_oracle(5, 20)).df()
    exp["hamming"] = exp["hamming"].astype("int64")
    assert_match(res, exp)


def test_sbq_rescore_parity(spark, embeddings, ddb):
    q = _query_vec(embeddings, 5)
    res = search_sbq(
        embeddings, q, k=10, rescore=50, search_list_size=50,
        quantizer=train_quantizer(embeddings, bits_per_dimension=1),
        distance_type="l2",
    ).select("vec_id", F.round("distance", 4).alias("distance"))
    exp = ddb.execute(oracles.sbq_rescore_oracle(5, 50, 10)).df()
    assert_match(res, exp)


def test_ivf_parity(spark, embeddings, ddb):
    q = _query_vec(embeddings, 9)
    res = ivf_search(embeddings, q, k=10, num_centroids=16, nprobe=4, distance_type="l2")
    exp = ddb.execute(oracles.ivf_search_oracle(9, 10, 16, 4)).df()
    assert_match(res, exp)


def test_embedding_neardup_parity(spark, embeddings, ddb):
    res = dedup.embedding_neardup_pairs(embeddings, threshold=0.8)
    exp = ddb.execute(oracles.embedding_neardup_oracle(0.8)).df()
    assert_match(res, exp, float_tol=1e-5)


# -- documents ops -------------------------------------------------------------


def test_dedup_exact_parity(spark, documents, ddb):
    res = dedup.dedup_exact(documents)
    exp = ddb.execute(oracles.dedup_exact_oracle()).df()
    assert_match(res, exp)


def test_minhash_signature_parity(spark, documents, ddb):
    res = dedup.minhash_signatures(documents, num_hashes=8, shingle_n=3).select(
        "doc_id", F.col("signature").cast("string").alias("sig_str")
    )
    exp = ddb.execute(oracles.minhash_signature_oracle(8, 3)).df()
    exp["sig_str"] = exp["signature"].map(lambda a: "[" + ", ".join(str(x) for x in a) + "]")
    exp = exp[["doc_id", "sig_str"]]
    assert_match(res, exp)


def test_minhash_pairs_parity(spark, documents, ddb):
    # both the direct join ('exact') and the salted triangle ('salted')
    # must reproduce the one DuckDB pair set — the union shape the
    # driver's minhash_pairs entry runs
    exact = dedup.minhash_candidate_pairs(
        documents, num_hashes=8, bands=4, shingle_n=3
    ).withColumn("form", F.lit("exact"))
    salted = dedup.minhash_candidate_pairs(
        documents, num_hashes=8, bands=4, shingle_n=3, max_bucket_size=2
    ).withColumn("form", F.lit("salted"))
    exp = ddb.execute(oracles.minhash_pairs_oracle(8, 4, 3)).df()
    assert_match(exact.unionByName(salted), exp)


def test_ngram_jaccard_parity(spark, documents, ddb):
    res = dedup.ngram_jaccard_pairs(documents, shingle_n=3, threshold=0.2)
    exp = ddb.execute(oracles.ngram_jaccard_oracle(3, 0.2)).df()
    assert_match(res, exp)


def test_simhash_parity(spark, documents, ddb):
    res = dedup.simhash(documents, num_bits=32)
    exp = ddb.execute(oracles.simhash_oracle(32)).df()
    exp["simhash"] = exp["simhash"].astype("int64")
    assert_match(res, exp)


def test_simhash_pairs_parity(spark, documents, ddb):
    res = dedup.simhash_pairs(documents, max_hamming=6)
    exp = ddb.execute(oracles.simhash_pairs_oracle(32, 6)).df()
    exp["hamming"] = exp["hamming"].astype("int32")
    assert_match(res, exp)


def test_text_features_parity(spark, documents, ddb):
    """The 'features' slice of the text-analysis union (the wide six-signal
    select) still hash-matches its oracle after the round-10 long-format
    rework; the full four-form union is covered by the driver entry and
    test_text_analysis_union_parity below."""
    t = "text"
    res = documents.select(
        "doc_id",
        F.expr(token_count_sql(t, SPARK)).cast("long").alias("token_count"),
        F.expr(punct_ratio_sql(t, SPARK)).alias("punct_permille"),
        F.expr(stopword_ratio_sql(t, SPARK)).alias("stopword_permille"),
        F.expr(quality_score_sql(t, SPARK)).alias("quality_micro"),
        F.expr(lang_id_sql(t, SPARK)).alias("lang_id"),
        F.expr(document_fingerprint_sql(t, SPARK)).alias("fingerprint"),
    ).selectExpr(
        "doc_id",
        "stack(6, 'token_count', cast(token_count as string), "
        "'punct_permille', cast(punct_permille as string), "
        "'stopword_permille', cast(stopword_permille as string), "
        "'quality_micro', cast(quality_micro as string), "
        "'lang_id', lang_id, "
        "'fingerprint', cast(fingerprint as string)) as (metric, value)",
    )
    exp = ddb.execute(
        f"SELECT doc_id, metric, value FROM ({oracles.text_features_oracle()}) u "
        "WHERE form = 'features'"
    ).df()
    assert_match(res, exp)


def test_text_analysis_union_parity(spark, ddb):
    """The full four-form union (features/pii/rules/lm) the driver runs,
    replayed at test SF against the new oracle."""
    import __spark_entry__ as e

    res = e.queries()["text_features"](spark, SF_DIR)
    exp = ddb.execute(oracles.text_features_oracle()).df()
    assert_match(res, exp)


def test_bm25_union_parity(spark, ddb):
    """The jaccard+bm25 tagged union the driver runs, at test SF."""
    import __spark_entry__ as e

    res = e.queries()["ngram_jaccard"](spark, SF_DIR)
    exp = ddb.execute(e.oracle_sql()["ngram_jaccard"]).df()
    assert_match(res, exp, float_tol=1e-6)


def test_multimodal_meta_parity(spark, documents, ddb):
    from pgvectorscale_spark.operators.multimodal import attach_binary_payload, binary_metadata

    res = binary_metadata(attach_binary_payload(documents)).select(
        "doc_id", F.col("byte_len").cast("long").alias("byte_len"), "payload_md5"
    )
    # the oracle is now a tagged union ('bin' + 'warc'); this module-level
    # test checks the binary-metadata arm (the warc arm has its own tests)
    exp = ddb.execute(
        f"SELECT doc_id, byte_len, payload_md5 FROM ({oracles.multimodal_meta_oracle()}) WHERE form = 'bin'"
    ).df()
    exp["byte_len"] = exp["byte_len"].astype("int64")
    assert_match(res, exp)


def test_audio_and_video_meta_match_oracles(spark, ddb):
    """The md5-nibble-draw oracles execute in DuckDB and match the Spark
    synth+scan pipelines (the driver's audio_meta/video_meta gate rows) —
    in-tree guard so a dialect or draw-table drift surfaces before the
    driver run (NOTES parity rule: draw constants move in lockstep)."""
    import __spark_entry__ as e

    for name in ("audio_meta", "video_meta"):
        assert_match(
            e.queries()[name](spark, SF_DIR),
            ddb.execute(e.oracle_sql()[name]).df(),
            float_tol=1e-6,
        )
