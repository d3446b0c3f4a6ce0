"""Dump .explain('formatted') for the headline bench queries + the serving
paths targeted by the round-14 optimization pass, one file per query:
plans/r14/<name>_<tag>.txt.

Usage: python scripts/r14_plans.py before|after
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from pgvectorscale_spark.functions.text import with_text_features
from pgvectorscale_spark.operators import dedup, relational
from pgvectorscale_spark.operators.knn import search_exact_batch
from pgvectorscale_spark.operators.sbq import encode_dataframe, search_sbq, train_quantizer
from pgvectorscale_spark.operators.similarity import ivf_search
from pgvectorscale_spark.session import get_spark
from pgvectorscale_spark.sources.tables import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")


def fmt(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("r14_plans", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    lineitem = load_table(spark, "lineitem", SF)
    orders = load_table(spark, "orders", SF)
    customer = load_table(spark, "customer", SF)
    nation = load_table(spark, "nation", SF)
    events = load_table(spark, "events", SF)
    docs = load_table(spark, "documents", SF)
    emb = load_table(spark, "embeddings", SF)
    q0 = emb.filter("vec_id = 0").first()["embedding"]
    qvecs = emb.filter("vec_id < 16").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    quant = train_quantizer(emb, bits_per_dimension=1)

    from pgvectorscale_spark.operators.relational import ts_epoch_seconds
    from pgvectorscale_spark.streaming.sessionize import sessionize_batch

    ev = events.withColumn("ts_sec", ts_epoch_seconds(events))

    plans: dict[str, object] = {
        "q_pricing": relational.pricing_summary(lineitem),
        "q_top_customers": relational.top_customers(orders, customer, nation, k=10),
        "q_events_hourly": relational.events_hourly(events),
        "q_sessionize": sessionize_batch(ev, gap_seconds=1800, ts_col="ts_sec"),
        "q_knn_batch": search_exact_batch(emb, qvecs, k=10, impl="numpy"),
        "q_sbq_rescore": search_sbq(
            emb, q0, k=10, rescore=50, quantizer=quant, distance_type="l2"
        ),
        "q_ivf": ivf_search(emb, q0, k=10, num_centroids=32, nprobe=4),
        "q_dedup_exact": dedup.dedup_exact(docs),
        "q_minhash_pairs": dedup.minhash_candidate_pairs(docs, num_hashes=16, bands=4),
        "q_simhash": dedup.simhash(docs),
        "q_text_features": with_text_features(docs).select(
            F.sum("token_count"), F.sum("quality_micro"), F.count("*")
        ),
    }

    # index-served paths: build small indexes to expose the serving plans
    from pgvectorscale_spark.operators.diskann import DiskannIndex
    from pgvectorscale_spark.operators.ivf_index import IvfIndex

    tmp = tempfile.mkdtemp(prefix="r14_plans_")
    idx = DiskannIndex.build(emb, f"{tmp}/idx", distance_type="l2", num_shards=8)
    idxkm = DiskannIndex.build(
        emb, f"{tmp}/idxkm", distance_type="l2", num_shards=8,
        shard_assignment="kmeans",
    )
    plans["q_diskann_serve"] = idx.search(q0, k=10)
    plans["q_diskann_serve_batch16"] = idx.search_batch(qvecs, k=10)
    plans["diskann_serve_routed_p2"] = idxkm.search_batch(qvecs, k=10, probe_shards=2)
    plans["diskann_ann_join_routed"] = idxkm.ann_join(qvecs, k=10, probe_shards=2)
    idxivf = IvfIndex.build(
        emb.filter(F.col("embedding").isNotNull()), f"{tmp}/ivf",
        num_centroids=8, distance_type="l2", tune_probing=False,
    )
    plans["ivf_index_search_batch"] = idxivf.search_batch(qvecs, k=10, nprobe=2)
    plans["ivf_index_ann_join"] = idxivf.ann_join(qvecs, k=10, nprobe=2)

    for name, df in plans.items():
        with open(os.path.join(OUT, f"{name}_{TAG}.txt"), "w") as f:
            f.write(fmt(df).strip() + "\n")
        print(f"wrote {name}_{TAG}.txt")
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
