"""Dump .explain('formatted') for the paths touched by the round-15
optimization pass, one file per query: plans/r15/<name>_<tag>.txt.

Run from the repo root whose CODE should be captured (the before-plans are
captured by running this same script from a checkout of the r14 tree):

Usage: python scripts/r15_plans.py before|after [out_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from pgvectorscale_spark.operators import dedup
from pgvectorscale_spark.session import get_spark
from pgvectorscale_spark.sources.tables import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
OUT = (
    sys.argv[2]
    if len(sys.argv) > 2
    else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
    )
)


def fmt(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("r15_plans", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, "documents", SF)
    emb = load_table(spark, "embeddings", SF)
    qvecs = emb.filter("vec_id < 16").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # the 64x bench's query frame arrives as ONE partition (orderBy+limit):
    # reproduce that shape so the route-stage plan diff is visible
    qthin = (
        emb.orderBy("vec_id")
        .limit(16)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )

    plans: dict[str, object] = {
        "q_minhash_pairs": dedup.minhash_candidate_pairs(docs, num_hashes=16, bands=4),
        "simhash_pairs": dedup.simhash_pairs(docs),
        "simhash_multiprobe": dedup.simhash_pairs_multiprobe(docs),
        "embedding_neardup_lsh": dedup.embedding_neardup_lsh(emb, threshold=0.9),
        "ngram_jaccard": dedup.ngram_jaccard_pairs(docs, threshold=0.8),
        "winnowing": dedup.winnowing_fingerprints(docs),
    }

    from pgvectorscale_spark.operators.diskann import DiskannIndex

    tmp = tempfile.mkdtemp(prefix="r15_plans_")
    idxkm = DiskannIndex.build(
        emb, f"{tmp}/idxkm", distance_type="l2", num_shards=8,
        shard_assignment="kmeans",
    )
    plans["diskann_ann_join_routed_thinq"] = idxkm.ann_join(qthin, k=10, probe_shards=2)
    plans["diskann_ann_join_routed"] = idxkm.ann_join(qvecs, k=10, probe_shards=2)

    for name, df in plans.items():
        with open(os.path.join(OUT, f"{name}_{TAG}.txt"), "w") as f:
            f.write(fmt(df).strip() + "\n")
        print(f"wrote {name}_{TAG}.txt")
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
