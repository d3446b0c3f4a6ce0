"""Interleaved A/B for the ngram_jaccard verify join (round 15, VERDICT r14
#7) in BOTH broadcast regimes at sf0.1.

Arms:
  current  — cand ⋈ sh(doc_a) ⋈ sh(doc_b) (the shipped shape)
  roleunion — ONE join: candidate roles exploded, joined to sh once, pairs
              regrouped with both arrays (evaluates the shingle chain once
              but shuffles 2 arrays per pair through the regroup)

Regimes: default autoBroadcastJoinThreshold, and -1 (the 100 TB regime).

Usage: python scripts/r15_ngram_ab.py [rounds]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from pgvectorscale_spark.operators import dedup
from pgvectorscale_spark.operators.dedup import _ngram_prefix_candidates, _with_shingles
from pgvectorscale_spark.session import get_spark

SF = "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
THRESHOLD = 0.8


def current(docs):
    return dedup.ngram_jaccard_pairs(docs, threshold=THRESHOLD)


def roleunion(docs):
    sh = _with_shingles(docs, "text", 3).select(
        F.col("doc_id"), F.array_distinct("_shingles").alias("_sh")
    )
    cand = _ngram_prefix_candidates(sh, "doc_id", THRESHOLD)
    roles = cand.select(
        "doc_a", "doc_b", F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
    )
    att = roles.join(sh, "doc_id")
    pairs = att.groupBy("doc_a", "doc_b").agg(
        F.min(F.when(F.col("doc_id") == F.col("doc_a"), F.col("_sh"))).alias("_sha"),
        F.min(F.when(F.col("doc_id") == F.col("doc_b"), F.col("_sh"))).alias("_shb"),
    )
    return (
        pairs.withColumn("_inter", F.size(F.array_intersect("_sha", "_shb")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("_inter")
                / (F.size("_sha") + F.size("_shb") - F.col("_inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


def main() -> None:
    spark = get_spark("r15_ngram_ab")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    arms = [("current", current), ("roleunion", roleunion)]

    a = {tuple(r) for r in current(docs).collect()}
    b = {tuple(r) for r in roleunion(docs).collect()}
    assert a == b, f"pair sets differ: {len(a)} vs {len(b)}"
    print(f"pair set identical: {len(a)} rows")

    def run(fn):
        t0 = time.time()
        fn(docs).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    for regime, thr in (("broadcast", None), ("nobroadcast", "-1")):
        if thr is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        else:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        for _, fn in arms:
            run(fn)  # warm
        samples = {n: [] for n, _ in arms}
        for r in range(ROUNDS):
            for name, fn in arms:
                spark.sparkContext.setJobDescription(f"ngram {regime} {name} {r}")
                samples[name].append(run(fn))
        for name, vals in samples.items():
            print(f"{regime} {name}: median {statistics.median(vals):.3f}s {vals}")
    spark.stop()


if __name__ == "__main__":
    main()
