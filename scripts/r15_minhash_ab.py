"""Interleaved same-host A/B/C for q_minhash_pairs (round 15, VERDICT r14
#4): the r13 bucket-join shape, the r14 in-row flatten single-pass, and the
r15 two-level-explode single-pass, timed with the noop sink at sf0.1,
interleaved so host drift hits all arms equally.

Usage: python scripts/r15_minhash_ab.py [rounds]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from pgvectorscale_spark.operators import dedup
from pgvectorscale_spark.session import get_spark

SF = "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def legacy_join(docs):
    """r13 shape: bucket x bucket self-join (verbatim from the r14 parity
    test)."""
    sig = dedup.minhash_signatures(docs, num_hashes=16)
    b = dedup.lsh_band_buckets(sig, bands=4, rows_per_band=4)
    aa = b.select(F.col("doc_id").alias("doc_a"), "band_id", "band_hash")
    bb = b.select(F.col("doc_id").alias("doc_b"), "band_id", "band_hash")
    return (
        aa.join(bb, ["band_id", "band_hash"]).filter("doc_a < doc_b")
        .select("doc_a", "doc_b").distinct()
    )


def r14_flatten(docs):
    """r14 shape: member lists + ONE in-row flatten(transform(...)) pair
    array (verbatim from commit ef59861)."""
    sig = dedup.minhash_signatures(docs, "text", "doc_id", 16, 3)
    buckets = dedup.lsh_band_buckets(sig, "doc_id", 4, 4)
    members = (
        buckets.groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_list(F.col("doc_id"))).alias("_m"))
        .filter(F.size("_m") > 1)
    )
    return (
        members.select(
            F.explode(
                F.flatten(
                    F.expr(
                        "transform(_m, (x, i) -> transform("
                        "slice(_m, i + 2, size(_m)), "
                        "y -> struct(x AS doc_a, y AS doc_b)))"
                    )
                )
            ).alias("_p")
        )
        .select("_p.doc_a", "_p.doc_b")
        .distinct()
    )


def r15_current(docs):
    return dedup.minhash_candidate_pairs(docs, num_hashes=16, bands=4)


def main() -> None:
    spark = get_spark("r15_minhash_ab")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    arms = [("legacy_join", legacy_join), ("r14_flatten", r14_flatten), ("r15_twolevel", r15_current)]

    def run(fn):
        t0 = time.time()
        fn(docs).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # parity first
    sets = [
        {(r["doc_a"], r["doc_b"]) for r in fn(docs).collect()} for _, fn in arms
    ]
    assert sets[0] == sets[1] == sets[2], "pair sets differ!"
    print(f"pair set identical across arms: {len(sets[0])} pairs")

    for _, fn in arms:
        run(fn)  # warm-up
    samples: dict[str, list[float]] = {n: [] for n, _ in arms}
    for r in range(ROUNDS):
        for name, fn in arms:
            spark.sparkContext.setJobDescription(f"{name} round {r}")
            samples[name].append(round(run(fn), 3))
    for name, vals in samples.items():
        print(f"{name}: median {statistics.median(vals):.3f}s samples {vals}")
    spark.stop()


if __name__ == "__main__":
    main()
