"""Offline profiling harness for the 64x ann_join probe plane (round 15).

Replicates bench.py's 64x ANN block (128k rows x 512 kmeans shards, l2,
held-out corpus, 2000-query distributed join at routed p=8) but KEEPS the
index on disk (/tmp/r15_ann64_idx) so repeated measurements skip the build,
then:

  1. times ann_join end-to-end plus its decomposition (route stage alone,
     probe stage into a noop sink, full query with the window),
  2. cProfiles `_probe_shard_block` serially in-process over the exact
     per-shard query groups the routed join produces — the single-thread
     CPU distribution of the probe plane, free of task-scheduling noise.

Usage: python scripts/r15_ann_profile.py [build|time|profile|all]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, ".")

import numpy as np
from pyspark.sql import functions as F

from pgvectorscale_spark.session import get_spark
from pgvectorscale_spark.operators.diskann import (
    DiskannIndex,
    _meta_dict,
    _probe_shard_block,
)
from pgvectorscale_spark.functions.distance import np_normalize, np_distance_pairwise

IDX_PATH = "/tmp/r15_ann64_idx"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def scale_embeddings(src, factor):
    stride = src.agg(F.max("vec_id")).first()[0] + 1
    out = src
    for c in range(1, factor):
        out = out.unionByName(
            src.select(
                (F.col("vec_id") + c * stride).alias("vec_id"),
                F.expr(
                    "transform(embedding, (x, i) -> x + float(pmod("
                    f"xxhash64(vec_id * 64 + i + {c}), 997)) / 99700.0)"
                ).alias("embedding"),
                "label",
            )
        )
    return out


def get_corpus(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    emb64 = scale_embeddings(emb, 64)
    return emb64.filter("vec_id >= 16")


def build(spark):
    if os.path.exists(os.path.join(IDX_PATH, "_index_meta.json")):
        print("index already present at", IDX_PATH)
        return
    emb64ho = get_corpus(spark).persist()
    emb64ho.count()
    t0 = time.time()
    DiskannIndex.build(
        emb64ho, IDX_PATH, distance_type="l2", num_shards=512,
        shard_assignment="kmeans",
    )
    print(f"build_64x_sec {time.time() - t0:.1f}")
    emb64ho.unpersist()


def q2k_df(spark):
    return (
        get_corpus(spark)
        .orderBy("vec_id")
        .limit(2000)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )


def time_join(spark):
    idx = DiskannIndex.load(spark, IDX_PATH)
    q2k = q2k_df(spark).persist()
    q2k.count()
    spark.sparkContext.setJobDescription("r15: annjoin64 end-to-end")
    t0 = time.time()
    n = (
        idx.ann_join(q2k, k=10, probe_shards=8)
        .groupBy("query_id")
        .agg(F.collect_set("node_id").alias("ids"))
        .collect()
    )
    print(f"annjoin64_total_sec {time.time() - t0:.2f} rows={len(n)}")
    q2k.unpersist()


def profile(spark):
    """Serial in-process replay of every probe group the routed join runs."""
    idx = DiskannIndex.load(spark, IDX_PATH)
    meta_d = _meta_dict(idx.meta)
    qrows = q2k_df(spark).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    sids, cents = idx._routing_table()
    cd = np_distance_pairwise(cents, qmat, meta_d["distance_type"], assume_normalized=True)
    nearest = np.argsort(cd, axis=1)[:, :8]
    route: dict[int, list[int]] = {}
    for qi in range(len(qmat)):
        for col in nearest[qi]:
            route.setdefault(int(sids[col]), []).append(qi)
    sizes = sorted(len(v) for v in route.values())
    print(
        f"probe groups: {len(route)} shards, queries/shard min={sizes[0]} "
        f"med={sizes[len(sizes)//2]} max={sizes[-1]} total={sum(sizes)}"
    )
    store = idx._store()
    token = (idx.meta.build_id, idx.meta.mutation_id)
    qstate = idx._quantizer_state()
    from pgvectorscale_spark.types import (
        DEFAULT_QUERY_RESCORE,
        DEFAULT_QUERY_SEARCH_LIST_SIZE,
    )

    lim = max(10, DEFAULT_QUERY_RESCORE)
    sls = DEFAULT_QUERY_SEARCH_LIST_SIZE

    def run_all():
        total = 0
        for shard in sorted(route):
            sel = np.array(route[shard], dtype=np.int64)
            oq, _, _ = _probe_shard_block(
                store, shard, token, meta_d, qstate, qids[sel], qmat[sel],
                None, lim, sls,
            )
            total += len(oq)
        return total

    t0 = time.time()
    total = run_all()  # warm pass: loads + caches every shard graph
    print(f"serial_probe_cold_sec {time.time() - t0:.2f} out_rows={total}")
    t0 = time.time()
    run_all()
    warm = time.time() - t0
    print(f"serial_probe_warm_sec {warm:.2f}")
    pr = cProfile.Profile()
    pr.enable()
    run_all()
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(35)
    print(s.getvalue())


def decompose(spark):
    """Run the timed annjoin query, then pull per-stage wall/metrics from
    the local Spark REST API — the guide §7.1 stage view, scriptable."""
    import json
    import urllib.request

    idx = DiskannIndex.load(spark, IDX_PATH)
    q2k = q2k_df(spark).persist()
    q2k.count()

    def run(desc):
        spark.sparkContext.setJobDescription(desc)
        t0 = time.time()
        (
            idx.ann_join(q2k, k=10, probe_shards=8)
            .groupBy("query_id")
            .agg(F.collect_set("node_id").alias("ids"))
            .collect()
        )
        return time.time() - t0

    warm = run("r15 annjoin64 warmup")
    t = run("r15 annjoin64 timed")
    print(f"annjoin64 warmup={warm:.2f}s timed={t:.2f}s")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete") as r:
        stages = json.load(r)
    stages.sort(key=lambda s: s["submissionTime"])
    # keep the stages of the LAST run (timed): roughly the tail half
    print(f"{'stage':>6} {'wall_s':>7} {'tasks':>6} {'taskTime_s':>10} "
          f"{'shufR_MB':>9} {'shufW_MB':>9}  name")
    for s in stages[-14:]:
        from datetime import datetime

        def ts(x):
            return datetime.strptime(x[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

        wall = ts(s["completionTime"]) - ts(s["firstTaskLaunchedTime"])
        print(
            f"{s['stageId']:>6} {wall:>7.2f} {s['numCompleteTasks']:>6} "
            f"{s['executorRunTime']/1000:>10.1f} "
            f"{s['shuffleReadBytes']/1e6:>9.1f} {s['shuffleWriteBytes']/1e6:>9.1f}  "
            f"{s['name'][:60]}"
        )
    q2k.unpersist()


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("r15_ann_profile")
    if mode in ("build", "all"):
        build(spark)
    if mode in ("time", "all"):
        time_join(spark)
    if mode == "decompose":
        decompose(spark)
    if mode in ("profile", "all"):
        profile(spark)
    spark.stop()


if __name__ == "__main__":
    main()
