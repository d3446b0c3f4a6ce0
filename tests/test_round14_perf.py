"""Round-14 optimization parity pins.

Every change in this round is a PLAN/physical change with bit-identical
results; these tests pin the identities the optimizations rely on:
- fused quantize+Hamming == encode_dataframe → hamming_distance_col
- ivf_search through the widened session memo == the uncached path,
  with and without an explicit centroids_df
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.mark.parametrize("bits,normalize", [(1, False), (2, False), (1, True)])
def test_fused_hamming_matches_two_step(spark, bits, normalize):
    from pgvectorscale_spark.functions.distance import np_normalize
    from pgvectorscale_spark.operators.sbq import (
        encode_dataframe,
        hamming_distance_col,
        hamming_from_vector_col,
        train_quantizer,
    )

    rng = np.random.default_rng(7)
    mat = rng.random((80, 16))
    df = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(80)], "vec_id long, embedding array<float>"
    )
    quant = train_quantizer(df, bits_per_dimension=bits, normalize=normalize)
    q = rng.random(16)
    qn = np_normalize(q.reshape(1, -1))[0] if normalize else q
    qcode = quant.quantize(qn)

    enc = encode_dataframe(df, quant, normalize=normalize)
    two_step = {
        r["vec_id"]: r["h"]
        for r in enc.withColumn("h", hamming_distance_col(enc, qcode)).collect()
    }
    fused = {
        r["vec_id"]: r["h"]
        for r in df.withColumn(
            "h", hamming_from_vector_col(df, quant, qcode, normalize=normalize)
        ).collect()
    }
    assert fused == two_step


def test_ivf_search_memo_with_explicit_centroids_matches_fresh(spark):
    from pgvectorscale_spark.operators import similarity as sim

    rng = np.random.default_rng(11)
    mat = rng.random((150, 8))
    df = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(150)], "vec_id long, embedding array<float>"
    )
    cents = sim.kmeans_centroids(df, num_centroids=6, iterations=2)
    sim._ASSIGN_CACHE.clear()
    q = mat[5].tolist()
    warm = sim.ivf_search(
        df, q, k=5, num_centroids=6, nprobe=2, centroids_df=cents
    ).collect()
    assert len(sim._ASSIGN_CACHE) == 1
    warm2 = sim.ivf_search(
        df, q, k=5, num_centroids=6, nprobe=2, centroids_df=cents
    ).collect()
    cold = sim.ivf_search(
        df, q, k=5, num_centroids=6, nprobe=2, centroids_df=cents,
        cache_assignment=False,
    ).collect()
    key = lambda rows: [(r["vec_id"], r["distance"]) for r in rows]
    assert key(warm) == key(cold) == key(warm2)


def test_ivf_search_memoized_plan_reads_no_parquet(spark, tmp_path):
    """The warmed ivf_search plan must not rescan the corpus files: both
    the centroid TakeOrdered and the candidate join come from the
    persisted memo frames."""
    import os

    from pgvectorscale_spark.operators import similarity as sim

    rng = np.random.default_rng(13)
    mat = rng.random((120, 8))
    pdf_path = os.path.join(tmp_path, "emb.parquet")
    spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(120)], "vec_id long, embedding array<float>"
    ).write.parquet(pdf_path)
    df = spark.read.parquet(pdf_path)
    sim._ASSIGN_CACHE.clear()
    q = mat[2].tolist()
    sim.ivf_search(df, q, k=5, num_centroids=8, nprobe=3).collect()  # fill
    warmed = sim.ivf_search(df, q, k=5, num_centroids=8, nprobe=3)
    plan = warmed._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    # drop InMemoryRelation sub-blocks: they print the CACHED plan's
    # recipe (which of course contains the original FileScan), not
    # anything this query executes
    executed, skip_indent = [], None
    for line in plan.splitlines():
        indent = len(line) - len(line.lstrip(" :+-*("))
        if skip_indent is not None and indent > skip_indent:
            continue
        skip_indent = None
        if "InMemoryRelation" in line:
            skip_indent = indent
            continue
        executed.append(line)
    executed = "\n".join(executed)
    assert "FileScan" not in executed and "Scan parquet" not in executed, executed
