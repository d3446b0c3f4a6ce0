"""Similarity search beyond the graph index: IVF coarse quantization.

The scale path for batch ANN when a graph is overkill: partition the corpus
into Voronoi cells around centroids, search only the `nprobe` cells nearest
the query, rerank exactly. Fully declarative (joins + window top-k), so
Catalyst handles pushdown and the cell assignment is one shuffle.

Centroid choice is deterministic (the `num_centroids` lowest-id vectors) so
results are reproducible and the DuckDB oracle can replay the exact
computation. Swap in k-means centroids for quality at scale — the operator
shape (assign → probe → rerank) is unchanged.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgvectorscale_spark.functions.distance import distance_expr

__all__ = ["ivf_assign", "ivf_search", "kmeans_centroids"]


def kmeans_centroids(
    df: DataFrame,
    num_centroids: int = 16,
    iterations: int = 5,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Declarative Lloyd iterations: the quality upgrade over lowest-id seeds.

    Each round = one broadcast-join assignment + one map-side-combined
    aggregate (posexplode -> avg per (cluster, dim)); centroids stay tiny and
    broadcast, the corpus is scanned ``iterations`` times and never shuffled
    whole (the shuffle carries num_centroids x dims partial sums per task).
    Seeds are the lowest-id vectors, so the whole training is deterministic.

    Returns (centroid_id, centroid array<double>).
    """
    centroids = (
        df.orderBy(F.col(id_col).asc())
        .limit(num_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col(vector_col).cast("array<double>").alias("_cv"))
    )
    src = df.select(F.col(id_col), F.col(vector_col)).persist()
    try:
        for _ in range(iterations):
            scored = src.crossJoin(F.broadcast(centroids)).withColumn(
                "_d", distance_expr(F.col(vector_col), F.col("_cv"), "l2")
            )
            # min_by aggregation, not row_number-over-window: a window sorts
            # n x centroids rows; the hash agg reduces map-side to one row
            # per id (tie-break (distance, centroid_id) via struct ordering)
            assigned = scored.groupBy(id_col).agg(
                F.min_by("centroid_id", F.struct("_d", "centroid_id")).alias("centroid_id"),
                F.first(vector_col).alias(vector_col),  # constant within the group
            )
            centroids = (
                assigned.select("centroid_id", F.posexplode(vector_col).alias("dim", "v"))
                .groupBy("centroid_id", "dim")
                .agg(F.avg("v").alias("m"))
                .groupBy("centroid_id")
                .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("_s"))
                .select(
                    "centroid_id",
                    F.expr("transform(_s, x -> x.m)").alias("_cv"),
                )
            )
        return centroids.select("centroid_id", F.col("_cv").alias("centroid"))
    finally:
        src.unpersist()


def ivf_assign(
    df: DataFrame,
    num_centroids: int = 16,
    distance_type: str = "l2",
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    centroids_df: DataFrame | None = None,
) -> DataFrame:
    """Assign every vector to its nearest centroid.

    Returns (id, centroid_id, assign_dist). Default centroids = vectors with
    the `num_centroids` lowest ids (deterministic, oracle-replayable); pass
    ``centroids_df`` (centroid_id, centroid) from kmeans_centroids for the
    quality path.
    """
    if centroids_df is not None:
        centroids = centroids_df.select("centroid_id", F.col("centroid").alias("_cv"))
    else:
        centroids = (
            df.orderBy(F.col(id_col).asc())
            .limit(num_centroids)
            .select(F.col(id_col).alias("centroid_id"), F.col(vector_col).alias("_cv"))
        )
    scored = df.select(F.col(id_col), F.col(vector_col)).crossJoin(F.broadcast(centroids))
    scored = scored.withColumn(
        "assign_dist", distance_expr(F.col(vector_col), F.col("_cv"), distance_type)
    )
    # min_by aggregation (map-side partial) instead of row_number-over-window:
    # the window would sort-shuffle n x centroids rows for a 1-row-per-id
    # answer; the hash agg collapses to n rows before the exchange
    return scored.groupBy(id_col).agg(
        F.min_by("centroid_id", F.struct("assign_dist", "centroid_id")).alias("centroid_id"),
        F.round(F.min("assign_dist"), 6).alias("assign_dist"),
    )


def ivf_search(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    distance_type: str = "l2",
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    centroids_df: DataFrame | None = None,
    assign_df: DataFrame | None = None,
) -> DataFrame:
    """IVF top-k: probe the nprobe cells nearest the query, exact rerank.

    Returns (id, distance) — distance rounded to 6dp for oracle parity.
    Pass ``assign_df`` (from a cached/persisted ``ivf_assign``) to reuse one
    corpus assignment across a query workload instead of recomputing it per
    call — the persisted ``IvfIndex`` does this with parquet partitions.
    """
    qlit = F.array([F.lit(float(x)) for x in query_vec])
    assign = (
        assign_df
        if assign_df is not None
        else ivf_assign(df, num_centroids, distance_type, vector_col, id_col, centroids_df)
    )
    if centroids_df is not None:
        centroids = centroids_df.select("centroid_id", F.col("centroid").alias("_cv"))
    else:
        centroids = (
            df.orderBy(F.col(id_col).asc())
            .limit(num_centroids)
            .select(F.col(id_col).alias("centroid_id"), F.col(vector_col).alias("_cv"))
        )
    probed = (
        centroids.withColumn("_qd", distance_expr(F.col("_cv"), qlit, distance_type))
        .orderBy(F.col("_qd").asc(), F.col("centroid_id").asc())
        .limit(nprobe)
        .select("centroid_id")
    )
    cand = assign.join(F.broadcast(probed), "centroid_id").select(id_col)
    return (
        df.join(cand, id_col)
        .withColumn("distance", F.round(distance_expr(F.col(vector_col), qlit, distance_type), 6))
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "distance")
    )
