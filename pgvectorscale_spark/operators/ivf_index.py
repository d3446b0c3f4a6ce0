"""IvfIndex — persisted IVF where probing IS partition pruning.

The cells are physical: the node table is written partitioned by
centroid_id, so a query's nprobe cell filter becomes a parquet
PartitionFilter — unprobed cells are never opened, not merely skipped.
This is the storage-level payoff of coarse quantization at 100 TB: I/O is
proportional to nprobe/num_centroids of the corpus per query, enforced by
the layout rather than by a runtime filter.

Centroids train with declarative k-means (similarity.kmeans_centroids;
iterations=0 degrades to deterministic lowest-id seeds) and persist as a
tiny parquet the driver loads to plan probes.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pgvectorscale_spark.functions.distance import distance_expr, np_distance
from pgvectorscale_spark.operators.index_util import writer_lock
from pgvectorscale_spark.operators.similarity import ivf_assign, kmeans_centroids
from pgvectorscale_spark.types import DistanceType, IndexMeta

__all__ = ["IvfIndex"]


class IvfIndex:
    """Persisted IVF index: parquet nodes partitioned by cell + centroids."""

    def __init__(self, spark: SparkSession, path: str, meta: IndexMeta):
        self.spark = spark
        self.path = path
        self.meta = meta

    @classmethod
    def build(
        cls,
        df: DataFrame,
        path: str,
        num_centroids: int = 64,
        kmeans_iterations: int = 3,
        distance_type: str = DistanceType.L2.value,
        vector_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> "IvfIndex":
        spark = df.sparkSession
        src = df.filter(F.col(vector_col).isNotNull())
        if kmeans_iterations > 0:
            cents = kmeans_centroids(
                src, num_centroids, kmeans_iterations, vector_col, id_col
            )
        else:
            cents = (
                src.orderBy(F.col(id_col).asc())
                .limit(num_centroids)
                .select(
                    F.col(id_col).alias("centroid_id"),
                    F.col(vector_col).cast("array<double>").alias("centroid"),
                )
            )
        cents = cents.cache()
        assign = ivf_assign(
            src, num_centroids, distance_type, vector_col, id_col, centroids_df=cents
        )
        nodes = (
            src.select(F.col(id_col).alias("node_id"), F.col(vector_col).alias("vector"))
            .join(assign.select(F.col(id_col).alias("node_id"), "centroid_id"), "node_id")
        )
        # one task per cell; each cell becomes one parquet partition
        (
            nodes.repartition(num_centroids, "centroid_id")
            .write.mode("overwrite")
            .partitionBy("centroid_id")
            .parquet(os.path.join(path, "nodes"))
        )
        cents.write.mode("overwrite").parquet(os.path.join(path, "centroids"))
        n = src.count()
        row = src.select(F.size(F.col(vector_col)).alias("d")).first()
        meta = IndexMeta(
            distance_type=distance_type,
            storage_type="ivf_flat",
            num_dimensions=int(row["d"]) if row else 0,
            num_shards=num_centroids,
            num_rows=n,
        )
        meta.save(path)
        cents.unpersist()
        return cls(spark, path, meta)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IvfIndex":
        return cls(spark, path, IndexMeta.load(path))

    def nodes(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "nodes"))

    def centroids(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "centroids"))

    def probe_cells(self, query_vec: Sequence[float], nprobe: int) -> list[int]:
        """Driver-side probe planning over the (tiny) centroid table."""
        rows = self.centroids().collect()
        if not rows:  # index built over an empty table: nothing to probe
            return []
        ids = np.array([r["centroid_id"] for r in rows])
        mat = np.array([r["centroid"] for r in rows], dtype=np.float64)
        d = np_distance(mat, np.asarray(query_vec, dtype=np.float64), self.meta.distance_type)
        order = np.lexsort((ids, d))[:nprobe]
        return [int(x) for x in ids[order]]

    def search(
        self,
        query_vec: Sequence[float],
        k: int = 10,
        nprobe: int = 8,
    ) -> DataFrame:
        """Top-k over the probed cells only.

        The `centroid_id IN (...)` filter is a partition filter — check
        .explain(): `PartitionFilters: [centroid_id IN ...]` with no
        PushedFilters needed; unprobed cell files are never read.
        """
        cells = self.probe_cells(query_vec, nprobe)
        if not cells:
            return self.spark.createDataFrame([], "node_id long, distance double")
        qlit = F.array([F.lit(float(x)) for x in query_vec])
        return (
            self.nodes()
            .filter(F.col("centroid_id").isin(cells))
            .withColumn(
                "distance",
                F.round(distance_expr(F.col("vector"), qlit, self.meta.distance_type), 6),
            )
            .orderBy(F.col("distance").asc(), F.col("node_id").asc())
            .limit(k)
            .select("node_id", "distance")
        )

    # -- mutations ---------------------------------------------------------

    def insert(
        self, df: DataFrame, vector_col: str = "embedding", id_col: str = "vec_id"
    ) -> None:
        """Micro-batch upsert: new rows are assigned to their nearest
        (fixed) centroid's cell and the affected cell partitions are
        rewritten; re-inserted ids replace their stored rows wherever they
        previously lived (the old cell is rewritten too, so a moved vector
        never leaves a duplicate behind). Centroids stay fixed after
        training — standard IVF; retrain by rebuilding when cell quality
        drifts. Writers are serialized by the index lock file."""
        with writer_lock(self.path):
            src = df.filter(F.col(vector_col).isNotNull())
            cents = self.centroids().select("centroid_id", F.col("centroid").alias("_cv"))
            new = (
                src.select(
                    F.col(id_col).cast("long").alias("node_id"),
                    F.col(vector_col).alias("vector"),
                )
                .crossJoin(F.broadcast(cents))
                .withColumn(
                    "_d", distance_expr(F.col("vector"), F.col("_cv"), self.meta.distance_type)
                )
                .groupBy("node_id")
                .agg(
                    F.min_by("centroid_id", F.struct("_d", "centroid_id")).alias("centroid_id"),
                    F.first("vector").alias("vector"),
                )
                .select("node_id", "vector", "centroid_id")
            )
            new_ids = new.select("node_id").distinct()
            # cells to rewrite: where the new rows land + where their ids
            # previously lived (upsert must erase the old copy)
            old_cells = (
                self.nodes().join(F.broadcast(new_ids), "node_id").select("centroid_id").distinct()
            )
            cells = [
                int(r["centroid_id"])
                for r in new.select("centroid_id").distinct().union(old_cells).distinct().collect()
            ]
            kept = (
                self.nodes()
                .filter(F.col("centroid_id").isin(cells))
                .join(F.broadcast(new_ids), "node_id", "left_anti")
                .select("node_id", "vector", "centroid_id")
            )
            self._rewrite_cells(kept.unionByName(new))
            self.meta.num_rows = self.nodes().count()
            # index may now hold rows the SQL-registered table lacks: cost
            # routing must never bypass to an exact table scan again
            self.meta.has_mutations = True
            self.meta.save(self.path)

    def delete(self, ids: Sequence[int]) -> None:
        """Remove rows by id (cell partitions rewritten without them)."""
        with writer_lock(self.path):
            ids_df = self.spark.createDataFrame([(int(i),) for i in ids], "node_id long")
            cells = [
                int(r["centroid_id"])
                for r in self.nodes()
                .join(F.broadcast(ids_df), "node_id")
                .select("centroid_id")
                .distinct()
                .collect()
            ]
            if not cells:
                return
            kept = (
                self.nodes()
                .filter(F.col("centroid_id").isin(cells))
                .join(F.broadcast(ids_df), "node_id", "left_anti")
                .select("node_id", "vector", "centroid_id")
            )
            self._rewrite_cells(kept)
            self.meta.num_rows = self.nodes().count()
            # the registered table may still hold these rows: cost-based
            # SQL routing must keep using the index, not an exact table scan
            self.meta.has_tombstones = True
            self.meta.save(self.path)

    def _rewrite_cells(self, updated: DataFrame) -> None:
        """Dynamic-partition-overwrite of just the touched cell partitions
        (staged first: Spark cannot overwrite a path it is reading)."""
        import shutil

        staging = os.path.join(self.path, "_staging_nodes")
        updated.write.mode("overwrite").partitionBy("centroid_id").parquet(staging)
        prior = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                self.spark.read.parquet(staging)
                .select("node_id", "vector", "centroid_id")
                .write.mode("overwrite")
                .partitionBy("centroid_id")
                .parquet(os.path.join(self.path, "nodes"))
            )
        finally:
            if prior is None:
                self.spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
            else:
                self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", prior)
        shutil.rmtree(staging, ignore_errors=True)

    def search_batch(
        self,
        queries_df: DataFrame,
        k: int = 10,
        nprobe: int = 8,
        query_id_col: str = "query_id",
        query_vec_col: str = "query_vec",
    ) -> DataFrame:
        """Batch: union of all probed cells scanned once; each query scores
        only rows of its own probe set (broadcast probe map)."""
        qrows = queries_df.select(query_id_col, query_vec_col).collect()
        probe_pairs = []
        for r in qrows:
            for c in self.probe_cells(r[1], nprobe):
                probe_pairs.append((int(r[0]), c))
        if not probe_pairs:
            return self.spark.createDataFrame(
                [], "query_id long, node_id long, distance double, rank integer"
            )
        probes = self.spark.createDataFrame(probe_pairs, "query_id long, centroid_id int")
        qsel = queries_df.select(
            F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("_qv")
        )
        all_cells = list({c for _, c in probe_pairs})
        scored = (
            self.nodes()
            .filter(F.col("centroid_id").isin(all_cells))  # partition pruning
            .join(F.broadcast(probes), "centroid_id")  # rows only for probing queries
            .join(F.broadcast(qsel), "query_id")
            .withColumn(
                "distance",
                F.round(distance_expr(F.col("vector"), F.col("_qv"), self.meta.distance_type), 6),
            )
        )
        w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(), F.col("node_id").asc())
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "node_id", "distance", "rank")
        )
