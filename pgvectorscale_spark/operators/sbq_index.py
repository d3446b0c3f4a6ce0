"""SbqFlatIndex — persisted quantized-scan index (no graph).

The reference's memory_optimized layout stores SBQ codes in the index and
rescans them per query (sbq/storage.rs:36-45); at Spark scale the flat
quantized scan IS a first-class physical plan: codes are 16-64x smaller
than vectors, stored in their own parquet column so stage 1's FileScan
reads ONLY (node_id, bq_code) — column pruning makes the candidate pass
proportional to code bytes, not vector bytes. Stage 2 joins the candidate
ids back to full-precision vectors for exact rescoring (T2).

Compared to DiskannIndex this trades graph-walk sublinearity for a
shuffle-free embarrassingly-parallel scan — the right plan when queries
are batched (score thousands of queries in one pass) or the corpus fits
the scan budget. Same quantizer, same meta sidecar, same rescore stage.
"""

from __future__ import annotations

import os
from typing import Iterable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pgvectorscale_spark.functions.distance import (
    distance_expr,
    l2_normalize,
    np_hamming,
    np_normalize,
)
from pgvectorscale_spark.operators.sbq import SbqQuantizer, encode_dataframe, train_quantizer
from pgvectorscale_spark.types import (
    DEFAULT_QUERY_RESCORE,
    DEFAULT_QUERY_SEARCH_LIST_SIZE,
    DistanceType,
    IndexMeta,
    StorageType,
)

__all__ = ["SbqFlatIndex"]


class SbqFlatIndex:
    """Persisted flat SBQ index: parquet (node_id, vector, bq_code) + meta."""

    def __init__(self, spark: SparkSession, path: str, meta: IndexMeta):
        self.spark = spark
        self.path = path
        self.meta = meta

    @classmethod
    def build(
        cls,
        df: DataFrame,
        path: str,
        distance_type: str = DistanceType.COSINE.value,
        bits_per_dimension: int = 0,
        num_dimensions: int = 0,
        vector_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> "SbqFlatIndex":
        spark = df.sparkSession
        src = df.filter(F.col(vector_col).isNotNull())  # NULLs never indexed
        row = src.agg(
            F.count("*").alias("n"), F.first(F.size(F.col(vector_col))).alias("d")
        ).first()
        n, dims = int(row["n"]), int(row["d"]) if row["d"] is not None else 0

        normalize = distance_type == DistanceType.COSINE.value
        vec = l2_normalize(F.col(vector_col)) if normalize else F.col(vector_col)
        base = src.select(
            F.col(id_col).cast("long").alias("node_id"),
            vec.cast("array<float>").alias("vector"),
        )
        meta = IndexMeta(
            distance_type=distance_type,
            storage_type=StorageType.SBQ.value,
            num_dimensions=dims,
            num_dimensions_to_index=num_dimensions if 0 < num_dimensions < dims else 0,
            bits_per_dimension=bits_per_dimension,
            num_rows=n,
        )
        d_index = meta.effective_dims
        train_src = base.select(F.slice("vector", 1, d_index).alias("v"))
        q = train_quantizer(train_src, "v", bits_per_dimension=meta.effective_bits)
        meta.quantizer_means = q.means.tolist()
        meta.quantizer_variances = q.variances.tolist()
        meta.bits_per_dimension = q.bits

        encoded = encode_dataframe(
            base.withColumn("_iv", F.slice("vector", 1, d_index)), q, "_iv", "bq_code"
        ).drop("_iv")
        encoded.write.mode("overwrite").parquet(os.path.join(path, "nodes"))
        meta.save(path)
        return cls(spark, path, meta)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "SbqFlatIndex":
        return cls(spark, path, IndexMeta.load(path))

    def nodes(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "nodes"))

    def _quantizer(self) -> SbqQuantizer:
        return SbqQuantizer(
            np.array(self.meta.quantizer_means),
            np.array(self.meta.quantizer_variances),
            self.meta.effective_bits,
        )

    def search_batch(
        self,
        queries_df: DataFrame,
        k: int = 10,
        rescore: int = DEFAULT_QUERY_RESCORE,
        search_list_size: int = DEFAULT_QUERY_SEARCH_LIST_SIZE,
        query_id_col: str = "query_id",
        query_vec_col: str = "query_vec",
    ) -> DataFrame:
        """Two-stage batch search: (query_id, node_id, distance, rank).

        Stage 1 scans ONLY (node_id, bq_code) — verify with .explain(): the
        FileScan's ReadSchema has no vector column — and keeps a local
        top-window per query inside each Arrow batch, so the shuffle carries
        window x num_queries rows per task, never the corpus. Stage 2 joins
        candidates back to vectors and reranks exactly, JVM-side.
        """
        qrows = queries_df.select(query_id_col, query_vec_col).collect()
        qids = np.array([r[0] for r in qrows], dtype=np.int64)
        qmat = np.array([r[1] for r in qrows], dtype=np.float64)
        normalize = self.meta.distance_type == DistanceType.COSINE.value
        if normalize:
            qmat = np_normalize(qmat)
        d_index = self.meta.effective_dims
        quant = self._quantizer()
        qcodes = quant.quantize_matrix(qmat[:, :d_index])
        window = max(k, rescore, search_list_size)
        b = self.spark.sparkContext.broadcast((qids, qcodes, window))

        def stage1(batches: Iterable[pd.DataFrame]):
            qids_l, qcodes_l, win = b.value
            for pdf in batches:
                if pdf.empty:
                    continue
                ids = pdf["node_id"].to_numpy()
                codes = np.stack(pdf["bq_code"].to_numpy()).astype(np.int64).view(np.uint64)
                out_q, out_n, out_h = [], [], []
                for qi in range(len(qids_l)):
                    h = np_hamming(codes, qcodes_l[qi])
                    top = np.lexsort((ids, h))[:win]  # local top-window pre-shuffle
                    out_q.extend([qids_l[qi]] * len(top))
                    out_n.extend(ids[top])
                    out_h.extend(h[top])
                yield pd.DataFrame({"query_id": out_q, "node_id": out_n, "hamming": out_h})

        cand_local = self.nodes().select("node_id", "bq_code").mapInPandas(
            stage1, schema="query_id long, node_id long, hamming long"
        )
        w_h = Window.partitionBy("query_id").orderBy(F.col("hamming").asc(), F.col("node_id").asc())
        cand = (
            cand_local.withColumn("_r", F.row_number().over(w_h))
            .filter(F.col("_r") <= window)
            .select("query_id", "node_id")
        )
        qsel = queries_df.select(
            F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("_qv")
        )
        qv = l2_normalize(F.col("_qv")) if normalize else F.col("_qv")
        rescored = (
            cand.join(self.nodes().select("node_id", "vector"), "node_id")
            .join(F.broadcast(qsel), "query_id")
            .withColumn(
                "distance",
                distance_expr(F.col("vector"), qv, self.meta.distance_type, assume_normalized=normalize),
            )
        )
        w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(), F.col("node_id").asc())
        return (
            rescored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "node_id", "distance", "rank")
        )

    def search(
        self,
        query_vec: Sequence[float],
        k: int = 10,
        rescore: int = DEFAULT_QUERY_RESCORE,
        search_list_size: int = DEFAULT_QUERY_SEARCH_LIST_SIZE,
    ) -> DataFrame:
        qdf = self.spark.createDataFrame(
            [(0, [float(x) for x in query_vec])], "query_id long, query_vec array<float>"
        )
        return (
            self.search_batch(qdf, k=k, rescore=rescore, search_list_size=search_list_size)
            .select("node_id", "distance")
            .orderBy("distance", "node_id")
        )
