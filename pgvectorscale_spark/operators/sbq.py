"""Statistical Binary Quantization (SBQ) — compress + Hamming scan + rescore.

Reference: pgvectorscale/src/access_method/sbq/quantize.rs (quantizer),
sbq/mod.rs:79-86 (SbqMeans state), scan.rs:244-305 (rescoring).

Capability re-expressed Spark-first:

- **Training** (Q1): the reference streams Welford running mean/m2 over the
  heap (quantize.rs:104-152). Spark computes the same population statistics
  declaratively — ``posexplode`` + ``groupBy(dim).agg(avg, var_pop)`` — which
  does map-side partial aggregation, so the shuffle carries only
  ``dims × partitions`` rows no matter how many vectors (100 TB safe).
- **Encoding** (Q2/Q3): numpy inside an Arrow-batched pandas UDF.
  1 bit/dim: bit_i = v[i] > mean[i] (quantize.rs:57-61).
  n bits/dim: z = (v-μ)/σ mapped over z∈[-2,2] into n+1 ranges; unary
  thermometer code (quantize.rs:63-89). σ=0 edge: all-ones if v>μ else
  zeros (Rust float→usize cast saturation, replicated deliberately).
  Codes are packed LSB-first into u64 lanes exactly like the reference and
  stored as ``array<bigint>`` (two's-complement view; XOR/popcount agree).
- **Search** (Q5+D4+T2): quantize the query once on the driver, Hamming-scan
  the codes (XOR+popcount pandas UDF), keep the top ``rescore`` candidates
  (Spark compiles orderBy+limit to TakeOrderedAndProject = per-partition
  top-k then a driver merge — no full shuffle), then **rescore**: exact
  full-precision distance on the candidates and final top-k. This is the
  reference's two-phase relaxed-order scan made strictly ordered.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pgvectorscale_spark.functions.distance import distance_expr, np_hamming, np_normalize
from pgvectorscale_spark.operators.knn import label_overlap_filter
from pgvectorscale_spark.types import (
    DEFAULT_QUERY_RESCORE,
    DEFAULT_QUERY_SEARCH_LIST_SIZE,
    default_bits_per_dimension,
)

__all__ = ["SbqQuantizer", "train_quantizer", "encode_dataframe", "search_sbq"]


class SbqQuantizer:
    """Driver-side quantizer state (reference SbqQuantizer, quantize.rs:6-13)."""

    def __init__(self, means: np.ndarray, variances: np.ndarray, bits_per_dimension: int = 0):
        self.means = np.asarray(means, dtype=np.float64)
        self.variances = np.asarray(variances, dtype=np.float64)
        self.num_dims = len(self.means)
        self.bits = bits_per_dimension or default_bits_per_dimension(self.num_dims)

    @property
    def num_words(self) -> int:
        nbits = self.num_dims * self.bits
        return (nbits + 63) // 64

    def quantize_matrix(self, mat: np.ndarray) -> np.ndarray:
        """(n, d) float -> (n, w) uint64 packed codes, LSB-first per lane."""
        mat = np.asarray(mat, dtype=np.float64)
        if mat.ndim == 1:
            mat = mat.reshape(1, -1)
        if self.bits == 1:
            bits = mat > self.means[None, :]
        else:
            std = np.sqrt(self.variances)
            ones = np.zeros(mat.shape, dtype=np.int64)
            nz = std > 0
            if nz.any():
                z = (mat[:, nz] - self.means[None, nz]) / std[None, nz]
                idx = (z + 2.0) / (4.0 / (self.bits + 1))
                o = np.where(idx < 1.0, 0, np.minimum(np.floor(idx), self.bits)).astype(np.int64)
                ones[:, nz] = o
            if (~nz).any():
                # sigma=0: reference's inf/NaN cast behavior → n ones iff v > mean
                ones[:, ~nz] = np.where(mat[:, ~nz] > self.means[None, ~nz], self.bits, 0)
            # thermometer expansion: dim i occupies bit positions [i*bits, (i+1)*bits)
            bits = (ones[:, :, None] > np.arange(self.bits)[None, None, :]).reshape(
                mat.shape[0], -1
            )
        pad = (-bits.shape[1]) % 64
        if pad:
            bits = np.concatenate(
                [bits, np.zeros((bits.shape[0], pad), dtype=bool)], axis=1
            )
        packed = np.packbits(bits, axis=1, bitorder="little")
        return packed.view(np.uint64)

    def quantize(self, vec: Sequence[float]) -> np.ndarray:
        return self.quantize_matrix(np.asarray(vec, dtype=np.float64))[0]


def train_quantizer(
    df: DataFrame,
    vector_col: str = "embedding",
    bits_per_dimension: int = 0,
    normalize: bool = False,
) -> SbqQuantizer:
    """Pass-1 training as a declarative aggregate (reference build.rs:574-614).

    ``normalize=True`` for cosine indexes: the reference L2-normalizes at
    ingest (pg_vector.rs:153-155), so training stats are over normalized
    vectors.
    """
    vec = F.col(vector_col)
    src = df.filter(vec.isNotNull())
    if normalize:
        from pgvectorscale_spark.functions.distance import l2_normalize

        src = src.select(l2_normalize(vec).alias(vector_col))
    stats = (
        src.select(F.posexplode(F.col(vector_col)).alias("dim", "v"))
        .groupBy("dim")
        .agg(F.avg("v").alias("mean"), F.var_pop("v").alias("variance"))
        .orderBy("dim")
        .collect()
    )
    means = np.array([r["mean"] for r in stats])
    variances = np.array([r["variance"] for r in stats])
    return SbqQuantizer(means, variances, bits_per_dimension)


def encode_dataframe(
    df: DataFrame,
    quantizer: SbqQuantizer,
    vector_col: str = "embedding",
    code_col: str = "bq_code",
    normalize: bool = False,
) -> DataFrame:
    """Append packed SBQ codes as array<bigint> (Arrow-batched pandas UDF)."""
    b_q = df.sparkSession.sparkContext.broadcast(
        (quantizer.means, quantizer.variances, quantizer.bits)
    )

    @pandas_udf("array<long>")
    def enc(s: pd.Series) -> pd.Series:
        means, variances, bits = b_q.value
        local = SbqQuantizer(means, variances, bits)
        mat = np.stack(s.to_numpy())
        if normalize:
            mat = np_normalize(mat)
        codes = local.quantize_matrix(mat).view(np.int64)
        return pd.Series(list(codes))

    return df.withColumn(code_col, enc(F.col(vector_col)))


def hamming_distance_col(df: DataFrame, qcode: np.ndarray, code_col: str = "bq_code"):
    """Hamming distance column vs a broadcast query code (D4 kernel)."""
    b_qc = df.sparkSession.sparkContext.broadcast(qcode.astype(np.uint64))

    @pandas_udf("long")
    def ham(s: pd.Series) -> pd.Series:
        q = b_qc.value
        codes = np.stack(s.to_numpy()).astype(np.int64).view(np.uint64)
        return pd.Series(np_hamming(codes, q))

    return ham(F.col(code_col))


def hamming_from_vector_col(
    df: DataFrame,
    quantizer: SbqQuantizer,
    qcode: np.ndarray,
    vector_col: str = "embedding",
    normalize: bool = False,
):
    """Quantize + Hamming in ONE pandas UDF (round 14): the un-encoded
    search path used to chain ``encode_dataframe`` into
    ``hamming_distance_col`` — two ArrowEvalPython stages, with the packed
    code column crossing the JVM↔Python boundary twice for values consumed
    only by the very next expression (guide §4.1: control what crosses).
    Same math as the two-step form (quantize_matrix → np_hamming), so the
    distances — and everything ranked on them — are bit-identical."""
    b_q = df.sparkSession.sparkContext.broadcast(
        (quantizer.means, quantizer.variances, quantizer.bits, qcode.astype(np.uint64))
    )

    @pandas_udf("long")
    def ham_vec(s: pd.Series) -> pd.Series:
        means, variances, bits, q = b_q.value
        local = SbqQuantizer(means, variances, bits)
        mat = np.stack(s.to_numpy())
        if normalize:
            mat = np_normalize(mat)
        codes = local.quantize_matrix(mat).view(np.uint64)
        return pd.Series(np_hamming(codes, q))

    return ham_vec(F.col(vector_col))


def search_sbq(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    rescore: int = DEFAULT_QUERY_RESCORE,
    search_list_size: int = DEFAULT_QUERY_SEARCH_LIST_SIZE,
    quantizer: SbqQuantizer | None = None,
    distance_type: str = "l2",
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    code_col: str = "bq_code",
    labels: Sequence | None = None,
    label_col: str = "label",
) -> DataFrame:
    """Two-stage quantized search: Hamming top-`rescore` → exact rerank top-k.

    At Spark scale a quantized full scan is the right first physical plan:
    codes are 16-64x smaller than the vectors (column pruning means stage 1
    reads *only* the code column), the scan is embarrassingly parallel, and
    both top-k's use per-partition partial reduction. `rescore=0` reproduces
    the reference's "quantized order only" failure mode (build.rs:1419-1473)
    and is kept for parity testing.
    """
    normalize = distance_type == "cosine"
    src = df.filter(F.col(vector_col).isNotNull())
    if labels is not None:
        src = src.filter(label_overlap_filter(src, label_col, labels))
    if quantizer is None:
        quantizer = train_quantizer(df, vector_col, normalize=normalize)

    q = np.asarray(query_vec, dtype=np.float64)
    qn = np_normalize(q.reshape(1, -1))[0] if normalize else q
    qcode = quantizer.quantize(qn)

    if code_col not in src.columns:
        # un-encoded corpus: fuse quantize+Hamming into one Python stage
        # (round 14) instead of encode_dataframe → hamming_distance_col —
        # same math, half the JVM↔Python crossings
        scored = src.withColumn(
            "hamming",
            hamming_from_vector_col(src, quantizer, qcode, vector_col, normalize),
        )
    else:
        scored = src.withColumn("hamming", hamming_distance_col(src, qcode, code_col))
    # Candidate pool: the reference's graph walk visits >= search_list_size
    # nodes before the 50-candidate rescore heap fills (guc.rs:3-4). The scan
    # analog pools max(k, rescore, search_list_size) by Hamming order, then
    # rescores all of them (batch rescoring is one joined stage — rescoring
    # the full pool is strictly more accurate at negligible cost).
    n_candidates = max(rescore, k, search_list_size)
    candidates = scored.orderBy(F.col("hamming").asc(), F.col(id_col).asc()).limit(n_candidates)
    if rescore == 0:
        # quantized order only — approximate, for parity with query_rescore=0
        return candidates.limit(k).withColumn("distance", F.col("hamming").cast("double"))
    qlit = F.array([F.lit(float(x)) for x in query_vec])
    rescored = candidates.withColumn(
        "distance", distance_expr(F.col(vector_col), qlit, distance_type)
    )
    return rescored.orderBy(F.col("distance").asc(), F.col(id_col).asc()).limit(k)
