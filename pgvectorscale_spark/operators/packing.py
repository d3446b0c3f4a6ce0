"""Dataset-assembly operators for training pipelines: sequence packing and
deterministic splits.

Two operations every large-scale training-data pipeline runs after curation:

- **Sequence packing** (``pack_sequences``): assign documents to fixed-size
  token windows (the concat-then-chunk packing used to build training
  batches). The deterministic contiguous form — documents in id order, a
  running token total, window w holds tokens [k·w, (k+1)·w) — is a prefix
  sum, which at 100 TB must NOT be a single global window (Spark executes
  an un-partitioned ``ORDER BY`` window in ONE task). It is implemented as
  the classic two-phase distributed scan: range-bucket by id, cumsum inside
  each bucket (a partitioned window), add the broadcast running totals of
  the preceding buckets.
- **Deterministic hash split** (``hash_split``): train/valid/test assignment
  by salted content-free id hash — stable across runs, machines, and
  engines (the md5-based h60 family from functions/hashing.py, so DuckDB
  reproduces the exact assignment), independent of row order, and safe to
  re-run incrementally as new data arrives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pgvectorscale_spark.functions.hashing import SPARK, h60

__all__ = ["pack_sequences", "hash_split"]


def _bucket_search_expr(boundaries: list[int], id_expr: str) -> str:
    """SQL expression computing ``#{b in boundaries : id > b}`` as a nested-IF
    binary search: depth ceil(log2(n+1)) comparisons per row instead of the
    n-term interpreted ``aggregate`` fold it replaces (~0.5-1us/element —
    64 boundaries cost ~6 comparisons now). Identical result for any sorted
    ``boundaries``: the invariant at ``(lo, hi)`` is that every boundary
    below ``lo`` is already known < id and every one at/above ``hi`` is
    known >= id, so an empty range's count is exactly ``lo``."""

    def rec(lo: int, hi: int) -> str:
        if lo == hi:
            return f"{lo}L"
        mid = (lo + hi) // 2
        return (
            f"IF({id_expr} > {boundaries[mid]}L, "
            f"{rec(mid + 1, hi)}, {rec(lo, mid)})"
        )

    return rec(0, len(boundaries))


def pack_sequences(
    df: DataFrame,
    window_tokens: int,
    id_col: str = "doc_id",
    count_col: str = "token_count",
    num_buckets: int | None = None,
) -> DataFrame:
    """Contiguous sequence packing: documents in ``id_col`` order fill
    fixed-size token windows; a document starts at global token offset
    ``cum - count`` and lands in ``bin_id = (cum - count) // window``.

    Returns (id, token_count, bin_id, bin_offset). A document longer than
    the window still gets the bin its first token falls in (the trainer's
    chunker splits it downstream) — offsets are global-exact either way.

    Scale shape: one tiny agg for the empty check, one approx-quantile pass
    to place COUNT-BALANCED bucket boundaries (id-span range buckets skew
    catastrophically on clustered/sparse id spaces — 90% of rows in 1% of
    the span would pile into one bucket's sort task), one shuffle into
    ``num_buckets`` buckets (each bucket's cumsum is a partitioned window —
    parallel, sorted only within buckets), one num_buckets-row aggregate
    whose running totals broadcast back. No global sort, no single-task
    window, no driver-side data beyond num_buckets rows. Bucketing affects
    only BALANCE, never the result: boundaries are exact longs and bucket =
    #{boundaries < id} is monotone in id, so the cross-bucket order the
    prefix sum needs holds for any boundary placement.
    """
    # emptiness probe: limit-1 scan, NOT a full min/max aggregate — the
    # quantile pass below is the only full scan this function makes
    if df.select(id_col).first() is None:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, {count_col} long, bin_id long, bin_offset long"
        )
    if num_buckets is None:
        num_buckets = max(1, df.sparkSession.sparkContext.defaultParallelism * 2)
    boundaries: list[int] = []
    if num_buckets > 1:
        probs = [i / num_buckets for i in range(1, num_buckets)]
        qs = df.select(F.col(id_col).cast("double").alias("_q")).approxQuantile(
            "_q", probs, 0.01
        )
        # exact-long boundaries: double quantiles lose exactness past 2^53,
        # but the long cast keeps the bucket function monotone in id (the
        # only property correctness needs); dedup absorbs degenerate
        # quantiles from heavy duplication
        boundaries = sorted({int(q) for q in qs})
    bucket_expr = _bucket_search_expr(boundaries, f"cast(`{id_col}` as bigint)")
    base = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(count_col).cast("long").alias(count_col),
    ).withColumn("_bucket", F.expr(bucket_expr))
    # phase 1: per-bucket totals -> running offset of every PRECEDING
    # bucket. The totals are num_buckets rows (never data-scale), so the
    # running sum is an explicit driver-side scan — no un-partitioned
    # window (which Spark would execute in a single task) anywhere.
    totals = base.groupBy("_bucket").agg(F.sum(count_col).alias("_tot")).collect()
    acc, prior = 0, []
    for r in sorted(totals, key=lambda r: int(r["_bucket"])):
        prior.append((int(r["_bucket"]), acc))
        acc += int(r["_tot"])
    offsets = df.sparkSession.createDataFrame(prior, "_bucket long, _prior long")
    # phase 2: in-bucket cumsum (partitioned window — parallel across
    # buckets) + the bucket's prior total = exact global prefix sum
    win = Window.partitionBy("_bucket").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = (
        base.join(F.broadcast(offsets), "_bucket")
        .withColumn("_cum", F.sum(count_col).over(win) + F.col("_prior"))
        .withColumn("_start", F.col("_cum") - F.col(count_col))
    )
    return cum.select(
        id_col,
        count_col,
        F.expr(f"_start div {int(window_tokens)}").alias("bin_id"),
        F.pmod(F.col("_start"), F.lit(int(window_tokens))).cast("long").alias("bin_offset"),
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
    resolution: int = 1_000_000,
) -> DataFrame:
    """Deterministic split assignment: bucket = h60(salt || id) mod
    resolution, split = the first label whose cumulative weight covers the
    bucket. Returns the input plus a ``split`` string column.

    Pure map-side expression — zero shuffle, stable under reordering and
    re-runs, and reproducible in DuckDB from the same md5 fragment (change
    ``salt`` to draw an independent split)."""
    if weights is None:
        weights = {"train": 0.98, "valid": 0.01, "test": 0.01}
    if not weights:
        raise ValueError("hash_split: weights must name at least one split")
    # the salt lands inside a SPARK SQL string literal: double backslashes
    # FIRST (Spark treats \ as an escape character inside literals — DuckDB
    # standard strings do not, so only this side needs it), then double
    # embedded quotes. The decoded string VALUE matches the DuckDB oracle's
    # quote-doubled literal exactly, so assignments agree.
    salt_lit = str(salt).replace("\\", "\\\\").replace("'", "''")
    total = float(sum(weights.values()))
    # h60 is 60-bit (15 hex chars) — always non-negative, so plain % works
    bucket = F.expr(
        h60(f"concat('{salt_lit}:', cast({id_col} as string))", SPARK)
    ) % F.lit(resolution)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += float(w) / total
        cond = bucket < F.lit(int(acc * resolution))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    split = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", split)
