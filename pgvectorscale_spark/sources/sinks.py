"""Bucketed Parquet sink — pre-shuffled storage, the 100 TB answer to
"this table is joined/aggregated on the same key every day".

Spark's bucketing writes each partition pre-hash-clustered into a fixed
number of files per bucket key (and optionally sorted within buckets),
and records that layout in the catalog. A later scan then REPORTS
hash-partitioning on the bucket columns, so:

- joins between two tables bucketed the same way run with ZERO Exchange
  (no shuffle of either side — the single biggest cost of a repeated
  corpus-sized join, e.g. the BM25 postings table keyed by ``term``, a
  doc-keyed feature store joined to the corpus, or an id-keyed
  embedding table rescored against payloads);
- aggregations grouped by the bucket columns skip their shuffle the
  same way;
- ``sortBy`` within buckets removes the Sort below a SortMergeJoin too —
  but only when every bucket is ONE file (repartition by the bucket
  columns before writing) and
  ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` (off by
  default since Spark 3.0, because multi-file buckets would force a
  slower one-task-per-bucket scan to honor the ordering).

The shuffle is paid ONCE at write time instead of once per downstream
query — exactly the trade a pipeline that re-reads its corpus daily
wants. tests/test_sinks.py asserts the zero-Exchange plans rather than
trusting this docstring.

No reference analog (pgvectorscale's layout is Postgres heap + index
pages); this is the Parquet/catalog-native equivalent of "keep the
posting heap clustered by term" for Spark (SURVEY.md §2's B7 tape-
storage row maps to Parquet writers generally)."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    num_buckets: int,
    bucket_cols: Sequence[str] | str,
    sort_cols: Sequence[str] | str | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Write ``df`` as a bucketed Parquet table and return the re-read
    DataFrame (whose scan carries the bucket layout). ``path`` makes it
    an external table (data at ``path``, layout in the catalog);
    omitted, the session's warehouse dir is used.

    Size ``num_buckets`` so one bucket's rows fit an executor
    comfortably (the per-bucket file count is one per writing task —
    repartition by the bucket columns first to get exactly one file per
    bucket when small files matter)."""
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be positive, got {num_buckets}")
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    if not bucket_cols:
        raise ValueError("bucket_cols must name at least one column")
    writer = df.write.format("parquet").mode(mode).bucketBy(
        int(num_buckets), bucket_cols[0], *bucket_cols[1:]
    )
    if sort_cols:
        if isinstance(sort_cols, str):
            sort_cols = [sort_cols]
        writer = writer.sortBy(sort_cols[0], *sort_cols[1:])
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return df.sparkSession.table(table)
