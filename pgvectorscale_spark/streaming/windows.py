"""Watermarked window aggregations — the streaming twin of the batch rollups.

The reference has no streaming surface (Postgres executes everything);
these operators cover the Structured Streaming plane a 100 TB pipeline
needs: late-data-tolerant windowed counts/sums over an event stream, and a
streaming near-dup screen (new documents minhash-banded against a static
bucket table — the stream side never shuffles the static side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["events_windowed_stream", "streaming_neardup_candidates"]


def events_windowed_stream(
    stream_df: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-type tumbling-window counts/sums with a watermark.

    Late rows inside ``watermark_delay`` update their window; later ones are
    dropped and the window state is reclaimed — bounded state at any scale.
    Output matches relational.events_hourly's columns (hour_epoch as bigint)
    so the batch query is the backfill of this stream.
    """
    src = stream_df.withWatermark(ts_col, watermark_delay)
    return (
        src.groupBy(
            F.window(F.col(ts_col), window_duration).alias("_w"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("event_count"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            "event_type",
            F.unix_timestamp(F.col("_w.start")).cast("long").alias("hour_epoch"),
            "event_count",
            "value_cents",
        )
    )


def streaming_neardup_candidates(
    stream_docs: DataFrame,
    static_buckets: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Screen incoming documents against a static LSH bucket table.

    stream-static join: each micro-batch computes band hashes for its new
    docs (same fragments as the batch operator) and equi-joins the static
    bucket table on (band_id, band_hash) — Spark broadcasts or co-partitions
    the static side; stream state stays empty (no stream-stream join).
    Returns (new_doc_id, dup_of) candidate pairs for downstream verification.
    """
    from pgvectorscale_spark.operators.dedup import lsh_band_buckets, minhash_signatures

    sig = minhash_signatures(
        stream_docs, text_col=text_col, id_col=id_col, num_hashes=num_hashes, shingle_n=shingle_n
    )
    buckets = lsh_band_buckets(sig, id_col=id_col, bands=bands, rows_per_band=num_hashes // bands)
    return (
        buckets.withColumnRenamed(id_col, "new_doc_id")
        .join(
            static_buckets.withColumnRenamed(id_col, "dup_of"),
            ["band_id", "band_hash"],
        )
        .filter(F.col("new_doc_id") != F.col("dup_of"))
        .select("new_doc_id", "dup_of")
        .dropDuplicates(["new_doc_id", "dup_of"])
    )
