"""Structured Streaming ingest into a DiskANN index.

The reference's incremental path is ``aminsert`` — one row at a time under a
transaction-level advisory lock (pgvectorscale/src/access_method/build.rs:464-558,
src/util/ports.rs:160). The Spark-native restatement is micro-batch ingest:
``readStream → writeStream.foreachBatch(index.insert)``. Each micro-batch
runs the same shard-local graph-insert algorithm as the batch path and
rewrites only the affected shard partitions; the advisory lock becomes the
single-writer-per-index discipline that foreachBatch serializes by
construction (one batch at a time per query).

Deletes stream the same way: a micro-batch of ids → tombstones (vacuum
analog, src/access_method/vacuum.rs:23-136).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from pgvectorscale_spark.operators.diskann import DiskannIndex

__all__ = ["stream_insert", "stream_delete"]


def stream_insert(
    index: DiskannIndex,
    stream_df: DataFrame,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str | None = None,
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
    lock_wait: float = 0.0,
) -> StreamingQuery:
    """Continuously insert a vector stream into the index.

    ``trigger_available_now=True`` drains whatever is available and stops —
    the batch-backfill shape; pass False for an always-on micro-batch query.
    Exactly-once per micro-batch comes from the checkpoint: a replayed batch
    re-inserts the same node_ids, which the shard-insert treats as rewrites
    of the same rows (idempotent). ``lock_wait`` > 0 queues each micro-batch
    on the writer lock (the reference's blocking advisory-lock behavior)
    instead of failing fast when another writer — e.g. a concurrent
    stream_delete — holds it.
    """

    def _insert_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        index.insert(
            batch_df, vector_col=vector_col, id_col=id_col, label_col=label_col,
            lock_wait=lock_wait,
        )

    writer = stream_df.writeStream.foreachBatch(_insert_batch).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_delete(
    index: DiskannIndex,
    stream_df: DataFrame,
    id_col: str = "vec_id",
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
    lock_wait: float = 0.0,
) -> StreamingQuery:
    """Tombstone ids arriving on a stream (micro-batched vacuum).
    ``lock_wait`` queues on the writer lock like stream_insert."""

    def _delete_batch(batch_df: DataFrame, batch_id: int) -> None:
        ids = [r[id_col] for r in batch_df.select(id_col).collect()]
        if ids:
            index.delete(ids, lock_wait=lock_wait)

    writer = stream_df.writeStream.foreachBatch(_delete_batch).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
