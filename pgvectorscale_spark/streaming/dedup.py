"""Streaming exact deduplication: first-arrival-wins content filtering
across micro-batches.

The streaming face of ``operators/dedup.py``'s exact dedup — an ingest
pipeline (crawler output, log tail) wants each distinct document emitted
ONCE, the first time its content is seen, with later copies dropped even
when they arrive in different micro-batches. Spark's ``dropDuplicates``
on a stream keeps unbounded driver-tracked state and emits on watermark;
this operator keeps the state explicit and O(1) per distinct content
hash via ``applyInPandasWithState``:

- content key = the same md5-based ``h60`` fragment batch dedup uses
  (JVM-side, cross-engine reproducible), grouped so each hash's state
  lives on one executor — the shuffle is by fixed-width hash key,
  identical to the batch groupBy's,
- state per key = a single seen flag (plus the keeper id for audit);
  within a batch the smallest id wins (deterministic under replay —
  matches the batch operator's min-id canonicalization), across batches
  the earlier batch wins,
- optional TTL (``state_ttl_seconds``): processing-time timeout that
  expires a hash's state after quiet time, bounding state for unbounded
  corpora where repeats cluster in time (0 = exact forever, state grows
  with distinct content — the caller's trade-off to make).

At 100 TB the state store is the bound: with TTL the working set is the
distinct-content arrival rate x TTL; without it, use the batch operator
over the accumulated corpus instead.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

from pgvectorscale_spark.functions.hashing import SPARK, h60

__all__ = ["stream_dedup_exact"]

_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("content_hash", LongType()),
        StructField("text", StringType()),
    ]
)
_STATE_SCHEMA = StructType([StructField("keeper_id", LongType())])


def stream_dedup_exact(
    stream_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    state_ttl_seconds: int = 0,
) -> DataFrame:
    """Emit each distinct ``text_col`` content once — the first micro-batch
    it appears in, smallest ``id_col`` within that batch (the batch
    operator's canonical-keeper rule). Later arrivals of the same content
    are dropped while the hash's state lives (forever, or ``state_ttl_seconds``
    of processing-time quiet). Output rows: (doc_id, content_hash, text)."""

    def dedupe(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (content_hash,) = key
        if state.hasTimedOut:
            state.remove()
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        if not state.exists:
            keep = batch.loc[batch["_id"].idxmin()]
            state.update((int(keep["_id"]),))
            out = pd.DataFrame(
                {
                    "doc_id": [int(keep["_id"])],
                    "content_hash": [int(content_hash)],
                    "text": [keep["_text"]],
                }
            )
        else:
            out = None
        if state_ttl_seconds:
            state.setTimeoutDuration(state_ttl_seconds * 1000)
        if out is not None:
            yield out

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_seconds
        else GroupStateTimeout.NoTimeout
    )
    # NULL text hashes to NULL; coalesce to -1 (h60 is 60-bit non-negative,
    # so -1 never collides) — all NULL-content rows form one dedup group
    # with a non-null state key, mirroring the batch groupBy's
    # NULLs-group-together semantics instead of crashing the state fn
    hashed = stream_df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_text"),
        F.coalesce(F.expr(h60(f"`{text_col}`", SPARK)), F.lit(-1)).alias("_h"),
    )
    return hashed.groupBy("_h").applyInPandasWithState(
        dedupe,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
