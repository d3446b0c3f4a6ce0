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
from pyspark.sql.types import BooleanType, LongType, StringType, StructField, StructType

from pgvectorscale_spark.functions.hashing import (
    SPARK,
    band_hash,
    h60,
    minhash_signature_expr,
)

__all__ = [
    "neardup_keepers",
    "stream_dedup_exact",
    "stream_dedup_neardup",
    "stream_neardup_band_verdicts",
    "stream_paragraph_dedup",
]

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


_PARA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("para_idx", LongType()),
        StructField("para_hash", LongType()),
        StructField("is_keeper", BooleanType()),
        StructField("para", StringType()),
    ]
)
_PARA_STATE = StructType(
    [StructField("keeper_doc", LongType()), StructField("keeper_idx", LongType())]
)


def stream_paragraph_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    state_ttl_seconds: int = 0,
) -> DataFrame:
    """Streaming face of ``operators/dedup.paragraph_dedup``: per-PARAGRAPH
    first-arrival-wins dedup under the SAME normalization (blank-line
    split, lowercase, non-alphanumeric runs to one space, trim) and the
    same hash family, so stream and batch group identically.

    Emits one verdict row per paragraph: (doc_id, para_idx, para_hash,
    is_keeper, para). State lives per normalized-paragraph hash and is
    two longs — the keeper's (doc, idx): the first batch to present a
    normalized form keeps exactly one occurrence (smallest (doc, idx)
    within that batch — the batch operator's canonical rule), every later
    occurrence in that batch and in all later batches verdicts
    is_keeper=false. Paragraphs whose normalized form is EMPTY carry no
    content and are never deduped (always keepers, no state) — mirroring
    the batch operator exactly. Reassembling cleaned documents is a tiny
    narrow per-micro-batch fold downstream (filter is_keeper, groupBy
    doc, concat in idx order) — done batch-side in foreachBatch like
    ``neardup_keepers``, for the same watermark reason.

    Arrival-order caveat (same as ``stream_dedup_exact``): when arrival
    order differs from (doc, idx) order, WHICH occurrence survives
    changes, but every normalized form still keeps exactly one occurrence
    while its state lives. ``state_ttl_seconds`` bounds state exactly as
    in ``stream_dedup_exact``."""

    def verdicts(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (para_hash,) = key
        if state.hasTimedOut:
            state.remove()
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        if bool(batch["_empty"].iloc[0]):
            # empty-normalized group: every occurrence is content-free and
            # kept; no state, no TTL
            yield pd.DataFrame(
                {
                    "doc_id": batch["_id"].astype("int64"),
                    "para_idx": batch["_idx"].astype("int64"),
                    "para_hash": int(para_hash),
                    "is_keeper": True,
                    "para": batch["_p"],
                }
            )
            return
        batch = batch.sort_values(["_id", "_idx"], ignore_index=True)
        if state.exists:
            keep_mask = [False] * len(batch)
        else:
            state.update((int(batch["_id"].iloc[0]), int(batch["_idx"].iloc[0])))
            keep_mask = [True] + [False] * (len(batch) - 1)
        if state_ttl_seconds:
            state.setTimeoutDuration(state_ttl_seconds * 1000)
        yield pd.DataFrame(
            {
                "doc_id": batch["_id"].astype("int64"),
                "para_idx": batch["_idx"].astype("int64"),
                "para_hash": int(para_hash),
                "is_keeper": keep_mask,
                "para": batch["_p"],
            }
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_seconds
        else GroupStateTimeout.NoTimeout
    )
    paras = (
        stream_df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.expr(f"split(`{text_col}`, '\\n{{2,}}')")).alias(
                "_idx", "_p"
            ),
        )
        .withColumn(
            "_np", F.expr("trim(regexp_replace(lower(_p), '[^a-z0-9]+', ' '))")
        )
        .withColumn("_empty", F.col("_np") == "")
        .withColumn("_h", F.expr(h60("_np", SPARK)))
    )
    return paras.groupBy("_h").applyInPandasWithState(
        verdicts,
        outputStructType=_PARA_SCHEMA,
        stateStructType=_PARA_STATE,
        outputMode="append",
        timeoutConf=timeout,
    )


_VERDICT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("band_id", LongType()),
        StructField("bucket_hit", BooleanType()),
    ]
)
_BUCKET_STATE = StructType([StructField("keeper_id", LongType())])


def stream_neardup_band_verdicts(
    stream_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    state_ttl_seconds: int = 0,
    carry_col: str | None = None,
) -> DataFrame:
    """Incremental MinHash-LSH near-dup detection across micro-batches:
    the streaming face of ``operators/dedup.py``'s candidate generation
    (minhash_signatures → lsh_band_buckets → band-bucket equi-join).

    Signatures are the SAME map-only fold expression the batch operator
    uses (one md5 per shingle, ``num_hashes`` running minima — zero
    shuffle), so stream and batch bucket identically. State lives per
    (band_id, band_hash) BUCKET — the exact keys the batch equi-join
    shuffles on — and is O(1) per bucket: the first doc ever to touch the
    bucket (earliest batch; smallest id within that batch). Every doc
    claims its buckets whether or not it survives, mirroring the batch
    candidate join (pairs form between any two docs sharing a bucket,
    keeper status plays no part), so stream verdicts replay the batch
    pair set exactly under arrival order = id order.

    Emits one verdict row per (doc, band): ``bucket_hit`` is true iff the
    bucket was already claimed by a strictly earlier doc. A doc is a
    near-duplicate iff ANY of its bands hit (the LSH OR-rule) — that
    per-doc fold is ``neardup_keepers``, run batch-side in a
    ``foreachBatch`` sink: an append-mode aggregation downstream of a
    stateful operator needs an event-time watermark these verdicts don't
    carry, and the fold is a tiny narrow groupBy over the micro-batch's
    own rows.

    ``state_ttl_seconds`` bounds state for unbounded corpora exactly as in
    ``stream_dedup_exact`` (quiet buckets expire and re-admit). At 100 TB
    the state store holds one long per OCCUPIED bucket — bands × distinct
    near-dup clusters, not rows.

    NULL/empty-text rows produce an EMPTY shingle array, whose minhash
    fold yields the sentinel-maxima signature — they all share one bucket
    (non-null band hashes) and dedupe to a single keeper, exactly like the
    batch equi-join pairs them. A short-but-nonempty text still yields one
    whole-text shingle and buckets normally.

    OUT-OF-ORDER arrival invariant: when arrival order differs from id
    order, WHICH doc survives changes (first arrival wins, smallest id
    within a micro-batch), but for any cluster whose members pairwise
    share at least one band bucket (near-identical docs — the common
    boilerplate case — always do), EXACTLY ONE member survives under
    every arrival order: each later arrival shares a bucket with the
    first arrival, and that bucket is already claimed. Chain-shaped
    clusters (A~C~B with A,B unrelated) can keep both endpoints under
    orders that admit A and B before C — the same docs a batch pass
    whose canonical-per-cluster policy collapses; streaming first-arrival
    trades that collapse for O(1)-per-bucket state. Tested by
    tests/test_streaming.py::test_stream_neardup_out_of_order_one_survivor_per_clique.
    """
    rows_per_band = num_hashes // bands
    carry = carry_col is not None

    def verdicts(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        band_id, _bh = key
        batch = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            hits = [True] * len(batch)
        else:
            first = int(batch["_id"].min())
            state.update((first,))
            hits = (batch["_id"] != first).tolist()
        if state_ttl_seconds:
            state.setTimeoutDuration(state_ttl_seconds * 1000)
        out = {
            "doc_id": batch["_id"].to_numpy(),
            "band_id": int(band_id),
            "bucket_hit": hits,
        }
        if carry:
            out["payload"] = batch["_payload"]
        yield pd.DataFrame(out)

    from pgvectorscale_spark.functions.hashing import tokens, word_shingles

    toks = tokens(text_col, SPARK)
    carry_sel = [F.col(carry_col).alias("_carry")] if carry else []
    sig = stream_df.select(
        F.col(id_col).alias("_id"),
        F.expr(word_shingles(toks, shingle_n, SPARK)).alias("_shingles"),
        *carry_sel,
    ).select(
        "_id",
        F.expr(minhash_signature_expr("_shingles", num_hashes)).alias("signature"),
        *(["_carry"] if carry else []),
    )
    hash_arr = F.array(
        *[F.expr(band_hash("signature", b, rows_per_band, SPARK)) for b in range(bands)]
    )
    # band hashes are never NULL (empty shingle arrays fold to sentinel
    # maxima), but a defensive filter keeps a future hash-expr change from
    # crashing the state function on a null key.
    # carry_col rides along on band 0's rows ONLY (null elsewhere), so the
    # payload crosses the bucket shuffle exactly once per doc, not bands x
    buckets = sig.select(
        "_id",
        F.posexplode(hash_arr).alias("_band", "_bh"),
        *(["_carry"] if carry else []),
    ).filter(F.col("_bh").isNotNull())
    if carry:
        buckets = buckets.select(
            "_id", "_band", "_bh",
            F.when(F.col("_band") == 0, F.col("_carry")).alias("_payload"),
        )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_seconds
        else GroupStateTimeout.NoTimeout
    )
    out_schema = _VERDICT_SCHEMA
    if carry:
        out_schema = StructType(_VERDICT_SCHEMA.fields + [StructField("payload", StringType())])
    return buckets.groupBy("_band", "_bh").applyInPandasWithState(
        verdicts,
        outputStructType=out_schema,
        stateStructType=_BUCKET_STATE,
        outputMode="append",
        timeoutConf=timeout,
    )


def neardup_keepers(
    batch_df: DataFrame, verdicts_df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """The per-doc LSH OR-fold over ``stream_neardup_band_verdicts`` rows:
    a doc survives iff NONE of its bands hit an earlier-claimed bucket.
    Both inputs are one micro-batch's rows (use inside ``foreachBatch``).
    Narrow anti-join: O(batch), no corpus IO; a doc absent from the
    verdicts (defensively possible, not produced today) is a keeper."""
    dup_ids = (
        verdicts_df.filter(F.col("bucket_hit"))
        .select(F.col("doc_id").alias(id_col))
        .distinct()
    )
    return batch_df.join(dup_ids, id_col, "left_anti")


def stream_dedup_neardup(
    stream_df: DataFrame,
    sink,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    state_ttl_seconds: int = 0,
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
):
    """End-to-end streaming near-dup dedup: emit each micro-batch's KEEPER
    rows (id, text) to ``sink(keepers_df, batch_id)`` — docs none of whose
    LSH band buckets were claimed by an earlier arrival. Composition of
    ``stream_neardup_band_verdicts`` (bucket-state op; the text payload
    rides band 0's rows so it crosses the bucket shuffle once per doc) and
    the per-doc OR-fold, run inside ``foreachBatch`` because an
    append-mode aggregation downstream of a stateful operator needs an
    event-time watermark these verdicts don't carry. Returns the started
    StreamingQuery."""
    verdicts = stream_neardup_band_verdicts(
        stream_df,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
        state_ttl_seconds=state_ttl_seconds,
        carry_col=text_col,
    )

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        keepers = (
            batch_df.groupBy("doc_id")
            .agg(
                F.max("bucket_hit").alias("_dup"),
                F.first("payload", ignorenulls=True).alias(text_col),
            )
            .filter(~F.col("_dup"))
            .select(F.col("doc_id").alias(id_col), text_col)
        )
        sink(keepers, batch_id)

    # the stateful verdict op is declared in append mode; the writer must
    # match (foreachBatch itself is mode-agnostic)
    writer = verdicts.writeStream.foreachBatch(_fold).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
