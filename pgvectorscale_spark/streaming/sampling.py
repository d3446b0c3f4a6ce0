"""Streaming stratified reservoir: exact-size per-stratum samples over an
unbounded stream with O(n) state per stratum.

The streaming face of ``operators/curation.py``'s ``stratified_sample``.
The batch operator keeps the ``n`` smallest ``(md5(salt:id), id)`` keys per
stratum; that selection rule is an associative, commutative merge (the
top-n of a union is the top-n of per-part top-ns), so a stream can
maintain it incrementally with BOUNDED state — exactly ``n`` (key, id)
pairs per stratum — and the result after any prefix of the stream equals
the batch operator over the same rows, for EVERY arrival order and every
micro-batch slicing. That is a far stronger guarantee than classic
random-reservoir sampling (whose contents depend on arrival order and an
RNG): replaying the stream, reordering its files, or re-batching it
cannot change the sample.

Scale shape: rows shuffle once per micro-batch, keyed by stratum — the
per-task volume is bounded by the micro-batch size (not the corpus), and
the state store holds ``n`` ids per stratum regardless of stream length.
A pathologically hot stratum concentrates its micro-batch rows on one
task; at 100 TB/day ingest rates, bound the micro-batch (trigger
interval / maxFilesPerTrigger) rather than the operator — the state
merge is O(batch + n) per stratum either way.

Emission contract (update mode): whenever a micro-batch CHANGES a
stratum's sample, the full current sample is emitted with a bumped
``version``; consumers take each stratum's max-version rows (the memory/
append sinks accumulate superseded versions by design).

No reference analog (pgvectorscale stores vectors, not corpora); this
serves the training-data-pipeline brief alongside streaming/dedup.py.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["stream_stratified_sample"]

_OUT_SCHEMA = StructType(
    [
        StructField("stratum", StringType()),
        StructField("doc_id", LongType()),
        StructField("sample_rank", LongType()),
        StructField("version", LongType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("keys", ArrayType(StringType())),
        StructField("ids", ArrayType(LongType())),
        StructField("version", LongType()),
    ]
)


def stream_stratified_sample(
    stream_df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Maintain the ``n_per_stratum`` smallest ``(md5(salt:id), id)`` rows
    per stratum across micro-batches (module docstring for the contract).
    Output rows: (stratum, doc_id, sample_rank, version) — each changed
    stratum re-emits its full current sample with version bumped.  The
    max-version rows per stratum equal ``curation.stratified_sample`` over
    every row seen so far (pytest-verified parity; arrival-order and
    re-batching invariant by construction)."""
    if n_per_stratum <= 0:
        raise ValueError(f"n_per_stratum must be positive, got {n_per_stratum}")
    n = int(n_per_stratum)

    def sampler(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (stratum,) = key
        if state.hasTimedOut:  # pragma: no cover — NoTimeout configured
            state.remove()
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            keys, ids, version = state.get
            cur = [(str(k), int(i)) for k, i in zip(keys, ids)]
        else:
            cur, version = [], 0
        merged = cur + [
            (str(k), int(i)) for k, i in zip(batch["_key"], batch["_id"])
        ]
        merged.sort()
        top, seen = [], set()
        for k2, i2 in merged:
            if i2 in seen:  # an id re-arriving (replay) must not duplicate
                continue
            seen.add(i2)
            top.append((k2, i2))
            if len(top) == n:
                break
        if top != cur:
            version += 1
            state.update(([k for k, _ in top], [i for _, i in top], int(version)))
            yield pd.DataFrame(
                {
                    "stratum": [stratum] * len(top),
                    "doc_id": [i for _, i in top],
                    "sample_rank": list(range(1, len(top) + 1)),
                    "version": [int(version)] * len(top),
                }
            )

    salt_lit = str(salt).replace("\\", "\\\\").replace("'", "''")
    keyed = stream_df.select(
        F.col(strata_col).cast("string").alias("_stratum"),
        F.col(id_col).cast("long").alias("_id"),
        F.expr(f"md5(concat('{salt_lit}:', cast(`{id_col}` as string)))").alias(
            "_key"
        ),
    )
    return keyed.groupBy("_stratum").applyInPandasWithState(
        sampler,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
