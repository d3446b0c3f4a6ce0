"""Streaming backward as-of enrichment: the streaming face of
``operators/relational.as_of_join``.

A serving/ingest pipeline wants each arriving LEFT event (a click, an
order, a sensor reading) enriched with the latest preceding RIGHT event
of the same key (the last view, the last state snapshot) — without
re-joining history per micro-batch. ``applyInPandasWithState`` keeps
exactly the state the batch operator's window carries implicitly: the
best (timestamp, tiebreak) right row seen so far per key, TWO longs.

Semantics match the batch operator under in-order arrival (the same
caveat family as ``stream_dedup_exact``): within a micro-batch, rows
are processed in the batch operator's exact order — (ts, right-before-
left at equal ts, tiebreak ascending) — so at-or-before is inclusive
and right-timestamp ties resolve to the largest tiebreak; across
batches, a right row arriving AFTER a left row it precedes in event
time cannot retroactively re-match it (streams don't reopen emitted
rows — that is what the batch operator is for).

At 100 TB the state store holds two longs per ACTIVE key — the working
set is the live-key count, not the stream length; ``state_ttl_seconds``
expires idle keys.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

__all__ = ["stream_as_of_join", "stream_as_of_join_salted"]

_STATE_SCHEMA = StructType(
    [StructField("rts", LongType()), StructField("rid", LongType())]
)
_OUT_FIELDS = ["key", "ts", "matched_ts", "matched_id"]
_OUT_SCHEMA = StructType([StructField(c, LongType()) for c in _OUT_FIELDS])


def _make_enrich(tolerance: int | None, state_ttl_seconds: int):
    """The shared per-group state kernel: replay the group's micro-batch
    rows in the batch operator's exact order, maintain the best
    (timestamp, tiebreak) right row, emit one output row per left. Used
    by both group shapes — per key (``stream_as_of_join``) and per
    (key, time chunk) (``stream_as_of_join_salted``); ``key[0]`` is the
    join key in both."""

    def enrich(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        # the batch operator's exact order: ts, right before left at
        # equal ts, tiebreak ascending (left rows carry tiebreak 0)
        batch["_side"] = (~batch["_r"]).astype("int64")
        batch["_tb"] = batch["_rid"].where(batch["_r"], 0).astype("int64")
        batch = batch.sort_values(["_ts", "_side", "_tb"], kind="mergesort")
        best = state.get if state.exists else None  # (rts, rid)
        rows = []
        for ts, is_right, rid in zip(batch["_ts"], batch["_r"], batch["_tb"]):
            ts = int(ts)
            if is_right:
                cand = (ts, int(rid))
                if best is None or cand > best:
                    best = cand
            else:
                m = best
                if m is not None and m[0] > ts:
                    # stored right is NEWER than this (late) left row —
                    # never match anti-causally; what a late left loses
                    # is only rights that arrived after it
                    m = None
                if m is not None and tolerance is not None and ts - m[0] > tolerance:
                    m = None
                rows.append(
                    (key[0], ts, None if m is None else m[0], None if m is None else m[1])
                )
        if best is not None:
            state.update(best)
            if state_ttl_seconds > 0:
                state.setTimeoutDuration(state_ttl_seconds * 1000)
        yield pd.DataFrame(rows, columns=_OUT_FIELDS)

    return enrich


def stream_as_of_join(
    stream_df: DataFrame,
    on: str,
    ts_col: str,
    is_right_col: str,
    right_id_col: str,
    tolerance: int | None = None,
    state_ttl_seconds: int = 0,
) -> DataFrame:
    """One output row per LEFT row: (key, ts, matched_ts, matched_id),
    the matched columns NULL when no right row at-or-before exists (or
    the best one is older than ``tolerance``).

    ``stream_df`` carries both sides: ``is_right_col`` (boolean) marks
    right rows, ``right_id_col`` their tiebreak id (ignored on left
    rows). All of ``on``/``ts_col``/``right_id_col`` must be integral."""
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"tolerance must be non-negative, got {tolerance}")
    enrich = _make_enrich(tolerance, state_ttl_seconds)

    # defensive nulls: a row with no key, timestamp, or side cannot be
    # placed in the order and is DROPPED (a single malformed event must
    # not poison the query — pandas would raise on NaN casts below);
    # a right row with a NULL tiebreak id degrades to tiebreak 0
    prepared = stream_df.selectExpr(
        f"cast(`{on}` as long) as _k",
        f"cast(`{ts_col}` as long) as _ts",
        f"cast(`{is_right_col}` as boolean) as _r",
        f"coalesce(cast(`{right_id_col}` as long), 0) as _rid",
    ).filter("_k IS NOT NULL AND _ts IS NOT NULL AND _r IS NOT NULL")
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_seconds > 0
        else GroupStateTimeout.NoTimeout
    )
    return prepared.groupBy("_k").applyInPandasWithState(
        enrich, _OUT_SCHEMA, _STATE_SCHEMA, "append", timeout
    )


def stream_as_of_join_salted(
    stream_df: DataFrame,
    on: str,
    ts_col: str,
    is_right_col: str,
    right_id_col: str,
    tolerance: int,
    chunk_width: int | None = None,
    state_ttl_seconds: int = 0,
) -> DataFrame:
    """Skew-robust twin of :func:`stream_as_of_join`: state is keyed by
    (key, TIME CHUNK), so a hot key's events fan out across chunk groups
    instead of serializing through one state partition — the streaming
    mirror of ``relational.as_of_join_salted``'s phase-1 salt.

    The carry the batch twin computes in its phase-2 window becomes
    right-row REPLICATION here: a right row at ``ts`` can only match
    lefts in ``[ts, ts + tolerance]``, so it is cloned into every chunk
    that window touches (``tolerance/chunk_width + 1`` copies; default
    ``chunk_width = tolerance`` keeps that at 2). ``tolerance`` is
    therefore REQUIRED — an unbounded carry would need unbounded
    replication, and the stateful-operator chain a windowed carry would
    take is not composable in Structured Streaming. Each LEFT row lands
    in exactly one group, so no duplicate outputs.

    Parity: under in-order arrival, output-identical to the unsalted
    operator at the same tolerance (pytest-pinned on the hot-key
    fixture). One documented divergence, in the salted form's favor: a
    LATE left can still match an older in-tolerance right here (its
    chunk group retains that right), where the unsalted two-long state
    has already replaced it with a newer right and must emit NULL.

    State: two longs per (key, ACTIVE chunk) — bounded by live time
    span, not event rate; idle chunks expire via ``state_ttl_seconds``
    exactly like idle keys in the unsalted form."""
    if tolerance is None or tolerance < 0:
        raise ValueError(
            f"salted streaming as-of requires a non-negative tolerance, got {tolerance}"
        )
    if chunk_width is not None and chunk_width <= 0:
        raise ValueError(f"chunk_width must be positive, got {chunk_width}")
    width = int(chunk_width) if chunk_width is not None else max(int(tolerance), 1)
    enrich = _make_enrich(tolerance, state_ttl_seconds)
    prepared = stream_df.selectExpr(
        f"cast(`{on}` as long) as _k",
        f"cast(`{ts_col}` as long) as _ts",
        f"cast(`{is_right_col}` as boolean) as _r",
        f"coalesce(cast(`{right_id_col}` as long), 0) as _rid",
    ).filter("_k IS NOT NULL AND _ts IS NOT NULL AND _r IS NOT NULL")
    # rights replicate across their reach window's chunks; lefts go to
    # exactly their own chunk (same floor-division chunking as the batch
    # salted join)
    replicated = prepared.selectExpr(
        "_k",
        "_ts",
        "_r",
        "_rid",
        f"explode(sequence(cast(floor(_ts / {width}) as long), "
        f"CASE WHEN _r THEN cast(floor((_ts + {int(tolerance)}) / {width}) as long) "
        f"ELSE cast(floor(_ts / {width}) as long) END)) as _chunk",
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_seconds > 0
        else GroupStateTimeout.NoTimeout
    )
    return replicated.groupBy("_k", "_chunk").applyInPandasWithState(
        enrich, _OUT_SCHEMA, _STATE_SCHEMA, "append", timeout
    )
