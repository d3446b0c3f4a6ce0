"""Incremental hourly rollup (relational.merge_hourly_rollup): the
continuous-aggregate identity — folding batch merges equals the
one-shot aggregate — plus the watermark late-data policy."""
from __future__ import annotations

from pyspark.sql import functions as F

from pgvectorscale_spark.operators.relational import (
    empty_hourly_rollup,
    events_hourly,
    merge_hourly_rollup,
)
from pgvectorscale_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _as_set(df):
    return {
        (r["event_type"], r["hour_epoch"], r["event_count"], r["value_cents"])
        for r in df.collect()
    }


def test_fold_equals_one_shot_for_any_split(spark):
    events = load_table(spark, "events", SF_DIR)
    full = _as_set(events_hourly(events))
    for n_batches, key in ((2, "event_id % 2"), (4, "user_id % 4")):
        state = empty_hourly_rollup(spark)
        for i in range(n_batches):
            state = merge_hourly_rollup(state, events.filter(f"{key} = {i}"))
        assert _as_set(state) == full, (n_batches, key)


def test_merge_into_empty_is_identity(spark):
    events = load_table(spark, "events", SF_DIR)
    merged = merge_hourly_rollup(empty_hourly_rollup(spark), events)
    assert _as_set(merged) == _as_set(events_hourly(events))


def test_watermark_drops_late_buckets(spark):
    events = load_table(spark, "events", SF_DIR)
    full = events_hourly(events)
    hours = sorted(r["hour_epoch"] for r in full.select("hour_epoch").distinct().collect())
    cut = hours[len(hours) // 2]
    state = merge_hourly_rollup(
        empty_hourly_rollup(spark), events, min_hour_epoch=cut
    )
    got_hours = {r["hour_epoch"] for r in state.select("hour_epoch").distinct().collect()}
    assert got_hours == {h for h in hours if h >= cut}
    # buckets past the watermark are untouched relative to the full agg
    assert _as_set(state) == {
        t for t in _as_set(full) if t[1] >= cut
    }


def test_merge_moves_rollup_sized_rows(spark):
    """The batch is pre-aggregated before it meets the state: the merge
    join's inputs are both HashAggregate outputs (no event-sized side)."""
    events = load_table(spark, "events", SF_DIR)
    plan = (
        merge_hourly_rollup(events_hourly(events), events)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_count" in plan  # map-side combine on the delta
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan
