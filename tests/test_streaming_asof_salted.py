"""Salted streaming as-of enrichment (round 13): state keyed by
(key, time chunk) with tolerance-bounded right replication — a hot key
fans out across chunk groups. Under in-order arrival the output must be
IDENTICAL to the unsalted operator; the one documented divergence (a
late left recovering an older in-tolerance right) is pinned as such."""
from __future__ import annotations

import numpy as np
import pytest

from pgvectorscale_spark.streaming.asof import (
    stream_as_of_join,
    stream_as_of_join_salted,
)

SCHEMA = "key long, ts long, is_right boolean, rid long"


def _run(spark, tmpdir, fn, name, batches, **kwargs):
    path = str(tmpdir.join(f"in_{name}"))
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        if i < len(batches) - 1:
            # separate parquet files; maxFilesPerTrigger drives batch order
            pass
    stream = spark.readStream.schema(
        spark.createDataFrame([], SCHEMA).schema
    ).option("maxFilesPerTrigger", 1).parquet(path)
    out = fn(
        stream, on="key", ts_col="ts", is_right_col="is_right",
        right_id_col="rid", **kwargs,
    )
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmpdir.join(f"ckpt_{name}")))
        .start()
    )
    q.awaitTermination(120)
    return {
        (r["key"], r["ts"]): (r["matched_ts"], r["matched_id"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def _hot_key_rows(n_hot=400, seed=11):
    """One pathological hot key carrying almost every row (interleaved
    rights and lefts, ties included) plus two cold keys."""
    rng = np.random.default_rng(seed)
    rows = []
    ts = 0
    for i in range(n_hot):
        ts += int(rng.integers(0, 40))
        if rng.random() < 0.4:
            rows.append((7, ts, True, int(rng.integers(1, 5)) * 100 + i))
            if rng.random() < 0.3:  # right-timestamp tie
                rows.append((7, ts, True, int(rng.integers(1, 5)) * 100 + i + 1))
        else:
            rows.append((7, ts, False, 0))
    rows += [(1, 50, True, 3), (1, 60, False, 0), (2, 10, False, 0)]
    return rows


@pytest.mark.parametrize("tolerance,chunk_width", [(100, None), (100, 37), (0, None)])
def test_salted_equals_unsalted_single_batch(spark, tmpdir, tolerance, chunk_width):
    rows = _hot_key_rows()
    kwargs = {"tolerance": tolerance}
    skw = dict(kwargs)
    if chunk_width is not None:
        skw["chunk_width"] = chunk_width
    name = f"t{tolerance}_{chunk_width}"
    base = _run(spark, tmpdir, stream_as_of_join, f"asofu_{name}", [rows], **kwargs)
    salt = _run(
        spark, tmpdir, stream_as_of_join_salted, f"asofs_{name}", [rows], **skw
    )
    assert salt == base
    # the random fixture can draw duplicate (key, ts) lefts; the output
    # map collapses them (same match either way), so compare distinct
    assert len(base) == len({(r[0], r[1]) for r in rows if not r[2]})


def test_salted_carry_across_batches_in_order(spark, tmpdir):
    """A right in batch 1 matches lefts in batch 2 (in event-time order):
    the replicated copies carry the state across micro-batches exactly
    like the unsalted two-long state."""
    b1 = [(7, 100, True, 9), (7, 120, False, 0)]
    b2 = [(7, 130, False, 0), (7, 260, False, 0)]  # 260: age 160 > tol
    base = _run(
        spark, tmpdir, stream_as_of_join, "asofu_carry", [b1, b2], tolerance=150
    )
    salt = _run(
        spark, tmpdir, stream_as_of_join_salted, "asofs_carry", [b1, b2],
        tolerance=150, chunk_width=50,
    )
    assert salt == base
    assert base[(7, 130)] == (100, 9)
    assert base[(7, 260)] == (None, None)


def test_salted_late_left_documented_divergence(spark, tmpdir):
    """The pinned divergence: after a NEWER right replaces the unsalted
    state, a late left can no longer match the older right there — but
    the salted form's chunk group still holds it (strictly more
    matches, never fewer)."""
    b1 = [(7, 100, True, 1), (7, 900, True, 2)]
    b2 = [(7, 150, False, 0)]  # late left; old right 100 is in tolerance
    base = _run(
        spark, tmpdir, stream_as_of_join, "asofu_late", [b1, b2], tolerance=100
    )
    salt = _run(
        spark, tmpdir, stream_as_of_join_salted, "asofs_late", [b1, b2],
        tolerance=100, chunk_width=100,
    )
    assert base[(7, 150)] == (None, None)  # anti-causal rule on the new best
    assert salt[(7, 150)] == (100, 1)  # chunk group retained the old right


def test_salted_requires_tolerance():
    with pytest.raises(ValueError, match="tolerance"):
        stream_as_of_join_salted(
            None, on="k", ts_col="t", is_right_col="r", right_id_col="i",
            tolerance=None,
        )
    with pytest.raises(ValueError, match="chunk_width"):
        stream_as_of_join_salted(
            None, on="k", ts_col="t", is_right_col="r", right_id_col="i",
            tolerance=10, chunk_width=0,
        )
