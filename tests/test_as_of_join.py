"""Backward as-of join (relational.as_of_join): the window-union
formulation against a pure-python per-row argmax, plus the semantics
corners — inclusive boundary, right-timestamp ties, tolerance, and
no-match."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgvectorscale_spark.operators.relational import as_of_join


def _py_asof(left, right, tolerance=None):
    """left = [(key, ts)], right = [(key, ts, rid)] -> {(key, lts): (rts, rid) | None}"""
    out = {}
    for k, lts in left:
        cands = [
            (rts, rid)
            for rk, rts, rid in right
            if rk == k
            and rts <= lts
            and (tolerance is None or lts - rts <= tolerance)
        ]
        out[(k, lts)] = max(cands) if cands else None
    return out


@pytest.fixture(scope="module")
def frames(spark):
    left = [(1, 100), (1, 205), (1, 300), (2, 50), (3, 10)]
    right = [
        (1, 100, 7),   # equal timestamp: at-or-before is INCLUSIVE
        (1, 200, 8),
        (1, 200, 9),   # tie on ts: largest rid wins
        (1, 290, 10),
        (2, 400, 11),  # only AFTER the left row: no match
    ]
    ldf = spark.createDataFrame(left, "user_id long, ts long")
    rdf = spark.createDataFrame(right, "user_id long, ts long, rid long")
    return left, right, ldf, rdf


def _collect(df):
    return {
        (r["user_id"], r["ts"]): (
            None
            if r["ts_matched"] is None
            else (r["ts_matched"], r["rid_matched"])
        )
        for r in df.collect()
    }


def test_matches_python_reference(spark, frames):
    left, right, ldf, rdf = frames
    got = _collect(
        as_of_join(ldf, rdf, on="user_id", right_tiebreak="rid")
    )
    assert got == _py_asof(left, right)
    # spot the semantics: inclusive boundary, tie to largest rid, no match
    assert got[(1, 100)] == (100, 7)
    assert got[(1, 205)] == (200, 9)
    assert got[(1, 290 + 10)] == (290, 10)
    assert got[(2, 50)] is None
    assert got[(3, 10)] is None


def test_tolerance_nulls_stale_matches(spark, frames):
    left, right, ldf, rdf = frames
    got = _collect(
        as_of_join(ldf, rdf, on="user_id", right_tiebreak="rid", tolerance=5)
    )
    assert got == _py_asof(left, right, tolerance=5)
    assert got[(1, 100)] == (100, 7)  # age 0 <= 5
    assert got[(1, 205)] == (200, 9)  # age 5 <= 5 (inclusive)
    assert got[(1, 300)] is None  # best match is age 10 > 5


def test_left_columns_pass_through_and_determinism(spark, frames):
    _, _, ldf, rdf = frames
    ldf2 = ldf.withColumn("tag", F.concat(F.lit("u"), F.col("user_id")))
    out = as_of_join(ldf2.repartition(5), rdf.repartition(3), on="user_id", right_tiebreak="rid")
    rows = {(r["user_id"], r["ts"]): r["tag"] for r in out.collect()}
    assert rows[(1, 100)] == "u1" and rows[(3, 10)] == "u3"
    assert out.count() == ldf.count()  # exactly one output row per left row


def test_single_shuffle_no_join_blowup(spark, frames):
    """The plan is ONE hash partitioning on the key + a window — no
    SortMergeJoin/Cartesian, so key skew cannot quadratic."""
    _, _, ldf, rdf = frames
    p = as_of_join(ldf, rdf, on="user_id", right_tiebreak="rid")._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert p.count("Exchange hashpartitioning") == 1


def test_validation(spark, frames):
    _, _, ldf, rdf = frames
    with pytest.raises(ValueError, match="tolerance"):
        as_of_join(ldf, rdf, on="user_id", tolerance=-1)


# --- range_join (same fixture style) ---------------------------------


def _py_range(left, right, lower, upper):
    return sorted(
        (k, lts, rts, rid)
        for k, lts in left
        for rk, rts, rid in right
        if rk == k and lower <= rts - lts <= upper
    )


def test_range_join_matches_python_reference(spark):
    import random

    from pgvectorscale_spark.operators.relational import range_join

    rng = random.Random(11)
    left = [(rng.randint(1, 3), rng.randint(0, 500)) for _ in range(40)]
    right = [
        (rng.randint(1, 3), rng.randint(0, 500), i) for i in range(60)
    ]
    ldf = spark.createDataFrame(left, "user_id long, ts long")
    rdf = spark.createDataFrame(right, "user_id long, ts long, rid long")
    for lower, upper in ((-50, 50), (0, 99), (-100, 0), (7, 7)):
        got = sorted(
            (r["user_id"], r["ts"], r["ts_matched"], r["rid_matched"])
            for r in range_join(
                ldf, rdf, on="user_id", lower=lower, upper=upper
            ).collect()
        )
        assert got == _py_range(left, right, lower, upper), (lower, upper)


def test_range_join_bucket_boundaries_and_uniqueness(spark):
    """Pairs exactly at the window bounds are included, pairs one past
    are not, and a pair whose left window straddles two buckets is
    emitted exactly once."""
    from pgvectorscale_spark.operators.relational import range_join

    # width = 21; bucket edges at multiples of 21: ts 20 and 21 straddle
    left = [(1, 20)]
    right = [(1, 10, 1), (1, 21, 2), (1, 30, 3), (1, 31, 4), (1, 9, 5)]
    ldf = spark.createDataFrame(left, "user_id long, ts long")
    rdf = spark.createDataFrame(right, "user_id long, ts long, rid long")
    got = sorted(
        (r["rid_matched"])
        for r in range_join(ldf, rdf, on="user_id", lower=-10, upper=10).collect()
    )
    assert got == [1, 2, 3]  # 9 is one below, 31 one above; no duplicates


def test_range_join_validation(spark):
    from pgvectorscale_spark.operators.relational import range_join

    with pytest.raises(ValueError, match="upper"):
        range_join(None, None, on="x", lower=5, upper=4)


def _py_asof_fwd(left, right, tolerance=None):
    """Forward reference: smallest (rts, rid) at-or-after the left ts."""
    out = {}
    for k, lts in left:
        cands = [
            (rts, rid)
            for rk, rts, rid in right
            if rk == k
            and rts >= lts
            and (tolerance is None or rts - lts <= tolerance)
        ]
        out[(k, lts)] = min(cands) if cands else None
    return out


def test_forward_direction_matches_python_reference(spark, frames):
    left, right, ldf, rdf = frames
    for tol in (None, 90):
        got = _collect(
            as_of_join(
                ldf, rdf, on="user_id", right_tiebreak="rid",
                tolerance=tol, direction="forward",
            )
        )
        assert got == _py_asof_fwd(left, right, tolerance=tol), tol
    got = _collect(
        as_of_join(ldf, rdf, on="user_id", right_tiebreak="rid", direction="forward")
    )
    assert got[(1, 100)] == (100, 7)   # inclusive at equal ts
    assert got[(1, 205)] == (290, 10)  # next at-or-after
    assert got[(2, 50)] == (400, 11)   # forward finds what backward missed
    # forward tie at equal right ts takes the SMALLEST rid
    got2 = _collect(
        as_of_join(
            ldf.filter("ts = 100"),
            rdf.filter("ts = 200"),
            on="user_id", right_tiebreak="rid", direction="forward",
        )
    )
    assert got2[(1, 100)] == (200, 8)


def test_direction_validation(spark, frames):
    _, _, ldf, rdf = frames
    with pytest.raises(ValueError, match="direction"):
        as_of_join(ldf, rdf, on="user_id", direction="nearest")


# --- as_of_join_salted (skew-robust twin) -----------------------------


def test_salted_parity_on_hot_key_fixture(spark):
    """A pathological hot key (one user carrying ~90% of both sides,
    spanning many chunks) plus cold keys, chunk boundaries landing
    between and exactly on timestamps: the salted twin must equal the
    plain operator row-for-row in both directions, with and without
    tolerance, at several chunk widths."""
    import random

    from pgvectorscale_spark.operators.relational import as_of_join_salted

    rng = random.Random(7)
    left = [(1, rng.randint(0, 10_000)) for _ in range(400)]
    left += [(k, rng.randint(0, 10_000)) for k in (2, 3) for _ in range(20)]
    right = [(1, rng.randint(0, 10_000), i) for i in range(350)]
    right += [(k, rng.randint(0, 10_000), 1000 + i) for i, k in enumerate((2, 2, 3))]
    # collisions: right rows AT chunk edges and equal-ts ties
    right += [(1, 1000, 2000), (1, 1000, 2001), (1, 2000, 2002)]
    left += [(1, 1000), (1, 2000), (1, 999), (1, 2001)]
    ldf = spark.createDataFrame(left, "user_id long, ts long").repartition(7)
    rdf = spark.createDataFrame(right, "user_id long, ts long, rid long").repartition(5)
    for direction in ("backward", "forward"):
        for tol in (None, 500):
            base = _collect(
                as_of_join(
                    ldf, rdf, on="user_id", right_tiebreak="rid",
                    tolerance=tol, direction=direction,
                )
            )
            for chunk in (250, 1000, 10**9):
                got = _collect(
                    as_of_join_salted(
                        ldf, rdf, on="user_id", right_tiebreak="rid",
                        tolerance=tol, direction=direction,
                        chunk_seconds=chunk,
                    )
                )
                assert got == base, (direction, tol, chunk)


def test_salted_cross_chunk_carry_semantics(spark):
    """Chunk-boundary corners, hand-checked: a left row whose match sits
    several EMPTY chunks back (the carry window must skip right-less
    chunks), a right row exactly on a boundary, and a left row in a
    chunk with no right rows at all."""
    from pgvectorscale_spark.operators.relational import as_of_join_salted

    left = [(1, 100), (1, 9_950), (1, 10_000), (2, 5)]
    right = [(1, 90, 1), (1, 10_000, 2)]
    ldf = spark.createDataFrame(left, "user_id long, ts long")
    rdf = spark.createDataFrame(right, "user_id long, ts long, rid long")
    got = _collect(
        as_of_join_salted(
            ldf, rdf, on="user_id", right_tiebreak="rid", chunk_seconds=1000
        )
    )
    assert got[(1, 100)] == (90, 1)        # within-chunk
    assert got[(1, 9_950)] == (90, 1)      # carried over 8 empty chunks
    assert got[(1, 10_000)] == (10_000, 2) # boundary row matches itself
    assert got[(2, 5)] is None             # key with no right rows
    fwd = _collect(
        as_of_join_salted(
            ldf, rdf, on="user_id", right_tiebreak="rid",
            chunk_seconds=1000, direction="forward",
        )
    )
    assert fwd[(1, 100)] == (10_000, 2)    # forward carry over empty chunks
    assert fwd[(1, 10_000)] == (10_000, 2)
    assert fwd[(2, 5)] is None


def test_salted_plan_fans_out_hot_key(spark):
    """Phase 1's exchange must partition on (key, chunk) — the hot-key
    fan-out — and the phase-2 window runs over chunk-level rows on the
    bare key. Still no SortMergeJoin anywhere near the event data (the
    only join is against the chunk-level carry frame)."""
    from pgvectorscale_spark.operators.relational import as_of_join_salted

    ldf = spark.createDataFrame([(1, 10)], "user_id long, ts long")
    rdf = spark.createDataFrame([(1, 5, 1)], "user_id long, ts long, rid long")
    p = (
        as_of_join_salted(ldf, rdf, on="user_id", right_tiebreak="rid")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning(user_id" in p and "_chunk" in p.split("hashpartitioning(user_id", 1)[1][:60]
    assert "CartesianProduct" not in p


def test_salted_validation(spark):
    from pgvectorscale_spark.operators.relational import as_of_join_salted

    with pytest.raises(ValueError, match="chunk_seconds"):
        as_of_join_salted(None, None, on="x", chunk_seconds=0)
    with pytest.raises(ValueError, match="direction"):
        as_of_join_salted(None, None, on="x", direction="sideways")
