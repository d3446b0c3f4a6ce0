"""Sequence packing + deterministic splits (operators/packing.py)."""

from __future__ import annotations

import numpy as np
import pytest

from pgvectorscale_spark.operators.packing import hash_split, pack_sequences


def _counts_df(spark, counts, ids=None):
    ids = ids if ids is not None else list(range(len(counts)))
    return spark.createDataFrame(
        list(zip(ids, [int(c) for c in counts])), "doc_id long, token_count long"
    )


def test_pack_sequences_matches_bruteforce(spark):
    rng = np.random.default_rng(11)
    counts = rng.integers(1, 900, size=300)
    df = _counts_df(spark, counts)
    got = {
        r["doc_id"]: (r["bin_id"], r["bin_offset"], r["token_count"])
        for r in pack_sequences(df, window_tokens=1024, num_buckets=5).collect()
    }
    cum = 0
    for i, c in enumerate(counts):
        start = cum
        cum += int(c)
        assert got[i] == (start // 1024, start % 1024, int(c)), i
    assert len(got) == 300


def test_pack_sequences_bucket_invariance_and_sparse_ids(spark):
    """The two-phase prefix sum is exact for ANY bucket count, including
    sparse/non-contiguous ids (range buckets may be empty)."""
    rng = np.random.default_rng(3)
    ids = sorted(rng.choice(100_000, size=120, replace=False).tolist())
    counts = rng.integers(1, 300, size=120)
    df = _counts_df(spark, counts, ids)
    ref = None
    for nb in (1, 4, 33):
        got = {
            r["doc_id"]: (r["bin_id"], r["bin_offset"])
            for r in pack_sequences(df, window_tokens=512, num_buckets=nb).collect()
        }
        if ref is None:
            ref = got
        else:
            assert got == ref, f"num_buckets={nb} changed the packing"
    cum = 0
    for i, c in zip(ids, counts):
        assert ref[i] == (cum // 512, cum % 512)
        cum += int(c)


def test_pack_sequences_empty(spark):
    df = spark.createDataFrame([], "doc_id long, token_count long")
    out = pack_sequences(df, window_tokens=128)
    assert out.count() == 0
    assert set(out.columns) == {"doc_id", "token_count", "bin_id", "bin_offset"}


def test_hash_split_deterministic_and_proportional(spark):
    df = spark.createDataFrame([(i,) for i in range(5000)], "doc_id long")
    w = {"train": 0.8, "valid": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in hash_split(df, w).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(df, w).collect()}
    assert a == b, "assignment must be deterministic"
    from collections import Counter

    frac = {k: v / 5000 for k, v in Counter(a.values()).items()}
    for name, want in w.items():
        assert abs(frac[name] - want) < 0.02, (name, frac)
    # a different salt draws an independent split
    c = {r["doc_id"]: r["split"] for r in hash_split(df, w, salt="other").collect()}
    assert c != a
    # reordering the input never changes the assignment
    d = {
        r["doc_id"]: r["split"]
        for r in hash_split(df.orderBy(df.doc_id.desc()), w).collect()
    }
    assert d == a


def test_hash_split_single_label(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    rows = hash_split(df, {"train": 1.0}).collect()
    assert all(r["split"] == "train" for r in rows)


def test_bucket_search_expr_matches_linear_count(spark):
    """The nested-IF binary search computes exactly #{b : id > b} for any
    sorted boundary list (incl. empty and singleton) — same value the
    linear fold it replaced produced, at log-depth cost."""
    import random

    from pgvectorscale_spark.operators.packing import _bucket_search_expr

    rng = random.Random(5)
    cases = [[], [7], [0, 1, 2], sorted(rng.sample(range(-1000, 1000), 63))]
    ids = [-1001, -1000, -1, 0, 1, 7, 8, 999, 1000, 1001] + [
        rng.randint(-1200, 1200) for _ in range(50)
    ]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    for bnd in cases:
        got = {
            r["id"]: r["b"]
            for r in df.selectExpr(
                "id", f"{_bucket_search_expr(bnd, 'id')} as b"
            ).collect()
        }
        for i in ids:
            assert got[i] == sum(1 for b in bnd if i > b), (bnd, i)
