"""Property-based invariants for the pure-numpy kernels (no Spark session).

The reference's kernel-level guarantees, checked over generated inputs:
distance symmetry/identity, normalization, quantizer determinism and
monotonicity, prune bounds.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pgvectorscale_spark.functions.distance import (
    np_cosine_distance,
    np_hamming,
    np_l2_squared,
    np_normalize,
)
from pgvectorscale_spark.operators.sbq import SbqQuantizer
from pgvectorscale_spark.operators.vamana import VamanaGraph

floats = st.floats(min_value=-100, max_value=100, allow_nan=False, width=32)


def vec(dim):
    return st.lists(floats, min_size=dim, max_size=dim)


@given(vec(8), vec(8))
@settings(max_examples=50, deadline=None)
def test_l2_symmetric_and_identity(a, b):
    a, b = np.array(a), np.array(b)
    d_ab = np_l2_squared(a.reshape(1, -1), b)[0]
    d_ba = np_l2_squared(b.reshape(1, -1), a)[0]
    assert abs(d_ab - d_ba) < 1e-6
    assert np_l2_squared(a.reshape(1, -1), a)[0] == 0.0
    assert d_ab >= 0.0


@given(vec(8))
@settings(max_examples=50, deadline=None)
def test_normalize_unit_or_zero(a):
    n = np.linalg.norm(np_normalize(np.array(a).reshape(1, -1))[0])
    assert abs(n - 1.0) < 1e-9 or n == 0.0  # zero vectors pass through


@given(vec(8), vec(8))
@settings(max_examples=50, deadline=None)
def test_cosine_range(a, b):
    d = np_cosine_distance(np.array(a).reshape(1, -1), np.array(b))[0]
    assert 0.0 <= d <= 2.0 + 1e-9


@given(st.integers(1, 2), st.lists(vec(16), min_size=3, max_size=8))
@settings(max_examples=30, deadline=None)
def test_quantizer_deterministic_self_zero(bits, rows):
    mat = np.array(rows)
    q = SbqQuantizer(mat.mean(axis=0), mat.var(axis=0), bits_per_dimension=bits)
    c1, c2 = q.quantize_matrix(mat), q.quantize_matrix(mat)
    assert (c1 == c2).all()
    assert (np_hamming(c1, c1[0]) == np_hamming(c1, c1[0])).all()
    assert np_hamming(c1[:1], c1[0])[0] == 0  # self-distance zero


@given(st.lists(st.floats(-10, 10, allow_nan=False), min_size=4, max_size=4))
@settings(max_examples=50, deadline=None)
def test_thermometer_monotone(base):
    """2-bit code popcount per dimension never decreases as the value grows."""
    dim = len(base)
    mat = np.array([base, base], dtype=np.float64)
    q = SbqQuantizer(np.zeros(dim), np.ones(dim), bits_per_dimension=2)
    for d in range(dim):
        lo, hi = np.array(base), np.array(base)
        hi[d] += 5.0
        c_lo = q.quantize_matrix(lo.reshape(1, -1))[0]
        c_hi = q.quantize_matrix(hi.reshape(1, -1))[0]
        pop = lambda c: int(np.bitwise_count(c).sum()) if hasattr(np, "bitwise_count") else bin(int(c[0])).count("1")
        assert pop(c_hi) >= pop(c_lo)


@given(st.lists(vec(8), min_size=5, max_size=30), st.integers(2, 6))
@settings(max_examples=20, deadline=None)
def test_robust_prune_bounds(rows, r):
    mat = np.unique(np.array(rows, dtype=np.float32), axis=0)
    if len(mat) < 3:
        return
    g = VamanaGraph(mat, distance_type="l2", num_neighbors=r)
    cand = np.arange(len(mat))
    dists = np_l2_squared(mat, mat[0])
    res = g.robust_prune(0, cand, dists)
    assert len(res) <= r
    assert 0 not in res  # no self-loop
    assert len(res) == len(set(res))  # no duplicates
    assert res[0] == int(np.lexsort((cand[cand != 0], dists[cand != 0]))[0] + 1) or len(mat) <= 1
