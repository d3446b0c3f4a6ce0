"""SBQ quantization: encode parity with a straight-line numpy reimplementation,
training stats, and two-stage search recall (reference sbq/quantize.rs,
build.rs:1419-1473 rescore test)."""

from __future__ import annotations

import numpy as np
import pytest

from pgvectorscale_spark.functions.distance import np_cosine_distance, np_l2_squared
from pgvectorscale_spark.operators.sbq import (
    SbqQuantizer,
    encode_dataframe,
    search_sbq,
    train_quantizer,
)
from tests.conftest import make_fixture_f1


def ref_quantize(vec, means, variances, bits):
    """Literal per-element port of quantize.rs:52-89 semantics for testing."""
    n = len(vec)
    words = [0] * (((n * bits) + 63) // 64)
    if bits == 1:
        for i, v in enumerate(vec):
            if v > means[i]:
                words[i // 64] |= 1 << (i % 64)
    else:
        for i, v in enumerate(vec):
            std = np.sqrt(variances[i])
            if std > 0:
                z = (v - means[i]) / std
                idx = (z + 2.0) / (4.0 / (bits + 1))
                ones = 0 if idx < 1.0 else min(int(np.floor(idx)), bits)
            else:
                ones = bits if v > means[i] else 0
            pos = i * bits
            for j in range(ones):
                words[(pos + j) // 64] |= 1 << ((pos + j) % 64)
    return np.array(words, dtype=np.uint64)


@pytest.mark.parametrize("bits", [1, 2])
def test_quantize_matrix_matches_reference_semantics(bits):
    rng = np.random.default_rng(42)
    mat = rng.normal(size=(30, 70)).astype(np.float32)
    means = mat.mean(axis=0)
    variances = mat.var(axis=0)
    q = SbqQuantizer(means, variances, bits)
    got = q.quantize_matrix(mat)
    for i in range(30):
        expect = ref_quantize(mat[i].astype(np.float64), means, variances, bits)
        assert (got[i] == expect).all(), f"row {i} mismatch"


def test_sigma_zero_edge():
    # constant dimension: sigma=0 → all-ones iff v > mean (Rust cast saturation)
    means = np.array([1.0, 0.0])
    variances = np.array([0.0, 1.0])
    q = SbqQuantizer(means, variances, 2)
    code_hi = q.quantize(np.array([2.0, 0.0]))
    code_lo = q.quantize(np.array([0.5, 0.0]))
    assert int(code_hi[0]) & 0b11 == 0b11
    assert int(code_lo[0]) & 0b11 == 0b00


def test_train_quantizer_stats(spark):
    df, mat = make_fixture_f1(spark, n=200, d=32)
    q = train_quantizer(df, bits_per_dimension=1)
    np.testing.assert_allclose(q.means, mat.astype(np.float64).mean(axis=0), rtol=1e-6)
    np.testing.assert_allclose(q.variances, mat.astype(np.float64).var(axis=0), rtol=1e-5)


def test_encode_dataframe_roundtrip(spark):
    df, mat = make_fixture_f1(spark, n=50, d=64)
    q = train_quantizer(df, bits_per_dimension=1)
    enc = encode_dataframe(df, q, code_col="bq_code").orderBy("id").collect()
    expect = q.quantize_matrix(mat)
    for r in enc:
        got = np.array(r["bq_code"], dtype=np.int64).view(np.uint64)
        assert (got == expect[r["id"]]).all()


@pytest.mark.parametrize("dist,np_dist", [("l2", np_l2_squared), ("cosine", np_cosine_distance)])
def test_search_sbq_recall(spark, dist, np_dist):
    df, mat = make_fixture_f1(spark, n=300, d=64)
    rng = np.random.default_rng(5)
    q = rng.random(64, dtype=np.float32)
    res = search_sbq(df, q.tolist(), k=10, rescore=50, distance_type=dist, id_col="id")
    got = {r["id"] for r in res.collect()}
    d = np_dist(mat, q)
    expect = set(np.lexsort((np.arange(len(d)), d))[:10])
    recall = len(got & expect) / 10
    assert recall >= 0.9, f"recall {recall} < 0.9 ({dist})"


def test_rescore_zero_is_approximate_but_search_with_rescore_fixes(spark):
    # Reference test_no_rescore (build.rs:1419-1473): rescore=0 may misrank;
    # rescore>=k recovers the exact answer on the candidates.
    df, mat = make_fixture_f1(spark, n=300, d=64)
    q = np.ones(64, dtype=np.float32)
    exact = np_l2_squared(mat, q)
    expect_top1 = int(np.lexsort((np.arange(len(exact)), exact))[0])
    res = search_sbq(df, q.tolist(), k=10, rescore=50, distance_type="l2", id_col="id")
    assert res.collect()[0]["id"] == expect_top1
