"""Distilled quality classifier (functions/quality_clf.py).

The single-node reference here reimplements the declared training rule
from scratch (python dicts + math.exp, the same per-contribution
micro-integer rounding) — because the distributed gradient sums are
integerized longs, the Spark trainer must equal it BIT-FOR-BIT, not
approximately. Scoring SQL is checked against a python recount, and the
frozen constant is pinned to a live training run.
"""
from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from pgvectorscale_spark.functions.quality_clf import (
    FROZEN_QUALITY_WEIGHTS,
    LEN_CAP,
    NUM_BUCKETS,
    clf_score_micro_sql,
    train_quality_classifier,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _bucket(tok: str) -> int:
    return _h60(tok) % NUM_BUCKETS


def _score(text: str, w) -> float:
    toks = text.split(" ")
    n = max(len(toks), 1.0)
    xlen = min(float(len(toks)), float(LEN_CAP)) / LEN_CAP
    acc = 0.0
    for t in toks:
        acc += w[2 + _bucket(t)]
    return w[0] + w[1] * xlen + acc / n


def _ref_train(rows, labels, iterations, lr):
    d = NUM_BUCKETS + 2
    w = [0.0] * d
    n_rows = len(rows)
    for _ in range(iterations):
        grad = [0] * d
        for text, y in zip(rows, labels):
            toks = text.split(" ")
            n = max(len(toks), 1.0)
            xlen = min(float(len(toks)), float(LEN_CAP)) / LEN_CAP
            p = 1.0 / (1.0 + math.exp(-_score(text, w)))
            r = p - y
            grad[0] += _round_half_up(r * 1e6)
            grad[1] += _round_half_up(r * xlen * 1e6)
            for t in toks:
                grad[2 + _bucket(t)] += _round_half_up(r / n * 1e6)
        w = [wj - lr * gj / (1e6 * n_rows) for wj, gj in zip(w, grad)]
    return w


def _round_half_up(x: float) -> int:
    # Spark's round() on DOUBLE is HALF_UP on the decimal rendering;
    # python's builtin round() is half-even. Micro-contributions land on
    # exact .5 boundaries only for pathological residuals; the reference
    # must use the same rule Spark applies so it cannot drift on those.
    import decimal

    return int(
        decimal.Decimal(repr(x)).quantize(0, rounding=decimal.ROUND_HALF_UP)
    )


CORPUS = [
    ("a a a b", 1.0),
    ("b c d e f g h i j k l m", 0.0),
    ("a b", 1.0),
    ("z z z z z z", 0.0),
    ("the quick brown fox jumps over the lazy dog", 1.0),
    ("one two three four", 0.0),
    ("a", 1.0),
    ("m n o p q r s t", 0.0),
]


def test_trainer_matches_single_node_reference_bitwise(spark):
    df = spark.createDataFrame(
        [(t, y) for t, y in CORPUS], "text string, y double"
    )
    got = train_quality_classifier(df, "y > 0.5", iterations=7, lr=3.0)
    want = _ref_train([t for t, _ in CORPUS], [y for _, y in CORPUS], 7, 3.0)
    assert got == want, [
        (j, a, b) for j, (a, b) in enumerate(zip(got, want)) if a != b
    ][:5]


def test_score_sql_matches_python_recount(spark):
    w = list(FROZEN_QUALITY_WEIGHTS)
    texts = [t for t, _ in CORPUS] + [""]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {
        r["doc_id"]: r["m"]
        for r in df.selectExpr(
            "doc_id", clf_score_micro_sql("text", w, "spark") + " as m"
        ).collect()
    }
    for i, t in enumerate(texts):
        want = _round_half_up(_score(t, w) * 1e6)
        assert got[i] == want, (i, got[i], want)


def test_frozen_weights_match_sf0001_training(spark):
    from pgvectorscale_spark.functions.text import quality_passes_sql
    from pgvectorscale_spark.sources.tables import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    got = train_quality_classifier(
        docs.filter("doc_id % 2 = 0"), quality_passes_sql("text", "spark")
    )
    assert tuple(got) == FROZEN_QUALITY_WEIGHTS


def test_heldout_agreement_beats_majority_baseline(spark):
    """The distillation must actually learn: held-out agreement with the
    teacher exceeds always-predict-the-majority-class. (Exact values are
    deterministic — training and scoring are bit-reproducible.)"""
    from pgvectorscale_spark.functions.text import quality_passes_sql
    from pgvectorscale_spark.sources.tables import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    label = quality_passes_sql("text", "spark")
    sc = clf_score_micro_sql("text", list(FROZEN_QUALITY_WEIGHTS), "spark")
    ev = docs.filter("doc_id % 2 = 1").select(
        (F.expr(sc) > 0).alias("p"), F.expr(label).alias("y")
    )
    tot = ev.count()
    agree = ev.filter("p = y").count()
    majority = max(ev.filter("y").count(), ev.filter("NOT y").count())
    assert agree > majority, (agree, majority, tot)
    assert agree / tot >= 0.7
    # both verdicts occur (the driver union's hash only proves
    # determinism if the classifier actually separates)
    assert 0 < ev.filter("p").count() < tot
