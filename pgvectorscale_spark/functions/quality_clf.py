"""Distilled document-quality classifier: hashed-feature logistic
regression, trained distributed, scored map-side.

The production pattern (CCNet / fastText-style quality filters): a cheap
linear model distills an expensive or hand-written teacher — here the
Gopher-style rule gate (functions/text.quality_rule_sqls) — so the
100 TB scoring pass is a pure projection instead of the teacher's full
rule battery, and the model smooths past the rules' hard thresholds.

Model: logistic regression over [length, token-unigram buckets].
bucket(t) = h60(t) mod NUM_BUCKETS (the same md5-based cross-engine hash
family the dedup operators ride); x_len = min(n_tokens, LEN_CAP)/LEN_CAP
(the teacher's dominant signal — share-normalized buckets alone are
length-blind); x_j = bucket j's share of the document's tokens;
score = w0 + w_len x_len + sum_j w_j x_j. The bucket term never
materializes a feature vector: it is algebraically sum over TOKENS of
w[bucket(t)] / n, so scoring SQL is one per-token weight lookup plus a
left-fold — O(tokens) per row, zero shuffle, and the SAME expression
shape in Spark (`aggregate`) and DuckDB (`list_reduce` with the initial
0.0 prepended), so both engines execute the identical IEEE double
sequence; the result is emitted as integer micro-units
(``round(score * 1e6)``, lm.py's discipline).

Training is full-batch gradient descent with BIT-REPRODUCIBLE
distributed sums: each (row, token) gradient contribution is rounded to
micro-unit longs BEFORE the shuffle, and longs add associatively — so
the learned weights are independent of partitioning and equal the
single-node reference exactly (floating-point partial-sum order is the
classic nondeterminism this kills). Each iteration is one
map-side-combined aggregation; the driver holds only the weight vector.

The trained weights freeze into ``FROZEN_QUALITY_WEIGHTS`` (pinned to a
live training run by tests) and replay as static scoring SQL at any SF.

Reference parity: no analog in timescale/pgvectorscale; this is
LLM-pipeline surface (SURVEY.md §2 extension family), the learned
complement to the rule gate the way lang-profile ID is the learned
complement to the marker vote.
"""
from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgvectorscale_spark.functions.hashing import SPARK, h60, tokens

__all__ = [
    "FROZEN_QUALITY_WEIGHTS",
    "LEN_CAP",
    "NUM_BUCKETS",
    "clf_score_micro_sql",
    "train_quality_classifier",
]

NUM_BUCKETS = 64
LEN_CAP = 128  # tokens; min(n, LEN_CAP)/LEN_CAP is the length feature


def _token_weight_sum(text_expr: str, bucket_weights: list[float], dialect: str) -> str:
    """Left-fold of per-token bucket-weight lookups (0.0 seeds the fold in
    both engines, so empty token lists yield 0 and the addition sequence
    is identical)."""
    toks = tokens(text_expr, dialect)
    wlit = ", ".join(repr(float(w)) for w in bucket_weights)
    if dialect == SPARK:
        lut = (
            f"transform({toks}, t -> element_at(array({wlit}), "
            f"cast(pmod({h60('t', dialect)}, {NUM_BUCKETS}) as int) + 1))"
        )
        return (
            f"aggregate({lut}, cast(0.0 as double), (acc, v) -> acc + v)"
        )
    lut = (
        f"list_transform({toks}, t -> ([{wlit}]::DOUBLE[])"
        f"[(({h60('t', dialect)}) % {NUM_BUCKETS})::INT + 1])"
    )
    return f"list_reduce(list_prepend(0.0::DOUBLE, {lut}), (acc, v) -> acc + v)"


def clf_score_micro_sql(
    text_expr: str, weights: list[float], dialect: str
) -> str:
    """Integer-micro classifier score round((w0 + w_len * x_len +
    sum_t w[bucket(t)] / n) * 1e6) with n = max(1, token count) and
    x_len = min(n_tokens, LEN_CAP)/LEN_CAP. ``weights`` = [intercept,
    length, bucket_0, ..., bucket_{D-1}]."""
    if len(weights) != NUM_BUCKETS + 2:
        raise ValueError(f"need {NUM_BUCKETS + 2} weights, got {len(weights)}")
    toks = tokens(text_expr, dialect)
    fold = _token_weight_sum(text_expr, list(weights[2:]), dialect)
    w0 = repr(float(weights[0]))
    wl = repr(float(weights[1]))
    if dialect == SPARK:
        nt = f"cast(size({toks}) as double)"
        xlen = f"least({nt}, {float(LEN_CAP)!r}) / {float(LEN_CAP)!r}"
        return (
            f"cast(round(({w0} + {wl} * {xlen} + {fold} / "
            f"greatest({nt}, 1.0)) * 1e6) as bigint)"
        )
    nt = f"len({toks})::DOUBLE"
    xlen = f"least({nt}, {float(LEN_CAP)!r}::DOUBLE) / {float(LEN_CAP)!r}::DOUBLE"
    return (
        f"round(({w0} + {wl} * {xlen} + {fold} / "
        f"greatest({nt}, 1.0::DOUBLE)) * 1e6)::BIGINT"
    )


def train_quality_classifier(
    df: DataFrame,
    label_sql: str,
    text_col: str = "text",
    iterations: int = 40,
    lr: float = 4.0,
) -> list[float]:
    """Full-batch logistic regression against ``label_sql`` (a boolean
    Spark SQL expression over the input — the TEACHER, e.g.
    text.quality_passes_sql). Per iteration: score every row with the
    current weights (fixed-order fold), form the residual r = p - y,
    integerize gradient contributions — round(r * 1e6) for the
    intercept, round(r / n * 1e6) PER TOKEN for its bucket — and sum
    them in one exact long aggregation. Weight update (driver-side):
    w_j -= lr * grad_micro_j / (1e6 * n_rows). Deterministic across
    partitionings by construction; equals the single-node reference
    that applies the same per-contribution rounding.

    Scale contract (same honesty as ``train_bpe`` documents for its
    bound): each iteration is one driver-synchronized pass over ``df``,
    so training reads the corpus ``iterations`` (40) times — fine at
    distillation scale, NOT over 100 TB. At scale, TRAIN on a sampled
    slice first (``curation.stratified_sample`` down to a few million
    rows — distillation is exactly the setting where a sample suffices,
    since the teacher labels are free on any subset) and SCORE the full
    corpus with the frozen weights: scoring (``clf_score_micro_sql``)
    is a pure per-token weight-lookup fold, one pass, zero driver
    rounds."""
    d = NUM_BUCKETS + 2
    toks = tokens(f"`{text_col}`", SPARK)
    base = df.select(
        F.expr(toks).alias("_t"),
        F.expr(
            f"transform({toks}, t -> cast(pmod({h60('t', SPARK)}, {NUM_BUCKETS}) as int))"
        ).alias("_b"),
        F.expr(label_sql).cast("double").alias("_y"),
    ).persist()
    n_rows = base.count()
    if n_rows == 0:
        raise ValueError("cannot train a classifier on an empty corpus")
    w = [0.0] * d
    try:
        xlen = (
            f"least(cast(size(_t) as double), {float(LEN_CAP)!r}) / {float(LEN_CAP)!r}"
        )
        for _ in range(iterations):
            wlit = ", ".join(repr(float(v)) for v in w[2:])
            fold = (
                f"aggregate(transform(_b, b -> element_at(array({wlit}), b + 1)), "
                "cast(0.0 as double), (acc, v) -> acc + v)"
            )
            score = (
                f"{w[0]!r} + {w[1]!r} * {xlen} + "
                f"{fold} / greatest(cast(size(_t) as double), 1.0)"
            )
            # contribution rows: index 0 = intercept (round(r*1e6) once
            # per document), index 1 = length feature, index b+2 =
            # bucket b (round(r/n*1e6) once per TOKEN — the single
            # rounding point before the exact sum)
            grad_rows = (
                base.withColumn("_r", F.expr(f"1.0 / (1.0 + exp(-({score})))") - F.col("_y"))
                .select(
                    F.explode(
                        F.expr(
                            "concat(array("
                            "struct(0 as j, cast(round(_r * 1e6) as bigint) as g), "
                            f"struct(1 as j, cast(round(_r * ({xlen}) * 1e6) as bigint) as g)), "
                            "transform(_b, b -> struct(b + 2 as j, "
                            "cast(round(_r / greatest(cast(size(_t) as double), 1.0) * 1e6) as bigint) as g)))"
                        )
                    ).alias("c")
                )
                .groupBy("c.j")
                .agg(F.sum("c.g").alias("g"))
                .collect()
            )
            grad = [0] * d
            for r in grad_rows:
                grad[int(r["j"])] = int(r["g"])
            w = [wj - lr * gj / (1e6 * n_rows) for wj, gj in zip(w, grad)]
    finally:
        base.unpersist()
    return [float(x) for x in w]


# Weights learned by train_quality_classifier on the sf0.001 documents
# corpus (teacher = text.quality_passes_sql verdicts, train slice
# doc_id % 2 = 0, iterations=40, lr=4.0) and FROZEN here so the driver's
# tagged-union scoring is a static engine-replayable expression at any
# SF. test_quality_clf.py pins this constant to a live training run;
# held-out agreement with the teacher at training time was 0.772 vs the
# 0.566 majority baseline (the length weight carries the min_tokens
# rule; the bucket weights carry token-mix corrections).
FROZEN_QUALITY_WEIGHTS: tuple[float, ...] = (
    -2.5754207679999994, 5.295319888, -0.13148835199999995, 0.0, 0.0, 0.0,
    -0.19195735999999994, 0.0, 0.0, -0.18935248000000005, 0.0,
    -0.129674432, 0.056445280000000014, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    -0.18492248000000003, -0.021955776, 0.0, 0.0, 0.0, 0.0,
    -0.11188091200000003, 0.006653775999999999, -0.28320363200000004,
    0.0, 0.0, 0.0, 0.09727353600000001, -0.008746592000000001, 0.0, 0.0,
    0.10655384000000001, -0.42364531199999983, 0.0, -0.21916499199999998,
    0.0, 0.0, 0.0, 0.0, 0.028656720000000004, 0.10494510400000001, 0.0,
    -0.250843648, -0.04310999999999998, -0.3592780320000001, 0.0, 0.0,
    0.0, 0.0, -0.073175264, -0.11220464000000005, 0.0, 0.0, 0.0, 0.0,
    0.0, -0.09092468799999999, 0.0, 0.0, 0.0, 0.0, -0.15046120000000002,
)
