"""Tests for the round-10 text-pipeline additions: PII detection/redaction
(functions/pii.py), Gopher-style quality rules (functions/text.py), bigram
stupid-backoff LM scoring (functions/lm.py), and BM25 top-k search
(operators/bm25.py). Each operator is checked against an INDEPENDENT
test-side Python reference, not just its own DuckDB twin (the driver's
oracle already covers the twin)."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from pgvectorscale_spark.functions import pii
from pgvectorscale_spark.functions.hashing import SPARK
from pgvectorscale_spark.functions.lm import bigram_lm_scores
from pgvectorscale_spark.functions.text import (
    EN_STOPWORDS,
    QUALITY_THRESHOLDS,
    quality_passes_sql,
    quality_rule_sqls,
)
from pgvectorscale_spark.operators.bm25 import bm25_topk

# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------


def _luhn_ref(digits: str) -> bool:
    """Independent Luhn (textbook right-to-left formulation)."""
    total = 0
    for pos, ch in enumerate(reversed(digits)):
        d = int(ch)
        if pos % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


@pytest.mark.parametrize(
    "num,valid",
    [
        ("4111111111111111", True),  # the canonical Visa test number
        ("4111111111111112", False),
        ("79927398713", None),  # 11 digits: not a candidate at all
        ("5500005555555559", True),
        ("1234567812345678", False),
    ],
)
def test_luhn_and_candidates(spark, num, valid):
    df = spark.createDataFrame([(0, f"pay {num} now")], "doc_id long, text string")
    row = pii.pii_stats(df).collect()[0]
    if valid is None:
        assert row["n_card_candidates"] == 0
    else:
        assert row["n_card_candidates"] == 1
        assert row["n_cards_valid"] == (1 if valid else 0)
        assert _luhn_ref(num) is valid  # the reference agrees with the fixture


def test_detection_and_redaction_literal(spark):
    txt = (
        "see https://ex.com/a?b=1 mail bob.smith@corp.io or x@y.de from "
        "10.0.0.1 ssn 123-45-6789 call 555-123-4567 card 4111111111111111 ok"
    )
    df = spark.createDataFrame([(0, txt)], "doc_id long, text string")
    row = pii.pii_stats(df).collect()[0]
    assert (row["n_urls"], row["n_emails"], row["n_ipv4"]) == (1, 2, 1)
    assert (row["n_ssns"], row["n_phones"]) == (1, 1)
    assert row["n_card_candidates"] == 1 and row["n_cards_valid"] == 1
    red = df.select(F.expr(pii.redacted_text_sql("text", SPARK)).alias("r")).collect()[0]["r"]
    assert red == (
        "see <URL> mail <EMAIL> or <EMAIL> from <IPV4> ssn <SSN> "
        "call <PHONE> card <CARD> ok"
    )


def test_plain_words_never_match(spark, documents):
    """The raw corpus is word-soup: zero PII detections on every doc."""
    agg = pii.pii_stats(documents).agg(
        F.sum(
            F.col("n_urls") + F.col("n_emails") + F.col("n_ipv4")
            + F.col("n_ssns") + F.col("n_phones") + F.col("n_card_candidates")
        ).alias("s")
    ).collect()[0]
    assert agg["s"] == 0


def test_pii_synthesis_classes(spark, documents):
    """id % 3 == 0 -> untouched text and zero counts; 1 -> email+ip+card;
    2 -> two emails + ssn + phone. Redacting class-0 docs is the identity
    (fingerprint equals h60 of the raw text)."""
    stats = pii.pii_stats(
        pii.attach_pii_text(documents).select("doc_id", "pii_text"),
        text_col="pii_text",
    )
    rows = stats.collect()
    assert len(rows) > 100
    saw_valid = saw_invalid = False
    for r in rows:
        m = r["doc_id"] % 3
        got = (
            r["n_urls"], r["n_emails"], r["n_ipv4"], r["n_ssns"],
            r["n_phones"], r["n_card_candidates"],
        )
        if m == 0:
            assert got == (0, 0, 0, 0, 0, 0)
        elif m == 1:
            assert got == (1, 1, 1, 0, 0, 1)
            if r["n_cards_valid"]:
                saw_valid = True
            else:
                saw_invalid = True
        else:
            assert got == (0, 2, 0, 1, 1, 0)
    assert saw_valid and saw_invalid  # the Luhn branch is exercised both ways


def test_patterns_are_re2_safe():
    """Pattern bodies must avoid constructs RE2 (DuckDB) lacks and
    backslash classes whose literal escaping differs across engines."""
    for _, pat in pii.PII_PATTERNS:
        assert "\\" not in pat
        assert "(?=" not in pat and "(?<" not in pat
        re.compile(pat)  # valid Python/RE2-subset syntax


# ---------------------------------------------------------------------------
# Quality rules
# ---------------------------------------------------------------------------


def _rules_df(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rules = quality_rule_sqls("text", SPARK)
    return df.select(
        *[F.expr(e).alias(n) for n, e in rules.items()],
        F.expr(quality_passes_sql("text", SPARK)).alias("passes"),
    ).collect()[0]


def test_quality_rules_hand_cases(spark):
    # long enough, stopword-bearing, varied -> passes
    good = " ".join(
        f"the quick brown fox jump{i} over lazy dogs and" for i in range(10)
    )
    r = _rules_df(spark, good)
    assert r["r_token_count"] and r["r_stopwords"] and r["r_alpha_tokens"]

    # 50 copies of one token: fails top-token and dup-3gram
    r = _rules_df(spark, " ".join(["word"] * 50))
    assert not r["r_top_token"] and not r["r_dup_3gram"] and not r["passes"]

    # short doc fails the token-count rule
    r = _rules_df(spark, "tiny doc")
    assert not r["r_token_count"] and not r["passes"]

    # digit soup fails the alpha rule
    r = _rules_df(spark, " ".join(str(i) for i in range(60)))
    assert not r["r_alpha_tokens"] and not r["passes"]


def test_quality_rules_python_reference(spark, documents):
    """Full-corpus parity with an independent Python implementation of the
    Gopher rule set (integer permille, same thresholds)."""
    th = QUALITY_THRESHOLDS
    rules = quality_rule_sqls("text", SPARK)
    got = {
        r["doc_id"]: r
        for r in documents.select(
            "doc_id",
            "text",
            *[F.expr(e).alias(n) for n, e in rules.items()],
            F.expr(quality_passes_sql("text", SPARK)).alias("passes"),
        ).collect()
    }
    sw = set(EN_STOPWORDS)
    for doc_id, r in got.items():
        toks = r["text"].split(" ")
        n = len(toks)
        grams = (
            [" ".join(toks[i : i + 3]) for i in range(n - 2)] if n >= 3 else [" ".join(toks)]
        )
        exp = {
            "r_token_count": th["min_tokens"] <= n <= th["max_tokens"],
            "r_mean_word_len": (
                th["min_mean_word_len_pm"]
                <= sum(len(t) for t in toks) * 1000 // max(n, 1)
                <= th["max_mean_word_len_pm"]
            ),
            "r_stopwords": sum(t in sw for t in toks) >= th["min_stopwords"],
            "r_alpha_tokens": (
                sum(bool(re.search("[A-Za-z]", t)) for t in toks) * 1000 // max(n, 1)
                >= th["min_alpha_token_pm"]
            ),
            "r_top_token": (
                max(toks.count(d) for d in set(toks)) * 1000 // max(n, 1)
                <= th["max_top_token_pm"]
            ),
            "r_dup_3gram": (
                (len(grams) - len(set(grams))) * 1000 // len(grams)
                <= th["max_dup_3gram_pm"]
            ),
        }
        for k, v in exp.items():
            assert bool(r[k]) is v, (doc_id, k)
        assert bool(r["passes"]) is all(exp.values()), doc_id
    verdicts = {bool(r["passes"]) for r in got.values()}
    assert verdicts == {True, False}  # thresholds exercise both outcomes


# ---------------------------------------------------------------------------
# Bigram LM
# ---------------------------------------------------------------------------


def _lm_reference(texts: dict[int, str], train_pred, alpha=0.4):
    """Independent single-node stupid-backoff implementation."""
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for doc_id, text in texts.items():
        if not train_pred(doc_id):
            continue
        toks = text.split(" ")
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    t_tokens, vocab = float(sum(uni.values())), float(len(uni))
    out = {}
    for doc_id, text in texts.items():
        toks = text.split(" ")
        lp, unseen = 0.0, 0
        for a, b in zip(toks, toks[1:]):
            if (a, b) in big:
                lp += math.log(big[(a, b)] / uni[a])
            else:
                unseen += 1
                lp += math.log(alpha * (uni.get(b, 0) + 1) / (t_tokens + vocab))
        out[doc_id] = (max(len(toks) - 1, 0), unseen, round(lp * 1e6))
    return out


def test_bigram_lm_against_reference(spark, documents):
    texts = {r["doc_id"]: r["text"] for r in documents.select("doc_id", "text").collect()}
    ref = _lm_reference(texts, lambda d: d % 2 == 0)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["n_unseen"], r["logprob_micro"])
        for r in bigram_lm_scores(documents).collect()
    }
    assert set(got) == set(ref)
    for doc_id in ref:
        rn, ru, rlp = ref[doc_id]
        gn, gu, glp = got[doc_id]
        assert (gn, gu) == (rn, ru), doc_id
        # float-sum ordering differs; micro-nat rounding must agree to 1 ulp
        assert abs(glp - rlp) <= 1, doc_id
    # train docs never back off; some held-out docs must
    assert all(got[d][1] == 0 for d in got if d % 2 == 0)
    assert any(got[d][1] > 0 for d in got if d % 2 == 1)


def _trigram_reference(texts: dict[int, str], train_pred, alpha=0.4):
    """Independent single-node trigram stupid backoff."""
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    tri: dict[tuple[str, str, str], int] = {}
    for doc_id, text in texts.items():
        if not train_pred(doc_id):
            continue
        toks = text.split(" ")
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
        for a, b, c in zip(toks, toks[1:], toks[2:]):
            tri[(a, b, c)] = tri.get((a, b, c), 0) + 1
    t_tokens, vocab = float(sum(uni.values())), float(len(uni))
    out = {}
    for doc_id, text in texts.items():
        toks = text.split(" ")
        lp, unseen = 0.0, 0
        for a, b, c in zip(toks, toks[1:], toks[2:]):
            if (a, b, c) in tri:
                lp += math.log(tri[(a, b, c)] / big[(a, b)])
            elif (b, c) in big:
                unseen += 1
                lp += math.log(alpha * big[(b, c)] / uni[b])
            else:
                unseen += 1
                lp += math.log(
                    alpha * alpha * (uni.get(c, 0) + 1) / (t_tokens + vocab)
                )
        out[doc_id] = (max(len(toks) - 2, 0), unseen, round(lp * 1e6))
    return out


def test_trigram_lm_against_reference(spark, documents):
    from pgvectorscale_spark.functions.lm import trigram_lm_scores

    texts = {r["doc_id"]: r["text"] for r in documents.select("doc_id", "text").collect()}
    ref = _trigram_reference(texts, lambda d: d % 2 == 0)
    got = {
        r["doc_id"]: (r["n_trigrams"], r["n_tri_unseen"], r["logprob3_micro"])
        for r in trigram_lm_scores(documents).collect()
    }
    assert set(got) == set(ref)
    for doc_id in ref:
        rn, ru, rlp = ref[doc_id]
        gn, gu, glp = got[doc_id]
        assert (gn, gu) == (rn, ru), doc_id
        assert abs(glp - rlp) <= 1, doc_id
    # train docs never leave the trigram branch; held-out docs do, and the
    # trigram model must be 'more surprised' than the bigram one overall
    assert all(got[d][1] == 0 for d in got if d % 2 == 0)
    assert any(got[d][1] > 0 for d in got if d % 2 == 1)


def test_bigram_lm_short_docs(spark):
    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "a"), (2, "a b"), (3, "zz qq")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    assert got[1]["n_bigrams"] == 0 and got[1]["logprob_micro"] == 0
    assert got[0]["n_unseen"] == 0
    assert got[3]["n_unseen"] == 1  # zz->qq unseen in the even-id train slice


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def _bm25_reference(texts: dict[int, str], queries: dict[int, str], k=5, k1=1.2, b=0.75):
    """Independent single-node BM25 (same formula family, textbook form)."""
    toks = {d: t.split(" ") for d, t in texts.items()}
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    df_t: dict[str, int] = {}
    for t in toks.values():
        for term in set(t):
            df_t[term] = df_t.get(term, 0) + 1
    out = {}
    for qid, qtext in queries.items():
        scores = {}
        for d, t in toks.items():
            s = 0.0
            matched = False
            for term in set(qtext.split(" ")):
                tf = t.count(term)
                if tf == 0:
                    continue
                matched = True
                idf = math.log(1 + (n_docs - df_t[term] + 0.5) / (df_t[term] + 0.5))
                s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(t) / avgdl))
            if matched:
                scores[d] = round(s, 6)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = [(d, s, i + 1) for i, (d, s) in enumerate(ranked)]
    return out


def test_bm25_against_reference(spark, documents):
    texts = {r["doc_id"]: r["text"] for r in documents.select("doc_id", "text").collect()}
    queries = {
        d: " ".join(t.split(" ")[:4]) for d, t in texts.items() if d % 53 == 0
    }
    qdf = spark.createDataFrame(
        list(queries.items()), "query_id long, q_text string"
    )
    got: dict[int, list] = {}
    for r in bm25_topk(documents, qdf, k=5).collect():
        got.setdefault(r["query_id"], []).append((r["doc_id"], r["score"], r["rank"]))
    ref = _bm25_reference(texts, queries, k=5)
    assert set(got) == set(ref)
    for qid in ref:
        got_sorted = sorted(got[qid], key=lambda x: x[2])
        for (gd, gs, gr), (rd, rs, rr) in zip(got_sorted, ref[qid]):
            assert (gd, gr) == (rd, rr), qid
            assert abs(gs - rs) <= 1e-6, (qid, gd)


def test_bm25_zero_overlap_excluded(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(7, "alpha")], "query_id long, q_text string")
    rows = bm25_topk(docs, q, k=5).collect()
    assert [(r["query_id"], r["doc_id"], r["rank"]) for r in rows] == [(7, 0, 1)]
    with pytest.raises(ValueError):
        bm25_topk(docs, q, k=0)
