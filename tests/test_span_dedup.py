"""Span-level (substring) exact dedup (dedup.span_dedup).

An independent brute-force reference implements the same declared
semantics from scratch (dict-of-kgram counting, token-level coverage
sets — no intervals, no SQL), so an operator bug in the gram hashing,
interval merge, or keeper rule cannot cancel out.
"""
from __future__ import annotations

import hashlib

import pytest

from pgvectorscale_spark.operators.dedup import span_dedup


def _h60_ref(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def brute_span_dedup(docs: dict[int, str], k: int):
    """Token-level reference: per doc — covered set (any duplicated k-gram),
    keeper-covered set, non-keeper-covered set. Returns per-doc dicts."""
    toks = {d: t.split(" ") for d, t in docs.items()}
    occ: dict[int, list[tuple[int, int]]] = {}
    for d in sorted(toks):
        tk = toks[d]
        for i in range(len(tk) - k + 1):
            occ.setdefault(_h60_ref(" ".join(tk[i : i + k])), []).append((d, i))
    covered = {d: set() for d in toks}
    keep_cov = {d: set() for d in toks}
    nk_cov = {d: set() for d in toks}
    for sites in occ.values():
        if len(sites) < 2:
            continue
        keeper = min(sites)
        for d, i in sites:
            rng = range(i, i + k)
            covered[d].update(rng)
            (keep_cov if (d, i) == keeper else nk_cov)[d].update(rng)
    out = {}
    for d, tk in toks.items():
        cov = sorted(covered[d])
        spans = []
        for p in cov:
            if spans and p <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], p)
            else:
                spans.append([p, p])
        removed = {
            i for i in nk_cov[d] if i not in keep_cov[d]
        }
        clean = " ".join(t for i, t in enumerate(tk) if i not in removed)
        out[d] = {
            "n_tokens": len(tk),
            "dup_tokens": len(cov),
            "n_spans": len(spans),
            "spans_str": ",".join(f"{s}-{e}" for s, e in spans),
            "clean_text": clean,
            "dup_ratio": round(len(cov) / max(len(tk), 1), 6),
        }
    return out


def _run(spark, docs: dict[int, str], k: int):
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: {c: r[c] for c in (
            "n_tokens", "dup_tokens", "n_spans", "spans_str",
            "clean_text", "dup_ratio",
        )}
        for r in span_dedup(df, k=k).collect()
    }
    want = brute_span_dedup(docs, k)
    assert got == want, {d: (got[d], want[d]) for d in got if got[d] != want[d]}
    return got


def test_planted_cross_doc_span(spark):
    # doc 2 pastes a 5-token span of doc 1 into fresh context; k=4 -> two
    # duplicated grams per copy merging into one 5-token span each side.
    docs = {
        0: "u1 u2 u3 u4 u5 u6",
        1: "x1 x2 x3 x4 x5 y1 y2",
        2: "z1 x1 x2 x3 x4 x5 z2",
    }
    got = _run(spark, docs, k=4)
    assert got[0] == {
        "n_tokens": 6, "dup_tokens": 0, "n_spans": 0, "spans_str": "",
        "clean_text": docs[0], "dup_ratio": 0.0,
    }
    assert got[1]["spans_str"] == "0-4" and got[1]["dup_tokens"] == 5
    assert got[2]["spans_str"] == "1-5"
    # keeper = smallest (doc_id, pos): doc 1 keeps its copy, doc 2 loses it
    assert got[1]["clean_text"] == docs[1]
    assert got[2]["clean_text"] == "z1 z2"


def test_within_doc_repetition(spark):
    # the same 4-token run twice INSIDE one document: first occurrence is
    # the keeper, the second is removed
    docs = {7: "r1 r2 r3 r4 r1 r2 r3 r4"}
    got = _run(spark, docs, k=4)
    assert got[7]["spans_str"] == "0-7"  # coverage merges into one span
    assert got[7]["dup_tokens"] == 8
    assert got[7]["clean_text"] == "r1 r2 r3 r4"


def test_short_docs_and_identical_docs(spark):
    # docs shorter than k have no k-grams: never touched even if identical;
    # identical k-length docs dedup to one surviving copy
    docs = {
        0: "a b",
        1: "a b",
        2: "p q r s",
        3: "p q r s",
    }
    got = _run(spark, docs, k=4)
    assert got[0]["clean_text"] == "a b" and got[1]["clean_text"] == "a b"
    assert got[2]["clean_text"] == "p q r s"
    assert got[3]["clean_text"] == ""
    assert got[3]["dup_ratio"] == 1.0


def test_overlapping_spans_keeper_interplay(spark):
    # doc 3 contains both doc 1's and doc 2's material, overlapping: every
    # one of its tokens is covered only by non-keeper occurrences
    docs = {
        1: "a b c e1",
        2: "e2 b c d",
        3: "a b c d",
        4: "q1 q2 q3",
    }
    got = _run(spark, docs, k=2)
    assert got[3]["clean_text"] == ""
    # doc 2: "b c" loses to doc 1's keeper, "c d" keeps here (first site)
    assert got[2]["clean_text"] == "e2 c d"
    assert got[1]["clean_text"] == docs[1]


def test_fuzz_against_brute_force(spark):
    # small-vocabulary random corpus => dense collisions of real repeated
    # runs; exact equality with the token-level reference on every field
    import random

    rnd = random.Random(0x5EED)
    vocab = [f"w{i}" for i in range(8)]
    docs = {
        d: " ".join(rnd.choice(vocab) for _ in range(rnd.randint(1, 40)))
        for d in range(30)
    }
    _run(spark, docs, k=3)
