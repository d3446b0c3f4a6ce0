"""Paragraph-normalized exact dedup (dedup.paragraph_dedup).

An independent pure-python reference implements the declared semantics
from scratch (dict-of-normalized-paragraph occurrence lists — no SQL, no
hashing), so an operator bug in the split, normalization, keeper rule, or
reassembly cannot cancel out.
"""
from __future__ import annotations

import re

import pytest

from pgvectorscale_spark.operators.dedup import paragraph_dedup


def _norm(p: str) -> str:
    return re.sub(r"[^a-z0-9]+", " ", p.lower()).strip()


def _ref(docs: dict[int, str]):
    """Reference: keeper = smallest (doc_id, idx) per normalized group of
    2+; empty-normalized paragraphs never dedup."""
    paras = []  # (doc_id, idx, p, np)
    for d in sorted(docs):
        for i, p in enumerate(re.split(r"\n{2,}", docs[d])):
            paras.append((d, i, p, _norm(p)))
    groups: dict[str, list[tuple[int, int]]] = {}
    for d, i, _, np_ in paras:
        if np_:
            groups.setdefault(np_, []).append((d, i))
    removed = {
        occ
        for occs in groups.values()
        if len(occs) >= 2
        for occ in occs[1:]  # occs are in (doc, idx) order by construction
    }
    out = {}
    for d in sorted(docs):
        mine = [(i, p) for dd, i, p, _ in paras if dd == d]
        kept = [(i, p) for i, p in mine if (d, i) not in removed]
        out[d] = {
            "n_paras": len(mine),
            "dup_paras": len(mine) - len(kept),
            "kept_str": ",".join(str(i) for i, _ in kept),
            "clean_text": "\n\n".join(p for _, p in kept),
        }
    return out


DOCS = {
    0: "alpha beta gamma\n\nSubscribe NOW!!\n\ndelta epsilon",
    1: "zeta eta theta\n\n...subscribe, now\n\nalpha beta gamma",
    2: "SUBSCRIBE now\n\nSUBSCRIBE now\n\niota kappa",  # within-doc dup too
    3: "unique paragraph only",  # no blank lines -> one paragraph
    4: "lambda mu\n\n###\n\nlambda mu",  # '###' normalizes to '' (kept!)
}


def test_matches_reference(spark):
    df = spark.createDataFrame(
        [(d, t) for d, t in DOCS.items()], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in paragraph_dedup(df).collect()}
    want = _ref(DOCS)
    assert set(got) == set(want)
    for d in want:
        for k, v in want[d].items():
            assert got[d][k] == v, (d, k, got[d][k], v)


def test_semantics_pins(spark):
    df = spark.createDataFrame(
        [(d, t) for d, t in DOCS.items()], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in paragraph_dedup(df).collect()}
    # cross-doc normalized dup: doc 1's cosmetically-different boilerplate
    # is removed (doc 0 idx 1 is the keeper), and doc 1's verbatim copy of
    # doc 0's first paragraph is removed too
    assert got[0]["dup_paras"] == 0 and got[0]["kept_str"] == "0,1,2"
    assert got[1]["dup_paras"] == 2 and got[1]["kept_str"] == "0"
    # doc 2: BOTH 'SUBSCRIBE now' paragraphs normalize to 'subscribe now'
    # — the same group as doc 0's 'Subscribe NOW!!' keeper — so the
    # within-doc pair is removed along with the cross-doc match
    assert got[2]["n_paras"] == 3
    assert got[2]["dup_paras"] == 2 and got[2]["kept_str"] == "2"
    # doc 3: a no-blank-line document is one paragraph, kept
    assert got[3] == {
        "doc_id": 3,
        "n_paras": 1,
        "dup_paras": 0,
        "dup_ratio": 0.0,
        "kept_str": "0",
        "clean_text": "unique paragraph only",
    }
    # doc 4: the '###' paragraphs normalize to '' -> NEVER deduped (both
    # kept), while the identical 'lambda mu' pair dedups within the doc
    assert got[4]["dup_paras"] == 1
    assert got[4]["kept_str"] == "0,1"
