"""Tests for dedup.winnowing_fingerprints — the MOSS robust-winnowing
fingerprint algorithm, checked against an independent single-node
reference and the paper's guarantees."""

from __future__ import annotations

import hashlib

import pytest

from pgvectorscale_spark.operators.dedup import winnowing_fingerprints


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _reference(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Literal Schleimer et al. robust winnowing (window scan, min hash,
    rightmost tie), including the n < w single-window degenerate case."""
    toks = text.split(" ")
    grams = (
        [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        if len(toks) >= k
        else [" ".join(toks)]
    )
    hs = [_h60(g) for g in grams]
    n = len(hs)
    picked = set()
    for e in range(min(w, n), n + 1):  # 1-based window end
        s = max(1, e - w + 1)
        best = None
        for pos in range(s, e + 1):
            h = hs[pos - 1]
            if best is None or h < best[0] or (h == best[0] and pos > best[1]):
                best = (h, pos)
        picked.add((best[1], best[0]))
    return picked


def _spark_fps(spark, rows, k=3, w=4):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {}
    for r in winnowing_fingerprints(df, shingle_n=k, window=w).collect():
        out.setdefault(r["doc_id"], set()).add((r["pos"], r["gram_hash"]))
    return out


def test_matches_reference_on_corpus(spark, documents):
    texts = {
        r["doc_id"]: r["text"]
        for r in documents.limit(50).select("doc_id", "text").collect()
    }
    got = _spark_fps(spark, list(texts.items()))
    for doc_id, text in texts.items():
        assert got[doc_id] == _reference(text, 3, 4), doc_id


def test_shared_run_guarantee(spark, documents):
    """The winnowing guarantee: any shared token run of length >=
    window + shingle_n - 1 (here 6) yields a shared fingerprint HASH."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens
    rows = [
        (0, "one two three " + shared + " four five six"),
        (1, "seven eight " + shared + " nine ten eleven twelve"),
    ]
    got = _spark_fps(spark, rows)
    h0 = {h for _, h in got[0]}
    h1 = {h for _, h in got[1]}
    assert h0 & h1, "documents sharing a 6-token run must share a fingerprint"
    # and two docs with no shared 3-gram share nothing
    rows = [(0, "a b c d e f g h"), (1, "p q r s t u v w")]
    got = _spark_fps(spark, rows)
    assert not ({h for _, h in got[0]} & {h for _, h in got[1]})


def test_rightmost_tie_and_density(spark):
    # all-identical grams: every window's min ties; rightmost wins, so the
    # selected positions are exactly the window ends
    n_toks = 20
    rows = [(0, " ".join(["x"] * n_toks))]
    got = _spark_fps(spark, rows, k=3, w=4)[0]
    n_grams = n_toks - 2
    assert {p for p, _ in got} == set(range(4, n_grams + 1))
    # density on varied text ~ 2/(w+1): loose sanity bounds
    text = " ".join(f"tok{i * 7 % 13}x{i}" for i in range(200))
    got = _spark_fps(spark, [(0, text)], k=3, w=4)[0]
    frac = len(got) / 198
    assert 0.2 < frac < 0.7


def test_short_doc_single_window(spark):
    # 3 tokens -> 1 gram -> one fingerprint; 4 tokens -> 2 grams < w -> the
    # whole sequence winnows as one window (exactly one fingerprint)
    got = _spark_fps(spark, [(0, "a b c"), (1, "a b c d")], k=3, w=4)
    assert len(got[0]) == 1 and len(got[1]) == 1
    with pytest.raises(ValueError):
        winnowing_fingerprints(
            spark.createDataFrame([(0, "a")], "doc_id long, text string"), window=0
        )
