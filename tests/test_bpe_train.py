"""Distributed BPE vocabulary training (functions/text.train_bpe).

Parity bar: the learned merge table equals a from-scratch single-node
reference (dict-based Sennrich-style get_stats/merge loop — overlapping
adjacent positions counted, greedy left-to-right merge, ties by (a, b)
ascending) on the same corpus. The flat replace-chain APPLY representation
(bpe_apply_sql) is checked against the reference tokenization too, in both
engines, so the train-time fold and the apply-time replace chain cannot
drift apart.
"""
from __future__ import annotations

import re

import duckdb
import pytest

from pgvectorscale_spark.functions.hashing import DUCKDB, SPARK
from pgvectorscale_spark.functions.text import (
    BPE_PATTERN,
    bpe_merged_token_count_sql,
    train_bpe,
)


def ref_pretokenize(text: str) -> list[str]:
    return re.findall(BPE_PATTERN, text)


def ref_train_bpe(texts: list[str], num_merges: int, min_pair_freq: int = 2):
    """Single-node reference: classic BPE over a word-frequency dict."""
    freqs: dict[tuple[str, ...], int] = {}
    for t in texts:
        for w in ref_pretokenize(t):
            k = tuple(w)
            freqs[k] = freqs.get(k, 0) + 1
    merges = []
    for _ in range(num_merges):
        stats: dict[tuple[str, str], int] = {}
        for word, f in freqs.items():
            for i in range(len(word) - 1):
                p = (word[i], word[i + 1])
                stats[p] = stats.get(p, 0) + f
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        (a, b) = best[0]
        merges.append((a, b))
        new_freqs: dict[tuple[str, ...], int] = {}
        for word, f in freqs.items():
            out, i = [], 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            k = tuple(out)
            new_freqs[k] = new_freqs.get(k, 0) + f
        freqs = new_freqs
    return merges


def ref_apply(text: str, merges) -> int:
    n = 0
    for w in ref_pretokenize(text):
        syms = list(w)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        n += len(syms)
    return n


CORPUS = [
    "the cat sat on the mat, the cat sat.",
    "then the other cat sat on another mat!",
    "that cat: thoroughly there, the then them.",
    "numbers 123 123 4567 123 and symbols ## ##.",
    "cats cats cats that then those the the the",
]


def test_train_matches_single_node_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = train_bpe(df, num_merges=12)
    want = ref_train_bpe(CORPUS, 12)
    assert got == want
    assert len(got) == 12  # the tiny corpus really yields 12 merges


def test_apply_matches_reference_in_both_engines(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    merges = ref_train_bpe(CORPUS, 10)
    from pyspark.sql import functions as F

    got_s = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id",
            F.expr(bpe_merged_token_count_sql("text", merges, SPARK)).alias("n"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", list(enumerate(CORPUS)))
    got_d = dict(
        con.execute(
            f"SELECT doc_id, {bpe_merged_token_count_sql('text', merges, DUCKDB)} FROM t"
        ).fetchall()
    )
    want = {i: ref_apply(t, merges) for i, t in enumerate(CORPUS)}
    assert got_s == want
    assert got_d == want


def test_train_stops_when_no_pair_repeats(spark):
    df = spark.createDataFrame([("ab cd ef",)], "text string")
    got = train_bpe(df, num_merges=5, min_pair_freq=2)
    assert got == ref_train_bpe(["ab cd ef"], 5)
    assert got == []  # every pair occurs once


def test_batched_equals_sequential_on_real_corpus(spark):
    """The batched trainer (stability prefix + created-pair bound, one
    fold per ROUND) must produce the exact sequential merge list — order
    included — while using fewer Spark rounds."""
    from pgvectorscale_spark.sources.tables import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    sb, ss = {}, {}
    batched = train_bpe(docs, num_merges=48, batch_merges=8, stats=sb)
    seq = train_bpe(docs, num_merges=48, batch_merges=1, stats=ss)
    assert batched == seq
    assert len(batched) == 48
    assert ss["rounds"] == 48
    assert sb["rounds"] < ss["rounds"], sb
    assert sum(sb["batch_sizes"]) == 48


def test_disjoint_only_batching_diverges():
    """Why the created-pair bound exists: the top-N *pairwise
    symbol-disjoint* batching rule (the obvious one) does NOT preserve
    sequential order — a merge's created pair (e.g. (t,h)->th creating
    (th,e)) can outrank the batch's later members, so sequential picks
    it first while the batch defers it. Pure-python demonstration on the
    sf0.001 documents corpus: disjoint-only diverges from sequential
    within 64 merges (on this corpus at merge 14: sequential learns
    ('co','lu') before ('lu','m'); the disjoint batch flips them and the
    vocabularies drift apart — 'colum' vs 'lum')."""
    import duckdb

    texts = [
        r[0]
        for r in duckdb.sql(
            "select text from '/root/testdata/sf0.001/documents.parquet'"
        ).fetchall()
    ]
    freqs: dict[tuple[str, ...], int] = {}
    for t in texts:
        for w in ref_pretokenize(t):
            k = tuple(w)
            freqs[k] = freqs.get(k, 0) + 1

    def stats_of(f):
        st: dict[tuple[str, str], int] = {}
        for w, n in f.items():
            for i in range(len(w) - 1):
                p = (w[i], w[i + 1])
                st[p] = st.get(p, 0) + n
        return st

    def apply_one(f, a, b):
        out: dict[tuple[str, ...], int] = {}
        for w, n in f.items():
            o, i = [], 0
            while i < len(w):
                if i + 1 < len(w) and w[i] == a and w[i + 1] == b:
                    o.append(a + b)
                    i += 2
                else:
                    o.append(w[i])
                    i += 1
            k = tuple(o)
            out[k] = out.get(k, 0) + n
        return out

    f, seq = dict(freqs), []
    for _ in range(64):
        st = stats_of(f)
        best = min(st.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        seq.append((a, b))
        f = apply_one(f, a, b)

    f, dis = dict(freqs), []
    while len(dis) < 64:
        st = stats_of(f)
        top = sorted(st.items(), key=lambda kv: (-kv[1], kv[0]))
        if not top or top[0][1] < 2:
            break
        batch = []
        for (a, b), c in top:
            if c < 2 or len(batch) >= 8:
                break
            if any(
                b == wa or a == wb or a == wa + wb or b == wa + wb
                for wa, wb in batch
            ):
                break
            batch.append((a, b))
        for a, b in batch[: 64 - len(dis)]:
            dis.append((a, b))
            f = apply_one(f, a, b)

    assert dis != seq, (
        "if disjoint-only ever stops diverging on this corpus, the "
        "created-pair bound in train_bpe could be relaxed — re-derive"
    )


def test_frozen_merges_match_sf0001_training(spark):
    """The driver's tagged-union apply uses FROZEN_BPE_MERGES; this pins
    the constant to what training actually learns on the sf0.001 corpus so
    it cannot drift from the trainer silently."""
    from pgvectorscale_spark.functions.text import FROZEN_BPE_MERGES
    from pgvectorscale_spark.sources.tables import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    got = train_bpe(docs, num_merges=len(FROZEN_BPE_MERGES))
    assert got == list(FROZEN_BPE_MERGES)
