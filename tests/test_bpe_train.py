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


# ---------------------------------------------------------------------------
# Scale-true BPE (round 12): histogram-driver training + one-pass apply
# ---------------------------------------------------------------------------


def _rich_corpus_df(spark):
    """A corpus with a vocabulary deep enough for >= 256 merges (the
    synthetic documents table draws from ~31 distinct words and exhausts
    at 89): part names/types/brands + customer names/segments +
    documents text at sf0.01 — 1,585 distinct pre-tokens."""
    from pyspark.sql import functions as F

    from pgvectorscale_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    part = load_table(spark, "part", sf).select(
        F.concat_ws(" ", "p_name", "p_type", "p_brand").alias("text")
    )
    cust = load_table(spark, "customer", sf).select(
        F.concat_ws(" ", "c_name", "c_mktsegment").alias("text")
    )
    docs = load_table(spark, "documents", sf).select("text")
    return part.unionByName(cust).unionByName(docs)


def _rich_corpus_texts():
    return [
        r[0]
        for r in duckdb.sql(
            "SELECT p_name || ' ' || p_type || ' ' || p_brand"
            " FROM '/root/testdata/sf0.01/part.parquet'"
            " UNION ALL SELECT c_name || ' ' || c_mktsegment"
            " FROM '/root/testdata/sf0.01/customer.parquet'"
            " UNION ALL SELECT text FROM '/root/testdata/sf0.01/documents.parquet'"
        ).fetchall()
    ]


def test_three_way_parity_at_depth_256(spark):
    """The scale path (one distributed histogram pass + driver-side
    incremental merge loop) must equal BOTH the distributed exactness
    twin (train_bpe) and the from-scratch sequential reference,
    merge-for-merge and order included, at a realistic depth."""
    from pgvectorscale_spark.functions.text import train_bpe_histogram

    df = _rich_corpus_df(spark)
    texts = _rich_corpus_texts()
    seq = ref_train_bpe(texts, 256)
    assert len(seq) == 256  # the corpus really sustains this depth
    st = {}
    hist = train_bpe_histogram(df, num_merges=256, stats=st)
    assert hist == seq
    assert st["distinct_words"] == 1585
    sb = {}
    dist = train_bpe(df, num_merges=256, batch_merges=8, stats=sb)
    assert dist == seq
    assert sb["rounds"] < 256  # batching still pays on the way down


def test_local_trainer_exhaustion_and_floor():
    """Driver-side trainer: runs a full vocabulary to exhaustion fast
    (the 32k-vocab feasibility claim), applies the min_pair_freq floor
    exactly like the recount loop, and matches the reference at every
    depth along the way."""
    import time

    from pgvectorscale_spark.functions.text import train_bpe_local

    texts = _rich_corpus_texts()
    hist: dict[str, int] = {}
    for t in texts:
        for w in ref_pretokenize(t):
            hist[w] = hist.get(w, 0) + 1
    t0 = time.time()
    full = train_bpe_local(hist, 1 << 15, min_pair_freq=1)
    took = time.time() - t0
    assert full == ref_train_bpe(texts, len(full) + 8, min_pair_freq=1)
    assert len(full) > 1500  # exhaustion depth on this corpus
    assert took < 10.0, f"incremental trainer too slow: {took:.1f}s"
    # floor rule: min_pair_freq=4 must stop exactly where the reference does
    f4 = train_bpe_local(hist, 1 << 15, min_pair_freq=4)
    assert f4 == ref_train_bpe(texts, len(f4) + 8, min_pair_freq=4)
    assert len(f4) < len(full)


def test_bpe_encode_matches_replace_chain(spark):
    """The one-pass rank-heap tokenizer must equal the engine-replayable
    replace chain token-COUNT-for-count on real rows (FROZEN merges, the
    driver oracle's table), including NULL text."""
    from pyspark.sql import functions as F

    from pgvectorscale_spark.functions.text import (
        FROZEN_BPE_MERGES,
        bpe_encode_count,
    )
    from pgvectorscale_spark.sources.tables import load_table

    docs = (
        load_table(spark, "documents", "/root/testdata/sf0.001")
        .select("doc_id", "text")
        .unionByName(
            spark.createDataFrame([(10**9, None)], "doc_id long, text string")
        )
    )
    merges = list(FROZEN_BPE_MERGES)
    both = bpe_encode_count(docs, merges, out_col="fast").withColumn(
        "chain", F.expr(bpe_merged_token_count_sql("text", merges, SPARK))
    )
    diff = both.filter(
        ~(
            (F.col("fast") == F.col("chain"))
            | (F.col("fast").isNull() & F.col("chain").isNull())
        )
    ).count()
    assert diff == 0
    null_row = both.filter("doc_id = 1000000000").collect()[0]
    assert null_row["fast"] is None and null_row["chain"] is None


def test_bpe_encode_matches_chain_on_deep_table(spark):
    """Same parity at depth 256 on the rich corpus — the regime the
    one-pass tokenizer exists for. A 256-merge replace chain is BEYOND
    Spark's SQL parser ([FAILED_TO_PARSE_TOO_COMPLEX] — asserted below,
    it is WHY bpe_encode exists), so the chain side of the parity runs
    as the DuckDB replay of the identical expression plus the
    single-node reference apply."""
    import pytest as _pytest
    from pyspark.sql import functions as F
    from pyspark.sql.utils import ParseException

    from pgvectorscale_spark.functions.text import (
        bpe_encode_count,
        train_bpe_histogram,
    )

    df = _rich_corpus_df(spark).withColumn(
        "doc_id", F.monotonically_increasing_id()
    )
    merges = train_bpe_histogram(df, num_merges=256)
    assert len(merges) == 256
    con = duckdb.connect()
    con.execute("CREATE TABLE t(text VARCHAR)")
    # the 256-deep chain is beyond the engines' expression limits.
    # DuckDB's 128-frame binder cap is deterministic — assert it hard.
    # Spark's FAILED_TO_PARSE_TOO_COMPLEX is a JVM stack-depth heuristic
    # (a warm JVM sometimes parses what a cold one rejects), so accept
    # either outcome there: a rejection proves the ceiling, a successful
    # parse must agree with the fast path value-for-value.
    with _pytest.raises(duckdb.BinderException):
        con.execute(
            f"SELECT {bpe_merged_token_count_sql('text', merges, DUCKDB)} FROM t"
        )
    got = {
        r["text"]: r["fast"]
        for r in bpe_encode_count(df, merges, out_col="fast").collect()
    }
    texts = sorted(got)
    # at 256: parity vs the single-node reference (the chain's semantics)
    assert got == {t: ref_apply(t, merges) for t in texts}
    try:
        spark_chain = {
            r["text"]: r["chain"]
            for r in df.withColumn(
                "chain", F.expr(bpe_merged_token_count_sql("text", merges, SPARK))
            ).collect()
        }
    except ParseException:
        spark_chain = None  # the cold-JVM outcome: ceiling demonstrated
    if spark_chain is not None:
        assert spark_chain == got
    # at 115 (the deepest chain DuckDB's 128-frame binder still accepts,
    # base expression included): parity vs a real engine's chain replay
    con.executemany("INSERT INTO t VALUES (?)", [(t,) for t in texts])
    m115 = merges[:115]
    chain115 = dict(
        con.execute(
            f"SELECT text, {bpe_merged_token_count_sql('text', m115, DUCKDB)} FROM t"
        ).fetchall()
    )
    got115 = {
        r["text"]: r["fast"]
        for r in bpe_encode_count(df, m115, out_col="fast").collect()
    }
    assert got115 == chain115


def test_bpe_encode_no_revisit_rule():
    """The replace chain never revisits a passed merge: with the table
    [(ab,c), (a,b)] over 'abc', pass 0 is a no-op ('ab' does not exist
    yet), pass 1 creates it — the chain ends at ['ab','c'], NOT ['abc'].
    A naive 'always merge the lowest-rank present pair' tokenizer (the
    textbook min-heap WITHOUT the created-rank>current rule) would apply
    rank 0 after rank 1 and diverge."""
    from pgvectorscale_spark.functions.text import _bpe_encode_word

    table = [("ab", "c", "abc"), ("a", "b", "ab")]
    rl = {("ab", "c"): [0], ("a", "b"): [1]}
    fr = {p: lst[0] for p, lst in rl.items()}
    assert _bpe_encode_word("abc", fr, rl, table) == ["ab", "c"]
    # and the SQL chain agrees (DuckDB replay of bpe_apply_sql)
    from pgvectorscale_spark.functions.text import bpe_merged_token_count_sql as mc

    n = duckdb.sql(
        f"SELECT {mc(chr(39) + 'abc' + chr(39), [('ab', 'c'), ('a', 'b')], DUCKDB)}"
    ).fetchone()[0]
    assert n == 2


def test_bpe_encode_duplicate_rank_fires_on_recreated_pair():
    """A pair can appear TWICE in a merge table (training can re-learn a
    pair after later merges recreate it). The chain applies both passes;
    with [(ab,c), (a,b), (x,y), (ab,c)] over 'abc': pass 0 no-op, pass 1
    -> [ab, c], pass 3 -> [abc]. The tokenizer's rank_lists must queue
    the SECOND rank when the pair is created after the first has passed
    — a first-rank-only map would stop at ['ab','c']."""
    from pgvectorscale_spark.functions.text import _bpe_encode_word

    merges = [("ab", "c"), ("a", "b"), ("x", "y"), ("ab", "c")]
    table = [(a, b, a + b) for a, b in merges]
    rl: dict = {}
    for i, (a, b) in enumerate(merges):
        rl.setdefault((a, b), []).append(i)
    fr = {p: lst[0] for p, lst in rl.items()}
    assert _bpe_encode_word("abc", fr, rl, table) == ["abc"]
    from pgvectorscale_spark.functions.text import bpe_merged_token_count_sql as mc

    n = duckdb.sql(
        f"SELECT {mc(chr(39) + 'abc' + chr(39), merges, DUCKDB)}"
    ).fetchone()[0]
    assert n == 1


def test_seeded_property_fuzz_encode_and_train():
    """Seeded property fuzz (round 13, committing the r12 self-review
    sweep): 200 random (word, merge-table) trials against the literal
    replace-chain reference and 200 random (corpus, num_merges,
    min_pair_freq) trials against the naive recount trainer. Tables are
    drawn over an EVOLVING symbol set so compound symbols, duplicate
    pairs, and recreated-pair chains all occur; the alphabet is tiny so
    collisions are dense. Deterministic (fixed seed), < 10 s."""
    import random

    from pgvectorscale_spark.functions.text import _bpe_encode_word, train_bpe_local

    rng = random.Random(0xB9E)
    alphabet = "abcde"

    def ref_apply_word(word: str, merges) -> list[str]:
        syms = list(word)
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
        return syms

    dup_tables = 0
    for _ in range(200):
        word = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        symbols = list(alphabet)
        merges: list[tuple[str, str]] = []
        for _ in range(rng.randint(1, 12)):
            a, b = rng.choice(symbols), rng.choice(symbols)
            merges.append((a, b))
            if a + b not in symbols:
                symbols.append(a + b)
        if len(set(merges)) < len(merges):
            dup_tables += 1
        table = [(a, b, a + b) for a, b in merges]
        rl: dict = {}
        for i, (a, b) in enumerate(merges):
            rl.setdefault((a, b), []).append(i)
        fr = {p: lst[0] for p, lst in rl.items()}
        got = _bpe_encode_word(word, fr, rl, table)
        want = ref_apply_word(word, merges)
        assert got == want, (word, merges, got, want)
    assert dup_tables >= 20  # the generator actually exercises duplicates

    for _ in range(200):
        texts = [
            " ".join(
                "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(3, 12))
            )
            for _ in range(rng.randint(2, 6))
        ]
        num_merges = rng.randint(1, 20)
        mpf = rng.choice([1, 2, 3])
        freqs: dict[str, int] = {}
        for t in texts:
            for w in ref_pretokenize(t):
                freqs[w] = freqs.get(w, 0) + 1
        got_m = train_bpe_local(freqs, num_merges, min_pair_freq=mpf)
        want_m = ref_train_bpe(texts, num_merges, min_pair_freq=mpf)
        assert got_m == want_m, (texts, num_merges, mpf, got_m, want_m)
