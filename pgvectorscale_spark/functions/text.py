"""Text-analysis column functions for large-scale training-data pipelines.

All of these are pure JVM-side column expressions (no UDFs): token counting,
quality scoring, n-gram-heuristic language ID, and rolling-hash document
fingerprinting. Each has a DuckDB twin assembled from the same fragments so
the driver's oracle hash-matches (functions/hashing.py pattern).
"""

from __future__ import annotations

import re as _RE

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pgvectorscale_spark.functions.hashing import (
    DUCKDB,
    SPARK,
    rolling_fingerprint,
    tokens,
    word_shingles,
)

# Marker tokens per language for the n-gram/stopword language-ID heuristic.
# Disjoint lists; ties broken by language name ascending ('unknown' if no hits).
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht", "ist"],
    "en": ["the", "and", "of", "to", "is", "in"],
    "es": ["el", "la", "los", "que", "es", "por"],
    "fr": ["le", "les", "et", "est", "pour", "dans"],
}

EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "on", "for"]
PUNCT_CLASS = r"[.,!?;:]"


def token_count(text: Column) -> Column:
    """Whitespace token count (the BPE-ish pre-tokenizer building block)."""
    return F.size(F.split(text, " "))


def token_count_sql(text_expr: str, dialect: str) -> str:
    if dialect == SPARK:
        return f"size({tokens(text_expr, SPARK)})"
    return f"len({tokens(text_expr, DUCKDB)})"


def punct_ratio_sql(text_expr: str, dialect: str) -> str:
    """Punctuation density in integer permille.

    All ratio outputs use integer permille + integer division: float
    rounding at half-way boundaries differs across engines (HALF_UP vs
    HALF_EVEN), integer arithmetic is exact by construction.
    """
    if dialect == SPARK:
        clean = f"regexp_replace({text_expr}, '{PUNCT_CLASS}', '')"
        return (
            f"cast((length({text_expr}) - length({clean})) * 1000 as bigint) "
            f"div greatest(length({text_expr}), 1)"
        )
    clean = f"regexp_replace({text_expr}, '{PUNCT_CLASS}', '', 'g')"
    return (
        f"(((length({text_expr}) - length({clean})) * 1000)::BIGINT "
        f"// greatest(length({text_expr}), 1))"
    )


def _marker_count_sql(toks_expr: str, markers: list[str], dialect: str) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    if dialect == SPARK:
        return f"size(filter({toks_expr}, t -> t in ({lst})))"
    return f"len(list_filter({toks_expr}, t -> t in ({lst})))"


def stopword_ratio_sql(text_expr: str, dialect: str) -> str:
    """English-stopword density in integer permille."""
    toks = tokens(text_expr, dialect)
    cnt = _marker_count_sql(toks, EN_STOPWORDS, dialect)
    if dialect == SPARK:
        return f"cast({cnt} * 1000 as bigint) div greatest(size({toks}), 1)"
    return f"(({cnt} * 1000)::BIGINT // greatest(len({toks}), 1))"


def quality_score_sql(text_expr: str, dialect: str) -> str:
    """Composite quality score in integer micro-units [0, 1_000_000]:
    500×length-permille (tokens capped at 100 → ×10) + 500×min(5×stopword
    permille, 1000) − 250×punct permille. Pure integer arithmetic."""
    n = token_count_sql(text_expr, dialect)
    sw = stopword_ratio_sql(text_expr, dialect)
    pr = punct_ratio_sql(text_expr, dialect)
    length_permille = f"least({n} * 10, 1000)"
    return (
        f"cast(500 * {length_permille} + 500 * least(({sw}) * 5, 1000) "
        f"- 250 * ({pr}) as bigint)"
    )


def _argmax_case_sql(scores: dict[str, str], default: str = "unknown") -> str:
    """CASE cascade returning the key with the largest score expression;
    ties break by key ascending; all-zero scores → ``default``. Identical
    text in both engines (no engine-specific argmax builtins)."""
    keys = sorted(scores)  # ascending = tie-break order
    cases = []
    for i, k in enumerate(keys):
        conds = [f"{scores[k]} > 0"]
        for j, other in enumerate(keys):
            if i == j:
                continue
            op = ">=" if j > i else ">"
            conds.append(f"{scores[k]} {op} {scores[other]}")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{k}'")
    return "CASE " + " ".join(cases) + f" ELSE '{default}' END"


def lang_id_sql(text_expr: str, dialect: str) -> str:
    """Argmax of per-language marker-token votes; ties → language name asc;
    zero votes → 'unknown'. A CASE cascade keeps it identical across engines."""
    toks = tokens(text_expr, dialect)
    counts = {lang: _marker_count_sql(toks, m, dialect) for lang, m in LANG_MARKERS.items()}
    return _argmax_case_sql(counts)


def train_lang_profiles(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    top_n: int = 16,
) -> dict[str, list[tuple[str, int]]]:
    """Per-language character-trigram profiles from a labeled slice — the
    Cavnar-Trenkle-style upgrade over the marker-token vote (lang_id_sql):
    profiles are LEARNED from data, so coverage follows the corpus instead
    of a hand-picked word list.

    One distributed pass: lowercase text → all char trigrams (explode) →
    count per (lang, trigram) with map-side partial agg → per-language
    top_n by (count desc, trigram asc) → weight = integer micro-frequency
    (1e6 * count / language-total). The profile table is tiny
    (languages x top_n rows) and collects to the driver; at 100 TB the
    training pass is the same explode+groupBy shape as any token count.

    Returns {lang: [(trigram, weight_micro), ...]} with entries in
    (weight desc, trigram asc) order — deterministic, so a trained
    profile can be frozen as a constant (FROZEN_LANG_PROFILES) and
    replayed as a static expression in any engine."""
    lc = f"lower(`{text_col}`)"
    tri = (
        f"CASE WHEN length({lc}) >= 3 THEN "
        f"transform(sequence(1, length({lc}) - 2), i -> substring({lc}, i, 3)) "
        "ELSE cast(array() as array<string>) END"
    )
    grams = df.select(
        F.col(lang_col).alias("lang"), F.explode(F.expr(tri)).alias("tri")
    )
    counts = grams.groupBy("lang", "tri").agg(F.count("*").alias("c"))
    totals = grams.groupBy("lang").agg(F.count("*").alias("t"))
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("tri"))
    rows = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(top_n))
        .join(totals, "lang")
        .select(
            "lang",
            "tri",
            ((F.col("c") * F.lit(1_000_000)) / F.col("t")).cast("long").alias("w"),
        )
        .collect()
    )
    profiles: dict[str, list[tuple[str, int]]] = {}
    for r in sorted(rows, key=lambda r: (r["lang"], -int(r["w"]), r["tri"])):
        profiles.setdefault(r["lang"], []).append((r["tri"], int(r["w"])))
    return profiles


def lang_profile_scores_sql(
    text_expr: str, profiles: dict[str, list[tuple[str, int]]], dialect: str
) -> dict[str, str]:
    """Per-language profile scores as closed-form SQL: score(lang) =
    sum over the profile's trigrams of occurrences(trigram) x weight.
    Occurrences count non-overlapping left-to-right matches via
    (length - length(replace(...))) / 3 — replace() semantics are
    identical in Spark and DuckDB, so the measure is engine-exact.
    Integer arithmetic throughout (micro weights x counts); embed the
    returned expressions once in an inner SELECT and run the argmax
    (``_argmax_case_sql`` over the score column names) outside, so each
    score is computed once, not once per CASE comparison."""
    lc = f"lower({text_expr})"
    div = "div" if dialect == SPARK else "//"
    out: dict[str, str] = {}
    for lang, entries in sorted(profiles.items()):
        terms = [
            f"((length({lc}) - length(replace({lc}, {_sql_str(tri, dialect)}, ''))) {div} 3) * {int(w)}"
            for tri, w in entries
        ]
        body = " + ".join(terms) if terms else "0"
        out[lang] = (
            f"cast({body} as bigint)" if dialect == SPARK else f"(({body})::BIGINT)"
        )
    return out


def lang_id_profile_sql(score_cols: dict[str, str]) -> str:
    """Argmax over ALREADY-COMPUTED score columns ({lang: column_name}):
    ties → language ascending, all-zero → 'unknown'. Same cascade text in
    both engines."""
    return _argmax_case_sql(dict(score_cols))


def document_fingerprint_sql(text_expr: str, dialect: str) -> str:
    return rolling_fingerprint(text_expr, dialect)


# ---------------------------------------------------------------------------
# Gopher-style quality-filter RULES (Rae et al. 2021 §A1.1 shape, thresholds
# tuned to the synthetic corpus so both verdicts occur at driver SF). Every
# rule is integer-exact (permille + integer division — no float rounding
# seams between engines) and map-side (per-row array expressions, no
# shuffle): the 100 TB quality gate pipelines into the scan that feeds it.
# ---------------------------------------------------------------------------

QUALITY_THRESHOLDS = {
    "min_tokens": 40,  # Gopher: 50 words; corpus docs run 10-99
    "max_tokens": 100_000,
    "min_mean_word_len_pm": 3_000,  # Gopher: mean word length in [3, 10]
    "max_mean_word_len_pm": 10_000,
    "min_stopwords": 2,  # Gopher: >= 2 of a small English stopword list
    "min_alpha_token_pm": 800,  # Gopher: >= 80% words with an alphabetic char
    "max_top_token_pm": 90,  # repetition: most frequent token <= 9%
    "max_dup_3gram_pm": 30,  # repetition: duplicate 3-gram share <= 3%
}


def quality_rule_sqls(text_expr: str, dialect: str) -> dict[str, str]:
    """Each named rule as a boolean SQL expression (same formula in both
    engines); compose with AND for the overall verdict
    (:func:`quality_passes_sql`)."""
    th = QUALITY_THRESHOLDS
    toks = tokens(text_expr, dialect)
    if dialect == SPARK:
        n = f"size({toks})"
        charsum = f"aggregate({toks}, 0, (acc, t) -> acc + length(t))"
        alpha = f"size(filter({toks}, t -> t rlike '[A-Za-z]'))"
        top = (
            f"array_max(transform(array_distinct({toks}), "
            f"d -> size(filter({toks}, t -> t = d))))"
        )
        g3 = word_shingles(toks, 3, SPARK)
        dup3 = f"(size({g3}) - size(array_distinct({g3}))) * 1000 div size({g3})"
        div = "div"
    else:
        n = f"len({toks})"
        charsum = f"list_sum(list_transform({toks}, t -> length(t)))"
        alpha = f"len(list_filter({toks}, t -> regexp_matches(t, '[A-Za-z]')))"
        top = (
            f"list_max(list_transform(list_distinct({toks}), "
            f"d -> len(list_filter({toks}, t -> t = d))))"
        )
        g3 = word_shingles(toks, 3, DUCKDB)
        dup3 = f"(len({g3}) - len(list_distinct({g3}))) * 1000 // len({g3})"
        div = "//"
    sw = _marker_count_sql(toks, EN_STOPWORDS, dialect)
    mwl = f"({charsum}) * 1000 {div} greatest({n}, 1)"
    return {
        "r_token_count": f"{n} >= {th['min_tokens']} AND {n} <= {th['max_tokens']}",
        "r_mean_word_len": (
            f"({mwl}) >= {th['min_mean_word_len_pm']} "
            f"AND ({mwl}) <= {th['max_mean_word_len_pm']}"
        ),
        "r_stopwords": f"{sw} >= {th['min_stopwords']}",
        "r_alpha_tokens": f"({alpha}) * 1000 {div} greatest({n}, 1) >= {th['min_alpha_token_pm']}",
        "r_top_token": f"({top}) * 1000 {div} greatest({n}, 1) <= {th['max_top_token_pm']}",
        "r_dup_3gram": f"({dup3}) <= {th['max_dup_3gram_pm']}",
    }


def quality_passes_sql(text_expr: str, dialect: str) -> str:
    """The overall Gopher-gate verdict: AND of every rule."""
    rules = quality_rule_sqls(text_expr, dialect)
    return "(" + ") AND (".join(rules[k] for k in sorted(rules)) + ")"


# ASCII-class BPE-style pre-tokenizer: letter runs, digit runs, and single
# punctuation marks each become one token (the GPT-2 pre-tokenizer shape,
# ASCII-restricted so Java and RE2 regex semantics agree exactly).
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_tokens_sql(text_expr: str, dialect: str) -> str:
    if dialect == SPARK:
        return f"regexp_extract_all({text_expr}, '{BPE_PATTERN}', 0)"
    return f"regexp_extract_all({text_expr}, '{BPE_PATTERN}')"


def bpe_token_count_sql(text_expr: str, dialect: str) -> str:
    if dialect == SPARK:
        return f"cast(size({bpe_tokens_sql(text_expr, SPARK)}) as bigint)"
    return f"len({bpe_tokens_sql(text_expr, DUCKDB)})::BIGINT"


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach all text-analysis features as columns (JVM-side expressions)."""
    t = text_col
    return (
        df.withColumn("token_count", F.expr(token_count_sql(t, SPARK)))
        .withColumn("punct_permille", F.expr(punct_ratio_sql(t, SPARK)))
        .withColumn("stopword_permille", F.expr(stopword_ratio_sql(t, SPARK)))
        .withColumn("quality_micro", F.expr(quality_score_sql(t, SPARK)))
        .withColumn("lang_id", F.expr(lang_id_sql(t, SPARK)))
        .withColumn("fingerprint", F.expr(document_fingerprint_sql(t, SPARK)))
    )


# ---------------------------------------------------------------------------
# Distributed BPE vocabulary TRAINING (the merge-table learner; the
# pre-tokenizer above only counts). Classic Sennrich-style BPE re-expressed
# as a Spark aggregation loop: the corpus compresses to a (word, freq)
# table once, then each merge step is one pair-count aggregation (map-side
# combine over the distinct-word table, never the raw corpus) plus a
# broadcast of the single winning pair baked into a fold expression.
# ---------------------------------------------------------------------------

# Symbol/word separators for the flat-string APPLY representation: every
# symbol is wrapped as SEP+sym+SEP and words join with WORD_SEP, so a merge
# (x, y) -> xy is exactly replace(SEP x SEP SEP y SEP -> SEP xy SEP); SQL
# replace() scans left-to-right non-overlapping, which IS the BPE greedy
# pass, and the WORD_SEP breaks the SEP SEP adjacency so merges can never
# cross word boundaries. Control characters are stripped from the input
# first, so corpus text can never forge a boundary.
BPE_SYM_SEP = "\x1f"
BPE_WORD_SEP = "\x1e"


def _sql_str(s: str, dialect: str) -> str:
    """String literal for the dialect (Spark escapes backslashes)."""
    body = s.replace("'", "''")
    if dialect == SPARK:
        body = s.replace("\\", "\\\\").replace("'", "\\'")
    return f"'{body}'"


def bpe_wrapped_sql(text_expr: str, dialect: str) -> str:
    """Char-decomposed symbol string: pre-tokenize, wrap every character c
    as SEP c SEP, join words with WORD_SEP (see separator notes above)."""
    strip = f"[{BPE_SYM_SEP}{BPE_WORD_SEP}]"
    clean = (
        f"regexp_replace({text_expr}, '{strip}', '')"
        if dialect == SPARK
        else f"regexp_replace({text_expr}, '{strip}', '', 'g')"
    )
    toks = bpe_tokens_sql(clean, dialect)
    if dialect == SPARK:
        wrap = f"regexp_replace(w, '(.)', '{BPE_SYM_SEP}$1{BPE_SYM_SEP}')"
        return f"array_join(transform({toks}, w -> {wrap}), '{BPE_WORD_SEP}')"
    wrap = f"regexp_replace(w, '(.)', '{BPE_SYM_SEP}\\1{BPE_SYM_SEP}', 'g')"
    return f"array_to_string(list_transform({toks}, w -> {wrap}), '{BPE_WORD_SEP}')"


def bpe_apply_sql(text_expr: str, merges: list[tuple[str, str]], dialect: str) -> str:
    """Apply a learned merge table in order as a flat replace() chain —
    identical greedy semantics in Spark and DuckDB, no lambdas."""
    s = bpe_wrapped_sql(text_expr, dialect)
    sep = BPE_SYM_SEP
    for a, b in merges:
        pat = _sql_str(f"{sep}{a}{sep}{sep}{b}{sep}", dialect)
        rep = _sql_str(f"{sep}{a}{b}{sep}", dialect)
        s = f"replace({s}, {pat}, {rep})"
    return s


def bpe_merged_token_count_sql(
    text_expr: str, merges: list[tuple[str, str]], dialect: str
) -> str:
    """Token count under a learned merge table: symbols remaining after the
    replace chain = SEP occurrences / 2 (each symbol carries exactly two)."""
    s = bpe_apply_sql(text_expr, merges, dialect)
    seps = f"length({s}) - length(replace({s}, '{BPE_SYM_SEP}', ''))"
    if dialect == SPARK:
        return f"cast({seps} as bigint) div 2"
    return f"(({seps})::BIGINT // 2)"


def _bpe_stability_prefix(
    top: list, limit: int, min_pair_freq: int
) -> list[tuple[str, str, str, int]]:
    """Maximal PREFIX of the (count desc, a, b)-ordered pair table whose
    members are mutually count-stable: candidate q=(qa,qb) is accepted
    only if, for every previously accepted winner w=(wa,wb)->wc:

      qb != wa   (applying w consumes 'wa' occurrences preceded by
                  anything — pairs ending in wa can shrink)
      qa != wb   (pairs starting with wb can shrink)
      qa != wc and qb != wc  (pairs touching the merged symbol can GROW
                  when wc coincides with an existing symbol string)

    Under these, applying w leaves q's count bit-identical — so every
    accepted winner's count is still its true count at its turn. The scan
    STOPS (not skips) at the first violation: the prefix property is what
    makes the batch equal the sequential order (any pair ahead of an
    accepted winner in the sort is itself an accepted winner, so nothing
    unapplied can outrank it)."""
    accepted: list[tuple[str, str, str, int]] = []
    for r in top:
        a, b, c = r["a"], r["b"], int(r["c"])
        if c < min_pair_freq or len(accepted) >= limit:
            break
        if any(
            b == wa or a == wb or a == wc or b == wc
            for wa, wb, wc, _ in accepted
        ):
            break
        accepted.append((a, b, a + b, c))
    return accepted


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 16,
    min_pair_freq: int = 2,
    batch_merges: int = 8,
    stats: dict | None = None,
) -> list[tuple[str, str]]:
    """Learn a BPE merge table from a corpus, distributed.

    Classic byte-pair encoding (the public Sennrich et al. recipe): the
    corpus is pre-tokenized (BPE_PATTERN) and compressed to a distinct
    (word-symbol-array, frequency) table — ONE pass over the raw corpus,
    everything after runs on the distinct-word table (Heaps' law: tiny
    next to 100 TB of text). Each ROUND:

    1. pair counts: explode adjacent symbol pairs weighted by word
       frequency (overlapping positions count, as in the reference
       implementation), groupBy pair with map-side partial aggregation,
       collect the top candidates in (count desc, a, b) order;
    2. batch selection: take the maximal mutually count-stable PREFIX
       (``_bpe_stability_prefix``), then shrink it by the created-pair
       bound below so the batch provably equals applying its members one
       at a time with a recount in between;
    3. apply: ALL accepted winners are baked into ONE greedy
       left-to-right fold expression (JVM-side `aggregate`) over every
       word's symbols.

    Why the batch equals the sequential trainer (the parity argument —
    pytest checks it against a from-scratch single-node reference):

    - Accepted winners form a prefix of the sort order and are mutually
      count-stable, so at winner i's turn every pair still ahead of it is
      an already-applied earlier winner (whose count fell to 0).
    - The only pairs whose counts can RISE are the ones a merge CREATES:
      merging w=(a,b)->ab creates (x,ab) and (ab,y), and each created
      occurrence comes from an adjacent triple (x,a,b) / (a,b,y) in the
      pre-merge corpus. So max raw triple count through w is an upper
      bound on any created pair's count; winner i is kept only while
      count_i strictly exceeds every earlier winner's bound (one extra
      filtered-triple aggregation per round, and only when the stability
      prefix has >= 2 members).
    - Within one fold pass, two accepted winners can never match
      overlapping positions (that would need qa == wb or qb == wa), and
      a merged symbol can never feed another winner (qa/qb != wc), so
      the single pass IS the sequential application of the batch.

    The realized batch width is what exact parity permits: merges on
    natural text CASCADE (merging (t,h) creates (th,e), which often
    outranks the would-be next batch member), so the bound stops the
    batch exactly where sequential order demands — measured ~1.7x fewer
    driver round-trips on the synthetic test corpus, NOT batch_merges x.
    The tempting alternative (top-N pairwise symbol-DISJOINT winners, no
    created-pair bound) batches ~Nx but silently reorders the merge
    list — it diverges from sequential within 64 merges on the sf0.001
    corpus (pinned by tests/test_bpe_train.py::
    test_disjoint_only_batching_diverges), which changes the learned
    vocabulary. Exactness is kept; the round-trip reduction is the
    bonus. ``batch_merges=1`` reproduces the plain sequential trainer.
    Stops early when no pair reaches
    ``min_pair_freq`` (same rule as sequential: the round's global best
    is below the floor). Returns the merge list in learned order; pass
    ``stats={}`` to receive {"rounds": int, "batch_sizes": [int, ...]}.
    Lineage is truncated every 4 rounds (localCheckpoint) so hundreds of
    merges don't accumulate a deep plan.
    """
    # one shared histogram pipeline (bpe_word_histogram) feeds both this
    # trainer and the driver-side one, so the tokenize/aggregate step
    # cannot drift between them
    words = bpe_word_histogram(df, text_col).select(
        F.expr("regexp_extract_all(word, '.', 0)").alias("syms"), "freq"
    )
    words = words.persist()
    words.count()
    merges: list[tuple[str, str]] = []
    pair_arr = (
        "CASE WHEN size(syms) >= 2 THEN transform(sequence(1, size(syms) - 1), "
        "i -> struct(element_at(syms, i) as a, element_at(syms, i + 1) as b)) "
        "ELSE cast(array() as array<struct<a:string,b:string>>) END"
    )
    rounds = 0
    batch_sizes: list[int] = []
    try:
        while len(merges) < num_merges:
            limit = min(int(batch_merges), num_merges - len(merges))
            top = (
                words.select("freq", F.explode(F.expr(pair_arr)).alias("p"))
                .groupBy("p.a", "p.b")
                .agg(F.sum("freq").alias("c"))
                .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
                .limit(max(limit * 4, 8))
                .collect()
            )
            if not top or top[0]["c"] < min_pair_freq:
                break
            rounds += 1
            batch = _bpe_stability_prefix(top, limit, min_pair_freq)
            if len(batch) > 1:
                # created-pair bounds: for each candidate winner (a,b),
                # the largest raw adjacent-triple count through it —
                # max_x count(x,a,b) and max_y count(a,b,y) — bounds any
                # pair its merge can create. The candidate filter runs
                # INSIDE the per-word lambda (before any explode), so the
                # aggregation sees only the few positions touching a
                # candidate, not every 3-gram in the corpus.
                keys = "array(" + ", ".join(
                    f"named_struct('a', {_sql_str(wa, SPARK)}, "
                    f"'b', {_sql_str(wb, SPARK)})"
                    for wa, wb, _, _ in batch
                ) + ")"
                matches = (
                    "CASE WHEN size(syms) >= 3 THEN flatten(transform("
                    "sequence(1, size(syms) - 2), i -> filter(array("
                    # winner at (i+1, i+2): created pair (syms[i], wc)
                    "named_struct('p', named_struct("
                    "'a', element_at(syms, i + 1), 'b', element_at(syms, i + 2)), "
                    "'other', element_at(syms, i)), "
                    # winner at (i, i+1): created pair (wc, syms[i+2])
                    "named_struct('p', named_struct("
                    "'a', element_at(syms, i), 'b', element_at(syms, i + 1)), "
                    "'other', concat('\\u0001', element_at(syms, i + 2)))"
                    f"), m -> array_contains({keys}, m.p)))) "
                    "ELSE cast(array() as array<struct<"
                    "p:struct<a:string,b:string>,other:string>>) END"
                )
                bound_of = {
                    (r["a"], r["b"]): int(r["m"])
                    for r in words.select(
                        "freq", F.explode(F.expr(matches)).alias("m")
                    )
                    .groupBy("m.p.a", "m.p.b", "m.other")
                    .agg(F.sum("freq").alias("n"))
                    .groupBy("a", "b")
                    .agg(F.max("n").alias("m"))
                    .collect()
                }
                kept = [batch[0]]
                max_bound = bound_of.get((batch[0][0], batch[0][1]), 0)
                for wa, wb, wc, c in batch[1:]:
                    if c <= max_bound:
                        break  # a created pair could outrank this winner
                    kept.append((wa, wb, wc, c))
                    max_bound = max(max_bound, bound_of.get((wa, wb), 0))
                batch = kept
            merges.extend((wa, wb) for wa, wb, _, _ in batch)
            batch_sizes.append(len(batch))
            whens = " ".join(
                f"WHEN size(acc) > 0 AND element_at(acc, -1) = "
                f"{_sql_str(wa, SPARK)} AND s = {_sql_str(wb, SPARK)} "
                f"THEN concat(slice(acc, 1, size(acc) - 1), "
                f"array({_sql_str(wc, SPARK)}))"
                for wa, wb, wc, _ in batch
            )
            fold = (
                "aggregate(syms, cast(array() as array<string>), (acc, s) -> "
                f"CASE {whens} ELSE concat(acc, array(s)) END)"
            )
            new_words = words.select(F.expr(fold).alias("syms"), "freq").persist()
            new_words.count()
            words.unpersist()
            words = new_words
            if rounds % 4 == 0:
                cp = words.localCheckpoint(eager=True)
                words.unpersist()
                words = cp
    finally:
        try:
            words.unpersist()
        except Exception:
            pass
    if stats is not None:
        stats["rounds"] = rounds
        stats["batch_sizes"] = batch_sizes
    return merges


# Merge table learned by train_bpe on the sf0.001 documents corpus
# (num_merges=12) and FROZEN here so the driver's tagged-union apply is a
# static, engine-replayable expression at any SF. test_bpe_train.py pins
# this constant to a live training run, so trainer and constant cannot
# drift apart silently. Note the multi-level merges ('p','ar'), ('m','er'):
# they only tokenize correctly if earlier merges were applied in order.
FROZEN_BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"), ("l", "u"),
    ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"), ("a", "n"), ("c", "an"),
)


# ---------------------------------------------------------------------------
# Scale-true BPE (round 12): the distributed trainer above is EXACT but
# driver-round-bound (~num_merges/1.7 synchronized Spark jobs — a 32k
# vocabulary would be ~16k+ rounds), and the replace-chain APPLY is
# O(merges) scans per row. The standard production design (what
# sentencepiece/HF tokenizers actually do) splits the work differently:
#
# - TRAINING folds over the distinct (pre-token, frequency) histogram,
#   which is Heaps-sublinear in corpus size — ONE distributed pass builds
#   it, it fits on the driver at any corpus scale (hundreds of millions of
#   distinct pre-tokens would still be gigabytes, and real crawl corpora
#   sit far below that), and the full merge loop runs driver-side with
#   incremental pair-count maintenance (train_bpe_local): no further
#   cluster round-trips, 32k merges in seconds.
# - APPLY processes each row's words ONCE with a rank-heap tokenizer
#   (bpe_encode) — O(applied merges) per word, independent of the merge
#   table length — instead of one full-string scan per merge.
#
# Both are pytest-pinned to the exact forms they replace: the histogram
# trainer must equal train_bpe AND the sequential single-node reference
# merge-for-merge at depth >= 256, and the rank-heap tokenizer must equal
# the bpe_apply_sql replace chain token-for-token (including the
# subtle no-revisit rule the chain implies — see bpe_encode).
# ---------------------------------------------------------------------------


def bpe_word_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The distinct (pre-token, frequency) table — the ONE distributed
    pass BPE training needs. explode + groupBy with map-side combine;
    output size follows Heaps' law, not corpus size."""
    return (
        df.select(F.expr(bpe_tokens_sql(f"`{text_col}`", SPARK)).alias("_ws"))
        .select(F.explode("_ws").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def train_bpe_local(
    word_freqs: dict[str, int],
    num_merges: int,
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Single-node BPE merge loop over a word-frequency histogram —
    merge-for-merge identical to the naive Sennrich recount loop (and
    therefore to the distributed ``train_bpe``), but with incremental
    pair-count maintenance so a 32k vocabulary trains in seconds:

    - ``pair_counts``/``where`` index every adjacent pair's corpus count
      (overlapping positions counted, as everywhere in this module) and
      the set of words containing it;
    - each merge touches ONLY the words that contain the winning pair:
      their old pair contributions are subtracted, the pair is merged
      left-to-right, the new contributions added back;
    - the arg-max is a lazy max-heap keyed (count desc, a asc, b asc) —
      every count CHANGE pushes a fresh entry, stale entries are skipped
      at pop time by comparing against the live count (the entry that
      matches the live count sits at the correct heap position by
      construction). When a popped entry is live but below
      ``min_pair_freq``, every remaining live count is too (heap order),
      so training stops — the same floor rule as the recount loop.
    """
    import heapq

    words: list[list[str]] = []
    freqs: list[int] = []
    for w, f in word_freqs.items():
        words.append(list(w))
        freqs.append(int(f))
    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for idx, (syms, f) in enumerate(zip(words, freqs)):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + f
            where.setdefault(p, set()).add(idx)
    heap = [(-c, a, b) for (a, b), c in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges and heap:
        neg, a, b = heapq.heappop(heap)
        c = -neg
        if pair_counts.get((a, b), 0) != c:
            continue  # stale: the live count was re-pushed when it changed
        if c < min_pair_freq:
            break  # heap max is live and below the floor -> nothing qualifies
        merges.append((a, b))
        ab = a + b
        touched: set[tuple[str, str]] = set()
        for idx in list(where.get((a, b), ())):
            syms, f = words[idx], freqs[idx]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] -= f
                touched.add(p)
                s = where.get(p)
                if s is not None:
                    s.discard(idx)
            out: list[str] = []
            i, n = 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[idx] = out
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + f
                touched.add(p)
                where.setdefault(p, set()).add(idx)
        for p in touched:
            c2 = pair_counts.get(p, 0)
            if c2 <= 0:
                pair_counts.pop(p, None)
                where.pop(p, None)
            else:
                heapq.heappush(heap, (-c2, p[0], p[1]))
    return merges


def train_bpe_histogram(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 16,
    min_pair_freq: int = 2,
    stats: dict | None = None,
) -> list[tuple[str, str]]:
    """Scale-true BPE training: ONE distributed pass builds the distinct
    word-frequency histogram (``bpe_word_histogram``), the driver
    collects it (Heaps-sublinear — this is why sentencepiece/HF train on
    word counts), and ``train_bpe_local`` runs the full merge loop with
    zero further cluster round-trips. Merge-for-merge identical to the
    distributed ``train_bpe`` (which stays as the exactness twin) and to
    the sequential single-node reference — pytest asserts the three-way
    parity at depth >= 256. Pass ``stats={}`` to receive
    {"distinct_words": int}."""
    hist = {
        r["word"]: int(r["freq"])
        for r in bpe_word_histogram(df, text_col).collect()
    }
    if stats is not None:
        stats["distinct_words"] = len(hist)
    return train_bpe_local(hist, num_merges, min_pair_freq)


def _bpe_encode_word(
    word: str,
    first_rank: dict[tuple[str, str], int],
    rank_lists: dict[tuple[str, str], list[int]],
    table: list[tuple[str, str, str]],
) -> list[str]:
    """Tokenize ONE pre-token with EXACTLY the replace-chain semantics —
    merges in list order, each applied in one full left-to-right pass,
    never revisited — but in O(applied merges) instead of O(len(table)):

    ranks of pairs PRESENT in the word go on a min-heap; popping rank r
    applies that merge's pass. A merge can only create pairs adjacent to
    its merged symbol, and a created pair queues ONLY ranks > r: the
    chain has already passed ranks <= r and never revisits them (pinned
    by test — a naive 'merge the lowest-rank present pair, re-adding
    lower ranks' tokenizer diverges from the chain on recreated pairs).
    Stale heap entries (pair destroyed before its turn) cost one
    no-change scan and are dropped. ``rank_lists`` carries EVERY rank of
    a pair that appears multiple times in the table (a pair can be
    re-learned after later merges recreate it), so the second occurrence
    still fires if the pair is recreated past the first."""
    import bisect
    import heapq

    syms = list(word)
    if len(syms) < 2:
        return syms
    heap = []
    seen0 = set()
    for i in range(len(syms) - 1):
        r = first_rank.get((syms[i], syms[i + 1]))
        if r is not None and r not in seen0:
            seen0.add(r)
            heap.append(r)
    heapq.heapify(heap)
    prev = -1
    while heap:
        r = heapq.heappop(heap)
        if r == prev:
            continue
        prev = r
        a, b, ab = table[r]
        out: list[str] = []
        i, n = 0, len(syms)
        changed = False
        while i < n:
            if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                out.append(ab)
                i += 2
                changed = True
            else:
                out.append(syms[i])
                i += 1
        if not changed:
            continue  # stale entry: the pair was consumed before its turn
        syms = out
        queued: set[int] = set()
        for i in range(len(syms) - 1):
            if syms[i] == ab or syms[i + 1] == ab:
                p = (syms[i], syms[i + 1])
                lst = rank_lists.get(p)
                if lst is None:
                    continue
                # smallest rank of this pair STRICTLY ahead of r — the
                # chain never revisits a passed rank
                j = bisect.bisect_right(lst, r)
                if j < len(lst) and lst[j] not in queued:
                    queued.add(lst[j])
                    heapq.heappush(heap, lst[j])
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    cache_cap: int = 1 << 20,
) -> DataFrame:
    """Engine-path BPE APPLY: tokenize ``text_col`` under a learned merge
    table in ONE pass per word (Arrow-batched pandas UDF around
    ``_bpe_encode_word``) — cost O(applied merges) per word, independent
    of the table length, where the engine-replayable
    ``bpe_apply_sql`` replace chain costs O(len(merges)) full-string
    scans per row (fine at the 12 frozen merges the driver oracle
    replays, unusable at a 32k vocabulary). Token-for-token identical to
    the chain — pytest pins the parity on FROZEN_BPE_MERGES and on
    adversarial recreated-pair tables.

    Adds ``out_col`` (array<string>, the concatenated per-word token
    sequences; NULL text stays NULL like the SQL form). Per-task word
    cache (capped at ``cache_cap`` entries): within a batch the distinct
    words are Heaps-sublinear, so most rows tokenize from the cache."""
    from pyspark.sql.functions import pandas_udf

    table = [(a, b, a + b) for a, b in merges]
    rank_lists: dict[tuple[str, str], list[int]] = {}
    for i, (a, b, _) in enumerate(table):
        rank_lists.setdefault((a, b), []).append(i)
    first_rank = {p: lst[0] for p, lst in rank_lists.items()}
    strip = _RE.compile(f"[{BPE_SYM_SEP}{BPE_WORD_SEP}]")
    pat = _RE.compile(BPE_PATTERN)
    cache: dict[str, list[str]] = {}

    def encode_text(text):
        if text is None:
            return None
        out: list[str] = []
        for w in pat.findall(strip.sub("", text)):
            toks = cache.get(w)
            if toks is None:
                toks = _bpe_encode_word(w, first_rank, rank_lists, table)
                if len(cache) < cache_cap:
                    cache[w] = toks
            out.extend(toks)
        return out

    @pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        return texts.map(encode_text)

    return df.withColumn(out_col, enc(F.col(text_col)))


def bpe_encode_count(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_token_count",
) -> DataFrame:
    """Token COUNT under the merge table via the one-pass tokenizer —
    the scale form of ``bpe_merged_token_count_sql`` (NULL text -> NULL
    count, like the SQL twin)."""
    tmp = f"_bpe_toks_{out_col}"
    return (
        bpe_encode(df, merges, text_col=text_col, out_col=tmp)
        .withColumn(
            out_col,
            F.when(F.col(tmp).isNotNull(), F.size(F.col(tmp)).cast("long")),
        )
        .drop(tmp)
    )


# Character-trigram language profiles learned by train_lang_profiles
# (top_n=16) on the sf0.001 documents corpus and FROZEN here so the
# driver's tagged-union scoring is a static, engine-replayable expression
# at any SF. test_lang_profiles.py pins this constant to a live training
# run, so trainer and constant cannot drift apart silently. (The synthetic
# corpus draws from one shared vocabulary regardless of the lang label, so
# the profiles differ only in their tails — which is exactly what makes
# the argmax a sharp cross-engine determinism test: near-tie integer
# scores must still break identically.)
FROZEN_LANG_PROFILES: dict[str, tuple[tuple[str, int], ...]] = {
    "de": (
        ("ow ", 17725), ("er ", 17045), ("par", 13056), ("rt ", 12784),
        ("mer", 11152), ("all", 7162), ("mal", 7162), ("sma", 7162),
        ("ll ", 7072), (" sm", 6981), ("ata", 6981), ("dat", 6981),
        ("can", 6936), ("sca", 6936), (" da", 6890), ("ta ", 6800),
    ),
    "en": (
        ("ow ", 17886), ("er ", 17318), ("rt ", 12593), ("mer", 12078),
        ("par", 12060), ("col", 6856), ("lum", 6856), ("olu", 6856),
        ("umn", 6856), (" co", 6732), ("mn ", 6714), ("ort", 6678),
        ("sor", 6678), (" so", 6607), ("key", 6518), ("dow", 6501),
    ),
    "es": (
        ("er ", 18420), ("ow ", 17852), ("par", 13389), ("mer", 12212),
        ("rt ", 12212), ("col", 7019), ("lum", 7019), ("olu", 7019),
        ("umn", 7019), ("ine", 6938), ("lin", 6938), ("mn ", 6938),
        ("art", 6897), ("ne ", 6897), (" li", 6857), (" pa", 6857),
    ),
    "fr": (
        ("er ", 19182), ("ow ", 17733), ("rt ", 13048), ("mer", 11933),
        ("par", 11710), ("der", 7137), ("ord", 7137), ("rde", 7137),
        ("ort", 7026), ("sor", 7026), (" or", 6951), ("ery", 6951),
        ("que", 6951), ("uer", 6951), (" qu", 6914), (" so", 6914),
    ),
    "zh": (
        ("er ", 18782), ("ow ", 17973), ("mer", 12401), ("par", 11727),
        ("rt ", 11682), ("der", 7054), ("gro", 7054), ("ord", 7054),
        ("oup", 7054), ("rde", 7054), ("rou", 7054), (" or", 6964),
        ("up ", 6964), (" gr", 6874), ("erg", 6784), ("rge", 6784),
    ),
}
