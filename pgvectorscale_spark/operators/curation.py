"""Corpus-curation operators beyond near-dup detection: benchmark
decontamination and repetition-based quality stats.

Two standard large-scale training-data pipeline stages:

- **Decontamination** (``decontaminate``): flag corpus documents sharing
  any word n-gram with a benchmark/eval set — the test-set-leakage filter
  every serious pretraining pipeline runs. Scale shape: the benchmark's
  distinct-shingle set is tiny relative to the corpus (benchmarks are MBs
  against TBs), so the overlap test is a BROADCAST inner join from the
  exploded corpus shingles — map-side, no corpus-sized shuffle; only the
  matching rows (rare) shuffle into the per-doc hit count, and the final
  left join back to ids is by the corpus' own id column.
  ``decontaminate_bloom`` computes the same EXACT result behind a packed
  Bloom bit-array prefilter, for benchmark sets whose string form
  outgrows a broadcast set but whose bits do not.
- **Repetition stats** (``repetition_stats``): per-document repetition
  signals in the Gopher/RefinedWeb family — duplicate n-gram fractions
  and the most-frequent-token share. The whole computation is map-side:
  duplicate-n-gram fractions are ``size(array_distinct(...))``
  expressions and the top-token share is a longest-equal-run fold over
  the row's own sorted token array (a doc's tokens sit in one array
  cell, so distributing the mode computation bought nothing and cost
  two token-level shuffles plus a corpus self-join).

No reference analog (pgvectorscale stores vectors, not corpora); these
serve the training-data-pipeline brief alongside operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgvectorscale_spark.functions.hashing import SPARK, tokens, word_shingles

__all__ = [
    "decontaminate",
    "decontaminate_bloom",
    "repetition_stats",
    "stratified_sample",
]


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    shingle_n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag corpus docs that share at least one word ``shingle_n``-gram
    with ``benchmark``. Returns (id, n_hits, contaminated) for EVERY
    corpus doc — n_hits = how many of the doc's distinct shingles appear
    anywhere in the benchmark (0 = clean).

    Docs shorter than ``shingle_n`` words contribute their whole text as
    one shingle (the ``word_shingles`` convention), so short corpus docs
    are only flagged on exact-ish containment, never on single common
    words."""
    sh = word_shingles(tokens(f"`{text_col}`", SPARK), shingle_n, SPARK)
    corpus_sh = corpus.select(
        F.col(id_col), F.explode(F.expr(f"array_distinct({sh})")).alias("_sh")
    )
    bench_sh = (
        benchmark.select(F.explode(F.expr(f"array_distinct({sh})")).alias("_sh"))
        .distinct()
    )
    hits = (
        corpus_sh.join(F.broadcast(bench_sh), "_sh")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    shingle_n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bits: int = 1 << 16,
    num_hashes: int = 3,
) -> DataFrame:
    """EXACT ``decontaminate`` with a Bloom-filter prefilter — the scale
    path when the benchmark's distinct-shingle SET outgrows a comfortable
    broadcast hash join but its BIT ARRAY does not (a 2^30-bit filter is
    128 MB regardless of shingle count; the string set at that scale is
    GBs). Results are bit-identical to ``decontaminate``: the Bloom probe
    only discards corpus shingles that PROVABLY miss the benchmark (no
    false negatives), and every surviving shingle still goes through the
    exact join, so false positives cost work, never correctness.

    Shape, all JVM-side: (1) benchmark shingles → ``num_hashes`` positions
    via seeded xxhash64 → per-word bit_or → ONE row holding the packed
    array<long> (num_bits/64 elements); (2) the corpus' exploded shingles
    crossJoin-broadcast that single row and keep only shingles whose k
    bits are all set — a map-side filter, no corpus shuffle; (3) survivors
    (rare: true hits + the controlled false-positive trickle) run the same
    join + per-doc count as ``decontaminate``. At 100 TB the prefilter
    shrinks the shuffle-or-probe volume from every-corpus-shingle to
    ~hits; ``num_bits`` sizes the false-positive rate
    ((1 - e^(-k·n/m))^k — 2^30 bits / 3 hashes holds ~100M benchmark
    shingles at <2% FP).

    MEMORY CEILING: the packed bit array is materialized as a SINGLE ROW
    (one array<long> of num_bits/64 elements) and broadcast to every
    executor — num_bits/8 bytes must fit comfortably in one row on the
    driver AND in each executor's broadcast memory. 2^30 bits = 128 MB is
    the sane ceiling (and already holds ~100M shingles); 2^33 is capped
    below because a multi-GB single row breaks row-size and broadcast
    limits long before correctness does. Need more capacity? lower the FP
    target instead by raising num_hashes, or shard the benchmark and OR
    the verdicts."""
    if num_bits % 64:
        raise ValueError(f"num_bits must be a multiple of 64, got {num_bits}")
    if num_bits > (1 << 33):
        raise ValueError(
            f"num_bits={num_bits} exceeds the 2^33 single-row/broadcast "
            "ceiling (the packed filter is one row of num_bits/8 bytes; "
            "2^30 ~ 128 MB is the recommended maximum)"
        )
    n_words = num_bits // 64
    sh = word_shingles(tokens(f"`{text_col}`", SPARK), shingle_n, SPARK)
    bench_sh = (
        benchmark.select(F.explode(F.expr(f"array_distinct({sh})")).alias("_sh"))
        .distinct()
    )
    # seeded hash family: appending a distinct literal to xxhash64's input
    # yields independent positions per seed
    def pos(i: int, col: str = "_sh") -> str:
        return f"pmod(xxhash64({col}, {i}), {num_bits})"

    positions = bench_sh.selectExpr(
        f"explode(array({', '.join(pos(i) for i in range(num_hashes))})) as p"
    )
    word_bits = positions.selectExpr(
        "cast(p div 64 as int) as w", "shiftleft(1L, cast(p % 64 as int)) as b"
    ).groupBy("w").agg(F.expr("bit_or(b)").alias("b"))
    bloom = word_bits.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "b"))).alias("m")
    ).selectExpr(
        f"transform(sequence(0, {n_words - 1}), "
        "i -> coalesce(element_at(m, i), 0L)) as _bloom"
    )
    corpus_sh = corpus.select(
        F.col(id_col), F.explode(F.expr(f"array_distinct({sh})")).alias("_sh")
    )
    probe = " AND ".join(
        f"(element_at(_bloom, cast({pos(i)} div 64 as int) + 1) "
        f"& shiftleft(1L, cast({pos(i)} % 64 as int))) != 0"
        for i in range(num_hashes)
    )
    survivors = (
        corpus_sh.join(F.broadcast(bloom))  # 1-row broadcast, map-side probe
        .where(F.expr(probe))
        .drop("_bloom")
    )
    hits = (
        survivors.join(F.broadcast(bench_sh), "_sh")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
    salt: str = "sample",
    salt_buckets: int = 16,
) -> DataFrame:
    """Deterministic EXACT-size stratified sampling: keep exactly
    ``n_per_stratum`` rows per ``strata_col`` value (fewer iff the stratum
    is smaller), selected by md5-hash order — the balanced-subsampling
    step of a training-data mix (per-language / per-source caps).
    Unlike ``DataFrame.sampleBy`` the counts are exact and the selection
    is a pure function of (salt, id): stable across runs, partitionings
    and engines.

    Scale shape: a naive per-stratum window shuffles the WHOLE corpus
    into one task per stratum — hopeless when strata are few (languages)
    and data is 100 TB. Two-phase instead (same argument as
    relational.top_orders_per_customer_salted): phase 1 ranks within
    (stratum, salt-bucket) and keeps n per salted group, phase 2 ranks at
    most ``salt_buckets * n`` survivors per stratum. The global hash-order
    top n per stratum survives phase 1 by the superset argument, so the
    output is identical to the naive form for every input."""
    if n_per_stratum <= 0:
        raise ValueError(f"n_per_stratum must be positive, got {n_per_stratum}")
    return _hash_order_rank(df, strata_col, n_per_stratum, id_col, salt, salt_buckets).filter(
        F.col("sample_rank") <= n_per_stratum
    )


def _hash_order_rank(
    df: DataFrame,
    strata_col: str,
    n_cap: int,
    id_col: str,
    salt: str,
    salt_buckets: int,
) -> DataFrame:
    """The salted two-phase per-stratum ranking both samplers share:
    ``sample_rank`` = this row's position in md5-hash order within its
    stratum, materialized only for the top ``n_cap`` rows per stratum
    (the superset argument from ``stratified_sample``'s docstring)."""
    from pyspark.sql import Window

    salt_lit = str(salt).replace("\\", "\\\\").replace("'", "''")
    keyed = df.withColumn(
        "_key", F.expr(f"md5(concat('{salt_lit}:', cast(`{id_col}` as string)))")
    ).withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(int(salt_buckets))).cast("int")
    )
    w1 = Window.partitionBy(strata_col, "_salt").orderBy(
        F.col("_key").asc(), F.col(id_col).asc()
    )
    survivors = keyed.withColumn("_rn1", F.row_number().over(w1)).filter(
        F.col("_rn1") <= n_cap
    )
    w2 = Window.partitionBy(strata_col).orderBy(
        F.col("_key").asc(), F.col(id_col).asc()
    )
    return (
        survivors.withColumn("sample_rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("sample_rank") <= n_cap)
        .drop("_key", "_salt", "_rn1")
    )


def temperature_targets(
    counts: dict, temperature: float, total_n: int
) -> dict:
    """Per-stratum sample targets for a temperature-reweighted data mix:
    weight w_s = count_s^T, share = total_n * w_s / Σw, rounded to exact
    integers by largest remainder (Hamilton apportionment; remainder ties
    break on stratum name ascending), then capped at count_s (sampling is
    without replacement — upsampling is a different operator, so capped
    strata simply realize fewer rows than total_n).

    T < 1 flattens the mix toward uniform (upweights small sources),
    T = 1 is proportional, T > 1 exaggerates large sources. For INTEGER
    T the whole computation is exact bigint arithmetic (floors =
    total_n*w // Σw, remainders = total_n*w % Σw) — bit-identical in any
    engine, which is what the DuckDB twin replays; fractional T goes
    through float pow with shares rounded to 6 decimals before the
    remainder comparison (deterministic given one platform's libm)."""
    if total_n <= 0:
        raise ValueError(f"total_n must be positive, got {total_n}")
    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    if not counts:
        raise ValueError("temperature_targets needs at least one stratum")
    if any(c < 0 for c in counts.values()):
        raise ValueError("stratum counts must be non-negative")
    names = sorted(counts)
    if float(temperature).is_integer():
        t = int(temperature)
        w = {s: int(counts[s]) ** t for s in names}
        tot_w = sum(w.values())
        if tot_w == 0:
            raise ValueError("all strata are empty")
        floors = {s: (total_n * w[s]) // tot_w for s in names}
        rems = {s: (total_n * w[s]) % tot_w for s in names}
    else:
        import math

        w = {s: math.pow(counts[s], temperature) for s in names}
        tot_w = math.fsum(w[s] for s in names)
        if tot_w == 0.0:
            raise ValueError("all strata are empty")
        exact = {s: round(total_n * w[s] / tot_w, 6) for s in names}
        floors = {s: int(math.floor(exact[s])) for s in names}
        rems = {s: exact[s] - floors[s] for s in names}
    leftover = total_n - sum(floors.values())
    if not 0 <= leftover <= len(names):
        raise RuntimeError(f"largest-remainder leftover {leftover} out of range")
    order = sorted(names, key=lambda s: (-rems[s], s))
    bump = set(order[:leftover])
    return {s: min(int(counts[s]), floors[s] + (1 if s in bump else 0)) for s in names}


def temperature_resample(
    df: DataFrame,
    strata_col: str,
    temperature: float,
    total_n: int,
    id_col: str = "doc_id",
    salt: str = "mix",
    salt_buckets: int = 16,
) -> DataFrame:
    """Temperature-based source mixing: sample ``temperature_targets``
    rows per ``strata_col`` value, selected by the same deterministic
    md5-hash order as ``stratified_sample`` — the data-mixing stage of a
    pretraining pipeline (per-source/per-language reweighting before
    tokenization).

    Scale shape: the only driver-side data is one count per stratum
    (sources/languages — dozens, not rows); selection reuses the salted
    two-phase window capped at the LARGEST target, then filters each
    stratum to its own target through a broadcast map literal. Exact
    output sizes, stable across runs/partitionings/engines."""
    counts = {
        r[0]: r[1] for r in df.groupBy(strata_col).count().collect()
    }  # O(#strata) rows — a scalar-class collect
    counts = {s: c for s, c in counts.items() if s is not None}
    if not counts:  # empty input / all-NULL strata: nothing to sample
        return df.withColumn("sample_rank", F.lit(0).cast("long")).limit(0)
    targets = temperature_targets(counts, temperature, total_n)
    max_n = max(targets.values(), default=0)
    if max_n == 0:
        return df.withColumn("sample_rank", F.lit(0).cast("long")).limit(0)
    tgt_map = F.create_map(
        *[F.lit(x) for s, n in sorted(targets.items()) for x in (s, n)]
    )
    ranked = _hash_order_rank(df, strata_col, max_n, id_col, salt, salt_buckets)
    return ranked.filter(
        F.col("sample_rank")
        <= F.coalesce(F.element_at(tgt_map, F.col(strata_col)), F.lit(0))
    )


def epoch_expand(
    df: DataFrame,
    strata_col: str,
    epochs: dict,
    id_col: str = "doc_id",
    salt: str = "epoch",
    salt_buckets: int = 16,
    default_epoch: float = 1.0,
) -> DataFrame:
    """Fractional-epoch up/down-sampling — the other half of data mixing
    next to ``temperature_resample``: a mix spec like "3.5 epochs of
    wiki, 0.8 of crawl" repeats every row of stratum s ``floor(e_s)``
    times and gives ONE extra copy to the first ``round(frac_s *
    count_s)`` rows in deterministic md5-hash order (the same order both
    samplers use), so realized sizes are exact to the row and stable
    across runs/partitionings/engines. Output keeps the input columns
    plus ``copy`` (1..n for that row); rows whose repeat count is 0
    (e_s < 1 and not selected) are dropped.

    Scale shape: driver-side data is one count per stratum; the extra-
    copy set reuses the salted two-phase window (never a whole-corpus
    single-partition sort), and replication is a map-side
    explode(sequence(1, n)) — no shuffle beyond the rank's own.

    Epoch fractions meant for cross-engine replay should be binary-exact
    (x/2^k: .5, .25, .75...) so ``round(frac * count)`` can't straddle a
    half-ulp between engines; arbitrary fractions are fine within one
    engine."""
    import math

    if default_epoch < 0 or any(e < 0 for e in epochs.values()):
        raise ValueError("epochs must be non-negative")
    counts = {
        r[0]: r[1] for r in df.groupBy(strata_col).count().collect()
    }  # O(#strata) rows — a scalar-class collect
    eps = {s: float(epochs.get(s, default_epoch)) for s in counts}
    base = {s: int(math.floor(eps[s])) for s in counts}
    extra = {
        s: int(math.floor((eps[s] - base[s]) * counts[s] + 0.5)) for s in counts
    }
    named = sorted((s for s in counts if s is not None), key=str)
    if not named:  # empty input or all-NULL strata: nothing to repeat
        return df.withColumn("copy", F.lit(0).cast("long")).limit(0)
    # NULL strata have no epoch identity -> repeat count 0, dropped
    max_extra = max((extra[s] for s in named), default=0)
    base_map = F.create_map(*[F.lit(x) for s in named for x in (s, base[s])])
    n_col = F.coalesce(F.element_at(base_map, F.col(strata_col)), F.lit(0))
    if max_extra > 0:
        extra_map = F.create_map(*[F.lit(x) for s in named for x in (s, extra[s])])
        flagged = (
            _hash_order_rank(df, strata_col, max_extra, id_col, salt, salt_buckets)
            .filter(
                F.col("sample_rank")
                <= F.coalesce(F.element_at(extra_map, F.col(strata_col)), F.lit(0))
            )
            .select(F.col(id_col), F.lit(1).alias("_extra"))
        )
        out = df.join(flagged, id_col, "left").withColumn(
            "_n", n_col + F.coalesce(F.col("_extra"), F.lit(0))
        ).drop("_extra")
    else:
        out = df.withColumn("_n", n_col)
    return (
        out.filter(F.col("_n") >= 1)
        .withColumn("copy", F.explode(F.sequence(F.lit(1).cast("long"), F.col("_n").cast("long"))))
        .drop("_n")
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition signals (Gopher/RefinedWeb-style quality
    filters, word-level — the synthetic corpus has no line structure):

    - ``n_tokens``: whitespace token count,
    - ``top_token_frac``: occurrences of the most frequent token / n_tokens
      (ties on count are irrelevant — only the max multiplicity matters),
    - ``dup_2gram_frac`` / ``dup_3gram_frac``: 1 - distinct/total over the
      word n-grams (0 when fewer than n words: a single whole-doc shingle
      is trivially distinct).

    A curation pass drops docs above thresholds on these (e.g. Gopher
    rejects dup_3gram_frac-style scores over ~0.18)."""
    toks = tokens(f"`{text_col}`", SPARK)
    base = df.select(F.col(id_col), F.expr(toks).alias("_toks"))
    ngram_cols = []
    for n in (2, 3):
        g = word_shingles("_toks", n, SPARK)
        ngram_cols.append(
            F.round(
                F.lit(1.0)
                - F.expr(f"size(array_distinct({g}))") / F.expr(f"size({g})"),
                6,
            ).alias(f"dup_{n}gram_frac")
        )
    # round 14 (guide §2.4): the top-token multiplicity is a map-side fold
    # over the row's own sorted token array — the old explode +
    # groupBy(doc, token) + groupBy(doc) + join shuffled token-level rows
    # through two aggregations and sort-merge-joined the corpus back to
    # itself for a value computable inside the row (a doc's tokens sit in
    # ONE array cell by construction). Sorting the array makes the max
    # multiplicity the longest equal-run; the fold replays the same exact
    # integer count, so top_token_frac is bit-identical. The old inner
    # join dropped docs whose explode produced no rows — exactly the
    # NULL-text docs (split() yields at least [''] for non-null text), so
    # the isNotNull filter reproduces that membership.
    top_fold = (
        "aggregate(array_sort(_toks), "
        "struct(cast(null as string) AS p, 0L AS r, 0L AS b), "
        "(a, x) -> struct(x AS p, "
        "if(x <=> a.p, a.r + 1L, 1L) AS r, "
        "greatest(a.b, if(x <=> a.p, a.r + 1L, 1L)) AS b), "
        "a -> a.b)"
    )
    return base.filter(F.col("_toks").isNotNull()).select(
        id_col,
        F.size("_toks").cast("long").alias("n_tokens"),
        F.round(
            F.expr(top_fold) / F.size("_toks").cast("long"), 6
        ).alias("top_token_frac"),
        *ngram_cols,
    )
