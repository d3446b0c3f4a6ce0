"""Deduplication operators for 100 TB training-data pipelines.

Five dedup families over the `documents` / `embeddings` tables, all built
from declarative DataFrame ops + the cross-engine hash fragments in
functions/hashing.py (so each has a DuckDB oracle twin):

- **exact**: hash-groupBy on content; keep the lowest id per group. One
  shuffle with map-side partial agg — the canonical 100 TB first pass.
- **MinHash + LSH**: shingle → minhash signature → band → bucket-join.
  Candidate generation never compares documents pairwise: docs sharing an
  LSH band bucket-join on (band_id, band_hash) — the join key is the
  buckets, so the shuffle is proportional to candidates, not n².
- **SimHash**: 32-bit sign-of-weighted-sum fingerprint; near-dups =
  fingerprints within Hamming distance h.
- **n-gram Jaccard**: exact similarity verification via a shingle-level
  self-join (inverted-index style: join on shingle, count shared, divide
  by union) — the verifier behind the MinHash candidates.
- **embedding cosine near-dup**: exact O(n²) form for oracles/small data +
  an SBQ-sign-bucket LSH form as the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgvectorscale_spark.functions.distance import dot_product, l2_norm
from pgvectorscale_spark.functions.hashing import (
    SPARK,
    band_hash,
    h60,
    minhash_signature_expr,
    tokens,
    word_shingles,
)

__all__ = [
    "dedup_exact",
    "minhash_signatures",
    "lsh_band_buckets",
    "minhash_candidate_pairs",
    "minhash_star_edges",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_pairs",
    "simhash_pairs_multiprobe",
    "embedding_neardup_pairs",
    "embedding_neardup_lsh",
    "lsh_planes",
    "semantic_dedup",
    "winnowing_fingerprints",
    "connected_components",
    "dedup_clusters",
    "span_dedup",
]


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: survivors = lowest id per identical content.

    Grouping key is h60(text) (not the raw text) so the shuffle carries a
    fixed-width key; 100 TB safe. Returns (keep_id, dup_count).
    """
    return (
        df.withColumn("_h", F.expr(h60(text_col, SPARK)))
        .groupBy("_h")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
        .select("keep_id", "dup_count")
    )


def _widen(df: DataFrame) -> DataFrame:
    """Repartition narrow inputs so per-row hashing parallelizes.

    A small parquet file scans as ONE partition, serializing the md5-heavy
    explode stages onto a single core. At 100 TB the source is already wide
    and this is a no-op; locally it restores the cluster-equivalent plan.
    Streaming DataFrames pass through (micro-batch sizing is the stream's
    own concern and ``.rdd`` is undefined for them).
    """
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    # prefer file-count metadata over df.rdd.getNumPartitions(): the .rdd
    # conversion forces a full plan analysis + RDD translation on the driver
    # per operator call. inputFiles() is catalog metadata — for file-backed
    # frames (the 100 TB case) many files means the scan is already wide.
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= max(2, target // 2) and _is_scan_shaped(df):
        return df  # wide file-backed scan: skip without any .rdd cost
    # few/no input files: the frame may still be wide (downstream of a
    # repartition/join, or an in-memory source) — check the actual
    # partition count before adding a shuffle. The .rdd conversion cost is
    # paid only on this narrow-input path, never on the 100 TB scan shape.
    if df.rdd.getNumPartitions() >= max(2, target // 2):
        return df
    return df.repartition(target)


# logical nodes that can change the partitioning away from one-partition-
# per-file-split: after any of these, inputFiles() stops being a valid
# parallelism proxy (coalesce(1) over a 100-file scan still reports 100
# input files but runs as ONE partition)
_NON_SCAN_NODES = (
    "Repartition",  # covers Repartition + RepartitionByExpression
    "Coalesce",
    "Join",
    "Aggregate",
    "Window",
    "Sort",
    "Deduplicate",
    "GlobalLimit",
    "Union",
    "Intersect",
    "Except",
)


def _is_scan_shaped(df: DataFrame) -> bool:
    """True when the frame is a narrow chain (project/filter) over a file
    relation, so the scan's file-split partitioning survives to the top and
    file count is a faithful parallelism hint. Reads the ANALYZED logical
    plan (memoized by Spark — far cheaper than the .rdd translation this
    check exists to avoid)."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return False  # can't see the plan: fall to the partition-count check
    return not any(node in plan for node in _NON_SCAN_NODES)


def _with_shingles(df: DataFrame, text_col: str, shingle_n: int) -> DataFrame:
    toks = tokens(text_col, SPARK)
    return _widen(df).withColumn("_shingles", F.expr(word_shingles(toks, shingle_n, SPARK)))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, signature array<bigint>) — one per-row fold, zero shuffle.

    The signature is a single ``aggregate`` expression (hashing.py
    minhash_signature_expr): each shingle hashed once, num_hashes running
    minima kept in the fold accumulator. No explode, no groupBy — at 100 TB
    signatures are a map-only stage; the same expression serves streaming
    micro-batches unchanged.
    """
    sh = _with_shingles(df, text_col, shingle_n)
    return sh.select(
        F.col(id_col),
        F.expr(minhash_signature_expr("_shingles", num_hashes)).alias("signature"),
    )


def lsh_band_buckets(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 4,
) -> DataFrame:
    """(id, band_id, band_hash) — one row per band per doc.

    Single posexplode projection (not a bands-way union): the signature
    expression feeding it is evaluated once per row, and the plan stays one
    map stage regardless of band count.
    """
    hash_arr = F.array(
        *[F.expr(band_hash("signature", b, rows_per_band, SPARK)) for b in range(bands)]
    )
    return sig_df.select(
        F.col(id_col), F.posexplode(hash_arr).alias("band_id", "band_hash")
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Distinct candidate pairs (doc_a < doc_b) sharing >= 1 LSH band bucket.

    The pair set is inherently quadratic per bucket (it IS the output —
    use ``minhash_star_edges`` when only connectivity is needed), but the
    default single equi-join also CONCENTRATES each bucket's c^2 work in
    one reducer task: a boilerplate mega-bucket (c members) on a real
    crawl turns into one straggler. ``max_bucket_size=t`` switches to the
    salted TRIANGLE join: members of a bucket of size c are hashed into
    g = ceil(c/t) salt groups, each member replicated into the (g+1)
    group-pair keys it participates in, and the join runs per
    (bucket, group-pair) key — every task handles at most ~t x t rows,
    so a mega-bucket becomes g^2 parallel tasks instead of one. EXACT:
    each unordered pair (x, y) within a bucket meets in exactly the
    group-pair key (min(s_x,s_y), max(s_x,s_y)) — same-salt pairs meet
    (both orders) in (s, s) — so after least/greatest normalization and
    the distinct, the result equals the direct join's bit-for-bit (the
    driver oracle runs both forms against one DuckDB pair set).
    Replication cost: sum over buckets of c*(g+1) ~ c^2/t rows, the same
    order as the join output itself."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    buckets = lsh_band_buckets(sig, id_col, bands, rows_per_band)
    if max_bucket_size is None:
        # single-pass pair generation (round 14): the old bucket×bucket
        # self-join re-evaluated the whole signature subtree (shingling +
        # num_hashes md5 folds per doc — the dominant per-row cost) on BOTH
        # join sides, plus a second widen exchange and a broadcast of the
        # full bucket table. One groupBy collects each bucket's member
        # list once; in-bucket pairs come from a JVM array expression.
        # The pair SET is identical: members are distinct ids (one row per
        # doc per band), sorted ascending, paired i<j — exactly the
        # doc_a < doc_b filter of the join form. Pairing is a TWO-LEVEL
        # explode (round 15, guide §5): each member row pairs against its
        # suffix slice, so no single value ever holds the bucket's c²/2
        # pair array — the largest value anywhere is the member list
        # itself (O(c)), and a mega-bucket degrades to a slow generator,
        # not an executor OOM / 2GB-single-value failure. The c² work
        # still lands on one task; ``max_bucket_size`` (the salted
        # triangle) remains the path that also spreads the WORK.
        members = (
            buckets.groupBy("band_id", "band_hash")
            .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("_m"))
            .filter(F.size("_m") > 1)
        )
        return (
            members.select(F.posexplode("_m").alias("_i", "doc_a"), "_m")
            .select(
                "doc_a",
                F.explode(F.expr("slice(_m, _i + 2, size(_m))")).alias("doc_b"),
            )
            .distinct()
        )
    t = int(max_bucket_size)
    if t < 2:
        raise ValueError(f"max_bucket_size must be >= 2, got {t}")
    from pyspark.sql import Window

    # single-pass salted triangle (round 14, guide §2.3): the old shape
    # evaluated the signature fold FOUR times (once under the bucket-count
    # aggregate, once under its join-back, and the joined frame again on
    # each side of the triangle self-join). One pass: per-bucket size from
    # a count window on the bucket exchange (small (id, band) rows; the
    # buffer spills, and the quadratic work still lands on the group-pair
    # keys, never one reducer), then every member emits its LEFT role
    # (_i = own salt, _j = own..g-1) and RIGHT role (_i = 0..own salt,
    # _j = own) in one explode, and a groupBy on (bucket, _i, _j) crosses
    # the two role lists — each task still sees ~t x t rows. The match
    # condition is the old join's verbatim: pair (x, y) meets exactly in
    # key (min(s_x, s_y), max(s_x, s_y)), same-salt pairs meet (both
    # orders) in (s, s); least/greatest + distinct normalize identically.
    w = Window.partitionBy("band_id", "band_hash")
    wb = (
        buckets.withColumn("_g", F.ceil(F.count("*").over(w) / t).cast("int"))
        .withColumn("_s", F.pmod(F.xxhash64(F.col(id_col)), F.col("_g")).cast("int"))
    )
    roles = wb.select(
        "band_id",
        "band_hash",
        F.col(id_col),
        F.explode(
            F.expr(
                "concat("
                "transform(sequence(_s, _g - 1), j -> struct(_s AS i, j AS j, true AS isl)), "
                "transform(sequence(0, _s), i -> struct(i AS i, _s AS j, false AS isl))"
                ")"
            )
        ).alias("_t"),
    ).select(
        "band_id",
        "band_hash",
        F.col("_t.i").alias("_i"),
        F.col("_t.j").alias("_j"),
        F.col("_t.isl").alias("_isl"),
        F.col(id_col),
    )
    return (
        roles.groupBy("band_id", "band_hash", "_i", "_j")
        .agg(
            F.collect_list(F.when(F.col("_isl"), F.col(id_col))).alias("_la"),
            F.collect_list(F.when(~F.col("_isl"), F.col(id_col))).alias("_lb"),
        )
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(_la, x -> transform(filter(_lb, y -> x != y), "
                    "y -> struct(least(x, y) AS doc_a, greatest(x, y) AS doc_b))))"
                )
            ).alias("_p")
        )
        .select("_p.doc_a", "_p.doc_b")
        .distinct()
    )


def minhash_star_edges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH candidate edges in STAR form: each bucket member linked only to
    its bucket's minimum id — O(c) edges per bucket instead of the full
    pair join's c²/2.

    Connectivity-equivalent to ``minhash_candidate_pairs``: any two docs
    sharing a (band_id, band_hash) bucket are connected through the
    bucket's min id, so connected components over these edges equal
    components over the full pair set. This is the candidate stage
    ``dedup_clusters`` runs — a real web crawl has mega-buckets (boilerplate
    pages with c near-identical members), and the full self-join would put
    c²/2 rows through one reducer for each; the star form keeps every
    bucket linear. ``minhash_candidate_pairs`` remains the operator whose
    oracle IS the full pair set (LSH theory's candidate list); use it when
    the pairs themselves are the output, not their components.

    Plan shape: one partial-agg groupBy for the per-bucket min (map-side
    combine on the same (band_id, band_hash) keys the buckets already
    shuffle on), then an equi-join where the min side has exactly one row
    per key — fan-out per bucket is c, never c². Returns distinct
    (doc_a, doc_b) with doc_a < doc_b.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    buckets = lsh_band_buckets(sig, id_col, bands, rows_per_band)
    # single-pass star generation (round 14): the old buckets ⋈ bucket_min
    # join re-evaluated the signature subtree (the md5-heavy fold) on both
    # sides — bucket_min is an aggregate OVER the same buckets frame, and a
    # DataFrame self-join recomputes, not reuses, the shared subtree. One
    # groupBy collects each bucket's sorted member list; the star edges are
    # min-vs-rest from the array — identical edge set (doc_a = the bucket
    # min, doc_b = every other member), and the member list is linear in
    # bucket size, so mega-buckets stay safe.
    return (
        buckets.groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("_m"))
        .filter(F.size("_m") > 1)
        .select(
            F.col("_m")[0].alias("doc_a"),
            F.explode(F.slice("_m", 2, F.size("_m"))).alias("doc_b"),
        )
        .distinct()
    )


def _ngram_prefix_candidates(
    sh: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Candidate pairs by PREFIX FILTERING (exact, skew-bounded).

    Order every shingle by ascending global document frequency (ties by
    shingle value — one deterministic total order for all docs); index only
    each doc's first ``|d| - ceil(t·|d|) + 1`` shingles under that order.
    Any pair with Jaccard >= t MUST share a prefix shingle (the standard
    prefix-filter theorem), so candidates are complete — and hot "stop
    shingles" sort LAST, so a shingle appearing in c docs no longer puts
    c² rows on one reducer (the round-3 skew finding): it enters the
    inverted index only for docs whose entire tail is hotter still.

    ``sh`` = (id, _sh array of distinct shingles). Returns (doc_a, doc_b).
    """
    ex = sh.select(F.col(id_col), F.explode("_sh").alias("shingle"))
    freq = ex.groupBy("shingle").agg(F.count("*").alias("_df"))
    # the caller's final filter compares the 6dp-ROUNDED jaccard against
    # the threshold, so a pair with true J in [t - 5e-7, t) still passes it
    # — widen the prefix guarantee by that rounding slack so candidate
    # generation can never drop a pair the rounded comparison would keep
    threshold = max(0.0, float(threshold) - 1e-6)
    # per-doc rarest-first prefix: sort by (df, shingle), keep the first
    # n - ceil(t*n) + 1. One groupBy(doc) with a map-side-light agg; the
    # struct sort keeps everything JVM-side.
    prefix = (
        ex.join(freq, "shingle")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("_df", "shingle"))).alias("_ord"))
        .select(
            F.col(id_col),
            F.explode(
                F.slice(
                    F.expr("transform(_ord, x -> x.shingle)"),
                    1,
                    F.greatest(
                        F.lit(1),
                        (F.size("_ord") - F.ceil(F.size("_ord") * F.lit(float(threshold))) + 1).cast("int"),
                    ),
                )
            ).alias("shingle"),
        )
    )
    # single-pass pair generation (round 14, guide §2.3): the old a ⋈ b
    # self-join re-evaluated the whole prefix subtree (shingle explode,
    # df join, per-doc sort) on both sides. One groupBy collects each
    # prefix shingle's sorted doc list and the i<j pairs come from the
    # array — the same doc_a < doc_b set (ids are unique per shingle:
    # _sh is distinct per doc). Hot stop-shingles are excluded from the
    # index by the rarest-first prefix rule, so member lists stay small;
    # the two-level explode (round 15, guide §5) additionally bounds any
    # single value to the member list itself (O(c), never the c²/2 pair
    # array) should a pathological shingle slip through.
    return (
        prefix.groupBy("shingle")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("_m"))
        .filter(F.size("_m") > 1)
        .select(F.posexplode("_m").alias("_i", "doc_a"), "_m")
        .select(
            "doc_a",
            F.explode(F.expr("slice(_m, _i + 2, size(_m))")).alias("doc_b"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard pairs (jaccard >= threshold), 6dp rounded.

    Candidate generation uses prefix filtering (_ngram_prefix_candidates):
    exact — every qualifying pair shares a rarest-first prefix shingle —
    while keeping any high-frequency stop-shingle out of the inverted-index
    self-join, so no reducer ever sees c² rows for a shingle appearing in c
    docs. Candidates then verify with ONE exact set intersection per pair
    over the full shingle arrays (array_intersect, hash-based, JVM-side) —
    the intersection is over ALL shingles, so the returned jaccard value is
    identical to the unfiltered inverted-index formulation."""
    sh = _with_shingles(df, text_col, shingle_n).select(
        F.col(id_col), F.array_distinct("_shingles").alias("_sh")
    )
    cand = _ngram_prefix_candidates(sh, id_col, threshold)
    a = sh.select(F.col(id_col).alias("doc_a"), F.col("_sh").alias("_sha"))
    b = sh.select(F.col(id_col).alias("doc_b"), F.col("_sh").alias("_shb"))
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("_inter", F.size(F.array_intersect("_sha", "_shb")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("_inter")
                / (F.size("_sha") + F.size("_shb") - F.col("_inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bits: int = 32,
) -> DataFrame:
    """32-bit SimHash: bit i = sign of sum over distinct tokens of
    ((h60(token) >> i) & 1) * 2 - 1.

    One per-row ``aggregate`` fold (like MinHash's): the accumulator holds
    the num_bits signed counters; the finish lambda packs the sign bits.
    Map-only — zero shuffle, each token hashed exactly once. The DuckDB twin
    states the same math relationally; values are identical by construction.
    """
    toks_distinct = f"array_distinct({tokens(text_col, SPARK)})"
    hashes = f"transform({toks_distinct}, _t -> {h60('_t', SPARK)})"
    counters = (
        f"aggregate({hashes}, "
        f"array_repeat(0L, {num_bits}), "
        f"(acc, h) -> zip_with(acc, sequence(0, {num_bits - 1}), "
        f"(a, i) -> a + (shiftright(h, cast(i as int)) & 1) * 2 - 1), "
        f"acc -> aggregate(zip_with(acc, sequence(0, {num_bits - 1}), "
        f"(a, i) -> IF(a > 0, shiftleft(1L, cast(i as int)), 0L)), 0L, (s, x) -> s + x))"
    )
    return _widen(df).select(F.col(id_col), F.expr(counters).alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    num_bits: int = 32,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= h, banded.

    Pigeonhole LSH on the fingerprint: split the num_bits fingerprint into
    ``max_hamming + 1`` contiguous bands — any pair within Hamming h must
    agree EXACTLY on at least one band, so an equi-join on (band_id,
    band_value) finds every true pair (zero false negatives) and the
    Hamming check prunes false positives. Shuffle is proportional to
    bucket collisions, never the n² cross product."""
    s = simhash(df, text_col, id_col, num_bits)
    nb = max_hamming + 1
    sizes = [num_bits // nb + (1 if i < num_bits % nb else 0) for i in range(nb)]
    offsets = [sum(sizes[:i]) for i in range(nb)]
    band_vals = F.array(
        *[
            F.expr(f"shiftright(simhash, {off}) & {(1 << sz) - 1}")
            for off, sz in zip(offsets, sizes)
        ]
    )
    buckets = s.select(
        F.col(id_col), F.col("simhash"), F.posexplode(band_vals).alias("band_id", "band_val")
    )
    # single-pass banding (round 14): the old a ⋈ b self-join recomputed
    # the fingerprint fold on both sides; one groupBy collects each
    # bucket's (id, simhash) members and the pairs come from the sorted
    # array — same (doc_a < doc_b) pair set, same exact Hamming prune.
    # Two-level explode (round 15, guide §5): each member pairs against
    # its suffix slice, so no single value holds a bucket's c²/2 pair
    # array — per-value memory stays O(c) even on a mega-bucket.
    return (
        buckets.groupBy("band_id", "band_val")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col).alias("i"), F.col("simhash").alias("s")))
            ).alias("_m")
        )
        .filter(F.size("_m") > 1)
        .select(F.posexplode("_m").alias("_i", "_x"), "_m")
        .select(
            F.col("_x.i").alias("doc_a"),
            F.explode(F.expr("slice(_m, _i + 2, size(_m))")).alias("_y"),
            F.col("_x.s").alias("_sa"),
        )
        .select("doc_a", F.col("_y.i").alias("doc_b"), "_sa", F.col("_y.s").alias("_sb"))
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def _probe_masks(width: int, max_flips: int) -> list[int]:
    """All XOR masks over `width` bits with popcount <= max_flips (the
    multi-probe combinations), exact-match mask 0 first."""
    from itertools import combinations

    masks = []
    for t in range(max_flips + 1):
        for bits in combinations(range(width), t):
            m = 0
            for b in bits:
                m |= 1 << b
            masks.append(m)
    return masks


def simhash_pairs_multiprobe(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    num_bits: int = 60,
    num_blocks: int | None = None,
) -> DataFrame:
    """Near-dup pairs on WIDE SimHash fingerprints via multi-probe banding
    (NOTES gap #3: the fix for the wide-fingerprint / permissive-threshold
    regime where plain pigeonhole banding degrades).

    Plain pigeonhole needs ``max_hamming + 1`` bands; at 60-64 bits with a
    permissive threshold the bands get NARROW (60 bits / h=7 -> 7-bit
    bands, 128 distinct values) and bucket collisions approach n²/2^width —
    a shuffle explosion at corpus scale. Multi-probe inverts the trade:
    split into FEW, WIDE blocks (collision-sparse) and recover the
    zero-false-negative guarantee by probing: if two fingerprints differ in
    <= h bits total, some block differs in <= floor(h / num_blocks) bits
    (pigeonhole on error counts), so joining one side's block value against
    the other side's *probe set* — the block value XOR every mask of <=
    floor(h/num_blocks) bits — finds every true pair. The exact Hamming
    check then prunes false positives, exactly as in ``simhash_pairs``.

    Cost model: probes multiply one join side by sum_{i<=t} C(width, i)
    (e.g. 2 blocks x 30 bits at h=3 -> t=1 -> 31 probes/block), while
    collisions shrink by 2^(wide - narrow) — at 100 TB the probe factor is
    a constant, the collision factor is quadratic in corpus size.

    ``num_bits`` defaults to 60 — the full width of the engine-portable
    md5-derived h60 token hash (bits above 60 would be constant-zero
    padding, weakening every band they land in; a 64-bit-class fingerprint
    with honest entropy in every bit).
    """
    if num_blocks is None:
        # fewest blocks whose probe fan-out stays modest: t <= 1 when
        # possible (t=floor(h/b)); fall back to pigeonhole for tiny widths
        num_blocks = max(1, (max_hamming + 1) // 2)
    t = max_hamming // num_blocks
    sizes = [
        num_bits // num_blocks + (1 if i < num_bits % num_blocks else 0)
        for i in range(num_blocks)
    ]
    if min(sizes) < 1:
        # a zero-width block's band value is constantly 0: its equi-join
        # pairs every row with every other row — the cross-product
        # explosion this function exists to avoid
        raise ValueError(
            f"num_blocks={num_blocks} exceeds num_bits={num_bits}: "
            "every block needs at least one bit"
        )
    # closed-form fan-out check BEFORE materializing any mask list: a
    # mis-parameterized call (num_blocks=1 at h=7 -> sum C(60, <=7) ~ 4e8
    # masks) must raise in O(t), not OOM the driver building the list it
    # was about to reject
    import math

    fanout = max(sum(math.comb(sz, i) for i in range(t + 1)) for sz in sizes)
    if fanout > 4096:
        raise ValueError(
            f"multi-probe fan-out {fanout} probes/block exceeds 4096 "
            f"(width={max(sizes)}, flips={t}); increase num_blocks so "
            f"floor(max_hamming/num_blocks) shrinks"
        )
    s = simhash(df, text_col, id_col, num_bits)
    offsets = [sum(sizes[:i]) for i in range(num_blocks)]
    block_vals = F.array(
        *[
            F.expr(f"shiftright(simhash, {off}) & {(1 << sz) - 1}")
            for off, sz in zip(offsets, sizes)
        ]
    )
    buckets = s.select(
        F.col(id_col), F.col("simhash"), F.posexplode(block_vals).alias("band_id", "band_val")
    )
    # single-pass multi-probe (round 14, guide §2.3): the old probe ⋈ raw
    # self-join recomputed the fingerprint fold on both sides. One pass
    # tags each emitted (band_id, value) row with its role — the row's own
    # block value ('b', the join's raw side) or one of its <=t-flip probe
    # variants ('a', the exploded side; mask 0 keeps the exact value in
    # the probe set, as before) — and one groupBy collects both roles'
    # members per bucket. Pairs = a-members × b-members with doc_a <
    # doc_b: exactly the old equi-join's match condition (y matches x iff
    # y's block value ∈ probeset(x)), same distinct + exact Hamming prune.
    # Masks are a per-block literal array — the probe set stays tiny and
    # constant.
    probe_arrays = [
        "array("
        + ", ".join(
            f"struct(band_val ^ {m}L AS v, false AS isb)" for m in _probe_masks(sz, t)
        )
        + ")"
        for sz in sizes
    ]
    probe_expr = (
        "CASE "
        + " ".join(f"WHEN band_id = {i} THEN {arr}" for i, arr in enumerate(probe_arrays))
        + " END"
    )
    tagged = buckets.select(
        F.col(id_col),
        F.col("simhash"),
        "band_id",
        F.explode(
            F.expr(f"concat(array(struct(band_val AS v, true AS isb)), {probe_expr})")
        ).alias("_t"),
    ).select(id_col, "simhash", "band_id", "_t.v", "_t.isb")
    member = F.struct(F.col(id_col).alias("i"), F.col("simhash").alias("s"))
    return (
        tagged.groupBy("band_id", "v")
        .agg(
            F.collect_list(F.when(~F.col("isb"), member)).alias("_a"),
            F.collect_list(F.when(F.col("isb"), member)).alias("_b"),
        )
        .filter((F.size("_a") > 0) & (F.size("_b") > 0))
        # two-level explode (round 15, guide §5): each probe-role member
        # pairs against the filtered own-role list, so no single value
        # holds the bucket's |a|×|b| pair array — per-value memory stays
        # O(|a| + |b|) even on a mega-bucket. Match condition is the old
        # join's verbatim (y matches x iff x.i < y.i).
        .select(F.explode("_a").alias("_x"), "_b")
        .select(
            F.col("_x.i").alias("doc_a"),
            F.explode(F.expr("filter(_b, y -> _x.i < y.i)")).alias("_y"),
            F.col("_x.s").alias("_sa"),
        )
        .select("doc_a", F.col("_y.i").alias("doc_b"), "_sa", F.col("_y.s").alias("_sb"))
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def _pair_cosine_sim(va, vb, na, nb):
    """least(dot/(na*nb), 1.0): ONE fold per pair — norms are precomputed
    per row before pairing, not re-folded inside every pair (3x fewer
    interpreted higher-order-function evaluations than normalizing inside
    the pair expression). Zero-norm rows score 0 (never near-dups)."""
    return F.when(
        (na == 0.0) | (nb == 0.0), F.lit(0.0)
    ).otherwise(F.least(dot_product(va, vb) / (na * nb), F.lit(1.0)))


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine near-dup pairs (sim >= threshold). O(n²) — the oracle
    form; use embedding_neardup_lsh as the scale path."""
    src = df.select(
        F.col(id_col), F.col(vector_col), l2_norm(F.col(vector_col)).alias("_n")
    )
    a = src.select(F.col(id_col).alias("id_a"), F.col(vector_col).alias("_va"), F.col("_n").alias("_na"))
    b = src.select(F.col(id_col).alias("id_b"), F.col(vector_col).alias("_vb"), F.col("_n").alias("_nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine_sim",
            F.round(_pair_cosine_sim(F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")), 6),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def lsh_planes(d: int, bands: int = 8, rows_per_band: int = 4, seed: int = 42):
    """Seeded random hyperplanes for sign-bucket LSH — shared by the Spark
    operator and the oracle builder (which inlines them as SQL literals),
    so the bucketing is replayable on both engines."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.normal(size=(bands * rows_per_band, d))


def embedding_neardup_lsh(
    df: DataFrame,
    threshold: float = 0.95,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    bands: int = 8,
    rows_per_band: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Scale path: random-hyperplane LSH. Sign bits of projections onto
    bands*rows_per_band seeded hyperplanes, packed into one integer band
    value per band (single posexplode — one map stage regardless of band
    count); ids sharing a (band_id, band_val) bucket are candidates;
    candidate id pairs (ids ONLY — vectors rejoin once after the distinct)
    are verified with exact cosine. Never materializes the n² cross
    product — the join key is the bucket."""
    first = df.select(F.size(vector_col).alias("d")).first()
    d = int(first["d"])
    planes = lsh_planes(d, bands, rows_per_band, seed)

    proj_cols = []
    for p in range(planes.shape[0]):
        lit = F.array([F.lit(float(x)) for x in planes[p]])
        dot = F.aggregate(
            F.zip_with(F.col(vector_col), lit, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        proj_cols.append(F.when(dot > 0, F.lit(1)).otherwise(F.lit(0)))
    bits = df.select(F.col(id_col), F.array(*proj_cols).alias("_bits"))
    # pack each band's bits into an integer: band_val = sum_r bit_r * 2^r
    band_vals = F.array(
        *[
            F.expr(
                f"aggregate(zip_with(slice(_bits, {bnd * rows_per_band + 1}, {rows_per_band}), "
                f"sequence(0, {rows_per_band - 1}), "
                f"(bb, r) -> shiftleft(cast(bb as bigint), cast(r as int))), 0L, (acc, x) -> acc + x)"
            )
            for bnd in range(bands)
        ]
    )
    buckets = bits.select(F.col(id_col), F.posexplode(band_vals).alias("band_id", "band_val"))
    # single-pass pair generation (round 14, guide §2.3): the old bucket
    # self-join evaluated the bands*rows_per_band interpreted projection
    # folds on BOTH sides; one groupBy collects each bucket's sorted
    # member ids and the i<j pairs come from the array — identical to the
    # join's id_a < id_b set (ids are unique per bucket: one row per
    # (id, band)), one fold evaluation, no join. Two-level explode
    # (round 15, guide §5) bounds any single value to the member list
    # itself (O(c)), never the bucket's c²/2 pair array.
    cand = (
        buckets.groupBy("band_id", "band_val")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("_m"))
        .filter(F.size("_m") > 1)
        .select(F.posexplode("_m").alias("_i", "id_a"), "_m")
        .select(
            "id_a",
            F.explode(F.expr("slice(_m, _i + 2, size(_m))")).alias("id_b"),
        )
        .distinct()
    )
    src = df.select(
        F.col(id_col), F.col(vector_col), l2_norm(F.col(vector_col)).alias("_n")
    )
    va = src.select(F.col(id_col).alias("id_a"), F.col(vector_col).alias("_va"), F.col("_n").alias("_na"))
    vb = src.select(F.col(id_col).alias("id_b"), F.col(vector_col).alias("_vb"), F.col("_n").alias("_nb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cosine_sim",
            F.round(_pair_cosine_sim(F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")), 6),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 25,
) -> DataFrame:
    """(id, component) for every id appearing in ``pairs``; component = the
    smallest id reachable through the (undirected) pair graph.

    Iterative min-label propagation with pointer halving: each round every
    node adopts the smallest label among itself and its one-hop neighbors,
    then labels compose through their own label (comp := min(comp,
    comp[comp])). The halving step collapses chains geometrically, so even a
    pathological path component converges in O(log diameter) rounds — each
    round is a broadcast-free join + partial-agg groupBy, no driver-side
    graph state, so the operator scales with the cluster rather than the
    driver (the alternating-star trick from the MapReduce CC literature).
    Deterministic: min() labels, no randomness.
    """
    e = pairs.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    # round 14 (guide §2.4): partition the symmetric edge table by v ONCE —
    # every round's neighbor join is keyed on v, so the persisted
    # partitioning is reused and the edges never re-shuffle. The distinct
    # rides the same exchange (hash(v) clusters equal (u, v) rows), so
    # setup still pays a single shuffle of the edges.
    # round 15 (guide §2.3): the symmetric closure is ONE explode into both
    # orientations — the previous `e.union(e.select(v, u))` was a
    # self-reference that re-evaluated the whole upstream candidate
    # pipeline (the md5-heavy signature fold included) once per union
    # branch: at the 64x bench point the two branch stages were 23 of the
    # block's 29 s. Row set is identical (same two rows per input edge).
    e = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("u").alias("u"), F.col("v").alias("v")),
                    F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
                )
            ).alias("_e")
        )
        .select("_e.u", "_e.v")
        .repartition("v")
        .distinct()
        .persist()
    )
    # localCheckpoint (not just persist) per round: iterative self-joins
    # grow the logical plan exponentially and Catalyst re-analyzes the whole
    # tree every iteration — lineage must be truncated, not merely cached
    lab = (
        e.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    # labels only ever decrease, so an unchanged sum(comp) IS convergence —
    # one agg per round, no comparison join
    prev_sum = lab.agg(F.sum("comp")).first()[0]
    converged = False
    for _ in range(max_iterations):
        nbr = (
            e.join(lab.select(F.col("id").alias("v"), F.col("comp").alias("_vc")), "v")
            .groupBy("u")
            .agg(F.min("_vc").alias("_nc"))
            .select(F.col("u").alias("id"), "_nc")
        )
        # round 14 (guide §2.3): checkpoint BEFORE the halving self-join —
        # a DataFrame self-reference recomputes its subtree on both sides,
        # so without this the neighbor-min join + aggregate ran TWICE per
        # round (once under step, once under parent)
        step = (
            lab.join(nbr, "id", "left")
            .select("id", F.least("comp", F.coalesce("_nc", "comp")).alias("comp"))
            .localCheckpoint()
        )
        parent = step.select(F.col("id").alias("_pid"), F.col("comp").alias("_pc"))
        lab = (
            step.join(parent, step["comp"] == parent["_pid"], "left")
            .select("id", F.least("comp", F.coalesce("_pc", "comp")).alias("comp"))
            .localCheckpoint()
        )
        cur_sum = lab.agg(F.sum("comp")).first()[0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    e.unpersist()
    if not converged:
        # exhausting the budget mid-merge would silently emit split
        # components (multiple "canonical" survivors per true cluster) —
        # surface it instead. Pointer halving converges in O(log diameter)
        # rounds, so hitting this means a pathological graph or a budget
        # set far too low for it.
        import warnings

        warnings.warn(
            f"connected_components did not converge within {max_iterations} "
            "iterations; returned components may be partially merged. "
            "Raise max_iterations.",
            RuntimeWarning,
            stacklevel=2,
        )
    return lab.select("id", F.col("comp").alias("component"))


def dedup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """End-to-end near-dup clustering: every document labeled with its
    cluster and a canonical-survivor flag.

    MinHash-LSH candidate edges -> connected components -> cluster_id = the
    smallest doc id in the component (documents with no near-dup are their
    own singleton cluster). This is the complete dedup pass a training
    pipeline runs: ``filter(is_canonical)`` keeps exactly one document per
    near-duplicate cluster. Returns (doc_id, cluster_id, is_canonical).

    The candidate stage uses STAR edges (``minhash_star_edges``): each LSH
    bucket member links only to the bucket's min id, so a mega-bucket of c
    boilerplate near-dups contributes c edges instead of c²/2 pairs —
    connected components (and therefore clusters/keepers) are identical by
    the star form's connectivity equivalence, but no reducer ever sees a
    quadratic pair fan-out at 100 TB duplication rates."""
    pairs = minhash_star_edges(df, text_col, id_col, num_hashes, bands, shingle_n)
    comp = connected_components(pairs, "doc_a", "doc_b").withColumnRenamed("id", id_col)
    ids = df.select(F.col(id_col).cast("long").alias(id_col))
    return ids.join(comp, id_col, "left").select(
        F.col(id_col),
        F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        (F.coalesce("component", F.col(id_col)) == F.col(id_col)).alias("is_canonical"),
    )


def _merge_spans(occ: DataFrame, k: int, part_cols: list[str]) -> DataFrame:
    """Merge k-token coverage intervals [pos, pos+k-1] into maximal spans
    per partition key (gaps-and-islands): an occurrence starts a new span
    iff its pos exceeds the running max end of everything before it by 2+.
    Windows partition by (document, tag), so state is bounded by per-doc
    gram count, never corpus size. Input (*part_cols, pos) unique; output
    (*part_cols, s, e)."""
    from pyspark.sql import Window

    w_prev = (
        Window.partitionBy(*part_cols).orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(*part_cols).orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        occ.withColumn("_pe", F.max(F.col("pos") + k - 1).over(w_prev))
        .withColumn(
            "_new",
            F.when(F.col("_pe").isNull() | (F.col("pos") > F.col("_pe") + 1), 1)
            .otherwise(0),
        )
        .withColumn("_isl", F.sum("_new").over(w_run))
        .groupBy(*part_cols, "_isl")
        .agg(F.min("pos").alias("s"), (F.max("pos") + k - 1).alias("e"))
        .select(*part_cols, "s", "e")
    )


def span_dedup(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Span-level (substring) exact dedup: find repeated runs of >= k
    tokens WITHIN and ACROSS documents, and produce a cleaned corpus that
    keeps exactly one occurrence of every duplicated span (the
    "deduplicating training data" operator; document-level dedup cannot
    see a boilerplate paragraph pasted into otherwise-distinct pages).

    Exactness without a corpus-wide suffix array: a token belongs to some
    repeated span of length >= k IFF one of the k-grams covering it occurs
    >= 2 times in the corpus — if a span S (|S| >= k) appears twice, every
    k-gram inside S appears twice; conversely a duplicated k-gram IS a
    repeated span of length exactly k. So hash every k-gram (h60, engine-
    portable), count occurrences, and merge the duplicated grams' coverage
    intervals per document. Scale shape: one groupBy on the gram hash
    (map-side combine), one equi-join back, per-DOC windows — the shuffle
    carries (doc, pos, hash) rows, linear in corpus tokens; nothing is
    ever pairwise.

    Removal is keeper-preserving and deterministic: for each duplicated
    k-gram the occurrence with the smallest (doc_id, pos) is the KEEPER; a
    token is removed iff it is covered by some non-keeper occurrence and
    by NO keeper occurrence. Every duplicated span therefore survives at
    its first corpus position and vanishes everywhere else; documents
    shorter than k tokens are never touched.

    Returns one row per input document:
      (doc_id, n_tokens, dup_tokens, dup_ratio, n_spans, spans_str,
       clean_text)
    where spans_str renders the merged duplicated spans as "s-e,s-e" in
    position order, dup_tokens = total tokens under those spans, and
    clean_text is the keeper-preserving cleaned text. clean_text costs
    O(n_tokens x merged-span-count) per doc (the exists() probe) — spans
    are maximal/disjoint, so this is near-linear on natural text.

    Reference parity: no analog in pgvectorscale (vector index extension);
    this is the standard training-corpus operator from the public
    "Deduplicating Training Data Makes Language Models Better" recipe,
    re-expressed as hash-groupBy + interval merge instead of suffix
    arrays."""
    toks = tokens(f"`{text_col}`", SPARK)
    base = _widen(df).select(
        F.col(id_col).cast("long").alias(id_col),
        F.expr(toks).alias("_toks"),
    )
    gram = h60(f"concat_ws(' ', slice(_toks, i + 1, {k}))", SPARK)
    occ = base.select(
        id_col,
        F.posexplode(
            F.expr(
                f"CASE WHEN size(_toks) >= {k} THEN "
                f"transform(sequence(0, size(_toks) - {k}), i -> {gram}) "
                "ELSE cast(array() as array<bigint>) END"
            )
        ).alias("pos", "gh"),
    )
    # Round 14: duplicate detection + keeper selection via ONE window over
    # the gram hash instead of groupBy → join-back. The old self-referencing
    # join re-evaluated `occ` — the md5-heavy gram explode — on BOTH sides
    # (a DataFrame join recomputes, not reuses, the shared subtree) and
    # shuffled the corpus-sized occurrence table a second time for the
    # sort-merge join. The window computes the per-gram count and min
    # (doc, pos) keeper over the same single exchange; rows, keeper rule
    # and every downstream value are identical.
    from pyspark.sql import Window

    w_g = Window.partitionBy("gh")
    docc = (
        occ.withColumn("_c", F.count("*").over(w_g))
        .withColumn(
            "_keep",
            F.min(F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))).over(w_g),
        )
        .filter(F.col("_c") >= 2)
        .select(
            id_col,
            "pos",
            (
                (F.col(id_col) == F.col("_keep.d")) & (F.col("pos") == F.col("_keep.p"))
            ).alias("is_keeper"),
        )
    )
    # three span sets — full coverage (stats), keeper coverage, non-keeper
    # coverage — from ONE pass: tag-explode each occurrence into its sets
    # ('all' + 'kp'|'nk', so rows double, never triple), merge islands
    # with a single window chain over (doc, tag), and fold everything into
    # one per-doc aggregate. The heavy subtree (gram explode + hash,
    # gh groupBy, join back) appears exactly once in the plan — a naive
    # one-merge-per-set formulation recomputes it three times.
    tagged = docc.select(
        id_col,
        "pos",
        F.explode(
            F.array(
                F.lit("all"),
                F.when(F.col("is_keeper"), F.lit("kp")).otherwise(F.lit("nk")),
            )
        ).alias("tag"),
    )
    spans = _merge_spans(tagged, k, [id_col, "tag"])
    # array_sort on (tag, s, e) structs orders by tag then s — and
    # 'all' < 'kp' < 'nk', so each tag's spans come out position-ordered
    perdoc = spans.groupBy(id_col).agg(
        F.expr("array_sort(collect_list(struct(tag, s, e)))").alias("_sp")
    )
    span_struct = "array<struct<tag:string,s:int,e:int>>"
    empty = f"cast(array() as {span_struct})"
    out = (
        base.join(perdoc, id_col, "left")
        .withColumn("_sp", F.expr(f"coalesce(_sp, {empty})"))
        .withColumn("_all", F.expr("filter(_sp, x -> x.tag = 'all')"))
        .select(
            id_col,
            F.size("_toks").cast("long").alias("n_tokens"),
            F.expr(
                "aggregate(_all, 0L, (a, x) -> a + x.e - x.s + 1)"
            ).alias("dup_tokens"),
            F.size("_all").cast("long").alias("n_spans"),
            F.expr(
                "concat_ws(',', transform(_all, x -> concat(x.s, '-', x.e)))"
            ).alias("spans_str"),
            F.expr(
                "concat_ws(' ', filter(_toks, (t, i) -> NOT ("
                "exists(_sp, x -> x.tag = 'nk' AND i >= x.s AND i <= x.e) "
                "AND NOT exists(_sp, x -> x.tag = 'kp' AND i >= x.s AND i <= x.e)"
                ")))"
            ).alias("clean_text"),
        )
        .withColumn(
            "dup_ratio",
            F.round(F.col("dup_tokens") / F.greatest(F.col("n_tokens"), F.lit(1)), 6),
        )
        .select(
            id_col, "n_tokens", "dup_tokens", "dup_ratio", "n_spans",
            "spans_str", "clean_text",
        )
    )
    return out


def paragraph_text_sql(text_expr: str, id_expr: str, dialect: str) -> str:
    """Deterministic paragraph-structured text synthesized from a document
    (closed-form in both engines — the testdata corpus has no newlines, so
    the paragraph operator needs structure synthesized the same way the
    PII arm synthesizes PII): two content paragraphs sliced from the
    document's own tokens, plus a boilerplate paragraph whose case and
    punctuation vary with the doc id while its NORMALIZED form is
    constant — the cross-document duplicate the normalization must catch
    (a raw-exact comparison would miss all three variants)."""
    if dialect == SPARK:
        toks = f"split({text_expr}, ' ')"
        p1 = f"concat_ws(' ', slice({toks}, 1, 8))"
        p2 = f"concat_ws(' ', slice({toks}, 9, 8))"
    else:
        # list_slice takes (begin, end INCLUSIVE), not (start, length)
        toks = f"string_split({text_expr}, ' ')"
        p1 = f"array_to_string(list_slice({toks}, 1, 8), ' ')"
        p2 = f"array_to_string(list_slice({toks}, 9, 16), ' ')"
    boiler = (
        f"CASE WHEN {id_expr} % 3 = 0 THEN 'Subscribe to our Newsletter NOW!!' "
        f"WHEN {id_expr} % 3 = 1 THEN 'subscribe to our newsletter now.' "
        "ELSE '...Subscribe, to our NEWSLETTER: now' END"
    )
    nn = "'\\n\\n'" if dialect == SPARK else "chr(10) || chr(10)"
    return f"concat({p1}, {nn}, {boiler}, {nn}, {p2})"


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Paragraph-granularity exact dedup under NORMALIZATION — the
    standard complement to token-exact ``span_dedup``: boilerplate
    paragraphs repeated across pages with cosmetic differences (case,
    punctuation, spacing) are invisible to exact text equality but
    collapse to one normalized form here.

    Paragraphs split on blank lines (a document without blank lines is
    one paragraph). Normalization = lowercase, every non-alphanumeric run
    to a single space, trim. The h60 of the normalized form groups
    occurrences corpus-wide (one map-side-combined groupBy — the same
    scale shape as exact doc dedup); the occurrence with the smallest
    (doc_id, para_idx) is the KEEPER, every other member of a group of
    2+ is removed; paragraphs whose normalized form is empty carry no
    content and are never deduped. Cleaning is keeper-preserving: the
    cleaned document keeps its paragraphs (ORIGINAL text, not the
    normalized form) in position order minus removed ones.

    Returns one row per input document:
      (doc_id, n_paras, dup_paras, dup_ratio, kept_str, clean_text)
    where kept_str lists surviving paragraph indices ("0,2"), and
    clean_text joins surviving paragraphs with blank lines.

    Reference parity: no analog in pgvectorscale; this is the paragraph
    variant of the public "Deduplicating Training Data" recipe — exact
    dedup after normalization, at paragraph rather than document
    granularity."""
    base = _widen(df).select(
        F.col(id_col).cast("long").alias(id_col),
        F.expr(f"split(`{text_col}`, '\\n{{2,}}')").alias("_ps"),
    ).filter(F.col("_ps").isNotNull())  # null text exploded to no rows before
    # Decide removals on SMALL rows (round 14, guide §8): the old shape
    # evaluated the explode + normalize + h60 fold TWICE (once into the
    # group table, once into the join-back) and then regrouped the full
    # paragraph TEXT by doc_id. Here the occurrence stream carries only
    # (doc_id, idx, f); the duplicate groups collect their sorted member
    # lists directly, so the removal set falls out of the aggregate with
    # no join back to a recomputed corpus — paragraph text never enters
    # an exchange (the final per-doc reassembly is array expressions over
    # the ORIGINAL _ps array on the document row).
    occ = (
        base.select(id_col, F.posexplode("_ps").alias("idx", "p"))
        .select(
            id_col,
            "idx",
            F.expr("trim(regexp_replace(lower(p), '[^a-z0-9]+', ' '))").alias("np"),
        )
        .filter(F.col("np") != "")
        .select(id_col, "idx", F.expr(h60("np", SPARK)).alias("f"))
    )
    # keeper = mem[0] after the sort (struct order = (doc_id, idx), the
    # same ordering F.min(struct(d, i)) used); everyone else is removed
    removed = (
        occ.groupBy("f")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col).alias("d"), F.col("idx").alias("i")))
            ).alias("_mem")
        )
        .filter(F.size("_mem") >= 2)
        .select(F.explode(F.expr("slice(_mem, 2, size(_mem) - 1)")).alias("_r"))
        .select(F.col("_r.d").alias(id_col), F.col("_r.i").alias("i"))
        .groupBy(id_col)
        .agg(F.collect_list("i").alias("_rm"))
    )
    kept = (
        "filter(sequence(0, size(_ps) - 1), "
        "i -> NOT array_contains(coalesce(_rm, array()), i))"
    )
    return base.join(removed, id_col, "left").select(
        id_col,
        # coalesce keeps both counts non-nullable, matching the legacy
        # aggregate-derived schema exactly
        F.expr("coalesce(size(_ps), 0)").cast("long").alias("n_paras"),
        F.expr("coalesce(size(_rm), 0)").cast("long").alias("dup_paras"),
        F.round(
            F.expr("coalesce(size(_rm), 0)") / F.greatest(F.size("_ps"), F.lit(1)),
            6,
        ).alias("dup_ratio"),
        F.expr(f"concat_ws(',', transform({kept}, i -> cast(i as string)))").alias(
            "kept_str"
        ),
        F.expr(
            f"concat_ws('\\n\\n', transform({kept}, i -> element_at(_ps, i + 1)))"
        ).alias("clean_text"),
    )


def semantic_dedup(
    df: DataFrame,
    num_clusters: int = 8,
    iterations: int = 2,
    threshold: float = 0.9,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    k-means-cluster the embeddings, then drop every vector that is
    >= ``threshold`` cosine-similar to a LOWER-ID vector in its own
    cluster. Returns (id, cluster_id, keep) for EVERY input row.

    Two deliberate determinism choices (both oracle-replayable):

    - clustering is the engine's deterministic Lloyd training
      (similarity.kmeans_centroids — lowest-id seeds, fixed iteration
      count), so cluster membership is a pure function of the data;
    - the keep rule is PAIRWISE min-id-wins, not transitive closure:
      A~B and B~C with A<B<C drops B and C even if A!~C. The same
      convention as the streaming near-dup screen (streaming/dedup.py) —
      one survivor per pairwise-similar group, order-free.

    Scale shape: the quadratic work is confined within clusters
    (O(sum c_i^2), not O(n^2)) and the pair join is an equi-join on
    cluster_id — at 100 TB, raise ``num_clusters`` so clusters stay
    executor-sized (SemDeDup's own recipe: ~sqrt(n) clusters); the
    centroid table stays broadcast-sized throughout."""
    from pgvectorscale_spark.operators.similarity import ivf_assign, kmeans_centroids

    cents = kmeans_centroids(
        df, num_clusters, iterations, vector_col=vector_col, id_col=id_col
    )
    assign = ivf_assign(
        df, centroids_df=cents, vector_col=vector_col, id_col=id_col
    ).select(F.col(id_col), F.col("centroid_id").alias("cluster_id"))
    src = df.select(
        F.col(id_col), F.col(vector_col), l2_norm(F.col(vector_col)).alias("_n")
    ).join(assign, id_col)
    a = src.select(
        F.col(id_col).alias("_ida"), F.col("cluster_id"),
        F.col(vector_col).alias("_va"), F.col("_n").alias("_na"),
    )
    b = src.select(
        F.col(id_col).alias("_idb"), F.col("cluster_id"),
        F.col(vector_col).alias("_vb"), F.col("_n").alias("_nb"),
    )
    dups = (
        a.join(b, "cluster_id")
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(
            F.round(
                _pair_cosine_sim(
                    F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")
                ),
                6,
            )
            >= threshold
        )
        .select(F.col("_idb").alias(id_col))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return (
        src.select(id_col, "cluster_id")
        .join(dups, id_col, "left")
        .select(
            id_col,
            F.col("cluster_id").cast("long").alias("cluster_id"),
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep"),
        )
    )


def semdedup_ann(
    df: DataFrame,
    index,
    threshold: float = 0.9,
    k: int = 10,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    **search_kwargs,
) -> DataFrame:
    """Index-served SemDeDup (round 14): embedding near-dup keep/drop
    decisions driven by a built ANN index's corpus x corpus ``ann_join``
    instead of LSH bucketing or within-cluster quadratic scans. Returns
    (``id_col``, keep) for EVERY input row.

    The keep rule is the same pairwise min-id-wins convention as
    :func:`semantic_dedup` and the streaming screen, applied GLOBALLY: a
    row is dropped iff the join surfaces a LOWER-id neighbor with cosine
    similarity >= ``threshold`` among its top-``k``. Because nearest
    neighbors are the most similar, any row with a qualifying lower-id
    neighbor anywhere has qualifying rows filling its top of the list —
    recall is bounded only by the index's graph recall and by ``k``
    (a row whose >= threshold neighborhood exceeds ``k`` rows could see
    only higher-id ones; raise ``k`` above the expected duplicate-group
    size). At exact-parity settings (full fan-out, beam >= corpus,
    k >= corpus) the result provably equals the brute-force global rule
    derived from :func:`embedding_neardup_pairs` (pytest + driver
    oracle); at production settings it inherits the index's measured
    recall — strictly better-targeted than LSH band/row tuning, at the
    ann_join's own two-exchange plan shape (no all-pairs join anywhere).

    ``index`` is any handle exposing ``ann_join`` over a cosine index
    built on the SAME (id, vector) rows (``DiskannIndex`` / ``IvfIndex``
    — raises if the index metric isn't cosine, since the similarity
    threshold is a cosine statement). ``search_kwargs`` pass through
    (``probe_shards``, ``search_list_size``, ``nprobe``, ...)."""
    dt = getattr(getattr(index, "meta", None), "distance_type", None)
    if dt != "cosine":
        raise ValueError(
            f"semdedup_ann needs a cosine index (threshold is a cosine "
            f"similarity); index at {getattr(index, 'path', '?')} is {dt!r}"
        )
    queries = df.select(
        F.col(id_col).cast("long").alias("query_id"),
        F.col(vector_col).alias("query_vec"),
    )
    neigh = index.ann_join(queries, k=k, **search_kwargs)
    # cosine distance -> similarity; the join's distance is the exact
    # rescored value, rounded like the brute-force pair formula
    dropped = (
        neigh.filter(F.col("node_id") < F.col("query_id"))
        .filter(F.round(F.lit(1.0) - F.col("distance"), 6) >= threshold)
        .select(F.col("query_id").alias(id_col))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return (
        df.select(F.col(id_col).cast("long").alias(id_col))
        .join(dropped, id_col, "left")
        .select(id_col, F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep"))
    )


def winnowing_fingerprints(
    df: DataFrame,
    shingle_n: int = 3,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003
    — the MOSS algorithm, public): hash every ``shingle_n``-gram, slide a
    ``window``-wide window over the hash sequence, and in each window
    select the MINIMUM hash, ties broken by the RIGHTMOST position (the
    paper's robust-winnowing rule). The distinct selected (hash, pos)
    pairs are the document's fingerprint set — guaranteed to share a
    fingerprint with any other document containing a matching run of at
    least ``window + shingle_n - 1`` tokens, while keeping only
    ~2/(window+1) of all gram hashes.

    Returns (id, pos, gram_hash) — one row per selected fingerprint,
    1-based gram positions.

    Scale shape (round 14, guide §2.4): a document's gram-hash sequence
    sits in ONE array cell, so the whole selection — every window's
    arg-min and the fingerprint dedupe — is computed in-row with array
    expressions: ZERO shuffles (the previous shape exploded each gram to
    its <= ``window`` window-ends and ran the arg-min through a groupBy +
    distinct, two exchanges of O(grams) rows for a per-row-derivable
    set). The fold scans each window ascending and replaces on
    ``h <= min`` — the same (min hash, RIGHTMOST position) robust rule as
    the old ``min(struct(hash, -pos))`` aggregate; ``array_distinct``
    over (pos, hash) structs within the row equals the old global
    distinct because rows never share an id across docs. Docs with fewer
    than ``window`` grams winnow their whole hash sequence as one window
    (the paper's n < w degenerate case — ``sequence(least(w, n), n)``
    replays the old end-range clamp). NULL-text docs are NOT excluded:
    ``split(NULL)`` yields NULL tokens, whose ``word_shingles`` ELSE
    branch is ``array(concat_ws(' ', NULL))`` = [''], so a NULL-text doc
    emits the single fingerprint (pos 1, h60('')) — identical to the old
    aggregate shape's behavior (``_h`` is never NULL, which is why no
    NULL filter appears below)."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    toks = tokens(f"`{text_col}`", SPARK)
    grams = word_shingles(toks, shingle_n, SPARK)
    hashed = f"transform({grams}, s -> {h60('s', SPARK)})"
    sel = (
        f"array_distinct(transform("
        f"sequence(least({window}, size(_h)), size(_h)), "
        f"e -> aggregate("
        f"sequence(greatest(1, e - {window} + 1), e), "
        f"cast(null as struct<pos:int,h:bigint>), "
        f"(a, p) -> CASE WHEN a IS NULL OR element_at(_h, p) <= a.h "
        f"THEN named_struct('pos', p, 'h', element_at(_h, p)) ELSE a END)))"
    )
    return (
        df.select(F.col(id_col), F.expr(hashed).alias("_h"))
        .select(id_col, F.explode(F.expr(sel)).alias("_s"))
        .select(
            id_col,
            F.col("_s.pos").cast("long").alias("pos"),
            F.col("_s.h").alias("gram_hash"),
        )
    )
