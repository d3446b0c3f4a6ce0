"""Generate PLANS.md: formatted physical plans of the headline queries with
the scale properties each plan must (and does) exhibit. Re-run after plan-
affecting changes: python scripts/dump_plans.py"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from pgvectorscale_spark.functions.text import with_text_features
from pgvectorscale_spark.operators import dedup, relational
from pgvectorscale_spark.operators.knn import search_exact, search_exact_batch
from pgvectorscale_spark.operators.packing import pack_sequences
from pgvectorscale_spark.session import get_spark
from pgvectorscale_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def fmt(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    spark = get_spark("plans", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    li = load_table(spark, "lineitem", SF)
    orders = load_table(spark, "orders", SF)
    customer = load_table(spark, "customer", SF)
    nation = load_table(spark, "nation", SF)
    emb = load_table(spark, "embeddings", SF)
    docs = load_table(spark, "documents", SF)
    q0 = emb.filter("vec_id = 0").first()["embedding"]
    qdf = emb.filter("vec_id < 4").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    sections = [
        (
            "pricing_summary (scan → filter → agg)",
            "Filter and 7-column projection reach the parquet scan "
            "(`PushedFilters`, `ReadSchema`); `partial_sum` before the single "
            "exchange means the shuffle carries group partials, not rows. At "
            "100 TB this plan's shuffle is O(groups x tasks).",
            relational.pricing_summary(li),
        ),
        (
            "top_customers (fact ⋈ two dims)",
            "Both dimension joins are `BroadcastHashJoin` — the orders fact "
            "table is never shuffled for the join; the only exchange is the "
            "groupBy. Catalyst chose broadcast from the explicit hint; AQE "
            "would also convert at runtime from size stats.",
            relational.top_customers(orders, customer, nation),
        ),
        (
            "exact k-NN single query (M0 / rescore stage)",
            "Pure JVM: the distance is a higher-order-function fold inside "
            "codegen (no Python anywhere in the plan) and the top-k compiles "
            "to `TakeOrderedAndProject` — per-partition heap + driver merge, "
            "no global sort.",
            search_exact(emb, q0, k=10),
        ),
        (
            "exact k-NN batch, numpy path (scale serving)",
            "`MapInPandas` (BLAS scoring + per-batch local top-k) sits BELOW "
            "the exchange: each scan task emits k rows per query, so the "
            "window's shuffle is O(k x queries x tasks), corpus never moves.",
            search_exact_batch(emb, qdf, k=5, impl="numpy"),
        ),
        (
            "MinHash LSH candidate pairs (dedup scale path)",
            "No `CartesianProduct` — and since round 14 no join at all: "
            "signatures are a zero-shuffle per-row fold, bands explode from "
            "one projection, ONE `ObjectHashAggregate` collects each "
            "bucket's sorted member list (map-side partial on the same "
            "(band_id, band_hash) keys), and in-bucket pairs come from a "
            "JVM array expression. The md5-heavy signature fold runs ONCE "
            "(the old bucket self-join re-evaluated it on both sides).",
            dedup.minhash_candidate_pairs(docs, num_hashes=8, bands=4),
        ),
        (
            "text_features (per-row analysis)",
            "Six analysis columns (token count, ratios, quality, language id, "
            "fingerprint) — all JVM expressions over one scan; zero Python, "
            "zero shuffles. Map-only at any scale.",
            with_text_features(docs),
        ),
        (
            "ngram_jaccard_pairs (exact verify, prefix-filtered)",
            "No `CartesianProduct`: candidates come from an equi-join on "
            "rarest-first PREFIX shingles (hot stop-shingles sort last and "
            "drop out of the inverted index — no c² rows on one reducer), "
            "then ONE `array_intersect` per candidate pair computes the "
            "exact jaccard over the full shingle sets.",
            dedup.ngram_jaccard_pairs(docs, threshold=0.8),
        ),
        (
            "simhash_pairs_multiprobe (wide-fingerprint near-dup pairs)",
            "No join at all (round 14): one pass tags each row's own block "
            "value plus its constant <=t-flip probe variants (sum C(width, "
            "<=t) masks) with a role, and ONE groupBy collects both roles' "
            "members per (band_id, value) — the fingerprint fold is "
            "evaluated once where the old probe ⋈ raw self-join computed "
            "it twice. Wide blocks keep buckets collision-sparse; the "
            "probe factor is a constant while collisions shrink "
            "exponentially with block width — the right trade at corpus "
            "scale.",
            dedup.simhash_pairs_multiprobe(docs, max_hamming=3, num_bits=60, num_blocks=2),
        ),
        (
            "pack_sequences (distributed prefix sum)",
            "The running token total is a two-phase scan: the only `Window` "
            "is PARTITIONED by bucket (count-balanced approx-quantile "
            "boundaries — clustered id spaces stay balanced; parallel, "
            "sorted within buckets only); bucket offsets arrive via a "
            "num_buckets-row `BroadcastHashJoin`. No un-partitioned window, "
            "no global sort — the single-task `WindowExec` trap never "
            "appears.",
            pack_sequences(
                docs.selectExpr("doc_id", "size(split(text, ' ')) AS token_count"),
                window_tokens=2048,
            ),
        ),
    ]

    # skew-robust variants (round 9): the salted twins must show their
    # first exchange hashing the SALTED key, which is what splits a
    # pathological key across tasks
    from pgvectorscale_spark.operators.relational import (
        top_orders_per_customer_salted,
        ts_epoch_seconds,
    )
    from pgvectorscale_spark.streaming.sessionize import sessionize_batch_salted

    events = load_table(spark, "events", SF)
    ev = events.withColumn("ts_sec", ts_epoch_seconds(events))
    sections.append(
        (
            "sessionize_batch_salted (skew-robust two-phase sessionize)",
            "Two windows: the FIRST (over the event rows) partitions on "
            "(user_id, _chunk) — the time-chunk salt — so a hot key's "
            "events fan out across tasks; the second window runs over "
            "per-chunk session INTERVALS (rows ~ sessions, not events), so "
            "its per-key row count is bounded by session count. Output "
            "identical to the plain formulation (driver tagged union "
            "hash-verifies both).",
            sessionize_batch_salted(ev, gap_seconds=1800, ts_col="ts_sec"),
        )
    )
    sections.append(
        (
            "top_orders_per_customer_salted (skew-robust two-phase top-k)",
            "Phase-1 exchange hashes (o_custkey, _salt): the hot key's rows "
            "split across salt_buckets tasks, each keeping only k; the "
            "final per-key window ranks at most salt_buckets x k rows per "
            "customer regardless of the key's true row count.",
            top_orders_per_customer_salted(orders, k=3),
        )
    )

    # round-9 second-session additions: Bloom-prefiltered decontamination
    # and exact-size stratified sampling
    from pgvectorscale_spark.operators.curation import (
        decontaminate_bloom,
        stratified_sample,
    )

    sections.append(
        (
            "decontaminate_bloom (bit-array prefilter, exact verify)",
            "The corpus side meets only broadcasts before the hit-count "
            "aggregation: a 1-row `BroadcastNestedLoopJoin` attaches the "
            "packed bit array (bit_or-aggregated from the benchmark "
            "shingles), the probe is a map-side filter over element_at + "
            "bit masks, and survivors verify through a "
            "`BroadcastHashJoin`. No corpus-shingle shuffle join anywhere; "
            "at 100 TB the bit array stays 2^30 bits regardless of "
            "benchmark string volume.",
            decontaminate_bloom(docs, docs.filter("doc_id % 97 = 0"), shingle_n=5),
        )
    )
    sections.append(
        (
            "stratified_sample (salted two-phase per-stratum top-n)",
            "Phase-1 exchange hashes (stratum, _salt) so few-strata corpora "
            "do not funnel into one task per stratum; phase 2's per-stratum "
            "window ranks at most salt_buckets x n survivors. Selection is "
            "a pure function of (salt, id) — deterministic across runs and "
            "engines (DuckDB oracle replays the naive window).",
            stratified_sample(docs, "source", 25),
        )
    )

    # round-10 additions: PII scrub gate, BM25 search, bigram LM scoring,
    # SemDeDup semantic dedup
    from pgvectorscale_spark.functions import pii
    from pgvectorscale_spark.functions.lm import bigram_lm_scores
    from pgvectorscale_spark.functions.text import quality_passes_sql
    from pgvectorscale_spark.operators.bm25 import bm25_topk

    sections.append(
        (
            "pii_stats + quality gate (map-side scrub)",
            "The entire scrub — synthesis, five detector counts, Luhn "
            "checksum folds, redaction hash, Gopher rule verdicts — is ONE "
            "projection over the scan: zero `Exchange` nodes anywhere in "
            "the plan. At 100 TB the gate pipelines into whatever "
            "read/write surrounds it and costs no shuffle.",
            pii.pii_stats(
                pii.attach_pii_text(docs).select("doc_id", "pii_text"),
                text_col="pii_text",
            ).withColumn("passes", F.expr(quality_passes_sql("'x'", "spark"))),
        )
    )
    qdf_bm = docs.filter("doc_id % 53 = 0").select(
        F.col("doc_id").alias("query_id"),
        F.expr("concat_ws(' ', slice(split(text, ' '), 1, 4))").alias("q_text"),
    )
    sections.append(
        (
            "bm25_topk (inverted-index search, query-term prefiltered)",
            "Round 14: the exploded token stream meets the BROADCAST "
            "query-term set BEFORE the tf aggregation, so the only "
            "corpus-sized shuffle carries query-matching tokens only; "
            "per-term document frequency is a count window over that same "
            "filtered postings exchange (the old plan evaluated the FULL "
            "postings aggregation twice — once for IDF, once for scoring). "
            "No SortMergeJoin on the corpus path.",
            bm25_topk(docs, qdf_bm, k=5),
        )
    )
    from pgvectorscale_spark.operators.hybrid import hybrid_topk

    hyb_corpus = docs.join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    )
    hyb_q = hyb_corpus.filter("doc_id % 53 = 0").select(
        F.col("doc_id").alias("query_id"),
        F.expr("concat_ws(' ', slice(split(text, ' '), 1, 4))").alias("q_text"),
        F.col("embedding").alias("q_vec"),
    )
    sections.append(
        (
            "hybrid_topk (BM25 + vector arms fused with RRF)",
            "Both arms keep their own scale shape (the BM25 arm "
            "prefilters its postings by the broadcast query terms; the exact vector arm "
            "broadcasts the query batch into the corpus scan — swap in a "
            "DiskANN/IVF result frame for served traffic, `rrf_fuse` is "
            "arm-agnostic). The fusion itself sees at most "
            "2 x arm_k x |Q| rows regardless of corpus size: partial_sum "
            "before its exchange, then `WindowGroupLimit` cuts the final "
            "top-k before the sort.",
            hybrid_topk(hyb_corpus, hyb_q, k=5, arm_k=10),
        )
    )
    from pgvectorscale_spark.operators.curation import temperature_resample
    from pgvectorscale_spark.sources.warc import attach_warc_payload, parse_warc_records

    sections.append(
        (
            "temperature_resample (exact-count source mixing)",
            "Targets are computed driver-side from one count per stratum "
            "(a scalar-class collect); selection is the same salted "
            "two-phase window as stratified_sample capped at the LARGEST "
            "target, then each stratum filters to its own target through "
            "a broadcast map literal — no per-stratum whole-corpus window, "
            "no second pass.",
            temperature_resample(docs, "source", temperature=2, total_n=120),
        )
    )
    ev = load_table(spark, "events", SF)
    ev = ev.withColumn("ts_sec", relational.ts_epoch_seconds(ev))
    clicks = ev.filter("event_type = 'click'").select("user_id", "ts_sec")
    views = ev.filter("event_type = 'view'").select("user_id", "ts_sec", "event_id")
    sections.append(
        (
            "as_of_join (backward as-of without a range join)",
            "ONE `Exchange hashpartitioning` on the key feeds one window "
            "over the tagged union — no SortMergeJoin, no per-key "
            "cartesian, O(1) window state per row. A raw range predicate "
            "would put the hot key's full row-pair product through a "
            "single task; this shape moves each row exactly once.",
            relational.as_of_join(
                clicks, views, on="user_id", left_ts="ts_sec",
                right_ts="ts_sec", value_cols=["event_id"],
                right_tiebreak="event_id", tolerance=86400,
            ),
        )
    )
    sections.append(
        (
            "range_join (banded buckets)",
            "The range predicate becomes an equi-join on (key, bucket): "
            "right rows land in ONE width-(u-l+1) bucket, each left row "
            "explodes to <= 2 probe buckets, and the exact bounds filter "
            "runs on the narrowed pairs. Skew is bounded by the window "
            "width — a hot key's rows split across its time buckets "
            "instead of meeting in one task.",
            relational.range_join(
                clicks, views, on="user_id", left_ts="ts_sec",
                right_ts="ts_sec", lower=-7200, upper=7200,
                value_cols=["event_id"],
            ),
        )
    )
    sections.append(
        (
            "parse_warc_records (crawl-archive ingestion)",
            "The record walk is one ArrowEvalPython/MapInPandas over the "
            "blob column — blobs are independent, so the plan has ZERO "
            "Exchange below the parse: ingestion scales with input "
            "partitions (at crawl scale, one task per WARC file from a "
            "binaryFile scan). The synth's groupBy is fixture-only.",
            parse_warc_records(attach_warc_payload(docs)),
        )
    )
    sections.append(
        (
            "bigram_lm_scores (stupid-backoff LM scoring)",
            "Training is two map-side-combined aggregates (unigram, bigram "
            "counts over the train slice); scoring joins each document's "
            "bigram OCCURRENCES against those Heaps-law-sized count tables "
            "(AQE broadcasts them while they fit; at vocabulary scale the "
            "join shuffles on the bigram key) and folds ln(p) per doc.",
            bigram_lm_scores(docs),
        )
    )
    sections.append(
        (
            "semantic_dedup (SemDeDup cluster-confined cosine)",
            "Centroid training and assignment touch the corpus only through "
            "broadcast joins; the quadratic cosine pass is an EQUI-join on "
            "cluster_id (never a cross join), so pair work is O(sum "
            "c_i^2) and shrinks as num_clusters grows — SemDeDup's own "
            "sqrt(n)-clusters recipe keeps clusters executor-sized at "
            "100 TB.",
            dedup.semantic_dedup(emb, num_clusters=8, iterations=2, threshold=0.45),
        )
    )

    from pgvectorscale_spark.operators.curation import repetition_stats

    sections.append(
        (
            "repetition_stats (Gopher-family repetition signals)",
            "Map-only since round 14: the top-token share is a "
            "longest-equal-run fold over the row's own sorted token array "
            "(a doc's tokens sit in ONE array cell, so the old explode + "
            "two token-level aggregations + corpus self-join bought "
            "nothing), joining the dup-n-gram fractions as pure "
            "projections — zero Exchange, zero Join at any scale.",
            repetition_stats(docs),
        )
    )
    sections.append(
        (
            "winnowing_fingerprints (MOSS robust winnowing)",
            "Map-only since round 14: every window's arg-min (min hash, "
            "rightmost-position ties) is an in-row fold over the doc's "
            "gram-hash array, and the fingerprint dedupe is an in-row "
            "array_distinct — zero Exchange where the old shape exploded "
            "each gram to its <= window window-ends through a groupBy + "
            "global distinct (two exchanges of O(grams) rows; 96 s -> "
            "4.1 s at sf0.1).",
            dedup.winnowing_fingerprints(docs, shingle_n=3, window=4),
        )
    )
    sections.append(
        (
            "minhash_candidate_pairs, salted triangle (mega-bucket guard)",
            "max_bucket_size splits each LSH bucket into ceil(c/t) salt "
            "groups keyed by (bucket, group-pair) — and since round 14 "
            "with NO join and ONE signature evaluation: bucket sizes come "
            "from a count window on the bucket exchange, each member "
            "emits its left/right group-pair roles in one explode, and a "
            "single groupBy crosses the role lists (the old shape "
            "evaluated the md5-heavy fold four times across the count "
            "aggregate, its join-back and both triangle join sides). No "
            "task ever holds more than ~t^2 rows of one bucket, so a "
            "boilerplate mega-bucket becomes g^2 parallel tasks instead "
            "of one straggling reducer. Result-identical to the direct "
            "join (driver-oracle-verified tagged union).",
            dedup.minhash_candidate_pairs(
                docs, num_hashes=8, bands=4, max_bucket_size=4
            ),
        )
    )
    sections.append(
        (
            "paragraph_dedup (normalized paragraph-granularity dedup)",
            "Decisions on small rows (round 14, guide §8): the occurrence "
            "stream carries only (doc, idx, hash) into one map-side-combined "
            "groupBy; removals explode straight out of the sorted member "
            "lists and re-attach to the INTACT document rows by a broadcast "
            "join — paragraph text enters no exchange, the hash fold is "
            "evaluated once, and reassembly is array expressions over the "
            "original paragraph array; nothing is ever pairwise.",
            dedup.paragraph_dedup(
                docs.selectExpr(
                    "doc_id",
                    dedup.paragraph_text_sql("text", "doc_id", "spark")
                    + " AS text",
                )
            ),
        )
    )
    from pgvectorscale_spark.functions.text import (
        FROZEN_LANG_PROFILES,
        lang_id_profile_sql,
        lang_profile_scores_sql,
    )

    _ps = lang_profile_scores_sql("text", FROZEN_LANG_PROFILES, "spark")
    sections.append(
        (
            "lang_id_profile (learned char-trigram language ID)",
            "Scoring a frozen profile is a PURE PROJECTION over the scan — "
            "zero Exchange nodes, like the PII scrub: per-language scores "
            "are integer substring-count expressions and the argmax is a "
            "CASE cascade over the computed columns, so language ID "
            "pipelines into whatever scan feeds it at 100 TB. (Training "
            "the profile is one explode+groupBy pass, run once.)",
            docs.selectExpr(
                "doc_id",
                *[f"{e} AS score_{l}" for l, e in sorted(_ps.items())],
            ).selectExpr(
                "doc_id",
                lang_id_profile_sql({l: f"score_{l}" for l in _ps})
                + " AS lang_prof",
            ),
        )
    )

    from pgvectorscale_spark.functions.quality_clf import (
        FROZEN_QUALITY_WEIGHTS,
        clf_score_micro_sql,
    )

    _clf = clf_score_micro_sql("text", list(FROZEN_QUALITY_WEIGHTS), "spark")
    sections.append(
        (
            "quality classifier scoring (distilled rule gate)",
            "Scoring the frozen logistic model is a PURE PROJECTION over "
            "the scan — zero Exchange, whole-stage codegen: one per-token "
            "weight lookup folded left-to-right plus the length feature. "
            "The expensive part (training) ran once; the 100 TB pass "
            "pipelines into whatever scan feeds it, exactly like the PII "
            "scrub and the language-ID scorer.",
            docs.selectExpr("doc_id", f"{_clf} AS clf_score_micro"),
        )
    )

    # shard-restricted merge view (round 7): build a tiny index with an
    # open delta chain so the plan shows base + delta scans, every one
    # carrying a shard PartitionFilter
    import shutil
    import tempfile

    from pgvectorscale_spark.operators.diskann import DiskannIndex

    tmp = tempfile.mkdtemp(prefix="plans_diskann_")
    idx = DiskannIndex.build(
        emb.limit(200), f"{tmp}/idx", distance_type="l2", num_shards=4
    )
    idx.insert(emb.filter("vec_id = 0").selectExpr("vec_id + 100000 AS vec_id", "embedding"))
    sections.append(
        (
            "nodes(shards=[...]) — shard-restricted merge view (mutation bookkeeping)",
            "Every parquet scan (base AND delta generations) carries a shard "
            "`PartitionFilters` entry: the restriction is applied BELOW the "
            "latest-wins dedupe window (a post-window filter would not push "
            "past it), so insert membership probes and delete tombstone "
            "fetches read only the touched shards' files — a 1-shard "
            "micro-batch against a 1000-shard index reads 1 shard.",
            idx.nodes(shards=[1]).select("node_id"),
        )
    )

    sections.append(
        (
            "as_of_join_salted (hot-key fan-out for the as-of window)",
            "Phase 1's exchange partitions on (key, TIME CHUNK) — a hot "
            "key fans out across its chunks instead of serializing one "
            "window task. Phase 2 (the carry) windows over CHUNK-LEVEL "
            "rows on the bare key (per-key rows = chunk count, bounded by "
            "active time, not event rate) and joins back on (key, chunk). "
            "Output is pytest-identical to as_of_join on every input.",
            relational.as_of_join_salted(
                clicks, views, on="user_id", left_ts="ts_sec",
                right_ts="ts_sec", value_cols=["event_id"],
                right_tiebreak="event_id", tolerance=86400,
                chunk_seconds=86400,
            ),
        )
    )
    # corpus x corpus ANN join (round 13): queries stay a DataFrame
    idxkm = DiskannIndex.build(
        emb.limit(400), f"{tmp}/idxkm", distance_type="l2", num_shards=4,
        shard_assignment="kmeans",
    )
    sections.append(
        (
            "ann_join (corpus x corpus ANN join, routed)",
            "The query side never collects: routing against the broadcast "
            "centroid table is an ArrowEvalPython/mapInPandas projection "
            "over the QUERY scan, then exactly TWO exchanges — "
            "hashpartitioning(_pid) (round 14: the collision-free PROXY "
            "of (shard, _salt), so every group gets its own task instead "
            "of the balls-in-bins max-load waves) fans routed rows out to the "
            "shard graphs (per-batch probe, worker-side pyarrow reads "
            "invisible to the plan, Arrow batches bound memory at any "
            "|Q|), and hashpartitioning(query_id) runs the window top-k "
            "over |Q| x p x max(k, rescore) candidate rows. Nothing in "
            "the plan scans the corpus. Round 14: the routed row keeps "
            "the query column's element type — step (3) casts to "
            "array<float> for float-at-rest queries, NOT array<double>, "
            "so the fan-out exchange (the join's biggest shuffle: "
            "|Q| x p rows carrying the vector) ships half the bytes; at "
            "100M x 768d x p=8 that is ~2.5 TB instead of ~5 TB.",
            idxkm.ann_join(qdf, k=5, probe_shards=2),
        )
    )
    # IVF twin with the round-14 hot-cell salting: render NOW with the
    # broadcast threshold disabled so the plan shows the SHUFFLE shape
    # the salt exists for (at sf0.01 Catalyst would broadcast the routed
    # side and hide the exchange)
    from pgvectorscale_spark.operators.ivf_index import IvfIndex

    idxivf = IvfIndex.build(
        emb.limit(400).filter(F.col("embedding").isNotNull()),
        f"{tmp}/ivfkm", num_centroids=8, distance_type="l2",
        tune_probing=False,
    )
    _old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ivf_rendered = fmt(idxivf.ann_join(qdf, k=5, nprobe=2))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _old_bc)
    sections.append(
        (
            "IvfIndex.ann_join (hot-cell salted scoring join)",
            "Round 14: the scoring join keys on (centroid_id, _salt) — "
            "scan rows take ONE deterministic salt "
            "(pmod(hash(node_id), ppc)), routed rows replicate across "
            "all ppc salts via a JVM-side explode on the SMALL "
            "(|Q| x nprobe) side — so a hot centroid's scan x queries "
            "work splits across ppc tasks instead of serializing "
            "through one after the exchange. Each (scan row, query) "
            "pair meets in exactly one salt: results are bit-identical "
            "to the unsalted join (pytest-pinned). Rendered with "
            "autoBroadcastJoinThreshold=-1 to show the shuffle shape "
            "the salt exists for; when Catalyst broadcasts the routed "
            "side instead, there is no skewed exchange to salt and the "
            "extra copies ride a broadcast that is ppc x bigger — set "
            "partitions_per_cell=1 for serving-sized query tables.",
            ivf_rendered,
        )
    )
    from pgvectorscale_spark.functions.text import FROZEN_BPE_MERGES, bpe_encode_count

    sections.append(
        (
            "bpe_encode_count (one-pass BPE tokenizer)",
            "The rank-heap tokenizer is ONE ArrowEvalPython projection "
            "over the scan — zero Exchange, like the other frozen-model "
            "scorers — and its per-word cost is O(applied merges) "
            "regardless of merge-table depth, where the engine-replayable "
            "replace chain is O(merges) full-string scans per row and is "
            "rejected outright by both engines' parsers past ~120 merges. "
            "Training (train_bpe_histogram) is one explode+groupBy pass "
            "plus a driver-side merge loop, run once.",
            bpe_encode_count(
                docs.select("doc_id", "text"), list(FROZEN_BPE_MERGES)
            ),
        )
    )

    out = [
        "# PLANS — physical plans of the headline queries\n",
        "Generated by `scripts/dump_plans.py` at sf0.01. Each section states",
        "the scale property the plan must exhibit, then the plan itself.\n",
    ]
    for title, commentary, df in sections:
        out.append(f"\n## {title}\n")
        out.append(commentary + "\n")
        rendered = df if isinstance(df, str) else fmt(df)
        out.append("```\n" + rendered.strip() + "\n```\n")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    shutil.rmtree(tmp, ignore_errors=True)
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
