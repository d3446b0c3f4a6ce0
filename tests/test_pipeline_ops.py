"""Spark-only scale paths: LSH near-dup recall vs exact, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgvectorscale_spark.operators import dedup
from pgvectorscale_spark.operators.multimodal import (
    attach_binary_payload,
    decode_image,
    fake_feature_extract,
    frame_sample_plan,
)


def test_lsh_neardup_is_subset_with_recall(spark, embeddings):
    # testdata embeddings are random (max sim ~0.51), so 0.45 is where real
    # pairs live — a higher threshold makes this check vacuous
    exact = {
        (r["id_a"], r["id_b"]) for r in dedup.embedding_neardup_pairs(embeddings, 0.45).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_neardup_lsh(embeddings, 0.45, bands=16, rows_per_band=4).collect()
    }
    assert exact, "fixture must produce non-empty exact pairs"
    assert lsh <= exact  # verification step guarantees precision 1.0
    assert len(lsh & exact) / len(exact) >= 0.8, f"LSH recall {len(lsh & exact)/len(exact)}"


def test_lsh_neardup_recall_on_planted_dups(spark):
    """Planted near-dups (noisy copies, sim >= ~0.9): LSH pair-recall vs the
    exact operator must be >= 0.9 at threshold 0.8 with default banding."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(100, 32)).astype(np.float32)
    noisy = base[:30] + rng.normal(scale=0.15, size=(30, 32)).astype(np.float32)
    rows = [(i, base[i].tolist()) for i in range(100)] + [
        (100 + j, noisy[j].tolist()) for j in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r["id_a"], r["id_b"]) for r in dedup.embedding_neardup_pairs(df, 0.8).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]) for r in dedup.embedding_neardup_lsh(df, 0.8).collect()
    }
    assert len(exact) >= 25, f"planting failed: only {len(exact)} exact pairs"
    assert lsh <= exact
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall}"


def test_fake_feature_extract_shapes(spark, documents):
    src = attach_binary_payload(documents.limit(20))
    feats = fake_feature_extract(src, dim=8).collect()
    assert len(feats) == 20
    assert all(len(r["feature"]) == 8 for r in feats)
    # deterministic: same payload -> same feature
    again = fake_feature_extract(src, dim=8).collect()
    assert {r["doc_id"]: r["feature"] for r in feats} == {r["doc_id"]: r["feature"] for r in again}


def test_decode_image_dispatches_and_gates(spark, documents):
    """decode_image decodes PPM/PNG/JPEG payloads by magic bytes in one
    pass; unknown formats fail loudly naming the remaining gate; the
    audio/video sample stub stays gated."""
    from pgvectorscale_spark.operators.multimodal import (
        attach_png_payload,
        attach_ppm_payload,
        decode_av_samples,
        parse_image,
    )

    src = documents.limit(3)
    ppm = decode_image(attach_ppm_payload(src)).collect()
    png = decode_image(attach_png_payload(src)).collect()
    assert len(ppm) == 3 and len(png) == 3
    assert all(r["channels"] == 3 and r["width"] > 0 for r in ppm + png)
    with pytest.raises(NotImplementedError, match="unsupported image format"):
        parse_image(b"\x00\x01garbage")
    with pytest.raises(Exception, match="unsupported image format"):
        decode_image(attach_binary_payload(src)).collect()  # utf-8 payloads
    with pytest.raises(NotImplementedError, match="MP3 Layer III"):
        decode_av_samples(attach_binary_payload(src))


def test_decode_image_routes_jpeg(spark):
    """A real baseline JPEG payload (test-side encoder) decodes through
    the PUBLIC decode_image API — no PIL, pixels within IDCT tolerance."""
    import numpy as np

    from tests.test_jpeg import encode_jpeg

    rng = np.random.default_rng(74)
    px = (rng.integers(0, 256, size=(16, 16, 3))).astype("uint8")
    payload = encode_jpeg(px)
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    row = decode_image(df).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (16, 16, 3)
    for c, m in zip("rgb", px.reshape(-1, 3).mean(axis=0)):
        assert abs(row[f"mean_{c}"] - m) < 8  # lossy codec: means stay close


def test_frame_sample_plan(spark, documents):
    src = attach_binary_payload(documents.limit(5))
    frames = frame_sample_plan(src, every_n_bytes=64)
    rows = frames.collect()
    assert rows and all(r["frame_no"] >= 0 for r in rows)
    # reassembling frames yields the original payload length
    tot = frames.groupBy("doc_id").agg(F.sum(F.length("frame_bytes")).alias("n")).collect()
    orig = {r["doc_id"]: r["n"] for r in src.select("doc_id", F.length("payload").alias("n")).collect()}
    assert {r["doc_id"]: r["n"] for r in tot} == orig


def test_kmeans_ivf_quality(spark, embeddings):
    """k-means centroids: IVF with trained cells reaches >= the recall of
    lowest-id seeding at the same nprobe budget."""
    import numpy as np

    from pgvectorscale_spark.functions.distance import np_l2_squared
    from pgvectorscale_spark.operators.similarity import ivf_search, kmeans_centroids

    rows = embeddings.orderBy("vec_id").collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    q = mat[9]
    true = set(np.lexsort((np.arange(len(mat)), np_l2_squared(mat, q)))[:10].tolist())

    cents = kmeans_centroids(embeddings, num_centroids=8, iterations=3)
    assert cents.count() == 8
    got_km = {r["vec_id"] for r in ivf_search(
        embeddings, q.tolist(), k=10, num_centroids=8, nprobe=3, centroids_df=cents
    ).collect()}
    got_id = {r["vec_id"] for r in ivf_search(
        embeddings, q.tolist(), k=10, num_centroids=8, nprobe=3
    ).collect()}
    assert len(got_km & true) >= len(got_id & true)
    # full probe = exact
    got_all = {r["vec_id"] for r in ivf_search(
        embeddings, q.tolist(), k=10, num_centroids=8, nprobe=8, centroids_df=cents
    ).collect()}
    assert got_all == true


def test_connected_components_shapes(spark):
    """Chain, cycle, singleton pair: every node labels with the smallest
    reachable id; pointer halving converges a 20-node path in few rounds."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (20, 21)]
        + [(100 + i, 101 + i) for i in range(20)],  # a long path component
        "doc_a long, doc_b long",
    )
    got = {r["id"]: r["component"] for r in dedup.connected_components(pairs).collect()}
    want = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    want.update({100 + i: 100 for i in range(21)})
    assert got == want


def test_dedup_clusters_end_to_end(spark, documents):
    """Every doc appears exactly once; cluster_id = min doc in its LSH
    component; canonical flags mark exactly one doc per cluster; clusters
    agree with a driver-side union-find over the candidate pairs."""
    out = dedup.dedup_clusters(documents, num_hashes=8, bands=4, shingle_n=3).collect()
    assert len(out) == documents.count()
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, rows in by_cluster.items():
        assert min(r["doc_id"] for r in rows) == cid
        assert sum(r["is_canonical"] for r in rows) == 1

    pairs = dedup.minhash_candidate_pairs(
        documents, num_hashes=8, bands=4, shingle_n=3
    ).collect()
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in pairs:
        a, b = find(p["doc_a"]), find(p["doc_b"])
        if a != b:
            parent[max(a, b)] = min(a, b)
    for r in out:
        expected = find(r["doc_id"]) if r["doc_id"] in parent else r["doc_id"]
        assert r["cluster_id"] == expected, r


def test_minhash_salted_pairs_exact_parity(spark, documents):
    """max_bucket_size salting is a PLAN change, not a result change: on
    a corpus with a forced mega-bucket (60 verbatim-identical docs share
    every band bucket), the salted triangle join must return exactly the
    direct join's pair set — at a threshold that splits every bucket
    (t=2), at one that leaves remainder groups (t=7), and at one bigger
    than most buckets (t=64, mostly the degenerate g=1 path)."""
    big = documents.limit(10).select("doc_id", "text").unionByName(
        spark.range(60).select(
            (F.col("id") + 100000).alias("doc_id"),
            F.lit("the same boilerplate page body repeated verbatim").alias(
                "text"
            ),
        )
    )
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_candidate_pairs(big, num_hashes=8, bands=4).collect()
    }
    assert len(exact) >= 60 * 59 // 2, "mega-bucket fixture must be quadratic"
    for t in (2, 7, 64):
        salted = {
            (r["doc_a"], r["doc_b"])
            for r in dedup.minhash_candidate_pairs(
                big, num_hashes=8, bands=4, max_bucket_size=t
            ).collect()
        }
        assert salted == exact, f"salted t={t} diverged from the direct join"
    with pytest.raises(ValueError, match="max_bucket_size"):
        dedup.minhash_candidate_pairs(big, max_bucket_size=1)


def test_frame_sample_reassembles_payload(spark, documents):
    """Frames are a lossless partition of the payload: concatenating a
    doc's frames in frame_no order reproduces the original bytes, and
    every frame but the last is exactly every_n bytes."""
    payloads = attach_binary_payload(documents.limit(20))
    frames = frame_sample_plan(payloads, every_n_bytes=64)
    rows = frames.orderBy("doc_id", "frame_no").collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(bytes(r["frame_bytes"]))
    originals = {r["doc_id"]: bytes(r["payload"]) for r in payloads.collect()}
    for doc_id, frs in by_doc.items():
        assert b"".join(frs) == originals[doc_id]
        assert all(len(f) == 64 for f in frs[:-1])


def test_fake_feature_extract_deterministic(spark, documents):
    """Two runs produce identical features (the oracle depends on it), and
    every lane is a [0, 1] float."""
    payloads = attach_binary_payload(documents.limit(10))
    a = {r["doc_id"]: r["feature"] for r in fake_feature_extract(payloads, dim=4).collect()}
    b = {r["doc_id"]: r["feature"] for r in fake_feature_extract(payloads, dim=4).collect()}
    assert a == b
    assert all(0.0 <= v <= 1.0 for feats in a.values() for v in feats)


class TestCuration:
    def test_decontaminate_flags_exact_and_partial_overlap(self, spark):
        from pgvectorscale_spark.operators.curation import decontaminate

        corpus = spark.createDataFrame(
            [
                (1, "a b c d e f g h"),          # contains the benchmark 5-gram
                (2, "x y z w v u t s"),          # clean
                (3, "q q b c d e f q"),          # shares 'b c d e f'
                (4, "short doc"),                # < n words: whole-doc shingle
                (5, "bench mark text here now"), # exact benchmark doc
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(100, "b c d e f"), (101, "bench mark text here now")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: (r["n_hits"], r["contaminated"])
               for r in decontaminate(corpus, bench, shingle_n=5).collect()}
        assert got[1] == (1, True)
        assert got[2] == (0, False)
        assert got[3] == (1, True)
        assert got[4] == (0, False)  # whole-doc shingle not in benchmark
        assert got[5] == (1, True)

    def test_decontaminate_short_doc_exact_containment_only(self, spark):
        from pgvectorscale_spark.operators.curation import decontaminate

        corpus = spark.createDataFrame(
            [(1, "the cat"), (2, "the dog")], "doc_id long, text string"
        )
        bench = spark.createDataFrame([(9, "the cat")], "doc_id long, text string")
        got = {r["doc_id"]: r["contaminated"]
               for r in decontaminate(corpus, bench, shingle_n=8).collect()}
        # both docs and the bench doc are shorter than n: whole-doc shingles,
        # so only the exact match flags — a shared word ('the') never does
        assert got == {1: True, 2: False}

    def test_decontaminate_benchmark_side_broadcasts(self, spark):
        from pgvectorscale_spark.operators.curation import decontaminate

        corpus = spark.createDataFrame(
            [(i, f"w{i} w{i+1} w{i+2} w{i+3} w{i+4} w{i+5}") for i in range(50)],
            "doc_id long, text string",
        )
        bench = corpus.limit(3)
        plan = decontaminate(corpus, bench)._jdf.queryExecution().executedPlan().toString()
        # the shingle-overlap test must be a broadcast join (benchmark side
        # tiny at any corpus scale), never a corpus-wide sort-merge shuffle
        # on the exploded shingles. (The final hits->ids left join may plan
        # as SMJ statically — it is keyed on the corpus's own long id with a
        # rare-rows right side, and AQE demotes it to broadcast at runtime.)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin [_sh" not in plan

    def test_decontaminate_bloom_matches_plain(self, spark, documents):
        """The Bloom-prefiltered variant is bit-identical to the exact
        broadcast form on the real documents table."""
        from pgvectorscale_spark.operators.curation import (
            decontaminate,
            decontaminate_bloom,
        )

        docs = documents.limit(120)
        bench = docs.filter("doc_id % 7 = 0")
        plain = {(r["doc_id"], r["n_hits"], r["contaminated"])
                 for r in decontaminate(docs, bench, shingle_n=5).collect()}
        bloom = {(r["doc_id"], r["n_hits"], r["contaminated"])
                 for r in decontaminate_bloom(docs, bench, shingle_n=5).collect()}
        assert plain == bloom and any(h > 0 for _, h, _ in plain)

    def test_decontaminate_bloom_exact_under_false_positives(self, spark):
        """A deliberately tiny filter (64 bits, 3 hashes, dozens of
        benchmark shingles) saturates with false positives — the verify
        join must still produce the exact result."""
        from pyspark.sql import functions as F

        from pgvectorscale_spark.operators.curation import (
            decontaminate,
            decontaminate_bloom,
        )

        corpus = spark.createDataFrame(
            [(i, " ".join(f"w{i}x{j}" for j in range(8))) for i in range(60)],
            "doc_id long, text string",
        )
        bench = corpus.filter("doc_id % 9 = 0").select(
            "doc_id", F.col("text").alias("text")
        )
        plain = {(r["doc_id"], r["n_hits"]) for r in
                 decontaminate(corpus, bench, shingle_n=5).collect()}
        tiny = {(r["doc_id"], r["n_hits"]) for r in
                decontaminate_bloom(corpus, bench, shingle_n=5, num_bits=64).collect()}
        assert plain == tiny

    def test_decontaminate_bloom_plan_and_validation(self, spark):
        """The corpus side reaches the Bloom probe map-side: the only
        joins before the hit-count aggregation are broadcasts (the 1-row
        bit array and the verify set) — no corpus-shingle shuffle join."""
        import pytest as _pytest

        from pgvectorscale_spark.operators.curation import decontaminate_bloom

        corpus = spark.createDataFrame(
            [(i, f"a{i} b{i} c{i} d{i} e{i} f{i}") for i in range(40)],
            "doc_id long, text string",
        )
        bench = corpus.limit(4)
        plan = decontaminate_bloom(corpus, bench)._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin [_sh" not in plan
        assert "BroadcastNestedLoopJoin" in plan  # the 1-row bit-array attach
        with _pytest.raises(ValueError, match="multiple of 64"):
            decontaminate_bloom(corpus, bench, num_bits=100)

    def test_stratified_sample_exact_counts_and_determinism(self, spark, documents):
        from pgvectorscale_spark.operators.curation import stratified_sample

        out = stratified_sample(documents, "source", 10).collect()
        by_stratum = {}
        for r in out:
            by_stratum.setdefault(r["source"], []).append(r["doc_id"])
        sizes = {r["source"]: c for r, c in
                 ((row, row["cnt"]) for row in
                  documents.groupBy("source").count().withColumnRenamed("count", "cnt").collect())}
        for s, ids in by_stratum.items():
            assert len(ids) == min(10, sizes[s])
        # determinism: same rows under a different partitioning
        again = stratified_sample(documents.repartition(7), "source", 10).collect()
        assert {(r["source"], r["doc_id"]) for r in out} == {
            (r["source"], r["doc_id"]) for r in again
        }

    def test_stratified_sample_matches_naive_window(self, spark, documents):
        """The salted two-phase form equals the naive single-window form
        (the superset argument) — including ranks."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from pgvectorscale_spark.operators.curation import stratified_sample

        got = {(r["source"], r["doc_id"], r["sample_rank"])
               for r in stratified_sample(documents, "source", 7, salt_buckets=5).collect()}
        keyed = documents.withColumn(
            "_key", F.expr("md5(concat('sample:', cast(doc_id as string)))")
        )
        w = Window.partitionBy("source").orderBy(F.col("_key"), F.col("doc_id"))
        naive = {(r["source"], r["doc_id"], r["rn"]) for r in
                 keyed.withColumn("rn", F.row_number().over(w).cast("long"))
                 .filter("rn <= 7").collect()}
        assert got == naive

    def test_stratified_sample_small_stratum_and_validation(self, spark):
        import pytest as _pytest

        from pgvectorscale_spark.operators.curation import stratified_sample

        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b")], "doc_id long, source string"
        )
        out = stratified_sample(df, "source", 5).collect()
        assert len(out) == 3  # strata smaller than n keep everything
        with _pytest.raises(ValueError, match="positive"):
            stratified_sample(df, "source", 0)

    def test_temperature_targets_apportionment(self):
        from pgvectorscale_spark.operators.curation import temperature_targets

        counts = {"web": 700, "wiki": 200, "code": 100}
        # T=1: proportional largest remainder sums exactly to total_n
        t1 = temperature_targets(counts, 1, 100)
        assert t1 == {"web": 70, "wiki": 20, "code": 10}
        # T=2 exaggerates the big source; exact bigint arithmetic
        t2 = temperature_targets(counts, 2, 100)
        w = {s: c * c for s, c in counts.items()}
        tw = sum(w.values())
        assert sum(t2.values()) == 100
        for s in counts:
            assert abs(t2[s] - 100 * w[s] / tw) < 1  # within 1 of the exact share
        assert t2["web"] > t1["web"]
        # T<1 flattens toward uniform (upweights small sources)
        th = temperature_targets(counts, 0.5, 100)
        assert th["code"] > t1["code"] and th["web"] < t1["web"]
        assert sum(th.values()) == 100
        # caps: a tiny stratum can't exceed its size; total dips below
        tc = temperature_targets({"a": 2, "b": 100}, 0.1, 100)
        assert tc["a"] == 2
        # remainder ties break on stratum name ascending
        tt = temperature_targets({"x": 1, "y": 1, "z": 1}, 1, 2)
        assert tt == {"x": 1, "y": 1, "z": 0}
        import pytest as _pytest

        with _pytest.raises(ValueError, match="total_n"):
            temperature_targets(counts, 1, 0)
        with _pytest.raises(ValueError, match="temperature"):
            temperature_targets(counts, 0, 10)
        with _pytest.raises(ValueError, match="at least one"):
            temperature_targets({}, 1, 10)
        with _pytest.raises(ValueError, match="empty"):
            temperature_targets({"a": 0}, 1, 10)

    def test_temperature_resample_matches_naive_selection(self, spark, documents):
        """The operator keeps exactly the targets' hash-order prefixes —
        replayed here with a naive python selection per stratum."""
        from pgvectorscale_spark.operators.curation import (
            temperature_resample,
            temperature_targets,
        )

        rows = documents.select("doc_id", "source").collect()
        counts: dict[str, int] = {}
        for r in rows:
            counts[r["source"]] = counts.get(r["source"], 0) + 1
        targets = temperature_targets(counts, 2, 120)
        import hashlib

        by_s: dict[str, list] = {}
        for r in rows:
            k = hashlib.md5(f"mix:{r['doc_id']}".encode()).hexdigest()
            by_s.setdefault(r["source"], []).append((k, r["doc_id"]))
        expected = set()
        for s, pairs in by_s.items():
            pairs.sort()
            expected |= {d for _, d in pairs[: targets[s]]}
        got = {
            r["doc_id"]
            for r in temperature_resample(documents, "source", 2, 120).collect()
        }
        assert got == expected
        assert len(got) == sum(targets.values())
        # determinism under repartitioning
        again = {
            r["doc_id"]
            for r in temperature_resample(
                documents.repartition(7), "source", 2, 120
            ).collect()
        }
        assert again == got

    def test_epoch_expand_multiplicities(self, spark):
        import hashlib

        from pgvectorscale_spark.operators.curation import epoch_expand

        rows = [(i, "a") for i in range(10)] + [(i, "b") for i in range(10, 20)] + [
            (i, "c") for i in range(20, 24)
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = epoch_expand(
            df, "source", {"a": 2.5, "b": 0.3, "c": 0.0}, salt="epoch"
        ).collect()
        per_doc: dict[int, list[int]] = {}
        for r in out:
            per_doc.setdefault(r["doc_id"], []).append(r["copy"])
        # stratum a: base 2, extra to round(0.5*10)=5 smallest-hash docs
        def hkey(d):
            return hashlib.md5(f"epoch:{d}".encode()).hexdigest()

        a_sorted = sorted(range(10), key=lambda d: (hkey(d), d))
        for d in a_sorted[:5]:
            assert sorted(per_doc[d]) == [1, 2, 3]
        for d in a_sorted[5:]:
            assert sorted(per_doc[d]) == [1, 2]
        # stratum b: base 0, round(0.3*10)=3 docs kept once
        b_docs = [d for d in range(10, 20) if d in per_doc]
        b_sorted = sorted(range(10, 20), key=lambda d: (hkey(d), d))
        assert set(b_docs) == set(b_sorted[:3])
        assert all(per_doc[d] == [1] for d in b_docs)
        # stratum c: 0 epochs -> dropped entirely
        assert all(d not in per_doc for d in range(20, 24))
        # determinism under repartitioning
        again = epoch_expand(
            df.repartition(5), "source", {"a": 2.5, "b": 0.3, "c": 0.0}, salt="epoch"
        ).collect()
        assert sorted((r["doc_id"], r["copy"]) for r in again) == sorted(
            (r["doc_id"], r["copy"]) for r in out
        )

    def test_epoch_expand_default_and_validation(self, spark):
        import pytest as _pytest

        from pgvectorscale_spark.operators.curation import epoch_expand

        df = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, None)], "doc_id long, source string"
        )
        out = epoch_expand(df, "source", {"a": 2.0}).collect()
        got = sorted((r["doc_id"], r["copy"]) for r in out)
        # a doubles, b defaults to 1 epoch, NULL stratum is dropped
        assert got == [(1, 1), (1, 2), (2, 1)]
        with _pytest.raises(ValueError, match="non-negative"):
            epoch_expand(df, "source", {"a": -1.0})

    def test_repetition_stats_known_values(self, spark):
        from pgvectorscale_spark.operators.curation import repetition_stats

        df = spark.createDataFrame(
            [
                (1, "a a a a"),        # one token repeated
                (2, "a b c d"),        # all distinct
                (3, "a b a b a"),      # alternating
            ],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
        assert got[1]["n_tokens"] == 4 and got[1]["top_token_frac"] == 1.0
        # 2-grams of 'a a a a' = ['a a'] x3 -> dup frac 1 - 1/3
        assert abs(got[1]["dup_2gram_frac"] - (1 - 1 / 3)) < 1e-6
        assert got[2]["top_token_frac"] == 0.25
        assert got[2]["dup_2gram_frac"] == 0.0 and got[2]["dup_3gram_frac"] == 0.0
        assert abs(got[3]["top_token_frac"] - 3 / 5) < 1e-6
        # 2-grams: [ab, ba, ab, ba] -> 1 - 2/4
        assert abs(got[3]["dup_2gram_frac"] - 0.5) < 1e-6


def test_temperature_resample_empty_and_all_null(spark):
    from pgvectorscale_spark.operators.curation import temperature_resample

    empty = spark.createDataFrame([], "doc_id long, source string")
    assert temperature_resample(empty, "source", 2, 10).count() == 0
    nulls = spark.createDataFrame([(1, None), (2, None)], "doc_id long, source string")
    assert temperature_resample(nulls, "source", 2, 10).count() == 0
