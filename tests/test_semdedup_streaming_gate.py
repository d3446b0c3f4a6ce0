"""Round-10 additions: SemDeDup-style semantic dedup (dedup.semantic_dedup)
and the proof that the PII/quality scrub gates run UNCHANGED on Structured
Streaming (they are stateless map-side expressions)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pgvectorscale_spark.functions import pii
from pgvectorscale_spark.functions.hashing import SPARK
from pgvectorscale_spark.functions.text import quality_passes_sql
from pgvectorscale_spark.operators.dedup import semantic_dedup

# ---------------------------------------------------------------------------
# semantic dedup
# ---------------------------------------------------------------------------


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_dedup_planted_duplicates(spark):
    """Two tight groups + singletons: within-group members above the
    threshold collapse to the lowest id; singletons survive."""
    rng = np.random.default_rng(3)
    base_a = rng.random(8)
    base_b = rng.random(8) * -1.0
    rows = []
    # group A: ids 0-2 nearly identical
    for i in range(3):
        rows.append((i, (base_a + rng.normal(0, 1e-4, 8)).astype("float32").tolist()))
    # group B: ids 10-11 nearly identical
    for i in (10, 11):
        rows.append((i, (base_b + rng.normal(0, 1e-4, 8)).astype("float32").tolist()))
    # singletons: orthogonal-ish
    rows.append((20, np.eye(8)[0].astype("float32").tolist()))
    rows.append((21, np.eye(8)[4].astype("float32").tolist()))
    got = {
        r["vec_id"]: r
        for r in semantic_dedup(
            _emb_df(spark, rows), num_clusters=3, iterations=2, threshold=0.99
        ).collect()
    }
    assert len(got) == 7  # every input row reported
    assert got[0]["keep"] and not got[1]["keep"] and not got[2]["keep"]
    assert got[10]["keep"] and not got[11]["keep"]
    assert got[20]["keep"] and got[21]["keep"]
    # duplicates share their keeper's cluster
    assert got[1]["cluster_id"] == got[0]["cluster_id"] == got[2]["cluster_id"]


def test_semantic_dedup_pairwise_not_transitive(spark):
    """The documented rule is pairwise min-id-wins: every vector similar to
    a lower-id vector in its cluster is dropped, whether or not the
    survivors would chain."""
    v = np.eye(4)[0]
    rows = [
        (0, v.astype("float32").tolist()),
        (1, (v + 1e-5).astype("float32").tolist()),
        (2, (v - 1e-5).astype("float32").tolist()),
    ]
    got = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(
            _emb_df(spark, rows), num_clusters=1, iterations=1, threshold=0.999
        ).collect()
    }
    assert got == {0: True, 1: False, 2: False}


def test_semantic_dedup_threshold_boundary(spark):
    """Similarity is rounded to 6 decimals before the cut (the oracle
    convention), so a pair at exactly the threshold IS a duplicate."""
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),  # sim exactly 1.0
        (2, [0.0, 1.0]),  # orthogonal: sim 0
    ]
    got = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(
            _emb_df(spark, rows), num_clusters=1, iterations=1, threshold=1.0
        ).collect()
    }
    assert got == {0: True, 1: False, 2: True}


# ---------------------------------------------------------------------------
# stateless gates on Structured Streaming
# ---------------------------------------------------------------------------


def test_scrub_gate_streams_match_batch(spark, tmpdir, documents):
    """pii_stats + the Gopher rule verdicts are pure per-row expressions:
    the SAME operators run on a readStream and produce the batch result
    (the 100 TB shape: the scrub gate rides the ingest stream with no
    state, no watermark, append mode)."""
    docs = documents.limit(60).select("doc_id", "text")
    path = str(tmpdir.join("docs_in"))
    docs.coalesce(1).write.parquet(path)

    stream = spark.readStream.schema(docs.schema).parquet(path)
    rules_col = quality_passes_sql("text", SPARK)
    s = pii.attach_pii_text(stream).select(
        "doc_id",
        F.expr(rules_col).alias("passes"),
        *[
            F.expr(pii.pii_count_sql("pii_text", kind, SPARK)).alias(f"n_{kind}")
            for kind in ("email", "ipv4", "card_valid")
        ],
    )
    q = (
        s.writeStream.format("memory")
        .queryName("scrub_gate")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmpdir.join("ckpt_scrub")))
        .start()
    )
    q.awaitTermination(60)
    got = {
        r["doc_id"]: (r["passes"], r["n_email"], r["n_ipv4"], r["n_card_valid"])
        for r in spark.sql("SELECT * FROM scrub_gate").collect()
    }

    batch = pii.attach_pii_text(docs).select(
        "doc_id",
        F.expr(rules_col).alias("passes"),
        *[
            F.expr(pii.pii_count_sql("pii_text", kind, SPARK)).alias(f"n_{kind}")
            for kind in ("email", "ipv4", "card_valid")
        ],
    )
    exp = {
        r["doc_id"]: (r["passes"], r["n_email"], r["n_ipv4"], r["n_card_valid"])
        for r in batch.collect()
    }
    assert got == exp and len(got) == 60
