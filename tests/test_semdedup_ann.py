"""Index-served SemDeDup (dedup.semdedup_ann, round 14): the global
pairwise min-id-wins keep rule driven by a built ANN index's corpus x
corpus ann_join. At exact-parity settings it must equal the brute-force
rule derived from embedding_neardup_pairs; on a planted near-dup fixture
its detection recall must be >= the LSH path's (the point of serving
dedup from the index: graph recall instead of band/row tuning)."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pgvectorscale_spark.operators import dedup
from pgvectorscale_spark.operators.diskann import DiskannIndex

THRESHOLD = 0.92


@pytest.fixture(scope="module")
def planted(spark):
    """120 base vectors + 40 near-copies (base + small noise): the copies
    are >= THRESHOLD similar to their base (verified below), bases are
    random enough to be dissimilar to each other."""
    rng = np.random.default_rng(61)
    d = 24
    base = rng.normal(size=(120, d))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    copies = base[:40] + rng.normal(scale=0.05, size=(40, d))
    mat = np.concatenate([base, copies]).astype(np.float32)
    df = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(len(mat))],
        "vec_id long, embedding array<float>",
    ).cache()
    df.count()
    return df, mat


def _true_dropped(df):
    """Brute-force global rule: dropped iff the row is the higher id of
    any >= THRESHOLD exact pair."""
    pairs = dedup.embedding_neardup_pairs(df, threshold=THRESHOLD)
    return {r["id_b"] for r in pairs.select("id_b").distinct().collect()}


def test_semdedup_ann_exact_parity(spark, planted, tmp_path):
    df, mat = planted
    n = df.count()
    truth = _true_dropped(df)
    assert len(truth) >= 30, f"fixture planted too few dups: {len(truth)}"
    idx = DiskannIndex.build(
        df, str(tmp_path / "sd_idx"), distance_type="cosine", num_shards=3
    )
    out = dedup.semdedup_ann(
        df, idx, threshold=THRESHOLD, k=n, search_list_size=n
    ).collect()
    assert len(out) == n
    got_dropped = {r["vec_id"] for r in out if not r["keep"]}
    assert got_dropped == truth


def test_semdedup_ann_recall_at_production_settings_beats_lsh(
    spark, planted, tmp_path
):
    df, mat = planted
    truth = _true_dropped(df)
    idx = DiskannIndex.build(
        df, str(tmp_path / "sd_idx2"), distance_type="cosine", num_shards=3
    )
    # production-ish settings: small k, default beam
    ann_dropped = {
        r["vec_id"]
        for r in dedup.semdedup_ann(df, idx, threshold=THRESHOLD, k=10).collect()
        if not r["keep"]
    }
    lsh_dropped = {
        r["id_b"]
        for r in dedup.embedding_neardup_lsh(df, threshold=THRESHOLD)
        .select("id_b")
        .distinct()
        .collect()
    }
    ann_recall = len(ann_dropped & truth) / len(truth)
    lsh_recall = len(lsh_dropped & truth) / len(truth)
    # no false drops on either path (both verify with the exact formula)
    assert ann_dropped <= truth
    assert ann_recall >= lsh_recall, (ann_recall, lsh_recall)
    assert ann_recall >= 0.9, ann_recall


def test_semdedup_ann_requires_cosine_index(spark, planted, tmp_path):
    df, mat = planted
    idx = DiskannIndex.build(
        df, str(tmp_path / "sd_l2"), distance_type="l2", num_shards=2
    )
    with pytest.raises(ValueError, match="cosine"):
        dedup.semdedup_ann(df, idx, threshold=THRESHOLD)


def test_semdedup_ann_ivf_family(spark, planted, tmp_path):
    """The operator is index-family-agnostic (duck-typed ann_join): a
    cosine IvfIndex at full probing + k >= corpus reproduces the exact
    global rule too."""
    from pgvectorscale_spark.operators.ivf_index import IvfIndex

    df, mat = planted
    n = df.count()
    truth = _true_dropped(df)
    idx = IvfIndex.build(
        df.select(F.col("vec_id"), F.col("embedding")),
        str(tmp_path / "sd_ivf"),
        num_centroids=6,
        distance_type="cosine",
        tune_probing=False,
    )
    out = dedup.semdedup_ann(df, idx, threshold=THRESHOLD, k=n, nprobe=6).collect()
    got_dropped = {r["vec_id"] for r in out if not r["keep"]}
    assert got_dropped == truth
