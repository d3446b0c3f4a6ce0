from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import SparkSession

SF_DIR = "/root/testdata/sf0.001"

# Round 15 (VERDICT r14 #1): tests that each took >= 15 s in the measured
# full run (durations captured 2026-08-17; ~2760 s of the ~3750 s total).
# They get the `heavy` marker here — one reviewable list instead of
# decorators scattered over 25 files — and pytest.ini deselects the marker
# by default so the suite fits the driver's verify window. Entries are
# "<file>::<test>" (a bare test name gates every parameterized variant;
# an entry with [param] gates only that variant).
_HEAVY = {
    "test_ingest_soak_retune.py::test_soak_observes_drift_retune",
    "test_ingest_soak.py::test_streaming_ingest_soak",
    "test_round7_fixes.py::test_ivf_reader_lease_survives_two_cycles",
    "test_round7_fixes.py::test_reader_lease_survives_two_maintenance_cycles",
    "test_round7_fixes.py::test_stale_meta_mapping_partially_swept_override_raises_on_spark_path",
    "test_round7_fixes.py::test_expired_lease_gives_no_pin",
    "test_round7_fixes.py::test_leased_readers_stress_through_continuous_folds",
    "test_snapshot_store.py::test_base_dir_with_all_populated_shards_folded_away",
    "test_snapshot_store.py::test_concurrent_readers_through_folds_and_rebuild",
    "test_snapshot_store.py::test_stale_ivf_handle_raises_via_markers",
    "test_snapshot_store.py::test_two_cycles_stale_reader_raises_not_empty",
    "test_snapshot_store.py::test_pre_fold_meta_raises_after_sweep_not_empty",
    "test_snapshot_store.py::test_sweep_removes_aged_trash_and_orphans",
    "test_snapshot_store.py::test_pre_fold_reader_sees_identical_content_through_grace",
    "test_snapshot_store.py::test_ivf_fold_is_snapshot_flipped_with_empty_cell_sentinel",
    "test_snapshot_store.py::test_ivf_rebuild_flips_centroids_generation",
    "test_snapshot_store.py::test_sweep_cleans_sidecar_tmp_and_centroid_orphans",
    "test_bpe_train.py::test_three_way_parity_at_depth_256",
    "test_bpe_train.py::test_batched_equals_sequential_on_real_corpus",
    "test_ivf_labels.py::test_labeled_fold_keeps_labels",
    "test_ivf_labels.py::test_fold_compacts_label_sidecar",
    "test_round8_fixes.py::test_routing_sidecar_compaction_preserves_lookups",
    "test_round8_fixes.py::test_kmeans_insert_upsert_pinned_via_sidecar",
    "test_round8_fixes.py::test_ivf_mutation_probe_is_cell_pruned",
    "test_round5_fixes.py::test_routing_delta_chains_across_batches",
    "test_round5_fixes.py::test_routing_delta_matches_full_recompute",
    "test_round5_fixes.py::test_routing_delta_updates_label_sidecar",
    "test_round5_fixes.py::test_simhash_multiprobe_equals_brute_force[2-1]",
    "test_round9_fixes.py::test_kmeans_reinsert_pin_lifecycle",
    "test_round9_fixes.py::test_long_reader_no_longer_blocks_newer_trash_cycles",
    "test_warm_insert.py::test_warm_micro_batch_costs_under_20pct_of_bulk_build",
    "test_delta_model.py::test_random_mutation_sequence_matches_model",
    "test_delta_sink.py::test_ivf_chain_folds_and_drops_tombstones",
    "test_delta_sink.py::test_delta_chain_folds_at_threshold",
    "test_delta_sink.py::test_100_row_batch_into_20k_shard_writes_o_batch_bytes",
    "test_delta_sink.py::test_incremental_num_rows_stays_exact",
    "test_delta_sink.py::test_mixed_insert_delete_chain_and_compact",
    "test_diskann.py::test_kmeans_sharding_and_routed_search",
    "test_diskann.py::test_kmeans_shard_skew_cap",
    "test_streaming_sampling.py::test_arrival_order_invariance",
    "test_streaming_sampling.py::test_stream_matches_batch_sample",
    "test_streaming_sampling.py::test_version_bumps_only_on_change",
    "test_streaming_asof_salted.py::test_salted_late_left_documented_divergence",
    "test_routing_tune.py::test_stale_curve_retuned_on_fold",
    "test_ann_join.py::test_ivf_ann_join_equals_search_batch",
    "test_hybrid.py::test_hybrid_distributed_queries_matches_serving_path",
    "test_as_of_join.py::test_salted_parity_on_hot_key_fixture",
    "test_ivf_index.py::test_insert_delete_lifecycle",
    "test_round4_fixes.py::test_label_routing_sidecar_widens_probes_and_tracks_inserts",
    "test_round4_fixes.py::test_migrated_index_first_insert_keeps_full_label_sidecar",
    "test_streaming.py::test_stream_insert_into_kmeans_index",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        rel = nodeid.split("tests/")[-1] if "tests/" in nodeid else nodeid
        base = rel.split("[", 1)[0]
        if rel in _HEAVY or base in _HEAVY:
            item.add_marker(pytest.mark.heavy)


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.appName("pgvectorscale-tests")
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="session")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def make_fixture_f1(spark, n=300, d=64, seed=42):
    """FIXTURES.md F1: uniform [0,1) float32 vectors, ids 0..n-1."""
    rng = np.random.default_rng(seed)
    mat = rng.random((n, d), dtype=np.float32)
    rows = [(i, mat[i].tolist()) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, embedding array<float>")
    return df, mat


def make_vectors(spark, n=100, dim=16, seed=42):
    """Seeded corpus in the embeddings-table shape (vec_id, embedding)."""
    rng = np.random.default_rng(seed)
    mat = rng.random((n, dim), dtype=np.float32)
    rows = [(i, mat[i].tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def make_fixture_f4(spark, n=50, d=16, seed=42, num_labels=16):
    """FIXTURES.md F4: labeled corpus with NULL / empty / null-element edge rows."""
    rng = np.random.default_rng(seed)
    mat = (rng.random((n, d), dtype=np.float32) * 2 - 1).astype(np.float32)
    rows = []
    for i in range(n):
        if i % 10 == 7:
            labels = None
        elif i % 10 == 8:
            labels = []
        else:
            labels = sorted({int(rng.integers(1, num_labels + 1)) for _ in range(2)})
        rows.append((i, mat[i].tolist(), labels))
    df = spark.createDataFrame(rows, "id long, embedding array<float>, labels array<smallint>")
    return df, mat, rows
