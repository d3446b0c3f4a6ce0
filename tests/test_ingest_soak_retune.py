"""Streaming-ingest soak with the drift-triggered routing RE-TUNE
observed live (round-12 stretch): a kmeans index builds its held-out
routing-recall curve at N rows, a real Structured Streaming insert
stream grows the corpus far past ROUTING_DRIFT_BOUND (25%), and the
delta folds that fire mid-stream must re-measure the curve — so
recall_target probe selection never runs against a curve for a corpus
that no longer exists. A concurrent reader serves recall_target
searches throughout (the exact consumer the staleness contract
protects).

Default shape keeps the suite tolerable (24 shards / 480 base rows —
the 64x fixture's shards-per-row density — with ONE fold cycle).
SPARK_GRAFT_SOAK_64X=1 opts into the scaled shape: 20k base rows under
128 kmeans shards with 24k streamed rows. (The full 128k/512 regime
lives in the bench's 64x ANN block, which runs on local[32]; at
pytest's local[4] a 512-shard streaming soak spends nearly an hour in
per-shard micro-batch IO — measured, not guessed — so the opt-in soak
holds the shard-heavy shape at the largest size the fixture session
can actually stream.)"""

from __future__ import annotations

import os
import threading

import numpy as np

from pgvectorscale_spark.operators.diskann import DiskannIndex
from pgvectorscale_spark.streaming.ingest import stream_insert


def test_soak_observes_drift_retune(spark, tmpdir):
    big = os.environ.get("SPARK_GRAFT_SOAK_64X", "0") == "1"
    d = 16
    base_n = 20_000 if big else 480
    num_shards = 128 if big else 24
    n_batches, batch_rows = (8, 3000) if big else (8, 60)
    grown = base_n + n_batches * batch_rows  # 2x the tuned count: drift 100%

    rng = np.random.default_rng(1234)
    mat = rng.random((grown, d), dtype=np.float32)
    df = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(base_n)],
        "vec_id long, embedding array<float>",
    )
    path = f"{tmpdir}/retune_idx"
    idx = DiskannIndex.build(
        df, path, distance_type="l2", num_shards=num_shards,
        shard_assignment="kmeans",
    )
    tuned0 = idx.meta.routing_tuned_nodes
    curve0 = dict(idx.meta.routing_recall_curve)
    assert tuned0 == base_n and curve0, "build must tune the curve"

    src = f"{tmpdir}/retune_stream"
    os.makedirs(src, exist_ok=True)
    for b in range(n_batches):
        ids = [base_n + b * batch_rows + j for j in range(batch_rows)]
        spark.createDataFrame(
            [(i, mat[i].tolist()) for i in ids],
            "vec_id long, embedding array<float>",
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    errors: list[BaseException] = []
    reads = [0]
    stop = threading.Event()

    def reader() -> None:
        from pgvectorscale_spark.operators.index_util import StaleIndexReadError

        qrows = [(int(i), mat[i].tolist()) for i in range(4)]
        while not stop.is_set():
            try:
                h = DiskannIndex.load(spark, path)
                q = spark.createDataFrame(qrows, "query_id long, query_vec array<float>")
                # recall_target consumes the LIVE curve — the consumer the
                # staleness contract exists for
                h.search_batch(q, k=3, recall_target=0.9).collect()
                reads[0] += 1
            except StaleIndexReadError:
                continue  # the documented contract: reload and retry
            except BaseException as ex:  # noqa: BLE001 — record, don't die
                errors.append(ex)
                return

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    q_ins = stream_insert(
        idx, stream, checkpoint_dir=f"{tmpdir}/retune_ckpt", lock_wait=180.0
    )
    q_ins.awaitTermination(3000 if big else 600)
    stop.set()
    t.join(timeout=60)

    assert not errors, f"concurrent recall_target search died: {errors[0]!r}"
    assert reads[0] >= 2, "soak ended before concurrent reads exercised it"

    final = DiskannIndex.load(spark, path)
    assert final.meta.num_rows == grown
    # THE re-tune event: a fold re-measured the curve at the drifted
    # corpus — the tuned-count stamp moved off the build-time value and
    # past the drift bound, and the stamped curve is held-out-fresh
    assert final.meta.routing_tuned_nodes != tuned0, "no re-tune fired"
    assert final.meta.routing_tuned_nodes > base_n * (
        1 + DiskannIndex.ROUTING_DRIFT_BOUND
    )
    assert final.meta.routing_recall_held_out is True
    assert final.meta.routing_recall_curve, "re-tune dropped the curve"
    assert not final.routing_curve_stale(), "curve still stale after folds"
    # the re-tuned curve serves: auto-probe resolves and the grown corpus
    # is searchable through it
    p = final.auto_probe_shards(0.9)
    assert 1 <= p <= num_shards
    probe = base_n + n_batches * batch_rows - 1
    got = final.search(
        mat[probe].tolist(), k=1, search_list_size=256, probe_shards=max(p, 4)
    ).first()
    assert got is not None
