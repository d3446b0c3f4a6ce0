"""Streaming-ingest end-to-end soak (round-5 stretch item): 20 real
Structured Streaming micro-batches insert through foreachBatch while a
concurrent reader issues searches and a concurrent writer queues deletes on
the writer lock. Asserts the reference's streaming contract: every batch's
rows are eventually served at full precision, tombstoned ids never
resurface, queued writers all succeed (blocking advisory-lock behavior,
ports.rs:160), and concurrent reads stay well-formed throughout — served
ids always come from committed data (cache tokens are committed nonces
only, so a pre-commit graph is never consulted)."""

from __future__ import annotations

import os
import threading
import time

import numpy as np
import pytest

from pgvectorscale_spark.operators.diskann import DiskannIndex
from pgvectorscale_spark.streaming.ingest import stream_delete, stream_insert


def test_streaming_ingest_soak(spark, tmpdir):
    rng = np.random.default_rng(99)
    d = 16
    base_n, n_batches, batch_rows = 200, 20, 10
    mat = rng.random((base_n + n_batches * batch_rows, d), dtype=np.float32)

    df = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(base_n)], "vec_id long, embedding array<float>"
    )
    path = f"{tmpdir}/soak_idx"
    idx = DiskannIndex.build(
        df, path, distance_type="l2", num_shards=2, id_col="vec_id", vector_col="embedding"
    )

    # stage the stream: one parquet file per micro-batch, maxFilesPerTrigger=1
    src = f"{tmpdir}/soak_stream"
    os.makedirs(src, exist_ok=True)
    for b in range(n_batches):
        ids = [base_n + b * batch_rows + j for j in range(batch_rows)]
        spark.createDataFrame(
            [(i, mat[i].tolist()) for i in ids], "vec_id long, embedding array<float>"
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    all_valid_ids = set(range(base_n + n_batches * batch_rows))
    deleted_ids = [5, 17, 42]
    search_errors: list[BaseException] = []
    bad_rows: list[str] = []
    searches_done = [0]
    stop_reading = threading.Event()

    def reader() -> None:
        """Concurrent searches against a fresh load each time: results must
        always be well-formed and only ever contain committed ids."""
        qdf_rows = [(int(i), mat[i].tolist()) for i in range(5)]
        while not stop_reading.is_set():
            try:
                sidx = DiskannIndex.load(spark, path)
                qdf = spark.createDataFrame(qdf_rows, "query_id long, query_vec array<float>")
                res = sidx.search_batch(qdf, k=3, search_list_size=64).collect()
                searches_done[0] += 1
                for r in res:
                    if int(r["node_id"]) not in all_valid_ids:
                        bad_rows.append(f"never-inserted id {r['node_id']} served")
                    if not np.isfinite(r["distance"]) or r["distance"] < 0:
                        bad_rows.append(f"malformed distance {r['distance']}")
            except BaseException as ex:  # noqa: BLE001 — the soak must record, not die
                search_errors.append(ex)
                return
        # drain one final read after the soak for good measure
        time.sleep(0.05)

    # concurrent deleter: queues on the writer lock against the ingest
    # stream's inserts (both writers must succeed — no fail-fast errors)
    del_src = f"{tmpdir}/soak_deletes"
    spark.createDataFrame([(i,) for i in deleted_ids], "vec_id long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(del_src)
    del_stream = (
        spark.readStream.schema("vec_id long").option("maxFilesPerTrigger", 1).parquet(del_src)
    )

    t_reader = threading.Thread(target=reader, daemon=True)
    t_reader.start()
    q_ins = stream_insert(
        idx, stream, checkpoint_dir=f"{tmpdir}/soak_ckpt", lock_wait=120.0
    )
    q_del = stream_delete(
        idx, del_stream, checkpoint_dir=f"{tmpdir}/soak_del_ckpt", lock_wait=120.0
    )
    q_ins.awaitTermination(300)
    q_del.awaitTermination(120)
    stop_reading.set()
    t_reader.join(timeout=60)

    assert not search_errors, f"concurrent search died: {search_errors[0]!r}"
    assert not bad_rows, bad_rows[:5]
    assert searches_done[0] >= 3, "soak ended before concurrent reads exercised it"

    # every micro-batch's rows are eventually served at full precision
    final = DiskannIndex.load(spark, path)
    assert final.meta.num_rows == base_n + n_batches * batch_rows
    probe_ids = [base_n, base_n + 95, base_n + 199, base_n + 123]
    for pid in probe_ids:
        got = final.search(mat[pid].tolist(), k=1, search_list_size=256).first()
        assert got["node_id"] == pid, f"row {pid} not served after soak"
    # tombstoned ids never resurface
    for did in deleted_ids:
        res = [
            int(r["node_id"])
            for r in final.search(mat[did].tolist(), k=5, search_list_size=256).collect()
        ]
        assert did not in res, f"deleted id {did} resurfaced"
    # the delta chain stayed bounded (folds fired during the soak)
    assert final.meta.delta_seq < DiskannIndex.DELTA_FOLD_SEQS + 2
    # and caches only ever key on COMMITTED nonces: the final meta's
    # shard_mutations are exactly what the next search consults
    for s, nonce in final.meta.shard_mutations.items():
        assert nonce, f"shard {s} committed an empty mutation nonce"
