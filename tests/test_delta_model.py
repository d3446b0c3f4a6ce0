"""Randomized mutation-sequence model check for the base+delta sink.

The riskiest surface of the delta design is INTERLEAVING: upserts that
supersede deltas, deletes of rows that only exist in the chain,
resurrections, folds firing mid-sequence, and reloads between operations.
This drives a seeded random operation sequence against a DiskannIndex and a
plain dict model in lockstep, checking full-scan equality after every
operation and exact search parity at the end — the reference's
crud-operations scaffold (test_crud_operations.py) generalized to random
schedules."""

from __future__ import annotations

import numpy as np
import pytest

from pgvectorscale_spark.operators.diskann import DiskannIndex


def _scan_state(idx) -> dict[int, tuple]:
    """Live rows as {node_id: rounded vector tuple}."""
    return {
        int(r["node_id"]): tuple(round(float(x), 5) for x in r["vector"])
        for r in idx.full_scan().collect()
    }


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_random_mutation_sequence_matches_model(spark, tmpdir, seed):
    rng = np.random.default_rng(seed)
    d = 8
    n0 = 120
    mat = rng.random((n0, d), dtype=np.float32)
    df = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(n0)], "vec_id long, embedding array<float>"
    )
    path = f"{tmpdir}/model_{seed}"
    # small fold threshold would be ideal; the default (8) still fires for
    # the 12-op sequences below, covering fold-mid-sequence interleavings
    idx = DiskannIndex.build(
        df, path, distance_type="l2", num_shards=2, num_neighbors=8,
        id_col="vec_id", vector_col="embedding",
    )
    model: dict[int, tuple] = {
        i: tuple(round(float(x), 5) for x in mat[i]) for i in range(n0)
    }
    next_id = 1000
    for step in range(12):
        op = rng.choice(["insert_new", "upsert", "delete", "null_update", "reload"])
        if op == "insert_new":
            rows = []
            for _ in range(int(rng.integers(1, 4))):
                v = rng.random(d).astype(np.float32)
                rows.append((next_id, v.tolist()))
                model[next_id] = tuple(round(float(x), 5) for x in v)
                next_id += 1
            idx.insert(
                spark.createDataFrame(rows, "vec_id long, embedding array<float>")
            )
        elif op == "upsert" and model:
            target = int(rng.choice(sorted(model)))
            v = rng.random(d).astype(np.float32)
            idx.insert(
                spark.createDataFrame(
                    [(target, v.tolist())], "vec_id long, embedding array<float>"
                )
            )
            model[target] = tuple(round(float(x), 5) for x in v)
        elif op == "delete" and model:
            victims = [int(x) for x in rng.choice(sorted(model), size=min(2, len(model)), replace=False)]
            idx.delete(victims)
            for vct in victims:
                model.pop(vct, None)
        elif op == "null_update" and model:
            # UPDATE-to-NULL removes the row (vacuum.rs:378-460 analog)
            target = int(rng.choice(sorted(model)))
            idx.insert(
                spark.createDataFrame(
                    [(target, None)], "vec_id long, embedding array<float>"
                )
            )
            model.pop(target, None)
        elif op == "reload":
            idx = DiskannIndex.load(spark, path)
            continue
        assert _scan_state(idx) == model, f"divergence at step {step} ({op})"

    # end-to-end: exact-parity search returns the model's true top-k
    assert idx.meta.num_rows >= len(model)  # num_rows counts tombstones too
    q = rng.random(d)
    want = sorted(
        model, key=lambda i: (float(np.sum((np.array(model[i]) - q) ** 2)), i)
    )[:5]
    got = [
        int(r["node_id"])
        for r in idx.search(q.tolist(), k=5, search_list_size=2048).collect()
    ]
    assert got == want
    # compact folds everything away and agrees
    idx2 = idx.compact()
    assert _scan_state(idx2) == model
    assert idx2.meta.delta_seq == 0
