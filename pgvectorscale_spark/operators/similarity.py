"""Similarity search beyond the graph index: IVF coarse quantization.

The scale path for batch ANN when a graph is overkill: partition the corpus
into Voronoi cells around centroids, search only the `nprobe` cells nearest
the query, rerank exactly. Fully declarative (joins + window top-k), so
Catalyst handles pushdown and the cell assignment is one shuffle.

Centroid choice is deterministic (the `num_centroids` lowest-id vectors) so
results are reproducible and the DuckDB oracle can replay the exact
computation. Swap in k-means centroids for quality at scale — the operator
shape (assign → probe → rerank) is unchanged.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgvectorscale_spark.functions.distance import distance_expr

__all__ = ["ivf_assign", "ivf_search", "kmeans_centroids"]


# Per-session memo of corpus→centroid assignments, keyed by the LOGICAL PLAN
# (Dataset.semanticHash) of the corpus + centroid frames and the assignment
# params. A query workload over one corpus pays the corpus × centroids
# assignment ONCE, not per query — the ivf_search default path then costs
# O(probed cells) per call like the persisted IvfIndex (which remains the
# durable scale path; this memo is its in-session twin). Round 14: each
# entry holds (centroids, wide) — the tiny centroid frame AND the
# assignment JOINED back to the vectors — so a query probes entirely from
# the persisted frames: the old per-call shape re-scanned the corpus
# parquet twice per query (once for the lowest-id centroid TakeOrdered,
# once for the candidates join); now both scans happen once at cache fill
# (guide §1.2 step 1: don't recompute what a prior pass already holds).
# Entries hold persisted DataFrames; eviction unpersists.
_ASSIGN_CACHE: OrderedDict[tuple, tuple] = OrderedDict()
_ASSIGN_CACHE_CAP = 4


_FINGERPRINT_STAT_CAP = 256


def _data_fingerprint(df: DataFrame) -> tuple:
    """Cheap data identity for file-backed frames. semanticHash covers only
    the LOGICAL PLAN — overwriting the files under an identical path/plan
    would otherwise serve a stale cached assignment for the rest of the
    session. The file LIST (hashed, so the key stays small) catches
    overwrites/appends/compactions on its own because parquet writers mint
    unique part-file names; per-file (size, mtime) stats sharpen that for
    same-name rewrites but are capped at _FINGERPRINT_STAT_CAP files — at
    corpus scale a
    per-lookup stat storm would dwarf the assignment the memo protects.
    Non-file sources return () — the plan hash already covers their data.
    """
    import hashlib
    import os
    from urllib.parse import urlparse

    files = sorted(df.inputFiles())
    if not files:
        return ()
    h = hashlib.md5("\n".join(files).encode())
    if len(files) <= _FINGERPRINT_STAT_CAP:
        for f in files:
            p = urlparse(f).path if "://" in f or f.startswith("file:") else f
            try:
                st = os.stat(p)
                h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
            except OSError:
                h.update(b"?")
    return (len(files), h.hexdigest())


def _probe_frames_cached(
    df: DataFrame,
    num_centroids: int,
    distance_type: str,
    vector_col: str,
    id_col: str,
    centroids_df: DataFrame | None,
) -> "tuple[DataFrame, DataFrame] | None":
    """(centroids, wide) persisted per (corpus plan, centroid plan, params):
    ``centroids`` is (centroid_id, _cv) and ``wide`` the assignment joined
    back to the vectors — (id, centroid_id, <vector_col>). Probing reads
    only these frames: no corpus parquet scan per query. Returns None when
    the plan has no stable identity (caller computes fresh)."""
    try:
        key = (
            # the application id scopes entries to THIS SparkContext:
            # semanticHash is deterministic across sessions, and a cached
            # DataFrame from a stopped context would fail on reuse
            df.sparkSession.sparkContext.applicationId,
            df._jdf.semanticHash(),
            # plan hash + file fingerprint: files overwritten/appended under
            # an unchanged plan rotate the key instead of serving stale rows
            _data_fingerprint(df),
            centroids_df._jdf.semanticHash() if centroids_df is not None else None,
            num_centroids,
            distance_type,
            vector_col,
            id_col,
        )
    except Exception:
        # no stable plan identity (e.g. a mocked frame): compute fresh
        return None
    hit = _ASSIGN_CACHE.get(key)
    if hit is not None:
        _ASSIGN_CACHE.move_to_end(key)
        return hit
    if centroids_df is not None:
        centroids = centroids_df.select("centroid_id", F.col("centroid").alias("_cv"))
    else:
        centroids = (
            df.orderBy(F.col(id_col).asc())
            .limit(num_centroids)
            .select(F.col(id_col).alias("centroid_id"), F.col(vector_col).alias("_cv"))
        )
    centroids = centroids.persist()
    assign = ivf_assign(
        df, num_centroids, distance_type, vector_col, id_col, centroids_df
    )
    wide = (
        assign.select(id_col, "centroid_id")
        .join(df.select(id_col, vector_col), id_col)
        .persist()
    )
    entry = (centroids, wide)
    _ASSIGN_CACHE[key] = entry
    while len(_ASSIGN_CACHE) > _ASSIGN_CACHE_CAP:
        _, old = _ASSIGN_CACHE.popitem(last=False)
        for frame in old:
            try:
                frame.unpersist()
            except Exception:
                pass
    return entry


def kmeans_centroids(
    df: DataFrame,
    num_centroids: int = 16,
    iterations: int = 5,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Declarative Lloyd iterations: the quality upgrade over lowest-id seeds.

    Each round = one broadcast-join assignment + one map-side-combined
    aggregate (posexplode -> avg per (cluster, dim)); centroids stay tiny and
    broadcast, the corpus is scanned ``iterations`` times and never shuffled
    whole (the shuffle carries num_centroids x dims partial sums per task).
    Seeds are the lowest-id vectors, so the whole training is deterministic.

    Returns (centroid_id, centroid array<double>).
    """
    centroids = (
        df.orderBy(F.col(id_col).asc())
        .limit(num_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col(vector_col).cast("array<double>").alias("_cv"))
    )
    src = df.select(F.col(id_col), F.col(vector_col)).persist()
    try:
        for _ in range(iterations):
            scored = src.crossJoin(F.broadcast(centroids)).withColumn(
                "_d", distance_expr(F.col(vector_col), F.col("_cv"), "l2")
            )
            # min_by aggregation, not row_number-over-window: a window sorts
            # n x centroids rows; the hash agg reduces map-side to one row
            # per id (tie-break (distance, centroid_id) via struct ordering)
            assigned = scored.groupBy(id_col).agg(
                F.min_by("centroid_id", F.struct("_d", "centroid_id")).alias("centroid_id"),
                F.first(vector_col).alias(vector_col),  # constant within the group
            )
            centroids = (
                assigned.select("centroid_id", F.posexplode(vector_col).alias("dim", "v"))
                .groupBy("centroid_id", "dim")
                .agg(F.avg("v").alias("m"))
                .groupBy("centroid_id")
                .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("_s"))
                .select(
                    "centroid_id",
                    F.expr("transform(_s, x -> x.m)").alias("_cv"),
                )
            )
        return centroids.select("centroid_id", F.col("_cv").alias("centroid"))
    finally:
        src.unpersist()


def ivf_assign(
    df: DataFrame,
    num_centroids: int = 16,
    distance_type: str = "l2",
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    centroids_df: DataFrame | None = None,
) -> DataFrame:
    """Assign every vector to its nearest centroid.

    Returns (id, centroid_id, assign_dist). Default centroids = vectors with
    the `num_centroids` lowest ids (deterministic, oracle-replayable); pass
    ``centroids_df`` (centroid_id, centroid) from kmeans_centroids for the
    quality path.
    """
    if centroids_df is not None:
        centroids = centroids_df.select("centroid_id", F.col("centroid").alias("_cv"))
    else:
        centroids = (
            df.orderBy(F.col(id_col).asc())
            .limit(num_centroids)
            .select(F.col(id_col).alias("centroid_id"), F.col(vector_col).alias("_cv"))
        )
    scored = df.select(F.col(id_col), F.col(vector_col)).crossJoin(F.broadcast(centroids))
    scored = scored.withColumn(
        "assign_dist", distance_expr(F.col(vector_col), F.col("_cv"), distance_type)
    )
    # min_by aggregation (map-side partial) instead of row_number-over-window:
    # the window would sort-shuffle n x centroids rows for a 1-row-per-id
    # answer; the hash agg collapses to n rows before the exchange
    return scored.groupBy(id_col).agg(
        F.min_by("centroid_id", F.struct("assign_dist", "centroid_id")).alias("centroid_id"),
        F.round(F.min("assign_dist"), 6).alias("assign_dist"),
    )


def ivf_search(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    distance_type: str = "l2",
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    centroids_df: DataFrame | None = None,
    assign_df: DataFrame | None = None,
    cache_assignment: bool = True,
) -> DataFrame:
    """IVF top-k: probe the nprobe cells nearest the query, exact rerank.

    Returns (id, distance) — distance rounded to 6dp for oracle parity.
    The corpus→centroid assignment (the only corpus-sized stage) is memoized
    per (corpus plan, centroid plan, params) for the session, so a query
    workload pays it once — per-query cost is then proportional to the
    probed cells, matching the persisted ``IvfIndex`` (the durable scale
    path). Pass ``assign_df`` (from your own ``ivf_assign``) to manage reuse
    explicitly, or ``cache_assignment=False`` to force a fresh assignment
    (e.g. when the underlying files changed beneath an identical plan).
    """
    qlit = F.array([F.lit(float(x)) for x in query_vec])
    wide = None
    if assign_df is not None:
        assign = assign_df
    elif cache_assignment:
        frames = _probe_frames_cached(
            df, num_centroids, distance_type, vector_col, id_col, centroids_df
        )
        if frames is not None:
            centroids, wide = frames
        else:
            assign = ivf_assign(df, num_centroids, distance_type, vector_col, id_col, centroids_df)
    else:
        assign = ivf_assign(df, num_centroids, distance_type, vector_col, id_col, centroids_df)
    if wide is None:
        if centroids_df is not None:
            centroids = centroids_df.select("centroid_id", F.col("centroid").alias("_cv"))
        else:
            centroids = (
                df.orderBy(F.col(id_col).asc())
                .limit(num_centroids)
                .select(F.col(id_col).alias("centroid_id"), F.col(vector_col).alias("_cv"))
            )
    probed = (
        centroids.withColumn("_qd", distance_expr(F.col("_cv"), qlit, distance_type))
        .orderBy(F.col("_qd").asc(), F.col("centroid_id").asc())
        .limit(nprobe)
        .select("centroid_id")
    )
    if wide is not None:
        # memoized path (round 14): candidates come straight from the
        # persisted (id, centroid_id, vector) frame — the per-call plan
        # touches NO corpus parquet (the old shape re-scanned the corpus
        # for the centroid TakeOrdered and again for the candidate join).
        # Row set, distance expression, rounding and tie-break are
        # identical to the fresh path, so results are unchanged.
        cand = wide.join(F.broadcast(probed), "centroid_id")
    else:
        candidate_ids = assign.join(F.broadcast(probed), "centroid_id").select(id_col)
        cand = df.join(candidate_ids, id_col)
    return (
        cand
        .withColumn("distance", F.round(distance_expr(F.col(vector_col), qlit, distance_type), 6))
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "distance")
    )
