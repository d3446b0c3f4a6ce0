"""Hybrid retrieval — lexical (BM25) + vector (k-NN) arms fused with
Reciprocal Rank Fusion (RRF, Cormack/Clarke/Buettcher 2009).

The single most common production pattern around pgvector/pgvectorscale
is hybrid search: a full-text arm and a `<=>` vector arm merged with
``1 / (rrf_k + rank)`` (Postgres users write it as two CTEs + FULL OUTER
JOIN; the same fusion ships in OpenSearch/Elasticsearch/Vespa). This
module re-expresses it as DataFrame algebra over the arms this repo
already serves:

- **Arms stay cheap at 100 TB.** The lexical arm is operators/bm25.py
  (postings broadcast-join, candidates = docs sharing a query term); the
  vector arm is any ranked (query_id, id, rank) frame — exact k-NN here,
  but a DiskANN/IVF search result fuses identically (``rrf_fuse`` takes
  arbitrary arms). Neither arm shuffles the corpus.
- **Fusion is tiny by construction**: each arm contributes at most
  ``arm_k`` rows per query, so the groupBy/window in ``rrf_fuse`` sees
  ≤ (#arms · arm_k · |Q|) rows — independent of corpus size. AQE will
  pick a broadcast/local plan for it at any scale.
- **Determinism**: RRF contributions are 1/(rrf_k + rank) — at most one
  double addition per (query, doc) with two arms, then rounded to 6
  decimals BEFORE ranking with ties on doc id, so the fused cut is
  identical across engines and partitionings. Arm ranks are themselves
  deterministic (BM25 rounds scores to 6 decimals pre-rank; the vector
  arm rounds distances via ``round_to``).

RRF is rank-only on purpose: BM25 scores and cosine distances live on
incomparable scales, and rank fusion needs no per-query score
normalization (which would be another corpus-dependent statistic to
keep consistent across engines).

No single reference analog (pgvectorscale is the vector arm); this is
the composition its users run around it — SURVEY.md §2's similarity-
search family plus the training-data-pipeline brief.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pgvectorscale_spark.operators.bm25 import BM25_B, BM25_K1, bm25_topk
from pgvectorscale_spark.operators.knn import search_exact_batch

__all__ = ["RRF_K", "hybrid_topk", "hybrid_topk_served", "mmr_rerank", "rrf_fuse"]

# the constant from the original RRF paper; large enough that rank-1
# outliers in one arm can't drown consistent mid-rank agreement
RRF_K = 60


def rrf_fuse(
    arms: Sequence[DataFrame],
    k: int = 10,
    rrf_k: int = RRF_K,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse ranked arms into (query_id, id, rrf_score, rank): score =
    Σ_arms 1/(rrf_k + rank_in_arm) over the arms that returned the doc,
    rounded to 6 decimals before the final ranking (ties on id).

    Each arm is a (query_id, id, rank) frame — a missing (query, doc)
    simply contributes nothing, which IS the RRF convention (no outer
    join against the corpus)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if rrf_k <= 0:
        raise ValueError(f"rrf_k must be positive, got {rrf_k}")
    if not arms:
        raise ValueError("rrf_fuse needs at least one ranked arm")
    contribs = [
        a.select(
            F.col(query_id_col),
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(rank_col).cast("double"))).alias("_c"),
        )
        for a in arms
    ]
    pooled = reduce(lambda x, y: x.unionByName(y), contribs)
    fused = pooled.groupBy(query_id_col, id_col).agg(
        F.round(F.sum("_c"), 6).alias("rrf_score")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("rrf_score"), F.asc(id_col))
    return fused.withColumn(rank_col, F.row_number().over(w).cast("long")).filter(
        F.col(rank_col) <= k
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int,
    lambda_: float = 0.5,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    rel_col: str = "relevance",
    vector_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Maximal Marginal Relevance diversification (Carbonell & Goldstein
    1998) over per-query candidate sets: greedily pick
    argmax λ·rel(d) − (1−λ)·max_{s∈picked} sim(d, s), k times.

    Returns (query_id, id, mmr_score, rank). The empty-set penalty is 0,
    so pick 1 is the relevance argmax with score λ·rel.

    Spark shape: MMR is inherently sequential *within* a query but the
    candidate set is tiny (the upstream top-arm_k), so the greedy loop
    runs as one Arrow-batched ``applyInPandas`` group per query — the
    per-group work is O(k · arm_k) dot products over vectors already cut
    down by the retrieval arm, never a corpus operation.

    Determinism: pairwise cosine sims and relevances are rounded to
    ``round_to`` decimals, MMR scores to 6, ties break on id ascending —
    the same cross-engine seams as the k-NN oracles, which is what lets
    an unrolled SQL twin replay the pick sequence exactly."""
    import numpy as np
    import pandas as pd

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if not 0.0 <= lambda_ <= 1.0:
        raise ValueError(f"lambda_ must be in [0, 1], got {lambda_}")
    lam = float(lambda_)
    schema = (
        f"{query_id_col} long, {id_col} long, mmr_score double, rank long"
    )

    def pick(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        vecs = np.stack(pdf[vector_col].to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(vecs, axis=1, keepdims=True)
        nrm[nrm == 0.0] = 1.0
        unit = vecs / nrm
        sims = np.round(unit @ unit.T, round_to)
        rel = np.round(pdf[rel_col].to_numpy(dtype=np.float64), round_to)
        n = len(pdf)
        picked: list[int] = []
        rows = []
        for step in range(min(k, n)):
            pen = (
                sims[:, picked].max(axis=1) if picked else np.zeros(n)
            )
            scores = np.round(lam * rel - (1.0 - lam) * pen, 6)
            scores[picked] = -np.inf
            best = int(np.argmax(scores))  # first max = smallest id (sorted)
            picked.append(best)
            rows.append(
                (
                    int(pdf[query_id_col].iloc[best]),
                    int(pdf[id_col].iloc[best]),
                    float(scores[best]),
                    step + 1,
                )
            )
        return pd.DataFrame(
            rows, columns=[query_id_col, id_col, "mmr_score", "rank"]
        )

    return candidates.groupBy(query_id_col).applyInPandas(pick, schema)


def hybrid_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    arm_k: int = 20,
    rrf_k: int = RRF_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    distance_type: str = "cosine",
    text_col: str = "text",
    vector_col: str = "embedding",
    id_col: str = "doc_id",
    q_text_col: str = "q_text",
    q_vec_col: str = "q_vec",
    q_id_col: str = "query_id",
    vec_impl: str = "sql",
    round_to: int | None = 4,
) -> DataFrame:
    """BM25 + exact-k-NN hybrid over a corpus carrying both ``text_col``
    and ``vector_col``: each arm retrieves its own top-``arm_k`` per
    query, RRF merges them into the final top-``k``.

    The exact vector arm keeps this oracle-replayable end to end; for a
    served index, run DiskannIndex/IvfIndex.search yourself and hand both
    ranked frames to ``rrf_fuse`` — fusion is arm-agnostic."""
    lex = bm25_topk(
        corpus.select(F.col(id_col), F.col(text_col)),
        queries.select(F.col(q_id_col), F.col(q_text_col)),
        k=arm_k,
        k1=k1,
        b=b,
        text_col=text_col,
        id_col=id_col,
        q_text_col=q_text_col,
        q_id_col=q_id_col,
    ).select(F.col(q_id_col), F.col(id_col), "rank")
    vec = search_exact_batch(
        corpus.select(F.col(id_col), F.col(vector_col)),
        queries.select(F.col(q_id_col), F.col(q_vec_col).alias("query_vec")),
        k=arm_k,
        distance_type=distance_type,
        vector_col=vector_col,
        id_col=id_col,
        query_id_col=q_id_col,
        impl=vec_impl,
        round_to=round_to,
    ).select(F.col(q_id_col), F.col(id_col), "rank")
    return rrf_fuse(
        [lex, vec], k=k, rrf_k=rrf_k, query_id_col=q_id_col, id_col=id_col
    )


def hybrid_topk_served(
    index,
    corpus_text: DataFrame,
    queries: DataFrame,
    k: int = 10,
    arm_k: int = 20,
    rrf_k: int = RRF_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    text_col: str = "text",
    id_col: str = "doc_id",
    q_text_col: str = "q_text",
    q_vec_col: str = "q_vec",
    q_id_col: str = "query_id",
    labels_col: str = "labels",
    distributed_queries: bool = False,
    **search_kwargs,
) -> DataFrame:
    """Hybrid retrieval with the vector arm SERVED by a built ANN index
    (``DiskannIndex`` / ``IvfIndex`` — anything exposing
    ``search_batch(queries, k) -> (query_id, node_id, distance, rank)``)
    instead of the exact k-NN scan — the production shape at 100 TB,
    where the exact arm's full corpus scan per query batch is the one
    piece of :func:`hybrid_topk` that doesn't survive the scale-up.

    ``corpus_text`` carries (``id_col``, ``text_col``) for the lexical
    arm; ``queries`` carries (``q_id_col``, ``q_text_col``,
    ``q_vec_col``). ``search_kwargs`` pass through to ``search_batch``
    (``probe_shards``, ``recall_target``, ``labels``, ...). The lexical
    arm and the RRF fusion are bit-identical to :func:`hybrid_topk`, so
    any fused-result difference is exactly the index arm's recall —
    which is what bench.py gates (served-hybrid fused top-k must keep
    >= 0.9 of the exact-arm hybrid's fused top-k at the 8x point).

    A ``labels=[...]`` search kwarg filters BOTH arms (round 13): the
    vector arm through the index's label routing, the lexical arm by
    the same `&&` overlap rule over ``labels_col`` on ``corpus_text`` —
    so the FUSED result respects the filter. ``corpus_text`` must carry
    ``labels_col`` then (raises otherwise: silently fusing an
    unfiltered lexical arm would leak out-of-label docs); ``labels=[]``
    matches nothing on either arm.

    ``distributed_queries=True`` is the corpus x corpus shape (round
    13): the vector arm runs through the index's ``ann_join`` (queries
    stay a DataFrame — no driver collect) and the lexical arm drops its
    forced query-term broadcast (plain term joins; Catalyst sizes the
    strategy), so a 100M-row query TABLE can be hybrid-retrieved end to
    end. Fusion is the same rrf_fuse either way, and results are
    identical to the serving path on the same inputs (pytest-pinned)."""
    labels = search_kwargs.get("labels")
    if labels is not None:
        # materialize once: a one-shot iterable would be exhausted by the
        # empty check and silently yield an empty lexical filter + empty
        # vector result downstream (round-13 advice)
        labels = list(labels)
        search_kwargs = dict(search_kwargs, labels=labels)
    if labels is not None and not labels:
        # `labels && '{}'` is always false on BOTH arms — and BM25 over a
        # zero-row corpus has no avgdl, so short-circuit before the arms
        return corpus_text.sparkSession.createDataFrame(
            [],
            f"{q_id_col} long, {id_col} long, rrf_score double, rank long",
        )
    lex_corpus = corpus_text.select(
        F.col(id_col), F.col(text_col), *(
            [F.col(labels_col)] if labels_col in corpus_text.columns else []
        )
    )
    if labels is not None:
        if labels_col not in corpus_text.columns:
            raise ValueError(
                f"labels were passed but corpus_text lacks a {labels_col!r} "
                "column — the lexical arm could not honor the filter"
            )
        # labels is non-empty here (the empty filter returned above)
        lex_corpus = lex_corpus.filter(
            F.arrays_overlap(
                F.col(labels_col),
                F.array([F.lit(int(l)).cast("smallint") for l in labels]),
            )
        )
    lex = bm25_topk(
        lex_corpus.select(F.col(id_col), F.col(text_col)),
        queries.select(F.col(q_id_col), F.col(q_text_col)),
        k=arm_k,
        k1=k1,
        b=b,
        text_col=text_col,
        id_col=id_col,
        q_text_col=q_text_col,
        q_id_col=q_id_col,
        broadcast_queries=not distributed_queries,
    ).select(F.col(q_id_col), F.col(id_col), "rank")
    vector_search = index.ann_join if distributed_queries else index.search_batch
    vec = vector_search(
        queries.select(
            F.col(q_id_col).alias("query_id"), F.col(q_vec_col).alias("query_vec")
        ),
        k=arm_k,
        **search_kwargs,
    ).select(
        F.col("query_id").alias(q_id_col),
        F.col("node_id").alias(id_col),
        F.col("rank"),
    )
    return rrf_fuse(
        [lex, vec], k=k, rrf_k=rrf_k, query_id_col=q_id_col, id_col=id_col
    )
