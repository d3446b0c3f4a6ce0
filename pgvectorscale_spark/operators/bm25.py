"""BM25 full-text top-k search — the lexical twin of the vector ANN path.

A training-data pipeline needs keyword retrieval next to embedding
retrieval (targeted corpus audits, eval-set mining, hybrid search).
This is the standard Okapi BM25 (Robertson & Walker 1994; k1 = 1.2,
b = 0.75) re-expressed as DataFrame algebra:

- **The "inverted index" IS the postings DataFrame**: ``(term, doc_id,
  tf, dl)`` from one explode + groupBy (map-side combine), the exact
  relational encoding of a posting list. Persist/bucket it by ``term``
  and repeated query batches become co-located joins — no custom index
  file, Parquet + partitioning already is one.
- **Scoring is a broadcast join**: the query-term table is tiny next to
  the corpus, so candidate generation is a map-side semijoin from the
  postings table (docs sharing no term with the query are never touched
  — the same sparsity argument as a real inverted index). Per-(query,
  doc) scores are one aggregation; top-k is a per-query window over the
  candidates only.
- **Determinism**: scores are rounded to 6 decimals BEFORE ranking and
  ties break on doc_id, so the cut is identical across engines and
  partitionings (the only float seam is summation order at ~1e-15,
  eight orders below the rounding step).

IDF uses the non-negative BM25+ floor form ``ln(1 + (N - df + 0.5) /
(df + 0.5))`` (Lucene's choice) so stopword-grade terms can't produce
negative contributions that would make top-k order depend on which
non-matching terms a doc HAPPENS to share.

No reference analog (pgvectorscale is the vector side); serves the
training-data-pipeline brief alongside operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pgvectorscale_spark.functions.hashing import SPARK, tokens

__all__ = ["BM25_B", "BM25_K1", "bm25_postings", "bm25_topk"]

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The postings table: (term, doc_id, tf, dl). One explode + one
    groupBy; at 100 TB, write it bucketed by ``term`` and every later
    query batch joins without a corpus shuffle."""
    toks = tokens(f"`{text_col}`", SPARK)
    return (
        docs.select(
            F.col(id_col), F.expr(f"size({toks})").alias("dl"), F.explode(F.expr(toks)).alias("term")
        )
        .groupBy("term", id_col, "dl")
        .agg(F.count("*").alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = BM25_K1,
    b: float = BM25_B,
    text_col: str = "text",
    id_col: str = "doc_id",
    q_text_col: str = "q_text",
    q_id_col: str = "query_id",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Top-k BM25 matches per query: (query_id, doc_id, score, rank).

    ``rank`` is dense over (rounded score desc, doc_id asc); only docs
    sharing at least one term with the query are candidates (docs with
    zero overlap score 0 and are not returned — inverted-index
    semantics).

    ``broadcast_queries`` (default True) is the SERVING shape: the
    query-term table is forced broadcast against the postings. For a
    corpus x corpus join (a 100M-row query TABLE), pass False — the
    scoring joins become plain term-key joins (Catalyst/AQE shuffles or
    broadcasts by actual size), so the query side never has to fit one
    executor. Results are identical either way (same joins, different
    physical strategy; pytest-pinned)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    stats = docs.agg(
        F.count("*").cast("double").alias("N"),
        F.avg(F.expr(f"size({tokens(f'`{text_col}`', SPARK)})")).alias("avgdl"),
    ).collect()[0]
    if stats["avgdl"] is None:
        # zero-row corpus (e.g. a label filter that matched nothing):
        # there is no avgdl and no possible candidate — a typed empty
        # result, not a float(None) crash (round-13 review finding)
        return docs.sparkSession.createDataFrame(
            [], f"{q_id_col} long, {id_col} long, score double, rank long"
        )
    n_docs, avgdl = float(stats["N"]), float(stats["avgdl"])

    qtoks = tokens(f"`{q_text_col}`", SPARK)
    qterms = queries.select(
        F.col(q_id_col), F.explode(F.expr(f"array_distinct({qtoks})")).alias("term")
    )
    qt = qterms.select("term").distinct()

    # Round 14 (guide §3.2 + §2.3): the old shape evaluated the FULL corpus
    # postings aggregation twice — once for the per-term df counts feeding
    # idf, once for the scoring join — and only met the query terms AFTER
    # the corpus-sized (term, doc) shuffle. Now the exploded token stream is
    # semi-filtered by the (broadcast) query-term set BEFORE the tf
    # aggregation, so the shuffle carries only query-matching tokens, and
    # per-term df comes from a count-over-term window on the SAME filtered
    # postings instead of a second full evaluation. df per query term is
    # unchanged (the filter is term-membership; (term, doc) rows are unique
    # because dl is a function of the doc, so count(*) over the term
    # partition equals the old countDistinct(doc)); idf/tf/dl/avgdl floats
    # are computed by the same expressions, so scores are identical.
    toks = tokens(f"`{text_col}`", SPARK)
    tok = docs.select(
        F.col(id_col), F.expr(f"size({toks})").alias("dl"), F.explode(F.expr(toks)).alias("term")
    )
    if broadcast_queries:
        tok = tok.join(F.broadcast(qt), "term")  # map-side prefilter, pre-shuffle
    post = tok.groupBy("term", id_col, "dl").agg(F.count("*").alias("tf"))
    if not broadcast_queries:
        # corpus×corpus: the query-term set may not fit a broadcast, so the
        # semi-join lands after the tf aggregation as a plain term-key join
        # (Catalyst/AQE picks the strategy by size, as before)
        post = post.join(qt, "term")

    hint = F.broadcast if broadcast_queries else (lambda df: df)
    w_term = Window.partitionBy("term")
    contrib = (
        post.withColumn("df", F.count("*").over(w_term))
        .withColumn(
            "idf",
            F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .join(hint(qterms), "term")
        .select(
            q_id_col,
            id_col,
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
            ).alias("_s"),
        )
    )
    scored = contrib.groupBy(q_id_col, id_col).agg(
        F.round(F.sum("_s"), 6).alias("score")
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "score", "rank")
    )
