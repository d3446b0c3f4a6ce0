"""Distributed n-gram language-model scoring (the perplexity filter).

The classic CCNet/KenLM-shaped curation stage: train a bigram model on a
reference slice of the corpus, score every document's log-probability
under it, and let the pipeline drop the tails. Re-expressed Spark-first:

- **Training is two aggregations**, not a modelling loop: unigram and
  bigram counts via ``explode`` + ``groupBy`` (map-side partial combine
  does the heavy lifting); the two scalars (total train tokens ``T``,
  vocabulary size ``V``) are metadata-sized collects.
- **Scoring is a join**, not a UDF: every document's bigram OCCURRENCES
  (positional, not distinct — each repetition scores) left-join the count
  tables, and the per-doc aggregate folds ``ln(p)``. At 100 TB the count
  tables follow Heaps' law (sublinear in corpus size): broadcast them
  while they fit, else the join shuffles on the bigram key — both plans
  are sane, AQE picks.
- **Stupid backoff** (Brants et al. 2007, the large-scale-LM standard —
  no discounting state to synchronize): ``P(w2|w1) = c12/c1`` when the
  bigram was seen, else ``alpha * (c2 + 1) / (T + V)`` (the add-one floor
  keeps unseen unigrams finite; alpha = 0.4 per the paper).

Float discipline: the only float is the final ``sum(ln(p))``, reported in
integer micro-nats (``round(sum * 1e6)``) — summation-order noise is
~1e-5 micro-nats, eight orders below the rounding step. Counts
(``n_bigrams``, ``n_unseen``) are exact integers.

No reference analog (pgvectorscale stores vectors, not corpora); serves
the training-data-pipeline brief alongside functions/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgvectorscale_spark.functions.hashing import SPARK, tokens

__all__ = [
    "BIGRAM_ALPHA",
    "bigram_lm_scores",
    "bigram_pairs_sql",
    "trigram_lm_scores",
    "trigram_triples_sql",
]

BIGRAM_ALPHA = 0.4


def bigram_pairs_sql(toks_expr: str, dialect: str) -> str:
    """Adjacent-token pair structs (w1, w2); empty for docs under 2 tokens."""
    if dialect == SPARK:
        return (
            f"CASE WHEN size({toks_expr}) >= 2 THEN "
            f"transform(sequence(1, size({toks_expr}) - 1), "
            f"i -> struct(element_at({toks_expr}, i) as w1, "
            f"element_at({toks_expr}, i + 1) as w2)) "
            f"ELSE cast(array() as array<struct<w1:string,w2:string>>) END"
        )
    return (
        f"CASE WHEN len({toks_expr}) >= 2 THEN "
        f"list_transform(range(1, len({toks_expr})), "
        f"i -> {{'w1': {toks_expr}[i], 'w2': {toks_expr}[i + 1]}}) "
        f"ELSE [] END"
    )


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_pred: str = "doc_id % 2 = 0",
    alpha: float = BIGRAM_ALPHA,
) -> DataFrame:
    """Score every document under a bigram stupid-backoff LM trained on the
    ``train_pred`` slice. Returns one row per input doc:

    - ``n_bigrams``: scored bigram occurrences (0 for docs under 2 tokens),
    - ``n_unseen``: occurrences that fell to the backoff branch,
    - ``logprob_micro``: ``round(sum(ln p) * 1e6)`` as BIGINT (0 when no
      bigrams — an empty sum, not a probability claim).

    Held-out docs (outside ``train_pred``) genuinely exercise the backoff:
    their bigrams may be absent from the training slice."""
    toks = tokens(f"`{text_col}`", SPARK)
    base = df.select(F.col(id_col), F.expr(toks).alias("_t"))
    train = base.filter(train_pred)

    uni = (
        train.select(F.explode("_t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    tot = uni.agg(
        F.sum("c").cast("double").alias("T"), F.count("*").cast("double").alias("V")
    ).collect()[0]
    t_tokens, vocab = float(tot["T"] or 0.0), float(tot["V"] or 0.0)

    pairs = bigram_pairs_sql("_t", SPARK)
    big = (
        train.select(F.explode(F.expr(pairs)).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count("*").alias("c12"))
    )

    doc_bigrams = base.select(F.col(id_col), F.explode(F.expr(pairs)).alias("p")).select(
        id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    joined = (
        doc_bigrams.join(big, ["w1", "w2"], "left")
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1", "left")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2", "left")
    )
    p = F.when(
        F.col("c12").isNotNull(), F.col("c12") / F.col("c1")
    ).otherwise(
        F.lit(alpha) * (F.coalesce(F.col("c2"), F.lit(0)) + 1) / F.lit(t_tokens + vocab)
    )
    scored = joined.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum(F.col("c12").isNull().cast("int")).cast("long").alias("n_unseen"),
        F.round(F.sum(F.log(p)) * 1e6).cast("long").alias("logprob_micro"),
    )
    return df.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("n_unseen", F.lit(0)).cast("long").alias("n_unseen"),
        F.coalesce("logprob_micro", F.lit(0)).cast("long").alias("logprob_micro"),
    )


def trigram_triples_sql(toks_expr: str, dialect: str) -> str:
    """Adjacent-token triple structs (w1, w2, w3); empty under 3 tokens."""
    if dialect == SPARK:
        return (
            f"CASE WHEN size({toks_expr}) >= 3 THEN "
            f"transform(sequence(1, size({toks_expr}) - 2), "
            f"i -> struct(element_at({toks_expr}, i) as w1, "
            f"element_at({toks_expr}, i + 1) as w2, "
            f"element_at({toks_expr}, i + 2) as w3)) "
            f"ELSE cast(array() as array<struct<w1:string,w2:string,w3:string>>) END"
        )
    return (
        f"CASE WHEN len({toks_expr}) >= 3 THEN "
        f"list_transform(range(1, len({toks_expr}) - 1), "
        f"i -> {{'w1': {toks_expr}[i], 'w2': {toks_expr}[i + 1], "
        f"'w3': {toks_expr}[i + 2]}}) "
        f"ELSE [] END"
    )


def trigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_pred: str = "doc_id % 2 = 0",
    alpha: float = BIGRAM_ALPHA,
) -> DataFrame:
    """Trigram stupid backoff (the full Brants et al. recursion):

        S(w3 | w1 w2) = c123/c12            when the trigram was seen,
                      = a * c23/c2          else, when the bigram was,
                      = a^2 * (c3+1)/(T+V)  else (add-one unigram floor)

    trained on the ``train_pred`` slice; scores EVERY doc. Returns
    (id, n_trigrams, n_tri_unseen, logprob3_micro) — n_tri_unseen counts
    occurrences that left the trigram branch. The same join-not-UDF shape
    as :func:`bigram_lm_scores`, two more Heaps-law count tables."""
    toks = tokens(f"`{text_col}`", SPARK)
    base = df.select(F.col(id_col), F.expr(toks).alias("_t"))
    train = base.filter(train_pred)

    uni = (
        train.select(F.explode("_t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    tot = uni.agg(
        F.sum("c").cast("double").alias("T"), F.count("*").cast("double").alias("V")
    ).collect()[0]
    t_tokens, vocab = float(tot["T"] or 0.0), float(tot["V"] or 0.0)

    pairs = bigram_pairs_sql("_t", SPARK)
    big = (
        train.select(F.explode(F.expr(pairs)).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count("*").alias("c"))
    )
    triples = trigram_triples_sql("_t", SPARK)
    tri = (
        train.select(F.explode(F.expr(triples)).alias("p"))
        .groupBy(
            F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"),
            F.col("p.w3").alias("w3"),
        )
        .agg(F.count("*").alias("c123"))
    )

    doc_tri = base.select(F.col(id_col), F.explode(F.expr(triples)).alias("p")).select(
        id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"),
        F.col("p.w3").alias("w3"),
    )
    joined = (
        doc_tri.join(tri, ["w1", "w2", "w3"], "left")
        .join(
            big.select(F.col("w1"), F.col("w2"), F.col("c").alias("c12")),
            ["w1", "w2"], "left",
        )
        .join(
            big.select(
                F.col("w1").alias("w2"), F.col("w2").alias("w3"),
                F.col("c").alias("c23"),
            ),
            ["w2", "w3"], "left",
        )
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2", "left")
        .join(uni.select(F.col("w").alias("w3"), F.col("c").alias("c3")), "w3", "left")
    )
    p = (
        F.when(F.col("c123").isNotNull(), F.col("c123") / F.col("c12"))
        .when(F.col("c23").isNotNull(), F.lit(alpha) * F.col("c23") / F.col("c2"))
        .otherwise(
            F.lit(alpha * alpha)
            * (F.coalesce(F.col("c3"), F.lit(0)) + 1)
            / F.lit(t_tokens + vocab)
        )
    )
    scored = joined.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_trigrams"),
        F.sum(F.col("c123").isNull().cast("int")).cast("long").alias("n_tri_unseen"),
        F.round(F.sum(F.log(p)) * 1e6).cast("long").alias("logprob3_micro"),
    )
    return df.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_trigrams", F.lit(0)).cast("long").alias("n_trigrams"),
        F.coalesce("n_tri_unseen", F.lit(0)).cast("long").alias("n_tri_unseen"),
        F.coalesce("logprob3_micro", F.lit(0)).cast("long").alias("logprob3_micro"),
    )
