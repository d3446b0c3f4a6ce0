"""DuckDB oracle SQL builders — the ANSI-SQL twins of every operator.

The driver runs each Spark query side-by-side with its oracle on the same
parquet tables (views pre-registered) and compares row count + schema +
order-insensitive value hash. These builders assemble the oracle SQL from
the same cross-engine fragments (functions/hashing.py, functions/text.py)
the Spark operators use, so parity is by construction.

Float discipline: every float output is computed in float64 with the same
formula on both engines and rounded to 4-6 decimals; orderings always
tie-break on ids.
"""

from __future__ import annotations

from pgvectorscale_spark.functions.hashing import (
    DUCKDB,
    band_hash,
    h60,
    minhash_seeds,
    tokens,
    word_shingles,
)
from pgvectorscale_spark.functions.text import (
    document_fingerprint_sql,
    lang_id_sql,
    punct_ratio_sql,
    quality_score_sql,
    stopword_ratio_sql,
    token_count_sql,
)


def tagged_union_oracle(tag_col: str, parts: list[tuple[str, str]]) -> str:
    """UNION ALL several complete oracle SELECTs into one result set, each
    branch tagged with a SQL literal (e.g. ``"'cosine'"`` or ``"1::BIGINT"``).

    Lets one driver correctness row verify several operator variants (the
    driver's value hash is order-insensitive, so branch order is free) —
    used to keep every operator inside the driver's 50-query oracle window.

    Contract: branch SELECT schemas must align positionally (UNION ALL is
    positional), and ``tag_col`` must not collide with any inner column name.
    Per-branch ORDER BYs end up nested in subqueries, so the unioned result
    has no global order — consumers must sort or hash order-insensitively.
    """
    if not parts:
        raise ValueError("tagged_union_oracle: parts must be non-empty")
    return "\nUNION ALL\n".join(
        f"SELECT {lit} AS {tag_col}, s.* FROM ({sql}) s" for lit, sql in parts
    )


def union_oracle(parts: list[str]) -> str:
    """UNION ALL complete oracle SELECTs whose schemas already align
    positionally. Same ordering caveat as :func:`tagged_union_oracle`."""
    if not parts:
        raise ValueError("union_oracle: parts must be non-empty")
    return "\nUNION ALL\n".join(f"SELECT s.* FROM ({sql}) s" for sql in parts)


# ---------------------------------------------------------------------------
# vector search oracles (embeddings table: vec_id, embedding FLOAT[64], label)
# ---------------------------------------------------------------------------

_UNNEST = (
    "SELECT vec_id, generate_subscripts(embedding, 1) AS i, "
    "unnest(embedding)::DOUBLE AS v FROM embeddings"
)


def _query_unnest(query_id: int) -> str:
    return (
        f"SELECT generate_subscripts(embedding, 1) AS i, unnest(embedding)::DOUBLE AS v "
        f"FROM embeddings WHERE vec_id = {query_id}"
    )


def _cand_filter(
    max_dim: int | None, exclude_ids: list[int] | None, where_sql: str | None = None
) -> str:
    conds = []
    if max_dim:
        conds.append(f"i <= {max_dim}")
    if exclude_ids:
        conds.append(f"vec_id NOT IN ({', '.join(str(x) for x in exclude_ids)})")
    if where_sql:
        conds.append(f"({where_sql})")
    return ("WHERE " + " AND ".join(conds)) if conds else ""


def knn_exact_oracle(
    query_id: int,
    k: int,
    distance_type: str,
    max_dim: int | None = None,
    exclude_ids: list[int] | None = None,
    where_sql: str | None = None,
) -> str:
    """Exact top-k by distance to the embedding of `query_id`.

    ``exclude_ids`` drops candidates (tombstoned rows in the mutation
    parity check) — the query vector itself may still be an excluded id.
    ``where_sql`` is a residual predicate on candidate rows (the
    post-filter over-fetch parity check)."""
    cand_filter = _cand_filter(max_dim, exclude_ids, where_sql)
    dim_filter = f"WHERE i <= {max_dim}" if max_dim else ""
    if distance_type == "l2":
        dist = "sum((e.v - q.v) * (e.v - q.v))"
    elif distance_type == "inner_product":
        dist = "-sum(e.v * q.v)"
    else:  # cosine over normalized vectors
        return _knn_cosine_oracle(query_id, k, max_dim, exclude_ids, where_sql)
    return f"""
WITH e AS (SELECT * FROM ({_UNNEST}) {cand_filter}),
q AS (SELECT * FROM ({_query_unnest(query_id)}) {dim_filter}),
d AS (SELECT e.vec_id, {dist} AS distance FROM e JOIN q USING (i) GROUP BY e.vec_id)
SELECT vec_id, round(distance, 4) AS distance FROM d
ORDER BY round(distance, 4), vec_id LIMIT {k}
"""


def _knn_cosine_oracle(
    query_id: int,
    k: int,
    max_dim: int | None = None,
    exclude_ids: list[int] | None = None,
    where_sql: str | None = None,
) -> str:
    dim_filter = f"WHERE i <= {max_dim}" if max_dim else ""
    return f"""
WITH e AS (SELECT * FROM ({_UNNEST}) {_cand_filter(max_dim, exclude_ids, where_sql)}),
q AS (SELECT * FROM ({_query_unnest(query_id)}) {dim_filter}),
en AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
qn AS (SELECT sqrt(sum(v * v)) AS nrm FROM q),
d AS (
  SELECT e.vec_id,
         greatest(0.0, 1.0 - sum((e.v / en.nrm) * (q.v / qn.nrm))) AS distance
  FROM e JOIN q USING (i) JOIN en ON e.vec_id = en.vec_id CROSS JOIN qn
  GROUP BY e.vec_id, en.nrm, qn.nrm)
SELECT vec_id, round(distance, 4) AS distance FROM d
ORDER BY round(distance, 4), vec_id LIMIT {k}
"""


def knn_label_filtered_oracle(query_id: int, k: int, labels: list[int]) -> str:
    lbls = ", ".join(str(x) for x in labels)
    return f"""
WITH e AS (SELECT u.* FROM ({_UNNEST}) u JOIN embeddings t USING (vec_id) WHERE t.label IN ({lbls})),
q AS ({_query_unnest(query_id)}),
en AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
qn AS (SELECT sqrt(sum(v * v)) AS nrm FROM q),
d AS (
  SELECT e.vec_id,
         greatest(0.0, 1.0 - sum((e.v / en.nrm) * (q.v / qn.nrm))) AS distance
  FROM e JOIN q USING (i) JOIN en ON e.vec_id = en.vec_id CROSS JOIN qn
  GROUP BY e.vec_id, en.nrm, qn.nrm)
SELECT vec_id, round(distance, 4) AS distance FROM d
ORDER BY round(distance, 4), vec_id LIMIT {k}
"""


def knn_batch_oracle(num_queries: int, k: int) -> str:
    """Top-k cosine for each of the first `num_queries` vectors as queries."""
    return f"""
WITH e AS ({_UNNEST}),
en AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
q AS (SELECT vec_id AS query_id, i, v FROM e WHERE vec_id < {num_queries}),
qn AS (SELECT vec_id AS query_id, nrm FROM en WHERE vec_id < {num_queries}),
d AS (
  SELECT q.query_id, e.vec_id,
         greatest(0.0, 1.0 - sum((e.v / en.nrm) * (q.v / qn.nrm))) AS distance
  FROM e JOIN q USING (i)
  JOIN en ON e.vec_id = en.vec_id JOIN qn ON q.query_id = qn.query_id
  GROUP BY q.query_id, e.vec_id, en.nrm, qn.nrm)
SELECT query_id, vec_id, round(distance, 4) AS distance,
       row_number() OVER (PARTITION BY query_id ORDER BY round(distance, 4), vec_id) AS rank
FROM d QUALIFY rank <= {k}
ORDER BY query_id, rank
"""


def mmr_oracle(
    num_queries: int, cand_k: int, k: int, lam: float = 0.5
) -> str:
    """Twin of hybrid.mmr_rerank over cosine top-``cand_k`` candidates
    for the first ``num_queries`` vectors: the greedy argmax sequence is
    UNROLLED into one CTE per pick (penalty = greatest of the rounded
    pairwise sims to every earlier pick), with the operator's exact
    seams — sims/relevance rounded to 4 decimals, MMR scores to 6, ties
    on vec_id ascending."""
    lam = float(lam)
    cand = f"""
dist AS (
  SELECT q.query_id, e.vec_id,
         greatest(0.0, 1.0 - sum((e.v / en.nrm) * (q.v / qn.nrm))) AS distance
  FROM e JOIN q USING (i)
  JOIN en ON e.vec_id = en.vec_id JOIN qn ON q.query_id = qn.query_id
  GROUP BY q.query_id, e.vec_id, en.nrm, qn.nrm),
cand AS (
  SELECT query_id, vec_id, round(1.0 - round(distance, 4), 4) AS rel
  FROM dist
  QUALIFY row_number() OVER (PARTITION BY query_id
                             ORDER BY round(distance, 4), vec_id) <= {cand_k}),
ps AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         round(sum((a.v / an.nrm) * (b.v / bn.nrm)), 4) AS s
  FROM e a JOIN e b USING (i)
  JOIN en an ON a.vec_id = an.vec_id JOIN en bn ON b.vec_id = bn.vec_id
  WHERE a.vec_id IN (SELECT vec_id FROM cand)
    AND b.vec_id IN (SELECT vec_id FROM cand)
  GROUP BY a.vec_id, b.vec_id, an.nrm, bn.nrm)"""
    steps = []
    selects = []
    for i in range(1, k + 1):
        if i == 1:
            steps.append(
                f"""p1 AS (
  SELECT query_id, vec_id, round({lam!r} * rel, 6) AS m
  FROM cand
  QUALIFY row_number() OVER (PARTITION BY query_id
                             ORDER BY round({lam!r} * rel, 6) DESC, vec_id) = 1)"""
            )
        else:
            joins = "".join(
                f"\n  JOIN p{j} ON p{j}.query_id = c.query_id"
                f"\n  JOIN ps s{j} ON s{j}.ia = c.vec_id AND s{j}.ib = p{j}.vec_id"
                for j in range(1, i)
            )
            excl = " AND ".join(f"c.vec_id != p{j}.vec_id" for j in range(1, i))
            pen = (
                f"greatest({', '.join(f's{j}.s' for j in range(1, i))})"
                if i > 2
                else "s1.s"
            )
            steps.append(
                f"""p{i} AS (
  SELECT c.query_id, c.vec_id,
         round({lam!r} * c.rel - {1.0 - lam!r} * {pen}, 6) AS m
  FROM cand c{joins}
  WHERE {excl}
  QUALIFY row_number() OVER (PARTITION BY c.query_id
                             ORDER BY round({lam!r} * c.rel - {1.0 - lam!r} * {pen}, 6) DESC,
                                      c.vec_id) = 1)"""
            )
        selects.append(
            f"SELECT query_id, vec_id, m AS mmr_score, {i}::BIGINT AS rank FROM p{i}"
        )
    body = "\nUNION ALL\n".join(selects)
    return f"""
WITH e AS ({_UNNEST}),
en AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
q AS (SELECT vec_id AS query_id, i, v FROM e WHERE vec_id < {num_queries}),
qn AS (SELECT vec_id AS query_id, nrm FROM en WHERE vec_id < {num_queries}),
{cand},
{",".join(chr(10) + s for s in steps)}
{body}
ORDER BY query_id, rank
"""


def sbq_means_oracle() -> str:
    """Quantizer training stats: per-dimension mean/variance (Q1)."""
    return f"""
SELECT i AS dim, round(avg(v), 6) AS mean, round(var_pop(v), 6) AS variance
FROM ({_UNNEST}) GROUP BY i ORDER BY dim
"""


def sbq_hamming_oracle(query_id: int, k: int) -> str:
    """1-bit SBQ + Hamming top-k (Q2/D4): bit_i = v_i > mean_i."""
    return f"""
WITH e AS ({_UNNEST}),
m AS (SELECT i, avg(v) AS mu FROM e GROUP BY i),
bits AS (SELECT e.vec_id, e.i, (e.v > m.mu) AS b FROM e JOIN m USING (i)),
qb AS (SELECT i, b FROM bits WHERE vec_id = {query_id}),
ham AS (
  SELECT bits.vec_id, sum(CASE WHEN bits.b != qb.b THEN 1 ELSE 0 END) AS hamming
  FROM bits JOIN qb USING (i) GROUP BY bits.vec_id)
SELECT vec_id, hamming::BIGINT AS hamming FROM ham ORDER BY hamming, vec_id LIMIT {k}
"""


def sbq2_hamming_oracle(query_id: int, k: int, bits: int = 2) -> str:
    """2-bit thermometer SBQ Hamming top-k, expressed arithmetically.

    Unary (thermometer) codes make XOR+popcount equal the per-dimension
    |ones_a - ones_b|, so the packed-bit kernel has an exact SQL twin:
    ones = 0 if idx < 1 else min(floor(idx), bits), idx = (z+2)/(4/(bits+1)),
    z = (v-mu)/sigma; sigma=0 rows degrade to (v > mu ? bits : 0)
    (quantize.rs:63-89 incl. the float->usize saturation edge).
    """
    width = 4.0 / (bits + 1)
    ones = (
        f"CASE WHEN m.sd = 0 THEN (CASE WHEN {{v}} > m.mu THEN {bits} ELSE 0 END) "
        f"ELSE (CASE WHEN (({{v}} - m.mu) / m.sd + 2.0) / {width} < 1.0 THEN 0 "
        f"ELSE least(floor((({{v}} - m.mu) / m.sd + 2.0) / {width}), {bits}) END) END"
    )
    return f"""
WITH e AS ({_UNNEST}),
m AS (SELECT i, avg(v) AS mu, sqrt(var_pop(v)) AS sd FROM e GROUP BY i),
o AS (SELECT e.vec_id, e.i, {ones.format(v='e.v')} AS ones FROM e JOIN m USING (i)),
q AS (SELECT i, ones FROM o WHERE vec_id = {query_id}),
ham AS (
  SELECT o.vec_id, sum(abs(o.ones - q.ones))::BIGINT AS hamming
  FROM o JOIN q USING (i) GROUP BY o.vec_id)
SELECT vec_id, hamming FROM ham ORDER BY hamming, vec_id LIMIT {k}
"""


def sbq_rescore_oracle(query_id: int, window: int, k: int) -> str:
    """Two-stage: Hamming top-`window` candidates → exact squared-L2 top-k (T2)."""
    return f"""
WITH e AS ({_UNNEST}),
m AS (SELECT i, avg(v) AS mu FROM e GROUP BY i),
bits AS (SELECT e.vec_id, e.i, (e.v > m.mu) AS b FROM e JOIN m USING (i)),
qb AS (SELECT i, b FROM bits WHERE vec_id = {query_id}),
cand AS (
  SELECT bits.vec_id, sum(CASE WHEN bits.b != qb.b THEN 1 ELSE 0 END) AS hamming
  FROM bits JOIN qb USING (i) GROUP BY bits.vec_id
  ORDER BY hamming, vec_id LIMIT {window}),
q AS ({_query_unnest(query_id)}),
d AS (
  SELECT e.vec_id, sum((e.v - q.v) * (e.v - q.v)) AS distance
  FROM e JOIN q USING (i) JOIN cand ON e.vec_id = cand.vec_id
  GROUP BY e.vec_id)
SELECT vec_id, round(distance, 4) AS distance FROM d
ORDER BY round(distance, 4), vec_id LIMIT {k}
"""


def index_full_scan_oracle() -> str:
    """Full-scan completeness: every non-NULL vector is indexed."""
    return "SELECT count(*) AS n_indexed FROM embeddings WHERE embedding IS NOT NULL"


def knn_join_oracle(num_left: int, k: int) -> str:
    """k-NN self-join (cosine) for the first `num_left` vectors, excluding self."""
    return f"""
WITH e AS ({_UNNEST}),
en AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
l AS (SELECT vec_id AS left_id, i, v FROM e WHERE vec_id < {num_left}),
ln AS (SELECT vec_id AS left_id, nrm FROM en WHERE vec_id < {num_left}),
d AS (
  SELECT l.left_id, e.vec_id AS right_id,
         greatest(0.0, 1.0 - sum((e.v / en.nrm) * (l.v / ln.nrm))) AS distance
  FROM e JOIN l USING (i)
  JOIN en ON e.vec_id = en.vec_id JOIN ln ON l.left_id = ln.left_id
  WHERE e.vec_id != l.left_id
  GROUP BY l.left_id, e.vec_id, en.nrm, ln.nrm)
SELECT left_id, right_id, round(distance, 4) AS distance,
       row_number() OVER (PARTITION BY left_id ORDER BY round(distance, 4), right_id) AS rank
FROM d QUALIFY rank <= {k}
ORDER BY left_id, rank
"""


def ivf_search_oracle(query_id: int, k: int, num_centroids: int, nprobe: int) -> str:
    """IVF: deterministic centroids (lowest ids), assign, probe, exact rerank."""
    return f"""
WITH e AS ({_UNNEST}),
c AS (SELECT vec_id AS centroid_id, i, v FROM e
      WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {num_centroids})),
assign_d AS (
  SELECT e.vec_id, c.centroid_id, sum((e.v - c.v) * (e.v - c.v)) AS ad
  FROM e JOIN c USING (i) GROUP BY e.vec_id, c.centroid_id),
assign AS (
  SELECT vec_id, centroid_id FROM assign_d
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ad, centroid_id) = 1),
q AS ({_query_unnest(query_id)}),
probe AS (
  SELECT c.centroid_id, sum((c.v - q.v) * (c.v - q.v)) AS qd
  FROM c JOIN q USING (i) GROUP BY c.centroid_id
  ORDER BY qd, centroid_id LIMIT {nprobe}),
cand AS (SELECT vec_id FROM assign JOIN probe USING (centroid_id)),
d AS (
  SELECT e.vec_id, sum((e.v - q.v) * (e.v - q.v)) AS distance
  FROM e JOIN q USING (i) JOIN cand ON e.vec_id = cand.vec_id GROUP BY e.vec_id)
SELECT vec_id, round(distance, 6) AS distance FROM d
ORDER BY round(distance, 6), vec_id LIMIT {k}
"""


def _kmeans_assign_ctes(num_centroids: int, iterations: int) -> str:
    """CTE chain replaying similarity.kmeans_centroids (lowest-id seeds,
    ``iterations`` unrolled Lloyd rounds) plus the final nearest-centroid
    ``assign`` (vec_id, centroid_id). Expects an ``e`` CTE (vec_id, i, v)
    in scope; shared by ivf_kmeans_oracle and semantic_dedup_oracle."""
    layers = [
        f"""c0 AS (SELECT vec_id AS centroid_id, i, v FROM e
      WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {num_centroids}))"""
    ]
    for it in range(iterations):
        prev, cur = f"c{it}", f"c{it + 1}"
        layers.append(f"""a{it}d AS (
  SELECT e.vec_id, c.centroid_id, sum((e.v - c.v) * (e.v - c.v)) AS ad
  FROM e JOIN {prev} c USING (i) GROUP BY e.vec_id, c.centroid_id),
a{it} AS (
  SELECT vec_id, centroid_id FROM a{it}d
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ad, centroid_id) = 1),
{cur} AS (
  SELECT a.centroid_id, e.i, avg(e.v) AS v
  FROM e JOIN a{it} a USING (vec_id) GROUP BY a.centroid_id, e.i)""")
    final = f"c{iterations}"
    return f"""{", ".join(layers)},
assign_d AS (
  SELECT e.vec_id, c.centroid_id, sum((e.v - c.v) * (e.v - c.v)) AS ad
  FROM e JOIN {final} c USING (i) GROUP BY e.vec_id, c.centroid_id),
assign AS (
  SELECT vec_id, centroid_id FROM assign_d
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ad, centroid_id) = 1)"""


def ivf_kmeans_oracle(
    query_id: int, k: int, num_centroids: int, nprobe: int, iterations: int
) -> str:
    """IVF with Lloyd-trained centroids: the `iterations` rounds unroll into
    CTE layers of the same assignment SQL (deterministic lowest-id seeds make
    the whole training replayable — mirrors similarity.kmeans_centroids)."""
    final = f"c{iterations}"
    return f"""
WITH e AS ({_UNNEST}),
{_kmeans_assign_ctes(num_centroids, iterations)},
q AS ({_query_unnest(query_id)}),
probe AS (
  SELECT c.centroid_id, sum((c.v - q.v) * (c.v - q.v)) AS qd
  FROM {final} c JOIN q USING (i) GROUP BY c.centroid_id
  ORDER BY qd, centroid_id LIMIT {nprobe}),
cand AS (SELECT vec_id FROM assign JOIN probe USING (centroid_id)),
d AS (
  SELECT e.vec_id, sum((e.v - q.v) * (e.v - q.v)) AS distance
  FROM e JOIN q USING (i) JOIN cand ON e.vec_id = cand.vec_id GROUP BY e.vec_id)
SELECT vec_id, round(distance, 6) AS distance FROM d
ORDER BY round(distance, 6), vec_id LIMIT {k}
"""


def semantic_dedup_oracle(
    num_clusters: int, iterations: int, threshold: float
) -> str:
    """Twin of dedup.semantic_dedup: the same unrolled Lloyd clustering
    (shared _kmeans_assign_ctes) then the pairwise min-id-wins keep rule
    over within-cluster cosine similarity (same least(dot/(na*nb), 1)
    formula and 6-decimal rounding as embedding_neardup_oracle)."""
    return f"""
WITH e AS ({_UNNEST}),
{_kmeans_assign_ctes(num_clusters, iterations)},
v AS (
  SELECT a.vec_id, a.centroid_id AS cluster_id, x.e,
         sqrt(list_dot_product(x.e, x.e)) AS nrm
  FROM assign a JOIN (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings) x
    ON a.vec_id = x.vec_id),
dups AS (
  SELECT DISTINCT b.vec_id
  FROM v a JOIN v b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
  WHERE round(CASE WHEN a.nrm = 0 OR b.nrm = 0 THEN 0.0
              ELSE least(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 1.0)
              END, 6) >= {threshold})
SELECT v.vec_id, v.cluster_id::BIGINT AS cluster_id,
       (dups.vec_id IS NULL) AS keep
FROM v LEFT JOIN dups ON v.vec_id = dups.vec_id
ORDER BY v.vec_id"""


def embedding_neardup_oracle(threshold: float) -> str:
    """Exact cosine near-dup pairs over the embeddings table.

    Same formula as the Spark operator (dedup._pair_cosine_sim):
    least(dot/(na*nb), 1.0) with a sequential dot product — DuckDB's
    list_dot_product folds in element order, like Spark's aggregate."""
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
d AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         CASE WHEN a.nrm = 0 OR b.nrm = 0 THEN 0.0
              ELSE least(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 1.0) END AS sim
  FROM n a JOIN n b ON a.vec_id < b.vec_id)
SELECT id_a, id_b, round(sim, 6) AS cosine_sim
FROM d WHERE round(sim, 6) >= {threshold}
ORDER BY id_a, id_b
"""


def embedding_neardup_lsh_oracle(
    threshold: float, planes, bands: int = 8, rows_per_band: int = 4
) -> str:
    """SQL twin of the random-hyperplane LSH: the seeded planes inline as
    literals (dedup.lsh_planes — same seed on both engines), sign bits pack
    into per-band integers, ids sharing a bucket become candidates, and the
    exact cosine filter verifies. Replays the LSH bucketing exactly,
    including its misses — so the hash check covers the whole scale path."""
    values = ", ".join(
        f"({p}, {i + 1}, {w!r})"
        for p, row in enumerate(planes)
        for i, w in enumerate(row)
    )
    return f"""
WITH e AS ({_UNNEST}),
w(p, i, wv) AS (SELECT * FROM (VALUES {values})),
bits AS (
  SELECT e.vec_id, w.p, CASE WHEN sum(e.v * w.wv) > 0 THEN 1 ELSE 0 END AS b
  FROM e JOIN w USING (i) GROUP BY e.vec_id, w.p),
buckets AS (
  SELECT vec_id, p // {rows_per_band} AS band_id,
         sum(b::BIGINT << (p % {rows_per_band})::INT) AS band_val
  FROM bits GROUP BY vec_id, p // {rows_per_band}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buckets a JOIN buckets b USING (band_id, band_val)
  WHERE a.vec_id < b.vec_id),
n AS (SELECT vec_id, embedding::DOUBLE[] AS ev,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings),
d AS (
  SELECT c.id_a, c.id_b,
         CASE WHEN na.nrm = 0 OR nb.nrm = 0 THEN 0.0
              ELSE least(list_dot_product(na.ev, nb.ev) / (na.nrm * nb.nrm), 1.0) END AS sim
  FROM cand c JOIN n na ON na.vec_id = c.id_a JOIN n nb ON nb.vec_id = c.id_b)
SELECT id_a, id_b, round(sim, 6) AS cosine_sim
FROM d WHERE round(sim, 6) >= {threshold}
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# documents-table oracles (doc_id, text, lang, source, n_chars)
# ---------------------------------------------------------------------------


def dedup_exact_oracle() -> str:
    return f"""
SELECT min(doc_id) AS keep_id, count(*) AS dup_count
FROM documents GROUP BY {h60('text', DUCKDB)} ORDER BY keep_id
"""


def span_dedup_oracle(k: int) -> str:
    """Twin of dedup.span_dedup: repeated >=k-token spans within/across
    documents via duplicated k-gram hashes; merged coverage intervals per
    doc (gaps-and-islands windows mirror the operator's per-doc windows);
    keeper-preserving removal — per duplicated gram the smallest
    (doc_id, pos) occurrence survives, a token is dropped iff covered by
    a non-keeper occurrence and no keeper occurrence. The clean text is
    rebuilt token-by-token with list lambdas, so a bug in the operator's
    interval merge, keeper rule, or filter lambda cannot cancel out."""

    def isl(pred: str, name: str) -> str:
        return f"""
isl_{name} AS (
  SELECT doc_id, pos,
         CASE WHEN pos > coalesce(max(pos + {k} - 1) OVER (
             PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
         THEN 1 ELSE 0 END AS newf
  FROM dup WHERE {pred}
),
isl2_{name} AS (
  SELECT doc_id, pos, sum(newf) OVER (
      PARTITION BY doc_id ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM isl_{name}
),
spans_{name} AS (
  SELECT doc_id, min(pos) AS s, max(pos) + {k} - 1 AS e
  FROM isl2_{name} GROUP BY doc_id, isl
)"""

    gram = "array_to_string(b.t[CAST(r.i AS INTEGER) + 1 : CAST(r.i AS INTEGER) + " f"{k}], ' ')"
    return f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS t, len(string_split(text, ' ')) AS n
  FROM documents
),
occ AS (
  SELECT b.doc_id, CAST(r.i AS INTEGER) AS pos, {h60(gram, DUCKDB)} AS gh
  FROM base b, unnest(range(0, greatest(b.n - {k} + 1, 0))) AS r(i)
),
marked AS (
  SELECT doc_id, pos,
         count(*) OVER (PARTITION BY gh) AS c,
         row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn
  FROM occ
),
dup AS (SELECT doc_id, pos, (rn = 1) AS is_keeper FROM marked WHERE c >= 2),
{isl('TRUE', 'all')},
{isl('NOT is_keeper', 'nk')},
{isl('is_keeper', 'kp')},
stats AS (
  SELECT doc_id, count(*) AS n_spans, sum(e - s + 1) AS dup_tokens,
         array_to_string(list(CAST(s AS VARCHAR) || '-' || CAST(e AS VARCHAR)
                              ORDER BY s), ',') AS spans_str
  FROM spans_all GROUP BY doc_id
),
nk_lists AS (SELECT doc_id, list(struct_pack(s := s, e := e)) AS nk
             FROM spans_nk GROUP BY doc_id),
kp_lists AS (SELECT doc_id, list(struct_pack(s := s, e := e)) AS kp
             FROM spans_kp GROUP BY doc_id)
SELECT 'span' AS form,
       b.doc_id AS id,
       CAST(b.n AS BIGINT) AS n_tokens,
       CAST(coalesce(st.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       round(coalesce(st.dup_tokens, 0) / greatest(b.n, 1), 6) AS dup_ratio,
       CAST(coalesce(st.n_spans, 0) AS BIGINT) AS n_spans,
       coalesce(st.spans_str, '') AS spans_str,
       coalesce(array_to_string(
         list_filter(
           list_transform(range(0, b.n), i ->
             CASE WHEN len(list_filter(coalesce(nk.nk, []),
                                       x -> i >= x.s AND i <= x.e)) > 0
                   AND len(list_filter(coalesce(kp.kp, []),
                                       x -> i >= x.s AND i <= x.e)) = 0
             THEN NULL ELSE b.t[CAST(i AS INTEGER) + 1] END),
           x -> x IS NOT NULL),
         ' '), '') AS clean_text
FROM base b
LEFT JOIN stats st USING (doc_id)
LEFT JOIN nk_lists nk USING (doc_id)
LEFT JOIN kp_lists kp USING (doc_id)
"""


def paragraph_dedup_oracle() -> str:
    """DuckDB replay of dedup.paragraph_dedup over the synthesized
    paragraph text (dedup.paragraph_text_sql twin): blank-line split with
    positions, lowercase/punct-strip normalization, h60 grouping, keeper
    = smallest (doc_id, idx) of each 2+ group, keeper-preserving
    reassembly. The keeper encoding doc_id*1000000+idx matches Spark's
    min(struct(doc_id, idx)) ordering for idx < 1e6 (paragraph counts are
    single digits)."""
    from pgvectorscale_spark.operators.dedup import paragraph_text_sql

    pt = paragraph_text_sql("text", "doc_id", DUCKDB)
    return f"""
WITH src AS (SELECT doc_id, {pt} AS t FROM documents),
arr AS (SELECT doc_id, regexp_split_to_array(t, '\\n{{2,}}') AS ps FROM src),
paras AS (
  SELECT doc_id, generate_subscripts(ps, 1) - 1 AS idx, unnest(ps) AS p
  FROM arr),
norm AS (
  SELECT doc_id, idx, p,
         trim(regexp_replace(lower(p), '[^a-z0-9]+', ' ', 'g')) AS np
  FROM paras),
fp AS (SELECT doc_id, idx, p, np, {h60('np', DUCKDB)} AS f FROM norm),
grp AS (
  SELECT f, min(doc_id * 1000000 + idx) AS keep
  FROM fp WHERE np <> '' GROUP BY f HAVING count(*) >= 2),
mark AS (
  SELECT fp.doc_id, fp.idx, fp.p,
         (grp.f IS NOT NULL AND fp.doc_id * 1000000 + fp.idx <> grp.keep)
           AS removed
  FROM fp LEFT JOIN grp ON fp.np <> '' AND fp.f = grp.f)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_paras,
       CAST(sum(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT) AS dup_paras,
       round(sum(CASE WHEN removed THEN 1 ELSE 0 END)::DOUBLE
             / greatest(count(*), 1), 6) AS dup_ratio,
       coalesce(string_agg(CASE WHEN NOT removed THEN idx::VARCHAR END,
                           ',' ORDER BY idx), '') AS kept_str,
       coalesce(string_agg(CASE WHEN NOT removed THEN p END,
                           chr(10) || chr(10) ORDER BY idx), '') AS clean_text
FROM mark GROUP BY doc_id
"""


def dedup_exact_union_oracle(k: int) -> str:
    """Tagged union riding the dedup_exact key: the exact document-level
    pass ('exact' rows, dup_count in the dup_tokens slot), the span-level
    substring dedup ('span' rows, one per document), and the
    paragraph-normalized dedup ('para' rows — paragraph counts riding the
    token slots, kept indices in spans_str, cleaned text VERBATIM)."""
    exact = f"""
SELECT 'exact' AS form, min(doc_id) AS id,
       CAST(0 AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS dup_tokens,
       CAST(0.0 AS DOUBLE) AS dup_ratio,
       CAST(0 AS BIGINT) AS n_spans,
       '' AS spans_str, '' AS clean_text
FROM documents GROUP BY {h60('text', DUCKDB)}
"""
    para = f"""
SELECT 'para' AS form, doc_id AS id,
       n_paras AS n_tokens, dup_paras AS dup_tokens, dup_ratio,
       CAST(0 AS BIGINT) AS n_spans,
       kept_str AS spans_str, clean_text
FROM ({paragraph_dedup_oracle()}) pq
"""
    # the span twin opens with a WITH chain, so it rides in a subquery
    return (
        f"{exact} UNION ALL SELECT * FROM ({span_dedup_oracle(k)}) AS span_side "
        f"UNION ALL SELECT * FROM ({para}) AS para_side"
    )


def _minhash_sig_ctes(num_hashes: int, shingle_n: int) -> str:
    """CTE chain ending in sig(doc_id, signature) — hash once per shingle,
    min(xor(h, seed_j)) per hash function (mirrors dedup.minhash_signatures)."""
    toks = tokens("text", DUCKDB)
    sh = word_shingles(toks, shingle_n, DUCKDB)
    mins = ", ".join(
        f"min(xor(hv, {seed})) AS m{j}" for j, seed in enumerate(minhash_seeds(num_hashes))
    )
    arr = ", ".join(f"m{j}" for j in range(num_hashes))
    return f"""
s AS (SELECT doc_id, {sh} AS shingles FROM documents),
ex AS (SELECT doc_id, unnest(shingles) AS sng FROM s),
hv AS (SELECT doc_id, {h60('sng', DUCKDB)} AS hv FROM ex),
mn AS (SELECT doc_id, {mins} FROM hv GROUP BY doc_id),
sig AS (SELECT doc_id, [{arr}] AS signature FROM mn)"""


def minhash_signature_oracle(num_hashes: int, shingle_n: int) -> str:
    return f"""
WITH {_minhash_sig_ctes(num_hashes, shingle_n)}
SELECT doc_id, signature FROM sig ORDER BY doc_id
"""


def minhash_signature_str_oracle(num_hashes: int, shingle_n: int) -> str:
    """Signature rendered as Spark's array-to-string cast format '[a, b, c]'
    so the value-hash compares a plain string column on both engines."""
    return f"""
WITH {_minhash_sig_ctes(num_hashes, shingle_n)}
SELECT doc_id, '[' || array_to_string(signature, ', ') || ']' AS sig_str
FROM sig ORDER BY doc_id
"""


def minhash_bands_oracle(num_hashes: int, bands: int, shingle_n: int) -> str:
    rows = num_hashes // bands
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, {band_hash('signature', b, rows, DUCKDB)} AS band_hash FROM sig"
        for b in range(bands)
    )
    return f"""
WITH {_minhash_sig_ctes(num_hashes, shingle_n)}
SELECT * FROM ({band_rows}) ORDER BY doc_id, band_id
"""


def minhash_pairs_oracle(num_hashes: int, bands: int, shingle_n: int) -> str:
    """ONE exact pair set, emitted under both union tags: the Spark side
    runs the direct join ('exact') and the salted triangle join
    ('salted'), and both must reproduce this set — the salting is a plan
    change only (dedup.minhash_candidate_pairs max_bucket_size)."""
    rows = num_hashes // bands
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, {band_hash('signature', b, rows, DUCKDB)} AS band_hash FROM sig"
        for b in range(bands)
    )
    return f"""
WITH {_minhash_sig_ctes(num_hashes, shingle_n)},
buckets AS ({band_rows}),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a JOIN buckets b USING (band_id, band_hash)
  WHERE a.doc_id < b.doc_id)
SELECT doc_a, doc_b, 'exact' AS form FROM pairs
UNION ALL
SELECT doc_a, doc_b, 'salted' AS form FROM pairs
ORDER BY form, doc_a, doc_b
"""


def _cluster_ctes(num_hashes: int, bands: int, shingle_n: int) -> str:
    """CTE chain ending in clusters(doc_id, cluster_id, is_canonical) —
    minhash-LSH pairs -> recursive min-reachable-id (UNION dedups the
    frontier, so the recursion terminates on cycles). Callers must prefix
    the statement with WITH RECURSIVE."""
    rows = num_hashes // bands
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, {band_hash('signature', b, rows, DUCKDB)} AS band_hash FROM sig"
        for b in range(bands)
    )
    return f"""{_minhash_sig_ctes(num_hashes, shingle_n)},
buckets AS ({band_rows}),
pair AS (
  SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
  FROM buckets a JOIN buckets b USING (band_id, band_hash)
  WHERE a.doc_id < b.doc_id),
edge AS (SELECT u, v FROM pair UNION SELECT v, u FROM pair),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.id, edge.v FROM reach JOIN edge ON reach.r = edge.u),
clusters AS (
  SELECT id AS doc_id, min(r)::BIGINT AS cluster_id, (min(r) = id) AS is_canonical
  FROM reach GROUP BY id)"""


def dedup_clusters_oracle(num_hashes: int, bands: int, shingle_n: int) -> str:
    """Recursive-CTE twin of dedup.dedup_clusters."""
    return f"""
WITH RECURSIVE {_cluster_ctes(num_hashes, bands, shingle_n)}
SELECT doc_id, cluster_id, is_canonical FROM clusters ORDER BY doc_id
"""


def corpus_curation_oracle(
    num_hashes: int, bands: int, shingle_n: int, min_quality: int
) -> str:
    """Twin of the end-to-end corpus-curation pass: quality + language gate,
    one canonical survivor per near-dup cluster, exact BPE token counts —
    the curated corpus a training pipeline materializes."""
    from pgvectorscale_spark.functions.text import (
        bpe_token_count_sql,
        lang_id_sql,
        quality_score_sql,
    )

    return f"""
WITH RECURSIVE {_cluster_ctes(num_hashes, bands, shingle_n)},
feats AS (
  SELECT doc_id,
         {quality_score_sql('text', DUCKDB)} AS quality_micro,
         {lang_id_sql('text', DUCKDB)} AS lang_id,
         {bpe_token_count_sql('text', DUCKDB)} AS bpe_tokens
  FROM documents)
SELECT f.doc_id, f.lang_id, f.quality_micro, f.bpe_tokens, c.cluster_id
FROM feats f JOIN clusters c USING (doc_id)
WHERE c.is_canonical AND f.quality_micro >= {min_quality} AND f.lang_id <> 'unknown'
ORDER BY f.doc_id
"""


def ngram_jaccard_oracle(shingle_n: int, threshold: float) -> str:
    toks = tokens("text", DUCKDB)
    sh = word_shingles(toks, shingle_n, DUCKDB)
    return f"""
WITH s AS (SELECT doc_id, list_distinct({sh}) AS sh FROM documents),
sizes AS (SELECT doc_id, len(sh) AS n FROM s),
ex AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM ex a JOIN ex b USING (shingle) WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT doc_a, doc_b,
       round(i / (na.n + nb.n - i)::DOUBLE, 6) AS jaccard
FROM inter JOIN sizes na ON doc_a = na.doc_id JOIN sizes nb ON doc_b = nb.doc_id
WHERE round(i / (na.n + nb.n - i)::DOUBLE, 6) >= {threshold}
ORDER BY doc_a, doc_b
"""


def bm25_oracle(
    k: int,
    query_pred: str,
    query_prefix_tokens: int,
    k1: float = 1.2,
    b: float = 0.75,
    corpus_table: str = "documents",
) -> str:
    """Full in-SQL replay of operators/bm25.bm25_topk over queries drawn
    from the corpus itself (``query_pred`` rows, first
    ``query_prefix_tokens`` tokens as the query text). Literals are cast
    to DOUBLE and the arithmetic order mirrors the Spark column expression
    exactly; scores round to 6 decimals BEFORE ranking (ties on doc_id)
    so the top-k cut is identical. ``corpus_table`` is any relation
    exposing (doc_id, text) — the hybrid-RRF twin passes the
    documents⋈embeddings join."""
    toks = tokens("text", DUCKDB)
    return f"""
WITH base AS (SELECT doc_id, {toks} AS t FROM {corpus_table}),
post AS (
  SELECT term, doc_id, dl, count(*) AS tf
  FROM (SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM base)
  GROUP BY term, doc_id, dl),
stats AS (SELECT count(*)::DOUBLE AS N, avg(len(t)) AS avgdl FROM base),
dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM post GROUP BY term),
idf AS (
  SELECT term, ln(1.0::DOUBLE + (stats.N - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE)) AS idf
  FROM dft, stats),
q AS (
  SELECT doc_id AS query_id, unnest(list_distinct(t[1:{query_prefix_tokens}])) AS term
  FROM base WHERE {query_pred}),
contrib AS (
  SELECT q.query_id, p.doc_id,
         idf.idf * (p.tf * {k1 + 1.0!r}::DOUBLE)
           / (p.tf + {k1!r}::DOUBLE * ({1.0 - b!r}::DOUBLE + ({b!r}::DOUBLE * p.dl) / stats.avgdl)) AS s
  FROM post p JOIN q USING (term) JOIN idf ON p.term = idf.term, stats),
scored AS (
  SELECT query_id, doc_id, round(sum(s), 6) AS score
  FROM contrib GROUP BY query_id, doc_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
  FROM scored)
SELECT query_id, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


_HYBRID_CORPUS = (
    "(SELECT d.doc_id, d.text, e.embedding "
    "FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id)"
)


def hybrid_rrf_oracle(
    k: int,
    arm_k: int,
    query_pred: str,
    query_prefix_tokens: int,
    rrf_k: int = 60,
) -> str:
    """Twin of operators/hybrid.hybrid_topk over the documents⋈embeddings
    corpus: the BM25 arm replays bm25_oracle on the joined corpus, the
    vector arm replays the normalized-cosine top-k (distances rounded to
    4 decimals BEFORE ranking, ties on doc_id — knn_batch_oracle's seam),
    and RRF sums 1/(rrf_k + rank) per arm in DOUBLE, rounds to 6 decimals,
    then ranks desc with ties on doc_id. Queries are the ``query_pred``
    corpus rows: first ``query_prefix_tokens`` tokens as q_text, own
    embedding as q_vec."""
    lex = bm25_oracle(
        arm_k, query_pred, query_prefix_tokens, corpus_table=_HYBRID_CORPUS
    )
    return f"""
WITH corpus AS (SELECT * FROM {_HYBRID_CORPUS} c),
ev AS (
  SELECT doc_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS v
  FROM corpus),
en AS (SELECT doc_id, sqrt(sum(v * v)) AS nrm FROM ev GROUP BY doc_id),
qv AS (SELECT doc_id AS query_id, i, v FROM ev WHERE {query_pred}),
qn AS (SELECT doc_id AS query_id, nrm FROM en WHERE {query_pred}),
vd AS (
  SELECT qv.query_id, ev.doc_id,
         greatest(0.0, 1.0 - sum((ev.v / en.nrm) * (qv.v / qn.nrm))) AS distance
  FROM ev JOIN qv USING (i)
  JOIN en ON ev.doc_id = en.doc_id JOIN qn ON qv.query_id = qn.query_id
  GROUP BY qv.query_id, ev.doc_id, en.nrm, qn.nrm),
vec_arm AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(distance, 4), doc_id) AS rank
  FROM vd QUALIFY rank <= {arm_k}),
lex_arm AS (SELECT query_id, doc_id, rank FROM ({lex}) l),
pooled AS (
  SELECT query_id, doc_id,
         1.0::DOUBLE / (CAST({rrf_k} AS DOUBLE) + rank) AS c
  FROM lex_arm
  UNION ALL
  SELECT query_id, doc_id,
         1.0::DOUBLE / (CAST({rrf_k} AS DOUBLE) + rank) AS c
  FROM vec_arm),
fused AS (
  SELECT query_id, doc_id, round(sum(c), 6) AS rrf_score
  FROM pooled GROUP BY query_id, doc_id)
SELECT query_id, doc_id, rrf_score,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY rrf_score DESC, doc_id)::BIGINT AS rank
FROM fused QUALIFY rank <= {k}"""


def ngram_jaccard_union_oracle(
    shingle_n: int,
    threshold: float,
    bm25_k: int,
    bm25_query_pred: str,
    bm25_prefix_tokens: int,
    rrf_k_final: int = 5,
    rrf_arm_k: int = 10,
) -> str:
    """Tagged union: the n-gram Jaccard near-dup pairs ('jaccard' rows),
    BM25 top-k lexical search ('bm25' rows, query_id riding the doc_a
    slot, doc_id riding doc_b, score riding the jaccard slot, rank riding
    a new column that the jaccard rows fill with 0), AND hybrid BM25+
    cosine RRF fusion ('rrf' rows, rrf_score riding the jaccard slot)."""
    jac = f"""
SELECT doc_a, doc_b, jaccard, 0::BIGINT AS rank
FROM ({ngram_jaccard_oracle(shingle_n, threshold)}) j"""
    bm = f"""
SELECT query_id AS doc_a, doc_id AS doc_b, score AS jaccard, rank
FROM ({bm25_oracle(bm25_k, bm25_query_pred, bm25_prefix_tokens)}) b"""
    rrf = f"""
SELECT query_id AS doc_a, doc_id AS doc_b, rrf_score AS jaccard, rank
FROM ({hybrid_rrf_oracle(rrf_k_final, rrf_arm_k, bm25_query_pred, bm25_prefix_tokens)}) r"""
    return tagged_union_oracle(
        "form", [("'jaccard'", jac), ("'bm25'", bm), ("'rrf'", rrf)]
    )


def winnowing_oracle(shingle_n: int, window: int) -> str:
    """Twin of dedup.winnowing_fingerprints: per-window arg-min with the
    rightmost-tie robust-winnowing rule, replayed as a bounded position
    fan-out + QUALIFY row_number (integer comparisons only — no float
    seam)."""
    toks = tokens("text", DUCKDB)
    grams = word_shingles(toks, shingle_n, DUCKDB)
    return f"""
WITH s AS (
  SELECT doc_id, list_transform({grams}, s -> {h60('s', DUCKDB)}) AS hs
  FROM documents),
g AS (
  SELECT doc_id, len(hs) AS n, unnest(hs) AS h,
         generate_subscripts(hs, 1) AS pos
  FROM s),
e AS (
  SELECT doc_id, pos, h,
         unnest(list_filter(range(pos, least(pos + {window}, n + 1)),
                            e -> e >= least({window}, n))) AS e
  FROM g),
p AS (
  SELECT doc_id, e, h, pos,
         row_number() OVER (PARTITION BY doc_id, e ORDER BY h, pos DESC) AS rn
  FROM e)
SELECT DISTINCT doc_id, pos::BIGINT AS pos, h AS gram_hash
FROM p WHERE rn = 1"""


def simhash_union_oracle(num_bits: int, shingle_n: int, window: int) -> str:
    """Tagged union: the simhash fingerprints ('simhash' rows, pos slot 0)
    AND the winnowing fingerprint set ('winnow' rows — gram_hash riding
    the simhash slot, one row per selected (hash, pos))."""
    sim = f"""
SELECT doc_id, simhash, 0::BIGINT AS pos
FROM ({simhash_oracle(num_bits)}) s"""
    win = f"""
SELECT doc_id, gram_hash AS simhash, pos
FROM ({winnowing_oracle(shingle_n, window)}) w"""
    return tagged_union_oracle("form", [("'simhash'", sim), ("'winnow'", win)])


def simhash_oracle(num_bits: int) -> str:
    toks = tokens("text", DUCKDB)
    return f"""
WITH t AS (SELECT doc_id, unnest(list_distinct({toks})) AS tok FROM documents),
h AS (SELECT doc_id, {h60('tok', DUCKDB)} AS hv FROM t),
bits AS (
  SELECT doc_id, i.range AS i,
         CASE WHEN sum(((hv >> i.range::INT) & 1) * 2 - 1) > 0 THEN 1 ELSE 0 END AS b
  FROM h CROSS JOIN range({num_bits}) i GROUP BY doc_id, i.range)
SELECT doc_id, sum(b * (1::BIGINT << i::INT))::BIGINT AS simhash
FROM bits GROUP BY doc_id ORDER BY doc_id
"""


def simhash_pairs_oracle(num_bits: int, max_hamming: int) -> str:
    base = simhash_oracle(num_bits).strip().rstrip()
    return f"""
WITH sh AS ({base})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
ORDER BY doc_a, doc_b
"""


def _melt_sql(inner_sql: str, form: str, metrics: list[str]) -> str:
    """Long-format (form, doc_id, metric, value VARCHAR) melt of a wide
    SELECT — the DuckDB twin of the Spark side's ``stack()``. VARCHAR
    values keep the union schema-stable across int/bool/string metrics
    (both engines render bigints as plain digits and booleans as
    'true'/'false', so no float-format seam exists)."""
    return "\nUNION ALL\n".join(
        f"SELECT '{form}' AS form, doc_id, '{m}' AS metric, "
        f"cast({m} AS VARCHAR) AS value FROM ({inner_sql}) s"
        for m in metrics
    )


def text_features_oracle() -> str:
    """Tagged long-format union over the per-document text-analysis family:

    - ``features``: the original six text signals,
    - ``pii``: detection counts + Luhn-valid card count + redacted-output
      h60 over the digest-synthesized PII text (functions/pii.py),
    - ``rules``: the Gopher-style quality-gate rule verdicts + overall
      pass (functions/text.quality_rule_sqls),
    - ``lm``: bigram stupid-backoff LM scores, trained in-SQL on the
      doc_id % 2 = 0 slice (functions/lm.py twin),
    - ``langprof``: learned char-trigram language-ID scores + argmax
      (FROZEN_LANG_PROFILES replayed as static expressions),
    - ``clf``: the distilled quality classifier's integer-micro score +
      verdict (FROZEN_QUALITY_WEIGHTS replayed as the same per-token
      weight-lookup fold).
    """
    from pgvectorscale_spark.functions import pii
    from pgvectorscale_spark.functions.text import quality_passes_sql, quality_rule_sqls

    features_inner = f"""
SELECT doc_id,
       {token_count_sql('text', DUCKDB)} AS token_count,
       {punct_ratio_sql('text', DUCKDB)} AS punct_permille,
       {stopword_ratio_sql('text', DUCKDB)} AS stopword_permille,
       {quality_score_sql('text', DUCKDB)} AS quality_micro,
       {lang_id_sql('text', DUCKDB)} AS lang_id,
       {document_fingerprint_sql('text', DUCKDB)} AS fingerprint
FROM documents"""

    pii_metrics = {
        "n_urls": pii.pii_count_sql("pt", "url", DUCKDB),
        "n_emails": pii.pii_count_sql("pt", "email", DUCKDB),
        "n_ipv4": pii.pii_count_sql("pt", "ipv4", DUCKDB),
        "n_ssns": pii.pii_count_sql("pt", "ssn", DUCKDB),
        "n_phones": pii.pii_count_sql("pt", "phone", DUCKDB),
        "n_card_candidates": pii.pii_count_sql("pt", "card", DUCKDB),
        "n_cards_valid": pii.pii_count_sql("pt", "card_valid", DUCKDB),
        "redacted_fp": h60(pii.redacted_text_sql("pt", DUCKDB), DUCKDB),
    }
    pii_sel = ", ".join(f"{e} AS {n}" for n, e in pii_metrics.items())
    pii_inner = (
        f"SELECT doc_id, {pii_sel} FROM (SELECT doc_id, "
        f"{pii.pii_text_sql('text', 'doc_id', DUCKDB)} AS pt FROM documents) p"
    )

    rules = quality_rule_sqls("text", DUCKDB)
    rules_sel = ", ".join(f"({e}) AS {n}" for n, e in sorted(rules.items()))
    rules_inner = (
        f"SELECT doc_id, {rules_sel}, "
        f"({quality_passes_sql('text', DUCKDB)}) AS passes FROM documents"
    )

    lm_inner = bigram_lm_inner_sql()

    from pgvectorscale_spark.functions.text import (
        FROZEN_LANG_PROFILES,
        lang_id_profile_sql,
        lang_profile_scores_sql,
    )

    from pgvectorscale_spark.functions.quality_clf import (
        FROZEN_QUALITY_WEIGHTS,
        clf_score_micro_sql,
    )

    clf_sc = clf_score_micro_sql("text", list(FROZEN_QUALITY_WEIGHTS), DUCKDB)
    # score computed once in the inner select, pass derived from it —
    # mirrors the Spark side's single-fold discipline
    clf_inner = (
        f"SELECT doc_id, clf_score_micro, clf_score_micro > 0 AS clf_pass "
        f"FROM (SELECT doc_id, {clf_sc} AS clf_score_micro FROM documents)"
    )

    pscores = lang_profile_scores_sql("text", FROZEN_LANG_PROFILES, DUCKDB)
    psel = ", ".join(f"{e} AS score_{l}" for l, e in sorted(pscores.items()))
    pargmax = lang_id_profile_sql({l: f"score_{l}" for l in pscores})
    prof_inner = (
        f"SELECT doc_id, {', '.join(f'score_{l}' for l in sorted(pscores))}, "
        f"{pargmax} AS lang_prof "
        f"FROM (SELECT doc_id, {psel} FROM documents) q"
    )

    return union_oracle(
        [
            _melt_sql(
                features_inner,
                "features",
                [
                    "token_count",
                    "punct_permille",
                    "stopword_permille",
                    "quality_micro",
                    "lang_id",
                    "fingerprint",
                ],
            ),
            _melt_sql(pii_inner, "pii", list(pii_metrics)),
            _melt_sql(rules_inner, "rules", sorted(rules) + ["passes"]),
            _melt_sql(
                lm_inner,
                "lm",
                [
                    "n_bigrams",
                    "n_unseen",
                    "logprob_micro",
                    "n_trigrams",
                    "n_tri_unseen",
                    "logprob3_micro",
                ],
            ),
            _melt_sql(
                prof_inner,
                "langprof",
                [f"score_{l}" for l in sorted(pscores)] + ["lang_prof"],
            ),
            _melt_sql(clf_inner, "clf", ["clf_score_micro", "clf_pass"]),
        ]
    )


def bigram_lm_inner_sql(train_pred: str = "doc_id % 2 = 0", alpha: float = 0.4) -> str:
    """Full in-SQL replay of functions/lm.bigram_lm_scores AND
    trigram_lm_scores over shared count CTEs: train unigram/bigram/trigram
    counts on the ``train_pred`` slice, score every document with stupid
    backoff (bigram: ``c12/c1`` else ``alpha*(c2+1)/(T+V)``; trigram: the
    full ``c123/c12`` → ``alpha*c23/c2`` → ``alpha^2*(c3+1)/(T+V)``
    recursion). Every literal is cast to DOUBLE so DuckDB's DECIMAL
    literal arithmetic can't diverge from Spark's double path; log-sums
    are integer micro-nats (see lm.py float discipline)."""
    from pgvectorscale_spark.functions.lm import bigram_pairs_sql, trigram_triples_sql

    toks = tokens("text", DUCKDB)
    pairs = bigram_pairs_sql("t", DUCKDB)
    triples = trigram_triples_sql("t", DUCKDB)
    a2 = alpha * alpha
    return f"""
WITH base AS (SELECT doc_id, {toks} AS t FROM documents),
uni AS (
  SELECT w, count(*) AS c
  FROM (SELECT unnest(t) AS w FROM base WHERE {train_pred}) GROUP BY w),
tot AS (SELECT sum(c)::DOUBLE AS T, count(*)::DOUBLE AS V FROM uni),
bigp AS (
  SELECT doc_id, u.w1 AS w1, u.w2 AS w2
  FROM (SELECT doc_id, unnest({pairs}) AS u FROM base)),
big AS (
  SELECT w1, w2, count(*) AS c12 FROM bigp WHERE {train_pred}
  GROUP BY w1, w2),
doc AS (
  SELECT bp.doc_id,
         count(*) AS n_bigrams,
         sum(CASE WHEN big.c12 IS NULL THEN 1 ELSE 0 END) AS n_unseen,
         round(sum(ln(
           CASE WHEN big.c12 IS NOT NULL THEN big.c12 / u1.c
           ELSE ({alpha!r}::DOUBLE * (coalesce(u2.c, 0) + 1)) / (tot.T + tot.V)
           END)) * 1e6)::BIGINT AS logprob_micro
  FROM bigp bp
  LEFT JOIN big ON bp.w1 = big.w1 AND bp.w2 = big.w2
  LEFT JOIN uni u1 ON bp.w1 = u1.w
  LEFT JOIN uni u2 ON bp.w2 = u2.w, tot
  GROUP BY bp.doc_id),
trip AS (
  SELECT doc_id, u.w1 AS w1, u.w2 AS w2, u.w3 AS w3
  FROM (SELECT doc_id, unnest({triples}) AS u FROM base)),
tri AS (
  SELECT w1, w2, w3, count(*) AS c123 FROM trip WHERE {train_pred}
  GROUP BY w1, w2, w3),
doc3 AS (
  SELECT tp.doc_id,
         count(*) AS n_trigrams,
         sum(CASE WHEN tri.c123 IS NULL THEN 1 ELSE 0 END) AS n_tri_unseen,
         round(sum(ln(
           CASE WHEN tri.c123 IS NOT NULL THEN tri.c123 / b12.c12
           WHEN b23.c12 IS NOT NULL THEN ({alpha!r}::DOUBLE * b23.c12) / u2.c
           ELSE ({a2!r}::DOUBLE * (coalesce(u3.c, 0) + 1)) / (tot.T + tot.V)
           END)) * 1e6)::BIGINT AS logprob3_micro
  FROM trip tp
  LEFT JOIN tri ON tp.w1 = tri.w1 AND tp.w2 = tri.w2 AND tp.w3 = tri.w3
  LEFT JOIN big b12 ON tp.w1 = b12.w1 AND tp.w2 = b12.w2
  LEFT JOIN big b23 ON tp.w2 = b23.w1 AND tp.w3 = b23.w2
  LEFT JOIN uni u2 ON tp.w2 = u2.w
  LEFT JOIN uni u3 ON tp.w3 = u3.w, tot
  GROUP BY tp.doc_id)
SELECT d.doc_id,
       coalesce(doc.n_bigrams, 0)::BIGINT AS n_bigrams,
       coalesce(doc.n_unseen, 0)::BIGINT AS n_unseen,
       coalesce(doc.logprob_micro, 0)::BIGINT AS logprob_micro,
       coalesce(doc3.n_trigrams, 0)::BIGINT AS n_trigrams,
       coalesce(doc3.n_tri_unseen, 0)::BIGINT AS n_tri_unseen,
       coalesce(doc3.logprob3_micro, 0)::BIGINT AS logprob3_micro
FROM documents d
LEFT JOIN doc ON d.doc_id = doc.doc_id
LEFT JOIN doc3 ON d.doc_id = doc3.doc_id"""


def tokenize_bpe_oracle() -> str:
    """Tagged union: raw pre-tokenizer count ('pre') + count under the
    frozen trained merge table ('merged' — the same symbol-wrapped
    replace() chain the Spark side runs; SQL replace scans left-to-right
    non-overlapping, which IS the BPE greedy pass)."""
    from pgvectorscale_spark.functions.text import (
        FROZEN_BPE_MERGES,
        bpe_merged_token_count_sql,
        bpe_token_count_sql,
    )

    merged = bpe_merged_token_count_sql("text", list(FROZEN_BPE_MERGES), DUCKDB)
    return f"""
SELECT 'pre' AS form, doc_id, {bpe_token_count_sql('text', DUCKDB)} AS bpe_token_count
FROM documents
UNION ALL
SELECT 'merged' AS form, doc_id, {merged} AS bpe_token_count
FROM documents
UNION ALL
SELECT 'fast' AS form, doc_id, {merged} AS bpe_token_count
FROM documents
"""


def as_of_join_oracle(tolerance: int) -> str:
    """Twin of relational.as_of_join on the click->view attribution
    fixture (projected to the sessionize union slots: session_start =
    click second, session_end = matched view second or -1, event_count =
    matched view event_id or -1): the window-union formulation must
    equal the textbook per-row LATERAL argmax — greatest view second
    at-or-before the click, ties to the largest event_id, no match when
    older than ``tolerance`` seconds."""
    return f"""
WITH c AS (
  SELECT user_id, floor(epoch(ts))::BIGINT AS s FROM events
  WHERE event_type = 'click'),
v AS (
  SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS s FROM events
  WHERE event_type = 'view')
SELECT c.user_id, c.s AS session_start,
       coalesce(m.s, -1) AS session_end,
       coalesce(m.event_id, -1) AS event_count
FROM c LEFT JOIN LATERAL (
  SELECT v.s, v.event_id FROM v
  WHERE v.user_id = c.user_id AND v.s <= c.s AND c.s - v.s <= {int(tolerance)}
  ORDER BY v.s DESC, v.event_id DESC LIMIT 1) m ON true
ORDER BY c.user_id, c.s
"""


def as_of_join_fwd_oracle(tolerance: int) -> str:
    """Forward twin of :func:`as_of_join_oracle` (click -> NEXT view):
    the smallest view second at-or-after the click, ties to the
    SMALLEST event_id (the forward direction's engine-reproducible
    tie rule), no match when further than ``tolerance`` seconds ahead.
    Unmatched clicks (no later view inside the tolerance — every user's
    trailing clicks) stay present with the -1 sentinels, so both the
    matched and unmatched paths are exercised by one driver row."""
    return f"""
WITH c AS (
  SELECT user_id, floor(epoch(ts))::BIGINT AS s FROM events
  WHERE event_type = 'click'),
v AS (
  SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS s FROM events
  WHERE event_type = 'view')
SELECT c.user_id, c.s AS session_start,
       coalesce(m.s, -1) AS session_end,
       coalesce(m.event_id, -1) AS event_count
FROM c LEFT JOIN LATERAL (
  SELECT v.s, v.event_id FROM v
  WHERE v.user_id = c.user_id AND v.s >= c.s AND v.s - c.s <= {int(tolerance)}
  ORDER BY v.s ASC, v.event_id ASC LIMIT 1) m ON true
ORDER BY c.user_id, c.s
"""


def range_join_oracle(tol: int) -> str:
    """Twin of relational.range_join on the click<->view fixture
    (projected to the sessionize union slots): the banded-bucket
    equi-join form must produce exactly the pairs of the textbook
    BETWEEN join — no duplicates from the bucket probing, no misses at
    bucket boundaries."""
    return f"""
WITH c AS (
  SELECT user_id, floor(epoch(ts))::BIGINT AS s FROM events
  WHERE event_type = 'click'),
v AS (
  SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS s FROM events
  WHERE event_type = 'view')
SELECT c.user_id, c.s AS session_start, v.s AS session_end,
       v.event_id AS event_count
FROM c JOIN v USING (user_id)
WHERE v.s - c.s BETWEEN -{int(tol)} AND {int(tol)}
ORDER BY c.user_id, session_start, session_end, event_count
"""


def sessionize_oracle(gap_seconds: int = 1800) -> str:
    """Gap-based sessionization in SQL: lag -> gap flag -> cumsum -> agg.
    Times in epoch seconds (floor) so nanosecond storage compares exactly."""
    return f"""
WITH e AS (SELECT user_id, floor(epoch(ts))::BIGINT AS ts_sec FROM events),
l AS (SELECT user_id, ts_sec,
             lag(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec) AS prev FROM e),
f AS (SELECT user_id, ts_sec,
             CASE WHEN prev IS NULL OR ts_sec - prev > {gap_seconds} THEN 1 ELSE 0 END AS is_new
      FROM l),
s AS (SELECT user_id, ts_sec,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_sec
                               ROWS UNBOUNDED PRECEDING) AS sid FROM f)
SELECT user_id, min(ts_sec) AS session_start, max(ts_sec) AS session_end,
       count(*) AS event_count
FROM s GROUP BY user_id, sid ORDER BY user_id, session_start
"""


def multimodal_meta_oracle(warc_group_size: int = 50) -> str:
    """Tagged union: binary payload metadata ('bin') AND the WARC
    ingestion replay ('warc' — sources/warc.py): one response row per doc
    whose parsed payload must be the doc's exact text, plus one warcinfo
    row per doc_id-div-group file at doc_id = -(warc_id+1). The warcinfo
    block is rebuilt as a SQL E-string so its md5/octet_length are
    computed by DuckDB, not pasted. 'warc_gz' rows replay the SAME
    expected records for the production .warc.gz path (real files on
    disk, member-boundary manifest, ranged inflate) — the Spark side
    must recover identical payloads through gzip, so the oracle rows
    differ only in the form tag."""
    from pgvectorscale_spark.sources.warc import WARCINFO_BLOCK

    block = "e'" + WARCINFO_BLOCK.replace("\r", "\\r").replace("\n", "\\n") + "'"
    return f"""
SELECT 'bin' AS form, doc_id, octet_length(encode(text)) AS byte_len,
       md5(text) AS payload_md5, '' AS warc_type, '' AS target_uri
FROM documents
UNION ALL
SELECT w.form, doc_id, octet_length(encode(text)), md5(text), 'response',
       'https://example.org/doc/' || doc_id
FROM documents, (VALUES ('warc'), ('warc_gz')) w(form)
UNION ALL
SELECT w.form, -(warc_id + 1), octet_length(encode({block})), md5({block}),
       'warcinfo', ''
FROM (SELECT DISTINCT doc_id // {warc_group_size} AS warc_id FROM documents),
     (VALUES ('warc'), ('warc_gz')) w(form)
"""


def multimodal_frames_oracle(every_n: int) -> str:
    """Twin of multimodal.frame_sample_plan over the fake payload: one row
    per sampled frame, identified by md5. DuckDB cannot substring BLOBs, so
    the slicing runs on the text (the documents corpus is pure ASCII: char
    slices == byte slices, verified by octet_length == length)."""
    return f"""
WITH g AS (
  SELECT doc_id, text,
         unnest(generate_series(0, greatest(cast(floor((length(text) - 1) / {every_n}) as int), 0))) AS frame_no
  FROM documents
),
f AS (
  SELECT doc_id, frame_no, substr(text, frame_no * {every_n} + 1, {every_n}) AS frag
  FROM g
)
SELECT doc_id, frame_no::BIGINT AS frame_no, md5(frag) AS frame_md5,
       length(frag)::BIGINT AS frame_len
FROM f ORDER BY doc_id, frame_no
"""


def multimodal_features_oracle(dim: int = 4) -> str:
    """Twin of multimodal.fake_feature_extract (dim <= 4: the md5 digest's
    16 bytes yield exactly 4 little-endian uint32 lanes): feature[i] =
    float32(le_uint32(md5_bytes[4i..4i+4)) / uint32_max). The ::FLOAT cast
    replays the operator's float32 storage so rounding agrees bit-for-bit."""

    def nib(pos: int) -> str:  # 1-based hex-char position -> nibble value
        return f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"

    def byte(j: int) -> str:  # 0-based byte index into the digest
        return f"({nib(2 * j + 1)} * 16 + {nib(2 * j + 2)})"

    lanes = []
    for i in range(dim):
        b = [byte(4 * i + j) for j in range(4)]
        u = f"({b[0]} + {b[1]} * 256 + {b[2]} * 65536 + {b[3]} * 16777216)"
        lanes.append(
            f"SELECT doc_id, CAST({i} AS BIGINT) AS dim, "
            f"round((({u} / 4294967295.0)::FLOAT)::DOUBLE, 6) AS feature FROM m"
        )
    union = " UNION ALL ".join(lanes)
    return f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents)
SELECT * FROM ({union}) ORDER BY doc_id, dim
"""


def resize_image_oracle() -> str:
    """Twin of multimodal.resize_image over the webp checker payloads
    (10x10, grays g/(g+4), g = 16*nib+8): the integer pick pattern
    (dst*10)//5 lands on even rows/cols only (flat g, dims 0-2) and
    (dst*10)//3 mixes 5 g-pixels with 4 (g+4)-pixels (mean (9g+16)/9,
    dims 3-5). Both expressions are exact-integer doubles divided once,
    so the values are bit-identical across engines before the rounding."""
    nib = "(strpos('0123456789abcdef', substr(h, 1, 1)) - 1)"
    g = f"CAST(16 * {nib} + 8 AS DOUBLE)"
    return f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents)
SELECT doc_id, d.dim,
       round(CASE WHEN d.dim < 3 THEN {g}
                  ELSE (9.0 * {g} + 16.0) / 9.0 END, 6) AS feature
FROM m, (VALUES (0::BIGINT), (1), (2), (3), (4), (5)) d(dim)
ORDER BY doc_id, dim
"""


def multimodal_decode_oracle() -> str:
    """Twin of the PPM/WAV decode pipeline (multimodal.attach_ppm_payload →
    parse_ppm, attach_wav_payload → parse_wav): the payload bodies tile
    md5(text) digest bytes, so every decoded feature has a CLOSED FORM over
    the digest hex — the oracle never parses a container. If the Spark-side
    encoder OR decoder mishandles the header, sample layout, endianness,
    channel de-interleave, or sign, the features diverge and the hash check
    fails. Geometry mirrors the operator constants: 5x3 RGB pixels (45 body
    bytes, stride 3 coprime to the 16-byte digest => each channel averages
    a distinct 15-byte subset) and 2x-tiled PCM16 (16 samples, 8 distinct)."""
    from pgvectorscale_spark.operators.multimodal import (
        PPM_H,
        PPM_MAXVAL,
        PPM_W,
        WAV_RATE,
        WAV_TILE,
    )

    def nib(pos: int) -> str:  # 1-based hex-char position -> nibble value
        return f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"

    def byte(j: int) -> str:  # 0-based byte index into the digest
        return f"({nib(2 * j + 1)} * 16 + {nib(2 * j + 2)})"

    body = PPM_W * PPM_H * 3
    rows = []
    for name, chan in (("mean_r", 0), ("mean_g", 1), ("mean_b", 2)):
        terms = [byte(p % 16) for p in range(chan, body, 3)]
        n = len(terms)
        rows.append(
            f"SELECT doc_id, 'ppm' AS media, '{name}' AS metric, "
            f"round(({' + '.join(terms)}) / {n}.0, 6) AS value FROM m"
        )
    for name, val in (("width", PPM_W), ("height", PPM_H), ("maxval", PPM_MAXVAL)):
        rows.append(
            f"SELECT doc_id, 'ppm' AS media, '{name}' AS metric, "
            f"CAST({val} AS DOUBLE) AS value FROM m"
        )
    # PCM16 little-endian: sample s = byte(2s) + 256*byte(2s+1), signed;
    # the 2x tiling repeats the 8 digest samples, so the mean is over 8
    samp = [
        f"(({byte(2 * s)} + {byte(2 * s + 1)} * 256) - "
        f"65536 * (({byte(2 * s + 1)} >= 128)::INT))"
        for s in range(8)
    ]
    rows.append(
        "SELECT doc_id, 'wav' AS media, 'mean_amp' AS metric, "
        f"round(({' + '.join(samp)}) / 8.0, 6) AS value FROM m"
    )
    n_samples = 8 * WAV_TILE
    for name, val in (("channels", 1), ("sample_rate", WAV_RATE), ("n_samples", n_samples)):
        rows.append(
            f"SELECT doc_id, 'wav' AS media, '{name}' AS metric, "
            f"CAST({val} AS DOUBLE) AS value FROM m"
        )
    union = " UNION ALL ".join(rows)
    return f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents)
SELECT * FROM ({union}) ORDER BY doc_id, media, metric
"""


def mp3_meta_oracle() -> str:
    """Twin of the MP3 metadata pipeline (multimodal.attach_mp3_payload →
    parse_mp3_meta): the synth draws every header field from md5(text)
    nibbles, so the scan's outputs have closed forms over the digest hex —
    the oracle replays the nibble draws through the same MPEG-1 Layer III
    bitrate/rate tables (multimodal.MP3_BITRATES / MP3_RATES). If the
    Spark-side frame framing or the parser's header arithmetic drifts, the
    walk loses sync or the values diverge and the hash check fails."""
    from pgvectorscale_spark.operators.multimodal import (
        MP3_BITRATES,
        MP3_RATES,
        MP3_SAMPLES_PER_FRAME,
    )

    def nib(pos: int) -> str:  # 1-based hex-char position -> nibble value
        return f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"

    br = (
        f"CASE 1 + {nib(1)} % 14 "
        + " ".join(f"WHEN {i + 1} THEN {b}" for i, b in enumerate(MP3_BITRATES))
        + " END"
    )
    rate = (
        f"CASE {nib(2)} % 3 "
        + " ".join(f"WHEN {i} THEN {r}" for i, r in enumerate(MP3_RATES))
        + " END"
    )
    return f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents),
f AS (
  SELECT doc_id, ({br})::BIGINT AS kbps, ({rate})::BIGINT AS rate,
         (CASE WHEN {nib(3)} % 4 = 3 THEN 1 ELSE 2 END)::BIGINT AS channels,
         (2 + {nib(4)} % 4)::BIGINT AS n_frames
  FROM m
)
SELECT doc_id, rate AS sample_rate, channels,
       round(kbps::DOUBLE, 6) AS bitrate_kbps, n_frames,
       round(n_frames * {MP3_SAMPLES_PER_FRAME} * 1000.0 / rate, 6) AS duration_ms
FROM f ORDER BY doc_id
"""


def mp4_meta_oracle() -> str:
    """Twin of the MP4 metadata pipeline (multimodal.attach_mp4_payload →
    parse_mp4_meta): every mvhd/tkhd field the box walk recovers is an
    md5-nibble draw the synth made, so the oracle replays the draws in
    closed form. A framing bug Spark-side (box sizes, 16.16 fixed point,
    big-endian u32s) breaks the strict walk or diverges the values."""

    def nib(pos: int) -> str:  # 1-based hex-char position -> nibble value
        return f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"

    return f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents),
f AS (
  SELECT doc_id,
         (600 * (1 + {nib(5)} % 4))::BIGINT AS timescale,
         (1 + {nib(6)} % 10) AS dur_units, {nib(7)} AS dur_extra,
         (16 * (1 + {nib(8)} % 32))::DOUBLE AS width,
         (16 * (1 + {nib(9)} % 32))::DOUBLE AS height,
         (1 + {nib(10)} % 2)::BIGINT AS n_tracks
  FROM m
)
SELECT doc_id, 'isom' AS brand, timescale,
       round((timescale * dur_units + dur_extra) * 1000.0 / timescale, 6)
         AS duration_ms,
       n_tracks, width, height
FROM f ORDER BY doc_id
"""


def decontaminate_oracle(shingle_n: int, benchmark_pred: str) -> str:
    """Twin of curation.decontaminate with the benchmark drawn from the
    documents table by ``benchmark_pred`` (a SQL predicate over doc_id) —
    per corpus doc, how many of its distinct word n-grams appear in the
    benchmark's shingle set."""
    toks = tokens("text", DUCKDB)
    sh = word_shingles(toks, shingle_n, DUCKDB)
    return f"""
WITH corpus AS (
  SELECT doc_id, unnest(list_distinct({sh})) AS sh FROM documents
),
bench AS (
  SELECT DISTINCT unnest(list_distinct({sh})) AS sh
  FROM documents WHERE {benchmark_pred}
),
hits AS (
  SELECT doc_id, count(*) AS n_hits FROM corpus JOIN bench USING (sh)
  GROUP BY doc_id
)
SELECT d.doc_id, coalesce(h.n_hits, 0)::BIGINT AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
ORDER BY d.doc_id
"""


def repetition_stats_oracle() -> str:
    """Twin of curation.repetition_stats: duplicate 2/3-gram fractions and
    the most-frequent-token share, word-level."""
    toks = tokens("text", DUCKDB)
    g2 = word_shingles("t", 2, DUCKDB)
    g3 = word_shingles("t", 3, DUCKDB)
    return f"""
WITH base AS (SELECT doc_id, {toks} AS t FROM documents),
per_doc AS (
  SELECT doc_id, len(t)::BIGINT AS n_tokens,
         round(1.0 - len(list_distinct({g2})) / len({g2})::DOUBLE, 6) AS dup_2gram_frac,
         round(1.0 - len(list_distinct({g3})) / len({g3})::DOUBLE, 6) AS dup_3gram_frac
  FROM base
),
counts AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (SELECT doc_id, unnest(t) AS tok FROM base) GROUP BY doc_id, tok
),
tops AS (SELECT doc_id, max(c) AS top FROM counts GROUP BY doc_id)
SELECT p.doc_id, p.n_tokens,
       round(t.top / p.n_tokens::DOUBLE, 6) AS top_token_frac,
       p.dup_2gram_frac, p.dup_3gram_frac
FROM per_doc p JOIN tops t ON p.doc_id = t.doc_id
ORDER BY p.doc_id
"""


def multimodal_decode_png_oracle() -> str:
    """Twin of the PNG decode pipeline (multimodal.attach_png_payload →
    parse_png): the FILTERED scanline bytes tile md5(text), one scanline
    per filter type None/Sub/Up, so the RECONSTRUCTED pixels have closed
    forms over the digest hex — None: the byte itself; Sub: the per-channel
    mod-256 cumulative sum along the row; Up: that plus the row-2 byte,
    mod 256. The oracle recomputes the decoded per-channel means from those
    forms without parsing any container — a bug anywhere in the Spark-side
    framing (adler32/CRC/stored-block) makes the strict decoder RAISE, and
    a bug in the defilter math diverges the means and fails the hash."""
    from pgvectorscale_spark.operators.multimodal import PNG_FILTERS, PNG_H, PNG_W

    assert tuple(PNG_FILTERS[:PNG_H]) == (0, 1, 2), "oracle mirrors None/Sub/Up rows"
    stride = PNG_W * 3

    def nib(pos: int) -> str:  # 1-based hex-char position -> nibble value
        return f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"

    def byte(j: int) -> str:  # 0-based BODY byte index -> digest byte value
        j %= 16
        return f"({nib(2 * j + 1)} * 16 + {nib(2 * j + 2)})"

    # reconstructed pixel expressions per (row, x): row 0 = raw byte; row 1
    # = mod-256 per-channel cumsum of row-1 raw bytes; row 2 = row-2 raw
    # byte + row-1 recon, folded into a single mod
    def p(r: int, x: int) -> str:
        if r == 0:
            return byte(x)
        sub_terms = [byte(stride + t) for t in range(x % 3, x + 1, 3)]
        if r == 1:
            return f"(({' + '.join(sub_terms)}) % 256)"
        return f"(({byte(2 * stride + x)} + {' + '.join(sub_terms)}) % 256)"

    rows = []
    for name, chan in (("mean_r", 0), ("mean_g", 1), ("mean_b", 2)):
        terms = [p(r, x) for r in range(PNG_H) for x in range(chan, stride, 3)]
        rows.append(
            f"SELECT doc_id, 'png' AS media, '{name}' AS metric, "
            f"round(({' + '.join(terms)}) / {len(terms)}.0, 6) AS value FROM m"
        )
    for name, val in (("width", PNG_W), ("height", PNG_H), ("channels", 3)):
        rows.append(
            f"SELECT doc_id, 'png' AS media, '{name}' AS metric, "
            f"CAST({val} AS DOUBLE) AS value FROM m"
        )
    union = " UNION ALL ".join(rows)
    return f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents)
SELECT * FROM ({union}) ORDER BY doc_id, media, metric
"""


def mjpeg_decode_oracle() -> str:
    """Twin of the MJPEG video SAMPLE-decode pipeline
    (mjpeg.attach_mjpeg_payload → parse_mjpeg → decode_mjpeg_frames):
    the synth draws geometry, frame count and per-frame flat gray values
    from md5 nibbles, and a flat frame's decoded pixels are EXACTLY its
    encoded value (v = 16*nib + 8 makes the quantized DC lossless — see
    mjpeg.py's module docstring for the arithmetic), so every decoded
    frame mean has a closed form over the digest hex. A Huffman-table,
    entropy, IDCT, RIFF-walk or chunk-size bug on either side diverges
    the means or the frame count and fails the hash."""
    from pgvectorscale_spark.operators.mjpeg import MJPEG_DIMS, MJPEG_MAX_FRAMES

    assert MJPEG_DIMS == ((8, 8), (16, 16)), "oracle mirrors the synth geometry table"

    def nib(pos: int) -> str:  # 1-based hex-char position -> nibble value
        return f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"

    dim = f"(8 + 8 * ({nib(1)} % 2))"
    n = f"(2 + {nib(2)} % {MJPEG_MAX_FRAMES - 1})"
    rows = [
        f"SELECT doc_id, 'mjpeg' AS media, 'n_frames' AS metric, CAST({n} AS DOUBLE) AS value FROM m",
        f"SELECT doc_id, 'mjpeg' AS media, 'width' AS metric, CAST({dim} AS DOUBLE) AS value FROM m",
        f"SELECT doc_id, 'mjpeg' AS media, 'height' AS metric, CAST({dim} AS DOUBLE) AS value FROM m",
        f"SELECT doc_id, 'mjpeg' AS media, 'channels' AS metric, CAST(1 AS DOUBLE) AS value FROM m",
    ]
    for i in range(MJPEG_MAX_FRAMES):
        rows.append(
            f"SELECT doc_id, 'mjpeg' AS media, 'mean_f{i}' AS metric, "
            f"CAST(16 * {nib(3 + i)} + 8 AS DOUBLE) AS value FROM m WHERE {i} < {n}"
        )
    union = " UNION ALL ".join(rows)
    return f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents)
SELECT * FROM ({union}) ORDER BY doc_id, media, metric
"""


def _g711_ulaw_sql(b: str) -> str:
    """ITU-T G.711 mu-law expansion written directly in SQL (bias-132
    segment shift; anchors 0xFF -> 0, 0x00 -> -32124) — shared by the WAV
    (g711_decode_oracle) and AU (au_decode_oracle) container twins."""
    u = f"(255 - {b})"
    t = f"((({u} % 16) * 8 + 132) * CAST(power(2, ({u} // 16) % 8) AS BIGINT))"
    return f"(CASE WHEN {u} >= 128 THEN 132 - {t} ELSE {t} - 132 END)"


def au_decode_oracle() -> str:
    """Twin of the Sun AU decode pipeline (multimodal.attach_au_payload →
    parse_au): the big-endian .snd header carries an 8-byte annotation
    (data offset 32), then digest bytes tile as mu-law samples — the
    container twin of the G.711 WAV oracle, so a header-walk, offset-skip,
    or companding bug on either side diverges the means."""
    from pgvectorscale_spark.operators.multimodal import WAV_RATE, WAV_TILE

    def nib(pos: int) -> str:
        return f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"

    def byte(j: int) -> str:
        return f"({nib(2 * j + 1)} * 16 + {nib(2 * j + 2)})"

    terms = [_g711_ulaw_sql(byte(j)) for j in range(16)]
    n_samples = 16 * WAV_TILE
    rows = [
        "SELECT doc_id, 'au' AS media, 'mean_amp' AS metric, "
        f"round(({' + '.join(terms)}) / 16.0, 6) AS value FROM m",
        "SELECT doc_id, 'au' AS media, 'last_amp' AS metric, "
        f"round(CAST({_g711_ulaw_sql(byte(15))} AS DOUBLE), 6) AS value FROM m",
        "SELECT doc_id, 'au' AS media, 'channels' AS metric, CAST(1 AS DOUBLE) AS value FROM m",
        "SELECT doc_id, 'au' AS media, 'sample_rate' AS metric, "
        f"CAST({WAV_RATE} AS DOUBLE) AS value FROM m",
        "SELECT doc_id, 'au' AS media, 'n_samples' AS metric, "
        f"CAST({n_samples} AS DOUBLE) AS value FROM m",
    ]
    union = " UNION ALL ".join(rows)
    return f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents)
SELECT * FROM ({union}) ORDER BY doc_id, media, metric
"""


def g711_decode_oracle() -> str:
    """Twin of the G.711 lossy-audio decode pipeline
    (multimodal.attach_g711_payload → parse_wav): the payload body tiles
    md5(text) digest bytes WAV_TILE x as companded 8-bit samples, so every
    decoded feature has a closed form over the digest hex. The oracle
    expands each byte through the ITU-T G.711 segment formulas WRITTEN
    INDEPENDENTLY IN SQL (bias-132 shift for mu-law, XOR-0x55 segment
    expansion for A-law) — it never touches the numpy decode tables, so a
    companding-arithmetic bug on either side diverges the means and fails
    the hash. Canonical anchors baked into the formulas: mu-law 0xFF -> 0,
    0x00 -> -32124; A-law 0x55 -> -8, 0xAA -> +32256."""
    from pgvectorscale_spark.operators.multimodal import WAV_RATE, WAV_TILE

    def nib(pos: int) -> str:  # 1-based hex-char position -> nibble value
        return f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"

    def byte(j: int) -> str:  # 0-based byte index into the digest
        return f"({nib(2 * j + 1)} * 16 + {nib(2 * j + 2)})"

    ulaw = _g711_ulaw_sql  # shared with au_decode_oracle (container twin)

    def alaw(b: str) -> str:
        a = f"xor({b}, 85)"
        m, seg = f"({a} % 16)", f"(({a} // 16) % 8)"
        t = (
            f"(CASE WHEN {seg} = 0 THEN {m} * 16 + 8 "
            f"WHEN {seg} = 1 THEN {m} * 16 + 264 "
            f"ELSE ({m} * 16 + 264) * CAST(power(2, {seg} - 1) AS BIGINT) END)"
        )
        return f"(CASE WHEN {a} >= 128 THEN {t} ELSE -{t} END)"

    rows = []
    n_samples = 16 * WAV_TILE
    for media, law in (("ulaw", ulaw), ("alaw", alaw)):
        terms = [law(byte(j)) for j in range(16)]
        rows.append(
            f"SELECT doc_id, '{media}' AS media, 'mean_amp' AS metric, "
            f"round(({' + '.join(terms)}) / 16.0, 6) AS value FROM m"
        )
        rows.append(
            f"SELECT doc_id, '{media}' AS media, 'last_amp' AS metric, "
            f"round(CAST({law(byte(15))} AS DOUBLE), 6) AS value FROM m"
        )
        for name, val in (("channels", 1), ("sample_rate", WAV_RATE), ("n_samples", n_samples)):
            rows.append(
                f"SELECT doc_id, '{media}' AS media, '{name}' AS metric, "
                f"CAST({val} AS DOUBLE) AS value FROM m"
            )
    union = " UNION ALL ".join(rows)
    return f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents)
SELECT * FROM ({union}) ORDER BY doc_id, media, metric
"""


def ima_adpcm_decode_oracle() -> str:
    """Twin of the IMA/DVI ADPCM lossy-audio decode pipeline
    (multimodal.attach_ima_payload → parse_wav → decode_ima_adpcm): the
    single mono block seeds predictor/step-index from digest bytes 0-2 and
    feeds the digest's 32 nibbles (LOW nibble of each byte first) through
    the adaptive-quantizer recurrence. The oracle replays that recurrence
    STEP BY STEP in a recursive CTE — clamps, bit-tests and the sign nibble
    written independently in SQL (only the published 89-entry step-size
    table is shared with the decoder, as spec data) — so a drift anywhere
    in the sequential state machine diverges pred/index and fails the
    hash on mean_amp/last_amp."""
    from pgvectorscale_spark.operators.multimodal import (
        IMA_INDEX_TABLE,
        IMA_SAMPLES_PER_BLOCK,
        IMA_STEP_TABLE,
        WAV_RATE,
    )

    def nib(pos: int) -> str:
        return f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"

    def byte(j: int) -> str:
        return f"({nib(2 * j + 1)} * 16 + {nib(2 * j + 2)})"

    steps = "[" + ", ".join(str(int(v)) for v in IMA_STEP_TABLE) + "]"
    idxs = "[" + ", ".join(str(int(v)) for v in IMA_INDEX_TABLE) + "]"
    pred0 = (
        f"({byte(0)} + {byte(1)} * 256 "
        f"- 65536 * (CASE WHEN {byte(1)} >= 128 THEN 1 ELSE 0 END))"
    )
    idx0 = f"({byte(2)} % 89)"
    # nibble consumed at recursion step i (0-based): byte i//2, LOW nibble
    # first — hex char position i+2 when i is even (low nibble = second hex
    # char of the pair), i when i is odd (high nibble = first hex char)
    nb = (
        "(strpos('0123456789abcdef', "
        "substr(h, CASE WHEN i % 2 = 0 THEN i + 2 ELSE i END, 1)) - 1)"
    )
    step = f"({steps}[CAST(idx AS INT) + 1])"
    diff = (
        f"(({step} >> 3)"
        f" + (CASE WHEN ({nb} & 4) != 0 THEN {step} ELSE 0 END)"
        f" + (CASE WHEN ({nb} & 2) != 0 THEN ({step} >> 1) ELSE 0 END)"
        f" + (CASE WHEN ({nb} & 1) != 0 THEN ({step} >> 2) ELSE 0 END))"
    )
    newpred = (
        f"greatest(-32768, least(32767, pred + "
        f"(CASE WHEN ({nb} & 8) != 0 THEN -{diff} ELSE {diff} END)))"
    )
    newidx = f"greatest(0, least(88, idx + {idxs}[CAST({nb} AS INT) + 1]))"
    n_nibbles = IMA_SAMPLES_PER_BLOCK - 1
    finals = " UNION ALL ".join(
        [
            "SELECT doc_id, 'ima' AS media, 'mean_amp' AS metric, "
            f"round(total / {IMA_SAMPLES_PER_BLOCK}.0, 6) AS value FROM walk WHERE i = {n_nibbles}",
            "SELECT doc_id, 'ima' AS media, 'last_amp' AS metric, "
            f"round(CAST(pred AS DOUBLE), 6) AS value FROM walk WHERE i = {n_nibbles}",
            "SELECT doc_id, 'ima' AS media, 'channels' AS metric, CAST(1 AS DOUBLE) AS value FROM m",
            "SELECT doc_id, 'ima' AS media, 'sample_rate' AS metric, "
            f"CAST({WAV_RATE} AS DOUBLE) AS value FROM m",
            "SELECT doc_id, 'ima' AS media, 'n_samples' AS metric, "
            f"CAST({IMA_SAMPLES_PER_BLOCK} AS DOUBLE) AS value FROM m",
        ]
    )
    return f"""
WITH RECURSIVE m AS (SELECT doc_id, md5(text) AS h FROM documents),
walk AS (
  SELECT doc_id, h, 0 AS i,
         CAST({pred0} AS BIGINT) AS pred,
         CAST({idx0} AS BIGINT) AS idx,
         CAST({pred0} AS DOUBLE) AS total
  FROM m
  UNION ALL
  SELECT doc_id, h, i + 1,
         CAST({newpred} AS BIGINT),
         CAST({newidx} AS BIGINT),
         total + {newpred}
  FROM walk WHERE i < {n_nibbles}
)
SELECT * FROM ({finals}) ORDER BY doc_id, media, metric
"""


def bmp_decode_oracle() -> str:
    """Twin of the BMP decode pipeline (multimodal.attach_bmp_payload →
    parse_bmp via the decode_image dispatcher): the 3x2 24bpp body lays
    digest bytes as padded BGR rows (stride 12, 9 used), so each decoded
    channel's mean is a closed form over six specific digest bytes — a
    stride, padding, or BGR-order bug on either side diverges the means.
    The bottom-up flip is mean-invariant by construction; pytest's
    top-down round-trips cover it."""
    from pgvectorscale_spark.operators.multimodal import BMP_H, BMP_W

    assert (BMP_W, BMP_H) == (3, 2), "oracle mirrors the synth geometry"

    def nib(pos: int) -> str:
        return f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"

    def byte(j: int) -> str:  # 0-based BODY byte -> digest byte (24 = 16 + 8)
        j %= 16
        return f"({nib(2 * j + 1)} * 16 + {nib(2 * j + 2)})"

    stride = 12
    rows = []
    # decoded channel c (RGB) reads body bytes row*stride + 3*px + (2 - c)
    for name, c in (("mean_r", 0), ("mean_g", 1), ("mean_b", 2)):
        terms = [
            byte(r * stride + 3 * px + (2 - c))
            for r in range(BMP_H)
            for px in range(BMP_W)
        ]
        rows.append(
            f"SELECT doc_id, 'bmp' AS media, '{name}' AS metric, "
            f"round(({' + '.join(terms)}) / {len(terms)}.0, 6) AS value FROM m"
        )
    for name, val in (("width", BMP_W), ("height", BMP_H), ("channels", 3)):
        rows.append(
            f"SELECT doc_id, 'bmp' AS media, '{name}' AS metric, "
            f"CAST({val} AS DOUBLE) AS value FROM m"
        )
    union = " UNION ALL ".join(rows)
    return f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents)
SELECT * FROM ({union}) ORDER BY doc_id, media, metric
"""


def tga_decode_oracle() -> str:
    """Twin of the TGA decode pipeline (multimodal.attach_tga_payload →
    parse_tga): a 5x2 24bpp top-down type-10 stream with one RAW packet
    (5 digest-BGR pixels: px j = B b_{3j}, G b_{3j+1}, R b_{3j+2}) and one
    RLE run (5 x (B b15, G b0, R b1)), so each channel mean is
    (sum of its 5 raw bytes + 5 * its run byte) / 10 — a packet-kind,
    count-bias, BGR-order, or truncation bug on either side diverges."""
    from pgvectorscale_spark.operators.multimodal import TGA_H, TGA_W

    assert (TGA_W, TGA_H) == (5, 2), "oracle mirrors the synth geometry"

    def nib(pos: int) -> str:
        return f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"

    def byte(j: int) -> str:
        j %= 16
        return f"({nib(2 * j + 1)} * 16 + {nib(2 * j + 2)})"

    rows = []
    # decoded channel c (RGB) reads raw-packet byte 3*px + (2 - c); the
    # run pixel's channels are (R, G, B) = (b1, b0, b15)
    for name, c, run_b in (("mean_r", 0, 1), ("mean_g", 1, 0), ("mean_b", 2, 15)):
        terms = [byte(3 * px + (2 - c)) for px in range(TGA_W)]
        rows.append(
            f"SELECT doc_id, 'tga' AS media, '{name}' AS metric, "
            f"round(({' + '.join(terms)} + 5 * {byte(run_b)}) / 10.0, 6) "
            "AS value FROM m"
        )
    for name, val in (("width", TGA_W), ("height", TGA_H), ("channels", 3)):
        rows.append(
            f"SELECT doc_id, 'tga' AS media, '{name}' AS metric, "
            f"CAST({val} AS DOUBLE) AS value FROM m"
        )
    union = " UNION ALL ".join(rows)
    return f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents)
SELECT * FROM ({union}) ORDER BY doc_id, media, metric
"""


def tiff_decode_oracle() -> str:
    """Twin of the PackBits-TIFF decode pipeline (tiff.attach_tiff_payload
    → tiff.parse_tiff via the magic dispatcher): a 6x2 little-endian 8-bit
    grayscale file whose ONE strip holds a literal packet (digest bytes
    b0..b5, row 0) and a repeat packet (6 x b6, row 1), so the gray mean —
    reported in all three channel slots — is (b0+..+b5 + 6*b6)/12. A
    header-walk, IFD-value, packet-kind, count-bias or strip-assembly bug
    on either side diverges."""
    from pgvectorscale_spark.operators.tiff import TIFF_H, TIFF_W

    assert (TIFF_W, TIFF_H) == (6, 2), "oracle mirrors the synth geometry"

    def nib(pos: int) -> str:
        return f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"

    def byte(j: int) -> str:
        return f"({nib(2 * j + 1)} * 16 + {nib(2 * j + 2)})"

    mean = (
        f"round(({' + '.join(byte(j) for j in range(6))} + 6 * {byte(6)}) "
        "/ 12.0, 6)"
    )
    rows = [
        f"SELECT doc_id, 'tiff' AS media, '{name}' AS metric, {mean} AS value FROM m"
        for name in ("mean_r", "mean_g", "mean_b")
    ] + [
        f"SELECT doc_id, 'tiff' AS media, '{name}' AS metric, "
        f"CAST({val} AS DOUBLE) AS value FROM m"
        for name, val in (("width", TIFF_W), ("height", TIFF_H), ("channels", 1))
    ]
    union = " UNION ALL ".join(rows)
    return f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents)
SELECT * FROM ({union}) ORDER BY doc_id, media, metric
"""


def tiff_lzw_decode_oracle() -> str:
    """Twin of the LZW-TIFF decode pipeline (tiff.attach_tiff_lzw_payload
    → tiff.parse_tiff): big-endian 4x2 flat gray files whose strips were
    genuinely LZW-encoded at SQL-build time; the digest's first hex char
    picks the gray level nib*17, so every channel mean IS that value. An
    MSB-bit-order, early-change, KwKwK or byte-order bug on either side
    diverges."""
    from pgvectorscale_spark.operators.tiff import TIFF_LZW_H, TIFF_LZW_W

    nib = "(strpos('0123456789abcdef', substr(h, 1, 1)) - 1)"
    rows = [
        f"SELECT doc_id, 'tiff_lzw' AS media, '{name}' AS metric, "
        f"round({nib} * 17.0, 6) AS value FROM m"
        for name in ("mean_r", "mean_g", "mean_b")
    ] + [
        f"SELECT doc_id, 'tiff_lzw' AS media, '{name}' AS metric, "
        f"CAST({val} AS DOUBLE) AS value FROM m"
        for name, val in (
            ("width", TIFF_LZW_W),
            ("height", TIFF_LZW_H),
            ("channels", 1),
        )
    ]
    union = " UNION ALL ".join(rows)
    return f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents)
SELECT * FROM ({union}) ORDER BY doc_id, media, metric
"""


def pcx_decode_oracle() -> str:
    """Twin of the PCX decode pipeline (pcx.attach_pcx_payload → parse_pcx
    via the magic dispatcher): a 4x2 24-bit planar RLE file — row 0 is
    three 4-byte runs (plane p = digest byte b_p), row 1 is twelve
    literals (plane p byte k = b_{3+4p+k} % 192), so
    mean_c = (4*b_c + sum_k b_{3+4c+k} % 192) / 8. A run-flag, count-mask,
    plane-interleave or literal-threshold bug on either side diverges."""
    from pgvectorscale_spark.operators.pcx import PCX_H, PCX_W

    assert (PCX_W, PCX_H) == (4, 2), "oracle mirrors the synth geometry"

    def nib(pos: int) -> str:
        return f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"

    def byte(j: int) -> str:
        return f"({nib(2 * j + 1)} * 16 + {nib(2 * j + 2)})"

    rows = []
    for c, name in enumerate(("mean_r", "mean_g", "mean_b")):
        lits = " + ".join(f"({byte(3 + 4 * c + k)} % 192)" for k in range(4))
        rows.append(
            f"SELECT doc_id, 'pcx' AS media, '{name}' AS metric, "
            f"round((4 * {byte(c)} + {lits}) / 8.0, 6) AS value FROM m"
        )
    rows += [
        f"SELECT doc_id, 'pcx' AS media, '{name}' AS metric, "
        f"CAST({val} AS DOUBLE) AS value FROM m"
        for name, val in (("width", PCX_W), ("height", PCX_H), ("channels", 3))
    ]
    union = " UNION ALL ".join(rows)
    return f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents)
SELECT * FROM ({union}) ORDER BY doc_id, media, metric
"""


def pnm_decode_oracle() -> str:
    """Twin of the PGM/PBM decode pipeline (multimodal.attach_pgm_payload /
    attach_pbm_payload → parse_pnm via the dispatcher): PGM's gray mean is
    the average of all 16 digest bytes; PBM packs the first two digest
    bytes MSB-first with 1 = black = 0, so its mean is 255 * zero-bit
    fraction (bit_count replays the popcount on both engines)."""
    from pgvectorscale_spark.operators.multimodal import PNM_H, PNM_W

    assert (PNM_W, PNM_H) == (8, 2), "oracle mirrors the synth geometry"

    def byte(j: int) -> str:
        pos = 2 * j + 1
        return (
            f"((strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1) * 16"
            f" + (strpos('0123456789abcdef', substr(h, {pos + 1}, 1)) - 1))"
        )

    gray = f"round(({' + '.join(byte(j) for j in range(16))}) / 16.0, 6)"
    ones = f"(bit_count({byte(0)}) + bit_count({byte(1)}))"
    pbm = f"round(255.0 * (16 - {ones}) / 16.0, 6)"
    rows = []
    for media, mean in (("pgm", gray), ("pbm", pbm)):
        rows += [
            f"SELECT doc_id, '{media}' AS media, '{name}' AS metric, "
            f"{mean} AS value FROM m"
            for name in ("mean_r", "mean_g", "mean_b")
        ]
        rows += [
            f"SELECT doc_id, '{media}' AS media, '{name}' AS metric, "
            f"CAST({val} AS DOUBLE) AS value FROM m"
            for name, val in (("width", PNM_W), ("height", PNM_H), ("channels", 1))
        ]
    union = " UNION ALL ".join(rows)
    return f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents)
SELECT * FROM ({union}) ORDER BY doc_id, media, metric
"""


def ico_decode_oracle() -> str:
    """Twin of the ICO decode pipeline (ico.attach_ico_payload → parse_ico
    via the magic dispatcher): one 4x2 32bpp DIB whose 8 bottom-up BGRA
    pixels are md5(text) then md5(text || ':ico'), so channel c's mean
    averages bytes 4j+(2-c... BGRA: R=4j+2, G=4j+1, B=4j) across both
    digests. A direction, doubled-height, or BGRA-order bug diverges."""
    from pgvectorscale_spark.operators.ico import ICO_H, ICO_W

    assert (ICO_W, ICO_H) == (4, 2), "oracle mirrors the synth geometry"

    def byte(col: str, j: int) -> str:
        pos = 2 * j + 1
        return (
            f"((strpos('0123456789abcdef', substr({col}, {pos}, 1)) - 1) * 16"
            f" + (strpos('0123456789abcdef', substr({col}, {pos + 1}, 1)) - 1))"
        )

    rows = []
    for name, cofs in (("mean_r", 2), ("mean_g", 1), ("mean_b", 0)):
        terms = [byte(col, 4 * j + cofs) for col in ("h1", "h2") for j in range(4)]
        rows.append(
            f"SELECT doc_id, 'ico' AS media, '{name}' AS metric, "
            f"round(({' + '.join(terms)}) / 8.0, 6) AS value FROM m"
        )
    rows += [
        f"SELECT doc_id, 'ico' AS media, '{name}' AS metric, "
        f"CAST({val} AS DOUBLE) AS value FROM m"
        for name, val in (("width", ICO_W), ("height", ICO_H), ("channels", 4))
    ]
    union = " UNION ALL ".join(rows)
    return f"""
WITH m AS (SELECT doc_id, md5(text) AS h1, md5(text || ':ico') AS h2 FROM documents)
SELECT * FROM ({union}) ORDER BY doc_id, media, metric
"""


def ras_decode_oracle() -> str:
    """Twin of the Sun Raster decode pipeline (sunras.attach_ras_payload →
    parse_ras via the magic dispatcher): a 5x2 24-bit type-1 BGR file with
    16-bit row padding; row r's pixels are digest bytes of md5(text) /
    md5(text || ':ras'), so channel c's mean averages bytes 3j+(2-c) of
    both digests. A byte-order, BGR, or pad bug diverges."""
    from pgvectorscale_spark.operators.sunras import RAS_H, RAS_W

    assert (RAS_W, RAS_H) == (5, 2), "oracle mirrors the synth geometry"

    def byte(col: str, j: int) -> str:
        pos = 2 * j + 1
        return (
            f"((strpos('0123456789abcdef', substr({col}, {pos}, 1)) - 1) * 16"
            f" + (strpos('0123456789abcdef', substr({col}, {pos + 1}, 1)) - 1))"
        )

    rows = []
    for name, cofs in (("mean_r", 2), ("mean_g", 1), ("mean_b", 0)):
        terms = [byte(col, 3 * j + cofs) for col in ("h1", "h2") for j in range(RAS_W)]
        rows.append(
            f"SELECT doc_id, 'ras' AS media, '{name}' AS metric, "
            f"round(({' + '.join(terms)}) / 10.0, 6) AS value FROM m"
        )
    rows += [
        f"SELECT doc_id, 'ras' AS media, '{name}' AS metric, "
        f"CAST({val} AS DOUBLE) AS value FROM m"
        for name, val in (("width", RAS_W), ("height", RAS_H), ("channels", 3))
    ]
    union = " UNION ALL ".join(rows)
    return f"""
WITH m AS (SELECT doc_id, md5(text) AS h1, md5(text || ':ras') AS h2 FROM documents)
SELECT * FROM ({union}) ORDER BY doc_id, media, metric
"""


def qoi_decode_oracle() -> str:
    """Twin of the QOI decode pipeline (multimodal.attach_qoi_payload →
    qoi.parse_qoi via the decode_image dispatcher). The 20x2 synth stream
    exercises every op; the decoded pixels have closed forms over the
    digest bytes:

      p0 = p1 = (10, 20, 30)            explicit RGB + INDEX readback
      p_{2+j} = (b_j, b_{j+1}, b_{j+2}) 16 explicit RGB, rotated bytes
      p18 = p19 = p17 + 1 mod 256       DIFF(+1,+1,+1) then zero LUMA
      p20..p39 = p18                    RUN 20

    so mean_r = (20 + sum(b) + 22*((b15+1) mod 256)) / 40 and the g/b
    twins rotate to b0/b1 — an index-hash, bias, wraparound, or run-length
    bug on either side diverges the channel means."""
    from pgvectorscale_spark.operators.multimodal import QOI_H, QOI_W

    assert (QOI_W, QOI_H) == (20, 2), "oracle mirrors the synth geometry"

    def nib(pos: int) -> str:
        return f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"

    def byte(j: int) -> str:
        j %= 16
        return f"({nib(2 * j + 1)} * 16 + {nib(2 * j + 2)})"

    n_px = QOI_W * QOI_H
    all_bytes = " + ".join(byte(j) for j in range(16))
    rows = []
    for name, fixed, wrap_j in (("mean_r", 10, 15), ("mean_g", 20, 0), ("mean_b", 30, 1)):
        wrapped = f"(({byte(wrap_j)} + 1) % 256)"
        rows.append(
            f"SELECT doc_id, 'qoi' AS media, '{name}' AS metric, "
            f"round((2 * {fixed} + {all_bytes} + 22 * {wrapped}) / {n_px}.0, 6) "
            "AS value FROM m"
        )
    for name, val in (("width", QOI_W), ("height", QOI_H), ("channels", 3)):
        rows.append(
            f"SELECT doc_id, 'qoi' AS media, '{name}' AS metric, "
            f"CAST({val} AS DOUBLE) AS value FROM m"
        )
    union = " UNION ALL ".join(rows)
    return f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents)
SELECT * FROM ({union}) ORDER BY doc_id, media, metric
"""


def aiff_decode_oracle() -> str:
    """Twin of the AIFF decode pipeline (multimodal.attach_aiff_payload →
    parse_aiff): digest bytes tile as BIG-endian PCM16 samples, so each
    amplitude is byte(2j)*256 + byte(2j+1) sign-extended — the byte-order
    mirror of the WAV PCM16 oracle; an endianness, chunk-walk, f80-rate,
    or SSND-offset bug on either side diverges the hash."""
    from pgvectorscale_spark.operators.multimodal import WAV_RATE, WAV_TILE

    def nib(pos: int) -> str:
        return f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"

    def byte(j: int) -> str:
        return f"({nib(2 * j + 1)} * 16 + {nib(2 * j + 2)})"

    def samp(j: int) -> str:  # big-endian int16 from digest bytes 2j, 2j+1
        hi, lo = byte(2 * j), byte(2 * j + 1)
        return (
            f"({hi} * 256 + {lo} - 65536 * (CASE WHEN {hi} >= 128 THEN 1 ELSE 0 END))"
        )

    terms = [samp(j) for j in range(8)]
    n_samples = 8 * WAV_TILE
    rows = [
        "SELECT doc_id, 'aiff' AS media, 'mean_amp' AS metric, "
        f"round(({' + '.join(terms)}) / 8.0, 6) AS value FROM m",
        "SELECT doc_id, 'aiff' AS media, 'last_amp' AS metric, "
        f"round(CAST({samp(7)} AS DOUBLE), 6) AS value FROM m",
        "SELECT doc_id, 'aiff' AS media, 'channels' AS metric, CAST(1 AS DOUBLE) AS value FROM m",
        "SELECT doc_id, 'aiff' AS media, 'sample_rate' AS metric, "
        f"CAST({WAV_RATE} AS DOUBLE) AS value FROM m",
        "SELECT doc_id, 'aiff' AS media, 'n_samples' AS metric, "
        f"CAST({n_samples} AS DOUBLE) AS value FROM m",
    ]
    union = " UNION ALL ".join(rows)
    return f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents)
SELECT * FROM ({union}) ORDER BY doc_id, media, metric
"""


def flac_decode_oracle() -> str:
    """Twin of the FLAC sample-decode pipeline (flac.attach_flac_payload →
    parse_flac → decode_flac_audio): digest nibble 1 draws frame 1's
    CONSTANT value v = 128*(16*nib+8) and nibble 2 the FIXED-order-1 ramp
    step s (warmup 0, residuals all s through a real Rice partition), so
    the decoded stream is 64 samples of v then the ramp 0, s, ..., 63s —
    mean (v + 63s/2)/2, last 63s, all exact in double. A Rice, predictor,
    CRC, or frame-walk bug on either side breaks the hash."""
    from pgvectorscale_spark.operators.flac import FLAC_BLOCK, FLAC_RATE

    assert FLAC_BLOCK == 64, "oracle mirrors the synth geometry"

    def nib(pos: int) -> str:
        return f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"

    v = f"(128.0 * (16 * {nib(1)} + 8))"
    s = f"(16 * {nib(2)} + 8)"
    rows = [
        f"SELECT doc_id, 'flac' AS media, 'mean_amp' AS metric, "
        f"(({v}) + 63 * ({s}) / 2.0) / 2.0 AS value FROM m",
        f"SELECT doc_id, 'flac' AS media, 'last_amp' AS metric, "
        f"CAST(63 * {s} AS DOUBLE) AS value FROM m",
        "SELECT doc_id, 'flac' AS media, 'channels' AS metric, CAST(1 AS DOUBLE) AS value FROM m",
        "SELECT doc_id, 'flac' AS media, 'sample_rate' AS metric, "
        f"CAST({FLAC_RATE} AS DOUBLE) AS value FROM m",
        "SELECT doc_id, 'flac' AS media, 'n_samples' AS metric, "
        f"CAST(2 * {FLAC_BLOCK} AS DOUBLE) AS value FROM m",
    ]
    union = " UNION ALL ".join(rows)
    return f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents)
SELECT * FROM ({union}) ORDER BY doc_id, media, metric
"""


def webp_decode_oracle() -> str:
    """Twin of the lossless-WebP decode pipeline (vp8l.attach_webp_payload
    → parse_webp via the decode_image dispatcher): each payload is a
    genuine VP8L file whose 10x10 frame checkers between 16*nib+8 and
    16*nib+12 through NORMAL (code-length-coded) prefix codes, rows >= 2
    riding LZ77 backward references at NEAR-distance code 5 = offset
    (0, 2), so every decoded channel mean IS 16*nib+10 — a bit-order,
    canonical-assignment, zero-run, RIFF-walk, or near-distance-map bug
    on either side breaks the hash."""
    from pgvectorscale_spark.operators.vp8l import WEBP_DIM

    def nib(pos: int) -> str:
        return f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"

    val = f"CAST(16 * {nib(1)} + 10 AS DOUBLE)"
    rows = [
        f"SELECT doc_id, 'webp' AS media, '{m}' AS metric, {val} AS value FROM m"
        for m in ("mean_r", "mean_g", "mean_b")
    ] + [
        f"SELECT doc_id, 'webp' AS media, '{name}' AS metric, "
        f"CAST({v} AS DOUBLE) AS value FROM m"
        for name, v in (("width", WEBP_DIM), ("height", WEBP_DIM), ("channels", 4))
    ]
    union = " UNION ALL ".join(rows)
    return f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents)
SELECT * FROM ({union}) ORDER BY doc_id, media, metric
"""


def gif_decode_oracle() -> str:
    """Twin of the GIF decode pipeline (gif.attach_gif_payload → parse_gif
    via the decode_image dispatcher): each payload is a genuine GIF89a
    whose full-canvas frame is the flat gray 16*nib+8, LZW-encoded once at
    SQL-construction time, so every decoded channel mean IS that value —
    a color-table, LZW, sub-block, or interlace-flag bug on either side
    breaks the hash."""
    from pgvectorscale_spark.operators.gif import GIF_DIM

    def nib(pos: int) -> str:
        return f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"

    val = f"CAST(16 * {nib(1)} + 8 AS DOUBLE)"
    rows = [
        f"SELECT doc_id, 'gif' AS media, '{m}' AS metric, {val} AS value FROM m"
        for m in ("mean_r", "mean_g", "mean_b")
    ] + [
        f"SELECT doc_id, 'gif' AS media, '{name}' AS metric, "
        f"CAST({v} AS DOUBLE) AS value FROM m"
        for name, v in (("width", GIF_DIM), ("height", GIF_DIM), ("channels", 3))
    ]
    union = " UNION ALL ".join(rows)
    return f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents)
SELECT * FROM ({union}) ORDER BY doc_id, media, metric
"""


def f32_wav_decode_oracle() -> str:
    """Twin of the float32-WAV decode (multimodal.attach_float_wav_payload
    → parse_wav format-tag-3 branch): each digest nibble encodes the
    float32 (nib - 7.5)/8 — exact in binary and never a .5 boundary after
    the conventional round(x*32767) int16 mapping, so numpy's rint and
    SQL's round agree bit-for-bit and the oracle replays the mapping in
    closed form."""
    from pgvectorscale_spark.operators.multimodal import (
        F32_WAV_N_SAMPLES,
        WAV_RATE,
    )

    def nib(pos: int) -> str:
        return f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"

    def amp(pos: int) -> str:
        return f"round(({nib(pos)} - 7.5) / 8.0 * 32767)"

    terms = [amp(k) for k in range(1, F32_WAV_N_SAMPLES + 1)]
    rows = [
        "SELECT doc_id, 'f32' AS media, 'mean_amp' AS metric, "
        f"round(({' + '.join(terms)}) / {F32_WAV_N_SAMPLES}.0, 6) AS value FROM m",
        "SELECT doc_id, 'f32' AS media, 'last_amp' AS metric, "
        f"round(CAST({amp(F32_WAV_N_SAMPLES)} AS DOUBLE), 6) AS value FROM m",
        "SELECT doc_id, 'f32' AS media, 'channels' AS metric, CAST(1 AS DOUBLE) AS value FROM m",
        "SELECT doc_id, 'f32' AS media, 'sample_rate' AS metric, "
        f"CAST({WAV_RATE} AS DOUBLE) AS value FROM m",
        "SELECT doc_id, 'f32' AS media, 'n_samples' AS metric, "
        f"CAST({F32_WAV_N_SAMPLES} AS DOUBLE) AS value FROM m",
    ]
    union = " UNION ALL ".join(rows)
    return f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents)
SELECT * FROM ({union}) ORDER BY doc_id, media, metric
"""


def h264_decode_oracle() -> str:
    """Twin of the H.264 I-frame PIXEL-decode pipeline
    (h264.attach_h264_payload → parse_h264_picture → decode_h264_picture):
    the synthesized stream carries two genuine 16x32 IDR pictures; the
    first one's top macroblock is I_PCM carrying the digest nibbles as
    luma bytes (16*nib + 8, even rows = digest half A, odd rows = half B)
    and its bottom macroblock is I_16x16 VERTICAL prediction (copies MB0's
    bottom row — half B) with chroma DC over the 0x80 PCM chroma; the
    second is all-DC (multi-picture walk, fixed content). Every decoded
    metric therefore has a closed form over the digest hex, exact in
    double arithmetic (the only division is by 512). A NAL-walk,
    Exp-Golomb, PCM-alignment, coeff_token, prediction or reconstruction
    bug on either side diverges the means/corners and fails the hash."""

    def nib(pos: int) -> str:  # 1-based hex-char position -> nibble value
        return f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"

    sum_a = "(" + " + ".join(nib(k) for k in range(1, 17)) + ")"
    sum_b = "(" + " + ".join(nib(k) for k in range(17, 33)) + ")"
    # MB0 luma sum = 128*(sumA+sumB) + 2048; MB1 = V-pred of row B:
    # 256*sumB + 2048; frame mean over 512 samples
    mean_y = f"((128 * {sum_a} + 384 * {sum_b} + 4096) / 512.0)"
    rows = [
        f"SELECT doc_id, 'h264' AS media, 'mean_y' AS metric, {mean_y} AS value FROM m",
        "SELECT doc_id, 'h264' AS media, 'mean_cb' AS metric, CAST(128 AS DOUBLE) AS value FROM m",
        "SELECT doc_id, 'h264' AS media, 'mean_cr' AS metric, CAST(128 AS DOUBLE) AS value FROM m",
        f"SELECT doc_id, 'h264' AS media, 'y00' AS metric, CAST(16 * {nib(1)} + 8 AS DOUBLE) AS value FROM m",
        f"SELECT doc_id, 'h264' AS media, 'y_last' AS metric, CAST(16 * {nib(32)} + 8 AS DOUBLE) AS value FROM m",
        "SELECT doc_id, 'h264' AS media, 'width' AS metric, CAST(16 AS DOUBLE) AS value FROM m",
        "SELECT doc_id, 'h264' AS media, 'height' AS metric, CAST(32 AS DOUBLE) AS value FROM m",
        "SELECT doc_id, 'h264' AS media, 'n_mbs' AS metric, CAST(2 AS DOUBLE) AS value FROM m",
        "SELECT doc_id, 'h264' AS media, 'n_pictures' AS metric, CAST(2 AS DOUBLE) AS value FROM m",
        "SELECT doc_id, 'h264' AS media, 'n_nal_units' AS metric, CAST(4 AS DOUBLE) AS value FROM m",
    ]
    union = " UNION ALL ".join(rows)
    return f"""
WITH m AS (SELECT doc_id, md5(text) AS h FROM documents)
SELECT * FROM ({union}) ORDER BY doc_id, media, metric
"""


def pack_sequences_oracle(window_tokens: int) -> str:
    """Twin of packing.pack_sequences over documents: the distributed
    two-phase prefix sum must equal the plain global running total."""
    from pgvectorscale_spark.functions.text import token_count_sql
    from pgvectorscale_spark.functions.hashing import DUCKDB

    tc = token_count_sql("text", DUCKDB)
    return f"""
WITH tc AS (SELECT doc_id, ({tc})::BIGINT AS token_count FROM documents),
c AS (SELECT doc_id, token_count,
             sum(token_count) OVER (ORDER BY doc_id) AS cum FROM tc)
SELECT doc_id, token_count,
       ((cum - token_count) // {window_tokens})::BIGINT AS bin_id,
       ((cum - token_count) % {window_tokens})::BIGINT AS bin_offset
FROM c ORDER BY doc_id
"""


def stratified_sample_oracle(
    strata_col: str, n_per_stratum: int, salt: str = "sample"
) -> str:
    """Twin of curation.stratified_sample projected to (doc_id, split):
    exact n-per-stratum by md5-hash order, replayed as a plain window —
    the salted two-phase Spark form must produce the identical row set."""

    def q(s: str) -> str:
        return str(s).replace("'", "''")

    key = f"md5(concat('{q(salt)}:', cast(doc_id AS VARCHAR)))"
    return f"""
SELECT doc_id, {strata_col} AS split FROM (
  SELECT doc_id, {strata_col},
         row_number() OVER (PARTITION BY {strata_col} ORDER BY {key}, doc_id) AS rn
  FROM documents
) WHERE rn <= {int(n_per_stratum)}
ORDER BY doc_id
"""


def temperature_resample_oracle(
    strata_col: str, temperature: int, total_n: int, salt: str = "mix"
) -> str:
    """Twin of curation.temperature_resample at an INTEGER temperature
    (projected to (doc_id, split)): per-stratum targets by exact-bigint
    largest remainder (floors = total_n*c^T // Σc^T, remainders by the
    modulo, ties on stratum name ascending, capped at the stratum size),
    then the md5-hash-order window cut at each stratum's own target —
    both the apportionment arithmetic and the selection must reproduce
    the Spark side exactly."""
    t = int(temperature)
    if t < 1:
        raise ValueError("the SQL twin replays integer temperatures only")
    w_expr = " * ".join(["c"] * t)

    def q(s: str) -> str:
        return str(s).replace("'", "''")

    key = f"md5(concat('{q(salt)}:', cast(doc_id AS VARCHAR)))"
    return f"""
WITH c AS (
  SELECT {strata_col} AS s, count(*)::BIGINT AS c FROM documents
  WHERE {strata_col} IS NOT NULL GROUP BY {strata_col}),
w AS (SELECT s, c, {w_expr} AS w FROM c),
tot AS (SELECT sum(w) AS tw FROM w),
parts AS (
  SELECT s, c, ({total_n} * w) // tw AS fl, ({total_n} * w) % tw AS rem
  FROM w, tot),
lef AS (SELECT {total_n} - sum(fl) AS l FROM parts),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, s ASC) AS rk FROM parts),
tgt AS (
  SELECT s, least(c, fl + CASE WHEN rk <= (SELECT l FROM lef) THEN 1 ELSE 0 END) AS n
  FROM ranked),
r AS (
  SELECT doc_id, {strata_col} AS s,
         row_number() OVER (PARTITION BY {strata_col} ORDER BY {key}, doc_id) AS rn
  FROM documents WHERE {strata_col} IS NOT NULL)
SELECT doc_id, s AS split FROM r JOIN tgt USING (s) WHERE rn <= n
ORDER BY doc_id
"""


def epoch_expand_oracle(
    strata_col: str,
    epochs: dict,
    default_epoch: float = 1.0,
    salt: str = "epoch",
) -> str:
    """Twin of curation.epoch_expand projected to (doc_id, split =
    stratum ':' copy): floor(e) copies for every row plus one more for
    the first round(frac*count) rows in md5-hash order. Epoch literals
    must be binary-exact fractions so floor(frac*c + 0.5) is the same
    double arithmetic in both engines."""

    def q(s: str) -> str:
        return str(s).replace("'", "''")

    cases = " ".join(
        f"WHEN '{q(s)}' THEN {float(e)!r}::DOUBLE" for s, e in sorted(epochs.items())
    )
    ep = f"CASE {strata_col} {cases} ELSE {float(default_epoch)!r}::DOUBLE END"
    key = f"md5(concat('{q(salt)}:', cast(doc_id AS VARCHAR)))"
    return f"""
WITH c AS (
  SELECT {strata_col} AS s, count(*)::BIGINT AS c, {ep} AS ep
  FROM documents WHERE {strata_col} IS NOT NULL GROUP BY {strata_col}),
p AS (
  SELECT s, CAST(floor(ep) AS BIGINT) AS base,
         CAST(floor((ep - floor(ep)) * c + 0.5) AS BIGINT) AS extra
  FROM c),
r AS (
  SELECT doc_id, {strata_col} AS s,
         row_number() OVER (PARTITION BY {strata_col} ORDER BY {key}, doc_id) AS rn
  FROM documents WHERE {strata_col} IS NOT NULL),
n AS (
  SELECT doc_id, s, base + CASE WHEN rn <= extra THEN 1 ELSE 0 END AS n
  FROM r JOIN p USING (s))
SELECT doc_id, s || ':' || copy AS split
FROM (SELECT doc_id, s, unnest(generate_series(1, n)) AS copy FROM n WHERE n >= 1)
ORDER BY doc_id, split
"""


def hash_split_oracle(
    weights: dict[str, float], salt: str = "split", resolution: int = 1_000_000
) -> str:
    """Twin of packing.hash_split: identical md5-h60 bucket and identical
    cumulative thresholds, so assignment reproduces exactly. Salt and split
    labels are quote-doubled before interpolation (same escaping — and so
    same string VALUES — as the Spark side)."""
    from pgvectorscale_spark.functions.hashing import DUCKDB, h60

    if not weights:
        raise ValueError("hash_split_oracle: weights must name at least one split")

    def q(s: str) -> str:
        return str(s).replace("'", "''")

    salted = f"concat('{q(salt)}:', cast(doc_id AS VARCHAR))"
    bucket = f"({h60(salted, DUCKDB)}) % {resolution}"
    total = float(sum(weights.values()))
    items = list(weights.items())
    acc, cases = 0.0, []
    for name, w in items[:-1]:
        acc += float(w) / total
        cases.append(f"WHEN b < {int(acc * resolution)} THEN '{q(name)}'")
    last = f"'{q(items[-1][0])}'"
    # single-split degenerate form: a CASE with no WHEN arms is invalid SQL
    case = ("CASE " + " ".join(cases) + f" ELSE {last} END") if cases else last
    return f"""
WITH b AS (SELECT doc_id, {bucket} AS b FROM documents)
SELECT doc_id, {case} AS split FROM b ORDER BY doc_id
"""
