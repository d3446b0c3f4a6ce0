"""vs.sql() — the SQL surface for ANN queries (SURVEY M7).

The reference's only user interface is SQL: ``ORDER BY embedding <=> $q
LIMIT k`` is recognized by the planner through the distance opclasses and
``amcostestimate`` and becomes an index scan
(/root/reference/pgvectorscale/src/access_method/mod.rs:207-263,
cost_estimate.rs:6-50). Spark has no Python hook for custom Catalyst
strategies, so the same contract is a thin SQL front-end:

1. The pgvector operator spellings ``<=>`` (cosine), ``<->`` (L2),
   ``<#>`` (inner product) and bracket vector literals ``[0.1, 0.2]``
   are rewritten into built-in higher-order-function SQL
   (functions/distance.py *_sql builders) — every query stays fully
   declarative and JVM-side whether or not an index exists.
2. If the statement ends in the ANN shape
   ``ORDER BY <dist>(col, <vector literal>) [ASC] LIMIT k``
   over a table with a registered index on that column (the
   CREATE INDEX analog), the scan is routed to the index:
   ``index.search_batch`` produces (node_id, distance) candidates, the
   row set joins back to the table for the residual columns, and any
   residual WHERE runs as a post-filter with an over-fetch + refill loop
   (k' = k x epsilon, retried geometrically) so arbitrarily selective
   predicates still yield k rows — the reference's amgettuple "stream
   more results" semantics (/root/reference/README.md:291-303,
   scan.rs:370-436).
3. Everything else falls through to ``spark.sql`` after step 1's rewrite.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgvectorscale_spark.functions.distance import distance_sql

__all__ = ["VectorSql"]

_OP_TO_DTYPE = {"<=>": "cosine", "<->": "l2", "<#>": "inner_product"}
_FN_TO_DTYPE = {
    "cosine_distance": "cosine",
    "l2_distance": "l2",
    "inner_product_distance": "inner_product",
}

# `col <OP> [1.0, 2.0]` or `col <OP> array(1.0, 2.0)` (either operand order)
_VEC_LIT = r"(?:\[[^\]]+\]|array\s*\([^)]+\))"
_IDENT = r"[A-Za-z_][A-Za-z_0-9.]*"
# vector-literal alternative MUST precede the identifier one: regex
# alternation is ordered and _IDENT would otherwise match the bare `array`
_OP_RE = re.compile(
    rf"({_VEC_LIT}|{_IDENT})\s*(<=>|<->|<#>)\s*({_VEC_LIT}|{_IDENT})", re.IGNORECASE
)
# `labels && [1, 2]` / `labels && array(1, 2)` — the S4 overlap operator
# (mod.rs:236-263) becomes the built-in arrays_overlap
_OVERLAP_RE = re.compile(
    rf"({_VEC_LIT}|{_IDENT})\s*&&\s*({_VEC_LIT}|{_IDENT})", re.IGNORECASE
)
_BRACKET_RE = re.compile(r"\[\s*(-?\d[^\]]*)\]")

_ANN_TAIL_RE = re.compile(
    rf"\border\s+by\s+(?P<fn>{'|'.join(_FN_TO_DTYPE)})\s*\(\s*(?P<col>{_IDENT})\s*,\s*"
    r"array\s*\((?P<vec>[^)]+)\)\s*\)\s*(?:asc\s*)?limit\s+(?P<k>\d+)\s*$",
    re.IGNORECASE,
)
_FROM_RE = re.compile(rf"\bfrom\s+(?P<table>{_IDENT})\b", re.IGNORECASE)
# the LATERAL ANN-join shape (round 14) — top-k per row of a QUERY TABLE:
#   SELECT <q>.<qid>, nn.* FROM <qtable> <q>, LATERAL (
#     SELECT <id_col> [AS <a>], <distfn>(<col>, <q>.<qvec>) AS <d>
#     FROM <ctable> ORDER BY <d> [ASC] LIMIT <k>) [AS] nn
_LATERAL_RE = re.compile(
    rf"^\s*select\s+(?P<items>.*?)\bfrom\s+(?P<qtable>{_IDENT})\s+(?:as\s+)?(?P<qalias>\w+)\s*,\s*"
    rf"lateral\s*\(\s*select\s+(?P<inner>.*?)\bfrom\s+(?P<ctable>{_IDENT})\s+"
    rf"order\s+by\s+(?P<ord>\w+)\s*(?:asc\s*)?limit\s+(?P<k>\d+)\s*\)\s*(?:as\s+)?(?P<lalias>\w+)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_WHERE_RE = re.compile(r"\bwhere\b(?P<pred>.*?)(?=\border\s+by\b)", re.IGNORECASE | re.DOTALL)
_SELECT_RE = re.compile(r"^\s*select\s+(?P<items>.*?)\bfrom\b", re.IGNORECASE | re.DOTALL)


@dataclass
class _IndexEntry:
    index: object  # DiskannIndex | SbqFlatIndex | IvfIndex (duck-typed search)
    id_col: str
    search_kwargs: dict  # GUC query-knob analog (S11): e.g. search_list_size
    column: str = ""  # indexed vector column (for the exact-scan fallback)
    min_index_rows: int = 0  # 0 = session conf / default (cost-based routing)
    # memoized corpus count for metadata-less indexes (populated on first
    # predicated query; indexes with meta.num_rows never touch it)
    cached_total: int = 0


def _split_select(items: str) -> list[str]:
    """Split a SELECT list on top-level commas (paren-aware)."""
    out, depth, cur = [], 0, []
    for ch in items:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [x for x in out if x]


class VectorSql:
    """SQL session wrapper: operator rewrite + ANN index routing.

    >>> vs = VectorSql(spark)
    >>> vs.register_table("embeddings", emb_df)
    >>> vs.register_index("embeddings", "embedding", idx, id_col="vec_id")
    >>> vs.sql("SELECT vec_id FROM embeddings ORDER BY embedding <-> [0.1, ...] LIMIT 10")
    """

    OVERFETCH_EPSILON = 2.0  # first fetch = k * epsilon when a post-filter exists
    REFILL_FACTOR = 4  # geometric growth per refill round
    # cost-based routing default (the amcostestimate freedom,
    # cost_estimate.rs:6-50): below this corpus size a single declarative
    # exact scan beats the index's scatter/gather overhead, so the planner
    # skips the index — what Postgres does for tiny tables. The default is
    # deliberately conservative (≤128 rows is one broadcast-sized chunk;
    # beyond that, trust the user's CREATE INDEX): raise it per session
    # (spark.conf `spark.pgvectorscale.min_index_rows`) or per index
    # (register_index(min_index_rows=...)) when exact scans are cheap —
    # `k >= corpus` always routes to the exact scan regardless.
    MIN_INDEX_ROWS = 128

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, DataFrame] = {}
        self._indexes: dict[tuple[str, str], _IndexEntry] = {}

    # -- registration (CREATE INDEX analog) ---------------------------------

    def register_table(self, name: str, df: DataFrame) -> None:
        self._tables[name.lower()] = df
        df.createOrReplaceTempView(name)

    def register_index(
        self, table: str, column: str, index, id_col: str = "vec_id", **search_kwargs
    ) -> None:
        """Attach an ANN index (DiskannIndex / SbqFlatIndex / IvfIndex) to
        (table, column); ORDER BY distance LIMIT k over that column routes
        to it — the AM registration analog (mod.rs:207-263). Extra kwargs
        (e.g. ``search_list_size=200``) pass through to every routed
        ``index.search`` call — the GUC query-knob analog (guc.rs:3-4).
        ``min_index_rows`` is consumed here (not passed to search): corpora
        below it route to the exact scan instead of the index."""
        min_rows = int(search_kwargs.pop("min_index_rows", 0) or 0)
        self._indexes[(table.lower(), column.lower())] = _IndexEntry(
            index, id_col, search_kwargs, column.lower(), min_rows
        )

    # -- rewrite ------------------------------------------------------------

    def _array_columns(self, sql: str | None = None) -> set[str]:
        """Lower-cased names of array-typed columns, scoped to the registered
        tables the query actually references (FROM/JOIN). Pooling across ALL
        registered tables would let a boolean column in one table that shares
        a name with an array column in another be mis-rewritten to
        arrays_overlap. Falls back to every registered table when the query
        references none of them (e.g. a view created outside this wrapper)."""
        scope = None
        if sql is not None:
            refs = {
                m.group("table").lower()
                for m in re.finditer(
                    rf"\b(?:from|join)\s+(?P<table>{_IDENT})\b", sql, re.IGNORECASE
                )
            }
            matched = refs & self._tables.keys()
            if matched:
                scope = matched
        cols: set[str] = set()
        for name, df in self._tables.items():
            if scope is not None and name not in scope:
                continue
            for fld in df.schema.fields:
                if fld.dataType.typeName() == "array":
                    cols.add(fld.name.lower())
        return cols

    def _is_array_operand(self, operand: str, array_cols: set[str]) -> bool:
        if re.match(r"array\s*\(", operand, re.IGNORECASE):
            return True  # vector/array literal ([..] is already rewritten)
        return operand.split(".")[-1].lower() in array_cols

    def _rewrite_ops(self, sql: str) -> str:
        """``a <=> b`` -> ``cosine_distance(a, b)``; ``a && b`` ->
        ``arrays_overlap(a, b)``; ``[1, 2]`` -> ``array(1, 2)``.

        ``&&`` doubles as a logical-AND spelling in several SQL dialects
        (and Spark's parser rejects it outright), so the overlap rewrite
        (S4, mod.rs:236-263) only fires when an operand is provably
        array-shaped: an array literal, or an identifier naming an
        array-typed column of a registered table. Every other ``&&``
        becomes logical ``AND`` — ``flag_a && flag_b`` on boolean columns
        keeps its conjunction meaning instead of mis-evaluating as an
        array overlap.

        Every rewrite runs segment-wise over the quote-aware split, so
        operators, brackets, and ``&&`` inside single-quoted string literals
        are never touched (operands are identifiers or vector literals — a
        match can never legitimately span a literal boundary)."""
        array_cols = self._array_columns(sql)
        fn_names = {"cosine": "cosine_distance", "l2": "l2_distance", "inner_product": "inner_product_distance"}

        def rewrite_segment(seg: str) -> str:
            seg = _BRACKET_RE.sub(lambda m: f"array({m.group(1)})", seg)
            while True:
                m = _OP_RE.search(seg)
                if m is None:
                    break
                fn = fn_names[_OP_TO_DTYPE[m.group(2)]]
                seg = seg[: m.start()] + f"{fn}({m.group(1)}, {m.group(3)})" + seg[m.end() :]
            pos = 0
            while True:
                m = _OVERLAP_RE.search(seg, pos)
                if m is None:
                    break
                a, b = m.group(1), m.group(2)
                if self._is_array_operand(a, array_cols) or self._is_array_operand(b, array_cols):
                    repl = f"arrays_overlap({a}, {b})"
                    seg = seg[: m.start()] + repl + seg[m.end() :]
                    pos = m.start() + len(repl)
                else:
                    pos = m.end()  # logical AND — handled below
            # any && still standing is a conjunction (Spark's parser has no &&)
            return re.sub(r"&&", " AND ", seg)

        parts = re.split(r"('(?:[^']|'')*')", sql)
        return "".join(p if i % 2 else rewrite_segment(p) for i, p in enumerate(parts))

    @staticmethod
    def _expand_distance_fns(sql: str) -> str:
        """Replace named distance calls with built-in higher-order-function
        SQL so the fallback path runs on vanilla spark.sql."""
        pattern = re.compile(
            rf"\b(?P<fn>{'|'.join(_FN_TO_DTYPE)})\s*\(\s*(?P<a>array\s*\([^)]*\)|{_IDENT})\s*,"
            rf"\s*(?P<b>array\s*\([^)]*\)|{_IDENT})\s*\)",
            re.IGNORECASE,
        )
        while True:
            m = pattern.search(sql)
            if m is None:
                return sql
            frag = distance_sql(m.group("a"), m.group("b"), _FN_TO_DTYPE[m.group("fn").lower()])
            sql = sql[: m.start()] + frag + sql[m.end() :]

    # -- execution ----------------------------------------------------------

    def sql(self, query: str) -> DataFrame:
        rewritten = self._rewrite_ops(query.strip().rstrip(";").strip())
        routed = self._try_index_route(rewritten)
        if routed is None:
            routed = self._try_lateral_route(rewritten)
        if routed is not None:
            return routed
        return self.spark.sql(self._expand_distance_fns(rewritten))

    def _try_lateral_route(self, sql: str) -> DataFrame | None:
        """Route the LATERAL top-k-per-query-row shape onto the index's
        corpus x corpus ``ann_join`` (round 14) — the SQL spelling of the
        distributed similarity join:

            SELECT q.qid, nn.* FROM queries q, LATERAL (
              SELECT vec_id, embedding <=> q.qvec AS distance
              FROM corpus ORDER BY distance LIMIT 10) nn

        Routes when (corpus, column) carries a registered index exposing
        ``ann_join`` and the inner SELECT is exactly the id column plus
        the aliased distance expression (the canonical shape; the
        reference has no lateral surface — this is the Spark-native
        extension of its single-query ``ORDER BY distance LIMIT k``
        contract). The query table stays a distributed DataFrame end to
        end. Anything that doesn't match falls through to ``spark.sql``,
        whose lateral-subquery support evaluates the same semantics as a
        decorrelated exact scan — slower, never wrong. The same
        cost/divergence rules as the single-vector route apply (tiny or
        k-covering corpora prefer the exact scan unless the index has
        diverged from the registered table)."""
        m = _LATERAL_RE.match(sql)
        if m is None:
            return None
        qtable, qalias = m.group("qtable").lower(), m.group("qalias")
        ctable, lalias = m.group("ctable").lower(), m.group("lalias")
        qdf = self._tables.get(qtable)
        if qdf is None or self._tables.get(ctable) is None:
            return None
        inner = _split_select(m.group("inner"))
        if len(inner) != 2:
            return None
        # item 1: the corpus id column, optionally aliased
        im = re.match(rf"(?is)^({_IDENT})(?:\s+as\s+(\w+))?$", inner[0])
        if im is None:
            return None
        id_sel, id_alias = im.group(1).lower(), (im.group(2) or im.group(1)).lower()
        # item 2: <fn>(<col>, <qalias>.<qvec>) AS <dalias>
        dm = re.match(
            rf"(?is)^(?P<fn>{'|'.join(_FN_TO_DTYPE)})\s*\(\s*(?P<col>\w+)\s*,\s*"
            rf"(?P<qa>\w+)\.(?P<qvec>\w+)\s*\)\s+as\s+(?P<dalias>\w+)$",
            inner[1],
        )
        if dm is None or dm.group("qa") != qalias:
            return None
        if m.group("ord").lower() != dm.group("dalias").lower():
            return None
        col = dm.group("col").lower()
        entry = self._indexes.get((ctable, col))
        if entry is None or id_sel != entry.id_col.lower():
            return None
        if not hasattr(entry.index, "ann_join"):
            return None
        dtype = _FN_TO_DTYPE[dm.group("fn").lower()]
        meta = getattr(entry.index, "meta", None)
        if meta is not None and getattr(meta, "distance_type", dtype) != dtype:
            return None
        k = int(m.group("k"))
        total = int(getattr(meta, "num_rows", 0) or 0)
        diverged = bool(getattr(meta, "has_tombstones", True)) or bool(
            getattr(meta, "has_mutations", True)
        )
        min_rows = entry.min_index_rows
        if not min_rows:
            try:
                min_rows = int(self.spark.conf.get("spark.pgvectorscale.min_index_rows"))
            except Exception:
                min_rows = self.MIN_INDEX_ROWS
        if total and not diverged and (total < min_rows or k >= total):
            return None  # spark.sql's decorrelated exact scan wins here
        # the query table needs a row id for the join: the first outer
        # select item referencing the query alias names it
        items = _split_select(m.group("items"))
        qid = None
        out_cols = []
        for item in items:
            am = re.match(r"(?is)^(.+?)\s+as\s+(\w+)$", item)
            expr_text = (am.group(1) if am else item).strip()
            alias = am.group(2) if am else None
            qm = re.match(rf"(?is)^{re.escape(qalias)}\.(\w+)$", expr_text)
            lm = re.match(rf"(?is)^{re.escape(lalias)}\.(\w+|\*)$", expr_text)
            if qm is not None:
                if qid is None:
                    qid = qm.group(1)
                out_cols.append(("q", qm.group(1), alias))
            elif lm is not None:
                out_cols.append(("l", lm.group(1).lower(), alias))
            else:
                return None  # expression outputs: fall through to spark.sql
        if qid is None:
            return None
        queries = qdf.select(
            F.col(qid).alias("query_id"), F.col(dm.group("qvec")).alias("query_vec")
        )
        res = entry.index.ann_join(queries, k=k, **entry.search_kwargs)
        # map lateral-alias columns onto ann_join's output names
        lmap = {id_alias: "node_id", dm.group("dalias").lower(): "distance"}
        cols = []
        for kind, name, alias in out_cols:
            if kind == "q":
                # non-id query columns would need a join back to qdf; the
                # canonical shape selects the id (and lateral columns)
                if name != qid:
                    return None
                c = F.col("query_id")
                cols.append(c.alias(alias or name))
            elif name == "*":
                cols.append(F.col("node_id").alias(id_alias))
                cols.append(F.col("distance").alias(dm.group("dalias")))
            else:
                if name not in lmap:
                    return None
                cols.append(F.col(lmap[name]).alias(alias or name))
        return res.select(*cols)

    def _try_index_route(self, sql: str) -> DataFrame | None:
        tail = _ANN_TAIL_RE.search(sql)
        frm = _FROM_RE.search(sql)
        if tail is None or frm is None:
            return None
        table = frm.group("table").lower()
        col = tail.group("col").lower()
        entry = self._indexes.get((table, col))
        df = self._tables.get(table)
        if entry is None or df is None:
            return None
        dtype = _FN_TO_DTYPE[tail.group("fn").lower()]
        if getattr(entry.index, "meta", None) is not None and hasattr(entry.index.meta, "distance_type"):
            if entry.index.meta.distance_type != dtype:
                return None  # index can't serve a different metric — fall back
        qvec = [float(x) for x in tail.group("vec").split(",")]
        k = int(tail.group("k"))
        # cost-based index-vs-scan choice (cost_estimate.rs:6-50): for a
        # tiny corpus, or k covering (nearly) all of it, the graph walk's
        # scatter/gather overhead loses to one exact declarative scan —
        # fall through to spark.sql, which IS that scan after the rewrite.
        # NEVER bypass an index holding tombstones: the registered table
        # still contains those rows, so the exact scan would resurface
        # deleted ids (absent flag -> assume tombstones, stay on the index).
        # Symmetrically, NEVER bypass a mutated index: insert() may have
        # added rows the registered table lacks, and the exact scan would
        # silently drop them (absent flag -> assume mutated, stay on index).
        meta = getattr(entry.index, "meta", None)
        total = int(getattr(meta, "num_rows", 0) or 0)
        diverged = bool(getattr(meta, "has_tombstones", True)) or bool(
            getattr(meta, "has_mutations", True)
        )
        min_rows = entry.min_index_rows
        if not min_rows:
            try:
                min_rows = int(self.spark.conf.get("spark.pgvectorscale.min_index_rows"))
            except Exception:
                min_rows = self.MIN_INDEX_ROWS
        if total and not diverged and (total < min_rows or k >= total):
            return None
        wm = _WHERE_RE.search(sql)
        predicate = wm.group("pred").strip() if wm else None
        sm = _SELECT_RE.match(sql)
        items = sm.group("items").strip() if sm else "*"

        res = self._index_topk(entry, df, qvec, k, predicate, dtype)
        # expose requested columns: join candidates back to the table rows
        joined = res.join(df, res["node_id"] == df[entry.id_col], "inner").drop("node_id")
        ordered = joined.orderBy(F.col("distance").asc(), F.col(entry.id_col).asc()).limit(k)
        if items == "*":
            return ordered
        cols = []
        for item in _split_select(items):
            am = re.match(r"(?is)^(.+?)\s+as\s+(\w+)$", item)
            expr_text = (am.group(1) if am else item).strip()
            alias = am.group(2) if am else None
            if expr_text.lower().startswith(tuple(_FN_TO_DTYPE)):
                # the distance expression re-selected: the index already
                # computed the exact value — reuse it, don't re-evaluate
                col = F.col("distance")
            elif re.fullmatch(_IDENT, expr_text):
                col = F.col(expr_text)
            else:
                col = F.expr(expr_text)
            cols.append(col.alias(alias) if alias else col)
        return ordered.select(*cols)

    def _index_topk(
        self,
        entry: _IndexEntry,
        df: DataFrame,
        qvec: list[float],
        k: int,
        predicate: str | None,
        dtype: str,
    ) -> DataFrame:
        """Index search with post-filter over-fetch + refill (README.md:291-303)."""
        import inspect
        import math

        if predicate is None:
            return entry.index.search(qvec, k=k, **entry.search_kwargs).select(
                "node_id", "distance"
            )
        total = getattr(getattr(entry.index, "meta", None), "num_rows", None)
        if not total:
            # metadata-less index (mocked / external): count ONCE per entry,
            # not per predicated query — a driver-side corpus count in every
            # filtered SQL call is a cold-corner anti-pattern (VERDICT r4).
            # Staleness is harmless: `total` only decides when the refill
            # loop stops growing the index fetch, and the exhausted path
            # below finishes with an exact scan of the CURRENT table, so a
            # grown table still yields complete results (just via the scan).
            total = entry.cached_total
            if not total:
                total = entry.cached_total = df.count()
        fetch = min(total, max(k, math.ceil(k * self.OVERFETCH_EPSILON)))
        # graph indexes bound their candidate pool by the beam, not by k —
        # the refill must widen search_list_size along with fetch or the
        # stream dries up at ~sls survivors regardless of fetch
        grows_sls = "search_list_size" in inspect.signature(entry.index.search).parameters
        # never pass a beam SMALLER than what the index would use anyway
        # (explicit kwarg > session conf > reference default)
        from pgvectorscale_spark.types import DEFAULT_QUERY_SEARCH_LIST_SIZE

        floor = entry.search_kwargs.get("search_list_size") or 0
        if not floor:
            try:
                floor = int(
                    entry.index.spark.conf.get("spark.pgvectorscale.query_search_list_size")
                )
            except Exception:
                floor = DEFAULT_QUERY_SEARCH_LIST_SIZE
        while True:
            kw = dict(entry.search_kwargs)
            if grows_sls and fetch > floor:
                kw["search_list_size"] = fetch
            res = entry.index.search(qvec, k=fetch, **kw).select("node_id", "distance")
            filtered = (
                res.join(df, res["node_id"] == df[entry.id_col], "inner")
                .filter(predicate)
                .select("node_id", "distance")
                # materialize once: the count() below and the returned frame
                # would otherwise each re-run the index search
                .localCheckpoint()
            )
            if filtered.count() >= k:
                return filtered
            if fetch >= total:
                break
            fetch = min(total, fetch * self.REFILL_FACTOR)
        # exhausted the index stream with < k survivors: finish with one
        # exact scan so any matching rows the index cannot surface (IVF
        # probe misses, unreachable graph nodes) still stream out — the
        # reference's amgettuple never stops short while matches remain
        from pgvectorscale_spark.operators.knn import search_exact

        return search_exact(
            df.filter(predicate),
            qvec,
            k=k,
            distance_type=dtype,
            vector_col=entry.column,
            id_col=entry.id_col,
        ).select(F.col(entry.id_col).alias("node_id"), "distance")
