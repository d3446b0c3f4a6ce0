"""Text-analysis column functions for large-scale training-data pipelines.

All of these are pure JVM-side column expressions (no UDFs): token counting,
quality scoring, n-gram-heuristic language ID, and rolling-hash document
fingerprinting. Each has a DuckDB twin assembled from the same fragments so
the driver's oracle hash-matches (functions/hashing.py pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pgvectorscale_spark.functions.hashing import DUCKDB, SPARK, rolling_fingerprint, tokens

# Marker tokens per language for the n-gram/stopword language-ID heuristic.
# Disjoint lists; ties broken by language name ascending ('unknown' if no hits).
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht", "ist"],
    "en": ["the", "and", "of", "to", "is", "in"],
    "es": ["el", "la", "los", "que", "es", "por"],
    "fr": ["le", "les", "et", "est", "pour", "dans"],
}

EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "on", "for"]
PUNCT_CLASS = r"[.,!?;:]"


def token_count(text: Column) -> Column:
    """Whitespace token count (the BPE-ish pre-tokenizer building block)."""
    return F.size(F.split(text, " "))


def token_count_sql(text_expr: str, dialect: str) -> str:
    if dialect == SPARK:
        return f"size({tokens(text_expr, SPARK)})"
    return f"len({tokens(text_expr, DUCKDB)})"


def punct_ratio_sql(text_expr: str, dialect: str) -> str:
    """Punctuation density in integer permille.

    All ratio outputs use integer permille + integer division: float
    rounding at half-way boundaries differs across engines (HALF_UP vs
    HALF_EVEN), integer arithmetic is exact by construction.
    """
    if dialect == SPARK:
        clean = f"regexp_replace({text_expr}, '{PUNCT_CLASS}', '')"
        return (
            f"cast((length({text_expr}) - length({clean})) * 1000 as bigint) "
            f"div greatest(length({text_expr}), 1)"
        )
    clean = f"regexp_replace({text_expr}, '{PUNCT_CLASS}', '', 'g')"
    return (
        f"(((length({text_expr}) - length({clean})) * 1000)::BIGINT "
        f"// greatest(length({text_expr}), 1))"
    )


def _marker_count_sql(toks_expr: str, markers: list[str], dialect: str) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    if dialect == SPARK:
        return f"size(filter({toks_expr}, t -> t in ({lst})))"
    return f"len(list_filter({toks_expr}, t -> t in ({lst})))"


def stopword_ratio_sql(text_expr: str, dialect: str) -> str:
    """English-stopword density in integer permille."""
    toks = tokens(text_expr, dialect)
    cnt = _marker_count_sql(toks, EN_STOPWORDS, dialect)
    if dialect == SPARK:
        return f"cast({cnt} * 1000 as bigint) div greatest(size({toks}), 1)"
    return f"(({cnt} * 1000)::BIGINT // greatest(len({toks}), 1))"


def quality_score_sql(text_expr: str, dialect: str) -> str:
    """Composite quality score in integer micro-units [0, 1_000_000]:
    500×length-permille (tokens capped at 100 → ×10) + 500×min(5×stopword
    permille, 1000) − 250×punct permille. Pure integer arithmetic."""
    n = token_count_sql(text_expr, dialect)
    sw = stopword_ratio_sql(text_expr, dialect)
    pr = punct_ratio_sql(text_expr, dialect)
    length_permille = f"least({n} * 10, 1000)"
    return (
        f"cast(500 * {length_permille} + 500 * least(({sw}) * 5, 1000) "
        f"- 250 * ({pr}) as bigint)"
    )


def lang_id_sql(text_expr: str, dialect: str) -> str:
    """Argmax of per-language marker-token votes; ties → language name asc;
    zero votes → 'unknown'. A CASE cascade keeps it identical across engines."""
    toks = tokens(text_expr, dialect)
    counts = {lang: _marker_count_sql(toks, m, dialect) for lang, m in LANG_MARKERS.items()}
    langs = sorted(LANG_MARKERS)  # ascending = tie-break order
    # lang wins if its count > every earlier lang's count and >= every later one
    cases = []
    for i, lang in enumerate(langs):
        conds = [f"{counts[lang]} > 0"]
        for j, other in enumerate(langs):
            if i == j:
                continue
            op = ">=" if j > i else ">"
            conds.append(f"{counts[lang]} {op} {counts[other]}")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(cases) + " ELSE 'unknown' END"


def document_fingerprint_sql(text_expr: str, dialect: str) -> str:
    return rolling_fingerprint(text_expr, dialect)


# ASCII-class BPE-style pre-tokenizer: letter runs, digit runs, and single
# punctuation marks each become one token (the GPT-2 pre-tokenizer shape,
# ASCII-restricted so Java and RE2 regex semantics agree exactly).
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_tokens_sql(text_expr: str, dialect: str) -> str:
    if dialect == SPARK:
        return f"regexp_extract_all({text_expr}, '{BPE_PATTERN}', 0)"
    return f"regexp_extract_all({text_expr}, '{BPE_PATTERN}')"


def bpe_token_count_sql(text_expr: str, dialect: str) -> str:
    if dialect == SPARK:
        return f"cast(size({bpe_tokens_sql(text_expr, SPARK)}) as bigint)"
    return f"len({bpe_tokens_sql(text_expr, DUCKDB)})::BIGINT"


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach all text-analysis features as columns (JVM-side expressions)."""
    t = text_col
    return (
        df.withColumn("token_count", F.expr(token_count_sql(t, SPARK)))
        .withColumn("punct_permille", F.expr(punct_ratio_sql(t, SPARK)))
        .withColumn("stopword_permille", F.expr(stopword_ratio_sql(t, SPARK)))
        .withColumn("quality_micro", F.expr(quality_score_sql(t, SPARK)))
        .withColumn("lang_id", F.expr(lang_id_sql(t, SPARK)))
        .withColumn("fingerprint", F.expr(document_fingerprint_sql(t, SPARK)))
    )
