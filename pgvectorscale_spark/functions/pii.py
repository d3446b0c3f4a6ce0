"""PII detection and redaction — token-level, cross-engine exact.

The standard pre-training scrub pass: find and mask emails, IPv4
addresses, US-SSN- and phone-shaped numbers, and payment-card numbers
(validated with the real Luhn checksum, not just a digit-run match).
Everything is a pure JVM-side column expression built from the same
fragments the DuckDB oracle runs, so the driver hash-verifies detection,
Luhn arithmetic, and the redacted output text in one row.

Design notes for 100 TB:

- **Token-level full matches, not substring regex scans.** The corpus
  contract here is single-space tokenization (functions/hashing.tokens);
  matching whole tokens against anchored patterns avoids the
  word-boundary (``\\b``) semantics that differ between Java regex
  (Spark) and RE2 (DuckDB), and the patterns below avoid backslash
  classes entirely (``[0-9]`` not ``\\d``, ``[.]`` not ``\\.``), so the
  same pattern string is valid and identical in both engines.
- **Map-side only.** Detection, Luhn validation and redaction are
  per-row ``filter``/``transform``/``aggregate`` expressions — no
  shuffle, no UDF, no driver round-trip; the scrub pass pipelines into
  whatever scan/write surrounds it.
- **Luhn is the real checksum** (ISO/IEC 7812 mod-10: double every
  second digit from the right, subtract 9 above 9, total must divide
  10), so 13-19-digit runs split into actual card candidates vs noise.

No reference analog (pgvectorscale stores vectors, not corpora); this
serves the training-data-pipeline brief alongside operators/curation.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgvectorscale_spark.functions.hashing import SPARK, h60, tokens

__all__ = [
    "PII_PATTERNS",
    "attach_pii_text",
    "luhn_valid_sql",
    "pii_count_sql",
    "pii_stats",
    "pii_text_sql",
    "redacted_text_sql",
]

# Anchor-free pattern bodies; every token is tested as a FULL match.
# Backslash-free on purpose (identical literal in Java regex and RE2).
# Order matters for redaction: first match wins (url before email so
# userinfo-style URLs never half-match as addresses). ssn (3-2-4) and
# phone (3-3-4) are disjoint by the middle group's width.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("url", "https?://[a-z0-9.-]+(:[0-9]+)?(/[^ ]*)?"),
    ("email", "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}"),
    ("ipv4", "([0-9]{1,3}[.]){3}[0-9]{1,3}"),
    ("ssn", "[0-9]{3}-[0-9]{2}-[0-9]{4}"),
    ("phone", "[0-9]{3}-[0-9]{3}-[0-9]{4}"),
    ("card", "[0-9]{13,19}"),
)

_PAT = dict(PII_PATTERNS)


def _full_match(tok_expr: str, pattern: str, dialect: str) -> str:
    """Whole-token match predicate (anchored rlike vs regexp_full_match)."""
    if dialect == SPARK:
        return f"{tok_expr} rlike '^({pattern})$'"
    return f"regexp_full_match({tok_expr}, '{pattern}')"


def luhn_valid_sql(tok_expr: str, dialect: str) -> str:
    """ISO/IEC 7812 mod-10 over a digits-only token: double every second
    digit from the RIGHT (the check digit is rightmost and never doubled),
    fold doubled values above 9 back by subtracting 9, valid iff the total
    divides 10. Identical integer arithmetic in both engines."""
    d = f"(ascii(substr({tok_expr}, i, 1)) - 48)"
    term = (
        f"CASE WHEN (length({tok_expr}) - i) % 2 = 1 "
        f"THEN CASE WHEN {d} * 2 > 9 THEN {d} * 2 - 9 ELSE {d} * 2 END "
        f"ELSE {d} END"
    )
    if dialect == SPARK:
        return (
            f"aggregate(sequence(1, length({tok_expr})), 0, "
            f"(acc, i) -> acc + ({term})) % 10 = 0"
        )
    return (
        f"list_sum(list_transform(range(1, length({tok_expr}) + 1), "
        f"i -> {term})) % 10 = 0"
    )


def pii_count_sql(text_expr: str, kind: str, dialect: str) -> str:
    """Count of tokens fully matching one PII pattern. ``kind='card_valid'``
    additionally requires the Luhn checksum to pass."""
    base = kind[:-6] if kind.endswith("_valid") else kind
    pred = _full_match("t", _PAT[base], dialect)
    if kind.endswith("_valid"):
        pred = f"({pred}) AND ({luhn_valid_sql('t', dialect)})"
    toks = tokens(text_expr, dialect)
    if dialect == SPARK:
        return f"cast(size(filter({toks}, t -> {pred})) as bigint)"
    return f"len(list_filter({toks}, t -> {pred}))::BIGINT"


def redacted_text_sql(text_expr: str, dialect: str) -> str:
    """The scrubbed text: every PII token replaced by its ``<KIND>`` mask
    (first matching pattern wins; card masking is conservative — any
    13-19-digit run is masked whether or not Luhn passes)."""
    cases = " ".join(
        f"WHEN {_full_match('t', pat, dialect)} THEN '<{kind.upper()}>'"
        for kind, pat in PII_PATTERNS
    )
    body = f"t -> CASE {cases} ELSE t END"
    toks = tokens(text_expr, dialect)
    if dialect == SPARK:
        return f"array_join(transform({toks}, {body}), ' ')"
    return f"array_to_string(list_transform({toks}, {body}), ' ')"


# ---------------------------------------------------------------------------
# Deterministic PII synthesis (the corpus is word-soup with no natural PII;
# the attach_*_payload convention: derive everything from md5(text) so the
# oracle replays the synthesis in closed form and zero-count docs exist).
# ---------------------------------------------------------------------------


def _byte(hex_expr: str, i: int, dialect: str) -> str:
    """i-th (0-based) digest byte as an integer."""
    sub = f"substr({hex_expr}, {2 * i + 1}, 2)"
    if dialect == SPARK:
        return f"cast(conv({sub}, 16, 10) as int)"
    return f"(('0x' || {sub})::INT)"


def _digit(hex_expr: str, i: int, dialect: str) -> str:
    return f"cast({_byte(hex_expr, i, dialect)} % 10 as string)"


def pii_text_sql(text_expr: str, id_expr: str, dialect: str) -> str:
    """Text with a deterministic PII tail derived from md5(text):

    - ``id % 3 == 0``: unchanged (zero-count docs are exercised),
    - ``id % 3 == 1``: one URL, one email, one IPv4, one 16-digit card
      candidate (Luhn validity falls where the digest digits put it —
      ~10% of these docs carry a VALID card number, so the checksum path
      is exercised with both outcomes),
    - ``id % 3 == 2``: two emails, one SSN-shaped and one phone-shaped
      number.
    """
    h = f"md5({text_expr})"

    def dig(*idx: int) -> str:
        return ", ".join(_digit(h, i, dialect) for i in idx)

    url = f"'https://ex', substr({h}, 11, 2), '.com/', substr({h}, 13, 3)"
    email = f"'user', substr({h}, 1, 4), '@ex', substr({h}, 5, 2), '.com'"
    email2 = f"'alt', substr({h}, 7, 3), '@ex', substr({h}, 10, 2), '.org'"
    ip = ", '.', ".join(f"cast({_byte(h, i, dialect)} as string)" for i in range(4))
    ssn = f"{dig(0, 1, 2)}, '-', {dig(3, 4)}, '-', {dig(5, 6, 7, 8)}"
    phone = f"'555-', {dig(9, 10, 11)}, '-', {dig(12, 13, 14, 15)}"
    card = dig(*range(16))
    return (
        f"CASE WHEN {id_expr} % 3 = 1 THEN concat({text_expr}, ' ', {url}, "
        f"' ', {email}, ' ', {ip}, ' ', {card}) "
        f"WHEN {id_expr} % 3 = 2 THEN concat({text_expr}, ' ', {ssn}, "
        f"' contact ', {email}, ' or ', {email2}, ' ', {phone}) "
        f"ELSE {text_expr} END"
    )


def attach_pii_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", out_col: str = "pii_text"
) -> DataFrame:
    """Attach the synthesized-PII text column (JVM-side expression)."""
    return df.withColumn(
        out_col, F.expr(pii_text_sql(f"`{text_col}`", f"`{id_col}`", SPARK))
    )


def pii_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII scrub report: one count per category, the number of
    card candidates whose Luhn checksum actually passes, and the h60 hash
    of the redacted text (hash-verifying the scrubbed OUTPUT, not just the
    counts; h60 evaluates its argument ONCE per row — a per-character
    rolling hash would re-expand the whole redaction pipeline per char).
    All map-side expressions — no shuffle."""
    t = f"`{text_col}`"
    red = redacted_text_sql(t, SPARK)
    return df.select(
        F.col(id_col),
        F.expr(pii_count_sql(t, "url", SPARK)).alias("n_urls"),
        F.expr(pii_count_sql(t, "email", SPARK)).alias("n_emails"),
        F.expr(pii_count_sql(t, "ipv4", SPARK)).alias("n_ipv4"),
        F.expr(pii_count_sql(t, "ssn", SPARK)).alias("n_ssns"),
        F.expr(pii_count_sql(t, "phone", SPARK)).alias("n_phones"),
        F.expr(pii_count_sql(t, "card", SPARK)).alias("n_card_candidates"),
        F.expr(pii_count_sql(t, "card_valid", SPARK)).alias("n_cards_valid"),
        F.expr(h60(red, SPARK)).alias("redacted_fp"),
    )
