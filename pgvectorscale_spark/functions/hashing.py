"""Cross-engine deterministic hashing and shingling SQL fragments.

Every dedup operator (minhash-LSH, simhash, n-gram jaccard) needs a hash
function that computes the *identical* value in Spark and in the DuckDB
oracle. Engine-native hashes (xxhash64 vs duckdb hash) differ, so we build a
60-bit integer from the first 15 hex chars of md5 — both engines agree on
md5, and 60 bits fits a signed BIGINT with headroom.

Each helper emits a SQL expression string in either dialect; the Spark
operators run them via ``F.expr`` (JVM-side, no Python boundary) and the
oracle assembles the same computation in DuckDB SQL. Parity is by
construction and tested in tests/test_dedup.py.
"""

from __future__ import annotations

SPARK = "spark"
DUCKDB = "duckdb"


def h60(expr: str, dialect: str) -> str:
    """60-bit deterministic hash of a string expression."""
    if dialect == SPARK:
        return f"cast(conv(substr(md5({expr}), 1, 15), 16, 10) as bigint)"
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def tokens(text_expr: str, dialect: str) -> str:
    """Whitespace tokenization (the synthetic corpus is single-spaced)."""
    if dialect == SPARK:
        return f"split({text_expr}, ' ')"
    return f"string_split({text_expr}, ' ')"


def word_shingles(toks_expr: str, n: int, dialect: str) -> str:
    """n-word shingles joined by spaces; docs shorter than n yield one
    shingle = the whole doc."""
    if dialect == SPARK:
        return (
            f"CASE WHEN size({toks_expr}) >= {n} THEN "
            f"transform(sequence(0, size({toks_expr}) - {n}), "
            f"i -> concat_ws(' ', slice({toks_expr}, i + 1, {n}))) "
            f"ELSE array(concat_ws(' ', {toks_expr})) END"
        )
    return (
        f"CASE WHEN len({toks_expr}) >= {n} THEN "
        f"list_transform(range(0, len({toks_expr}) - {n} + 1), "
        f"i -> array_to_string({toks_expr}[i + 1 : i + {n}], ' ')) "
        f"ELSE [array_to_string({toks_expr}, ' ')] END"
    )


def minhash_seeds(num_hashes: int) -> list[int]:
    """Deterministic 60-bit XOR seeds, one per hash function.

    The signature's j-th entry is ``min over shingles of h60(shingle) XOR
    seed_j`` — the classic one-base-hash-many-cheap-permutations MinHash.
    The base md5 is computed ONCE per shingle; deriving the family by XOR
    (exact on int64 in both engines) instead of re-hashing per seed makes
    signature cost independent of num_hashes. Computed via hashlib so the
    constants can be inlined as literals in both dialects.
    """
    import hashlib

    return [
        int(hashlib.md5(f"minhash-seed:{j}".encode()).hexdigest()[:15], 16)
        for j in range(num_hashes)
    ]


def xor_expr(a: str, b: str, dialect: str) -> str:
    return f"({a} ^ {b})" if dialect == SPARK else f"xor({a}, {b})"


def minhash_signature_expr(shingles_expr: str, num_hashes: int) -> str:
    """Row-local MinHash signature as ONE Spark fold — no shuffle, no state.

    ``aggregate`` walks the hashed shingles once, keeping an array of
    ``num_hashes`` running minima (acc[j] = min(h ^ seed_j)); each shingle's
    md5 is evaluated exactly once. Being a pure per-row expression it works
    identically on batch and streaming DataFrames. Values match the
    explode+groupBy formulation and the DuckDB oracle by construction.
    """
    seeds = minhash_seeds(num_hashes)
    seed_arr = "array(" + ", ".join(f"{s}L" for s in seeds) + ")"
    hashed = f"transform({shingles_expr}, s -> {h60('s', SPARK)})"
    init = f"array_repeat(9223372036854775807L, {num_hashes})"
    return (
        f"aggregate({hashed}, {init}, "
        f"(acc, h) -> zip_with(acc, {seed_arr}, (a, c) -> least(a, h ^ c)))"
    )


def band_hash(sig_expr: str, band: int, rows_per_band: int, dialect: str) -> str:
    """Hash of one LSH band (rows_per_band consecutive signature entries)."""
    start = band * rows_per_band + 1
    if dialect == SPARK:
        sl = f"slice({sig_expr}, {start}, {rows_per_band})"
        return h60(f"concat_ws(',', transform({sl}, x -> cast(x as string)))", SPARK)
    sl = f"({sig_expr})[{start} : {start + rows_per_band - 1}]"
    return h60(f"array_to_string({sl}, ',')", DUCKDB)


def rolling_fingerprint(text_expr: str, dialect: str, mod: int = 1_000_000_007) -> str:
    """Polynomial rolling hash over character codes: fold (acc*31 + code) % p.

    The classic document fingerprint; identical fold order in both engines.
    """
    if dialect == SPARK:
        codes = (
            f"transform(sequence(1, length({text_expr})), "
            f"i -> cast(ascii(substr({text_expr}, i, 1)) as bigint))"
        )
        return f"aggregate({codes}, cast(0 as bigint), (acc, c) -> (acc * 31 + c) % {mod})"
    codes = (
        f"list_transform(range(1, length({text_expr}) + 1), "
        f"i -> ascii(substr({text_expr}, i, 1))::BIGINT)"
    )
    return f"list_reduce(list_prepend(0::BIGINT, {codes}), (acc, c) -> (acc * 31 + c) % {mod})"
