"""Portable token functions — the engine's scalar-function surface.

Every expression here exists in TWO dialects that compute bit-identical
results: a Spark SQL expression (used by the engine, fully inside
whole-stage codegen — zero per-row Python) and a DuckDB SQL expression
(used by the correctness oracle). This is the analog of the reference's
inlined scalar helpers (utils/HelperClass.java:104-120 cell math,
utils/DistanceFunctions.java:60-63 distances) re-expressed as a function
library per SURVEY.md §2.9.

Tokenizer: lowercase, split on non-[a-z0-9], per-word 31-base rolling hash
mod VOCAB_SIZE — deterministic, overflow-free (max intermediate value
31*50256+127 << 2^31), and identical in both engines (verified by
tests/test_portability.py).
"""

from __future__ import annotations

from spatialflink_spark.config import HASH_MOD, VOCAB_SIZE


def spark_words(col: str) -> str:
    return f"filter(split(lower({col}), '[^a-z0-9]+'), w -> w <> '')"


def duck_words(col: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9]+'),"
        " w -> w <> '')"
    )


def spark_tokenize_words(words: str) -> str:
    """word-array expression/column -> array<int> of token ids (Spark SQL).
    Lets callers that STAGE the words array once (the split+filter chain is
    the expensive part) tokenize it without re-deriving the words."""
    return (
        f"transform({words}, "
        f"w -> aggregate(split(w, ''), 0, (a, c) -> (a*31 + ascii(c)) % {VOCAB_SIZE}))"
    )


def spark_tokenize(col: str) -> str:
    """text column -> array<int> of token ids (Spark SQL)."""
    return spark_tokenize_words(spark_words(col))


def duck_tokenize(col: str) -> str:
    """text column -> list<int> of token ids (DuckDB SQL) — same values."""
    return (
        f"list_transform({duck_words(col)}, "
        "w -> list_reduce(list_prepend(0, "
        "list_transform(range(1, length(w)+1), i -> ascii(substr(w, i, 1)))), "
        f"(a, c) -> (a*31 + c) % {VOCAB_SIZE}))"
    )


def spark_tok_checksum(col: str) -> str:
    """Order-sensitive checksum of a token array (BIGINT) — the portable
    stand-in for element-wise token-array equality in oracle comparisons."""
    return (
        f"aggregate({col}, cast(0 as bigint), "
        f"(a, t) -> (a*131 + t) % {HASH_MOD})"
    )


def duck_tok_checksum(col: str) -> str:
    return (
        f"list_reduce(list_prepend(cast(0 as bigint), {col}), "
        f"(a, t) -> (a*131 + t) % {HASH_MOD})"
    )


def spark_word_shingles(col: str, k: int) -> str:
    """k-word shingles as strings 'w1 w2 .. wk' (Spark SQL).

    Built from the word array with transform over start indices — stays in
    codegen, no Python. Used by n-gram Jaccard / MinHash dedup.
    """
    w = spark_words(col)
    return (
        f"CASE WHEN size({w}) >= {k} THEN "
        f"transform(sequence(1, size({w}) - {k} + 1), "
        f"i -> concat_ws(' ', slice({w}, i, {k}))) "
        f"ELSE array(concat_ws(' ', {w})) END"
    )


def duck_word_shingles(col: str, k: int) -> str:
    w = duck_words(col)
    return (
        f"CASE WHEN len({w}) >= {k} THEN "
        f"list_transform(range(1, len({w}) - {k} + 2), "
        f"i -> array_to_string(list_slice({w}, i, i + {k} - 1), ' ')) "
        f"ELSE [array_to_string({w}, ' ')] END"
    )


def spark_str_hash(col: str) -> str:
    """Portable 31-base rolling hash of a full string mod HASH_MOD (BIGINT)."""
    return (
        f"aggregate(split({col}, ''), cast(0 as bigint), "
        f"(a, c) -> (a*31 + ascii(c)) % {HASH_MOD})"
    )


def duck_str_hash(col: str) -> str:
    return (
        f"list_reduce(list_prepend(cast(0 as bigint), "
        f"list_transform(range(1, length({col})+1), i -> ascii(substr({col}, i, 1)))), "
        f"(a, c) -> (a*31 + c) % {HASH_MOD})"
    )


def spark_tokenize_fast(col: str) -> str:
    """Production ingest tokenizer: xxhash64 per word (JVM-intrinsic) instead
    of the per-char rolling hash — measured ~2.8x faster per core and
    scan-bound rather than CPU-bound at high parallelism (BENCH.md).

    Same word segmentation as spark_tokenize, so size(tokens), n_tok, cell
    assignment, windows — every n_tok-derived result — are IDENTICAL under
    either tokenizer; only token VALUES differ (different hash family).
    The portable tokenizer remains the correctness-gate path because DuckDB
    cannot reproduce xxhash64."""
    return (
        f"transform({spark_words(col)}, "
        f"w -> cast(pmod(xxhash64(w), {VOCAB_SIZE}) as int))"
    )
