"""Text primitives shared by BM25, dedup, and text-analysis operators.

Everything here is a native Catalyst expression (no Python UDFs) with a
DuckDB-SQL twin for the oracle. Hashing is md5-based because md5 is the
one hash both engines implement identically (verified in
tools/parity_exp.py); xxhash64/murmur differ between Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Reference tokenizer: regex [a-zA-Z0-9]+, lowercase, drop len<=1
# (/root/reference/src/index/bm25.rs:13-15,127-132).
TOKEN_SPLIT_RE = "[^a-zA-Z0-9]+"


def tokenize(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE),
        lambda t: F.length(t) > 1,
    )


def duckdb_tokenize(text: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(lower({text}), '[^a-zA-Z0-9]+'),"
        f" t -> length(t) > 1)"
    )


def hash64(s: Column | str) -> Column:
    """Deterministic 60-bit non-negative hash from md5 — cross-engine stable."""
    s = F.col(s) if isinstance(s, str) else s
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


def duckdb_hash64(s: str) -> str:
    return f"('0x' || substr(md5({s}), 1, 15))::bigint"


def char_shingles(text: Column | str, k: int) -> Column:
    """All k-character substrings (shingles) of the text, in order.
    Empty array when the text is shorter than k."""
    text = F.col(text) if isinstance(text, str) else text
    return F.when(
        F.length(text) >= k,
        F.transform(
            F.sequence(F.lit(1), F.length(text) - k + 1),
            lambda i: text.substr(i, F.lit(k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def duckdb_char_shingles(text: str, k: int) -> str:
    return (
        f"(case when length({text}) >= {k} then "
        f"list_transform(generate_series(1, length({text}) - {k} + 1),"
        f" i -> substr({text}, i, {k})) "
        f"else [] end)"
    )


def word_ngrams(tokens: Column, n: int) -> Column:
    """n-grams over a token array, space-joined. Empty when len < n."""
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def duckdb_word_ngrams(tokens: str, n: int) -> str:
    return (
        f"(case when len({tokens}) >= {n} then "
        f"list_transform(generate_series(1, len({tokens}) - {n} + 1),"
        f" i -> array_to_string(list_slice({tokens}, i, i + {n} - 1), ' ')) "
        f"else [] end)"
    )
