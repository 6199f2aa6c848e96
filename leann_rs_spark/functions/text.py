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


# ---------------------------------------------------------------------------
# Derived hash family: ONE md5 per input, arbitrarily many derived hashes.
#
# MinHash needs `num_hashes` hash functions per shingle, SimHash one per
# (token, bit), the embedder one per (token, dim). Hashing the
# concatenated "(i, x)" string costs one md5 per DERIVED value — the
# dominant cost of every sketch at 100 TB. Instead we md5 each input
# once, split the digest into two 60-bit halves (a, b), and derive
# hash_i = (a + (i + 1) * b) mod P  — the classic universal-hashing
# construction (Indyk; also how datasketch seeds MinHash permutations).
# P = 2^31 - 1 (Mersenne prime): a, b < P and i < 64 keeps every
# intermediate < 2^38, exactly representable in BIGINT in both engines.
# ---------------------------------------------------------------------------

HASH_P = 2_147_483_647  # 2^31 - 1


def hash_pair(s: Column | str) -> Column:
    """→ struct(a BIGINT, b BIGINT): the two derived-hash coefficients
    from one md5. b is forced non-zero so the family never degenerates."""
    s = F.col(s) if isinstance(s, str) else s
    d = F.md5(s)
    h1 = F.conv(F.substring(d, 1, 15), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(d, 16, 15), 16, 10).cast("bigint")
    return F.struct(
        (h1 % HASH_P).alias("a"),
        (h2 % (HASH_P - 1) + 1).alias("b"),
    )


def derived_hash(pair: Column, i: Column) -> Column:
    """hash_i(x) = (a + (i + 1) * b) mod P, non-negative BIGINT < P."""
    return (pair["a"] + (i + F.lit(1)) * pair["b"]) % F.lit(HASH_P)


def duckdb_hash_pair(s: str) -> str:
    """DuckDB twin of `hash_pair` → struct_pack(a, b)."""
    return (
        f"struct_pack("
        f"a := ('0x' || substr(md5({s}), 1, 15))::bigint % {HASH_P}, "
        f"b := ('0x' || substr(md5({s}), 16, 15))::bigint % {HASH_P - 1} + 1)"
    )


def duckdb_derived_hash(pair: str, i: str) -> str:
    return f"(({pair}).a + ({i} + 1) * ({pair}).b) % {HASH_P}"


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
    """n-grams over a token array, space-joined. Empty when len < n.

    The single-element-array transform is a let-binding: `tokens` is
    usually a whole tokenize() expression, and referencing it directly
    inside the per-position lambda would re-run the regex split once per
    n-gram position (Catalyst does not CSE into HOF lambdas)."""
    return F.transform(
        F.array(tokens),
        lambda ts: F.when(
            F.size(ts) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(ts) - n + 1),
                lambda i: F.concat_ws(" ", F.slice(ts, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )[0]


def duckdb_word_ngrams(tokens: str, n: int) -> str:
    return (
        f"(case when len({tokens}) >= {n} then "
        f"list_transform(generate_series(1, len({tokens}) - {n} + 1),"
        f" i -> array_to_string(list_slice({tokens}, i, i + {n} - 1), ' ')) "
        f"else [] end)"
    )


# ---------------------------------------------------------------------------
# URL extraction + canonicalization (crawl-dedup first pass)
# ---------------------------------------------------------------------------
#
# RefinedWeb / Common-Crawl pipelines dedup by URL BEFORE any content
# hashing (arXiv:2306.01116 §3.1): canonicalize, keep one fetch per
# canonical URL. Pure regexp_replace chain → whole-stage codegen, zero
# shuffle; the dedup itself is one groupBy on the canonical string.
# Backreference syntax differs ($1 Java / \1 RE2) and DuckDB replaces
# only the first match without the 'g' flag — the twins account for
# both. No lookaround anywhere (RE2 has none).

# scheme matched case-insensitively ((?i:) — Java and RE2 agree);
# same trailing class as textstats redact
URL_RE = r"(?i:https?)://[^\s]*[^\s.,)\]>]"


def extract_urls(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(text, F.lit(URL_RE), 0)


def duckdb_extract_urls(text: str) -> str:
    return f"regexp_extract_all({text}, '(?i:https?)://[^\\s]*[^\\s.,)\\]>]')"


def normalize_url(url: Column | str) -> Column:
    """Canonical URL: fragment stripped; scheme+host lowercased;
    default ports dropped; utm_* tracking params dropped (separators
    repaired); trailing '/' and dangling '?'/'&' stripped."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, r"#.*$", "")
    u = F.concat(
        F.lower(F.regexp_extract(u, r"^((?i:https?)://[^/?]*)", 1)),
        F.regexp_extract(u, r"^(?i:https?)://[^/?]*(.*)", 1),
    )
    u = F.regexp_replace(u, r"^(http://[^/:?]*):80($|[/?].*)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?]*):443($|[/?].*)", r"$1$2")
    u = F.regexp_replace(u, r"([?&])utm_[a-zA-Z0-9_]+=[^&]*", r"$1")
    u = F.regexp_replace(u, r"\?&", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]+$", "")
    u = F.regexp_replace(u, r"/$", "")
    return u


def duckdb_normalize_url(url: str) -> str:
    """DuckDB twin: identical rule chain (\\1 backrefs, 'g' flag)."""
    u = f"regexp_replace({url}, '#.*$', '', 'g')"
    u = (
        f"(lower(regexp_extract({u}, '^((?i:https?)://[^/?]*)', 1)) || "
        f"regexp_extract({u}, '^(?i:https?)://[^/?]*(.*)', 1))"
    )
    u = f"regexp_replace({u}, '^(http://[^/:?]*):80($|[/?].*)', '\\1\\2', 'g')"
    u = f"regexp_replace({u}, '^(https://[^/:?]*):443($|[/?].*)', '\\1\\2', 'g')"
    u = f"regexp_replace({u}, '([?&])utm_[a-zA-Z0-9_]+=[^&]*', '\\1', 'g')"
    u = f"regexp_replace({u}, '\\?&', '?', 'g')"
    u = f"regexp_replace({u}, '&&+', '&', 'g')"
    u = f"regexp_replace({u}, '[?&]+$', '', 'g')"
    u = f"regexp_replace({u}, '/$', '', 'g')"
    return u
