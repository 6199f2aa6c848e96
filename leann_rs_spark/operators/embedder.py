"""Embedding providers (T5-T8): deterministic hash embedder + provider shape.

The reference embeds through pluggable network providers
(/root/reference/src/embedding/mod.rs:112-120; OpenAI/Ollama/Gemini/
local Candle) in batches of 100/32, prefixed with per-model prompt
templates (mod.rs:126-143), mean-pooled and L2-normalized for the local
path (candle.rs:191-225). Its LLM layer keeps a `simulated` provider as
the no-network test strategy (src/llm/simulated.rs) — this module's
`hash_embedding` plays that role for embeddings: a deterministic,
cross-engine-reproducible embedding so every downstream operator
(search, dedup, ANN) is oracle-checkable without a model server.

Design:
- `hash_embedding(text, dims)` is a NATIVE Catalyst expression —
  tokenize → per-(token, dim) md5-derived weight in [-1, 1] summed with
  a sequential DOUBLE fold → L2 normalize with the reference's 1e-12
  clamp. No Python in the hot path; whole-stage codegen applies; the
  DuckDB twin (`duckdb_hash_embedding`) reproduces it bit-exactly.
- `embed_pandas` is the batched-provider physical shape: a mapInPandas
  that processes Arrow batches, the slot where a real HTTP provider
  (OpenAI batch 100 / Ollama batch 32) would plug in at scale. The
  deterministic provider implements the same math in numpy and is
  tested equal (to fp tolerance) against the native expression.
- `with_prompt_template` is T6 (asymmetric query/document prefixes).

At 100 TB: embedding is embarrassingly parallel per row — no shuffle.
The native-expression path scales with executors; a real provider runs
inside mapInPandas with per-partition batching and bounded concurrency,
exactly where the reference has its process/network boundary
(SURVEY.md §3.1 step 6).
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from leann_rs_spark.functions.text import (
    HASH_P,
    derived_hash,
    duckdb_derived_hash,
    duckdb_hash_pair,
    duckdb_tokenize,
    hash_pair,
    tokenize,
)

DEFAULT_DIMS = 64  # matches the driver's embeddings.parquet
_MOD = 2001  # weight = ((h % 2001) - 1000) / 1000  ∈ [-1, 1]


def _normalized(r: Column) -> Column:
    """L2-normalize with the reference's 1e-12 clamp
    (candle.rs:218-225 analog). Sequential fold in dim order — the same
    order in both engines, so the norm is bit-exact."""
    n = F.greatest(
        F.sqrt(F.aggregate(
            F.transform(r, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )),
        F.lit(1e-12),
    )
    return F.transform(r, lambda x: x / n)


def hash_embedding(text: Column | str, dims: int = DEFAULT_DIMS) -> Column:
    """Deterministic embedding: md5 each token ONCE → (a, b) coefficients;
    integer weight for dim j = (a + (j+1)·b mod P) mod 2001 − 1000; the
    per-dim raw value is sum(weight_int)/1000 ∈ ~[-T, T] — an INTEGER
    sum, so it is exact and order-independent in every engine — then
    L2-normalize (clamp 1e-12). Empty/short texts yield the zero vector.

    Cost shape: one md5 per TOKEN (not per token×dim — a dims× saving
    that dominates at 100 TB). The single-element-array `transform`s are
    let-bindings: they force the token-hash array and the raw vector to
    be evaluated once per row instead of once per output element
    (Catalyst does not CSE across higher-order-function lambdas).

    This scalar form is the right shape for one-off query vectors; for
    embedding a whole table use `embed_documents`, which computes the
    identical values through exploded tokens + hash aggregation (whole-
    stage codegen, one shuffle) instead of interpreted HOF lambdas."""
    text = F.col(text) if isinstance(text, str) else text
    pairs = F.transform(tokenize(text), hash_pair)

    def weight_int(p: Column, j: Column) -> Column:
        return (derived_hash(p, j) % _MOD) - F.lit(1000)

    def raw_from(ps: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(dims - 1)),
            lambda j: F.aggregate(
                ps, F.lit(0).cast("bigint"), lambda acc, p: acc + weight_int(p, j)
            ).cast("double") / F.lit(1000.0),
        )

    return F.transform(
        F.array(pairs),
        lambda ps: F.transform(F.array(raw_from(ps)), _normalized)[0],
    )[0]


def duckdb_raw_embedding(text: str, dims: int = DEFAULT_DIMS) -> str:
    """Pre-normalization embedding (the per-dim derived-hash fold) —
    mirrors `hash_embedding` exactly: one md5 per token, INTEGER weights
    derived per dim from the (a, b) pair, integer sum (exact, order-
    independent), one double division at the end."""
    toks = duckdb_tokenize(text)
    pairs = f"list_transform({toks}, t -> {duckdb_hash_pair('t')})"
    weight = f"(({duckdb_derived_hash('p', 'j')}) % {_MOD}) - 1000"
    return (
        f"list_transform(generate_series(0, {dims - 1}),"
        f" j -> list_reduce(list_prepend(0::bigint,"
        f" list_transform({pairs}, p -> {weight})), (acc, x) -> acc + x)"
        f"::double / 1000.0)"
    )


DUCKDB_NORMALIZE = (
    "list_transform(raw, x -> x / greatest(sqrt(list_reduce("
    "list_prepend(0.0::double, list_transform(raw, y -> y * y)),"
    " (a, y) -> a + y)), 1e-12))"
)


def duckdb_hash_embedding(text: str, dims: int = DEFAULT_DIMS) -> str:
    """DuckDB twin of `hash_embedding` — same tokenize, same md5 weights,
    same sequential fold order, same clamp. Standalone scalar form; for
    embedding a whole table prefer `duckdb_embed_table` (stages the raw
    fold once instead of relying on CSE)."""
    raw = duckdb_raw_embedding(text, dims)
    return f"(SELECT {DUCKDB_NORMALIZE} FROM (SELECT {raw} AS raw) _e)"


def duckdb_embed_table(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    dims: int = DEFAULT_DIMS,
    prompt_template: str | None = None,
) -> str:
    """Complete SELECT producing (id_col, embedding) for every row of
    `table` — the oracle twin of `embed_documents`."""
    src = f"'{prompt_template}' || {text_col}" if prompt_template else text_col
    raw = duckdb_raw_embedding(src, dims)
    return (
        f"SELECT {id_col}, {DUCKDB_NORMALIZE} AS embedding "
        f"FROM (SELECT {id_col}, {raw} AS raw FROM {table}) _raw"
    )


def with_prompt_template(text: Column | str, template: str | None) -> Column:
    """T6: prepend the model's document/query prefix
    (/root/reference/src/embedding/mod.rs:126-143). `template` is the
    prefix string (e.g. 'passage: ' for E5); None = identity."""
    text = F.col(text) if isinstance(text, str) else text
    return F.concat(F.lit(template), text) if template else text


# ---------------------------------------------------------------------------
# Python-side reference implementation (drives the pandas provider and
# local unit tests; must stay in lockstep with the expression above)
# ---------------------------------------------------------------------------

def _py_tokenize(text: str) -> list[str]:
    import re

    return [t for t in re.split("[^a-zA-Z0-9]+", text.lower()) if len(t) > 1]


def _py_hash_pair(s: str) -> tuple[int, int]:
    d = hashlib.md5(s.encode()).hexdigest()
    return int(d[:15], 16) % HASH_P, int(d[15:30], 16) % (HASH_P - 1) + 1


def py_hash_embedding(text: str, dims: int = DEFAULT_DIMS) -> list[float]:
    pairs = [_py_hash_pair(t) for t in _py_tokenize(text)]
    raw = []
    for j in range(dims):
        acc = 0  # integer sum — exact and order-independent
        for a, b in pairs:
            h = (a + (j + 1) * b) % HASH_P
            acc += (h % _MOD) - 1000
        raw.append(acc / 1000.0)
    norm = 0.0
    for x in raw:  # sequential fold in dim order, same as both engines
        norm += x * x
    norm = max(math.sqrt(norm), 1e-12)
    return [x / norm for x in raw]


class HashEmbedder:
    """Deterministic batch provider — the `simulated`-LLM counterpart for
    embeddings (/root/reference/src/llm/simulated.rs analog)."""

    def __init__(self, dims: int = DEFAULT_DIMS):
        self.dims = dims

    def embed(self, texts: list[str]) -> list[list[float]]:
        return [py_hash_embedding(t, self.dims) for t in texts]


def probe_dimensions(provider) -> int:
    """T8: dimension auto-detect for unknown models — embed one probe
    text and read the vector length (the reference probes "test" once
    before schema finalize, /root/reference/src/embedding/openai.rs:57-74).
    One driver-side call; the result pins the ArrayType width in meta."""
    return len(provider.embed(["test"])[0])


# Reference provider batch sizes (src/cli/build.rs:268-273): network
# providers take 100 texts per request, local engines 32.
PROVIDER_BATCH_SIZES = {
    "openai": 100,
    "gemini": 100,
    "ollama": 32,
    "local": 32,
}


def embed_pandas(
    df: DataFrame,
    provider: HashEmbedder | None = None,
    text_col: str = "text",
    out_col: str = "embedding",
    batch_size: int = 100,
    prompt_template: str | None = None,
    max_retries: int = 3,
    backoff_s: float = 0.5,
    max_concurrency: int = 1,
) -> DataFrame:
    """T5 physical shape: provider-batched embedding inside mapInPandas.

    Batches of `batch_size` mirror the reference's provider batch sizes
    (`PROVIDER_BATCH_SIZES`, src/cli/build.rs:268-273); a real HTTP
    provider slots into `provider.embed` unchanged.

    Hardening for real (network) providers:
    - each provider call retries up to `max_retries` times with
      exponential backoff starting at `backoff_s` — transient 429/5xx
      blips don't fail the Spark task (which would re-embed the whole
      partition); a call that exhausts retries raises, deferring to
      Spark's own task-retry ladder.
    - `max_concurrency` > 1 runs that many provider calls in flight per
      partition via a thread pool (I/O-bound HTTP overlaps; order is
      preserved, so results are deterministic). Total in-flight
      requests across the cluster = executors × cores × max_concurrency
      — size it against the provider's rate limit, not the cluster.
    - a provider returning the wrong number of vectors fails fast
      instead of mis-aligning rows.
    """
    provider = provider or HashEmbedder()
    fields = list(df.schema.fields)
    out_schema = T.StructType(
        fields + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )

    def call(chunk: list[str]) -> list[list[float]]:
        import time

        delay = backoff_s
        for attempt in range(max_retries + 1):
            try:
                vecs = provider.embed(chunk)
                if len(vecs) != len(chunk):
                    raise RuntimeError(
                        f"provider returned {len(vecs)} vectors for "
                        f"{len(chunk)} texts"
                    )
                return vecs
            except Exception:
                if attempt == max_retries:
                    raise
                time.sleep(delay)
                delay *= 2

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pool = None
        if max_concurrency > 1:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=max_concurrency)
        try:
            for pdf in batches:
                texts = [
                    (prompt_template or "") + (t if isinstance(t, str) else "")
                    for t in pdf[text_col]
                ]
                chunks = [
                    texts[i : i + batch_size]
                    for i in range(0, len(texts), batch_size)
                ]
                vecs: list[list[float]] = []
                if pool is not None:
                    # executor.map preserves submission order
                    for part in pool.map(call, chunks):
                        vecs.extend(part)
                else:
                    for chunk in chunks:
                        vecs.extend(call(chunk))
                out = pdf.copy()
                out[out_col] = vecs
                yield out
        finally:
            if pool is not None:
                pool.shutdown(wait=False)

    return df.mapInPandas(run, schema=out_schema)


def embed_documents(
    df: DataFrame,
    dims: int = DEFAULT_DIMS,
    text_col: str = "text",
    out_col: str = "embedding",
    prompt_template: str | None = None,
    id_col: str | None = None,
    bulk: bool = False,
) -> DataFrame:
    """The default (native-expression) embedding operator.

    Default physical form: the per-row scalar `hash_embedding`
    expression — a pure projection, NO shuffle, embarrassingly
    parallel. Round-3 A/B at sf0.1 measured it 2.2-2.4× faster than
    the exploded path at both 16-token chunks and 54-token documents
    (0.9 s vs 2.0 s corpus embed), reversing the round-2 result
    (SURVEY §9) after the hash-v2 integer-exact weight rework.

    `bulk=True` (with `id_col`, a UNIQUE row key) switches to the
    exploded form: token rows with per-dim integer weights unrolled
    into `dims` codegen'd SUM aggregates — one shuffle on `id_col`
    with map-side partial aggregation. The integer-sum definition
    makes the two forms bit-identical regardless of aggregation order
    (pinned by test); keep the bulk form for regimes where very long
    documents make the per-row fold the bottleneck.
    """
    if id_col is None or df.isStreaming or not bulk:
        return df.withColumn(
            out_col,
            hash_embedding(with_prompt_template(text_col, prompt_template), dims),
        )

    others = [c for c in df.columns if c != id_col]
    toks = df.select(
        id_col,
        *others,
        F.explode_outer(
            tokenize(with_prompt_template(text_col, prompt_template))
        ).alias("_tok"),
    )
    pair = hash_pair(F.col("_tok"))
    toks = toks.withColumn("_a", pair["a"]).withColumn("_b", pair["b"])
    # The dims-wide projection/aggregate/array expressions are built as
    # SQL strings parsed JVM-side (one py4j call each) instead of
    # per-element Column arithmetic (~1k py4j round-trips): measured
    # ~1.3s of pure driver construction time per embed_documents(bulk)
    # call at dims=64 (the lit_vec rationale, functions/vector.py).
    # Semantics unchanged: `%` parses to the same Remainder operator,
    # integer literals stay integral, and the bulk ≡ scalar
    # bit-equality test pins the values.
    weights = [
        F.expr(
            f"((_a + {j + 1} * _b) % {HASH_P}) % {_MOD} - 1000 AS _w{j}"
        )
        for j in range(dims)
    ]
    toks = toks.select(id_col, *others, *weights)
    agg = toks.groupBy(id_col).agg(
        *[F.first(c).alias(c) for c in others],
        *[F.expr(f"sum(_w{j}) AS _s{j}") for j in range(dims)],
    )
    raw = F.expr(
        "array("
        + ",".join(
            f"CAST(coalesce(_s{j}, 0) AS DOUBLE) / 1000.0D"
            for j in range(dims)
        )
        + ")"
    )
    # let-binding via single-element array: normalize reads the raw
    # vector dims+1 times; without it each read re-evaluates the sums
    emb = F.transform(F.array(raw), _normalized)[0]
    return agg.withColumn(out_col, emb).select(id_col, *others, out_col)


# ---------------------------------------------------------------------------
# Corpus-trained local embedding model: TF-IDF + signed random projection.
#
# The reference's local path runs a real in-process model (Candle,
# /root/reference/src/embedding/candle.rs:102-216). This sandbox has no
# torch and no network, so the semantic local model here is the
# classical one: document vector = L2-normalized sum over tokens of
# tf·idf times a deterministic ±-weight projection of the token (the
# hashing-trick / random-projection family). Unlike the pure hash
# embedder (which only matches identical token multisets), documents
# SHARING RARE TERMS get genuinely similar vectors — real lexical-
# semantic retrieval, trained from the corpus itself, no external
# weights.
#
# Exactness design (the hash-v2 trick extended): idf is quantized to
# integer micro-units once per term — idf_q = round((ln((N+1)/(df+1))
# + 1) · 1e6) — so every per-(token, dim) contribution
# tf · idf_q · w_int is an INTEGER product and the per-dim sums are
# exact and order-independent in both engines; one double division
# (1e9) at the end. Overflow bound: tf · idf_q · 1000 · distinct-terms
# per doc must stay < 2^63 — satisfied by any realistic document
# (≈2·10^5 weighted token-units of headroom at web scale).
# ---------------------------------------------------------------------------

def _tfidf_weighted_terms(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    dfreq: DataFrame | None = None,
    n_docs_df: DataFrame | None = None,
) -> DataFrame:
    """→ (id, _tok, _wq) integer tf·idf_q weights per (doc, term).
    `dfreq`/`n_docs_df` default to the input corpus's own stats; pass
    them explicitly to embed QUERIES against corpus statistics."""
    toks = docs.select(F.col(id_col).alias("__tid"), F.explode(tokenize(text_col)).alias("_tok"))
    tf = toks.groupBy("__tid", "_tok").agg(F.count("*").alias("_tf"))
    if dfreq is None:
        dfreq = tf.groupBy("_tok").agg(F.count("*").alias("_df"))
    if n_docs_df is None:
        n_docs_df = docs.agg(F.count("*").alias("_n"))
    w = tf.join(dfreq, "_tok", "left").crossJoin(F.broadcast(n_docs_df))
    idf_q = F.round(
        (
            F.log(
                (F.col("_n") + F.lit(1.0))
                / (F.coalesce(F.col("_df"), F.lit(0)) + F.lit(1.0))
            )
            + F.lit(1.0)
        )
        * F.lit(1e6)
    ).cast("bigint")
    return w.select(
        F.col("__tid").alias(id_col),
        "_tok",
        (F.col("_tf") * idf_q).alias("_wq"),
    )


def tfidf_corpus_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """→ (dfreq(_tok, _df), n_docs 1-row frame): the corpus statistics
    queries must be embedded against (idf comes from the CORPUS, tf
    from the query — the asymmetric convention)."""
    toks = docs.select(
        F.col(id_col).alias("__tid"), F.explode(tokenize(text_col)).alias("_tok")
    )
    dfreq = (
        toks.distinct().groupBy("_tok").agg(F.count("*").alias("_df"))
    )
    return dfreq, docs.agg(F.count("*").alias("_n"))


def tfidf_embed_documents(
    docs: DataFrame,
    dims: int = DEFAULT_DIMS,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "embedding",
    dfreq: DataFrame | None = None,
    n_docs_df: DataFrame | None = None,
) -> DataFrame:
    """→ (id_col, embedding): the corpus-trained TF-IDF projection
    model, fully distributed — one tf shuffle, a vocabulary-keyed df
    join (AQE broadcasts it when the vocab fits), and one
    map-side-combined sum per (doc, dim) with the per-dim arithmetic
    unrolled into codegen'd aggregates (the embed_documents bulk
    shape). Token-less docs keep the zero vector."""
    w = _tfidf_weighted_terms(docs, id_col, text_col, dfreq, n_docs_df)
    pair = hash_pair(F.col("_tok"))
    w = w.withColumn("_a", pair["a"]).withColumn("_b", pair["b"])
    sums = [
        F.sum(
            F.col("_wq")
            * (((F.col("_a") + F.lit(j + 1) * F.col("_b")) % F.lit(HASH_P))
               % F.lit(_MOD) - F.lit(1000))
        ).alias(f"_s{j}")
        for j in range(dims)
    ]
    agg = w.groupBy(id_col).agg(*sums)
    # token-less docs never enter the token stream — restore them with
    # the zero vector (the hash embedder's empty-text convention)
    agg = docs.select(id_col).join(agg, id_col, "left")
    raw = F.array(
        *[
            F.coalesce(F.col(f"_s{j}"), F.lit(0)).cast("double") / F.lit(1e9)
            for j in range(dims)
        ]
    )
    emb = F.transform(F.array(raw), _normalized)[0]
    return agg.withColumn(out_col, emb).select(id_col, out_col)


def duckdb_tfidf_embed_table(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    dims: int = DEFAULT_DIMS,
    query_text: str | None = None,
) -> str:
    """Oracle twin of `tfidf_embed_documents` — identical tokenize, md5
    pair, integer idf quantization, integer sums, final normalize.
    With `query_text`, returns ONE row (id NULL) embedding that string
    against the TABLE's df/N statistics (the query-side form)."""
    from leann_rs_spark.functions.text import (
        duckdb_hash_pair,
        duckdb_tokenize,
    )

    if query_text is None:
        target = f"SELECT {id_col} AS tid, {duckdb_tokenize(text_col)} AS t FROM {table}"
    else:
        # tid 0, not NULL: the reassembly joins ON tid, and NULL keys
        # never match in SQL joins
        target = f"SELECT 0::bigint AS tid, {duckdb_tokenize(query_text)} AS t"
    pair = duckdb_hash_pair("w.tok")
    weight = f"(({pair}).a + (j + 1) * ({pair}).b) % {HASH_P} % {_MOD} - 1000"
    return f"""
        WITH target AS ({target}),
        toks AS (SELECT tid, unnest(t) AS tok FROM target),
        tf AS (SELECT tid, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        corpus_tf AS (
            SELECT {id_col} AS cid, unnest({duckdb_tokenize(text_col)}) AS tok
            FROM {table}
        ),
        dfq AS (
            SELECT tok, count(*) AS df
            FROM (SELECT DISTINCT cid, tok FROM corpus_tf) GROUP BY tok
        ),
        n AS (SELECT count(*) AS n FROM {table}),
        w AS (
            SELECT tf.tid, tf.tok,
                   tf.tf * CAST(round((ln((n.n + 1.0)
                        / (coalesce(dfq.df, 0) + 1.0)) + 1.0) * 1e6)
                        AS BIGINT) AS wq
            FROM tf LEFT JOIN dfq USING (tok), n
        ),
        per_dim AS (
            SELECT w.tid, j,
                   sum(w.wq * ({weight}))::double / 1e9 AS rawv
            FROM w, unnest(generate_series(0, {dims - 1})) s(j)
            GROUP BY 1, 2
        ),
        vecs AS (
            SELECT tid, list(rawv ORDER BY j) AS raw FROM per_dim GROUP BY tid
        ),
        allrows AS (
            SELECT t.tid,
                   coalesce(v.raw,
                            list_transform(generate_series(1, {dims}),
                                           x -> 0.0)) AS raw
            FROM (SELECT DISTINCT tid FROM target) t
            LEFT JOIN vecs v USING (tid)
        )
        SELECT tid AS {id_col}, {DUCKDB_NORMALIZE} AS embedding FROM allrows
    """


class TfidfEmbedder:
    """Provider-interface wrapper over the corpus-trained model: `fit`
    collects the vocabulary df map driver-side (vocab-sized — fine for
    single-process query embedding; the corpus side always uses the
    distributed form), then `embed` produces query vectors against the
    corpus statistics, slotting into search_index(query_provider=) /
    embed_pandas like any network provider. The in-process local model
    the reference's Candle backend plays (candle.rs:102-216), built
    from the corpus instead of downloaded weights."""

    def __init__(self, dims: int = DEFAULT_DIMS):
        self.dims = dims
        self.df: dict[str, int] = {}
        self.n_docs = 0

    def fit(self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"):
        toks = docs.select(
            F.col(id_col).alias("__tid"), F.explode(tokenize(text_col)).alias("_tok")
        )
        rows = (
            toks.distinct().groupBy("_tok").agg(F.count("*").alias("_df")).collect()
        )
        self.df = {r["_tok"]: r["_df"] for r in rows}
        self.n_docs = docs.count()
        return self

    def embed(self, texts: list[str]) -> list[list[float]]:
        out = []
        for text in texts:
            counts: dict[str, int] = {}
            for t in _py_tokenize(text):
                counts[t] = counts.get(t, 0) + 1
            acc = [0] * self.dims
            for tok, tf in counts.items():
                idf_q = round(
                    (math.log((self.n_docs + 1.0) / (self.df.get(tok, 0) + 1.0))
                     + 1.0) * 1e6
                )
                wq = tf * int(idf_q)
                a, b = _py_hash_pair(tok)
                for j in range(self.dims):
                    h = (a + (j + 1) * b) % HASH_P
                    acc[j] += wq * ((h % _MOD) - 1000)
            raw = [x / 1e9 for x in acc]
            norm = 0.0
            for x in raw:
                norm += x * x
            norm = max(math.sqrt(norm), 1e-12)
            out.append([x / norm for x in raw])
        return out


def tfidf_keywords(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k TF-IDF keywords → (id_col, term, score_q,
    rank) — the corpus-audit / tagging query (and the classical
    query-expansion signal) over the SAME integer-quantized tf·idf_q
    weights as the embedding model, so the ranking key is an INTEGER
    (score_q = tf · idf_q): no float ordering anywhere, ties broken
    term ASC.

    Scale: one tf shuffle + the vocabulary-keyed df join (AQE
    broadcasts it when the vocab fits) + one per-doc window — and the
    window's partition is the document, so partitions are doc-sized,
    never corpus-sized."""
    from pyspark.sql.window import Window

    w = _tfidf_weighted_terms(docs, id_col, text_col)
    win = Window.partitionBy(id_col).orderBy(
        F.col("_wq").desc(), F.col("_tok").asc()
    )
    return (
        w.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            F.col("_tok").alias("term"),
            F.col("_wq").alias("score_q"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def duckdb_tfidf_keywords(
    k: int = 5,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Oracle twin of tfidf_keywords — identical integer tf·idf_q key."""
    from leann_rs_spark.functions.text import duckdb_tokenize

    return f"""
        WITH toks AS (
            SELECT {id_col} AS tid, unnest({duckdb_tokenize(text_col)}) AS tok
            FROM {table}
        ),
        tf AS (SELECT tid, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        n AS (SELECT count(*) AS n FROM {table}),
        w AS (
            SELECT tf.tid, tf.tok,
                   tf.tf * CAST(round((ln((n.n + 1.0)
                        / (coalesce(dfq.df, 0) + 1.0)) + 1.0) * 1e6)
                        AS BIGINT) AS wq
            FROM tf LEFT JOIN dfq USING (tok), n
        ),
        ranked AS (
            SELECT tid, tok, wq,
                   row_number() OVER (
                       PARTITION BY tid ORDER BY wq DESC, tok ASC
                   ) AS rank
            FROM w
        )
        SELECT tid AS {id_col}, tok AS term, wq AS score_q,
               rank::int AS rank
        FROM ranked WHERE rank <= {k}
    """
