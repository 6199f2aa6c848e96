"""Embedder tests: native expression ⟷ python ⟷ pandas provider ⟷ DuckDB
oracle parity, plus normalization/edge-case behavior."""

import duckdb
import math

import pytest
from pyspark.sql import functions as F

from leann_rs_spark.operators.embedder import (
    DEFAULT_DIMS,
    HashEmbedder,
    duckdb_hash_embedding,
    embed_documents,
    embed_pandas,
    hash_embedding,
    py_hash_embedding,
    with_prompt_template,
)

TEXTS = [
    "spark filter join window merge",
    "the quick brown fox",
    "",  # no tokens -> zero vector
    "a b c",  # all tokens len<=1 -> zero vector
    "héllo wörld unicode ÜBER",
]


def test_py_embedding_normalized():
    v = py_hash_embedding(TEXTS[0], 32)
    assert len(v) == 32
    assert math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-9)


def test_py_embedding_empty_is_zero():
    assert py_hash_embedding("", 8) == [0.0] * 8
    assert py_hash_embedding("a b c", 8) == [0.0] * 8


def test_spark_matches_python(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], ["id", "text"])
    rows = df.select("id", hash_embedding("text", 16).alias("e")).collect()
    got = {r["id"]: list(r["e"]) for r in rows}
    for i, t in enumerate(TEXTS):
        expect = py_hash_embedding(t, 16)
        assert got[i] == pytest.approx(expect, abs=1e-12), f"text {i}"


def test_spark_matches_duckdb_exactly(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["id", "text"]
    )
    sp = {
        r["id"]: list(r["e"])
        for r in df.select("id", hash_embedding("text", 8).alias("e")).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(TEXTS):
        esc = t.replace("'", "''")
        dk = con.sql(
            f"select {duckdb_hash_embedding(f'''cast('{esc}' as varchar)''', 8)} e"
        ).fetchall()[0][0]
        assert sp[i] == list(dk), f"text {i}: {sp[i]} != {dk}"


def test_pandas_provider_matches_expression(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    native = {
        r["doc_id"]: list(r["embedding"])
        for r in embed_documents(docs, dims=16).select("doc_id", "embedding").collect()
    }
    pand = {
        r["doc_id"]: list(r["embedding"])
        for r in embed_pandas(docs, HashEmbedder(16)).select("doc_id", "embedding").collect()
    }
    assert native.keys() == pand.keys()
    for k in native:
        assert native[k] == pytest.approx(pand[k], abs=1e-12)


def test_prompt_template_changes_embedding(spark):
    df = spark.createDataFrame([("query text",)], ["text"])
    plain = df.select(hash_embedding("text", 8).alias("e")).collect()[0]["e"]
    pref = df.select(
        hash_embedding(with_prompt_template("text", "query: "), 8).alias("e")
    ).collect()[0]["e"]
    assert list(plain) != list(pref)
    # the prefix itself must tokenize in (it does: 'query')
    assert list(pref) == pytest.approx(
        py_hash_embedding("query: query text", 8), abs=1e-12
    )


def test_embedding_deterministic_across_calls(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    a = embed_documents(docs, dims=DEFAULT_DIMS).select("doc_id", "embedding").collect()
    b = embed_documents(docs, dims=DEFAULT_DIMS).select("doc_id", "embedding").collect()
    assert sorted((r["doc_id"], tuple(r["embedding"])) for r in a) == sorted(
        (r["doc_id"], tuple(r["embedding"])) for r in b
    )


def test_probe_dimensions():
    # T8: openai.rs:57-74 analog — one probe call pins the width
    from leann_rs_spark.operators.embedder import HashEmbedder, probe_dimensions

    assert probe_dimensions(HashEmbedder(dims=48)) == 48
    assert probe_dimensions(HashEmbedder()) == probe_dimensions(HashEmbedder())


# ---------------------------------------------------------------------------
# provider-slot hardening: retry/backoff + bounded concurrency
# ---------------------------------------------------------------------------

def _flaky_provider(dims=16, fail_n=1):
    """Fails the first `fail_n` attempts for every chunk (keyed by the
    chunk's first text), then delegates to the deterministic hash
    provider. Defined per-call so cloudpickle ships the class by VALUE
    (a test-module top-level class pickles by reference, which workers
    cannot import)."""

    class Flaky(HashEmbedder):
        def __init__(self, dims, fail_n):
            super().__init__(dims)
            self.fail_n = fail_n
            self.attempts = {}

        def embed(self, texts):
            key = texts[0] if texts else ""
            n = self.attempts.get(key, 0)
            self.attempts[key] = n + 1
            if n < self.fail_n:
                raise ConnectionError(f"transient blip #{n} for {key[:20]!r}")
            return super().embed(texts)

    return Flaky(dims, fail_n)


def _short_provider(dims=16):
    class Short(HashEmbedder):
        def embed(self, texts):
            return super().embed(texts)[:-1]  # drops one vector

    return Short(dims)


def _vecs(df):
    return {
        r["doc_id"]: tuple(r["embedding"])
        for r in df.select("doc_id", "embedding").collect()
    }


def test_embed_pandas_retries_transient_failures(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    want = _vecs(embed_pandas(docs, HashEmbedder(16), batch_size=7))
    got = _vecs(
        embed_pandas(
            docs, _flaky_provider(16, fail_n=2), batch_size=7,
            max_retries=3, backoff_s=0.001,
        )
    )
    assert got == want


def test_embed_pandas_exhausted_retries_raise(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(10)
    out = embed_pandas(
        docs, _flaky_provider(16, fail_n=10), batch_size=100,
        max_retries=2, backoff_s=0.001,
    )
    with pytest.raises(Exception, match="transient blip"):
        out.collect()


def test_embed_pandas_bounded_concurrency_order_preserved(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    want = _vecs(embed_pandas(docs, HashEmbedder(16), batch_size=5))
    got = _vecs(
        embed_pandas(docs, HashEmbedder(16), batch_size=5, max_concurrency=4)
    )
    assert got == want


def test_embed_pandas_misaligned_provider_fails_fast(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(10)
    out = embed_pandas(docs, _short_provider(16), max_retries=0)
    with pytest.raises(Exception, match="vectors for"):
        out.collect()


def test_bulk_and_scalar_paths_bit_identical(spark):
    """The exploded bulk form and the default scalar expression must
    produce the SAME doubles (integer-exact weight sums make the
    aggregation order irrelevant) — what lets the default flip between
    physical forms on measurement without touching any oracle."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    a = {
        r["doc_id"]: tuple(r["embedding"])
        for r in embed_documents(docs, dims=16, id_col="doc_id", bulk=True)
        .select("doc_id", "embedding").collect()
    }
    b = {
        r["doc_id"]: tuple(r["embedding"])
        for r in embed_documents(docs, dims=16)
        .select("doc_id", "embedding").collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# Corpus-trained TF-IDF projection model (the local-model slot)
# ---------------------------------------------------------------------------

def test_tfidf_provider_matches_distributed(spark):
    from leann_rs_spark.operators.embedder import (
        TfidfEmbedder,
        tfidf_embed_documents,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(50)
        .cache()
    )
    emb = {
        r["doc_id"]: tuple(round(x, 9) for x in r["embedding"])
        for r in tfidf_embed_documents(docs, dims=16).collect()
    }
    prov = TfidfEmbedder(dims=16).fit(docs)
    rows = docs.orderBy("doc_id").limit(8).collect()
    got = prov.embed([r["text"] for r in rows])
    for r, v in zip(rows, got):
        assert tuple(round(x, 9) for x in v) == emb[r["doc_id"]], r["doc_id"]


def test_tfidf_rare_term_retrieval(spark):
    """The semantic property the hash embedder lacks: a query sharing a
    RARE term with one document ranks that document first, even though
    no document equals the query text."""
    from leann_rs_spark.functions.vector import dot
    from leann_rs_spark.operators.embedder import (
        tfidf_corpus_stats,
        tfidf_embed_documents,
    )
    from pyspark.sql import functions as F

    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    rows.append((100, "mitochondria zygote chromatin biology notes"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    emb = tfidf_embed_documents(docs, dims=32)
    dfreq, nd = tfidf_corpus_stats(docs)
    qdf = spark.createDataFrame(
        [(0, "zygote chromatin")], "doc_id long, text string"
    )
    qv = tfidf_embed_documents(
        qdf, dims=32, dfreq=dfreq, n_docs_df=nd
    ).select(F.col("embedding").alias("qv"))
    top = (
        emb.crossJoin(F.broadcast(qv))
        .select("doc_id", dot(F.col("embedding"), F.col("qv")).alias("s"))
        .orderBy(F.col("s").desc())
        .head()
    )
    assert top["doc_id"] == 100 and top["s"] > 0.5


def test_tfidf_empty_doc_zero_vector(spark):
    from leann_rs_spark.operators.embedder import tfidf_embed_documents

    docs = spark.createDataFrame(
        [(1, "real words here"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["embedding"] for r in tfidf_embed_documents(docs, dims=8).collect()}
    assert len(out) == 3
    assert all(x == 0.0 for x in out[2]) and all(x == 0.0 for x in out[3])
    assert any(x != 0.0 for x in out[1])
