"""BM25 + hybrid tests — reference vectors from
/root/reference/src/index/bm25.rs:172-330 ported as executable specs."""

import pytest
from pyspark.sql import functions as F

from leann_rs_spark.functions.text import tokenize
from leann_rs_spark.operators.bm25 import (
    bm25_topk,
    build_bm25_index,
    score_query,
    tokenize_py,
)
from leann_rs_spark.operators.hybrid import hybrid_rerank


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _scores(spark, texts, query):
    p, d, t = build_bm25_index(_docs(spark, texts))
    return {
        r["doc_id"]: r["score"]
        for r in score_query(p, d, t, query).collect()
    }


def test_tokenize_py_basic():
    toks = tokenize_py("Hello, World! This is a test.")
    assert "hello" in toks and "world" in toks and "test" in toks
    assert "a" not in toks
    assert tokenize_py("") == []
    assert set(tokenize_py("test123 456abc")) == {"test123", "456abc"}


def test_tokenize_column_matches_py(spark):
    texts = ["Hello, World! This is a test.", "", "test123 456abc", "x y zz"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r[0] for r in df.select(tokenize("text")).collect()]
    assert got == [tokenize_py(t) for t in texts]


def test_bm25_term_frequency_matters(spark):
    s = _scores(spark, ["rust rust rust programming", "rust programming"], "rust")
    assert s[0] > s[1]


def test_bm25_idf_matters(spark):
    s = _scores(spark, ["common rare", "common", "common"], "rare")
    assert s.get(0, 0.0) > 0.0
    assert 1 not in s and 2 not in s  # unmatched docs absent (implicit 0)


def test_bm25_empty_query(spark):
    p, d, t = build_bm25_index(_docs(spark, ["hello world"]))
    assert score_query(p, d, t, "").count() == 0


def test_bm25_no_match(spark):
    p, d, t = build_bm25_index(_docs(spark, ["hello world"]))
    assert bm25_topk(score_query(p, d, t, "xyz"), 5).count() == 0


def test_bm25_search_top_k(spark):
    texts = ["apple banana", "apple cherry", "banana cherry", "apple apple apple"]
    p, d, t = build_bm25_index(_docs(spark, texts))
    rows = bm25_topk(score_query(p, d, t, "apple"), 2).collect()
    assert len(rows) == 2
    assert rows[0]["doc_id"] == 3  # apple apple apple wins


def test_bm25_duplicate_query_tokens_double_count(spark):
    # score_query iterates tokens with multiplicity (bm25.rs:81)
    s1 = _scores(spark, ["apple pie", "banana"], "apple")
    s2 = _scores(spark, ["apple pie", "banana"], "apple apple")
    assert s2[0] == pytest.approx(2 * s1[0])


def _hybrid(spark, vec, bm25_all, num_docs, alpha, fetch_k=10):
    vec_df = spark.createDataFrame(vec, "doc_id long, score double")
    b_df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(bm25_all) if s != 0.0],
        "doc_id long, score double",
    )
    top = (
        b_df.filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(fetch_k)
    )
    return hybrid_rerank(vec_df, b_df, top, num_docs, alpha).collect()


def test_hybrid_rerank_basic(spark):
    rows = _hybrid(spark, [(0, 0.9), (1, 0.8), (2, 0.7)], [0.5, 0.9, 0.3], 3, 0.5)
    assert len(rows) == 3
    assert all(0.0 <= r["combined"] <= 1.0 for r in rows)


def test_hybrid_rerank_vector_only(spark):
    rows = _hybrid(spark, [(0, 0.9), (1, 0.5)], [0.1, 0.9], 2, 1.0)
    assert rows[0]["doc_id"] == 0


def test_hybrid_rerank_bm25_only(spark):
    rows = _hybrid(spark, [(0, 0.9), (1, 0.5)], [0.1, 0.9], 2, 0.0)
    assert rows[0]["doc_id"] == 1


def test_hybrid_union_adds_bm25_only_docs(spark):
    # doc 5 appears only in BM25 top → joins with vec_score 0.0
    # (searcher.rs:157-165)
    rows = _hybrid(spark, [(0, 0.9)], [0.1, 0.0, 0.0, 0.0, 0.0, 2.0], 6, 0.5)
    ids = [r["doc_id"] for r in rows]
    assert 5 in ids
    d5 = next(r for r in rows if r["doc_id"] == 5)
    assert d5["vec_score"] == 0.0 and d5["bm25_score"] == 2.0


def test_score_adhoc_matches_indexed(spark):
    """score_adhoc_query (no postings index; term filter pushed below the
    aggregation) must produce byte-identical scores to the
    build_bm25_index + score_query path, including duplicate query
    tokens and docs matching only some terms."""
    from leann_rs_spark.operators.bm25 import score_adhoc_query

    texts = [
        "the quick brown fox jumps",
        "the lazy dog sleeps all day",
        "quick quick brown dogs run fast",
        "unrelated text about spark sql engines",
        "fox and dog play in the park",
    ]
    for query in ["quick fox", "dog dog quick", "spark", "zzz nothing"]:
        docs = _docs(spark, texts)
        p, d, t = build_bm25_index(docs)
        indexed = {
            r["doc_id"]: round(r["score"], 12)
            for r in score_query(p, d, t, query).collect()
        }
        adhoc = {
            r["doc_id"]: round(r["score"], 12)
            for r in score_adhoc_query(docs, query).collect()
        }
        assert adhoc == indexed, query


# ------------------------------------------------------------------- RRF


def test_rrf_fuse_hand_computed(spark):
    """Two 3-doc lists with one overlap; k0=60. doc 1 is rank 1 in both
    → 2/61; doc 0 is vec-rank 2 only → 1/62; doc 2 is bm25-rank 2 only
    → 1/62 (ties broken by id)."""
    from leann_rs_spark.operators.hybrid import rrf_fuse

    vec = spark.createDataFrame(
        [(1, 0.9), (0, 0.8)], "doc_id bigint, score double"
    )
    bm = spark.createDataFrame(
        [(1, 5.0), (2, 3.0)], "doc_id bigint, score double"
    )
    rows = rrf_fuse(vec, bm, k0=60).collect()
    assert [r["doc_id"] for r in rows] == [1, 0, 2]
    assert rows[0]["rrf"] == pytest.approx(2 / 61)
    assert rows[1]["rrf"] == pytest.approx(1 / 62)
    assert rows[1]["vec_rank"] == 2 and rows[1]["bm25_rank"] is None
    assert rows[2]["bm25_rank"] == 2 and rows[2]["vec_rank"] is None


def test_rrf_rank_ties_break_by_id(spark):
    """Equal 6-dp scores rank by id ASC — the cross-engine recipe."""
    from leann_rs_spark.operators.hybrid import rrf_fuse

    vec = spark.createDataFrame(
        [(7, 0.5), (3, 0.5)], "doc_id bigint, score double"
    )
    bm = spark.createDataFrame([], "doc_id bigint, score double")
    rows = {r["doc_id"]: r["vec_rank"] for r in rrf_fuse(vec, bm).collect()}
    assert rows[3] == 1 and rows[7] == 2


def test_rrf_empty_one_side(spark):
    from leann_rs_spark.operators.hybrid import rrf_fuse

    vec = spark.createDataFrame([(1, 0.9)], "doc_id bigint, score double")
    bm = spark.createDataFrame([], "doc_id bigint, score double")
    rows = rrf_fuse(vec, bm).collect()
    assert len(rows) == 1 and rows[0]["rrf"] == pytest.approx(1 / 61)
