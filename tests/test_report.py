"""corpus_report (operators/report.py): metric frame shape, NULL-text
fold, empty corpus, dup-rate arithmetic. Oracle parity is gated by
x_analyze_report."""

from pyspark.sql import functions as F

from leann_rs_spark.operators.report import corpus_report


def _metrics(df):
    return {r["metric"]: r["value"] for r in df.collect()}


def test_report_headline_metrics(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),  # exact dup of 1
            (3, "one two three four five six"),
            (4, None),  # null text folds to ''
        ],
        "doc_id bigint, text string",
    )
    m = _metrics(corpus_report(docs, ngram_k=5))
    assert m["n_docs"] == 4.0
    # 4+4+6+0 BM25 tokens ("one"/"two"... all length>1; null -> 0)
    assert m["total_tokens"] == 14.0
    assert m["exact_dup_rate"] == 0.25  # 3 distinct hashes / 4 docs
    assert 0.0 <= m["gopher_keep_rate"] <= 1.0
    assert any(k.startswith("lang:") for k in m)
    assert any(k.startswith("ngram:") for k in m)
    # exact percentile of [0, 4, 4, 6] at p50 = 4.0
    assert m["tokens_p50"] == 4.0


def test_report_empty_corpus(spark):
    docs = spark.createDataFrame([], "doc_id bigint, text string")
    m = _metrics(corpus_report(docs))
    assert m == {"n_docs": 0.0}


def test_report_sorted_and_typed(spark):
    docs = spark.createDataFrame(
        [(1, "some reasonable text here")], "doc_id bigint, text string"
    )
    rep = corpus_report(docs)
    assert rep.schema.simpleString() == "struct<metric:string,value:double>"
    metrics = [r["metric"] for r in rep.collect()]
    assert metrics == sorted(metrics)
