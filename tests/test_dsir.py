"""DSIR importance resampling (operators/dsir.py): weight direction,
Gumbel selection semantics, determinism, and degenerate inputs."""

import math

import pytest
from pyspark.sql import functions as F

from leann_rs_spark.operators.dsir import (
    dsir_log_ratio,
    dsir_select,
    dsir_weights,
)
from tests.conftest import SF_SMOKE

B = 512  # small feature space keeps the smoke corpus dense


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


@pytest.fixture(scope="module")
def target(docs):
    return docs.filter(F.col("source") == "src1")


def test_target_docs_score_higher_on_average(docs, target):
    """The defining property: documents FROM the target domain should
    receive higher importance weights than the rest, on average."""
    w = dsir_weights(docs, target, buckets=B).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    rows = w.groupBy((F.col("source") == "src1").alias("is_t")).agg(
        F.avg("log_weight").alias("m")
    ).collect()
    means = {r["is_t"]: r["m"] for r in rows}
    assert means[True] > means[False]


def test_low_temperature_degrades_to_hard_topn(docs, target):
    """T→0 makes the Gumbel noise negligible: selection = hard top-n
    by log_weight."""
    n = 20
    sel = {
        r["doc_id"]
        for r in dsir_select(
            docs, target, n=n, buckets=B, temperature=1e-9
        ).collect()
    }
    hard = {
        r["doc_id"]
        for r in dsir_weights(docs, target, buckets=B)
        .orderBy(F.col("log_weight").desc(), F.col("doc_id").asc())
        .limit(n)
        .collect()
    }
    assert sel == hard


def test_selection_deterministic_and_seed_sensitive(docs, target):
    a = {r["doc_id"] for r in dsir_select(docs, target, 30, buckets=B).collect()}
    b = {r["doc_id"] for r in dsir_select(docs, target, 30, buckets=B).collect()}
    c = {
        r["doc_id"]
        for r in dsir_select(docs, target, 30, buckets=B, seed=7).collect()
    }
    assert a == b
    assert a != c  # 2^-30-scale collision odds; a match means a seed bug


def test_repartition_invariance(docs, target):
    a = {r["doc_id"] for r in dsir_select(docs, target, 25, buckets=B).collect()}
    b = {
        r["doc_id"]
        for r in dsir_select(docs.repartition(13), target, 25, buckets=B).collect()
    }
    assert a == b


def test_empty_doc_gets_zero_weight(spark, target):
    extra = spark.createDataFrame(
        [(999999, ""), (999998, "!!! ???")], "doc_id bigint, text string"
    )
    w = {
        r["doc_id"]: (r["n_grams"], r["log_weight"])
        for r in dsir_weights(extra, target, buckets=B).collect()
    }
    assert w[999999] == (0, 0.0)
    assert w[999998] == (0, 0.0)


def test_log_ratio_bounded_and_finite(docs, target):
    rows = dsir_log_ratio(docs, target, buckets=B).collect()
    assert 0 < len(rows) <= B
    assert all(math.isfinite(r["log_ratio"]) for r in rows)


def test_weights_cover_every_raw_doc(docs, target):
    n_docs = docs.count()
    w = dsir_weights(docs, target, buckets=B)
    assert w.count() == n_docs
    assert w.select("doc_id").distinct().count() == n_docs
