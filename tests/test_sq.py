"""Scalar quantization (operators/sq.py): quantizer bounds, endpoint
exactness, reconstruction error, refine degradation, constant dims."""

import pytest
from pyspark.sql import functions as F

from leann_rs_spark.operators.search import exact_search
from leann_rs_spark.operators.sq import (
    sq8_encode,
    sq8_reconstruct_col,
    sq8_search,
    sq8_train,
)
from tests.conftest import SF_SMOKE

DIMS = 64


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


@pytest.fixture(scope="module")
def stats(emb):
    return sq8_train(emb, dims=DIMS)


def test_codes_in_byte_range(emb, stats):
    mins, rngs = stats
    bad = (
        sq8_encode(emb, mins, rngs)
        .filter(
            (F.size("qcode") != DIMS)
            | F.exists("qcode", lambda c: (c < 0) | (c > 255))
        )
        .count()
    )
    assert bad == 0


def test_endpoints_quantize_exactly(spark):
    """v = min → 0, v = max → 255; dequantized endpoints are exact."""
    rows = [(0, [0.0, -2.0]), (1, [10.0, 6.0]), (2, [5.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    mins, rngs = sq8_train(df, dims=2)
    assert mins == [0.0, -2.0] and rngs == [10.0, 8.0]
    out = {
        r["vec_id"]: (list(r["qcode"]), [float(x) for x in r["rv"]])
        for r in sq8_encode(df, mins, rngs)
        .withColumn("rv", sq8_reconstruct_col(F.col("qcode"), mins, rngs))
        .collect()
    }
    assert out[0][0] == [0, 0] and out[0][1] == [0.0, -2.0]
    assert out[1][0] == [255, 255] and out[1][1] == [10.0, 6.0]


def test_constant_dim_is_exact(spark):
    df = spark.createDataFrame(
        [(0, [3.5, 1.0]), (1, [3.5, 2.0])],
        "vec_id bigint, embedding array<double>",
    )
    mins, rngs = sq8_train(df, dims=2)
    assert rngs[0] == 0.0
    rows = (
        sq8_encode(df, mins, rngs)
        .withColumn("rv", sq8_reconstruct_col(F.col("qcode"), mins, rngs))
        .collect()
    )
    for r in rows:
        assert r["qcode"][0] == 0
        assert float(r["rv"][0]) == 3.5  # min + 0 = the constant itself


def test_reconstruction_error_bounded(emb, stats):
    """Per-component error ≤ range/255 by construction."""
    mins, rngs = stats
    codes = sq8_encode(emb, mins, rngs).join(
        emb.select("vec_id", "embedding"), "vec_id"
    )
    err = codes.select(
        F.aggregate(
            F.zip_with(
                sq8_reconstruct_col(F.col("qcode"), mins, rngs),
                F.col("embedding"),
                lambda a, b: F.abs(a - b.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, x),
        ).alias("e")
    ).agg(F.max("e")).first()[0]
    assert err <= max(rngs) / 255 + 1e-12


def test_full_refine_equals_exact(emb, stats):
    mins, rngs = stats
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 5).head()["embedding"]]
    n = emb.count()
    got = sq8_search(
        sq8_encode(emb, mins, rngs), mins, rngs, qv,
        k=10, refine=(n // 10) + 1, vectors=emb,
    ).collect()
    exact = exact_search(emb, qv, k=10, metric="ip").collect()
    assert [(r["vec_id"], r["score"]) for r in got] == [
        (r["vec_id"], r["score"]) for r in exact
    ]


def test_sq8_topk_close_to_exact_unrefined(emb, stats):
    """SQ8 at 8 bits is high-fidelity: the unrefined top-10 should
    overlap the exact top-10 heavily (≥ 8/10 on this corpus)."""
    mins, rngs = stats
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 5).head()["embedding"]]
    got = {r["vec_id"] for r in sq8_search(
        sq8_encode(emb, mins, rngs), mins, rngs, qv, k=10
    ).collect()}
    exact = {r["vec_id"] for r in exact_search(emb, qv, k=10, metric="ip").collect()}
    assert len(got & exact) >= 8


def test_refine_requires_vectors(emb, stats):
    mins, rngs = stats
    with pytest.raises(ValueError):
        sq8_search(sq8_encode(emb, mins, rngs), mins, rngs, [0.0] * 64, refine=2)


def test_encode_plan_is_shuffle_free(emb, stats):
    mins, rngs = stats
    plan = (
        sq8_encode(emb, mins, rngs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
