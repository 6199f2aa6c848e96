"""Multimodal plumbing: schema/batch shape real, decode deterministic-fake."""

import pytest
from pyspark.sql import functions as F

from leann_rs_spark.operators.multimodal import (
    decode_media,
    duckdb_media_features,
    frame_sample,
    media_from_documents,
    resize_plan,
)

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").filter(
        F.col("doc_id") < 60
    )
    return media_from_documents(docs).cache()


@pytest.fixture(scope="module")
def features(media):
    return decode_media(media).cache()


def test_media_schema(media):
    row = media.head()
    assert isinstance(row["content"], (bytes, bytearray))
    mods = {r["modality"] for r in media.select("modality").distinct().collect()}
    assert mods == {"image", "audio", "video"}


def test_fake_decode_matches_oracle(spark, features, duck):
    got = {
        r["media_id"]: (
            r["modality"], r["n_bytes"], r["fingerprint"],
            r["width"], r["height"], r["duration_ms"],
        )
        for r in features.collect()
    }
    want = {
        int(r[0]): (r[1], int(r[2]), r[3],
                    None if r[4] is None else int(r[4]),
                    None if r[5] is None else int(r[5]),
                    None if r[6] is None else int(r[6]))
        for r in duck.sql(
            duckdb_media_features() + " WHERE doc_id < 60"
        ).fetchall()
    }
    assert got == want


def test_modality_metadata_nulls(features):
    for r in features.collect():
        if r["modality"] == "image":
            assert r["width"] is not None and r["duration_ms"] is None
        elif r["modality"] == "audio":
            assert r["width"] is None and r["duration_ms"] is not None
        else:
            assert r["width"] is not None and r["duration_ms"] is not None


def test_real_engine_is_marked_stub(media):
    with pytest.raises(Exception) as ei:
        decode_media(media.limit(1), engine="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_frame_sample_counts(features):
    frames = frame_sample(features, every_ms=1000, max_frames=32)
    per = frames.groupBy("media_id").agg(
        F.count("*").alias("n"), F.max("timestamp_ms").alias("tmax")
    )
    joined = per.join(features, "media_id").collect()
    assert joined
    for r in joined:
        expect = min(r["duration_ms"] // 1000 + 1, 32)
        assert r["n"] == expect
        assert r["tmax"] == (r["n"] - 1) * 1000


def test_resize_plan_fits_target(features):
    out = resize_plan(features, 224, 224).collect()
    assert out
    for r in out:
        assert 1 <= r["out_w"] <= 224 and 1 <= r["out_h"] <= 224
        assert max(r["out_w"], r["out_h"]) >= 16  # aspect-fit really scaled
