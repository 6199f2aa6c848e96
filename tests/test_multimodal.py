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


def test_real_engine_total_over_text_bytes(media):
    # text bytes are not any sniffable media format -> NULL fields,
    # rows kept (the real engine is total over dirty corpora)
    rows = decode_media(media.limit(5), engine="real").collect()
    assert len(rows) == 5
    assert all(r["width"] is None and r["duration_ms"] is None for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)


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


# ---------------------------------------------------------------------------
# real engine: header-level decode (format sniffing + stdlib wave)
# ---------------------------------------------------------------------------

def _png(w, h):
    import struct
    import zlib

    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr)) + chunk
        + struct.pack(">I", zlib.crc32(chunk))
    )


def _gif(w, h):
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6


def _jpeg(w, h):
    import struct

    # SOI + APP0 stub + SOF0 with dims
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def _wav(ms, rate=8000):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(rate)
        w.writeframes(b"\x00" * int(rate * ms / 1000))
    return buf.getvalue()


def test_sniffers():
    from leann_rs_spark.operators.multimodal import sniff_image_dims, wav_duration_ms

    assert sniff_image_dims(_png(640, 480)) == (640, 480)
    assert sniff_image_dims(_gif(320, 200)) == (320, 200)
    assert sniff_image_dims(_jpeg(1024, 768)) == (1024, 768)
    assert sniff_image_dims(b"not an image") == (None, None)
    assert sniff_image_dims(b"") == (None, None)
    assert wav_duration_ms(_wav(1500)) == 1500
    assert wav_duration_ms(b"RIFFxxxxWAVEgarbage") is None
    assert wav_duration_ms(b"junk") is None


def test_real_engine_decodes_headers(spark):
    from pyspark.sql import Row

    from leann_rs_spark.operators.multimodal import decode_media

    media = spark.createDataFrame(
        [
            Row(media_id=0, modality="image", content=bytearray(_png(12, 34)), source="a"),
            Row(media_id=1, modality="image", content=bytearray(_jpeg(56, 78)), source="b"),
            Row(media_id=2, modality="audio", content=bytearray(_wav(2500)), source="c"),
            Row(media_id=3, modality="image", content=bytearray(b"corrupt"), source="d"),
            Row(media_id=4, modality="video", content=bytearray(b"novideo"), source="e"),
        ],
        schema="media_id long, modality string, content binary, source string",
    )
    got = {
        r["media_id"]: (r["width"], r["height"], r["duration_ms"], r["n_bytes"])
        for r in decode_media(media, engine="real").collect()
    }
    assert got[0][:2] == (12, 34)
    assert got[1][:2] == (56, 78)
    assert got[2][2] == 2500
    assert got[3][:3] == (None, None, None)  # dirty bytes -> NULLs, row kept
    assert got[4][:3] == (None, None, None)  # no pure-python video codec
    assert all(v[3] > 0 for v in got.values())


# --- real BMP pixel path ---------------------------------------------------

def _gradient_bmp(w, h):
    import numpy as np

    from leann_rs_spark.operators.multimodal import bmp_encode

    arr = np.zeros((h, w, 3), dtype=np.uint8)
    arr[:, :, 0] = (np.arange(h)[:, None] * 255 // max(h - 1, 1))
    arr[:, :, 1] = (np.arange(w)[None, :] * 255 // max(w - 1, 1))
    arr[:, :, 2] = 7
    return arr, bmp_encode(arr)


def test_bmp_roundtrip_identity():
    import numpy as np

    from leann_rs_spark.operators.multimodal import bmp_decode

    arr, blob = _gradient_bmp(13, 9)  # odd width exercises row padding
    back = bmp_decode(blob)
    assert back is not None and np.array_equal(back, arr)


def test_bmp_sniff_dims():
    from leann_rs_spark.operators.multimodal import sniff_image_dims

    _, blob = _gradient_bmp(33, 21)
    assert sniff_image_dims(blob) == (33, 21)


def test_nn_resize_reference():
    import numpy as np

    from leann_rs_spark.operators.multimodal import nn_resize

    arr, _ = _gradient_bmp(10, 6)
    out = nn_resize(arr, 5, 3)
    assert out.shape == (3, 5, 3)
    for i in range(3):
        for j in range(5):
            assert np.array_equal(out[i, j], arr[i * 6 // 3, j * 10 // 5])


def test_resize_images_real_pixels(spark):
    import numpy as np

    from leann_rs_spark.operators.multimodal import bmp_decode, resize_images

    _, big = _gradient_bmp(64, 32)
    _, small = _gradient_bmp(8, 8)
    media = spark.createDataFrame(
        [(1, bytearray(big)), (2, bytearray(small)), (3, bytearray(b"not a bmp"))],
        "media_id bigint, content binary",
    )
    rows = {r["media_id"]: r for r in resize_images(media, 16, 16).collect()}
    assert rows[1]["width"] == 64 and rows[1]["height"] == 32
    assert (rows[1]["out_w"], rows[1]["out_h"]) == (16, 8)  # aspect fit
    out1 = bmp_decode(bytes(rows[1]["content"]))
    assert out1.shape == (8, 16, 3)
    # upscale-capped: 8x8 fits within 16x16 -> scale 2
    assert (rows[2]["out_w"], rows[2]["out_h"]) == (16, 16)
    # dirty bytes keep their row with NULL output
    assert rows[3]["content"] is None and rows[3]["out_w"] is None


def test_bmp_corrupt_headers_rejected():
    from leann_rs_spark.operators.multimodal import bmp_decode, sniff_image_dims

    _, blob = _gradient_bmp(6, 4)
    neg_w = bytearray(blob)
    neg_w[18:22] = (-100).to_bytes(4, "little", signed=True)
    assert sniff_image_dims(bytes(neg_w)) == (None, None)
    assert bmp_decode(bytes(neg_w)) is None
    bad_off = bytearray(blob)
    bad_off[10:14] = (2).to_bytes(4, "little")  # pixel data inside header
    assert bmp_decode(bytes(bad_off)) is None


# --- PIL-widened decode tier (pypdf pattern) --------------------------------

class _FakePILImage:
    """Minimal PIL.Image shim: open() parses BMP via our own kernel,
    so the PIL code path executes for real in a container without
    Pillow. Tests pin that (a) decode_image routes through PIL when
    importable and (b) results equal the no-PIL tier — the determinism
    contract that lets the two tiers coexist in one fleet."""

    calls = 0

    class _Im:
        def __init__(self, arr):
            self._arr = arr

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def convert(self, mode):
            assert mode == "RGB"
            return self

        def __array__(self, dtype=None, copy=None):
            import numpy as np

            return np.asarray(self._arr, dtype=dtype)

    @classmethod
    def open(cls, fh):
        from leann_rs_spark.operators.multimodal import bmp_decode

        cls.calls += 1
        arr = bmp_decode(fh.read())
        if arr is None:
            raise OSError("cannot identify image file")
        return cls._Im(arr)


def _with_fake_pil(monkeypatch):
    import sys
    import types

    pil = types.ModuleType("PIL")
    pil.Image = _FakePILImage
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", _FakePILImage)


def test_decode_image_without_pil_is_bmp_kernel():
    import numpy as np

    from leann_rs_spark.operators.multimodal import (
        bmp_decode,
        decode_image,
        pil_image,
    )

    assert pil_image() is None  # this container has no Pillow
    arr, blob = _gradient_bmp(13, 9)
    assert np.array_equal(decode_image(blob), bmp_decode(blob))
    assert decode_image(b"not an image") is None


def test_decode_image_with_pil_routes_and_matches(monkeypatch):
    import numpy as np

    from leann_rs_spark.operators import multimodal

    arr, blob = _gradient_bmp(13, 9)
    without = multimodal.decode_image(blob)
    _with_fake_pil(monkeypatch)
    assert multimodal.pil_image() is _FakePILImage
    before = _FakePILImage.calls
    with_pil = multimodal.decode_image(blob)
    assert _FakePILImage.calls == before + 1  # PIL tier actually ran
    assert np.array_equal(with_pil, without) and np.array_equal(with_pil, arr)


def test_decode_image_pil_failure_falls_back(monkeypatch):
    import numpy as np

    from leann_rs_spark.operators import multimodal

    _with_fake_pil(monkeypatch)
    arr, blob = _gradient_bmp(8, 8)

    def boom(fh):
        raise OSError("no codec")

    monkeypatch.setattr(_FakePILImage, "open", boom)
    assert np.array_equal(multimodal.decode_image(blob), arr)


def test_real_ahash_kernel_both_tiers(monkeypatch):
    from leann_rs_spark.operators import multimodal

    arr, blob = _gradient_bmp(32, 24)
    h_no_pil = multimodal.real_ahash_py(blob)
    assert isinstance(h_no_pil, int) and 0 < h_no_pil < 2**63
    assert multimodal.real_ahash_py(b"junk") is None
    _with_fake_pil(monkeypatch)
    assert multimodal.real_ahash_py(blob) == h_no_pil  # tier-invariant


def test_media_ahash_real_engine(spark):
    from leann_rs_spark.operators.multimodal import media_ahash, real_ahash_py

    _, blob_a = _gradient_bmp(32, 24)
    _, blob_b = _gradient_bmp(16, 12)
    media = spark.createDataFrame(
        [(1, bytearray(blob_a)), (2, bytearray(blob_b)), (3, bytearray(b"x"))],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r["ahash"]
            for r in media_ahash(media, engine="real").collect()}
    assert rows[1] == real_ahash_py(blob_a)
    assert rows[2] == real_ahash_py(blob_b)
    assert rows[3] is None
    # same gradient at two scales: nn-resize to the same 8x8 grid makes
    # the perceptual hashes near-identical (that is the point of aHash)
    assert bin(rows[1] ^ rows[2]).count("1") <= 8
