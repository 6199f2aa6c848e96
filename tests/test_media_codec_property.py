"""Property tests for the pure-Python media codecs (GIF LZW, WAV PCM):
round-trip identity over random inputs, totality (None, never an
exception) over corrupted bytes. Driver-side only — no Spark session."""

import numpy as np
from hypothesis import given, settings, strategies as st


@st.composite
def gif_clips(draw):
    w = draw(st.integers(1, 24))
    h = draw(st.integers(1, 18))
    n_frames = draw(st.integers(1, 4))
    n_colors = draw(st.integers(1, 16))
    seed = draw(st.integers(0, 2 ** 16))
    rng = np.random.RandomState(seed)
    palette = rng.randint(0, 256, (n_colors, 3)).astype(np.uint8)
    frames = [
        palette[rng.randint(0, n_colors, (h, w))] for _ in range(n_frames)
    ]
    delays = [draw(st.integers(0, 5000)) // 10 * 10 for _ in range(n_frames)]
    return frames, delays


@settings(max_examples=40, deadline=None)
@given(gif_clips())
def test_gif_roundtrip_property(clip):
    from leann_rs_spark.operators.multimodal import (
        gif_decode_frames,
        gif_encode,
        gif_scan,
    )

    frames, delays = clip
    blob = gif_encode(frames, delays)
    got_delays, w, h = gif_scan(blob)
    assert got_delays == delays
    assert (h, w) == frames[0].shape[:2]
    dec = gif_decode_frames(blob)
    assert len(dec) == len(frames)
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=400))
def test_gif_decoder_total_over_garbage(data):
    from leann_rs_spark.operators.multimodal import (
        gif_decode_frames,
        gif_scan,
    )

    # arbitrary bytes (including GIF-magic-prefixed garbage) must never
    # raise — None or a valid frame list only
    for blob in (data, b"GIF89a" + data, b"GIF87a" + data):
        meta = gif_scan(blob)
        assert meta is None or isinstance(meta[0], list)
        dec = gif_decode_frames(blob)
        assert dec is None or all(f.ndim == 3 for f in dec)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 2000),
    st.sampled_from([4000, 8000, 16000, 44100]),
    st.integers(0, 2 ** 16),
)
def test_wav_roundtrip_property(n, rate, seed):
    from leann_rs_spark.operators.multimodal import wav_decode, wav_encode

    rng = np.random.RandomState(seed)
    x = np.clip(rng.randn(n) * 0.3, -1, 1)
    y, got_rate = wav_decode(wav_encode(x, rate))
    assert got_rate == rate and len(y) == n
    assert float(np.abs(y - x).max()) < 1e-4  # 16-bit quantization bound


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=300))
def test_wav_decoder_total_over_garbage(data):
    from leann_rs_spark.operators.multimodal import (
        audio_energy_hash_py,
        audio_features_py,
        wav_decode,
    )

    for blob in (data, b"RIFF" + data, b"RIFF\x00\x00\x00\x00WAVE" + data):
        dec = wav_decode(blob)
        assert dec is None or len(dec) == 2
        f = audio_features_py(blob)
        assert f is None or f["duration_ms"] >= 0
        h = audio_energy_hash_py(blob)
        assert h is None or 0 <= h < 2 ** 63


@settings(max_examples=30, deadline=None)
@given(gif_clips(), st.integers(0, 40))
def test_gif_truncation_never_raises(clip, cut):
    from leann_rs_spark.operators.multimodal import (
        gif_decode_frames,
        gif_scan,
    )

    frames, delays = clip
    from leann_rs_spark.operators.multimodal import gif_encode

    blob = gif_encode(frames, delays)
    trunc = blob[: max(0, len(blob) - cut)]
    gif_scan(trunc)
    dec = gif_decode_frames(trunc)
    assert dec is None or all(f.shape == frames[0].shape for f in dec)
