"""Multimodal plumbing: schemas, batch shapes, explode, determinism —
the decode stub is validated against a pure-python/numpy reference."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from yamlpyowl_spark.operators.multimodal import (
    _keystream,
    decode_image,
    image_features,
    resize_images,
    sample_frames,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(spark, n=30).repartition(4).persist()


def test_media_schema(media):
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    row = media.filter(F.col("kind") == "image").first()
    assert row["meta"]["width"] * row["meta"]["height"] * row["meta"]["channels"] == len(row["data"])


def test_image_features_match_numpy_reference(spark, media):
    feats = {r["media_id"]: r for r in image_features(media).collect()}
    for r in media.filter(F.col("kind") == "image").collect():
        m = r["meta"]
        px = np.frombuffer(bytes(r["data"]), dtype=np.uint8).reshape(
            m["height"], m["width"], m["channels"]
        ).astype(np.float64)
        f = feats[r["media_id"]]
        assert f["mean_x100"] == int(np.floor(px.mean() * 100))
        assert f["std_x100"] == int(np.floor(px.std() * 100))
        assert f["n_pixels"] == m["width"] * m["height"]


def test_resize_composes(spark, media):
    small = resize_images(media, out_w=4, out_h=4)
    rows = small.collect()
    assert all(len(r["data"]) == 4 * 4 * 3 for r in rows)
    assert all(r["meta"]["width"] == 4 for r in rows)
    # resized output is itself a valid media table → features compose
    feats = image_features(small)
    assert feats.count() == len(rows)


def test_frame_sampling(spark, media):
    frames = sample_frames(media, every_n=2)
    vids = media.filter(F.col("kind") == "video").collect()
    got = frames.groupBy("media_id").count().collect()
    expect = {r["media_id"]: (r["meta"]["n_frames"] + 1) // 2 for r in vids}
    assert {r["media_id"]: r["count"] for r in got} == expect
    f = frames.first()
    assert len(f["frame_data"]) == 8 * 8 * 3


def test_decode_rejects_non_fake_payload():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n", 100, 100, 3)


def test_determinism_across_partitionings(spark):
    a = image_features(synthesize_media(spark, n=30).repartition(2)).collect()
    b = image_features(synthesize_media(spark, n=30).repartition(7)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_keystream_deterministic():
    assert _keystream("x", 100) == _keystream("x", 100)
    assert _keystream("x", 16) == hashlib.md5(b"x:0").digest()


def test_audio_features_match_sequential(spark):
    """Distributed mapInPandas audio features == sequential numpy over
    the same deterministic clips (the r5 audio twin of the image gate)."""
    import numpy as np

    from yamlpyowl_spark.operators.multimodal import (
        _keystream, audio_features, synthesize_media,
    )

    got = {
        r["media_id"]: (r["n_samples"], r["duration_sec"], r["mean_x100"], r["rms_x100"])
        for r in audio_features(synthesize_media(spark, n=12)).collect()
    }
    assert set(got) == {1, 4, 7, 10}  # i % 3 == 1
    for i in got:
        sr, secs = 8000, 1 + (i % 2)
        x = np.frombuffer(_keystream(f"42:aud:{i}", sr * secs), dtype=np.uint8).astype(float)
        assert got[i] == (
            x.size, x.size // sr,
            int(np.floor(x.mean() * 100)),
            int(np.floor(np.sqrt(np.mean(x * x)) * 100)),
        )


def test_decode_audio_rejects_non_synthetic(spark):
    import pytest

    from yamlpyowl_spark.operators.multimodal import decode_audio

    with pytest.raises(NotImplementedError, match="cannot decode format"):
        decode_audio(b"\x00\x01\x02", 8000)


def test_decode_audio_rejects_untagged_lucky_length(spark):
    # r5 advice #4: a NON-synthetic payload whose byte length happens
    # to divide the sample rate must not decode as garbage — the codec
    # TAG dispatches, not the length heuristic
    import pytest

    from yamlpyowl_spark.operators.multimodal import decode_audio

    with pytest.raises(NotImplementedError, match="'mp3'"):
        decode_audio(b"\xff" * 8000, 8000, fmt="mp3")


def _make_wav(samples, framerate=8000, nch=1, sampwidth=2):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(sampwidth)
        w.setframerate(framerate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def test_decode_audio_real_wav_pcm16():
    from yamlpyowl_spark.operators.multimodal import decode_audio

    x = (np.arange(16000, dtype=np.int64) * 37 % 20001 - 10000).astype(np.int16)
    got = decode_audio(_make_wav(x), 8000, fmt="wav")
    assert got.dtype == np.int16
    np.testing.assert_array_equal(got, x)


def test_decode_audio_real_wav_stereo_averages_to_mono():
    from yamlpyowl_spark.operators.multimodal import decode_audio

    left = np.array([100, 200, 300], dtype=np.int16)
    right = np.array([300, 400, 500], dtype=np.int16)
    inter = np.empty(6, dtype=np.int16)
    inter[0::2], inter[1::2] = left, right
    got = decode_audio(_make_wav(inter, nch=2), 8000, fmt="wav")
    np.testing.assert_allclose(got, [200.0, 300.0, 400.0])


def test_audio_features_over_real_wav(spark):
    # a real-WAV row through the same mapInPandas operator, verified
    # against the sequential-numpy oracle (the mm_audio_features shape)
    from yamlpyowl_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_features,
    )

    sr = 8000
    x = (np.arange(sr * 2, dtype=np.int64) * 91 % 4001 - 2000).astype(np.int16)
    rows = [
        (
            7,
            "audio",
            bytearray(_make_wav(x, framerate=sr)),
            (None, None, 1, sr, None, "wav"),
        )
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: tuple(r)[1:] for r in audio_features(media).collect()}
    xf = x.astype(np.float64)
    assert got[7] == (
        xf.size,
        xf.size // sr,
        int(np.floor(xf.mean() * 100)),
        int(np.floor(np.sqrt(np.mean(xf * xf)) * 100)),
    )
