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


# ---------------------------------------------------------------------------
# round 6: real PNG / PPM decode behind decode_image
# ---------------------------------------------------------------------------


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    import struct
    import zlib as _z

    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", _z.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _make_png(px: np.ndarray, filters=None) -> bytes:
    """Independent tiny PNG ENCODER (forward filtering per RFC 2083
    §6.6) — decode must invert it exactly, so the round-trip is a real
    check, not shared logic."""
    import struct
    import zlib as _z

    h, w, c = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros((w, c), dtype=np.int16)
    for y, f in enumerate(filters):
        line = px[y].astype(np.int16)
        flat, pflat = line.reshape(-1), prev.reshape(-1)
        out = np.empty(w * c, dtype=np.int16)
        for i in range(w * c):
            a = int(flat[i - c]) if i >= c else 0
            b = int(pflat[i])
            cc = int(pflat[i - c]) if (i >= c and y > 0) else 0
            if f == 0:
                out[i] = flat[i]
            elif f == 1:
                out[i] = (flat[i] - a) % 256
            elif f == 2:
                out[i] = (flat[i] - b) % 256
            elif f == 3:
                out[i] = (flat[i] - (a + b) // 2) % 256
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                out[i] = (flat[i] - pred) % 256
        raw += bytes([f]) + out.astype(np.uint8).tobytes()
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _rng_pixels(h, w, c, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, c), dtype=np.uint8).astype(np.uint8)


def test_decode_image_png_all_filter_types():
    from yamlpyowl_spark.operators.multimodal import decode_image

    px = _rng_pixels(5, 7, 3, seed=3)
    data = _make_png(px, filters=[0, 1, 2, 3, 4])
    np.testing.assert_array_equal(decode_image(data, 7, 5, 3), px)


def test_decode_image_png_gray_and_rgba():
    from yamlpyowl_spark.operators.multimodal import decode_image

    g = _rng_pixels(4, 4, 1, seed=5)
    np.testing.assert_array_equal(
        decode_image(_make_png(g, filters=[4, 3, 2, 1]), 4, 4, 1), g
    )
    rgba = _rng_pixels(3, 6, 4, seed=6)
    np.testing.assert_array_equal(
        decode_image(_make_png(rgba, filters=[1, 4, 2]), 6, 3, 4), rgba
    )


def test_decode_image_png_metadata_mismatch_is_loud():
    from yamlpyowl_spark.operators.multimodal import decode_image

    px = _rng_pixels(4, 4, 3)
    with pytest.raises(ValueError, match="refusing to guess"):
        decode_image(_make_png(px), 8, 8, 3)


def test_decode_image_png_unsupported_depth_is_loud():
    import struct
    import zlib as _z

    from yamlpyowl_spark.operators.multimodal import decode_image

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)  # palette
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(b"\x00\x00\x00"))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="color_type=3"):
        decode_image(data, 2, 2, 3)


def test_decode_image_ppm_with_comment():
    from yamlpyowl_spark.operators.multimodal import decode_image

    px = _rng_pixels(3, 5, 3, seed=9)
    data = b"P6\n# a comment line\n5 3\n255\n" + px.tobytes()
    np.testing.assert_array_equal(decode_image(data, 5, 3, 3), px)


def test_image_features_over_real_png(spark):
    # a real-PNG row through the same mapInPandas operator, verified
    # against the sequential-numpy oracle (the real-WAV pattern)
    from yamlpyowl_spark.operators.multimodal import MEDIA_SCHEMA, image_features

    px = _rng_pixels(6, 9, 3, seed=11)
    rows = [
        (
            13,
            "image",
            bytearray(_make_png(px, filters=[2, 4, 1, 3, 0, 4])),
            (9, 6, 3, None, None, "png"),
        )
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: tuple(r)[1:] for r in image_features(media).collect()}
    xf = px.astype(np.float64)
    assert got[13] == (
        int(np.floor(xf.mean() * 100)),
        int(np.floor(xf.std() * 100)),
        54,
    )
