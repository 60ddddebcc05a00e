"""Multimodal binary-column plumbing + real numpy BMP/WAV codecs."""

import numpy as np
import pytest

from federated_gcn_spark.functions.codecs import (
    audio_frame_features,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    image_grid_features,
)
from federated_gcn_spark.operators.multimodal import (
    audio_chunk_stats,
    frame_sample_plan,
    image_features,
    make_media_table,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNGfakebytes", (64, 64, 3, None, None, "png")),
        (2, "image", b"", (8, 8, 1, None, None, "png")),
        (3, "video", b"fakevideo", (640, 480, 3, None, 25, "mp4")),
        (4, "audio", b"a" * 2500, (None, None, 1, 16000, None, "wav")),
    ]
    return make_media_table(spark, rows)


def test_image_features_shape_and_determinism(spark, media):
    out = {r["media_id"]: r for r in image_features(media, n_features=8).collect()}
    assert len(out[1]["features"]) == 8
    assert out[1]["decoded_ok"] and out[2]["decoded_ok"]
    again = {r["media_id"]: r for r in image_features(media, n_features=8).collect()}
    assert out[1]["features"] == again[1]["features"]  # seeded fake decode
    assert out[1]["features"] != out[2]["features"]


def test_bmp_roundtrip_exact():
    # encoder → decoder is the identity on pixels, including non-multiple-
    # of-4 widths (row padding) — real byte-level parsing, no PIL
    rng = np.random.default_rng(3)
    for h, w in [(5, 7), (1, 1), (16, 16), (3, 10)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_bmp_rejects_garbage_and_truncation():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    payload = encode_bmp(px)
    with pytest.raises(ValueError):
        decode_bmp(b"notabmp")
    with pytest.raises(ValueError):
        decode_bmp(payload[: len(payload) // 2])


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(4)
    mono = rng.integers(-32768, 32767, size=1000, dtype=np.int16)
    rate, out = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and np.array_equal(out[:, 0], mono)
    stereo = rng.integers(-32768, 32767, size=(500, 2), dtype=np.int16)
    rate, out = decode_wav(encode_wav(stereo, 44100))
    assert rate == 44100 and np.array_equal(out, stereo)


def test_real_decoder_end_to_end(spark):
    """VERDICT r01 #8: decoder="real" decodes genuine BMP/WAV bytes inside
    the mapInPandas pipeline; corrupt rows degrade to decoded_ok=False."""
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    pcm = (np.sin(np.linspace(0, 40, 1600)) * 20000).astype(np.int16)
    rows = [
        (1, "image", encode_bmp(px), (8, 8, 3, None, None, "bmp")),
        (2, "audio", encode_wav(pcm, 16000), (None, None, 1, 16000, None, "wav")),
        (3, "image", b"corruptbytes", (0, 0, 0, None, None, "bin")),
    ]
    media = make_media_table(spark, rows)
    out = {r["media_id"]: r for r in image_features(media, n_features=16, decoder="real").collect()}
    assert out[1]["decoded_ok"] and out[2]["decoded_ok"]
    assert not out[3]["decoded_ok"] and out[3]["features"] == [0.0] * 16
    np.testing.assert_allclose(
        out[1]["features"], image_grid_features(px, 16), rtol=1e-12
    )
    _, samples = decode_wav(encode_wav(pcm, 16000))
    np.testing.assert_allclose(
        out[2]["features"], audio_frame_features(samples, 16), rtol=1e-12
    )
    # grid features really are local means: a constant image → constant vector
    flat = np.full((6, 6, 3), 200, dtype=np.uint8)
    np.testing.assert_allclose(image_grid_features(flat, 4), [200 / 255.0] * 4)


def test_encode_decode_features_numpy_parity_and_errors(spark):
    """encode_decode_features must equal a direct numpy computation on
    the generated values (round trip through REAL bytes is lossless) and
    isolate per-row failures (short vals array -> decoded_ok=0)."""
    from federated_gcn_spark.operators.multimodal import encode_decode_features

    rng = np.random.default_rng(11)
    img_vals = rng.integers(0, 256, size=192).tolist()
    aud_vals = rng.integers(0, 65536, size=128).tolist()
    gen = spark.createDataFrame(
        [
            (1, "image", img_vals),
            (2, "audio", aud_vals),
            (3, "image", [1, 2, 3]),  # cannot reshape -> per-row failure
        ],
        "media_id long, kind string, vals array<int>",
    )
    out = {r["media_id"]: r for r in encode_decode_features(gen).collect()}
    px = np.array(img_vals, dtype=np.int64).reshape(8, 8, 3)
    luma = px @ np.array([299, 587, 114])
    img_ref = luma.reshape(2, 4, 2, 4).sum(axis=(1, 3)).reshape(4)
    mono = np.array(aud_vals, dtype=np.int64) - 32768
    aud_ref = np.abs(mono).reshape(4, 32).sum(axis=1)
    assert [out[1][f"f{i}"] for i in range(4)] == img_ref.tolist()
    assert [out[2][f"f{i}"] for i in range(4)] == aud_ref.tolist()
    assert out[1]["decoded_ok"] == 1 and out[1]["n_payload_bytes"] == 246
    assert out[2]["decoded_ok"] == 1 and out[2]["n_payload_bytes"] == 300
    assert out[3]["decoded_ok"] == 0 and out[3]["n_payload_bytes"] == 0
    assert [out[3][f"f{i}"] for i in range(4)] == [0, 0, 0, 0]


def test_frame_sample_plan(spark, media):
    frames = frame_sample_plan(media, every_n=10).collect()
    assert [r["frame_index"] for r in frames] == [0, 10, 20]
    assert all(r["media_id"] == 3 for r in frames)


def test_audio_chunk_stats(spark, media):
    chunks = audio_chunk_stats(media, chunk_bytes=1024).orderBy("chunk_index").collect()
    assert [r["n_bytes"] for r in chunks] == [1024, 1024, 452]  # 2500 bytes
    assert all(r["media_id"] == 4 for r in chunks)


def test_resize_images_nearest_neighbor_exact(spark):
    """Downsampling a known gradient must pick exactly the pixels the
    integer nearest-neighbor map selects, and re-encode losslessly;
    garbage payloads come back flagged, not failed."""
    import numpy as np

    from federated_gcn_spark.functions.codecs import decode_bmp, encode_bmp
    from federated_gcn_spark.operators.multimodal import resize_images

    px = np.zeros((8, 6, 3), dtype=np.uint8)
    for r in range(8):
        for c in range(6):
            px[r, c] = (r * 30, c * 40, (r + c) * 10)
    good = encode_bmp(px)
    media = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"not a bmp"))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in resize_images(media, 4, 3).collect()}
    assert rows[2]["resized_ok"] is False and bytes(rows[2]["payload"]) == b""
    assert rows[1]["resized_ok"] is True
    out = decode_bmp(bytes(rows[1]["payload"]))
    assert out.shape == (4, 3, 3)
    r_idx = (np.arange(4) * 8) // 4
    c_idx = (np.arange(3) * 6) // 3
    np.testing.assert_array_equal(out, px[r_idx][:, c_idx])
