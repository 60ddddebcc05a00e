"""Multimodal binary-column plumbing (stubbed codecs, real dataflow)."""

import pytest

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


def test_real_decoder_is_marked_stub(spark, media):
    with pytest.raises(NotImplementedError):
        image_features(media, decoder="real")


def test_frame_sample_plan(spark, media):
    frames = frame_sample_plan(media, every_n=10).collect()
    assert [r["frame_index"] for r in frames] == [0, 10, 20]
    assert all(r["media_id"] == 3 for r in frames)


def test_audio_chunk_stats(spark, media):
    chunks = audio_chunk_stats(media, chunk_bytes=1024).orderBy("chunk_index").collect()
    assert [r["n_bytes"] for r in chunks] == [1024, 1024, 452]  # 2500 bytes
    assert all(r["media_id"] == 4 for r in chunks)
