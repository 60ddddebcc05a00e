"""Multimodal (image/audio/video) column operators (driver extension §2.10).

Design: media are opaque BINARY payloads + a typed metadata struct —
the parquet-native layout for multimodal training data:

    media(media_id BIGINT, kind STRING, payload BINARY,
          meta STRUCT<width INT, height INT, channels INT,
                      sample_rate INT, n_frames INT, format STRING>)

All compute runs as Arrow-batched ``mapInPandas`` — the payload bytes
stream through in columnar batches, partitioning is whatever the table
already has, and each operator declares an explicit output schema.

The decode kernel is pluggable: ``decoder=None`` uses a deterministic
fake (payload-hash-seeded) for plumbing tests; ``decoder="real"``
decodes real bytes with the dependency-free numpy codecs in
functions/codecs.py (24-bit BMP → grayscale grid pooling, PCM-16 WAV →
frame RMS energies — magic-byte dispatch, per-row failure isolation);
any callable ``decoder(payload) -> np.ndarray`` swaps in a heavyweight
codec (PIL/ffmpeg) without touching the dataflow.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_FIELDS = (
    "width int, height int, channels int, sample_rate int, n_frames int, format string"
)
MEDIA_SCHEMA = f"media_id long, kind string, payload binary, meta struct<{MEDIA_META_FIELDS}>"


def make_media_table(spark, rows) -> DataFrame:
    """rows: (media_id, kind, payload: bytes, meta dict-like tuple)."""
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_pixels(payload: bytes, n: int) -> np.ndarray:
    """Deterministic stand-in decode: bytes → seeded uniform floats."""
    seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:8], "big")
    return np.random.default_rng(seed).random(n)


def image_features(
    media: DataFrame,
    n_features: int = 16,
    decoder=None,
    batch_hint: int = 256,
) -> DataFrame:
    """payload → fixed-width feature vector (decode + feature-extract).

    Output: (media_id, features ARRAY<DOUBLE>, decoded_ok BOOLEAN).
    Real pipeline shape: the decoder sees raw bytes per row, emits a
    float vector; Arrow moves the binary column in batches.
    """
    if decoder == "real":
        from federated_gcn_spark.functions.codecs import real_media_features

        decode = lambda payload: real_media_features(payload, n_features)  # noqa: E731
    else:
        decode = decoder or (lambda payload: _fake_pixels(payload, n_features))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ok = [], []
            for payload in pdf["payload"]:
                try:
                    feats.append([float(x) for x in decode(payload)][:n_features])
                    ok.append(True)
                except Exception:
                    feats.append([0.0] * n_features)
                    ok.append(False)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats, "decoded_ok": ok}
            )

    return media.mapInPandas(
        run, schema="media_id long, features array<double>, decoded_ok boolean"
    )


def encode_decode_features(gen: DataFrame) -> DataFrame:
    """Value array → REAL media bytes → real decode → integer-exact
    pooled features.  Input ``gen``: (media_id LONG, kind STRING, vals
    ARRAY<INT>) where vals are pixel bytes (image: 8*8*3 values in
    0..255) or unsigned 16-bit sample codes (audio: 128 values in
    0..65535).

    The kernel ENCODEs each row into genuine on-disk bytes (24-bit BMP /
    PCM-16 WAV via functions/codecs.py), then DECODEs through the
    magic-byte dispatch — the same real-codec path production payloads
    take; nothing downstream sees the generated values, only decoded
    bytes.  Features are integer-exact so a SQL oracle can replay them
    with zero FP-association risk:

    - image: 4 luma-1000 block sums (299 R + 587 G + 114 B summed over
      each 4x4 quadrant of the decoded 8x8 RGB grid);
    - audio: 4 quarter-frame sums of \\|sample\\| over the decoded mono PCM.

    Output: (media_id, kind, decoded_ok INT, n_payload_bytes LONG,
    f0..f3 LONG).  Per-row failures emit decoded_ok = 0 and zeros, the
    standard per-row error contract.  Only (media_id, kind, vals) cross
    the Arrow boundary — bounded-width rows, batch-friendly.
    """
    from federated_gcn_spark.functions.codecs import (
        decode_bmp,
        decode_wav,
        encode_bmp,
        encode_wav,
    )

    _luma = np.array([299, 587, 114], dtype=np.int64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "kind": [], "decoded_ok": [],
                "n_payload_bytes": [], "f0": [], "f1": [], "f2": [], "f3": [],
            }
            for mid, kind, vals in zip(
                pdf["media_id"], pdf["kind"], pdf["vals"]
            ):
                try:
                    v = np.asarray(list(vals), dtype=np.int64)
                    if kind == "image":
                        payload = encode_bmp(
                            v.astype(np.uint8).reshape(8, 8, 3)
                        )
                    else:
                        payload = encode_wav(
                            (v - 32768).astype(np.int16), 16000
                        )
                    # real decode via magic dispatch — the bytes, not the
                    # generator, are the source of truth from here on
                    if payload[:2] == b"BM":
                        luma = decode_bmp(payload).astype(np.int64) @ _luma
                        f = luma.reshape(2, 4, 2, 4).sum(axis=(1, 3)).reshape(4)
                    else:
                        _, samp = decode_wav(payload)
                        mono = samp[:, 0].astype(np.int64)
                        f = np.abs(mono).reshape(4, 32).sum(axis=1)
                    ok, n_bytes = 1, len(payload)
                except Exception:
                    f, ok, n_bytes = np.zeros(4, np.int64), 0, 0
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["decoded_ok"].append(ok)
                out["n_payload_bytes"].append(n_bytes)
                for c in range(4):
                    out[f"f{c}"].append(int(f[c]))
            yield pd.DataFrame(out)

    return gen.mapInPandas(
        run,
        schema=(
            "media_id long, kind string, decoded_ok int, "
            "n_payload_bytes long, f0 long, f1 long, f2 long, f3 long"
        ),
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index,
    computed from metadata only (n_frames) — the shuffle-free explode that
    a real frame extractor would consume. Output:
    (media_id, frame_index, payload, meta)."""
    n = F.coalesce(F.col("meta.n_frames"), F.lit(0))
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            "payload",
            "meta",
            F.explode(
                F.when(
                    n > 0, F.sequence(F.lit(0), n - 1, F.lit(every_n))
                ).otherwise(F.array().cast("array<int>"))
            ).alias("frame_index"),
        )
        .select("media_id", "frame_index", "payload", "meta")
    )


def audio_chunk_stats(media: DataFrame, chunk_bytes: int = 1024) -> DataFrame:
    """Audio payload → per-chunk byte-level stats (real bytes, no codec):
    (media_id, chunk_index, n_bytes, chunk_crc). Demonstrates binary
    slicing + explode staying fully relational."""
    n_chunks = F.ceil(F.length("payload") / F.lit(chunk_bytes)).cast("int")
    chunked = media.where(F.col("kind") == "audio").select(
        "media_id",
        "payload",
        F.explode(F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))).alias(
            "chunk_index"
        ),
    )
    chunk = F.substring(
        F.col("payload"), F.col("chunk_index") * chunk_bytes + 1, chunk_bytes
    )
    return chunked.select(
        "media_id",
        "chunk_index",
        F.length(chunk).alias("n_bytes"),
        F.crc32(chunk).alias("chunk_crc"),
    )


def resize_images(
    media: DataFrame, out_h: int, out_w: int
) -> DataFrame:
    """Dependency-free image resize (decode → nearest-neighbor sample →
    re-encode) over ``mapInPandas`` — the last of the four multimodal
    verbs (decode / feature-extract / resize / frame-sample).

    Only the (media_id, payload) columns cross the Arrow boundary (the
    skyline transfer-width lesson); rows whose payload is not a valid
    BMP come back ``resized_ok = false`` with an empty payload rather
    than failing the batch.  Nearest-neighbor index math is exact
    integer arithmetic (src = (dst * src_dim) // out_dim), so the output
    bytes are deterministic on any engine/platform.

    Output: (media_id, payload BINARY, out_h INT, out_w INT,
    resized_ok BOOLEAN).
    """
    from federated_gcn_spark.functions.codecs import decode_bmp, encode_bmp

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, oks = [], []
            for payload in pdf["payload"]:
                try:
                    px = decode_bmp(bytes(payload))
                    h, w = px.shape[0], px.shape[1]
                    rows = (np.arange(out_h) * h) // out_h
                    cols = (np.arange(out_w) * w) // out_w
                    resized = px[rows][:, cols]
                    payloads.append(encode_bmp(resized))
                    oks.append(True)
                except Exception:
                    payloads.append(b"")
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "out_h": out_h,
                    "out_w": out_w,
                    "resized_ok": oks,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        run,
        schema="media_id long, payload binary, out_h int, out_w int, "
        "resized_ok boolean",
    )
