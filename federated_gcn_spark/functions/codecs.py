"""Dependency-free media codecs (driver extension §2.10, VERDICT r01 #8).

Real byte-level decoders for two self-describing uncompressed formats —
24-bit BI_RGB BMP and 16-bit PCM WAV — written against the public format
specs with numpy only, so the multimodal pipeline decodes REAL bytes
end-to-end without PIL/ffmpeg. The matching encoders exist so tests can
round-trip arbitrary arrays through genuine on-disk bytes.

These run inside Arrow-batched ``mapInPandas`` kernels (see
operators/multimodal.py): one Python call per payload, vectorized numpy
inside — the per-row cost is header parsing + a frombuffer view, no
per-pixel Python.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# BMP — Windows BITMAPINFOHEADER, 24-bit, BI_RGB (uncompressed)
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → BMP file bytes (24-bit, bottom-up, BI_RGB)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got shape {px.shape}")
    h, w, _ = px.shape
    row_size = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    img_size = row_size * h
    # pixel data: bottom-up row order, BGR channel order
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 14 + 40 + img_size, 0, 0, 14 + 40,  # file header
        40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0,  # BITMAPINFOHEADER
    )
    return header + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP file bytes → (H, W, 3) uint8 RGB.

    Supports the common case: BITMAPINFOHEADER (or larger V4/V5 headers),
    24-bit, BI_RGB, bottom-up or top-down (negative height).
    """
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down = h_signed < 0
    h = abs(h_signed)
    row_size = (w * 3 + 3) & ~3
    need = data_offset + row_size * h
    if len(payload) < need:
        raise ValueError(f"truncated BMP: need {need} bytes, have {len(payload)}")
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_size * h, offset=data_offset)
    rows = rows.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


# ---------------------------------------------------------------------------
# WAV — RIFF/WAVE, PCM (format tag 1), 16-bit
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(N,) or (N, C) int16 PCM → WAV file bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV file bytes → (sample_rate, (N, C) int16 samples).

    Walks RIFF chunks (fmt may be followed by LIST/fact etc. before data);
    PCM 16-bit only.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, sample_rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            tag, channels, sample_rate, _, _, bits = struct.unpack_from("<HHIIHH", body)
            if tag != 1:
                raise ValueError(f"unsupported WAV format tag {tag} (PCM only)")
            if bits != 16:
                raise ValueError(f"unsupported WAV bit depth {bits}")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if sample_rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    s = np.frombuffer(data, dtype="<i2")
    if channels > 1:
        s = s[: len(s) - len(s) % channels].reshape(-1, channels)
    else:
        s = s[:, None]
    return int(sample_rate), s


# ---------------------------------------------------------------------------
# feature extraction on decoded media → fixed-width vectors
# ---------------------------------------------------------------------------


def image_grid_features(pixels: np.ndarray, n_features: int) -> np.ndarray:
    """(H, W, 3) uint8 → n_features floats: grayscale block-mean pooling
    over a ⌈√n⌉×⌈√n⌉ grid (the classic thumbnail-pool baseline), values
    in [0, 1]. Deterministic, shape-independent."""
    g = np.asarray(pixels, dtype="float64") @ np.array([0.299, 0.587, 0.114])
    side = int(np.ceil(np.sqrt(n_features)))
    h, w = g.shape
    ys = np.linspace(0, h, side + 1).astype(int)
    xs = np.linspace(0, w, side + 1).astype(int)
    out = np.zeros(side * side)
    for i in range(side):
        for j in range(side):
            block = g[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)]
            out[i * side + j] = block.mean() / 255.0
    return out[:n_features]


def audio_frame_features(samples: np.ndarray, n_features: int) -> np.ndarray:
    """(N, C) int16 → n_features floats: per-frame RMS energy over
    n_features equal time slices of the mono mix, normalized to [0, 1]."""
    mono = np.asarray(samples, dtype="float64").mean(axis=1) / 32768.0
    if len(mono) == 0:
        return np.zeros(n_features)
    bounds = np.linspace(0, len(mono), n_features + 1).astype(int)
    out = np.zeros(n_features)
    for i in range(n_features):
        frame = mono[bounds[i] : max(bounds[i + 1], bounds[i] + 1)]
        out[i] = float(np.sqrt(np.mean(frame * frame)))
    return out


def real_media_features(payload: bytes, n_features: int) -> np.ndarray:
    """Magic-byte dispatch: BMP → grid pooling, WAV → frame energies.

    Raises ValueError for unknown/corrupt payloads — image_features turns
    that into decoded_ok=False, the per-row error contract."""
    if payload[:2] == b"BM":
        return image_grid_features(decode_bmp(payload), n_features)
    if payload[:4] == b"RIFF":
        _, samples = decode_wav(payload)
        return audio_frame_features(samples, n_features)
    raise ValueError("unknown media format (expected BMP or WAV magic)")
