"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct
(modality, mime, width/height/duration). The Spark-side machinery —
schema, partition sizing, Arrow-batched UDF signatures, batch shapes —
is real and tested. The IMAGE modality is fully real (round 5): a
pure-numpy decoder for uncompressed 24-bit BMP (no external imaging
libraries needed) feeds actual pixels through feature extraction and
resize. Audio/video decode remains STUBBED behind ``decode_payload``
(ffmpeg/torchaudio are not in this container): ``fake=True`` produces
a deterministic pseudo-decode (seeded from the payload digest) so
downstream plumbing is testable; ``fake=False`` raises
NotImplementedError for those modalities only.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, modality string, mime string, width int, height int, "
    "duration_ms int, payload binary"
)

FEATURE_DIM = 64

_BMP_PIXEL_OFFSET = 54  # 14-byte file header + 40-byte BITMAPINFOHEADER


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Serialize an (h, w, 3) uint8 RGB array as an uncompressed
    24-bit bottom-up BMP (BI_RGB, BITMAPINFOHEADER) — the standard
    library-free image format, used for the deterministic datagen
    fixtures that drive the REAL decode path in tests."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_bmp expects an (h, w, 3) uint8 array")
    h, w = pixels.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # BGR channel order, bottom-up row order, 4-byte row padding
    bgr = pixels[::-1, :, ::-1]
    rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    body = rows.tobytes()
    file_size = _BMP_PIXEL_OFFSET + len(body)
    header = struct.pack(
        "<2sIHHI", b"BM", file_size, 0, 0, _BMP_PIXEL_OFFSET
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + body


def decode_bmp(data: bytes) -> np.ndarray:
    """Pure-numpy decode of an uncompressed 24-bit BMP -> (h, w, 3)
    uint8 RGB. Handles bottom-up and top-down (negative height) rows
    and 4-byte row padding; rejects anything that isn't BI_RGB 24-bit
    (the scope of the library-free real path)."""
    if len(data) < _BMP_PIXEL_OFFSET or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h_raw < 0
    h = abs(h_raw)
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h_raw}")
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = pixel_off + stride * h
    if len(data) < need:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=pixel_off
    ).reshape(h, stride)[:, :row_bytes]
    bgr = rows.reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return np.ascontiguousarray(bgr[:, :, ::-1])


def image_features(pixels: np.ndarray) -> np.ndarray:
    """Deterministic FEATURE_DIM float32 feature vector from real
    pixels: per-channel mean/std, log dimensions, and a 56-bin
    normalized grayscale histogram — cheap, library-free, and stable
    across platforms (integer histogram, float64 moments)."""
    flat = pixels.reshape(-1, 3).astype(np.float64)
    means = flat.mean(axis=0) / 255.0
    stds = flat.std(axis=0) / 255.0
    h, w = pixels.shape[:2]
    gray = flat.mean(axis=1)
    hist = np.histogram(gray, bins=FEATURE_DIM - 8, range=(0.0, 255.0001))[0]
    hist = hist / max(1, gray.size)
    head = np.array(
        [*means, *stds, np.log2(float(h)), np.log2(float(w))], dtype=np.float64
    )
    return np.concatenate([head, hist]).astype(np.float32)


def decode_payload(payload: bytes, modality: str, fake: bool = True) -> np.ndarray:
    """Decode media bytes -> float32 feature vector.

    ``fake=False`` is REAL for the image modality when the payload is
    an uncompressed 24-bit BMP (pure-numpy decode, no external
    libraries): actual pixels flow into :func:`image_features`. Audio/
    video (ffmpeg/torchaudio not in this container) and non-BMP image
    codecs still raise. The deterministic fake hashes the payload into
    a repeatable pseudo-feature so plumbing for every modality stays
    testable.
    """
    if not fake:
        if modality == "image" and (payload or b"")[:2] == b"BM":
            return image_features(decode_bmp(payload))
        raise NotImplementedError(
            f"real {modality} decoding beyond 24-bit BMP requires media "
            "libraries not present in this environment; run with "
            "fake=True for plumbing tests"
        )
    digest = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


def extract_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    modality_col: str = "modality",
    fake: bool = True,
    batch_rows: int = 256,
) -> DataFrame:
    """mapInPandas feature extraction over binary media payloads.

    Arrow-batched; emits (media_id, n_bytes, feature:array<float>).
    ``batch_rows`` bounds decoded working-set memory per batch — media
    rows are large, so this is the multimodal analog of the reference's
    memory-targeted chunk sizing (reader.py:53-61).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                part = pdf.iloc[start : start + batch_rows]
                feats = [
                    decode_payload(p, m, fake=fake).tolist()
                    for p, m in zip(part[payload_col], part[modality_col])
                ]
                yield pd.DataFrame(
                    {
                        id_col: part[id_col].to_numpy(),
                        "n_bytes": [len(p or b"") for p in part[payload_col]],
                        "feature": feats,
                    }
                )

    return df.mapInPandas(
        run, schema=f"{id_col} string, n_bytes long, feature array<float>"
    )


def resize_pixels(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample (the classic integer
    index map — no interpolation, so the result is exactly
    reproducible across platforms) -> (out_h, out_w, 3) uint8."""
    h, w = pixels.shape[:2]
    iy = (np.arange(out_h) * h) // out_h
    ix = (np.arange(out_w) * w) // out_w
    return np.ascontiguousarray(pixels[iy][:, ix])


def synthetic_media_table(
    spark, n_rows: int = 64, seed: int = 42, real_images: bool = False
) -> DataFrame:
    """Deterministic fake media table for tests (no external data).

    ``real_images=True`` makes every image row a VALID 24-bit BMP
    (deterministic per-image gradient + seeded noise) so the real
    ``fake=False`` decode path runs on actual pixels; audio/video rows
    keep opaque random payloads either way."""
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    rows = []
    modalities = [("image", "image/png"), ("audio", "audio/wav"), ("video", "video/mp4")]
    if real_images:
        modalities[0] = ("image", "image/bmp")
    for i in range(n_rows):
        modality, mime = modalities[i % 3]
        if modality == "image" and real_images:
            h = int(rng.integers(8, 48))
            w = int(rng.integers(8, 48))
            yy, xx = np.mgrid[0:h, 0:w]
            grad = ((yy * 255) // max(1, h - 1)).astype(np.uint8)
            noise = rng.integers(0, 64, (h, w, 3), dtype=np.uint8)
            px = np.stack(
                [grad, ((xx * 255) // max(1, w - 1)).astype(np.uint8),
                 np.full((h, w), (i * 37) % 256, dtype=np.uint8)],
                axis=2,
            ).astype(np.uint8)
            payload = encode_bmp(np.clip(px.astype(int) + noise, 0, 255).astype(np.uint8))
            width, height, dur = w, h, None
        else:
            payload = rng.integers(
                0, 256, int(rng.integers(64, 2048)), dtype=np.uint8
            ).tobytes()
            width = int(rng.integers(16, 4096)) if modality == "image" else None
            height = int(rng.integers(16, 4096)) if modality == "image" else None
            dur = int(rng.integers(100, 600000)) if modality != "image" else None
        rows.append(
            (f"m_{i:06d}", modality, mime, width, height, dur, payload)
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def resize_images(
    df: DataFrame,
    out_w: int = 64,
    out_h: int = 64,
    id_col: str = "media_id",
    payload_col: str = "payload",
    fake: bool = True,
    batch_rows: int = 64,
) -> DataFrame:
    """Image resize over binary payloads (mapInPandas, Arrow-batched).

    The Spark plumbing is real — image-only filter pushed to the scan,
    bounded decode batches (resized thumbs are the memory hog, so
    ``batch_rows`` is deliberately smaller than extract_features'),
    typed (media_id, out_w, out_h, thumb) output. ``fake=False`` is
    REAL for 24-bit BMP payloads: pure-numpy decode + nearest-neighbor
    resample (:func:`resize_pixels`), raw RGB thumb bytes out; other
    codecs raise like decode_payload. ``fake=True`` emits a
    deterministic digest-seeded thumb of exactly out_w*out_h*3 bytes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                part = pdf.iloc[start : start + batch_rows]
                thumbs = []
                for p in part[payload_col]:
                    if not fake:
                        if (p or b"")[:2] != b"BM":
                            raise NotImplementedError(
                                "real resizing beyond 24-bit BMP requires "
                                "imaging libraries not present in this "
                                "environment; use fake=True for plumbing tests"
                            )
                        thumbs.append(
                            resize_pixels(decode_bmp(p), out_w, out_h).tobytes()
                        )
                        continue
                    digest = hashlib.sha256(p or b"").digest()
                    seed = int.from_bytes(digest[:8], "little")
                    rng = np.random.Generator(np.random.Philox(key=[seed, 1]))
                    thumbs.append(
                        rng.integers(0, 256, out_w * out_h * 3, dtype=np.uint8).tobytes()
                    )
                yield pd.DataFrame(
                    {
                        id_col: part[id_col].to_numpy(),
                        "out_w": out_w,
                        "out_h": out_h,
                        "thumb": thumbs,
                    }
                )

    imgs = df.filter(F.col("modality") == "image")
    return imgs.mapInPandas(
        run, schema=f"{id_col} string, out_w int, out_h int, thumb binary"
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Per-video frame sampling plan (timestamps to decode) — pure SQL."""
    return df.filter(F.col("modality") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
