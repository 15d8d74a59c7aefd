"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct
(modality, mime, width/height/duration). The Spark-side machinery —
schema, partition sizing, Arrow-batched UDF signatures, batch shapes —
is real and tested; the actual media decode is STUBBED behind
``decode_payload`` (the codec libraries are not in this container):
``fake=True`` produces a deterministic pseudo-decode (seeded from the
payload digest) so downstream feature plumbing is testable;
``fake=False`` raises NotImplementedError.
"""

from __future__ import annotations

import hashlib
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


def decode_payload(payload: bytes, modality: str, fake: bool = True) -> np.ndarray:
    """STUB: decode media bytes -> float32 feature vector.

    Real decoders (PIL/ffmpeg/torchaudio) are not available in this
    environment; the deterministic fake hashes the payload into a
    repeatable pseudo-feature so the distributed plumbing is testable.
    """
    if not fake:
        raise NotImplementedError(
            f"real {modality} decoding requires media libraries not present "
            "in this environment; run with fake=True for plumbing tests"
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


def synthetic_media_table(spark, n_rows: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (no external data)."""
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    rows = []
    modalities = [("image", "image/png"), ("audio", "audio/wav"), ("video", "video/mp4")]
    for i in range(n_rows):
        modality, mime = modalities[i % 3]
        payload = rng.integers(0, 256, int(rng.integers(64, 2048)), dtype=np.uint8).tobytes()
        rows.append(
            (
                f"m_{i:06d}",
                modality,
                mime,
                int(rng.integers(16, 4096)) if modality == "image" else None,
                int(rng.integers(16, 4096)) if modality == "image" else None,
                int(rng.integers(100, 600000)) if modality != "image" else None,
                payload,
            )
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
    typed (media_id, out_w, out_h, thumb) output. The pixel work is
    the STUB layer (no PIL/ffmpeg in this container): ``fake=True``
    emits a deterministic digest-seeded thumb of exactly
    out_w*out_h*3 bytes; ``fake=False`` raises like decode_payload.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                part = pdf.iloc[start : start + batch_rows]
                thumbs = []
                for p in part[payload_col]:
                    if not fake:
                        raise NotImplementedError(
                            "real image resizing requires imaging libraries "
                            "not present in this environment; use fake=True "
                            "for plumbing tests"
                        )
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
