"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct
(modality, mime, width/height/duration). The Spark-side machinery —
schema, partition sizing, Arrow-batched UDF signatures, batch shapes —
is real and tested. All THREE modalities now have a REAL library-free
decode path: uncompressed 24-bit BMP for images (round 5), integer-PCM
RIFF/WAVE for audio, and uncompressed-DIB RIFF/AVI for video (round
6) — each a pure-numpy parser of a public container format, feeding
actual pixels/samples/frames through feature extraction (and resize /
frame sampling for the visual modalities). Compressed codecs (PNG/
JPEG/MP3/H.264 — ffmpeg/Pillow/torchaudio are not in this container)
remain STUBBED behind ``decode_payload``: ``fake=True`` produces a
deterministic pseudo-decode (seeded from the payload digest) so
downstream plumbing stays testable for any payload; ``fake=False``
raises NotImplementedError for those codecs only.
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


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Serialize PCM samples as an uncompressed RIFF/WAVE file — the
    standard library-free audio format (mirrors :func:`encode_bmp` for
    images). Accepts (n_frames,) or (n_frames, n_channels) arrays of
    int16 (PCM_16) or uint8 (PCM_8, the WAV unsigned convention)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError("encode_wav expects (n_frames[, n_channels])")
    if samples.dtype == np.int16:
        bits = 16
    elif samples.dtype == np.uint8:
        bits = 8
    else:
        raise ValueError("encode_wav supports int16 or uint8 PCM only")
    n_frames, n_ch = samples.shape
    body = np.ascontiguousarray(samples).tobytes()  # interleaved LE frames
    block_align = n_ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * block_align,
        block_align, bits,
    )
    data_pad = b"\x00" if len(body) % 2 else b""
    riff_size = 4 + (8 + len(fmt)) + (8 + len(body) + len(data_pad))
    return (
        struct.pack("<4sI4s", b"RIFF", riff_size, b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"data", len(body)) + body + data_pad
    )


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Pure-numpy decode of an uncompressed PCM RIFF/WAVE payload ->
    ((n_frames, n_channels) int16/uint8 array, sample_rate). Walks the
    chunk list (so extra chunks like LIST/INFO are skipped), honors
    the 2-byte chunk padding rule, and rejects anything that isn't
    integer PCM 8/16-bit (the scope of the library-free real path)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = None
    frames = None
    pos = 12
    while pos + 8 <= len(data):
        cid, csize = struct.unpack_from("<4sI", data, pos)
        pos += 8
        if pos + csize > len(data):
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt " and csize >= 16:
            fmt = struct.unpack_from("<HHIIHH", data, pos)
        elif cid == b"data":
            frames = data[pos : pos + csize]
        pos += csize + (csize % 2)  # chunks are 2-byte aligned
    if fmt is None or frames is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_ch, rate, _brate, _balign, bits = fmt
    if audio_format != 1 or bits not in (8, 16) or n_ch < 1:
        raise ValueError(
            f"only integer PCM 8/16-bit WAV supported (format={audio_format}, "
            f"bits={bits})"
        )
    dtype = np.int16 if bits == 16 else np.uint8
    sample_bytes = bits // 8
    usable = len(frames) - len(frames) % (sample_bytes * n_ch)
    if usable == 0:
        raise ValueError("empty WAV data chunk")
    arr = np.frombuffer(frames, dtype=dtype, count=usable // sample_bytes)
    return arr.reshape(-1, n_ch), int(rate)


def audio_features(samples: np.ndarray, rate: int) -> np.ndarray:
    """Deterministic FEATURE_DIM float32 feature vector from real PCM
    frames (the audio analog of :func:`image_features`): normalized
    mean/std/RMS/peak, zero-crossing rate, log duration + rate +
    channel count, and a 56-bin normalized amplitude histogram —
    library-free and platform-stable (integer histogram, float64
    moments)."""
    if samples.dtype == np.uint8:  # PCM_8 is unsigned, centered at 128
        x = samples.astype(np.float64) - 128.0
        full = 128.0
    else:
        x = samples.astype(np.float64)
        full = 32768.0
    mono = x.mean(axis=1)
    n = mono.size
    zcr = float(np.count_nonzero(np.diff(np.signbit(mono)))) / max(1, n - 1)
    head = np.array(
        [
            mono.mean() / full,
            mono.std() / full,
            np.sqrt((mono ** 2).mean()) / full,
            np.abs(mono).max() / full,
            zcr,
            np.log2(float(n)),
            np.log2(float(max(1, rate))),
            float(samples.shape[1]),
        ],
        dtype=np.float64,
    )
    hist = np.histogram(
        mono, bins=FEATURE_DIM - 8, range=(-full, full + 1e-9)
    )[0] / max(1, n)
    return np.concatenate([head, hist]).astype(np.float32)


def _dib_pack(frame: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> bottom-up BGR DIB body with 4-byte row
    padding (the shared BMP/AVI pixel layout)."""
    h, w = frame.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    bgr = frame[::-1, :, ::-1]
    rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    return rows.tobytes()


def _dib_unpack(body: bytes, w: int, h: int) -> np.ndarray:
    """Inverse of :func:`_dib_pack` -> (h, w, 3) uint8 RGB."""
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    if len(body) < stride * h:
        raise ValueError("truncated DIB frame")
    rows = np.frombuffer(body, dtype=np.uint8, count=stride * h).reshape(
        h, stride
    )[:, :row_bytes]
    return np.ascontiguousarray(rows.reshape(h, w, 3)[::-1, :, ::-1])


def encode_avi(frames: np.ndarray, fps: int) -> bytes:
    """Serialize (n_frames, h, w, 3) uint8 RGB as an uncompressed-DIB
    RIFF/AVI ('DIB ' fourcc, BI_RGB 24-bit '00db' frames + idx1) — the
    standard library-free video container (mirrors :func:`encode_bmp` /
    :func:`encode_wav`). Every mainstream player opens the result."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("encode_avi expects (n_frames, h, w, 3) uint8")
    if fps <= 0:
        raise ValueError("fps must be positive")
    n, h, w = frames.shape[:3]
    bodies = [_dib_pack(f) for f in frames]
    frame_bytes = len(bodies[0]) if bodies else 0

    def chunk(cid: bytes, payload: bytes) -> bytes:
        return (
            struct.pack("<4sI", cid, len(payload))
            + payload + (b"\x00" if len(payload) % 2 else b"")
        )

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, frame_bytes * fps, 0, 0x10,  # AVIF_HASINDEX
        n, 0, 1, frame_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n,
        frame_bytes, 0, frame_bytes, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 2835, 2835, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_payload = b"".join(chunk(b"00db", b) for b in bodies)
    movi = lst(b"movi", movi_payload)
    idx, off = [], 4  # offsets relative to the 'movi' fourcc
    for b in bodies:
        idx.append(struct.pack("<4sIII", b"00db", 0x10, off, len(b)))
        off += 8 + len(b) + (len(b) % 2)
    idx1 = chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_avi(data: bytes) -> tuple[np.ndarray, float]:
    """Pure-numpy decode of an uncompressed-DIB RIFF/AVI payload ->
    ((n_frames, h, w, 3) uint8 RGB, fps). Walks the LIST/chunk tree
    (honoring 2-byte padding), reads geometry from the vids stream's
    BITMAPINFOHEADER, and collects '..db'/'..dd' frames from 'movi'
    (including a nested 'rec ' grouping). Rejects compressed fourccs —
    the scope of the library-free real path."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    geom = {}
    bodies: list[bytes] = []

    def walk(lo: int, hi: int, in_strl: bool) -> None:
        pos = lo
        while pos + 8 <= hi:
            cid, csize = struct.unpack_from("<4sI", data, pos)
            pos += 8
            if pos + csize > hi:
                raise ValueError("truncated AVI chunk")
            if cid == b"LIST" and csize >= 4:
                ltype = data[pos : pos + 4]
                walk(pos + 4, pos + csize,
                     in_strl or ltype == b"strl")
                # 'movi'/'rec '/'hdrl' all recurse the same way
            elif cid == b"strh" and csize >= 8 and in_strl:
                fcc_type, handler = struct.unpack_from("<4s4s", data, pos)
                if fcc_type == b"vids":
                    geom["handler"] = handler
                    if csize >= 32:
                        scale, rate = struct.unpack_from("<II", data, pos + 20)
                        if scale and rate:
                            geom["fps"] = rate / scale
            elif cid == b"strf" and csize >= 40 and in_strl \
                    and "w" not in geom and geom.get("handler") is not None:
                (_sz, w, h, _planes, bpp, comp) = struct.unpack_from(
                    "<IiiHHI", data, pos
                )
                geom.update(w=w, h=abs(h), bpp=bpp, comp=comp)
            elif cid[2:4] in (b"db", b"dd"):
                bodies.append(data[pos : pos + csize])
            pos += csize + (csize % 2)

    walk(12, len(data), False)
    if "w" not in geom:
        raise ValueError("AVI missing vids stream geometry")
    if geom.get("comp", 0) != 0 or geom.get("bpp") != 24 or \
            geom["handler"] not in (b"DIB ", b"\x00\x00\x00\x00"):
        raise ValueError(
            f"only uncompressed 24-bit DIB AVI supported "
            f"(handler={geom.get('handler')!r}, bpp={geom.get('bpp')}, "
            f"compression={geom.get('comp')})"
        )
    if not bodies:
        raise ValueError("AVI has no frame chunks")
    w, h = geom["w"], geom["h"]
    frames = np.stack([_dib_unpack(b, w, h) for b in bodies])
    return frames, float(geom.get("fps", 0.0) or 0.0)


def video_features(frames: np.ndarray, fps: float) -> np.ndarray:
    """Deterministic FEATURE_DIM float32 feature vector from real RGB
    frames (the video analog of :func:`image_features`): per-channel
    mean/std over all frames, log geometry/rate, per-frame brightness
    variance (static vs dynamic scenes), mean absolute inter-frame
    delta (motion energy), and a 52-bin normalized grayscale histogram
    over every pixel — library-free and platform-stable."""
    n, h, w = frames.shape[:3]
    flat = frames.reshape(-1, 3).astype(np.float64)
    means = flat.mean(axis=0) / 255.0
    stds = flat.std(axis=0) / 255.0
    gray = flat.mean(axis=1)
    per_frame = gray.reshape(n, -1).mean(axis=1)
    motion = (
        float(np.abs(np.diff(frames.astype(np.float64), axis=0)).mean()) / 255.0
        if n > 1 else 0.0
    )
    head = np.array(
        [
            *means, *stds,
            np.log2(float(n)), np.log2(float(h)), np.log2(float(w)),
            np.log2(max(1.0, fps)),
            per_frame.std() / 255.0,
            motion,
        ],
        dtype=np.float64,
    )
    hist = np.histogram(
        gray, bins=FEATURE_DIM - head.size, range=(0.0, 255.0001)
    )[0] / max(1, gray.size)
    return np.concatenate([head, hist]).astype(np.float32)


def decode_payload(payload: bytes, modality: str, fake: bool = True) -> np.ndarray:
    """Decode media bytes -> float32 feature vector.

    ``fake=False`` is REAL for all three modalities on the library-free
    container formats — uncompressed 24-bit BMP images, integer-PCM
    RIFF/WAVE audio, uncompressed-DIB RIFF/AVI video (all pure-numpy):
    actual pixels/samples/frames flow into :func:`image_features` /
    :func:`audio_features` / :func:`video_features`. Compressed codecs
    (ffmpeg/Pillow/torchaudio not in this container) still raise. The
    deterministic fake hashes the payload into a repeatable
    pseudo-feature so plumbing stays testable for any payload.
    """
    if not fake:
        head = (payload or b"")[:12]
        if modality == "image" and head[:2] == b"BM":
            return image_features(decode_bmp(payload))
        if modality == "audio" and head[:4] == b"RIFF" \
                and head[8:12] == b"WAVE":
            return audio_features(*decode_wav(payload))
        if modality == "video" and head[:4] == b"RIFF" \
                and head[8:12] == b"AVI ":
            return video_features(*decode_avi(payload))
        raise NotImplementedError(
            f"real {modality} decoding beyond 24-bit BMP / PCM WAV / "
            "DIB AVI requires media libraries not present in this "
            "environment; run with fake=True for plumbing tests"
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

    # project BEFORE the python boundary: Spark cannot see which
    # columns the function touches, so an unprojected mapInPandas ships
    # (and reads from storage) every column of df (guide §4.1)
    return df.select(id_col, payload_col, modality_col).mapInPandas(
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
    spark, n_rows: int = 64, seed: int = 42, real_images: bool = False,
    real_audio: bool = False, real_video: bool = False,
) -> DataFrame:
    """Deterministic fake media table for tests (no external data).

    ``real_images=True`` makes every image row a VALID 24-bit BMP
    (deterministic per-image gradient + seeded noise),
    ``real_audio=True`` makes every audio row a VALID integer-PCM WAV
    (seeded multi-tone sine + noise), and ``real_video=True`` makes
    every video row a VALID uncompressed-DIB AVI (a moving gradient —
    real motion for the motion-energy feature), so the real
    ``fake=False`` decode paths run on actual pixels/samples/frames;
    other rows keep opaque random payloads."""
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    rows = []
    modalities = [("image", "image/png"), ("audio", "audio/wav"), ("video", "video/mp4")]
    if real_images:
        modalities[0] = ("image", "image/bmp")
    if real_video:
        modalities[2] = ("video", "video/x-msvideo")
    for i in range(n_rows):
        modality, mime = modalities[i % 3]
        if modality == "video" and real_video:
            fps = int(rng.choice([10, 15, 24]))
            n_frames = int(rng.integers(4, 12))
            h = int(rng.integers(8, 24))
            w = int(rng.integers(8, 24))
            yy = np.mgrid[0:h, 0:w][0]
            shift = int(rng.integers(3, 40))
            frames = np.stack([
                np.stack(
                    [((yy * 255) // max(1, h - 1) + t * shift) % 256,
                     np.full((h, w), (t * 11) % 256),
                     np.full((h, w), (i * 37) % 256)],
                    axis=2,
                ).astype(np.uint8)
                for t in range(n_frames)
            ])
            noise = rng.integers(0, 32, frames.shape, dtype=np.uint8)
            payload = encode_avi(
                np.clip(frames.astype(int) + noise, 0, 255).astype(np.uint8),
                fps,
            )
            rows.append(
                (f"m_{i:06d}", modality, mime, w, h,
                 int(n_frames * 1000 / fps), payload)
            )
            continue
        if modality == "audio" and real_audio:
            rate = int(rng.choice([8000, 16000, 22050]))
            n_ch = int(rng.integers(1, 3))
            n_frames = int(rng.integers(rate // 20, rate // 4))
            t = np.arange(n_frames, dtype=np.float64) / rate
            freq = float(rng.integers(80, 2000))
            wave = 0.5 * np.sin(2 * np.pi * freq * t)
            wave = wave[:, None] + 0.05 * rng.standard_normal((n_frames, n_ch))
            if i % 6 == 1:  # exercise the PCM_8 branch too
                payload = encode_wav(
                    np.clip(wave * 127 + 128, 0, 255).astype(np.uint8), rate
                )
            else:
                payload = encode_wav(
                    np.clip(wave * 32767, -32768, 32767).astype(np.int16), rate
                )
            rows.append(
                (f"m_{i:06d}", modality, mime, None, None,
                 int(n_frames * 1000 / rate), payload)
            )
            continue
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

    imgs = df.filter(F.col("modality") == "image").select(id_col, payload_col)
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


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    payload_col: str = "payload",
    fake: bool = True,
    batch_rows: int = 16,
) -> DataFrame:
    """Execute :func:`frame_sample_plan`'s semantics against the actual
    payload bytes (mapInPandas, Arrow-batched): one output row per
    sampled timestamp, carrying the raw RGB frame. ``fake=False`` is
    REAL for uncompressed-DIB AVI — the frame at ``ts*fps/1000``
    (clamped to the last frame) is returned pixel-exact; other codecs
    raise like decode_payload. ``fake=True`` emits digest-seeded 16x16
    frames at the metadata-derived timestamps so plumbing stays
    testable. ``batch_rows`` is small because decoded frame stacks are
    the memory hog (videos are the largest payloads)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                part = pdf.iloc[start : start + batch_rows]
                out = {
                    id_col: [], "frame_ts_ms": [], "frame_w": [],
                    "frame_h": [], "frame": [],
                }
                for mid, p, dur in zip(
                    part[id_col], part[payload_col], part["duration_ms"]
                ):
                    if not fake:
                        frames, fps = decode_avi(p)
                        n, h, w = frames.shape[:3]
                        total_ms = (
                            int(n * 1000 / fps) if fps > 0
                            else int(dur or n)
                        )
                        for ts in range(0, max(1, total_ms), every_ms):
                            idx = min(n - 1, int(ts * fps / 1000)) \
                                if fps > 0 else min(n - 1, ts)
                            out[id_col].append(mid)
                            out["frame_ts_ms"].append(ts)
                            out["frame_w"].append(w)
                            out["frame_h"].append(h)
                            out["frame"].append(
                                np.ascontiguousarray(frames[idx]).tobytes()
                            )
                        continue
                    digest = hashlib.sha256(p or b"").digest()
                    seed = int.from_bytes(digest[:8], "little")
                    for ts in range(0, max(1, int(dur or 1)), every_ms):
                        rng = np.random.Generator(
                            np.random.Philox(key=[seed, ts])
                        )
                        out[id_col].append(mid)
                        out["frame_ts_ms"].append(ts)
                        out["frame_w"].append(16)
                        out["frame_h"].append(16)
                        out["frame"].append(
                            rng.integers(0, 256, 16 * 16 * 3,
                                         dtype=np.uint8).tobytes()
                        )
                yield pd.DataFrame(out)

    vids = df.filter(F.col("modality") == "video").select(
        id_col, payload_col, "duration_ms"
    )
    return vids.mapInPandas(
        run,
        schema=(
            f"{id_col} string, frame_ts_ms int, frame_w int, "
            "frame_h int, frame binary"
        ),
    )
