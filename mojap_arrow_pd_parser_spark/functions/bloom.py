"""Per-chunk key Bloom filters — point-lookup chunk pruning.

The zone map (per-chunk key/column min-max, decode.py) prunes RANGE
queries; a Bloom filter prunes POINT lookups on tables whose chunks
OVERLAP in key range (appended generations on the same grid,
partition-salted or file-aligned tables), where min-max alone keeps
every overlapping chunk. Same role as parquet's column bloom filters
and Iceberg's puffin blobs: a compact, conservative membership test —
"definitely not in this chunk" prunes the file, "maybe" decodes it and
lets the exact row filter decide. Correctness never depends on it.

Construction: standard partitioned double hashing (Kirsch-Mitzenmacher
2006 — k index functions derived from two 64-bit hashes as
``h1 + i*h2``), ~10 bits/key, k=7 probes (~1% false-positive rate),
sized to the next power of two and CAPPED at 2^20 bits (128 KiB raw,
~171 KiB base64 in the sidecar JSON). Chunks with more keys than the
cap can hold at ~5 bits/key skip the filter entirely instead of
shipping a saturated, useless bitmap — zone maps still apply there.

Hashing is ``pandas.util.hash_array`` with an explicitly pinned
hash_key — vectorized C on both the build side (arrow key column ->
numpy) and the probe side (python values -> numpy). The filter is
ENGINE-INTERNAL metadata (like chunk checksums): nothing downstream
re-derives it in SQL, so the hash needs to be deterministic across
this engine's executors and driver, not portable across engines.

Supported key types: strings and integers (the plan-key types the
upsert path supports natively); other key types simply never get a
filter and fall back to zone-map + row-filter semantics.
"""

from __future__ import annotations

import base64

import numpy as np

#: pandas' documented default, pinned so a pandas default change can
#: never split build/probe hashing across versions mid-upgrade
_HASH_KEY = "0123456789123456"
_K = 7
_BITS_PER_KEY = 10
_MIN_BITS = 1 << 10
_MAX_BITS = 1 << 20


def _hash64(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) uint64 hash pairs for the double-hashing scheme; h2 is
    forced odd so the k probe indices cycle the whole power-of-two
    table."""
    import pandas as pd

    h1 = pd.util.hash_array(vals, hash_key=_HASH_KEY, categorize=False)
    h1 = h1.astype(np.uint64, copy=False)
    # splitmix64 finalizer: a plain multiply would leave h2's LOW bits
    # a function of h1's low bits, correlating the k probe indices
    # (only the low log2(m) bits are used) and inflating the FPR ~10x
    z = h1 + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h2 = (z ^ (z >> np.uint64(31))) | np.uint64(1)
    return h1, h2


def _typed_values(values, kind: str) -> np.ndarray:
    """Normalize build/probe values into ONE numpy dtype per key kind,
    so the vectorized hash agrees between the arrow build side and the
    python probe side. ``kind``: "int" -> int64, "str" -> object of str."""
    if kind == "int":
        return np.asarray(list(values), dtype=np.int64)
    return np.asarray([str(v) for v in values], dtype=object)


def key_kind(dtype_name: str) -> str | None:
    """Bloom key kind for a Spark/arrow type name, or None (no filter)."""
    if dtype_name in ("tinyint", "smallint", "int", "bigint",
                      "int8", "int16", "int32", "int64",
                      "uint8", "uint16", "uint32"):
        return "int"
    if dtype_name in ("string", "large_string", "varchar"):
        return "str"
    return None


def build_bloom(values, kind: str) -> dict | None:
    """Bloom dict {"m", "k", "b64"} over non-null ``values`` of
    ``kind``, or None when empty or too large for the bit cap."""
    vals = [v for v in values if v is not None]
    if not vals:
        return None
    m = _MIN_BITS
    while m < _BITS_PER_KEY * len(vals):
        m <<= 1
    if m > _MAX_BITS:
        return None  # would saturate; zone maps still prune
    arr = _typed_values(vals, kind)
    h1, h2 = _hash64(arr)
    buf = np.zeros(m // 8, dtype=np.uint8)
    mask = np.uint64(m - 1)
    for i in range(_K):
        idx = (h1 + np.uint64(i) * h2) & mask
        np.bitwise_or.at(
            buf,
            (idx >> np.uint64(3)).astype(np.int64),
            np.left_shift(
                np.uint8(1), (idx & np.uint64(7)).astype(np.uint8)
            ),
        )
    return {"m": int(m), "k": _K, "b64": base64.b64encode(buf.tobytes()).decode()}


def bloom_from_arrow(arr) -> dict | None:
    """Bloom dict for an arrow key column, or None for unsupported
    types (build-side entry point used by encode_chunk_table)."""
    import pyarrow as pa

    t = arr.type
    if pa.types.is_integer(t):
        kind = "int"
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        kind = "str"
    else:
        return None
    if arr.null_count:
        arr = arr.drop_null()
    if len(arr) == 0:
        return None
    if kind == "int":
        # uint64 keys above 2^63-1 can't carry through the int64 hash
        # domain (the probe side's key_kind excludes uint64 for the
        # same reason): no filter rather than a failed encode
        if pa.types.is_uint64(t):
            try:
                vals = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
            except pa.ArrowInvalid:
                return None
        else:
            vals = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return build_bloom_hashed(*_hash64(vals.astype(np.int64, copy=False)),
                                  n=len(vals))
    # string path: hash straight off the arrow column's object view
    # (pandas hash_array is the same C kernel the probe side uses) —
    # no to_pylist round trip, no per-value str() on the encode hot
    # path; values are already str, so hash parity with
    # _typed_values(..., "str") holds by construction
    vals = arr.to_numpy(zero_copy_only=False)
    return build_bloom_hashed(*_hash64(vals), n=len(vals))


def build_bloom_hashed(h1: np.ndarray, h2: np.ndarray, n: int) -> dict | None:
    """build_bloom from precomputed hash pairs (skips list conversion
    on the hot int path)."""
    if n == 0:
        return None
    m = _MIN_BITS
    while m < _BITS_PER_KEY * n:
        m <<= 1
    if m > _MAX_BITS:
        return None
    buf = np.zeros(m // 8, dtype=np.uint8)
    mask = np.uint64(m - 1)
    for i in range(_K):
        idx = (h1 + np.uint64(i) * h2) & mask
        np.bitwise_or.at(
            buf,
            (idx >> np.uint64(3)).astype(np.int64),
            np.left_shift(
                np.uint8(1), (idx & np.uint64(7)).astype(np.uint8)
            ),
        )
    return {"m": int(m), "k": _K, "b64": base64.b64encode(buf.tobytes()).decode()}


def probe_hashes(values, kind: str) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) for probe ``values`` — computed ONCE per query on the
    driver; per-chunk index derivation (which depends on each chunk's
    own ``m``) happens in :func:`maybe_contains_any`."""
    return _hash64(_typed_values(values, kind))


def maybe_contains_any(
    bloom: dict | None, h1: np.ndarray, h2: np.ndarray
) -> bool:
    """True unless the filter PROVES none of the probe values is in the
    chunk. Missing/malformed filters keep the chunk (conservative)."""
    if not bloom:
        return True
    try:
        m = int(bloom["m"])
        k = int(bloom["k"])
        buf = np.frombuffer(base64.b64decode(bloom["b64"]), dtype=np.uint8)
        if m <= 0 or (m & (m - 1)) or len(buf) != m // 8:
            return True
    except (KeyError, TypeError, ValueError):
        return True
    mask = np.uint64(m - 1)
    ks = np.arange(k, dtype=np.uint64)
    for j in range(len(h1)):
        idx = (h1[j] + ks * h2[j]) & mask
        bits = (buf[(idx >> np.uint64(3)).astype(np.int64)]
                >> (idx & np.uint64(7)).astype(np.uint8)) & 1
        if bits.all():
            return True
    return False
