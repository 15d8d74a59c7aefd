"""Bit-packing primitives (numpy, vectorized).

Packs arrays of unsigned integers into the minimal number of bits per
value. Byte-aligned widths (8/16/32/64) short-circuit to a plain
``astype`` copy; other widths go through an ``np.packbits`` bit-matrix,
processed in bounded slabs so peak temp memory stays ~``SLAB * width``
bytes regardless of chunk size.

Spark-side usage is always inside ``mapInArrow`` batches — these
functions never see a Row.
"""

from __future__ import annotations

import numpy as np

# Values per internal slab: bounds temp memory of the bit matrix to
# ~SLAB * 64 bytes = 64 MiB worst case.
_SLAB = 1 << 20


def bit_width(max_value: int) -> int:
    """Bits needed to represent ``max_value`` (>=0). 0 for max_value==0."""
    if max_value < 0:
        raise ValueError("bit_width requires a non-negative value")
    return int(max_value).bit_length()


def pack(values: np.ndarray, width: int) -> bytes:
    """Pack uint64 ``values`` (< 2**width) into a little-endian byte buffer.

    MSB-first within each value's ``width`` bits; the global bitstream is
    packed with np.packbits (big-endian bit order), which decode mirrors.
    """
    n = len(values)
    if n == 0 or width == 0:
        return b""
    values = np.ascontiguousarray(values, dtype=np.uint64)
    if width == 8:
        return values.astype("<u1").tobytes()
    if width == 16:
        return values.astype("<u2").tobytes()
    if width == 32:
        return values.astype("<u4").tobytes()
    if width == 64:
        return values.astype("<u8").tobytes()
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    out = []
    for start in range(0, n, _SLAB):
        slab = values[start : start + _SLAB]
        bits = ((slab[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
        out.append(np.packbits(bits.ravel()))
    return b"".join(b.tobytes() for b in out)


def unpack(buf: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack`; returns uint64 array of length ``n``."""
    if n == 0 or width == 0:
        return np.zeros(n, dtype=np.uint64)
    if width == 8:
        return np.frombuffer(buf, dtype="<u1", count=n).astype(np.uint64)
    if width == 16:
        return np.frombuffer(buf, dtype="<u2", count=n).astype(np.uint64)
    if width == 32:
        return np.frombuffer(buf, dtype="<u4", count=n).astype(np.uint64)
    if width == 64:
        return np.frombuffer(buf, dtype="<u8", count=n).copy()
    raw = np.frombuffer(buf, dtype=np.uint8)
    out = np.empty(n, dtype=np.uint64)
    # Slab boundaries used in pack() are byte-aligned per slab.
    slab_bytes = (_SLAB * width + 7) // 8
    weights = (np.uint64(1) << np.arange(width - 1, -1, -1, dtype=np.uint64))
    pos = 0
    for start in range(0, n, _SLAB):
        m = min(_SLAB, n - start)
        nbytes = (m * width + 7) // 8
        bits = np.unpackbits(raw[pos : pos + nbytes], count=m * width)
        out[start : start + m] = bits.reshape(m, width).astype(np.uint64) @ weights
        pos += slab_bytes if m == _SLAB else nbytes
    return out


def packed_nbytes(n: int, width: int) -> int:
    """Exact payload size pack() produces (slab-aligned)."""
    if n == 0 or width == 0:
        return 0
    if width in (8, 16, 32, 64):
        return n * (width // 8)
    full, rem = divmod(n, _SLAB)
    size = full * ((_SLAB * width + 7) // 8)
    if rem:
        size += (rem * width + 7) // 8
    return size
