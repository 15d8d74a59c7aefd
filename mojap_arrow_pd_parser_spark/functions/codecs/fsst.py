"""Simplified FSST (Fast Static Symbol Table) byte-string codec.

Public-knowledge basis: Boncz, Neumann, Leis — "FSST: Fast Random
Access String Compression", VLDB 2020. This is a from-scratch
simplified variant, NOT the reference C++ implementation:

* a symbol table of up to 255 symbols (1..8 bytes each) is trained
  greedily on a sample: substring frequencies are counted vectorized
  (numpy sliding windows + unique on void views), gain = freq*(len-1)
  for multi-byte symbols and freq*1 for single bytes (they save the
  escape byte), top symbols win;
* encoding emits one code byte per matched symbol, longest-match
  greedy; unmatched bytes emit escape code 255 into the code stream
  and the literal byte into a separate literal stream (a deviation
  from the FSST wire format that makes DECODE fully vectorizable —
  no sequential escape parsing);
* decoding is pure numpy gather (np.repeat + arange run trick).

Round-trip is bit-exact for arbitrary bytes including UTF-8 multibyte
and empty input (FIXTURES.md F4). Encode's greedy scan is a bounded
Python loop over match positions — acceptable because FSST is only
selected for string sections when the sampled cost model says it wins
(speed-secondary per SURVEY.md §7).
"""

from __future__ import annotations

import numpy as np

ESCAPE = 255
MAX_SYMBOLS = 255
MAX_SYM_LEN = 8
_TRAIN_CAP = 1 << 16  # train on at most 64 KiB of sample


def _window_keys64(data: np.ndarray) -> np.ndarray:
    """uint64 key per byte position: the next 8 bytes, little-endian
    (byte at the position is the LSB). Masking with (1<<(8L))-1 yields
    the length-L substring key — lets all substring counting/matching
    run on native uint64 instead of slow void dtypes."""
    padded = np.concatenate([data, np.zeros(8, dtype=np.uint8)])
    win8 = np.lib.stride_tricks.sliding_window_view(padded, 8)[: len(data)]
    return np.ascontiguousarray(win8).view(np.uint64).ravel()


def _key_to_bytes(key: int, length: int) -> bytes:
    return int(key).to_bytes(8, "little")[:length]


def train(sample: bytes, max_symbols: int = MAX_SYMBOLS) -> list[bytes]:
    """Greedy symbol table from substring gain counts on a sample."""
    if len(sample) > _TRAIN_CAP:
        step = len(sample) // _TRAIN_CAP + 1
        # stride whole windows to keep contiguous substrings intact
        arr = np.frombuffer(sample, dtype=np.uint8)
        keep = (np.arange(len(arr)) // 256) % step == 0
        arr = arr[keep]
    else:
        arr = np.frombuffer(sample, dtype=np.uint8)
    n = len(arr)
    if n == 0:
        return []
    keys64 = _window_keys64(arr)
    candidates: list[tuple[int, bytes]] = []
    for length in range(1, MAX_SYM_LEN + 1):
        if n < length:
            break
        mask = np.uint64((1 << (8 * length)) - 1) if length < 8 else np.uint64(2**64 - 1)
        keys = (keys64 & mask)[: n - length + 1]
        uniq, counts = np.unique(keys, return_counts=True)
        gain = counts * (length - 1 if length > 1 else 1)
        if length == 1:
            order = np.argsort(gain)[::-1][:256]
        else:
            thresh = max(2, int(gain.mean()))
            order = np.flatnonzero(gain >= thresh)
            order = order[np.argsort(gain[order])[::-1]][:512]
        for i in order:
            g = int(gain[i])
            if g <= 0:
                continue
            candidates.append((g, _key_to_bytes(uniq[i], length)))
    candidates.sort(key=lambda t: (-t[0], t[1]))
    table: list[bytes] = []
    seen = set()
    for _, sym in candidates:
        if sym in seen:
            continue
        seen.add(sym)
        table.append(sym)
        if len(table) >= max_symbols:
            break
    return table


def _match_arrays(data: np.ndarray, table: list[bytes]):
    """best_len[pos], best_code[pos]: longest symbol matching at pos."""
    n = len(data)
    best_len = np.zeros(n, dtype=np.int64)
    best_code = np.zeros(n, dtype=np.int64)
    by_len: dict[int, list[tuple[int, bytes]]] = {}
    for code, sym in enumerate(table):
        by_len.setdefault(len(sym), []).append((code, sym))
    keys64 = _window_keys64(data)
    for length in sorted(by_len):  # ascending: longer overwrites shorter
        if n < length:
            continue
        pairs = by_len[length]
        sym_keys = np.array(
            [int.from_bytes(s.ljust(8, b"\0"), "little") for _, s in pairs],
            dtype=np.uint64,
        )
        codes = np.array([c for c, _ in pairs], dtype=np.int64)
        srt = np.argsort(sym_keys)
        syms_sorted = sym_keys[srt]
        codes_sorted = codes[srt]
        mask = np.uint64((1 << (8 * length)) - 1) if length < 8 else np.uint64(2**64 - 1)
        keys = (keys64 & mask)[: n - length + 1]
        idx = np.searchsorted(syms_sorted, keys)
        idx_c = np.minimum(idx, len(syms_sorted) - 1)
        hit = syms_sorted[idx_c] == keys
        pos = np.flatnonzero(hit)
        best_len[pos] = length
        best_code[pos] = codes_sorted[idx_c[pos]]
    return best_len, best_code


def encode(data: bytes, table: list[bytes]) -> tuple[bytes, bytes]:
    """-> (code_stream, literal_stream). Greedy longest-match parse."""
    n = len(data)
    if n == 0:
        return b"", b""
    if not table:
        # degenerate: everything escapes
        return bytes([ESCAPE]) * n, data
    arr = np.frombuffer(data, dtype=np.uint8)
    best_len, best_code = _match_arrays(arr, table)
    bl = best_len.tolist()
    bc = best_code.tolist()
    codes = bytearray()
    lits = bytearray()
    pos = 0
    append_c = codes.append
    append_l = lits.append
    while pos < n:
        ln = bl[pos]
        if ln:
            append_c(bc[pos])
            pos += ln
        else:
            append_c(ESCAPE)
            append_l(data[pos])
            pos += 1
    return bytes(codes), bytes(lits)


def decode(codes: bytes, literals: bytes, table: list[bytes]) -> bytes:
    """Vectorized inverse of :func:`encode`."""
    m = len(codes)
    if m == 0:
        return b""
    carr = np.frombuffer(codes, dtype=np.uint8).astype(np.int64)
    sym_flat = b"".join(table)
    buf = np.frombuffer(sym_flat + literals, dtype=np.uint8)
    lens_tab = np.ones(256, dtype=np.int64)
    starts_tab = np.zeros(256, dtype=np.int64)
    off = 0
    for code, sym in enumerate(table):
        lens_tab[code] = len(sym)
        starts_tab[code] = off
        off += len(sym)
    esc = carr == ESCAPE
    lens = np.where(esc, 1, lens_tab[carr])
    starts = np.where(esc, off + np.cumsum(esc) - 1, starts_tab[carr])
    out_off = np.concatenate(([0], np.cumsum(lens)))
    total = int(out_off[-1])
    idx = (
        np.repeat(starts, lens)
        + np.arange(total, dtype=np.int64)
        - np.repeat(out_off[:-1], lens)
    )
    return buf[idx].tobytes()


def serialize_table(table: list[bytes]) -> tuple[list[int], bytes]:
    return [len(s) for s in table], b"".join(table)


def deserialize_table(lens: list[int], buf: bytes) -> list[bytes]:
    out = []
    off = 0
    for ln in lens:
        out.append(buf[off : off + ln])
        off += ln
    return out


def estimate(sample: bytes, total_bytes: int) -> int:
    """Predicted encoded size of ``total_bytes`` from a small sample."""
    if total_bytes == 0:
        return 0
    probe = sample[: 1 << 12]
    if not probe:
        return total_bytes
    table = train(probe)
    codes, lits = encode(probe, table)
    ratio = (len(codes) + len(lits)) / len(probe)
    table_bytes = sum(len(s) for s in table) + len(table)
    return int(ratio * total_bytes) + table_bytes + 64
