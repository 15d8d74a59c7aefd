"""Streaming per-group regrouping of Arrow batches inside map tasks.

Both the encode and decode ``mapInArrow`` bodies process their scan
partition one chunk at a time. The naive shape —
``pa.Table.from_batches(list(batches))`` then filter per chunk —
buffers the ENTIRE partition's decompressed payload before any work
starts; ``maxPartitionBytes`` bounds only the compressed bytes, so the
working set could be several× that at 100-TB scale.

:func:`iter_contiguous_groups` instead streams: it accumulates batches
only while the group key stays constant and yields each finished group
as soon as the key changes, so peak working set ≈ one chunk. It
REQUIRES group-contiguous input, which both call sites guarantee:

* decode: chunk files are written as single row groups and Spark's
  vectorized parquet reader never interleaves files within a scan
  partition, so batches arrive chunk-contiguous;
* encode: the shuffle is followed by ``sortWithinPartitions`` on the
  bucket id — Spark's external sort spills to disk, so sorting does
  not reintroduce the memory spike it removes.

A non-contiguous key (same id appearing again after a different id)
would split a chunk in two; callers fail loudly on the partial group
(decode: missing columns; encode: duplicate chunk file commit), never
silently corrupt — and :func:`iter_contiguous_groups` raises on the
second occurrence to make the contract explicit.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pyarrow as pa


def iter_contiguous_groups(
    batches: Iterable[pa.RecordBatch], key: str
) -> Iterator[tuple[int, pa.Table]]:
    """Yield ``(group_id, table)`` per contiguous run of ``key``.

    Lazy: each group is yielded as soon as its last batch has been
    read from ``batches`` — nothing beyond the current group is ever
    buffered. Raises ValueError if a group id re-appears after a
    different id (input not group-contiguous).
    """
    cur_id: int | None = None
    cur: list[pa.RecordBatch] = []
    seen: set[int] = set()

    for b in batches:
        if not b.num_rows:
            continue
        ids = b.column(key).to_numpy(zero_copy_only=False)
        # split points where the group id changes within the batch
        # (normally a batch holds exactly one id — one chunk per file)
        cuts = [0, *(np.flatnonzero(np.diff(ids)) + 1), len(ids)]
        for s, e in zip(cuts[:-1], cuts[1:]):
            gid = int(ids[s])
            if gid != cur_id:
                if cur:
                    yield cur_id, pa.Table.from_batches(cur)
                    cur = []
                if gid in seen:
                    raise ValueError(
                        f"batches are not contiguous on {key!r}: group "
                        f"{gid} re-appeared after group {cur_id}"
                    )
                seen.add(gid)
                cur_id = gid
            cur.append(b.slice(s, e - s))
    if cur:
        yield cur_id, pa.Table.from_batches(cur)
