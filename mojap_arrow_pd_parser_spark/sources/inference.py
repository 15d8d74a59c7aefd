"""File-format inference — semantics of /root/reference/arrow_pd_parser/utils.py:49-103.

Extension sniffing ignores compression suffixes (``tar gz zip gzip
brotli snappy zst``) and falls back to the metadata ``file_format``
key. On a path/metadata conflict the PATH wins with a warning; it
raises only when neither side yields a format — same contract as the
reference's ``infer_file_format`` (tests
/root/reference/tests/test_utils.py:28-130: ``file.csv.gz`` -> csv,
``SNAPPY.PARQUET`` -> parquet, conflict -> path-derived format).
"""

from __future__ import annotations

import os

CSV, JSONL, PARQUET = "csv", "json", "parquet"

_EXT_MAP = {
    "csv": CSV, "tsv": CSV,
    "json": JSONL, "jsonl": JSONL, "ndjson": JSONL,
    "parquet": PARQUET, "pq": PARQUET,
}
_COMPRESSION_SUFFIXES = {"tar", "gz", "zip", "gzip", "brotli", "br", "snappy", "zst", "zstd", "lz4"}


def infer_format_from_filepath(path: str) -> str | None:
    name = os.path.basename(path.rstrip("/"))
    parts = [p.lower() for p in name.split(".")[1:]]
    while parts and parts[-1] in _COMPRESSION_SUFFIXES:
        parts.pop()
    if not parts:
        return None
    return _EXT_MAP.get(parts[-1])


def infer_format_from_meta(metadata: dict | None) -> str | None:
    if not metadata:
        return None
    ff = metadata.get("file_format")
    if not ff:
        return None
    return _EXT_MAP.get(str(ff).lower().lstrip("."))


def infer_file_format(path: str, metadata: dict | None = None) -> str:
    """Path extension first, then metadata; the path wins a conflict.

    Reference contract (tests/test_utils.py
    Test_infer_file_format_with_meta::test_conflict_infer_from_both):
    when path and metadata disagree, the path-derived format silently
    wins (warn here, don't crash a read of e.g. a .csv export of a
    parquet-registered table); only raise when NEITHER side yields a
    format."""
    from_path = infer_format_from_filepath(path)
    from_meta = infer_format_from_meta(metadata)
    if from_path and from_meta and from_path != from_meta:
        import warnings

        warnings.warn(
            f"file format conflict for {path!r}: path says {from_path!r}, "
            f"metadata says {from_meta!r}; using the path",
            stacklevel=2,
        )
    fmt = from_path or from_meta
    if not fmt:
        raise ValueError(
            f"could not infer file format for {path!r}; pass file_format "
            "or a metadata dict with a file_format key"
        )
    return fmt


def human_to_bytes(size: str | int) -> int:
    """``"2.5GB"`` -> bytes (C15, utils.py:113-132)."""
    if isinstance(size, (int, float)):
        return int(size)
    import re

    m = re.fullmatch(
        r"\s*([\d.]+)\s*([KMGT]?i?B?)\s*", size, flags=re.IGNORECASE
    )
    if not m:
        raise ValueError(f"cannot parse size string {size!r}")
    num = float(m.group(1))
    unit = m.group(2).upper().replace("IB", "B")
    mult = {"B": 1, "": 1, "KB": 2**10, "MB": 2**20, "GB": 2**30, "TB": 2**40}
    if unit not in mult:
        raise ValueError(f"cannot parse size unit in {size!r}")
    return int(num * mult[unit])
