"""Engine + training-pipeline operators (public API)."""

from .decode import decode_table, encoded_size_report, load_plan, verify_roundtrip
from .encode import encode_chunk_table, encode_files, encode_table, scan_done_chunks

__all__ = [
    "encode_table", "encode_files", "encode_chunk_table", "scan_done_chunks",
    "decode_table", "verify_roundtrip", "encoded_size_report", "load_plan",
]
