"""Object-store-capable file I/O for plan/chunk/manifest commits.

Every engine-side file operation (plan.json, chunk parquet, manifest
sidecars) routes through ``pyarrow.fs`` so the SAME commit protocol
works on ``file://``, ``s3://`` and ``hdfs://`` — on a real cluster
executors cannot ``os.replace`` into an object store and the driver
cannot ``os.listdir`` it.

Commit semantics per filesystem:

* local — write ``.tmp-<uuid>`` in the destination directory, then an
  atomic POSIX rename (``FileSystem.move`` on LocalFileSystem);
* object stores (S3 et al.) — ONE direct put: an S3 object is
  invisible until the PUT completes, so the put itself is the atomic
  commit (S3 has no rename; copy+delete would *weaken* atomicity,
  not provide it). Objects ≤ ``_SINGLE_PUT_MAX`` (5 GiB, the S3
  single-PUT ceiling — every engine chunk, sized ~256 MB, is far
  below it) go through one ``put_object`` call when boto3 is
  importable; larger objects (or no boto3) stream through pyarrow's
  multipart writer. The single put is both the stronger commit (no
  CompleteMultipartUpload window) and the testable one (pyarrow 16's
  multipart CompleteMultipartUpload is incompatible with moto 5).

Either way the engine's file-then-metadata ordering (chunk file
durable before its manifest sidecar exists) is what makes a killed
run resumable — see operators/encode.py.

Spark-side reads/writes of the same directories keep their native
URIs (Spark resolves ``s3a://`` through Hadoop); ``resolve`` maps
``s3a://`` to pyarrow's ``s3://`` so both layers can share one
location string.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyarrow import fs as pafs


_SINGLE_PUT_MAX = 5 * 1024**3  # S3 single-PUT object-size ceiling


def _s3_single_put(fs_path: str, data: bytes) -> bool:
    """Commit ``data`` at the S3-internal path ``bucket/key`` with ONE
    ``put_object`` (atomic: the object is invisible until the PUT
    returns). Returns False when boto3 is unavailable so the caller
    falls back to pyarrow's multipart stream."""
    if len(data) > _SINGLE_PUT_MAX:
        return False
    client = _s3_client()
    if client is None:
        return False
    bucket, _, key = fs_path.partition("/")
    client.put_object(Bucket=bucket, Key=key, Body=data)
    return True


_S3_CLIENT = None


def _s3_client():
    """Process-cached boto3 S3 client (one per executor worker), or
    None without boto3. boto3 honors AWS_ENDPOINT_URL /
    AWS_DEFAULT_REGION env natively, so the same endpoint/credential
    resolution pyarrow's S3FileSystem applied governs the put."""
    global _S3_CLIENT
    if _S3_CLIENT is None:
        try:
            import boto3
        except ImportError:
            return None
        _S3_CLIENT = boto3.client("s3")
    return _S3_CLIENT


def resolve(path: str) -> tuple[pafs.FileSystem, str]:
    """Path or URI -> (FileSystem, fs-internal path)."""
    if "://" in path:
        uri = path
        if uri.startswith("s3a://"):  # Hadoop scheme -> pyarrow scheme
            uri = "s3://" + uri[len("s3a://"):]
        return pafs.FileSystem.from_uri(uri)
    return pafs.LocalFileSystem(), os.path.abspath(path)


def is_local(fs: pafs.FileSystem) -> bool:
    return isinstance(fs, pafs.LocalFileSystem)


def join(base: str, *parts: str) -> str:
    """URI-safe path join (os.path.join would not touch URIs anyway,
    but keep one explicit place for it)."""
    return "/".join([base.rstrip("/"), *parts])


def makedirs(path: str) -> None:
    fs, p = resolve(path)
    fs.create_dir(p, recursive=True)


def exists(path: str) -> bool:
    fs, p = resolve(path)
    return fs.get_file_info(p).type != pafs.FileType.NotFound


def delete_dir(path: str) -> None:
    """Recursively delete a directory; missing directories are a no-op
    (crash-retry cleanups must be idempotent)."""
    fs, p = resolve(path)
    try:
        fs.delete_dir(p)
    except (FileNotFoundError, OSError):
        pass


def file_size(path: str) -> int | None:
    fs, p = resolve(path)
    info = fs.get_file_info(p)
    if info.type != pafs.FileType.File:
        return None
    return info.size


def list_files(dir_path: str) -> list[tuple[str, int]]:
    """[(base_name, size)] of plain files directly under dir_path;
    empty if the directory does not exist."""
    fs, p = resolve(dir_path)
    sel = pafs.FileSelector(p, allow_not_found=True, recursive=False)
    return [
        (info.base_name, info.size)
        for info in fs.get_file_info(sel)
        if info.type == pafs.FileType.File
    ]


def list_dirs(dir_path: str) -> list[str]:
    """Base names of directories directly under dir_path; empty if
    the directory does not exist."""
    fs, p = resolve(dir_path)
    sel = pafs.FileSelector(p, allow_not_found=True, recursive=False)
    return [
        info.base_name
        for info in fs.get_file_info(sel)
        if info.type == pafs.FileType.Directory
    ]


def read_bytes(path: str) -> bytes:
    fs, p = resolve(path)
    with fs.open_input_stream(p) as f:
        return f.read()


def write_bytes_atomic(path: str, data: bytes) -> int:
    """Commit ``data`` at ``path``: tmp+rename locally, single put on
    object stores. Returns the byte size written."""
    fs, p = resolve(path)
    if is_local(fs):
        d, base = os.path.split(p)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}-{base}")
        with fs.open_output_stream(tmp) as f:
            f.write(data)
        fs.move(tmp, p)
    elif not (isinstance(fs, pafs.S3FileSystem) and _s3_single_put(p, data)):
        with fs.open_output_stream(p) as f:
            f.write(data)
    return len(data)


def read_json(path: str) -> dict:
    return json.loads(read_bytes(path).decode("utf-8"))


def write_json_atomic(path: str, obj: dict) -> int:
    return write_bytes_atomic(path, json.dumps(obj).encode("utf-8"))


def write_parquet_atomic(table: pa.Table, path: str, compression: str = "none") -> int:
    """Commit one parquet file; returns its final byte size (the
    durability witness recorded in the manifest sidecar)."""
    fs, p = resolve(path)
    if is_local(fs):
        d, base = os.path.split(p)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}-{base}")
        pq.write_table(table, tmp, compression=compression)
        fs.move(tmp, p)
    elif isinstance(fs, pafs.S3FileSystem):
        # serialize to one buffer, commit with one put (chunks are
        # ~256 MB by construction — far under the 5 GiB put ceiling)
        buf = pa.BufferOutputStream()
        pq.write_table(table, buf, compression=compression)
        data = buf.getvalue().to_pybytes()
        if not _s3_single_put(p, data):
            with fs.open_output_stream(p) as f:
                f.write(data)
    else:
        pq.write_table(table, p, filesystem=fs, compression=compression)
    size = file_size(path)
    assert size is not None, f"parquet commit vanished: {path}"
    return size
