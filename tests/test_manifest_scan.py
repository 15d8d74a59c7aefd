"""Distributed manifest/sidecar scan (operators/encode.py).

At 100-TB scale (~400k chunks) the sidecar scan must not do O(chunks)
serial driver round trips: with a spark handle and enough sidecars it
becomes ONE spark.read.json over the manifest directory plus ONE paged
chunk-dir listing. These tests build a 10k-sidecar table and assert
(a) the distributed path reads no sidecar through the driver,
(b) it returns exactly what the serial path returns, including
corrupt-sidecar skips, size-mismatch damage flags and compaction
``replaces`` lineage, (c) small tables keep the cheap serial loop.
"""

from __future__ import annotations

import json
import os

import pytest

from mojap_arrow_pd_parser_spark.operators import encode as enc_mod
from mojap_arrow_pd_parser_spark.operators.encode import (
    live_chunks,
    scan_sidecars,
)

N_SIDECARS = 10_000


def _write_table(root: str, n: int) -> None:
    os.makedirs(f"{root}/chunks")
    os.makedirs(f"{root}/manifest")
    for cid in range(n):
        fname = f"chunk-{cid:05d}.parquet"
        payload = b"x" * (10 + cid % 7)
        with open(f"{root}/chunks/{fname}", "wb") as f:
            f.write(payload)
        m = {
            "chunk_id": cid,
            "n_rows": 100 + cid,
            "n_cols": 4,
            "in_bytes": 1000,
            "out_bytes": 500,
            "codecs": '{"tokens":"rle"}',
            "crc32": "deadbeef",
            "key_min": f"doc{cid:05d}",
            "key_max": f"doc{cid:05d}z",
            "wall_ms": 5,
            "status": "ok",
            "file": fname,
            "file_bytes": len(payload),
        }
        if cid % 1000 == 999:  # some compacted chunks with lineage
            m["replaces"] = [cid - 1, cid - 2]
        with open(f"{root}/manifest/{cid:05d}.json", "w") as f:
            f.write(json.dumps(m))
    # a partial sidecar from a killed run -> skipped by both paths
    with open(f"{root}/manifest/zzzzz.json", "w") as f:
        f.write('{"chunk_id": 99999, "n_ro')
    # a malformed-but-parseable sidecar: no file_bytes AND no chunk
    # file. Serial path skips it (KeyError/OSError); the distributed
    # path must NOT mark it verified via None == None.
    with open(f"{root}/manifest/yyyyy.json", "w") as f:
        f.write(json.dumps({"chunk_id": 77777, "file": "chunk-77777.parquet",
                            "status": "ok"}))
    # a size-mismatched chunk -> _verified False on both paths
    with open(f"{root}/chunks/chunk-00003.parquet", "ab") as f:
        f.write(b"extra")


@pytest.fixture(scope="module")
def table_10k(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("manifest10k") / "enc")
    _write_table(root, N_SIDECARS)
    return root


def test_distributed_scan_reads_no_sidecar_on_driver(spark, table_10k, monkeypatch):
    from mojap_arrow_pd_parser_spark.sources import fsio

    calls = {"read_json": 0, "file_size": 0}
    real_read = fsio.read_json
    monkeypatch.setattr(
        fsio, "read_json",
        lambda p: calls.__setitem__("read_json", calls["read_json"] + 1) or real_read(p),
    )
    real_size = fsio.file_size
    monkeypatch.setattr(
        fsio, "file_size",
        lambda p: calls.__setitem__("file_size", calls["file_size"] + 1) or real_size(p),
    )
    out = scan_sidecars(table_10k, spark)
    # the whole scan: zero per-sidecar driver reads, zero per-file stats
    assert calls == {"read_json": 0, "file_size": 0}
    assert len(out) == N_SIDECARS


def test_distributed_matches_serial(spark, table_10k):
    serial = scan_sidecars(table_10k)  # no spark -> driver loop
    dist = scan_sidecars(table_10k, spark)
    assert len(serial) == len(dist) == N_SIDECARS
    assert serial == dist
    # the no-file_bytes/no-file sidecar is absent from BOTH views (a
    # damaged table must not pass verification through a null size)
    assert 77777 not in serial and 77777 not in dist
    # damage flag preserved
    assert dist[3]["_verified"] is False
    assert dist[4]["_verified"] is True
    # compaction lineage preserved -> live view identical
    assert dist[999]["replaces"] == [998, 997]
    assert set(live_chunks(dist)) == set(live_chunks(serial))


def test_small_tables_stay_serial(spark, tmp_path, monkeypatch):
    root = str(tmp_path / "small")
    _write_table(root, 10)
    called = {"dist": False}
    real = enc_mod._scan_sidecars_distributed
    monkeypatch.setattr(
        enc_mod, "_scan_sidecars_distributed",
        lambda *a: called.__setitem__("dist", True) or real(*a),
    )
    out = scan_sidecars(root, spark)
    assert len(out) == 10
    assert called["dist"] is False  # below threshold -> no Spark job
