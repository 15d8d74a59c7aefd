"""A/B the file-aligned encode: near-tie hysteresis margin 0.02 vs 0.

VERDICT r5 carried encode_file_aligned 30.1 -> 22.0M tokens/s as
unadjudicated (engine change vs host throttle window — the headline
artifact that would have disambiguated was truncated). This script
measures both hypotheses head-on:

* each arm runs in a FRESH subprocess with
  SPARK_GRAFT_NEAR_TIE_MARGIN set (workers re-read it at import, so
  the codec chooser really changes in the executors);
* arms alternate A/B/A/B so a drifting host window penalizes both
  equally;
* each arm reports min-wall, per-codec histogram from the chunk
  manifests, and total encoded bytes — if the histograms/bytes are
  identical across margins, the hysteresis is exonerated and any wall
  delta is the window.

Usage: python scripts/ab_file_aligned.py [rounds=2]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def child(margin: float) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", str(margin)],
        capture_output=True, text=True,
        env={**os.environ, "SPARK_GRAFT_NEAR_TIE_MARGIN": str(margin)},
        timeout=1800,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"child failed: {out.stderr[-2000:]}")


def main_child(margin: float) -> None:
    import collections

    from bench import AVG_LEN, bench_docs, prepare_source, sf_of
    from mojap_arrow_pd_parser_spark.operators.encode import (
        encode_files, scan_done_chunks,
    )
    from mojap_arrow_pd_parser_spark.session import get_spark

    sf = sf_of(SF_DIR)
    spark = get_spark(f"ab_fa_{margin}", cores=CPUS,
                      shuffle_partitions=max(CPUS, 16))
    src = prepare_source(spark, sf, n_docs=bench_docs(sf))
    out = f"/tmp/ab_fa_{margin}"
    walls = []
    for i in range(3):  # pass 0 = warm-up (JVM/codegen), min of last 2
        shutil.rmtree(out, ignore_errors=True)
        if i:
            time.sleep(10.0)
        t0 = time.monotonic()
        encode_files(spark, src, out, resume=False, consolidate=False)
        if i:
            walls.append(round(time.monotonic() - t0, 3))
    codecs = collections.Counter()
    out_b = 0
    for m in scan_done_chunks(out).values():
        out_b += m["out_bytes"]
        for c in json.loads(m["codecs"]).values():
            codecs[c if isinstance(c, str) else c.get("codec", str(c))] += 1
    spark.stop()
    print(json.dumps({
        "margin": margin, "walls": walls, "wall_min": min(walls),
        "out_bytes": out_b, "codecs": dict(sorted(codecs.items())),
        "avg_len": AVG_LEN,
    }))


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    arms = {0.02: [], 0.0: []}
    results = {}
    for r in range(rounds):
        for margin in (0.02, 0.0):
            time.sleep(15.0)
            res = child(margin)
            arms[margin].append(res["wall_min"])
            results[margin] = res
            print(f"round {r} margin={margin}: walls={res['walls']}")
    summary = {
        str(m): {
            "wall_min": min(ws), "walls_all": ws,
            "out_bytes": results[m]["out_bytes"],
            "codecs": results[m]["codecs"],
        }
        for m, ws in arms.items()
    }
    same_choice = (
        results[0.02]["codecs"] == results[0.0]["codecs"]
        and results[0.02]["out_bytes"] == results[0.0]["out_bytes"]
    )
    summary["codec_choices_identical"] = same_choice
    print(json.dumps(summary))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        main_child(float(sys.argv[2]))
    else:
        main()
