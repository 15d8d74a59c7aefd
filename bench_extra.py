"""Round-8 optimization harness (guide §1): per-query noop-sink walls +
``explain("formatted")`` capture, WITHOUT the scaling phase, so an
iterate-measure loop runs in ~2 min instead of ~45.

The driver's frozen ``bench.py`` remains the measurement of record;
this file only exists so OPTIMIZATION_r08.md can cite isolated numbers
and committed plan files (plans/r08/*.txt).

Usage:
    python bench_extra.py                 # all bench queries + encode/verify
    python bench_extra.py q12 q13         # just those (prefix match)
    PLAN_TAG=before python bench_extra.py # write plans/r08/<q>_before.txt
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLAN_TAG = os.environ.get("PLAN_TAG", "")
PLAN_DIR = os.path.join(REPO, "plans", "r08")
REPEATS = int(os.environ.get("BE_REPEATS", "3"))

BENCH_QUERIES = [
    "q01_pricing_summary",
    "q03_nation_revenue",
    "q04_sessionize",
    "q05_rle_runs",
    "q08_conform_cast",
    "q12_minhash_lsh",
    "q13_text_suite",
    "q16_similarity_topk",
    "q18_stream_window",
    "q19_salted_agg",
]


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def save_plan(name: str, df) -> None:
    if not PLAN_TAG:
        return
    os.makedirs(PLAN_DIR, exist_ok=True)
    with open(os.path.join(PLAN_DIR, f"{name}_{PLAN_TAG}.txt"), "w") as f:
        f.write(_explain(df))


def main() -> None:
    from mojap_arrow_pd_parser_spark.queries import QUERIES
    from mojap_arrow_pd_parser_spark.session import get_spark

    want = sys.argv[1:]

    def selected(name: str) -> bool:
        return not want or any(name.startswith(w) for w in want)

    spark = get_spark("bench_extra", cores=CPUS, shuffle_partitions=max(CPUS, 16))
    times: dict[str, float] = {}

    for name in BENCH_QUERIES:
        if not selected(name):
            continue
        fn, _ = QUERIES[name]
        spark.sparkContext.setJobDescription(name)
        runs = []
        for i in range(REPEATS):
            t0 = time.monotonic()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.monotonic() - t0)
        save_plan(name, fn(spark, SF_DIR))
        times[name] = round(min(runs), 3)
        print(f"{name}: {times[name]}  (runs: {[round(r,2) for r in runs]})",
              flush=True)

    if selected("encode") or selected("verify") or selected("decode"):
        import bench as B

        from mojap_arrow_pd_parser_spark.operators.decode import (
            decode_table, verify_roundtrip,
        )

        sf = B.sf_of(SF_DIR)
        src = B.prepare_source(spark, sf)
        out = f"/tmp/bx_enc_{CPUS}"
        shutil.rmtree(out, ignore_errors=True)
        if selected("encode"):
            spark.sparkContext.setJobDescription("encode")
            enc = B.run_encode(spark, src, out, n_chunks=64, repeats=REPEATS,
                               warmup=1)
            times["encode"] = enc["wall_sec"]
            print(f"encode: {enc['wall_sec']}  walls={enc['walls']} "
                  f"tok/s={enc['tokens_per_sec']}", flush=True)
        else:
            B.run_encode(spark, src, out, n_chunks=64, repeats=1, warmup=0)
        if selected("verify"):
            spark.sparkContext.setJobDescription("verify_roundtrip")
            runs = []
            for i in range(REPEATS):
                t0 = time.monotonic()
                vr = verify_roundtrip(spark, spark.read.parquet(src), out)
                runs.append(time.monotonic() - t0)
            times["verify_roundtrip"] = round(min(runs), 3)
            print(f"verify_roundtrip: {times['verify_roundtrip']} "
                  f"(runs: {[round(r,2) for r in runs]}) "
                  f"mism={vr['mismatches']}", flush=True)
        if selected("decode"):
            spark.sparkContext.setJobDescription("decode")
            runs = []
            for i in range(REPEATS):
                t0 = time.monotonic()
                decode_table(spark, out).write.format("noop") \
                    .mode("overwrite").save()
                runs.append(time.monotonic() - t0)
            save_plan("decode", decode_table(spark, out))
            times["decode"] = round(min(runs), 3)
            print(f"decode: {times['decode']} "
                  f"(runs: {[round(r,2) for r in runs]})", flush=True)

    print(json.dumps({"times": times, "sf_dir": SF_DIR, "cpus": CPUS}))
    spark.stop()


if __name__ == "__main__":
    main()
