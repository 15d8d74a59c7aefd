"""spark-submit entry point for the encode job (north rule: runs via
``spark-submit --py-files`` on a multi-executor cluster).

Cluster usage (the package zip ships with the job):

    cd /root/repo && zip -qr /tmp/mojap_spark.zip mojap_arrow_pd_parser_spark
    spark-submit --py-files /tmp/mojap_spark.zip \
        submit/encode_job.py --input <tokens parquet/iceberg path> \
        --output <encoded table dir> --key doc_id --chunks 4096 [--resume]

Local sandbox smoke:

    spark-submit --master local[8] --py-files /tmp/mojap_spark.zip \
        submit/encode_job.py --synthetic 10000 --output /tmp/submit_enc

On a real cluster set ``--chunks`` so chunks land near 256 MB
(total_bytes / 256MB); resume after any failure is automatic from the
manifest sidecars.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# direct `python submit/encode_job.py` runs: make the repo root
# importable (spark-submit --py-files covers the cluster case)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_REPO, "mojap_arrow_pd_parser_spark")):
    sys.path.insert(0, _REPO)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", help="tokens table path (parquet dir)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic docs instead of --input")
    p.add_argument("--output", required=True)
    p.add_argument("--key", default="doc_id")
    p.add_argument("--chunks", type=int, default=64)
    p.add_argument("--partition-col", default=None,
                   help="partition-salted chunking on this column "
                        "(hot values split across proportional salts)")
    p.add_argument("--align-files", action="store_true",
                   help="shuffle-free encode: one source parquet file "
                        "-> one chunk (requires --input)")
    p.add_argument("--append-generation", type=int, default=None,
                   help="incremental ingest: append this batch to an "
                        "EXISTING table under the given generation id")
    p.add_argument("--upsert-generation", type=int, default=None,
                   help="MERGE by key: batch rows replace same-key rows, "
                        "new keys insert, under the given generation id")
    p.add_argument("--delete-where", default=None, metavar="COL,LO,HI",
                   help="row-level delete on --output (standalone: "
                        "needs no --input): delete COL BETWEEN LO AND HI")
    p.add_argument("--cluster-by", default=None, metavar="COL[,COL...]",
                   help="Z-order the chunks on these columns "
                        "(multi-dimensional zone-map pruning)")
    p.add_argument("--track-snapshots", action="store_true",
                   help="version every commit (time travel / CDC reads)")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--verify", action="store_true",
                   help="decode + round-trip verify after encoding")
    p.add_argument("--compact-min-rows", type=int, default=0,
                   help="after encoding, merge chunks smaller than this "
                        "(crash-safe replace semantics + GC)")
    p.add_argument("--decode-to", default=None,
                   help="after encoding, decode the table back to plain "
                        "parquet at this path (the export/consumer job)")
    args = p.parse_args()
    if not args.synthetic and not args.input and not args.delete_where:
        p.error("need --input, --synthetic, or --delete-where")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("mojap_encode_job").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.sparkContext.setLogLevel("WARN")

    from mojap_arrow_pd_parser_spark.operators.decode import verify_roundtrip
    from mojap_arrow_pd_parser_spark.operators.encode import (
        delete_rows,
        encode_append,
        encode_files,
        encode_table,
        upsert_rows,
    )

    if args.delete_where and not (args.input or args.synthetic):
        col, lo, hi = args.delete_where.split(",", 2)

        def _coerce(v: str):
            for cast in (int, float):
                try:
                    return cast(v)
                except ValueError:
                    continue
            return v

        lo, hi = _coerce(lo), _coerce(hi)
        t0 = time.monotonic()
        manifest = delete_rows(spark, args.output, (col, lo, hi), gc=True)
        print(json.dumps({
            "deleted_where": [col, lo, hi],
            "manifest_chunks": manifest.count(),
            "wall_sec": round(time.monotonic() - t0, 2),
        }))
        spark.stop()
        return

    if args.align_files and not args.input:
        p.error("--align-files requires --input (a parquet directory)")

    if args.synthetic:
        from mojap_arrow_pd_parser_spark.datagen import tokens_table

        df = tokens_table(spark, args.synthetic)
    else:
        df = spark.read.parquet(args.input)

    t0 = time.monotonic()
    if args.upsert_generation is not None:
        manifest = upsert_rows(
            spark, df, args.output, generation=args.upsert_generation,
        )
    elif args.append_generation is not None:
        manifest = encode_append(
            spark, df, args.output, generation=args.append_generation,
            resume=not args.no_resume,
        )
    elif args.align_files:
        manifest = encode_files(
            spark, args.input, args.output, key=args.key,
            resume=not args.no_resume,
        )
    else:
        manifest = encode_table(
            spark, df, args.output, key=args.key, n_chunks=args.chunks,
            resume=not args.no_resume, partition_col=args.partition_col,
            cluster_by=(
                args.cluster_by.split(",") if args.cluster_by else None
            ),
            track_snapshots=args.track_snapshots,
        )
    stats = manifest.groupBy().agg(
        {"n_rows": "sum", "in_bytes": "sum", "out_bytes": "sum"}
    ).collect()[0]
    result = {
        "chunks": manifest.count(),
        "rows": stats["sum(n_rows)"],
        "in_bytes": stats["sum(in_bytes)"],
        "out_bytes": stats["sum(out_bytes)"],
        "wall_sec": round(time.monotonic() - t0, 2),
    }
    if args.compact_min_rows:
        from mojap_arrow_pd_parser_spark.operators.encode import compact_chunks

        compacted = compact_chunks(spark, args.output, min_rows=args.compact_min_rows)
        result["chunks_after_compact"] = compacted.count()
    if args.decode_to:
        from mojap_arrow_pd_parser_spark.operators.decode import decode_table

        t0 = time.monotonic()
        decode_table(spark, args.output).write.mode("overwrite").parquet(
            args.decode_to
        )
        result["decode_to"] = args.decode_to
        result["decode_wall_sec"] = round(time.monotonic() - t0, 2)
    if args.verify:
        result["verify"] = verify_roundtrip(spark, df, args.output, key=args.key)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
