"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at sf0.01, compares row counts and order-insensitive values
(columns sorted by name, rows sorted, values stringified). Usage:

    python scripts/crosscheck.py [qname ...]
"""

from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from mojap_arrow_pd_parser_spark.session import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def normalize(df_pandas):
    import pandas as pd

    df = df_pandas.reindex(sorted(df_pandas.columns), axis=1)

    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "<null>"
        if isinstance(v, float):
            return f"{v:.6g}"
        if isinstance(v, bytes):
            return v.hex()
        if hasattr(v, "tolist"):
            return str(v.tolist())
        return str(v)

    rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False))
    return rows


def main():
    # accept space- AND comma-separated names, tolerate an `--only`
    # flag word, and FAIL on unknown names — a filter that silently
    # matches nothing turns the whole run into a vacuous "ALL MATCH"
    only = {
        n
        for a in sys.argv[1:]
        if a != "--only"
        for n in a.split(",")
        if n
    }
    spark = get_spark("crosscheck", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for f in glob.glob(f"{SF_DIR}/*.parquet"):
        name = os.path.basename(f).removesuffix(".parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        sys.exit(f"crosscheck: unknown query names: {sorted(unknown)}")
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            continue
        t_spark = time.monotonic() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows-only, {len(sdf)} rows ({t_spark:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            continue
        srows, orows = normalize(sdf), normalize(odf)
        if len(srows) != len(orows):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(srows)} duckdb={len(orows)}")
        elif srows != orows:
            failures.append(name)
            bad = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
            print(f"FAIL  {name}: value mismatch at sorted row {bad}:")
            print(f"      spark : {srows[bad]}")
            print(f"      duckdb: {orows[bad]}")
        else:
            print(f"OK    {name}: {len(srows)} rows match ({t_spark:.1f}s)")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL MATCH")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
