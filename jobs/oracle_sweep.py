#!/usr/bin/env python
"""Driver-style oracle sweep: run every `queries()` entry on Spark at
sf0.01 and compare against its `oracle_sql()` in DuckDB (rows, sorted
columns, values under rtol 1e-9), mirroring the round driver's
CORRECTNESS harness.  Rows without oracle SQL report row counts only.

Usage: python jobs/oracle_sweep.py [sf_dir]
Exits nonzero on the first mismatch.
"""

from __future__ import annotations

import glob
import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession

import __spark_entry__ as E

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("entry rows:", E.entry(spark).count(), flush=True)

    con = duckdb.connect()
    for p in glob.glob(f"{SF_DIR}/*.parquet"):
        name = p.split("/")[-1].removesuffix(".parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

    qs = E.queries()
    oracles = E.oracle_sql()
    print("n queries:", len(qs), flush=True)
    n_ok = n_rows_only = 0
    for i, (name, fn) in enumerate(qs.items()):
        sdf = fn(spark, SF_DIR).toPandas()
        sql = oracles.get(name)
        if sql is None:
            print(f"[{i}] {name} rows-only: {len(sdf)}", flush=True)
            n_rows_only += 1
            continue
        odf = con.execute(sql).df()
        cols = sorted(sdf.columns)
        a = sdf[cols].sort_values(cols).reset_index(drop=True)
        b = odf[sorted(odf.columns)].sort_values(sorted(odf.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            a, b, check_dtype=False, check_exact=False, rtol=1e-9
        )
        print(f"[{i}] {name} OK {len(sdf)}", flush=True)
        n_ok += 1
    print(f"SWEEP PASSED: {n_ok} oracle-paired + {n_rows_only} rows-only "
          f"= {n_ok + n_rows_only}/{len(qs)}", flush=True)


if __name__ == "__main__":
    main()
