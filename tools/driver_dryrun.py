"""Dry-run the external driver's correctness sweep locally.

Runs entry() as a smoke check, then the first N queries() entries (the
driver's ~50-slot window) in a PLAIN SparkSession against their DuckDB
oracles at the driver's sweep scale, with the driver's compare shape
(column-name sort, NaN-aware float equality). Use before a round ends to
catch would-be CORRECTNESS failures without waiting for the driver.

Usage: python tools/driver_dryrun.py [n_window] [sf_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import duckdb
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    print("entry rows:", len(e.entry(spark).collect()))
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = e.queries(), e.oracle_sql()
    failures = []
    for name in list(qs)[:n_window]:
        sql = os_.get(name)
        try:
            spdf = qs[name](spark, sf_dir).toPandas()
        except Exception as exc:  # a sweep row would record err
            failures.append(name)
            print(name, "SPARK ERROR:", exc)
            continue
        if sql is None:
            print(name, f"rows-only: {len(spdf)}")
            continue
        try:
            opdf = con.sql(sql).df()
        except Exception as exc:
            failures.append(name)
            print(name, "ORACLE ERROR:", exc)
            continue
        s = spdf[sorted(spdf.columns)].sort_values(
            by=sorted(spdf.columns)
        ).reset_index(drop=True)
        o = opdf[sorted(opdf.columns)].sort_values(
            by=sorted(opdf.columns)
        ).reset_index(drop=True)
        ok = s.shape == o.shape and list(s.columns) == list(o.columns)
        if ok:
            for c in s.columns:
                a, b = s[c].values, o[c].values
                if a.dtype.kind == "f":
                    af, bf = a.astype(float), b.astype(float)
                    good = bool(np.all((a == b) | (np.isnan(af) & np.isnan(bf))))
                else:
                    good = bool(np.all(a == b))
                if not good:
                    ok = False
                    break
        if not ok:
            failures.append(name)
        print(name, "MATCH:", ok, flush=True)
    print(f"\ndry-run: {n_window} window entries, {len(failures)} failures")
    if failures:
        print("failed:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
