"""Dry-run the external driver's correctness sweep locally.

Runs entry() as a smoke check, then the first N queries() entries (the
driver's ~50-slot window) in a PLAIN SparkSession against their DuckDB
oracles at the driver's sweep scale, with the driver's compare shape
(column-name sort, BITWISE NaN-normalized float64 equality — strictly
at-least-as-strict as the driver's byte hash). Use before a round ends to
catch would-be CORRECTNESS failures without waiting for the driver.

Usage: python tools/driver_dryrun.py [n_window] [sf_dir] [artifact.json]

Pass n_window=0 (or >= the registry size) to sweep EVERY entry, and an
artifact path to write the per-query result rows as JSON in the
CORRECTNESS_r* shape — committing one full sweep per round
(CORRECTNESS_local_rN.json) closes the driver-rotation staleness window
(r6 verdict task 2: the driver re-checks ~50/round, so without this a
regression in an unswept entry could hide for rounds).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    artifact = sys.argv[3] if len(sys.argv) > 3 else None

    import duckdb
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    print("entry rows:", len(e.entry(spark).collect()))
    con = duckdb.connect()
    # explicit budget + spill dir (the bench.py oracle-phase settings):
    # the heavy recursive-CTE replays (l23/l37 at sf0.1 peak tens of
    # GiB) share the box with this process's live Spark JVM — without a
    # budget DuckDB assumes 80% of RAM is its own and malloc fails with
    # "bad allocation" instead of spilling. Budget derives from the
    # box's RAM (capped at 48 GB) so a smaller machine spills instead of
    # over-committing, and the spill dir is cleaned up at exit
    # (r12 advice).
    import atexit
    import shutil
    import tempfile

    ram_gb = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") // (1024**3)
    budget_gb = max(4, min(48, ram_gb // 2))
    con.sql(f"SET memory_limit='{budget_gb}GB'")
    spill_dir = tempfile.mkdtemp(prefix="dryrun_duck_")
    atexit.register(shutil.rmtree, spill_dir, ignore_errors=True)
    con.sql(f"SET temp_directory='{spill_dir}'")
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = e.queries(), e.oracle_sql()
    names = list(qs) if n_window <= 0 else list(qs)[:n_window]
    failures = []
    results: dict[str, dict] = {}
    for name in names:
        sql = os_.get(name)
        row = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        results[name] = row
        try:
            spdf = qs[name](spark, sf_dir).toPandas()
            row["spark_rows"] = len(spdf)
        except Exception as exc:  # a sweep row would record err
            failures.append(name)
            row["err"] = f"spark: {exc}"[:500]
            print(name, "SPARK ERROR:", exc)
            continue
        if sql is None:
            print(name, f"rows-only: {len(spdf)}")
            continue
        try:
            opdf = con.sql(sql).df()
            row["oracle_rows"] = len(opdf)
        except Exception as exc:
            failures.append(name)
            row["err"] = f"oracle: {exc}"[:500]
            print(name, "ORACLE ERROR:", exc)
            continue
        s = spdf[sorted(spdf.columns)].sort_values(
            by=sorted(spdf.columns)
        ).reset_index(drop=True)
        o = opdf[sorted(opdf.columns)].sort_values(
            by=sorted(opdf.columns)
        ).reset_index(drop=True)
        row["rows_match"] = s.shape[0] == o.shape[0]
        row["schema_match"] = list(s.columns) == list(o.columns)
        ok = bool(row["rows_match"] and row["schema_match"])
        if ok:
            for c in s.columns:
                a, b = s[c].values, o[c].values
                if a.dtype.kind == "f":
                    # BITWISE float compare (r8 verdict task 2): `a == b` is
                    # sign-blind (-0.0 == 0.0), but the driver's value hash
                    # is byte-sensitive — a -0.0/+0.0 divergence shipped
                    # twice because this gate could not see it. Normalize
                    # NaN payloads to the canonical quiet NaN, then compare
                    # the raw float64 bytes.
                    af = a.astype(np.float64).copy()
                    bf = b.astype(np.float64).copy()
                    af[np.isnan(af)] = np.float64("nan")
                    bf[np.isnan(bf)] = np.float64("nan")
                    good = af.tobytes() == bf.tobytes()
                else:
                    good = bool(np.all(a == b))
                if not good:
                    ok = False
                    break
        row["hash_match"] = ok
        if not ok:
            failures.append(name)
        print(name, "MATCH:", ok, flush=True)
    if artifact:
        with open(artifact, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {artifact} ({len(results)} entries)")
    print(f"\ndry-run: {len(names)} window entries, {len(failures)} failures")
    if failures:
        print("failed:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
