#!/usr/bin/env python
"""Rounding-fragility audit (r7 verdict task 2).

The r7 driver sweep caught `l46_embedding_covariance` flipping its hash
between runs: a ROUND()ed float computed from distributed float64 sums
whose addition order is engine/partitioning-dependent can land on a
rounding boundary and flip. This tool hunts that whole class BEFORE the
driver does: every registry entry is executed twice in one process —

  pass A: tables as stored on disk (the driver's layout), then
  pass B: every `load_table` result round-robin `repartition(nparts)`-ed
          (permutes both partition count and row order, i.e. the
          partial-aggregation combine order), with all session-level
          store caches (`*_CACHE` dicts) cleared first so persisted
          incremental stores REBUILD under the permuted layout too —

and the collected outputs are compared for EXACT equality (bit-equal
floats, NaN-aware, row-order-insensitive). Any difference = a
partitioning-sensitive output that will eventually flip a driver sweep.

By default audits the entries whose oracle SQL contains ROUND( — the
population the fragility class lives in — plus everything with float
output columns; --all audits the whole registry. pipeline_summary /
pipeline_artifacts are skipped by default (fixture-driven: their input
does not flow through load_table, so pass B would equal pass A by
construction and prove nothing).

Usage:
  python tools/rounding_audit.py [--sf-dir DIR] [--nparts N] [--all]
                                 [-k SUBSTR] [--out REPORT.json]

Exit 0 = all audited entries stable; 1 = fragile entries found.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DRIVEN = {"pipeline_summary", "pipeline_artifacts"}


def canon(df):
    """Collected rows as a sorted list of hashable tuples; floats kept
    bit-exact (the whole point), NaN mapped to a sentinel so NaN==NaN."""

    def fix(v):
        if isinstance(v, float) and math.isnan(v):
            return "__NaN__"
        if isinstance(v, list):
            return tuple(fix(x) for x in v)
        if isinstance(v, dict):
            return tuple(sorted((k, fix(x)) for k, x in v.items()))
        if isinstance(v, bytearray):
            return bytes(v)
        return v

    return sorted(
        tuple(fix(v) for v in row) for row in df.collect()
    ), [f.name for f in df.schema.fields]


def clear_registry_caches() -> int:
    """Clear every `*_CACHE` dict global in the package so persisted
    stores (gram/incremental/semantic/...) rebuild under the permuted
    layout instead of replaying pass-A state."""
    n = 0
    for name, mod in list(sys.modules.items()):
        if not name.startswith("datafusion_cyberpolka_eda_spark"):
            continue
        for attr, val in list(vars(mod).items()):
            if attr.endswith("_CACHE") and isinstance(val, dict):
                val.clear()
                n += 1
    return n


def patch_load_table(nparts: int):
    """Swap `load_table` for a repartitioning wrapper in EVERY module
    that imported it (from-import binds per module). Returns an undo fn."""
    from datafusion_cyberpolka_eda_spark.sources import catalog

    orig = catalog.load_table

    def patched(spark, sf_dir, name):
        return orig(spark, sf_dir, name).repartition(nparts)

    sites = []
    for mod_name, mod in list(sys.modules.items()):
        if not (
            mod_name.startswith("datafusion_cyberpolka_eda_spark")
            or mod_name == "__spark_entry__"
        ):
            continue
        if getattr(mod, "load_table", None) is orig:
            setattr(mod, "load_table", patched)
            sites.append(mod)

    def undo():
        for mod in sites:
            setattr(mod, "load_table", orig)

    return undo, len(sites)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--nparts", type=int, default=7)
    ap.add_argument("--all", action="store_true", help="audit every entry")
    ap.add_argument("-k", default=None, help="substring filter on names")
    ap.add_argument("--out", default=None, help="write JSON report here")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    names = [
        n
        for n in qs
        if n not in FIXTURE_DRIVEN
        and (not args.k or args.k in n)
        and (args.all or "round(" in oracles.get(n, "").lower())
    ]
    print(
        f"auditing {len(names)} entries (of {len(qs)}) at {args.sf_dir}, "
        f"pass B = repartition({args.nparts}) + cache clear"
    )

    report: dict[str, dict] = {}

    def run_pass(tag: str):
        out = {}
        for name in names:
            t0 = time.time()
            try:
                rows, cols = canon(qs[name](spark, args.sf_dir))
                out[name] = ("ok", rows, cols, time.time() - t0)
            except Exception as ex:  # noqa: BLE001 — audit must not abort
                out[name] = ("err", repr(ex)[:300], None, time.time() - t0)
            print(f"  [{tag}] {name}: {out[name][0]} {out[name][3]:.1f}s")
        return out

    a = run_pass("A")
    cleared = clear_registry_caches()
    undo, n_sites = patch_load_table(args.nparts)
    print(f"pass B: cleared {cleared} caches, patched {n_sites} modules")
    try:
        b = run_pass("B")
    finally:
        undo()
        clear_registry_caches()

    fragile, errors = [], []
    for name in names:
        sa, sb = a[name], b[name]
        if sa[0] == "err" or sb[0] == "err":
            errors.append(name)
            report[name] = {
                "status": "error",
                "a": sa[1] if sa[0] == "err" else "ok",
                "b": sb[1] if sb[0] == "err" else "ok",
            }
            continue
        stable = sa[1] == sb[1] and sa[2] == sb[2]
        if not stable:
            fragile.append(name)
            diffs = [
                (ra, rb)
                for ra, rb in zip(sa[1], sb[1])
                if ra != rb
            ][:3]
            report[name] = {
                "status": "FRAGILE",
                "rows_a": len(sa[1]),
                "rows_b": len(sb[1]),
                "first_diffs": [
                    [repr(ra)[:120], repr(rb)[:120]] for ra, rb in diffs
                ],
            }
        else:
            report[name] = {"status": "stable", "rows": len(sa[1])}

    print(
        f"\n== rounding audit: {len(names)} audited, "
        f"{len(fragile)} FRAGILE, {len(errors)} errored =="
    )
    for name in fragile:
        print(f"  FRAGILE: {name} {report[name].get('first_diffs')}")
    for name in errors:
        print(f"  ERROR:   {name}")
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(
                {
                    "sf_dir": args.sf_dir,
                    "nparts": args.nparts,
                    "audited": len(names),
                    "fragile": fragile,
                    "errors": errors,
                    "entries": report,
                },
                fh,
                indent=1,
            )
        print(f"report -> {args.out}")
    return 1 if fragile or errors else 0


if __name__ == "__main__":
    sys.exit(main())
