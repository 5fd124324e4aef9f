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

and the collected outputs are compared for EXACT equality (BITWISE
floats — struct-packed, so -0.0 != +0.0; NaN canonicalized, row-order-
insensitive). Any difference = a partitioning-sensitive output that
will eventually flip a driver sweep.

r9 additions (r8 verdict tasks 2b + 6):
  --oracle    adds pass O: the entry's DuckDB oracle, byte-compared to
              pass A. The A/B permutation audit is Spark-vs-Spark and
              is BLIND by construction to cross-ENGINE conventions
              (DuckDB ROUND preserves -0.0, Spark F.round does not —
              the r8 driver red); pass O catches exactly that class.
  --sf-dir    now accepts a comma-separated list. The l46 -0.0 cell
              exists at sf0.01 but NOT at sf0.1 — boundary cells are
              data-dependent, so audit at >= 2 scale factors.

By default audits the entries whose oracle SQL contains ROUND( — the
population the fragility class lives in — plus everything with float
output columns; --all audits the whole registry. pipeline_summary /
pipeline_artifacts are skipped from the A/B permutation passes
(fixture-driven: their input does not flow through load_table, so pass
B would equal pass A by construction) but ARE included in pass O,
where the fixture-vs-oracle compare is meaningful.

Usage:
  python tools/rounding_audit.py [--sf-dir DIR[,DIR...]] [--nparts N]
                                 [--all] [--oracle] [-k SUBSTR]
                                 [--out REPORT.json]

Exit 0 = all audited entries stable; 1 = fragile entries found.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DRIVEN = {"pipeline_summary", "pipeline_artifacts"}


_CANON_NAN = struct.pack("<d", float("nan"))


def _fix(v):
    """Hashable, BITWISE canonical form of a cell value. Floats become
    their little-endian float64 bytes (so -0.0 != +0.0 — tuple == on raw
    floats is sign-blind, the r8 lesson), NaN payloads canonicalized."""
    if isinstance(v, float):
        return _CANON_NAN if math.isnan(v) else struct.pack("<d", v)
    if isinstance(v, list):
        return tuple(_fix(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _fix(x)) for k, x in v.items()))
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def canon(df):
    """Spark DataFrame -> (sorted canonical row tuples, name-sorted cols).
    Columns are name-sorted BEFORE canonicalization so Spark and DuckDB
    results with different column orders compare positionally."""
    cols = sorted(df.columns)
    rows = sorted(
        (tuple(_fix(row[c]) for c in cols) for row in df.select(cols).collect()),
        key=repr,  # total order even when a column mixes None with bytes
    )
    return rows, cols


def canon_pdf(pdf):
    """pandas DataFrame -> the same canonical shape as canon(). Used for
    BOTH sides of the cross-engine pass (spark_df.toPandas() vs DuckDB
    .df()) so null conventions match the driver's compare exactly: nulls
    in float columns surface as NaN on both sides. numpy scalars/arrays
    are unboxed so _fix sees plain float/int/str/list."""
    import numpy as np

    cols = sorted(pdf.columns)

    def unbox(v):
        if isinstance(v, np.ndarray):
            return [unbox(x) for x in v.tolist()]
        if isinstance(v, np.generic):
            return v.item()
        return v

    out = [
        tuple(_fix(unbox(v)) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return sorted(out, key=repr), cols


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


def _diff_report(name, sa, sb, tag_a, tag_b):
    diffs = [(ra, rb) for ra, rb in zip(sa[1], sb[1]) if ra != rb][:3]
    return {
        "status": "FRAGILE",
        "compare": f"{tag_a} vs {tag_b}",
        f"rows_{tag_a}": len(sa[1]),
        f"rows_{tag_b}": len(sb[1]),
        "first_diffs": [[repr(ra)[:120], repr(rb)[:120]] for ra, rb in diffs],
    }


def audit_sf(spark, e, sf_dir, args):
    """Run passes A/B (and O with --oracle) at one scale factor.
    Returns (report dict, fragile names, errored names)."""
    qs, oracles = e.queries(), e.oracle_sql()
    base = [
        n
        for n in qs
        if (not args.k or args.k in n)
        and (args.all or "round(" in oracles.get(n, "").lower())
    ]
    names = [n for n in base if n not in FIXTURE_DRIVEN]
    # fixture-driven entries skip A/B (pass B == pass A by construction)
    # but their fixture-vs-oracle compare is meaningful in pass O
    o_names = [n for n in base if n in oracles] if args.oracle else []
    print(
        f"[{sf_dir}] auditing {len(names)} A/B entries"
        + (f" + {len(o_names)} cross-engine" if args.oracle else "")
        + f" (of {len(qs)}), pass B = repartition({args.nparts}) + cache clear"
    )

    report: dict[str, dict] = {}

    def run_pass(tag: str, todo):
        out = {}
        for name in todo:
            t0 = time.time()
            try:
                rows, cols = canon(qs[name](spark, sf_dir))
                out[name] = ("ok", rows, cols, time.time() - t0)
            except Exception as ex:  # noqa: BLE001 — audit must not abort
                out[name] = ("err", repr(ex)[:300], None, time.time() - t0)
            print(f"  [{tag}] {name}: {out[name][0]} {out[name][3]:.1f}s")
        return out

    a = run_pass("A", names)
    cleared = clear_registry_caches()
    undo, n_sites = patch_load_table(args.nparts)
    print(f"pass B: cleared {cleared} caches, patched {n_sites} modules")
    try:
        b = run_pass("B", names)
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
        if sa[1] == sb[1] and sa[2] == sb[2]:
            report[name] = {"status": "stable", "rows": len(sa[1])}
        else:
            fragile.append(name)
            report[name] = _diff_report(name, sa, sb, "a", "b")

    if args.oracle:
        import duckdb

        con = duckdb.connect()
        for t in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split():
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        for name in o_names:
            t0 = time.time()
            key = f"{name}::oracle"
            try:
                s_rows, s_cols = canon_pdf(qs[name](spark, sf_dir).toPandas())
                o_rows, o_cols = canon_pdf(con.sql(oracles[name]).df())
            except Exception as ex:  # noqa: BLE001
                errors.append(key)
                report[key] = {"status": "error", "o": repr(ex)[:300]}
                print(f"  [O] {name}: err {time.time() - t0:.1f}s")
                continue
            if s_rows == o_rows and s_cols == o_cols:
                report[key] = {"status": "stable", "rows": len(s_rows)}
                print(f"  [O] {name}: ok {time.time() - t0:.1f}s")
            else:
                fragile.append(key)
                report[key] = _diff_report(
                    name, ("ok", s_rows, s_cols), ("ok", o_rows, o_cols),
                    "spark", "oracle",
                )
                print(f"  [O] {name}: FRAGILE {time.time() - t0:.1f}s")
        con.close()
        clear_registry_caches()

    return report, fragile, errors


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.001",
        help="comma-separated list of scale-factor dirs to audit",
    )
    ap.add_argument("--nparts", type=int, default=7)
    ap.add_argument("--all", action="store_true", help="audit every entry")
    ap.add_argument(
        "--oracle",
        action="store_true",
        help="add pass O: cross-engine BITWISE compare vs the DuckDB oracle",
    )
    ap.add_argument("-k", default=None, help="substring filter on names")
    ap.add_argument("--out", default=None, help="write JSON report here")
    args = ap.parse_args()
    sf_dirs = [d.strip() for d in args.sf_dir.split(",") if d.strip()]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    by_sf: dict[str, dict] = {}
    fragile, errors = [], []
    for sf_dir in sf_dirs:
        clear_registry_caches()
        report, frag, errs = audit_sf(spark, e, sf_dir, args)
        tag = os.path.basename(sf_dir.rstrip("/"))
        by_sf[tag] = report
        fragile += [f"{tag}:{n}" for n in frag]
        errors += [f"{tag}:{n}" for n in errs]

    audited = sum(len(r) for r in by_sf.values())
    print(
        f"\n== rounding audit: {audited} entry-checks across "
        f"{len(sf_dirs)} SFs, {len(fragile)} FRAGILE, {len(errors)} errored =="
    )
    for name in fragile:
        tag, n = name.split(":", 1)
        print(f"  FRAGILE: {name} {by_sf[tag][n].get('first_diffs')}")
    for name in errors:
        print(f"  ERROR:   {name}")
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(
                {
                    "sf_dirs": sf_dirs,
                    "nparts": args.nparts,
                    "oracle_pass": bool(args.oracle),
                    "audited_entry_checks": audited,
                    "fragile": fragile,
                    "errors": errors,
                    "by_sf": by_sf,
                },
                fh,
                indent=1,
            )
        print(f"report -> {args.out}")
    return 1 if fragile or errors else 0


if __name__ == "__main__":
    sys.exit(main())
