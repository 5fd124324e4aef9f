"""sf-amortization datapoint (r5 verdict task 6): scale the sf0.1 driver
tables Nx (default 5x -> "sf0.5"), run the heaviest non-streaming
registry queries on Spark AND their DuckDB oracles at both scales, and
print a markdown table for BASELINE.md showing the vs-oracle net ratio
falling as sf rises — the general-suite evidence that the ~1-2 s
per-job local scheduling floor amortizes while the measured work grows
on both sides.

Scaling preserves the semantics each query family depends on:
- region/nation: copied as-is (dimension tables stay small at any scale
  — that is also the 100 TB reality; FK values keep resolving).
- fact/entity tables: replica k offsets every integer KEY column by
  k*10M, so each replica carries its own consistent FK subgraph — join
  and group cardinalities grow linearly, no cross-replica fan-out.
- documents: scale_smoke's bijective token renaming per replica
  (replica-local near-pair structure preserved; token sets disjoint
  across replicas, so no artificial near-dups).
- embeddings: scale_smoke's rotation isometry (within-replica cosines
  exact; cross-replica decorrelated).

Usage: python tools/sf_amortization.py [--factor 5] [--reps 2]
Writes scaled parquet to a temp dir (removed on exit); prints markdown.
"""

from __future__ import annotations

import argparse
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
OFF = 10_000_000
ORACLE_TIMEOUT_SEC = 900  # per-oracle wall bound; timeout records as DNF

# integer key columns to offset per replica, per table
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
COPIED = ["region", "nation"]

# heaviest non-streaming queries by BENCH_r05 net time (l3 gate excluded:
# its r6 shape pays ml-estimator warm-up that would confound the trend)
QUERIES = [
    "l3c_minhash_banded_portable",
    "l3b_minhash_banded",
    "l23_dedup_pipeline",
    "d8b_approx_distinct_bound",
    "p1_pagerank_trade_graph",
    "l8d_ann_lsh_portable",
    "d2_wide_agg_pricing",
    "l11_neardup_components",
    "l8b_ann_ivf_neighbors",
    "l2_ngram_jaccard_pairs",
    # r7 incremental/takedown/streaming families (r7 verdict task 4):
    # Spark runs the true incremental path (cost tracks the increment),
    # while each DuckDB oracle must replay everything from scratch in one
    # statement — the expected 5x behavior is Spark flat-ish vs oracle
    # blow-up/DNF, which is the architectural point measured, not a bug.
    "l31_incremental_dedup",
    "l37_incremental_pipeline",
    "l8f_ann_ivf_pq_incremental",
    "l48_sparse_cosine_pairs",
    "l52_chunk_then_pack",
    "j18_stream_chunking",
]


def build_scaled(spark, out_dir: str, factor: int) -> None:
    from tools.scale_smoke import build_scaled as build_docs_embs

    build_docs_embs(spark, SRC, out_dir, factor)  # documents + embeddings
    for t in COPIED:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
    for t, keys in KEYED.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for k in range(factor):
            off = k * OFF
            rep = df
            for c in keys:
                rep = rep.withColumn(c, (F.col(c) + F.lit(off)).cast("long"))
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")


def duck_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    # The heavy oracles (l23's recursive-CTE pipeline replay) spill temp
    # storage UNBOUNDED by default — the 5x l23 oracle filled 70+ GB of
    # disk before being killed on the first attempt. Cap the spill and
    # keep it out of the repo cwd; a query that exceeds the cap errors
    # and is recorded as DNF (which is itself the amortization datapoint:
    # the single-node engine cannot finish what Spark streams through).
    con.sql("SET temp_directory='/tmp/duck_spill'")
    con.sql("SET max_temp_directory_size='30GiB'")
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        p = f"{sf_dir}/{t}.parquet"
        # Spark writes a DIRECTORY named t.parquet; glob its files
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    return con


def measure(spark, sf_dir: str, label: str, reps: int) -> dict:
    from datafusion_cyberpolka_eda_spark.registry import oracle_sql, queries

    qs, os_ = queries(), oracle_sql()
    # floor: same protocol as bench.py
    floors = []
    for _ in range(7):
        t0 = time.perf_counter()
        spark.range(2).repartition(2).count()
        floors.append(time.perf_counter() - t0)
    floor = statistics.median(floors)
    rows = {}
    for name in QUERIES:
        # fresh connection per oracle: a late interrupt() (fired between
        # fetchall() returning and cancel()) can only ever poison THIS
        # connection, never the next query/rep
        con = duck_connect(sf_dir)
        rts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            rts.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            # the r7 replay oracles can run for hours at 5x before they
            # hit the spill cap — bound each oracle's wall clock and
            # record a timeout as DNF (the amortization datapoint).
            # The timer callback is guarded by a done-flag set BEFORE
            # cancel(): an interrupt firing in the window between
            # fetchall() returning and timer.cancel() would land on the
            # shared connection and spuriously DNF the NEXT query/rep.
            import threading

            done = threading.Event()
            # the lock makes check-then-interrupt atomic vs done.set():
            # without it the timer can pass the is_set() check just as
            # fetchall() returns, then interrupt() lands on the
            # connection after the query finished (r9 advice)
            intr_lock = threading.Lock()

            def _interrupt():
                with intr_lock:
                    if not done.is_set():
                        getattr(con, "interrupt", lambda: None)()

            timer = threading.Timer(ORACLE_TIMEOUT_SEC, _interrupt)
            timer.start()
            try:
                con.sql(os_[name]).fetchall()
            finally:
                with intr_lock:
                    done.set()
                timer.cancel()
            du = time.perf_counter() - t0
        except Exception as ex:  # spill cap / OOM / timeout: DNF, keep going
            du = None
            print(f"  [{label}] {name}: duckdb DNF ({ex})", file=sys.stderr)
        sp = statistics.median(rts)
        rows[name] = (sp, max(sp - floor, 0.0), du)
        print(
            f"  [{label}] {name}: spark {sp:.2f}s (net {max(sp - floor, 0.0):.2f}) "
            f"duckdb {du if du is None else round(du, 2)}s",
            file=sys.stderr,
        )
        con.close()
    return {"floor": floor, "rows": rows}


# r10/r11 quality + selection + SemDeDup/k-NN + streaming families
# (r10 verdict task 2): measured SPARK-side growth at 1x/5x/16x, the
# sub-quadratic evidence SCALE.md carried only as reasoned shapes.
# Frozen-quantizer twins (l65/l68) are INCLUDED deliberately — their
# measured super-linear growth vs the adaptive paths (l65b/l68c) is the
# point of the comparison, not a bug.
GROWTH_QUERIES = [
    "l64_quality_classifier",
    "l65_semdedup",
    "l65b_semdedup_adaptive",
    "l66_incremental_image_neardup",
    "l67_incremental_audio_neardup",
    "l68_knn_join",
    "l68c_knn_join_adaptive",
    "l69_incremental_semdedup",
    "l69b_incremental_semdedup_adaptive",
    "l70_model_filter_pipeline",
    "l71_incremental_classifier_update",
    "l72_dsir_selection",
    "l73_incremental_dsir",
    "l74_dup_span_scrub",
    "l75_classifier_pr_curve",
    "l76_semdedup_takedown",
    "l77_incremental_dup_span_scrub",
    "l78_crossmodal_dedup",
    "l78b_crossmodal_incremental",
    "l78c_crossmodal_takedown",
    "l79_domain_mixture",
    "l79b_domain_mixture_adaptive",
    "l79c_domain_mixture_incremental",
    "l79d_domain_mixture_takedown",
    "l80_classifier_takedown",
    "l81_dsir_takedown",
    # the full streaming ingest matrix (r12 verdict task 6): epoch count
    # held fixed (n_files=3), data scaled — measures per-epoch work
    # growth. j23 (pinned store) vs j23b (adaptive store) is the
    # streaming twin of the l69-vs-l69b comparison.
    "j15_stream_incremental_dedup",
    "j16_stream_quality_routing",
    "j17_stream_takedown",
    "j18_stream_chunking",
    "j19_stream_psi_drift",
    "j20_stream_asset_ingest_dedup",
    "j21_stream_model_filter",
    "j22_stream_dsir_selection",
    "j23_stream_semdedup",
    "j23b_stream_semdedup_adaptive",
    "j24_stream_crossmodal_dedup",
    "j25_stream_domain_mixture",
]
# dense replica stride: scaled doc/vec ids must stay below the 2^23
# planted-twin offsets or the family domain guards (correctly) raise
GROWTH_OFFSET = 10_000


def growth_main(args) -> None:
    """Spark-side growth table for the r10/r11 families: scaled
    documents+embeddings (dense id stride), one DISCARDED warm rep per
    query per scale (store/memo builds are session machinery — the
    incremental entries' steady state is the day-2 path), median of
    ``reps`` warm reps. No DuckDB side: growth vs data scale is the
    claim under test; the from-scratch-oracle blow-up is already
    measured in the 5x ratio table."""
    from datafusion_cyberpolka_eda_spark import get_spark
    from datafusion_cyberpolka_eda_spark.registry import queries
    from tools.scale_smoke import build_scaled as build_docs_embs

    spark = get_spark(app_name="sf_growth")
    qs = queries()
    factors = [int(x) for x in args.factors.split(",")]
    # the dense stride exists to keep scaled ids below the 2^23 planted-
    # twin offsets of the quality/SemDeDup family domain guards; a factor
    # big enough to cross it would trade the guard error for silent id
    # collisions — fail loudly up front (r11 advice)
    if max(factors) * GROWTH_OFFSET >= 1 << 23:
        raise ValueError(
            f"growth factor {max(factors)} x stride {GROWTH_OFFSET} crosses "
            f"the 2^23 twin-offset domain; lower the factor or the stride"
        )
    names = (
        [n for n in GROWTH_QUERIES if n in set(args.queries.split(","))]
        if args.queries
        else GROWTH_QUERIES
    )

    # bench-style warm-up (JVM, python workers)
    qs["d2_wide_agg_pricing"](spark, SRC).collect()
    spark.range(1000).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).collect()

    results: dict[int, dict[str, float]] = {}
    dirs: dict[int, str] = {}
    try:
        for factor in factors:
            if factor == 1:
                dirs[factor] = SRC
            else:
                d = tempfile.mkdtemp(prefix=f"growth_{factor}x_")
                dirs[factor] = d
                print(f"building {factor}x in {d} ...", file=sys.stderr)
                build_docs_embs(spark, SRC, d, factor, offset=GROWTH_OFFSET)
        for factor in factors:
            results[factor] = {}
            for name in names:
                rts = []
                cold = None
                for r in range(args.reps + 1):
                    t0 = time.perf_counter()
                    qs[name](spark, dirs[factor]).collect()
                    el = time.perf_counter() - t0
                    spark.catalog.clearCache()
                    if r == 0:
                        # rep 0 carries store/memo/codegen builds. For the
                        # memoized-substrate entries (the SemDeDup family)
                        # the SUBSTRATE is the quantizer-scaling cost under
                        # test, so cold is REPORTED alongside warm rather
                        # than discarded.
                        cold = el
                    else:
                        rts.append(el)
                results[factor][name] = (cold, statistics.median(rts))
                print(
                    f"  [{factor}x] {name}: cold {cold:.2f}s warm "
                    f"{results[factor][name][1]:.2f}s",
                    file=sys.stderr,
                )
    finally:
        for f, d in dirs.items():
            if d != SRC:
                shutil.rmtree(d, ignore_errors=True)

    base = factors[0]
    hi = factors[-1]
    print(f"\n## r10/r11 family growth (documents+embeddings scaled, "
          f"reps={args.reps})\n")
    print("| query | " + " | ".join(f"{f}x cold / warm s" for f in factors)
          + f" | cold growth {hi}x/{base}x | warm growth |")
    print("|---|" + "---|" * (len(factors) + 2))
    for name in names:
        cells = " | ".join(
            f"{results[f][name][0]:.2f} / {results[f][name][1]:.2f}"
            for f in factors
        )
        gc_ = results[hi][name][0] / max(results[base][name][0], 1e-9)
        gw = results[hi][name][1] / max(results[base][name][1], 1e-9)
        print(f"| {name} | {cells} | {gc_:.1f}x | {gw:.1f}x |")
    k = hi // base
    print(f"\nreference: data {k}x -> linear {k}x, n^1.5 "
          f"{int(k ** 1.5)}x, quadratic {k * k}x. Cold carries "
          f"store/memo/substrate builds (for the memoized SemDeDup "
          f"family that IS the quantizer cost under test); warm is the "
          f"steady-state median. Local scheduling floors (~0.3-0.5 "
          f"s/job) inflate the small cells, so sub-{k}x growth means "
          f"floor-dominated.")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=5)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--data-dir", default=None,
                    help="reuse an existing scaled dir (skip the build)")
    ap.add_argument("--growth", action="store_true",
                    help="r10/r11-family Spark-side growth table "
                         "(no oracles; --factors applies)")
    ap.add_argument("--factors", default="1,5,16",
                    help="growth mode: comma-separated scale factors")
    ap.add_argument("--queries", default=None,
                    help="growth mode: comma-separated subset")
    args = ap.parse_args()
    if args.growth:
        growth_main(args)
        return

    from datafusion_cyberpolka_eda_spark import get_spark

    spark = get_spark(app_name="sf_amortization")
    keep = args.data_dir is not None
    out_dir = args.data_dir or tempfile.mkdtemp(prefix="sf_amort_")
    try:
        if not os.path.isdir(os.path.join(out_dir, "lineitem.parquet")):
            print(f"building {args.factor}x scaled tables in {out_dir} ...",
                  file=sys.stderr)
            build_scaled(spark, out_dir, args.factor)
        # warm-up mirrors bench.py (JVM, python workers, ml/LSH classes —
        # without these the first l8b/l8d/l3-family run pays ~5-10 s of
        # one-time JVM class loading inside its timed rep)
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.feature import BucketedRandomProjectionLSH, MinHashLSH
        from pyspark.ml.functions import array_to_vector

        from datafusion_cyberpolka_eda_spark.registry import queries

        queries()["d2_wide_agg_pricing"](spark, SRC).collect()
        spark.range(1000).repartition(32).mapInPandas(
            lambda it: it, schema="id long"
        ).collect()
        tiny = spark.range(64).select(
            array_to_vector(F.array(F.col("id").cast("double"))).alias("features")
        )
        KMeans(k=2, seed=1, maxIter=1, featuresCol="features").fit(tiny)
        BucketedRandomProjectionLSH(
            inputCol="features", outputCol="h", bucketLength=1.0,
            numHashTables=1,
        ).fit(tiny).transform(tiny).collect()
        mh_tiny = spark.range(4).select(
            array_to_vector(
                F.array(*[((F.col("id") + i) % 2).cast("double") for i in range(4)])
            ).alias("features")
        )
        MinHashLSH(
            inputCol="features", outputCol="h", numHashTables=1
        ).fit(mh_tiny).transform(mh_tiny).collect()

        base = measure(spark, SRC, "sf0.1", args.reps)
        scaled = measure(spark, out_dir, f"sf0.{args.factor}", args.reps)

        # totals over queries both engines finished at BOTH scales, so
        # the headline ratios compare identical work; DNFs listed per-row
        done = [
            n for n in QUERIES
            if base["rows"][n][2] is not None
            and scaled["rows"][n][2] is not None
        ]

        def totals(m):
            sp = sum(m["rows"][n][0] for n in done)
            net = sum(m["rows"][n][1] for n in done)
            du = sum(m["rows"][n][2] for n in done)
            return sp, net, du

        def cell(v, fmt="{:.2f}"):
            return "DNF" if v is None else fmt.format(v)

        b_sp, b_net, b_du = totals(base)
        s_sp, s_net, s_du = totals(scaled)
        print(f"\n## sf-amortization ({args.factor}x, reps={args.reps})\n")
        print("| query | sf0.1 spark net s | sf0.1 duckdb s | ratio "
              f"| sf0.{args.factor} spark net s | sf0.{args.factor} duckdb s | ratio |")
        print("|---|---|---|---|---|---|---|")
        for name in QUERIES:
            b = base["rows"][name]
            s = scaled["rows"][name]
            rb = b[1] / b[2] if b[2] else None
            rs = s[1] / s[2] if s[2] else None
            print(f"| {name} | {b[1]:.2f} | {cell(b[2])} | {cell(rb)} "
                  f"| {s[1]:.2f} | {cell(s[2])} | {cell(rs)} |")
        print(f"| **total ({len(done)} both-finished)** | **{b_net:.2f}** | "
              f"**{b_du:.2f}** | **{b_net / b_du:.2f}** | **{s_net:.2f}** | "
              f"**{s_du:.2f}** | **{s_net / s_du:.2f}** |")
        print(f"\nfloors: sf0.1 {base['floor']:.3f}s, scaled "
              f"{scaled['floor']:.3f}s; raw spark totals {b_sp:.1f}s -> {s_sp:.1f}s")
    finally:
        if not keep:
            shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
