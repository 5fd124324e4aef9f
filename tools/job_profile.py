"""Per-query Spark job/stage counts + warm wall time (guide §1: measure
first). Local mode pays a fixed ~0.1-0.5 s scheduling floor PER JOB, so a
query's local wall time decomposes into (n_jobs x floor) + real work; this
tool separates the two so optimization effort goes at actual work (or at
genuinely excessive job counts), not at noise.

Usage: python tools/job_profile.py [--sf DIR] [name ...]
       python tools/job_profile.py --top 30        # 30 slowest per BENCH_DETAIL.json

Writes tools' stdout JSON: {name: {"sec": warm_wall, "jobs": n, "stages": n}}.
Job/stage counts are read from the DAGScheduler's monotonic id counters
(delta across the run), which catches jobs submitted from streaming
micro-batch threads that thread-local job groups would miss.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    top_n = None
    if "--top" in args:
        i = args.index("--top")
        top_n = int(args[i + 1])
        del args[i : i + 2]

    from datafusion_cyberpolka_eda_spark import get_spark
    from datafusion_cyberpolka_eda_spark.registry import queries

    spark = get_spark(app_name="job_profile")
    sc = spark.sparkContext
    dag = sc._jsc.sc().dagScheduler()

    qs = queries()
    if top_n is not None:
        detail = json.load(
            open(os.path.join(os.path.dirname(__file__), "..", "BENCH_DETAIL.json"))
        )
        names = [
            k
            for k, _ in sorted(detail["queries"].items(), key=lambda kv: -kv[1])
            if k in qs
        ][:top_n]
    elif args:
        names = args
    else:
        names = [n for n in qs if n not in ("pipeline_summary", "pipeline_artifacts")]

    # session warm-up mirroring bench.py's intent (stores, codegen) minimally:
    qs["d2_wide_agg_pricing"](spark, sf_dir).collect()

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        try:
            fn(spark, sf_dir).collect()  # warm pass: store builds, codegen
            spark.catalog.clearCache()
            j0 = int(dag.nextJobId())
            s0 = int(dag.nextStageId())
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            el = time.perf_counter() - t0
            j1 = int(dag.nextJobId())
            s1 = int(dag.nextStageId())
            spark.catalog.clearCache()
            out[name] = {
                "sec": round(el, 3),
                "jobs": j1 - j0,
                "stages": s1 - s0,
            }
            print(
                f"{name:45s} {el:7.2f}s  jobs={j1 - j0:4d}  stages={s1 - s0:4d}",
                file=sys.stderr,
                flush=True,
            )
        except Exception as exc:  # keep going; report at the end
            out[name] = {"error": repr(exc)}
            print(f"{name:45s} ERROR {exc!r}", file=sys.stderr, flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
