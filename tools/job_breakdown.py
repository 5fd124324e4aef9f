"""Per-JOB breakdown of one query: id, duration, stage count, and the
callsite/description Spark recorded — the drill-down companion to
job_profile.py (which only counts). Reads the AppStatusStore after a warm
run, so streaming-thread jobs are included.

Usage: python tools/job_breakdown.py [--sf DIR] name
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    name = args[0]

    from datafusion_cyberpolka_eda_spark import get_spark
    from datafusion_cyberpolka_eda_spark.registry import queries

    spark = get_spark(app_name="job_breakdown")
    sc = spark.sparkContext
    dag = sc._jsc.sc().dagScheduler()

    qs = queries()
    fn = qs[name]
    fn(spark, sf_dir).collect()  # warm: stores, codegen
    spark.catalog.clearCache()
    j0 = int(dag.nextJobId())
    fn(spark, sf_dir).collect()
    j1 = int(dag.nextJobId())
    spark.catalog.clearCache()

    store = sc._jsc.sc().statusStore()
    jobs = store.jobsList(None)
    out = []
    for i in range(jobs.size()):
        j = jobs.apply(i)
        jid = int(j.jobId())
        if not (j0 <= jid < j1):
            continue
        dur = None
        if j.completionTime().isDefined() and j.submissionTime().isDefined():
            dur = (
                j.completionTime().get().getTime()
                - j.submissionTime().get().getTime()
            ) / 1000.0
        desc = (
            j.description().get() if j.description().isDefined() else ""
        ) or j.name()
        out.append(
            {
                "job": jid,
                "sec": dur,
                "n_stages": int(j.stageIds().size()),
                "desc": str(desc)[:200],
            }
        )
    out.sort(key=lambda r: r["job"])
    total = sum(r["sec"] or 0 for r in out)
    print(
        json.dumps(
            {"name": name, "n_jobs": len(out), "sum_job_sec": round(total, 2),
             "jobs": out},
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
