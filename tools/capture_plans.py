"""Capture .explain("formatted") output for named registry queries into
plans/<round>/<query>_<tag>.txt — the optimization round's plan evidence
(guide §1: record the plan shape before and after every change).

Usage: python tools/capture_plans.py --tag before [--round r12] [--sf DIR] name [name ...]

Note: building a query's DataFrame may itself run Spark jobs (store
builds, driver-side probe collects) — that is part of the query recipe;
only the RETURNED DataFrame's physical plan is captured.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def explain_formatted(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    args = sys.argv[1:]
    tag = "before"
    rnd = "r12"
    sf_dir = "/root/testdata/sf0.1"
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]
    if "--round" in args:
        i = args.index("--round")
        rnd = args[i + 1]
        del args[i : i + 2]
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]

    from datafusion_cyberpolka_eda_spark import get_spark
    from datafusion_cyberpolka_eda_spark.registry import queries

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="capture_plans")
    qs = queries()
    for name in args:
        try:
            df = qs[name](spark, sf_dir)
            text = explain_formatted(df)
        except Exception as exc:
            text = f"ERROR building {name}: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
