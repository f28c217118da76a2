"""Focused per-query timing for the optimization loop (guide §1).

Usage: python tools/time_queries.py [--runs N] [--plan-dir DIR] [--suffix S]
           [sf_dir] query [query ...]

Times each named query with the noop sink (full materialization, no
driver collect), reports min/median of N runs after one untimed warm-up
of the FIRST query only when --warm is given, and optionally writes
``<plan-dir>/<query>_<suffix>.txt`` with the ``explain("formatted")``
output (pre-execution plan) plus the executed post-AQE plan.

This is the measurement harness for OPTIMIZATION_r12.md — bench.py
remains the round-over-round artifact of record; this tool exists so a
single query can be iterated on without paying the 25-minute sweep.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = sys.argv[1:]
    runs = 3
    plan_dir = None
    suffix = "before"
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if "--plan-dir" in argv:
        i = argv.index("--plan-dir")
        plan_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if "--suffix" in argv:
        i = argv.index("--suffix")
        suffix = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if argv and os.path.isdir(argv[0]):
        sf_dir, names = argv[0], argv[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", argv
    if not names:
        sys.exit("usage: time_queries.py [--runs N] [sf_dir] query ...")

    import __spark_entry__ as mod
    from defi_features_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="time_queries")
    spark.sparkContext.setLogLevel("ERROR")
    qs = mod.queries()

    # one warm-up so JVM codegen/parquet-footer caches aren't charged
    # to the first timed query (bench.py does the same)
    try:
        qs["pricing_summary"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception:
        pass

    out = {}
    for name in names:
        if name not in qs:
            sys.exit(f"unknown query {name!r}")
        if plan_dir:
            os.makedirs(plan_dir, exist_ok=True)
            df = qs[name](spark, sf_dir)
            with open(
                os.path.join(plan_dir, f"{name}_{suffix}.txt"), "w"
            ) as fh:
                fh.write(f"# {name} — explain('formatted'), sf_dir={sf_dir}\n\n")
                fh.write(
                    df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    )
                )
                fh.write("\n\n# executed plan (post-AQE)\n\n")
                df.write.format("noop").mode("overwrite").save()
                fh.write(
                    df._jdf.queryExecution().executedPlan().toString().rstrip()
                )
                fh.write("\n")
        samples = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {
            "median": round(statistics.median(samples), 3),
            "min": min(samples),
            "samples": samples,
        }
        print(f"{name}: median={out[name]['median']} samples={samples}", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "runs": runs, "timings": out}))


if __name__ == "__main__":
    main()
