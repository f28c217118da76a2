"""Regenerate physical-plan listings for PLANS.md.

Usage: python tools/make_plans.py [sf_dir] query [query ...]

Prints each query's EXECUTED plan (post-AQE-planning tree, `simple`
mode — see the AQE note in the perf docs: `formatted` duplicates nodes
and hides codegen markers). Paste the output under a `## <query>`
heading in PLANS.md with a one-line "what to look for" note.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args
    if not names:
        sys.exit("usage: make_plans.py [sf_dir] query [query ...]")

    import __spark_entry__ as mod
    from defi_features_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="make_plans", shuffle_partitions=32)
    qs = mod.queries()
    for name in names:
        if name not in qs:
            sys.exit(f"unknown query {name!r}; see __spark_entry__.queries()")
        df = qs[name](spark, sf_dir)
        print(f"## {name}\n")
        print("```")
        print(df._jdf.queryExecution().executedPlan().toString().rstrip())
        print("```\n")


if __name__ == "__main__":
    main()
