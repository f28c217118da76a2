"""Quiet-session re-measure of normalized-regression flags (r10 verdict
item 1): time the flagged queries under the canary protocol — fresh
session, warm-up query first, canary pair bracketing, median of N runs
— with nothing else on the box, and print a JSON verdict comparing
each flag against its prior-round baseline after machine-ratio
normalization by the canary pair (warm leg).

Usage: python tools/remeasure_flags.py [query ...]
Defaults to the queries flagged in the newest BENCH_full's
normalized_regressions block.
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from defi_features_data_pipeline_spark.queries import ALL_QUERIES  # noqa: E402
from defi_features_data_pipeline_spark.session import get_spark  # noqa: E402

from bench import (  # noqa: E402
    CANARY,
    _prior_round_timings,
    _time_median,
    _time_once,
)


def newest_bench_full() -> dict:
    paths = sorted(
        glob.glob(os.path.join(HERE, "BENCH_full_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)\.json$", p).group(1)),
    )
    with open(paths[-1]) as f:
        return json.load(f)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = max(3, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))
    bench = newest_bench_full()
    flagged = sys.argv[1:] or sorted(bench.get("normalized_regressions", {}))
    prior = _prior_round_timings(HERE)

    spark = get_spark(app_name="remeasure")
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-up contract as bench.py
    ALL_QUERIES["pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # canary pair, warm protocol: one throwaway run then median-of-runs
    canary: dict[str, float] = {}
    for name in CANARY:
        _time_once(spark, ALL_QUERIES[name], sf_dir)
        canary[name] = _time_median(spark, ALL_QUERIES[name], sf_dir, runs)
    # r11 ADVICE (this file:65): restrict BOTH sums to the same name
    # set — summing only prior-present canaries in prev but both live
    # legs in now inflates machine_ratio arbitrarily when the prior
    # round lacks a canary timing, collapsing normalized_sec and
    # silently clearing every flag. No usable prior → ratio None and
    # flag_cleared is skipped rather than inverted.
    names = [c for c in CANARY if prior.get(c) and c in canary]
    if names:
        prev = sum(prior[c] for c in names)
        now = sum(canary[c] for c in names)
        machine_ratio = round(now / max(prev, 1e-6), 3)
    else:
        machine_ratio = None

    out = {
        "sf_dir": sf_dir,
        "runs": runs,
        "canary_warm": {k: round(v, 3) for k, v in canary.items()},
        "machine_ratio_warm_pair": machine_ratio,
        "queries": {},
    }
    for name in flagged:
        fn = ALL_QUERIES.get(name)
        if fn is None:
            continue
        _time_once(spark, fn, sf_dir)  # warm run, discarded
        samples = [_time_once(spark, fn, sf_dir) for _ in range(runs)]
        med = statistics.median(samples)
        prev_q = prior.get(name)
        norm = med / max(machine_ratio, 1e-6) if machine_ratio else None
        out["queries"][name] = {
            "samples": [round(s, 3) for s in samples],
            "median_sec": round(med, 3),
            "normalized_sec": round(norm, 3) if norm is not None else None,
            "prior_sec": prev_q,
            "normalized_ratio": (
                round(norm / prev_q, 2)
                if prev_q and norm is not None
                else None
            ),
            # tri-state: None = verdict unavailable (no machine ratio
            # or no prior), never a defaulted True
            "flag_cleared": (
                bool(norm <= 1.5 * prev_q)
                if prev_q and norm is not None
                else None
            ),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
