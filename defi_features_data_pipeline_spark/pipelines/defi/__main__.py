"""CLI entrypoints — the user surface of the reference's per-stage
scripts (`python src/pipelines/analytics/defi_events.py --event borrow`
etc., wired by `devops/airflow/dags/dag_defi_features.py`):

    python -m defi_features_data_pipeline_spark.pipelines.defi fixtures --lake DIR
    python -m defi_features_data_pipeline_spark.pipelines.defi run --lake DIR [--now EPOCH]
    python -m defi_features_data_pipeline_spark.pipelines.defi stage --lake DIR --event borrow
    python -m defi_features_data_pipeline_spark.pipelines.defi analytics --lake DIR --event borrow
    python -m defi_features_data_pipeline_spark.pipelines.defi show --lake DIR [--limit N]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="defi-features-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("fixtures", help="generate the deterministic raw-layer fixture lake")
    p.add_argument("--lake", required=True)

    p = sub.add_parser("run", help="full raw->stage->analytics->features->DQ->serving run")
    p.add_argument("--lake", required=True)
    p.add_argument("--now", type=int, default=None, help="evaluation epoch (default: wall clock)")

    p = sub.add_parser("stage", help="stage one event table incrementally")
    p.add_argument("--lake", required=True)
    p.add_argument("--event", required=True, choices=["borrow", "deposit", "repay", "withdraw", "liquidation"])

    p = sub.add_parser("analytics", help="enrich one staged event table incrementally")
    p.add_argument("--lake", required=True)
    p.add_argument("--event", required=True, choices=["borrow", "deposit", "repay", "withdraw", "liquidation"])

    p = sub.add_parser("show", help="print the defi_features head")
    p.add_argument("--lake", required=True)
    p.add_argument("--limit", type=int, default=10)

    args = ap.parse_args(argv)

    from ...session import get_spark
    from ...sources.catalog import Catalog
    from ...sources.sinks import incremental_insert

    spark = get_spark(app_name=f"defi_{args.cmd}")
    cat = Catalog(spark, args.lake)

    if args.cmd == "fixtures":
        from .fixtures import generate

        paths = generate(spark, args.lake)
        print(f"generated {len(paths)} fixture tables under {args.lake}")
        return 0

    if args.cmd == "run":
        from .runner import run_pipeline

        now = args.now if args.now is not None else int(time.time())
        features = run_pipeline(spark, args.lake, now_epoch=now)
        print(f"defi_features: {features.count()} wallets x {len(features.columns)} features")
        return 0

    if args.cmd == "stage":
        from .stage import stage_events

        raw = cat.read("raw", f"transpose_{args.event}_events")
        staged = stage_events(raw, liquidation=(args.event == "liquidation"))
        n = incremental_insert(
            spark, staged, cat.path("stage", f"transpose_{args.event}_events"),
            watermark_col="epoch_timestamp", partition_by=["year", "month"],
        )
        print(f"staged {n} new {args.event} events")
        return 0

    if args.cmd == "analytics":
        from .analytics import enrich_events
        from .config import EVENTS

        cfg = EVENTS[args.event]
        enriched = enrich_events(
            cat.read("stage", f"transpose_{args.event}_events"),
            cat.read("stage", "ethereum_tokens_metadata"),
            cat.read("sandbox", "defi_events_tokens_to_drop"),
            cat.read("analytics", "features_daily_token_prices"),
            cfg,
        )
        n = incremental_insert(
            spark, enriched, cat.path("analytics", f"transpose_{args.event}_events"),
            watermark_col="epoch_timestamp", partition_by=["year", "month"],
        )
        print(f"enriched {n} new {args.event} events")
        return 0

    if args.cmd == "show":
        cat.read("analytics", "defi_features").show(args.limit, truncate=False)
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
