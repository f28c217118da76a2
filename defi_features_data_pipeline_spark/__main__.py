"""CLI entry point: run the DeFi feature pipeline over a lake directory.

The reference runs as an Airflow DAG of ECS tasks
(`/root/reference/devops/airflow/dags/dag_defi_features.py`); the
Spark-native equivalent is one driver program — schedule THIS under
any orchestrator (Airflow SparkSubmitOperator, cron, etc.):

    python -m defi_features_data_pipeline_spark \
        --base-dir /data/defi_lake --now-epoch 1700000000 [--streaming]

Re-running is safe: every layer is incremental (high-watermark append
or checkpointed availableNow streams).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="defi_features_data_pipeline_spark",
        description="Run the raw->stage->analytics->features->serving pipeline.",
    )
    p.add_argument("--base-dir", required=True, help="lake root (raw/ stage/ ... inside)")
    p.add_argument(
        "--now-epoch",
        type=int,
        default=None,
        help="'now' for time-since features (default: wall clock); pin it for "
        "reproducible runs",
    )
    p.add_argument(
        "--streaming",
        action="store_true",
        help="stage inputs via availableNow file streams (exactly-once by file) "
        "instead of watermark predicates",
    )
    p.add_argument(
        "--show", type=int, default=0, metavar="N", help="print first N feature rows"
    )
    args = p.parse_args(argv)

    from .pipelines.defi import run_pipeline
    from .session import get_spark

    spark = get_spark(app_name="defi_features_pipeline")
    now = args.now_epoch if args.now_epoch is not None else int(time.time())
    features = run_pipeline(spark, args.base_dir, now_epoch=now, streaming=args.streaming)
    n = features.count()
    if args.show:
        features.show(args.show, truncate=False)
    print(f"defi_features: {n} wallets (now_epoch={now})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
