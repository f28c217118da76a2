"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value" (total sec), "unit", "queries"
(per-query sec), "sf"}.

Each query is forced to full materialization with the noop sink (no
driver-side collect skew). A JVM/session warm-up query runs first so
cold-start cost isn't attributed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from defi_features_data_pipeline_spark.queries import ALL_QUERIES  # noqa: E402
from defi_features_data_pipeline_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "pricing_summary",
    "regional_revenue",
    "customer_feature_spine",
    "asof_price",
    "latest_event_per_user",
    "agg_of_agg",
    "two_role_union",
    "top3_orders_per_customer",
    "disjunctive_join",
    "union_distinct_spine",
    # extensions (present from round 1+; skipped silently if renamed)
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "text_quality",
    "lang_id",
    "doc_fingerprint",
    "knn_cosine_topk",
    "ann_ivf_topk",
    "dedup_embedding_cosine",
    "multimodal_extract",
    "sessionize_events",
    "running_user_value",
    "grouped_median_pandas",
    "sql_api_shipping_priority",
    "pivot_order_status",
    "rollup_revenue",
    "salted_skew_join",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")

    # warm-up: JVM codegen + parquet footer caches
    ALL_QUERIES["pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = ALL_QUERIES.get(name)
        if fn is None:
            continue
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
