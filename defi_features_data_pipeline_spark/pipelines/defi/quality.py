"""Data-quality gate — the 4 constraints of
`/root/reference/src/pipelines/features/data_quality/defi_features_constraints_query.sql:1-51`,
evaluated post-build; any failure raises (halting the pipeline before
serving, like the reference DAG)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


class DataQualityError(RuntimeError):
    pass


def _all_zero_pct(df: DataFrame, col: str) -> F.Column:
    return (
        F.count(F.when(F.col(col) == 0, F.lit(1))).cast("double")
        / F.count(F.lit(1))
        * 100.0
    ) == 100.0


def run_quality_gate(features: DataFrame) -> DataFrame:
    """Returns the constraint result frame; raises DataQualityError if
    any is_fail (mirrors `defi_features_data_quality_pipeline.py:24-33`)."""
    rows = [
        features.agg(
            F.lit("total_collateral_eth_values_all_zero").alias("constraint_name"),
            _all_zero_pct(features, "total_collateral_eth").alias("is_fail"),
        ),
        features.agg(
            F.lit("factor_values_all_zero").alias("constraint_name"),
            _all_zero_pct(features, "risk_factor").alias("is_fail"),
        ),
        features.agg(
            F.lit("borrow_counts_values_all_zero").alias("constraint_name"),
            _all_zero_pct(features, "borrow_count").alias("is_fail"),
        ),
        features.agg(
            F.lit("exist_negative_count").alias("constraint_name"),
            (
                F.count(
                    F.when(
                        (F.col("unique_borrow_protocol_count") < 0)
                        | (F.col("unique_lending_protocol_count") < 0)
                        | (F.col("deposit_count") < 0)
                        | (F.col("liquidation_count") < 0)
                        | (F.col("borrow_count") < 0)
                        | (F.col("repay_count") < 0),
                        F.lit(1),
                    )
                )
                > 0
            ).alias("is_fail"),
        ),
    ]
    result = rows[0]
    for r in rows[1:]:
        result = result.unionByName(r)
    failed = [r["constraint_name"] for r in result.collect() if r["is_fail"]]
    if failed:
        raise DataQualityError(f"data quality constraints failed: {failed}")
    return result
