"""Data-quality gate — the 4 constraints of
`/root/reference/src/pipelines/features/data_quality/defi_features_constraints_query.sql:1-51`,
expressed through the generic constraint framework
(`defi_features_data_pipeline_spark.quality`): one aggregation pass
instead of the reference's scan-per-constraint UNION ALL; any failure
raises, halting the pipeline before serving."""

from __future__ import annotations

from pyspark.sql import DataFrame

from ...quality import Constraint, ConstraintSuite, DataQualityError  # noqa: F401

DEFI_FEATURES_SUITE = ConstraintSuite(
    [
        Constraint.not_all_zero("total_collateral_eth"),
        Constraint.not_all_zero("risk_factor"),
        Constraint.not_all_zero("borrow_count"),
        Constraint.no_negatives(
            "unique_borrow_protocol_count",
            "unique_lending_protocol_count",
            "deposit_count",
            "liquidation_count",
            "borrow_count",
            "repay_count",
        ),
    ]
)


def report_frame(spark, results: dict[str, bool]) -> DataFrame:
    """The (constraint_name, is_fail) frame mirroring the reference's
    DQ-query result shape — one definition for both serving modes."""
    return spark.createDataFrame(
        [(name, bool(failed)) for name, failed in results.items()],
        "constraint_name string, is_fail boolean",
    )


def run_quality_gate(features: DataFrame) -> DataFrame:
    """Evaluate + enforce; returns the (constraint_name, is_fail) frame
    (all-False when passing), mirroring the reference's result shape."""
    results = DEFI_FEATURES_SUITE.enforce(features)
    return report_frame(features.sparkSession, results)
