"""Generic constraint framework (single-pass DQ gate)."""

import pytest

from defi_features_data_pipeline_spark.quality import (
    Constraint,
    ConstraintSuite,
    DataQualityError,
)


def test_suite_passes_and_fails(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 0.0), (3, "a", 2.0)],
        "id long, cat string, v double",
    )
    ok = ConstraintSuite(
        [
            Constraint.not_all_zero("v"),
            Constraint.no_negatives("v", "id"),
            Constraint.non_null("cat"),
            Constraint.unique_key("id"),
            Constraint.accepted_values("cat", ["a", "b"]),
            Constraint.min_rows(2),
        ]
    )
    results = ok.enforce(df)
    assert set(results.values()) == {False}

    bad = ConstraintSuite(
        [Constraint.unique_key("cat"), Constraint.min_rows(10)]
    )
    with pytest.raises(DataQualityError) as e:
        bad.enforce(df)
    assert "cat_not_unique" in str(e.value)
    assert "fewer_than_10_rows" in str(e.value)


def test_all_zero_detection(spark):
    df = spark.createDataFrame([(0.0,), (0.0,)], "x double")
    with pytest.raises(DataQualityError):
        ConstraintSuite([Constraint.not_all_zero("x")]).enforce(df)


def test_quarantine_split(spark):
    """split(): row-attributable violations route to the quarantine
    frame with per-row reasons; clean rows pass through untouched;
    table-level constraints are excluded from attribution."""
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, -1.0), (3, "z", 2.0), (4, "b", 0.0)],
        "id long, cat string, v double",
    )
    suite = ConstraintSuite(
        [
            Constraint.no_negatives("v"),
            Constraint.non_null("cat"),
            Constraint.accepted_values("cat", ["a", "b"]),
            Constraint.min_rows(1),  # table-level: no row attribution
        ]
    )
    clean, quarantined = suite.split(df)
    assert sorted(r["id"] for r in clean.collect()) == [1, 4]
    assert "dq_reasons" not in clean.columns
    reasons = {r["id"]: sorted(r["dq_reasons"]) for r in quarantined.collect()}
    assert reasons == {
        2: ["cat_has_nulls", "exist_negative_count"],
        3: ["cat_unexpected_values"],
    }


def test_quarantine_requires_row_attributable(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="row-attributable"):
        ConstraintSuite([Constraint.min_rows(1)]).split(df)
