"""Reusable data-quality constraint framework.

Generalizes the reference's DQ gate
(`/root/reference/src/pipelines/features/data_quality/defi_features_constraints_query.sql`
+ `defi_features_data_quality_pipeline.py:24-33`): each constraint is a
named boolean aggregate over the table; the suite evaluates ALL
constraints in ONE job (single pass over the data — the reference runs
one scan per constraint via UNION ALL; here they collapse into one
aggregate), reports per-constraint pass/fail, and raises on any
failure so the pipeline halts before serving.

Built-in constraint builders cover the common shapes: not-all-zero,
no-negatives, non-null, unique-key, accepted-values, row-count bounds.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


class DataQualityError(RuntimeError):
    pass


@dataclass(frozen=True)
class Constraint:
    """name + a lazily-built boolean AGGREGATE expression that is True
    on FAILURE. Lazy (a thunk, not a Column) so suites can be declared
    at module import time, before any SparkSession exists.

    ``row_fail`` (optional): a ROW-level predicate attributing the
    failure to individual rows — powers ``ConstraintSuite.split``
    (quarantine). Table-level constraints (not-all-zero, min-rows)
    have no row attribution and leave it None."""

    name: str
    is_fail: Callable[[], Column]
    row_fail: Callable[[], Column] | None = None

    # ---- builders for the common shapes -----------------------------------

    @staticmethod
    def not_all_zero(col: str) -> "Constraint":
        """Fails when 100% of values are zero (reference's
        `*_values_all_zero` constraints)."""
        return Constraint(
            f"{col}_values_all_zero",
            lambda: F.count(F.when(F.col(col) == 0, F.lit(1))) == F.count(F.lit(1)),
        )

    @staticmethod
    def no_negatives(*cols: str) -> "Constraint":
        def row() -> Column:
            cond = None
            for c in cols:
                term = F.col(c) < 0
                cond = term if cond is None else (cond | term)
            return cond

        return Constraint(
            "exist_negative_count",
            lambda: F.count(F.when(row(), F.lit(1))) > 0,
            row,
        )

    @staticmethod
    def non_null(col: str) -> "Constraint":
        return Constraint(
            f"{col}_has_nulls",
            lambda: F.count(F.when(F.col(col).isNull(), F.lit(1))) > 0,
            lambda: F.col(col).isNull(),
        )

    @staticmethod
    def unique_key(col: str) -> "Constraint":
        return Constraint(
            f"{col}_not_unique",
            lambda: F.countDistinct(F.col(col)) != F.count(F.col(col)),
        )

    @staticmethod
    def accepted_values(col: str, values: list) -> "Constraint":
        return Constraint(
            f"{col}_unexpected_values",
            lambda: F.count(F.when(~F.col(col).isin(*values), F.lit(1))) > 0,
            lambda: ~F.col(col).isin(*values),
        )

    @staticmethod
    def min_rows(n: int) -> "Constraint":
        return Constraint(f"fewer_than_{n}_rows", lambda: F.count(F.lit(1)) < n)


class ConstraintSuite:
    def __init__(self, constraints: list[Constraint]):
        if not constraints:
            raise ValueError("empty constraint suite")
        self.constraints = constraints

    def evaluate(self, df: DataFrame) -> dict[str, bool]:
        """One aggregation job over ``df`` → {constraint: failed?}."""
        row = df.agg(
            *[c.is_fail().alias(c.name) for c in self.constraints]
        ).first()
        return {c.name: bool(row[c.name]) for c in self.constraints}

    def enforce(self, df: DataFrame) -> dict[str, bool]:
        """Evaluate and raise DataQualityError listing failures."""
        results = self.evaluate(df)
        failed = [n for n, bad in results.items() if bad]
        if failed:
            raise DataQualityError(f"data quality constraints failed: {failed}")
        return results

    def split(self, df: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Quarantine mode: (clean, quarantined) where ``quarantined``
        carries a ``dq_reasons`` array naming every ROW-attributable
        constraint the row violates. The serve-the-good-rows
        alternative to ``enforce``'s halt-the-pipeline: write the
        quarantine frame to a sink for triage and keep shipping.

        Only constraints with ``row_fail`` participate (table-level
        ones cannot blame a row); the reason expression is computed
        once per row — a plain projection + filter, no extra job, and
        the two outputs share the scan when written in one lineage."""
        attributable = [c for c in self.constraints if c.row_fail is not None]
        if not attributable:
            raise ValueError("no row-attributable constraints in this suite")
        reasons = F.array_compact(
            F.array(
                *[
                    F.when(c.row_fail(), F.lit(c.name))
                    for c in attributable
                ]
            )
        )
        tagged = df.withColumn("dq_reasons", reasons)
        quarantined = tagged.filter(F.size("dq_reasons") > 0)
        clean = tagged.filter(F.size("dq_reasons") == 0).drop("dq_reasons")
        return clean, quarantined
