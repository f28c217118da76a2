"""Physical-plan inspection helpers — used by tests to assert the plan
we want at scale (broadcast where intended, filters pushed to the
parquet scan), not just correct output."""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lines from the formatted plan (parquet scans)."""
    out = []
    for line in explain_str(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            out.append(line)
    return out
