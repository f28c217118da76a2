"""Presto/Athena dialect compatibility — run the reference's SQL text
on Spark.

The reference executes its transformations as Athena (Presto) SQL
strings (src/pipelines/features/transformations/*.sql,
src/pipelines/stage/transformations/stage_tranformation_queries.py).
Most of that surface is engine-neutral (SUM/AVG/COALESCE/ABS/
GREATEST/CAST), but a handful of constructs are Presto-only; this
module provides the two pieces a migrating user needs:

- ``register_presto_compat(spark)``: SQL scalar functions (Spark 4
  ``CREATE FUNCTION ... RETURN`` — inlined at resolution, zero
  slow-path cost) for Presto scalars Spark lacks by name, currently
  ``to_unixtime`` (used by view_defi_lending_time_and_count_features
  .sql:6 and view_defi_liquidation_features.sql).
- ``translate_presto(sql)``: textual rewrites for constructs a
  function can't cover — renames (``arbitrary``→``any_value``,
  ``approx_distinct``→``approx_count_distinct`` — aggregates cannot
  be SQL UDFs), argument-order changes (Presto's 3-arg
  ``date_add('unit', n, ts)``→``timestampadd(unit, n, ts)``;
  ``date_diff('unit', a, b)``→``timestampdiff(unit, a, b)`` keeps
  argument order because BOTH compute arg3−arg2 — Presto's date_diff
  is b−a and Spark's TIMESTAMPDIFF(unit, start, end) is end−start, so
  no swap is needed or performed), and
  precision defaults (bare ``CAST(x AS DECIMAL)`` means decimal(38,0)
  on Athena but decimal(10,0) on Spark — widened explicitly).

The rewrites are deliberately conservative regex surgery over a known
dialect subset — a full SQL transpiler (sqlglot) is the production
upgrade and slots in behind the same two entry points.
"""

from __future__ import annotations

import re

# Presto date_add/date_diff units are quoted strings; Spark's
# TIMESTAMPADD/TIMESTAMPDIFF take bare keywords.
_UNITS = "second|minute|hour|day|week|month|quarter|year"

_REWRITES: list[tuple[re.Pattern, str]] = [
    # arbitrary(x) -> any_value(x)
    (re.compile(r"\barbitrary\s*\(", re.I), "any_value("),
    # approx_distinct(x) -> approx_count_distinct(x)
    (re.compile(r"\bapprox_distinct\s*\(", re.I), "approx_count_distinct("),
    # date_add('day', n, ts) -> timestampadd(day, n, ts)
    (
        re.compile(rf"\bdate_add\s*\(\s*'({_UNITS})'\s*,", re.I),
        r"timestampadd(\1,",
    ),
    # date_diff('day', a, b) [= b - a] -> timestampdiff(day, a, b) [= b - a]
    (
        re.compile(rf"\bdate_diff\s*\(\s*'({_UNITS})'\s*,", re.I),
        r"timestampdiff(\1,",
    ),
    # bare DECIMAL cast: Athena treats as high-precision; Spark's
    # default decimal(10,0) silently overflows epoch-scale values
    (
        re.compile(r"\bas\s+decimal\s*\)", re.I),
        "as decimal(38,0))",
    ),
]


def translate_presto(sql: str, now_epoch: int | None = None) -> str:
    """Rewrite the known Presto-only constructs to Spark SQL. Pure
    text transformation — call ``register_presto_compat`` once per
    session for the function-name shims that need no rewriting.

    ``now_epoch``: when set, every ``current_timestamp`` is pinned to
    ``timestamp_seconds(now_epoch)``. The reference's feature views
    compute ``to_unixtime(current_timestamp) - min(ts)`` sentinels
    (view_defi_lending_time_and_count_features.sql:6) — injectable
    "now" is what makes a cross-engine hash comparison deterministic,
    and is the same seam the DataFrame port exposes as ``now_epoch``."""
    out = sql
    for pat, repl in _REWRITES:
        out = pat.sub(repl, out)
    if now_epoch is not None:
        # cover Presto's parenthesized form too — a bare rewrite would
        # turn current_timestamp() into timestamp_seconds(N)()
        out = re.sub(
            r"\bcurrent_timestamp\b(\s*\(\s*\))?",
            f"timestamp_seconds({int(now_epoch)})",
            out,
            flags=re.I,
        )
    return out


# Athena addresses tables as <database>.<table> (db_raw_prod /
# db_stage_prod / db_analytics_prod / db_sandbox_prod — reference
# config/settings.toml). Spark temp views are flat, so the literal SQL
# corpus maps each database to a layer prefix: db_stage_prod.x ->
# stage_x. A plain strip would collide (transpose_borrow_events exists
# in BOTH stage and analytics).
_SCHEMA_MAP = {
    "db_raw_prod": "raw",
    "db_stage_prod": "stage",
    "db_analytics_prod": "analytics",
    "db_sandbox_prod": "sandbox",
}
_SCHEMA_RE = re.compile(
    r"\b(" + "|".join(_SCHEMA_MAP) + r")\.([A-Za-z_][A-Za-z0-9_]*)"
)


def qualify_schemas(sql: str) -> str:
    """Map Athena ``<database>.<table>`` references to flat layer-
    prefixed temp-view names (``db_stage_prod.t`` -> ``stage_t``)."""
    return _SCHEMA_RE.sub(
        lambda m: f"{_SCHEMA_MAP[m.group(1)]}_{m.group(2)}", sql
    )


def register_presto_compat(spark) -> None:
    """Register Presto scalar functions Spark lacks by name. SQL UDFs
    inline into the plan (whole-stage codegen, no serialization)."""
    # to_unixtime(timestamp) -> epoch seconds as DOUBLE (Presto
    # semantics, sub-second precision preserved)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION to_unixtime(x TIMESTAMP) "
        "RETURNS DOUBLE "
        "RETURN cast(unix_micros(x) as double) / 1000000.0D"
    )


def run_presto_sql(spark, sql: str):
    """Convenience: register compat functions, translate, execute."""
    register_presto_compat(spark)
    return spark.sql(translate_presto(sql))
