"""Run the reference's LITERAL SQL corpus on Spark (dialect parity
proof).

The DataFrame port (`stage.py` / `analytics.py` / `features.py`) is
the production path; this module is the migration-parity proof: it
feeds the reference's own query files — unmodified text, read straight
from the reference checkout — through the Presto/Athena compat layer
(`sources/presto_compat.py`) and executes them on Spark over the same
fixture lake, layer by layer, exactly as the reference's Athena
pipeline does:

  1. stage: `stage/transformations/stage_tranformation_queries.py`
     (general + liquidation event templates) and the Graph-snapshot
     INSERTs in `stage/historical_market_data.py` /
     `stage/historical_account_positions.py`;
  2. analytics: the per-event pricing template
     `analytics/transformations/transformations.sql` rendered with the
     event-config table from `analytics/defi_events.py:142-149`, plus
     the market-data/positions join in
     `analytics/historical_market_data_and_account_positions.py`;
  3. features: all `features/transformations/view_defi_*.sql` +
     `view_distinct_defi_events_addresses.sql` views, then
     `defi_features_calculation.sql` (the 27-column output);
  4. data quality: `features/data_quality/
     defi_features_constraints_query.sql` over the result.

Each INSERT-INTO layer is materialized to parquet before the next runs
(mirroring Athena's table-at-a-time execution, and cutting re-compute
for the views that scan an analytics table many times).

The SQL text itself is never stored in this repo — it is read from the
reference checkout at call time; ``corpus_available()`` gates callers.

Divergence note (KNOWN_LIMITS.md #1): the reference's two-pass as-of
price lookup fans out on tied max price timestamps. The literal corpus
reproduces that fan-out faithfully — so a parity comparison against
the DataFrame port (which dedups ties deterministically) requires a
tie-free price table; `tests/test_reference_corpus.py` pins both
facts.
"""

from __future__ import annotations

import os
import re
from itertools import product

from pyspark.sql import DataFrame, SparkSession

from ...sources.presto_compat import (
    qualify_schemas,
    register_presto_compat,
    translate_presto,
)
from .config import EVENTS

REF_ROOT = "/root/reference/src/pipelines"

# every two-hex-char address partition — the reference fans its
# INSERTs out over chunks of this list (defi_events.py:160); one
# rendering with the full list is the same predicate
ALL_ADDRESS_PARTITIONS = tuple(map("".join, product("0123456789abcdef", repeat=2)))

# view dependency order (each view only reads tables + earlier views)
VIEW_FILES = [
    "view_distinct_defi_events_addresses.sql",
    "view_defi_borrow_features.sql",
    "view_defi_repay_features.sql",
    "view_defi_lending_sum_redeems_features.sql",
    "view_defi_lending_time_and_count_features.sql",
    "view_defi_liquidation_features.sql",
    "view_defi_credit_mix_features.sql",
    "view_defi_historical_health_and_risk_factor.sql",
    "view_defi_historical_count_above_threshold.sql",
    "view_defi_current_health_factor_features.sql",
]

_TRIPLE_QUOTED = re.compile(r'"""(.*?)"""', re.S)
_INSERT_INTO = re.compile(r"^\s*INSERT\s+INTO\s+\S+\s*", re.I)
_CREATE_VIEW = re.compile(
    r"CREATE\s+OR\s+REPLACE\s+VIEW\s+db_analytics_prod\.([A-Za-z0-9_]+)\s+AS",
    re.I,
)


def corpus_available(ref_root: str = REF_ROOT) -> bool:
    return os.path.isdir(os.path.join(ref_root, "features", "transformations"))


def _read(ref_root: str, *parts: str) -> str:
    with open(os.path.join(ref_root, *parts)) as f:
        return f.read()


def _sql_strings(ref_root: str, *parts: str) -> list[str]:
    """Extract the triple-quoted INSERT templates from a reference .py
    file WITHOUT importing/executing it (the reference is untrusted
    content; its orchestration code also needs AWS libraries).
    Docstrings and helper queries are skipped."""
    return [
        m.group(1)
        for m in _TRIPLE_QUOTED.finditer(_read(ref_root, *parts))
        if re.search(r"\bINSERT\s+INTO\b", m.group(1), re.I)
    ]


def _strip_insert(sql: str) -> str:
    """Drop the ``INSERT INTO <table>`` prefix — Spark materializes the
    SELECT itself; the caller owns the write."""
    return _INSERT_INTO.sub("", sql, count=1)


def _run(spark: SparkSession, sql: str, now_epoch: int | None = None) -> DataFrame:
    return spark.sql(translate_presto(qualify_schemas(sql), now_epoch=now_epoch))


def _materialize(
    spark: SparkSession, df: DataFrame, out_dir: str, view: str
) -> DataFrame:
    path = f"{out_dir}/{view}"
    df.write.mode("overwrite").parquet(path)
    out = spark.read.parquet(path)
    out.createOrReplaceTempView(view)
    return out


def run_reference_corpus(
    spark: SparkSession,
    lake_dir: str,
    out_dir: str,
    ref_root: str = REF_ROOT,
    now_epoch: int = 0,
) -> DataFrame:
    """Execute the full literal corpus raw->stage->analytics->features
    over the fixture lake at ``lake_dir``; intermediate tables land
    under ``out_dir``. Returns the 27-column wallet feature frame (also
    registered as the ``analytics_defi_features`` temp view for the DQ
    query)."""
    register_presto_compat(spark)

    # ---- raw + pre-existing layer tables from the fixture lake ------
    for ev in EVENTS:
        spark.read.parquet(f"{lake_dir}/raw/transpose_{ev}_events").createOrReplaceTempView(
            f"raw_transpose_{ev}_events"
        )
    for tbl in ("the_graph_historical_market_data", "the_graph_historical_account_positions"):
        spark.read.parquet(f"{lake_dir}/raw/{tbl}").createOrReplaceTempView(f"raw_{tbl}")
    spark.read.parquet(f"{lake_dir}/stage/ethereum_tokens_metadata").createOrReplaceTempView(
        "stage_ethereum_tokens_metadata"
    )
    spark.read.parquet(f"{lake_dir}/sandbox/defi_events_tokens_to_drop").createOrReplaceTempView(
        "sandbox_defi_events_tokens_to_drop"
    )
    spark.read.parquet(
        f"{lake_dir}/analytics/features_daily_token_prices"
    ).createOrReplaceTempView("analytics_features_daily_token_prices")
    # the current-positions analytics table is produced by PYTHON
    # ingestion in the reference (current_collateral_positions.py
    # fetches positions for the sandbox wallet list — not SQL), so it
    # is an INPUT to the SQL corpus; reuse the port's ingestion
    # boundary to build it (lowercased accounts, test-wallet semi-join)
    from .analytics import current_collateral_positions

    current_collateral_positions(
        spark.read.parquet(f"{lake_dir}/raw/the_graph_current_collateral_positions"),
        spark.read.parquet(f"{lake_dir}/sandbox/test_set_wallet_addresses"),
    ).createOrReplaceTempView("analytics_the_graph_current_collateral_positions")

    # ---- incremental-watermark bootstrap ---------------------------
    # The reference's stage INSERTs filter on `> (SELECT max(..) FROM
    # <target>)`. Model a prior load whose newest row predates all
    # fixture data: a single 1970 row for the event tables (the
    # reference's general_query has NO COALESCE — on a truly empty
    # table max() is NULL and `> NULL` drops every row, an Athena
    # first-load quirk the orchestrator works around by bootstrapping
    # the table), and an empty frame for the Graph tables (their
    # queries COALESCE(max(block_number), 0)).
    spark.sql("SELECT timestamp_seconds(0) AS timestamp").createOrReplaceTempView(
        "_bootstrap_events"
    )
    spark.sql(
        "SELECT CAST(NULL AS BIGINT) AS block_number WHERE 1=0"
    ).createOrReplaceTempView("_bootstrap_blocks")
    for ev in EVENTS:
        spark.table("_bootstrap_events").createOrReplaceTempView(
            f"stage_transpose_{ev}_events"
        )
    for tbl in ("the_graph_historical_market_data", "the_graph_historical_account_positions"):
        spark.table("_bootstrap_blocks").createOrReplaceTempView(f"stage_{tbl}")

    # ---- stage layer: literal templates ----------------------------
    general_q, liquidation_q = _sql_strings(
        ref_root, "stage", "transformations", "stage_tranformation_queries.py"
    )[:2]
    for ev in EVENTS:
        template = liquidation_q if ev == "liquidation" else general_q
        _materialize(
            spark,
            _run(spark, _strip_insert(template.format(ev))),
            out_dir,
            f"stage_transpose_{ev}_events",
        )
    md_q = _sql_strings(ref_root, "stage", "historical_market_data.py")[0]
    _materialize(
        spark,
        _run(spark, _strip_insert(md_q.format(table_name="the_graph_historical_market_data"))),
        out_dir,
        "stage_the_graph_historical_market_data",
    )
    ap_q = _sql_strings(ref_root, "stage", "historical_account_positions.py")[0]
    _materialize(
        spark,
        _run(
            spark,
            _strip_insert(ap_q.format(table_name="the_graph_historical_account_positions")),
        ),
        out_dir,
        "stage_the_graph_historical_account_positions",
    )

    # ---- analytics layer -------------------------------------------
    ev_template = _read(ref_root, "analytics", "transformations", "transformations.sql")
    for ev, cfg in EVENTS.items():
        rendered = ev_template.format(
            event_name=ev,
            token_column=cfg.token_column,
            quantity_column=cfg.quantity_column,
            index_column=cfg.index_column,
            last_timestamp=0,
            address_partitions=ALL_ADDRESS_PARTITIONS,
        )
        _materialize(
            spark,
            _run(spark, _strip_insert(rendered)),
            out_dir,
            f"analytics_transpose_{ev}_events",
        )
    join_q = next(
        s
        for s in _sql_strings(
            ref_root, "analytics", "historical_market_data_and_account_positions.py"
        )
        if "merged_market_data_and_account_positions" in s
    )
    rendered = join_q.format(
        last_block_number=0, address_partitions=ALL_ADDRESS_PARTITIONS
    )
    _materialize(
        spark,
        _run(spark, _strip_insert(rendered)),
        out_dir,
        "analytics_the_graph_historical_market_data_and_account_positions",
    )

    # ---- feature views (literal CREATE VIEW, made temporary) --------
    for fname in VIEW_FILES:
        text = _read(ref_root, "features", "transformations", fname)
        text = _CREATE_VIEW.sub(
            r"CREATE OR REPLACE TEMPORARY VIEW analytics_\1 AS", text, count=1
        )
        spark.sql(translate_presto(qualify_schemas(text), now_epoch=now_epoch))

    # ---- final feature calculation ---------------------------------
    calc = _read(ref_root, "features", "transformations", "defi_features_calculation.sql")
    features = _materialize(
        spark, _run(spark, calc, now_epoch=now_epoch), out_dir, "analytics_defi_features"
    )
    return features


def run_reference_dq(spark: SparkSession, ref_root: str = REF_ROOT) -> DataFrame:
    """Run the literal data-quality constraint query over the
    ``analytics_defi_features`` view produced by
    ``run_reference_corpus``."""
    dq = _read(
        ref_root, "features", "data_quality", "defi_features_constraints_query.sql"
    )
    return _run(spark, dq.rstrip().rstrip(";"))
