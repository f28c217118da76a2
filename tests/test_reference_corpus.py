"""Literal-SQL corpus parity (VERDICT r6 item 1): the reference's OWN
query files — stage templates, analytics templates, all feature views,
defi_features_calculation.sql — executed verbatim on Spark through the
Presto compat layer, hash-matched wallet-by-wallet against BOTH the
DataFrame port and the independent DuckDB oracle.

The corpus text is read from the reference checkout at test time
(never stored in this repo); tests skip when the checkout is absent.
"""

import math
import os
import sys

import duckdb
import pandas as pd
import pytest
import pyspark.sql.functions as F

from defi_features_data_pipeline_spark.pipelines.defi import run_pipeline
from defi_features_data_pipeline_spark.pipelines.defi.fixtures import generate
from defi_features_data_pipeline_spark.pipelines.defi.reference_sql import (
    corpus_available,
    run_reference_corpus,
    run_reference_dq,
)
from defi_features_data_pipeline_spark.sources.presto_compat import (
    qualify_schemas,
    translate_presto,
)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from defi_oracle_sql import build_oracle_sql
from test_defi_oracle import INT_COLS, NOW, _close

pytestmark = pytest.mark.skipif(
    not corpus_available(), reason="reference checkout not present"
)


@pytest.fixture(scope="module")
def corpus_lake(spark, tmp_path_factory):
    """Fixture lake with the deliberate tied-max-timestamp price row
    REMOVED: the literal reference SQL fans out on ties
    (KNOWN_LIMITS.md #1, pinned below and in test_divergences.py), so
    the three-way exact comparison needs a tie-free price table."""
    base = str(tmp_path_factory.mktemp("corpus_lake"))
    generate(spark, base)
    p = f"{base}/analytics/features_daily_token_prices"
    pdf = spark.read.parquet(p).toPandas()
    pdf = pdf.sort_values(["address", "timestamp", "price"]).drop_duplicates(
        ["address", "timestamp"], keep="first"
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(p)
    return base


@pytest.fixture(scope="module")
def literal_features(spark, corpus_lake, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("corpus_out"))
    df = run_reference_corpus(spark, corpus_lake, out, now_epoch=NOW)
    return {r["wallet_address"]: r.asDict() for r in df.collect()}


def _diff(got, want):
    mismatches = []
    for w, grow in got.items():
        for c, v in want[w].items():
            if c == "wallet_address":
                continue
            ok = v == grow[c] if c in INT_COLS else _close(grow[c], v)
            if not ok:
                mismatches.append((w[:12], c, grow[c], v))
    return mismatches


def test_literal_corpus_matches_dataframe_port(spark, corpus_lake, literal_features):
    """The reference's own SQL text == the Spark DataFrame port,
    wallet-by-wallet over all 27 features."""
    port = run_pipeline(spark, corpus_lake, now_epoch=NOW)
    want = {r["wallet_address"]: r.asDict() for r in port.collect()}
    assert len(literal_features) > 100
    assert set(literal_features) == set(want)
    assert _diff(literal_features, want) == []


def test_literal_corpus_matches_duckdb_oracle(corpus_lake, literal_features):
    """Same corpus output vs the independent DuckDB oracle — two
    dialect translations of the same reference text agreeing on every
    wallet is the strongest cross-engine evidence available."""
    con = duckdb.connect()
    res = con.execute(build_oracle_sql(corpus_lake, NOW))
    cols = [d[0] for d in res.description]
    want = {row[0]: dict(zip(cols, row)) for row in res.fetchall()}
    assert set(literal_features) == set(want)
    assert _diff(literal_features, want) == []


def test_literal_dq_constraints_all_pass(spark, literal_features):
    """The literal data-quality constraint query runs over the corpus
    output and reports every reference constraint green."""
    rows = {r["constraint_name"]: r["is_fail"] for r in run_reference_dq(spark).collect()}
    assert set(rows) == {
        "total_collateral_eth_values_all_zero",
        "factor_values_all_zero",
        "borrow_counts_values_all_zero",
        "exist_negative_count",
    }
    assert not any(rows.values())


def test_literal_analytics_fans_out_on_price_tie(spark, tmp_path_factory):
    """KNOWN_LIMITS #1 pinned at the corpus level: WITH the tied
    max-timestamp price row present, the literal analytics template
    duplicates the affected event rows (the reference's two-pass as-of
    defect), while the DataFrame port keeps the event key unique."""
    base = str(tmp_path_factory.mktemp("tie_lake"))
    generate(spark, base)  # tie row present
    out = str(tmp_path_factory.mktemp("tie_out"))
    run_reference_corpus(spark, base, out, now_epoch=NOW)
    key = ["block_number", "log_index", "transaction_hash"]
    dup_total = 0
    for ev in ("borrow", "deposit", "repay", "withdraw", "liquidation"):
        t = spark.table(f"analytics_transpose_{ev}_events")
        dup_total += t.count() - t.select(*key).distinct().count()
    assert dup_total > 0, "expected fan-out on the tied price row"


def test_qualify_schemas_keeps_layers_apart():
    """transpose_borrow_events exists in BOTH db_stage_prod and
    db_analytics_prod — the layer mapping must not collapse them."""
    sql = (
        "SELECT * FROM db_stage_prod.transpose_borrow_events a "
        "JOIN db_analytics_prod.transpose_borrow_events b ON a.x = b.x "
        "JOIN db_raw_prod.t r ON r.x = a.x "
        "JOIN db_sandbox_prod.t s ON s.x = a.x"
    )
    out = qualify_schemas(sql)
    assert "stage_transpose_borrow_events" in out
    assert "analytics_transpose_borrow_events" in out
    assert "raw_t" in out and "sandbox_t" in out
    assert "db_" not in out


def test_translate_presto_pins_now(spark):
    """now_epoch injection: current_timestamp becomes a deterministic
    literal, so to_unixtime(current_timestamp) - x sentinels hash-match
    across engines and runs."""
    from defi_features_data_pipeline_spark.sources.presto_compat import (
        register_presto_compat,
    )

    register_presto_compat(spark)
    sql = translate_presto(
        "SELECT cast(to_unixtime(current_timestamp) as decimal) AS now_s",
        now_epoch=NOW,
    )
    assert "current_timestamp" not in sql.lower()
    assert spark.sql(sql).first()["now_s"] == NOW
    # Presto's parenthesized form must not become timestamp_seconds(N)()
    sql2 = translate_presto(
        "SELECT cast(to_unixtime(current_timestamp()) as decimal) AS now_s",
        now_epoch=NOW,
    )
    assert spark.sql(sql2).first()["now_s"] == NOW
