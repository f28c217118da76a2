"""E2E cross-check: the Spark DeFi pipeline vs an independent DuckDB
port of the reference SQL, over the same raw fixtures. Wallet-by-wallet
comparison of all 27 features (exact for counts/sentinels, relative
tolerance for double aggregates whose summation order differs)."""

import math

import duckdb
import pytest

from defi_features_data_pipeline_spark.pipelines.defi import run_pipeline
from defi_features_data_pipeline_spark.pipelines.defi.fixtures import generate

import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from defi_oracle_sql import build_oracle_sql

NOW = 1_767_225_600
INT_COLS = {
    "unique_borrow_protocol_count",
    "unique_lending_protocol_count",
    "deposit_count",
    "time_since_first_deposit",
    "liquidation_count",
    "time_since_last_liquidated",
    "borrow_count",
    "repay_count",
    "risk_factor_above_threshold_daily_count",
}


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("defi_oracle_lake"))
    generate(spark, base)
    return base


def _close(a, b, rel=1e-6, abs_tol=1e-9):
    if a is None or b is None:
        return a == b
    if isinstance(a, float) or isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=rel, abs_tol=abs_tol)
    return a == b


def test_pipeline_matches_duckdb_oracle(spark, lake):
    features = run_pipeline(spark, lake, now_epoch=NOW)
    got = {r["wallet_address"]: r.asDict() for r in features.collect()}

    con = duckdb.connect()
    res = con.execute(build_oracle_sql(lake, NOW))
    cols = [d[0] for d in res.description]
    want = {row[0]: dict(zip(cols, row)) for row in res.fetchall()}

    assert len(got) > 50, "fixture spine unexpectedly small — vacuous test"
    assert set(got) == set(want), (
        f"wallet spine mismatch: only-spark={len(set(got)-set(want))} "
        f"only-duck={len(set(want)-set(got))}"
    )

    mismatches = []
    for w, grow in got.items():
        wrow = want[w]
        for c in grow:
            if c == "wallet_address":
                continue
            rel = 0 if c in INT_COLS else 1e-6
            if c in INT_COLS:
                ok = grow[c] == wrow[c]
            else:
                ok = _close(grow[c], wrow[c])
            if not ok:
                mismatches.append((w[:12], c, grow[c], wrow[c]))
    assert not mismatches, (
        f"{len(mismatches)} feature mismatches; first 10: {mismatches[:10]}"
    )
