"""Deterministic DeFi-shaped fixture generator (FIXTURES.md schemas).

Generates the raw-layer inputs the reference ingests from Transpose /
The Graph, seeded (numpy, seed=42) so every run and both engines see
identical data. Raw market data / positions carry NESTED structs
(inputtoken.decimals, market.{id,name}, account.id) exactly like the
Graph responses (`the_graph_historical_market_data.sql:12`,
`the_graph_historical_account_positions.sql:11-14`) so the stage layer
exercises P2 flattening.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from .config import NUMERAIRE_MARKETS, PROTOCOLS, ZERO_ADDRESS

SEED = 42
N_WALLETS = 120
N_TOKENS = 24
N_DAYS = 60
EVENTS_PER_TABLE = 1500
N_MARKETS = 14
BASE_TS = 1_700_000_000  # 2023-11-14 UTC
BASE_BLOCK = 18_000_000


def _addr(rng: np.random.Generator, n: int) -> list[str]:
    return ["0x" + "".join(rng.choice(list("0123456789abcdef"), 40)) for _ in range(n)]


def _hash(rng: np.random.Generator, n: int) -> list[str]:
    return ["0x" + "".join(rng.choice(list("0123456789abcdef"), 64)) for _ in range(n)]


def generate(spark: SparkSession, base_dir: str, scale: float = 1.0) -> dict[str, str]:
    """Write all fixture tables as parquet under ``base_dir/raw/...``;
    returns {table: path}."""
    rng = np.random.default_rng(SEED)
    ev_n = int(EVENTS_PER_TABLE * scale)
    wallets = _addr(rng, N_WALLETS)
    tokens = [ZERO_ADDRESS] + _addr(rng, N_TOKENS - 1)
    drop_tokens = tokens[1:3]  # appear in events; anti-join must remove
    markets = _addr(rng, N_MARKETS)
    market_names = list(NUMERAIRE_MARKETS) + [f"Market {i}" for i in range(N_MARKETS - 2)]
    daily_blocks = [BASE_BLOCK + d * 7200 for d in range(N_DAYS)]
    paths: dict[str, str] = {}

    def write(name: str, pdf: pd.DataFrame, layer: str = "raw") -> None:
        path = f"{base_dir}/{layer}/{name}"
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)
        paths[name] = path

    # --- event tables -----------------------------------------------------
    for event in ("borrow", "deposit", "repay", "withdraw", "liquidation"):
        n = ev_n if event != "liquidation" else int(400 * scale)
        ts = BASE_TS + rng.integers(0, N_DAYS * 86400, n)
        senders = rng.choice(wallets, n)
        # some rows have account != sender (two-role join paths)
        accounts = np.where(rng.random(n) < 0.3, rng.choice(wallets, n), senders)
        tok = rng.choice(tokens, n)
        pdf = pd.DataFrame(
            {
                "block_number": BASE_BLOCK + (ts - BASE_TS) // 12,
                "log_index": rng.integers(0, 300, n),
                "transaction_hash": _hash(rng, n),
                "timestamp": pd.to_datetime(ts, unit="s"),
                "protocol_name": rng.choice(["aave", "compound"], n),
                "contract_version": "v2",
                # mixed case exercises the LOWER() normalization
                "market_address": [m.upper() if i % 7 == 0 else m
                                   for i, m in enumerate(rng.choice(markets, n))],
                "token_address": tok,
                "category": event,
                "account_address": accounts,
                "quantity": np.round(rng.uniform(-5, 50, n), 6) * 10.0 ** 18,
                "sender_address": senders,
                "year": pd.to_datetime(ts, unit="s").year.astype(str),
                "month": pd.to_datetime(ts, unit="s").month.astype(str),
            }
        )
        if event == "liquidation":
            pdf["liquidated_token_address"] = rng.choice(tokens, n)
            pdf["liquidator_address"] = rng.choice(wallets, n)
            pdf["quantity_liquidated"] = np.round(rng.uniform(0, 20, n), 6) * 10.0 ** 18
        write(f"transpose_{event}_events", pdf)

    # --- market data (nested inputtoken struct at raw) ----------------------
    rows = []
    for d in range(N_DAYS):
        for mi, (mid, mname) in enumerate(zip(markets, market_names)):
            proto = PROTOCOLS[mi % 2] if mi >= 2 else PROTOCOLS[mi]
            price = 0.0 if (mi == 5 and d % 11 == 0) else round(
                float(rng.uniform(0.1, 3000)), 6
            )
            rows.append(
                {
                    "liquidationthreshold": round(float(rng.uniform(50, 90)), 2),
                    "name": mname,
                    "inputtokenpriceusd": price,
                    "id": mid,
                    "inputtoken": {"decimals": int(rng.choice([6, 8, 18]))},
                    "protocol": proto,
                    "block_number": daily_blocks[d],
                    "block_timestamp": BASE_TS + d * 86400,
                    # reference-exact raw columns (`historical_market_data
                    # .py:24-26` selects `timestamp AS block_timestamp,
                    # year, month`) so the literal stage SQL runs verbatim
                    "timestamp": pd.Timestamp(BASE_TS + d * 86400, unit="s"),
                    "year": str(pd.Timestamp(BASE_TS + d * 86400, unit="s").year),
                    "month": str(pd.Timestamp(BASE_TS + d * 86400, unit="s").month),
                }
            )
    pdf = pd.DataFrame(rows)
    write("the_graph_historical_market_data", pdf)

    # --- account positions (nested market/account structs at raw) ----------
    rows = []
    pos_id = 0
    for d in range(0, N_DAYS, 2):
        for _ in range(int(90 * scale)):
            mi = int(rng.integers(0, N_MARKETS))
            side = "BORROWER" if rng.random() < 0.45 else "LENDER"
            bal = float(rng.uniform(1e-9, 5.0)) * 10.0 ** 18
            if rng.random() < 0.05:
                bal = float(rng.uniform(1e-13, 1e-9))  # tiny balances → clamp branches
            rows.append(
                {
                    "balance": bal,
                    "id": f"pos-{pos_id}",
                    "iscollateral": bool(rng.random() < 0.8),
                    "market": {
                        "name": market_names[mi],
                        "id": markets[mi],
                    },
                    "side": side,
                    "account": {"id": str(rng.choice(wallets)).upper()},
                    "blocknumber": daily_blocks[d],
                    "protocol": PROTOCOLS[mi % 2] if mi >= 2 else PROTOCOLS[mi],
                    "block_timestamp": BASE_TS + d * 86400,
                    # reference-exact raw columns (`historical_account_
                    # positions.py` selects block_number, timestamp AS
                    # block_timestamp, year, month) for the literal SQL
                    "block_number": daily_blocks[d],
                    "timestamp": pd.Timestamp(BASE_TS + d * 86400, unit="s"),
                    "year": str(pd.Timestamp(BASE_TS + d * 86400, unit="s").year),
                    "month": str(pd.Timestamp(BASE_TS + d * 86400, unit="s").month),
                }
            )
            pos_id += 1
    write("the_graph_historical_account_positions", pd.DataFrame(rows))

    # --- current collateral positions (analytics-shaped, full refresh) -----
    n = 600
    mi = rng.integers(0, N_MARKETS, n)
    write(
        "the_graph_current_collateral_positions",
        pd.DataFrame(
            {
                "balance": rng.uniform(1e-9, 5.0, n) * 10.0 ** 18,
                "id": [f"cpos-{i}" for i in range(n)],
                "is_collateral": rng.random(n) < 0.8,
                "market": [market_names[i] for i in mi],
                "market_id": [markets[i] for i in mi],
                "side": np.where(rng.random(n) < 0.45, "BORROWER", "LENDER"),
                "account": rng.choice(wallets, n),
                "protocol": [PROTOCOLS[i % 2] if i >= 2 else PROTOCOLS[i] for i in mi],
            }
        ),
    )

    # --- ethereum blocks (daily grid source) --------------------------------
    nblocks = N_DAYS * 86400 // 12
    stride = 25  # thin the chain to keep the fixture small
    bn = np.arange(0, nblocks, stride)
    write(
        "ethereum_blocks",
        pd.DataFrame(
            {
                "number": BASE_BLOCK + bn,
                "timestamp": pd.to_datetime(BASE_TS + bn * 12, unit="s"),
            }
        ),
    )

    # --- token metadata (one zero-decimals row → filtered) ------------------
    write(
        "ethereum_tokens_metadata",
        pd.DataFrame(
            {
                "contract_address": tokens,
                "decimals": [18] + [int(rng.choice([6, 8, 18])) for _ in tokens[1:-1]] + [0],
            }
        ),
        layer="stage",
    )

    # --- daily token prices (gaps > 7d for some tokens; duplicate-max ties) -
    rows = []
    for ti, tok in enumerate(tokens):
        if tok == ZERO_ADDRESS:
            continue
        step = 1 if ti % 5 else 9  # every 9th day → as-of window misses
        for d in range(0, N_DAYS, step):
            ts = BASE_TS + d * 86400
            price = round(float(rng.uniform(0.0001, 2.0)), 8)
            rows.append({"address": tok, "timestamp": ts, "price": price})
            if ti == 3 and d == 10:  # duplicate max-timestamp tie (SURVEY §7.3.2)
                rows.append({"address": tok, "timestamp": ts, "price": price + 0.5})
    write("features_daily_token_prices", pd.DataFrame(rows), layer="analytics")

    # --- sandbox tables ------------------------------------------------------
    write(
        "test_set_wallet_addresses",
        pd.DataFrame({"wallet_address": [w.upper() for w in wallets[:40]]}),
        layer="sandbox",
    )
    write(
        "defi_events_tokens_to_drop",
        pd.DataFrame({"contract_address": drop_tokens}),
        layer="sandbox",
    )
    return paths
