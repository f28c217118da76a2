"""DuckDB oracle for the full DeFi pipeline: an independent port of the
reference's SQL (Presto → DuckDB) running raw fixtures → 27-column
defi_features. Used by tests/test_defi_oracle.py to cross-check the
Spark pipeline end to end.

Dialect/semantic notes:
- ``to_unixtime(ts)`` → ``CAST(epoch(ts) AS BIGINT)``.
- ``to_unixtime(current_timestamp)`` → the injected ``{now}``.
- As-of price ties: the reference's MAX+join-back fans out; both our
  Spark engine and this oracle pick max price among ties
  (ORDER BY ts DESC, price DESC LIMIT 1) — SURVEY §7.3.2.
"""

EVENT_COLS = {
    "borrow": ("token_address", "quantity", "sender_address"),
    "deposit": ("token_address", "quantity", "sender_address"),
    "repay": ("token_address", "quantity", "sender_address"),
    "withdraw": ("token_address", "quantity", "sender_address"),
    "liquidation": ("liquidated_token_address", "quantity_liquidated", "account_address"),
}


def _stage_event(lake: str, event: str) -> str:
    extra = (
        "lower(liquidated_token_address) AS liquidated_token_address,"
        " lower(liquidator_address) AS liquidator_address, quantity_liquidated,"
        if event == "liquidation"
        else ""
    )
    return f"""
stage_{event} AS (
  SELECT block_number, log_index, transaction_hash, timestamp,
         CAST(epoch(timestamp) AS BIGINT) AS epoch_timestamp,
         protocol_name, contract_version,
         lower(market_address) AS market_address,
         lower(token_address) AS token_address,
         {extra}
         category, lower(account_address) AS account_address, quantity,
         lower(sender_address) AS sender_address, year, month
  FROM read_parquet('{lake}/raw/transpose_{event}_events/*.parquet')
)"""


def _analytics_event(event: str) -> str:
    token, qty, index_col = EVENT_COLS[event]
    return f"""
analytics_{event} AS (
  SELECT tb.*, tm.decimals AS token_decimal,
         (SELECT tp.price FROM tp
           WHERE tp.address = tb.{token}
             AND tp.timestamp BETWEEN tb.epoch_timestamp - 604800 AND tb.epoch_timestamp
           ORDER BY tp.timestamp DESC, tp.price DESC LIMIT 1) AS price,
         CASE WHEN tb.{token} = '0x0000000000000000000000000000000000000000'
              THEN tb.{qty} / power(10, tm.decimals)
              ELSE (tb.{qty} / power(10, tm.decimals)) *
                   (SELECT tp.price FROM tp
                     WHERE tp.address = tb.{token}
                       AND tp.timestamp BETWEEN tb.epoch_timestamp - 604800 AND tb.epoch_timestamp
                     ORDER BY tp.timestamp DESC, tp.price DESC LIMIT 1)
         END AS quantity_in_eth,
         tb.{index_col} AS index_address
  FROM stage_{event} tb
  JOIN tm ON tm.contract_address = tb.{token}
  WHERE tm.decimals > 0
    AND NOT EXISTS (SELECT 1 FROM ttd WHERE ttd.contract_address = tb.{token})
)"""


HF_CASE = """
CASE
  WHEN coalesce({b}.total_borrow_balance, 0) = 0 THEN 1000000
  WHEN ({l}.health_factor_numerator / {b}.total_borrow_balance = 0) AND {b}.total_borrow_balance < .000001 THEN 1000000
  WHEN ({l}.health_factor_numerator / {b}.total_borrow_balance = 0) AND {b}.total_borrow_balance > .000001 THEN .000001
  WHEN {l}.health_factor_numerator / {b}.total_borrow_balance = 0 THEN .000001
  WHEN {l}.health_factor_numerator / {b}.total_borrow_balance < .000001 THEN .000001
  ELSE {l}.health_factor_numerator / {b}.total_borrow_balance
END
"""


def _historical_leg(protocol: str, tag: str) -> str:
    return f"""
hist_{tag} AS (
  SELECT sender_address,
    CASE WHEN COUNT(*) = 1 THEN avg(health_factor)
         ELSE AVG(CASE WHEN health_factor <> 1000000 THEN health_factor END) END AS avg_health_factor,
    avg(1/health_factor) AS historical_average_risk_factor,
    avg(weighted_risk_factor) AS historical_weighted_avg_risk_factor,
    min(health_factor) AS historical_min_health_factor,
    1/min(health_factor) AS historical_max_risk_factor,
    avg(misc_available_borrows_eth) AS misc_avg_available_borrows_eth,
    avg(misc_total_collateral_eth) AS misc_avg_total_collateral_eth
  FROM (
    SELECT b.sender_address, hf.block_number AS block_number_hf, hf.health_factor,
           hf.weighted_risk_factor, hf.misc_available_borrows_eth, hf.misc_total_collateral_eth
    FROM (SELECT DISTINCT sender_address, account_address FROM analytics_borrow) b
    LEFT JOIN account_health_factor hf ON b.account_address = hf.account
    WHERE protocol = '{protocol}'
    UNION
    SELECT b.sender_address, hf.block_number, hf.health_factor,
           hf.weighted_risk_factor, hf.misc_available_borrows_eth, hf.misc_total_collateral_eth
    FROM (SELECT DISTINCT sender_address, account_address FROM analytics_borrow) b
    LEFT JOIN account_health_factor hf ON b.sender_address = hf.account
    WHERE protocol = '{protocol}'
  )
  GROUP BY 1
)"""


def _threshold_leg(protocol: str, tag: str) -> str:
    # two-role OR join expressed as two equi-legs (same rewrite as the engine)
    return f"""
thr_{tag} AS (
  SELECT s.sender_address, coalesce(c.historical_count_above_threshold, 0) AS historical_count_above_threshold
  FROM (SELECT DISTINCT sender_address FROM analytics_borrow) s
  LEFT JOIN (
    SELECT sender_address, COUNT(DISTINCT hf_block) AS historical_count_above_threshold
    FROM (
      SELECT b.sender_address, hf.block_number AS hf_block
      FROM (SELECT sender_address, account_address FROM analytics_borrow) b
      JOIN account_health_factor hf
        ON b.account_address = hf.account AND hf.health_factor < 1.2 AND hf.protocol = '{protocol}'
      UNION ALL
      SELECT b.sender_address, hf.block_number
      FROM (SELECT sender_address, account_address FROM analytics_borrow) b
      JOIN account_health_factor hf
        ON b.sender_address = hf.account AND hf.health_factor < 1.2 AND hf.protocol = '{protocol}'
    ) GROUP BY sender_address
  ) c ON c.sender_address = s.sender_address
)"""


def _current_hf_leg(protocol: str, tag: str) -> str:
    hf = HF_CASE.format(l="lt", b="bt")
    return f"""
cur_borrow_{tag} AS (
  SELECT account, sum(balance_in_usd) AS total_borrow_balance,
         sum(balance_in_eth) AS total_borrow_balance_eth
  FROM current_market_data_and_positions
  WHERE protocol = '{protocol}' AND side = 'BORROWER' GROUP BY account
),
cur_lend_{tag} AS (
  SELECT account, sum(balance_in_usd * liquidation_threshold) AS health_factor_numerator,
         sum(balance_in_eth * liquidation_threshold) AS misc_available_borrows_eth_collateral,
         sum(balance_in_eth) AS misc_total_collateral_eth
  FROM current_market_data_and_positions
  WHERE protocol = '{protocol}' AND side = 'LENDER' AND is_collateral = True GROUP BY account
),
cur_hf_{tag} AS (
  SELECT lt.account, lt.health_factor_numerator, lt.misc_total_collateral_eth,
         bt.total_borrow_balance_eth,
         {hf} AS health_factor,
         CASE WHEN bt.total_borrow_balance_eth IS NULL THEN lt.misc_available_borrows_eth_collateral
              ELSE lt.misc_available_borrows_eth_collateral - bt.total_borrow_balance_eth
         END AS misc_available_borrows_eth,
         CASE WHEN bt.total_borrow_balance_eth IS NULL THEN 0
              ELSE bt.total_borrow_balance_eth * (1/({hf}))
         END AS weighted_risk_factor
  FROM cur_lend_{tag} lt LEFT JOIN cur_borrow_{tag} bt ON bt.account = lt.account
)"""


def build_oracle_sql(lake: str, now: int) -> str:
    stages = ",".join(_stage_event(lake, e) for e in EVENT_COLS)
    analytics = ",".join(_analytics_event(e) for e in EVENT_COLS)
    hist_hf = HF_CASE.format(l="lending_table", b="borrow_table")
    return f"""
WITH
{stages},
stage_md AS (
  SELECT DISTINCT liquidationthreshold AS liquidation_threshold, name,
         inputtokenpriceusd AS input_token_price_usd, lower(id) AS id,
         inputtoken.decimals AS decimals, protocol,
         CAST(block_number AS BIGINT) AS block_number,
         CAST(block_timestamp AS BIGINT) AS block_timestamp
  FROM read_parquet('{lake}/raw/the_graph_historical_market_data/*.parquet')
),
stage_ap AS (
  SELECT DISTINCT CAST(balance AS DOUBLE) AS balance, id,
         CAST(iscollateral AS BOOLEAN) AS is_collateral,
         market.name AS market, lower(market.id) AS market_id, side,
         lower(account.id) AS account, CAST(blocknumber AS BIGINT) AS block_number,
         protocol, CAST(block_timestamp AS BIGINT) AS block_timestamp
  FROM read_parquet('{lake}/raw/the_graph_historical_account_positions/*.parquet')
),
tm AS (SELECT * FROM read_parquet('{lake}/stage/ethereum_tokens_metadata/*.parquet')),
ttd AS (SELECT * FROM read_parquet('{lake}/sandbox/defi_events_tokens_to_drop/*.parquet')),
tp AS (SELECT * FROM read_parquet('{lake}/analytics/features_daily_token_prices/*.parquet')),
test_wallets AS (SELECT lower(wallet_address) AS wallet_address
                 FROM read_parquet('{lake}/sandbox/test_set_wallet_addresses/*.parquet')),
{analytics},
-- market x positions merge (historical_market_data_and_account_positions.py:37-80)
merged_positions AS (
  SELECT ap.balance,
         (ap.balance * md.input_token_price_usd) / power(10, md.decimals) AS balance_in_usd,
         CASE WHEN (ap.balance * md.input_token_price_usd) / power(10, md.decimals) = 0.0
                   OR mdp.input_token_price_usd = 0.0 THEN 0.0
              ELSE (1 / mdp.input_token_price_usd) *
                   ((ap.balance * md.input_token_price_usd) / power(10, md.decimals))
         END AS balance_in_eth,
         ap.id, ap.is_collateral, ap.market_id, ap.side, ap.account,
         md.liquidation_threshold * 0.01 AS liquidation_threshold,
         ap.protocol, ap.block_number, ap.block_timestamp
  FROM stage_ap ap
  JOIN stage_md md ON md.id = ap.market_id AND md.block_number = ap.block_number
  JOIN (SELECT input_token_price_usd, block_number, protocol FROM stage_md
        WHERE name IN ('Aave interest bearing WETH', 'Compound Ether')) mdp
    ON mdp.block_number = ap.block_number AND mdp.protocol = ap.protocol
),
-- account health factor (view_defi_historical_health_and_risk_factor.sql:385-442)
borrow_table AS (
  SELECT account, block_number, sum(balance_in_usd) AS total_borrow_balance,
         sum(balance_in_eth) AS total_borrow_balance_eth, protocol
  FROM merged_positions WHERE side = 'BORROWER' GROUP BY account, block_number, protocol
),
lending_table AS (
  SELECT account, block_number,
         sum(balance_in_usd * liquidation_threshold) AS health_factor_numerator,
         sum(balance_in_eth * liquidation_threshold) AS misc_available_borrows_eth_collateral,
         sum(balance_in_eth) AS misc_total_collateral_eth, protocol
  FROM merged_positions WHERE side = 'LENDER' AND is_collateral = True
  GROUP BY account, block_number, protocol
),
account_health_factor AS (
  SELECT lending_table.account, lending_table.block_number,
         lending_table.health_factor_numerator, lending_table.misc_total_collateral_eth,
         borrow_table.total_borrow_balance_eth,
         {hist_hf} AS health_factor,
         COALESCE(CASE WHEN borrow_table.total_borrow_balance_eth IS NULL
                       THEN lending_table.misc_available_borrows_eth_collateral
                       ELSE lending_table.misc_available_borrows_eth_collateral - borrow_table.total_borrow_balance_eth
                  END, 0) AS misc_available_borrows_eth,
         CASE WHEN borrow_table.total_borrow_balance_eth IS NULL THEN 0
              ELSE borrow_table.total_borrow_balance_eth * (1/({hist_hf}))
         END AS weighted_risk_factor,
         lending_table.protocol
  FROM lending_table
  LEFT JOIN borrow_table ON borrow_table.account = lending_table.account
    AND borrow_table.block_number = lending_table.block_number
),
{_historical_leg("aave-v2-eth", "aave")},
{_historical_leg("compound-v2-eth", "compound")},
hist_merged AS (
  SELECT COALESCE(c.sender_address, a.sender_address) AS sender_address,
         COALESCE(c.historical_average_risk_factor, 0) AS rf_c,
         COALESCE(a.historical_average_risk_factor, 0) AS rf_a,
         COALESCE(c.historical_weighted_avg_risk_factor, 0) AS wrf_c,
         COALESCE(a.historical_weighted_avg_risk_factor, 0) AS wrf_a,
         COALESCE(c.historical_max_risk_factor, 0) AS mrf_c,
         COALESCE(a.historical_max_risk_factor, 0) AS mrf_a,
         COALESCE(c.misc_avg_available_borrows_eth, 0) AS ab_c,
         COALESCE(a.misc_avg_available_borrows_eth, 0) AS ab_a,
         COALESCE(c.misc_avg_total_collateral_eth, 0) AS tc_c,
         COALESCE(a.misc_avg_total_collateral_eth, 0) AS tc_a
  FROM hist_compound c FULL OUTER JOIN hist_aave a ON a.sender_address = c.sender_address
),
hist_features AS (
  SELECT DISTINCT sender_address,
         COALESCE(greatest(mrf_c, mrf_a), 0) AS historical_max_risk_factor,
         COALESCE(tc_c + tc_a, 0) AS misc_avg_total_collateral_eth,
         COALESCE(ab_c + ab_a, 0) AS misc_avg_available_borrows_eth,
         CASE WHEN wrf_a = 0 AND wrf_c != 0 THEN wrf_c
              WHEN wrf_c = 0 AND wrf_a != 0 THEN wrf_a
              ELSE (wrf_c + wrf_a) / 2 END AS historical_weighted_avg_risk_factor,
         CASE WHEN rf_a = 0 AND rf_c != 0 THEN rf_c
              WHEN rf_c = 0 AND rf_a != 0 THEN rf_a
              ELSE (rf_c + rf_a) / 2 END AS historical_average_risk_factor
  FROM hist_merged
),
{_threshold_leg("aave-v2-eth", "aave")},
{_threshold_leg("compound-v2-eth", "compound")},
thr_features AS (
  SELECT DISTINCT COALESCE(c.sender_address, a.sender_address) AS sender_address,
         COALESCE(COALESCE(c.historical_count_above_threshold, 0)
                  + COALESCE(a.historical_count_above_threshold, 0), 0) AS historical_count_above_threshold
  FROM thr_compound c FULL OUTER JOIN thr_aave a ON a.sender_address = c.sender_address
),
-- current health factor stack (view_defi_current_health_factor_features.sql)
cur_positions AS (
  SELECT lower(account) AS account, side, CAST(is_collateral AS BOOLEAN) AS is_collateral,
         lower(market_id) AS market_id, CAST(balance AS DOUBLE) AS balance, protocol
  FROM read_parquet('{lake}/raw/the_graph_current_collateral_positions/*.parquet')
  WHERE lower(account) IN (SELECT wallet_address FROM test_wallets)
),
last_market_data AS (
  SELECT name, max(block_number) AS max_block_number FROM stage_md GROUP BY name
),
current_market_data AS (
  SELECT hmd.id, hmd.input_token_price_usd, hmd.decimals,
         hmd.liquidation_threshold * .01 AS liquidation_threshold, hmd.protocol
  FROM stage_md hmd JOIN last_market_data lmd
    ON lmd.name = hmd.name AND hmd.block_number >= lmd.max_block_number
),
current_market_data_by_protocol AS (
  SELECT hmd.input_token_price_usd, hmd.protocol
  FROM stage_md hmd JOIN last_market_data lmd ON lmd.name = hmd.name
  WHERE hmd.name IN ('Aave interest bearing WETH', 'Compound Ether')
    AND hmd.block_number >= lmd.max_block_number
),
current_market_data_and_positions AS (
  SELECT cmd.id, cmd.input_token_price_usd, cmd.liquidation_threshold,
         (cp.balance * cmd.input_token_price_usd) / power(10, cmd.decimals) AS balance_in_usd,
         (1 / cmdp.input_token_price_usd) *
           ((cp.balance * cmd.input_token_price_usd) / power(10, cmd.decimals)) AS balance_in_eth,
         cp.is_collateral, cp.side, cp.account, cp.protocol
  FROM cur_positions cp
  JOIN current_market_data cmd ON cmd.id = cp.market_id
  JOIN current_market_data_by_protocol cmdp ON cmdp.protocol = cp.protocol
),
{_current_hf_leg("aave-v2-eth", "aave")},
{_current_hf_leg("compound-v2-eth", "compound")},
cur_merged AS (
  SELECT COALESCE(c.account, a.account) AS account,
         COALESCE(a.health_factor, 1000000) AS health_factor_aave,
         a.weighted_risk_factor AS weighted_risk_factor_aave,
         COALESCE(c.health_factor, 1000000) AS health_factor_compound,
         COALESCE(c.weighted_risk_factor, 0) AS weighted_risk_factor_compound,
         COALESCE(a.misc_total_collateral_eth, 0) AS misc_total_collateral_eth_aave,
         COALESCE(c.misc_total_collateral_eth, 0) AS misc_total_collateral_eth_compound,
         COALESCE(a.misc_available_borrows_eth, 0) AS misc_available_borrows_eth_aave,
         COALESCE(c.misc_available_borrows_eth, 0) AS misc_available_borrows_eth_compound,
         COALESCE(a.total_borrow_balance_eth, 0) AS total_borrow_balance_eth_aave,
         COALESCE(c.total_borrow_balance_eth, 0) AS total_borrow_balance_eth_compound
  FROM cur_hf_compound c FULL OUTER JOIN cur_hf_aave a ON a.account = c.account
),
cur_transformed AS (
  SELECT account,
         CASE WHEN LEAST(health_factor_compound, health_factor_aave) > 1000000 THEN 1000000
              ELSE LEAST(health_factor_compound, health_factor_aave) END AS current_health_factor,
         misc_total_collateral_eth_compound + misc_total_collateral_eth_aave AS total_collateral_eth,
         misc_available_borrows_eth_compound + misc_available_borrows_eth_aave AS available_borrows_eth,
         weighted_risk_factor_compound + weighted_risk_factor_aave AS weighted_risk_factor,
         total_borrow_balance_eth_compound + total_borrow_balance_eth_aave AS total_borrow_balance_eth,
         1 / LEAST(health_factor_compound, health_factor_aave) AS current_risk_factor,
         CASE WHEN 1 / LEAST(health_factor_compound, health_factor_aave) > 1000000 THEN 1000000
              ELSE 1 / (CASE WHEN LEAST(health_factor_compound, health_factor_aave) > 1000000
                             THEN 1000000 ELSE LEAST(health_factor_compound, health_factor_aave) END)
         END AS borrow_current_risk_factor_capped
  FROM cur_merged
),
cur_hf_features AS (
  SELECT account, current_health_factor,
         SUM(total_collateral_eth) AS misc_total_collateral_eth,
         SUM(available_borrows_eth) AS misc_available_borrows_eth,
         SUM(weighted_risk_factor) AS weighted_risk_factor,
         SUM(total_borrow_balance_eth) AS total_borrow_balance_eth,
         COALESCE(SUM(weighted_risk_factor) / NULLIF(SUM(total_borrow_balance_eth), 0), 0) AS borrow_weighted_avg_risk_factor,
         current_risk_factor, borrow_current_risk_factor_capped
  FROM cur_transformed
  GROUP BY account, current_health_factor, current_risk_factor, borrow_current_risk_factor_capped
),
-- per-wallet aggregate views
spine AS (
  SELECT DISTINCT wallet_address FROM (
    SELECT sender_address AS wallet_address FROM analytics_borrow
    UNION ALL SELECT account_address FROM analytics_borrow
    UNION ALL SELECT sender_address FROM analytics_deposit
    UNION ALL SELECT account_address FROM analytics_deposit
    UNION ALL SELECT sender_address FROM analytics_withdraw
    UNION ALL SELECT account_address FROM analytics_withdraw
    UNION ALL SELECT sender_address FROM analytics_liquidation
    UNION ALL SELECT account_address FROM analytics_liquidation
    UNION ALL SELECT sender_address FROM analytics_repay
    UNION ALL SELECT account_address FROM analytics_repay
  )
),
borrow_f AS (
  SELECT sender_address, COALESCE(sum(abs(quantity_in_eth)), 0) AS loan_amount_eth_sum,
         COALESCE(avg(abs(quantity_in_eth)), 0) AS loan_amount_eth_avg,
         COALESCE(count(DISTINCT transaction_hash), 0) AS borrow_total_borrows
  FROM analytics_borrow GROUP BY sender_address
),
repay_f AS (
  SELECT sender_address, COALESCE(sum(abs(quantity_in_eth)), 0) AS borrow_total_eth_repaid_sum,
         COALESCE(avg(abs(quantity_in_eth)), 0) AS borrow_total_eth_repaid_avg,
         COALESCE(count(DISTINCT transaction_hash), 0) AS borrow_total_repays
  FROM analytics_repay GROUP BY sender_address
),
redeems_f AS (
  SELECT sender_address, COALESCE(sum(abs(quantity_in_eth)), 0) AS lending_sum_redeems
  FROM analytics_withdraw GROUP BY sender_address
),
lending_f AS (
  SELECT sender_address, COALESCE(COUNT(DISTINCT transaction_hash), 0) AS lending_total_deposits,
         {now} - min(epoch_timestamp) AS lending_time_since_first_lending,
         COALESCE(sum(abs(quantity_in_eth)), 0) AS total_deposits_in_eth
  FROM analytics_deposit GROUP BY sender_address
),
liq_f AS (
  SELECT account_address,
         COALESCE(COUNT(DISTINCT transaction_hash), 0) AS liquidation_total_liquidations,
         COALESCE(COALESCE(sum(abs(quantity_in_eth)), 0), 0) AS liquidation_total_amount_eth,
         COALESCE({now} - MAX(epoch_timestamp), 999999999) AS liquidation_time_since_last_liquidated
  FROM analytics_liquidation GROUP BY account_address
),
credit_mix AS (
  SELECT s.wallet_address AS sender_address,
         COALESCE(b.c, 0) AS credit_mix_count_borrow_protocol,
         COALESCE(d.c, 0) AS credit_mix_count_lending_protocol,
         greatest(COALESCE(b.c, 0), COALESCE(d.c, 0), COALESCE(w.c, 0), COALESCE(r.c, 0)) AS credit_mix_count_protocol
  FROM spine s
  LEFT JOIN (SELECT sender_address, COUNT(DISTINCT protocol_name) AS c FROM analytics_borrow GROUP BY 1) b ON b.sender_address = s.wallet_address
  LEFT JOIN (SELECT sender_address, COUNT(DISTINCT protocol_name) AS c FROM analytics_deposit GROUP BY 1) d ON d.sender_address = s.wallet_address
  LEFT JOIN (SELECT sender_address, COUNT(DISTINCT protocol_name) AS c FROM analytics_withdraw GROUP BY 1) w ON w.sender_address = s.wallet_address
  LEFT JOIN (SELECT sender_address, COUNT(DISTINCT protocol_name) AS c FROM analytics_repay GROUP BY 1) r ON r.sender_address = s.wallet_address
),
pairs AS (SELECT DISTINCT sender_address, account_address FROM analytics_borrow),
liq_fanin AS (
  SELECT sender_address,
         COALESCE(SUM(ltl), 0) AS liquidation_total_liquidations,
         COALESCE(SUM(lta), 0) AS liquidation_total_amount_eth,
         COALESCE(MIN(lts), 0) AS liquidation_time_since_last_liquidated
  FROM (
    SELECT d.sender_address,
           COALESCE(l.liquidation_total_liquidations, 0) AS ltl,
           COALESCE(l.liquidation_total_amount_eth, 0) AS lta,
           COALESCE(l.liquidation_time_since_last_liquidated, 0) AS lts
    FROM pairs d LEFT JOIN liq_f l ON d.account_address = l.account_address
  ) GROUP BY sender_address
),
chf_fanin AS (
  SELECT sender_address,
         COALESCE(SUM(misc_total_collateral_eth), 0) AS misc_total_collateral_eth,
         COALESCE(SUM(misc_available_borrows_eth), 0) AS misc_available_borrows_eth,
         COALESCE(MAX(current_risk_factor), 0) AS current_risk_factor,
         COALESCE(MAX(borrow_weighted_avg_risk_factor), 0) AS borrow_weighted_avg_risk_factor,
         COALESCE(MAX(borrow_current_risk_factor_capped), 0) AS borrow_current_risk_factor_capped
  FROM (
    SELECT d.sender_address, chr.misc_total_collateral_eth, chr.misc_available_borrows_eth,
           chr.current_risk_factor, chr.borrow_weighted_avg_risk_factor, chr.borrow_current_risk_factor_capped
    FROM pairs d LEFT JOIN cur_hf_features chr ON d.account_address = chr.account
  ) GROUP BY sender_address
),
assembled AS (
  SELECT s.wallet_address,
         COALESCE(rf.borrow_total_eth_repaid_sum, 0) AS borrow_total_eth_repaid_sum,
         COALESCE(rf.borrow_total_eth_repaid_avg, 0) AS borrow_total_eth_repaid_avg,
         COALESCE(rf.borrow_total_repays, 0) AS borrow_total_repays,
         COALESCE(bf.loan_amount_eth_sum, 0) AS loan_amount_eth_sum,
         COALESCE(bf.loan_amount_eth_avg, 0) AS loan_amount_eth_avg,
         COALESCE(bf.borrow_total_borrows, 0) AS borrow_total_borrows,
         COALESCE(cm.credit_mix_count_borrow_protocol, 0) AS credit_mix_count_borrow_protocol,
         COALESCE(cm.credit_mix_count_lending_protocol, 0) AS credit_mix_count_lending_protocol,
         COALESCE(cm.credit_mix_count_protocol, 0) AS credit_mix_count_protocol,
         COALESCE(rd.lending_sum_redeems, 0) AS lending_sum_redeems,
         COALESCE(lf.lending_total_deposits, 0) AS lending_total_deposits,
         COALESCE(lf.lending_time_since_first_lending, 0) AS lending_time_since_first_lending,
         COALESCE(lf.total_deposits_in_eth, 0) AS total_deposits_in_eth,
         COALESCE(hf.historical_max_risk_factor, 0) AS historical_max_risk_factor,
         COALESCE(hf.misc_avg_total_collateral_eth, 0) AS misc_avg_total_collateral_eth,
         COALESCE(hf.misc_avg_available_borrows_eth, 0) AS misc_avg_available_borrows_eth,
         COALESCE(hf.historical_weighted_avg_risk_factor, 0) AS historical_weighted_avg_risk_factor,
         COALESCE(hf.historical_average_risk_factor, 0) AS historical_average_risk_factor,
         COALESCE(tf.historical_count_above_threshold, 0) AS historical_count_above_threshold,
         COALESCE(lq.liquidation_total_liquidations, 0) AS liquidation_total_liquidations,
         COALESCE(lq.liquidation_total_amount_eth, 0) AS liquidation_total_amount_eth,
         COALESCE(lq.liquidation_time_since_last_liquidated, 0) AS liquidation_time_since_last_liquidated,
         COALESCE(ch.misc_total_collateral_eth, 0) AS misc_total_collateral_eth,
         COALESCE(ch.misc_available_borrows_eth, 0) AS misc_available_borrows_eth,
         COALESCE(ch.current_risk_factor, 0) AS current_risk_factor,
         COALESCE(ch.borrow_weighted_avg_risk_factor, 0) AS borrow_weighted_avg_risk_factor,
         COALESCE(ch.borrow_current_risk_factor_capped, 0) AS borrow_current_risk_factor_capped
  FROM spine s
  LEFT JOIN repay_f rf ON s.wallet_address = rf.sender_address
  LEFT JOIN borrow_f bf ON s.wallet_address = bf.sender_address
  LEFT JOIN credit_mix cm ON s.wallet_address = cm.sender_address
  LEFT JOIN redeems_f rd ON s.wallet_address = rd.sender_address
  LEFT JOIN lending_f lf ON s.wallet_address = lf.sender_address
  LEFT JOIN hist_features hf ON s.wallet_address = hf.sender_address
  LEFT JOIN thr_features tf ON s.wallet_address = tf.sender_address
  LEFT JOIN liq_fanin lq ON s.wallet_address = lq.sender_address
  LEFT JOIN chf_fanin ch ON s.wallet_address = ch.sender_address
)
SELECT wallet_address,
       credit_mix_count_borrow_protocol AS unique_borrow_protocol_count,
       credit_mix_count_lending_protocol AS unique_lending_protocol_count,
       misc_total_collateral_eth AS total_collateral_eth,
       current_risk_factor AS risk_factor,
       misc_available_borrows_eth AS total_available_borrows_eth,
       lending_total_deposits AS deposit_count,
       CAST(CASE WHEN lending_time_since_first_lending = 0 THEN 999999999
                 ELSE lending_time_since_first_lending END AS BIGINT) AS time_since_first_deposit,
       total_deposits_in_eth AS deposit_amount_sum_eth,
       liquidation_total_liquidations AS liquidation_count,
       liquidation_total_amount_eth AS liquidation_amount_sum_eth,
       CAST(CASE WHEN liquidation_time_since_last_liquidated = 0 THEN 999999999
                 ELSE liquidation_time_since_last_liquidated END AS BIGINT) AS time_since_last_liquidated,
       lending_sum_redeems AS withdraw_amount_sum_eth,
       loan_amount_eth_sum AS borrow_amount_sum_eth,
       loan_amount_eth_avg AS borrow_amount_avg_eth,
       borrow_total_borrows AS borrow_count,
       borrow_total_eth_repaid_sum AS repay_amount_sum_eth,
       borrow_total_eth_repaid_avg AS repay_amount_avg_eth,
       borrow_total_repays AS repay_count,
       CASE WHEN loan_amount_eth_sum - borrow_total_eth_repaid_sum < 0 THEN 0
            ELSE loan_amount_eth_sum - borrow_total_eth_repaid_sum END AS borrow_repay_diff_eth,
       CASE WHEN lending_sum_redeems - total_deposits_in_eth < 0 THEN 0
            ELSE lending_sum_redeems - total_deposits_in_eth END AS withdraw_deposit_diff_if_positive_eth,
       misc_avg_available_borrows_eth AS total_available_borrows_avg_eth,
       historical_weighted_avg_risk_factor AS avg_weighted_risk_factor,
       historical_average_risk_factor AS avg_risk_factor,
       historical_max_risk_factor AS max_risk_factor,
       historical_count_above_threshold AS risk_factor_above_threshold_daily_count,
       misc_avg_total_collateral_eth AS total_collateral_avg_eth
FROM assembled
"""
