"""Event-type configuration table.

Mirrors the column remapping in
`/root/reference/src/pipelines/analytics/defi_events.py:142-149`:
liquidations price/meter the *liquidated* token and are keyed by the
liquidated account rather than the sender.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class EventConfig:
    name: str
    token_column: str
    quantity_column: str
    index_column: str


EVENTS = {
    name: EventConfig(name, "token_address", "quantity", "sender_address")
    for name in ("borrow", "deposit", "repay", "withdraw")
}
EVENTS["liquidation"] = EventConfig(
    "liquidation", "liquidated_token_address", "quantity_liquidated", "account_address"
)

ZERO_ADDRESS = "0x" + "0" * 40
PRICE_LOOKBACK_SECONDS = 86400 * 7  # transformations.sql:9
PROTOCOLS = ("aave-v2-eth", "compound-v2-eth")
NUMERAIRE_MARKETS = ("Aave interest bearing WETH", "Compound Ether")
