"""A stand-in 'real HTTP client' for the api_source seam test.

Importable by dotted path from executor workers (the seam contract:
``.option("backend", "tests.fake_api_backend:fetch_fixed")``). Returns
content the synthetic default backend can never produce, so the test
proves the injected function — not the default — served the rows.
"""

from __future__ import annotations


def fetch_fixed(
    event: str, window_start: int, window_end: int, offset: int, limit: int
) -> list[dict]:
    """Two fixed rows per window, honouring the pagination contract
    (offset past the end -> empty page terminates the loop)."""
    total = 2
    rows = []
    for i in range(offset, min(offset + limit, total)):
        rows.append(
            {
                "block_number": 42 + i,
                "transaction_hash": f"0xfake{window_start}_{i}",
                "timestamp": window_start + i,
                "protocol_name": "faketocol",
                "category": event,
                "sender_address": "0xseam",
                "quantity": 1.5 * (i + 1),
            }
        )
    return rows
