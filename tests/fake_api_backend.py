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


_FLAKY_DIR = "/tmp/spark_graft_flaky_api"


def flaky_fetch(
    event: str, window_start: int, window_end: int, offset: int, limit: int
) -> list[dict]:
    """Fails the first TWO attempts for every (window, offset) call,
    then behaves like ``fetch_fixed``. Attempt state lives on the
    local filesystem (one file per call key) because Python DataSource
    workers are separate processes — tests clear the dir first."""
    import os

    os.makedirs(_FLAKY_DIR, exist_ok=True)
    key = os.path.join(_FLAKY_DIR, f"{event}_{window_start}_{offset}")
    attempts = 0
    if os.path.exists(key):
        with open(key) as f:
            attempts = int(f.read() or 0)
    with open(key, "w") as f:
        f.write(str(attempts + 1))
    if attempts < 2:
        raise ConnectionError(f"synthetic transient failure #{attempts + 1}")
    return fetch_fixed(event, window_start, window_end, offset, limit)


def always_failing_fetch(
    event: str, window_start: int, window_end: int, offset: int, limit: int
) -> list[dict]:
    raise ConnectionError("synthetic permanent failure")
