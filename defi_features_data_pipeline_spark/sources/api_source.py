"""Custom Spark DataSource for paginated event-API ingestion (S1-S4).

The reference extracts lending events by POSTing paginated SQL to a
remote HTTP API — `LIMIT {page} OFFSET {n}` pages of 10k rows inside
bounded time windows, fanned out over a thread pool
(`/root/reference/src/pipelines/raw/defi_events.py:59-92`,
`historical_account_positions.py:54-105`). The Spark-native shape is a
Python DataSource (pyspark.sql.datasource, Spark 4): each bounded time
window is an InputPartition, so the fan-out happens on executors —
1000 windows = 1000 parallel fetch tasks with retry handled by the
scheduler, and the result lands directly in DataFrame land (no pandas
staging hop).

The remote API itself is environment-specific; ``fetch_page`` is a
deterministic synthetic backend standing in for the HTTP call (same
pagination contract: page-size cap, offset, half-open time window).
The backend is the SINGLE replacement seam, and it is mechanically
injectable: pass ``.option("backend", "your.module:your_fetch")`` and
every InputPartition resolves that function ON THE EXECUTOR (import by
dotted path — the spec string pickles, a closure wouldn't), so a real
HTTP client drops in without touching reader/partition logic.
``tests/test_operators.py::test_api_source_backend_seam`` proves the
claim with a fake backend.
"""

from __future__ import annotations

import hashlib
import importlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

PAGE_SIZE = 10_000  # EXTRACTION_PAGINATION_SIZE (`config/settings.toml:21`)
WINDOW_SECONDS = 86_400  # one partition per day of events


def fetch_page(
    event: str, window_start: int, window_end: int, offset: int, limit: int
) -> list[dict]:
    """Synthetic stand-in for the remote paginated query. Deterministic
    in (event, window, offset): ~120 events/day, stable ids/wallets."""
    per_window = 120
    total = per_window if window_end - window_start >= WINDOW_SECONDS else 0
    rows = []
    for i in range(offset, min(offset + limit, total)):
        seed = hashlib.md5(f"{event}|{window_start}|{i}".encode()).hexdigest()
        rows.append(
            {
                "block_number": window_start // 12 + i,
                "transaction_hash": "0x" + seed + seed[:32],
                "timestamp": window_start + (i * WINDOW_SECONDS) // per_window,
                "protocol_name": "aave" if int(seed[0], 16) % 2 else "compound",
                "category": event,
                "sender_address": "0x" + seed[:40],
                "quantity": float(int(seed[:8], 16)),
            }
        )
    return rows


DEFAULT_BACKEND = f"{__name__}:fetch_page"


def _resolve_backend(spec: str):
    """Import ``module.path:function`` — called in the executor task so
    the worker process does its own import (cloudpickle would serialize
    a driver-side function by reference anyway; the explicit spec makes
    the seam visible and configurable from SQL/option land)."""
    mod_name, _, fn_name = spec.partition(":")
    return getattr(importlib.import_module(mod_name), fn_name)


class _WindowPartition(InputPartition):
    def __init__(self, event: str, start: int, end: int):
        self.event = event
        self.start = start
        self.end = end


class LendingEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.event = options.get("event", "borrow")
        self.start = int(options["start"])
        self.end = int(options["end"])
        self.backend = options.get("backend", DEFAULT_BACKEND)

    def partitions(self):
        return [
            _WindowPartition(self.event, s, min(s + WINDOW_SECONDS, self.end))
            for s in range(self.start, self.end, WINDOW_SECONDS)
        ]

    def read(self, partition: _WindowPartition) -> Iterator[tuple]:
        fetch = _resolve_backend(self.backend)
        offset = 0
        while True:  # keyset/offset pagination inside the window (S1/S3)
            page = fetch(
                partition.event, partition.start, partition.end, offset, PAGE_SIZE
            )
            for r in page:
                yield (
                    r["block_number"],
                    r["transaction_hash"],
                    r["timestamp"],
                    r["protocol_name"],
                    r["category"],
                    r["sender_address"],
                    r["quantity"],
                )
            if len(page) < PAGE_SIZE:
                break
            offset += PAGE_SIZE


class LendingEventsAPISource(DataSource):
    """``spark.read.format("lending_events_api")`` — options:
    event, start (epoch s), end (epoch s)."""

    @classmethod
    def name(cls) -> str:
        return "lending_events_api"

    def schema(self) -> str:
        return (
            "block_number long, transaction_hash string, timestamp long,"
            " protocol_name string, category string, sender_address string,"
            " quantity double"
        )

    def reader(self, schema) -> LendingEventsReader:
        return LendingEventsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(LendingEventsAPISource)
