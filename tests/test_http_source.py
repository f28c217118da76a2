"""S1–S4 over a REAL HTTP stack (r9 verdict item 4): the loopback
``SyntheticAPIServer`` backs the DataSource seam on 127.0.0.1, so
offset pagination, keyset pagination, the 5-attempt retry ladder and
the concurrency bound all run over genuine sockets — executors resolve
the stdlib-urllib client from the spec string and POST like the
reference's extractors do. At deployment only the URL changes."""

import pytest
from pyspark.sql import functions as F

from defi_features_data_pipeline_spark.sources.api_source import (
    PAGE_SIZE,
    register,
)
from defi_features_data_pipeline_spark.sources.http_backend import (
    SyntheticAPIServer,
)

START = 1_700_000_000 - (1_700_000_000 % 86_400)


@pytest.fixture(autouse=True)
def _register(spark):
    register(spark)


def _events(spark, backend, days=3, **opts):
    r = (
        spark.read.format("lending_events_api")
        .option("event", "borrow")
        .option("start", START)
        .option("end", START + days * 86_400)
        .option("backend", backend)
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_events_over_http_match_in_process_backend(spark):
    """The wire adds nothing and loses nothing: rows fetched through
    real HTTP equal the in-process seam's rows exactly."""
    from defi_features_data_pipeline_spark.sources.api_source import (
        DEFAULT_BACKEND,
    )

    with SyntheticAPIServer() as srv:
        via_http = sorted(
            _events(spark, srv.events_backend_spec()).collect()
        )
        assert srv.n_requests >= 3  # one per day window minimum
    direct = sorted(_events(spark, DEFAULT_BACKEND).collect())
    assert via_http == direct and len(direct) == 3 * 120


def test_offset_pagination_runs_multiple_pages_over_http(spark):
    """per_window > PAGE_SIZE forces the reader's offset loop through
    real multi-page HTTP: 25k rows/day = 3 pages/window (10k, 10k, 5k),
    terminated by the short page."""
    per_window = PAGE_SIZE * 2 + 5_000
    with SyntheticAPIServer(per_window=per_window) as srv:
        df = _events(spark, srv.events_backend_spec(), days=2)
        assert df.count() == 2 * per_window
        # 3 pages per window x 2 windows
        assert srv.n_requests == 6


def test_keyset_pagination_over_http(spark):
    """S2/S3: block-pinned positions via the keyset cursor — 1700 rows
    per block at a 1000-row page cap = 2 HTTP pages per block, and the
    rows equal the in-process backend's."""
    from defi_features_data_pipeline_spark.sources.api_source import (
        DEFAULT_POSITIONS_BACKEND,
    )

    def read(backend):
        return (
            spark.read.format("graph_positions_api")
            .option("block_start", 18_000_000)
            .option("block_end", 18_000_000 + 3 * 7_200)
            .option("backend", backend)
            .load()
        )

    with SyntheticAPIServer() as srv:
        via_http = sorted(read(srv.positions_backend_spec()).collect())
        assert srv.n_requests == 6  # 2 keyset pages x 3 blocks
    assert via_http == sorted(read(DEFAULT_POSITIONS_BACKEND).collect())
    assert len(via_http) == 3 * 1_700


def test_retry_ladder_recovers_from_injected_500s(spark):
    """Every request 500s twice then succeeds — the reader's 5-attempt
    ladder must absorb it and deliver the complete extract."""
    with SyntheticAPIServer(fail_first=2) as srv:
        df = _events(
            spark, srv.events_backend_spec(), days=2, retry_backoff="0.01"
        )
        assert df.count() == 2 * 120
        # 2 windows x (2 failures + 1 success)
        assert srv.n_requests == 6


def test_persistent_500_fails_loudly(spark):
    """A window that 500s past the retry budget must FAIL the read —
    never ship a silently incomplete extract (the documented divergence
    from the reference's silent block drop)."""
    with SyntheticAPIServer(fail_first=99) as srv:
        with pytest.raises(Exception, match="after 5 attempts"):
            _events(
                spark,
                srv.events_backend_spec(),
                days=1,
                retry_backoff="0.01",
            ).collect()
        assert srv.n_requests == 5  # exactly the 5-attempt ladder


def test_concurrency_bound_measured_on_the_wire(spark):
    """NUMBER_OF_THREADS semantics, asserted by server-side telemetry:
    with max_parallel=2 the peak number of concurrently open HTTP
    requests can never exceed 2, however many executor slots exist."""
    with SyntheticAPIServer() as srv:
        df = _events(
            spark, srv.events_backend_spec(), days=8, max_parallel="2"
        )
        assert df.count() == 8 * 120
        assert srv.n_requests == 8
        assert 1 <= srv.max_in_flight <= 2


def test_http_rows_flow_into_dataframe_ops(spark):
    """The source composes with ordinary DataFrame work (the S1→stage
    path): aggregate over the wire-fetched extract."""
    with SyntheticAPIServer() as srv:
        out = (
            _events(spark, srv.events_backend_spec())
            .groupBy("protocol_name")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    assert sum(r["n"] for r in out) == 3 * 120
    assert {r["protocol_name"] for r in out} <= {"aave", "compound"}
