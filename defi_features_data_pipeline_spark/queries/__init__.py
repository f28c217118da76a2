"""Driver-facing query suite: each SURVEY §2 operator as a
(spark_query, duckdb_oracle_sql) pair over the driver's TPC-H-ish
testdata. `__spark_entry__.py` re-exports these."""

from .core import CORE_ORACLES, CORE_QUERIES
from .tpch_shapes import TPCH_ORACLES, TPCH_QUERIES
from .tpch_star import STAR_ORACLES, STAR_QUERIES
from .warehouse import WAREHOUSE_ORACLES, WAREHOUSE_QUERIES

try:  # featureops import extensions' token helpers
    from .featureops import FEATOPS_ORACLES, FEATOPS_QUERIES
except ImportError:  # pragma: no cover
    FEATOPS_QUERIES, FEATOPS_ORACLES = {}, {}

try:  # extensions are added incrementally
    from .extensions import EXT_ORACLES, EXT_QUERIES
except ImportError:  # pragma: no cover
    EXT_QUERIES, EXT_ORACLES = {}, {}

try:  # learned-model operators build on extensions' token helpers
    from .learnops import LEARNOPS_ORACLES, LEARNOPS_QUERIES
except ImportError:  # pragma: no cover
    LEARNOPS_QUERIES, LEARNOPS_ORACLES = {}, {}

try:  # web-curation operators (URL/host canonicalization family)
    from .webops import WEBOPS_ORACLES, WEBOPS_QUERIES
except ImportError:  # pragma: no cover
    WEBOPS_QUERIES, WEBOPS_ORACLES = {}, {}

ALL_QUERIES = {
    **CORE_QUERIES, **TPCH_QUERIES, **STAR_QUERIES,
    **EXT_QUERIES, **FEATOPS_QUERIES, **WAREHOUSE_QUERIES,
    **LEARNOPS_QUERIES, **WEBOPS_QUERIES,
}
ALL_ORACLES = {
    **CORE_ORACLES, **TPCH_ORACLES, **STAR_ORACLES,
    **EXT_ORACLES, **FEATOPS_ORACLES, **WAREHOUSE_ORACLES,
    **LEARNOPS_ORACLES, **WEBOPS_ORACLES,
}

__all__ = ["ALL_QUERIES", "ALL_ORACLES"]
