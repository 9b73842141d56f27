"""Central query registry: name -> (spark_fn, oracle_sql | None).

Single source of truth consumed by ``__spark_entry__.py`` (driver
contract), ``bench.py`` (headline suite), and the differential tests.
Each spark_fn is ``(spark, sf_dir) -> DataFrame``; oracle_sql is ANSI
SQL DuckDB runs against the same parquet views (None => driver records
the weaker rows-only check — used only where results are inherently
hash-dependent or probabilistic).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import (
    analytics,
    arrays,
    core,
    dedup,
    joins,
    multimodal,
    similarity,
    text,
    timeseries,
    tpch_extra,
)
from .shipping import ensure_package_on_workers
from .sources import storage
from .streaming import windows as streaming_windows

# Registration order == driver correctness-check order (the driver
# verifies the first N registry entries per round). Round 1 proved
# core/joins/tpch green, so round 2 fronts the families the driver has
# not yet reached: dedup, similarity, multimodal, text, timeseries,
# streaming, arrays, storage.
_MODULES = (
    dedup,
    similarity,
    multimodal,
    text,
    timeseries,
    streaming_windows,
    arrays,
    storage,
    core,
    joins,
    tpch_extra,
    analytics,
)

REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}
for _m in _MODULES:
    for _name, _pair in _m.QUERIES.items():
        if _name in REGISTRY:
            raise ValueError(f"duplicate query name {_name!r}")
        REGISTRY[_name] = _pair


def _shipped(fn: Callable[[SparkSession, str], DataFrame]):
    """Wrap a query so the package reaches Python workers first.

    Pandas-UDF closures reference module-level helpers that workers
    re-import by name (see shipping.py); shipping must happen before
    the first UDF-bearing job regardless of the caller's cwd/sys.path.
    """

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_package_on_workers(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _shipped(fn) for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql.strip() for name, (_, sql) in REGISTRY.items() if sql is not None}
