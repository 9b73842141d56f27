"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the package registry: every operator implemented in
``benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark`` registers
itself with both a PySpark formulation and (where deterministic) a
DuckDB oracle; this module just re-exports the registry in the shape
the driver expects.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import registry as _registry
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.operators.core import (
    flagship_lazy_pipeline,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The main.rs:143-152 lazy pipeline transposed onto lineitem:
    scan -> filter -> groupBy -> aliased means -> sort, one Catalyst
    plan (SURVEY.md §7.2).
    """
    return flagship_lazy_pipeline(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ §7
    extensions). Each callable takes (spark, sf_dir) -> DataFrame."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """Equivalent ANSI SQL per query, runnable by DuckDB on the same
    parquet views. Hash-dependent / probabilistic operators
    (minhash/simhash/LSH, streaming session windows) are intentionally
    absent -> driver records the weaker rows-only check."""
    return _registry.oracle_sql()
