"""Per-operator differential tests: every registered oracle query must
hash-match DuckDB on the fixture parquet (the driver's correctness
gate, SURVEY.md §5.2)."""

import pytest

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.registry import REGISTRY

from .helpers import run_differential

ORACLE_QUERIES = sorted(name for name, (_, sql) in REGISTRY.items() if sql is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, sf_dir, name):
    fn, oracle = REGISTRY[name]
    problems = run_differential(spark, sf_dir, fn, oracle)
    assert not problems, f"{name}: " + "; ".join(problems)
