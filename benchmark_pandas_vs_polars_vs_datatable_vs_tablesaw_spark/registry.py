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

# Registration order == driver correctness-check order (the driver
# verifies the first N registry entries per round; N has been 50).
# Rounds 1-2 proved core/joins/tpch then dedup/similarity/multimodal/
# text/timeseries/streaming green. Round 3 fronts (a) the queries the
# driver has NEVER checked (all analytics, all storage, the arrays
# tail, q19-q22) and (b) every entry whose implementation or oracle
# changed after its last green driver row (global_rank rewrites, the
# multimodal feature reshape, the dedup shingle-cap/LSH-candidate
# changes). Everything else keeps module order behind them.
_PRIORITY = (
    # analytics — never driver-checked
    "cube_priority_status",
    "ansi_safe_arithmetic",
    "exact_percentiles_by_group",
    "higher_moments_stats",
    "applyinpandas_zscore",
    "grouping_sets_custom",
    "window_distribution_funcs",
    "approx_quantile_bounds",
    "window_lag_lead",
    "ntile_balance_quartiles",  # also stale: global_rank rewrite
    "corr_covar_stats",
    "histogram_totalprice",
    "approx_distinct_bounds",
    "range_join_discount_bands",
    "salted_skew_agg",
    "sample_modulo_agg",
    "stratified_sample_bounds",
    "string_funcs_suite",
    "date_parts_agg",
    "unpivot_lineitem_measures",
    # storage — never driver-checked
    "bucketed_join_revenue",
    "partition_pruned_scan",
    "dpp_join_pruned_scan",
    "json_roundtrip",
    "orc_roundtrip",
    "parquet_zstd_roundtrip",
    "textfile_roundtrip",
    # arrays tail — never driver-checked
    "map_hof_suite",
    "array_topk_elements",
    "array_dimension_stats",
    # tpch q19-q22 — never driver-checked
    "q19_disjunctive_bands",
    "q20_excess_shippers",
    "q21_last_shippers",
    "q22_sales_opportunity",
    # stale: code or oracle changed after last green driver row
    "q12_priority_shipping",
    "null_handling_suite",
    "sort_asc_rank",
    "sort_desc_rank",
    "multimodal_feature_extract",
    "dedup_embedding_cosine",
    "dedup_ngram_jaccard",
    "dedup_clusters_cc",
    # new in round 3 — need their first driver row
    "mips_topk",
    "embedding_quantize_int8",
    "split_train_holdout",
    "sequence_pack_by_source",
    "contamination_ngram_overlap",
    "bpe_pair_counts",
    "data_mixture_resample",
    "kmeans_assign_fixed",
)

_BY_NAME: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}
for _m in _MODULES:
    for _name, _pair in _m.QUERIES.items():
        if _name in _BY_NAME:
            raise ValueError(f"duplicate query name {_name!r}")
        _BY_NAME[_name] = _pair

_missing = [n for n in _PRIORITY if n not in _BY_NAME]
if _missing:
    raise ValueError(f"priority list names unknown queries: {_missing}")

REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    n: _BY_NAME[n] for n in _PRIORITY
}
for _name, _pair in _BY_NAME.items():
    if _name not in REGISTRY:
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
