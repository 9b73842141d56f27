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
    cdc,
    core,
    dedup,
    dq,
    geo,
    graph,
    joins,
    mlprep,
    multimodal,
    similarity,
    text,
    timeseries,
    tpch_extra,
    training,
)
from .shipping import ensure_package_on_workers
from .sources import pysource, storage
from .streaming import windows as streaming_windows

_MODULES = (
    dedup,
    dq,
    geo,
    cdc,
    graph,
    similarity,
    multimodal,
    text,
    timeseries,
    streaming_windows,
    arrays,
    storage,
    pysource,
    training,
    mlprep,
    core,
    joins,
    tpch_extra,
    analytics,
)

# Registration order == driver correctness-check order (the driver
# verifies the first N registry entries per round; N has been 50).
# Rounds 1-3 cumulatively proved 137/148 hash-green. The round-4
# window (exactly 50) fronts, in order of need:
# (a00) every query that has NEVER had a driver row — the round-3
#       additions the 50-window never reached, the round-4 additions
#       (dedup/storage/streaming/stats/graph/CDC), and this session's
#       new operators (dq report, skew diagnostic, transition matrix,
#       attribution, EWMA, quantile binning);
# (b)   the 5 events queries the TIMESTAMP_NTZ drift broke outright
#       (fixed in catalog.normalize_events_ts — fresh rows required);
# (c)   q22_sales_opportunity, whose anti-join side changed to be
#       non-vacuous (was a 0-row hash match).
# The 15 late-round-4 additions (training.py, gdpr_delete_cascade,
# inter-event/growth/attribution/Pareto/RFM/shipping-lag analytics,
# hybrid_rrf_fusion, copurchase_degree_distribution) queue behind the
# window for the round-5 rotation — every named verdict item keeps its
# slot; all 15 are differential-tested in tests/test_differential.py.
# Nine round-4 additions with strong independent pytest evidence
# (zorder file-span, schema-evolution, JL distortion-envelope, bloom
# no-false-negative, blocked-edit-distance, foreachBatch idempotent-
# merge, star-contraction==CC equivalence, winsorized-stats,
# streaming-session-subset tests — the last also covered by its
# in-window oracle certificate) plus the type-touched-but-output-
# identical events/streaming queries (green r2) wait behind the
# window for the round-5 rotation; all remain covered by
# tests/test_differential.py.
_PRIORITY = (
    # (a00-i) this session's additions
    "dq_constraint_report",
    "key_skew_report",
    "event_transition_matrix",
    "purchase_attribution_last_touch",
    "ewma_customer_orders",
    "quantile_bin_features",
    "geo_nearest_supplier",
    "geo_cell_density",
    "feature_hash_bag",
    "mad_outlier_events",
    "m4_downsample_events",
    "join_cardinality_report",
    "bitmap_distinct_users",
    "hierarchical_rollup_events",
    "revenue_contribution_shares",
    "bigram_lm_score",
    "inverted_index_sample",
    "frequent_event_paths",
    # (a00-ii) earlier round-4 additions — first driver rows
    "retention_cohort_matrix",
    "interval_concurrency_peak",
    "events_anomaly_zscore",
    "triangle_count_copurchase",
    "pagerank_nation_trade",
    "boilerplate_phrase_ratio",
    "weighted_reservoir_sample",
    "scd2_priority_history",
    "snapshot_diff_cdc",
    "incremental_agg_maintenance",
    "ab_test_welch",
    "weighted_median_by_group",
    "rolling_median_by_user",
    "trend_regression_by_type",
    # (a00-iii) round-4 oracle upgrades: ann_lsh_topk's candidate
    # pipeline is deterministic (seeded-LCG planes) and now carries a
    # full DuckDB oracle; the three recall certificates give the
    # hash/RNG-dependent schemes (MinHash, SimHash, MLlib LSH) their
    # first hash-checkable rows; dedup_containment is new.
    "ann_lsh_topk",
    "dedup_minhash_recall",
    "dedup_simhash_recall",
    "mllib_lsh_recall",
    "quality_percentile_rank",
    "fuzzy_dedup_pipeline",
    "streaming_session_certificate",
    # (a00-iv) round-3 additions — never driver-checked
    "dedup_semantic_clusters",
    "kmeans_lloyd_two_rounds",
    "token_rarity_score",
    "chunk_documents",
    "mixture_temperature_resample",
    "compact_small_files",
    # (b) events queries broken by the NTZ drift, now fixed
    "asof_join_purchase_view",
    "events_sessionization",
    "streaming_dedup_events",
    "streaming_interval_join",
    # (c) fixed vacuous fixture match
    "q22_sales_opportunity",
    # The 22 round-4-session additions (mlprep.py, collocation/keyword
    # search, bootstrap/z-test/Theil-Sen, l-diversity, k-core, PQ stats,
    # lateness audit) queue behind the window in module order for the
    # round-5 rotation; every one is oracle-checked today in
    # tests/test_differential.py and scripts/drive_contract.py.
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
