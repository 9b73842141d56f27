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
# Cumulative driver coverage entering round 6: 236/270 queries have a
# row across r1-r5 (231 hash-green, 4 rows-only from r2, 1 err in r5);
# 34 have never been checked. The round-6 window drains the backlog to
# ZERO and converts the stale rows:
#
#   (i)   the 34 never-checked queries (the exact rotation list
#         pre-committed in round 5; all oracle-green in
#         tests/test_differential.py);
#   (ii)  5 verdict-named re-checks: embedding_random_projection
#         (r5's one red row — output reshaped to long form so the
#         driver's pandas canonicalizer can sort it),
#         streaming_session_window (gained a full DuckDB oracle in r5,
#         converting its r2 rows-only record), and the rows-only trio
#         dedup_minhash_lsh / dedup_simhash / mllib_lsh_ann_topk
#         (hash-dependent by design; fresh rows-only rows, each paired
#         with a hash-green recall certificate elsewhere in the
#         registry);
#   (iii) 11 deliberate fillers: streaming_dedup_events (its operator
#         changed in r5 to dropDuplicatesWithinWatermark after the
#         state-bound probe — the old driver row predates the fix),
#         plus the complete array-column family (array/multimodal/
#         chunk) to attest the registry-wide OUTPUT CONVENTION below
#         under the driver's own canonicalizer, and the flagship.
#
# OUTPUT CONVENTION (registry-wide, pinned after r5's red row): every
# registry query result must be sortable by an engine-neutral pandas
# canonicalizer — scalar columns only in the sort path, with a unique
# scalar key leading the column list. Array-typed payloads are either
# exploded to long form (embedding_random_projection), stringified
# (array_join/concat_ws), or carried behind a unique leading key so
# row order never depends on comparing arrays. Array-returning
# internal variants (e.g. embedding_random_projection_vectors) stay
# available for downstream composition but are not registry entries.
# Audited mechanically on every query: tests/helpers.py
# driver_sortability_problems() replays the driver's raw pandas
# multi-key sort inside run_differential (all oracle queries,
# tests/test_differential.py) and in the rows-only smoke
# (tests/test_registry_smoke.py), so a convention violation fails
# pytest before it can fail a driver round.
_PRIORITY = (
    # (i) the 34 never-driver-checked queries (round-5 rotation list)
    "geo_point_in_polygon",
    "dataset_card_stats",
    "observe_metrics_single_pass",
    "embedding_centroid_outliers",
    "label_centroid_similarity",
    "multimodal_phash_dedup",
    "keyword_search_tfidf",
    "source_vocab_overlap",
    "sparse_tfidf_doc_pairs",
    "token_entropy_quality",
    "quota_sample_per_source",
    "time_to_first_purchase",
    "user_growth_accounting",
    "multi_touch_attribution_decay",
    "inter_event_time_stats",
    "cohort_ltv_curve",
    "hourly_autocorrelation",
    "zorder_layout_stats",
    "dataset_mixture_plan",
    "vocab_oov_rate",
    "adaptive_quality_gate",
    "linear_quality_classifier",
    "dup_ngram_char_fraction",
    "k_anonymity_spectrum",
    "l_diversity_report",
    "deterministic_shuffle_shard",
    "rfm_segmentation",
    "pareto_revenue_share",
    "shipping_lag_stats",
    "winsorized_stats_by_group",
    "bootstrap_ci_group_means",
    "listagg_status_rollup",
    "ab_proportion_ztest",
    "theilsen_trend_by_type",
    # (ii) verdict-named re-checks (r5 err row + the 4 r2 stale rows)
    "embedding_random_projection",
    "streaming_session_window",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "mllib_lsh_ann_topk",
    # (iii) deliberate fillers: r5-changed operator + array-family
    # canonicalizer attestation + flagship
    "streaming_dedup_events",
    "array_agg_suite",
    "array_hof_suite",
    "array_topk_elements",
    "array_dimension_stats",
    "chunk_documents",
    "multimodal_decode",
    "multimodal_resize",
    "multimodal_frame_sample",
    "multimodal_feature_extract",
    "flagship_lazy_pipeline",
)

# Queries in the window that ALREADY have a driver row r1-r5 — each
# re-enters for a stated reason (see block comment above); the harness
# test pins this set so window slots are never wasted silently.
_RECHECKS = frozenset({
    "embedding_random_projection",   # r5 err -> long-form fix
    "streaming_session_window",      # r2 rows-only -> full oracle
    "dedup_minhash_lsh",             # r2 rows-only refresh (by design)
    "dedup_simhash",                 # r2 rows-only refresh (by design)
    "mllib_lsh_ann_topk",            # r2 rows-only refresh (by design)
    "streaming_dedup_events",        # operator changed in r5
    "array_agg_suite",               # output-convention attestation
    "array_hof_suite",
    "array_topk_elements",
    "array_dimension_stats",
    "chunk_documents",
    "multimodal_decode",
    "multimodal_resize",
    "multimodal_frame_sample",
    "multimodal_feature_extract",
    "flagship_lazy_pipeline",        # r1 flagship stability re-check
})

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
