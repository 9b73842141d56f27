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
# Rounds 1-4 cumulatively proved 186/270 driver rows (zero red);
# 84 queries had never had a driver row entering round 5 — the
# round-4 registry growth (+122) outran the 50/round window
# (round-4 verdict, "What's missing #1"). The round-5 window
# (exactly 50, enforced by tests/test_harness.py) fronts 50 of the
# 84, flagship-first per the verdict's named list; ZERO new queries
# were added this round so the backlog drains instead of growing.
_PRIORITY = (
    # (i) round-4 flagship work, named in VERDICT.md "Next round" #1
    "ivfpq_ann_topk",
    "latesim_maxsim_topk",
    "latesim_rerank_ann",
    "ks_drift_test",
    "hybrid_rrf_fusion",
    "kcore_copurchase_peel",
    "session_funnel_strict",
    "kaplan_meier_churn_table",
    "streaming_doc_quality_gate",
    "streaming_corpus_fingerprint",
    "sql_pipe_flagship",
    "lateral_topn_per_nation",
    "recursive_spine_gapfill",
    "python_datasource_scan",
    "bloom_prefilter_join",
    "pit_dimension_join",
    # (ii) all 15 mlprep.py queries (also verdict-named)
    "target_encode_smoothed",
    "retrieval_ndcg_eval",
    "classifier_pr_eval",
    "user_feature_vector",
    "quantile_normalize_scores",
    "embedding_dim_variance",
    "stratified_kfold_assign",
    "length_bucket_batch_plan",
    "negative_sampling_pairs",
    "curriculum_shard_plan",
    "hll_distinct_certificate",
    "asof_forward_tolerance",
    "chi2_token_source",
    "er_weighted_match",
    "skyline_pareto_frontier",
    # (iii) remaining never-checked, module spread — dedup first
    # (the largest unattested family), then dq/graph/similarity/
    # text/timeseries/streaming/storage/analytics representatives
    "dedup_containment",
    "dedup_clusters_star_contraction",
    "dedup_incremental_exact",
    "dedup_survivorship",
    "dedup_edit_distance_blocked",
    "gdpr_delete_cascade",
    "corpus_fingerprint",
    "market_basket_rules",
    "link_prediction_common_neighbors",
    "copurchase_degree_distribution",
    "pq_quantize_stats",
    "embedding_random_projection",
    "heavy_hitters_twophase",
    "collocation_pmi_top",
    "asof_nearest_tolerance",
    "late_event_accounting",
    "streaming_foreachbatch_upsert",
    "schema_evolution_read",
    "cusum_changepoint_by_type",
)
# ROUND-6 ROTATION (the remaining 34 never-driver-checked queries —
# promote these to _PRIORITY next round, nothing else jumps the
# queue; all 34 are oracle-differential-green today in
# tests/test_differential.py):
#   geo_point_in_polygon, dataset_card_stats,
#   observe_metrics_single_pass, embedding_centroid_outliers,
#   label_centroid_similarity, multimodal_phash_dedup,
#   keyword_search_tfidf, source_vocab_overlap,
#   sparse_tfidf_doc_pairs, token_entropy_quality,
#   quota_sample_per_source, time_to_first_purchase,
#   user_growth_accounting, multi_touch_attribution_decay,
#   inter_event_time_stats, cohort_ltv_curve, hourly_autocorrelation,
#   zorder_layout_stats, dataset_mixture_plan, vocab_oov_rate,
#   adaptive_quality_gate, linear_quality_classifier,
#   dup_ngram_char_fraction, k_anonymity_spectrum, l_diversity_report,
#   deterministic_shuffle_shard, rfm_segmentation,
#   pareto_revenue_share, shipping_lag_stats,
#   winsorized_stats_by_group, bootstrap_ci_group_means,
#   listagg_status_rollup, ab_proportion_ztest, theilsen_trend_by_type

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
