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
# Entering round 12 every one of the 291 pre-existing queries has a
# driver row (285 hash-green, 6 rows-only by design; round 12 adds 4
# never-checked entries, 295 total), so the window's job is keeping
# rows from silently trailing code changes (VERDICT r6 "Next round"
# #1) and continuing the vintage drain — this window takes the 4
# round-12 additions, the 1 round-12-changed entry, the final 2
# r5-vintage rows (the r5 vintage fully drains, VERDICT r11 #2), and
# 43 of the 49 r6-vintage rows (the 6-row alphabetical tail queues
# for round 13). ROTATION POLICY, pinned
# by tests/test_harness.py::test_priority_window_is_ledger_justified
# against scripts/attestation_ledger.py (which ast-diffs every query
# function between the commit its last driver row ran against and the
# working tree):
#
#   (i)  changed-since-row first: every query whose function body
#        changed after the round of its last driver row MUST be in
#        the window (round 12: streaming_minhash_dedup — explicit
#        index-read schemas + replay-layout wording, ADVICE r11);
#   (ii) then stalest-first, monotone: the window may include a
#        round-k row only if every older row is also included (the
#        enforced rule is max(window rounds) <= min(excluded rounds),
#        changed-since-row entries aside).
#
# OUTPUT CONVENTION (registry-wide, pinned after r5's red row): every
# registry query result must be sortable by an engine-neutral pandas
# canonicalizer sorting by ALL columns — so every output column must
# be scalar, with a unique scalar key leading the column list.
# Array-typed payloads are either exploded to long form
# (embedding_random_projection) or stringified (array_join/
# concat_ws); there is NO third option — pandas' multi-key lexsort
# factorizes every column, so an array column fails it even behind a
# unique leading key (ADVICE r6: the earlier wording here promised
# otherwise and contradicted the audit). Array-returning internal
# variants (e.g. embedding_random_projection_vectors) stay available
# for downstream composition but are not registry entries. Audited
# mechanically on every query: tests/helpers.py
# driver_sortability_problems() replays the driver's raw pandas
# multi-key sort inside run_differential (all oracle queries,
# tests/test_differential.py) and in the rows-only smoke
# (tests/test_registry_smoke.py), so a convention violation fails
# pytest before it can fail a driver round.
_PRIORITY = (
    # ---- ROUND 12 WINDOW (first 50 = the driver's check set) ----
    # (iii) never-checked: the round-12 additions — no driver row
    #       exists, they rotate in first.
    "ivfpq_ann_topk_bucketed",             # new r12 (similarity.py, stored bucketBy ANN index — VERDICT r11 #1)
    "ivf_within_list_nn",                  # new r12 (similarity.py, SemDeDup NN scan on the SAME stored index)
    "streaming_minhash_dedup_precision",   # new r12 (windows.py, FP-rate certificate — VERDICT r11 #3)
    "bpe_train_merges_delta",              # new r12 (text.py, delta pair-count maintenance — VERDICT r11 #6)
    # (i) changed-since-row (attestation_ledger.py, round-12 run):
    "streaming_minhash_dedup",             # index reads pin explicit schema (ADVICE r11); replay wording
    # (ii) stalest-first, monotone (max in-window round <= min
    #     excluded round, changed entries aside): the 2 remaining
    #     r5-vintage rows — the r5 vintage fully drains this round —
    #     then 44 of the 49 r6-vintage rows, alphabetical; the 5-row
    #     alphabetical tail (token_entropy_quality .. zorder_layout_stats)
    #     queues for round 13.
    # r5 vintage (the final 2 of 47):
    "target_encode_smoothed",
    "user_feature_vector",
    # r6 vintage (44 of 49):
    "ab_proportion_ztest",
    "adaptive_quality_gate",
    "array_agg_suite",
    "array_dimension_stats",
    "array_hof_suite",
    "array_topk_elements",
    "bootstrap_ci_group_means",
    "cohort_ltv_curve",
    "dataset_card_stats",
    "dataset_mixture_plan",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "deterministic_shuffle_shard",
    "dup_ngram_char_fraction",
    "embedding_centroid_outliers",
    "embedding_random_projection",
    "flagship_lazy_pipeline",
    "geo_point_in_polygon",
    "hourly_autocorrelation",
    "inter_event_time_stats",
    "k_anonymity_spectrum",
    "keyword_search_tfidf",
    "l_diversity_report",
    "label_centroid_similarity",
    "linear_quality_classifier",
    "listagg_status_rollup",
    "mllib_lsh_ann_topk",
    "multi_touch_attribution_decay",
    "multimodal_decode",
    "multimodal_feature_extract",
    "multimodal_frame_sample",
    "multimodal_phash_dedup",
    "multimodal_resize",
    "observe_metrics_single_pass",
    "pareto_revenue_share",
    "quota_sample_per_source",
    "rfm_segmentation",
    "shipping_lag_stats",
    "source_vocab_overlap",
    "sparse_tfidf_doc_pairs",
    "streaming_dedup_events",
    "streaming_session_window",
    "theilsen_trend_by_type",
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
