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
# Entering round 10 every one of the 283 pre-existing queries has a
# driver row (280 hash-green, 3 rows-only by design; round 10 adds 6
# never-checked entries, 289 total), so the window's job is keeping
# rows from silently trailing code changes (VERDICT r6 "Next round"
# #1) and continuing the vintage drain — this window takes the ENTIRE
# r4 tail (44 rows, VERDICT r9 #4), after which no row older than r5
# remains. ROTATION POLICY, pinned
# by tests/test_harness.py::test_priority_window_is_ledger_justified
# against scripts/attestation_ledger.py (which ast-diffs every query
# function between the commit its last driver row ran against and the
# working tree):
#
#   (i)  changed-since-row first: every query whose function body
#        changed after the round of its last driver row MUST be in
#        the window (round 10: none — no pre-existing query function
#        was edited this round; the ledger run confirms);
#   (ii) then stalest-first, monotone: the window may include a
#        round-k row only if every older row is also included (the
#        enforced rule is max(window rounds) <= min(excluded rounds),
#        changed-since-row entries aside). Round 10 drains the entire
#        r4 tail (44 rows — the VERDICT r9 #4 queue); with the 6 new
#        entries that fills 50 exactly (no r5 fill this round).
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
    # ---- ROUND 10 WINDOW (first 50 = the driver's check set) ----
    # (iii) never-checked: the round-10 additions — no driver row
    #       exists, they rotate in first.
    "dedup_minhash_incremental",        # new r10 (dedup.py, persisted-index probe)
    "dedup_minhash_incremental_recall", # new r10 (dedup.py, its exact-truth certificate)
    "bpe_train_merges",                 # new r10 (text.py, unrolled BPE merge loop)
    "bpe_encode_corpus",                # new r10 (text.py, tokenizer train->apply)
    "streaming_minhash_dedup",          # new r10 (streaming, growing-index dedup)
    "streaming_minhash_dedup_recall",   # new r10 (streaming, its planted certificate)
    # (i) changed-since-row (attestation_ledger.py, round-10 run):
    #     none — no pre-existing query function body was edited this
    #     round (round 10's code work was additive operators plus
    #     harness scripts outside the registry).
    # (ii) stalest-first, monotone (max in-window round <= min
    #     excluded round, changed entries aside): ALL 44 remaining
    #     r4-vintage rows — the VERDICT r9 #4 drain; after this
    #     window no row older than r5 remains — then the first 3
    #     r5 rows alphabetically to fill 50.
    # r4 vintage (44):
    "asof_join_purchase_view",
    "bigram_lm_score",
    "bitmap_distinct_users",
    "boilerplate_phrase_ratio",
    "compact_small_files",
    "dedup_minhash_recall",
    "dedup_semantic_clusters",
    "dedup_simhash_recall",
    "dq_constraint_report",
    "event_transition_matrix",
    "events_anomaly_zscore",
    "events_sessionization",
    "feature_hash_bag",
    "frequent_event_paths",
    "fuzzy_dedup_pipeline",
    "geo_cell_density",
    "geo_nearest_supplier",
    "hierarchical_rollup_events",
    "incremental_agg_maintenance",
    "interval_concurrency_peak",
    "inverted_index_sample",
    "join_cardinality_report",
    "key_skew_report",
    "kmeans_lloyd_two_rounds",
    "m4_downsample_events",
    "mad_outlier_events",
    "mixture_temperature_resample",
    "mllib_lsh_recall",
    "pagerank_nation_trade",
    "purchase_attribution_last_touch",
    "q22_sales_opportunity",
    "quality_percentile_rank",
    "quantile_bin_features",
    "retention_cohort_matrix",
    "revenue_contribution_shares",
    "rolling_median_by_user",
    "scd2_priority_history",
    "snapshot_diff_cdc",
    "streaming_interval_join",
    "token_rarity_score",
    "trend_regression_by_type",
    "triangle_count_copurchase",
    "weighted_median_by_group",
    "weighted_reservoir_sample",
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
