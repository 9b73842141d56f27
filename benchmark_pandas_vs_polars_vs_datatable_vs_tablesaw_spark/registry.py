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
# Entering round 11 every one of the 289 pre-existing queries has a
# driver row (284 hash-green, 5 rows-only by design; round 11 adds 2
# never-checked entries, 291 total), so the window's job is keeping
# rows from silently trailing code changes (VERDICT r6 "Next round"
# #1) and continuing the vintage drain — this window takes the 3
# round-11-changed entries plus 45 of the 47 r5-vintage rows (the
# 2-row alphabetical tail queues for round 12). ROTATION POLICY, pinned
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
    # ---- ROUND 11 WINDOW (first 50 = the driver's check set) ----
    # (iii) never-checked: the round-11 additions — no driver row
    #       exists, they rotate in first.
    "dedup_minhash_incremental_bucketed",  # new r11 (dedup.py, stored bucketBy index — VERDICT r10 #1)
    "bpe_train_merges_batched",            # new r11 (text.py, batched disjoint merges — VERDICT r10 #5)
    # (i) changed-since-row (attestation_ledger.py, round-11 run):
    "dedup_minhash_incremental_recall",    # re-pointed at the bucketed probe path
    "streaming_minhash_dedup",             # first-seen-wins admission (VERDICT r10 #2)
    "streaming_minhash_dedup_recall",      # certificate re-stated for arrival semantics
    # (ii) stalest-first, monotone (max in-window round <= min
    #     excluded round, changed entries aside): 45 of the 47
    #     r5-vintage rows, alphabetical; the remaining 2
    #     (target_encode_smoothed, user_feature_vector — the
    #     alphabetical tail) queue for round 12, when the r5 vintage
    #     fully drains.
    # r5 vintage (45 of 47):
    "asof_forward_tolerance",
    "asof_nearest_tolerance",
    "bloom_prefilter_join",
    "chi2_token_source",
    "classifier_pr_eval",
    "collocation_pmi_top",
    "copurchase_degree_distribution",
    "corpus_fingerprint",
    "curriculum_shard_plan",
    "cusum_changepoint_by_type",
    "dedup_clusters_star_contraction",
    "dedup_containment",
    "dedup_edit_distance_blocked",
    "dedup_incremental_exact",
    "dedup_survivorship",
    "embedding_dim_variance",
    "er_weighted_match",
    "gdpr_delete_cascade",
    "heavy_hitters_twophase",
    "hll_distinct_certificate",
    "hybrid_rrf_fusion",
    "kaplan_meier_churn_table",
    "kcore_copurchase_peel",
    "late_event_accounting",
    "lateral_topn_per_nation",
    "latesim_maxsim_topk",
    "latesim_rerank_ann",
    "length_bucket_batch_plan",
    "link_prediction_common_neighbors",
    "market_basket_rules",
    "negative_sampling_pairs",
    "pit_dimension_join",
    "pq_quantize_stats",
    "python_datasource_scan",
    "quantile_normalize_scores",
    "recursive_spine_gapfill",
    "retrieval_ndcg_eval",
    "schema_evolution_read",
    "session_funnel_strict",
    "skyline_pareto_frontier",
    "sql_pipe_flagship",
    "stratified_kfold_assign",
    "streaming_corpus_fingerprint",
    "streaming_doc_quality_gate",
    "streaming_foreachbatch_upsert",
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
