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
# Entering round 9 every one of the 279 pre-existing queries has a
# driver row (276 hash-green, 3 rows-only by design; round 9 adds 1
# never-checked entry, 280 total), so the window's job is keeping
# rows from silently trailing code changes (VERDICT r6 "Next round"
# #1) and finishing the vintage drain — after this window's r3 tail
# (41 rows, VERDICT r8 #3) no row older than r4 remains. ROTATION POLICY, pinned
# by tests/test_harness.py::test_priority_window_is_ledger_justified
# against scripts/attestation_ledger.py (which ast-diffs every query
# function between the commit its last driver row ran against and the
# working tree):
#
#   (i)  changed-since-row first: every query whose function body
#        changed after the round of its last driver row MUST be in
#        the window (round 9: the three VERDICT-r8 #6 dial
#        parameterizations — decontamination min_shared, IVF and
#        IVF-PQ n_probe — all surfaced by the ledger, all rotated in
#        the same round as the edit);
#   (ii) then stalest-first, monotone: the window may include a
#        round-k row only if every older row is also included (the
#        enforced rule is max(window rounds) <= min(excluded rounds),
#        changed-since-row entries aside). Round 9 drains the entire
#        r3 tail (41 rows — the VERDICT r8 #3 queue) plus the first
#        5 r4 rows.
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
    # ---- ROUND 9 WINDOW (first 50 = the driver's check set) ----
    # (iii) never-checked: the round-9 additions — no driver row
    #       exists, they rotate in first.
    "dedup_substring_exact",         # new r9 (dedup.py, Lee et al. ExactSubstr)
    "gopher_quality_signals",        # new r9 (text.py, Gopher quality panel)
    "ccnet_perplexity_buckets",      # new r9 (text.py, CCNet head/middle/tail)
    "data_budget_repeats",           # new r9 (training.py, data-constrained repeats)
    # (i) changed-since-row (attestation_ledger.py, round-9 run):
    #     the VERDICT-r8 #6 dial parameterizations — function bodies
    #     edited after their (r8) driver rows, so they re-attest in
    #     the same round as the edit.
    "decontaminate_winnowing",       # min_shared param, row r8
    "ivf_ann_topk",                  # n_probe param, row r8
    "ivfpq_ann_topk",                # n_probe param, row r8
    # (ii) stalest-first, monotone (max in-window round <= min
    #     excluded round, changed entries aside): ALL 41 remaining
    #     r3-vintage rows — the VERDICT r8 #3 drain; after this
    #     window no row older than r4 remains — then the first 5
    #     r4 rows alphabetically to fill 50.
    # r3 vintage (41):
    "approx_quantile_bounds",
    "bpe_pair_counts",
    "bucketed_join_revenue",
    "contamination_ngram_overlap",
    "corr_covar_stats",
    "cube_priority_status",
    "data_mixture_resample",
    "date_parts_agg",
    "dedup_embedding_cosine",
    "dpp_join_pruned_scan",
    "embedding_quantize_int8",
    "exact_percentiles_by_group",
    "grouping_sets_custom",
    "higher_moments_stats",
    "histogram_totalprice",
    "json_roundtrip",
    "kmeans_assign_fixed",
    "map_hof_suite",
    "mips_topk",
    "ntile_balance_quartiles",
    "null_handling_suite",
    "orc_roundtrip",
    "parquet_zstd_roundtrip",
    "partition_pruned_scan",
    "q12_priority_shipping",
    "q19_disjunctive_bands",
    "q20_excess_shippers",
    "q21_last_shippers",
    "range_join_discount_bands",
    "salted_skew_agg",
    "sample_modulo_agg",
    "sequence_pack_by_source",
    "sort_asc_rank",
    "sort_desc_rank",
    "split_train_holdout",
    "stratified_sample_bounds",
    "string_funcs_suite",
    "textfile_roundtrip",
    "unpivot_lineitem_measures",
    "window_distribution_funcs",
    "window_lag_lead",
    # r4 vintage fill (2 — the 2nd-4th r9 additions displace three):
    "ab_test_welch",
    "ann_lsh_topk",
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
