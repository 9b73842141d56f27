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
# The window's job is keeping rows from silently trailing code
# changes (VERDICT r6 "Next round" #1) and continuing the vintage
# drain, stalest rows first. ROTATION POLICY, pinned
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
    # ---- ROUND 14 WINDOW (first 50 = the driver's check set) ----
    # Entering round 14 all 299 r13-registered queries are green at
    # their latest driver row; the r13->r14 interregnum added 3
    # never-checked entries (302 total) and edited the two r13 eval
    # queries (degenerate-NULL guard + persist rotation). Window
    # composition per the ledger (scripts/attestation_ledger.py,
    # round-14 run: rows by round {0: 3, 7: 7, 8: 47, 9: 50, ...}):
    # (iii) never-checked: the interregnum additions rotate in first.
    "classifier_auc_by_source",            # new r14 (mlprep.py, per-source tie-corrected AUC — VERDICT r13 #7)
    "semdedup_apply_multiprobe",           # new r14 (similarity.py, soft top-2 SemDeDup — VERDICT r13 #3)
    "semdedup_boundary_miss",              # new r14 (similarity.py, cross-list miss certificate — VERDICT r13 #3)
    # (i) changed-since-row (the d654025 degenerate-NULL/persist edits
    #     + every function optimized in round 14 — the optimization
    #     round's whole point is that each rewritten query re-attests
    #     against the oracle in the same round it changed):
    "classifier_auc_eval",                 # NULL degenerate guard + persist rotation (ADVICE r13)
    "quality_signal_spearman",             # NULL degenerate guard (ADVICE r13)
    "decontaminate_winnowing",             # r14 opt: one-pass shared/size aggregation
    "gopher_repetition_signals",           # r14 opt: per-doc HOF rewrite, gram shuffle removed
    "dsir_importance_weights",             # r14 opt: array-side bigrams, window shuffle removed
    "ccnet_perplexity_buckets",            # r14 opt: array-side bigrams
    "bigram_lm_score",                     # r14 opt: array-side bigrams
    "dup_ngram_char_fraction",             # r14 opt: array-side trigrams
    "dedup_substring_exact",               # r14 opt: xxhash64 window hashes (verified pre-filter)
    "boilerplate_phrase_ratio",            # r14 opt: scan-parallelism floor
    "gopher_quality_signals",              # r14 opt: scan-parallelism floor
    "text_quality_score",                  # r14 opt: scan-parallelism floor (feeds quality_percentile_rank)
    "hybrid_rrf_fusion",                   # r14 opt: scan-parallelism floor
    "linear_quality_classifier",           # r14 opt: scan-parallelism floor
    "dedup_minhash_incremental",           # r14 opt: scan-parallelism floor (probe side)
    "ann_cosine_topk",                     # r14 opt: scan-parallelism floor
    "contamination_ngram_overlap",         # r14 opt: one-pass mark-join + floor
    # (ii) stalest-first, monotone (max in-window round <= min
    #     excluded round, changed entries aside): the 7-row r7 tail
    #     drains fully this round, then r8 vintage alphabetical fills
    #     the remaining slots; the r8 remainder queues for round 15.
    # r7 vintage (all 7 — the r7 vintage drains this round,
    # VERDICT r13 #5):
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "rollup_returnflag_linestatus",
    "sql_api_flagship",
    "streaming_session_certificate",
    # r8 vintage (alphabetical; ann_cosine_topk moved up to the
    # changed-since-row block):
    "ann_cosine_topk_vectorized",
    "ansi_safe_arithmetic",
    "applyinpandas_zscore",
    "approx_distinct_bounds",
    "bm25_keyword_topk",
    "chunk_documents",
    "crossmodal_retrieval",
    "curation_pipeline",
    "dedup_exact",
    "dedup_exact_hash",
    "dedup_winnowing_fingerprints",
    "doc_fingerprint",
    "embedding_norm_stats",
    "events_funnel_conversion",
    "events_gapfill_resample",
    "events_hourly_agg",
    "events_json_extract",
    "events_sliding_window",
    "events_topk_users_per_type",
    "events_trailing_range_window",
    "events_variant_json",
    "ewma_customer_orders",
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
