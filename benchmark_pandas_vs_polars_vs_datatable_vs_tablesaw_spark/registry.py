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
# Entering round 8 every one of the 275 pre-existing queries has a
# driver row (272 hash-green, 3 rows-only by design; round 8 adds 4
# never-checked entries, 279 total), so the window's job is keeping
# rows from silently trailing code changes (VERDICT r6 "Next round"
# #1) and draining the r1/r2-vintage tail (VERDICT r7 #3). ROTATION POLICY, pinned
# by tests/test_harness.py::test_priority_window_is_ledger_justified
# against scripts/attestation_ledger.py (which ast-diffs every query
# function between the commit its last driver row ran against and the
# working tree):
#
#   (i)  changed-since-row first: every query whose function body
#        changed after the round of its last driver row MUST be in
#        the window (round 8: the six r8 edits — winnowing NULL-print
#        fix + w param, trailing-range docstring, ivfpq persist gate,
#        bm25 k1/b params, ewma horizon param, chunk window/stride
#        params — all surfaced by the ledger, all rotated in the same
#        round);
#   (ii) then stalest-first, monotone: the window may include a
#        round-k row only if every older row is also included (the
#        enforced rule is max(window rounds) <= min(excluded rounds),
#        changed-since-row entries aside). Round 8 drains the entire
#        r1 (5) and r2 (32) tails — the VERDICT r7 #3 queue — plus
#        5 of the 44 r3 rows.
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
    # ---- ROUND 8 WINDOW (first 50 = the driver's check set) ----
    # (0) never-checked (rule iii): the four round-8 additions — no
    #     driver row exists, they always rotate in first.
    "gopher_repetition_signals",     # new r8 (text.py, Gopher n-gram rules)
    "phrase_proximity_topk",         # new r8 (text.py, banded NEAR/k)
    "dsir_importance_weights",       # new r8 (training.py, DSIR micro-nats)
    "decontaminate_winnowing",       # new r8 (dedup.py, print-based decontam)
    # (i) changed-since-row (attestation_ledger.py, round-8 run):
    #     function body edited after the commit its last driver row
    #     ran on — the ADVICE-r7 fixes, the VERDICT-r7 #4 gate, and
    #     the #5 parameterizations.
    "dedup_winnowing_fingerprints",  # NULL-print filter (ADVICE r7) + w param, row r7
    "events_trailing_range_window",  # docstring reword (ADVICE r7), row r7
    "ivfpq_ann_topk",                # persist size-gate (VERDICT r7 #4), row r7
    "bm25_keyword_topk",             # k1/b rational params (VERDICT r7 #5), row r7
    "ewma_customer_orders",          # horizon param (VERDICT r7 #5), row r7
    "chunk_documents",               # window/stride params (r8 sweep), row r6
    # (ii) stalest-first, monotone (max in-window round <= min
    #     excluded round, changed entries aside): ALL 5 r1-vintage
    #     rows (the queue VERDICT r7 #3 names), then ALL 32 r2-vintage
    #     rows, then the first 10 r3 rows alphabetically to fill 50.
    # r1 vintage (5):
    "scale_up_duplicate",
    "semi_join_customers_with_orders",
    "set_ops_union_except",
    "topk_orders",
    "window_running_total",
    # r2 vintage (32):
    "ann_cosine_topk",
    "ann_cosine_topk_vectorized",
    "crossmodal_retrieval",
    "curation_pipeline",
    "dedup_exact",
    "dedup_exact_hash",
    "doc_fingerprint",
    "embedding_norm_stats",
    "events_funnel_conversion",
    "events_gapfill_resample",
    "events_hourly_agg",
    "events_json_extract",
    "events_sliding_window",
    "events_topk_users_per_type",
    "events_variant_json",
    "ivf_ann_topk",
    "lang_confusion_matrix",
    "lang_id_heuristic",
    "map_funcs_suite",
    "pandas_udf_doc_score",
    "pii_redaction",
    "streaming_hourly_agg",
    "streaming_sliding_agg",
    "streaming_stateful_counter",
    "streaming_topk_users",
    "text_clean_normalize",
    "text_quality_score",
    "text_repetition_filter",
    "text_stats",
    "tfidf_top_terms",
    "token_count_regex",
    "udtf_token_explode",
    # r3 vintage fill (3 of 44, alphabetical — the four round-8 NEW
    # queries and the three r8 parameterization edits (bm25/ewma rows
    # r7, chunk_documents row r6, rotated into the changed section)
    # displace 7 of the 10 r3 fills; the remaining 41 r3 rows head
    # the round-9 queue):
    "ansi_safe_arithmetic",
    "applyinpandas_zscore",
    "approx_distinct_bounds",
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
