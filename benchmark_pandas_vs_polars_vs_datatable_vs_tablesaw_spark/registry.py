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
# Entering round 7 every one of the 270 pre-existing queries has a
# driver row (267 hash-green, 3 rows-only by design; round 7 adds 5
# never-checked entries, 275 total), so the window's job is no
# longer backlog drain — it is keeping rows from silently trailing
# code changes (VERDICT r6 "Next round" #1). ROTATION POLICY, pinned
# by tests/test_harness.py::test_priority_window_is_ledger_justified
# against scripts/attestation_ledger.py (which ast-diffs every query
# function between the commit its last driver row ran against and the
# working tree):
#
#   (i)  changed-since-row first: every query whose function body
#        changed after the round of its last driver row MUST be in
#        the window (round 7: dedup_clusters_cc and ivfpq_ann_topk
#        were edited in r6 after r3/r5 rows — verdict-named — plus
#        dedup_ngram_jaccard (df-cap rework in r4, row r3) and
#        streaming_session_certificate (r5 edit, row r4), which the
#        ledger surfaced, plus ks_drift_test, rewritten IN round 7
#        to a 3-pass plan — an edit made this round rotates in this
#        round);
#   (ii) then stalest-first, monotone: the window may include a
#        round-k row only if every older row is also included (the
#        enforced rule is max(window rounds) <= min(excluded rounds),
#        changed-since-row entries aside). Round 7 takes 38 of the 44
#        r1-vintage rows — five rounds of refactors since — the other
#        five r1 rows plus the r2 filler queue for round 8 (see the
#        displacement note at the list tail).
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
    # (0) never-checked (ledger rule iii): queries ADDED in round 7 —
    # no driver row exists, they always rotate in first
    "bm25_keyword_topk",             # new r7 (text.py)
    "dedup_winnowing_fingerprints",  # new r7 (dedup.py)
    "dedup_sentence_stats",          # new r7 (dedup.py, CCNet line-dedup)
    "dedup_sentence_clean",          # new r7 (dedup.py, CCNet line-dedup)
    "blocklist_policy_gate",         # new r7 (text.py, C4 badword gate)
    # (i) changed-since-row (attestation_ledger.py, round-7 run):
    # function body edited after the commit its last driver row ran on
    "dedup_clusters_cc",             # rewritten r6 (Observation fold), row r3
    "ivfpq_ann_topk",                # persist added r6 + probe knob r7, row r5
    "dedup_ngram_jaccard",           # df-cap rework r4, row r3
    "streaming_session_certificate",  # certificate tightened r5, row r4
    "ks_drift_test",                 # r7 pass-budget rewrite (16->4 scans), row r5
    "q2_min_cost_supplier",          # r7 exact-rational rounding fix (sf0.1 sweep), row r1
    "events_trailing_range_window",  # r7 micros order-key fix (sf0.1 sweep), row r2
    # (ii) stalest-first: ALL 44 r1-vintage rows (alphabetical) — five
    # rounds of refactors since round 1 (e.g. sort/limit went through
    # the r3 rank-materialization rewrite, joins through the r4 plan-
    # budget pass); pytest has re-proven them every round, the driver
    # hasn't looked since r1
    "anti_join_customers_without_orders",
    "broadcast_dim_join",
    "cast_nan_matrix",
    "csv_roundtrip",
    "distinct_counts",
    "filter_numeric_gt",
    "generator_scaling4_invariants",
    "groupby_first",
    "groupby_first_minby",
    "groupby_mean",
    "groupby_multi_mean",
    "intersect_segments",
    "limit_prefix",
    "mapinarrow_matrix_stats",
    "matrix_col_means",
    "median_stats",
    "merge_upsert_orders",
    "outer_join_coverage",
    "pivot_linestatus",
    "project_first_numeric",
    "q1_pricing_summary",
    # (q2_min_cost_supplier moved up to the changed-since-row section:
    # its rounding was fixed in r7 after the sf0.1 sweep caught it)
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_revenue_by_nation",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q13_order_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_supplier_part_count",
    "q17_small_qty_revenue",
    "q18_large_volume_customers",
    "rollup_returnflag_linestatus",
    "sql_api_flagship",
    # (iii) window holds at 50: the five round-7 NEW queries (bm25,
    # winnowing, the two sentence-dedup entries, blocklist gate)
    # displace the r2-vintage filler (dedup_exact_hash),
    # window_running_total, semi_join_customers_with_orders,
    # set_ops_union_except, and scale_up_duplicate; the two round-7
    # sf0.1-sweep FIXES (q2, trailing-range — both now in the changed
    # section above) displace topk_orders; monotone rule intact (max
    # in-window round = 1 = min excluded round). First in line for
    # round 8: ann_cosine_topk, dedup_exact_hash,
    # window_running_total, topk_orders,
    # semi_join_customers_with_orders, set_ops_union_except,
    # scale_up_duplicate.
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
