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
    # ---- ROUND 13 WINDOW (first 50 = the driver's check set) ----
    # Entering round 13 all 295 pre-existing queries are green at
    # their latest driver row; round 13 adds 4 never-checked entries
    # (299 total). Window composition per the ledger
    # (scripts/attestation_ledger.py, round-13 run: rows by round
    # {0: 2, 6: 6, 7: 46, 8: 47, ...}):
    # (iii) never-checked: the round-13 additions rotate in first.
    "semdedup_apply",                      # new r13 (similarity.py, SemDeDup applied on the stored index — VERDICT r12 #7)
    "bpe_train_merges_adaptive",           # new r13 (text.py, hybrid recount/delta trainer — VERDICT r12 #5)
    "classifier_auc_eval",                 # new r13 (mlprep.py, tie-corrected Mann-Whitney AUC of the linear gate)
    "quality_signal_spearman",             # new r13 (mlprep.py, tie-corrected Spearman scorer-agreement audit)
    # (i) changed-since-row:
    "streaming_minhash_dedup_precision",   # per-fixture FP ceilings at measured+margin (VERDICT r12 #4)
    # (ii) stalest-first, monotone (max in-window round <= min
    #     excluded round, changed entries aside): the final 6
    #     r6-vintage rows — the r6 vintage fully drains this round
    #     (VERDICT r12 #1) — then 39 of the 46 r7-vintage rows,
    #     alphabetical; the 7-row alphabetical tail
    #     (q6_forecast_revenue, q7_volume_shipping, q8_market_share,
    #     q9_product_profit, rollup_returnflag_linestatus,
    #     sql_api_flagship, streaming_session_certificate) queues for
    #     round 14.
    # r6 vintage (the final 6 of 49):
    "time_to_first_purchase",
    "token_entropy_quality",
    "user_growth_accounting",
    "vocab_oov_rate",
    "winsorized_stats_by_group",
    "zorder_layout_stats",
    # r7 vintage (39 of 46):
    "anti_join_customers_without_orders",
    "blocklist_policy_gate",
    "broadcast_dim_join",
    "cast_nan_matrix",
    "csv_roundtrip",
    "dedup_clusters_cc",
    "dedup_ngram_jaccard",
    "dedup_sentence_clean",
    "dedup_sentence_stats",
    "distinct_counts",
    "filter_numeric_gt",
    "generator_scaling4_invariants",
    "groupby_first",
    "groupby_first_minby",
    "groupby_mean",
    "groupby_multi_mean",
    "intersect_segments",
    "ks_drift_test",
    "limit_prefix",
    "mapinarrow_matrix_stats",
    "matrix_col_means",
    "median_stats",
    "merge_upsert_orders",
    "outer_join_coverage",
    "pivot_linestatus",
    "project_first_numeric",
    "q10_returned_items",
    "q11_important_parts",
    "q13_order_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_supplier_part_count",
    "q17_small_qty_revenue",
    "q18_large_volume_customers",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_revenue_by_nation",
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
