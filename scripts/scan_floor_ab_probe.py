#!/usr/bin/env python
"""r14 probe: which bench queries gain from a scan-parallelism floor?

Every fixture table is a single-row-group parquet file, so every scan
plans as ONE task (guide §2.5's unsplittable-input case) and all
per-row work before the first exchange serializes on one core. This
probe monkeypatches ``catalog.load_table`` (and each operator module's
imported alias) with a floored variant and interleaves stock vs
floored timings for the not-yet-optimized bench queries, so round 14
edits only the queries where the floor measurably pays.

Measurement only — never imported by query code.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import catalog, registry
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "3"))

# bench queries not already carrying the floor (or already optimized
# in this round); ordered by r14 baseline cost, descending
CANDIDATES = [
    "scd2_priority_history",
    "ivfpq_ann_topk",
    "boilerplate_phrase_ratio",
    "triangle_count_copurchase",
    "ivfpq_ann_topk_bucketed",
    "geo_nearest_supplier",
    "ewma_customer_orders",
    "q5_revenue_by_nation",
    "dedup_minhash_incremental",
    "cusum_changepoint_by_type",
    "link_prediction_common_neighbors",
    "gopher_quality_signals",
    "dedup_sentence_clean",
    "ivf_ann_topk",
    "tfidf_top_terms",
    "dedup_containment",
    "quality_percentile_rank",
    "bloom_prefilter_join",
    "heavy_hitters_twophase",
    "chi2_token_source",
    "hybrid_rrf_fusion",
    "gdpr_delete_cascade",
    "ks_drift_test",
    "q3_shipping_priority",
    "q1_pricing_summary",
    "dedup_winnowing_fingerprints",
    "retention_cohort_matrix",
    "dq_constraint_report",
    "linear_quality_classifier",
    "bm25_keyword_topk",
    "event_transition_matrix",
    "asof_join_purchase_view",
    "range_join_discount_bands",
    "q18_large_volume_customers",
]

_stock_load = catalog.load_table


def _floored_load(spark, sf_dir, name):
    df = _stock_load(spark, sf_dir, name)
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    return df


def _operator_modules():
    import importlib
    import pkgutil

    import benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.operators as ops

    mods = []
    for m in pkgutil.iter_modules(ops.__path__):
        mods.append(importlib.import_module(f"{ops.__name__}.{m.name}"))
    return mods


def _patch(fn):
    catalog.load_table = fn
    for m in _operator_modules():
        if hasattr(m, "load_table"):
            m.load_table = fn


def main() -> None:
    spark = get_spark("scan-floor-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    out = {}
    for name in CANDIDATES:
        fn = qs[name]
        try:
            _patch(_stock_load)
            force(fn(spark, SF))
            _patch(_floored_load)
            force(fn(spark, SF))
            st, fl = [], []
            for _ in range(REPS):
                _patch(_stock_load)
                t0 = time.perf_counter()
                force(fn(spark, SF))
                st.append(time.perf_counter() - t0)
                _patch(_floored_load)
                t0 = time.perf_counter()
                force(fn(spark, SF))
                fl.append(time.perf_counter() - t0)
            row = {
                "stock": round(statistics.median(st), 3),
                "floored": round(statistics.median(fl), 3),
                "stock_min": round(min(st), 3),
                "floored_min": round(min(fl), 3),
            }
            row["ratio"] = round(row["stock"] / row["floored"], 2) if row["floored"] else None
            out[name] = row
            print(f"{name:36s} stock={row['stock']:.3f} floored={row['floored']:.3f} ratio={row['ratio']}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            print(f"{name}: ERROR {out[name]['error']}", file=sys.stderr)
        finally:
            _patch(_stock_load)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results",
        "scan_floor_ab.json",
    )
    with open(path, "w") as f:
        json.dump({"sf_dir": SF, "reps": REPS, "queries": out}, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
