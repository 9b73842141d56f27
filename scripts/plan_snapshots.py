#!/usr/bin/env python
"""Regenerate the committed plan-signature snapshot for the most
expensive bench queries (VERDICT r6 "Next round" #7).

The snapshot (results/plan_snapshots.json) pins the structural shape
— exchange / broadcast / scan / cache node counts, via
plans.explain.plan_signature — of the queries where a silent plan
regression costs the most wall-clock. tests/test_plans.py::
test_plan_snapshots_top_queries rebuilds each plan at sf0.001 and
compares; a lost broadcast or an extra shuffle fails pytest before it
ever shows up as bench drift (the r5 cusum incident took a round to
triage for want of exactly this diff).

Run after any DELIBERATE plan change to one of these operators:
    python scripts/plan_snapshots.py
and commit the refreshed JSON together with the operator change.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import registry
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.plans import explain
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

# Top-10 of the round-7 rebaseline by per-query minimum (ivfpq 1.30s
# ... dedup_containment 0.68s) plus ks_drift_test (kept from the
# round-7 top-5 — its 16→4-scan rewrite is exactly the kind of
# deliberate plan change this snapshot exists to pin) — together
# ~36% of the suite total.
SNAPSHOT_QUERIES = [
    "ivfpq_ann_topk",
    "triangle_count_copurchase",
    "scd2_priority_history",
    "cusum_changepoint_by_type",
    "geo_nearest_supplier",
    "boilerplate_phrase_ratio",
    "q5_revenue_by_nation",
    "link_prediction_common_neighbors",
    "sort_asc_rank",
    "dedup_containment",
    "ks_drift_test",
    # round-7 additions: ewma entered the measured top-10 once the
    # host quieted; dedup_sentence_clean is new this round and its
    # single-scan/4-exchange shape is a pinned claim (test_plans.py)
    "ewma_customer_orders",
    "dedup_sentence_clean",
]


def build_signatures(spark) -> dict[str, dict[str, int]]:
    qs = registry.queries()
    return {
        name: explain.plan_signature(qs[name](spark, SF_DIR))
        for name in SNAPSHOT_QUERIES
    }


def main() -> None:
    spark = get_spark("plan-snapshots")
    spark.sparkContext.setLogLevel("ERROR")
    sigs = build_signatures(spark)
    path = os.path.join(REPO, "results", "plan_snapshots.json")
    with open(path, "w") as f:
        json.dump({"sf_dir": SF_DIR, "signatures": sigs}, f, indent=1)
    print(json.dumps(sigs, indent=1))
    print(f"-> {path}")


if __name__ == "__main__":
    main()
