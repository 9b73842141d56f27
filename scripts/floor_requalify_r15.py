#!/usr/bin/env python
"""r15 requalification of the four scan-parallelism floors the r14
driver did not corroborate (VERDICT r14 #3): text_quality_score (via
quality_percentile_rank), hybrid_rrf_fusion, gopher_quality_signals,
dedup_minhash_incremental.

Arms: CURRENT code (floored) vs the floor monkeypatched to a no-op
(load_table_parallel -> load_table, scan_parallelism_floor ->
identity), interleaved rep-by-rep in ONE JVM so host waves cancel.
Rule pinned before running (the r14 "only measured wins ship" rule):
keep a floor only if floored/unfloored speedup >= 1.15 at the
contract core count; otherwise revert the query to plain load_table.

Writes results/floor_requalify_r15.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import (  # noqa: E402
    catalog,
    registry,
)
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.session import (  # noqa: E402
    get_spark,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "5"))

SUSPECTS = [
    "quality_percentile_rank",   # floor lives in text_quality_score
    "hybrid_rrf_fusion",
    "gopher_quality_signals",
    "dedup_minhash_incremental",
]

_real_parallel = catalog.load_table_parallel
_real_floor = catalog.scan_parallelism_floor


def _operator_modules():
    import importlib
    import pkgutil

    import benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.operators as ops

    return [
        importlib.import_module(f"{ops.__name__}.{m.name}")
        for m in pkgutil.iter_modules(ops.__path__)
    ]


def _patch(floored: bool) -> None:
    lp = _real_parallel if floored else catalog.load_table
    fl = _real_floor if floored else (lambda spark, df: df)
    catalog.load_table_parallel = lp
    catalog.scan_parallelism_floor = fl
    for m in _operator_modules():
        if hasattr(m, "load_table_parallel"):
            m.load_table_parallel = lp
        if hasattr(m, "scan_parallelism_floor"):
            m.scan_parallelism_floor = fl


def main() -> None:
    spark = get_spark("floor-requalify-r15")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    out = {}
    for name in SUSPECTS:
        fn = qs[name]
        for floored in (True, False):  # warm-ups, untimed
            _patch(floored)
            force(fn(spark, SF))
        fl_t, st_t = [], []
        for rep in range(REPS):
            for floored, sink in ((True, fl_t), (False, st_t)):
                _patch(floored)
                spark.sparkContext.setJobDescription(
                    f"{name} [{'floored' if floored else 'stock'}] rep {rep}"
                )
                df = fn(spark, SF)
                t0 = time.perf_counter()
                force(df)
                sink.append(round(time.perf_counter() - t0, 4))
        _patch(True)
        fl_m, st_m = statistics.median(fl_t), statistics.median(st_t)
        out[name] = {
            "floored_median": round(fl_m, 4),
            "stock_median": round(st_m, 4),
            "floor_speedup": round(st_m / fl_m, 3) if fl_m else None,
            "floored_reps": fl_t,
            "stock_reps": st_t,
            "verdict": "keep" if st_m / fl_m >= 1.15 else "revert",
        }
        print(name, json.dumps(out[name]), file=sys.stderr)
    result = {"sf_dir": SF, "reps": REPS, "rule": ">=1.15 keeps", "queries": out}
    with open(os.path.join(REPO, "results", "floor_requalify_r15.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v["floor_speedup"] for k, v in out.items()}))


if __name__ == "__main__":
    main()
