#!/usr/bin/env python
"""r15 generic A/B: working-tree package vs the round-anchor package
(/tmp/oldpkg/oldpkg_bench, produced by `git archive <anchor> | tar -x`
plus a directory rename), interleaved rep-by-rep in ONE JVM so host
contention waves cancel (the r14 measurement discipline, SCALE.md).

Usage: python scripts/pkg_ab_probe.py q1[,q2,...] [tag]
Writes results/pkg_ab_<tag>.json when a tag is given, else prints only.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, "/tmp/oldpkg")

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import (  # noqa: E402
    registry as new_registry,
)
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.session import (  # noqa: E402
    get_spark,
)
from oldpkg_bench import registry as old_registry  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "5"))


def main() -> None:
    queries = sys.argv[1].split(",")
    tag = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("pkg-ab-probe")
    spark.sparkContext.setLogLevel("ERROR")
    arms = {"old": old_registry.REGISTRY, "new": new_registry.REGISTRY}
    times: dict[str, dict[str, list[float]]] = {
        q: {a: [] for a in arms} for q in queries
    }
    for q in queries:  # warm-up both arms, untimed
        for reg in arms.values():
            reg[q][0](spark, SF).write.format("noop").mode("overwrite").save()
    for rep in range(REPS):
        for q in queries:
            for arm, reg in arms.items():
                spark.sparkContext.setJobDescription(f"{q} [{arm}] rep {rep}")
                df = reg[q][0](spark, SF)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                times[q][arm].append(round(time.perf_counter() - t0, 4))
    out = {}
    for q in queries:
        o = statistics.median(times[q]["old"])
        n = statistics.median(times[q]["new"])
        out[q] = {
            "old_median": round(o, 4),
            "new_median": round(n, 4),
            "speedup": round(o / n, 3) if n else None,
            "old_reps": times[q]["old"],
            "new_reps": times[q]["new"],
        }
    result = {"sf_dir": SF, "reps": REPS, "queries": out}
    if tag:
        path = os.path.join(REPO, "results", f"pkg_ab_{tag}.json")
        with open(path, "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
