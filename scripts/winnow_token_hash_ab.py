#!/usr/bin/env python
"""r15 A/B: token-factorized winnow hash vs the r14 per-shingle char
fold, for decontaminate_winnowing and dedup_winnowing_fingerprints.

Old arm = the package at the anchor commit (git archive -> renamed
oldpkg_bench, relative imports intact); new arm = the working tree.
Both arms run INTERLEAVED rep-by-rep in ONE JVM so host contention
waves cancel (the r14 measurement discipline; see SCALE.md).

Usage: set up /tmp/oldpkg (git archive HEAD | tar -x; mv package dir
to oldpkg_bench), then `python scripts/winnow_token_hash_ab.py`.
Writes results/winnow_token_hash_ab.json.
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

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.operators import (  # noqa: E402
    dedup as new_dedup,
)
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.session import (  # noqa: E402
    get_spark,
)
from oldpkg_bench.operators import dedup as old_dedup  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "5"))

QUERIES = ("decontaminate_winnowing", "dedup_winnowing_fingerprints")


def main() -> None:
    spark = get_spark("winnow-token-hash-ab")
    spark.sparkContext.setLogLevel("ERROR")
    arms = {"old": old_dedup, "new": new_dedup}
    times: dict[str, dict[str, list[float]]] = {
        q: {a: [] for a in arms} for q in QUERIES
    }
    # warm-up both arms (JIT/codegen init untimed)
    for q in QUERIES:
        for mod in arms.values():
            getattr(mod, q)(spark, SF).write.format("noop").mode("overwrite").save()
    for rep in range(REPS):
        for q in QUERIES:
            for arm, mod in arms.items():
                spark.sparkContext.setJobDescription(f"{q} [{arm}] rep {rep}")
                df = getattr(mod, q)(spark, SF)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                times[q][arm].append(round(time.perf_counter() - t0, 4))
    out = {}
    for q in QUERIES:
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
    path = os.path.join(REPO, "results", "winnow_token_hash_ab.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["queries"], indent=1))


if __name__ == "__main__":
    main()
