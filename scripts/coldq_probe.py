#!/usr/bin/env python
"""Cold-JVM per-query scaling probe: time registry queries in FRESH
JVMs at chosen core counts (driver-contract style: local[N], one
warm-up rep, median of REPS noop-sink runs).

Usage:
  python scripts/coldq_probe.py q1[,q2,...] [cpus[,cpus...]] [jvms]

Defaults: cpus "32,8", 1 JVM per (query-set, cpus) pair. Prints one
JSON object; callers redirect to an artifact. Env:
  SPARK_GRAFT_PROBE_REPS (default 5), SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "5"))


def run_child(queries: list[str], cpus: int) -> None:
    sys.path.insert(0, REPO)
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.registry import (
        REGISTRY,
    )
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.session import (
        get_spark,
    )

    spark = get_spark("coldq-probe", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for name in queries:
        fn = REGISTRY[name][0]
        fn(spark, SF).write.format("noop").mode("overwrite").save()  # warm-up
        ts = []
        for rep in range(REPS):
            spark.sparkContext.setJobDescription(f"{name} c{cpus} rep {rep}")
            df = fn(spark, SF)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 4))
        out[name] = {"median": round(statistics.median(ts), 4), "reps": ts}
    print(json.dumps(out))


def main() -> None:
    if len(sys.argv) > 3 and sys.argv[1] == "--child":
        run_child(sys.argv[2].split(","), int(sys.argv[3]))
        return
    queries = sys.argv[1].split(",")
    cpus_list = [int(c) for c in (sys.argv[2] if len(sys.argv) > 2 else "32,8").split(",")]
    jvms = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    result: dict[str, list] = {f"c{c}": [] for c in cpus_list}
    for cpus in cpus_list:
        for _ in range(jvms):
            proc = subprocess.run(
                [sys.executable, __file__, "--child", ",".join(queries), str(cpus)],
                capture_output=True,
                text=True,
                timeout=3600,
            )
            if proc.returncode != 0 or not proc.stdout.strip():
                sys.stderr.write(proc.stderr[-2000:])
                raise RuntimeError(f"child failed at cpus={cpus}")
            result[f"c{cpus}"].append(json.loads(proc.stdout.strip().splitlines()[-1]))
    print(json.dumps({"sf_dir": SF, "reps": REPS, "timings": result}, indent=1))


if __name__ == "__main__":
    main()
