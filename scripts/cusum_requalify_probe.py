"""Quiet-window re-qualification of the round-6 residual regressions.

VERDICT r6 left exactly one `perf_weak` flag: `cusum_changepoint_by_type`
rose 0.66s (r5 driver run) -> 0.94s (r6 driver run, 1.42x) with the
operator byte-identical across the window (git: timeseries.py unchanged
r5->r6); `ewma_customer_orders` drifted 0.68 -> 0.75s in the same runs.
The documented host contention waves hit whole trial batches (SCALE.md
"Contention-wave anatomy"), so a single driver reading proves nothing
either way — the r6 verdict asked for a fresh-JVM re-proof with an
interleaved CONTROL query so a wave that spans the probe is visible in
the control's numbers instead of silently inflating the suspects.

Design: N fresh JVMs (default 3); inside each JVM the suspects and the
control (`groupby_mean` — a cache-resident JVM-side agg that historic
waves moved least) run interleaved, median+min of REPS noop-forced
runs each. Verdict rule, pinned before running:
  - suspect min-across-JVMs within ~15% of its r5 rebaseline value
    AND control flat  -> noise confirmed, weak flag cleared;
  - suspect inflated in EVERY JVM while control stays flat -> real
    regression, open a named bottleneck investigation.

Round-7 result (3 fresh JVMs, sf0.1, local[32], committed to
results/cusum_ewma_requalify.json): NOISE CONFIRMED — see SCALE.md
"Round-7 regression triage" for the numbers.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

SUSPECTS = ("cusum_changepoint_by_type", "ewma_customer_orders")
CONTROL = "groupby_mean"
REPS = 5
JVMS = int(os.environ.get("SPARK_GRAFT_REQUALIFY_JVMS", "3"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_child() -> None:
    sys.path.insert(0, REPO)
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import get_spark
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.registry import REGISTRY

    spark = get_spark("cusum-requalify")
    spark.sparkContext.setLogLevel("ERROR")
    names = [CONTROL, *SUSPECTS]
    for name in names:  # warm-up pass for every query first
        REGISTRY[name][0](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    times: dict[str, list[float]] = {n: [] for n in names}
    # interleave rep-by-rep so a wave covers all queries equally
    for _ in range(REPS):
        for name in names:
            df = REGISTRY[name][0](spark, SF_DIR)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
    out = {
        n: {"median": round(statistics.median(ts), 3), "min": round(min(ts), 3)}
        for n, ts in times.items()
    }
    print(json.dumps(out))


def main() -> None:
    jvms = []
    for i in range(JVMS):
        proc = subprocess.run(
            [sys.executable, __file__, "--child"],
            capture_output=True,
            text=True,
            timeout=900,
        )
        if proc.returncode != 0 or not proc.stdout.strip():
            sys.stderr.write(proc.stderr)
            raise RuntimeError(f"child JVM {i} failed (rc={proc.returncode}); stderr above")
        jvms.append(json.loads(proc.stdout.strip().splitlines()[-1]))
        print(f"jvm {i}: {jvms[-1]}", file=sys.stderr)
    result = {
        "sf_dir": SF_DIR,
        "reps": REPS,
        "jvms": jvms,
        "min_across_jvms": {
            n: min(j[n]["min"] for j in jvms) for n in (CONTROL, *SUSPECTS)
        },
        "median_of_medians": {
            n: round(statistics.median([j[n]["median"] for j in jvms]), 3)
            for n in (CONTROL, *SUSPECTS)
        },
    }
    path = os.path.join(REPO, "results", "cusum_ewma_requalify.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    print(f"-> {path}", file=sys.stderr)


if __name__ == "__main__":
    if "--child" in sys.argv:
        run_child()
    else:
        main()
