#!/usr/bin/env python
"""IVF-PQ stored-index timing requalification (VERDICT r12 #3).

`ivfpq_ann_topk` (the per-session recompute variant) was the
widest-spread query in the r11 suite: min 1.93 s vs contended 14.4 s,
because every run rebuilt the index and the rebuild rode the host's
contention waves. With the index STORED (r12,
similarity._ensure_ivfpq_index_table), probes should be pure bucket
reads and the spread should collapse to probe-only variance. This
probe pins that: N fresh JVMs; inside each, a warm-up pass (which
also builds/loads the stored tables via the persistent metastore, so
the timed reps never pay the build) then interleaved reps of the
stored-index family — `ivfpq_ann_topk_bucketed`,
`ivf_within_list_nn`, and the r13 third consumer `semdedup_apply` —
plus the pure-JVM control (groupby_mean) for wave visibility.

Verdict rule, pinned BEFORE running: per query, spread =
max(median over JVMs) / min(median over JVMs); normalized spread =
spread / control_spread. PASS (hot-JVM flag retired) iff normalized
spread < 1.3 for both r12 queries; semdedup_apply is recorded for
the record (it has no prior flag).

Writes results/ivfpq_requalify_{TAG}.json
(SPARK_GRAFT_REQUALIFY_TAG, default "adhoc" so a bare rerun can
never clobber a committed round artifact).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

QUERIES = ("ivfpq_ann_topk_bucketed", "ivf_within_list_nn", "semdedup_apply")
FLAGGED = ("ivfpq_ann_topk_bucketed", "ivf_within_list_nn")
CONTROL = "groupby_mean"
SPREAD_CEIL = 1.3
REPS = 5
JVMS = int(os.environ.get("SPARK_GRAFT_REQUALIFY_JVMS", "3"))
TAG = os.environ.get("SPARK_GRAFT_REQUALIFY_TAG", "adhoc")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_child() -> None:
    sys.path.insert(0, REPO)
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import get_spark
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.registry import REGISTRY

    spark = get_spark("ivfpq-requalify")
    spark.sparkContext.setLogLevel("ERROR")
    names = [CONTROL, *QUERIES]
    for name in names:  # warm-up: JIT + stored-index build/load, untimed
        REGISTRY[name][0](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(REPS):  # interleave rep-by-rep (wave-evening)
        for name in names:
            df = REGISTRY[name][0](spark, SF_DIR)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
    out = {
        n: {"median": round(statistics.median(ts), 4), "min": round(min(ts), 4)}
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
            timeout=1800,
        )
        if proc.returncode != 0 or not proc.stdout.strip():
            sys.stderr.write(proc.stderr)
            raise RuntimeError(f"child JVM {i} failed (rc={proc.returncode})")
        jvms.append(json.loads(proc.stdout.strip().splitlines()[-1]))
        print(f"jvm {i}: {jvms[-1]}", file=sys.stderr)

    def spread(name: str) -> float:
        meds = [j[name]["median"] for j in jvms]
        return max(meds) / min(meds)

    control_spread = spread(CONTROL)
    verdicts = {}
    for name in QUERIES:
        s = spread(name)
        norm = round(s / control_spread, 3)
        verdicts[name] = {
            "medians_per_jvm": [j[name]["median"] for j in jvms],
            "spread": round(s, 3),
            "normalized_spread": norm,
            "flag_retired": bool(norm < SPREAD_CEIL) if name in FLAGGED else None,
        }
    result = {
        "sf_dir": SF_DIR,
        "reps": REPS,
        "jvms_raw": jvms,
        "control": CONTROL,
        "control_spread": round(control_spread, 3),
        "spread_ceil": SPREAD_CEIL,
        "verdicts": verdicts,
        "rule": (
            "per query: spread = max/min of per-JVM medians, normalized by "
            "the control's spread; hot-JVM flag retired iff normalized "
            "spread < 1.3 for both r12 stored-index queries"
        ),
    }
    path = os.path.join(REPO, "results", f"ivfpq_requalify_{TAG}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps({n: v["normalized_spread"] for n, v in verdicts.items()}))
    print(f"-> {path}", file=sys.stderr)


if __name__ == "__main__":
    if "--child" in sys.argv:
        run_child()
    else:
        main()
