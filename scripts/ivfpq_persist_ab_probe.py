"""Fresh-JVM A/B: does the round-6 ivfpq persist actually pay?

The r6 persist of ivfpq's shared input (scan + repartition + norm
fold, five downstream consumers) moved the wall-clock bench only 0.5%
— inside wave noise — so VERDICT r6 "Next round" #4 asked for the win
to be pinned structurally (done: tests/test_plans.py::
test_ivfpq_shares_one_cached_embeddings_scan) AND measured honestly.
This probe is the measurement: alternating fresh JVMs run
`ivfpq_ann_topk` at sf0.1 with the persist on vs off (the off arm
sets SPARK_GRAFT_IVFPQ_NO_PERSIST=1; the on arm zeroes the r8 size
gate via SPARK_GRAFT_IVFPQ_PERSIST_MIN_BYTES=0, since at fixture
scale the gate keeps the persist off by default — VERDICT r7 #4),
median+min of REPS noop-forced runs per arm, two arms per setting to
average host drift.

Result (round 7, committed to results/ivfpq_persist_ab.json): see
SCALE.md "IVF-PQ persist A/B".
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPS = 5
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_arm(no_persist: str) -> None:
    sys.path.insert(0, REPO)
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import get_spark
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.registry import REGISTRY

    spark = get_spark("ivfpq-ab")
    spark.sparkContext.setLogLevel("ERROR")
    fn = REGISTRY["ivfpq_ann_topk"][0]
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm
    ts = []
    for _ in range(REPS):
        # a fresh DataFrame each rep, exactly like bench.py; the cache
        # entry (on arm) is keyed on the canonical plan so reps share it
        df = fn(spark, SF_DIR)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    print(json.dumps({
        "no_persist": no_persist,
        "median": round(statistics.median(ts), 3),
        "min": round(min(ts), 3),
    }))


def run_within_jvm() -> None:
    """Alternate persist/no-persist blocks INSIDE one JVM: the host's
    contention waves span minutes, so adjacent blocks share the same
    window and the comparison controls for drift that separate fresh
    JVMs cannot. spark.catalog.clearCache() between blocks is
    load-bearing twice over: it makes the on-arm rebuild its cache
    (no free ride from the previous block), and it stops the OFF arm
    from silently matching the cached InMemoryRelation by canonical
    plan — without it the off arm IS the on arm."""
    sys.path.insert(0, REPO)
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import get_spark
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.registry import REGISTRY

    spark = get_spark("ivfpq-ab")
    spark.sparkContext.setLogLevel("ERROR")
    fn = REGISTRY["ivfpq_ann_topk"][0]
    blocks = []
    for no_persist in ("0", "1", "0", "1", "0", "1"):
        os.environ["SPARK_GRAFT_IVFPQ_NO_PERSIST"] = no_persist
        # force the r8 size gate open on the ON arm so the A/B still
        # measures persist-vs-not at fixture scale (the gate's default
        # keeps it off below 64 MiB precisely because of this probe)
        os.environ["SPARK_GRAFT_IVFPQ_PERSIST_MIN_BYTES"] = "0"
        spark.catalog.clearCache()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm
        ts = []
        for _ in range(3):
            df = fn(spark, SF_DIR)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        blocks.append({
            "no_persist": no_persist,
            "median": round(statistics.median(ts), 3),
            "min": round(min(ts), 3),
        })
        print(f"block no_persist={no_persist}: {blocks[-1]}", file=sys.stderr)
    result = {"sf_dir": SF_DIR, "mode": "within_jvm", "blocks": blocks}
    for key, label in (("0", "persist"), ("1", "no_persist")):
        vals = [b["median"] for b in blocks if b["no_persist"] == key]
        result[label + "_medians"] = vals
    path = os.path.join(REPO, "results", "ivfpq_persist_ab_within.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


def main() -> None:
    arms = []
    for no_persist in ("0", "1", "0", "1"):  # alternate to average drift
        env = dict(
            os.environ,
            SPARK_GRAFT_IVFPQ_NO_PERSIST=no_persist,
            SPARK_GRAFT_IVFPQ_PERSIST_MIN_BYTES="0",  # gate open on the ON arm
        )
        proc = subprocess.run(
            [sys.executable, __file__, "--arm", no_persist],
            capture_output=True,
            text=True,
            timeout=900,
            env=env,
        )
        if proc.returncode != 0 or not proc.stdout.strip():
            sys.stderr.write(proc.stderr)
            raise RuntimeError(f"arm failed (rc={proc.returncode}); stderr above")
        arms.append(json.loads(proc.stdout.strip().splitlines()[-1]))
        print(f"arm no_persist={no_persist}: {arms[-1]}", file=sys.stderr)
    result = {"sf_dir": SF_DIR, "reps": REPS, "arms": arms}
    for key, label in (("0", "persist"), ("1", "no_persist")):
        vals = [a["median"] for a in arms if a["no_persist"] == key]
        result[label + "_median_range"] = [min(vals), max(vals)]
    path = os.path.join(REPO, "results", "ivfpq_persist_ab.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    print(f"-> {path}", file=sys.stderr)


if __name__ == "__main__":
    if "--arm" in sys.argv:
        run_arm(sys.argv[sys.argv.index("--arm") + 1])
    elif "--within" in sys.argv:
        run_within_jvm()
    else:
        main()
