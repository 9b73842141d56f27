#!/usr/bin/env python
"""B13 sort: the VERDICT r12 #2 named-lever sweep — the last probe
before either landing sort <= 1.38 s (2x the best reference engine)
or certifying the floor as structural.

Levers named by the r12 verdict, each measured on the exact B13
fixture (diabetes-shaped seed, S6 duplication to 30.3M rows,
repartition(width), cached+counted off the timed path):

- **radix path confirmation** (differential, not introspection):
  Spark uses its cache-friendly radix sort iff the sort has ONE key
  whose 8-byte prefix fully covers it (SortPrefixUtils
  .canSortFullyWithPrefix) and spark.sql.sort.enableRadixSort is on
  (default). An IntegerType key — nullable or not — is fully
  prefix-covered, so the nullable `Pregnancies` key should already
  take radix; `radix_off` measures the same sort with the flag off.
  If baseline != radix_off, the radix path is confirmed taken (and
  already priced into the 2.10x); if baseline == radix_off the radix
  claim was wrong and the key shape needs fixing.
- **non-null / int64 key variants** (in every JVM): `sort_nonnull`
  orders by coalesce(Pregnancies, 0) (non-nullable expression) and
  `sort_longkey` by a precomputed non-null BIGINT column — the two
  key shapes the verdict asked to try against a silent
  comparison-sort fallback.
- **shuffle-width sweep**: the 0.988 s exchange floor was measured
  at width 32 only. Arms at 16/64/128 move ALL THREE widths together
  (fixture repartition, spark.sql.shuffle.partitions, floor arm) per
  the ADVICE r10 rule.
- **sortBeforeRepartition off**: round-robin repartition() — the
  exchange-floor datum itself — LOCALLY SORTS every partition by
  default for deterministic retries (SPARK-23207). If the floor
  drops with it off, the committed "exchange floor" has been
  overstating the pure-exchange cost and the certificate must quote
  the corrected number.
- **off-heap Tungsten**: spark.memory.offHeap.{enabled,size} moves
  sort buffers off the JVM heap.

Method: one FRESH JVM per arm (cluster-static flags), 1 warm-up +
3 timed reps per variant, medians and mins kept; baseline first AND
last so host drift across the ~25-minute probe is visible in the
artifact. Writes results/sort_floor_probe.json incrementally (a
worker timeout must not discard collected arms — ADVICE r10).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROWS = 30_300_000

WORKER = r"""
import json, statistics, sys, time

sys.path.insert(0, sys.argv[3])
from pyspark.sql import functions as F

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import get_spark

conf = json.loads(sys.argv[1])
rows = int(sys.argv[2])
width = int(conf.pop("_width", 32))
spark = get_spark("sortfloorprobe", cpus=32, shuffle_partitions=width, extra_conf=conf)
spark.sparkContext.setLogLevel("ERROR")

sys.path.insert(0, sys.argv[3] + "/scripts")
from b13_benchmark import DUP_K, diabetes_shaped_seed

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.sources import generators

df = (
    generators.duplicate_rows(diabetes_shaped_seed(spark), DUP_K)
    .limit(rows)
    .repartition(width)
    .cache()
)
df.count()  # materialize off the timed path

def force(d):
    d.write.format("noop").mode("overwrite").save()

def timed(build):
    force(build())  # warm-up
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        force(build())
        ts.append(time.perf_counter() - t0)
    return {"median": round(statistics.median(ts), 3), "min": round(min(ts), 3)}

out = {
    "sort": timed(lambda: df.orderBy("Pregnancies")),
    "sort_nonnull": timed(
        lambda: df.orderBy(F.coalesce(F.col("Pregnancies"), F.lit(0)))
    ),
    "sort_longkey": timed(
        lambda: df.withColumn(
            "k", F.coalesce(F.col("Pregnancies").cast("long"), F.lit(0))
        ).orderBy("k")
    ),
    "exchange_floor": timed(lambda: df.repartition(width)),
}
print(json.dumps(out), flush=True)
spark.stop()
"""

CONFIGS = [
    {"_label": "baseline_open"},
    {"_label": "radix_off", "spark.sql.sort.enableRadixSort": "false"},
    {"_label": "width16", "_width": 16},
    {"_label": "width64", "_width": 64},
    {"_label": "width128", "_width": 128},
    {
        "_label": "sbr_off",
        "spark.sql.execution.sortBeforeRepartition": "false",
    },
    {
        "_label": "offheap8g",
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "8g",
    },
    {"_label": "baseline_close"},
]


def _write(out_path: str, results: list, partial: bool) -> None:
    with open(out_path, "w") as f:
        json.dump(
            {
                "note": (
                    "fresh JVM per arm on the exact B13 fixture; 1 warm-up + 3 "
                    "reps per variant; baseline first AND last for host drift; "
                    "sort variants: nullable-int key / non-null coalesce key / "
                    "precomputed non-null int64 key; exchange_floor = "
                    "round-robin repartition(width) (NOTE: locally sorts by "
                    "default — see the sbr_off arm for the pure-exchange cost)"
                ),
                "rows": ROWS,
                "partial": partial,
                "results": results,
            },
            f,
            indent=1,
        )
        f.write("\n")


def main() -> None:
    out_path = os.path.join(REPO, "results", "sort_floor_probe.json")
    results = []
    for conf in CONFIGS:
        conf = dict(conf)
        label = conf.pop("_label")
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-c", WORKER, json.dumps(conf), str(ROWS), REPO],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        if proc.returncode != 0:
            print(proc.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"worker failed for {label}")
        res = json.loads(proc.stdout.strip().splitlines()[-1])
        row = {"label": label, "conf": conf, "wall": round(time.time() - t0, 1), **res}
        results.append(row)
        print(json.dumps(row), flush=True)
        _write(out_path, results, partial=len(results) < len(CONFIGS))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
