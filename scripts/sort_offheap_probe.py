#!/usr/bin/env python
"""Round-5 sort A/B: off-heap Tungsten and shuffle file.transferTo.

Round 4 established that shuffle-compression=on wins at 30M rows and
attributed the residual 2.3x-vs-datatable gap to the
general-shuffle-vs-in-memory-radix class difference (SCALE.md). This
probe runs the two remaining levers the round-4 verdict asked about
("Next round" #7):

  - spark.memory.offHeap.enabled + 16g: Tungsten sort buffers move
    off the JVM heap (less GC pressure during the range exchange);
  - spark.file.transferTo=false: shuffle writes go through a
    user-space buffer instead of sendfile(2), which can help when the
    shuffle dirs are tmpfs-backed.

Same methodology as scripts/sort_tuning_probe.py: one fresh JVM per
config (these flags are cluster-static), 30M-row two-column sort,
median of 3 noop-forced runs after a warm-up.

Usage: python scripts/sort_offheap_probe.py [n_rows]
Writes one JSON line per config to stdout.
"""
from __future__ import annotations

import json
import subprocess
import sys
import time

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000_000

WORKER = """
import json, statistics, sys, time
sys.path.insert(0, "/root/repo")
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.session import get_spark
from pyspark.sql import functions as F

conf = json.loads(sys.argv[1])
rows = int(sys.argv[2])
n_part = int(conf.pop("_n_part"))
spark = get_spark("offheapprobe", cpus=32, shuffle_partitions=n_part, extra_conf=conf)
spark.sparkContext.setLogLevel("ERROR")

df = (
    spark.range(rows)
    .select(
        F.col("id").alias("k"),
        F.pmod(F.xxhash64("id"), F.lit(1_000_000_000)).alias("v"),
    )
    .persist()
)
df.count()

def force(d):
    d.write.format("noop").mode("overwrite").save()

def timed(build):
    force(build())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        force(build())
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 3)

plain = timed(lambda: df.orderBy("v", "k"))
print(json.dumps({"plain_sort": plain}), flush=True)
spark.stop()
"""

CONFIGS = [
    {"_n_part": "32", "_label": "baseline"},
    {
        "_n_part": "32",
        "_label": "offheap16g",
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "16g",
    },
    {"_n_part": "32", "_label": "transferTo_off", "spark.file.transferTo": "false"},
    {
        "_n_part": "32",
        "_label": "offheap16g+transferTo_off",
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "16g",
        "spark.file.transferTo": "false",
    },
]

for conf in CONFIGS:
    label = conf.pop("_label")
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-c", WORKER, json.dumps(conf), str(ROWS)],
        capture_output=True,
        text=True,
        timeout=900,
    )
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else None
    try:
        res = json.loads(line)
    except (TypeError, json.JSONDecodeError):
        res = {"error": (out.stderr or "no output")[-400:]}
    print(
        json.dumps({"label": label, "conf": conf, "rows": ROWS, **res, "wall": round(time.time() - t0, 1)}),
        flush=True,
    )
