#!/usr/bin/env python
"""Sort-path tuning probe: is the 30M-row full-sort gap vs datatable's
radix sort (BASELINE B2: 0.69 s) closable with shuffle-transport
tuning that is legitimate for a single-node/tmpfs deployment?

Matrix: {shuffle compression on/off} x {range partitions 32/64} over a
30M-row two-column sort (the sort_asc_rank shape minus rank overhead,
plus global_rank for the full operator). Each cell: median of 3
noop-forced runs in ONE fresh JVM per config (compression flags are
cluster-static, not per-query).

Usage: python scripts/sort_tuning_probe.py [n_rows]
Writes one JSON line per config to stdout.
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000_000

WORKER = """
import json, statistics, sys, time
sys.path.insert(0, "/root/repo")
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.session import get_spark
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.operators.core import global_rank
from pyspark.sql import functions as F

conf = json.loads(sys.argv[1])
rows = int(sys.argv[2])
n_part = int(conf.pop("_n_part"))
spark = get_spark("sortprobe", cpus=32, shuffle_partitions=n_part, extra_conf=conf)
spark.sparkContext.setLogLevel("ERROR")

df = (
    spark.range(rows)
    .select(
        F.col("id").alias("k"),
        F.pmod(F.xxhash64("id"), F.lit(1_000_000_000)).alias("v"),
    )
    .persist()
)
df.count()  # materialize input off the timed path

def force(d):
    d.write.format("noop").mode("overwrite").save()

def timed(build):
    force(build())  # warm-up
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        force(build())
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 3)

plain = timed(lambda: df.orderBy("v", "k"))
ranked = timed(lambda: global_rank(df, [F.col("v").asc(), F.col("k").asc()], num_partitions=n_part))
print(json.dumps({"plain_sort": plain, "global_rank": ranked}), flush=True)
spark.stop()
"""

CONFIGS = [
    {"_n_part": "32"},
    {"_n_part": "64"},
    {"_n_part": "32", "spark.shuffle.compress": "false", "spark.shuffle.spill.compress": "false"},
    {"_n_part": "64", "spark.shuffle.compress": "false", "spark.shuffle.spill.compress": "false"},
    {"_n_part": "32", "spark.io.compression.codec": "snappy"},
]

for conf in CONFIGS:
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
    print(json.dumps({"conf": conf, "rows": ROWS, **res, "wall": round(time.time() - t0, 1)}), flush=True)
