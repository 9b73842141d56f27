#!/usr/bin/env python
"""AQE skew-join A/B at 30M rows — measuring the straggler rescue.

tests/test_plans.py pins that AQE marks the skewed SMJ partition
(skew=true); this probe measures what that is worth. Fact: 30M rows,
2/3 on ONE hot key — the adversarial shape, one post-shuffle partition
holding two thirds of the table — with the rest uniform over 1M keys.
The hot partition's payload is deliberately incompressible (~480MB
post-shuffle, past the default 256MB
skewedPartitionThresholdInBytes): AQE detects skew on COMPRESSED
shuffle bytes, so compressible or 50%-hot variants stayed under the
threshold and never split. Dim: 1M keys, forced out of broadcast
range. Same join + global agg, fresh JVM per config, median of 3
noop-forced runs:

  A: AQE skew-join ON (the repo default, session.py)
  B: AQE skew-join OFF (what a static planner would do)

The delta is the straggler task: without the split, one task sorts
and joins 20M rows while 31 cores idle. Salting (salted_skew_agg)
remains the author-side answer when the downstream op needs the key
partitioning AQE won't break.

Run: python scripts/skew_join_probe.py [n_rows]
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
conf["spark.sql.autoBroadcastJoinThreshold"] = "-1"
spark = get_spark("skewprobe", cpus=32, shuffle_partitions=32, extra_conf=conf)
spark.sparkContext.setLogLevel("ERROR")

fact = spark.range(rows).select(
    F.when(F.col("id") % 3 < 2, F.lit(0))
    .otherwise(F.pmod(F.xxhash64("id"), F.lit(1_000_000)))
    .alias("k"),
    F.pmod(F.xxhash64("id"), F.lit(1_000_000_000)).alias("v"),
    F.xxhash64("id", "id").alias("pad"),  # incompressible ballast: the
    # cycling-v first cut lz4-compressed the hot partition under the
    # 256MB skew threshold and the split never fired
).persist()
fact.count()
dim = spark.range(1_000_000).select(
    F.col("id").alias("k"), F.pmod(F.xxhash64("id"), F.lit(100)).alias("w")
).persist()
dim.count()

def force(d):
    d.write.format("noop").mode("overwrite").save()

def build():
    return fact.join(dim, "k").agg(F.sum(F.col("v") + F.col("w") + F.pmod(F.col("pad"), F.lit(1000))).alias("s"))

force(build())
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    force(build())
    ts.append(time.perf_counter() - t0)
probe_df = build()
probe_df.collect()  # AQE final plan exists only after execution
plan = probe_df._jdf.queryExecution().executedPlan().toString()
print(json.dumps({"join_agg": round(statistics.median(ts), 3),
                  "skew_marked": "skew=true" in plan}), flush=True)
spark.stop()
"""

CONFIGS = [
    {"_label": "aqe_skew_on"},
    {"_label": "aqe_skew_off", "spark.sql.adaptive.skewJoin.enabled": "false"},
]

for conf in CONFIGS:
    label = conf.pop("_label")
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-c", WORKER, json.dumps(conf), str(ROWS)],
        capture_output=True,
        text=True,
        timeout=1200,
    )
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else None
    try:
        res = json.loads(line)
    except (TypeError, json.JSONDecodeError):
        res = {"error": (out.stderr or "no output")[-400:]}
    print(json.dumps({"label": label, "rows": ROWS, **res, "wall": round(time.time() - t0, 1)}), flush=True)
