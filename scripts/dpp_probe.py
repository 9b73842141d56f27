#!/usr/bin/env python
"""Dynamic partition pruning A/B at 30M rows — measuring the scan cut.

tests/test_plans.py pins that the DPP join injects a runtime
PartitionFilters subquery; this probe measures it. A 30M-row fact is
written partitioned by 100 date keys; the dim filter selects 5 of
them. The same dim-filtered join then runs with DPP on (repo
default) vs off, fresh JVM per config, median of 3:

- with DPP, the fact scan reads 5/100 partitions — the dim's keys
  are computed first and pushed into the fact's partition filter at
  runtime (a literal IN-list could do this statically; DPP does it
  when the keys are only known from another table's data);
- without, all 100 partitions are scanned and 95% of rows die in the
  join.

At 100 TB, "read 5% of the table" IS the query plan that matters —
partition layout + DPP replace an index.

Run: python scripts/dpp_probe.py [n_rows]
"""
from __future__ import annotations

import json
import subprocess
import sys
import time

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000_000

WORKER = """
import json, os, shutil, statistics, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.session import get_spark
from pyspark.sql import functions as F

conf = json.loads(sys.argv[1])
rows = int(sys.argv[2])
fact_dir = sys.argv[3]
spark = get_spark("dppprobe", cpus=32, shuffle_partitions=32, extra_conf=conf)
spark.sparkContext.setLogLevel("ERROR")

if not os.path.exists(os.path.join(fact_dir, "_SUCCESS")):
    (
        spark.range(rows)
        .select(
            (F.col("id") % 100).alias("d"),
            F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("k"),
            F.pmod(F.xxhash64("id", "id"), F.lit(1_000_000_000)).alias("v"),
            *[F.pmod(F.xxhash64("id", F.lit(i)), F.lit(1_000_000_000)).alias(f"p{i}")
              for i in range(6)],
        )
        # 4 files per date dir: a pruned scan must not collapse to
        # n_dates tasks, or lost decode parallelism on this 32-core
        # box masks the bytes it saved (measured: 10-file pruned scan
        # slower than 100-task full scan from page cache)
        .withColumn("salt", F.pmod(F.xxhash64("k", F.lit(99)), F.lit(4)))
        .repartition(400, "d", "salt")
        .drop("salt")
        .write.mode("overwrite")
        .partitionBy("d")
        .parquet(fact_dir)
    )

# The dim MUST be materialized and read back: a generated dim whose
# filter column is an expression of the join key lets Catalyst infer
# the partition predicate STATICALLY through the join equality (the
# first cut of this probe did exactly that — both configs were pruned
# and "DPP" measured as pure overhead). After a parquet round-trip
# the provenance is gone and only runtime DPP can prune the fact.
dim_dir = fact_dir + "_dim"
if not os.path.exists(os.path.join(dim_dir, "_SUCCESS")):
    (
        spark.range(100)
        .select(F.col("id").alias("d"),
                F.pmod(F.xxhash64("id"), F.lit(10)).alias("grp"))
        .coalesce(1).write.mode("overwrite").parquet(dim_dir)
    )
dim = spark.read.parquet(dim_dir).filter(F.col("grp") == 3)
n_dates = dim.count()

def force(d):
    d.write.format("noop").mode("overwrite").save()

def build():
    fact = spark.read.parquet(fact_dir)
    return fact.join(dim.hint("broadcast"), "d").agg(
        F.sum("v").alias("s"), F.count("*").alias("n"),
        *[F.sum(f"p{i}").alias(f"sp{i}") for i in range(6)]
    )

force(build())
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    force(build())
    ts.append(time.perf_counter() - t0)
probe = build()
row = probe.collect()[0]
plan = probe._jdf.queryExecution().executedPlan().toString()
print(json.dumps({
    "join_agg": round(statistics.median(ts), 3),
    "n_dates": n_dates,
    "rows_joined": row["n"],
    "checksum": row["s"],
    "dpp_in_plan": "dynamicpruning" in plan.lower(),
    "static_prune_leak": "pmod" in plan.split("PartitionFilters", 1)[1].split("]")[0] if "PartitionFilters" in plan else False,
}), flush=True)
spark.stop()
"""

CONFIGS = [
    {"_label": "dpp_on"},
    {"_label": "dpp_off", "spark.sql.optimizer.dynamicPartitionPruning.enabled": "false"},
]

import os
import shutil
import tempfile

fact_dir = os.path.join(tempfile.gettempdir(), "dpp_probe_fact")
for conf in CONFIGS:
    label = conf.pop("_label")
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-c", WORKER, json.dumps(conf), str(ROWS), fact_dir],
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
shutil.rmtree(fact_dir, ignore_errors=True)
