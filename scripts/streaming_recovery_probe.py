#!/usr/bin/env python
"""Checkpoint-recovery probe — kill the streaming session window
mid-stream, restart from the checkpoint, and require the file-sink
output to EXACTLY equal batch truth (exactly-once across the restart).

The multi-batch probes certify incremental semantics in one query
lifetime; production also needs the other half of the contract:
driver loss. This probe replays the burst fixture (as in
scripts/streaming_scale_probe.py) through the watermarked session
window into a PARQUET sink with a checkpoint, stops the query
after roughly half the micro-batches, starts a NEW query on the same
checkpoint + output path, and drains the rest. The parquet output
must equal the batch sessionization under the final-watermark
predicate with zero spurious / zero missing rows:

- missing rows would mean lost state or lost offsets at restart;
- spurious rows would mean replayed batches were double-committed —
  the file sink's manifest (checkpointed batch id -> files) is what
  makes re-execution idempotent, and this is the check that proves it.

Run: python scripts/streaming_recovery_probe.py [n_users] [bursts] [events_per_burst]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import get_spark

N_USERS = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
BURSTS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
PER_BURST = int(sys.argv[3]) if len(sys.argv) > 3 else 5
N_SLICES = 20
STOP_AFTER_BATCH = 9
GAP_S = 1800
WATERMARK_S = 3600


def build_events(spark):
    n = N_USERS * BURSTS * PER_BURST
    df = spark.range(n).select(
        (F.col("id") % N_USERS).alias("user_id"),
        ((F.col("id") / N_USERS).cast("long") % BURSTS).alias("burst"),
        (F.col("id") / (N_USERS * BURSTS)).cast("long").alias("k"),
    )
    ts_s = (
        F.lit(1_700_000_000)
        + F.col("burst") * (36 * 3600)
        + F.pmod(F.xxhash64("user_id"), F.lit(30 * 3600))
        + F.col("k") * 300
    )
    return df.select("user_id", F.timestamp_seconds(ts_s).alias("ts"))


def main() -> None:
    spark = get_spark("streaming-recovery", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="srecov_probe_")
    src = os.path.join(work, "stream")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(src)

    ev = build_events(spark).persist()
    n = ev.count()
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo).total_seconds()
    for i in range(N_SLICES):
        a = F.lit(lo) + F.expr(f"INTERVAL {int(span * i / N_SLICES)} SECONDS")
        end_s = int(span * (i + 1) / N_SLICES) if i < N_SLICES - 1 else int(span) + 1
        b = F.lit(lo) + F.expr(f"INTERVAL {end_s} SECONDS")
        (
            ev.filter((F.col("ts") >= a) & (F.col("ts") < b))
            .repartition(1)
            .write.mode("overwrite")
            .parquet(os.path.join(src, f"slice_{i:02d}"))
        )

    def start_query():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*.parquet")
            .parquet(src)
        )
        agg = (
            stream.withWatermark("ts", f"{WATERMARK_S} seconds")
            .groupBy(F.session_window("ts", f"{GAP_S} seconds"), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select(
                F.col("session_window.start").alias("session_start"),
                "user_id",
                "n_events",
            )
        )
        return (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )

    # first life: stop after ~half the slices have been committed
    t0 = time.time()
    q1 = start_query()
    killed_at = -1
    while time.time() - t0 < 600:
        p = q1.lastProgress
        if p is not None and p.get("batchId", -1) >= STOP_AFTER_BATCH:
            killed_at = p["batchId"]
            break
        time.sleep(0.2)
    q1.stop()
    print(f"first life stopped after batch {killed_at}", file=sys.stderr)

    # second life: same checkpoint + sink; drain the rest
    q2 = start_query()
    q2.processAllAvailable()
    q2.stop()
    drain_s = time.time() - t0

    emitted = spark.read.parquet(out_dir).persist()
    n_emitted = emitted.count()

    w = Window.partitionBy("user_id").orderBy("ts")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    new_s = F.when(gap_us.isNull() | (gap_us >= GAP_S * 1_000_000), 1).otherwise(0)
    sess = (
        ev.withColumn("sid", F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.timestamp_seconds(F.unix_seconds(F.max("ts")) + GAP_S).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .filter(
            F.col("session_end")
            <= F.timestamp_seconds(F.lit(int(hi.timestamp())) - WATERMARK_S)
        )
        .select("session_start", "user_id", "n_events")
        .persist()
    )
    n_truth = sess.count()
    extra = emitted.join(sess, ["session_start", "user_id", "n_events"], "left_anti").count()
    missing = sess.join(emitted, ["session_start", "user_id", "n_events"], "left_anti").count()

    print(
        json.dumps(
            {
                "events": n,
                "killed_after_batch": killed_at,
                "total_s": round(drain_s, 1),
                "emitted_sessions": n_emitted,
                "truth_sessions": n_truth,
                "spurious": extra,
                "missing": missing,
                "exactly_once_across_restart": extra == 0
                and missing == 0
                and n_emitted == n_truth
                and killed_at >= 0,
            }
        )
    )
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
