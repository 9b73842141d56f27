#!/usr/bin/env python
"""Multi-batch streaming session-window probe — watermark semantics
at 10M events across 20 real micro-batches.

The registry's streaming queries drain the single-file fixtures in one
micro-batch, which proves plan shape but not the incremental path.
This probe builds a 10M-event burst-structured stream (100k users x
20 bursts x 5 events, bursts >30 min apart, 5-minute intra-burst
steps over 30 days), lands it as 20 time-sliced parquet files, and
replays it with maxFilesPerTrigger=1 — 20 micro-batches in event-time
order, so session state is built, merged, watermarked and evicted
incrementally exactly as a production deployment would.

Verification is exact, not statistical: the append-mode emitted set
must EQUAL the batch sessionization restricted to the final-watermark
predicate (end <= max(ts) - 1h) — checked by full anti-joins both
ways, plus per-session n_events equality. Also reports throughput,
the state-store row peak, and the final state after eviction
(watermark-bounded state is THE 100 TB claim for streaming).

Run: python scripts/streaming_scale_probe.py [n_users] [bursts] [events_per_burst]
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

N_USERS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
BURSTS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
PER_BURST = int(sys.argv[3]) if len(sys.argv) > 3 else 5
N_SLICES = 20
GAP_S = 1800
WATERMARK_S = 3600


def build_events(spark):
    """id -> (user, burst, k): burst starts are user-jittered and
    >30min apart; events inside a burst are 5 min apart (same
    session); all integer-second arithmetic, fully deterministic."""
    n = N_USERS * BURSTS * PER_BURST
    base = F.lit(1_700_000_000)
    df = spark.range(n).select(
        (F.col("id") % N_USERS).alias("user_id"),
        ((F.col("id") / N_USERS).cast("long") % BURSTS).alias("burst"),
        (F.col("id") / (N_USERS * BURSTS)).cast("long").alias("k"),
    )
    # burst spacing 36h, user jitter < 30h keeps bursts ordered and
    # >30min apart; 5-min steps inside a burst
    ts_s = (
        base
        + F.col("burst") * (36 * 3600)
        + F.pmod(F.xxhash64("user_id"), F.lit(30 * 3600))
        + F.col("k") * 300
    )
    return df.select(
        "user_id",
        F.timestamp_seconds(ts_s).alias("ts"),
        F.pmod(F.xxhash64("user_id", "burst", "k"), F.lit(1000)).alias("value"),
    )


def main() -> None:
    spark = get_spark("streaming-scale", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="stream_probe_")
    src = os.path.join(work, "stream")
    os.makedirs(src)

    ev = build_events(spark).persist()
    n = ev.count()
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo).total_seconds()
    t0 = time.time()
    # 20 time-slice files written oldest-first: the file source replays
    # them in mod-time order, so event time is ordered ACROSS batches
    # (disorder within a batch is what the watermark absorbs)
    for i in range(N_SLICES):
        # [a, b) with b_i == a_{i+1} exactly — the slices PARTITION the
        # events (an early +1s overlap double-counted boundary events,
        # which the exact-equality check below caught as n_events=6
        # sessions); the final slice's bound passes max(ts)
        a = F.lit(lo) + F.expr(f"INTERVAL {int(span * i / N_SLICES)} SECONDS")
        end_s = int(span * (i + 1) / N_SLICES) if i < N_SLICES - 1 else int(span) + 1
        b = F.lit(lo) + F.expr(f"INTERVAL {end_s} SECONDS")
        (
            ev.filter((F.col("ts") >= a) & (F.col("ts") < b))
            .repartition(1)
            .write.mode("overwrite")
            .parquet(os.path.join(src, f"slice_{i:02d}"))
        )
    print(f"fixture: {n:,} events in {N_SLICES} slices ({time.time() - t0:.1f}s)", file=sys.stderr)

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
    t0 = time.time()
    q = agg.writeStream.outputMode("append").format("memory").queryName("probe_sink").start()
    q.processAllAvailable()
    drain_s = time.time() - t0
    batches = 0
    state_peak = 0
    state_final = 0
    for p in q.recentProgress:
        ops = p.get("stateOperators") or []
        if ops:
            rows = ops[0].get("numRowsTotal", 0)
            state_peak = max(state_peak, rows)
            state_final = rows
        if (p.get("numInputRows") or 0) > 0:
            batches += 1
    q.stop()
    emitted = spark.table("probe_sink").persist()
    n_emitted = emitted.count()

    # exact truth: batch sessionization + final-watermark predicate
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    new_s = F.when(gap_us.isNull() | (gap_us >= GAP_S * 1_000_000), 1).otherwise(0)
    sess = (
        ev.withColumn("sid", F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            (F.timestamp_seconds(F.unix_seconds(F.max("ts")) + GAP_S)).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .filter(
            # <= : Spark evicts/emits a session whose end lands EXACTLY
            # on the final watermark (pinned empirically by
            # tests/test_semantics.py::test_session_eviction_tie_is_inclusive);
            # the oracle and the recovery probe use the same convention.
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
                "micro_batches": batches,
                "drain_s": round(drain_s, 1),
                "events_per_s": int(n / drain_s),
                "emitted_sessions": n_emitted,
                "truth_sessions": n_truth,
                "spurious": extra,
                "missing": missing,
                "exact_match": extra == 0 and missing == 0 and n_emitted == n_truth,
                "state_rows_peak": state_peak,
                "state_rows_final": state_final,
            }
        )
    )
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
