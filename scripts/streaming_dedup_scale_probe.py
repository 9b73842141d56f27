#!/usr/bin/env python
"""Multi-batch streaming dedup probe — exact distinct-set equality and
state eviction at 6M rows (3M unique + 3M planted duplicates) across
20 micro-batches.

Companion to the session-window and interval-join probes for the
watermarked streaming dedup (`streaming/windows.py`
streaming_dedup_events shape). This probe is what exposed that plain
`dropDuplicates` + watermark NEVER evicts a non-event-time key (state
peak == all unique ids); the operator under test is therefore
`dropDuplicatesWithinWatermark`, the form whose state the watermark
actually bounds. Every unique event gets exactly one
duplicate with the same event_id 5 minutes later — always inside the
1-hour watermark, often in a LATER micro-batch, which is the
load-bearing case: the dedup state must still remember the id when
the duplicate arrives batches later. The certificate is exact:

- emitted ids  == the distinct event_id set (anti-joins both ways);
- no id emitted twice;
- dedup state peaks far below total rows (watermark eviction — state
  only needs ids younger than the watermark, not the whole history).

Run: python scripts/streaming_dedup_scale_probe.py [n_unique]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import get_spark

N_UNIQUE = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
N_SLICES = 20
WATERMARK_S = 3600
BASE = 1_700_000_000
SPAN_S = 30 * 86400


def main() -> None:
    spark = get_spark("streaming-dedup-scale", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="sdedup_probe_")
    src = os.path.join(work, "stream")
    os.makedirs(src)

    base = spark.range(N_UNIQUE).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(BASE) + F.pmod(F.xxhash64("id"), F.lit(SPAN_S - 3600))
        ).alias("ts"),
    )
    dup = base.select("event_id", (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("ts"))
    ev = base.unionByName(dup).persist()
    n = ev.count()

    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo).total_seconds()
    t0 = time.time()
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
    print(f"fixture: {n:,} rows ({N_UNIQUE:,} unique) ({time.time() - t0:.1f}s)", file=sys.stderr)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(src)
    )
    deduped = stream.withWatermark("ts", f"{WATERMARK_S} seconds").dropDuplicatesWithinWatermark(["event_id"])
    t0 = time.time()
    q = deduped.writeStream.outputMode("append").format("memory").queryName("sdedup_sink").start()
    q.processAllAvailable()
    drain_s = time.time() - t0
    batches = 0
    state_peak = 0
    state_final = 0
    for prog in q.recentProgress:
        ops = prog.get("stateOperators") or []
        if ops:
            rows = ops[0].get("numRowsTotal", 0)
            state_peak = max(state_peak, rows)
            state_final = rows
        if (prog.get("numInputRows") or 0) > 0:
            batches += 1
    q.stop()
    emitted = spark.table("sdedup_sink").persist()
    n_emitted = emitted.count()
    n_distinct_emitted = emitted.select("event_id").distinct().count()
    truth = ev.select("event_id").distinct().persist()
    n_truth = truth.count()
    extra = emitted.select("event_id").join(truth, "event_id", "left_anti").count()
    missing = truth.join(emitted.select("event_id"), "event_id", "left_anti").count()

    print(
        json.dumps(
            {
                "rows": n,
                "unique": n_truth,
                "micro_batches": batches,
                "drain_s": round(drain_s, 1),
                "rows_per_s": int(n / drain_s),
                "emitted": n_emitted,
                "emitted_distinct": n_distinct_emitted,
                "spurious_ids": extra,
                "missing_ids": missing,
                "exact_match": extra == 0
                and missing == 0
                and n_emitted == n_distinct_emitted == n_truth,
                "state_rows_peak": state_peak,
                "state_rows_final": state_final,
            }
        )
    )
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
