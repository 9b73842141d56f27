#!/usr/bin/env python
"""Multi-batch stream-stream interval-join probe — exact equality and
state eviction at 3M events across 2x10 micro-batches.

Companion to scripts/streaming_scale_probe.py for THE hard stateful
operator (`streaming/windows.py:302` streaming_interval_join): both
sides buffer in the state store, and only the join condition's time
bounds + watermarks let Spark evict. The registry query drains the
fixture in one micro-batch; this probe replays BOTH sides as 10
time-sliced files each (maxFilesPerTrigger=1, so every trigger
advances each source by one slice in event-time order) and checks:

- exact equality: the append-mode inner-join output must EQUAL the
  batch interval join on the same data — anti-joins both ways, zero
  tolerance. Matches where the view and the purchase arrive in
  DIFFERENT micro-batches are the load-bearing case (the purchase
  must find the view still buffered, or vice versa).
- state eviction: per-side buffered rows (numRowsTotal of the
  symmetric hash join) must peak far below the total row count —
  the watermark+bounds eviction claim, measured.

Data is constructed so truth is known by arithmetic: each user emits
views every 2 hours; every other view is followed by a purchase 25
minutes later (inside the 30-minute window); every 7th user also gets
an orphan purchase with no view in range. Expected pairs =
exactly one per (user, even view index).

Run: python scripts/streaming_join_scale_probe.py [n_users] [views_per_user]
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

N_USERS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
VIEWS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
N_SLICES = 10
WINDOW_S = 1800
WATERMARK_S = 3600
BASE = 1_700_000_000
STEP_S = 2 * 3600


def build_sides(spark):
    """Views on a 2h grid (user-jittered); purchases 25min after every
    even-indexed view (in-window match) plus an out-of-window orphan
    45min after view 1 for every 7th user."""
    n = N_USERS * VIEWS
    v = spark.range(n).select(
        (F.col("id") % N_USERS).alias("user_id"),
        (F.col("id") / N_USERS).cast("long").alias("k"),
    )
    jitter = F.pmod(F.xxhash64("user_id"), F.lit(3600))
    v_ts = F.lit(BASE) + F.col("k") * STEP_S + jitter
    views = v.select(
        F.col("user_id").alias("v_user"),
        F.timestamp_seconds(v_ts).alias("v_ts"),
        (F.col("user_id") * VIEWS + F.col("k")).alias("v_id"),
    )
    p = v.filter(F.col("k") % 2 == 0)
    purchases = p.select(
        F.col("user_id").alias("p_user"),
        F.timestamp_seconds(F.lit(BASE) + F.col("k") * STEP_S + jitter + 25 * 60).alias("p_ts"),
        (F.col("user_id") * VIEWS + F.col("k")).alias("p_id"),
    )
    orphans = (
        spark.range(N_USERS)
        .filter(F.col("id") % 7 == 0)
        .select(
            F.col("id").alias("p_user"),
            F.timestamp_seconds(
                F.lit(BASE) + STEP_S + F.pmod(F.xxhash64(F.col("id").cast("long")), F.lit(3600)) + 45 * 60
            ).alias("p_ts"),
            (-F.col("id") - 1).alias("p_id"),
        )
    )
    return views, purchases.unionByName(orphans)


def write_slices(df, ts_col, root):
    lo, hi = df.agg(F.min(ts_col), F.max(ts_col)).first()
    span = (hi - lo).total_seconds()
    for i in range(N_SLICES):
        a = F.lit(lo) + F.expr(f"INTERVAL {int(span * i / N_SLICES)} SECONDS")
        end_s = int(span * (i + 1) / N_SLICES) if i < N_SLICES - 1 else int(span) + 1
        b = F.lit(lo) + F.expr(f"INTERVAL {end_s} SECONDS")
        (
            df.filter((F.col(ts_col) >= a) & (F.col(ts_col) < b))
            .repartition(1)
            .write.mode("overwrite")
            .parquet(os.path.join(root, f"slice_{i:02d}"))
        )


def main() -> None:
    spark = get_spark("streaming-join-scale", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="sjoin_probe_")
    vdir = os.path.join(work, "views")
    pdir = os.path.join(work, "purchases")
    views, purchases = build_sides(spark)
    views = views.persist()
    purchases = purchases.persist()
    n_v, n_p = views.count(), purchases.count()
    t0 = time.time()
    write_slices(views, "v_ts", vdir)
    write_slices(purchases, "p_ts", pdir)
    print(f"fixture: {n_v:,} views + {n_p:,} purchases ({time.time() - t0:.1f}s)", file=sys.stderr)

    def src(root, schema):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*.parquet")
            .parquet(root)
        )

    sv = src(vdir, views.schema).withWatermark("v_ts", f"{WATERMARK_S} seconds")
    sp = src(pdir, purchases.schema).withWatermark("p_ts", f"{WATERMARK_S} seconds")
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {WINDOW_S} SECONDS"))
    )
    joined = sp.join(sv, cond).select("p_id", "v_id", "p_user")
    t0 = time.time()
    q = joined.writeStream.outputMode("append").format("memory").queryName("sjoin_sink").start()
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
    emitted = spark.table("sjoin_sink").persist()
    n_emitted = emitted.count()

    truth = (
        purchases.join(
            views,
            (F.col("p_user") == F.col("v_user"))
            & (F.col("v_ts") <= F.col("p_ts"))
            & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {WINDOW_S} SECONDS")),
        )
        .select("p_id", "v_id", "p_user")
        .persist()
    )
    n_truth = truth.count()
    expected_pairs = N_USERS * ((VIEWS + 1) // 2)
    extra = emitted.join(truth, ["p_id", "v_id", "p_user"], "left_anti").count()
    missing = truth.join(emitted, ["p_id", "v_id", "p_user"], "left_anti").count()

    print(
        json.dumps(
            {
                "views": n_v,
                "purchases": n_p,
                "micro_batches": batches,
                "drain_s": round(drain_s, 1),
                "rows_per_s": int((n_v + n_p) / drain_s),
                "emitted_pairs": n_emitted,
                "truth_pairs": n_truth,
                "arithmetic_expected_pairs": expected_pairs,
                "spurious": extra,
                "missing": missing,
                "exact_match": extra == 0 and missing == 0,
                "truth_matches_arithmetic": n_truth == expected_pairs,
                "state_rows_peak": state_peak,
                "state_rows_final": state_final,
            }
        )
    )
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
