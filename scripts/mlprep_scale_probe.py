#!/usr/bin/env python
"""Scale probes for the round-4 session operators, on generated data
far past fixture scale (medians of 3, noop-sink forced):

1. negative-pair mining: 3M docs, bucket count scaled with the corpus
   (B = n/2000) — verifies the O(n²/B) pair space stays bounded and
   the WindowGroupLimit keeps only K rows per anchor through the
   shuffle.
2. cross-source quantile normalization: 30M rows through the
   two-phase distributed carry (union + arithmetic buckets + local
   window + broadcast offsets) — the shape a single-partition window
   cannot survive.
3. watermark lateness audit: 30M events through the distributed
   prefix max.

Usage: python scripts/mlprep_scale_probe.py   (one JSON line per probe)
"""
from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.session import get_spark

spark = get_spark("mlprepprobe", cpus=32, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")


def force(df):
    df.write.format("noop").mode("overwrite").save()


def timed(build, reps=3):
    force(build())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        force(build())
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 3)


def emit(**kw):
    print(json.dumps(kw), flush=True)


# ---------------------------------------------------------------- probe 1
N_DOCS = 3_000_000
B = N_DOCS // 2000  # bucket count scales with the corpus
K = 3


def neg_pairs():
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("source"),
        ((F.col("id") * 2654435761) % 2147483647 % B).alias("b"),
    )
    anchors = docs.where(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("anchor_id"),
        F.col("source").alias("anchor_source"),
        "b",
    )
    cands = docs.select(
        F.col("doc_id").alias("neg_id"), F.col("source").alias("neg_source"), "b"
    )
    pair_h = (
        F.col("anchor_id") * 1000003 + F.col("neg_id") * 7919
    ) % 999983
    w = Window.partitionBy("anchor_id").orderBy(pair_h.asc(), F.col("neg_id").asc())
    return (
        anchors.join(cands, "b")
        .where(F.col("neg_source") != F.col("anchor_source"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= K)
        .select("anchor_id", "neg_id", "rk")
    )


sec = timed(neg_pairs)
n_out = neg_pairs().count()
emit(
    probe="negative_sampling_3m_docs",
    n_docs=N_DOCS,
    buckets=B,
    sec=sec,
    out_rows=n_out,
    note="bucket count scaled with corpus; pair space O(n^2/B) bounded",
)

# ---------------------------------------------------------------- probe 2
N_ROWS = 30_000_000
N_PART = 32


def quantile_carry():
    rows = spark.range(N_ROWS).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 11).alias("source"),
        ((F.col("id") * 48271) % 2147483647).alias("score"),
    )
    w_src = Window.partitionBy("source").orderBy("score", "doc_id")
    s_rows = rows.select(
        "doc_id",
        "source",
        "score",
        F.percent_rank().over(w_src).alias("p"),
        F.lit(0).alias("is_g"),
        F.lit(None).cast("long").alias("gval"),
    )
    # global side: reuse the same distribution shifted — the probe
    # measures the CARRY cost, so the g-side percent_rank runs on a
    # 1% sample standing in for the global distribution table
    g = rows.where(F.col("doc_id") % 100 == 0)
    w_g = Window.partitionBy().orderBy("score", "doc_id")
    g_rows = g.select(
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(None).cast("long").alias("source"),
        F.lit(None).cast("long").alias("score"),
        F.percent_rank().over(w_g).alias("p"),
        F.lit(1).alias("is_g"),
        F.col("score").alias("gval"),
    )
    both = s_rows.unionByName(g_rows).withColumn(
        "_pid",
        F.least(F.floor(F.col("p") * N_PART).cast("int"), F.lit(N_PART - 1)),
    )
    w_loc = (
        Window.partitionBy("_pid")
        .orderBy(F.col("p").asc(), F.col("is_g").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_prior = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off = (
        both.groupBy("_pid")
        .agg(F.max_by("gval", F.when(F.col("is_g") == 1, F.col("p"))).alias("pg"))
        .select("_pid", F.last("pg", ignorenulls=True).over(w_prior).alias("prior_g"))
    )
    return (
        both.withColumn("loc_g", F.last("gval", ignorenulls=True).over(w_loc))
        .join(F.broadcast(off), "_pid")
        .withColumn("norm", F.coalesce("loc_g", "prior_g"))
        .where(F.col("is_g") == 0)
        .select("doc_id", "norm")
    )


emit(
    probe="quantile_normalize_carry_30m",
    n_rows=N_ROWS,
    sec=timed(quantile_carry),
    note="two-phase carry; per-source rank windows + one bucket shuffle",
)

# ---------------------------------------------------------------- probe 3


def lateness():
    ev = spark.range(N_ROWS).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 5).alias("event_type"),
        # event time mostly monotone with ~0.1% late stragglers
        (
            F.col("id") * 1000
            - F.when((F.col("id") * 48271) % 1000 == 0, 2_000_000).otherwise(0)
        ).alias("ts_us"),
    )
    bounds = ev.agg(F.max("event_id").alias("max_id"))
    ranged = ev.crossJoin(F.broadcast(bounds)).withColumn(
        "_pid",
        (F.col("event_id") / (F.col("max_id") + 1) * N_PART).cast("int"),
    )
    w_loc = (
        Window.partitionBy("_pid")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_prev = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off = (
        ranged.groupBy("_pid")
        .agg(F.max("ts_us").alias("pmax"))
        .select("_pid", F.max("pmax").over(w_prev).alias("off_max"))
    )
    flagged = (
        ranged.withColumn("loc_max", F.max("ts_us").over(w_loc))
        .join(F.broadcast(off), "_pid")
        .withColumn("wm", F.greatest("loc_max", "off_max") - F.lit(1_000_000))
        .withColumn(
            "is_late",
            (F.col("wm").isNotNull() & (F.col("ts_us") < F.col("wm"))).cast("long"),
        )
    )
    return flagged.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("is_late").alias("n_late")
    )


sec = timed(lateness)
late_total = lateness().agg(F.sum("n_late")).collect()[0][0]
emit(
    probe="lateness_prefix_max_30m",
    n_rows=N_ROWS,
    sec=sec,
    n_late=int(late_total),
    note="distributed prefix max over arrival order; planted ~0.1% stragglers detected",
)


# ---------------------------------------------------------------- probe 4
def cusum_30m():
    ev = spark.range(N_ROWS).select(
        (F.col("id") % 5).alias("event_type"),
        F.col("id").alias("event_id"),
        (F.col("id") * 7).alias("tsu"),
        # planted level shift at the 2/3 point of each series
        (
            ((F.col("id") * 48271) % 2001) - 1000
            + F.when(F.col("id") > 2 * N_ROWS / 3, 500).otherwise(0)
        ).alias("xi"),
    )
    n_p = 32
    bounds = ev.agg(F.min("tsu").alias("lo"), F.max("tsu").alias("hi"))
    bucketed = ev.crossJoin(F.broadcast(bounds)).withColumn(
        "_pid",
        F.least(
            F.floor((F.col("tsu") - F.col("lo")) / (F.col("hi") - F.col("lo") + 1) * n_p).cast("int"),
            F.lit(n_p - 1),
        ),
    )
    w_loc = (
        Window.partitionBy("event_type", "_pid")
        .orderBy("tsu", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.select(
        "event_type", "event_id", "tsu",
        F.sum("xi").over(w_loc).alias("loc_s"),
        F.count("*").over(w_loc).alias("loc_i"), "_pid",
    )
    w_cum = Window.partitionBy("event_type").orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off = (
        bucketed.groupBy("event_type", "_pid")
        .agg(F.sum("xi").alias("s"), F.count("*").alias("c"))
        .select("event_type", "_pid",
                F.coalesce(F.sum("s").over(w_cum), F.lit(0)).alias("off_s"),
                F.coalesce(F.sum("c").over(w_cum), F.lit(0)).alias("off_c"))
    )
    tot = ev.groupBy("event_type").agg(F.sum("xi").alias("total"), F.count("*").alias("n"))
    d = (
        local.join(F.broadcast(off), ["event_type", "_pid"])
        .join(F.broadcast(tot), "event_type")
        .select("event_type", "event_id", "n",
                ((F.col("loc_s") + F.col("off_s")) * F.col("n")
                 - (F.col("loc_i") + F.col("off_c")) * F.col("total")).alias("dd"))
    )
    return d.groupBy("event_type").agg(
        F.max_by("event_id", F.abs(F.col("dd"))).alias("change_id")
    )


sec = timed(cusum_30m)
rows = {r.event_type: r.change_id for r in cusum_30m().collect()}
planted = 2 * N_ROWS // 3
ok = all(abs(cid - planted) < N_ROWS * 0.01 for cid in rows.values())
emit(
    probe="cusum_changepoint_30m",
    n_rows=N_ROWS,
    sec=sec,
    located_within_1pct=bool(ok),
    note=f"planted level shift at id {planted}; argmax per series found within 1%",
)
