#!/usr/bin/env python
"""global_rank mechanism A/B — the structural follow-up to the round-13
cached-input hazard (operators/core.py global_rank GUARD).

The shipped global_rank gets its per-partition offsets from a SECOND
read of the range exchange and is correct only while Spark reuses that
exchange (ReusedExchange); over InMemoryRelation/LogicalRDD inputs the
reuse breaks, each physical exchange resamples boundaries under its
own RDD-id seed, and ranks silently stop being a permutation. Round 13
guards those inputs with a loud ValueError; this probe measures the
two REUSE-FREE mechanisms a round-14 migration could adopt, so the
decision is data, not taste:

- arm `range_reuse` (shipped): repartitionByRange + offsets from the
  reused exchange. Balanced under any distribution; carries the reuse
  dependence.
- arm `arith_bucket` (ks_drift_test's pattern): bucket id is
  ARITHMETIC on the value from broadcast min/max — identical in every
  branch by construction, zero reuse assumption. Balanced only when
  the VALUE RANGE is uniformly occupied; a skewed distribution lands
  in few buckets (the probe's zipf cell measures exactly how bad).
- arm `sampled_bounds`: boundaries from ONE bounded driver-side
  approxQuantile (≤ n_part values, the k-means-centroids bounded-
  control-collect pattern), broadcast back; bucket = count of bounds
  <= value (O(n_part) per row). Sampling balance AND data-derived
  determinism — reuse-free, skew-robust; costs one extra pass over
  the column for the quantile sketch.

Every arm is checked against the permutation INVARIANTS distributed
(no driver materialization): count n, min 1, max n, sum n(n+1)/2 —
an offset desync of even one row breaks the sum.

Usage: python scripts/global_rank_bucket_ab.py [n_rows]
Default 30_000_000. Cells: uniform int values (range-occupying) and
zipf-ish skew (value = floor(1/u) capped — heavy mass on small
values). Writes results/global_rank_bucket_ab.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import get_spark
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.operators.core import (
    global_rank,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000_000
N_PART = 32


def _fixture(spark, kind: str) -> str:
    path = f"/tmp/global_rank_ab_{kind}_{N}.parquet"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        if kind == "uniform":
            expr = f"pmod(xxhash64(id), {N})"
        else:  # zipf-ish: heavy mass on small values, long tail
            expr = (
                f"CAST(least(1000000.0, 1.0 / ((pmod(xxhash64(id), 1000000) + 1)"
                f" / 1000000.0)) AS BIGINT)"
            )
        (
            spark.range(N)
            .select(F.expr(expr).alias("x"))
            .repartition(N_PART)
            .write.mode("overwrite")
            .parquet(path)
        )
    return path


def _check_invariants(ranked, n: int) -> dict:
    row = ranked.agg(
        F.count("*").alias("cnt"),
        F.min("rank").alias("rmin"),
        F.max("rank").alias("rmax"),
        F.sum(F.col("rank").cast("decimal(38,0)")).alias("rsum"),
    ).collect()[0]
    ok = (
        row.cnt == n
        and row.rmin == 1
        and row.rmax == n
        and int(row.rsum) == n * (n + 1) // 2
    )
    return {"permutation_ok": bool(ok), "n": row.cnt}


def arm_range_reuse(df):
    return global_rank(df, ["x"], num_partitions=N_PART)


def arm_arith_bucket(df):
    bounds = df.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    b = df.crossJoin(F.broadcast(bounds)).withColumn(
        "_b",
        F.least(
            F.floor(
                (F.col("x") - F.col("lo"))
                / (F.col("hi") - F.col("lo") + 1e-9)
                * N_PART
            ).cast("int"),
            F.lit(N_PART - 1),
        ),
    )
    w = Window.partitionBy("_b").orderBy("x")
    local = b.withColumn("_lrn", F.row_number().over(w))
    tot = b.groupBy("_b").agg(F.count("*").alias("_n"))
    w_cum = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    off = tot.select("_b", (F.sum("_n").over(w_cum) - F.col("_n")).alias("_off"))
    return (
        local.join(F.broadcast(off), "_b")
        .withColumn("rank", F.col("_off") + F.col("_lrn"))
        .drop("_b", "_lrn", "_off", "lo", "hi")
    )


def arm_sampled_bounds(spark, df):
    qs = [i / N_PART for i in range(1, N_PART)]
    bounds = df.stat.approxQuantile("x", qs, 0.001)
    lits = ", ".join(str(int(v)) for v in bounds)
    b = df.withColumn(
        "_b",
        F.expr(f"CAST(cardinality(filter(array({lits}), b -> b <= x)) AS INT)"),
    )
    w = Window.partitionBy("_b").orderBy("x")
    local = b.withColumn("_lrn", F.row_number().over(w))
    tot = b.groupBy("_b").agg(F.count("*").alias("_n"))
    w_cum = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    off = tot.select("_b", (F.sum("_n").over(w_cum) - F.col("_n")).alias("_off"))
    return (
        local.join(F.broadcast(off), "_b")
        .withColumn("rank", F.col("_off") + F.col("_lrn"))
        .drop("_b", "_lrn", "_off")
    )


def main() -> None:
    spark = get_spark("global-rank-bucket-ab")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_rows": N, "n_part": N_PART, "cells": []}
    for kind in ("uniform", "zipf"):
        df = spark.read.parquet(_fixture(spark, kind))
        cell: dict = {"dist": kind}
        for name, fn in (
            ("range_reuse", lambda d: arm_range_reuse(d)),
            ("arith_bucket", lambda d: arm_arith_bucket(d)),
            ("sampled_bounds", lambda d: arm_sampled_bounds(spark, d)),
        ):
            t0 = time.time()
            inv = _check_invariants(fn(df), N)
            cell[name] = {"sec": round(time.time() - t0, 2), **inv}
            assert inv["permutation_ok"], (kind, name, inv)
        out["cells"].append(cell)
        print(json.dumps(cell), flush=True)
    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results",
        "global_rank_bucket_ab.json",
    )
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"-> {dst}")


if __name__ == "__main__":
    main()
