#!/usr/bin/env python
"""Scale probes for the round-4 operators, on generated data far past
fixture scale (quiet-window medians of 3, noop-sink forced):

1. bloom-prefiltered semi join: 30M-row fact, 100k-key build side
   (~3.3% selectivity) — plain shuffle semi join vs bloom-prefiltered.
   The bloom should cut the fact exchange ~30x.
2. two-phase heavy hitters: ~30M tokens over a 1M-term Zipf-ish vocab
   — naive full-vocabulary groupBy vs candidate/verify.
3. star-contraction CC: 1M-node graph of 10k chains (diameter 100
   each) — the shape propagation handles poorly.

Usage: python scripts/round4_scale_probe.py  (prints one JSON line per probe)
"""
from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.operators.dedup import star_contract
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.session import get_spark

spark = get_spark("round4probe", cpus=32, shuffle_partitions=32)
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


# --- 1. bloom-prefiltered semi join ---------------------------------------
N_FACT = 30_000_000
N_KEYSPACE = 3_000_000
N_BUILD = 100_000

fact = (
    spark.range(N_FACT)
    .select(
        F.pmod(F.xxhash64("id"), F.lit(N_KEYSPACE)).alias("k"),
        (F.col("id") % 1000).cast("double").alias("amt"),
    )
    .persist()
)
fact.count()
build = spark.range(N_BUILD).select((F.col("id") * 30).alias("bk")).persist()
build.count()

plain = lambda: (
    fact.join(build.hint("merge"), fact.k == build.bk, "left_semi")
    .agg(F.count("*").alias("n"), F.sum("amt").alias("s"))
)

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.operators.joins import (
    bloom_build,
    bloom_might_contain,
)

BLOOM_BITS = 1 << 21  # 2 Mbit for 100k keys => fp ~ 0.3%
bloom_map = bloom_build(build, "bk", n_bits=BLOOM_BITS)


def bloomed():
    cand = (
        fact.join(F.broadcast(bloom_map))
        .filter(bloom_might_contain(F.col("k"), n_bits=BLOOM_BITS))
        .drop("bf")
    )
    return cand.join(build.hint("merge"), cand.k == build.bk, "left_semi").agg(
        F.count("*").alias("n"), F.sum("amt").alias("s")
    )


n_match = fact.join(build, fact.k == build.bk, "left_semi").count()
emit(
    probe="bloom_semi_join",
    fact_rows=N_FACT,
    build_keys=N_BUILD,
    matching_rows=n_match,
    plain_semi_sec=timed(plain),
    bloom_prefiltered_sec=timed(bloomed),
)
fact.unpersist()

# --- 2. two-phase heavy hitters -------------------------------------------
N_TOK = 30_000_000
VOCAB = 1_000_000
THETA = 0.001

# Zipf-ish: token id = keyspace * (hash-uniform)^4 concentrates mass on
# small ids; ~hundreds of tokens clear theta
tok = (
    spark.range(N_TOK)
    .select(
        F.floor(
            F.lit(VOCAB)
            * F.pow(F.pmod(F.xxhash64("id"), F.lit(1_000_000)) / 1_000_000.0, 4)
        ).alias("token")
    )
    .persist()
)
tok.count()

naive = lambda: (
    tok.groupBy("token")
    .agg(F.count("*").alias("cnt"))
    .filter(F.col("cnt") >= THETA * N_TOK)
)


def twophase():
    local = (
        tok.withColumn("pid", F.spark_partition_id())
        .groupBy("pid", "token")
        .agg(F.count("*").alias("cnt_p"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("pid")
    cand = (
        local.withColumn("tot_p", F.sum("cnt_p").over(w))
        .filter(F.col("cnt_p") >= THETA * F.col("tot_p"))
        .select("token")
        .distinct()
    )
    return (
        tok.join(F.broadcast(cand), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= THETA * N_TOK)
    )


n_hitters = naive().count()
emit(
    probe="heavy_hitters",
    tokens=N_TOK,
    vocab=VOCAB,
    theta=THETA,
    hitters=n_hitters,
    naive_groupby_sec=timed(naive),
    twophase_sec=timed(twophase),
)
tok.unpersist()

# --- 3. star-contraction CC on 10k chains of length 100 -------------------
N_CHAINS = 10_000
CHAIN_LEN = 100
edges = (
    spark.range(N_CHAINS * (CHAIN_LEN - 1))
    .select(
        (
            (F.col("id") / (CHAIN_LEN - 1)).cast("long") * CHAIN_LEN
            + F.col("id") % (CHAIN_LEN - 1)
        ).alias("u")
    )
    .select("u", (F.col("u") + 1).alias("v"))
)
t0 = time.perf_counter()
stars = star_contract(edges)
n_star = stars.count()
wall = round(time.perf_counter() - t0, 3)
ok = stars.filter(F.col("v") % CHAIN_LEN != 0).count() == 0
emit(
    probe="star_contraction_cc",
    nodes=N_CHAINS * CHAIN_LEN,
    chains=N_CHAINS,
    diameter=CHAIN_LEN - 1,
    star_edges=n_star,
    all_labels_are_chain_minima=bool(ok),
    wall_sec=wall,
)
spark.stop()
