#!/usr/bin/env python
"""Winnowing fingerprint dedup at 1M documents — the round-7 MOSS
pipeline (`dedup_winnowing_fingerprints`) probed ~180x past the
sf0.1 fixture, plus a direct measurement of its headline claim: the
postings stream entering the candidate shuffle shrinks to ~2/(w+1)
of the shingle stream the exact-Jaccard pipeline ships.

Deterministic synthetic corpus (same vocab-sampled ~31-token builder
as containment_scale_probe), with 1% planted NEAR-DUP docs: every
100th doc reappears with its LAST token dropped — the registry
fixture's trimmed-twin construction — so the pair shares 27 of its
28/29 ordered shingles and must survive winnowing selection.

Two hash arms, same pipeline shape:
- portable: the registry's polynomial char fold (acc*31+cp mod 1e9+7)
  — the cross-engine-checkable stand-in the DuckDB oracle replays;
- xxhash64: the production print hash (one JVM intrinsic per
  shingle) — what the docstring says to run at 100 TB.

Reported per arm: prints/doc vs shingles/doc (the density dial),
end-to-end pair-pipeline wall time, planted-pair recall at the
registry threshold, and organic (non-planted) pair count. Usage:
python scripts/winnowing_scale_probe.py [n_docs]. Results in
SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import get_spark
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.operators.dedup import (
    _SHINGLES_EXPR,
    _WINNOW_HASHES_EXPR,
    MAX_PRINT_DF,
    WINNOW_JACCARD,
    WINNOW_W,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DUP_EVERY = 100
VOCAB = 50_000
DOC_TOKENS = 31

XXHASH_HASHES_EXPR = f"transform({_SHINGLES_EXPR}, s -> xxhash64(s))"


def synth_corpus(spark):
    base = spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"concat_ws(' ', transform(sequence(1, {DOC_TOKENS}),"
            f" t -> concat('w', pmod(xxhash64(id * 131 + t), {VOCAB}))))"
        ).alias("text"),
    )
    trimmed = base.select(
        (F.col("doc_id") + N).alias("doc_id"),
        F.expr(
            "concat_ws(' ', slice(split(text, ' '), 1, size(split(text, ' ')) - 1))"
        ).alias("text"),
    ).filter(F.col("doc_id") % DUP_EVERY == N % DUP_EVERY)
    return base.unionByName(trimmed).repartition(
        spark.sparkContext.defaultParallelism
    )


def run_arm(spark, corpus, hashes_expr: str) -> dict:
    w = WINNOW_W
    prints_expr = (
        f"CASE WHEN size(H) >= {w} THEN"
        f" array_distinct(transform(sequence(1, size(H) - {w} + 1),"
        f" st -> array_min(slice(H, st, {w}))))"
        f" ELSE array(array_min(H)) END"
    )
    t0 = time.perf_counter()
    hashed = corpus.withColumn("H", F.expr(hashes_expr))
    all_prints = hashed.select(
        "doc_id", F.explode(F.expr(prints_expr)).alias("p")
    )
    hot = (
        all_prints.groupBy("p")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > MAX_PRINT_DF)
        .select("p")
    )
    pruned = all_prints.join(F.broadcast(hot), "p", "left_anti")
    sizes = pruned.groupBy("doc_id").agg(F.count("*").alias("sz"))
    p_sz = pruned.join(sizes, "doc_id")
    l, r = p_sz.alias("l"), p_sz.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.p") == F.col("r.p"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.sz").alias("sz_a"),
            F.col("r.sz").alias("sz_b"),
        )
        .agg(F.count("*").alias("common"))
    )
    jac = F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
    out = pairs.filter(F.round(jac, 4) >= WINNOW_JACCARD).select(
        "doc_a", "doc_b"
    )
    planted = F.col("doc_b") - F.col("doc_a") == N
    agg = out.agg(
        F.count("*").alias("pairs"),
        F.sum(planted.cast("long")).alias("planted_found"),
    ).collect()[0]
    wall = time.perf_counter() - t0

    n_planted = (N + DUP_EVERY - 1) // DUP_EVERY
    # density measured on the SAME hash arm's prints vs raw shingles
    dens = (
        corpus.withColumn("H", F.expr(hashes_expr))
        .select(
            F.size("H").alias("n_sh"),
            F.size(F.expr(prints_expr)).alias("n_pr"),
        )
        .agg(
            F.sum("n_sh").alias("shingles"),
            F.sum("n_pr").alias("prints"),
        )
        .collect()[0]
    )
    return {
        "wall_s": round(wall, 1),
        "pairs": agg["pairs"],
        "planted_found": agg["planted_found"],
        "n_planted": n_planted,
        "recall": round(agg["planted_found"] / n_planted, 4),
        "shingle_postings": dens["shingles"],
        "winnowed_postings": dens["prints"],
        "density": round(dens["prints"] / dens["shingles"], 4),
    }


def main() -> None:
    spark = get_spark("winnowing-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = synth_corpus(spark).cache()
    n = corpus.count()

    # two interleaved rounds, keep each arm's best: the first arm of a
    # fresh JVM otherwise pays the whole-stage-codegen/JIT warm-up and
    # the comparison reads backwards (observed 40s vs 17s at 100k docs
    # with single-pass ordering).
    arms = {"xxhash64": XXHASH_HASHES_EXPR, "portable": _WINNOW_HASHES_EXPR}
    best: dict[str, dict] = {}
    for _ in range(2):
        for name, expr in arms.items():
            r = run_arm(spark, corpus, expr)
            if name not in best or r["wall_s"] < best[name]["wall_s"]:
                best[name] = r
    results = {
        "n_docs": n,
        "w": WINNOW_W,
        "expected_density": round(2 / (WINNOW_W + 1), 4),
        **best,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results",
        "winnowing_scale.json",
    )
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))
    print(f"-> {path}")


if __name__ == "__main__":
    main()
