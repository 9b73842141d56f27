#!/usr/bin/env python
"""Interleaved A/B of the three BPE trainers at 1M docs (VERDICT r12
#5 follow-up): the sequential bpe_scale_probe.py cells run minutes
apart, so the host's multi-minute contention waves (SCALE.md) can
swing any single cell 2-4x — its r13 run measured zipf seq6 at
27.5 s where the r12 run measured 40.7 s for identical code. This
probe measures the TRAINER COMPARISON the wave-safe way the
requalify probes use: per (distribution, depth), the three trainers
run back-to-back in round-robin order for REPS rounds, and each
trainer's MIN is kept — a wave covers whole round-robin rounds, so
mins compare like against like.

Cells: {zipf, uniform} x {6, 12 merges} x {sequential, delta,
adaptive(default frac)}. Equality of merge tables is asserted every
rep (the probe is also an end-to-end property check at 1M docs).

Usage: python scripts/bpe_adaptive_ab_probe.py [n_docs] [reps]
Writes results/bpe_adaptive_ab.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import get_spark
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.operators.text import (
    BPE_ADAPTIVE_DELTA_FRAC,
    _bpe_merge_rounds,
    _bpe_merge_rounds_adaptive,
    _bpe_merge_rounds_delta,
)
from bpe_scale_probe import TOKEN_EXPRS, DOC_TOKENS  # noqa: E402 (same fixture)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2

TRAINERS = {
    "sequential": lambda docs, depth: _bpe_merge_rounds(docs, depth),
    "delta": lambda docs, depth: _bpe_merge_rounds_delta(docs, depth),
    "adaptive": lambda docs, depth: _bpe_merge_rounds_adaptive(docs, depth),
}


def fixture(spark, dist: str):
    path = f"/tmp/bpe_probe_{dist}_{N}.parquet"  # shared with bpe_scale_probe
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        spark.range(N).select(
            F.expr(
                f"concat_ws(' ', transform(sequence(1, {DOC_TOKENS}),"
                f" t -> {TOKEN_EXPRS[dist]}))"
            ).alias("text")
        ).repartition(64).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def main() -> None:
    spark = get_spark("bpe-adaptive-ab")
    spark.sparkContext.setLogLevel("ERROR")
    cells = []
    for dist in ("zipf", "uniform", "dense"):
        docs = fixture(spark, dist)
        for depth in (6, 12):
            times: dict[str, list[float]] = {n: [] for n in TRAINERS}
            ref = None
            for _ in range(REPS):
                for name, fn in TRAINERS.items():  # round-robin
                    t0 = time.perf_counter()
                    got = sorted(map(tuple, fn(docs, depth).collect()))
                    times[name].append(round(time.perf_counter() - t0, 2))
                    # the sequential trainer persist()s its 1-row
                    # winners and CacheManager matches the NEXT rep's
                    # identical logical plans against them — without
                    # this, rep 2+ of `sequential` reads the whole
                    # training run from cache (~0.9s) and the A/B is
                    # fiction
                    spark.catalog.clearCache()
                    if ref is None:
                        ref = got
                    assert got == ref, f"{name} diverged ({dist}, depth {depth})"
            mins = {n: min(ts) for n, ts in times.items()}
            cell = {
                "distribution": dist,
                "depth": depth,
                "delta_frac": BPE_ADAPTIVE_DELTA_FRAC,
                "times": times,
                "min": mins,
                "adaptive_vs_sequential": round(mins["sequential"] / mins["adaptive"], 2),
                "adaptive_vs_delta": round(mins["delta"] / mins["adaptive"], 2),
                "hybrid_ge_max": bool(
                    mins["adaptive"] <= min(mins["sequential"], mins["delta"]) * 1.05
                ),
            }
            cells.append(cell)
            print(json.dumps(cell), flush=True)
            with open(os.path.join(REPO, "results", "bpe_adaptive_ab.json"), "w") as f:
                json.dump(
                    {
                        "note": (
                            "round-robin interleaved trainer reps (wave-evening), "
                            "min per trainer; hybrid_ge_max allows 5% measurement "
                            "slack on the min comparison; merge-table equality "
                            "asserted every rep"
                        ),
                        "docs": N,
                        "reps": REPS,
                        "cells": cells,
                    },
                    f,
                    indent=1,
                )
                f.write("\n")
    print("-> results/bpe_adaptive_ab.json", file=sys.stderr)


if __name__ == "__main__":
    main()
