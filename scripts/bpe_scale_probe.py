#!/usr/bin/env python
"""BPE training + encode at 1M documents — the round-10 tokenizer
loop probed ~180x past the sf0.1 fixture.

Generates the deterministic vocab-sampled corpus the other dedup/text
probes use (~31 tokens/doc => ~30M adjacent pairs per counting round),
runs _bpe_merge_rounds (3 select-apply-recount rounds: one corpus
scan + one vocabulary-sized map-side-combined aggregate + a 1-row
broadcast each) and the bpe encode fold, and reports wall time per
stage. The claim under test: cost is LINEAR in rounds (the persisted
1-row winners keep the plan from re-deriving earlier rounds — the
plan snapshot pins scans == rounds) and the heavy exchange stays
vocabulary-sized, never corpus-sized.

Round 11 adds the batched-trainer cell: 6 merges trained both ways —
sequential (6 counting scans) vs batched k=3 (2 counting scans) —
measuring the n_merges/k scan cut as wall-clock.

Usage: python scripts/bpe_scale_probe.py [n_docs]
Writes results/bpe_scale_probe.json; summarized in SCALE.md.
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
    _BPE_APPLY_MERGE_EXPR,
    _bpe_merge_rounds,
    _bpe_merge_rounds_adaptive,
    _bpe_merge_rounds_batched,
    _bpe_merge_rounds_delta,
    BPE_ADAPTIVE_DELTA_FRAC,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
VOCAB = 50_000
DOC_TOKENS = 31


# Two token distributions: "uniform" (pmod over the full vocab — pairs
# are nearly all distinct, so the pair aggregate degenerates to
# corpus-sized: the measured WORST case) and "zipf" (hash quantile
# cubed — mass concentrates on low ids like real text, so distinct
# pairs collapse by orders of magnitude: the realistic case).
TOKEN_EXPRS = {
    "uniform": f"concat('w', pmod(xxhash64(id * 131 + t), {VOCAB}))",
    "zipf": (
        f"concat('w', CAST(pow(pmod(xxhash64(id * 131 + t), 100000) / 100000.0, 3)"
        f" * {VOCAB} AS INT))"
    ),
    # 8-token alphabet: <= 64 distinct pairs over 30M adjacencies, so
    # the top winner occurs ~once per doc or more for many rounds —
    # the CHAR-LEVEL EARLY-BPE regime (real trainers' first thousands
    # of merges touch nearly every doc), which the 50k-vocab fixtures
    # never enter; this is the regime where stateless lazy counting
    # beats delta maintenance (a delta round extracts pairs over the
    # affected ~whole corpus TWICE and rewrites it; a recount does one
    # extraction) — r13 adaptive-policy cell
    "dense": "concat('w', pmod(xxhash64(id * 131 + t), 8))",
}


def run_cell(spark, dist: str) -> dict:
    path = f"/tmp/bpe_probe_{dist}_{N}.parquet"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        spark.range(N).select(
            F.expr(
                f"concat_ws(' ', transform(sequence(1, {DOC_TOKENS}),"
                f" t -> {TOKEN_EXPRS[dist]}))"
            ).alias("text")
        ).repartition(64).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    n_docs = docs.count()

    distinct_pairs = (
        docs.select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(split(text, ' ')) - 2),"
                    " i -> concat_ws(' ', split(text, ' ')[i], split(text, ' ')[i + 1]))"
                )
            ).alias("pair")
        )
        .agg(F.countDistinct("pair").alias("d"))
        .collect()[0]
        .d
    )

    stages = {}
    t0 = time.perf_counter()
    merges = _bpe_merge_rounds(docs, 3)
    rows = merges.collect()
    stages["train_3_rounds_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    cur = docs.select(F.col("text").alias("seq"))
    for rank in (1, 2, 3):
        chosen = F.broadcast(
            merges.filter(F.col("merge_rank") == rank).select(F.col("pair").alias("mp"))
        )
        cur = cur.crossJoin(chosen).select(F.expr(_BPE_APPLY_MERGE_EXPR).alias("seq"))
    encoded_tokens = cur.select(
        F.sum(F.size(F.split("seq", " "))).alias("n")
    ).collect()[0].n
    stages["encode_3_merges_s"] = round(time.perf_counter() - t0, 2)

    # r11 batched-trainer cell (VERDICT r10 #5): same 6 merges, 6
    # counting scans sequential vs 2 scans batched (k=3) — the
    # n_merges/k scan cut is the whole claim, so the speedup should
    # track the scan ratio minus the fixed selection/apply overhead.
    t0 = time.perf_counter()
    seq6 = _bpe_merge_rounds(docs, 6).collect()
    stages["train_6_sequential_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    bat6 = _bpe_merge_rounds_batched(docs, 6, batch_k=3).collect()
    stages["train_6_batched_k3_s"] = round(time.perf_counter() - t0, 2)
    batched_extras = {
        "batched_speedup": round(
            stages["train_6_sequential_s"] / stages["train_6_batched_k3_s"], 2
        ),
        # merge SETS may legitimately differ when top candidates
        # interact (the documented approximation); record the overlap
        "batched_merge_overlap": len(
            {r.pair for r in seq6} & {r.pair for r in bat6}
        ),
    }

    # r12 delta-trainer cell (VERDICT r11 #6): same 6 merges with
    # signed-delta pair-count maintenance — after the one full initial
    # count, each round recounts ONLY the sequences containing the
    # just-merged pair. The instrumentation records per-round affected
    # docs + wall time, the round-cost-∝-affected-docs claim made
    # measurable (and delta merges must equal sequential exactly —
    # checked here, property-tested in tests/test_property.py).
    delta_stats: list = []
    t0 = time.perf_counter()
    dlt6 = _bpe_merge_rounds_delta(docs, 6, stats=delta_stats).collect()
    stages["train_6_delta_s"] = round(time.perf_counter() - t0, 2)
    assert [(r.merge_rank, r.pair, r.n) for r in sorted(dlt6, key=lambda r: r.merge_rank)] == [
        (r.merge_rank, r.pair, r.n) for r in sorted(seq6, key=lambda r: r.merge_rank)
    ], "delta trainer diverged from sequential"
    delta_extras = {
        "delta_speedup_vs_sequential": round(
            stages["train_6_sequential_s"] / stages["train_6_delta_s"], 2
        ),
        "delta_rounds": [
            {**s, "affected_frac": round(s["affected_docs"] / n_docs, 4)}
            for s in delta_stats
        ],
    }

    # depth-12 pair: the delta trainer's one-time initial count
    # amortizes over rounds, so its advantage COMPOUNDS with merge
    # depth (real vocab training runs thousands of rounds)
    t0 = time.perf_counter()
    seq12 = _bpe_merge_rounds(docs, 12).collect()
    stages["train_12_sequential_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    dlt12 = _bpe_merge_rounds_delta(docs, 12).collect()
    stages["train_12_delta_s"] = round(time.perf_counter() - t0, 2)
    assert sorted(map(tuple, dlt12)) == sorted(map(tuple, seq12)), (
        "delta trainer diverged from sequential at depth 12"
    )
    delta_extras["delta_speedup_12_merges"] = round(
        stages["train_12_sequential_s"] / stages["train_12_delta_s"], 2
    )

    # r13 adaptive-trainer cell (VERDICT r12 #5): the two-phase
    # hybrid (lazy literal-apply recount phase -> one-way switch to
    # delta state once winners drop under delta_frac x docs, recount
    # escape for late heavy merges) at 6 and 12 merges, against the
    # seq/delta endpoints measured above in the SAME session. The
    # endpoints ARE the policy sweep's extremes (never-switch ==
    # sequential counting, immediate-switch == delta); the zipf cell
    # additionally sweeps delta_frac across the winner-count knee its
    # r12 rounds exposed (rank-2..5 winners sit at 0.0037-0.0057 of
    # docs — 0.002 keeps them lazy, 0.004 switches mid-run).
    fracs = (
        [BPE_ADAPTIVE_DELTA_FRAC, 0.002]
        if dist == "zipf"
        else [BPE_ADAPTIVE_DELTA_FRAC]
    )
    adaptive_cells = []
    for frac in fracs:
        for depth, ref in ((6, seq6), (12, seq12)):
            a_stats: list = []
            t0 = time.perf_counter()
            adp = _bpe_merge_rounds_adaptive(
                docs, depth, delta_frac=frac, stats=a_stats
            ).collect()
            wall = round(time.perf_counter() - t0, 2)
            assert sorted(map(tuple, adp)) == sorted(map(tuple, ref)), (
                f"adaptive trainer diverged from sequential (frac={frac}, depth={depth})"
            )
            adaptive_cells.append(
                {
                    "delta_frac": frac,
                    "depth": depth,
                    "wall_s": wall,
                    "paths": [s["path"] for s in a_stats],
                    "speedup_vs_sequential": round(
                        stages[f"train_{depth}_sequential_s"] / wall, 2
                    ),
                    "speedup_vs_delta": round(
                        stages[f"train_{depth}_delta_s"] / wall, 2
                    ),
                }
            )
            print(json.dumps({"adaptive": adaptive_cells[-1]}), flush=True)

    return {
        "adaptive": adaptive_cells,
        **batched_extras,
        **delta_extras,
        "distribution": dist,
        "docs": n_docs,
        "pairs_per_round": n_docs * (DOC_TOKENS - 1),
        "distinct_pairs": int(distinct_pairs),
        "top_merge_n": rows[0].n,
        "raw_tokens": n_docs * DOC_TOKENS,
        "encoded_tokens": int(encoded_tokens),
        **stages,
        "docs_per_sec_train": int(n_docs / stages["train_3_rounds_s"]),
    }


def main() -> None:
    spark = get_spark("bpe-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    cells = [run_cell(spark, dist) for dist in ("zipf", "uniform")]
    for c in cells:
        print(json.dumps(c), flush=True)
    out = {"cells": cells, "generated": time.strftime("%Y-%m-%dT%H:%M:%S")}
    with open(os.path.join(REPO, "results", "bpe_scale_probe.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("-> results/bpe_scale_probe.json", file=sys.stderr)


if __name__ == "__main__":
    main()
