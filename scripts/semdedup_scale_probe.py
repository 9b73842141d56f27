#!/usr/bin/env python
"""SemDeDup end-to-end at scale — the stored-index THIRD consumer
(`semdedup_apply`, VERDICT r12 #7) probed at ~50-200x the fixture.

The fixture run demonstrates correctness (oracle + zero-exchange plan
test); this probe demonstrates the COST MODEL: with the coarse list
count scaled as nlist = N / 500 (mean list ~500 vectors — SemDeDup's
own sqrt-ish regime where within-cluster quadratic cost stays bounded),
the decision join's pair workload is Θ(N · mean_list), so apply time
should scale LINEARLY with corpus size, not quadratically — the
difference between "survives 100 TB" and "does not".

Each cell, on a synthetic corpus with 1,000 PLANTED exact duplicates
(the last 1,000 vec_ids repeat vectors 0..999; a duplicate's twin has
the smaller id and cosine 1.0000, so the drop rule MUST catch it):

- build_s: one-time stored bucketBy(list_id) index build at that nlist
  (similarity._ensure_ivfpq_index_table via ensure_bucketed_specs —
  the shipped machinery, nothing re-implemented);
- apply_s: wall time of the registry's `semdedup_apply` on the stored
  index (accounting rollup forced to a noop sink);
- accounting invariants, checked hard: per-list n_kept + n_dropped ==
  n_vectors, Σ n_vectors == N, and min(min_drop_cos) >= SEMDEDUP_TAU
  (no certified drop below the threshold);
- planted_recall: fraction of the 1,000 planted duplicates in the
  drop set (similarity._semdedup_dropped — the operator's own
  decision join) — must be 1.0;
- pair workload Σ n_l·(n_l−1)/2 from the accounting, so the linearity
  claim is checked against the measured pair count, not assumed.

Two probe-local knobs, both documented in the artifact: the stored
table is built with 32 buckets instead of the fixture default 8
(storage.N_BUCKETS sizes bucketed-join parallelism; 8 matches the
fixture test sessions, 32 is this box's thread budget — a cluster
deployment sizes it to the executor count), and nlist scales with N
where the registry constant is fixture-sized. Expect a HIGH drop
fraction at the shipped tau on this synthetic corpus: IVF assignment
concentrates centroid-correlated vectors in the same list, so
within-list cosine is biased far above the random-pair tail — which
is exactly why SemDeDup restricts its NN scan to clusters. The drop
RATE is corpus- and tau-specific; the probe's claims are the cost
curve and the planted-duplicate recall, not the rate.

Usage: python scripts/semdedup_scale_probe.py [N ...]
Defaults: 100000 400000. Writes results/semdedup_scale_probe.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import get_spark

DIM = 64
N_PLANTED = 1000
MEAN_LIST = 500
PROBE_BUCKETS = 32


def _synth_sf_dir(spark, n: int) -> str:
    """Deterministic synthetic embeddings.parquet shaped like a
    testdata sf_dir, with the last N_PLANTED ids exact duplicates of
    ids 0..N_PLANTED-1 (larger vec_id -> guaranteed drop side)."""
    sf_dir = f"/tmp/semdedup_probe_{n}"
    path = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        base = f"CASE WHEN vec_id >= {n - N_PLANTED} THEN vec_id - {n - N_PLANTED} ELSE vec_id END"
        vec_expr = (
            f"transform(sequence(1, {DIM}),"
            f" j -> CAST(pmod(xxhash64(({base}) * 8191 + j), 1000000) / 500000.0 - 1.0 AS FLOAT))"
        )
        (
            spark.range(n)
            .select(F.col("id").alias("vec_id"))
            .select("vec_id", F.expr(vec_expr).alias("embedding"))
            .repartition(32)
            .write.mode("overwrite")
            .parquet(path)
        )
    return sf_dir


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main(ns: list[int]) -> None:
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.operators import (
        similarity,
    )
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.sources import storage
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.sources.storage import (
        WAREHOUSE,
        _tag,
    )

    spark = get_spark("semdedup-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {
        "arm": "semdedup_apply",
        "dim": DIM,
        "tau": similarity.SEMDEDUP_TAU,
        "mean_list_target": MEAN_LIST,
        "n_planted": N_PLANTED,
        "n_buckets": PROBE_BUCKETS,
        "note": (
            "probe-local: N_BUCKETS=32 (local thread budget; fixture default 8), "
            "nlist=N/500; high drop fraction at the shipped tau is the expected "
            "within-list similarity bias of IVF assignment, see module docstring"
        ),
        "cells": [],
    }
    orig_cents = similarity.N_CENTROIDS
    orig_buckets = storage.N_BUCKETS
    storage.N_BUCKETS = PROBE_BUCKETS
    try:
        for n in ns:
            nlist = max(64, n // MEAN_LIST)
            similarity.N_CENTROIDS = nlist
            sf_dir = _synth_sf_dir(spark, n)
            cell: dict = {"n_vectors": n, "nlist": nlist}

            # drop any prior build so build_s is honest
            tag = _tag(sf_dir, "embeddings")
            spark.sql(f"DROP TABLE IF EXISTS ivfpq_idx_{tag}")
            shutil.rmtree(
                os.path.join(WAREHOUSE, f"ivfpq_idx_{tag}"), ignore_errors=True
            )

            t0 = time.time()
            idx = similarity._ensure_ivfpq_index_table(spark, sf_dir)
            cell["build_s"] = round(time.time() - t0, 2)

            t0 = time.time()
            _force(similarity.semdedup_apply(spark, sf_dir))
            cell["apply_s"] = round(time.time() - t0, 2)

            acct = similarity.semdedup_apply(spark, sf_dir).collect()
            assert sum(r.n_vectors for r in acct) == n, "accounting loses vectors"
            assert all(r.n_kept + r.n_dropped == r.n_vectors for r in acct)
            certified = [r.min_drop_cos for r in acct if r.min_drop_cos is not None]
            assert all(c >= similarity.SEMDEDUP_TAU for c in certified), (
                "certified drop below tau"
            )
            cell["n_lists_realized"] = len(acct)
            cell["max_list"] = max(r.n_vectors for r in acct)
            cell["n_dropped_total"] = sum(r.n_dropped for r in acct)
            cell["pair_workload"] = sum(
                r.n_vectors * (r.n_vectors - 1) // 2 for r in acct
            )
            cell["min_drop_cos_overall"] = min(certified) if certified else None

            planted_dropped = (
                similarity._semdedup_dropped(idx)
                .filter(F.col("vec_id") >= n - N_PLANTED)
                .count()
            )
            cell["planted_recall"] = round(planted_dropped / N_PLANTED, 4)
            assert cell["planted_recall"] == 1.0, cell

            out["cells"].append(cell)
            print(json.dumps(cell), flush=True)
    finally:
        similarity.N_CENTROIDS = orig_cents
        storage.N_BUCKETS = orig_buckets

    if len(out["cells"]) >= 2:
        a, b = out["cells"][0], out["cells"][-1]
        out["corpus_ratio"] = round(b["n_vectors"] / a["n_vectors"], 2)
        out["pair_ratio"] = round(b["pair_workload"] / max(a["pair_workload"], 1), 2)
        out["apply_ratio"] = round(b["apply_s"] / max(a["apply_s"], 1e-9), 2)
    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results",
        "semdedup_scale_probe.json",
    )
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({k: v for k, v in out.items() if k != "cells"}))
    print(f"-> {dst}")


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [100_000, 400_000])
