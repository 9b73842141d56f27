#!/usr/bin/env python
"""SemDeDup cluster-bounded semantic dedup at scale: the
cluster-then-pair pipeline (operators/dedup.py dedup_semantic_clusters
kernel) probed at 200k 64-dim vectors with k = 1024 centroids and 500
planted exact duplicates.

What this demonstrates beyond the fixture:
- assignment with a 1024-centroid broadcast block stays a map-side
  scan (min_by-struct argmin: the exchange carries n rows, not n*k);
- candidate volume is sum over clusters of |c|^2 ~ n^2/k, not n^2 —
  at 200k/1024 that is ~2e7 candidate pairs instead of 2e10;
- planted identical vectors land in the same cluster by construction,
  so recall on exact dups is 100%.

Usage: python scripts/semdedup_scale_probe.py [n_vectors] [k]
Results recorded in SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import get_spark
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.functions import vectors
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.operators.similarity import (
    _argmin_assign,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
N_DUPS = 500
DIM = 64


def main() -> None:
    spark = get_spark("semdedup-probe")
    spark.sparkContext.setLogLevel("ERROR")

    path = f"/tmp/embdedup_probe_{N}.parquet"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        base = spark.range(0, N, 1, 64).select(
            F.col("id").alias("vec_id"),
            F.array(*[(F.rand(seed=i) * 2 - 1).cast("float") for i in range(DIM)]).alias(
                "embedding"
            ),
        )
        base.write.mode("overwrite").parquet(path)
    emb = spark.read.parquet(path)

    copies = emb.filter(F.col("vec_id") < N_DUPS).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    corpus = (
        emb.unionByName(copies)
        .withColumn("nrm", vectors.norm(F.col("embedding")))
        .persist()
    )
    cents = emb.filter(F.col("vec_id") < K).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_vec")
    )

    t0 = time.time()
    assigned = _argmin_assign(corpus, cents, "centroid_id").persist()
    n_assigned = assigned.count()
    t_assign = time.time() - t0

    t0 = time.time()
    cand = (
        assigned.alias("l")
        .join(
            assigned.alias("r"),
            (F.col("l.centroid_id") == F.col("r.centroid_id"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(F.col("l.vec_id").alias("vec_a"), F.col("r.vec_id").alias("vec_b"))
    )
    pairs = cand.join(
        corpus.select(
            F.col("vec_id").alias("vec_a"),
            F.col("embedding").alias("emb_a"),
            F.col("nrm").alias("nrm_a"),
        ),
        "vec_a",
    ).join(
        corpus.select(
            F.col("vec_id").alias("vec_b"),
            F.col("embedding").alias("emb_b"),
            F.col("nrm").alias("nrm_b"),
        ),
        "vec_b",
    )
    cos = vectors.dot(F.col("emb_a"), F.col("emb_b")) / (F.col("nrm_a") * F.col("nrm_b"))
    dups = pairs.withColumn("cos", F.round(cos, 4)).filter(F.col("cos") >= 0.99)
    found = dups.count()
    t_pairs = time.time() - t0

    planted = dups.filter(
        (F.col("vec_b") == F.col("vec_a") + 10_000_000) & (F.col("vec_a") < N_DUPS)
    ).count()
    print(
        f"RESULT n={n_assigned:,} k={K}: assign {t_assign:.1f}s, "
        f"pair+verify {t_pairs:.1f}s, {found} dup pairs "
        f"({planted}/{N_DUPS} planted recalled)"
    )
    assert planted == N_DUPS, "planted exact duplicates must all be recalled"


if __name__ == "__main__":
    main()
