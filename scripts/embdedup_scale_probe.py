#!/usr/bin/env python
"""Embedding-cosine near-dup at scale: the LSH-candidate + exact-verify
pipeline (operators/dedup.py embedding_cosine_pairs) probed at 1M
64-dim vectors with 1,000 planted exact duplicates — evidence that the
registered dedup_embedding_cosine formulation is the scale path, not
just fixture-correct:

- candidate volume stays ~linear (bucket equi-join, never an n^2 pair
  product: at 1M vectors the all-pairs product would be 5e11 rows);
- recall on planted cos-1.0 pairs is exact (identical vectors collide
  in every hyperplane table).

Usage: python scripts/embdedup_scale_probe.py [n_vectors]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import get_spark
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.operators.dedup import (
    embedding_cosine_pairs,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_DUPS = 1_000
DIM = 64


def main() -> None:
    spark = get_spark("embdedup-probe")
    spark.sparkContext.setLogLevel("ERROR")

    path = f"/tmp/embdedup_probe_{N}.parquet"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # Deterministic-enough corpus: 64 independent rand columns per
        # row, materialized to parquet once so planted copies are
        # bit-identical re-reads, not rand() re-evaluations.
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
    corpus = emb.unionByName(copies)

    # Bucket width scales with corpus size (b ≈ log2(n)) so expected
    # bucket occupancy stays ~1 and the candidate join stays linear —
    # at 1M vectors the fixture's 4-bit buckets would hold ~62k vectors
    # each and the join would regenerate the n^2 product (~1.6e10
    # candidate rows) the LSH exists to avoid. 20 bits / 8 OR'd tables
    # keeps recall at cos>=0.99 around 0.98 for near-identical pairs
    # and exactly 1.0 for identical ones (same signature always).
    n_planes = max(4, (N - 1).bit_length())
    t0 = time.time()
    pairs = embedding_cosine_pairs(corpus, threshold=0.99, n_planes=n_planes)
    found = pairs.count()
    elapsed = round(time.time() - t0, 1)

    planted = (
        pairs.filter(
            (F.col("vec_b") == F.col("vec_a") + 10_000_000) & (F.col("vec_a") < N_DUPS)
        ).count()
    )
    print(
        f"RESULT n={N} dups={N_DUPS}: found {found} pairs "
        f"({planted}/{N_DUPS} planted recalled) in {elapsed}s"
    )
    assert planted == N_DUPS, "planted exact duplicates must all be recalled"


if __name__ == "__main__":
    main()
