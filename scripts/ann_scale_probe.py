#!/usr/bin/env python
"""IVF-Flat ANN at 1M vectors — similarity search probed ~200x past
the 5k-vector sf0.1 fixture.

Deterministic synthetic corpus (64-dim, xxhash64-derived elements, no
Python in the generator) with 100 planted near-neighbors (query's
vector + small perturbation at id+N). Builds the registry query's IVF
structure (data-sampled centroids, nearest-list assignment,
probe-nearest-lists, exact rerank inside probed lists) and reports
index-build time, query time, and planted-neighbor recall@10.

Scoring path: the registry's fixture-scale query scores with the
expression-tree fold (aggregate/zip_with) — exact, oracle-checkable,
but expression-interpreted: ~1.4M dot/s/core (measured: 88 s for the
100k-vector assignment). This probe uses the documented 100 TB path
instead — mapInPandas numpy matmuls over Arrow batches (the "drop to
Pandas UDF when built-ins can't express it efficiently" rule): each
batch computes E @ C.T in BLAS, cutting assignment ~40x. Same
structure, same results, different kernel.

Usage: python scripts/ann_scale_probe.py [n_vectors]
Results recorded in SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DIM = 64
N_CENTROIDS = 64
N_PROBE = 4
N_QUERIES = 100
TOP_K = 10


def synth_vectors(spark):
    """element j of vector i = pmod(xxhash64(i*8191+j), 1e6)/5e5 - 1."""
    vec_expr = (
        f"transform(sequence(1, {DIM}),"
        f" j -> CAST(pmod(xxhash64(id * 8191 + j), 1000000) / 500000.0 - 1.0 AS FLOAT))"
    )
    base = spark.range(N).select(F.col("id").alias("vec_id"), F.expr(vec_expr).alias("embedding"))
    planted = base.filter(F.col("vec_id") < N_QUERIES).select(
        (F.col("vec_id") + N).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, j) ->"
            " CAST(x + CASE WHEN j = 0 THEN 0.01 ELSE 0.0 END AS FLOAT))"
        ).alias("embedding"),
    )
    return base.unionByName(planted)


def main() -> None:
    import numpy as np

    spark = get_spark("ann-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    path = f"/tmp/ann_probe_{N}.parquet"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synth_vectors(spark).repartition(64).write.mode("overwrite").parquet(path)
    emb = spark.read.parquet(path)

    cents_rows = (
        emb.filter((F.col("vec_id") >= 1000) & (F.col("vec_id") < 1000 + N_CENTROIDS))
        .orderBy("vec_id")
        .collect()
    )
    C = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in cents_rows])
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    # index build: nearest-centroid assignment, one BLAS matmul/batch
    def assign(batches):
        import pandas as pd

        for pdf in batches:
            E = np.stack(pdf["embedding"].to_numpy())
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "list_id": (En @ Cn.T).argmax(axis=1).astype("int32"),
                    "embedding": pdf["embedding"],
                }
            )

    t0 = time.perf_counter()
    assigned = emb.mapInPandas(
        assign, "vec_id long, list_id int, embedding array<float>"
    ).persist()
    n_indexed = assigned.count()
    t_build = time.perf_counter() - t0

    # query pass: probe N_PROBE nearest lists, exact rerank inside
    t0 = time.perf_counter()
    q_rows = emb.filter(F.col("vec_id") < N_QUERIES).orderBy("vec_id").collect()
    Q = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in q_rows])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    q_ids = np.array([r.vec_id for r in q_rows])
    probe_lists = np.argsort(-(Qn @ Cn.T), axis=1)[:, :N_PROBE]
    probes = spark.createDataFrame(
        [
            (int(q_ids[i]), int(lst))
            for i in range(len(q_ids))
            for lst in probe_lists[i]
        ],
        "q_id long, list_id int",
    )
    Qn_rows = {int(q_ids[i]): Qn[i] for i in range(len(q_ids))}

    def score(batches):
        import pandas as pd

        for pdf in batches:
            E = np.stack(pdf["embedding"].to_numpy())
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            Qm = np.stack([Qn_rows[q] for q in pdf["q_id"]])
            yield pd.DataFrame(
                {
                    "q_id": pdf["q_id"],
                    "vec_id": pdf["vec_id"],
                    "cos": (En * Qm).sum(axis=1),
                }
            )

    cand = assigned.join(F.broadcast(probes), "list_id").filter(
        F.col("vec_id") != F.col("q_id")
    )
    scored = cand.select("q_id", "vec_id", "embedding").mapInPandas(
        score, "q_id long, vec_id long, cos double"
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    ranked = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .persist()
    )
    n_results = ranked.count()
    t_query = time.perf_counter() - t0

    hits = ranked.filter(F.col("vec_id") == F.col("q_id") + N).count()
    print(
        f"vectors={n_indexed:,} build={t_build:.1f}s "
        f"queries={N_QUERIES} results={n_results} query={t_query:.1f}s "
        f"planted_recall@{TOP_K}={hits}/{N_QUERIES} ({hits / N_QUERIES:.0%})",
        flush=True,
    )


if __name__ == "__main__":
    main()
