#!/usr/bin/env python
"""IVF-PQ ANN at 1M vectors — the composed index (ivfpq_ann_topk) at
~200x the fixture, on the ann_scale_probe synthetic corpus (100
planted near-neighbors at id+N).

One mapInPandas pass builds the WHOLE index row: nearest coarse list
(BLAS matmul) + 8 PQ codes (per-subspace argmin against a data-sampled
16-center codebook) — 4 bytes of code replacing 256 bytes of float32.
Queries probe N_PROBE lists, score candidates by ADC (per-query
256-float lookup table, pure numpy gather — candidates' float vectors
are NEVER touched), shortlist top-100, and exact-rerank only the
shortlist. Reports build time, query time, and planted recall@10.

Usage: python scripts/ivfpq_scale_probe.py [n_vectors]
Results recorded in SCALE.md.

STORED-INDEX ARM (VERDICT r11 #1):
``python scripts/ivfpq_scale_probe.py --stored-index [N ...]``
(default 250000 1000000) measures the registry's
`ivfpq_ann_topk_bucketed` — the ONE stored bucketBy(list_id)
codes+vectors table — against the recompute-per-session
`ivfpq_ann_topk`, via storage.ensure_bucketed_specs itself (nothing
re-implemented). Three cells per N: one-time build_s, median stored
probe, one unstored run; plus a 4x-query-batch cell per N showing
probe cost tracks the query batch. Writes
results/ivfpq_scale_probe.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import get_spark

_POSITIONAL = [a for a in sys.argv[1:] if not a.startswith("--")]
N = int(_POSITIONAL[0]) if _POSITIONAL else 1_000_000
DIM = 64
N_CENTROIDS = 64
N_PROBE = 4
N_QUERIES = 100
TOP_K = 10
SUBS = 8
SUBDIM = DIM // SUBS
PQ_K = 16
SHORTLIST = 100


def synth_vectors(spark):
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

    spark = get_spark("ivfpq-scale-probe")
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

    # Data-sampled PQ codebook: subspace s's 16 centers = that
    # subrange of vectors 2000..2015 (the "trained codebook drops into
    # the same broadcast" path — here sampled, on a cluster k-means).
    cb_rows = (
        emb.filter((F.col("vec_id") >= 2000) & (F.col("vec_id") < 2000 + PQ_K))
        .orderBy("vec_id")
        .collect()
    )
    CB = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in cb_rows])
    books = [CB[:, s * SUBDIM : (s + 1) * SUBDIM].copy() for s in range(SUBS)]

    def build(batches):
        import pandas as pd

        for pdf in batches:
            E = np.stack(pdf["embedding"].to_numpy())
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            lists = (En @ Cn.T).argmax(axis=1).astype("int32")
            codes = np.empty((len(E), SUBS), dtype="int32")
            for s in range(SUBS):
                sub = E[:, s * SUBDIM : (s + 1) * SUBDIM]
                d2 = (
                    (sub * sub).sum(axis=1, keepdims=True)
                    - 2.0 * sub @ books[s].T
                    + (books[s] * books[s]).sum(axis=1)
                )
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "list_id": lists,
                    "codes": list(codes),
                    "embedding": pdf["embedding"],
                }
            )

    t0 = time.perf_counter()
    indexed = emb.mapInPandas(
        build,
        "vec_id long, list_id int, codes array<int>, embedding array<float>",
    ).persist()
    n_indexed = indexed.count()
    t_build = time.perf_counter() - t0

    # Query pass: probes + per-query ADC lookup table.
    t0 = time.perf_counter()
    q_rows = emb.filter(F.col("vec_id") < N_QUERIES).orderBy("vec_id").collect()
    Q = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in q_rows])
    q_ids = np.array([r.vec_id for r in q_rows])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    probe_lists = np.argsort(-(Qn @ Cn.T), axis=1)[:, :N_PROBE]
    probes = spark.createDataFrame(
        [(int(q_ids[i]), int(lst)) for i in range(len(q_ids)) for lst in probe_lists[i]],
        "q_id long, list_id int",
    )
    # LUT[q][s][k] = q_sub(s) . book[s][k]  (dot-product ADC)
    LUT = {
        int(q_ids[i]): np.stack(
            [Q[i, s * SUBDIM : (s + 1) * SUBDIM] @ books[s].T for s in range(SUBS)]
        )
        for i in range(len(q_ids))
    }

    def adc(batches):
        import pandas as pd

        for pdf in batches:
            codes = np.stack(pdf["codes"].to_numpy())
            out = np.empty(len(pdf))
            for i, q in enumerate(pdf["q_id"]):
                lut = LUT[q]
                out[i] = lut[np.arange(SUBS), codes[i]].sum()
            yield pd.DataFrame(
                {"q_id": pdf["q_id"], "vec_id": pdf["vec_id"], "adc": out}
            )

    cand = indexed.join(F.broadcast(probes), "list_id").filter(
        F.col("vec_id") != F.col("q_id")
    )
    scored = cand.select("q_id", "vec_id", "codes").mapInPandas(
        adc, "q_id long, vec_id long, adc double"
    )
    ws = Window.partitionBy("q_id").orderBy(F.col("adc").desc(), F.col("vec_id").asc())
    short = (
        scored.withColumn("s_rank", F.row_number().over(ws))
        .filter(F.col("s_rank") <= SHORTLIST)
        .select("q_id", "vec_id")
    )

    Qn_rows = {int(q_ids[i]): Qn[i] for i in range(len(q_ids))}

    def exact(batches):
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

    rer = (
        short.join(indexed.select("vec_id", "embedding"), "vec_id")
        .mapInPandas(exact, "q_id long, vec_id long, cos double")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    ranked = (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .persist()
    )
    n_results = ranked.count()
    t_query = time.perf_counter() - t0
    hits = ranked.filter(F.col("vec_id") == F.col("q_id") + N).count()

    print(
        json.dumps(
            {
                "probe": "ivfpq_ann_1m",
                "n_vectors": int(n_indexed),
                "build_sec": round(t_build, 1),
                "query_sec": round(t_query, 1),
                "n_queries": N_QUERIES,
                "n_results": int(n_results),
                "planted_recall_at_10": hits / N_QUERIES,
                "code_bytes_per_vec": SUBS * 1,
                "note": "ADC never touches candidate floats; exact rerank only on the 100-deep shortlist",
            }
        ),
        flush=True,
    )


DIM_STORED = 64
STORED_REPS = 3


def _synth_sf_dir(spark, n: int) -> str:
    """Deterministic synthetic embeddings.parquet shaped like a
    testdata sf_dir (vec_id BIGINT, embedding ARRAY<FLOAT>) so the
    stored-index arm exercises the EXACT registry operator + its
    ensure_bucketed_specs machinery."""
    sf_dir = f"/tmp/ivfpq_probe_{n}"
    path = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        vec_expr = (
            f"transform(sequence(1, {DIM_STORED}),"
            f" j -> CAST(pmod(xxhash64(vec_id * 8191 + j), 1000000) / 500000.0 - 1.0 AS FLOAT))"
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


def stored_index_main(ns: list[int]) -> None:
    """VERDICT r11 #1 arm: the stored bucketed index vs per-session
    recompute, measured on the shipped operators."""
    import shutil

    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.operators import (
        similarity,
    )
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.sources.storage import (
        WAREHOUSE,
        _tag,
    )

    spark = get_spark("ivfpq-stored-index-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"arm": "stored_index", "dim": DIM_STORED, "reps": STORED_REPS, "cells": []}

    for n in ns:
        sf_dir = _synth_sf_dir(spark, n)
        cell: dict = {"n_vectors": n}

        # drop any prior build so build_s is honest
        tag = _tag(sf_dir, "embeddings")
        spark.sql(f"DROP TABLE IF EXISTS ivfpq_idx_{tag}")
        shutil.rmtree(os.path.join(WAREHOUSE, f"ivfpq_idx_{tag}"), ignore_errors=True)

        t0 = time.time()
        similarity._ensure_ivfpq_index_table(spark, sf_dir)
        cell["build_s"] = round(time.time() - t0, 2)

        probes = []
        for _ in range(STORED_REPS):
            t0 = time.time()
            _force(similarity.ivfpq_ann_topk_bucketed(spark, sf_dir))
            probes.append(time.time() - t0)
        cell["stored_probe_s"] = round(statistics.median(probes), 2)
        cell["stored_probe_all"] = [round(p, 2) for p in probes]

        t0 = time.time()
        _force(similarity.ivfpq_ann_topk(spark, sf_dir))
        cell["unstored_run_s"] = round(time.time() - t0, 2)
        spark.catalog.clearCache()  # unstored variant's size-gated persist

        # query-batch arm at this N: 4x the queries, same corpus
        orig_q = similarity.N_QUERIES
        try:
            similarity.N_QUERIES = orig_q * 4
            t0 = time.time()
            _force(similarity.ivfpq_ann_topk_bucketed(spark, sf_dir))
            cell["stored_probe_4x_queries_s"] = round(time.time() - t0, 2)
            cell["n_queries"] = [orig_q, orig_q * 4]
        finally:
            similarity.N_QUERIES = orig_q

        out["cells"].append(cell)
        print(json.dumps(cell), flush=True)

    if len(out["cells"]) >= 2:
        a, b = out["cells"][0], out["cells"][-1]
        out["corpus_ratio"] = round(b["n_vectors"] / a["n_vectors"], 2)
        out["stored_probe_ratio"] = round(
            b["stored_probe_s"] / max(a["stored_probe_s"], 1e-9), 2
        )
        out["unstored_ratio"] = round(
            b["unstored_run_s"] / max(a["unstored_run_s"], 1e-9), 2
        )
    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results",
        "ivfpq_scale_probe.json",
    )
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({k: v for k, v in out.items() if k != "cells"}))
    print(f"-> {dst}")


if __name__ == "__main__":
    if "--stored-index" in sys.argv[1:]:
        stored_index_main([int(a) for a in _POSITIONAL] or [250_000, 1_000_000])
    else:
        main()
