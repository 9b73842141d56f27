#!/usr/bin/env python
"""MinHash-LSH dedup at 1M documents — the flagship LLM-pipeline
operator probed ~180x past the sf0.1 fixture (5.5k docs).

Generates a deterministic synthetic corpus (vocab-sampled ~31-token
docs, all Spark built-ins — no Python in the generator) with 1%
planted near-duplicates (one appended token => shingle Jaccard ~0.9),
runs the SAME minhash_signatures + banding + verify pipeline the
registry query uses, and reports wall time plus planted-pair recall.

Usage: python scripts/dedup_scale_probe.py [n_docs]
Results recorded in SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import get_spark
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.operators.dedup import (
    BAND_ROWS,
    N_BANDS,
    minhash_signatures,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DUP_EVERY = 100  # 1% planted near-dups
VOCAB = 50_000
DOC_TOKENS = 31


def synth_corpus(spark):
    """Deterministic vocab-sampled corpus + planted near-dups, all
    JVM-side: token t of doc d = 'w' || pmod(xxhash64(d*131+t), VOCAB)."""
    base = spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"concat_ws(' ', transform(sequence(1, {DOC_TOKENS}),"
            f" t -> concat('w', pmod(xxhash64(id * 131 + t), {VOCAB}))))"
        ).alias("text"),
    )
    dups = base.filter(F.col("doc_id") % DUP_EVERY == 0).select(
        (F.col("doc_id") + N).alias("doc_id"),
        F.concat("text", F.lit(" wextra")).alias("text"),
    )
    return base.unionByName(dups)


def main() -> None:
    spark = get_spark("dedup-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    corpus_path = f"/tmp/dedup_probe_{N}.parquet"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        synth_corpus(spark).repartition(64).write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    n_docs = corpus.count()

    t0 = time.perf_counter()
    sigs = minhash_signatures(corpus).persist()
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {N_BANDS - 1}), b ->"
                f" struct(b AS band, xxhash64(slice(signature, b * {BAND_ROWS} + 1,"
                f" {BAND_ROWS})) AS bh))"
            )
        ).alias("band"),
    ).select("doc_id", F.col("band.band").alias("band"), F.col("band.bh").alias("bh"))
    cand = (
        bands.alias("l")
        .join(
            bands.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .join(
            sigs.select(F.col("doc_id").alias("doc_a"), F.col("signature").alias("sig_a")),
            "doc_a",
        )
        .join(
            sigs.select(F.col("doc_id").alias("doc_b"), F.col("signature").alias("sig_b")),
            "doc_b",
        )
    )
    est = F.expr(
        "aggregate(zip_with(sig_a, sig_b, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END),"
        " 0, (acc, v) -> acc + v)"
    ) / F.lit(float(32))
    pairs = cand.withColumn("jaccard_est", est).filter(F.col("jaccard_est") >= 0.5)
    planted_found = pairs.filter(F.col("doc_b") == F.col("doc_a") + N).count()
    n_pairs = pairs.count()
    elapsed = time.perf_counter() - t0

    n_planted = (N + DUP_EVERY - 1) // DUP_EVERY
    print(
        f"docs={n_docs:,} pairs={n_pairs:,} planted_recall="
        f"{planted_found}/{n_planted} ({planted_found / n_planted:.1%}) "
        f"wall={elapsed:.1f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()
