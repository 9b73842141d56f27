#!/usr/bin/env python
"""Incremental MinHash index-probe scaling (VERDICT r9 #5): show that
per-BATCH lookup cost scales with the batch, not the corpus.

The production claim behind dedup_minhash_incremental: the corpus's
band-signature index is built ONCE (cost proportional to the corpus,
amortized over every future ingest), and each batch's admission query
costs (batch signature computation) + (equi-join against the index on
(band, bh)) — so growing the corpus k-fold should leave per-batch
latency near-flat, while growing the batch k-fold should scale it
~linearly.

Protocol: synthetic vocab-sampled corpora (same generator family as
dedup_scale_probe.py) at CORPUS_SIZES with a FIXED batch of
BATCH_SIZE docs (10% planted near-dups of corpus docs), plus a
BATCH_SCALE x batch at the largest corpus. For each cell: build +
persist the index (timed separately, amortized in production),
materialize it, then time the batch lookup end-to-end (signatures +
band join + verify) and record planted recall.

Usage: python scripts/incremental_minhash_probe.py
Writes results/incremental_minhash_probe.json; summarized in SCALE.md.
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
    N_HASHES,
    band_table,
    minhash_signatures,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS_SIZES = (250_000, 1_000_000)
BATCH_SIZE = 10_000
BATCH_SCALE = 4
VOCAB = 50_000
DOC_TOKENS = 31
PLANT_EVERY = 10  # 10% of the batch are near-dup re-submissions


def synth_corpus(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"concat_ws(' ', transform(sequence(1, {DOC_TOKENS}),"
            f" t -> concat('w', pmod(xxhash64(id * 131 + t), {VOCAB}))))"
        ).alias("text"),
    )


def synth_batch(spark, corpus_n: int, batch_n: int):
    """batch = novel docs (id >= 10M, disjoint token seed) + planted
    near-dups: every PLANT_EVERY-th batch slot re-submits corpus doc
    (slot * PLANT_EVERY) with one appended token (Jaccard ~0.9)."""
    novel = spark.range(batch_n - batch_n // PLANT_EVERY).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.expr(
            f"concat_ws(' ', transform(sequence(1, {DOC_TOKENS}),"
            f" t -> concat('w', pmod(xxhash64((id + 10000000) * 131 + t), {VOCAB}))))"
        ).alias("text"),
    )
    planted = spark.range(batch_n // PLANT_EVERY).select(
        (F.col("id") * PLANT_EVERY).alias("src_id")
    ).select(
        (F.col("src_id") + 20_000_000).alias("doc_id"),
        F.expr(
            f"concat(concat_ws(' ', transform(sequence(1, {DOC_TOKENS}),"
            f" t -> concat('w', pmod(xxhash64(src_id * 131 + t), {VOCAB})))), ' wextra')"
        ).alias("text"),
    )
    return novel.unionByName(planted)


def bucketed_index(spark, corpus, tag):
    """Write the corpus index as the stored bucketed tables
    dedup_minhash_incremental_bucketed uses (signatures from one scan,
    bands derived from the stored signatures), once per corpus size —
    via the SAME storage.ensure_bucketed_specs the operator uses, so
    the probe measures exactly the shipped layout."""
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.sources.storage import (
        ensure_bucketed_specs,
    )

    sigs_tbl, bands_tbl = f"probe_mh_sig_{tag}", f"probe_mh_band_{tag}"
    sigs, bands = ensure_bucketed_specs(
        spark,
        (
            (sigs_tbl, ("doc_id",), lambda: minhash_signatures(corpus)),
            (bands_tbl, ("band", "bh"), lambda: band_table(spark.table(sigs_tbl))),
        ),
    )
    return bands, sigs


def lookup(batch, index_sigs, index_bands):
    """The dedup_minhash_incremental probe pipeline on explicit frames."""
    batch_sigs = minhash_signatures(batch).persist()
    cand = (
        band_table(batch_sigs)
        .withColumnRenamed("doc_id", "batch_id")
        .join(index_bands.withColumnRenamed("doc_id", "corpus_id"), ["band", "bh"])
        .select("batch_id", "corpus_id")
        .dropDuplicates(["batch_id", "corpus_id"])
        .join(
            batch_sigs.select(F.col("doc_id").alias("batch_id"), F.col("signature").alias("sig_b")),
            "batch_id",
        )
        .join(
            index_sigs.select(F.col("doc_id").alias("corpus_id"), F.col("signature").alias("sig_c")),
            "corpus_id",
        )
    )
    est = F.expr(
        "aggregate(zip_with(sig_b, sig_c, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END),"
        " 0, (acc, v) -> acc + v)"
    ) / F.lit(float(N_HASHES))
    return cand.withColumn("est_jaccard", est).filter(F.col("est_jaccard") >= 0.5)


def main() -> None:
    spark = get_spark("incr-minhash-probe")
    spark.sparkContext.setLogLevel("ERROR")
    cells = []
    for corpus_n in CORPUS_SIZES:
        path = f"/tmp/incr_probe_corpus_{corpus_n}.parquet"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            synth_corpus(spark, corpus_n).repartition(64).write.mode("overwrite").parquet(path)
        corpus = spark.read.parquet(path)

        t0 = time.perf_counter()
        index_sigs = minhash_signatures(corpus).persist()
        index_bands = band_table(index_sigs).persist()
        index_rows = index_bands.count()  # materialize the index
        index_sigs.count()
        build_s = time.perf_counter() - t0

        batch_sizes = (BATCH_SIZE, BATCH_SIZE * BATCH_SCALE) if corpus_n == max(
            CORPUS_SIZES
        ) else (BATCH_SIZE,)
        for batch_n in batch_sizes:
            batch = synth_batch(spark, corpus_n, batch_n)
            t0 = time.perf_counter()
            pairs = lookup(batch, index_sigs, index_bands)
            planted_found = pairs.filter(
                F.col("batch_id") == F.col("corpus_id") + 20_000_000
            ).count()
            n_pairs = pairs.count()
            query_s = time.perf_counter() - t0
            n_planted = batch_n // PLANT_EVERY
            cell = {
                "corpus_docs": corpus_n,
                "batch_docs": batch_n,
                "index_rows": index_rows,
                "index_build_s": round(build_s, 2),
                "batch_query_s": round(query_s, 2),
                "pairs_found": n_pairs,
                "planted": n_planted,
                "planted_recall": round(planted_found / n_planted, 4),
            }
            cells.append(cell)
            print(json.dumps(cell), flush=True)
        index_sigs.unpersist()
        index_bands.unpersist()

        # r11 STORED-BUCKETED arm (VERDICT r10 #1): the same index as
        # bucketBy tables — (band, bh, doc_id) on (band, bh) and
        # (doc_id, signature) on doc_id — probed with merge-hinted
        # joins so the index side reads co-located buckets with ZERO
        # exchange (the plan tests pin this; here we measure it).
        t0 = time.perf_counter()
        b_bands, b_sigs = bucketed_index(spark, corpus, corpus_n)
        build_bucketed_s = time.perf_counter() - t0
        batch = synth_batch(spark, corpus_n, BATCH_SIZE)
        t0 = time.perf_counter()
        pairs = lookup(batch, b_sigs.hint("merge"), b_bands.hint("merge"))
        planted_found = pairs.filter(
            F.col("batch_id") == F.col("corpus_id") + 20_000_000
        ).count()
        n_pairs = pairs.count()
        query_s = time.perf_counter() - t0
        cell = {
            "corpus_docs": corpus_n,
            "batch_docs": BATCH_SIZE,
            "arm": "stored_bucketed",
            "index_build_s": round(build_bucketed_s, 2),
            "batch_query_s": round(query_s, 2),
            "pairs_found": n_pairs,
            "planted": BATCH_SIZE // PLANT_EVERY,
            "planted_recall": round(
                planted_found / (BATCH_SIZE // PLANT_EVERY), 4
            ),
        }
        cells.append(cell)
        print(json.dumps(cell), flush=True)

    out = {
        "generated": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "claim": (
            "per-batch lookup cost scales with the batch, not the corpus: "
            "fixed 10k batch vs 4x corpus growth should move batch_query_s "
            "far less than 4x; 4x batch at fixed corpus should move it ~4x"
        ),
        "cells": cells,
    }
    with open(os.path.join(REPO, "results", "incremental_minhash_probe.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("-> results/incremental_minhash_probe.json")


if __name__ == "__main__":
    main()
