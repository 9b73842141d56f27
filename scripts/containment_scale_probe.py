#!/usr/bin/env python
"""Exact postings-join dedup (containment + Jaccard) at 1M documents —
the hash-free near-dup pipeline probed ~180x past the sf0.1 fixture.

Deterministic synthetic corpus (vocab-sampled ~31-token docs, all
Spark built-ins), with 1% planted CONTAINED docs: the first 15 tokens
of every 100th doc become a new doc, so its 13 word-3-gram shingles
are a strict subset of the original's 29. That pair scores
containment = 1.0 but Jaccard = 13/29 ~ 0.45 — BELOW the 0.6 Jaccard
threshold. The probe runs the same DF-capped postings self-join the
registry queries use (_shingle_overlap_pairs shape, inlined over the
synthetic corpus) and reports wall time, pair counts, planted-pair
recall for the containment measure, and the count of planted pairs
the Jaccard measure misses (expected: all of them) — the
operator-level argument for carrying both measures, demonstrated at
corpus scale.

Scale shape: ~29M (doc, shingle) postings rows through one exchange;
candidate volume is bounded by the DF cap (a shingle in > 20 docs
contributes nothing), so the self-join output stays linear in the
planted-pair count on a random vocab. Usage:
python scripts/containment_scale_probe.py [n_docs]. Results in
SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import get_spark
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.operators.dedup import (
    _SHINGLES_EXPR,
    CONTAINMENT_THRESHOLD,
    MAX_SHINGLE_DF,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DUP_EVERY = 100  # 1% planted contained docs
VOCAB = 50_000
DOC_TOKENS = 31
KEEP_TOKENS = 15  # planted doc = first 15 tokens => 13 of 29 shingles


def synth_corpus(spark):
    base = spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"concat_ws(' ', transform(sequence(1, {DOC_TOKENS}),"
            f" t -> concat('w', pmod(xxhash64(id * 131 + t), {VOCAB}))))"
        ).alias("text"),
    )
    contained = base.filter(F.col("doc_id") % DUP_EVERY == 0).select(
        (F.col("doc_id") + N).alias("doc_id"),
        F.expr(
            f"concat_ws(' ', slice(split(text, ' '), 1, {KEEP_TOKENS}))"
        ).alias("text"),
    )
    return base.unionByName(contained).repartition(
        spark.sparkContext.defaultParallelism
    )


def main() -> None:
    spark = get_spark("containment-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = synth_corpus(spark)

    t0 = time.perf_counter()
    shingled = corpus.withColumn(
        "sh", F.explode(F.expr(f"array_distinct({_SHINGLES_EXPR})"))
    ).select("doc_id", "sh")
    hot = (
        shingled.groupBy("sh")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > MAX_SHINGLE_DF)
        .select("sh")
    )
    capped = shingled.join(F.broadcast(hot), "sh", "left_anti")
    sizes = capped.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sh_sz = capped.join(sizes, "doc_id")
    l, r = sh_sz.alias("l"), sh_sz.alias("r")
    pairs = (
        l.join(r, (F.col("l.sh") == F.col("r.sh")) & (F.col("l.doc_id") < F.col("r.doc_id")))
        .groupBy(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.sz").alias("sz_a"),
            F.col("r.sz").alias("sz_b"),
        )
        .agg(F.count("*").alias("common"))
    )
    cont = F.col("common") / F.least(F.col("sz_a"), F.col("sz_b"))
    jac = F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
    scored = pairs.select(
        "doc_a",
        "doc_b",
        cont.alias("containment"),
        jac.alias("jaccard"),
    ).filter(F.col("containment") >= CONTAINMENT_THRESHOLD)

    planted_hit = F.sum(
        ((F.col("doc_b") == F.col("doc_a") + N) & (F.col("doc_a") % DUP_EVERY == 0)).cast("int")
    )
    jaccard_would_miss = F.sum(
        (
            (F.col("doc_b") == F.col("doc_a") + N)
            & (F.col("doc_a") % DUP_EVERY == 0)
            & (F.col("jaccard") < 0.6)
        ).cast("int")
    )
    row = scored.agg(
        F.count("*").alias("n_pairs"),
        planted_hit.alias("planted_found"),
        jaccard_would_miss.alias("jaccard_misses"),
    ).collect()[0]
    dt = time.perf_counter() - t0

    n_planted = N // DUP_EVERY
    print(
        f"docs={N + n_planted:,} planted={n_planted:,} wall={dt:.1f}s "
        f"pairs={row.n_pairs:,} planted_found={row.planted_found:,} "
        f"recall={row.planted_found / n_planted:.4f} "
        f"jaccard_would_miss={row.jaccard_misses:,}"
    )


if __name__ == "__main__":
    main()
