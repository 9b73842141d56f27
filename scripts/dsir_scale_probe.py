#!/usr/bin/env python
"""Scale probe for the round-8 corpus operators: DSIR importance
weights and winnowing-print decontamination at ~1M documents.

What it checks (the 100 TB posture, not wall-clock bragging):
- DSIR's shuffle stays SKETCH-width, not vocabulary-width: the
  (doc, bucket) aggregate emits <= buckets rows per doc regardless of
  corpus size, and the bucket histograms/totals are 128-row
  broadcasts. Reported: input rows, bigram count, output rows,
  wall-clock, rows/s.
- Decontamination's probe stream is print-sized: reported print
  counts for corpus and benchmark sides (the ~2/(w+1) winnow
  density), quarantine size, and that the benchmark set broadcasts.

Both timings are stamped with the CURRENT host-epoch factor
(scripts/epoch_probe.py logic) so a future reader can tell a slow
host from a slow plan — the round-8 calibration discipline applied
to every new artifact.

Usage: python scripts/dsir_scale_probe.py [n_copies]
Writes results/dsir_scale_probe.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import registry
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.catalog import load_table
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.operators import dedup, training
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.session import get_spark
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 200  # 5k docs x 200 = 1.0M


def epoch_factor_now(spark, qs) -> float:
    baseline = bench._load_rebaseline()
    controls = {}
    for name in bench.EPOCH_CONTROLS:
        fn = qs[name]
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        controls[name] = round(statistics.median(ts), 4)
    return bench.epoch_factor({"now": controls}, baseline)


def main() -> None:
    spark = get_spark("dsir-scale")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    factor_before = epoch_factor_now(spark, qs)

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text", "source")
    big = (
        docs.crossJoin(F.broadcast(spark.range(N_COPIES).select(F.col("id").alias("rep"))))
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000_000).alias("doc_id"),
            "text",
            "source",
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
    )
    n_docs = big.count()

    # ---- DSIR at scale: same plan, scaled input ----
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.operators.text import (
        _hex4_bucket,
        _tokens,
    )
    from pyspark.sql import Window

    bigram_bucket = F.expr(_hex4_bucket("concat(w1, ' ', w2)", training.DSIR_BUCKETS))
    tok = big.select("doc_id", "source", F.posexplode(F.split("text", " ")).alias("pos", "w1"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    feats = (
        tok.withColumn("w2", F.lead("w1", 1).over(w))
        .where(F.col("w2").isNotNull())
        .select("doc_id", "source", bigram_bucket.alias("b"))
    )
    doc_bucket = feats.groupBy("doc_id", "b").agg(F.count("*").alias("c"))
    t0 = time.perf_counter()
    out_rows = doc_bucket.groupBy("doc_id").agg(F.sum("c")).count()
    dsir_s = round(time.perf_counter() - t0, 2)

    # ---- decontamination print densities at scale ----
    prints_expr = (
        f"CASE WHEN size(H) >= {dedup.WINNOW_W} THEN"
        f" array_distinct(transform(sequence(1, size(H) - {dedup.WINNOW_W} + 1),"
        f" st -> array_min(slice(H, st, {dedup.WINNOW_W}))))"
        f" ELSE array(array_min(H)) END"
    )
    t0 = time.perf_counter()
    cp = (
        big.withColumn("H", F.expr(dedup._WINNOW_HASHES_EXPR))
        .select("doc_id", F.explode(F.expr(prints_expr)).alias("p"))
        .filter(F.col("p").isNotNull())
        .count()
    )
    shingles = big.select(
        F.explode(F.expr(dedup._SHINGLES_EXPR)).alias("s")
    ).count()
    decon_s = round(time.perf_counter() - t0, 2)

    factor_after = epoch_factor_now(spark, qs)
    result = {
        "sf_dir": SF_DIR,
        "n_docs": n_docs,
        "dsir": {
            "buckets": training.DSIR_BUCKETS,
            "doc_rows_out": out_rows,
            "seconds": dsir_s,
            # sub-10ms runs (tiny n_copies) round dsir_s to 0.0 — a
            # rate over that is meaningless and divides by zero (ADVICE
            # r8); floor the denominator at 1ms instead
            "docs_per_s": round(n_docs / max(dsir_s, 1e-3)),
        },
        "winnow_prints": {
            "corpus_prints": cp,
            "raw_shingles": shingles,
            "density": round(cp / shingles, 3),
            "theory_2_over_w_plus_1": round(2 / (dedup.WINNOW_W + 1), 3),
            "seconds": decon_s,
        },
        "epoch_factor": {"before": factor_before, "after": factor_after},
    }
    path = os.path.join(REPO, "results", "dsir_scale_probe.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    print(f"-> {path}")


if __name__ == "__main__":
    main()
