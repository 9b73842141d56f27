#!/usr/bin/env python
"""Training-pipeline operators at 1M documents: BPE pair counts,
benchmark decontamination, and token-rarity scoring on the dedup
probe's synthetic corpus — evidence the round-3 pipeline additions
hold well past fixture scale on the same local[32] box.

Usage: python scripts/pipeline_scale_probe.py [n_docs]
Results recorded in SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("pipeline-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    path = f"/tmp/dedup_probe_{N}.parquet"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        import dedup_scale_probe  # noqa: PLC0415

        dedup_scale_probe.N = N
        dedup_scale_probe.synth_corpus(spark).repartition(64).write.mode(
            "overwrite"
        ).parquet(path)
    docs = spark.read.parquet(path)
    n_docs = docs.count()
    print(f"corpus: {n_docs:,} docs", flush=True)

    # --- BPE pair counts: corpus-wide adjacent-pair frequencies, top 20
    t0 = time.perf_counter()
    pairs_expr = """
    CASE WHEN size(split(text, ' ')) >= 2 THEN
      transform(sequence(0, size(split(text, ' ')) - 2),
                i -> concat_ws(' ', split(text, ' ')[i], split(text, ' ')[i + 1]))
    ELSE array() END
    """
    top = (
        docs.select(F.explode(F.expr(pairs_expr)).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(20)
        .collect()
    )
    t_bpe = time.perf_counter() - t0
    print(f"bpe_pair_counts: top={top[0].n:,} wall={t_bpe:.1f}s", flush=True)

    # --- BPE pair counts, Zipf-ish vocabulary: real corpora concentrate
    # pair mass in few keys, so map-side combine collapses the exchange.
    # Token id = h^2/VOCAB (square-mapping uniform h concentrates mass
    # at low ids: P(id <= x) ~ sqrt(x/V)).
    t0 = time.perf_counter()
    zipf = spark.range(N).select(
        F.expr(
            "concat_ws(' ', transform(sequence(1, 31),"
            " t -> concat('w', CAST(pmod(xxhash64(id * 131 + t), 50000)"
            "                        * pmod(xxhash64(id * 131 + t), 50000)"
            "                        DIV 50000 AS BIGINT))))"
        ).alias("text")
    )
    top_z = (
        zipf.select(F.explode(F.expr(pairs_expr)).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(20)
        .collect()
    )
    t_zipf = time.perf_counter() - t0
    print(f"bpe_pair_counts_zipf: top={top_z[0].n:,} wall={t_zipf:.1f}s", flush=True)

    # --- decontamination: 1/33 of docs are "benchmark", leaks planted
    t0 = time.perf_counter()
    sh_expr = """
    CASE WHEN size(split(text, ' ')) >= 3 THEN
      transform(sequence(1, size(split(text, ' ')) - 2),
                i -> concat_ws(' ', element_at(split(text, ' '), i),
                                    element_at(split(text, ' '), i + 1),
                                    element_at(split(text, ' '), i + 2)))
    ELSE array(text) END
    """
    bench = docs.filter(F.col("doc_id") % 33 == 0)
    leaks = docs.filter(F.col("doc_id") % 99 == 0).select(
        (F.col("doc_id") + 10 * N).alias("doc_id"), "text"
    )
    corpus = docs.filter(F.col("doc_id") % 33 != 0).unionByName(leaks)
    bench_sh = (
        bench.select(F.explode(F.expr(f"array_distinct({sh_expr})")).alias("sh"))
        .distinct()
    )
    corpus_sh = corpus.select(
        "doc_id", F.explode(F.expr(f"array_distinct({sh_expr})")).alias("sh")
    )
    shared = (
        corpus_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    flagged = shared.count()
    t_contam = time.perf_counter() - t0
    print(f"contamination: flagged={flagged:,} wall={t_contam:.1f}s", flush=True)

    # --- token rarity: vocab aggregate + key-reusing join + per-doc agg
    t0 = time.perf_counter()
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count("*").alias("c"))
    _force(
        toks.join(vocab, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum((F.col("c") <= 2).cast("int")).alias("n_rare"),
        )
    )
    t_rare = time.perf_counter() - t0
    print(f"token_rarity: wall={t_rare:.1f}s", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
