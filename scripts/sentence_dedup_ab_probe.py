#!/usr/bin/env python
"""Sentence-dedup corpus-frequency A/B: window-over-digest vs
groupBy+join-back, at probe scale.

`dedup_sentence_stats` / `dedup_sentence_clean` (round 7) compute the
corpus frequency of every pseudo-sentence as
``count() over (partition by md5-digest)`` — one shuffle keyed on the
digest, one scan of the chunk stream. The docstring claims this is
strictly cheaper than the classic groupBy(digest).count() + join-back
form, which re-chunks the corpus for the probe side and shuffles
twice. This probe measures that claim instead of assuming it.

Deterministic synthetic corpus (same xxhash64-vocab builder as
winnowing_scale_probe): N docs x 40 tokens (= 10 four-word chunks per
doc), vocab 50k so organic cross-doc chunk collisions are ~nil; every
10th doc then gets one of 50 shared BOILERPLATE sentences appended —
the cookie-banner shape CCNet line-dedup exists to remove — so the
corpus carries a known ~1%-of-chunks duplicated mass with realistic
digest skew (each boilerplate digest ~N/500 occurrences).

Arms produce the identical per-doc (n_chunks, dup_chunks) rollup and
are checksum-compared before timings count. Reps interleave A,B,A,B
to ride out the documented host waves. Usage:
python scripts/sentence_dedup_ab_probe.py [n_docs]. Results in
SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import get_spark
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.operators.dedup import SENT_K

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DOC_TOKENS = 40
VOCAB = 50_000
BOILER_EVERY = 10
N_BOILER = 50


def synth_corpus(spark):
    base = spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"concat_ws(' ', transform(sequence(1, {DOC_TOKENS}),"
            f" t -> concat('w', pmod(xxhash64(id * 131 + t), {VOCAB}))))"
        ).alias("text"),
    )
    # every BOILER_EVERY-th doc appends one of N_BOILER shared
    # 4-word boilerplate sentences (deterministic pick by doc_id;
    # divide by BOILER_EVERY first — doc_id is already a multiple of
    # it, so pmod(doc_id, N_BOILER) would hit only N_BOILER/gcd
    # residues and collapse the boilerplate vocabulary)
    boiler = F.expr(
        f"concat_ws(' ', transform(sequence(1, {SENT_K}),"
        f" t -> concat('bp', pmod(CAST(doc_id / {BOILER_EVERY} AS BIGINT),"
        f" {N_BOILER}), '_', t)))"
    )
    return base.select(
        "doc_id",
        F.when(
            F.col("doc_id") % BOILER_EVERY == 0,
            F.concat_ws(" ", "text", boiler),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).repartition(spark.sparkContext.defaultParallelism)


def _chunks(corpus):
    words = F.split(F.col("text"), " ")
    n_full = F.floor(F.size(words) / SENT_K).cast("int")
    chunks = F.when(
        n_full >= 1,
        F.transform(
            F.sequence(F.lit(0), n_full - 1),
            lambda i: F.array_join(F.slice(words, i * SENT_K + 1, SENT_K), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return corpus.select(
        "doc_id", F.posexplode(chunks).alias("i", "chunk")
    ).withColumn("h", F.md5("chunk"))


def _rollup(ch_with_occ):
    return ch_with_occ.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum(F.when(F.col("occ") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("dup_chunks"),
    )


def arm_window(corpus):
    ch = _chunks(corpus)
    return _rollup(ch.withColumn("occ", F.count("*").over(Window.partitionBy("h"))))


def arm_join(corpus):
    ch = _chunks(corpus)
    freq = ch.groupBy("h").agg(F.count("*").alias("occ"))
    return _rollup(ch.join(freq, "h"))


def checksum(df):
    r = df.agg(
        F.count("*").alias("docs"),
        F.sum("n_chunks").alias("chunks"),
        F.sum("dup_chunks").alias("dups"),
    ).collect()[0]
    return (r.docs, r.chunks, r.dups)


def main() -> None:
    spark = get_spark(app_name="sentence-dedup-ab-probe")
    corpus = synth_corpus(spark)
    corpus.write.format("noop").mode("overwrite").save()  # warm codegen/JIT

    cs_w, cs_j = checksum(arm_window(corpus)), checksum(arm_join(corpus))
    assert cs_w == cs_j, f"arms disagree: window={cs_w} join={cs_j}"

    walls: dict[str, list[float]] = {"window": [], "join": []}
    for _ in range(2):  # interleaved A,B,A,B
        for name, arm in (("window", arm_window), ("join", arm_join)):
            t0 = time.perf_counter()
            arm(corpus).write.format("noop").mode("overwrite").save()
            walls[name].append(round(time.perf_counter() - t0, 3))

    print(
        json.dumps(
            {
                "n_docs": N,
                "checksum": {"docs": cs_w[0], "chunks": cs_w[1], "dup_chunks": cs_w[2]},
                "wall_s": walls,
                "best": {k: min(v) for k, v in walls.items()},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
