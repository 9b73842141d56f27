#!/usr/bin/env python
"""Exact-substring (ExactSubstr) dedup at 1M documents — the round-9
operator (`dedup_substring_exact`) probed ~180x past the sf0.1
fixture, with direct measurements of its two scale claims
(VERDICT r8 #4 asked for exactly this, in the winnowing_scale_probe
mold):

1. the POSTING STREAM IS BOUNDED: exactly one (doc_id, pos, int64)
   row per eligible token position — postings == sum(max(0,
   n_tokens - L + 1)), measured and compared to the token count;
2. the CANDIDATE SET IS A VANISHING FRACTION: only postings whose
   window hash occurs >= 2x survive to the text-verify stage, so the
   doc-keyed re-join and the gram-text shuffle touch planted dups +
   hash collisions only, never the corpus.

Deterministic synthetic corpus (the same vocab-sampled ~31-token
builder as winnowing_scale_probe): 1% planted near-dups — every
100th doc reappears with its LAST token dropped, so each planted
pair shares a 30-token prefix run and must yield duplicated-span
rows on BOTH sides (recall check at MATCH_LEN=8).

Epoch-stamped (the round-8 convention): the host-epoch factor is
measured before and after, so a hot host can never masquerade as a
slow plan. Usage: python scripts/substring_scale_probe.py [n_docs].
Results land in results/substring_scale.json and SCALE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

import bench
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import get_spark, registry
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.operators.dedup import (
    MATCH_LEN,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DUP_EVERY = 100
VOCAB = 50_000
DOC_TOKENS = 31
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


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


def synth_corpus(spark):
    base = spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"concat_ws(' ', transform(sequence(1, {DOC_TOKENS}),"
            f" t -> concat('w', pmod(xxhash64(id * 131 + t), {VOCAB}))))"
        ).alias("text"),
    )
    trimmed = base.select(
        (F.col("doc_id") + N).alias("doc_id"),
        F.expr(
            "concat_ws(' ', slice(split(text, ' '), 1, size(split(text, ' ')) - 1))"
        ).alias("text"),
    ).filter(F.col("doc_id") % DUP_EVERY == N % DUP_EVERY)
    return base.unionByName(trimmed).repartition(
        spark.sparkContext.defaultParallelism
    )


def main() -> None:
    spark = get_spark("substring-scale")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    factor_before = epoch_factor_now(spark, qs)

    corpus = synth_corpus(spark).persist()
    n_docs = corpus.count()
    L = MATCH_LEN

    # same window-hash projection as the operator (one posting per
    # eligible token position)
    hash_of_gram = (
        "aggregate(sequence(1, length(g)), 0L,"
        " (acc, i) -> (acc * 31 + ascii(substring(g, i, 1))) % 1000000007)"
    )
    window_hashes = (
        f"transform(transform(sequence(1, size(T) - {L} + 1),"
        f"                    st -> concat_ws(' ', slice(T, st, {L}))),"
        f"          g -> {hash_of_gram})"
    )
    toked = corpus.select(
        "doc_id", F.split("text", " ").alias("T")
    ).filter(F.size("T") >= L)
    postings = toked.select(
        "doc_id", F.posexplode(F.expr(window_hashes)).alias("i", "h")
    ).select("doc_id", (F.col("i") + 1).alias("pos"), "h")

    # claim 1: bounded posting stream
    t0 = time.perf_counter()
    n_postings = postings.count()
    postings_s = round(time.perf_counter() - t0, 2)
    n_tokens = corpus.select(
        F.sum(F.size(F.split("text", " "))).alias("t")
    ).collect()[0]["t"]

    # claim 2: vanishing candidate fraction
    t0 = time.perf_counter()
    dup_h = (
        postings.groupBy("h").agg(F.count("*").alias("n")).filter(F.col("n") >= 2)
    )
    n_cand = postings.join(dup_h.select("h"), "h", "left_semi").count()
    cand_s = round(time.perf_counter() - t0, 2)

    # end-to-end spans + planted recall: both sides of each planted
    # pair must carry a duplicated span (the shared 30-token prefix)
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.operators import dedup as dmod

    real = dmod._corpus_with_near_dups  # noqa: F841 (documenting the swap)
    try:
        dmod._corpus_with_near_dups = lambda _spark, _sf: corpus
        t0 = time.perf_counter()
        spans = dmod.dedup_substring_exact(spark, "unused")
        n_planted = (N + DUP_EVERY - 1) // DUP_EVERY
        agg = spans.agg(
            F.count("*").alias("span_rows"),
            F.sum((F.col("doc_id") >= N).cast("long")).alias("copy_side_spans"),
            F.count_distinct(
                F.when(F.col("doc_id") >= N, F.col("doc_id"))
            ).alias("copies_with_span"),
        ).collect()[0]
        spans_s = round(time.perf_counter() - t0, 2)
    finally:
        dmod._corpus_with_near_dups = real

    factor_after = epoch_factor_now(spark, qs)
    result = {
        "n_docs": n_docs,
        "match_len": L,
        "postings": {
            "rows": n_postings,
            "tokens": n_tokens,
            "rows_per_token": round(n_postings / n_tokens, 4),
            # base docs: DOC_TOKENS-L+1 windows; trimmed copies one fewer
            "expected_rows": N * (DOC_TOKENS - L + 1)
            + (N // DUP_EVERY) * (DOC_TOKENS - L),
            "seconds": postings_s,
        },
        "candidates": {
            "rows": n_cand,
            "fraction_of_postings": round(n_cand / n_postings, 6),
            "seconds": cand_s,
        },
        "spans": {
            "rows": agg["span_rows"],
            "copies_with_span": agg["copies_with_span"],
            "n_planted": n_planted,
            "planted_recall": round(agg["copies_with_span"] / n_planted, 4),
            "seconds": spans_s,
            "docs_per_s": round(n_docs / max(spans_s, 1e-3)),
        },
        "epoch_factor": {"before": factor_before, "after": factor_after},
    }
    path = os.path.join(REPO, "results", "substring_scale.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    print(f"-> {path}")


if __name__ == "__main__":
    main()
