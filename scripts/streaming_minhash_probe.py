#!/usr/bin/env python
"""Multi-batch certificate for streaming_minhash_dedup: admission
decisions must be INVARIANT to how the stream is micro-batched.

Builds an id-ordered synthetic corpus (same vocab-sampled generator
family as dedup_scale_probe.py) with planted near-dups of EARLIER
docs, written as K id-range parquet files. Runs the SAME
streaming_minhash_dedup operator twice: once with
maxFilesPerTrigger=1 (K real micro-batches, the index growing
batch-by-batch) and once with no trigger cap (single batch, pure
within-batch rule). The two decision sets must be identical — that is
the split-invariance the operator's "every fingerprint seen enters
the index" design buys — and every planted near-dup must be rejected.

Prints one JSON line; pytest twin:
tests/test_semantics.py::test_streaming_minhash_multibatch_equals_batch

Usage: python scripts/streaming_minhash_probe.py [n_docs] [n_files]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import get_spark
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.streaming.windows import (
    streaming_minhash_dedup,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000
N_FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 5
DUP_EVERY = 50  # 2% planted near-dups, each of an EARLIER doc
VOCAB = 5_000
DOC_TOKENS = 31


def main() -> None:
    spark = get_spark("streaming-minhash-probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="smh_probe_")
    stream_dir = os.path.join(work, "stream")
    os.makedirs(stream_dir)

    base = spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"concat_ws(' ', transform(sequence(1, {DOC_TOKENS}),"
            f" t -> concat('w', pmod(xxhash64(id * 131 + t), {VOCAB}))))"
        ).alias("text"),
    )
    # planted near-dup of doc d lands at id N + d (always AFTER its
    # original in id order, and in a later id-range file when d and
    # N + d straddle a file boundary — which most do)
    dups = base.filter(F.col("doc_id") % DUP_EVERY == 0).select(
        (F.col("doc_id") + N).alias("doc_id"),
        F.concat("text", F.lit(" wextra")).alias("text"),
    )
    corpus = base.unionByName(dups)
    # K files of contiguous id ranges (nondecreasing doc_id across
    # batches — the operator's stated arrival-consistency contract)
    total = N + N // DUP_EVERY
    per_file = total // N_FILES + 1
    rows = corpus.orderBy("doc_id").collect()
    for i in range(N_FILES):
        chunk = rows[i * per_file : (i + 1) * per_file]
        if not chunk:
            continue
        spark.createDataFrame(chunk, corpus.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(stream_dir, f"chunk_{i:03d}"))
    # file source wants leaf files under one dir: flatten
    flat = os.path.join(work, "flat")
    os.makedirs(flat)
    k = 0
    for i in range(N_FILES):
        d = os.path.join(stream_dir, f"chunk_{i:03d}")
        if not os.path.isdir(d):
            continue
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                dst = os.path.join(flat, f"part_{i:03d}_{k}.parquet")
                shutil.copy(os.path.join(d, f), dst)
                # the file stream orders files by modification time;
                # stamp strictly increasing mtimes so batch order ==
                # id order (the operator's arrival contract)
                os.utime(dst, (1_700_000_000 + k, 1_700_000_000 + k))
                k += 1

    multi = streaming_minhash_dedup(
        spark, sf_dir="", stream_dir=flat, max_files_per_trigger=1
    )
    single = streaming_minhash_dedup(spark, sf_dir="", stream_dir=flat)

    m = {r.doc_id: r.admitted for r in multi.collect()}
    s = {r.doc_id: r.admitted for r in single.collect()}
    diffs = {d: (m.get(d), s.get(d)) for d in set(m) | set(s) if m.get(d) != s.get(d)}
    planted = [d for d in m if d >= N]
    planted_rejected = sum(1 for d in planted if m[d] == 0)
    out = {
        "docs": total,
        "files": k,
        "decisions_multi": len(m),
        "decisions_single": len(s),
        "split_invariant": not diffs,
        "n_diffs": len(diffs),
        "planted": len(planted),
        "planted_rejected": planted_rejected,
        "planted_recall": round(planted_rejected / max(len(planted), 1), 4),
    }
    print(json.dumps(out), flush=True)
    shutil.rmtree(work, ignore_errors=True)
    if diffs or not planted:
        sys.exit(1)


if __name__ == "__main__":
    main()
