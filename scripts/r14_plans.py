#!/usr/bin/env python
"""Round-14 optimization evidence: dump `.explain("formatted")` for the
queries touched this round into plans/r14/<query>_<tag>.txt.

Usage: python scripts/r14_plans.py <tag> [query ...]
  tag   "before" or "after"
  query registry names; defaults to the round-14 target set.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import registry
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_TARGETS = [
    "decontaminate_winnowing",
    "gopher_repetition_signals",
    "dsir_importance_weights",
    "ccnet_perplexity_buckets",
    "bigram_lm_score",
    "dup_ngram_char_fraction",
    "dedup_substring_exact",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    targets = sys.argv[2:] or DEFAULT_TARGETS
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r14-plans", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    for name in targets:
        df = qs[name](spark, SF_DIR)
        # Private API use is deliberate: explain("formatted") only prints;
        # _explainString returns the same text for capture.
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text.splitlines())} lines)")


if __name__ == "__main__":
    main()
