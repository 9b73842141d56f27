#!/usr/bin/env python
"""Round-15 optimization evidence: dump `.explain("formatted")` for the
queries touched this round into plans/r15/<query>_<tag>.txt.

Usage: python scripts/r15_plans.py <tag> [query ...]
  tag   "before" or "after"; "before" imports the package from
        /tmp/oldpkg (the round-anchor commit extracted by
        `git archive`), "after" imports the working tree.
  query registry names; defaults to the round-15 target set.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_TARGETS = [
    "decontaminate_winnowing",
    "dedup_winnowing_fingerprints",
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    targets = sys.argv[2:] or DEFAULT_TARGETS
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.session import (
        get_spark,
    )

    if tag == "before":
        sys.path.insert(0, "/tmp/oldpkg")
        from oldpkg_bench import registry  # type: ignore[import-not-found]
    else:
        from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import registry

    out_dir = os.path.join(REPO, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r15-plans", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.plans import explain

    for name in targets:
        df = registry.REGISTRY[name][0](spark, SF_DIR)
        text = explain.plan_text(df)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
