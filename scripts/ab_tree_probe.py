#!/usr/bin/env python
"""Tree-vs-tree A/B timing probe: is a bench drift CODE or HOST?

Times the same registry queries in two checkouts of the repo (e.g.
the round-7 marker tree the committed rebaseline was generated on,
vs the working tree), alternating fresh JVMs old/new/old/new so a
host contention wave covers both sides equally. If a query reads
flat new-vs-old while both sit above the committed rebaseline, the
drift is the HOST's epoch mode (the rebaseline value is simply not
attainable in the current window) — not a code regression; if new
reads consistently slower than old in the same windows, the code
(or a helper it calls — function-level ledger granularity misses
helper edits) regressed and the diff between the trees contains it.

Usage:
  git worktree add --detach /tmp/r7tree <r7-marker-sha>
  python scripts/ab_tree_probe.py /tmp/r7tree . \
      dedup_containment,ewma_customer_orders,... [rounds] [out.json]
  git worktree remove /tmp/r7tree

Writes results/ab_tree_probe.json (or the given out path — pass one
when a prior round's committed A/B artifact must not be clobbered).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPS = 5
CONTROL = "groupby_mean"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_child(tree: str, names: list[str]) -> None:
    sys.path.insert(0, tree)
    os.chdir(tree)
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import get_spark
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.registry import REGISTRY

    spark = get_spark("ab-tree-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        REGISTRY[name][0](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(REPS):
        for name in names:
            df = REGISTRY[name][0](spark, SF_DIR)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
    print(
        json.dumps(
            {
                n: {"median": round(statistics.median(ts), 4), "min": round(min(ts), 4)}
                for n, ts in times.items()
            }
        )
    )


def main() -> None:
    tree_a, tree_b = os.path.abspath(sys.argv[1]), os.path.abspath(sys.argv[2])
    names = [CONTROL] + [n for n in sys.argv[3].split(",") if n and n != CONTROL]
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    samples: dict[str, list[dict]] = {tree_a: [], tree_b: []}
    for r in range(rounds):
        for tree in (tree_a, tree_b):  # alternate within each round
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", tree, ",".join(names)],
                capture_output=True,
                text=True,
                timeout=1800,
            )
            if proc.returncode != 0 or not proc.stdout.strip():
                sys.stderr.write(proc.stderr)
                raise RuntimeError(f"child in {tree} failed")
            samples[tree].append(json.loads(proc.stdout.strip().splitlines()[-1]))
            print(f"round {r} {tree}: control {samples[tree][-1][CONTROL]}", file=sys.stderr)
    summary = {}
    for n in names:
        a_med = statistics.median(s[n]["median"] for s in samples[tree_a])
        b_med = statistics.median(s[n]["median"] for s in samples[tree_b])
        summary[n] = {
            "tree_a_median": round(a_med, 4),
            "tree_b_median": round(b_med, 4),
            "b_over_a": round(b_med / a_med, 3),
        }
    result = {
        "tree_a": tree_a,
        "tree_b": tree_b,
        "names": names,
        "reps": REPS,
        "rounds": rounds,
        "sf_dir": SF_DIR,
        "samples": samples,
        "summary": summary,
    }
    path = (
        os.path.abspath(sys.argv[5])
        if len(sys.argv) > 5
        else os.path.join(REPO, "results", "ab_tree_probe.json")
    )
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(summary, indent=1))
    print(f"-> {path}", file=sys.stderr)


if __name__ == "__main__":
    if sys.argv[1:2] == ["--child"]:
        run_child(sys.argv[2], sys.argv[3].split(","))
    else:
        main()
