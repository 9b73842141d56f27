#!/usr/bin/env python
"""Reference-parity scaling benchmark (SURVEY.md §2.12, B4/B5 shape).

The reference's scaling suite (`datatable_benchmark.py:8-78`,
`you_TablesawBenchmark1.java:29-87`) re-expressed Spark-first: the
seeded 4-column dataset (S5) at 10k/100k/1M rows, the four measured
operators (CSV read P1-scan, filter P1, sort O1, group-mean A1), one
discarded warm-up pass at 1k rows (H4, `you_TablesawBenchmark1.java:67-69`),
median of REPS with inter-rep GC (H2/H5), RSS memory probe (H3), and
the long-format results sink (S7) matching `datatable_results.csv:1`'s
``size,operation,time,memory`` header. Optional H7 bar chart.

Usage:  python scripts/scaling_benchmark.py [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import get_spark
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.harness import memory, runner, timing
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.sources import csv_io, generators
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.sources.results_sink import (
    ResultRow,
    write_results,
)

SIZES = (10_000, 100_000, 1_000_000)  # datatable_benchmark.py:64
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def _force(df) -> None:
    """Noop-sink write: materializes every row through the full plan.

    NOT ``count()`` — Catalyst's EliminateSorts would strip an
    ``orderBy`` under a count (order can't change the row count), so
    the sort op would time an empty plan. The noop sink consumes rows
    in order and optimizes nothing away."""
    df.write.format("noop").mode("overwrite").save()


def suite_for(spark, csv_path: str, cached):
    """The reference's four measured ops over the generated table.

    ``read`` re-parses the CSV each rep (the reference times the parse,
    `datatable_benchmark.py:29-31`); the other three run on the cached
    frame so each operator is timed in isolation (§3.1)."""
    return {
        "read": lambda: _force(csv_io.read_csv(spark, csv_path)),
        "filter": lambda: _force(cached.filter(F.col("value1") > 110)),
        "sort": lambda: _force(cached.orderBy("value1")),
        "groupby": lambda: _force(
            cached.groupBy("category").agg(F.avg("value2").alias("value2_mean"))
        ),
    }


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="scaling_bench_")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("scaling-benchmark")
    spark.sparkContext.setLogLevel("ERROR")

    # H4 warm-up: 1k rows through the full suite, results discarded
    warm = generators.scaling4(spark, 1_000, seed=42).cache()
    warm_csv = os.path.join(out_dir, "warm.csv")
    csv_io.write_csv(warm, warm_csv)
    for thunk in suite_for(spark, warm_csv, warm).values():
        thunk()
    warm.unpersist()

    rows: list[ResultRow] = []
    all_results: dict[str, timing.OpTiming] = {}
    for n in SIZES:
        df = generators.scaling4(spark, n, seed=42).cache()
        df.count()  # materialize the cache outside any timed region
        csv_path = os.path.join(out_dir, f"data_{n}.csv")
        csv_io.write_csv(df, csv_path)
        for name, thunk in suite_for(spark, csv_path, df).items():
            res = timing.bench_op(name, thunk, reps=REPS, memory_probe=memory.python_rss_mb)
            rows.append(
                ResultRow(size=n, operation=name, time=res.median_s, memory=res.memory_mb)
            )
            all_results[f"{name}@{n}"] = res
            print(f"  {n:>9,} {name:<8} {res.median_s * 1000:9.1f} ms", file=sys.stderr)
        df.unpersist()

    results_csv = os.path.join(out_dir, "scaling_results.csv")
    write_results(rows, results_csv)
    plotted = runner.plot_results(all_results, os.path.join(out_dir, "scaling_results.png"))
    print(f"results: {results_csv}" + (" (+plot)" if plotted else ""))


if __name__ == "__main__":
    main()
