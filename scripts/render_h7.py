"""Render the H7 comparison artifact: Spark vs the reference engines.

Reads the committed 30.3M-row parity run
(`results/b13_spark_results.csv`, generated with SPARK_GRAFT_B13_JVMS=3:
per-op BEST of 3 fresh-JVM runs, median of 3 reps within each —
SCALE.md's contention-wave policy) and the
reference's Colab run-A medians (BASELINE.md B1,
`DataFrame_Library_Benchmark_Pandas_vs_Polars_vs_Tablesaw.ipynb:491-505`)
and writes `results/h7_comparison.svg` — the `NB-main` cells 6-7
engine-comparison figure, re-rendered with the stdlib SVG fallback
since matplotlib is absent in this container.

Run: python scripts/render_h7.py
"""

import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.harness import svgplot

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# BASELINE.md B1 (Colab run A, 30.3M rows, seconds, median of 5).
BASELINE = {
    "read": {"Tablesaw": 65.911, "Pandas": 10.540, "Polars": 8.057, "Datatable": 4.187},
    "write": {"Tablesaw": 35.350, "Pandas": 50.006, "Polars": 10.444, "Datatable": 10.004},
    "group": {"Tablesaw": 17.722, "Pandas": 0.839, "Polars": 1.411, "Datatable": 0.695},
    "sort": {"Tablesaw": 4.419, "Pandas": 2.232, "Polars": 3.464, "Datatable": 0.705},
    "to_np": {"Tablesaw": 7.568, "Pandas": 2.162, "Polars": 1.354, "Datatable": 3.049},
}
OPS = ["read", "write", "group", "sort", "to_np"]
ENGINES = ["Spark", "Datatable", "Polars", "Pandas", "Tablesaw"]


def main() -> str:
    spark_times: dict[str, float] = {}
    with open(os.path.join(REPO, "results", "b13_spark_results.csv")) as f:
        for row in csv.DictReader(f):
            spark_times[row["operation"]] = float(row["time"])

    panels = []
    for op in OPS:
        vals = dict(BASELINE[op])
        vals["Spark"] = spark_times[op]
        panels.append((op, [(e, vals[e], e == "Spark") for e in ENGINES]))

    out = os.path.join(REPO, "results", "h7_comparison.svg")
    svgplot.render_bar_panels(
        panels,
        out,
        title="Engine comparison, 30.3M rows — seconds per op (lower is better)",
        subtitle="Spark = this repo (best of 3 fresh-JVM runs, median of 3 reps each,"
        " local[32]); others = reference Colab run A (median of 5, 2 vCPU). Core counts"
        " differ — compute-bound ops (group/sort/to_np) are the fair lanes.",
        note="Blue = this repo. Each panel has its own linear scale."
        " Sources: results/b13_spark_results.csv; BASELINE.md B1 (NB-main:493-496).",
    )
    print(out)
    return out


if __name__ == "__main__":
    main()
