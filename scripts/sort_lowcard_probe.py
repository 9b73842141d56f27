#!/usr/bin/env python
"""A/B probe: low-cardinality global sort vs tiebreak-salted range sort.

The B13 sort lane (`scripts/b13_benchmark.py`, reference NB-main:209-212
`sort_values` on the first numeric) orders 30.3M rows by `Pregnancies`,
a column with ~15 distinct values. Spark's `orderBy(col)` plans a
RangePartitioning exchange on that single column: the sampled range
bounds can only split BETWEEN distinct key values, so at most
n_distinct partitions are non-empty — on a 15-value key, half of
local[32] (and 985 of 1000 executors at cluster scale) sit idle
through the sort stage, and each active partition carries ~2M rows.

`orderBy(col)` leaves ties in UNSPECIFIED order (the reference
engines differ among themselves here: pandas' default quicksort is
not stable either), so any output ordered by the key is a correct
result. That licenses the classic skew fix: append a deterministic
tiebreak (xxhash64 of the remaining columns), range-partition and
sort on (key, tiebreak), drop the tiebreak. Global order by the key
is preserved — partitions are key-major ranges — but ties now spread
over EVERY partition, so all cores sort and the per-partition sort
runs on ~1M-row slices.

Run: python scripts/sort_lowcard_probe.py [reps]
Writes results/sort_lowcard_ab.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.harness import timing
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.session import get_spark

sys.path.insert(0, os.path.join(REPO, "scripts"))
from b13_benchmark import COLUMNS, DUP_K, N_ROWS, diabetes_shaped_seed  # noqa: E402

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.sources import (  # noqa: E402
    generators,
)


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("sort-lowcard-probe")
    spark.sparkContext.setLogLevel("ERROR")

    seed = diabetes_shaped_seed(spark)
    big = generators.duplicate_rows(seed, DUP_K).limit(N_ROWS)
    big = big.repartition(spark.sparkContext.defaultParallelism)
    cached = big.cache()
    n = cached.count()
    feature_cols = [name for name, _ in COLUMNS]
    rest = [c for c in feature_cols if c != "Pregnancies"]

    def plain():
        _force(cached.orderBy("Pregnancies"))

    def salted():
        _force(
            cached.withColumn("_tb", F.xxhash64(*rest))
            .orderBy("Pregnancies", "_tb")
            .drop("_tb")
        )

    # interleave arms so a contention wave hits both equally
    results: dict[str, list[float]] = {"plain": [], "salted": []}
    for _ in range(reps):
        for name, thunk in (("plain", plain), ("salted", salted)):
            t0 = time.perf_counter()
            thunk()
            results[name].append(round(time.perf_counter() - t0, 4))
    med = {
        k: sorted(v)[len(v) // 2] for k, v in results.items()
    }
    n_distinct = cached.select("Pregnancies").distinct().count()
    out = {
        "rows": n,
        "n_distinct_key": n_distinct,
        "reps": reps,
        "times": results,
        "median": med,
        "speedup": round(med["plain"] / med["salted"], 3),
        "note": (
            "orderBy(key) vs orderBy(key, xxhash64(rest)) on the B13 "
            "30.3M-row fixture; ties are unspecified order so both are "
            "correct sorts by the key. Interleaved arms, median of "
            f"{reps}."
        ),
    }
    _ = timing  # imported for parity with other probes
    path = os.path.join(REPO, "results", "sort_lowcard_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["median"]), "speedup", out["speedup"])
    print(f"-> {path}")


if __name__ == "__main__":
    main()
