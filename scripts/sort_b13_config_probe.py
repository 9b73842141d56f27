#!/usr/bin/env python
"""B13-shaped sort: shuffle-transport micro-levers never tried on the
REAL fixture shape (round-10 follow-up to the r4/r5/r7 sort probes).

The r4 compression A/B, r5 off-heap/transferTo A/B and r7 low-card
skew A/B settled the big levers; their conclusion (SCALE.md "sort
lane") is that the 30.3M-row sort is bound by the shuffle WRITE+FETCH
of ~1.3 GB of 9-column rows. What was never measured on the real
fixture: the transport micro-costs riding on those bytes.

- lz4 block size 32k -> 512k: the B13 fixture is a 768-row seed
  duplicated 42,847x, so serialized shuffle blocks are extremely
  repetitive; bigger lz4 frames mean fewer compressor calls and a
  better ratio on exactly this data.
- shuffle checksums (spark.shuffle.checksum.enabled, default true
  since 3.2): a CRC pass over every shuffle byte, pure overhead on a
  single-box tmpfs where corruption means broken RAM, not a flaky NIC.
- zstd codec: better ratio / more CPU — the opposite bet to lz4-512k.
- AQE off: the sort is a single well-known exchange; AQE's stage
  materialization adds a job boundary that buys nothing here.

Method: one FRESH JVM per config (these flags are cluster-static),
the exact B13 fixture (diabetes-shaped seed, S6 duplication, 30.3M
rows, repartition(32), cached+counted off the timed path), then
orderBy("Pregnancies") noop-forced — 1 warm-up + 3 timed reps, keep
median and min. A round-robin `repartition(32)` arm rides along in
every JVM as the exchange-floor datum (exchange cost with zero sort
work). The config list runs baseline-first and baseline-last so host
drift across the ~10-minute probe is visible in the artifact.

Writes one JSON line per config to stdout; the collected artifact
goes to results/sort_b13_config_probe.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROWS = 30_300_000

WORKER = r"""
import json, statistics, sys, time

sys.path.insert(0, sys.argv[3])
from pyspark.sql import functions as F

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import get_spark

conf = json.loads(sys.argv[1])
rows = int(sys.argv[2])
# fixed 32-wide everywhere (shuffle partitions, fixture repartition,
# exchange-floor arm) — a per-arm width knob would have to move all
# three together to mean anything (ADVICE r10)
spark = get_spark("b13sortprobe", cpus=32, shuffle_partitions=32, extra_conf=conf)
spark.sparkContext.setLogLevel("ERROR")

sys.path.insert(0, sys.argv[3] + "/scripts")
from b13_benchmark import DUP_K, diabetes_shaped_seed

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.sources import generators

df = (
    generators.duplicate_rows(diabetes_shaped_seed(spark), DUP_K)
    .limit(rows)
    .repartition(32)
    .cache()
)
df.count()  # materialize off the timed path

def force(d):
    d.write.format("noop").mode("overwrite").save()

def timed(build):
    force(build())  # warm-up
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        force(build())
        ts.append(time.perf_counter() - t0)
    return {"median": round(statistics.median(ts), 3), "min": round(min(ts), 3)}

out = {
    "sort": timed(lambda: df.orderBy("Pregnancies")),
    "exchange_floor": timed(lambda: df.repartition(32)),
}
print(json.dumps(out), flush=True)
spark.stop()
"""

CONFIGS = [
    {"_label": "baseline_open"},
    {"_label": "lz4_512k", "spark.io.compression.lz4.blockSize": "512k"},
    {"_label": "checksum_off", "spark.shuffle.checksum.enabled": "false"},
    {
        "_label": "lz4_512k+checksum_off",
        "spark.io.compression.lz4.blockSize": "512k",
        "spark.shuffle.checksum.enabled": "false",
    },
    {"_label": "zstd", "spark.io.compression.codec": "zstd"},
    {"_label": "aqe_off", "spark.sql.adaptive.enabled": "false"},
    {"_label": "baseline_close"},
]


def _write(out_path: str, results: list, partial: bool) -> None:
    with open(out_path, "w") as f:
        json.dump(
            {
                "note": (
                    "fresh JVM per config on the exact B13 fixture; 1 warm-up + "
                    "3 reps per arm; baseline first AND last to expose host "
                    "drift across the probe; exchange_floor = round-robin "
                    "repartition(32), the exchange cost with zero sort work"
                ),
                "partial": partial,
                "results": results,
            },
            f,
            indent=1,
        )
        f.write("\n")


def main() -> None:
    out_path = os.path.join(REPO, "results", "sort_b13_config_probe.json")
    results = []
    for conf in CONFIGS:
        conf = dict(conf)
        label = conf.pop("_label")
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-c", WORKER, json.dumps(conf), str(ROWS), REPO],
            capture_output=True,
            text=True,
            timeout=1200,
        )
        if proc.returncode != 0:
            print(proc.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"worker failed for {label}")
        res = json.loads(proc.stdout.strip().splitlines()[-1])
        row = {"label": label, "conf": conf, "rows": ROWS, **res,
               "wall": round(time.time() - t0, 1)}
        results.append(row)
        print(json.dumps(row), flush=True)
        # rewrite after every arm: a single worker failure or timeout
        # must not discard the ~20 minutes of arms already collected
        # (ADVICE r10)
        _write(out_path, results, partial=len(results) < len(CONFIGS))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
