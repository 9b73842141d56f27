"""A/B probe for the round-5/6 graph-query slowdown suspects.

VERDICT r5 flagged three queries whose medians rose 1.3-2.0x between
the round-4 and round-5 rebaselines with NO code change
(`triangle_count_copurchase`, `link_prediction_common_neighbors`,
`asof_join_purchase_view`) and asked for either a quiet-window
re-proof or a probe isolating an algorithmic cause. The only
execution-affecting change in that window was session.py adopting
`spark.file.transferTo=false` on tmpfs shuffle dirs (a measured sort
win) — and these queries are shuffle-join-heavy, so sendfile-vs-copy
was the one plausible code-side suspect. This probe A/Bs exactly that:
each arm is a FRESH JVM (subprocess) pinning `spark.file.transferTo`,
arms alternate true/false to average host drift, and each arm reports
median + min of REPS noop-forced runs per query.

Round-6 result (2 interleaved pairs, sf0.1, local[32]):
transferTo=false was EQUAL OR FASTER on all three queries
(triangle 1.09-1.22s vs 1.29-1.31s; link-pred 0.77-1.08s vs
1.41-1.42s; asof 0.36-0.37s vs 0.39s) — the adoption is exonerated,
and so are the other candidates checked alongside it: the local-dir
capacity fallback still picks /dev/shm (0% used), graph.py is
byte-identical since round 4 (git), the fixture is seed-pinned, and
the ivfpq persist A/B in the same windows showed the same uniform
inflation. Every bench query — including pure-JVM scalar filters —
measured 1.3-1.4x its round-4 rebaseline in these windows, so the
residual is the documented hypervisor contention (SCALE.md
"Contention-wave anatomy"), not an algorithmic regression. The
round-6 rebaseline therefore keeps the min-across-clean-runs policy
rather than chasing a plan change that does not exist.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import time

QUERIES = (
    "triangle_count_copurchase",
    "link_prediction_common_neighbors",
    "asof_join_purchase_view",
)
REPS = 5
SF_DIR = "/root/testdata/sf0.1"


def run_arm(transfer_to: str) -> None:
    """Child-process entry: one fresh JVM, one transferTo setting."""
    sys.path.insert(0, "/root/repo")
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import get_spark
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.registry import REGISTRY

    spark = get_spark(extra_conf={"spark.file.transferTo": transfer_to})
    out: dict[str, object] = {"transferTo": transfer_to}
    for name in QUERIES:
        fn = REGISTRY[name][0]
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        out[name] = {
            "median": round(statistics.median(ts), 3),
            "min": round(min(ts), 3),
        }
    print(json.dumps(out))


def main() -> None:
    results = []
    for arm in ("true", "false", "true", "false"):  # alternate to average drift
        proc = subprocess.run(
            [sys.executable, __file__, "--arm", arm],
            capture_output=True,
            text=True,
            timeout=600,
        )
        # A crashed child arm must surface ITS stderr, not die here
        # with an IndexError on empty stdout (ADVICE r6) — the A/B
        # evidence is worthless if the failing arm's reason is lost.
        if proc.returncode != 0 or not proc.stdout.strip():
            sys.stderr.write(proc.stderr)
            raise RuntimeError(
                f"arm {arm} failed (rc={proc.returncode}); stderr above"
            )
        line = proc.stdout.strip().splitlines()[-1]
        results.append(json.loads(line))
    print(json.dumps({"arms": results}, indent=1))


if __name__ == "__main__":
    if "--arm" in sys.argv:
        run_arm(sys.argv[sys.argv.index("--arm") + 1])
    else:
        main()
