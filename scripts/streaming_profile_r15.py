#!/usr/bin/env python
"""r15 streaming-suite profile (VERDICT r14 #5): per-operator wall
time PLUS the engine's own micro-batch duration breakdown, so the
report separates query compute (addBatch) from streaming machinery
(offset log / WAL commit / planning / state commit) and from
harness-side certificate compute that runs OUTSIDE the stream.

A StreamingQueryListener collects every progress event; each registry
streaming query runs once warm-up + REPS timed. Events are attributed
to the registry query that was running when they fired (queries run
sequentially). Writes results/streaming_profile_r15.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import registry  # noqa: E402
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.session import (  # noqa: E402
    get_spark,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "3"))

STREAMING_QUERIES = [
    "streaming_minhash_dedup_precision",
    "streaming_stateful_counter",
    "streaming_interval_join",
    "streaming_hourly_agg",
    "streaming_minhash_dedup",
    "streaming_minhash_dedup_recall",
    "streaming_session_certificate",
    "streaming_session_window",
    "streaming_dedup_events",
    "streaming_doc_quality_gate",
    "streaming_topk_users",
    "streaming_foreachbatch_upsert",
    "streaming_corpus_fingerprint",
    "streaming_sliding_agg",
    "streaming_transform_with_state",
]


class _Collector(StreamingQueryListener):
    def __init__(self) -> None:
        self.events: list[dict] = []
        self.current: str | None = None

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.events.append(
            {
                "query": self.current,
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "durationMs": dict(p.durationMs),
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def main() -> None:
    spark = get_spark("streaming-profile-r15")
    spark.sparkContext.setLogLevel("ERROR")
    collector = _Collector()
    spark.streams.addListener(collector)
    qs = registry.queries()
    out: dict[str, dict] = {}
    for name in STREAMING_QUERIES:
        fn = qs[name]
        collector.current = name + " [warmup]"
        try:
            fn(spark, SF).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": str(exc)[:300]}
            continue
        walls = []
        collector.current = name
        n_before = len(collector.events)
        for rep in range(REPS):
            spark.sparkContext.setJobDescription(f"{name} rep {rep}")
            t0 = time.perf_counter()
            fn(spark, SF).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 4))
        time.sleep(0.5)  # let late progress events land
        evs = [e for e in collector.events[n_before:] if e["query"] == name]
        agg: dict[str, int] = {}
        for e in evs:
            for k, v in e["durationMs"].items():
                agg[k] = agg.get(k, 0) + int(v)
        out[name] = {
            "wall_median": round(statistics.median(walls), 4),
            "wall_reps": walls,
            "n_batches": len(evs),
            "batch_duration_ms_total": agg,
            "addBatch_share": (
                round(agg.get("addBatch", 0) / (1000 * sum(walls)), 3)
                if walls and sum(walls)
                else None
            ),
        }
        print(name, json.dumps(out[name]), file=sys.stderr)
    result = {"sf_dir": SF, "reps": REPS, "queries": out}
    with open(os.path.join(REPO, "results", "streaming_profile_r15.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v.get("wall_median") for k, v in out.items()}))


if __name__ == "__main__":
    main()
