#!/usr/bin/env python
"""Round-9 post-mortem of the nine `exceeds-epoch` drift annotations
(VERDICT r8 #2) — the per-query follow-ups the r8 epoch-calibration
machinery flagged but did not adjudicate:

    text_stats 1.44x, dedup_sentence_clean 1.40x,
    ann_cosine_topk_vectorized 1.35x, ivf_ann_topk 1.25x,
    ewma_customer_orders 1.25x, ann_cosine_topk 1.20x,
    asof_join_purchase_view 1.16x, heavy_hitters_twophase 1.16x,
    dedup_containment 1.16x        (results/bench_detail.json, r8)

Same design as scripts/cusum_requalify_probe.py (the r7 pattern the
verdict prescribes): N fresh JVMs; inside each, the suspects and the
pure-JVM control (groupby_mean) run interleaved rep-by-rep so a host
contention wave covers all queries equally and shows up in the
control instead of silently inflating a suspect. The Arrow-exchange
control (mapinarrow_matrix_stats) is timed too, for the record —
it has no committed rebaseline yet (ADVICE r8) so it contributes
timings but not ratios.

Verdict rule, pinned BEFORE running (mirrors bench.py's
EPOCH_MARGIN): per suspect, take min across JVMs of
(suspect_median / rebaseline) / (control_median / control_rebaseline)
— the control-normalized drift with the host epoch divided out.
  <= 1.15  -> HOST: the r8 annotation was hypervisor noise; cleared.
  >  1.15 in EVERY JVM -> REGRESSION: open a named investigation.

Writes results/drift_requalify_{TAG}.json (TAG env-overridable).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

_DEFAULT_SUSPECTS = (
    "text_stats",
    "dedup_sentence_clean",
    "ann_cosine_topk_vectorized",
    "ivf_ann_topk",
    "ewma_customer_orders",
    "ann_cosine_topk",
    "asof_join_purchase_view",
    "heavy_hitters_twophase",
    "dedup_containment",
)
# Round-N reuse (VERDICT r10 #6): override the suspect list and the
# artifact tag without forking the script —
#   SPARK_GRAFT_REQUALIFY_SUSPECTS=a,b,c \
#   SPARK_GRAFT_REQUALIFY_TAG=r11 python scripts/drift_requalify_probe.py
SUSPECTS = tuple(
    s for s in os.environ.get("SPARK_GRAFT_REQUALIFY_SUSPECTS", "").split(",") if s
) or _DEFAULT_SUSPECTS
# default tag "adhoc" so a bare rerun can NEVER clobber a committed
# round artifact (drift_requalify_r9.json is round-9 evidence)
TAG = os.environ.get("SPARK_GRAFT_REQUALIFY_TAG", "adhoc")
CONTROL = "groupby_mean"
ARROW_CONTROL = "mapinarrow_matrix_stats"  # timed for the record only
MARGIN = 1.15
REPS = 5
JVMS = int(os.environ.get("SPARK_GRAFT_REQUALIFY_JVMS", "3"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_child() -> None:
    sys.path.insert(0, REPO)
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import get_spark
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.registry import REGISTRY

    spark = get_spark("drift-requalify")
    spark.sparkContext.setLogLevel("ERROR")
    names = [CONTROL, ARROW_CONTROL, *SUSPECTS]
    for name in names:  # warm-up pass (JIT/codegen/Arrow init untimed)
        REGISTRY[name][0](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(REPS):  # interleave rep-by-rep (wave-evening)
        for name in names:
            df = REGISTRY[name][0](spark, SF_DIR)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
    out = {
        n: {"median": round(statistics.median(ts), 4), "min": round(min(ts), 4)}
        for n, ts in times.items()
    }
    print(json.dumps(out))


def main() -> None:
    with open(os.path.join(REPO, "results", "bench_rebaseline.json")) as f:
        rebaseline = json.load(f)["queries"]
    jvms = []
    for i in range(JVMS):
        proc = subprocess.run(
            [sys.executable, __file__, "--child"],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        if proc.returncode != 0 or not proc.stdout.strip():
            sys.stderr.write(proc.stderr)
            raise RuntimeError(f"child JVM {i} failed (rc={proc.returncode})")
        jvms.append(json.loads(proc.stdout.strip().splitlines()[-1]))
        print(f"jvm {i}: control {jvms[-1][CONTROL]}", file=sys.stderr)

    # Validate divisors up front (ADVICE r9): a suspect (or the
    # control) missing from the rebaseline would otherwise surface as
    # an opaque TypeError/ZeroDivisionError deep in the ratio math —
    # the exact one-legged-rebaseline gap round 9 documented for
    # mapinarrow_matrix_stats.
    unusable = [
        n for n in (*SUSPECTS, CONTROL) if not rebaseline.get(n)
    ]
    if unusable:
        raise SystemExit(
            f"rebaseline entries missing or zero for {unusable} — "
            "regenerate results/bench_rebaseline.json "
            "(scripts/make_rebaseline.py) before requalifying"
        )

    verdicts: dict[str, dict] = {}
    for name in SUSPECTS:
        base = rebaseline.get(name)
        normalized = []
        for j in jvms:
            factor = j[CONTROL]["median"] / rebaseline[CONTROL]
            normalized.append(round(j[name]["median"] / base / factor, 3))
        best = min(normalized)
        # Secondary rule (r12, found adjudicating boilerplate_phrase_
        # ratio): when the CONTROL runs faster than its own
        # min-anchored rebaseline (factor < 1 — today's host beats the
        # committed min), the normalization INFLATES every suspect by
        # 1/factor and can brand a floor-healthy query a regression.
        # The decisive raw fact is whether the suspect can still hit
        # its committed floor: min across all reps/JVMs <= rebaseline
        # x margin means the committed number is reproducible on this
        # host, so no code/plan regression exists — verdict
        # "floor-reproduced" (a control-normalization misfire), not
        # "regression".
        raw_floor = min(j[name]["min"] for j in jvms)
        floor_ok = raw_floor <= base * MARGIN
        verdicts[name] = {
            "rebaseline": base,
            "annotation_ratio": None,  # filled from bench_detail below
            "normalized_per_jvm": normalized,
            "normalized_min": best,
            "raw_floor": round(raw_floor, 4),
            "verdict": (
                "host"
                if best <= MARGIN
                else ("floor-reproduced" if floor_ok else "regression")
            ),
        }
    try:
        with open(os.path.join(REPO, "results", "bench_detail.json")) as f:
            ann = json.load(f).get("drift_annotations", {})
        for name in SUSPECTS:
            if name in ann:
                verdicts[name]["annotation_ratio"] = ann[name].get("ratio")
    except (OSError, json.JSONDecodeError):
        pass

    result = {
        "sf_dir": SF_DIR,
        "reps": REPS,
        "jvms_raw": jvms,
        "control": CONTROL,
        "control_rebaseline": rebaseline[CONTROL],
        "arrow_control_timings": [j[ARROW_CONTROL] for j in jvms],
        "margin": MARGIN,
        "verdicts": verdicts,
        "rule": (
            "min across fresh JVMs of (suspect_median/rebaseline) / "
            "(control_median/control_rebaseline); <= margin -> host noise; "
            "> margin in every JVM but raw min <= rebaseline x margin -> "
            "floor-reproduced (control-normalization misfire when the "
            "control beats its own min-anchor); else regression"
        ),
    }
    path = os.path.join(REPO, "results", f"drift_requalify_{TAG}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps({n: v["verdict"] for n, v in verdicts.items()}, indent=1))
    print(f"-> {path}", file=sys.stderr)


if __name__ == "__main__":
    if "--child" in sys.argv:
        run_child()
    else:
        main()
