#!/usr/bin/env python
"""Round-10 timing-baseline re-anchor (VERDICT r9 "Next round" #1).

The round-8/9 calm-window gate is provably dead on the current VM
epoch: 37 builder probes over ~5 h never read calm (floor 1.19,
including >1 h of deliberate idleness), and the round-9 judge's own
probe read 1.75x at 1-min loadavg 0.05 — the host's permanent floor
shifted, so the 1.15 calm margin against the r7-epoch rebaseline is
unreachable, forever. Meanwhile the r9 tree-vs-tree A/B showed every
current-tree per-query MIN at or below its rebaseline — clean MOMENTS
still exist even though clean 15-minute MEDIAN windows do not.

So this job adopts min-across-fresh-JVMs (already how B13 and the
rebaseline runs were generated) as the COMMIT policy, with epoch
probes RECORDED as brackets rather than used as a gate:

  1. opening epoch probe (recorded, not gating)
  2. N full bench.py runs, each its own fresh JVM  -> temp jsons
  3. mid probe
  4. B13 parity suite, SPARK_GRAFT_B13_JVMS=3 (min over fresh JVMs)
     -> temp csv
  5. closing probe
  6. make_rebaseline.py <round> run*.json --brackets (opening+mid)
     -> results/bench_rebaseline.json with both epoch controls
        populated (kills the one-legged factor, ADVICE r8)
  7. move the B13 csv into results/ + write b13_epoch_stamp.json with
     the (mid+closing) bracket and the policy statement

Every step is appended to results/calm_window_log.jsonl with
job=reanchor so the round's evidence trail stays in one place. Since
r12 (VERDICT r11 #4) this job is the ONE legitimate writer of the
committed results/bench_detail.json: its bench runs set
SPARK_GRAFT_BENCH_DETAIL_COMMIT=1, the last run's detail is kept on
the success path for the re-anchor commit, and any failure path
restores HEAD's.

Usage: python scripts/reanchor_job.py [--round 10] [--bench-runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "results", "calm_window_log.jsonl")
PY = sys.executable


def _log(event: dict) -> None:
    event = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"), "job": "reanchor", **event}
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    with open(LOG, "a") as f:
        f.write(json.dumps(event) + "\n")
    print(json.dumps(event), file=sys.stderr)


def probe(label: str) -> dict | None:
    proc = subprocess.run(
        [PY, os.path.join(REPO, "scripts", "epoch_probe.py")],
        capture_output=True,
        text=True,
        timeout=900,
    )
    out = None
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            out = json.loads(line)
            break
        except json.JSONDecodeError:
            continue
    _log({"event": "probe", "label": label, "probe": out})
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=10)
    ap.add_argument("--bench-runs", type=int, default=3)
    args = ap.parse_args()
    tmpdir = tempfile.mkdtemp(prefix="reanchor_")
    ok = False  # explicit flag, tested in finally (ADVICE r12:
    # locals().get("ok") worked but hid the control-flow dependency —
    # an early return or a rename would silently skip the restore)
    try:
        _log({"event": "start", "round": args.round, "bench_runs": args.bench_runs})
        opening = probe("opening")

        runs = []
        for i in range(args.bench_runs):
            path = os.path.join(tmpdir, f"run{i}.json")
            t0 = time.time()
            with open(path, "w") as f:
                subprocess.run(
                    [PY, os.path.join(REPO, "bench.py")],
                    check=True,
                    stdout=f,
                    stderr=subprocess.DEVNULL,
                    timeout=3600,
                    # full-precision line: make_rebaseline mins over
                    # these values; 2dp would leak ~4% into drift
                    # ratios (the pipe has no tail limit).
                    # DETAIL_COMMIT: the re-anchor job is the ONE
                    # legitimate writer of the committed
                    # results/bench_detail.json (VERDICT r11 #4) —
                    # the last run's detail lands in the re-anchor
                    # commit; ordinary runs write the gitignored
                    # bench_detail_run.json.
                    env=dict(
                        os.environ,
                        SPARK_GRAFT_CONTRACT_PRECISION="4",
                        SPARK_GRAFT_BENCH_DETAIL_COMMIT="1",
                    ),
                    cwd=REPO,
                )
            with open(path) as f:
                total = json.loads(f.read().strip().splitlines()[-1])["value"]
            _log(
                {
                    "event": "bench_run",
                    "i": i,
                    "total_sec": total,
                    "wall_sec": round(time.time() - t0, 1),
                }
            )
            runs.append(path)

        mid = probe("mid")

        b13_csv = os.path.join(tmpdir, "b13.csv")
        env = dict(os.environ, SPARK_GRAFT_B13_JVMS="3")
        subprocess.run(
            [PY, os.path.join(REPO, "scripts", "b13_benchmark.py"), b13_csv],
            check=True,
            env=env,
            timeout=7200,
            cwd=REPO,
        )
        closing = probe("closing")

        # ---- commit (ordered so a failure never half-commits: the
        # rebaseline step's failure modes all precede its writes) ----
        brackets_path = os.path.join(tmpdir, "brackets.json")
        with open(brackets_path, "w") as f:
            json.dump(
                {
                    "policy": (
                        "min-across-fresh-JVMs COMMIT policy (round 10): probes "
                        "recorded as brackets, not used as a gate — the r8/r9 "
                        "calm-median gate is unreachable on this VM epoch "
                        "(see results/calm_window_log.jsonl r9 history)"
                    ),
                    "opening": opening,
                    "mid": mid,
                    "closing": closing,
                },
                f,
            )
            f.write("\n")
        subprocess.run(
            [
                PY,
                os.path.join(REPO, "scripts", "make_rebaseline.py"),
                str(args.round),
                *runs,
                "--brackets",
                brackets_path,
            ],
            check=True,
            timeout=120,
            cwd=REPO,
        )
        shutil.move(b13_csv, os.path.join(REPO, "results", "b13_spark_results.csv"))
        with open(os.path.join(REPO, "results", "b13_epoch_stamp.json"), "w") as f:
            json.dump(
                {
                    "artifact": "results/b13_spark_results.csv",
                    "policy": (
                        "min over 3 fresh JVMs per op, probe-bracketed "
                        "(brackets recorded below, factors vs the rebaseline "
                        "current when the job started). Committed under the "
                        "round-10 min-across-fresh-JVMs policy — the calm-"
                        "window gate retired per SCALE.md 'Timing-baseline "
                        "policy, re-anchored (round 10)'."
                    ),
                    "opening_probe": mid,
                    "closing_probe": closing,
                    "generated": time.strftime("%Y-%m-%dT%H:%M:%S"),
                },
                f,
                indent=1,
            )
            f.write("\n")
        _log({"event": "committed", "round": args.round})
        ok = True
        return 0
    except subprocess.SubprocessError as exc:
        _log({"event": "error", "error": str(exc)[:500]})
        return 1
    finally:
        # VERDICT r11 #4: this job is the one legitimate writer of the
        # committed results/bench_detail.json (its bench runs set
        # SPARK_GRAFT_BENCH_DETAIL_COMMIT=1). On success the freshly
        # written detail stays for the re-anchor commit; on any
        # failure path restore HEAD's so a half-run never leaves the
        # tracked artifact dirty.
        if not ok:
            subprocess.run(
                ["git", "checkout", "--", "results/bench_detail.json"],
                check=False,
                cwd=REPO,
            )
        shutil.rmtree(tmpdir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
