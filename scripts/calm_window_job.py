#!/usr/bin/env python
"""Round-9 gated calm-window job (VERDICT r8 #1).

The round-8 build and the round-8 judge session both found the host
hot for their entire duration (epoch factors 1.48-1.67 across every
probe), and hand-timing calm windows kept losing. This job makes the
retry loop mechanical: poll scripts/epoch_probe.py on an interval;
the first time the host reads calm, run — as ONE atomic job —

  1. the B13 parity suite (SPARK_GRAFT_B13_JVMS=3, min-over-fresh-JVMs)
     into a TEMP csv,
  2. two full bench.py runs at sf0.1 into temp jsons,
  3. a CLOSING epoch probe.

Only if the closing probe also reads calm are the artifacts committed:
the B13 csv moves to results/b13_spark_results.csv with its own epoch
stamp (results/b13_epoch_stamp.json: opening + closing probe output),
and scripts/make_rebaseline.py 9 regenerates the rebaseline from the
two runs — which, because bench.py's BENCH_QUERIES now includes the
five round-8 queries and the round-9 addition, restores the Arrow
epoch control (mapinarrow_matrix_stats) to the rebaseline and fixes
the one-legged calibration (ADVICE r8). If the closing probe reads
hot, everything from the window is DISCARDED and the loop continues —
the same discard policy that kept two hot-window B13 runs out of the
round-8 tree.

Every probe and every decision is appended to
results/calm_window_log.jsonl so a never-calm round still produces
committable evidence (the SCALE.md structural-floor pin path).

Usage:
    python scripts/calm_window_job.py [--poll-seconds 1200]
        [--deadline-hours 5.0] [--once]

Exit 0 = artifacts landed; exit 2 = deadline reached, never calm.
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
    event = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"), **event}
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    with open(LOG, "a") as f:
        f.write(json.dumps(event) + "\n")
    print(json.dumps(event), file=sys.stderr)


def probe() -> dict | None:
    """One epoch probe; returns its parsed JSON (calm bool inside) or
    None if the probe itself failed."""
    proc = subprocess.run(
        [PY, os.path.join(REPO, "scripts", "epoch_probe.py")],
        capture_output=True,
        text=True,
        timeout=900,
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    _log({"event": "probe_error", "stderr": proc.stderr[-500:]})
    return None


def fire(opening: dict) -> bool:
    """The host read calm: run B13 + 2x bench into temps, then the
    closing probe; commit only if still calm."""
    tmpdir = tempfile.mkdtemp(prefix="calm_window_")
    b13_csv = os.path.join(tmpdir, "b13.csv")
    runs = [os.path.join(tmpdir, f"run{i}.json") for i in (1, 2)]
    try:
        _log({"event": "window_open", "opening": opening})
        env = dict(os.environ, SPARK_GRAFT_B13_JVMS="3")
        subprocess.run(
            [PY, os.path.join(REPO, "scripts", "b13_benchmark.py"), b13_csv],
            check=True,
            env=env,
            timeout=5400,
            cwd=REPO,
        )
        for path in runs:
            with open(path, "w") as f:
                subprocess.run(
                    [PY, os.path.join(REPO, "bench.py")],
                    check=True,
                    stdout=f,
                    stderr=subprocess.DEVNULL,
                    timeout=3600,
                    # full-precision line: make_rebaseline mins over
                    # these values; 2dp would leak ~4% into drift
                    # ratios (the pipe has no tail limit)
                    env=dict(os.environ, SPARK_GRAFT_CONTRACT_PRECISION="4"),
                    cwd=REPO,
                )
        closing = probe()
        if not closing or not closing.get("calm"):
            _log(
                {
                    "event": "window_discarded",
                    "reason": "closing probe hot — same policy that discarded "
                    "the two r8 hot-window B13 runs",
                    "closing": closing,
                }
            )
            return False
        # ---- commit the window (ADVICE r9: ordered so a failure never
        # leaves a half-committed tree — the rebaseline step runs FIRST
        # because every one of its failure modes (unreadable run json,
        # mismatched query sets) raises before it writes a byte; only
        # after it succeeds do the B13 csv move and the stamp write
        # happen, each itself atomic at the file level) ----
        subprocess.run(
            [PY, os.path.join(REPO, "scripts", "make_rebaseline.py"), "9", *runs],
            check=True,
            timeout=120,
            cwd=REPO,
        )
        shutil.move(b13_csv, os.path.join(REPO, "results", "b13_spark_results.csv"))
        with open(os.path.join(REPO, "results", "b13_epoch_stamp.json"), "w") as f:
            json.dump(
                {
                    "artifact": "results/b13_spark_results.csv",
                    "policy": "committed only with calm opening AND closing "
                    "epoch probes bracketing the whole window (B13 3-JVM min "
                    "+ 2x bench rebaseline runs)",
                    "opening_probe": opening,
                    "closing_probe": closing,
                    "generated": time.strftime("%Y-%m-%dT%H:%M:%S"),
                },
                f,
                indent=1,
            )
            f.write("\n")
        _log({"event": "window_committed", "closing": closing})
        return True
    except subprocess.SubprocessError as exc:
        _log({"event": "window_error", "error": str(exc)[:500]})
        return False
    finally:
        # bench.py clobbers results/bench_detail.json on every run; the
        # committed detail artifact must stay the round's driver-run
        # one on EVERY exit path — committed, discarded, and errored
        # alike (ADVICE r9: the restore used to run only on the commit
        # path, leaving hot-window data in the tree after a discard).
        subprocess.run(
            ["git", "checkout", "--", "results/bench_detail.json"],
            check=False,
            cwd=REPO,
        )
        shutil.rmtree(tmpdir, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--poll-seconds", type=float, default=1200.0)
    ap.add_argument("--deadline-hours", type=float, default=5.0)
    ap.add_argument("--once", action="store_true", help="single probe+fire attempt")
    args = ap.parse_args()
    deadline = time.time() + args.deadline_hours * 3600
    attempt = 0
    while time.time() < deadline:
        attempt += 1
        p = probe()
        if p is not None:
            _log(
                {
                    "event": "probe",
                    "attempt": attempt,
                    "factor": p.get("factor"),
                    "calm": p.get("calm"),
                }
            )
            if p.get("calm") and fire(p):
                return 0
        if args.once:
            break
        time.sleep(args.poll_seconds)
    _log({"event": "deadline", "attempts": attempt, "committed": False})
    return 2


if __name__ == "__main__":
    sys.exit(main())
