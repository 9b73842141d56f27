#!/usr/bin/env python
"""Attestation ledger: does any registry query's code trail its last
driver correctness row?

For every query in the registry this script finds (a) the most recent
round whose CORRECTNESS_r*.json contains a row for it, and (b) whether
the query's *function source* differs between the commit that round's
driver actually ran (the ``round N: verdict/...`` commit — verified to
add only artifact files on top of the end-of-round snapshot) and the
current working tree. A query whose function changed after its last
row is "stale": pytest still proves it at sf0.01, but the judge's hard
signal (a driver row) trails the code. VERDICT r6 "Next round" #1
asked for exactly this to be pinned as policy; the enforcing test is
tests/test_harness.py::test_priority_window_is_ledger_justified.

Granularity is the top-level registry function body (extracted with
``ast`` from ``git show <sha>:<path>``, compared as exact source
text). Helpers a query calls are NOT tracked per-query; as a
supplement the ledger records ``file_changed_since_row`` (any change
to the whole module since the row's commit) for human review — it is
informational because file granularity over-counts ~15x (a one-line
docstring edit in text.py would flag 34 queries).

Usage: python scripts/attestation_ledger.py   # writes
       results/attestation_ledger.json and prints a summary.
"""

from __future__ import annotations

import ast
import json
import os
import re
import subprocess
import sys
from glob import glob

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _git(*args: str) -> str:
    proc = subprocess.run(
        ["git", "-C", REPO, *args], capture_output=True, text=True, check=False
    )
    if proc.returncode != 0:
        raise RuntimeError(f"git {' '.join(args)} failed: {proc.stderr.strip()}")
    return proc.stdout


def round_marker_commits() -> dict[int, str]:
    """round N -> sha of the ``round N: verdict/...`` commit (the tree
    the driver's round-N correctness check ran against, plus artifact
    files only)."""
    out = _git("log", "--format=%H %s")
    markers: dict[int, str] = {}
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"^round (\d+): verdict", subject)
        if m:
            markers.setdefault(int(m.group(1)), sha)
    return markers


def last_row_rounds() -> dict[str, int]:
    rounds: dict[str, int] = {}
    for path in sorted(glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        r = int(m.group(1))
        with open(path) as f:
            for q in json.load(f):
                rounds[q] = max(rounds.get(q, 0), r)
    return rounds


def _functions_in_source(src: str) -> dict[str, str]:
    """name -> exact source segment for every top-level function."""
    tree = ast.parse(src)
    out: dict[str, str] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            seg = ast.get_source_segment(src, node)
            if seg is not None:
                out[node.name] = seg
    return out


class _TreeCache:
    """Parse each (commit, file) at most once; '' sha = working tree."""

    def __init__(self) -> None:
        self._cache: dict[tuple[str, str], dict[str, str] | None] = {}

    def functions(self, sha: str, relpath: str) -> dict[str, str] | None:
        key = (sha, relpath)
        if key not in self._cache:
            try:
                if sha:
                    src = _git("show", f"{sha}:{relpath}")
                else:
                    with open(os.path.join(REPO, relpath)) as f:
                        src = f.read()
                self._cache[key] = _functions_in_source(src)
            except (RuntimeError, OSError, SyntaxError):
                self._cache[key] = None
        return self._cache[key]


def build_ledger() -> dict[str, dict]:
    import inspect

    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark import registry

    markers = round_marker_commits()
    rows = last_row_rounds()
    cache = _TreeCache()
    ledger: dict[str, dict] = {}
    for name, (fn, _sql) in registry.REGISTRY.items():
        relpath = os.path.relpath(inspect.getsourcefile(fn), REPO)
        row_round = rows.get(name, 0)
        entry = {
            "last_row_round": row_round,
            "file": relpath,
            "fn": fn.__name__,
        }
        if row_round == 0 or row_round not in markers:
            # never driver-checked (or no marker commit yet): by
            # definition the code has no row to trail — must rotate in
            entry["fn_changed_since_row"] = True
            entry["file_changed_since_row"] = True
        else:
            sha = markers[row_round]
            then = cache.functions(sha, relpath)
            now = cache.functions("", relpath)
            then_src = None if then is None else then.get(fn.__name__)
            now_src = None if now is None else now.get(fn.__name__)
            entry["fn_changed_since_row"] = then_src is None or then_src != now_src
            # informational only (over-counts; see module docstring)
            entry["file_changed_since_row"] = bool(
                _git("diff", "--name-only", sha, "--", relpath).strip()
            )
        ledger[name] = entry
    return dict(sorted(ledger.items()))


def main() -> None:
    ledger = build_ledger()
    changed = sorted(q for q, e in ledger.items() if e["fn_changed_since_row"])
    by_round: dict[int, int] = {}
    for e in ledger.values():
        by_round[e["last_row_round"]] = by_round.get(e["last_row_round"], 0) + 1
    out = {
        "queries": ledger,
        "fn_changed_since_row": changed,
        "rows_by_round": {str(k): v for k, v in sorted(by_round.items())},
    }
    path = os.path.join(REPO, "results", "attestation_ledger.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"queries: {len(ledger)}  fn-changed-since-row: {len(changed)}")
    for q in changed:
        e = ledger[q]
        print(f"  {q}  (row r{e['last_row_round']}, {e['file']}:{e['fn']})")
    print(f"rows by round: {out['rows_by_round']}")
    print(f"-> {path}")


if __name__ == "__main__":
    main()
