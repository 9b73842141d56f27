"""Benchmark-results sink — SURVEY.md §2.1 S7, FIXTURES.md F5.

Long-format results rows ``(size, operation, time, memory)`` matching
the reference's committed golden artifact ``datatable_results.csv:1``
(written by `datatable_benchmark.py:67-78` and
`you_TablesawBenchmark1.java:73-87`). Driver-side plain CSV — result
volumes are tiny, so no reason to spin up an executor write.
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass

HEADER = ["size", "operation", "time", "memory"]


@dataclass
class ResultRow:
    size: int
    operation: str
    time: float
    memory: float


def write_results(rows: list[ResultRow], path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(HEADER)
        for r in rows:
            w.writerow([r.size, r.operation, f"{r.time:.4f}", f"{r.memory:.2f}"])


def read_results(path: str) -> list[ResultRow]:
    with open(path, newline="") as f:
        reader = csv.DictReader(f)
        return [
            ResultRow(int(r["size"]), r["operation"], float(r["time"]), float(r["memory"]))
            for r in reader
        ]
