"""Timed execution — SURVEY.md §2.12 H1/H2/H4/H5.

The reference times each operator in isolation with forced execution
(`main.rs:37-55` time_operation; `Benchmark1.java:95-123` measure with
RUNS=5 medians; warm-up discarded at `you_TablesawBenchmark1.java:67-69`;
GC between reps at `Benchmark1.java:80`).

Spark mapping: a *transformation chain measures nothing* — the timed
region must contain an action. ``time_action`` times a thunk that ends
in ``.count()``/``.collect()``/``.write``; ``bench_op`` adds the
reference's hygiene: one discarded warm-up (JIT/codegen caches), k
timed reps, gc between reps, median reported.
"""

from __future__ import annotations

import gc
import statistics
import time
from collections.abc import Callable
from dataclasses import dataclass


@dataclass
class OpTiming:
    operation: str
    median_s: float
    times_s: list[float]
    memory_mb: float


def time_action(thunk: Callable[[], object]) -> float:
    t0 = time.perf_counter()
    thunk()
    return time.perf_counter() - t0


def bench_op(
    operation: str,
    thunk: Callable[[], object],
    reps: int = 5,
    warmup: bool = True,
    memory_probe: Callable[[], float] | None = None,
) -> OpTiming:
    """Median-of-k timing with warm-up and inter-rep GC (H2/H4/H5)."""
    if warmup:
        thunk()
    mem0 = memory_probe() if memory_probe else 0.0
    times = []
    for _ in range(reps):
        gc.collect()
        times.append(time_action(thunk))
    mem1 = memory_probe() if memory_probe else 0.0
    return OpTiming(
        operation=operation,
        median_s=statistics.median(times),
        times_s=times,
        memory_mb=mem1 - mem0,
    )
