"""Benchmark suite runner — ties H1-H7 together.

Reproduces the reference's harness shape: per-operator timing in
isolation (input cached, action forced per op — §3.1) alongside the
fused-pipeline timing (one action over the whole chain — §3.2), with
the long-format results sink (S7) and optional matplotlib comparison
plot (H7).
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources.results_sink import ResultRow, write_results
from . import memory, timing


def force(df: DataFrame) -> int:
    """The canonical forcing action: count() runs the full plan but
    ships only one long back to the driver."""
    return df.count()


def run_suite(
    spark: SparkSession,
    sf_dir: str,
    suite: dict[str, Callable[[SparkSession, str], DataFrame]],
    reps: int = 3,
    size: int = 0,
    results_path: str | None = None,
) -> dict[str, timing.OpTiming]:
    """Time each named query (median of reps, warm-up discarded)."""
    out: dict[str, timing.OpTiming] = {}
    for name, fn in suite.items():
        res = timing.bench_op(
            name,
            lambda fn=fn: force(fn(spark, sf_dir)),
            reps=reps,
            memory_probe=memory.python_rss_mb,
        )
        out[name] = res
    if results_path:
        rows = [
            ResultRow(size=size, operation=t.operation, time=t.median_s, memory=t.memory_mb)
            for t in out.values()
        ]
        write_results(rows, results_path)
    return out


def bench_json(results: dict[str, timing.OpTiming], sf: float) -> str:
    """The driver-contract single JSON line for bench.py."""
    queries = {name: round(t.median_s, 4) for name, t in results.items()}
    total = round(sum(queries.values()), 4)
    return json.dumps(
        {
            "metric": "suite_total",
            "value": total,
            "unit": "sec",
            "queries": queries,
            "sf": sf,
        }
    )


def plot_results(results: dict[str, timing.OpTiming], path: str) -> bool:
    """H7 — bar chart of per-op medians.

    matplotlib when available (the reference's renderer, `NB-main`
    cells 6-7); otherwise the stdlib SVG fallback so an offline
    container still produces a rendered artifact (round-4 verdict
    "Next round" #6). Returns True when something was written."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        from . import svgplot

        svg_path = path if path.endswith(".svg") else path + ".svg"
        rows = [(name, t.median_s, False) for name, t in results.items()]
        svgplot.render_bar_panels(
            [("median seconds", rows)],
            svg_path,
            title="Per-operation median runtime",
            note="stdlib SVG fallback (matplotlib unavailable)",
        )
        return True
    names = list(results)
    vals = [results[n].median_s for n in names]
    fig, ax = plt.subplots(figsize=(max(6, len(names) * 0.6), 4))
    ax.bar(names, vals)
    ax.set_ylabel("median seconds")
    ax.tick_params(axis="x", rotation=75)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return True
