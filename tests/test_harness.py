"""Harness self-tests (SURVEY.md §2.12): timing hygiene H1/H2/H4/H5
and the component-separated memory probes H3."""

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.harness import memory, timing


def test_bench_op_median_and_warmup():
    calls = []

    def thunk():
        calls.append(1)

    result = timing.bench_op("op", thunk, reps=5)
    # one discarded warm-up + 5 timed reps
    assert len(calls) == 6
    assert result.operation == "op"
    assert len(result.times_s) == 5
    assert result.median_s == sorted(result.times_s)[2]
    assert result.median_s >= 0.0


def test_memory_probes_report_components(spark):
    rss = memory.python_rss_mb()
    heap = memory.jvm_heap_mb(spark)
    assert rss > 10.0, "python RSS probe must report a real value"
    assert heap > 1.0, "JVM heap probe must reach the driver runtime"


def test_registry_priority_fits_driver_window():
    # the driver verifies the first 50 registry entries per round; a
    # priority list that silently overflows the window would push
    # stale/new entries past verification
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.registry import _PRIORITY

    assert len(_PRIORITY) <= 50, f"priority window overflow: {len(_PRIORITY)}"

def test_gc_heap_probe_positive_and_bounded(spark):
    # the r4 artifact recorded -18 GB "deltas" across GC boundaries;
    # the replacement probe is retained heap after a forced full GC —
    # always positive and far below the configured max heap
    live = memory.jvm_heap_after_gc_mb(spark)
    assert 1.0 < live < 130_000.0


def test_priority_window_drains_backlog_then_rechecks_deliberately():
    # round-6 discipline: every slot in the window is either a query
    # with NO driver row in CORRECTNESS_r01..r05 (backlog drain) or a
    # member of the pinned _RECHECKS set, each of which re-enters for
    # a stated reason (r5 err fix, rows-only -> oracle conversion,
    # operator changed since its row, output-convention attestation).
    # An unexplained already-green query in the window is a wasted slot.
    import json
    import os

    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.registry import (
        _PRIORITY,
        _RECHECKS,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set[str] = set()
    for r in (1, 2, 3, 4, 5):
        path = os.path.join(repo, f"CORRECTNESS_r0{r}.json")
        if os.path.exists(path):
            with open(path) as f:
                checked |= set(json.load(f))
    stale = [n for n in _PRIORITY if n in checked and n not in _RECHECKS]
    assert not stale, f"window wastes slots on already-checked queries: {stale}"
    # every never-checked query must be in the window (the drain is total)
    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.registry import REGISTRY

    never = [n for n in REGISTRY if n not in checked]
    missing = [n for n in never if n not in _PRIORITY]
    assert not missing, f"never-checked queries left out of the window: {missing}"


def test_svg_fallback_renders_valid_artifact(tmp_path):
    import xml.dom.minidom

    from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.harness import runner

    results = {
        "read": timing.OpTiming(operation="read", times_s=[0.2], median_s=0.2, memory_mb=0.0),
        "sort": timing.OpTiming(operation="sort", times_s=[1.6], median_s=1.6, memory_mb=0.0),
    }
    out = tmp_path / "h7.svg"
    assert runner.plot_results(results, str(out)) is True
    rendered = out if out.exists() else tmp_path / "h7.svg.svg"
    dom = xml.dom.minidom.parse(str(rendered))
    assert dom.documentElement.tagName == "svg"
    texts = [
        t.firstChild.data for t in dom.getElementsByTagName("text") if t.firstChild is not None
    ]
    assert any("read" in t for t in texts) and any("1.60" in t for t in texts)


def test_bench_contract_line_shape():
    # the driver stores only a stdout tail window; the contract line
    # must stay compact and carry exactly the agreed keys
    import json
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    line = bench.contract_line({f"q{i}": 0.1234 for i in range(60)}, 0.1)
    parsed = json.loads(line)
    assert set(parsed) == {"metric", "value", "unit", "queries", "sf"}
    assert parsed["unit"] == "sec" and parsed["sf"] == 0.1
    assert abs(parsed["value"] - 60 * 0.1234) < 1e-6
    assert len(line) < 4096, f"contract line too large for tail capture: {len(line)}B"


def test_executor_peaks_report_real_usage(spark):
    peaks = memory.executor_peaks_mb(spark)
    assert peaks, "local mode must report at least the driver block manager"
    for used in peaks.values():
        assert 0.0 <= used < 130_000.0
