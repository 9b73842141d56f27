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
