"""S7 golden-format test: our results sink must emit exactly the
reference's committed long format (`datatable_results.csv:1` header
`size,operation,time,memory`, numeric formatting included) and
round-trip losslessly."""

import csv

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.sources.results_sink import (
    HEADER,
    ResultRow,
    read_results,
    write_results,
)

GOLDEN_HEADER = "size,operation,time,memory"  # datatable_results.csv:1


def test_header_matches_reference_golden(tmp_path):
    path = str(tmp_path / "results.csv")
    write_results([ResultRow(10000, "read", 0.0561, 1.27)], path)
    first = open(path, newline="").readline().strip()
    assert first == GOLDEN_HEADER
    assert ",".join(HEADER) == GOLDEN_HEADER


def test_rows_roundtrip_and_format(tmp_path):
    path = str(tmp_path / "results.csv")
    rows = [
        ResultRow(10000, "read", 0.0561, 1.27),
        ResultRow(1000000, "groupby", 0.0464, 32.36),
    ]
    write_results(rows, path)
    with open(path, newline="") as f:
        raw = list(csv.reader(f))
    # reference rows are plain decimal strings (no exponents/quotes)
    assert raw[1] == ["10000", "read", "0.0561", "1.27"]
    assert raw[2] == ["1000000", "groupby", "0.0464", "32.36"]
    back = read_results(path)
    assert [(r.size, r.operation) for r in back] == [(10000, "read"), (1000000, "groupby")]
