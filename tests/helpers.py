"""Differential-compare helper mimicking the driver's oracle check:
row count + column names + order-insensitive value comparison between
the Spark result and DuckDB running the oracle SQL on the same parquet.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _values_equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return str(a) == str(b)


def _dtype_kind(dtype) -> str:
    """Canonical dtype class for the driver's type-sensitive hash:
    integer width matters (HUGEINT/object vs int64 hash-mismatches even
    when values are identical — CORRECTNESS_r01 q12/null_handling), but
    datetime unit (ns vs us) and nullable-vs-numpy float boxing do not.
    """
    kind = dtype.kind if hasattr(dtype, "kind") else "O"
    if kind in "iu":
        return f"int{dtype.itemsize * 8}"
    if kind == "f":
        return "float"
    if kind == "M":
        return "timestamp"
    if kind == "b":
        return "bool"
    return "object"


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Returns a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    for c in sorted(spark_pdf.columns):
        ka, kb = _dtype_kind(spark_pdf[c].dtype), _dtype_kind(oracle_pdf[c].dtype)
        if ka != kb:
            problems.append(f"col {c}: dtype kind differs: spark={ka} oracle={kb}")
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return problems
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    for c in a.columns:
        col_a, col_b = a[c].tolist(), b[c].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(col_a, col_b)) if not _values_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(f"col {c}: {len(bad)} mismatches, first at row {i}: spark={x!r} oracle={y!r}")
    return problems


def driver_sortability_problems(spark_pdf: pd.DataFrame) -> list[str]:
    """Mimic the DRIVER's canonicalizer, which (unlike _normalize) sorts
    the raw frame by all columns WITHOUT stringifying object cells —
    pandas' multi-key lexsort factorizes object columns, so an
    array-typed result raises ``TypeError: unhashable type: 'list'``
    (CORRECTNESS_r05 `embedding_random_projection` red row). Every
    registry query must survive this raw sort: scalar columns only,
    per the output convention pinned in registry.py."""
    if spark_pdf.empty:
        return []
    try:
        spark_pdf.sort_values(by=list(spark_pdf.columns), kind="mergesort")
    except Exception as e:  # noqa: BLE001 — report, don't crash the suite
        return [f"not driver-sortable: {type(e).__name__}: {e}"]
    return []


def run_differential(spark, sf_dir: str, fn, oracle: str) -> list[str]:
    spark_pdf = fn(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.execute(oracle).fetchdf()
    finally:
        con.close()
    return compare_frames(spark_pdf, oracle_pdf) + driver_sortability_problems(spark_pdf)
