"""Scalar column-expression builders — SURVEY.md §2.8 (F1-F7).

All of the reference's scalar compute lives in its data generators
(category labels, uniform/gaussian draws, random strings, fixed-point
formatting, numeric-or-NaN coercion). Each maps to a JVM-side built-in
expression so the whole generator stays inside whole-stage codegen —
no Python UDFs on any of these paths.

Reference sites: category concat `datatable_benchmark.py:13` /
`you_TablesawBenchmark1.java:34` / `main.rs:73`; uniform draw
`datatable_benchmark.py:15`; gaussian `datatable_benchmark.py:14`;
random string `DataFrame_Library_Benchmark_Pandas_vs_Polars_vs_Tablesaw.ipynb:41-43`;
2-dp rounding `you_TablesawBenchmark1.java:37`; numeric-or-NaN
`Benchmark1.java:68-74`.
"""

from __future__ import annotations

import string

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

def nan() -> Column:
    return F.lit(float("nan"))


def category_label(bucket: Column, prefix: str = "cat_") -> Column:
    """F1 — ``"cat_" + i`` style label from an int bucket column."""
    return F.concat(F.lit(prefix), bucket.cast("string"))


def uniform(seed: int, lo: float = 0.0, hi: float = 1000.0) -> Column:
    """F2 — Uniform(lo, hi) draw, seeded (never thread_rng — SURVEY §7.5.6)."""
    return F.rand(seed) * F.lit(hi - lo) + F.lit(lo)


def gaussian(seed: int, mean: float = 100.0, sd: float = 20.0) -> Column:
    """F3 — Normal(mean, sd) draw, seeded."""
    return F.randn(seed) * F.lit(sd) + F.lit(mean)


def random_category(seed: int, n_cats: int = 10, prefix: str = "cat_") -> Column:
    """F4 — uniform draw over ``{prefix}0..{prefix}{n_cats-1}``."""
    return category_label((F.rand(seed) * n_cats).cast("int"), prefix)


def random_ascii_string(seed: int, length: int = 10) -> Column:
    """F5 — fixed-length random string over ascii letters.

    Composed from built-ins (element_at over a literal alphabet array);
    each position uses a distinct derived seed so characters are i.i.d.
    """
    alphabet = F.array(*[F.lit(c) for c in string.ascii_letters])
    chars = [
        F.element_at(alphabet, (F.rand(seed + i) * len(string.ascii_letters)).cast("int") + 1)
        for i in range(length)
    ]
    return F.concat(*chars)


def round2(col: Column) -> Column:
    """F6 — fixed-point 2-dp formatting used by the Java CSV writer."""
    return F.round(col, 2)


def money_sum(expr: Column, scale: int = 10_000) -> Column:
    """Order-independent, cross-engine-exact sum of decimal-quantized
    doubles (see operators/tpch_extra.py for the full rationale).

    Fixture prices/discounts/taxes are 2-decimal, so money products
    are exact multiples of 1e-4 (1e-6 with a tax factor — pass
    scale=1_000_000 there). Accumulating `round(expr * scale)` as
    int64 makes the sum exact and independent of Spark's partial-agg
    merge order AND of DuckDB's summation order, so both engines emit
    bit-identical doubles with no output rounding. `round(sum(x), 2)`
    of a float sum, by contrast, can split across a .xx5 boundary
    between engines (observed at sf0.01).

    Oracle twin: `sum(CAST(round(expr * {scale}) AS BIGINT)) / {scale}.0`.
    int64 headroom: at 100 TB (~1e11 lineitem rows x ~1e5 price x 1e6
    scale ≈ 1e22) per-group totals of a GLOBAL sum would overflow —
    for global 100 TB rollups use scale=100 (cents, ≈1e18) or a
    DECIMAL(38, 4) cast instead; per-key group sums stay far below
    the limit at any SF.
    """
    return F.sum(F.round(expr * scale).cast("long")) / F.lit(float(scale))


def numeric_or_nan(col: Column, data_type: T.DataType) -> Column:
    """F7 — numeric cells cast to double, non-numeric cells -> NaN.

    Matches the Tablesaw to_np exporter's coercion (`Benchmark1.java:68-74`):
    any non-numeric column becomes Double.NaN wholesale.
    """
    if isinstance(data_type, T.NumericType):
        return col.cast("double")
    return nan()


def first_numeric_column(schema: T.StructType) -> str:
    """§2.2 P2 — schema introspection: first numeric column name.

    Reference: ``df.select_dtypes(include="number").columns[0]``
    (NB-main:209-210) and the polars/datatable dtype-zip scans.
    """
    for field in schema.fields:
        if isinstance(field.dataType, T.NumericType):
            return field.name
    raise ValueError("no numeric column in schema")
