"""Synthetic table generators — SURVEY.md §2.1 S5/S6, FIXTURES.md F1-F4.

All generators are ``spark.range`` + seeded ``rand``/``randn`` built-in
expressions: fully distributed (one task per range slice), no driver
materialization, no UDFs. Every generator takes an explicit seed
(matching ``datatable_benchmark.py:10``'s ``np.random.seed(42)``; we
deliberately do NOT copy ``main.rs:63``'s unseeded ``thread_rng`` —
SURVEY.md §7.5.6).

At 100 TB: ``spark.range(n, numPartitions=k)`` parallelizes the
generate itself, so a trillion-row synthetic table is just a bigger
``n`` and ``k`` — nothing here ever touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import scalars


def scaling4(spark: SparkSession, n_rows: int, seed: int = 42, num_partitions: int | None = None) -> DataFrame:
    """FIXTURES F1 — the 4-column scaling dataset.

    ``(id int64 sequential, category in {cat_0..cat_9}, value1 ~
    Normal(100,20), value2 ~ Uniform(0,1000))`` — the dataset behind the
    datatable scaling benchmark (`datatable_benchmark.py:8-16`) and the
    Tablesaw scaling benchmark (`you_TablesawBenchmark1.java:29-40`).
    """
    rng = spark.range(n_rows, numPartitions=num_partitions) if num_partitions else spark.range(n_rows)
    return rng.select(
        F.col("id"),
        scalars.random_category(seed, 10).alias("category"),
        scalars.gaussian(seed + 1, 100.0, 20.0).alias("value1"),
        scalars.uniform(seed + 2, 0.0, 1000.0).alias("value2"),
    )


def rust3(spark: SparkSession, n_rows: int = 100_000, seed: int = 42, num_partitions: int | None = None) -> DataFrame:
    """FIXTURES F2 — the 3-column Rust/Polars dataset.

    ``(id sequential, category in {Category1..Category5}, value ~
    Uniform(0,1000))`` per `main.rs:61-79` (seeded here, unlike the
    reference).
    """
    rng = spark.range(n_rows, numPartitions=num_partitions) if num_partitions else spark.range(n_rows)
    return rng.select(
        F.col("id"),
        scalars.category_label((F.rand(seed) * 5).cast("int") + 1, "Category").alias("category"),
        scalars.uniform(seed + 1, 0.0, 1000.0).alias("value"),
    )


def synth1gb_shape(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """FIXTURES F4 — the alternate 1 GB fixture's shape.

    ``(row_id int64, float_col ~ N(0,1), int_col ~ U[0,1M) int32,
    str_col 10 random ascii letters)`` per NB-main:34-61. Row count is
    a parameter; the reference sizes it to hit TARGET_BYTES=1e9
    (NB-main:28).
    """
    return spark.range(n_rows).select(
        F.col("id").alias("row_id"),
        F.randn(seed).alias("float_col"),
        (F.rand(seed + 1) * 1_000_000).cast("int").alias("int_col"),
        scalars.random_ascii_string(seed + 2, 10).alias("str_col"),
    )


def duplicate_rows(df: DataFrame, k: int) -> DataFrame:
    """S6 — scale-up by repeating every row k times.

    Reference: ``base.loc[base.index.repeat(dup)]`` (NB-main:72), used
    to inflate the 768-row diabetes CSV 42,847x to ~1 GB. Spark-first
    formulation: explode a k-element literal array — stays narrow (no
    shuffle), each task inflates its own partition.
    """
    return (
        df.withColumn("__dup", F.explode(F.array_repeat(F.lit(1), k)))
        .drop("__dup")
    )


def estimate_rows_for_bytes(sample: DataFrame, target_bytes: int, sample_rows: int = 10_000) -> int:
    """NB-main:34-49's bytes-per-row estimator: measure a sample, scale."""
    pdf = sample.limit(sample_rows).toPandas()
    bytes_per_row = max(1, int(pdf.memory_usage(deep=True).sum() / max(1, len(pdf))))
    return max(1, target_bytes // bytes_per_row)
