"""Loaders for the driver's star-schema parquet fixtures.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings, one parquet file per table under
``{sf_dir}/``. Parquet carries the schema, so reads are deterministic
(no inference) and Catalyst gets column pruning + predicate pushdown
into the scan for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_raw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Raw parquet read. The events fixture stores TIMESTAMP(NANOS),
    which Spark's reader rejects by default — the legacy nanosAsLong
    conf (runtime-settable) surfaces it as a long we convert in
    :func:`load_table`."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """ns-long -> timestamp, flooring to microseconds exactly as DuckDB
    does when it reads the same nanosecond column."""
    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = read_raw(spark, sf_dir, name)
    if name == "events":
        df = normalize_events_ts(df)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
