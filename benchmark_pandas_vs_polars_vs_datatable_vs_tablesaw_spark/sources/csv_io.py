"""CSV scan / sink — SURVEY.md §2.1 S1-S4.

Reference semantics: header row, schema inferred (or supplied), whole
file parsed in parallel (`dt.fread`, Polars LazyCsvReader). Spark's
multi-split CSV reader gives the parallel parse; explicit schemas are
preferred over inference for determinism and to avoid the extra
inference pass over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    infer: bool = False,
) -> DataFrame:
    """S1 — CSV scan with header. Explicit schema wins; infer is opt-in."""
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_csv_prefix(
    spark: SparkSession,
    path: str,
    n_rows: int,
    schema: T.StructType | None = None,
) -> DataFrame:
    """S2 — row-limited scan (``nrows=`` / ``MAX_ROWS`` semantics).

    The reference reads a *file prefix* (`Benchmark1.java:19,33-35`).
    ``df.limit(N)`` over a multi-split read returns an arbitrary N rows,
    so for exact-prefix parity this reads the file as a single split
    before limiting (SURVEY.md §7.5.2). For benchmark-shaped workloads
    where "any N rows" is acceptable, pass the result of
    :func:`read_csv` to ``.limit`` instead and keep the parallel scan.
    """
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    # one split => file order preserved => limit(N) is the true prefix
    df = reader.option("maxPartitionBytes", str(1 << 40)).csv(path)
    return df.coalesce(1).limit(n_rows)


def write_csv(df: DataFrame, path: str, single_file: bool = False, header: bool = True) -> None:
    """S3 — CSV sink. ``single_file`` gives the reference's one-file
    output shape via coalesce(1); at scale leave it False (one part
    file per partition, written in parallel)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", header).csv(path)


def read_remote_csv(spark: SparkSession, url: str, schema: T.StructType | None = None) -> DataFrame:
    """S4 — remote URL scan (`NB-main:64-65` reads the seed CSV over
    HTTPS). SparkContext.addFile distributes the fetch; reading then
    goes through the normal CSV path."""
    from pyspark import SparkFiles

    spark.sparkContext.addFile(url)
    name = url.rstrip("/").split("/")[-1]
    return read_csv(spark, "file://" + SparkFiles.get(name), schema=schema, infer=schema is None)
