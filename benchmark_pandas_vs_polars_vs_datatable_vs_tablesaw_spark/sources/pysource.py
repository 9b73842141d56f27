"""Spark 4 Python Data Source API demo: a custom partitioned source.

The reference's only ingress is flat CSV (SURVEY.md §2.1); Spark 4
adds a first-class *Python* Data Source API (SPARK-44076) — the
sanctioned way to plug an in-house feed (an internal service, a
bespoke format, a synthetic generator) into the scan side of the
planner, with real InputPartitions so the read parallelizes like any
file source. This module exercises the full surface: DataSource
subclass, schema declaration, option passing, a partition-planning
``partitions()``, and a per-partition ``read()`` generator.

The payload is a seeded arithmetic sequence (Lehmer-style integer
hash), so the scan is bit-reproducible and DuckDB can regenerate the
identical rows from ``generate_series`` — giving a full value oracle
for a source that never touches a file.

Scale posture: partition count comes from an option (maps 1:1 onto
Spark tasks); each partition streams its rows from a generator (no
materialized list), so a 10⁹-row synthetic table costs O(1) memory
per task. Python-side row generation is the slow path vs a JVM
`spark.range` — the point here is the API contract (custom feeds are
usually I/O-bound, not compute-bound), and the probe numbers stay
honest about the Python tax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_N_ROWS_DEFAULT = 50_000
_N_PARTS = 8


class _SynthPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticRowsDataSource(DataSource):
    """``spark.read.format("synth_rows").option("n", ...)`` source."""

    @classmethod
    def name(cls) -> str:
        return "synth_rows"

    def schema(self) -> str:
        return "id BIGINT, bucket BIGINT, score BIGINT"

    def reader(self, schema):  # noqa: ANN001 — framework signature
        return _SyntheticRowsReader(int(self.options.get("n", _N_ROWS_DEFAULT)))


class _SyntheticRowsReader(DataSourceReader):
    def __init__(self, n: int):
        self.n = n

    def partitions(self):
        chunk = (self.n + _N_PARTS - 1) // _N_PARTS
        return [
            _SynthPartition(i * chunk, min((i + 1) * chunk, self.n))
            for i in range(_N_PARTS)
            if i * chunk < self.n
        ]

    def read(self, partition: _SynthPartition):
        for i in range(partition.start, partition.end):
            h = (i * 48271) % 2147483647
            yield (i, h % 10, h % 100000)


def register(spark: SparkSession) -> None:
    spark.dataSource.register(SyntheticRowsDataSource)


def python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the custom Python data source and aggregate per bucket —
    proving the partition-parallel scan produces exactly the declared
    deterministic rows (the oracle regenerates them arithmetically).
    ``sf_dir`` is unused: the source IS the data."""
    register(spark)
    df = spark.read.format("synth_rows").option("n", str(_N_ROWS_DEFAULT)).load()
    return (
        df.groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum("score").alias("score_sum"),
            F.min("id").alias("first_id"),
            F.max("id").alias("last_id"),
        )
        .orderBy("bucket")
    )


PYTHON_DATASOURCE_ORACLE = f"""
WITH rows AS (
  SELECT i AS id,
         (i * 48271) % 2147483647 % 10 AS bucket,
         (i * 48271) % 2147483647 % 100000 AS score
  FROM (SELECT unnest(generate_series(0, {_N_ROWS_DEFAULT - 1})) AS i)
)
SELECT bucket, count(*) AS n,
       CAST(sum(score) AS BIGINT) AS score_sum,
       min(id) AS first_id, max(id) AS last_id
FROM rows GROUP BY bucket ORDER BY bucket
"""


QUERIES: dict = {
    "python_datasource_scan": (python_datasource_scan, PYTHON_DATASOURCE_ORACLE),
}
