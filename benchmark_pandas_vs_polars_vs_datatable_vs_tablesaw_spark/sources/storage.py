"""Storage-layout operators: bucketed tables (co-located joins) and
partition-pruned reads.

The reference reads flat CSV (SURVEY.md §2.1) — it has no storage
layout at all. At 100 TB, layout IS the optimization: a fact table
bucketed by its join key joins without ANY exchange (the single most
expensive operator at scale), and a table partitioned by a filter
column is read at 1/|partitions| cost via partition pruning. These
queries build both layouts once into a scratch warehouse and
demonstrate the no-shuffle / pruned-scan read paths with fully
oracle-checked results.
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

WAREHOUSE = os.path.join(tempfile.gettempdir(), "sparkbench_warehouse")
N_BUCKETS = 8


def _tag(sf_dir: str) -> str:
    return re.sub(r"[^0-9A-Za-z]+", "_", sf_dir.rstrip("/")).strip("_")


def _ensure_bucketed(
    spark: SparkSession, sf_dir: str, name: str, bucket_col: str, cols: list[str]
) -> DataFrame:
    """Write ``name`` bucketed+sorted by ``bucket_col`` once per
    (sf_dir, session catalog); later calls read the bucketed files.

    bucketBy pre-shuffles ONCE at write time; every subsequent join or
    aggregation on the bucket key reads co-located, pre-sorted buckets
    and skips both the exchange and the sort — the write cost amortizes
    across every downstream consumer, which is exactly how a 100 TB
    fact table should be laid out.
    """
    tbl = f"{name}_bkt_{_tag(sf_dir)}"
    if not spark.catalog.tableExists(tbl):
        (
            load_table(spark, sf_dir, name)
            .select(*cols)
            .write.bucketBy(N_BUCKETS, bucket_col)
            .sortBy(bucket_col)
            .option("path", os.path.join(WAREHOUSE, tbl))
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(tbl)
        )
    return spark.table(tbl)


def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders x lineitem with BOTH sides bucketed by the join key:
    the sort-merge join runs with zero Exchange and zero Sort (verify
    with .explain — no Exchange below the SortMergeJoin). The merge
    hint keeps AQE from flipping to broadcast at fixture scale, since
    the point is the co-located read path."""
    li = _ensure_bucketed(
        spark, sf_dir, "lineitem", "l_orderkey", ["l_orderkey", "l_extendedprice", "l_discount"]
    )
    orders = _ensure_bucketed(
        spark, sf_dir, "orders", "o_orderkey", ["o_orderkey", "o_orderstatus"]
    )
    return (
        li.hint("merge")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


BUCKETED_JOIN_ORACLE = """
SELECT o_orderstatus,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""


def _ensure_partitioned_orders(spark: SparkSession, sf_dir: str) -> str:
    """Write orders hive-partitioned by o_orderpriority once; return
    the path. Partition values become directories, so a filter on the
    partition column prunes whole directories at planning time."""
    path = os.path.join(WAREHOUSE, f"orders_part_{_tag(sf_dir)}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        (
            load_table(spark, sf_dir, "orders")
            .write.partitionBy("o_orderpriority")
            .mode("overwrite")
            .parquet(path)
        )
    return path


def partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter on the partition column of a partitioned layout: the scan
    touches ONE priority directory out of five (PartitionFilters in the
    plan, PartitionCount: 1) — at 100 TB this is the difference between
    reading 20 TB and reading 100 TB for the same query."""
    path = _ensure_partitioned_orders(spark, sf_dir)
    orders = spark.read.parquet(path)
    return (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("price_sum"),
        )
    )


PARTITION_PRUNED_ORACLE = """
SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS price_sum
FROM orders
WHERE o_orderpriority = '1-URGENT'
GROUP BY o_orderstatus
"""


QUERIES: dict = {
    "bucketed_join_revenue": (bucketed_join_revenue, BUCKETED_JOIN_ORACLE),
    "partition_pruned_scan": (partition_pruned_scan, PARTITION_PRUNED_ORACLE),
}
