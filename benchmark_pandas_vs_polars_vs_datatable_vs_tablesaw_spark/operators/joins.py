"""Joins + relational extensions over the star schema.

The reference implements no joins (SURVEY.md §2.3 — every benchmark is
single-table), but the 100 TB posture requires them as first-class
citizens, so this module provides TPC-H-lite queries exercising every
join strategy Spark has:

- broadcast hash join for dimension tables (region/nation/part —
  explicitly hinted where the dimension is guaranteed small);
- shuffled sort-merge join for fact-fact joins (orders x lineitem),
  with AQE free to downgrade to shuffled-hash or to split skewed
  partitions at runtime;
- left-semi / left-anti for EXISTS / NOT EXISTS;
- window functions, rollup, pivot, set ops — the "free extensions"
  of SURVEY.md §2.4/§2.7.

All doubles rounded in query and oracle alike (reassociation safety).
Timestamps leave results as formatted strings so Spark (session-TZ
UTC) and DuckDB (naive UTC) hash identically.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.scalars import money_sum


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy group-aggregate with 7 aggregates.

    Single shuffle (partial agg map-side, 6 groups cross the wire);
    the shipdate filter is pushed to the parquet scan. The canonical
    "does partial aggregation work" probe at 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
                scale=1_000_000,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
           / 10000.0 AS sum_disc_price,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000)
                AS BIGINT)) / 1000000.0 AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join (dim -> fact -> fact) + group + top-10.

    customer is the small side -> broadcast (no shuffle for that join);
    orders x lineitem is the real shuffle, on the join key both sides.
    Top-10 compiles to TakeOrderedAndProject after the aggregate.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


Q3_ORACLE = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way star join, revenue per nation.

    region/nation/customer/supplier are all broadcast-sized dims; only
    orders x lineitem shuffles. Catalyst reorders the join tree and
    prunes every unused column from each scan.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc())
    )


Q5_ORACLE = """
SELECT n_name,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
           / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight multi-predicate filter + single global
    aggregate. Every predicate pushes to the parquet scan (range on
    date, band on discount, bound on quantity), so the stage reads a
    fraction of the table and reduces to ONE row — zero-shuffle except
    the final single-row gather. The canonical predicate-pushdown probe.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .select(
            money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


Q6_ORACLE = """
SELECT sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT))
           / 10000.0 AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
"""


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional aggregation (CASE sums) —
    counts split by a predicate on the joined row, computed in the same
    partial-aggregable pass as the join output (no second scan)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(is_high).alias("high_line_count"),
            F.sum(1 - is_high).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_ORACLE = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact x dimension with an explicit broadcast hint: part is always
    small relative to lineitem, so shipping it to every executor beats
    shuffling the fact table — the single most important join decision
    at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        )
    )


def semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS via left-semi: no payload columns from the right side ever
    move — the probe side streams, the build side holds only keys."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS via left-anti."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


_BLOOM_BITS = 1 << 17  # 128 Kbit => 2048-long bitmap, ~16 KB broadcast
_BLOOM_HASHES = 3


def _bloom_positions(col, n_bits: int, k: int) -> list:
    """k bit positions for a key: pmod(xxhash64(key, seed_i), m)."""
    return [F.pmod(F.xxhash64(col, F.lit(i)), F.lit(n_bits)) for i in range(k)]


def bloom_build(keys: DataFrame, col: str, n_bits: int = _BLOOM_BITS, k: int = _BLOOM_HASHES) -> DataFrame:
    """One-row DataFrame holding the bloom bitmap as map<word, bits>.

    Lazy aggregation: positions -> 64-bit words (``bit_or``) -> one
    ``map_from_entries`` row, ≤ n_bits/64 entries ≈ n_bits/8 bytes."""
    word_rows = (
        keys.select(F.explode(F.array(*_bloom_positions(F.col(col), n_bits, k))).alias("p"))
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            F.call_function("shiftleft", F.lit(1).cast("long"), (F.col("p") % 64).cast("int")).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
    )
    return word_rows.agg(F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("bf"))


def bloom_might_contain(col, bf_col=None, n_bits: int = _BLOOM_BITS, k: int = _BLOOM_HASHES):
    """Predicate Column: all k bits of ``col`` set in the bitmap map
    column ``bf_col`` (default ``bf``). Pure JVM expressions — no
    false negatives by construction; false-positive rate set by
    (n_bits, k, build cardinality)."""
    bf = bf_col if bf_col is not None else F.col("bf")
    pred = None
    for p in _bloom_positions(col, n_bits, k):
        word = F.coalesce(F.element_at(bf, (p / 64).cast("int")), F.lit(0).cast("long"))
        hit = word.bitwiseAND(
            F.call_function("shiftleft", F.lit(1).cast("long"), (p % 64).cast("int"))
        ) != 0
        pred = hit if pred is None else (pred & hit)
    return pred


def bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter-prefiltered join, built entirely from DataFrame
    primitives (Spark 4.1 does not register ``bloom_filter_agg`` for
    SQL, and its automatic runtime bloom only fires past size
    thresholds a benchmark fixture never meets):

    1. Build: hash every build-side key to k=3 bit positions
       (seeded xxhash64 mod m), OR them into 64-bit words
       (``bit_or`` groupBy word index), and fold the ≤ m/64 word rows
       into a single map<word, bits> row — ~16 KB for 2^17 bits.
    2. Probe: the bitmap reaches the probe side as an uncorrelated
       SCALAR SUBQUERY inside a WHERE clause, so the k-bit test is a
       plain filter expression sitting directly on the fact scan
       (``DataFilters`` in the plan) — evaluated below every join and
       exchange, no shuffle, no Python. This formulation is load-
       bearing: expressing the probe as a cross join with the one-row
       bitmap instead lets ``PushLeftSemiLeftAntiThroughJoin`` hoist
       the exact verify join BELOW the bloom filter, which silently
       turns the bloom into dead weight (observed; the semantic test
       pins the subquery shape). Spark's own InjectRuntimeFilter
       materializes its bloom the same way — a driver-evaluated
       subquery stitched into the scan filter.
    3. Verify: bloom false positives are removed by the exact
       left-semi join above the pre-filtered scan.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    build_keys = cust.filter(F.col("c_nationkey") == 7).select("c_custkey")

    tag = uuid.uuid4().hex[:12]
    v_bloom, v_orders, v_keys = f"bloom_{tag}", f"orders_{tag}", f"keys_{tag}"
    bloom_build(build_keys, "c_custkey").createOrReplaceTempView(v_bloom)
    orders.select("o_custkey", "o_totalprice", "o_orderpriority").createOrReplaceTempView(v_orders)
    build_keys.createOrReplaceTempView(v_keys)

    probe = " AND ".join(
        f"(coalesce(element_at((SELECT bf FROM {v_bloom}),"
        f" CAST(pmod(xxhash64(o_custkey, {i}), {_BLOOM_BITS}) / 64 AS INT)), 0L)"
        f" & shiftleft(1L, CAST(pmod(xxhash64(o_custkey, {i}), {_BLOOM_BITS}) % 64 AS INT))) != 0"
        for i in range(_BLOOM_HASHES)
    )
    # k textual subqueries => k driver-evaluated builds of the small-dim
    # aggregate; their identical inner exchanges dedupe via ReuseExchange.
    return spark.sql(f"""
        WITH probed AS (
          SELECT o_custkey, o_totalprice, o_orderpriority
          FROM {v_orders}
          WHERE {probe}
        )
        SELECT o_orderpriority, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM probed LEFT SEMI JOIN {v_keys} ON o_custkey = c_custkey
        GROUP BY o_orderpriority
    """)


BLOOM_PREFILTER_ORACLE = """
SELECT o_orderpriority, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
WHERE EXISTS (SELECT 1 FROM customer
              WHERE c_custkey = o_custkey AND c_nationkey = 7)
GROUP BY o_orderpriority
"""


def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE / upsert emulation (CDC apply): a change set (10% price
    corrections + synthetic new rows) merged into the base table —
    matched rows take the update, unmatched updates insert, everything
    else carries over. One full-outer join on the key + coalesce
    resolution, then a verification aggregate.

    This is exactly the reconcile step a lakehouse MERGE INTO performs;
    without a transactional table format the result is written as a new
    snapshot (blind overwrite), which at 100 TB argues for key-bucketed
    snapshots so the next merge's join is exchange-free (see
    bucketed_join_revenue)."""
    base = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    updates = base.filter(F.col("o_orderkey") % 10 == 3).select(
        "o_orderkey", (F.col("o_totalprice") * 1.1).alias("u_price")
    )
    inserts = spark.range(5).select(
        (F.col("id") + 900_000_000).alias("o_orderkey"),
        F.lit(42.0).alias("u_price"),
    )
    changes = updates.unionByName(inserts)
    merged = (
        base.join(changes, "o_orderkey", "full_outer")
        .select(
            "o_orderkey",
            F.round(F.coalesce("u_price", "o_totalprice"), 2).alias("price"),
            F.when(F.col("o_totalprice").isNull(), "inserted")
            .when(F.col("u_price").isNull(), "unchanged")
            .otherwise("updated")
            .alias("action"),
        )
    )
    return merged.groupBy("action").agg(
        F.count("*").alias("n"),
        F.round(F.sum("price"), 2).alias("price_sum"),
    )


MERGE_UPSERT_ORACLE = """
WITH changes AS (
  SELECT o_orderkey, o_totalprice * 1.1 AS u_price
  FROM orders WHERE o_orderkey % 10 = 3
  UNION ALL
  SELECT 900000000 + g AS o_orderkey, 42.0 AS u_price
  FROM generate_series(0, 4) AS t(g)
)
SELECT CASE WHEN b.o_orderkey IS NULL THEN 'inserted'
            WHEN c.u_price IS NULL THEN 'unchanged'
            ELSE 'updated' END AS action,
       count(*) AS n,
       round(sum(round(coalesce(c.u_price, b.o_totalprice), 2)), 2) AS price_sum
FROM orders b FULL OUTER JOIN changes c USING (o_orderkey)
GROUP BY 1
"""


def outer_join_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join with null-side accounting: every customer x
    order relationship classified as matched / customer-only /
    order-only in one pass. The outer join shuffles both sides on the
    key exactly like an inner SMJ — null rows are emitted by the merge,
    not by extra work."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    joined = cust.join(orders, cust.c_custkey == orders.o_custkey, "full_outer")
    side = (
        F.when(F.col("c_custkey").isNotNull() & F.col("o_custkey").isNotNull(), "matched")
        .when(F.col("o_custkey").isNull(), "customer_only")
        .otherwise("order_only")
    )
    return joined.groupBy(side.alias("side")).agg(
        F.count("*").alias("n"),
        F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("price_sum"),
    )


OUTER_JOIN_ORACLE = """
SELECT CASE
         WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL THEN 'matched'
         WHEN o_custkey IS NULL THEN 'customer_only'
         ELSE 'order_only'
       END AS side,
       count(*) AS n,
       round(coalesce(sum(o_totalprice), 0.0), 2) AS price_sum
FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey
GROUP BY 1
"""


def null_handling_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics end-to-end: nulls injected with nullif, then
    counted, defaulted (coalesce), and excluded (dropna) — the
    null-discipline every ingest pipeline needs pinned. All three
    treatments happen in one aggregate pass."""
    cust = load_table(spark, sf_dir, "customer")
    with_nulls = cust.withColumn(
        "bal", F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal"))
    )
    return with_nulls.select(
        F.count("*").alias("n_rows"),
        F.count("bal").alias("n_nonnull"),
        F.sum(F.col("bal").isNull().cast("int")).alias("n_null"),
        money_sum(F.coalesce("bal", F.lit(0.0)), scale=100).alias("sum_defaulted"),
        F.round(
            money_sum(F.col("bal"), scale=100) / F.count("bal"), 4
        ).alias("avg_ignoring_nulls"),
    )


NULL_HANDLING_ORACLE = """
SELECT count(*) AS n_rows,
       count(bal) AS n_nonnull,
       CAST(sum(CASE WHEN bal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       sum(CAST(round(coalesce(bal, 0.0) * 100) AS BIGINT)) / 100.0 AS sum_defaulted,
       round((sum(CAST(round(bal * 100) AS BIGINT)) / 100.0) / count(bal), 4)
           AS avg_ignoring_nulls
FROM (SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal FROM customer)
"""


def array_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation + element ops: per-priority sorted key array
    (deterministic via sort_array), its size, first/last elements, and
    a containment probe. collect_list order is partition-dependent in
    Spark, so the DETERMINISTIC formulation is always
    sort_array(collect_list(...)) — same rule as groupby-first."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.sort_array(F.collect_list("o_orderkey")).alias("keys"))
        .select(
            "o_orderpriority",
            F.size("keys").alias("n_keys"),
            F.element_at("keys", 1).alias("first_key"),
            F.element_at("keys", -1).alias("last_key"),
            F.array_contains("keys", 7).cast("int").alias("has_key_7"),
        )
    )


ARRAY_AGG_ORACLE = """
SELECT o_orderpriority,
       CAST(len(keys) AS INT) AS n_keys,
       keys[1] AS first_key,
       keys[-1] AS last_key,
       CAST(list_contains(keys, 7) AS INT) AS has_key_7
FROM (
  SELECT o_orderpriority, list_sort(list(o_orderkey)) AS keys
  FROM orders WHERE o_orderkey <= 200
  GROUP BY o_orderpriority
)
"""


def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window: per-customer running order total, ordered by
    date with the key as tiebreak. One shuffle on the partition key;
    frame is rowsBetween(unboundedPreceding, current)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


WINDOW_RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
"""


def rollup_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (free Spark extension, SURVEY.md §2.4):
    subtotals per (flag, status), per flag, and grand total. NULL
    indicator cells coalesced to 'ALL' so the hash is unambiguous."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "sum_qty",
            "n",
        )
    )


ROLLUP_ORACLE = """
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on l_linestatus (values pinned so the output schema is
    static — required both for the oracle and for plan stability)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .select(
            "l_returnflag",
            F.coalesce("O", F.lit(0.0)).alias("qty_o"),
            F.coalesce("F", F.lit(0.0)).alias("qty_f"),
        )
    )


PIVOT_ORACLE = """
SELECT l_returnflag,
       coalesce(round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2), 0.0) AS qty_o,
       coalesce(round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2), 0.0) AS qty_f
FROM lineitem
GROUP BY l_returnflag
"""


def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand + two-phase agg in Spark)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.count_distinct("o_custkey").alias("n_custs"),
        F.count_distinct("o_orderpriority").alias("n_prios"),
        F.count("*").alias("n_orders"),
    )


def set_ops_union_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators (SURVEY.md §2.7 free extensions): BUILDING-segment
    keys UNION negative-balance keys, EXCEPT machinery keys."""
    cust = load_table(spark, sf_dir, "customer")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    negative = cust.filter(F.col("c_acctbal") < 0).select("c_custkey")
    machinery = cust.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    return building.union(negative).distinct().exceptAll(machinery).distinct()


SET_OPS_ORACLE = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT c_custkey FROM customer WHERE c_acctbal < 0
EXCEPT
SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
"""


def intersect_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations that have both customers and suppliers."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


def lateral_topn_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL LATERAL correlated subquery (Spark 4): the top-2 customers
    by balance for each nation, written the way an analyst writes it —
    a per-nation correlated LIMIT — and decorrelated by Catalyst into
    the same ranked-window plan the explicit formulation produces.
    The third front door (DataFrame, classic SQL, pipe syntax) gains a
    fourth: correlated LATERAL.

    Scale shape: Catalyst rewrites the correlated limit to a
    partitioned rank — one shuffle on the correlation key, no
    per-nation re-execution (the plan is identical to
    events_topk_users_per_type's window form; LATERAL is surface
    syntax, not a nested loop).
    """
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, c.c_custkey, c.c_acctbal
        FROM nation n,
             LATERAL (
               SELECT c_custkey, c_acctbal
               FROM customer
               WHERE c_nationkey = n.n_nationkey
               ORDER BY c_acctbal DESC, c_custkey
               LIMIT 2
             ) c
        ORDER BY n.n_name, c.c_acctbal DESC, c.c_custkey
        """
    )


LATERAL_TOPN_ORACLE = """
SELECT n.n_name, c.c_custkey, c.c_acctbal
FROM nation n,
     LATERAL (
       SELECT c_custkey, c_acctbal
       FROM customer
       WHERE c_nationkey = n.n_nationkey
       ORDER BY c_acctbal DESC, c_custkey
       LIMIT 2
     ) c
ORDER BY n.n_name, c.c_acctbal DESC, c.c_custkey
"""


QUERIES: dict = {
    "lateral_topn_per_nation": (lateral_topn_per_nation, LATERAL_TOPN_ORACLE),
    "q1_pricing_summary": (q1_pricing_summary, Q1_ORACLE),
    "q3_shipping_priority": (q3_shipping_priority, Q3_ORACLE),
    "q5_revenue_by_nation": (q5_revenue_by_nation, Q5_ORACLE),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_ORACLE),
    "q12_priority_shipping": (q12_priority_shipping, Q12_ORACLE),
    "broadcast_dim_join": (
        broadcast_dim_join,
        """
        SELECT p_brand, count(*) AS n_items,
               round(avg(l_extendedprice), 4) AS avg_price
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
        """,
    ),
    "semi_join_customers_with_orders": (
        semi_join_customers_with_orders,
        """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
    ),
    "anti_join_customers_without_orders": (
        anti_join_customers_without_orders,
        """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
    ),
    "bloom_prefilter_join": (bloom_prefilter_join, BLOOM_PREFILTER_ORACLE),
    "merge_upsert_orders": (merge_upsert_orders, MERGE_UPSERT_ORACLE),
    "outer_join_coverage": (outer_join_coverage, OUTER_JOIN_ORACLE),
    "null_handling_suite": (null_handling_suite, NULL_HANDLING_ORACLE),
    "array_agg_suite": (array_agg_suite, ARRAY_AGG_ORACLE),
    "window_running_total": (window_running_total, WINDOW_RUNNING_ORACLE),
    "rollup_returnflag_linestatus": (rollup_returnflag_linestatus, ROLLUP_ORACLE),
    "pivot_linestatus": (pivot_linestatus, PIVOT_ORACLE),
    "distinct_counts": (
        distinct_counts,
        """
        SELECT count(DISTINCT o_custkey) AS n_custs,
               count(DISTINCT o_orderpriority) AS n_prios,
               count(*) AS n_orders
        FROM orders
        """,
    ),
    "set_ops_union_except": (set_ops_union_except, SET_OPS_ORACLE),
    "intersect_segments": (
        intersect_segments,
        """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
        """,
    ),
}
