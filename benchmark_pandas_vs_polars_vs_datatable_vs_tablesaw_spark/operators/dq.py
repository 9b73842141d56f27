"""Data-quality constraint validation and pipeline diagnostics.

The reference benchmark assumes its inputs are clean
(NB-main loads the diabetes CSV and goes straight to aggregation); a
production pipeline at 100 TB cannot. These operators are the
Deequ-style validation layer that runs *before* the reference's
queries: a single-pass constraint report over the fact tables, and a
key-skew diagnostic that tells you whether the downstream
shuffle-by-key plans (joins, sessionization) will hot-spot.

Scale shape: every metric here is an algebraic aggregate (count /
conditional count / distinct-count), so the whole report is one
map-side-combinable pass over each table — no row-level output ever
leaves the executors. The referential check is a left-anti join that
Catalyst plans as a shuffle join on the key both sides already
shuffle on elsewhere (AQE reuses the exchange when run in the same
plan as a keyed query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass Deequ-style constraint report over ``orders`` +
    ``lineitem``: row count, key uniqueness, completeness, domain
    membership, value ranges, cross-table referential integrity.

    Output is long-format ``(check_name, value, passed)`` — the shape
    a scheduler gates a pipeline run on. All metrics except the
    orphan check come from ONE aggregate over orders (stacked to long
    form after the fact, so the table is scanned once); the orphan
    count is a separate left-anti join on ``lineitem``.

    ``value`` semantics: ``orders_rowcount`` is a size metric
    (passes when > 0); every other row is a violation count (passes
    when == 0). ``orderdate_not_future`` is deliberately tight
    (cutoff 2001-06-01 < fixture max) so the report demonstrably
    fires on real violations rather than vacuously passing.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    agg = orders.agg(
        F.count("*").alias("rowcount"),
        (F.count("*") - F.count_distinct("o_orderkey")).alias("dup_keys"),
        F.count(F.when(F.col("o_totalprice").isNull(), 1)).alias("null_price"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("nonpos_price"),
        F.count(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
        ).alias("bad_status"),
        F.count(
            F.when(F.col("o_orderdate") >= F.lit("2001-06-01").cast("timestamp"), 1)
        ).alias("future_dated"),
    )
    stacked = agg.selectExpr(
        "stack(6, "
        "'orders_rowcount', rowcount, "
        "'orderkey_unique', dup_keys, "
        "'totalprice_complete', null_price, "
        "'totalprice_positive', nonpos_price, "
        "'orderstatus_domain', bad_status, "
        "'orderdate_not_future', future_dated) AS (check_name, value)"
    )
    orphans = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count("*").alias("value"))
        .select(F.lit("lineitem_fk_orphans").alias("check_name"), "value")
    )
    report = stacked.unionByName(orphans)
    passed = F.when(
        F.col("check_name") == "orders_rowcount", F.col("value") > 0
    ).otherwise(F.col("value") == F.lit(0))
    return report.select(
        "check_name", F.col("value").cast("long").alias("value"), passed.alias("passed")
    ).orderBy("check_name")


DQ_CONSTRAINT_REPORT_ORACLE = """
WITH agg AS (
  SELECT count(*) AS rowcount,
         count(*) - count(DISTINCT o_orderkey) AS dup_keys,
         count(CASE WHEN o_totalprice IS NULL THEN 1 END) AS null_price,
         count(CASE WHEN o_totalprice <= 0 THEN 1 END) AS nonpos_price,
         count(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 END)
           AS bad_status,
         count(CASE WHEN o_orderdate >= TIMESTAMP '2001-06-01' THEN 1 END)
           AS future_dated
  FROM orders
), report AS (
  SELECT 'orders_rowcount' AS check_name, rowcount AS value FROM agg
  UNION ALL SELECT 'orderkey_unique', dup_keys FROM agg
  UNION ALL SELECT 'totalprice_complete', null_price FROM agg
  UNION ALL SELECT 'totalprice_positive', nonpos_price FROM agg
  UNION ALL SELECT 'orderstatus_domain', bad_status FROM agg
  UNION ALL SELECT 'orderdate_not_future', future_dated FROM agg
  UNION ALL
  SELECT 'lineitem_fk_orphans', count(*)
  FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
)
SELECT check_name, CAST(value AS BIGINT) AS value,
       CASE WHEN check_name = 'orders_rowcount' THEN value > 0
            ELSE value = 0 END AS passed
FROM report
ORDER BY check_name
"""


def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic for ``lineitem.l_orderkey`` — the
    pre-flight check for every keyed join/agg in the suite: per-key
    row counts reduced to a one-row distribution summary plus the
    heaviest key (min key among ties, so the answer is deterministic).

    Two map-side-combinable aggregations (key -> count, then count ->
    stats); the per-key intermediate is never wider than (key, count),
    so at 100 TB this costs one partial-agg shuffle of the key space —
    exactly the shuffle the downstream join would do anyway, making
    the diagnostic essentially free to piggyback. ``skew_ratio``
    (max/avg) > ~5 is the signal to switch the downstream plan to the
    salted variant (``salted_skew_agg``) or rely on AQE skew-join.

    All outputs are integer-exact except the two ratios, rounded to 4
    decimals after single-row division (no cross-partition float
    accumulation order to worry about).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    per_key = lineitem.groupBy("l_orderkey").agg(F.count("*").alias("cnt"))
    stats = per_key.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_rows"),
        F.min("cnt").alias("min_rows"),
        F.expr("percentile(cnt, 0.5)").alias("p50"),
        F.expr("percentile(cnt, 0.99)").alias("p99"),
    )
    heaviest = (
        per_key.join(stats.select("max_rows"), per_key.cnt == F.col("max_rows"))
        .agg(F.min("l_orderkey").alias("heaviest_key"))
    )
    return (
        stats.crossJoin(heaviest)
        .select(
            "n_keys",
            "n_rows",
            "max_rows",
            "min_rows",
            F.round("p50", 4).alias("p50_rows"),
            F.round("p99", 4).alias("p99_rows"),
            F.round(
                F.col("max_rows") / (F.col("n_rows") / F.col("n_keys")), 4
            ).alias("skew_ratio"),
            "heaviest_key",
        )
    )


KEY_SKEW_REPORT_ORACLE = """
WITH per_key AS (
  SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY l_orderkey
), stats AS (
  SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows,
         max(cnt) AS max_rows, min(cnt) AS min_rows,
         quantile_cont(cnt, 0.5) AS p50, quantile_cont(cnt, 0.99) AS p99
  FROM per_key
)
SELECT s.n_keys, s.n_rows, s.max_rows, s.min_rows,
       round(s.p50, 4) AS p50_rows, round(s.p99, 4) AS p99_rows,
       round(s.max_rows / (s.n_rows * 1.0 / s.n_keys), 4) AS skew_ratio,
       (SELECT min(l_orderkey) FROM per_key p, stats s2
        WHERE p.cnt = s2.max_rows) AS heaviest_key
FROM stats s
"""


def join_cardinality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-join cardinality WITHOUT materializing the join —
    the planner diagnostic for "how big will orders JOIN lineitem
    be, and which key dominates it?".

    For an equi-join, |A JOIN B| = sum over matched keys of
    cntA(k)*cntB(k); so two narrow per-key count aggregations and a
    join of the COUNT TABLES (each far smaller than its input)
    deliver the exact answer plus the hot-key decomposition. At
    100 TB this is the pre-flight you run before the real join: the
    count-table join is orders of magnitude cheaper than the join it
    predicts, and ``max_contrib`` directly identifies the skew key a
    salted plan would split. All outputs are exact integers.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    a = orders.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count("*").alias("cnt_a")
    )
    b = lineitem.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count("*").alias("cnt_b")
    )
    matched = a.join(b, "k").select(
        "k", (F.col("cnt_a") * F.col("cnt_b")).alias("contrib")
    )
    hot = matched.agg(F.max("contrib").alias("max_contrib"))
    hot_key = (
        matched.join(hot, matched.contrib == hot.max_contrib)
        .agg(F.min("k").alias("hot_key"))
    )
    stats = matched.agg(
        F.count("*").alias("n_matched_keys"),
        F.sum("contrib").alias("join_rows"),
    )
    totals = a.agg(F.count("*").alias("n_keys_orders")).crossJoin(
        b.agg(F.count("*").alias("n_keys_lineitem"))
    )
    return (
        totals.crossJoin(stats)
        .crossJoin(hot.crossJoin(hot_key))
        .select(
            "n_keys_orders",
            "n_keys_lineitem",
            "n_matched_keys",
            "join_rows",
            "max_contrib",
            "hot_key",
        )
    )


JOIN_CARDINALITY_ORACLE = """
WITH a AS (
  SELECT o_orderkey AS k, count(*) AS cnt_a FROM orders GROUP BY 1
), b AS (
  SELECT l_orderkey AS k, count(*) AS cnt_b FROM lineitem GROUP BY 1
), matched AS (
  SELECT a.k, a.cnt_a * b.cnt_b AS contrib FROM a JOIN b USING (k)
)
SELECT (SELECT count(*) FROM a) AS n_keys_orders,
       (SELECT count(*) FROM b) AS n_keys_lineitem,
       count(*) AS n_matched_keys,
       CAST(sum(contrib) AS BIGINT) AS join_rows,
       max(contrib) AS max_contrib,
       (SELECT min(k) FROM matched
        WHERE contrib = (SELECT max(contrib) FROM matched)) AS hot_key
FROM matched
"""


def bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-user counts per day via Spark 4 bitmap
    aggregation — the scale-out alternative to COUNT(DISTINCT):
    user ids compress into fixed-width per-bucket bitmaps that merge
    associatively map-side, so the shuffle carries |days x buckets|
    bitmap blobs instead of every distinct (day, user) pair, and no
    per-group hash-set state grows with cardinality.

    Two-level plan: (day, bitmap_bucket_number(user)) ->
    bitmap_construct_agg of bit positions, then per-day
    sum(bitmap_count(...)). The oracle recomputes with a plain
    COUNT(DISTINCT), certifying the bitmap pipeline end-to-end.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    per_bucket = (
        ev.select(
            day.alias("day"),
            F.bitmap_bucket_number(F.col("user_id")).alias("bucket"),
            F.bitmap_bit_position(F.col("user_id")).alias("pos"),
        )
        .groupBy("day", "bucket")
        .agg(F.bitmap_construct_agg(F.col("pos")).alias("bm"))
    )
    return (
        per_bucket.groupBy("day")
        .agg(F.sum(F.bitmap_count("bm")).alias("n_users"))
        .orderBy("day")
    )


BITMAP_DISTINCT_ORACLE = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1
ORDER BY day
"""


def gdpr_delete_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten pre-flight: given a deletion cohort
    (customers with deeply negative balances stand in for "users who
    filed erasure requests"), compute the exact cascade footprint
    across the star schema BEFORE rewriting anything — per table:
    total rows, rows to purge, rows kept. The report is what a
    compliance run signs off on, and what sizes the rewrite job.

    Cascade: customer -> their orders -> those orders' lineitems;
    events purge by user id directly. Scale shape: the cohort is tiny
    and broadcasts; the second-level cascade (lineitem) semi-joins on
    the purged ORDER keys, which can be large — that join shuffles on
    l_orderkey, the same key lineitem shuffles on everywhere else
    (exchange reuse applies when run alongside keyed queries). Counts
    only — no row-level data moves to the driver, and the actual
    delete would be a partition-overwrite rewrite of only the files
    the purge set touches.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    doomed = cust.where(F.col("c_acctbal") < -900).select("c_custkey")
    purged_orders = orders.join(
        F.broadcast(doomed), orders.o_custkey == doomed.c_custkey, "left_semi"
    )

    def _report(name: str, total_df: DataFrame, purged_df: DataFrame) -> DataFrame:
        t = total_df.agg(F.count("*").alias("rows_total"))
        p = purged_df.agg(F.count("*").alias("rows_purged"))
        return t.crossJoin(p).select(
            F.lit(name).alias("table_name"), "rows_total", "rows_purged"
        )

    report = (
        _report("customer", cust, cust.where(F.col("c_acctbal") < -900))
        .unionByName(_report("orders", orders, purged_orders))
        .unionByName(
            _report(
                "lineitem",
                lineitem,
                lineitem.join(
                    purged_orders.select("o_orderkey"),
                    lineitem.l_orderkey == F.col("o_orderkey"),
                    "left_semi",
                ),
            )
        )
        .unionByName(
            _report(
                "events",
                events,
                events.join(
                    F.broadcast(doomed),
                    events.user_id == doomed.c_custkey,
                    "left_semi",
                ),
            )
        )
    )
    return report.select(
        "table_name",
        "rows_total",
        "rows_purged",
        (F.col("rows_total") - F.col("rows_purged")).alias("rows_kept"),
    ).orderBy("table_name")


GDPR_CASCADE_ORACLE = """
WITH doomed AS (
  SELECT c_custkey FROM customer WHERE c_acctbal < -900
), purged_orders AS (
  SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM doomed)
), report AS (
  SELECT 'customer' AS table_name,
         (SELECT count(*) FROM customer) AS rows_total,
         (SELECT count(*) FROM doomed) AS rows_purged
  UNION ALL
  SELECT 'orders',
         (SELECT count(*) FROM orders),
         (SELECT count(*) FROM purged_orders)
  UNION ALL
  SELECT 'lineitem',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem
          WHERE l_orderkey IN (SELECT o_orderkey FROM purged_orders))
  UNION ALL
  SELECT 'events',
         (SELECT count(*) FROM events),
         (SELECT count(*) FROM events
          WHERE user_id IN (SELECT c_custkey FROM doomed))
)
SELECT table_name, rows_total, rows_purged,
       rows_total - rows_purged AS rows_kept
FROM report
ORDER BY table_name
"""


def observe_metrics_single_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ metrics via ``df.observe()``: attach named aggregate metrics
    to a REAL query so the scan that produces the business result also
    produces the data-quality counters — one pass, zero extra jobs
    (the production alternative to running dq_constraint_report as a
    second scan of the same table). The business query here is the
    flagship priority/revenue aggregate; the observation collects row
    count, null-key count, and the revenue checksum alongside it.

    The emitted rows are the OBSERVATION (tiny, driver-side by
    design — observation results are accumulator metadata, not data),
    returned as a DataFrame so the oracle can check the counters are
    exactly the aggregates a second scan would have produced.
    """
    from pyspark.sql import Observation

    orders = load_table(spark, sf_dir, "orders")
    obs = Observation("dq")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("null_custkey"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "price_cents_sum"
        ),
    )
    # The business action that triggers the single pass:
    observed.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()
    got = obs.get
    return spark.createDataFrame(
        [
            ("n_rows", int(got["n_rows"])),
            ("null_custkey", int(got["null_custkey"])),
            ("price_cents_sum", int(got["price_cents_sum"])),
        ],
        "metric STRING, value BIGINT",
    ).orderBy("metric")


OBSERVE_METRICS_ORACLE = """
SELECT 'n_rows' AS metric, count(*) AS value FROM orders
UNION ALL
SELECT 'null_custkey',
       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'price_cents_sum',
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
FROM orders
ORDER BY metric
"""


def dataset_card_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card: one row per fixture table with row count and
    column count — the catalog-level inventory a dataset release ships
    (the per-column detail lives in dq_constraint_report; this is the
    table-of-contents layer above it). Ten cheap count aggregates
    unioned lazily; Spark runs them as independent stages.
    """
    from ..catalog import TABLES, load_table

    parts = []
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        parts.append(
            df.agg(
                F.lit(t).alias("table_name"),
                F.count("*").alias("n_rows"),
                F.lit(len(df.columns)).cast("long").alias("n_cols"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("table_name")


_CARD_COLS = {
    "region": 2, "nation": 3, "customer": 5, "supplier": 4, "part": 6,
    "orders": 6, "lineitem": 11, "events": 6, "documents": 5, "embeddings": 3,
}
DATASET_CARD_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{t}' AS table_name, count(*) AS n_rows, "
    f"CAST({c} AS BIGINT) AS n_cols FROM {t}"
    for t, c in _CARD_COLS.items()
) + "\nORDER BY table_name"


def corpus_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed corpus fingerprint: per source, an ADDITIVE
    digest of canonical row hashes (md5 of a '|'-joined canonical
    row → 15 hex digits → int64 → mod-prime → SUM). Addition is
    commutative, so the digest is identical under ANY partitioning,
    row order, or cluster size — two corpus snapshots compare by 7
    rows instead of a full anti-join, and a single changed byte in any
    document moves its source's digest. This is the cheap first tier
    of snapshot diffing (snapshot_diff_cdc is the row-level second
    tier you run only on sources whose digests moved).

    Only exactly-stringifiable columns enter the canonical form (ints
    + strings — never floats, whose formatting differs across
    engines). Scale shape: one map-side combinable aggregate; the
    digest state is 16 bytes per source per task.
    """
    docs = load_table(spark, sf_dir, "documents")
    digest = F.expr(
        "CAST(conv(substr(md5(concat_ws('|', doc_id, lang, source, n_chars, text)),"
        " 1, 15), 16, 10) AS BIGINT) % 1000000007"
    )
    return (
        docs.select("source", digest.alias("d"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("d").alias("digest_sum"))
        .orderBy("source")
    )


CORPUS_FINGERPRINT_ORACLE = """
SELECT source, count(*) AS n_docs,
       CAST(sum(CAST(('0x' || substr(md5(
              concat_ws('|', doc_id, lang, source, n_chars, text)), 1, 15))
            AS BIGINT) % 1000000007) AS BIGINT) AS digest_sum
FROM documents
GROUP BY source
ORDER BY source
"""


QUERIES: dict = {
    "corpus_fingerprint": (corpus_fingerprint, CORPUS_FINGERPRINT_ORACLE),
    "dataset_card_stats": (dataset_card_stats, DATASET_CARD_ORACLE),
    "observe_metrics_single_pass": (observe_metrics_single_pass, OBSERVE_METRICS_ORACLE),
    "gdpr_delete_cascade": (gdpr_delete_cascade, GDPR_CASCADE_ORACLE),
    "dq_constraint_report": (dq_constraint_report, DQ_CONSTRAINT_REPORT_ORACLE),
    "key_skew_report": (key_skew_report, KEY_SKEW_REPORT_ORACLE),
    "join_cardinality_report": (join_cardinality_report, JOIN_CARDINALITY_ORACLE),
    "bitmap_distinct_users": (bitmap_distinct_users, BITMAP_DISTINCT_ORACLE),
}
