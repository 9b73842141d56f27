"""Event-time operators over the ``events`` table (batch formulations).

The reference is batch-only (SURVEY.md §2.10); these are the
north-star time-series extensions: tumbling/sliding window aggregates,
sessionization, JSON property extraction. The streaming formulations
of the same windows live in ``streaming/windows.py`` — the batch
versions double as their correctness oracles.

Timestamps never appear raw in results: window boundaries are
formatted to strings so the Spark (session-TZ UTC) and DuckDB
(naive-UTC) values hash identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

TS_FMT = "yyyy-MM-dd HH:mm:ss"
TS_FMT_US = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def events_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window per event type. date_trunc keeps the
    group key computable map-side — one shuffle of |hours x types|."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), TS_FMT).alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
    )


EVENTS_HOURLY_ORACLE = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 4) AS value_sum
FROM events
GROUP BY 1, 2
"""


def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 2-hour width, 1-hour slide. Spark's ``window()``
    assigns each event to width/slide = 2 windows; the oracle does the
    same assignment by exploding the two candidate window starts."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("value_sum"))
        .select(
            F.date_format(F.col("window.start"), TS_FMT).alias("win_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


EVENTS_SLIDING_ORACLE = """
SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 4) AS value_sum
FROM (
  SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                 date_trunc('hour', ts)]) AS win_start,
         event_type, value
  FROM events
)
GROUP BY 1, 2
"""


def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: per-user sessions split on >30-minute gaps
    (lag + conditional cumsum — the canonical batch formulation).
    Two windows over the same (user_id, ts) partitioning = ONE shuffle;
    Catalyst reuses the exchange."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer-microsecond arithmetic: floors/rounding on seconds
    # would make engines disagree near gap boundaries
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(gap_us.isNull() | (gap_us > 1800 * 1_000_000), 1).otherwise(0)
    sessions = ev.withColumn(
        "session_id", F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            ((F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / F.lit(1_000_000))
            .cast("long")
            .alias("duration_s"),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("duration_s").alias("max_session_s"),
        )
    )


EVENTS_SESSION_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, event_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id, count(*) AS n_events,
         (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS duration_s
  FROM numbered GROUP BY user_id, session_id
)
SELECT user_id, count(*) AS n_sessions, CAST(sum(n_events) AS BIGINT) AS n_events,
       max(duration_s) AS max_session_s
FROM per_session GROUP BY user_id
"""


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Property extraction from the JSON ``props`` column. Uses a
    dialect-portable regex capture (the oracle-parity form); at scale
    with real JSON prefer ``from_json`` with an explicit schema so the
    parse is vectorized and pushdown-friendly."""
    ev = load_table(spark, sf_dir, "events")
    k = F.regexp_extract("props", '"k": ([0-9]+)', 1).cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("k_sum"),
            F.round(F.avg("k"), 4).alias("k_mean"),
        )
    )


EVENTS_JSON_ORACLE = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS k_sum,
       round(avg(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)), 4) AS k_mean
FROM events
GROUP BY event_type
"""


def events_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via the VARIANT type (Spark 4):
    parse_json once into a binary variant, then typed path extraction
    with variant_get — the schema-on-read path for ragged JSON where
    from_json's fixed schema can't be known up front. DuckDB's native
    JSON extraction is the oracle twin.

    Scale: variant parse + path access are vectorized JVM expressions
    (no UDF); the parsed variant column prunes like any other, and at
    100 TB the parse cost amortizes by storing the variant column in
    the table instead of raw strings.
    """
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k") % 2 == 0)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_even"),
            F.sum("k").alias("k_sum"),
            F.max("k").alias("k_max"),
        )
        .orderBy("event_type")
    )


EVENTS_VARIANT_ORACLE = """
SELECT event_type,
       count(*) AS n_even,
       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
       max(CAST(props->>'$.k' AS BIGINT)) AS k_max
FROM events
WHERE CAST(props->>'$.k' AS BIGINT) % 2 = 0
GROUP BY event_type
ORDER BY event_type
"""


def events_topk_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 users per event type by event count — the grouped-top-k
    pattern (window rank over an aggregate, SURVEY.md §2.6 extension)."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.col("n").desc(), F.col("user_id").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("event_type", "user_id", "n", "rank")
    )


EVENTS_TOPK_ORACLE = """
SELECT event_type, user_id, n, CAST(rank AS INT) AS rank
FROM (
  SELECT event_type, user_id, count(*) AS n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY count(*) DESC, user_id ASC) AS rank
  FROM events GROUP BY event_type, user_id
)
WHERE rank <= 3
"""


def asof_join_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the user's latest view at or
    before the purchase timestamp (attribution lookup).

    Spark has no ASOF JOIN operator; the naive range-join formulation
    (join on key + ts <= t, then pick max) explodes quadratically per
    key. The scalable formulation used here is the union-and-carry
    pattern: tag both streams, sort within user (ts, tag — views first
    at equal ts, matching ASOF's >= semantics), and carry the last
    non-null view timestamp forward with last(ignorenulls) over an
    unbounded-preceding window. ONE shuffle on user_id, linear work,
    state = one row per partition — the same shape an
    applyInPandasWithState streaming as-of would use.

    Oracle: DuckDB's native ASOF LEFT JOIN — a true cross-engine
    differential check of as-of semantics (equal-ts matches, unmatched
    purchases -> NULL).
    """
    ev = load_table(spark, sf_dir, "events")
    # dedupe views to one per (user_id, ts) — keep max event_id — so
    # equal-ts ties cannot make the as-of pick engine-dependent
    wv = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    views = (
        ev.filter(F.col("event_type") == "view")
        .withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "ts",
            F.lit(0).alias("tag"),
            F.lit(None).cast("long").alias("p_event_id"),
            F.col("ts").alias("v_ts"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.col("event_id").alias("p_event_id"),
        F.lit(None).cast("timestamp").alias("v_ts"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "tag").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    carried = views.unionByName(purchases).withColumn(
        "asof_view_ts", F.last("v_ts", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("tag") == 1).select(
        F.col("p_event_id").alias("event_id"),
        "user_id",
        F.date_format("ts", TS_FMT_US).alias("purchase_ts"),
        F.date_format("asof_view_ts", TS_FMT_US).alias("view_ts"),
        F.floor(
            (F.unix_micros("ts") - F.unix_micros("asof_view_ts")) / F.lit(1_000_000)
        ).alias("gap_s"),
    )


ASOF_JOIN_ORACLE = """
WITH v0 AS (
  SELECT user_id, ts,
         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'view'
),
v AS (SELECT user_id, ts FROM v0 WHERE rn = 1),
p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
       (epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS gap_s
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
"""


def events_gapfill_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill + resample: purchase events resampled to a dense hourly
    grid — missing hours materialized from a generated time spine
    (sequence + explode), counts zero-filled, the value sum carried
    forward with last(ignorenulls) — the standard
    regularize-an-irregular-series op every feature pipeline needs.

    The spine generates from the aggregate min/max — one tiny row
    exploded to |hours| rows, broadcast-joined against the hourly
    aggregate. The carry-forward window here is a single global order
    (fine for one series); the per-key version partitions the window by
    series key, which is also what keeps it parallel at 100 TB (one
    series' spine per key, never a global sort of all points).
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("vs"),
    )
    bounds = ev.select(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("h")
    )
    w = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        spine.join(hourly, "h", "left")
        .select(
            F.date_format("h", TS_FMT).alias("hour_start"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.round(F.last("vs", ignorenulls=True).over(w), 4).alias("value_carry"),
        )
    )


EVENTS_GAPFILL_ORACLE = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, count(*) AS n, round(sum(value), 4) AS vs
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
b AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events WHERE event_type = 'purchase'
),
spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b)
SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_start,
       coalesce(n, 0) AS n_events,
       round(last_value(vs IGNORE NULLS) OVER (
         ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS value_carry
FROM spine LEFT JOIN hourly USING (h)
"""


def events_trailing_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range window frame: per-user trailing 1-hour activity at
    every event — rangeBetween(-3_600_000_000 µs, current) over exact
    epoch MICROseconds, a frame rowsBetween cannot express when
    events are irregularly spaced.

    Range frames include all peer rows of the current order value on
    both engines, so duplicate timestamps cannot split the frame.
    Scale: one shuffle on user_id; the frame scan is a per-partition
    sliding pointer, O(n) per user, state bounded by the hour width.

    The order key is exact epoch MICROseconds (`unix_micros` /
    DuckDB `epoch_us`), frame -3.6e9 µs: second-granularity keys
    truncate sub-second timestamps, and Spark's `unix_timestamp`
    FLOORS where DuckDB's `epoch(ts)::BIGINT` ROUNDS — at sf0.1 two
    events sat exactly astride that disagreement (first caught by the
    round-7 sf0.1 differential sweep). Integer micros leave nothing
    to round on either engine.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "epoch", F.unix_micros("ts")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch")
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.count("*").over(w).alias("n_trailing_1h"),
            F.round(F.sum("value").over(w), 4).alias("sum_trailing_1h"),
        )
        .orderBy("event_id")
    )


EVENTS_RANGE_WINDOW_ORACLE = """
SELECT event_id, user_id,
       count(*) OVER w AS n_trailing_1h,
       round(sum(value) OVER w, 4) AS sum_trailing_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: view -> click -> purchase, each stage strictly
    after the previous, per user — product-analytics' core query.

    Formulated as conditional per-user aggregates in ONE pass: the
    earliest view, the earliest click AFTER that view, the earliest
    purchase AFTER that click cannot be three self-joins at 100 TB —
    instead stage 1 is a plain min, and stages 2-3 come from one
    grouped collect of (type, ts) pairs filtered with array HOFs.
    One shuffle on user_id; no self-join of the event stream.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("event_type").isin("click", "purchase"),
                    F.struct("ts", "event_type"),
                )
            )
        ).alias("later"),
    )
    t_click = F.array_min(
        F.transform(
            F.filter(
                "later",
                lambda s: (s["event_type"] == "click") & (s["ts"] > F.col("t_view")),
            ),
            lambda s: s["ts"],
        )
    )
    per_user2 = per_user.select("user_id", "t_view", t_click.alias("t_click"), "later")
    t_buy = F.array_min(
        F.transform(
            F.filter(
                "later",
                lambda s: (s["event_type"] == "purchase") & (s["ts"] > F.col("t_click")),
            ),
            lambda s: s["ts"],
        )
    )
    stages = per_user2.select(
        "user_id", "t_view", "t_click", t_buy.alias("t_buy")
    )
    return stages.agg(
        F.count("*").alias("n_users"),
        F.count("t_view").alias("reached_view"),
        F.count("t_click").alias("reached_click"),
        F.count("t_buy").alias("reached_purchase"),
        F.round(F.count("t_buy") / F.count("t_view"), 4).alias("view_to_purchase_rate"),
    )


EVENTS_FUNNEL_ORACLE = """
WITH v AS (
    SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
    FROM events GROUP BY user_id),
c AS (
    SELECT e.user_id, min(e.ts) AS t_click
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND e.ts > v.t_view
    GROUP BY e.user_id),
p AS (
    SELECT e.user_id, min(e.ts) AS t_buy
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c.t_click
    GROUP BY e.user_id)
SELECT count(*) AS n_users,
       count(t_view) AS reached_view,
       count(t_click) AS reached_click,
       count(t_buy) AS reached_purchase,
       round(count(t_buy) / count(t_view), 4) AS view_to_purchase_rate
FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
"""


def retention_cohort_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day,
    retention = distinct active users at day offsets 0..7 over cohort
    size — product analytics' second core query after the funnel.

    Shape: one distinct over (user_id, day) (shuffle on the pair),
    per-user min reusing the user partitioning, then a join back on
    user_id and two small aggregates. ``cohort_sizes`` is |days| rows —
    broadcast. No self-join of the raw event stream; the event table is
    scanned once.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    days = ev.distinct()
    cohort = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    act = (
        days.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
        )
        .where(F.col("day_offset") <= 7)
    )
    cohort_sizes = cohort.groupBy("cohort_day").agg(
        F.countDistinct("user_id").alias("cohort_size")
    )
    mat = act.groupBy("cohort_day", "day_offset").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    return (
        mat.join(F.broadcast(cohort_sizes), "cohort_day")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 4).alias("retention"),
        )
        .orderBy("cohort_day", "day_offset")
    )


RETENTION_COHORT_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), cohort AS (
  SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id
), act AS (
  SELECT d.user_id, c.cohort_day,
         date_diff('day', c.cohort_day, d.day) AS day_offset
  FROM days d JOIN cohort c USING (user_id)
  WHERE date_diff('day', c.cohort_day, d.day) <= 7
), sizes AS (
  SELECT cohort_day, count(DISTINCT user_id) AS cohort_size
  FROM cohort GROUP BY cohort_day
)
SELECT strftime(a.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(a.day_offset AS BIGINT) AS day_offset,
       count(DISTINCT a.user_id) AS n_active,
       s.cohort_size,
       round(count(DISTINCT a.user_id) / s.cohort_size, 4) AS retention
FROM act a JOIN sizes s USING (cohort_day)
GROUP BY a.cohort_day, a.day_offset, s.cohort_size
ORDER BY 1, 2
"""


def interval_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent intervals per event type (sweep line): each
    event opens a half-open 5-minute interval [ts, ts+300s); the peak
    is the max of the running sum over +1/-1 boundary points ordered by
    (t, delta) — delta -1 sorts first so an interval ending exactly
    when another starts never counts as overlap.

    The sweep is a single window per event_type (one shuffle); the
    boundary-point explode is map-side and exactly doubles the rows.
    At 100 TB with few types the per-type partition serializes — shard
    the sweep by (type, day) and stitch boundary offsets if type
    cardinality is that low; fixture types are the honest demo.
    Ties at identical (t, delta) rows are interchangeable, so the
    running-value multiset — and hence max and argmin-t — is
    deterministic.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    pts = ev.select(
        "event_type",
        F.explode(
            F.array(
                F.struct(F.unix_micros("ts").alias("t"), F.lit(1).alias("delta")),
                F.struct(
                    (F.unix_micros("ts") + 300 * 1_000_000).alias("t"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("p"),
    ).select("event_type", "p.t", "p.delta")
    w = Window.partitionBy("event_type").orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, 0
    )
    run = pts.withColumn("running", F.sum("delta").over(w))
    peak = run.groupBy("event_type").agg(F.max("running").alias("peak_concurrency"))
    return (
        run.join(F.broadcast(peak), "event_type")
        .where(F.col("running") == F.col("peak_concurrency"))
        .groupBy("event_type", "peak_concurrency")
        .agg(F.min("t").alias("peak_t"))
        .select(
            "event_type",
            F.col("peak_concurrency").cast("long").alias("peak_concurrency"),
            F.date_format(F.timestamp_micros(F.col("peak_t")), TS_FMT_US).alias(
                "peak_at"
            ),
        )
        .orderBy("event_type")
    )


INTERVAL_CONCURRENCY_ORACLE = """
WITH pts AS (
  SELECT event_type, epoch_us(ts) AS t, 1 AS delta FROM events
  UNION ALL
  SELECT event_type, epoch_us(ts) + 300000000 AS t, -1 AS delta FROM events
), run AS (
  SELECT event_type, t,
         sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS running
  FROM pts
), peak AS (
  SELECT event_type, max(running) AS peak_concurrency
  FROM run GROUP BY event_type
)
SELECT r.event_type,
       CAST(p.peak_concurrency AS BIGINT) AS peak_concurrency,
       strftime(make_timestamp(min(r.t)), '%Y-%m-%d %H:%M:%S.%f') AS peak_at
FROM run r
JOIN peak p ON r.event_type = p.event_type AND r.running = p.peak_concurrency
GROUP BY r.event_type, p.peak_concurrency
ORDER BY r.event_type
"""


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing z-score anomaly detection on hourly event volumes:
    each (type, hour) count is scored against the mean/stddev of the
    PRIOR 24 hourly counts (rowsBetween(-24, -1) — the current hour
    never contaminates its own baseline), flagged when |z| > 3.

    Hours are pre-aggregated (groupBy shrinks the stream to
    |types × hours| before any window), so the window state is tiny;
    one shuffle on event_type. Hours needing < 12 prior observations
    are suppressed — a cold-start rule both engines apply identically.
    """
    ev = load_table(spark, sf_dir, "events")
    hours = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("hour").rowsBetween(-24, -1)
    stats = hours.select(
        "event_type",
        "hour",
        "cnt",
        F.avg("cnt").over(w).alias("mu"),
        F.stddev_samp("cnt").over(w).alias("sigma"),
        F.count("cnt").over(w).alias("n_prior"),
    )
    z = F.when(F.col("sigma") > 0, (F.col("cnt") - F.col("mu")) / F.col("sigma"))
    return (
        stats.where(F.col("n_prior") >= 12)
        .select(
            "event_type",
            F.date_format("hour", TS_FMT).alias("hour"),
            "cnt",
            F.round(z, 4).alias("zscore"),
            F.coalesce(F.abs(z) > 3, F.lit(False)).alias("is_anomaly"),
        )
        .orderBy("event_type", "hour")
    )


EVENTS_ANOMALY_ORACLE = """
WITH hours AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS cnt
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type, hour, cnt,
         avg(cnt) OVER w AS mu,
         stddev_samp(cnt) OVER w AS sigma,
         count(cnt) OVER w AS n_prior
  FROM hours
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type,
       strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
       cnt,
       round(CASE WHEN sigma > 0 THEN (cnt - mu) / sigma END, 4) AS zscore,
       COALESCE(CASE WHEN sigma > 0 THEN abs((cnt - mu) / sigma) > 3 END, FALSE)
         AS is_anomaly
FROM stats
WHERE n_prior >= 12
ORDER BY event_type, hour
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: for each (state -> next_state) pair, the transition
    count and probability. The input to any sequence model / funnel
    simulator built on clickstream data.

    lead() over (user_id ORDER BY ts, event_id) pairs each event with
    its successor — ONE shuffle on user_id, the same partitioning
    sessionization uses (exchange-reusable when run together). The
    pair-count aggregation is map-side combinable on the tiny
    |types|^2 key space, and the per-state probability denominator is
    a broadcast-size window over that aggregate, not the raw stream.
    Probability is count/count division of exact integers, rounded
    once — no float accumulation, so bit-identical across engines.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_state"),
        F.lead("event_type").over(w).alias("to_state"),
    ).where(F.col("to_state").isNotNull())
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count("*").alias("n_transitions")
    )
    denom = Window.partitionBy("from_state")
    return counts.select(
        "from_state",
        "to_state",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(denom), 4
        ).alias("prob"),
    ).orderBy("from_state", "to_state")


EVENT_TRANSITION_ORACLE = """
WITH pairs AS (
  SELECT event_type AS from_state,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_state
  FROM events
), counts AS (
  SELECT from_state, to_state, count(*) AS n_transitions
  FROM pairs WHERE to_state IS NOT NULL
  GROUP BY from_state, to_state
)
SELECT from_state, to_state, n_transitions,
       round(n_transitions * 1.0 /
             sum(n_transitions) OVER (PARTITION BY from_state), 4) AS prob
FROM counts
ORDER BY from_state, to_state
"""


def purchase_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the latest
    non-purchase event by the same user in the preceding hour; output
    is purchases-per-touch-channel (plus '(none)' for organic
    purchases with no preceding touch).

    Shape: a time-bounded self-join on user_id (purchases x prior
    events within [ts-1h, ts)), then row_number to keep the latest
    touch per purchase. The 1-hour bound is what makes this scale —
    per-user state in the join is bounded by an hour of events, the
    same bound the streaming interval join uses, and AQE handles
    hot users via skew-join splitting. Deterministic tiebreak
    (ts DESC, event_id DESC) pins ties exactly like the oracle.
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    touches = ev.where(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("touch_type"),
    )
    joined = purchases.join(
        touches,
        (F.col("p_user") == F.col("t_user"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    w = Window.partitionBy("p_id").orderBy(
        F.col("t_ts").desc_nulls_last(), F.col("t_id").desc_nulls_last()
    )
    last_touch = (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.coalesce("touch_type", F.lit("(none)")).alias("touch_type"))
    )
    return (
        last_touch.groupBy("touch_type")
        .agg(F.count("*").alias("n_purchases"))
        .orderBy("touch_type")
    )


PURCHASE_ATTRIBUTION_ORACLE = """
WITH purchases AS (
  SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts
  FROM events WHERE event_type = 'purchase'
), touches AS (
  SELECT user_id AS t_user, ts AS t_ts, event_id AS t_id,
         event_type AS touch_type
  FROM events WHERE event_type <> 'purchase'
), joined AS (
  SELECT p.p_id, t.touch_type, t.t_ts, t.t_id,
         row_number() OVER (PARTITION BY p.p_id
                            ORDER BY t.t_ts DESC NULLS LAST,
                                     t.t_id DESC NULLS LAST) AS rn
  FROM purchases p
  LEFT JOIN touches t
    ON p.p_user = t.t_user
   AND t.t_ts < p.p_ts
   AND t.t_ts >= p.p_ts - INTERVAL 1 HOUR
)
SELECT COALESCE(touch_type, '(none)') AS touch_type,
       count(*) AS n_purchases
FROM joined WHERE rn = 1
GROUP BY 1
ORDER BY touch_type
"""


def mad_outlier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: median + MAD (median
    absolute deviation) baseline, flag |x - med| > 3*MAD. The robust
    alternative to the z-score gate (``events_anomaly_zscore``) —
    immune to the outliers it is hunting, which mean/std are not.

    Two exact-percentile aggregation passes (median, then median of
    deviations) with a broadcast join of the tiny per-type baseline
    between them; the outlier count is a conditional agg in the second
    pass's plan. Exact medians (interpolated) are deterministic
    arithmetic over the same doubles in both engines; every comparison
    is per-row with no float accumulation anywhere.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad"),
        F.first("med").alias("med"),
        F.count("*").alias("n"),
    )
    flagged = dev.join(
        F.broadcast(mad.select("event_type", "mad")), "event_type"
    ).groupBy("event_type").agg(
        F.count(F.when(F.col("adev") > 3 * F.col("mad"), 1)).alias("n_outliers")
    )
    return (
        mad.join(flagged, "event_type")
        .select(
            "event_type",
            "n",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            "n_outliers",
        )
        .orderBy("event_type")
    )


MAD_OUTLIER_ORACLE = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med, count(*) AS n
  FROM events GROUP BY event_type
), dev AS (
  SELECT e.event_type, abs(e.value - m.med) AS adev, m.med, m.n
  FROM events e JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad,
         min(med) AS med, min(n) AS n
  FROM dev GROUP BY event_type
)
SELECT d.event_type, CAST(min(d.n) AS BIGINT) AS n,
       round(min(d.med), 4) AS med, round(min(m.mad), 4) AS mad,
       count(CASE WHEN d.adev > 3 * m.mad THEN 1 END) AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
ORDER BY event_type
"""


def m4_downsample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling: per (event_type, hour bucket) keep
    min/max/first/last of the value — the standard error-free
    reduction for rendering: M4 per pixel-column reproduces the exact
    visual envelope of the full series at any zoom that maps a bucket
    to a pixel.

    first/last are pinned by row_number over (ts, event_id) inside the
    bucket — deterministic under ties, identical in both engines —
    and min/max ride the same single window-then-aggregate pass: ONE
    shuffle on (type, bucket), output |buckets| rows regardless of
    input size.
    """
    ev = load_table(spark, sf_dir, "events")
    bucket = F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
    w = Window.partitionBy("event_type", "bucket").orderBy("ts", "event_id")
    rows = ev.select(
        "event_type", bucket.alias("bucket"), "ts", "event_id", "value"
    ).withColumn("rn", F.row_number().over(w)).withColumn(
        "n_in_bucket", F.count("*").over(Window.partitionBy("event_type", "bucket"))
    )
    return (
        rows.groupBy("event_type", "bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 4).alias("v_min"),
            F.round(F.max("value"), 4).alias("v_max"),
            F.round(
                F.max(F.when(F.col("rn") == 1, F.col("value"))), 4
            ).alias("v_first"),
            F.round(
                F.max(F.when(F.col("rn") == F.col("n_in_bucket"), F.col("value"))), 4
            ).alias("v_last"),
        )
        .orderBy("event_type", "bucket")
    )


M4_DOWNSAMPLE_ORACLE = """
WITH rows_ AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
         value,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type, date_trunc('hour', ts))
           AS n_in_bucket
  FROM events
)
SELECT event_type, bucket, count(*) AS n,
       round(min(value), 4) AS v_min,
       round(max(value), 4) AS v_max,
       round(max(CASE WHEN rn = 1 THEN value END), 4) AS v_first,
       round(max(CASE WHEN rn = n_in_bucket THEN value END), 4) AS v_last
FROM rows_
GROUP BY event_type, bucket
ORDER BY event_type, bucket
"""


def hierarchical_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate rollup: DAY-level stats computed FROM the
    HOUR-level partial aggregates, never re-touching raw events — the
    hypertable/materialized-rollup maintenance pattern. At 100 TB the
    hour partials are what you persist; day/week/month views fold the
    partials (|hours| rows) instead of rescanning the fact table.

    Correctness hinges on every measure being algebraic: counts and
    int64-e4 value sums merge exactly; min/max merge; the day average
    derives from (sum, count) at the end. The oracle recomputes the
    day level DIRECTLY from raw events, so the driver's hash check
    certifies the two-level fold == single-level truth.
    """
    ev = load_table(spark, sf_dir, "events")
    hour = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr("CAST(round(value * 10000) AS BIGINT)")).alias("v_e4"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
        )
    )
    return (
        hour.groupBy(
            F.date_format(F.date_trunc("day", "hour"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.round(F.sum("v_e4") / 10000.0, 4).alias("value_sum"),
            # truncated-to-e4 average: integer division is exact and
            # engine-identical (a float quotient rounded to 4 decimals
            # can split a .5 ulp boundary between engines — observed)
            (F.expr("sum(v_e4) div sum(n)") / 10000.0).alias("value_avg"),
            F.min("v_min").alias("value_min"),
            F.max("v_max").alias("value_max"),
        )
        .orderBy("day", "event_type")
    )


def frequent_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most frequent 3-event paths across per-user streams —
    sequence-pattern mining lite (the "common journeys" query behind
    funnel design).

    Two lead() calls over ONE (user_id, ts, event_id) window pair each
    event with its two successors — the same single shuffle the
    transition matrix uses — then a map-side-combinable count on the
    tiny |types|^3 path space and a TakeOrdered top-10 (no global
    sort). Deterministic tiebreak: count desc, path asc.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = ev.select(
        F.concat_ws(
            ">",
            "event_type",
            F.lead("event_type", 1).over(w),
            F.lead("event_type", 2).over(w),
        ).alias("path"),
        F.lead("event_type", 2).over(w).alias("_third"),
    ).where(F.col("_third").isNotNull())
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(10)
    )


FREQUENT_PATHS_ORACLE = """
WITH seq AS (
  SELECT event_type AS t0,
         lead(event_type, 1) OVER w AS t1,
         lead(event_type, 2) OVER w AS t2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT t0 || '>' || t1 || '>' || t2 AS path, count(*) AS n
FROM seq WHERE t2 IS NOT NULL
GROUP BY 1
ORDER BY n DESC, path ASC
LIMIT 10
"""


HIERARCHICAL_ROLLUP_ORACLE = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
             / 10000.0, 4) AS value_sum,
       (CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) // count(*))
             / 10000.0 AS value_avg,
       min(value) AS value_min,
       max(value) AS value_max
FROM events
GROUP BY 1, 2
ORDER BY day, event_type
"""


def inter_event_time_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time distribution per event type — the traffic
    model behind capacity planning and session-gap tuning (the 30-min
    gap in ``events_sessionization`` should come FROM this
    distribution, not folklore).

    Gaps are computed per user stream (lag over a user-keyed window —
    never a global ordering) in exact integer microseconds, then
    rolled up by the type of the LATER event. Medians can land on
    k+0.5 for even counts, so the median ships doubled and cast to
    int64 (exact); p95 interpolates to arbitrary fractions and is
    rounded like every other reported ratio. One user-keyed shuffle +
    one 5-key rollup; both partial-aggregate map-side.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = (
        ev.select(
            "user_id",
            "event_type",
            "event_id",
            F.unix_micros("ts").alias("us"),
        )
        .withColumn("gap_us", F.col("us") - F.lag("us").over(w))
        .where(F.col("gap_us").isNotNull())
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("*").alias("n_gaps"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
            (F.expr("percentile(gap_us, 0.5)") * 2).cast("long").alias("median_x2_us"),
            F.round(F.expr("percentile(gap_us, 0.95)"), 4).alias("p95_gap_us"),
        )
        .orderBy("event_type")
    )


INTER_EVENT_ORACLE = """
WITH gaps AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT event_type, count(*) AS n_gaps,
       min(gap_us) AS min_gap_us,
       max(gap_us) AS max_gap_us,
       CAST(quantile_cont(gap_us, 0.5) * 2 AS BIGINT) AS median_x2_us,
       round(quantile_cont(gap_us, 0.95), 4) AS p95_gap_us
FROM gaps
WHERE gap_us IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


def user_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per day, how many NEVER-before-seen users
    appeared, and the cumulative registered-user curve — the product
    metric behind every "daily new vs returning" dashboard.

    First-seen day is a user-keyed min aggregation (one shuffle,
    map-side combinable — the corpus never materializes per-day
    distinct sets, which is what makes this scale: a naive
    count-distinct-per-cumulative-window recomputes every prefix).
    The cumulative sum then runs over the per-DAY table — calendar
    cardinality, i.e. metadata scale (a 10-year history is ~3.7k
    rows), so the unpartitioned running-total window is fine at any
    corpus size.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    first_seen = (
        ev.select(day.alias("day"), "user_id")
        .groupBy("user_id")
        .agg(F.min("day").alias("first_day"))
    )
    daily = first_seen.groupBy("first_day").agg(F.count("*").alias("n_new"))
    w = Window.orderBy("first_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        daily.select(
            F.col("first_day").alias("day"),
            "n_new",
            F.sum("n_new").over(w).cast("long").alias("cum_users"),
        )
        .orderBy("day")
    )


USER_GROWTH_ORACLE = """
WITH first_seen AS (
  SELECT user_id,
         min(strftime(date_trunc('day', ts), '%Y-%m-%d')) AS first_day
  FROM events GROUP BY user_id
), daily AS (
  SELECT first_day AS day, count(*) AS n_new FROM first_seen GROUP BY first_day
)
SELECT day, n_new,
       CAST(sum(n_new) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_users
FROM daily
ORDER BY day
"""

# Shared Spark/DuckDB decay schedule: 10-minute age buckets inside the
# 1-hour attribution horizon, halving credit per bucket (32..1).
_DECAY_CASE = (
    "CASE age_bucket WHEN 0 THEN 32 WHEN 1 THEN 16 WHEN 2 THEN 8 "
    "WHEN 3 THEN 4 WHEN 4 THEN 2 ELSE 1 END"
)


def multi_touch_attribution_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution: every view/click in the
    hour before a purchase earns credit halved per 10 minutes of age
    (32 for <10 min ... 1 for 50-60 min) — the standard alternative to
    winner-takes-all (``purchase_attribution_last_touch``) when several
    touchpoints deserve partial credit.

    All credits are small integers from a shared CASE schedule, so
    totals are exact int64 on both engines. Scale shape: one banded
    self-join shuffled on user_id with the 1-hour horizon bounding
    fan-in per purchase (same shape as the last-touch operator), then
    a 2-key rollup.
    """
    ev = load_table(spark, sf_dir, "events")
    hour_us = 3_600_000_000
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", F.unix_micros("ts").alias("pus"))
    )
    touches = (
        ev.where(F.col("event_type").isin("view", "click"))
        .select("user_id", F.col("event_type").alias("touch_type"),
                F.unix_micros("ts").alias("tus"))
    )
    joined = purchases.join(touches, "user_id").where(
        (F.col("tus") < F.col("pus"))
        & (F.col("pus") - F.col("tus") <= F.lit(hour_us))
    )
    credited = joined.withColumn(
        "age_bucket", F.floor((F.col("pus") - F.col("tus")) / F.lit(600_000_000))
    ).withColumn("credit", F.expr(_DECAY_CASE).cast("long"))
    return (
        credited.groupBy("touch_type")
        .agg(
            F.count("*").alias("n_touches"),
            F.sum("credit").cast("long").alias("total_credit"),
        )
        .orderBy("touch_type")
    )


MULTI_TOUCH_ORACLE = f"""
WITH purchases AS (
  SELECT user_id, epoch_us(ts) AS pus FROM events WHERE event_type = 'purchase'
), touches AS (
  SELECT user_id, event_type AS touch_type, epoch_us(ts) AS tus
  FROM events WHERE event_type IN ('view', 'click')
), credited AS (
  SELECT t.touch_type,
         CAST(floor((p.pus - t.tus) / 600000000) AS BIGINT) AS age_bucket
  FROM purchases p JOIN touches t ON p.user_id = t.user_id
  WHERE t.tus < p.pus AND p.pus - t.tus <= 3600000000
)
SELECT touch_type, count(*) AS n_touches,
       CAST(sum({_DECAY_CASE}) AS BIGINT) AS total_credit
FROM credited
GROUP BY touch_type
ORDER BY touch_type
"""


def time_to_first_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activation-lag cohort report: per first-seen-day cohort, how
    long users took from their first event to their first purchase —
    the onboarding metric every growth team tracks (and the batch twin
    of a streaming activation funnel).

    One user-keyed aggregate computes both firsts (min ts, conditional
    min ts) in a single pass — no self-join, no window; the lag is
    exact integer hours from the microsecond difference. Cohort
    rollup: converted count, doubled-median lag (exact under k+0.5),
    max lag. Users who never purchase count in ``n_users`` but not in
    the lag stats (NULL-skipping aggregates, mirrored in the oracle).
    """
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ev"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    lag_h = (
        (F.unix_micros("first_purchase") - F.unix_micros("first_ev"))
        / F.lit(3_600_000_000)
    )
    cohorts = firsts.select(
        F.date_format(F.date_trunc("day", "first_ev"), "yyyy-MM-dd").alias(
            "cohort_day"
        ),
        F.floor(lag_h).cast("long").alias("lag_hours"),
    )
    return (
        cohorts.groupBy("cohort_day")
        .agg(
            F.count("*").alias("n_users"),
            F.count("lag_hours").alias("n_converted"),
            (F.expr("percentile(lag_hours, 0.5)") * 2)
            .cast("long")
            .alias("median_x2_hours"),
            F.max("lag_hours").alias("max_hours"),
        )
        .orderBy("cohort_day")
    )


TIME_TO_PURCHASE_ORACLE = """
WITH firsts AS (
  SELECT user_id, min(ts) AS first_ev,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY user_id
), cohorts AS (
  SELECT strftime(date_trunc('day', first_ev), '%Y-%m-%d') AS cohort_day,
         CAST(floor((epoch_us(first_purchase) - epoch_us(first_ev))
                    / 3600000000.0) AS BIGINT) AS lag_hours
  FROM firsts
)
SELECT cohort_day, count(*) AS n_users,
       count(lag_hours) AS n_converted,
       CAST(quantile_cont(lag_hours, 0.5) * 2 AS BIGINT) AS median_x2_hours,
       max(lag_hours) AS max_hours
FROM cohorts
GROUP BY cohort_day
ORDER BY cohort_day
"""


RECURSIVE_SPINE_SPARK_SQL = """
WITH RECURSIVE bounds AS (
  SELECT CAST(date_trunc('day', min(ts)) AS DATE) AS d0,
         CAST(date_trunc('day', max(ts)) AS DATE) AS d1
  FROM _spine_events
), spine(day, d1) AS (
  SELECT d0, d1 FROM bounds
  UNION ALL
  SELECT date_add(day, 1), d1 FROM spine WHERE day < d1
), daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n
  FROM _spine_events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT date_format(s.day, 'yyyy-MM-dd') AS day,
       CAST(coalesce(d.n, 0) AS BIGINT) AS n_purchases
FROM spine s LEFT JOIN daily d ON s.day = d.day
ORDER BY day
"""


def recursive_spine_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily purchase series via a RECURSIVE CTE date spine —
    Spark 4's `WITH RECURSIVE` exercised on its canonical use (the
    other gap-filler, ``events_gapfill_resample``, generates its spine
    with sequence+explode; this one pins that the recursive-SQL front
    door produces the identical series, checked against DuckDB's own
    recursive CTE).

    Scale note: recursion depth = calendar days (metadata scale —
    ~3.7k iterations for a 10-year history), and each step carries
    one row; the event table itself is touched only by the ordinary
    daily aggregate. Recursion over DATA-scale relations stays out of
    this codebase — the iterative operators (connected components,
    Lloyd rounds, PageRank) use persisted DataFrame loops instead,
    where each round is a full parallel job.
    """
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_spine_events")
    return spark.sql(RECURSIVE_SPINE_SPARK_SQL)


RECURSIVE_SPINE_ORACLE = """
WITH RECURSIVE bounds AS (
  SELECT CAST(date_trunc('day', min(ts)) AS DATE) AS d0,
         CAST(date_trunc('day', max(ts)) AS DATE) AS d1
  FROM events
), spine(day, d1) AS (
  SELECT d0, d1 FROM bounds
  UNION ALL
  SELECT CAST(day + INTERVAL 1 DAY AS DATE), d1 FROM spine WHERE day < d1
), daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT strftime(s.day, '%Y-%m-%d') AS day,
       CAST(coalesce(d.n, 0) AS BIGINT) AS n_purchases
FROM spine s LEFT JOIN daily d ON s.day = d.day
ORDER BY day
"""


def late_event_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark lateness audit (batch replay): treat ``event_id`` as
    the arrival order, replay a 10-minute watermark (running max event
    time seen so far, minus 10 min) over the stream, and count per
    event type how many events would arrive BEHIND it — the offline
    audit that sizes a Structured Streaming watermark before anyone
    ships it (streaming/windows.py holds the online operators this
    calibrates).

    Scale shape: a two-phase distributed prefix max — but unlike the
    ks_drift_test pattern, the bucket id here is ARITHMETIC on the key
    (event_id scaled by the broadcast max), not spark_partition_id()
    over a range exchange: the prefix's local and offset branches must
    agree on every row's bucket, and a re-executed range exchange
    re-SAMPLES its boundaries (observed flaking once at sf0.01), while
    a data-derived bucket is identical in both branches by
    construction, whatever the physical partitioning does. Local
    running max per bucket, broadcast ≤ n_part per-bucket offset
    maxima, then one map-side combinable groupBy.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    bounds = ev.agg(F.max("event_id").alias("max_id"))
    ranged = ev.crossJoin(F.broadcast(bounds)).withColumn(
        "_pid",
        (F.col("event_id") / (F.col("max_id") + 1) * n_part).cast("int"),
    )
    w_loc = (
        Window.partitionBy("_pid")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_prev = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off = (
        ranged.groupBy("_pid")
        .agg(F.max("ts_us").alias("pmax"))
        .select("_pid", F.max("pmax").over(w_prev).alias("off_max"))
    )
    flagged = (
        ranged.withColumn("loc_max", F.max("ts_us").over(w_loc))
        .join(F.broadcast(off), "_pid")
        .withColumn("wm", F.greatest("loc_max", "off_max") - F.lit(600_000_000))
        .withColumn(
            "is_late", (F.col("wm").isNotNull() & (F.col("ts_us") < F.col("wm"))).cast("long")
        )
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("is_late").alias("n_late"),
            F.round(F.sum("is_late") / F.count("*"), 4).alias("late_frac"),
        )
        .orderBy("event_type")
    )


LATE_EVENT_ORACLE = """
WITH flagged AS (
  SELECT event_type,
         CASE WHEN epoch_us(ts) <
                max(epoch_us(ts)) OVER (ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                - 600000000
              THEN 1 ELSE 0 END AS is_late
  FROM events
)
SELECT event_type, count(*) AS n_events,
       CAST(sum(is_late) AS BIGINT) AS n_late,
       round(CAST(sum(is_late) AS BIGINT) / count(*), 4) AS late_frac
FROM flagged GROUP BY event_type ORDER BY event_type
"""


def asof_nearest_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join with tolerance — the third pandas
    ``merge_asof`` direction (backward lives in asof_join_purchase_view,
    forward in asof_forward_tolerance): for each view event, the
    purchase by the same user CLOSEST in time within ±6 h, ties to the
    earlier side (pandas' rule). Completes the as-of trio, so a pandas
    user can port any merge_asof call.

    Scale shape: ONE shuffle on user_id feeds two carries over the
    same partitioning — ascending scan carries the previous purchase,
    descending scan carries the next (each is a sort within the
    already-exchanged partitions, no second exchange) — and a final
    projection picks the smaller |gap|. No range join, no per-row
    probe.
    """
    ev = load_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", F.unix_micros("ts").alias("tsu"), F.lit(0).alias("is_p")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        F.unix_micros("ts").alias("tsu"),
        F.lit(1).alias("is_p"),
    )
    tagged = views.unionByName(purchases).repartition("user_id")
    # Ascending scan: purchases sort BEFORE views at equal timestamps
    # (is_p desc) so an exact-time match lands on the backward side —
    # pandas merge_asof includes exact matches; the forward scan keeps
    # them excluded (strictly-after) to avoid double-casting the tie.
    w_back = (
        Window.partitionBy("user_id")
        .orderBy(F.col("tsu").asc(), F.col("is_p").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(F.col("tsu").desc(), F.col("is_p").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tol = 21_600_000_000
    carried = tagged.withColumn(
        "prev_ts", F.last(F.when(F.col("is_p") == 1, F.col("tsu")), True).over(w_back)
    ).withColumn(
        "next_ts", F.last(F.when(F.col("is_p") == 1, F.col("tsu")), True).over(w_fwd)
    )
    prev_gap = F.col("tsu") - F.col("prev_ts")
    next_gap = F.col("next_ts") - F.col("tsu")
    prev_ok = F.col("prev_ts").isNotNull() & (prev_gap <= tol)
    next_ok = F.col("next_ts").isNotNull() & (next_gap <= tol)
    pick_prev = prev_ok & (~next_ok | (prev_gap <= next_gap))
    return (
        carried.where(F.col("is_p") == 0)
        .where(prev_ok | next_ok)
        .select(
            "event_id",
            "user_id",
            F.when(pick_prev, F.col("prev_ts")).otherwise(F.col("next_ts")).alias(
                "matched_tsu"
            ),
            F.when(pick_prev, -prev_gap).otherwise(next_gap).alias("signed_gap_us"),
        )
    )


ASOF_NEAREST_ORACLE = """
WITH v AS (
  SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events
  WHERE event_type = 'view'
), p AS (
  SELECT user_id, epoch_us(ts) AS ptsu FROM events WHERE event_type = 'purchase'
), cand AS (
  SELECT v.event_id, v.user_id, v.tsu, p.ptsu,
         row_number() OVER (
           PARTITION BY v.event_id
           ORDER BY abs(p.ptsu - v.tsu), p.ptsu) AS rk
  FROM v JOIN p ON p.user_id = v.user_id
              AND abs(p.ptsu - v.tsu) <= 21600000000
)
SELECT event_id, user_id, ptsu AS matched_tsu,
       ptsu - tsu AS signed_gap_us
FROM cand WHERE rk = 1
"""


def session_funnel_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict in-session funnel: view → click → purchase must occur IN
    ORDER within one 30-minute-gap session (events_funnel_conversion
    is the whole-user-history variant; product analytics wants the
    session-scoped one). Stage k's timestamp is the first occurrence
    STRICTLY AFTER stage k-1's — three conditional-min aggregate
    passes over the sessionized stream, each a broadcast join back on
    the session key, never a per-row subquery.

    Sessions are the standard gaps-and-islands (new session when the
    user's gap > 30 min — the events_sessionization rule). Output is
    the funnel table: sessions at each stage + exact-rational
    conversion rates.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("tsu")
    )
    w = Window.partitionBy("user_id").orderBy("tsu")
    sess = ev.withColumn(
        "new_s",
        (
            F.coalesce(
                (F.col("tsu") - F.lag("tsu").over(w)) > 1_800_000_000, F.lit(True)
            )
        ).cast("long"),
    ).withColumn("session_id", F.sum("new_s").over(w))
    key = ["user_id", "session_id"]
    t1 = sess.groupBy(*key).agg(
        F.min(F.when(F.col("event_type") == "view", F.col("tsu"))).alias("t_view")
    )
    s2 = sess.join(F.broadcast(t1), key)
    t2 = s2.groupBy(*key).agg(
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("tsu") > F.col("t_view")),
                F.col("tsu"),
            )
        ).alias("t_click")
    )
    s3 = sess.join(F.broadcast(t1), key).join(F.broadcast(t2), key)
    t3 = s3.groupBy(*key).agg(
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("tsu") > F.col("t_click")),
                F.col("tsu"),
            )
        ).alias("t_buy")
    )
    stages = (
        t1.join(t2, key).join(t3, key)
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum(F.col("t_view").isNotNull().cast("long")).alias("n_view"),
            F.sum(F.col("t_click").isNotNull().cast("long")).alias("n_view_click"),
            F.sum(F.col("t_buy").isNotNull().cast("long")).alias("n_full_funnel"),
        )
    )
    return stages.select(
        "n_sessions",
        "n_view",
        "n_view_click",
        "n_full_funnel",
        F.round(F.col("n_view_click") / F.col("n_view"), 4).alias("click_rate"),
        F.round(F.col("n_full_funnel") / F.col("n_view_click"), 4).alias("buy_rate"),
    )


SESSION_FUNNEL_ORACLE = """
WITH sess AS (
  SELECT user_id, event_type, epoch_us(ts) AS tsu,
         sum(CASE WHEN prev IS NULL OR epoch_us(ts) - prev > 1800000000
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM (SELECT *, lag(epoch_us(ts)) OVER (PARTITION BY user_id
          ORDER BY epoch_us(ts)) AS prev FROM events)
), t1 AS (
  SELECT user_id, session_id,
         min(CASE WHEN event_type = 'view' THEN tsu END) AS t_view
  FROM sess GROUP BY 1, 2
), t2 AS (
  SELECT s.user_id, s.session_id,
         min(CASE WHEN s.event_type = 'click' AND s.tsu > t1.t_view
                  THEN s.tsu END) AS t_click
  FROM sess s JOIN t1 USING (user_id, session_id) GROUP BY 1, 2
), t3 AS (
  SELECT s.user_id, s.session_id,
         min(CASE WHEN s.event_type = 'purchase' AND s.tsu > t2.t_click
                  THEN s.tsu END) AS t_buy
  FROM sess s JOIN t1 USING (user_id, session_id)
              JOIN t2 USING (user_id, session_id)
  GROUP BY 1, 2
)
SELECT count(*) AS n_sessions,
       CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_view,
       CAST(sum(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_view_click,
       CAST(sum(CASE WHEN t_buy IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_full_funnel,
       round(sum(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END)
             / sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END), 4)
         AS click_rate,
       round(sum(CASE WHEN t_buy IS NOT NULL THEN 1 ELSE 0 END)
             / sum(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END), 4)
         AS buy_rate
FROM t1 JOIN t2 USING (user_id, session_id) JOIN t3 USING (user_id, session_id)
"""


def kaplan_meier_churn_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier churn table: survival analysis of user lifetime
    (days from first to last activity), right-censored for users still
    active within 7 days of the corpus watermark. Emits the KM TABLE —
    per distinct churn day: users at risk, churn events, and the
    per-step survival factor (1 − d/n) — rather than the chained
    product curve: each row is one exact integer ratio, so no
    cumulative float product (or exp-sum-log detour through libm) can
    drift between engines; the curve is a trivial running product for
    whoever plots it.

    Scale shape: lifetimes are one groupBy(user); the at-risk counts
    come from a suffix sum over the |distinct lifetimes| table
    (window over distinct-day rows, not users).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    maxd = ev.agg(F.max("day").alias("corpus_max"))
    lifet = (
        ev.groupBy("user_id")
        .agg(F.min("day").alias("first_d"), F.max("day").alias("last_d"))
        .crossJoin(F.broadcast(maxd))
        .select(
            F.datediff("last_d", "first_d").cast("long").alias("t"),
            (F.datediff("corpus_max", "last_d") > 7).cast("long").alias("churned"),
        )
    )
    per_t = lifet.groupBy("t").agg(
        F.count("*").alias("ending"),
        F.sum("churned").alias("d"),
    )
    w = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_t.withColumn("n_risk", F.sum("ending").over(w))
        .where(F.col("d") > 0)
        .select(
            "t",
            "n_risk",
            "d",
            F.round(1 - F.col("d") / F.col("n_risk"), 4).alias("km_factor"),
        )
        .orderBy("t")
    )


KAPLAN_MEIER_ORACLE = """
WITH maxd AS (SELECT max(CAST(ts AS DATE)) AS corpus_max FROM events),
lifet AS (
  SELECT CAST(max(CAST(ts AS DATE)) - min(CAST(ts AS DATE)) AS BIGINT) AS t,
         CASE WHEN corpus_max - max(CAST(ts AS DATE)) > 7 THEN 1 ELSE 0 END
           AS churned
  FROM events CROSS JOIN maxd
  GROUP BY user_id, corpus_max
), per_t AS (
  SELECT t, count(*) AS ending, CAST(sum(churned) AS BIGINT) AS d
  FROM lifet GROUP BY t
)
SELECT t,
       CAST(sum(ending) OVER (ORDER BY t DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk,
       d,
       round(1 - d / CAST(sum(ending) OVER (ORDER BY t DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT), 4)
         AS km_factor
FROM per_t
QUALIFY d > 0
ORDER BY t
"""


def hourly_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality detection: autocorrelation of each event type's
    HOURLY count series at lags 24 h (daily cycle) and 168 h (weekly),
    computed Pearson-exactly from integer sums — n·Σxy − Σx·Σy over
    the sqrt of the two integer variances, ONE division and ONE sqrt
    per statistic, so no accumulation-order float drift. A high
    lag-24 value tells a capacity planner the load is diurnal.

    Scale shape: the raw stream reduces to an |hours|×|types| count
    table first; the lag join is a self-join on (type, hour+lag) over
    that small table, and the correlation is one aggregate over it.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type",
            (F.floor(F.unix_micros("ts") / 3_600_000_000)).alias("h"),
        )
        .agg(F.count("*").alias("c"))
    )
    out = []
    for lag_h in (24, 168):
        a = hourly.select("event_type", "h", F.col("c").alias("x"))
        b = hourly.select(
            "event_type", (F.col("h") + lag_h).alias("h"), F.col("c").alias("y")
        )
        pairs = a.join(b, ["event_type", "h"])
        stats = pairs.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
        num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
        den = F.sqrt(
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
            * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
        )
        out.append(
            stats.select(
                "event_type",
                F.lit(lag_h).cast("long").alias("lag_hours"),
                "n",
                F.round(num.cast("double") / den, 4).alias("autocorr"),
            )
        )
    return out[0].unionByName(out[1]).orderBy("event_type", "lag_hours")


HOURLY_AUTOCORR_ORACLE = """
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h, count(*) AS c
  FROM events GROUP BY 1, 2
), lags AS (
  SELECT 24 AS lag_hours UNION ALL SELECT 168
), pairs AS (
  SELECT a.event_type, l.lag_hours,
         CAST(a.c AS BIGINT) AS x, CAST(b.c AS BIGINT) AS y
  FROM hourly a
  CROSS JOIN lags l
  JOIN hourly b ON b.event_type = a.event_type AND b.h + l.lag_hours = a.h
), stats AS (
  SELECT event_type, lag_hours, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY 1, 2
)
SELECT event_type, CAST(lag_hours AS BIGINT) AS lag_hours, n,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 4) AS autocorr
FROM stats
ORDER BY event_type, lag_hours
"""


def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: for each first-activity-day
    cohort, cumulative purchase value per cohort member at day ages
    0..7 — the revenue companion to retention_cohort_matrix (the two
    together are the core product-analytics pair). Value accumulates
    as exact int64 cents; only the final per-user division produces a
    double.

    Scale shape: one distinct-day pass + per-user min (the cohort
    assignment retention already computes), a join back on user_id,
    one (cohort, age) aggregate, and the cumulative sum runs over ≤ 8
    rows per cohort — a |days|×8 window, never the event stream.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cohort = (
        ev.select("user_id", "day")
        .distinct()
        .groupBy("user_id")
        .agg(F.min("day").alias("cohort_day"))
    )
    sizes = cohort.groupBy("cohort_day").agg(F.count("*").alias("cohort_n"))
    spend = (
        ev.where(F.col("event_type") == "purchase")
        .join(cohort, "user_id")
        .select(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("long").alias("age"),
            "cents",
        )
        .where(F.col("age") <= 7)
        .groupBy("cohort_day", "age")
        .agg(F.sum("cents").alias("day_cents"))
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spend.withColumn("cum_cents", F.sum("day_cents").over(w))
        .join(F.broadcast(sizes), "cohort_day")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "age",
            "cum_cents",
            F.round(F.col("cum_cents") / (F.lit(100.0) * F.col("cohort_n")), 4).alias(
                "ltv_per_user"
            ),
        )
        .orderBy("cohort_day", "age")
    )


COHORT_LTV_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), cohort AS (
  SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id
), sizes AS (
  SELECT cohort_day, count(*) AS cohort_n FROM cohort GROUP BY cohort_day
), spend AS (
  SELECT c.cohort_day,
         CAST(CAST(e.ts AS DATE) - c.cohort_day AS BIGINT) AS age,
         CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS day_cents
  FROM events e JOIN cohort c USING (user_id)
  WHERE e.event_type = 'purchase'
    AND CAST(e.ts AS DATE) - c.cohort_day <= 7
  GROUP BY 1, 2
), cum AS (
  SELECT cohort_day, age,
         CAST(sum(day_cents) OVER (PARTITION BY cohort_day ORDER BY age
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_cents
  FROM spend
)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day, age, cum_cents,
       round(cum_cents / (100.0 * cohort_n), 4) AS ltv_per_user
FROM cum JOIN sizes USING (cohort_day)
ORDER BY 1, age
"""


QUERIES: dict = {
    "recursive_spine_gapfill": (recursive_spine_gapfill, RECURSIVE_SPINE_ORACLE),
    "time_to_first_purchase": (time_to_first_purchase, TIME_TO_PURCHASE_ORACLE),
    "user_growth_accounting": (user_growth_accounting, USER_GROWTH_ORACLE),
    "multi_touch_attribution_decay": (
        multi_touch_attribution_decay,
        MULTI_TOUCH_ORACLE,
    ),
    "inter_event_time_stats": (inter_event_time_stats, INTER_EVENT_ORACLE),
    "retention_cohort_matrix": (retention_cohort_matrix, RETENTION_COHORT_ORACLE),
    "mad_outlier_events": (mad_outlier_events, MAD_OUTLIER_ORACLE),
    "m4_downsample_events": (m4_downsample_events, M4_DOWNSAMPLE_ORACLE),
    "hierarchical_rollup_events": (
        hierarchical_rollup_events,
        HIERARCHICAL_ROLLUP_ORACLE,
    ),
    "frequent_event_paths": (frequent_event_paths, FREQUENT_PATHS_ORACLE),
    "event_transition_matrix": (event_transition_matrix, EVENT_TRANSITION_ORACLE),
    "purchase_attribution_last_touch": (
        purchase_attribution_last_touch,
        PURCHASE_ATTRIBUTION_ORACLE,
    ),
    "interval_concurrency_peak": (
        interval_concurrency_peak,
        INTERVAL_CONCURRENCY_ORACLE,
    ),
    "events_anomaly_zscore": (events_anomaly_zscore, EVENTS_ANOMALY_ORACLE),
    "events_hourly_agg": (events_hourly_agg, EVENTS_HOURLY_ORACLE),
    "events_funnel_conversion": (events_funnel_conversion, EVENTS_FUNNEL_ORACLE),
    "events_trailing_range_window": (
        events_trailing_range_window,
        EVENTS_RANGE_WINDOW_ORACLE,
    ),
    "events_gapfill_resample": (events_gapfill_resample, EVENTS_GAPFILL_ORACLE),
    "asof_join_purchase_view": (asof_join_purchase_view, ASOF_JOIN_ORACLE),
    "events_sliding_window": (events_sliding_window, EVENTS_SLIDING_ORACLE),
    "events_sessionization": (events_sessionization, EVENTS_SESSION_ORACLE),
    "events_json_extract": (events_json_extract, EVENTS_JSON_ORACLE),
    "events_variant_json": (events_variant_json, EVENTS_VARIANT_ORACLE),
    "events_topk_users_per_type": (events_topk_users_per_type, EVENTS_TOPK_ORACLE),
    "late_event_accounting": (late_event_accounting, LATE_EVENT_ORACLE),
    "cohort_ltv_curve": (cohort_ltv_curve, COHORT_LTV_ORACLE),
    "asof_nearest_tolerance": (asof_nearest_tolerance, ASOF_NEAREST_ORACLE),
    "session_funnel_strict": (session_funnel_strict, SESSION_FUNNEL_ORACLE),
    "kaplan_meier_churn_table": (kaplan_meier_churn_table, KAPLAN_MEIER_ORACLE),
    "hourly_autocorrelation": (hourly_autocorrelation, HOURLY_AUTOCORR_ORACLE),
}
