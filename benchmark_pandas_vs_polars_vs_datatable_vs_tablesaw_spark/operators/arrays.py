"""Higher-order array functions over the embedding fixture.

The reference's type system is flat primitives only (SURVEY.md §1.2 —
"no nested/array/map types appear anywhere"), but the north-star
LLM-pipeline posture works on `array<float>` embedding columns
(TESTDATA.md), so the full Spark higher-order-function surface —
transform / filter / exists / forall / aggregate / zip_with / slice /
sort_array / posexplode — is exercised here as first-class operators
with DuckDB list-lambda oracles.

Scale notes: every function here is a JVM-side Catalyst expression
evaluated inside whole-stage codegen — no Python UDF, no shuffle
except where a groupBy is the point (the per-dimension stats). At
100 TB the per-row HOF pipeline is embarrassingly parallel and
pipelined with the parquet scan.

Cross-engine determinism: element order inside an array is part of
the data, so left-to-right folds see identical element sequences in
both engines; per-element float32 values are bit-identical from the
same parquet. Accumulation is forced to double on both sides and
results rounded coarsely enough that the ~1e-13 fold-order-free error
cannot straddle a rounding boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def array_hof_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform/filter/exists/forall/aggregate/zip_with in one
    projection over the 64-dim embedding column — all whole-stage
    codegen, zero shuffle (narrow scan -> project)."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    dbl = lambda x: x.cast("double")  # noqa: E731
    return (
        emb.select(
            "vec_id",
            F.size(e).alias("n_dims"),
            F.size(F.filter(e, lambda x: x > 0)).alias("n_pos"),
            F.exists(e, lambda x: F.abs(x) > F.lit(0.5)).cast("int").alias("has_large"),
            F.forall(e, lambda x: F.abs(x) < F.lit(1.0)).cast("int").alias("all_small"),
            F.round(
                F.aggregate(e, F.lit(0.0), lambda acc, x: acc + F.abs(dbl(x))), 2
            ).alias("l1_norm"),
            F.round(
                F.aggregate(
                    F.zip_with(e, F.reverse(e), lambda x, y: dbl(x) * dbl(y)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                3,
            ).alias("rev_dot"),
        )
        .orderBy("vec_id")
    )


ARRAY_HOF_ORACLE = """
SELECT vec_id,
       CAST(len(embedding) AS INT) AS n_dims,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
       CAST(len(list_filter(embedding, x -> abs(x) > 0.5)) > 0 AS INT) AS has_large,
       CAST(len(list_filter(embedding, x -> abs(x) >= 1.0)) = 0 AS INT) AS all_small,
       round(list_sum(list_transform(embedding,
                                     x -> abs(CAST(x AS DOUBLE)))), 2) AS l1_norm,
       round(list_sum(list_transform(list_zip(embedding, list_reverse(embedding)),
                                     p -> CAST(p[1] AS DOUBLE)
                                          * CAST(p[2] AS DOUBLE))), 3) AS rev_dot
FROM embeddings
ORDER BY vec_id
"""


def array_topk_elements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sort_array + slice: per-vector top-5 element sum. Sorting is on
    bit-identical float32 values, so the sliced prefix and its
    left-to-right fold are identical in both engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    top5 = F.slice(F.sort_array(F.col("embedding"), asc=False), 1, 5)
    return (
        emb.select(
            "vec_id",
            F.round(
                F.aggregate(top5, F.lit(0.0), lambda acc, x: acc + x.cast("double")), 3
            ).alias("top5_sum"),
            F.round(F.element_at(top5, 1).cast("double"), 4).alias("max_elem"),
        )
        .orderBy("vec_id")
    )


ARRAY_TOPK_ORACLE = """
SELECT vec_id,
       round(list_sum(list_transform(list_sort(embedding, 'DESC')[1:5],
                                     x -> CAST(x AS DOUBLE))), 3) AS top5_sum,
       round(CAST(list_sort(embedding, 'DESC')[1] AS DOUBLE), 4) AS max_elem
FROM embeddings
ORDER BY vec_id
"""


def array_dimension_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode + re-aggregate: per-dimension distribution stats for
    the first 8 dimensions across all vectors.

    Scale: explode multiplies rows by the slice width (8x here, 64x
    full) BEFORE the shuffle — at 100 TB prefer per-partition partial
    aggregation, which Spark's hash aggregate already applies to the
    exploded stream, so the shuffle carries only (dim, partial) rows.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(F.posexplode(F.slice("embedding", 1, 8)).alias("dim", "val"))
        .groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(F.col("val").cast("double")), 4).alias("avg_val"),
            F.round(F.min(F.col("val").cast("double")), 4).alias("min_val"),
            F.round(F.max(F.col("val").cast("double")), 4).alias("max_val"),
        )
        .orderBy("dim")
    )


ARRAY_DIM_STATS_ORACLE = """
SELECT CAST(i - 1 AS INT) AS dim,
       count(*) AS n,
       round(avg(CAST(embedding[i] AS DOUBLE)), 4) AS avg_val,
       round(min(CAST(embedding[i] AS DOUBLE)), 4) AS min_val,
       round(max(CAST(embedding[i] AS DOUBLE)), 4) AS max_val
FROM embeddings, generate_series(1, 8) t(i)
GROUP BY dim
ORDER BY dim
"""


def map_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed columns: build per-returnflag {linestatus: n} maps
    with map_from_entries over collected structs, then flatten back
    with explode(map) — the round trip every feature-store export
    uses. The map itself never crosses the oracle hash (engines render
    maps differently); the exploded (key, value) rows do, which pins
    the same content.

    Scale: one shuffle for the (flag, status) aggregate, a second tiny
    one for the per-flag map build; the explode is a narrow op.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_status = li.groupBy("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))
    as_map = per_status.groupBy("l_returnflag").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("l_linestatus", "n")))
        ).alias("status_counts")
    )
    exploded = as_map.select(
        "l_returnflag",
        F.map_keys("status_counts").alias("ks"),
        F.explode("status_counts").alias("status", "n_lines"),
    )
    return exploded.select(
        "l_returnflag",
        F.size("ks").alias("n_statuses"),
        "status",
        "n_lines",
    ).orderBy("l_returnflag", "status")


MAP_FUNCS_ORACLE = """
WITH per_status AS (
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus),
per_flag AS (
    SELECT l_returnflag, CAST(count(*) AS INT) AS n_statuses
    FROM per_status GROUP BY l_returnflag)
SELECT s.l_returnflag,
       f.n_statuses,
       s.l_linestatus AS status,
       s.n AS n_lines
FROM per_status s JOIN per_flag f USING (l_returnflag)
ORDER BY s.l_returnflag, status
"""


def map_hof_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: transform_values / map_filter /
    map_zip_with run on the per-flag status->count maps, then the
    result flattens to rows for the oracle (map literals don't hash
    portably; entries do).

    doubled = transform_values(m, (k,v) -> v*2); only entries with
    v > threshold survive map_filter. The oracle recomputes the same
    arithmetic relationally — the point is that Spark's map-lambda
    stack produces exactly the relational answer.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_status = li.groupBy("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))
    as_map = per_status.groupBy("l_returnflag").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("l_linestatus", "n")))
        ).alias("m")
    )
    transformed = as_map.select(
        "l_returnflag",
        F.map_filter(
            F.transform_values("m", lambda _, v: v * 2),
            lambda _, v: v > F.lit(1000),
        ).alias("big_doubled"),
    )
    return (
        transformed.select(
            "l_returnflag", F.explode_outer("big_doubled").alias("status", "doubled_n")
        )
        .orderBy("l_returnflag", "status")
    )


MAP_HOF_ORACLE = """
WITH per_status AS (
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus),
flags AS (SELECT DISTINCT l_returnflag FROM per_status),
survivors AS (
    SELECT l_returnflag, l_linestatus AS status, n * 2 AS doubled_n
    FROM per_status WHERE n * 2 > 1000)
SELECT f.l_returnflag, s.status, s.doubled_n
FROM flags f LEFT OUTER JOIN survivors s USING (l_returnflag)
ORDER BY f.l_returnflag, s.status
"""


QUERIES: dict = {
    "array_hof_suite": (array_hof_suite, ARRAY_HOF_ORACLE),
    "map_funcs_suite": (map_funcs_suite, MAP_FUNCS_ORACLE),
    "map_hof_suite": (map_hof_suite, MAP_HOF_ORACLE),
    "array_topk_elements": (array_topk_elements, ARRAY_TOPK_ORACLE),
    "array_dimension_stats": (array_dimension_stats, ARRAY_DIM_STATS_ORACLE),
}
