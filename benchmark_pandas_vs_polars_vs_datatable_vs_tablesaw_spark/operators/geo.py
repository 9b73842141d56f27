"""Geospatial operators: grid-bucketed distance join + spatial density.

The reference has no spatial surface; these extensions cover the two
kernels a location-aware pipeline needs, in the shape that survives
100 TB: **never a cross join**. The candidate set for a radius query
comes from an equi-join on quantized grid cells (the supplier side is
exploded to its 3x3 cell neighborhood, so every true neighbor within
one cell-width of the radius is guaranteed to share a join key), and
only candidates pay the exact haversine evaluation. This is the same
blocking pattern the dedup family uses (LSH bands, shingle postings):
cheap discrete key -> equi-join -> exact verify.

Coordinates are derived deterministically from the fixture keys by
modular arithmetic (a 0.001-degree lattice inside a ~1x1 degree city
box), so both engines see identical positions with no extra fixture
and no RNG. Exact coordinate ties (key collisions on the lattice)
produce exactly equal distances in both engines, which the
(distance, suppkey) tiebreak resolves identically.

Float discipline: the haversine is double math (sin/cos/asin differ
from libm by <=1 ulp across engines — ~1e-10 km here), output is
rounded to 4 decimals (0.1 m), and join/rank decisions only flip on
sub-ulp coincidences a 0.001-degree lattice cannot produce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

# One shared city box: lat 40.0-41.0, lon -74.0 - -73.0 (~111 x 85 km).
_CUST_LAT = "CAST(40.0 + ((c_custkey * 37) % 1000) / 1000.0 AS DOUBLE)"
_CUST_LON = "CAST(-74.0 + ((c_custkey * 73) % 1000) / 1000.0 AS DOUBLE)"
_SUPP_LAT = "CAST(40.0 + ((s_suppkey * 41) % 1000) / 1000.0 AS DOUBLE)"
_SUPP_LON = "CAST(-74.0 + ((s_suppkey * 79) % 1000) / 1000.0 AS DOUBLE)"

# 0.1-degree grid cells: ~11.1 km tall, ~8.5 km wide at this latitude.
# With a 9-cell neighborhood the candidate search is complete for any
# radius <= one cell width (~8.5 km); we query at 8 km.
_RADIUS_KM = 8.0
_HAVERSINE = (
    "2.0 * 6371.0 * asin(sqrt("
    "pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) + "
    "cos(radians({lat1})) * cos(radians({lat2})) * "
    "pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)))"
)


def geo_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest supplier within 8 km of each customer (grid-blocked
    radius join + exact haversine verify + per-customer arg-min).

    Plan shape: suppliers explode to their 3x3 grid neighborhood
    (9x a small dim table), customers compute ONE grid cell each, and
    the only join is an equi-join on the cell id — at 100 TB that is
    a broadcast of the exploded supplier side, zero shuffle of the
    customer table. The exact distance + row_number(dist, suppkey)
    runs on candidates only (bounded per cell), never on the cross
    product.
    """
    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey",
        f"{_CUST_LAT} AS c_lat",
        f"{_CUST_LON} AS c_lon",
    )
    supp = load_table(spark, sf_dir, "supplier").selectExpr(
        "s_suppkey",
        f"{_SUPP_LAT} AS s_lat",
        f"{_SUPP_LON} AS s_lon",
    )
    supp9 = (
        supp.withColumn("dy", F.expr("explode(array(-1, 0, 1))"))
        .withColumn("dx", F.expr("explode(array(-1, 0, 1))"))
        .select(
            "s_suppkey",
            "s_lat",
            "s_lon",
            (F.floor(F.col("s_lat") * 10) + F.col("dy")).alias("cell_y"),
            (F.floor(F.col("s_lon") * 10) + F.col("dx")).alias("cell_x"),
        )
    )
    cust_cell = cust.select(
        "c_custkey",
        "c_lat",
        "c_lon",
        F.floor(F.col("c_lat") * 10).alias("cell_y"),
        F.floor(F.col("c_lon") * 10).alias("cell_x"),
    )
    dist = F.expr(
        _HAVERSINE.format(lat1="c_lat", lon1="c_lon", lat2="s_lat", lon2="s_lon")
    )
    cand = (
        cust_cell.join(F.broadcast(supp9), ["cell_y", "cell_x"])
        .withColumn("dist_km", dist)
        .where(F.col("dist_km") <= _RADIUS_KM)
    )
    w = Window.partitionBy("c_custkey").orderBy("dist_km", "s_suppkey")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "c_custkey",
            "s_suppkey",
            F.round("dist_km", 4).alias("dist_km"),
        )
        .orderBy("c_custkey")
    )


GEO_NEAREST_ORACLE = f"""
WITH cust AS (
  SELECT c_custkey, {_CUST_LAT} AS c_lat, {_CUST_LON} AS c_lon
  FROM customer
), supp AS (
  SELECT s_suppkey, {_SUPP_LAT} AS s_lat, {_SUPP_LON} AS s_lon
  FROM supplier
), supp9 AS (
  SELECT s.s_suppkey, s.s_lat, s.s_lon,
         CAST(floor(s.s_lat * 10) AS BIGINT) + o.dy AS cell_y,
         CAST(floor(s.s_lon * 10) AS BIGINT) + o.dx AS cell_x
  FROM supp s
  CROSS JOIN (SELECT dy, dx
              FROM (VALUES (-1),(0),(1)) AS a(dy),
                   (VALUES (-1),(0),(1)) AS b(dx)) o
), cand AS (
  SELECT c.c_custkey, s.s_suppkey,
         {_HAVERSINE.format(lat1="c.c_lat", lon1="c.c_lon",
                            lat2="s.s_lat", lon2="s.s_lon")} AS dist_km
  FROM cust c
  JOIN supp9 s
    ON CAST(floor(c.c_lat * 10) AS BIGINT) = s.cell_y
   AND CAST(floor(c.c_lon * 10) AS BIGINT) = s.cell_x
  WHERE {_HAVERSINE.format(lat1="c.c_lat", lon1="c.c_lon",
                           lat2="s.s_lat", lon2="s.s_lon")} <= {_RADIUS_KM}
)
SELECT c_custkey, s_suppkey, round(dist_km, 4) AS dist_km
FROM (
  SELECT c_custkey, s_suppkey, dist_km,
         row_number() OVER (PARTITION BY c_custkey
                            ORDER BY dist_km, s_suppkey) AS rn
  FROM cand
)
WHERE rn = 1
ORDER BY c_custkey
"""


def geo_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial density heatmap: customer count + exact e4 account
    balance per 0.1-degree grid cell. A groupBy on a derived integer
    key — fully map-side-combinable (the canonical tile-aggregation
    for map rendering / hotspot detection; only |cells| rows ever
    shuffle, whatever the input size)."""
    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey",
        "c_acctbal",
        f"{_CUST_LAT} AS c_lat",
        f"{_CUST_LON} AS c_lon",
    )
    return (
        cust.groupBy(
            F.floor(F.col("c_lat") * 10).alias("cell_y"),
            F.floor(F.col("c_lon") * 10).alias("cell_x"),
        )
        .agg(
            F.count("*").alias("n_customers"),
            (
                F.sum(F.expr("CAST(round(c_acctbal * 10000) AS BIGINT)")) / 10000.0
            ).alias("acctbal_sum"),
        )
        .orderBy("cell_y", "cell_x")
    )


GEO_CELL_DENSITY_ORACLE = f"""
SELECT CAST(floor(({_CUST_LAT}) * 10) AS BIGINT) AS cell_y,
       CAST(floor(({_CUST_LON}) * 10) AS BIGINT) AS cell_x,
       count(*) AS n_customers,
       CAST(sum(CAST(round(c_acctbal * 10000) AS BIGINT)) AS BIGINT) / 10000.0
         AS acctbal_sum
FROM customer
GROUP BY 1, 2
ORDER BY cell_y, cell_x
"""


# Convex quadrilateral in integer milli-degrees, counter-clockwise
# (cross-products of consecutive edges all positive — verified).
_POLY = ((40200, -73800), (40850, -73700), (40800, -73200), (40150, -73350))


def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon classification (geofencing): count customers
    inside a convex service-area polygon, per market segment. The
    winding test runs in INTEGER milli-degrees — each of the four edge
    cross-products (x1−x0)(yp−y0) − (y1−y0)(xp−x0) is exact int64, so
    'inside' can never flip on a float ulp; strict inequality puts
    boundary points outside in both engines identically.

    Scale shape: a pure per-row projection (four multiplications per
    edge, no join, no shuffle beyond the final segment groupBy) — the
    shape a geofence filter keeps at any scale. Non-convex fences
    decompose into convex pieces and OR the tests.
    """
    cust = load_table(spark, sf_dir, "customer")
    lat_p = "(40000 + (c_custkey * 37) % 1000)"
    lon_p = "(-74000 + (c_custkey * 73) % 1000)"
    edges = []
    n = len(_POLY)
    for i in range(n):
        (y0, x0), (y1, x1) = _POLY[i], _POLY[(i + 1) % n]
        edges.append(
            f"(({y1} - {y0}) * ({lon_p} - {x0})"
            f" - (({x1} - {x0})) * ({lat_p} - {y0}) > 0)"
        )
    inside = F.expr(" AND ".join(edges))
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(inside.cast("long")).alias("n_inside"),
            F.round(F.sum(inside.cast("long")) / F.count("*"), 4).alias("share"),
        )
        .orderBy("c_mktsegment")
    )


def _poly_edges_sql(lat_p: str, lon_p: str) -> str:
    n = len(_POLY)
    edges = []
    for i in range(n):
        (y0, x0), (y1, x1) = _POLY[i], _POLY[(i + 1) % n]
        edges.append(
            f"(({y1} - {y0}) * ({lon_p} - {x0})"
            f" - (({x1} - {x0})) * ({lat_p} - {y0}) > 0)"
        )
    return " AND ".join(edges)


GEO_POINT_IN_POLYGON_ORACLE = f"""
SELECT c_mktsegment, count(*) AS n_total,
       CAST(sum(CASE WHEN {_poly_edges_sql("(40000 + (c_custkey * 37) % 1000)", "(-74000 + (c_custkey * 73) % 1000)")}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_inside,
       round(sum(CASE WHEN {_poly_edges_sql("(40000 + (c_custkey * 37) % 1000)", "(-74000 + (c_custkey * 73) % 1000)")}
                 THEN 1 ELSE 0 END) / count(*), 4) AS share
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


QUERIES: dict = {
    "geo_nearest_supplier": (geo_nearest_supplier, GEO_NEAREST_ORACLE),
    "geo_cell_density": (geo_cell_density, GEO_CELL_DENSITY_ORACLE),
    "geo_point_in_polygon": (geo_point_in_polygon, GEO_POINT_IN_POLYGON_ORACLE),
}
