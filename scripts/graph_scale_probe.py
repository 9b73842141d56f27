#!/usr/bin/env python
"""Wedge-join scale probe for common-neighbors link prediction on a
SKEWED 1M-node graph — the shape where the fixture-tuned key-oriented
wedge join (operators/graph.py link_prediction_common_neighbors) must
switch to degree-aware enumeration.

Construction: 3M edges over 1M nodes; ~10% of edges attach to 100 hub
nodes (degree ≈ 3k each), the rest uniform. The wedge space through a
center x is deg(x)², so:

- naive (enumerate every center): Σ deg² is dominated by the hubs —
  computed analytically from the degree table (cheap) rather than
  materialized, because it is the thing that must NOT be materialized;
- degree-capped: only centers with deg ≤ CAP enumerate wedges; the
  dropped share is REPORTED (no silent cap) — at 100 TB the hub
  centers get a sampled/sketched estimate instead, or a deliberate
  skip (a node connected to everything predicts nothing specific).

Usage: python scripts/graph_scale_probe.py   (one JSON line per probe)
"""
from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.session import get_spark

spark = get_spark("graphprobe", cpus=32, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

N_NODES = 1_000_000
N_EDGES = 3_000_000
N_HUBS = 100
CAP = 512
TOPK = 20


def force(df):
    df.write.format("noop").mode("overwrite").save()


def edges_df():
    raw = spark.range(N_EDGES).select(
        ((F.col("id") * 48271) % 2147483647).alias("h"),
        ((F.col("id") * 69621) % 2147483647).alias("h2"),
    )
    u = F.when(F.col("h") % 1000 < 100, F.col("h") % N_HUBS).otherwise(
        F.col("h") % N_NODES
    )
    v = (F.col("h2") % N_NODES)
    e = (
        raw.select(u.alias("a"), v.alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
    )
    return e


e = edges_df().persist()
n_edges = e.count()

adj = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
deg = adj.groupBy("u").agg(F.count("*").alias("deg")).persist()

tot = deg.agg(
    F.sum(F.col("deg") * F.col("deg")).alias("wedges_naive"),
    F.sum(
        F.when(F.col("deg") <= CAP, F.col("deg") * F.col("deg")).otherwise(0)
    ).alias("wedges_capped"),
    F.sum(F.when(F.col("deg") > CAP, 1).otherwise(0)).alias("dropped_centers"),
    F.count("*").alias("n_nodes"),
).collect()[0]


def capped_topk():
    ok = deg.where(F.col("deg") <= CAP).select("u")
    adj_c = adj.join(ok, "u", "left_semi")  # only low-degree CENTERS enumerate
    h1 = adj_c.select(F.col("v").alias("a"), F.col("u").alias("x"))
    h2 = adj_c.select(F.col("u").alias("x"), F.col("v").alias("b"))
    wedges = (
        h1.join(h2, "x")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("cn"))
    )
    cand = wedges.join(
        e.select(F.col("u").alias("a"), F.col("v").alias("b")), ["a", "b"], "left_anti"
    )
    return cand.orderBy(F.col("cn").desc(), "a", "b").limit(TOPK)


force(capped_topk())  # warm-up
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    force(capped_topk())
    ts.append(time.perf_counter() - t0)

print(
    json.dumps(
        {
            "probe": "link_prediction_wedge_1m_nodes",
            "n_nodes": int(tot["n_nodes"]),
            "n_edges": int(n_edges),
            "degree_cap": CAP,
            "wedges_naive": int(tot["wedges_naive"]),
            "wedges_capped": int(tot["wedges_capped"]),
            "dropped_centers": int(tot["dropped_centers"]),
            "sec_capped_topk": round(statistics.median(ts), 3),
            "note": (
                "hub centers (deg>cap) excluded and counted — naive wedge space is "
                "analytically computed, never materialized; capped top-k runs end-to-end"
            ),
        }
    ),
    flush=True,
)


# Degree-ordered triangle counting on the same hub graph — key-only
# orientation would hand each hub O(deg²) wedges; (degree, key)
# orientation bounds every node's wedge fan-out by its OUT-degree.
def tri_count():
    deg = adj.groupBy("u").agg(F.count("*").alias("d"))
    ed = e.join(
        deg.select(F.col("u").alias("u"), F.col("d").alias("du")), "u"
    ).join(deg.select(F.col("u").alias("v"), F.col("d").alias("dv")), "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dt"),
    )
    p1 = o.select("s", F.col("t").alias("b"), F.col("dt").alias("db"))
    p2 = o.select("s", F.col("t").alias("c"), F.col("dt").alias("dc"))
    wedges = p1.join(p2, "s").where(
        (F.col("db") < F.col("dc"))
        | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    )
    tri = wedges.join(
        o.select(F.col("s").alias("b"), F.col("t").alias("c")), ["b", "c"]
    )
    return tri.agg(F.count("*").alias("n_triangles"))


force(tri_count())
ts2 = []
for _ in range(3):
    t0 = time.perf_counter()
    force(tri_count())
    ts2.append(time.perf_counter() - t0)
n_tri = tri_count().collect()[0][0]
print(
    json.dumps(
        {
            "probe": "triangle_count_degree_ordered_1m_nodes",
            "n_nodes": int(tot["n_nodes"]),
            "n_edges": int(n_edges),
            "n_triangles": int(n_tri),
            "sec": round(statistics.median(ts2), 3),
            "note": "(degree,key)-ordered orientation; wedge fan-out bounded by out-degree, hubs included",
        }
    ),
    flush=True,
)
