"""ML feature-prep and retrieval-training operators.

Round-4 session additions on top of the curation layer (text.py /
dedup.py / training.py): the feature-engineering and pair-mining
machinery that turns a curated corpus into model inputs.

- ``target_encode_smoothed``: smoothed mean target encoding — the
  classic high-cardinality categorical feature (here: market segment
  encoded by account balance) with an m-estimate prior so rare
  categories shrink toward the global mean.
- ``negative_sampling_pairs``: deterministic cross-source negative
  mining for contrastive training — hash-bucketed candidate join, so
  the pair space is O(n·K), never the O(n²) cross join.
- ``curriculum_shard_plan``: length-ordered curriculum shards via the
  distributed ``global_rank`` helper (no single-partition window).
- ``hll_distinct_certificate``: Datasketches HLL per-group distinct
  estimates PLUS a merged (union) global sketch, certified against the
  exact distinct counts — the mergeability property is exactly what a
  1000-executor rollup relies on.
- ``asof_forward_tolerance``: forward as-of join with a tolerance
  window (pandas ``merge_asof(direction='forward', tolerance=...)``
  semantics) as a single-shuffle union-and-carry, not a range join.
- ``chi2_token_source``: χ² token-vs-source association — the
  standard feature-selection / domain-signature statistic, computed
  from integer contingency counts.
- ``er_weighted_match``: entity-resolution scoring — blocked fuzzy
  join (levenshtein name similarity + balance proximity) with a
  deterministic best-match-per-entity pick.
- ``skyline_pareto_frontier``: 2-D skyline via per-key reduction +
  running-max window over the distinct-key table (no O(n²)
  dominance self-join on the fact table).

Scale shapes are documented per operator; nothing materializes
row-level data on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .core import global_rank

# Per-call-site registry of persisted frames, so repeated invocations
# of the same query in one long driver session don't accumulate
# CacheManager entries without bound (ADVICE r13: the AUC value-level
# persists leaked one entry per call, and stray cache entries are what
# can trip global_rank's InMemoryRelation refusal on unrelated plans).
_PERSIST_ROTATION: dict[str, list] = {}


def _rotate_persists(key: str, *dfs: DataFrame) -> None:
    """Unpersist the frames the PREVIOUS call at ``key`` persisted and
    register the new ones — bounds the session cache footprint to one
    invocation's (metadata-scale) entries per call site."""
    for old in _PERSIST_ROTATION.get(key, []):
        try:
            old.unpersist()
        except Exception:
            pass  # already unpersisted / session torn down — nothing to free
    _PERSIST_ROTATION[key] = list(dfs)


# --------------------------------------------------------------------------
# Smoothed target encoding
# --------------------------------------------------------------------------


def target_encode_smoothed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """m-estimate target encoding of ``c_mktsegment`` by
    ``c_acctbal``: enc = (sum_y + m·prior) / (n + m) with m=50 and
    prior = global mean. Rare categories shrink toward the prior, so
    the encoding never explodes on a 3-row category — the reason this
    beats a plain group mean as a model feature.

    Scale shape: one map-side-combinable aggregate per category plus a
    broadcast single-row global aggregate; no row-level shuffle beyond
    the category groupBy. At 100 TB the category table is tiny
    relative to the fact table, so the join back (if a caller wants
    per-row features) is a broadcast.
    """
    cust = load_table(spark, sf_dir, "customer")
    m = F.lit(50.0)
    prior = cust.agg(F.avg("c_acctbal").alias("prior"))
    per_cat = cust.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum("c_acctbal").alias("sum_y"),
    )
    return (
        per_cat.crossJoin(F.broadcast(prior))
        .select(
            "c_mktsegment",
            "n",
            F.round((F.col("sum_y") + m * F.col("prior")) / (F.col("n") + m), 4).alias(
                "enc"
            ),
            F.round(F.col("sum_y") / F.col("n") - F.col("prior"), 4).alias(
                "lift_vs_prior"
            ),
        )
        .orderBy("c_mktsegment")
    )


TARGET_ENCODE_ORACLE = """
WITH prior AS (SELECT avg(c_acctbal) AS prior FROM customer),
per_cat AS (
  SELECT c_mktsegment, count(*) AS n, sum(c_acctbal) AS sum_y
  FROM customer GROUP BY c_mktsegment
)
SELECT c_mktsegment, n,
       round((sum_y + 50.0 * prior) / (n + 50.0), 4) AS enc,
       round(sum_y / n - prior, 4) AS lift_vs_prior
FROM per_cat CROSS JOIN prior
ORDER BY c_mktsegment
"""


# --------------------------------------------------------------------------
# Deterministic negative sampling (contrastive pair mining)
# --------------------------------------------------------------------------

_NEG_BUCKETS = 16
_NEG_K = 3


def negative_sampling_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic cross-source negative mining: for each anchor
    document (a 1-in-20 hash sample), pick the K=3 pseudo-random
    documents from a DIFFERENT source inside the anchor's hash bucket.
    This is the negative-pair generator for contrastive / embedding
    training, made reproducible: the "randomness" is a Knuth
    multiplicative hash of the (anchor, candidate) id pair, so every
    engine and every rerun mines the identical pairs.

    Scale shape: candidates come from an equi-join on a hash bucket
    (``_NEG_BUCKETS`` here; at 100 TB the bucket count scales with the
    corpus so each bucket stays ~constant-size), never a cross join —
    pair space is O(n/B · n/B · B) = O(n²/B), tuned by B, and the
    anchor-side 1-in-20 filter cuts it 20× before the join. Top-K per
    anchor is a bounded window inside the anchor's bucket output.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    bucket = lambda c: (F.col(c) * F.lit(2654435761)) % F.lit(2147483647) % F.lit(
        _NEG_BUCKETS
    )
    anchors = (
        docs.where(F.col("doc_id") % 20 == 0)
        .select(
            F.col("doc_id").alias("anchor_id"),
            F.col("source").alias("anchor_source"),
            bucket("doc_id").alias("b"),
        )
    )
    cands = docs.select(
        F.col("doc_id").alias("neg_id"),
        F.col("source").alias("neg_source"),
        bucket("doc_id").alias("b"),
    )
    pair_h = (
        F.col("anchor_id") * F.lit(1000003) + F.col("neg_id") * F.lit(7919)
    ) % F.lit(999983)
    w = Window.partitionBy("anchor_id").orderBy(pair_h.asc(), F.col("neg_id").asc())
    return (
        anchors.join(cands, "b")
        .where(F.col("neg_source") != F.col("anchor_source"))
        .withColumn("neg_rank", F.row_number().over(w))
        .where(F.col("neg_rank") <= _NEG_K)
        .select("anchor_id", "neg_id", "neg_rank")
    )


NEGATIVE_SAMPLING_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source,
         (doc_id * 2654435761) % 2147483647 % {_NEG_BUCKETS} AS b
  FROM documents
), pairs AS (
  SELECT a.doc_id AS anchor_id, c.doc_id AS neg_id,
         row_number() OVER (
           PARTITION BY a.doc_id
           ORDER BY (a.doc_id * 1000003 + c.doc_id * 7919) % 999983, c.doc_id
         ) AS neg_rank
  FROM d a JOIN d c USING (b)
  WHERE a.doc_id % 20 = 0 AND c.source <> a.source
)
SELECT anchor_id, neg_id, CAST(neg_rank AS INT) AS neg_rank
FROM pairs WHERE neg_rank <= {_NEG_K}
"""


# --------------------------------------------------------------------------
# Curriculum sharding
# --------------------------------------------------------------------------

_N_SHARDS = 8


def curriculum_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-ordered curriculum shards: rank the corpus easy→hard by
    ``n_chars`` (tie-break doc_id for determinism) and cut it into 8
    equal-rank shards — the "train short documents first" schedule.
    Emits the per-shard manifest (doc count, char range, total chars)
    a trainer's data loader consumes.

    Scale shape: the global ordering uses :func:`global_rank` (range
    exchange + broadcast offset table — one full-data shuffle, NO
    single-partition window), and the shard id is pure arithmetic on
    the rank, so the whole plan is the same one full sort a 100 TB
    shard-writer would run anyway. Shard = floor((rank-1)·S/total)+1,
    identical to rank arithmetic in the oracle.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = global_rank(docs, ["n_chars", "doc_id"])
    shard = ((F.col("rank") - F.lit(1)) * _N_SHARDS / F.col("_total")).cast(
        "long"
    ) + F.lit(1)
    return (
        ranked.withColumn("shard", shard)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("shard")
    )


CURRICULUM_SHARD_ORACLE = f"""
WITH ranked AS (
  SELECT n_chars,
         row_number() OVER (ORDER BY n_chars, doc_id) AS r,
         count(*) OVER () AS total
  FROM documents
)
SELECT CAST((r - 1) * {_N_SHARDS} // total + 1 AS BIGINT) AS shard,
       count(*) AS n_docs,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM ranked
GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# HLL sketch merge certificate
# --------------------------------------------------------------------------


def hll_distinct_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datasketches HLL distinct-user estimates per event type PLUS a
    merged global sketch (``hll_union_agg`` over the per-type
    sketches), each certified within 5% of the exact distinct count.

    The merge row is the point: at 100 TB you never recount distincts
    globally — you union per-partition/per-day sketches, and this
    query certifies that the union estimate matches a from-scratch
    exact count. The emitted row is the deterministic *certificate*
    (type, ok) rather than the estimate itself, so the oracle is
    hash-checkable even though the estimator is approximate (same
    pattern as the MinHash/SimHash recall certificates).

    Scale shape: sketches are map-side combinable fixed-size state
    (lgK=12 → 4 KB each); the exact side is one distinct-aggregate
    used only as the certificate's ground truth.
    """
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sketch"),
        F.count_distinct("user_id").alias("exact"),
    )
    per_type = sk.select(
        "event_type",
        F.hll_sketch_estimate("sketch").alias("est"),
        "exact",
    )
    merged = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est")
    ).crossJoin(
        F.broadcast(ev.agg(F.count_distinct("user_id").alias("exact")))
    ).select(F.lit("ALL").alias("event_type"), "est", "exact")
    return (
        per_type.unionByName(merged)
        .select(
            "event_type",
            (F.abs(F.col("est") - F.col("exact")) / F.col("exact") <= 0.05).alias(
                "within_5pct"
            ),
        )
        .orderBy("event_type")
    )


HLL_CERTIFICATE_ORACLE = """
SELECT event_type, true AS within_5pct
FROM (SELECT DISTINCT event_type FROM events
      UNION ALL SELECT 'ALL')
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Forward as-of join with tolerance
# --------------------------------------------------------------------------


def asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance: for each ``view`` event, the
    FIRST ``purchase`` by the same user strictly after it and within 6
    hours — pandas ``merge_asof(direction='forward', tolerance='6h')``
    semantics, i.e. "did this view convert, and how fast?".

    Scale shape: the same union-and-carry trick as the backward as-of
    (timeseries.py): tag both streams, ONE shuffle on user_id, scan
    each user's timeline in DESCENDING time order carrying the
    last-seen purchase timestamp (which, scanning downward, is the
    earliest purchase above the current row). Views order before
    purchases at equal timestamps so "strictly after" holds. No range
    join, no per-row subquery — one exchange total, and the tolerance
    filter is applied on the carried value.
    """
    ev = load_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", F.lit(0).alias("is_p")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.lit(1).alias("is_p"),
    )
    tagged = views.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("is_p").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn(
        "next_purchase_ts",
        F.last(F.when(F.col("is_p") == 1, F.col("ts")), ignorenulls=True).over(w),
    )
    return (
        carried.where(F.col("is_p") == 0)
        .where(
            F.col("next_purchase_ts").isNotNull()
            & (
                F.unix_micros("next_purchase_ts") - F.unix_micros("ts")
                <= 21_600_000_000
            )
        )
        .select(
            "event_id",
            "user_id",
            (F.unix_micros("next_purchase_ts") - F.unix_micros("ts")).alias("gap_us"),
        )
    )


ASOF_FORWARD_ORACLE = """
WITH v AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
), p AS (
  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT v.event_id, v.user_id,
       min(epoch_us(p.ts)) - epoch_us(v.ts) AS gap_us
FROM v JOIN p ON p.user_id = v.user_id
              AND p.ts > v.ts
              AND epoch_us(p.ts) - epoch_us(v.ts) <= 21600000000
GROUP BY v.event_id, v.user_id, v.ts
"""


# --------------------------------------------------------------------------
# Chi-square token/source association
# --------------------------------------------------------------------------

_CHI2_MIN_DF = 5
_CHI2_TOPK = 5


def chi2_token_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² association between token presence and source — the classic
    feature-selection statistic ("which tokens are the signature of
    this domain?") used to build domain classifiers and contamination
    probes. 2×2 contingency per (token, source) over document-level
    presence: a = docs in source containing token, with b/c/d from the
    marginals; χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)). Emits the
    top-5 tokens per source by χ² (round-4 tie-break on token).

    Scale shape: explode → DISTINCT (doc, token) → one
    map-combinable count per (token, source); marginals are two more
    small aggregates of that table (token totals, source totals)
    joined back — broadcast-sized. (ad−bc) is cast to double BEFORE
    squaring so the statistic never overflows int64 at corpus scale.
    The top-K window partitions by source over the (token, source)
    table, never the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    pres = (
        docs.select(
            "doc_id",
            "source",
            F.explode(F.array_distinct(F.split("text", " "))).alias("token"),
        )
        .distinct()
    )
    n_docs = docs.agg(F.count("*").alias("n"))
    tok_src = pres.groupBy("token", "source").agg(F.count("*").alias("a"))
    tok_tot = (
        tok_src.groupBy("token")
        .agg(F.sum("a").alias("tok_docs"))
        .where(F.col("tok_docs") >= _CHI2_MIN_DF)
    )
    src_tot = docs.groupBy("source").agg(F.count("*").alias("src_docs"))
    joined = (
        tok_src.join(F.broadcast(tok_tot), "token")
        .join(F.broadcast(src_tot), "source")
        .crossJoin(F.broadcast(n_docs))
    )
    a = F.col("a").cast("double")
    b = (F.col("tok_docs") - F.col("a")).cast("double")
    c = (F.col("src_docs") - F.col("a")).cast("double")
    d = (F.col("n") - F.col("tok_docs") - F.col("src_docs") + F.col("a")).cast("double")
    det = a * d - b * c
    chi2 = (
        F.col("n").cast("double") * det * det / ((a + b) * (c + d) * (a + c) * (b + d))
    )
    scored = joined.select(
        "source", "token", "a", F.round(chi2, 4).alias("chi2")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("chi2").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _CHI2_TOPK)
        .select("source", "token", F.col("a").alias("df_in_source"), "chi2", "rk")
    )


CHI2_TOKEN_SOURCE_ORACLE = f"""
WITH pres AS (
  SELECT DISTINCT doc_id, source, t.token
  FROM documents,
       LATERAL (SELECT unnest(list_distinct(string_split(text, ' '))) AS token) t
), n_docs AS (SELECT count(*) AS n FROM documents),
tok_src AS (
  SELECT token, source, count(*) AS a FROM pres GROUP BY token, source
), tok_tot AS (
  SELECT token, sum(a) AS tok_docs FROM tok_src GROUP BY token
  HAVING sum(a) >= {_CHI2_MIN_DF}
), src_tot AS (
  SELECT source, count(*) AS src_docs FROM documents GROUP BY source
), scored AS (
  SELECT ts.source, ts.token, ts.a,
         round(n * (CAST(a AS DOUBLE) * (n - tok_docs - src_docs + a)
                    - CAST(tok_docs - a AS DOUBLE) * (src_docs - a))
                 * (CAST(a AS DOUBLE) * (n - tok_docs - src_docs + a)
                    - CAST(tok_docs - a AS DOUBLE) * (src_docs - a))
               / (CAST(tok_docs AS DOUBLE) * (n - tok_docs)
                  * src_docs * (n - src_docs)), 4) AS chi2
  FROM tok_src ts JOIN tok_tot USING (token) JOIN src_tot USING (source)
  CROSS JOIN n_docs
), ranked AS (
  SELECT source, token, a AS df_in_source, chi2,
         row_number() OVER (PARTITION BY source ORDER BY chi2 DESC, token) AS rk
  FROM scored
)
SELECT source, token, df_in_source, chi2, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= {_CHI2_TOPK}
"""


# --------------------------------------------------------------------------
# Entity-resolution weighted match
# --------------------------------------------------------------------------


def er_weighted_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution scorecard: for a 1-in-50 sample of customers,
    the best-matching supplier in the SAME nation by a weighted fuzzy
    score — 0.7 · name similarity (1 − levenshtein/max-length) +
    0.3 · balance proximity (1/(1+|Δbal|)). The deterministic
    best-match pick (score desc, then suppkey) is the survivorship
    rule of a record-linkage pipeline.

    Scale shape: BLOCKED comparison on a COMPOSITE key — (nation,
    name-length band of width 4), with the supplier side exploded to
    its ±1 band neighborhood (the geo 3×3 pattern), so candidates are
    complete for any length difference ≤ 3 while the pair space is
    Σ_block |C_b|·|S_b| over much finer blocks than nation alone
    (levenshtein ≥ |length difference|, so a big length gap cannot be
    a close name anyway). With skewed blocks the further fix is
    salting the hot block (joins.py salted_skew_agg shows the
    pattern). Levenshtein runs JVM-side (built-in); scores round to 6
    decimals BEFORE ranking so float noise can never flip the
    cross-engine tie-break. The fixture's names share one length, so
    here the band adds no pruning — it is exercised as the plan shape
    the oracle also enforces.
    """
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 50 == 0)
        .select(
            "c_custkey",
            "c_name",
            F.col("c_nationkey").alias("nationkey"),
            "c_acctbal",
            (F.length("c_name") / 4).cast("int").alias("band"),
        )
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select(
            "s_suppkey",
            "s_name",
            F.col("s_nationkey").alias("nationkey"),
            "s_acctbal",
            (F.length("s_name") / 4).cast("int").alias("sband"),
        )
        .withColumn("band", F.explode(F.array(F.col("sband") - 1, F.col("sband"), F.col("sband") + 1)))
        .drop("sband")
    )
    joined = cust.join(supp, ["nationkey", "band"], "inner")
    name_sim = 1 - F.levenshtein("c_name", "s_name") / F.greatest(
        F.length("c_name"), F.length("s_name")
    )
    bal_sim = 1 / (1 + F.abs(F.col("c_acctbal") - F.col("s_acctbal")))
    score = F.round(0.7 * name_sim + 0.3 * bal_sim, 6)
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("score").desc(), F.col("s_suppkey").asc()
    )
    return (
        joined.withColumn("score", score)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("c_custkey", "s_suppkey", "score")
    )


ER_WEIGHTED_MATCH_ORACLE = """
WITH pairs AS (
  SELECT c.c_custkey, s.s_suppkey,
         round(0.7 * (1 - levenshtein(c.c_name, s.s_name)
                        / greatest(length(c.c_name), length(s.s_name)))
               + 0.3 * (1 / (1 + abs(c.c_acctbal - s.s_acctbal))), 6) AS score
  FROM customer c JOIN supplier s
    ON c.c_nationkey = s.s_nationkey
   AND abs(CAST(length(c.c_name) // 4 AS INT)
           - CAST(length(s.s_name) // 4 AS INT)) <= 1
  WHERE c.c_custkey % 50 = 0
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY c_custkey ORDER BY score DESC, s_suppkey) AS rk
  FROM pairs
)
SELECT c_custkey, s_suppkey, score FROM ranked WHERE rk = 1
"""


# --------------------------------------------------------------------------
# Pareto skyline
# --------------------------------------------------------------------------


def skyline_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline over parts: the Pareto frontier minimizing
    ``p_retailprice`` while maximizing ``p_size`` — every part no
    other part beats on both axes (sourcing's "cheapest at this size
    or bigger" set). Identical (price, size) points all survive, per
    standard skyline semantics.

    Scale shape: NOT the O(n²) dominance self-join. Reduce to one row
    per distinct price (only the max-size row per price can be on the
    frontier) — map-side combinable — then the running "max size at
    any cheaper price" uses a two-phase distributed prefix-max (range
    partition by price, local running max, plus a broadcast ≤ n_part
    per-partition offset table — the ks_drift_test pattern), NEVER a
    single-partition global window, so the distinct-price table can be
    arbitrarily large. A broadcast join back tags the surviving
    (price, size) pairs on the full table.
    """
    part = load_table(spark, sf_dir, "part")
    per_price = part.groupBy("p_retailprice").agg(F.max("p_size").alias("msize"))
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # Bucket id is ARITHMETIC on the key (broadcast min/max scale), not
    # spark_partition_id() over a range exchange: the prefix's local
    # and offset branches re-execute the exchange (no ReusedExchange in
    # this plan shape) and re-sampled boundaries could disagree between
    # them; a data-derived bucket is identical in both by construction.
    bounds = per_price.agg(
        F.min("p_retailprice").alias("lo"), F.max("p_retailprice").alias("hi")
    )
    ranged = per_price.crossJoin(F.broadcast(bounds)).withColumn(
        "_pid",
        F.least(
            F.floor(
                (F.col("p_retailprice") - F.col("lo"))
                / (F.col("hi") - F.col("lo") + 1e-9)
                * n_part
            ).cast("int"),
            F.lit(n_part - 1),
        ),
    )
    w_loc = (
        Window.partitionBy("_pid")
        .orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # Offsets: one row per range partition (metadata) — the running
    # max below runs over <= n_part rows, never the data.
    w_prev = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off = (
        ranged.groupBy("_pid")
        .agg(F.max("msize").alias("pmax"))
        .select("_pid", F.max("pmax").over(w_prev).alias("off_prev"))
    )
    frontier_keys = (
        ranged.withColumn("loc_prev", F.max("msize").over(w_loc))
        .join(F.broadcast(off), "_pid")
        .withColumn("prev_max", F.greatest("loc_prev", "off_prev"))
        .where(F.col("prev_max").isNull() | (F.col("msize") > F.col("prev_max")))
        .select("p_retailprice", F.col("msize").alias("p_size"))
    )
    return part.join(
        F.broadcast(frontier_keys), ["p_retailprice", "p_size"], "inner"
    ).select("p_partkey", "p_retailprice", "p_size")


SKYLINE_ORACLE = """
SELECT p.p_partkey, p.p_retailprice, p.p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
"""


# --------------------------------------------------------------------------
# Cross-source quantile normalization
# --------------------------------------------------------------------------


def quantile_normalize_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization across sources: map each document's
    ``n_chars`` onto the GLOBAL length distribution at the same
    within-source quantile — the standard cross-batch score
    calibration (a p90-long document of a short-form source maps to
    the corpus-wide p90 length). Emits a 1-in-10 doc sample with its
    source-relative rank resolved to the global value.

    Scale shape: per-source percent_rank is an ordinary partitioned
    window; the global distribution uses :func:`global_rank`. The
    "largest global value at quantile ≤ p" lookup is NOT a range join
    — both sides union into one stream ordered by (p, global-first)
    and a two-phase distributed carry (range partition on p, local
    last-non-null, broadcast ≤ n_part per-partition offsets) resolves
    every lookup in one pass. Total cost: two sorts of n rows.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    w_src = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    s_rows = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.percent_rank().over(w_src).alias("p"),
        F.lit(0).alias("is_g"),
        F.lit(None).cast("long").alias("gval"),
    )
    ranked = global_rank(docs.select("n_chars", "doc_id"), ["n_chars", "doc_id"])
    g_rows = ranked.select(
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(None).cast("string").alias("source"),
        F.lit(None).cast("long").alias("n_chars"),
        ((F.col("rank") - 1) / (F.col("_total") - 1)).alias("p"),
        F.lit(1).alias("is_g"),
        F.col("n_chars").alias("gval"),
    )
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # Bucket arithmetically on p ∈ [0,1] (not spark_partition_id over a
    # range exchange): the carry's local and offset branches re-execute
    # the exchange, and re-sampled boundaries could disagree between
    # them — a data-derived bucket cannot.
    both = s_rows.unionByName(g_rows).withColumn(
        "_pid",
        F.least(F.floor(F.col("p") * n_part).cast("int"), F.lit(n_part - 1)),
    )
    w_loc = (
        Window.partitionBy("_pid")
        .orderBy(F.col("p").asc(), F.col("is_g").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Per-partition offsets: the last global value in every earlier
    # range partition (globals are nondecreasing in p, so "last" ==
    # max by p). ≤ n_part metadata rows.
    w_prior = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off = (
        both.groupBy("_pid")
        .agg(F.max_by("gval", F.when(F.col("is_g") == 1, F.col("p"))).alias("pg"))
        .select("_pid", F.last("pg", ignorenulls=True).over(w_prior).alias("prior_g"))
    )
    carried = (
        both.withColumn("loc_g", F.last("gval", ignorenulls=True).over(w_loc))
        .join(F.broadcast(off), "_pid")
        .withColumn("norm_chars", F.coalesce("loc_g", "prior_g"))
    )
    return (
        carried.where((F.col("is_g") == 0) & (F.col("doc_id") % 10 == 0))
        .select("doc_id", "source", "n_chars", "norm_chars")
    )


QUANTILE_NORMALIZE_ORACLE = """
WITH s AS (
  SELECT doc_id, source, n_chars,
         percent_rank() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS pr
  FROM documents
), g AS (
  SELECT n_chars AS gval,
         percent_rank() OVER (ORDER BY n_chars, doc_id) AS gpr
  FROM documents
)
SELECT s.doc_id, s.source, s.n_chars, max(g.gval) AS norm_chars
FROM s JOIN g ON g.gpr <= s.pr
WHERE s.doc_id % 10 = 0
GROUP BY s.doc_id, s.source, s.n_chars
"""


# --------------------------------------------------------------------------
# Embedding per-dimension variance pruning
# --------------------------------------------------------------------------


def embedding_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension variance profile of the embedding matrix — the
    feature-selection pre-flight for dimension pruning / PCA ("which
    of the 64 dims carry the signal?"). Emits the top-16 dims by
    variance with each dim's share of total variance.

    Determinism at scale: float32 values are quantized to e4 integers
    FIRST, so the per-dim Σx and Σx² accumulate as exact int64 —
    reduction order (and engine) cannot change a single bit. The
    variance numerator n·Σx²−(Σx)² stays integer through the ranking
    (ties impossible to flip), and only the final reported values
    divide into doubles. Scale shape: posexplode → one map-side
    combinable groupBy(dim); the ranking window runs over 64 rows.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    xi = F.round(F.col("x").cast("double") * 10000).cast("long")
    per_dim = (
        emb.select(F.posexplode("embedding").alias("dim", "x"))
        .select(F.col("dim").cast("long").alias("dim"), xi.alias("xi"))
        .groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            F.sum("xi").alias("s"),
            F.sum(F.col("xi") * F.col("xi")).alias("q"),
        )
        .select(
            "dim",
            "n",
            (F.col("n") * F.col("q") - F.col("s") * F.col("s")).alias("num"),
        )
    )
    tot = per_dim.agg(F.sum("num").alias("tot_num"))
    w = Window.orderBy(F.col("num").desc(), F.col("dim").asc())
    return (
        per_dim.crossJoin(F.broadcast(tot))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 16)
        .select(
            "dim",
            F.round(F.col("num") / (F.col("n") * F.col("n")) / 1e8, 6).alias("variance"),
            F.round(F.col("num") / F.col("tot_num"), 6).alias("var_share"),
            "rk",
        )
    )


EMBEDDING_DIM_VARIANCE_ORACLE = """
WITH x AS (
  SELECT t.dim - 1 AS dim,
         CAST(round(CAST(t.x AS DOUBLE) * 10000) AS BIGINT) AS xi
  FROM embeddings,
       LATERAL (SELECT unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS dim) t
), per_dim AS (
  SELECT dim, count(*) AS n,
         CAST(n * CAST(sum(xi * xi) AS BIGINT)
              - CAST(sum(xi) AS BIGINT) * CAST(sum(xi) AS BIGINT) AS BIGINT) AS num
  FROM x GROUP BY dim
), tot AS (SELECT CAST(sum(num) AS BIGINT) AS tot_num FROM per_dim),
ranked AS (
  SELECT dim, n, num, tot_num,
         row_number() OVER (ORDER BY num DESC, dim) AS rk
  FROM per_dim CROSS JOIN tot
)
SELECT dim, round(num / (n * n) / 1e8, 6) AS variance,
       round(num / tot_num, 6) AS var_share, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= 16
"""


# --------------------------------------------------------------------------
# Stratified k-fold assignment
# --------------------------------------------------------------------------


def stratified_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold cross-validation assignment stratified by
    label: fold = knuth-hash(vec_id) mod 5, reported as the per
    (label, fold) balance sheet an eval harness checks before
    training. Content-hash folds (not row order) make the split
    identical on any engine, any partitioning, any rerun — the same
    leakage-safety argument as split_train_holdout.

    Scale shape: one map-side combinable groupBy; the per-label share
    join is a broadcast of the |labels|-row total table.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    fold = (F.col("vec_id") * F.lit(2654435761)) % F.lit(2147483647) % F.lit(5)
    per = emb.select("label", fold.alias("fold")).groupBy("label", "fold").agg(
        F.count("*").alias("n")
    )
    tot = emb.groupBy("label").agg(F.count("*").alias("label_n"))
    return (
        per.join(F.broadcast(tot), "label")
        .select(
            "label",
            "fold",
            "n",
            F.round(F.col("n") / F.col("label_n"), 4).alias("share"),
        )
        .orderBy("label", "fold")
    )


STRATIFIED_KFOLD_ORACLE = """
WITH per AS (
  SELECT label, (vec_id * 2654435761) % 2147483647 % 5 AS fold, count(*) AS n
  FROM embeddings GROUP BY 1, 2
), tot AS (
  SELECT label, count(*) AS label_n FROM embeddings GROUP BY label
)
SELECT per.label, per.fold, per.n, round(per.n / tot.label_n, 4) AS share
FROM per JOIN tot USING (label)
ORDER BY label, fold
"""


# --------------------------------------------------------------------------
# Length-bucketed batch planning
# --------------------------------------------------------------------------

_BATCH_TOKENS = 4096


def length_bucket_batch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching plan: round each document's token count up
    to the next power of two (its padding bucket), then report per
    bucket how many batches a 4096-token budget needs and what
    fraction of the padded slots is waste — the planner report that
    decides between bucketed padding and sequence packing
    (sequence_pack_by_source is the packing alternative).

    Integer-exact everywhere: the power-of-two cap uses the bin-length
    trick (len(bin(n−1)) = ⌈log2 n⌉, no floating log), batch counts
    are ceil-divisions, and only the final waste fraction divides into
    a rounded double. Scale shape: one narrow projection + one
    map-side combinable groupBy over ≤ ~20 bucket rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    cap = F.expr(
        "CASE WHEN size(split(text, ' ')) <= 1 THEN CAST(1 AS BIGINT) "
        "ELSE CAST(shiftleft(CAST(1 AS BIGINT), "
        "CAST(length(bin(CAST(size(split(text, ' ')) - 1 AS BIGINT))) AS INT)) "
        "AS BIGINT) END"
    )
    per = (
        docs.select(n_tok.alias("n_tok"), cap.alias("bucket_cap"))
        .groupBy("bucket_cap")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("sum_tokens"))
    )
    docs_per_batch = F.greatest(
        F.lit(1).cast("long"), F.lit(_BATCH_TOKENS).cast("long") / F.col("bucket_cap")
    ).cast("long")
    return per.select(
        "bucket_cap",
        "n_docs",
        "sum_tokens",
        ((F.col("n_docs") + docs_per_batch - 1) / docs_per_batch)
        .cast("long")
        .alias("batches"),
        F.round(
            1
            - F.col("sum_tokens")
            / (F.col("n_docs") * F.col("bucket_cap")),
            4,
        ).alias("waste_frac"),
    ).orderBy("bucket_cap")


LENGTH_BUCKET_ORACLE = f"""
WITH per AS (
  SELECT CASE WHEN len(string_split(text, ' ')) <= 1 THEN 1
              ELSE 1 << length(bin(len(string_split(text, ' ')) - 1))
         END AS bucket_cap,
         len(string_split(text, ' ')) AS n_tok
  FROM documents
), agg AS (
  SELECT CAST(bucket_cap AS BIGINT) AS bucket_cap, count(*) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS sum_tokens
  FROM per GROUP BY 1
)
SELECT bucket_cap, n_docs, sum_tokens,
       CAST((n_docs + greatest(1, {_BATCH_TOKENS} // bucket_cap) - 1)
            // greatest(1, {_BATCH_TOKENS} // bucket_cap) AS BIGINT) AS batches,
       round(1 - sum_tokens / (n_docs * bucket_cap), 4) AS waste_frac
FROM agg ORDER BY bucket_cap
"""


# --------------------------------------------------------------------------
# Per-user feature vector assembly
# --------------------------------------------------------------------------


def user_feature_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store materialization: ONE wide row per user from the
    event stream — type counts (conditional aggregation, not pivot:
    the column set is pinned by the feature contract, not by the
    data), exact int64-cents purchase value, distinct active days, and
    recency against the corpus watermark. This is the offline half of
    a feature store; the online half serves these rows by user_id.

    Scale shape: a single map-side combinable groupBy(user_id) builds
    every feature in one pass over the stream — no per-feature joins,
    no pivot shuffle; the corpus max-date is a broadcast scalar.
    """
    ev = load_table(spark, sf_dir, "events")
    maxd = ev.agg(F.max(F.to_date("ts")).alias("corpus_max_d"))
    feats = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("n_click"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("n_view"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "n_purchase"
        ),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        ).alias("purchase_cents"),
        F.count_distinct(F.to_date("ts")).alias("days_active"),
        F.max(F.to_date("ts")).alias("last_d"),
    )
    return (
        feats.crossJoin(F.broadcast(maxd))
        .select(
            "user_id",
            "n_events",
            "n_click",
            "n_view",
            "n_purchase",
            "purchase_cents",
            "days_active",
            F.datediff("corpus_max_d", "last_d").cast("long").alias("recency_days"),
        )
        .orderBy("user_id")
    )


USER_FEATURE_ORACLE = """
WITH maxd AS (SELECT max(CAST(ts AS DATE)) AS corpus_max_d FROM events)
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_click,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_view,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'purchase'
                THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
         AS purchase_cents,
       count(DISTINCT CAST(ts AS DATE)) AS days_active,
       CAST(corpus_max_d - max(CAST(ts AS DATE)) AS BIGINT) AS recency_days
FROM events CROSS JOIN maxd
GROUP BY user_id, corpus_max_d
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# Retrieval evaluation: MRR + NDCG@5
# --------------------------------------------------------------------------

# 1/log2(r+1) for r=1..5 and their running sums, as FIXED literals —
# log2 is not correctly-rounded libm, so each engine computing the
# discount itself could differ in the last ulp; identical literal
# strings parse to identical doubles everywhere.
_DISC = ("1.0", "0.63092975357", "0.5", "0.43067655807", "0.38685280723")
_IDCG = ("1.0", "1.63092975357", "2.13092975357", "2.56160631164", "2.94845911887")


def retrieval_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation of the exact cosine retriever:
    per query, MRR and NDCG@5 against label-match relevance (a
    candidate is relevant iff it shares the query's label) — the
    metric layer every retriever/reranker change is judged by, run
    distributively over the ranking the engine itself produced
    (similarity.ann_cosine_topk). The ideal DCG uses the query's TRUE
    relevant-count (same-label corpus vectors, self excluded), capped
    at the cutoff.

    Numerics: relevance is integer, MRR is max(rel/rank) (one exact
    division), and the log2 discounts are fixed literals (not engine
    libm calls), so every metric is bit-portable. Scale shape: the
    ranking join is the retriever's own; the metric pass adds two
    broadcast label lookups and one groupBy(q_id) over k rows per
    query.
    """
    from .similarity import ann_cosine_topk

    ranked = ann_cosine_topk(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    q_lab = emb.select(F.col("vec_id").alias("q_id"), F.col("label").alias("q_label"))
    c_lab = emb.select("vec_id", F.col("label").alias("c_label"))
    label_n = emb.groupBy("label").agg(F.count("*").alias("n_label"))
    rel = (F.col("c_label") == F.col("q_label")).cast("int")
    disc = F.expr(
        "CASE rank WHEN 1 THEN {} WHEN 2 THEN {} WHEN 3 THEN {} "
        "WHEN 4 THEN {} ELSE {} END".format(*_DISC)
    )
    idcg = F.expr(
        "CASE least(n_label - 1, 5) WHEN 0 THEN NULL WHEN 1 THEN {} "
        "WHEN 2 THEN {} WHEN 3 THEN {} WHEN 4 THEN {} ELSE {} END".format(*_IDCG)
    )
    return (
        ranked.join(F.broadcast(q_lab), "q_id")
        .join(F.broadcast(c_lab), "vec_id")
        .join(F.broadcast(label_n), F.col("q_label") == F.col("label"))
        .select(
            "q_id",
            "rank",
            rel.alias("rel"),
            disc.alias("disc"),
            idcg.alias("idcg"),
        )
        .groupBy("q_id")
        .agg(
            F.round(F.max(F.col("rel") / F.col("rank")), 4).alias("mrr"),
            F.round(
                F.coalesce(F.sum(F.col("rel") * F.col("disc")) / F.first("idcg"), F.lit(0.0)),
                4,
            ).alias("ndcg_at_5"),
        )
        .orderBy("q_id")
    )


RETRIEVAL_NDCG_ORACLE = f"""
WITH emb AS (SELECT vec_id, embedding, label FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS q_vec, label AS q_label
      FROM emb WHERE vec_id < 10),
ranked AS (
  SELECT q_id, vec_id, q_label, c_label, rank FROM (
    SELECT q.q_id, e.vec_id, q.q_label, e.label AS c_label,
           row_number() OVER (
             PARTITION BY q.q_id
             ORDER BY {{cos}} DESC, e.vec_id ASC) AS rank
    FROM emb e CROSS JOIN q WHERE e.vec_id <> q.q_id
  ) WHERE rank <= 5
),
label_n AS (SELECT label, count(*) AS n_label FROM emb GROUP BY label)
SELECT q_id,
       round(max(CASE WHEN c_label = q_label THEN 1.0 / rank ELSE 0 END), 4)
         AS mrr,
       round(coalesce(
         sum(CASE WHEN c_label = q_label THEN
               CASE rank WHEN 1 THEN {_DISC[0]} WHEN 2 THEN {_DISC[1]}
                    WHEN 3 THEN {_DISC[2]} WHEN 4 THEN {_DISC[3]}
                    ELSE {_DISC[4]} END ELSE 0 END)
         / max(CASE least(n_label - 1, 5) WHEN 0 THEN NULL
                    WHEN 1 THEN {_IDCG[0]} WHEN 2 THEN {_IDCG[1]}
                    WHEN 3 THEN {_IDCG[2]} WHEN 4 THEN {_IDCG[3]}
                    ELSE {_IDCG[4]} END), 0.0), 4) AS ndcg_at_5
FROM ranked JOIN label_n ON label_n.label = ranked.q_label
GROUP BY q_id
ORDER BY q_id
"""
RETRIEVAL_NDCG_ORACLE = RETRIEVAL_NDCG_ORACLE.replace(
    "{cos}",
    """round(
  list_sum(list_transform(range(1, len(q.q_vec) + 1),
           i -> q.q_vec[i]::DOUBLE * e.embedding[i]::DOUBLE))
  / (sqrt(list_sum(list_transform(q.q_vec, x -> x::DOUBLE * x::DOUBLE)))
     * sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))), 4)""",
)


# --------------------------------------------------------------------------
# Classifier evaluation: precision / recall / F1
# --------------------------------------------------------------------------


def classifier_pr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 of the hashed linear quality classifier
    (training.linear_quality_classifier's margin rule) against a
    deterministic quality proxy (distinct-token ratio ≥ 0.55 — the
    repetition gate) — the confusion-matrix layer a model-backed
    curation gate ships with. All four cells are exact integer counts;
    precision/recall/F1 are single rational divisions (F1 computed as
    2·tp/(2·tp+fp+fn) — one division, no compounding).

    Scale shape: the classifier's own explode→hash→groupBy(doc) pass
    plus one row-level proxy projection; the confusion matrix is a
    4-integer aggregate.
    """
    from .text import _hex4_bucket, _tokens
    from .training import _W_SQL

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens()).alias("token"))
    w = F.expr(_W_SQL.format(b=_hex4_bucket("token", 64)))
    margins = (
        tok.select("doc_id", w.alias("w"))
        .groupBy("doc_id")
        .agg(F.sum("w").cast("long").alias("margin"))
    )
    toks = _tokens()
    truth = docs.select(
        "doc_id",
        (F.size(F.array_distinct(toks)) * 100 >= F.size(toks) * 55).cast("int").alias(
            "is_good"
        ),
    )
    cells = (
        margins.join(truth, "doc_id")
        .select(
            (F.col("margin") > 0).cast("int").alias("pred"),
            "is_good",
        )
        .agg(
            F.sum(F.expr("CASE WHEN pred = 1 AND is_good = 1 THEN 1 ELSE 0 END")).alias("tp"),
            F.sum(F.expr("CASE WHEN pred = 1 AND is_good = 0 THEN 1 ELSE 0 END")).alias("fp"),
            F.sum(F.expr("CASE WHEN pred = 0 AND is_good = 1 THEN 1 ELSE 0 END")).alias("fn"),
            F.sum(F.expr("CASE WHEN pred = 0 AND is_good = 0 THEN 1 ELSE 0 END")).alias("tn"),
        )
    )
    return cells.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(F.col("tp") / (F.col("tp") + F.col("fp")), 4).alias("precision"),
        F.round(F.col("tp") / (F.col("tp") + F.col("fn")), 4).alias("recall"),
        F.round(2 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")), 4).alias("f1"),
    )


def _classifier_pr_oracle() -> str:
    # The margin expression must be the classifier's own portable SQL
    # (training._LINEAR_W = weight-of-hash-bucket), not a re-derivation.
    from .training import _LINEAR_W

    return _CLASSIFIER_PR_ORACLE_TEMPLATE.format(w=_LINEAR_W)


_CLASSIFIER_PR_ORACLE_TEMPLATE = """
WITH tok AS (
  SELECT doc_id, t.token
  FROM documents,
       LATERAL (SELECT unnest(string_split(text, ' ')) AS token) t
), margins AS (
  SELECT doc_id, CAST(sum({w}) AS BIGINT) AS margin
  FROM tok GROUP BY doc_id
), truth AS (
  SELECT doc_id,
         CASE WHEN len(list_distinct(string_split(text, ' '))) * 100
                   >= len(string_split(text, ' ')) * 55
              THEN 1 ELSE 0 END AS is_good
  FROM documents
), cells AS (
  SELECT
    CAST(sum(CASE WHEN margin > 0 AND is_good = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
    CAST(sum(CASE WHEN margin > 0 AND is_good = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
    CAST(sum(CASE WHEN margin <= 0 AND is_good = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
    CAST(sum(CASE WHEN margin <= 0 AND is_good = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM margins JOIN truth USING (doc_id)
)
SELECT tp, fp, fn, tn,
       round(tp / (tp + fp), 4) AS precision,
       round(tp / (tp + fn), 4) AS recall,
       round(2 * tp / (2 * tp + fp + fn), 4) AS f1
FROM cells
"""

CLASSIFIER_PR_ORACLE = _classifier_pr_oracle()


# --------------------------------------------------------------------------
# Classifier evaluation: exact tie-corrected AUC (Mann-Whitney)
# --------------------------------------------------------------------------


def classifier_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of the hashed linear quality classifier's raw
    margin against the same repetition-proxy truth ``classifier_pr_eval``
    uses — the threshold-free companion to that query's fixed-cutoff
    confusion matrix (a curation gate is tuned by sweeping the margin
    threshold; AUC is the number that says whether sweeping can help
    at all). Computed as the tie-corrected Mann-Whitney U statistic
    over midranks: AUC = (Σ_pos midrank − n_pos(n_pos+1)/2) /
    (n_pos·n_neg).

    Numerics: margins are exact int64 sums, so ranking happens on a
    VALUE-LEVEL table (one row per distinct margin). Midranks carry a
    half for even tie groups, so everything is kept DOUBLED and
    integral: 2·midrank(v) = 2·cum_below(v) + cnt(v) + 1, and the
    positive-weighted sum Σ pos_v·2mr_v accumulates in decimal(38,0)
    (the sum is Θ(n²) in doc count — past int64 at ~3e9 docs, and
    DuckDB widens the same sum to hugeint; decimal keeps the engines
    bit-identical instead of silently wrapping). The single division
    happens once at the end in double, like the reference statistic.

    Scale shape: the classifier's own explode→hash→groupBy(doc) pass
    plus the row-level proxy, reduced to the value-level table FIRST
    (map-side combinable; cardinality is bounded by the integer margin
    RANGE — weights are ±500-bounded per token — not by doc count, so
    it is metadata-scale and persisting it is safe where persisting
    ks_drift_test's value table would not be). The cumulative counts
    use the same two-phase distributed prefix sum as ``ks_drift_test``
    (arithmetic range bucket from broadcast min/max, local running
    totals, broadcast per-bucket offsets — a window over ≤ n_part
    metadata rows, never a single-partition global window), so the
    plan survives any margin cardinality anyway.

    Degenerate inputs (ADVICE r13): a single-class corpus (n_pos = 0
    or n_neg = 0) has no defined AUC — the Mann-Whitney denominator is
    an empty pair set. NULL is the DEFINED output for that case, made
    explicit with the same CASE guard in both engines (rather than
    relying on either engine's divide-by-zero behavior). Both classes
    exist on every pinned fixture, so the guard is latent there by
    construction.

    Cache lifecycle (ADVICE r13): the two persists below (value-level
    table + per-bucket totals) are bounded — margin-range × 1 row and
    ≤ n_part rows — but repeated invocations in one long session would
    accumulate CacheManager entries, and stray cache entries are
    exactly what can trip :func:`core.global_rank`'s InMemoryRelation
    refusal for unrelated plans sharing a subtree. Each call therefore
    rotates out the frames the PREVIOUS call persisted
    (``_rotate_persists``), bounding the leak to one invocation.
    """
    from .text import _hex4_bucket, _tokens
    from .training import _W_SQL

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens()).alias("token"))
    w = F.expr(_W_SQL.format(b=_hex4_bucket("token", 64)))
    margins = (
        tok.select("doc_id", w.alias("w"))
        .groupBy("doc_id")
        .agg(F.sum("w").cast("long").alias("margin"))
    )
    toks = _tokens()
    truth = docs.select(
        "doc_id",
        (F.size(F.array_distinct(toks)) * 100 >= F.size(toks) * 55).cast("int").alias(
            "is_good"
        ),
    )
    perv = (
        margins.join(truth, "doc_id")
        .groupBy("margin")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("is_good").cast("long").alias("pos"),
        )
        .persist()
    )
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    vbounds = perv.agg(F.min("margin").alias("vlo"), F.max("margin").alias("vhi"))
    ranged = perv.crossJoin(F.broadcast(vbounds)).withColumn(
        "_pid",
        F.least(
            F.floor(
                (F.col("margin") - F.col("vlo"))
                / (F.col("vhi") - F.col("vlo") + 1e-9)
                * n_part
            ).cast("int"),
            F.lit(n_part - 1),
        ),
    )
    w_loc = (
        Window.partitionBy("_pid")
        .orderBy("margin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.select(
        "margin",
        "_pid",
        "cnt",
        "pos",
        F.sum("cnt").over(w_loc).alias("loc_c"),
    )
    # Per-bucket totals (≤ n_part rows — metadata). Persisted: feeds
    # the offset window AND the class totals without re-running the
    # value-level aggregation.
    pidtot = (
        ranged.groupBy("_pid")
        .agg(
            F.sum("cnt").alias("tc"),
            F.sum("pos").alias("tp"),
            F.sum((F.col("cnt") >= 2).cast("int")).alias("ttied"),
        )
        .persist()
    )
    _rotate_persists("classifier_auc_eval", perv, pidtot)
    w_cum = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    off = pidtot.select(
        "_pid",
        (F.sum("tc").over(w_cum) - F.col("tc")).alias("off_c"),
    )
    tot = pidtot.agg(
        F.sum("tp").cast("long").alias("n_pos"),
        (F.sum("tc") - F.sum("tp")).cast("long").alias("n_neg"),
        F.sum("ttied").cast("long").alias("n_tied_values"),
    )
    # 2·midrank = 2·cum_below + cnt + 1 where cum_below = loc_c +
    # off_c − cnt; the pos-weighted sum is the doubled rank-sum.
    u2 = (
        local.join(F.broadcast(off), "_pid")
        .select(
            (
                F.col("pos").cast("decimal(38,0)")
                * (2 * (F.col("loc_c") + F.col("off_c")) - F.col("cnt") + 1).cast(
                    "decimal(38,0)"
                )
            ).alias("term")
        )
        .agg(F.sum("term").alias("u2r"))
    )
    numer2 = (
        F.col("u2r").cast("double")
        - (F.col("n_pos").cast("double") * (F.col("n_pos") + 1))
    )
    defined = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    return (
        tot.crossJoin(F.broadcast(u2))
        .select(
            "n_pos",
            "n_neg",
            "n_tied_values",
            F.when(
                defined,
                F.round(numer2 / (2.0 * F.col("n_pos") * F.col("n_neg")), 4),
            ).alias("auc"),
            F.when(
                defined,
                F.round(
                    numer2 / (1.0 * F.col("n_pos") * F.col("n_neg")) - 1.0, 4
                ),
            ).alias("gini"),
        )
    )


def _classifier_auc_oracle() -> str:
    from .training import _LINEAR_W

    return _CLASSIFIER_AUC_ORACLE_TEMPLATE.format(w=_LINEAR_W)


_CLASSIFIER_AUC_ORACLE_TEMPLATE = """
WITH tok AS (
  SELECT doc_id, t.token
  FROM documents,
       LATERAL (SELECT unnest(string_split(text, ' ')) AS token) t
), margins AS (
  SELECT doc_id, CAST(sum({w}) AS BIGINT) AS margin
  FROM tok GROUP BY doc_id
), truth AS (
  SELECT doc_id,
         CASE WHEN len(list_distinct(string_split(text, ' '))) * 100
                   >= len(string_split(text, ' ')) * 55
              THEN 1 ELSE 0 END AS is_good
  FROM documents
), perv AS (
  SELECT margin, count(*) AS cnt, sum(is_good) AS pos
  FROM margins JOIN truth USING (doc_id)
  GROUP BY margin
), cum AS (
  SELECT margin, cnt, pos,
         sum(cnt) OVER (ORDER BY margin) - cnt AS below
  FROM perv
), tot AS (
  SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
         CAST(sum(cnt) - sum(pos) AS BIGINT) AS n_neg,
         CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_tied_values
  FROM perv
), num AS (
  SELECT sum(pos * (2 * below + cnt + 1)) AS u2r FROM cum
)
SELECT n_pos, n_neg, n_tied_values,
       CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         round((CAST(u2r AS DOUBLE) - 1.0 * n_pos * (n_pos + 1))
               / (2.0 * n_pos * n_neg), 4) END AS auc,
       CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         round((CAST(u2r AS DOUBLE) - 1.0 * n_pos * (n_pos + 1))
               / (1.0 * n_pos * n_neg) - 1.0, 4) END AS gini
FROM num, tot
"""

CLASSIFIER_AUC_ORACLE = _classifier_auc_oracle()


# --------------------------------------------------------------------------
# Per-source ROC-AUC: the gate-tuning variant (VERDICT r13 #7)
# --------------------------------------------------------------------------


def classifier_auc_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`classifier_auc_eval` partitioned by ``source`` — the
    per-source threshold-tuning audit a real curation pipeline runs
    before setting per-domain gates (VERDICT r13 #7): a classifier
    with a healthy corpus-global AUC can still be non-discriminative
    on one source, and the global number cannot show that. Same exact
    tie-corrected doubled-midrank Mann-Whitney statistic, same
    decimal(38,0) accumulation; the only structural change is that
    every stage keys by ``source``.

    Scale shape: the value-level reduction groups by (source, margin)
    — still map-side combinable, and the per-source value table is
    bounded by the integer margin RANGE (±500/token weights), not by
    the source's doc count, so the per-source cumulative runs as an
    ordinary ``Window.partitionBy(source).orderBy(margin)`` over
    metadata-scale rows: parallel across sources, never a
    single-partition global window, and immune to source skew (a 10×
    bigger source has the same value-level cardinality bound). The
    corpus-global query needs its two-phase arithmetic-bucket prefix
    sum precisely because it lacks a partitioning key; here the group
    key IS the partitioner, so the plan is one data-sized shuffle
    (the doc-level agg) plus metadata-scale everything after.

    Degenerate groups: a single-class SOURCE is likely in practice
    (and possible on small fixtures) — its auc/gini are NULL by the
    same explicit both-engine CASE guard as the global query, and the
    row still reports its n_pos/n_neg so the caller can see why.
    """
    from .text import _hex4_bucket, _tokens
    from .training import _W_SQL

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens()).alias("token"))
    w = F.expr(_W_SQL.format(b=_hex4_bucket("token", 64)))
    margins = (
        tok.select("doc_id", w.alias("w"))
        .groupBy("doc_id")
        .agg(F.sum("w").cast("long").alias("margin"))
    )
    toks = _tokens()
    truth = docs.select(
        "doc_id",
        F.col("source"),
        (F.size(F.array_distinct(toks)) * 100 >= F.size(toks) * 55).cast("int").alias(
            "is_good"
        ),
    )
    perv = (
        margins.join(truth, "doc_id")
        .groupBy("source", "margin")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("is_good").cast("long").alias("pos"),
        )
    )
    w_cum = (
        Window.partitionBy("source")
        .orderBy("margin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = perv.select(
        "source",
        "cnt",
        "pos",
        (F.sum("cnt").over(w_cum) - F.col("cnt")).alias("below"),
    )
    # 2·midrank = 2·below + cnt + 1; pos-weighted doubled rank-sum per
    # source, plus the class totals — one metadata-scale aggregate.
    agg = cum.groupBy("source").agg(
        F.sum("pos").cast("long").alias("n_pos"),
        (F.sum("cnt") - F.sum("pos")).cast("long").alias("n_neg"),
        F.sum((F.col("cnt") >= 2).cast("int")).cast("long").alias("n_tied_values"),
        F.sum(
            F.col("pos").cast("decimal(38,0)")
            * (2 * F.col("below") + F.col("cnt") + 1).cast("decimal(38,0)")
        ).alias("u2r"),
    )
    numer2 = (
        F.col("u2r").cast("double")
        - (F.col("n_pos").cast("double") * (F.col("n_pos") + 1))
    )
    defined = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    return agg.select(
        "source",
        "n_pos",
        "n_neg",
        "n_tied_values",
        F.when(
            defined,
            F.round(numer2 / (2.0 * F.col("n_pos") * F.col("n_neg")), 4),
        ).alias("auc"),
        F.when(
            defined,
            F.round(numer2 / (1.0 * F.col("n_pos") * F.col("n_neg")) - 1.0, 4),
        ).alias("gini"),
    )


def _classifier_auc_by_source_oracle() -> str:
    from .training import _LINEAR_W

    return _CLASSIFIER_AUC_BY_SOURCE_ORACLE_TEMPLATE.format(w=_LINEAR_W)


_CLASSIFIER_AUC_BY_SOURCE_ORACLE_TEMPLATE = """
WITH tok AS (
  SELECT doc_id, t.token
  FROM documents,
       LATERAL (SELECT unnest(string_split(text, ' ')) AS token) t
), margins AS (
  SELECT doc_id, CAST(sum({w}) AS BIGINT) AS margin
  FROM tok GROUP BY doc_id
), truth AS (
  SELECT doc_id, source,
         CASE WHEN len(list_distinct(string_split(text, ' '))) * 100
                   >= len(string_split(text, ' ')) * 55
              THEN 1 ELSE 0 END AS is_good
  FROM documents
), perv AS (
  SELECT source, margin, count(*) AS cnt, sum(is_good) AS pos
  FROM margins JOIN truth USING (doc_id)
  GROUP BY source, margin
), cum AS (
  SELECT source, cnt, pos,
         sum(cnt) OVER (PARTITION BY source ORDER BY margin) - cnt AS below
  FROM perv
), agg AS (
  SELECT source,
         CAST(sum(pos) AS BIGINT) AS n_pos,
         CAST(sum(cnt) - sum(pos) AS BIGINT) AS n_neg,
         CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_tied_values,
         sum(pos * (2 * below + cnt + 1)) AS u2r
  FROM cum GROUP BY source
)
SELECT source, n_pos, n_neg, n_tied_values,
       CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         round((CAST(u2r AS DOUBLE) - 1.0 * n_pos * (n_pos + 1))
               / (2.0 * n_pos * n_neg), 4) END AS auc,
       CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         round((CAST(u2r AS DOUBLE) - 1.0 * n_pos * (n_pos + 1))
               / (1.0 * n_pos * n_neg) - 1.0, 4) END AS gini
FROM agg
"""

CLASSIFIER_AUC_BY_SOURCE_ORACLE = _classifier_auc_by_source_oracle()


# --------------------------------------------------------------------------
# Quality-signal agreement: exact tie-corrected Spearman correlation
# --------------------------------------------------------------------------


def quality_signal_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-corrected Spearman rank correlation between two
    quality signals — the stopword/length heuristic
    (``text_quality_score``) and the hashed linear classifier's margin
    (``linear_quality_classifier``'s rule) — the scorer-agreement
    audit a curation pipeline runs before stacking filters: near-±1
    means the second gate is redundant, near-0 means it cuts an
    independent axis. (On the fixtures the untrained hash margin
    tracks document LENGTH, which the score also saturates on, so the
    measured agreement is real signal, not noise.)

    Numerics: both signals are integer-exact (int64 margin; the 4-dp
    score in basis points), so midranks are exact — computed as
    ``min(rank)+max(rank)`` per value over :func:`core.global_rank`
    (a tie group occupies consecutive global ranks, so min+max IS the
    doubled midrank, deterministic even though intra-tie order is
    not). Spearman = Pearson on midranks; the three invariants
    n·Σxy−Σx·Σy, n·Σx²−(Σx)², n·Σy²−(Σy)² are computed in
    decimal(38,0) (hugeint-exact vs DuckDB, int64-safe past ~3e4
    docs, decimal-exact to ~1e9), and doubling both rank vectors
    cancels exactly, so the single rounded double division at the end
    is the only float step — spelled sqrt(denx)·sqrt(deny) in BOTH
    engines so no factoring difference can flip the 4th decimal.

    Scale shape: the doc-level signal table feeds 3 consumers (two
    rank passes + the rank join-back) and is deliberately NOT
    persisted: global_rank's offsets/data branches stay consistent
    only when Spark reuses the range exchange, and a cached or
    ExistingRDD input breaks that reuse — each physical exchange then
    resamples range boundaries under a different RDD-id seed and the
    ranks silently stop being a permutation (global_rank now refuses
    such inputs; tests/test_semantics.py pins the hazard). The ×3
    recompute of the signal tree is the ks_drift_test trade. Each
    signal ranks via global_rank's single range exchange (never a
    single-partition window), and the per-VALUE midrank tables are
    metadata-scale (score has ≤ 10,001 levels by construction; margin
    levels are bounded by the ±500-per-token weight range), so they
    broadcast back onto the docs — no additional data-sized shuffle.
    """
    from .text import _hex4_bucket, _tokens, text_quality_score
    from .training import _W_SQL

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens()).alias("token"))
    w = F.expr(_W_SQL.format(b=_hex4_bucket("token", 64)))
    margins = (
        tok.select("doc_id", w.alias("w"))
        .groupBy("doc_id")
        .agg(F.sum("w").cast("long").alias("x"))
    )
    score_i = text_quality_score(spark, sf_dir).select(
        "doc_id", F.round(F.col("score") * 10000).cast("long").alias("y")
    )
    sig = margins.join(score_i, "doc_id")
    # The level count rides ON the metadata-scale midrank table (a
    # window over value-level rows, never the data) so the final agg
    # needs no count_distinct — mixing count_distinct into the sums
    # would plan an Expand that triples the doc-level agg input.
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rx = (
        global_rank(sig.select("x"), ["x"])
        .groupBy("x")
        .agg((F.min("rank") + F.max("rank")).alias("mr2x"))
        .withColumn("nx", F.count(F.lit(1)).over(w_all))
    )
    ry = (
        global_rank(sig.select("y"), ["y"])
        .groupBy("y")
        .agg((F.min("rank") + F.max("rank")).alias("mr2y"))
        .withColumn("ny", F.count(F.lit(1)).over(w_all))
    )
    dx = F.col("mr2x").cast("decimal(38,0)")
    dy = F.col("mr2y").cast("decimal(38,0)")
    sums = (
        sig.join(F.broadcast(rx), "x")
        .join(F.broadcast(ry), "y")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.first("nx").alias("nx"),
            F.first("ny").alias("ny"),
            F.sum(dx).alias("sx"),
            F.sum(dy).alias("sy"),
            F.sum(dx * dx).alias("sxx"),
            F.sum(dy * dy).alias("syy"),
            F.sum(dx * dy).alias("sxy"),
        )
    )
    nd = F.col("n").cast("decimal(38,0)")
    num = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    # Degenerate inputs (ADVICE r13): a CONSTANT signal has zero rank
    # variance and no defined correlation — NULL is the defined output,
    # spelled with the same guard in both engines rather than left to
    # divide-by-zero behavior. Both signals vary on every fixture.
    return sums.select(
        F.col("n").alias("n_docs"),
        F.col("nx").alias("n_margin_levels"),
        F.col("ny").alias("n_score_levels"),
        F.when(
            (denx > 0) & (deny > 0),
            F.round(num / (F.sqrt(denx) * F.sqrt(deny)), 4),
        ).alias("spearman_rho"),
    )


def _quality_spearman_oracle() -> str:
    from .training import _LINEAR_W

    return _QUALITY_SPEARMAN_ORACLE_TEMPLATE.format(w=_LINEAR_W)


_QUALITY_SPEARMAN_ORACLE_TEMPLATE = """
WITH tok AS (
  SELECT doc_id, t.token
  FROM documents,
       LATERAL (SELECT unnest(string_split(text, ' ')) AS token) t
), margins AS (
  SELECT doc_id, CAST(sum({w}) AS BIGINT) AS x
  FROM tok GROUP BY doc_id
), score AS (
  SELECT doc_id,
         CAST(round(round(least(1.0, len(string_split(text, ' ')) / 100.0)
               * (1.0 - len(list_filter(string_split(text, ' '),
                                        t -> t IN ('the','a','and','of')))
                 / len(string_split(text, ' '))), 4) * 10000, 0) AS BIGINT) AS y
  FROM documents
), sig AS (
  SELECT m.doc_id, m.x, s.y FROM margins m JOIN score s USING (doc_id)
), rnx AS (
  SELECT x, row_number() OVER (ORDER BY x) AS rn FROM sig
), mrx AS (
  SELECT x, min(rn) + max(rn) AS mr2x FROM rnx GROUP BY x
), rny AS (
  SELECT y, row_number() OVER (ORDER BY y) AS rn FROM sig
), mry AS (
  SELECT y, min(rn) + max(rn) AS mr2y FROM rny GROUP BY y
), r AS (
  SELECT sig.doc_id, mrx.mr2x, mry.mr2y
  FROM sig JOIN mrx USING (x) JOIN mry USING (y)
), sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(mr2x) AS sx, sum(mr2y) AS sy,
         sum(mr2x * mr2x) AS sxx, sum(mr2y * mr2y) AS syy,
         sum(mr2x * mr2y) AS sxy
  FROM r
)
SELECT n AS n_docs,
       (SELECT CAST(count(*) AS BIGINT) FROM mrx) AS n_margin_levels,
       (SELECT CAST(count(*) AS BIGINT) FROM mry) AS n_score_levels,
       CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
             AND CAST(n * syy - sy * sy AS DOUBLE) > 0 THEN
         round(CAST(n * sxy - sx * sy AS DOUBLE)
               / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 4)
       END AS spearman_rho
FROM sums
"""

QUALITY_SPEARMAN_ORACLE = _quality_spearman_oracle()


QUERIES: dict = {
    "target_encode_smoothed": (target_encode_smoothed, TARGET_ENCODE_ORACLE),
    "retrieval_ndcg_eval": (retrieval_ndcg_eval, RETRIEVAL_NDCG_ORACLE),
    "classifier_pr_eval": (classifier_pr_eval, CLASSIFIER_PR_ORACLE),
    "classifier_auc_eval": (classifier_auc_eval, CLASSIFIER_AUC_ORACLE),
    "classifier_auc_by_source": (
        classifier_auc_by_source,
        CLASSIFIER_AUC_BY_SOURCE_ORACLE,
    ),
    "quality_signal_spearman": (quality_signal_spearman, QUALITY_SPEARMAN_ORACLE),
    "user_feature_vector": (user_feature_vector, USER_FEATURE_ORACLE),
    "quantile_normalize_scores": (quantile_normalize_scores, QUANTILE_NORMALIZE_ORACLE),
    "embedding_dim_variance": (embedding_dim_variance, EMBEDDING_DIM_VARIANCE_ORACLE),
    "stratified_kfold_assign": (stratified_kfold_assign, STRATIFIED_KFOLD_ORACLE),
    "length_bucket_batch_plan": (length_bucket_batch_plan, LENGTH_BUCKET_ORACLE),
    "negative_sampling_pairs": (negative_sampling_pairs, NEGATIVE_SAMPLING_ORACLE),
    "curriculum_shard_plan": (curriculum_shard_plan, CURRICULUM_SHARD_ORACLE),
    "hll_distinct_certificate": (hll_distinct_certificate, HLL_CERTIFICATE_ORACLE),
    "asof_forward_tolerance": (asof_forward_tolerance, ASOF_FORWARD_ORACLE),
    "chi2_token_source": (chi2_token_source, CHI2_TOKEN_SOURCE_ORACLE),
    "er_weighted_match": (er_weighted_match, ER_WEIGHTED_MATCH_ORACLE),
    "skyline_pareto_frontier": (skyline_pareto_frontier, SKYLINE_ORACLE),
}
