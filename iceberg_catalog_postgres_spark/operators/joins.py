"""The join zoo: equi (inner/outer), broadcast, semi/anti, cross, non-equi
range/interval, and as-of joins.

SURVEY.md §2.C "Joins". Reference analogue: the catalog's composite-PK point
lookups (``/root/reference/src/catalog/mod.rs:107-136``) generalize to hash /
sort-merge joins; the as-of join has no Spark primitive and is built from a
window trick (SURVEY §7 hard-point #3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.registry import load, register


@register(
    "join_right_outer",
    oracle="""
    SELECT n_name, count(c_custkey) AS n_customers
    FROM customer
    RIGHT OUTER JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("join", "outer"),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join preserving nations with zero customers."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey, "right_outer")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cust_n AS (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1),
         supp_n AS (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT coalesce(cust_n.k, supp_n.k) AS nationkey,
           coalesce(n_cust, 0) AS n_cust,
           coalesce(n_supp, 0) AS n_supp
    FROM cust_n FULL OUTER JOIN supp_n ON cust_n.k = supp_n.k
    """,
    tags=("join", "outer"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides + coalesce of keys.

    Scale: aggregating BEFORE the join shrinks both sides to |distinct keys|
    — the join runs on the reduced sets, not the raw tables.
    """
    cust = (
        load(spark, sf_dir, "customer").groupBy(F.col("c_nationkey").alias("k")).agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        load(spark, sf_dir, "supplier").groupBy(F.col("s_nationkey").alias("k")).agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cust.join(supp, cust.k == supp.k, "full_outer").select(
        F.coalesce(cust.k, supp.k).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@register(
    "join_broadcast_dim_enrich",
    oracle="""
    SELECT r_name, count(*) AS n_suppliers, round(sum(s_acctbal), 2) AS total_bal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    tags=("join", "broadcast"),
)
def join_broadcast_dim_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast() of constant-size dims — zero shuffle on the fact
    side until the final tiny aggregation.

    Scale: nation (25) and region (5) never grow with SF; the broadcast hint
    removes two shuffle exchanges that a sort-merge plan would need.
    """
    s = load(spark, sf_dir, "supplier")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region"))
    return (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_suppliers"), F.round(F.sum("s_acctbal"), 2).alias("total_bal"))
    )


@register(
    "join_cross_grid",
    oracle="""
    SELECT r_name, seg.c_mktsegment AS mktsegment
    FROM region
    CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) seg
    """,
    tags=("join", "cross"),
)
def join_cross_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join building a dimension grid (both sides tiny by construction).

    Scale: cross joins are only ever safe when one side is provably bounded;
    here both sides are <= a few dozen rows at any SF (region is constant,
    segments are an enum).
    """
    r = load(spark, sf_dir, "region").select("r_name")
    seg = load(spark, sf_dir, "customer").select(F.col("c_mktsegment").alias("mktsegment")).distinct()
    return r.crossJoin(F.broadcast(seg))


@register(
    "join_non_equi_band",
    oracle="""
    WITH bands(band_name, lo, hi) AS (
      VALUES ('tiny', 0.0, 50000.0), ('mid', 50000.0, 250000.0), ('big', 250000.0, 1000000.0)
    )
    SELECT band_name, count(*) AS n_orders, round(avg(o_totalprice), 6) AS avg_price
    FROM orders
    JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band_name
    """,
    tags=("join", "non-equi"),
)
def join_non_equi_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/band join: fact rows matched to [lo, hi) ranges.

    Scale: the range table is broadcast, so the non-equi condition evaluates
    as a BroadcastNestedLoopJoin with a 3-row inner — O(n * bands) map-side
    work, no shuffle. A non-broadcastable range side would need interval
    bucketing (map each row to overlapping bucket ids, then equi-join).
    """
    o = load(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("tiny", 0.0, 50000.0), ("mid", 50000.0, 250000.0), ("big", 250000.0, 1000000.0)],
        "band_name string, lo double, hi double",
    )
    return (
        o.join(F.broadcast(bands), (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi))
        .groupBy("band_name")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.avg("o_totalprice"), 6).alias("avg_price"))
    )


@register(
    "join_range_interval",
    oracle="""
    SELECT o_orderkey, count(*) AS n_shipped_30d
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
                 AND l_shipdate >= o_orderdate
                 AND l_shipdate < o_orderdate + INTERVAL 30 DAY
    GROUP BY o_orderkey
    """,
    tags=("join", "range"),
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + time-range residual: lineitems shipped within 30 days of
    their order.

    Scale: the equality on orderkey drives the shuffle/hash join; the range
    predicate is a cheap residual filter evaluated per matched pair — this is
    the scalable shape for interval joins (never a pure cross product).
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate >= o.o_orderdate)
            & (li.l_shipdate < F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")),
        )
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_shipped_30d"))
    )


@register(
    "join_asof_last_event",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           e.event_id AS last_error_id,
           CAST(date_diff('millisecond', e.ts, p.ts) AS BIGINT) AS ms_since_error
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id AND p.ts >= e.ts
    """,
    tags=("join", "asof"),
)
def join_asof_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the most recent prior-or-equal error by
    the same user. No Spark primitive (SURVEY §7 #3) — implemented as the
    union+window trick:

    1. Tag both streams, union them, sort within user by (ts, tag).
    2. last(error_cols, ignorenulls) over rows-unbounded-preceding carries the
       latest error forward.
    3. Keep purchase rows that saw at least one error.

    Scale: one shuffle on user_id + one within-partition sort — O(n log n)
    per partition, versus the O(n*m) naive non-equi join. Window state is one
    row (the carried error), so no memory blowup on hot users.
    """
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("is_p"), F.lit(None).cast("long").alias("err_id"),
        F.lit(None).cast(ev.schema["ts"].dataType).alias("err_ts"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", F.lit(0).alias("is_p"), F.col("event_id").alias("err_id"),
        F.col("ts").alias("err_ts"),
    )
    # Order ties (same ts) with the error first so p.ts >= e.ts includes equality.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_p").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = purchases.unionByName(errors).withColumn(
        "last_err_id", F.last("err_id", ignorenulls=True).over(w)
    ).withColumn("last_err_ts", F.last("err_ts", ignorenulls=True).over(w))
    return (
        merged.filter((F.col("is_p") == 1) & F.col("last_err_id").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.col("last_err_id").alias("last_error_id"),
            ((F.unix_millis("ts")) - F.unix_millis("last_err_ts")).alias("ms_since_error"),
        )
    )


@register(
    "join_self_consecutive",
    oracle="""
    SELECT a.l_orderkey,
           a.l_linenumber AS line_a,
           b.l_linenumber AS line_b,
           round(a.l_extendedprice + b.l_extendedprice, 2) AS pair_price
    FROM lineitem a
    JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
    WHERE a.l_orderkey <= 100
    """,
    tags=("join", "self"),
)
def join_self_consecutive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join pairing consecutive line numbers within an order.

    Scale: both sides shuffle on the same key (l_orderkey) — Catalyst plans a
    single exchange reused by both branches of the self-join.
    """
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    a = li.alias("a")
    b = li.alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("b.l_linenumber") == F.col("a.l_linenumber") + 1),
    ).select(
        F.col("a.l_orderkey").alias("l_orderkey"),
        F.col("a.l_linenumber").alias("line_a"),
        F.col("b.l_linenumber").alias("line_b"),
        F.round(F.col("a.l_extendedprice") + F.col("b.l_extendedprice"), 2).alias("pair_price"),
    )


@register(
    "join_asof_forward_tolerance",
    oracle="""
    SELECT event_id, user_id, next_purchase_id, gap_ms FROM (
      SELECT e.event_id, e.user_id, p.event_id AS next_purchase_id,
             CAST(date_diff('millisecond', e.ts, p.ts) AS BIGINT) AS gap_ms,
             row_number() OVER (
               PARTITION BY e.event_id ORDER BY p.ts ASC, p.event_id ASC) AS rk
      FROM (SELECT * FROM events WHERE event_type = 'error') e
      JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON e.user_id = p.user_id AND p.ts >= e.ts
       AND p.ts <= e.ts + INTERVAL 30 MINUTE
    ) WHERE rk = 1
    """,
    tags=("join", "asof", "tolerance"),
)
def join_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance: for each error, the NEXT purchase
    by the same user within 30 minutes (the recovery-tracking twin of the
    backward ``join_asof_last_event``; pandas ``merge_asof
    direction='forward', tolerance=...`` semantics).

    Same union+window trick, time-reversed: sort within user by (ts DESC,
    kind, event_id DESC) and carry the last-seen purchase — which, in
    reversed order, is the NEAREST FUTURE purchase (equal timestamps
    resolve purchase-first, then lowest event id, mirrored exactly in the
    oracle's rank order). The tolerance is a post-filter on the carried
    gap, so unmatched-and-too-far errors drop together.

    Scale: identical economics to the backward variant — one user_id
    shuffle + one in-partition sort, O(1) carried state per row; the naive
    alternative is a non-equi self-join that explodes on hot users.
    """
    ev = load(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts",
        F.lit(1).alias("is_err"),
        F.lit(None).cast("long").alias("p_id"),
        F.lit(None).cast(ev.schema["ts"].dataType).alias("p_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts",
        F.lit(0).alias("is_err"),
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("is_err").asc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        errors.unionByName(purchases)
        .withColumn("next_p_id", F.last("p_id", ignorenulls=True).over(w))
        .withColumn("next_p_ts", F.last("p_ts", ignorenulls=True).over(w))
    )
    gap = F.unix_millis("next_p_ts") - F.unix_millis("ts")
    return (
        merged.filter(
            (F.col("is_err") == 1)
            & F.col("next_p_id").isNotNull()
            & (gap <= 30 * 60 * 1000)
        )
        .select(
            "event_id",
            "user_id",
            F.col("next_p_id").alias("next_purchase_id"),
            gap.alias("gap_ms"),
        )
    )


@register(
    "basket_part_pairs",
    oracle="""
    SELECT part_a, part_b, n_orders FROM (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(count(DISTINCT a.l_orderkey) AS BIGINT) AS n_orders,
             row_number() OVER (
               ORDER BY count(DISTINCT a.l_orderkey) DESC,
                        a.l_partkey ASC, b.l_partkey ASC) AS rk
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ) WHERE rk <= 20
    """,
    tags=("join", "basket", "co-occurrence"),
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top-20 part pairs bought together
    in the same order — the keyed self-join (on orderkey, never cross) +
    pair dedup (a < b) + distinct-order count that seeds any
    frequently-bought-together model.

    Scale: the self-join shuffles on the basket key, so the pair space is
    sum over baskets of k², bounded by basket size (lineitem maxes at 7
    lines/order) — the same bounded-block argument as LSH buckets; at web
    scale you cap or sample oversized baskets exactly like oversized LSH
    buckets. Final top-k is a TakeOrdered, not a global sort.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.countDistinct("a.l_orderkey").alias("n_orders"))
    )
    # top-k as orderBy+limit -> TakeOrderedAndProject (per-partition heaps
    # + tiny driver merge), never a global row_number window over the full
    # pair space (r6: the window form was the last sort-everything top-k)
    return (
        pairs.orderBy(
            F.col("n_orders").desc(), F.col("part_a").asc(), F.col("part_b").asc()
        )
        .limit(20)
        .select("part_a", "part_b", "n_orders")
    )


@register(
    "join_fuzzy_levenshtein_blocked",
    oracle="""
    WITH orig AS (SELECT DISTINCT p_name AS name FROM part),
    var AS (
      SELECT DISTINCT substr(p_name, 1, length(p_name) - 1) || 'X' AS vname
      FROM part
    ),
    pairs AS (
      SELECT o.name, v.vname
      FROM orig o JOIN var v
        ON split_part(o.name, ' ', 1) = split_part(v.vname, ' ', 1)
       AND abs(length(o.name) - length(v.vname)) <= 1
      WHERE levenshtein(o.name, v.vname) <= 1
    )
    SELECT CAST(count(*) AS BIGINT)                 AS n_pairs,
           CAST(count(DISTINCT vname) AS BIGINT)    AS n_variants_matched,
           CAST((SELECT count(*) FROM var) AS BIGINT) AS n_variants_total,
           true                                     AS all_variants_found
    FROM pairs
    """,
    tags=("joins", "fuzzy", "levenshtein", "entity-resolution", "llm"),
)
def join_fuzzy_levenshtein_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOCKED fuzzy join on edit distance — entity resolution's core
    operator (matching dirty names/titles against a reference set without
    an all-pairs scan). A variant set is derived deterministically from the
    part names (last character replaced with 'X' — one edit away), then
    joined back: the join is an EQUI-join on a blocking key (first token +
    length band ±1) with the expensive ``levenshtein`` predicate evaluated
    only WITHIN blocks. Every variant must find its original (edit distance
    1, same first token, certified ``all_variants_found``); near-identical
    sibling names may legitimately match too — the count is the oracle's.

    Scale: the only shuffle is the equi-join on the blocking key; the
    Levenshtein UDF-free JVM expression (`F.levenshtein`, codegen'd) runs
    per candidate pair, and the length-band predicate is a join condition,
    not a post-filter, so Catalyst keeps it in the join. All-pairs edit
    distance at 10^9 names is O(n^2) and impossible; blocking makes it
    O(sum of block^2) with first-token blocks — the standard ER trade,
    with the block-size audit pattern available from `dedup_minhash`'s
    bucket-cap machinery if a token degenerates.
    """
    names = load(spark, sf_dir, "part").select("p_name").distinct()
    orig = names.select(F.col("p_name").alias("name"))
    var = names.select(
        F.concat(
            F.expr("substr(p_name, 1, length(p_name) - 1)"), F.lit("X")
        ).alias("vname")
    ).distinct()
    o = orig.withColumn("blk", F.split("name", " ").getItem(0))
    v = var.withColumn("blk", F.split("vname", " ").getItem(0))
    pairs = (
        o.join(
            v,
            (o.blk == v.blk)
            & (
                F.abs(F.length(o.name) - F.length(v.vname)) <= F.lit(1)
            ),
        )
        .filter(F.levenshtein("name", "vname") <= 1)
    )
    stats = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("vname").alias("n_variants_matched"),
    )
    totals = var.agg(F.count(F.lit(1)).alias("n_variants_total"))
    # stay lazy (1-row x 1-row broadcast zip) so the blocked-join plan is
    # the query's plan — no driver-side collect
    return stats.crossJoin(F.broadcast(totals)).select(
        "n_pairs",
        "n_variants_matched",
        "n_variants_total",
        (F.col("n_variants_matched") == F.col("n_variants_total")).alias(
            "all_variants_found"
        ),
    )
