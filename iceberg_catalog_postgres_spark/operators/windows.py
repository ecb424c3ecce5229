"""Window functions: ranking, analytic (lag/lead), framed aggregates.

SURVEY.md §2.C "Window functions". All window specs shuffle once on the
partition key and sort within partitions — Catalyst collapses adjacent window
operators sharing a (partitionBy, orderBy) into one sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.registry import load, register


@register(
    "window_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rn
    FROM (
      SELECT c_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY c_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM customer JOIN orders ON c_custkey = o_custkey
    )
    WHERE rn <= 3
    """,
    tags=("window", "topk", "bench"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number — THE top-k-per-group idiom.

    Scale: one shuffle on c_custkey; Spark inserts a WindowGroupLimit
    (rank-limit pushdown) so each partition only keeps 3 rows per key before
    the filter — no full materialization of ranked rows.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "rn")
    )


@register(
    "window_rank_dense_ntile",
    oracle="""
    SELECT s_suppkey,
           rank()       OVER (ORDER BY s_acctbal DESC, s_suppkey ASC) AS rnk,
           dense_rank() OVER (ORDER BY s_nationkey ASC)               AS drnk,
           ntile(4)     OVER (ORDER BY s_acctbal DESC, s_suppkey ASC) AS quartile
    FROM supplier
    """,
    tags=("window", "rank"),
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile over a GLOBAL ordering — via the
    bucket-and-stitch recipe, so even global ranking runs no
    un-partitioned data-proportional window (r6; previously the
    documented single-reducer exemplar).

    - rank: value-range bucket on the order key (equal values share a
      bucket, so ties never span buckets and rank = per-bucket rank +
      prior-bucket row count); the only ordered pass over "everything" is
      the per-bucket totals window (<= 32 rows).
    - dense_rank over nationkey: the offset IS the rank of the distinct
      value — a distinct-values frame (bounded by nation cardinality)
      ranked and broadcast back.
    - ntile(k): pure arithmetic on the stitched global row_number with the
      scalar total (Spark's extras-to-first-buckets distribution),
      certified equal to the built-in by the unchanged oracle.
    """
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_acctbal", "s_nationkey"
    )
    # Global stats ride the plan as a broadcast 1-row aggregate instead of
    # an eager .first() (r18, VERDICT r17 item 8): one driver-blocking job
    # fewer per invocation; the scalars (row count, balance range) become
    # columns of a crossJoined stats row. Arithmetic is unchanged — all in
    # fp64 — so buckets and the ntile distribution are identical; an empty
    # input now just flows zero rows (the old Python float(None) hazard
    # cannot occur because nothing leaves the plan).
    nb = 32
    stats = s.agg(
        F.count("*").alias("__n"),
        F.min("s_acctbal").cast("double").alias("__lo"),
        F.max("s_acctbal").cast("double").alias("__hi"),
    )
    b = s.crossJoin(F.broadcast(stats))
    width = (F.col("__hi") - F.col("__lo")) / nb
    width = F.when(width == 0.0, F.lit(1.0)).otherwise(width)
    b = b.withColumn(
        "bkt",
        F.least(
            F.floor((F.col("s_acctbal") - F.col("__lo")) / width), F.lit(nb - 1)
        ).cast("long"),
    )
    w_local = Window.partitionBy("bkt").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey").asc()
    )
    local = b.select(
        "s_suppkey",
        "s_nationkey",
        "bkt",
        "__n",
        F.rank().over(w_local).alias("rnk_local"),
        F.row_number().over(w_local).alias("rn_local"),
    )
    totals = b.groupBy("bkt").agg(F.count("*").alias("bkt_n"))
    w_bkts = Window.orderBy(F.col("bkt").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "bkt", F.coalesce(F.sum("bkt_n").over(w_bkts), F.lit(0)).alias("off_n")
    )
    # dense_rank(nationkey) == rank of the DISTINCT value: tiny frame,
    # ranked once, broadcast back
    nat_rank = (
        s.select("s_nationkey")
        .distinct()
        .select(
            "s_nationkey",
            F.row_number()
            .over(Window.orderBy(F.col("s_nationkey").asc()))
            .alias("drnk"),
        )
    )
    rn = F.col("off_n") + F.col("rn_local")
    k = 4
    # ntile arithmetic on the stats COLUMNS (same fp64 ops the Python
    # scalars performed: col / int was already double division + truncate)
    q = F.floor(F.col("__n") / k).cast("long")
    r = (F.col("__n") % k).cast("long")
    quartile = F.when(rn <= r * (q + 1), ((rn - 1) / (q + 1)).cast("long")).otherwise(
        r + ((rn - r * (q + 1) - 1) / F.greatest(q, F.lit(1))).cast("long")
    ) + 1
    return (
        local.join(F.broadcast(offsets), "bkt")
        .join(F.broadcast(nat_rank), "s_nationkey")
        .select(
            "s_suppkey",
            (F.col("off_n") + F.col("rnk_local")).cast("int").alias("rnk"),
            F.col("drnk").cast("int"),
            quartile.cast("int").alias("quartile"),
        )
    )


@register(
    "window_lag_lead_delta",
    oracle="""
    SELECT user_id, event_id,
           lag(event_id)  OVER w AS prev_event_id,
           lead(event_id) OVER w AS next_event_id,
           CAST(coalesce(date_diff('millisecond', lag(ts) OVER w, ts), -1) AS BIGINT) AS ms_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
    tags=("window", "analytic"),
)
def window_lag_lead_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with inter-event time deltas per user — sessionization's
    building block.

    Scale: partitions on user_id; skewed (hot) users are bounded by the
    per-user event count, and the window state for lag/lead is O(1).
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "user_id",
        "event_id",
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
        F.coalesce(
            F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w)), F.lit(-1)
        ).alias("ms_since_prev"),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
    tags=("window", "frame"),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum per customer over order history."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("running_total")
    )


@register(
    "window_moving_avg",
    oracle="""
    SELECT user_id, event_id,
           round(avg(value) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mavg3
    FROM events
    """,
    tags=("window", "frame"),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average of event values per user (bounded ROWS frame)."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select("user_id", "event_id", F.round(F.avg("value").over(w), 6).alias("mavg3"))


@register(
    "window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           count(*) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS n_similar_price
    FROM orders
    """,
    tags=("window", "frame", "range"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering — peers within +-10000 of each
    order's price. RANGE (value-based) vs ROWS (count-based) frames."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice")).rangeBetween(-10000, 10000)
    return o.select("o_custkey", "o_orderkey", F.count(F.lit(1)).over(w).alias("n_similar_price"))


@register(
    "window_first_last_value",
    oracle="""
    SELECT DISTINCT o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
    tags=("window", "analytic"),
)
def window_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with an explicit full frame (the last_value
    default frame ends at CURRENT ROW — a classic correctness trap)."""
    o = load(spark, sf_dir, "orders")
    order_cols = [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()]
    w_first = Window.partitionBy("o_custkey").orderBy(*order_cols)
    w_full = (
        Window.partitionBy("o_custkey")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        F.first("o_orderkey").over(w_first).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
    ).distinct()


@register(
    "window_moving_median",
    oracle="""
    SELECT user_id, event_id,
           round(median(value) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS med4
    FROM events
    WHERE event_type = 'purchase' AND user_id < 50
    """,
    tags=("window", "median"),
)
def window_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT moving median over a 4-row trailing frame per user — the
    robust-smoothing window a metrics pipeline uses where a moving average
    would chase outliers. Exact (not approx) median as a frame aggregate;
    ordering pinned by (ts, event_id) so both engines walk identical
    frames.

    Scale: frame medians keep O(frame) state per row — fine for small
    frames; for wide frames production swaps in a sliding t-digest. The
    user_id partition bounds the sort, same shuffle as any per-entity
    window.
    """
    ev = load(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 50)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-3, 0)
    )
    # Spark's median() rejects window frames; the exact frame median is a
    # sorted collect_list + middle pick (frames are 4 rows, so the state is
    # trivially bounded — the trick generalizes to any small frame)
    arr = F.sort_array(F.collect_list("value").over(w))
    n = F.size(arr)
    half = F.floor(n / 2).cast("int")
    med = F.when(
        n % 2 == 1, F.element_at(arr, half + 1)
    ).otherwise((F.element_at(arr, half) + F.element_at(arr, half + 1)) / 2.0)
    return ev.select(
        "user_id",
        "event_id",
        F.round(med, 4).alias("med4"),
    )
