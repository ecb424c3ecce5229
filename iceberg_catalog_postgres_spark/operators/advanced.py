"""Advanced relational patterns: correlated subqueries (decorrelated),
pivot/unpivot, statistical aggregates, distribution window functions,
calendar spines, map parsing, SQL-string entry points, sampling.

These complete the SURVEY §2.C inventory beyond the core suites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.registry import load, register


@register(
    "subq_correlated_scalar_avg",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11'
      AND l.l_quantity < (
        SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
      )
    """,
    tags=("advanced", "subquery"),
)
def subq_correlated_scalar_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average),
    manually decorrelated into an aggregate + join — exactly the rewrite
    Catalyst performs on the SQL form.

    Scale: the naive correlated form is O(n) subquery executions; the
    decorrelated form is one groupBy(partkey) + one equi-join, both keyed on
    partkey so AQE can reuse/co-locate the exchanges.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    per_part = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg_qty")
    )
    return (
        li.join(part, part.p_partkey == li.l_partkey)
        .join(per_part, F.col("ap_key") == li.l_partkey)
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@register(
    "subq_min_per_group_joinback",
    oracle="""
    SELECT s.s_nationkey, s.s_suppkey, s.s_name, round(s.s_acctbal, 2) AS s_acctbal
    FROM supplier s
    WHERE s.s_acctbal = (
      SELECT min(s2.s_acctbal) FROM supplier s2 WHERE s2.s_nationkey = s.s_nationkey
    )
    """,
    tags=("advanced", "subquery"),
)
def subq_min_per_group_joinback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: row(s) achieving the per-group minimum, via
    aggregate-then-join-back decorrelation.

    Scale: groupBy(nationkey).min + equi-join on (nationkey, acctbal); the
    aggregated side is tiny (one row per group) so AQE broadcasts it.
    """
    s = load(spark, sf_dir, "supplier")
    mins = s.groupBy(F.col("s_nationkey").alias("mk")).agg(F.min("s_acctbal").alias("min_bal"))
    return (
        s.join(mins, (s.s_nationkey == F.col("mk")) & (s.s_acctbal == F.col("min_bal")))
        .select("s_nationkey", "s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


@register(
    "pivot_segment_status",
    oracle="""
    SELECT c_mktsegment,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS status_F,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS status_O,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS status_P
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
    tags=("advanced", "pivot"),
)
def pivot_segment_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per market segment x order status.

    The pivot values are DECLARED (['F','O','P']) — an undeclared pivot
    first runs a distinct scan to discover values, an extra full pass at
    100 TB and a plan that can't be cached across runs.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    piv = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return piv.select(
        "c_mktsegment",
        F.coalesce("F", F.lit(0)).alias("status_F"),
        F.coalesce("O", F.lit(0)).alias("status_O"),
        F.coalesce("P", F.lit(0)).alias("status_P"),
    )


@register(
    "unpivot_measures_long",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, round(val, 4) AS val
    FROM (
      SELECT l_orderkey, l_linenumber,
             unnest(['quantity', 'price', 'discount']) AS measure,
             unnest([l_quantity, l_extendedprice, l_discount]) AS val
      FROM lineitem WHERE l_orderkey <= 50
    )
    """,
    tags=("advanced", "unpivot"),
)
def unpivot_measures_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide measure columns -> long (measure, value) rows —
    the inverse of pivot, map-side only (no shuffle)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 50)
    return (
        li.unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount"],
            "measure_col",
            "val",
        )
        .withColumn(
            "measure",
            F.when(F.col("measure_col") == "l_quantity", "quantity")
            .when(F.col("measure_col") == "l_extendedprice", "price")
            .otherwise("discount"),
        )
        .select("l_orderkey", "l_linenumber", "measure", F.round("val", 4).alias("val"))
    )


@register(
    "agg_corr_covar",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)       AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS price_per_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("advanced", "statistics"),
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics: correlation, sample covariance, regression
    slope — single-pass mergeable moment aggregates (partial-agg friendly,
    unlike rank-based statistics)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
        F.round(F.expr("regr_slope(l_extendedprice, l_quantity)"), 6).alias("price_per_qty"),
    )


@register(
    "window_percent_rank_cume",
    oracle="""
    SELECT s_suppkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal ASC, s_suppkey ASC)
    """,
    tags=("advanced", "window"),
)
def window_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist distribution window functions — via the
    bucket-and-stitch global row_number (r6): the ORDER key
    (acctbal, suppkey) is total, so percent_rank = (rn-1)/(n-1) and
    cume_dist = rn/n with rn = value-range-bucket local row_number +
    prior-bucket count offset. No un-partitioned data window; the only
    ordered pass runs over the <= 32 per-bucket totals."""
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    n, lo, hi = s.agg(F.count("*"), F.min("s_acctbal"), F.max("s_acctbal")).first()
    if not n:
        return spark.createDataFrame(
            [], "s_suppkey long, pct_rank double, cume double"
        )
    nb = 32
    width = (float(hi) - float(lo)) / nb or 1.0
    b = s.withColumn(
        "bkt",
        F.least(F.floor((F.col("s_acctbal") - float(lo)) / width), F.lit(nb - 1)).cast(
            "long"
        ),
    )
    w_local = Window.partitionBy("bkt").orderBy(
        F.col("s_acctbal").asc(), F.col("s_suppkey").asc()
    )
    local = b.select("s_suppkey", "bkt", F.row_number().over(w_local).alias("rn_local"))
    totals = b.groupBy("bkt").agg(F.count("*").alias("bkt_n"))
    w_bkts = Window.orderBy(F.col("bkt").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "bkt", F.coalesce(F.sum("bkt_n").over(w_bkts), F.lit(0)).alias("off_n")
    )
    rn = (F.col("off_n") + F.col("rn_local")).cast("double")
    return (
        local.join(F.broadcast(offsets), "bkt")
        .select(
            "s_suppkey",
            F.round((rn - 1) / max(int(n) - 1, 1), 6).alias("pct_rank"),
            F.round(rn / int(n), 6).alias("cume"),
        )
    )


@register(
    "window_nth_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           nth_value(o_totalprice, 2) OVER w AS second_price,
           last_value(o_totalprice) OVER w AS latest_price
    FROM orders
    WHERE o_custkey <= 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("advanced", "window"),
)
def window_nth_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / nth_value / last_value navigation window functions over
    an explicit whole-partition frame: per customer, the first order's
    price, the second's (NULL for single-order customers), and the latest's.
    The explicit UNBOUNDED..UNBOUNDED frame matters — last_value under the
    default frame (..CURRENT ROW) is a classic silent-wrong-answer.

    Scale: one shuffle on o_custkey serves all three functions; navigation
    functions add no extra pass over the sorted partition.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.last("o_totalprice").over(w).alias("latest_price"),
    )


@register(
    "date_spine_monthly",
    oracle="""
    WITH spine AS (
      SELECT unnest(generate_series(TIMESTAMP '1995-01-01', TIMESTAMP '2001-12-01',
                                    INTERVAL 1 MONTH)) AS month_start
    )
    SELECT strftime(month_start, '%Y-%m-%d') AS month_start,
           coalesce(n_orders, 0) AS n_orders
    FROM spine
    LEFT JOIN (
      SELECT date_trunc('month', o_orderdate) AS m, count(*) AS n_orders
      FROM orders GROUP BY 1
    ) o ON o.m = spine.month_start
    """,
    tags=("advanced", "calendar"),
)
def date_spine_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar spine: generated month sequence LEFT-joined to data so empty
    months appear as zeros — the gap-filling idiom for time series.

    Scale: the spine is generated (84 rows), broadcast against the
    aggregated fact side; generation via explode(sequence(...)) costs no I/O.
    """
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("timestamp"),
                F.lit("2001-12-01").cast("timestamp"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("month_start")
    )
    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("m")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return (
        F.broadcast(spine)
        .join(monthly, monthly.m == spine.month_start, "left_outer")
        .select(
            F.date_format("month_start", "yyyy-MM-dd").alias("month_start"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        )
    )


@register(
    "fn_str_to_map",
    oracle="""
    SELECT event_id,
           regexp_extract(kv, 'type=([^,]*)', 1) AS type_val,
           regexp_extract(kv, 'val=([^,]*)', 1)  AS val_str
    FROM (
      SELECT event_id, 'type=' || event_type || ',val=' || CAST(CAST(trunc(value) AS INT) AS VARCHAR) AS kv
      FROM events WHERE event_id < 100
    )
    """,
    tags=("advanced", "map"),
)
def fn_str_to_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """str_to_map: parse 'k=v,k2=v2' strings into MapType and extract keys
    (the config-string / query-string parsing idiom). Oracle extracts the
    same values with regex since DuckDB lacks str_to_map."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    kv = F.concat(
        F.lit("type="), F.col("event_type"), F.lit(",val="), F.col("value").cast("int").cast("string")
    )
    m = F.expr("str_to_map(kv, ',', '=')")
    return (
        ev.withColumn("kv", kv)
        .select(
            "event_id",
            F.element_at(m, "type").alias("type_val"),
            F.element_at(m, "val").alias("val_str"),
        )
    )


@register(
    "sql_exists_subquery_text",
    oracle="""
    SELECT n_name, count(*) AS n_suppliers
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE EXISTS (
      SELECT 1 FROM customer WHERE c_nationkey = s_nationkey AND c_acctbal > 9000
    )
    GROUP BY n_name
    """,
    tags=("advanced", "sql"),
)
def sql_exists_subquery_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-string entry point (spark.sql) with a correlated EXISTS —
    Catalyst decorrelates it to a left-semi join automatically; this query
    exists to prove the SQL surface, not just the DataFrame one.
    (EXISTS idiom: reference mod.rs:113-128.)"""
    load(spark, sf_dir, "supplier").createOrReplaceTempView("sqlx_supplier")
    load(spark, sf_dir, "nation").createOrReplaceTempView("sqlx_nation")
    load(spark, sf_dir, "customer").createOrReplaceTempView("sqlx_customer")
    return spark.sql(
        """
        SELECT n_name, count(*) AS n_suppliers
        FROM sqlx_supplier JOIN sqlx_nation ON s_nationkey = n_nationkey
        WHERE EXISTS (
          SELECT 1 FROM sqlx_customer WHERE c_nationkey = s_nationkey AND c_acctbal > 9000
        )
        GROUP BY n_name
        """
    )


@register(
    "sample_deterministic_count",
    oracle="""
    SELECT true AS count_in_range, true AS avg_close
    FROM lineitem LIMIT 1
    """,
    tags=("advanced", "sampling"),
)
def sample_deterministic_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli sampling with a fixed seed: sample(0.1, seed=42). The
    selected rows are engine-specific (Spark's RNG), so the oracle checks the
    sampling CONTRACT instead of row identity: the sampled count within 1%
    absolute of fraction*N (~8 binomial sd at sf0.01), and the sampled mean
    within 5% of the population mean. A broken sampler (wrong fraction,
    skewed selection) flips a boolean and goes red.

    Scale: sampling is map-side (each partition samples independently) —
    the cheap first step of any profiling/sketching pass over 100 TB.
    """
    li = load(spark, sf_dir, "lineitem")
    s = li.sample(fraction=0.1, seed=42)
    stats = li.agg(
        F.count(F.lit(1)).alias("n_total"), F.avg("l_quantity").alias("pop_avg")
    )
    sampled = s.agg(
        F.count(F.lit(1)).alias("sampled_rows"), F.avg("l_quantity").alias("samp_avg")
    )
    return sampled.crossJoin(F.broadcast(stats)).select(
        (
            F.abs(F.col("sampled_rows") - 0.1 * F.col("n_total")) / F.col("n_total") <= 0.01
        ).alias("count_in_range"),
        (
            F.abs(F.col("samp_avg") - F.col("pop_avg")) / F.col("pop_avg") <= 0.05
        ).alias("avg_close"),
    )


@register(
    "ids_monotonic_unique",
    oracle="""
    SELECT count(*) AS n_rows, count(*) AS n_distinct_ids FROM part
    """,
    tags=("advanced", "ids"),
)
def ids_monotonic_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """monotonically_increasing_id: distributed unique id assignment with no
    coordination (partition id in the high bits). The checkable invariant is
    uniqueness — id VALUES are partition-layout-dependent, so the output is
    (row count, distinct-id count) which the oracle knows must be equal.

    Scale: this is how you assign ids to 100 TB without a global counter;
    row_number() over an empty window (the tempting alternative) funnels
    everything through ONE task.
    """
    p = load(spark, sf_dir, "part").withColumn("rid", F.monotonically_increasing_id())
    return p.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("rid").alias("n_distinct_ids"),
    )


@register(
    "recursive_cte_month_series",
    oracle="""
    WITH RECURSIVE bounds AS (
      SELECT date_trunc('month', min(o_orderdate)) AS lo,
             date_trunc('month', max(o_orderdate)) AS hi
      FROM orders
    ),
    months(m) AS (
      SELECT lo FROM bounds
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months WHERE m < (SELECT hi FROM bounds)
    )
    SELECT strftime(m, '%Y-%m') AS month_start,
           count(o.o_orderkey) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 4) AS revenue
    FROM months LEFT JOIN orders o ON date_trunc('month', o.o_orderdate) = m
    GROUP BY m ORDER BY month_start
    """,
    tags=("advanced", "recursive", "spark4"),
)
def recursive_cte_month_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.1 `WITH RECURSIVE`) calendar gap-fill: generate
    every month between the first and last order date, then left-join order
    counts/revenue so empty months surface as zero rows — the standard
    time-series densification an analytics engine needs.

    Spark's recursive CTEs support UNION ALL only (no UNION-distinct), so
    this uses a strictly monotone recursion (month + 1) that terminates by
    construction; cyclic closures stay on the iterative DataFrame path
    (`llm/clusters.py::connected_components`).

    Scale: the recursion materializes one row per month (tiny); the
    left join broadcasts the month spine against the fact table, so the
    fact scan stays single-pass with its aggregation pushed partial.
    """
    import uuid as _uuid

    view = f"orders_rec_{_uuid.uuid4().hex[:8]}"
    load(spark, sf_dir, "orders").createOrReplaceTempView(view)
    return spark.sql(f"""
        WITH RECURSIVE bounds AS (
          SELECT date_trunc('month', min(o_orderdate)) AS lo,
                 date_trunc('month', max(o_orderdate)) AS hi
          FROM {view}
        ),
        months (m) AS (
          SELECT lo FROM bounds
          UNION ALL
          SELECT m + INTERVAL '1' MONTH FROM months WHERE m < (SELECT hi FROM bounds)
        )
        SELECT date_format(m, 'yyyy-MM') AS month_start,
               count(o.o_orderkey) AS n_orders,
               round(coalesce(sum(o.o_totalprice), 0), 4) AS revenue
        FROM months LEFT JOIN {view} o ON date_trunc('month', o.o_orderdate) = m
        GROUP BY m ORDER BY month_start
    """)


@register(
    "sql_lateral_topn",
    oracle="""
    SELECT r.r_name, t.n_name, t.total_balance
    FROM region r, LATERAL (
      SELECT n.n_name, round(sum(c.c_acctbal), 2) AS total_balance
      FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
      WHERE n.n_regionkey = r.r_regionkey
      GROUP BY n.n_name
      ORDER BY total_balance DESC, n.n_name ASC
      LIMIT 2
    ) t
    """,
    tags=("sql", "lateral", "topn"),
)
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL:1999 lateral join, Spark 3.4+):
    for every region, the top-2 nations by total customer balance — the
    per-row-subquery formulation analysts write, executed through Spark's
    DecorrelateInnerQuery rewrite (the optimizer turns the per-row LIMIT
    into a partitioned rank under the hood, so it does NOT run one query
    per outer row).

    Scale: after decorrelation this is the same window-rank shape as
    ``window_topk_per_group`` — one keyed shuffle — which is exactly why
    exposing the LATERAL surface costs nothing at 100 TB: the optimizer
    normalizes both spellings to the same plan family.
    """
    load(spark, sf_dir, "region").createOrReplaceTempView("v_region")
    load(spark, sf_dir, "nation").createOrReplaceTempView("v_nation")
    load(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT r.r_name, t.n_name, t.total_balance
        FROM v_region r, LATERAL (
          SELECT n.n_name, round(sum(c.c_acctbal), 2) AS total_balance
          FROM v_nation n JOIN v_customer c ON c.c_nationkey = n.n_nationkey
          WHERE n.n_regionkey = r.r_regionkey
          GROUP BY n.n_name
          ORDER BY total_balance DESC, n.n_name ASC
          LIMIT 2
        ) t
        """
    )
