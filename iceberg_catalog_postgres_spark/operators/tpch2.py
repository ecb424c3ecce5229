"""Second TPC-H-style batch: market share, top revenue nations, order-month
share, quantity-fraction, and waiting-orders shapes, adapted to the fixture
schemas (no partsupp / l_commitdate / l_receiptdate — see FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.registry import load, register


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year, round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                         / sum(volume), 6) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
    ) all_nations
    GROUP BY o_year
    """,
    tags=("tpch", "join", "conditional-agg"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: one nation's share of regional volume per year — an 8-relation
    join tree with a conditional-aggregate ratio.

    Scale: the deepest join tree in the suite; Catalyst's CBO + AQE order
    it so filtered dims (region='ASIA', p_type) prune early, and the two
    nation roles broadcast. The ratio is two partial-aggregable sums — one
    shuffle at the end.
    """
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    n1 = F.broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    ))
    n2 = F.broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    ))
    region = F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        part.join(li, part.p_partkey == li.l_partkey)
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("cn_key"))
        .join(region, F.col("cn_region") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("sn_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .withColumn("volume", vol)
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH nation_value AS (
      SELECT n_name, sum(s_acctbal * 100.0) AS value
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name, round(value, 2) AS value
    FROM nation_value
    WHERE value > (SELECT sum(value) * 0.05 FROM nation_value)
    ORDER BY value DESC, n_name ASC
    """,
    tags=("tpch", "having", "scalar-subquery"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: groups whose value exceeds a fraction of the GLOBAL total
    — aggregate reused both as rows and as a scalar threshold.

    Scale: the per-group aggregate is computed once and self-joined against
    its own 1-row global sum (broadcast); no second scan of the base table.
    """
    s = load(spark, sf_dir, "supplier")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    nation_value = (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(F.col("s_acctbal") * 100.0).alias("value"))
    )
    total = nation_value.agg((F.sum("value") * 0.05).alias("threshold"))
    return (
        nation_value.join(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("n_name", F.round("value", 2).alias("value"))
        .orderBy(F.col("value").desc(), F.col("n_name").asc())
    )


@register(
    "q12_priority_by_band",
    oracle="""
    SELECT CASE WHEN l_quantity < 25 THEN 'low' ELSE 'high' END AS qty_band,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
    tags=("tpch", "conditional-agg"),
)
def q12_priority_by_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape (shipmode -> quantity band): priority mix per band via
    dual conditional counts."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .withColumn("qty_band", F.when(F.col("l_quantity") < 25, "low").otherwise("high"))
        .groupBy("qty_band")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q15_top_supplier_view",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tags=("tpch", "view", "scalar-subquery"),
)
def q15_top_supplier_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: revenue 'view' reused twice (rows + its own max) — the
    shared-subplan pattern, expressed as a reused DataFrame."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = load(spark, sf_dir, "supplier")
    return (
        s.join(revenue, s.s_suppkey == F.col("supplier_no"))
        .join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", F.round("total_revenue", 2).alias("total_revenue"))
    )


@register(
    "q16_part_supplier_counts",
    oracle="""
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13' AND p_size IN (1, 5, 9, 13, 17)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand ASC, p_size ASC
    """,
    tags=("tpch", "count-distinct"),
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct supplier counts per (brand, size) with negated
    and IN predicates."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13") & F.col("p_size").isin(1, 5, 9, 13, 17)
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), F.col("p_brand").asc(), F.col("p_size").asc())
    )


@register(
    "q20_suppliers_with_backlog",
    oracle="""
    SELECT s_name, s_suppkey
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING sum(l_quantity) > 3000
    )
    ORDER BY s_suppkey ASC
    """,
    tags=("tpch", "semi-join", "having"),
)
def q20_suppliers_with_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: IN over a HAVING-filtered aggregate -> left-semi join."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") >= "1998-01-01")
    busy = li.groupBy("l_suppkey").agg(F.sum("l_quantity").alias("q")).filter(F.col("q") > 3000)
    s = load(spark, sf_dir, "supplier")
    return (
        s.join(busy, s.s_suppkey == busy.l_suppkey, "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy(F.col("s_suppkey").asc())
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1' AND p_size < 15
      AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    tags=("tpch",),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue), adapted: the fixture part
    table has no p_container, so the second part predicate is p_size < 15.
    The correlated avg-quantity subquery becomes a window average over
    l_partkey AFTER the part semi-join — identical semantics (the subquery
    averages every lineitem of the part, and the join keeps every lineitem
    of the selected parts).

    Scale: the brand filter cuts part to a sliver → broadcast semi-join, so
    the 100 TB lineitem side never shuffles for the join; the only exchange
    is the window's l_partkey hash — and only over lineitems of selected
    parts (pushdown does the heavy pruning first).
    """
    from pyspark.sql import Window

    part_f = (
        load(spark, sf_dir, "part")
        .where((F.col("p_brand") == "Brand#1") & (F.col("p_size") < 15))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").join(
        F.broadcast(part_f), F.col("l_partkey") == F.col("p_partkey")
    )
    w = Window.partitionBy("l_partkey")
    return (
        li.withColumn("qty_lim", 0.2 * F.avg("l_quantity").over(w))
        .where(F.col("l_quantity") < F.col("qty_lim"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@register(
    "q21_single_blame_supplier",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders o    ON o_orderkey = l1.l_orderkey
    JOIN nation n    ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R' AND n_name = 'NATION_0'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("tpch",),
)
def q21_single_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: the fixture
    lineitem has no l_commitdate/l_receiptdate, so the 'late' marker is
    l_returnflag = 'R' — the query keeps Q21's defining structure: a
    correlated EXISTS (another supplier in the order) AND NOT EXISTS (no
    OTHER supplier also failed), i.e. the sole-blame double subquery.

    Scale: EXISTS/NOT EXISTS compile to left-semi / left-anti joins on
    l_orderkey with the <> suppkey residual as a join filter — both shuffle
    keyed on orderkey (no row explosion); nation+supplier are broadcast;
    TakeOrderedAndProject caps the result, no global sort.
    """
    nation1 = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_0")
    sup = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation1), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    orders_f = (
        load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select("o_orderkey")
    )
    li = load(spark, sf_dir, "lineitem")
    l1 = (
        li.where(F.col("l_returnflag") == "R")
        .join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", "l_suppkey", "s_name")
    )
    others = li.select(F.col("l_orderkey").alias("o_ok"), F.col("l_suppkey").alias("o_sk"), "l_returnflag")
    with_other = l1.join(
        others,
        (F.col("l_orderkey") == F.col("o_ok")) & (F.col("l_suppkey") != F.col("o_sk")),
        "left_semi",
    )
    sole_blame = with_other.join(
        others.where(F.col("l_returnflag") == "R"),
        (F.col("l_orderkey") == F.col("o_ok")) & (F.col("l_suppkey") != F.col("o_sk")),
        "left_anti",
    )
    return (
        sole_blame.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


# Deterministic pseudo supply-cost: the fixture set has no partsupp table, so
# q2/q9 derive a partsupp-like relation IN-QUERY from the (l_partkey,
# l_suppkey) pairs present in lineitem, with a cost that is a pure integer-
# arithmetic function of the pair — bit-identical in Spark and DuckDB.
_PS_COST = "(0.5 + ((l_partkey * 7 + l_suppkey * 13) % 100) / 1000.0)"


@register(
    "q9_product_type_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)
                     - p_retailprice * (0.5 + ((l_partkey*7 + l_suppkey*13) % 100) / 1000.0)
                       * l_quantity), 4) AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, o_year
    """,
    tags=("tpch",),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), adapted: no partsupp fixture, so
    ps_supplycost is the deterministic pseudo-cost above (derived from the
    join keys; documented, reproduced exactly by the oracle). The defining
    shape is intact: 5-way join, profit expression, (nation, year) rollup.

    Scale: part is filtered (LIKE) then broadcast; supplier+nation broadcast;
    the only big-big join is lineitem⋈orders on orderkey — one keyed shuffle;
    the (nation, year) agg is low-cardinality with map-side partials.
    """
    li = load(spark, sf_dir, "lineitem")
    part_f = load(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    cost = F.col("p_retailprice") * F.expr(_PS_COST)
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - cost * F.col("l_quantity")
    return (
        li.join(F.broadcast(part_f), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 4).alias("sum_profit"))
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem
    ), cost AS (
      SELECT ps_partkey, ps_suppkey,
             p_retailprice * (0.5 + ((ps_partkey*7 + ps_suppkey*13) % 100) / 1000.0) AS ps_cost
      FROM ps JOIN part ON p_partkey = ps_partkey
    ), eligible AS (
      SELECT c.*, s_acctbal, s_name, n_name
      FROM cost c
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, e.ps_partkey AS p_partkey
    FROM eligible e
    JOIN part ON p_partkey = e.ps_partkey
    WHERE p_size = 15 AND p_type = 'SMALL'
      AND ps_cost = (SELECT min(ps_cost) FROM eligible e2
                     WHERE e2.ps_partkey = e.ps_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("tpch",),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), adapted with the same pseudo
    supply-cost as q9 (no partsupp fixture). The defining structure is
    intact: a correlated min-cost-per-part subquery over region-restricted
    suppliers, expressed as a window min + filter (identical semantics, one
    pass instead of a rescan per row).

    Scale: part and the region-restricted supplier dim broadcast; the
    pseudo-partsupp distinct is one keyed shuffle; the correlated min is a
    window over ps_partkey (co-partitioned with the distinct, no extra
    exchange); TakeOrderedAndProject caps the output.
    """
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    ps = li.select(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).distinct()
    part = load(spark, sf_dir, "part")
    cost_expr = F.col("p_retailprice") * (
        0.5 + ((F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 13) % 100) / 1000.0
    )
    cost = ps.join(
        F.broadcast(part.select("p_partkey", "p_retailprice")),
        F.col("p_partkey") == F.col("ps_partkey"),
    ).select("ps_partkey", "ps_suppkey", cost_expr.alias("ps_cost"))
    sup_dim = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    eligible = cost.join(F.broadcast(sup_dim), F.col("ps_suppkey") == F.col("s_suppkey"))
    w = Window.partitionBy("ps_partkey")
    best = eligible.withColumn("min_cost", F.min("ps_cost").over(w)).where(
        F.col("ps_cost") == F.col("min_cost")
    )
    part_f = part.where((F.col("p_size") == 15) & (F.col("p_type") == "SMALL")).select("p_partkey")
    return (
        best.join(F.broadcast(part_f), F.col("p_partkey") == F.col("ps_partkey"))
        .select("s_acctbal", "s_name", "n_name", F.col("ps_partkey").alias("p_partkey"))
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )
