"""Core relational operators: filters/predicates, set operations, grouping
sets/rollup/cube, aggregate families (exact + approximate + ordered).

SURVEY.md §2.C "Projection / filter / predicates", "Aggregations",
"Set ops". Reference analogue: the catalog's WHERE-equality point lookups
(``/root/reference/src/catalog/mod.rs:56-136``) generalized to the full
predicate algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.registry import load, register

# ---------------------------------------------------------------------------
# Predicates: IN / BETWEEN / LIKE / IS NULL / boolean algebra
# ---------------------------------------------------------------------------


@register(
    "filter_predicates",
    oracle="""
    SELECT o_orderkey, o_orderpriority, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 100000 AND 200000
      AND o_orderstatus <> 'P'
      AND o_orderpriority LIKE '%H%'
      AND o_custkey IS NOT NULL
    """,
    tags=("relational", "filter"),
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN, BETWEEN, <>, LIKE, IS NOT NULL composed with AND.

    Scale: all five predicates are scan-pushable (PushedFilters); no shuffle
    at all — this is a map-only plan at any SF.
    """
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(100000, 200000)
        & (F.col("o_orderstatus") != "P")
        & F.col("o_orderpriority").like("%H%")
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderpriority", F.round("o_totalprice", 2).alias("o_totalprice"))


@register(
    "filter_rlike_regex",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE regexp_matches(p_name, '^(a|b|c).* (anvil|rod|plate)$')
    """,
    tags=("relational", "filter", "regex"),
)
def filter_rlike_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex predicate (rlike) — stays in codegen, no Python round-trip."""
    p = load(spark, sf_dir, "part")
    return p.filter(F.col("p_name").rlike("^(a|b|c).* (anvil|rod|plate)$")).select("p_partkey", "p_name")


@register(
    "case_when_bucketing",
    oracle="""
    SELECT
      CASE WHEN o_totalprice < 50000 THEN 'small'
           WHEN o_totalprice < 150000 THEN 'medium'
           WHEN o_totalprice < 300000 THEN 'large'
           ELSE 'jumbo' END AS price_band,
      count(*) AS n_orders,
      round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY 1
    """,
    tags=("relational", "case"),
)
def case_when_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN ladder used as a derived grouping key."""
    o = load(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("jumbo")
    )
    return (
        o.withColumn("price_band", band)
        .groupBy("price_band")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@register(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("relational", "setop"),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): union + dropDuplicates; shuffle keyed on the row.

    Scale: dedup shuffles hash(nationkey); partial distinct runs map-side so
    the shuffle carries at most |distinct| x partitions rows.
    """
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("relational", "setop"),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — nations having both customers and suppliers."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "setop_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("relational", "setop"),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference with multiplicity preserved."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


@register(
    "distinct_drop_duplicates",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
    tags=("relational", "setop"),
)
def distinct_drop_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a column subset = DISTINCT projection."""
    return load(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").dropDuplicates()


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube
# ---------------------------------------------------------------------------


@register(
    "rollup_region_nation",
    oracle="""
    SELECT r_name, n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("relational", "rollup"),
)
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy region -> nation -> grand total.

    Scale: Spark expands rollup to a union of grouping sets over one shuffle
    (Expand operator) — input is read once regardless of the number of levels.
    """
    c = load(spark, sf_dir, "customer")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), F.round(F.sum("c_acctbal"), 2).alias("total_bal"))
    )


@register(
    "cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n, round(avg(o_totalprice), 6) AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("relational", "cube"),
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all 4 grouping-set combinations in one pass."""
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("o_totalprice"), 6).alias("avg_price"))
    )


@register(
    "grouping_sets_sql",
    oracle="""
    SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("relational", "grouping-sets"),
)
def grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL over a temp view."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# ---------------------------------------------------------------------------
# Aggregate families
# ---------------------------------------------------------------------------


@register(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey)       AS n_customers,
           count(DISTINCT o_orderpriority) AS n_priorities,
           count(*)                        AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("relational", "agg"),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one aggregate.

    Scale: Catalyst plans multi-distinct via Expand (one row per distinct
    column per input row) + two-phase agg — one shuffle, no O(n^2) blowup.
    """
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "agg_stats_moments",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 6) AS sd_price,
           round(var_samp(l_extendedprice), 4)    AS var_price,
           round(min(l_extendedprice), 2)         AS min_price,
           round(max(l_extendedprice), 2)         AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("relational", "agg"),
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance/min/max — single-pass moment aggregates."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 6).alias("sd_price"),
            F.round(F.var_samp("l_extendedprice"), 4).alias("var_price"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        )
    )


@register(
    "agg_filtered_conditional",
    oracle="""
    SELECT c_mktsegment,
           count(*) FILTER (WHERE c_acctbal > 5000)     AS n_rich,
           count(*) FILTER (WHERE c_acctbal < 0)        AS n_negative,
           round(sum(CASE WHEN c_acctbal > 0 THEN c_acctbal ELSE 0 END), 2) AS pos_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("relational", "agg"),
)
def agg_filtered_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-ed counts and conditional sums (sum(when(...)))."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.when(F.col("c_acctbal") > 5000, 1)).alias("n_rich"),
        F.count(F.when(F.col("c_acctbal") < 0, 1)).alias("n_negative"),
        F.round(F.sum(F.when(F.col("c_acctbal") > 0, F.col("c_acctbal")).otherwise(0.0)), 2).alias("pos_bal"),
    )


@register(
    "agg_minby_maxby",
    oracle="""
    SELECT c_mktsegment,
           arg_max(c_name, c_acctbal) AS richest_customer,
           arg_min(c_name, c_acctbal) AS poorest_customer
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("relational", "agg"),
)
def agg_minby_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax/argmin) ordered-selection aggregates.

    Note: deterministic because c_acctbal has no duplicates within a segment
    in the fixtures; production code should tie-break explicitly.
    """
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.expr("max_by(c_name, c_acctbal)").alias("richest_customer"),
        F.expr("min_by(c_name, c_acctbal)").alias("poorest_customer"),
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
           round(quantile_cont(o_totalprice, 0.95), 4) AS p95,
           round(median(o_totalprice), 4)              AS med
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("relational", "agg", "percentile"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` = DuckDB
    `quantile_cont`). The approximate variant is a separate rows-only query
    (`agg_approx_sketches`) because sketch outputs are engine-specific."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("p95"),
        F.round(F.median("o_totalprice"), 4).alias("med"),
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
    tags=("relational", "agg", "collect"),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set -> sort_array -> join to string (deterministic list agg).

    Scale: collect_set is safe only for bounded-cardinality groups (here:
    nations per region <= 25); unbounded groups would need an explicit top-k
    truncation instead.
    """
    n = load(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias("nations")
    )


@register(
    "agg_approx_sketches",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_orderkey)               AS exact_orders,
           CAST(count(*) AS BIGINT)                 AS n,
           true                                     AS approx_orders_ok,
           true                                     AS approx_p50_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("relational", "agg", "approx"),
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) and approx percentile sketches,
    certified against their accuracy contract.

    HLL estimates are engine-specific, so raw sketch outputs can't hash-match
    DuckDB. The *contract* can: Spark computes both the sketch and the exact
    value and emits tolerance booleans (rel-err <= 5%, well above the 2%
    configured HLL sd and the ~0.4% rank error of the percentile sketch at
    accuracy=1000); the oracle computes the exact side and asserts the
    booleans true. A drifting sketch turns the column false -> hash mismatch.

    Scale: THE point of sketches — constant memory per group at any SF,
    mergeable across partitions (partial aggregation works). Exact
    count-distinct shuffles every distinct value; HLL ships a 1.5 KB sketch.
    The exact aggregates here are the certification harness, not the scale
    path — production uses only the sketch columns.
    """
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_p50"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.select(
        "l_returnflag",
        "exact_orders",
        "n",
        (F.abs(F.col("approx_orders") - F.col("exact_orders")) / F.col("exact_orders") <= 0.05).alias(
            "approx_orders_ok"
        ),
        (F.abs(F.col("approx_p50") - F.col("exact_p50")) / F.col("exact_p50") <= 0.05).alias(
            "approx_p50_ok"
        ),
    )


@register(
    "agg_bool_and_or",
    oracle="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000)   AS all_over_1k,
           bool_or(o_totalprice > 400000)  AS any_over_400k
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("relational", "agg"),
)
def agg_bool_and_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool_and / bool_or (every/some) boolean aggregates."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("bool_and(o_totalprice > 1000)").alias("all_over_1k"),
        F.expr("bool_or(o_totalprice > 400000)").alias("any_over_400k"),
    )


# ---------------------------------------------------------------------------
# Sort / limit semantics
# ---------------------------------------------------------------------------


@register(
    "orderby_nulls_limit",
    oracle="""
    SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
    FROM supplier
    ORDER BY s_acctbal DESC NULLS LAST, s_suppkey ASC
    LIMIT 5
    """,
    tags=("relational", "sort"),
)
def orderby_nulls_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit null-ordering + deterministic tiebreak + limit.

    Spark default NULLS FIRST (asc) differs from DuckDB NULLS LAST — ordering
    is always made explicit (SURVEY §7 'what's hard' #2).
    Scale: ORDER BY+LIMIT k = TakeOrderedAndProject (per-task heap, no global
    sort).
    """
    s = load(spark, sf_dir, "supplier")
    return (
        s.select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy(F.col("s_acctbal").desc_nulls_last(), F.col("s_suppkey").asc())
        .limit(5)
    )


@register(
    "setop_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("relational", "setop"),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag intersection with multiplicity min()."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s)


@register(
    "setop_union_by_name_missing",
    oracle="""
    SELECT c_custkey AS entity_id, c_name AS entity_name, c_mktsegment AS segment FROM customer
    UNION ALL
    SELECT s_suppkey, s_name, NULL FROM supplier
    """,
    tags=("relational", "setop"),
)
def setop_union_by_name_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True): schema-mediated union where
    one side lacks a column (filled with nulls) — the multi-source ingest
    union that positional UNION gets silently wrong."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("entity_name"),
        F.col("c_mktsegment").alias("segment"),
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"), F.col("s_name").alias("entity_name")
    )
    return c.unionByName(s, allowMissingColumns=True)


@register(
    "agg_mode_per_group",
    oracle="""
    SELECT o_orderpriority, modal_status, n FROM (
      SELECT o_orderpriority, o_orderstatus AS modal_status, count(*) AS n,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY count(*) DESC, o_orderstatus ASC) AS rk
      FROM orders GROUP BY o_orderpriority, o_orderstatus
    ) WHERE rk = 1
    """,
    tags=("aggregation", "mode"),
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group MODE (most frequent value), the two-level
    aggregation form: count per (group, value), then rank within group
    with an explicit (count DESC, value ASC) tie-break — built-in
    ``mode()`` on both engines picks ties arbitrarily, which would make
    the result uncheckable; the ranked form pins it.

    Scale: the first groupBy is map-side combinable (the heavy reduction);
    the window runs over distinct (group, value) pairs only — cardinality
    of the value domain, not of the table.
    """
    from pyspark.sql.window import Window

    counts = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("n").desc(), F.col("o_orderstatus").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderstatus").alias("modal_status"),
            "n",
        )
    )


@register(
    "grouping_id_rollup",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL')   AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           GROUPING(o_orderstatus)          AS g_status,
           GROUPING(o_orderpriority)        AS g_priority,
           CAST(count(*) AS BIGINT)         AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("aggregation", "rollup", "grouping"),
)
def grouping_id_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with explicit GROUPING() indicator columns — the disambiguator
    BI layers need: a NULL group key can mean "subtotal row" or "the data
    really was NULL", and only grouping() tells them apart. Emitted as
    0/1 flags per dimension alongside coalesced labels.

    Scale: one shuffle; rollup expands each input row into its grouping
    combinations map-side (partial aggregation still applies), so the cost
    is rows x (levels) pre-combine — the standard cube/rollup trade.
    """
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "g_status",
            "g_priority",
            "n",
        )
    )


@register(
    "agg_numeric_histogram",
    oracle="""
    WITH b AS (
      SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
    )
    SELECT CAST(least(9, floor((o_totalprice - b.lo) / (b.hi - b.lo) * 10))
                AS BIGINT)               AS bucket,
           CAST(count(*) AS BIGINT)      AS n_orders,
           round(min(o_totalprice), 2)   AS lo_price,
           round(max(o_totalprice), 2)   AS hi_price
    FROM orders, b
    GROUP BY 1
    """,
    tags=("aggregation", "histogram"),
)
def agg_numeric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width numeric histogram (10 buckets over the observed price
    range): bucket = clamp(floor((x - lo) / (hi - lo) * n)) — the explicit
    arithmetic form so both engines compute identical IEEE results (the
    top edge folds into the last bucket). This is the distribution profile
    a DQ dashboard or a partition-bound chooser reads.

    Scale: bounds come from one min/max pass (broadcast as a 1-row
    crossJoin); the bucketing itself is a map-side projection + one tiny
    groupBy — two passes total, no sort, no sample.
    """
    o = load(spark, sf_dir, "orders").select("o_totalprice")
    b = o.agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
    bucket = F.least(
        F.lit(9),
        F.floor((F.col("o_totalprice") - F.col("lo")) / (F.col("hi") - F.col("lo")) * 10),
    ).cast("long")
    return (
        o.crossJoin(F.broadcast(b))
        .select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo_price"),
            F.round(F.max("o_totalprice"), 2).alias("hi_price"),
        )
    )


@register(
    "pareto_revenue_coverage",
    oracle="""
    WITH rev AS (
      SELECT o_custkey, sum(o_totalprice) AS r
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT r,
             sum(r) OVER (ORDER BY r DESC, o_custkey ASC
                          ROWS UNBOUNDED PRECEDING) AS cum_r,
             sum(r) OVER () AS total_r,
             row_number() OVER (ORDER BY r DESC, o_custkey ASC) AS rk
      FROM rev
    )
    SELECT CAST((SELECT count(*) FROM rev) AS BIGINT) AS n_customers,
           CAST(min(CASE WHEN cum_r >= 0.8 * total_r THEN rk END) AS BIGINT)
             AS n_for_80pct,
           round(CAST(min(CASE WHEN cum_r >= 0.8 * total_r THEN rk END) AS DOUBLE)
                 / (SELECT count(*) FROM rev), 4) AS frac_for_80pct
    FROM ranked
    """,
    tags=("aggregation", "pareto", "window"),
)
def pareto_revenue_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: how many customers (and what fraction of the
    customer base) cover 80% of total order revenue — the skew diagnostic
    behind both business questions ("how concentrated is demand?") and
    engineering ones (the same number predicts hot-key skew in any
    customer-keyed shuffle).

    Plan (the 100 TB shape, implemented): one revenue groupBy; the grand
    total / max / count come from a single 1-row aggregate (a bounded pull
    used as plan literals — no unbounded window duplicating the total per
    row); the descending running sum is PARTITIONED by coarse revenue
    bucket (value-range bucketing is order-compatible: every row of a
    higher bucket outranks every row of a lower one, and equal revenues
    land in the same bucket so the (r desc, custkey asc) tie order is
    preserved exactly). Per-bucket (sum, count) totals — one row per
    bucket — feed an exclusive running sum over the ~64 bucket rows, and a
    broadcast join stitches (cum_r, rk) = bucket offset + local window
    value. No un-partitioned data-proportional window remains.
    ``tests/test_sweepline_stitch.py`` pins stitched == global ranking.
    """
    from pyspark.sql.window import Window as W

    rev = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("r"))
    )
    n_customers, total_r, r_max = rev.agg(
        F.count("*"), F.sum("r"), F.max("r")
    ).first()
    n_buckets = 64
    width = (float(r_max) / n_buckets) if r_max else 1.0
    b = rev.withColumn(
        "bkt",
        F.least(F.floor(F.col("r") / F.lit(width)), F.lit(n_buckets - 1)).cast("long"),
    )
    w_local = (
        W.partitionBy("bkt")
        .orderBy(F.col("r").desc(), F.col("o_custkey").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = b.select(
        "bkt",
        F.sum("r").over(w_local).alias("cum_local"),
        F.row_number().over(
            W.partitionBy("bkt").orderBy(F.col("r").desc(), F.col("o_custkey").asc())
        ).alias("rk_local"),
    )
    totals = b.groupBy("bkt").agg(
        F.sum("r").alias("bkt_r"), F.count("*").alias("bkt_n")
    )
    w_bkts = W.orderBy(F.col("bkt").desc()).rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "bkt",
        F.coalesce(F.sum("bkt_r").over(w_bkts), F.lit(0.0)).alias("off_r"),
        F.coalesce(F.sum("bkt_n").over(w_bkts), F.lit(0)).alias("off_n"),
    )
    ranked = local.join(F.broadcast(offsets), "bkt").select(
        (F.col("off_r") + F.col("cum_local")).alias("cum_r"),
        (F.col("off_n") + F.col("rk_local")).alias("rk"),
    )
    return ranked.agg(
        F.min(F.when(F.col("cum_r") >= 0.8 * float(total_r), F.col("rk"))).alias(
            "n_for_80pct"
        )
    ).select(
        F.lit(n_customers).cast("long").alias("n_customers"),
        F.col("n_for_80pct").cast("long"),
        F.round(F.col("n_for_80pct").cast("double") / n_customers, 4).alias(
            "frac_for_80pct"
        ),
    )
