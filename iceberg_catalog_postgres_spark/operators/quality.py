"""Data-quality expectation checks (Deequ/Great-Expectations style) as a
single-pass Spark job: each rule reduces to a violation count + pass flag.

The reference's catalog guarantees metadata consistency (CAS pointer swaps);
these checks are the data-side counterpart a warehouse team runs before
publishing a snapshot — typically wired as a pre-commit gate in front of
``Transaction.commit()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.registry import load, register


@register(
    "dq_expectations",
    oracle="""
    SELECT 'custkey_not_null' AS rule,
           CAST((SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS BIGINT) AS n_violations,
           (SELECT count(*) FROM orders WHERE o_custkey IS NULL) = 0 AS passed
    UNION ALL
    SELECT 'orderkey_unique',
           CAST((SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) AS BIGINT),
           (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) = 0
    UNION ALL
    SELECT 'custkey_in_customer',
           CAST((SELECT count(*) FROM orders o LEFT JOIN customer c
                 ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) AS BIGINT),
           (SELECT count(*) FROM orders o LEFT JOIN customer c
            ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) = 0
    UNION ALL
    SELECT 'totalprice_positive',
           CAST((SELECT count(*) FROM orders WHERE o_totalprice <= 0) AS BIGINT),
           (SELECT count(*) FROM orders WHERE o_totalprice <= 0) = 0
    ORDER BY rule
    """,
    tags=("quality", "expectations"),
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four expectation rules over orders: completeness (NOT NULL), key
    uniqueness, referential integrity into customer, and a value-domain
    bound — each as (rule, n_violations, passed).

    Scale: the three single-table rules fuse into ONE scan pass (conditional
    aggregates over the same projection); referential integrity is a
    broadcast anti-join against the distinct key set of the dimension (keys
    only — at 100 TB the fact side streams map-only when the dim key set
    broadcasts; otherwise it's one keyed shuffle). This is the shape of a
    pre-commit data contract gate on a snapshot transaction.
    """
    o = load(spark, sf_dir, "orders")
    single = o.agg(
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("v_null"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("v_uniq"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("v_price"),
    )
    cust_keys = load(spark, sf_dir, "customer").select("c_custkey").distinct()
    orphans = (
        o.join(F.broadcast(cust_keys), o.o_custkey == cust_keys.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("v_ref"))
    )
    wide = single.crossJoin(F.broadcast(orphans))
    rules = [
        ("custkey_not_null", "v_null"),
        ("custkey_in_customer", "v_ref"),
        ("orderkey_unique", "v_uniq"),
        ("totalprice_positive", "v_price"),
    ]
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(name).alias("rule"), F.col(col).alias("n_violations"))
                    for name, col in rules
                ]
            )
        ).alias("r")
    ).select(
        F.col("r.rule").alias("rule"),
        F.col("r.n_violations").alias("n_violations"),
        (F.col("r.n_violations") == 0).alias("passed"),
    )
    return stacked.orderBy("rule")


@register(
    "dq_quarantine_split",
    oracle="""
    WITH corrupted AS (
      SELECT o_orderkey + 9000000 AS o_orderkey,
             o_custkey,
             -o_totalprice AS o_totalprice
      FROM orders WHERE o_orderkey % 97 = 0
    ),
    feed AS (
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      UNION ALL SELECT * FROM corrupted
    )
    SELECT CAST((SELECT count(*) FROM feed WHERE o_totalprice > 0) AS BIGINT)
             AS n_published,
           CAST((SELECT count(*) FROM feed WHERE o_totalprice <= 0) AS BIGINT)
             AS n_quarantined,
           CAST((SELECT count(*) FROM feed) AS BIGINT) AS n_total,
           true AS no_rows_lost,
           true AS published_table_clean
    FROM (SELECT 1)
    """,
    tags=("quality", "quarantine", "catalog"),
)
def dq_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quarantine pattern: instead of failing the whole batch on a DQ
    violation, ONE pass routes rows — clean rows commit to the published
    catalog table, violating rows commit to a quarantine table with the
    same schema (for triage / replay). Certified: published + quarantined
    == input exactly (``no_rows_lost``), and re-running the expectation on
    the published table finds zero violations
    (``published_table_clean``).

    Scale: the split is one scan with two filtered writes (Spark executes
    the common subplan per sink; at 100 TB you persist the batch or use
    foreachBatch to write both sides from one materialization). Both
    commits are independent atomic CAS snapshots — a failed quarantine
    write never blocks the published side's atomicity.
    """
    from iceberg_catalog_postgres_spark.catalog.catalog import TableIdentifier
    from iceberg_catalog_postgres_spark.catalog.maintenance import _fresh_catalog

    cat = _fresh_catalog("dq_quarantine_demo")
    src = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    corrupted = src.filter(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + 9000000).alias("o_orderkey"),
        "o_custkey",
        (-F.col("o_totalprice")).alias("o_totalprice"),
    )
    feed = src.unionByName(corrupted)

    ok = feed.filter(F.col("o_totalprice") > 0)
    bad = feed.filter(F.col("o_totalprice") <= 0)
    pub = cat.create_table(TableIdentifier.parse("dq.orders_published"), feed.schema)
    quar = cat.create_table(TableIdentifier.parse("dq.orders_quarantine"), feed.schema)
    pub = pub.new_transaction().append_dataframe(ok).commit()
    quar = quar.new_transaction().append_dataframe(bad).commit()

    n_pub = pub.record_count()
    n_quar = quar.record_count()
    n_total = feed.count()
    clean = (
        pub.to_df(spark).filter(F.col("o_totalprice") <= 0).count() == 0
    )
    return spark.createDataFrame(
        [
            (
                n_pub,
                n_quar,
                n_total,
                bool(n_pub + n_quar == n_total),
                bool(clean),
            )
        ],
        "n_published long, n_quarantined long, n_total long, "
        "no_rows_lost boolean, published_table_clean boolean",
    )
