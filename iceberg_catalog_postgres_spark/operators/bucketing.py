"""Bucketing: pre-shuffled, co-located joins — the storage-level answer to
the repeated-shuffle problem.

SURVEY §2.C "Partitioning & shuffle": a join between two tables bucketed by
the same key into the same bucket count needs NO exchange at query time —
the shuffle was paid once at write time and amortizes over every subsequent
join. This is the 100 TB strategy for fact-fact joins run repeatedly
(lineitem><orders on orderkey).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.registry import load, register

_BUCKETS = 8


def _ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write lineitem+orders as bucketed managed tables (once per sf tag).

    bucketBy requires saveAsTable (bucket metadata lives in the session
    catalog); data lands under spark.sql.warehouse.dir. Bucket count is the
    knob: at 100 TB you want (table size / bucket) ~ a few hundred MB and
    the SAME count on both sides so buckets zip 1:1.
    """
    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    # Pin the database location inside the repo's .tmp so a driver-created
    # session (arbitrary cwd => arbitrary default spark-warehouse) never
    # writes outside the repo.
    spark.sql(
        "CREATE DATABASE IF NOT EXISTS bkt LOCATION "
        f"'{os.path.join(repo_root, '.tmp', 'bucketed_warehouse')}'"
    )
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_").replace("-", "_")
    li_name, o_name = f"bkt.bkt_lineitem_{tag}", f"bkt.bkt_orders_{tag}"

    # Session catalogs are in-memory: a fresh session doesn't know the table
    # even though its directory survived a previous session. Stale location
    # with no table registration => clear it (derived scratch, rebuildable).
    import shutil

    for name in (li_name, o_name):
        loc = os.path.join(repo_root, ".tmp", "bucketed_warehouse", name.split(".", 1)[1])
        if not spark.catalog.tableExists(name) and os.path.exists(loc):
            shutil.rmtree(loc)

    if not spark.catalog.tableExists(li_name):
        (
            load(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_extendedprice", "l_discount")
            .write.bucketBy(_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(li_name)
        )
    if not spark.catalog.tableExists(o_name):
        (
            load(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderpriority")
            .write.bucketBy(_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(o_name)
        )
    return li_name, o_name


@register(
    "bucketed_colocated_join",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_lines,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
    tags=("scale", "bucketing", "join"),
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join two co-bucketed tables on the bucket key: zero exchange on
    either side at query time (asserted in tests/test_plans.py). The oracle
    is the plain join on the raw fixtures — bucketing must be semantically
    invisible.

    Scale: each of the N buckets zips with its counterpart locally;
    bucket-pruning also applies to point lookups on the bucket key. The
    write-time cost is one shuffle — paid once, saved on every join after.
    """
    li_name, o_name = _ensure_bucketed_tables(spark, sf_dir)
    li = spark.table(li_name)
    o = spark.table(o_name)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
    )


@register(
    "ts_gapfill_forward_fill",
    oracle="""
    WITH spine AS (
      SELECT u.user_id, unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                               TIMESTAMP '2024-01-02 00:00:00',
                                               INTERVAL 1 HOUR)) AS bucket
      FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 10) u
    ),
    hourly AS (
      SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS bucket,
             round(avg(value), 6) AS avg_value
      FROM events WHERE user_id < 10
        AND ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-01-02 00:00:00'
      GROUP BY 1, 2
    )
    SELECT s.user_id,
           strftime(s.bucket, '%Y-%m-%d %H:%M:%S') AS bucket_start,
           h.avg_value IS NOT NULL AS observed,
           coalesce(h.avg_value,
                    last_value(h.avg_value IGNORE NULLS) OVER (
                      PARTITION BY s.user_id ORDER BY s.bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS filled_value
    FROM spine s LEFT JOIN hourly h ON s.user_id = h.user_id AND s.bucket = h.bucket
    """,
    tags=("scale", "timeseries", "gapfill"),
)
def ts_gapfill_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: per-user hourly spine LEFT-joined to observed
    hourly averages, missing buckets forward-filled with
    last(value, ignorenulls) — the hypertable locf/gap-fill operator.

    Scale: the spine is generated per user (explode of a bounded sequence,
    map-side); the fill is one window pass partitioned by user. Nulls before
    a user's first observation remain null — semantics match DuckDB's
    last_value IGNORE NULLS exactly.
    """
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(
        (F.col("user_id") < 10)
        & (F.col("ts") >= "2024-01-01")
        & (F.col("ts") < "2024-01-02")
    )
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.round(F.avg("value"), 6).alias("avg_value"))

    users = load(spark, sf_dir, "events").filter(F.col("user_id") < 10).select("user_id").distinct()
    spine = users.select(
        "user_id",
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
                F.lit("2024-01-02 00:00:00").cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bucket"),
    )
    joined = spine.join(hourly, ["user_id", "bucket"], "left_outer")
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        F.col("avg_value").isNotNull().alias("observed"),
        F.coalesce(F.col("avg_value"), F.last("avg_value", ignorenulls=True).over(w)).alias(
            "filled_value"
        ),
    )
