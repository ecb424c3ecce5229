"""Event-analytics operators over the events table: retention cohorts and
batch gap-based sessionization.

These complement the streaming session window (streaming/windows.py): the
batch forms run over the full history with window functions, matching what a
warehouse user would ask of the reference's catalog-managed event tables
(reference delegates querying to the engine, mod.rs:359-361).

Cross-engine notes: timestamps never leave the plan raw — cohort weeks are
emitted as ISO date strings, durations as epoch-millisecond BIGINTs
(Spark ``unix_millis`` == DuckDB ``epoch_ms``, both UTC with the session
timezone pinned in registry.load).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.registry import load, register

SESSION_GAP_MS = 30 * 60 * 1000


@register(
    "retention_cohorts",
    oracle="""
    WITH w AS (
      SELECT user_id, date_trunc('week', ts) AS wk FROM events
    ), firsts AS (
      SELECT user_id, min(wk) AS cohort FROM w GROUP BY user_id
    )
    SELECT strftime(f.cohort, '%Y-%m-%d')            AS cohort_week,
           date_diff('day', f.cohort, w.wk) // 7     AS week_offset,
           count(DISTINCT w.user_id)                 AS n_users
    FROM w JOIN firsts f USING (user_id)
    GROUP BY f.cohort, date_diff('day', f.cohort, w.wk) // 7
    """,
    tags=("events", "analytics", "cohort"),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-seen week, counted in
    each subsequent activity week (classic triangle retention matrix).

    Scale: two keyed shuffles — (1) min-week per user (map-side partial min),
    (2) the (cohort, offset) count-distinct. The first-seen table is one row
    per user (far smaller than events) and joins back on the same user_id
    key, so AQE can pick a broadcast or keep the co-partitioned shuffle; no
    row explosion anywhere.
    """
    e = load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    )
    firsts = e.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    return (
        e.join(firsts, "user_id")
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            F.expr("datediff(wk, cohort) div 7").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "sessionize_gap_lag",
    oracle=f"""
    WITH x AS (
      SELECT user_id, event_id, value, epoch_ms(ts) AS ms FROM events
    ), marked AS (
      SELECT user_id, event_id, value, ms,
             CASE WHEN lag(ms) OVER w IS NULL
                       OR ms - lag(ms) OVER w > {SESSION_GAP_MS}
                  THEN 1 ELSE 0 END AS is_new
      FROM x WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)
    ), sessions AS (
      SELECT user_id, value, ms,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM marked
    )
    SELECT user_id,
           CAST(session_seq AS BIGINT)     AS session_seq,
           count(*)                        AS n_events,
           max(ms) - min(ms)               AS dur_ms,
           round(sum(value), 6)            AS sum_value
    FROM sessions GROUP BY user_id, session_seq
    """,
    tags=("events", "analytics", "session"),
)
def sessionize_gap_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a new session starts after a >30-minute gap in a
    user's event stream (lag + running sum of session starts), then
    per-session rollups.

    Scale: ONE shuffle on user_id serves both window passes and the final
    groupBy (same partitioning, Catalyst reuses the exchange); per-user event
    counts are small, so no window partition can overwhelm an executor — the
    natural key distributes a 100 TB event log evenly.
    """
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", F.unix_millis("ts").alias("ms")
    )
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    prev = F.lag("ms").over(w)
    marked = e.withColumn(
        "is_new",
        F.when(prev.isNull() | ((F.col("ms") - prev) > SESSION_GAP_MS), F.lit(1)).otherwise(F.lit(0)),
    )
    wsum = Window.partitionBy("user_id").orderBy("ms", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = marked.withColumn("session_seq", F.sum("is_new").over(wsum))
    return sessions.groupBy("user_id", F.col("session_seq").cast("long").alias("session_seq")).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ms") - F.min("ms")).alias("dur_ms"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )
