"""Stream-stream joins and funnel analysis on events.

The batch forms are oracle-checked; the true streaming variant
(watermarked stream-stream interval join) is rows-only with a
batch-equivalence test in tests/test_streaming.py.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.registry import load, register


@register(
    "funnel_signup_to_purchase",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(ts) FILTER (WHERE event_type = 'signup')   AS first_signup,
             min(ts) FILTER (WHERE event_type = 'purchase') AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT count(*) FILTER (WHERE first_signup IS NOT NULL)  AS n_signed_up,
           count(*) FILTER (WHERE first_signup IS NOT NULL
                            AND first_purchase > first_signup) AS n_converted,
           round(CAST(count(*) FILTER (WHERE first_signup IS NOT NULL
                                       AND first_purchase > first_signup) AS DOUBLE)
                 / count(*) FILTER (WHERE first_signup IS NOT NULL), 6) AS conversion_rate
    FROM firsts
    """,
    tags=("streaming", "funnel"),
)
def funnel_signup_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: users whose first purchase follows their first
    signup — conditional min aggregates, one shuffle on user_id, then a
    1-row reduction. The sessionized-event analytics shape.
    """
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("first_signup"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    signed = F.col("first_signup").isNotNull()
    converted = signed & (F.col("first_purchase") > F.col("first_signup"))
    return firsts.agg(
        F.count(F.when(signed, 1)).alias("n_signed_up"),
        F.count(F.when(converted, 1)).alias("n_converted"),
        F.round(
            F.count(F.when(converted, 1)).cast("double") / F.count(F.when(signed, 1)), 6
        ).alias("conversion_rate"),
    )


@register(
    "join_event_pairs_interval_batch",
    oracle="""
    SELECT e.user_id, count(*) AS n_pairs
    FROM events e JOIN events p
      ON e.user_id = p.user_id
     AND e.event_type = 'error' AND p.event_type = 'purchase'
     AND p.ts >= e.ts AND p.ts < e.ts + INTERVAL 10 MINUTE
    GROUP BY e.user_id
    """,
    tags=("streaming", "interval-join"),
)
def join_event_pairs_interval_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the stream-stream interval join: purchases within 10
    minutes after an error by the same user.

    Scale: equality on user_id drives the shuffle; the time predicate is a
    residual — identical shape to the streaming version, where the interval
    bound + watermark is what lets Spark evict join state.
    """
    ev = load(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("eu"), F.col("ts").alias("ets")
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    return (
        err.join(
            pur,
            (F.col("eu") == F.col("pu"))
            & (F.col("pts") >= F.col("ets"))
            & (F.col("pts") < F.col("ets") + F.expr("INTERVAL 10 MINUTE")),
        )
        .groupBy(F.col("eu").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "stream_stream_interval_join",
    oracle="""
    SELECT e.user_id, count(*) AS n_pairs
    FROM events e JOIN events p
      ON e.user_id = p.user_id
     AND e.event_type = 'error' AND p.event_type = 'purchase'
     AND p.ts >= e.ts AND p.ts < e.ts + INTERVAL 10 MINUTE
    GROUP BY e.user_id
    """,
    tags=("streaming", "stream-join"),
)
def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE stream-stream join: two watermarked streams (errors, purchases)
    joined on user_id with a time-interval condition.

    Oracle-checked (round-2 upgrade from rows-only): with availableNow the
    bounded input joins completely (no late-arrival loss), so the sink's
    per-user match counts equal the batch interval join. The sink stores
    epoch-ms BIGINTs (cheaper state than timestamps, canonicalization-safe).
    Also asserted stream==batch in tests/test_streaming.py.

    Scale: without the interval bound the join state grows forever; with
    watermark + bound, each side's state is evicted once the other side's
    watermark passes ts + 10 minutes. This is THE canonical stateful
    streaming join.
    """
    from iceberg_catalog_postgres_spark.streaming.windows import _read_event_stream, stream_state_width

    s = _read_event_stream(spark, sf_dir)
    err = (
        s.filter(F.col("event_type") == "error")
        .select(F.col("user_id").alias("eu"), F.col("ts").alias("ets"))
        .withWatermark("ets", "30 minutes")
    )
    pur = (
        s.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("pu"), F.col("ts").alias("pts"))
        .withWatermark("pts", "30 minutes")
    )
    joined = err.join(
        pur,
        F.expr(
            "eu = pu AND pts >= ets AND pts < ets + INTERVAL 10 MINUTE"
        ),
    ).select(
        F.col("eu").alias("user_id"),
        F.unix_millis("ets").alias("ets_ms"),
        F.unix_millis("pts").alias("pts_ms"),
    )

    name = f"sink_{uuid.uuid4().hex[:12]}"
    with stream_state_width(spark, f"{sf_dir}/events.parquet"):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "stream_stream_left_outer_join",
    oracle="""
    WITH m AS (
      SELECT least(
        (SELECT max(ts) FROM events WHERE event_type = 'error'),
        (SELECT max(ts) FROM events WHERE event_type = 'purchase')
      ) AS mx
    ),
    e AS (
      SELECT user_id, ts FROM events, m
      WHERE event_type = 'error' AND ts < mx - INTERVAL 45 MINUTE
    ),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT e.user_id,
           count(*)                 AS n_rows,
           count(p.ts)              AS n_matched,
           count(*) - count(p.ts)   AS n_unmatched
    FROM e LEFT JOIN p
      ON e.user_id = p.user_id
     AND p.ts >= e.ts AND p.ts < e.ts + INTERVAL 10 MINUTE
    GROUP BY e.user_id
    """,
    tags=("streaming", "stream-join", "outer"),
)
def stream_stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every error row emits — with
    its matching purchases inside [ts, ts+10min), or once with NULLs if no
    purchase ever arrives. The outer side is what makes this genuinely
    stateful: an unmatched left row can only be emitted when the RIGHT
    side's watermark proves no match can still arrive (watermark 30min +
    interval 10min past the row's timestamp), so emission is tied to state
    eviction, not arrival.

    Certification subtlety (and why the oracle has a horizon): at the end
    of an availableNow run the final watermark is max(event time) - 30min,
    so unmatched errors inside the last ~40 minutes are still legitimately
    held in state — Spark has not yet proven they will never match. Both
    the query and the oracle therefore exclude errors within 45 minutes of
    the earlier side's end (the global watermark is the MIN over both
    inputs); inside that horizon stream == batch EXACTLY (matched rows
    emit immediately; unmatched rows emit on eviction).

    Scale: state per key is bounded by the watermark + interval — the same
    eviction math as the inner join, plus a tombstone pass for the
    unmatched emissions. Without the interval bound this join cannot run
    at 100 TB; with it, state is O(events in the 40-minute window).
    """
    from iceberg_catalog_postgres_spark.streaming.windows import _read_event_stream, stream_state_width

    # The outer join's global watermark is the MIN over both inputs'
    # watermarks, so the certified horizon keys on the earlier of the two
    # sides' max event times — exactly mirrored in the oracle.
    ev = load(spark, sf_dir, "events")
    mx = (
        ev.filter(F.col("event_type").isin("error", "purchase"))
        .groupBy("event_type")
        .agg(F.max("ts").alias("m"))
        .agg(F.min("m"))
        .first()[0]
    )
    cutoff_ms = int(mx.timestamp() * 1000) - 45 * 60 * 1000

    s = _read_event_stream(spark, sf_dir)
    err = (
        s.filter(F.col("event_type") == "error")
        .select(F.col("user_id").alias("eu"), F.col("ts").alias("ets"))
        .withWatermark("ets", "30 minutes")
    )
    pur = (
        s.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("pu"), F.col("ts").alias("pts"))
        .withWatermark("pts", "30 minutes")
    )
    joined = err.join(
        pur,
        F.expr("eu = pu AND pts >= ets AND pts < ets + INTERVAL 10 MINUTE"),
        "leftOuter",
    ).select(
        F.col("eu").alias("user_id"),
        F.unix_millis("ets").alias("ets_ms"),
        F.unix_millis("pts").alias("pts_ms"),
    )

    name = f"sink_{uuid.uuid4().hex[:12]}"
    with stream_state_width(spark, f"{sf_dir}/events.parquet"):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    return (
        spark.table(name)
        .filter(F.col("ets_ms") < F.lit(cutoff_ms))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("pts_ms").alias("n_matched"),
            (F.count(F.lit(1)) - F.count("pts_ms")).alias("n_unmatched"),
        )
    )


@register(
    "stream_stream_full_outer_join",
    oracle="""
    WITH m AS (
      SELECT least(
        (SELECT max(ts) FROM events WHERE event_type = 'error'),
        (SELECT max(ts) FROM events WHERE event_type = 'purchase')
      ) - INTERVAL 45 MINUTE AS cut
    ),
    e AS (SELECT user_id, ts FROM events WHERE event_type = 'error'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    j AS (
      SELECT e.user_id AS eu, e.ts AS ets, p.user_id AS pu, p.ts AS pts
      FROM e FULL JOIN p
        ON e.user_id = p.user_id
       AND p.ts >= e.ts AND p.ts < e.ts + INTERVAL 10 MINUTE
    )
    SELECT coalesce(eu, pu) AS user_id,
           count(*) AS n_rows,
           count(CASE WHEN ets IS NOT NULL AND pts IS NOT NULL THEN 1 END) AS n_matched,
           count(CASE WHEN pts IS NULL THEN 1 END) AS n_err_unmatched,
           count(CASE WHEN ets IS NULL THEN 1 END) AS n_pur_unmatched
    FROM j, m
    WHERE (ets IS NOT NULL AND ets < m.cut) OR (ets IS NULL AND pts < m.cut)
    GROUP BY coalesce(eu, pu)
    """,
    tags=("streaming", "stream-join", "outer", "full"),
)
def stream_stream_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join — both sides emit: matches
    inside [ets, ets+10min) immediately, unmatched ERRORS once the right
    watermark proves no purchase can arrive, unmatched PURCHASES once the
    left watermark proves no error preceded them. Completes the streaming
    join matrix (inner / left outer / full outer), all three
    oracle-certified.

    Certification geometry (why each row filters on its OWN anchor): a
    half-plane cutoff applied to both INPUTS cannot be exact for a full
    join — restricting purchases re-classifies an error whose only match
    lay beyond the cutoff, and vice versa. Instead the emitted ROWS are
    filtered by category anchor (matched + unmatched-error rows by error
    time, unmatched-purchase rows by purchase time), with the join itself
    unrestricted; the oracle applies the identical row-level predicate to
    an unrestricted batch FULL JOIN. Inside the 45-minute horizon (global
    watermark = min over both sides - 30min, plus the 10-minute interval)
    every category's emission is provably complete, so stream == batch
    EXACTLY.

    Scale: state is the same watermark-bounded window as the inner join on
    BOTH sides, plus tombstone passes for the two unmatched categories —
    O(events in the eviction window), never O(stream).
    """
    from iceberg_catalog_postgres_spark.streaming.windows import _read_event_stream, stream_state_width

    ev = load(spark, sf_dir, "events")
    mx = (
        ev.filter(F.col("event_type").isin("error", "purchase"))
        .groupBy("event_type")
        .agg(F.max("ts").alias("m"))
        .agg(F.min("m"))
        .first()[0]
    )
    cutoff_ms = int(mx.timestamp() * 1000) - 45 * 60 * 1000

    s = _read_event_stream(spark, sf_dir)
    err = (
        s.filter(F.col("event_type") == "error")
        .select(F.col("user_id").alias("eu"), F.col("ts").alias("ets"))
        .withWatermark("ets", "30 minutes")
    )
    pur = (
        s.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("pu"), F.col("ts").alias("pts"))
        .withWatermark("pts", "30 minutes")
    )
    joined = err.join(
        pur,
        F.expr("eu = pu AND pts >= ets AND pts < ets + INTERVAL 10 MINUTE"),
        "fullOuter",
    ).select(
        F.coalesce(F.col("eu"), F.col("pu")).alias("user_id"),
        F.unix_millis("ets").alias("ets_ms"),
        F.unix_millis("pts").alias("pts_ms"),
    )

    name = f"sink_{uuid.uuid4().hex[:12]}"
    with stream_state_width(spark, f"{sf_dir}/events.parquet"):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    anchor_ok = F.when(
        F.col("ets_ms").isNotNull(), F.col("ets_ms") < F.lit(cutoff_ms)
    ).otherwise(F.col("pts_ms") < F.lit(cutoff_ms))
    return (
        spark.table(name)
        .filter(anchor_ok)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(
                F.when(F.col("ets_ms").isNotNull() & F.col("pts_ms").isNotNull(), 1)
            ).alias("n_matched"),
            F.count(F.when(F.col("pts_ms").isNull(), 1)).alias("n_err_unmatched"),
            F.count(F.when(F.col("ets_ms").isNull(), 1)).alias("n_pur_unmatched"),
        )
    )
