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


@register(
    "funnel_three_step_strict",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_step1,
           CAST((SELECT count(*) FROM s2) AS BIGINT) AS n_step2,
           CAST((SELECT count(*) FROM s3) AS BIGINT) AS n_step3,
           round(CAST((SELECT count(*) FROM s3) AS DOUBLE)
                 / (SELECT count(*) FROM s1), 6) AS full_conversion
    FROM (SELECT 1)
    """,
    tags=("streaming", "funnel", "sessionization"),
)
def funnel_three_step_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order 3-step funnel (view -> click -> purchase): each step
    counts users whose FIRST qualifying event strictly follows their
    previous step's first event — the standard product-analytics funnel
    with order enforcement, not mere co-occurrence.

    Plan: one conditional-min aggregation per user computes the first
    'view'; each later step is a per-user min over events AFTER the
    carried timestamp — expressed as chained conditional aggregations on
    ONE user_id shuffle (the events scan is shared; every stage regroups
    by the same key, so AQE reuses the exchange). No self-join explosion:
    funnels over 10^9 users are groupBy pipelines, never event-to-event
    joins.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n1 = s1.agg(F.count(F.lit(1)).alias("n_step1"))
    n2 = s2.agg(F.count(F.lit(1)).alias("n_step2"))
    n3 = s3.agg(F.count(F.lit(1)).alias("n_step3"))
    return (
        n1.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(n3))
        .select(
            "n_step1",
            "n_step2",
            "n_step3",
            F.round(F.col("n_step3").cast("double") / F.col("n_step1"), 6).alias(
                "full_conversion"
            ),
        )
    )


@register(
    "ts_resample_ohlc",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket,
           round(arg_min(value, ts), 4)  AS open,
           round(max(value), 4)          AS high,
           round(min(value), 4)          AS low,
           round(arg_max(value, ts), 4)  AS close,
           CAST(count(*) AS BIGINT)      AS n_events
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    tags=("timeseries", "resample", "ohlc"),
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling (the financial-bar / metrics-rollup shape): hourly
    buckets of purchase values with open = value at the earliest event in
    the bucket, close = at the latest, plus high/low/count — all via
    ``min_by``/``max_by`` ordered aggregates in ONE groupBy, no window
    function and no sort.

    Tie note: DuckDB's ``arg_min``/``arg_max`` and Spark's
    ``min_by``/``max_by`` both pick an arbitrary row on exactly-equal
    timestamps; the fixture's event timestamps are unique per
    (type, bucket) at these scales, so the contract is exact here — a
    production pipeline adds event_id to the ordering key.

    Scale: one keyed shuffle on the bucket; each bar is O(1) state — this
    is the map-side-combinable alternative to sorting every bucket.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.round(F.min_by("value", "ts"), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", "ts"), 4).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "trend_slope_per_user",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(regr_slope(value, epoch(ts)), 6) + 0 AS slope_per_sec,
           round(regr_r2(value, epoch(ts)), 4) + 0    AS fit_r2
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY user_id
    HAVING count(*) >= 8
    """,
    tags=("timeseries", "regression", "trend"),
)
def trend_slope_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity TREND detection: least-squares slope (and fit quality) of
    purchase value over time for every user with enough history — the
    screening pass behind churn/growth alerting ("whose spend is
    decaying?"). ``regr_slope``/``regr_r2`` are built-in JVM aggregates, so
    the whole scan is one map-side-combinable groupBy; no window, no sort,
    no UDF.

    Scale: O(1) state per user (the five regression moments), one keyed
    shuffle — the cheapest possible formulation; fitting 10^9 entity
    trends is exactly one pass over the fact table.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    x = F.unix_timestamp("ts").cast("double")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.round(F.regr_slope(F.col("value"), x), 6) + F.lit(0.0)).alias("slope_per_sec"),
            (F.round(F.regr_r2(F.col("value"), x), 4) + F.lit(0.0)).alias("fit_r2"),
        )
        .filter(F.col("n_events") >= 8)
    )


SESSION_CAP_MS = 2 * 3600 * 1000  # max session duration before a forced split


@register(
    "sessionize_gap_capped",
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
      SELECT user_id, event_id, value, ms,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
                               ROWS UNBOUNDED PRECEDING) AS gap_seq
      FROM marked
    ), capped AS (
      SELECT user_id, gap_seq, value, ms,
             CAST((ms - min(ms) OVER (PARTITION BY user_id, gap_seq))
                  // {SESSION_CAP_MS} AS BIGINT) AS cap_seq
      FROM sessions
    )
    SELECT user_id,
           CAST(gap_seq AS BIGINT) AS gap_seq,
           cap_seq,
           count(*)                AS n_events,
           max(ms) - min(ms)       AS dur_ms,
           round(sum(value), 6)    AS sum_value
    FROM capped GROUP BY user_id, gap_seq, cap_seq
    HAVING count(*) > 1
    """,
    tags=("events", "analytics", "session", "cap"),
)
def sessionize_gap_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization with a MAX-DURATION cap: a session also splits
    when it runs past 2 hours from its start — the rule that stops a
    bot or an idle-but-polling client from producing an unbounded
    "session" (the state-explosion case streaming session windows guard
    against with timeouts). Split points are fixed cap-width boundaries
    from the session's first event: sub-session = elapsed // cap, a pure
    projection over the gap-session window — no iteration, no UDF.

    Scale: same single user_id shuffle as the uncapped version; both the
    gap flag and the cap bucket are window expressions over the one sort.
    The same one-pass trick is the batch twin of a streaming session
    window with a max-duration timeout.
    """
    ev = load(spark, sf_dir, "events")
    ms = F.unix_millis("ts")
    w = Window.partitionBy("user_id").orderBy(ms.asc(), F.col("event_id").asc())
    marked = ev.select(
        "user_id", "event_id", "value", ms.alias("ms")
    ).withColumn(
        "is_new",
        F.when(
            F.lag("ms").over(
                Window.partitionBy("user_id").orderBy(
                    F.col("ms").asc(), F.col("event_id").asc()
                )
            ).isNull()
            | (
                F.col("ms")
                - F.lag("ms").over(
                    Window.partitionBy("user_id").orderBy(
                        F.col("ms").asc(), F.col("event_id").asc()
                    )
                )
                > SESSION_GAP_MS
            ),
            1,
        ).otherwise(0),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ms").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = marked.withColumn("gap_seq", F.sum("is_new").over(wrun))
    wsess = Window.partitionBy("user_id", "gap_seq")
    capped = sess.withColumn(
        "cap_seq",
        F.floor((F.col("ms") - F.min("ms").over(wsess)) / SESSION_CAP_MS).cast("long"),
    )
    return (
        capped.groupBy("user_id", "gap_seq", "cap_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max("ms") - F.min("ms")).alias("dur_ms"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .filter(F.col("n_events") > 1)
        .withColumn("gap_seq", F.col("gap_seq").cast("long"))
    )


@register(
    "events_max_concurrent",
    oracle="""
    WITH iv AS (
      SELECT epoch_ms(ts) AS s, epoch_ms(ts) + 600000 AS e
      FROM events WHERE event_type = 'purchase'
    ),
    pts AS (
      SELECT s AS t, 1 AS d FROM iv
      UNION ALL
      SELECT e AS t, -1 AS d FROM iv
    ),
    run AS (
      SELECT sum(d) OVER (ORDER BY t ASC, d ASC ROWS UNBOUNDED PRECEDING) AS conc
      FROM pts
    )
    SELECT CAST(max(conc) AS BIGINT) AS peak_concurrency,
           CAST((SELECT count(*) FROM iv) AS BIGINT) AS n_intervals
    FROM run
    """,
    tags=("events", "analytics", "concurrency"),
)
def events_max_concurrent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEAK CONCURRENCY by BUCKETED sweep-line: each purchase opens a
    10-minute interval; emit (+1 at start, -1 at end) and running-sum the
    deltas in timestamp order, taking the max — the classic
    capacity-planning question ("how many sessions were ever open at
    once?") answered without any interval self-join. Equal timestamps
    process ends before starts (delta ascending), so touching intervals do
    not double-count.

    Scale (the 100 TB shape, implemented): the running sum is PARTITIONED
    by coarse time bucket (1-hour) and stitched — within each bucket an
    ordinary partitioned window computes the local prefix sum; a second
    aggregate reduces each bucket to its delta total (one row per bucket),
    a window over THOSE per-bucket rows (bounded by the time range, not
    the data volume) produces each bucket's starting concurrency, and a
    broadcast join adds the offset back. No un-partitioned data-
    proportional window remains: every shuffle is keyed by bucket, and the
    only ordered pass over "all rows" runs over one row per hour.
    ``tests/test_sweepline_stitch.py`` pins bucketed == global on a skewed
    synthetic burst.
    """
    pts = _purchase_interval_deltas(load(spark, sf_dir, "events"))
    # n_intervals folds into the stitched aggregate (half the sweep points)
    # — one pass over the purchase stream, not a second count() scan
    peak = _bucketed_sweep_max(pts)
    return peak.select(
        F.col("peak_concurrency").cast("long"),
        F.col("n_intervals").cast("long"),
    )


def _purchase_interval_deltas(events: DataFrame) -> DataFrame:
    """(t, d) sweep-line points for the 10-minute purchase intervals."""
    iv = (
        events.filter(F.col("event_type") == "purchase")
        .select(F.unix_millis("ts").alias("s"))
        .withColumn("e", F.col("s") + 600000)
    )
    return iv.select(F.col("s").alias("t"), F.lit(1).alias("d")).unionByName(
        iv.select(F.col("e").alias("t"), F.lit(-1).alias("d"))
    )


def _bucketed_sweep_max(pts: DataFrame, bucket_ms: int = 3600_000) -> DataFrame:
    """max running-sum of (t, d) deltas via the bucket-and-stitch recipe.

    1. bucket = t div W — every subsequent shuffle is keyed on it.
    2. local prefix sums inside each bucket (partitioned window).
    3. per-bucket delta totals (one row per bucket) -> exclusive running
       sum over buckets = each bucket's initial concurrency. This window
       IS ordered but runs over |time-range / W| rows, not |data| rows.
    4. broadcast the per-bucket offsets back; conc = offset + local.
    """
    from pyspark.sql.window import Window as W

    b = pts.withColumn("bkt", F.floor(F.col("t") / F.lit(bucket_ms)).cast("long"))
    w_local = (
        W.partitionBy("bkt")
        .orderBy(F.col("t").asc(), F.col("d").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = b.withColumn("run_local", F.sum("d").over(w_local))
    totals = b.groupBy("bkt").agg(F.sum("d").alias("bkt_total"))
    w_bkts = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "bkt", F.coalesce(F.sum("bkt_total").over(w_bkts), F.lit(0)).alias("offset")
    )
    stitched = local.join(F.broadcast(offsets), "bkt").withColumn(
        "conc", F.col("offset") + F.col("run_local")
    )
    return stitched.agg(
        F.max("conc").alias("peak_concurrency"),
        # each interval contributes one +1 and one -1 point, so the interval
        # count rides along in the same aggregate — no extra scan
        (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
    )


@register(
    "ts_gap_fill_locf",
    oracle="""
    WITH ev AS (
      SELECT event_type, date_trunc('hour', ts) AS h, value FROM events
    ),
    b AS (SELECT min(h) AS lo, max(h) AS hi FROM ev),
    spine AS (
      SELECT t.event_type, s.h
      FROM (SELECT DISTINCT event_type FROM ev) t,
           (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b) s
    ),
    agg AS (
      SELECT event_type, h, count(*) AS n, round(min(value), 2) AS v
      FROM ev GROUP BY 1, 2
    )
    SELECT s.event_type,
           strftime(s.h, '%Y-%m-%d %H:%M:%S') AS bucket_start,
           CAST(coalesce(a.n, 0) AS BIGINT)   AS n_events,
           last_value(a.v IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_locf
    FROM spine s LEFT JOIN agg a ON s.event_type = a.event_type AND s.h = a.h
    """,
    tags=("events", "timeseries", "gapfill", "locf"),
)
def ts_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series GAP FILLING + last-observation-carried-forward (the
    timescaledb ``time_bucket_gapfill``/``locf`` operator): hourly buckets
    per event_type, a generated dense hour spine (``sequence`` + explode —
    JVM-side, no driver loop), missing hours materialized with count 0 and
    the metric (per-hour min(value) — chosen over avg because min is
    fp-order-independent, keeping the oracle hash exact) carried forward
    from the last observed hour (leading gaps
    stay NULL — nothing to carry). Every downstream consumer of regular
    time series (charting, forecasting, joins on bucket keys) needs this
    shape; at sf0.001 each type is present in only ~175 of 720 hours.

    Scale: the spine is O(types x time-range), independent of data volume —
    built from a broadcast 1-row bounds aggregate crossed with the distinct
    type list. The LOCF window partitions by event_type and runs over
    spine rows (time-range-bounded, NOT data-proportional) — the same
    bounded-frame discipline as every other window in the package. The
    hourly pre-aggregate shuffles once on (type, hour) with map-side
    partials.
    """
    ev = (
        load(spark, sf_dir, "events")
        .select("event_type", F.date_trunc("hour", "ts").alias("h"), "value")
    )
    agg = ev.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.min("value"), 2).alias("v")
    )
    bounds = ev.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("h"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(agg, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
            F.last("v", ignorenulls=True).over(w).alias("value_locf"),
        )
    )


@register(
    "ts_ewma_bounded",
    oracle="""
    WITH agg AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(count(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2
    ), w AS (
      SELECT event_type, h, n,
             list(n) OVER (PARTITION BY event_type ORDER BY h
                           ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS vals
      FROM agg
    )
    SELECT event_type,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS bucket_start,
           CAST(n AS BIGINT) AS n_events,
           round(list_reduce(vals, (acc, x) -> acc * 0.5 + x)
                 / ((1 - pow(0.5, len(vals))) / 0.5), 6) AS ewma
    FROM w
    """,
    tags=("events", "timeseries", "ewma", "smoothing"),
)
def ts_ewma_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average over hourly event counts with a
    BOUNDED 12-bucket frame — the standard smoothing operator (pandas
    ``ewm``, Prometheus-style trend lines) re-expressed as a windowed
    higher-order fold so it runs JVM-side at any scale. Per frame:
    ``aggregate(vals, 0D, (acc, x) -> acc*decay + x)`` left-folds the
    frame's values into ``sum x_j * decay^(n-j)``, normalized by the
    geometric partial sum ``(1-decay^n)/(1-decay)`` — weights-normalized
    EWMA over exactly the observations in frame (pandas ``ewm(adjust=True)``
    over the last 12 points).

    Cross-engine determinism: Spark's ``aggregate`` with init 0 and
    DuckDB's ``list_reduce`` (init = first element) perform the IDENTICAL
    fp operation sequence over the identically-ordered frame list
    (0*d + x1 == x1), so the doubles match bit-for-bit before rounding —
    no fp-sum-order hazard (the trap ``ts_gap_fill_locf`` dodged by using
    min).

    Scale: the unbounded EWMA recursion is inherently sequential; the
    bounded-frame form (decay 0.5 ⇒ a 12-step tail is < 0.025% of the
    weight) makes it a per-row O(frame) expression inside an ordinary
    partitioned window — no UDF, no driver loop, frames bounded by a
    constant, partitions keyed by series (event_type), shuffle count 1.
    """
    agg = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-11, Window.currentRow)
    )
    return (
        agg.withColumn("vals", F.collect_list("n").over(w))
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            F.col("n").cast("long").alias("n_events"),
            F.round(
                F.expr("aggregate(vals, 0D, (acc, x) -> acc * 0.5D + x)")
                / ((F.lit(1.0) - F.pow(F.lit(0.5), F.size("vals"))) / F.lit(0.5)),
                6,
            ).alias("ewma"),
        )
    )


@register(
    "ts_gapfill_ewma_composed",
    oracle="""
    WITH ev AS (
      SELECT event_type, date_trunc('hour', ts) AS h, value FROM events
    ),
    b AS (SELECT min(h) AS lo, max(h) AS hi FROM ev),
    spine AS (
      SELECT t.event_type, s.h
      FROM (SELECT DISTINCT event_type FROM ev) t,
           (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b) s
    ),
    agg AS (
      SELECT event_type, h, CAST(count(*) AS DOUBLE) AS n FROM ev GROUP BY 1, 2
    ),
    dense AS (
      SELECT s.event_type, s.h, coalesce(a.n, 0.0) AS n
      FROM spine s LEFT JOIN agg a ON s.event_type = a.event_type AND s.h = a.h
    ),
    w AS (
      SELECT event_type, h, n,
             list(n) OVER (PARTITION BY event_type ORDER BY h
                           ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS vals
      FROM dense
    )
    SELECT event_type,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS bucket_start,
           CAST(n AS BIGINT) AS n_events,
           round(list_reduce(vals, (acc, x) -> acc * 0.5 + x)
                 / ((1 - pow(0.5, len(vals))) / 0.5), 6) AS ewma
    FROM w
    """,
    tags=("events", "timeseries", "gapfill", "ewma", "composed"),
)
def ts_gapfill_ewma_composed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill COMPOSED with EWMA — the production smoothing pipeline:
    empty hours materialize as zeros first (so the average actually decays
    through quiet periods instead of skipping them — the semantic
    difference from ``ts_ewma_bounded``, which smooths only observed
    buckets), then the bounded exponential fold runs over the DENSE series.
    One oracle certifies the composition end to end over all 3600
    (type, hour) cells.

    Scale: composition adds nothing to the shuffle count — the spine join
    and the window share the event_type partitioning, the frame stays
    constant-bounded, and the fold is the same bit-exact JVM/DuckDB pair as
    ``ts_ewma_bounded``."""
    ev = (
        load(spark, sf_dir, "events")
        .select("event_type", F.date_trunc("hour", "ts").alias("h"))
    )
    agg = ev.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    bounds = ev.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h"),
        )
    )
    dense = spine.join(agg, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("n", F.lit(0.0)).alias("n")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-11, Window.currentRow)
    )
    return dense.withColumn("vals", F.collect_list("n").over(w)).select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        F.col("n").cast("long").alias("n_events"),
        F.round(
            F.expr("aggregate(vals, 0D, (acc, x) -> acc * 0.5D + x)")
            / ((F.lit(1.0) - F.pow(F.lit(0.5), F.size("vals"))) / F.lit(0.5)),
            6,
        ).alias("ewma"),
    )
