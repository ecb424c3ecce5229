"""Spark 4.x API surface: observation metrics and the VARIANT type.

Both matter for a production pipeline (in-flight data-quality counters
without a second pass; schema-flexible JSON ingestion), and both are
oracle-checked on their VALUES: the observed counters and the
variant-extracted aggregates are deterministic, so DuckDB recomputes them
from the raw table even though the observe()/VARIANT machinery itself is
Spark-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.registry import load, register


@register(
    "observe_quality_metrics",
    oracle="""
    SELECT e.event_type, CAST(e.n AS BIGINT) AS n,
           m.n_rows, m.n_negative, m.n_null_props
    FROM (SELECT event_type, count(*) AS n FROM events GROUP BY event_type) e
    CROSS JOIN (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(CASE WHEN value < 0 THEN 1 END) AS BIGINT) AS n_negative,
             CAST(count(CASE WHEN props IS NULL THEN 1 END) AS BIGINT) AS n_null_props
      FROM events
    ) m
    """,
    tags=("spark4", "observability"),
)
def observe_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.observe(): data-quality counters (null rate, negative values,
    row count) collected DURING the main query's single pass — no second
    scan. The observation result is attached back as a literal summary row
    joined to the aggregate output.

    Scale: this is how a 100 TB pipeline gets ingest-quality metrics for
    free — the counters ride the same tasks as the real work.
    """
    obs = Observation("quality")
    ev = load(spark, sf_dir, "events")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("value") < 0, 1)).alias("n_negative"),
        F.count(F.when(F.col("props").isNull(), 1)).alias("n_null_props"),
    )
    result = observed.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).orderBy("event_type")
    result.collect()  # materialize so the observation is populated
    metrics = obs.get
    summary = spark.createDataFrame(
        [(int(metrics["n_rows"]), int(metrics["n_negative"]), int(metrics["n_null_props"]))],
        "n_rows long, n_negative long, n_null_props long",
    )
    return result.crossJoin(F.broadcast(summary))


@register(
    "variant_json_ingest",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           round(avg(k_val), 6) AS avg_k,
           min(k_val) AS min_k,
           max(k_val) AS max_k
    FROM (
      SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
      FROM events WHERE event_id < 500
    )
    """,
    tags=("spark4", "variant"),
)
def variant_json_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT ingestion: parse_json into Spark 4's schema-flexible binary
    JSON type, then typed extraction with variant_get — the
    schema-on-read path for heterogeneous event payloads where a fixed
    from_json schema would churn.

    Scale: variant stores shredded binary JSON — far cheaper to re-extract
    than raw strings, without committing to a rigid struct schema at ingest.
    Gated: falls back to from_json if this Spark build lacks VariantType.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    try:
        v = ev.withColumn("vprops", F.parse_json("props"))
        out = v.select(
            "event_id",
            F.try_variant_get(F.col("vprops"), "$.k", "int").alias("k_val"),
        )
        out.limit(1).collect()  # force analysis to confirm variant support
    except Exception:  # pragma: no cover - older Spark fallback
        out = ev.select(
            "event_id", F.from_json("props", "k INT").getField("k").alias("k_val")
        )
    return out.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("k_val"), 6).alias("avg_k"),
        F.min("k_val").alias("min_k"),
        F.max("k_val").alias("max_k"),
    )
