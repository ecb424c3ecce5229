"""Query registry — the single source of truth consumed by the driver contract.

Every implemented operator from SURVEY.md §2 registers here with
- a Spark callable ``(spark, sf_dir) -> DataFrame``,
- an optional DuckDB oracle SQL string (ANSI SQL over the same parquet views),
- a docstring carrying the reference citation and the 100 TB scaling argument.

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this dict.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a query under ``name`` with its DuckDB oracle SQL."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Scan one fixture table.

    Parquet scan is the base of every plan: Catalyst pushes filters and prunes
    columns into this scan (visible as PushedFilters / ReadSchema in
    ``.explain``), so at 100 TB only the referenced columns and matching
    row-groups are read.

    ``events.ts`` is TIMESTAMP(NANOS) in the footer, which Spark's reader
    rejects; with ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as a
    nanosecond epoch long and is converted here to TIMESTAMP_NTZ by integer
    floor-division to microseconds — the same truncation DuckDB applies.
    """
    if table == "events":
        # The driver may hand us a session without these confs; both are
        # runtime-settable. nanosAsLong is required or the TIMESTAMP(NANOS)
        # footer fails to read; UTC pins the rendering of the converted
        # (timezone-aware) ts column so window/date_format output is
        # deterministic regardless of host timezone.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            # TimestampType (not NTZ) so unix_millis & friends work; session
            # tz is pinned UTC so the wall-clock matches DuckDB's naive value.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_parallel(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Scan + spread across the engine's full parallelism.

    The local fixtures are single-file, single-row-group parquet, so Spark
    plans ONE input split and any CPU-dense per-row pipeline (hashing,
    shingling, vector math) runs on one core. A real 100 TB table has
    thousands of row-groups and needs no such repartition — this trades one
    small shuffle for full-width map stages on the fixture. Use for
    compute-bound operators only; scan-bound aggregations stay on `load`.
    """
    return load(spark, sf_dir, table).repartition(spark.sparkContext.defaultParallelism)


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registration) and return REGISTRY."""
    import iceberg_catalog_postgres_spark.operators.tpch  # noqa: F401
    import iceberg_catalog_postgres_spark.operators.tpch2  # noqa: F401
    import iceberg_catalog_postgres_spark.operators.relational  # noqa: F401
    import iceberg_catalog_postgres_spark.operators.joins  # noqa: F401
    import iceberg_catalog_postgres_spark.operators.advanced  # noqa: F401
    import iceberg_catalog_postgres_spark.operators.scale_patterns  # noqa: F401
    import iceberg_catalog_postgres_spark.operators.bucketing  # noqa: F401
    import iceberg_catalog_postgres_spark.operators.windows  # noqa: F401
    import iceberg_catalog_postgres_spark.functions.scalar  # noqa: F401
    import iceberg_catalog_postgres_spark.functions.udfs  # noqa: F401
    import iceberg_catalog_postgres_spark.functions.misc  # noqa: F401
    import iceberg_catalog_postgres_spark.functions.spark4  # noqa: F401
    import iceberg_catalog_postgres_spark.sources.readers  # noqa: F401
    import iceberg_catalog_postgres_spark.sources.catalog_datasource  # noqa: F401
    import iceberg_catalog_postgres_spark.llm.dedup  # noqa: F401
    import iceberg_catalog_postgres_spark.llm.similarity  # noqa: F401
    import iceberg_catalog_postgres_spark.llm.quantize  # noqa: F401
    import iceberg_catalog_postgres_spark.llm.neardup_embed  # noqa: F401
    import iceberg_catalog_postgres_spark.llm.ann_recall  # noqa: F401
    import iceberg_catalog_postgres_spark.llm.ann_multitable  # noqa: F401
    import iceberg_catalog_postgres_spark.llm.clusters  # noqa: F401
    import iceberg_catalog_postgres_spark.llm.text  # noqa: F401
    import iceberg_catalog_postgres_spark.llm.multimodal  # noqa: F401
    import iceberg_catalog_postgres_spark.streaming.windows  # noqa: F401
    import iceberg_catalog_postgres_spark.streaming.joins  # noqa: F401
    import iceberg_catalog_postgres_spark.catalog.queries  # noqa: F401
    import iceberg_catalog_postgres_spark.catalog.integration  # noqa: F401
    import iceberg_catalog_postgres_spark.catalog.maintenance  # noqa: F401

    return REGISTRY
