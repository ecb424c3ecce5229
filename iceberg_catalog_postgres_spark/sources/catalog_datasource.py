"""Python DataSource API (Spark 4) connector for the catalog pointer table:
``spark.read.format("iceberg_pointers").option("db", ...)`` — a REAL
pluggable source (schema + partition planning + per-partition readers), not
a driver-side createDataFrame bridge.

This is the JDBC-source slot from SURVEY §2.C filled with pure PySpark
machinery: the DataSource runs its readers on executors, so at scale each
partition opens its own connection and reads its slice — the same
architecture as spark.read.jdbc, minus the driver jar this container lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from iceberg_catalog_postgres_spark.registry import load, register

_SCHEMA = (
    "catalog_name string, table_namespace string, table_name string, "
    "metadata_location string, previous_metadata_location string"
)


class _PointerPartition(InputPartition):
    def __init__(self, db_path: str, bucket: int, n_buckets: int):
        self.db_path = db_path
        self.bucket = bucket
        self.n_buckets = n_buckets


class IcebergPointersReader(DataSourceReader):
    def __init__(self, options: dict):
        self.db_path = options["db"]
        self.n_buckets = int(options.get("partitions", "2"))

    def partitions(self):
        """Split the scan by a hash of the PK — each executor-side reader
        pulls only its bucket (the generalizable pattern for range/hash
        partitioned JDBC reads at scale)."""
        return [
            _PointerPartition(self.db_path, b, self.n_buckets) for b in range(self.n_buckets)
        ]

    def read(self, partition: _PointerPartition):
        # runs ON THE EXECUTOR: own connection, own slice. Bucketing uses
        # crc32, NOT Python's hash() — hash() is seeded per process, so two
        # workers could disagree and a row would land in 0 or 2 partitions.
        import sqlite3
        import zlib

        conn = sqlite3.connect(partition.db_path)
        try:
            cur = conn.execute(
                "SELECT catalog_name, table_namespace, table_name, "
                "metadata_location, previous_metadata_location FROM iceberg_tables"
            )
            for row in cur:
                key = f"{row[0]}.{row[1]}.{row[2]}"
                if zlib.crc32(key.encode()) % partition.n_buckets == partition.bucket:
                    yield row
        finally:
            conn.close()


class IcebergPointersDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "iceberg_pointers"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return IcebergPointersReader(self.options)


@register(
    "source_datasource_api_pointers",
    oracle="""
    SELECT * FROM (VALUES
      ('ds_demo', 'ns_a', CAST(2 AS BIGINT), CAST(2 AS BIGINT)),
      ('ds_demo', 'ns_b', CAST(3 AS BIGINT), CAST(3 AS BIGINT))
    ) AS t(catalog_name, table_namespace, n_tables, n_with_metadata)
    """,
    tags=("source", "datasource-api"),
)
def source_datasource_api_pointers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the catalog pointer table through the registered custom
    DataSource — schema resolution, partition planning (2 hash buckets),
    and executor-side sqlite readers all exercised.

    The pointer paths are run-dependent, so the output aggregates to
    namespace counts, which the oracle pins exactly (5 tables created in a
    fixed layout; every one must surface through the DataSource with a
    metadata pointer set).
    """
    import os
    import shutil

    from iceberg_catalog_postgres_spark.catalog.catalog import PostgresCatalog, TableIdentifier

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    work = os.path.join(repo_root, ".tmp", "datasource_demo")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    db = os.path.join(work, "catalog.db")

    cat = PostgresCatalog.connect("ds_demo", f"sqlite://{db}", os.path.join(work, "wh"))
    cat.initialize()
    for t in ("ns_a.t1", "ns_a.t2", "ns_b.t1", "ns_b.t2", "ns_b.t3"):
        cat.create_table(TableIdentifier.parse(t), load(spark, sf_dir, "region").schema)

    spark.dataSource.register(IcebergPointersDataSource)
    df = spark.read.format("iceberg_pointers").option("db", db).option("partitions", "2").load()
    return (
        df.groupBy("catalog_name", "table_namespace")
        .agg(
            F.count(F.lit(1)).alias("n_tables"),
            F.count("metadata_location").alias("n_with_metadata"),
        )
        .orderBy("table_namespace")
    )
