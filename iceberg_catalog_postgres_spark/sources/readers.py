"""Source/sink connectors beyond parquet: CSV, JSON, partitioned parquet
with pruning, and the catalog pointer table as a database source.

SURVEY.md §2.C "Scans / sources / sinks". Each round-trips fixture data
through repo-local ``.tmp/`` staging (fixtures are read-only) and is
oracle-checked against the original table — proving the connector is
value-preserving, which is the property that matters.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.registry import load, register

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _staging(name: str, sf_dir: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(_REPO_ROOT, ".tmp", "sources", tag, name)


def dbapi_read(
    spark: SparkSession,
    execute,
    table: str,
    columns: list[tuple[str, str]],
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 1,
) -> DataFrame:
    """Arrow-batched DB-API source — the jar-less mirror of
    ``spark.read.jdbc`` (r8, VERDICT stretch item 8).

    ``execute(sql) -> (rows, rowcount)`` is the catalog backend facade
    (pure-Python Postgres v3 wire client or SQLite). The read mirrors the
    JVM JDBC source's shape on both axes:

    - **partitioned fetch**: with ``partition_column`` + bounds, the table
      is fetched in ``num_partitions`` range slices (``WHERE col >= lo AND
      col < hi`` — the same stride arithmetic ``JDBCRelation.columnPartition``
      uses), so a large operational table streams in bounded pieces instead
      of one unbounded cursor;
    - **Arrow batch transfer**: each slice is columnarized into a pyarrow
      RecordBatch and handed to ``createDataFrame`` as ONE Arrow table —
      zero per-row pickling (the r7 path pickled every row), the same
      columnar batch shape the JDBC path's internal rows take.

    ``columns`` is [(name, spark_type_ddl)]; the Arrow schema is derived
    from it so NULL-only slices keep their declared types."""
    import pyarrow as pa

    from pyspark.sql.types import _parse_datatype_string
    from pyspark.sql.pandas.types import to_arrow_type

    names = [c for c, _ in columns]
    spark_schema = _parse_datatype_string(
        ", ".join(f"{c} {t}" for c, t in columns)
    )
    arrow_schema = pa.schema(
        [
            pa.field(f.name, to_arrow_type(f.dataType), nullable=True)
            for f in spark_schema.fields
        ]
    )
    base = f"SELECT {', '.join(names)} FROM {table}"
    if partition_column is None or num_partitions <= 1:
        slices = [base]
    else:
        lo, hi = int(lower_bound), int(upper_bound)
        stride = max(1, (hi - lo) // num_partitions)
        cuts = [lo + i * stride for i in range(1, num_partitions)]
        slices = []
        prev = None
        for cut in [*cuts, None]:
            conds = []
            if prev is not None:
                conds.append(f"{partition_column} >= {prev}")
            if cut is not None:
                conds.append(f"{partition_column} < {cut}")
            slices.append(base + (f" WHERE {' AND '.join(conds)}" if conds else ""))
            prev = cut
    batches = []
    for sql in slices:
        rows, _ = execute(sql)
        arrays = [
            pa.array([r[i] for r in rows], type=arrow_schema.field(i).type)
            for i in range(len(names))
        ]
        batches.append(pa.record_batch(arrays, schema=arrow_schema))
    return spark.createDataFrame(
        pa.Table.from_batches(batches, schema=arrow_schema)
    )


@register(
    "source_csv_roundtrip",
    oracle="SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 4) AS c_acctbal, c_mktsegment FROM customer",
    tags=("source", "csv"),
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + source with an EXPLICIT schema (never inference in
    production — schema inference is a full extra pass over the data and
    non-deterministic under dirty rows).

    Scale: CSV is a row format — no column pruning, no predicate pushdown,
    no splittable compression by default; the engine treats it as an ingest
    format only, converting to parquet (or a catalog table) at the boundary.
    """
    path = _staging("customer_csv", sf_dir)
    src = load(spark, sf_dir, "customer")
    if not os.path.exists(path):
        src.write.mode("overwrite").option("header", True).csv(path + ".tmp")
        os.rename(path + ".tmp", path)
    schema = "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string"
    return (
        spark.read.schema(schema)
        .option("header", True)
        .csv(path)
        .select("c_custkey", "c_name", "c_nationkey", F.round("c_acctbal", 4).alias("c_acctbal"), "c_mktsegment")
    )


@register(
    "source_json_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("source", "json"),
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + source with explicit schema.

    Scale: like CSV, a boundary format; unlike CSV it nests. from_json +
    explicit schema keeps parsing vectorized and errors surface as nulls
    (inspectable) instead of job failures.
    """
    path = _staging("nation_json", sf_dir)
    src = load(spark, sf_dir, "nation")
    if not os.path.exists(path):
        src.write.mode("overwrite").json(path + ".tmp")
        os.rename(path + ".tmp", path)
    return (
        spark.read.schema("n_nationkey int, n_name string, n_regionkey int")
        .json(path)
        .select("n_nationkey", "n_name", "n_regionkey")
    )


@register(
    "source_partitioned_pruning",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("source", "partitioning"),
)
def source_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned parquet sink + partition-pruned scan: data is
    written partitionBy(o_orderstatus); the filter on the partition column
    prunes whole directories at planning time (PartitionFilters in explain,
    zero I/O for non-matching partitions).

    Scale: THE mechanism for 100 TB tables — partition on the dominant
    filter dimension (date, normally) and queries touch only matching
    partitions. Partition count discipline matters: aim for >= 100 MB per
    partition file, never per-key microfiles.
    """
    path = _staging("orders_by_status", sf_dir)
    src = load(spark, sf_dir, "orders")
    if not os.path.exists(path):
        src.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path + ".tmp")
        os.rename(path + ".tmp", path)
    return (
        spark.read.parquet(path)
        .filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


@register(
    "source_catalog_pointer_db",
    oracle="""
    SELECT * FROM (VALUES
      ('demo_src', 'ns_a', CAST(2 AS BIGINT), CAST(2 AS BIGINT)),
      ('demo_src', 'ns_b', CAST(1 AS BIGINT), CAST(1 AS BIGINT))
    ) AS t(catalog_name, table_namespace, n_tables, n_with_metadata)
    """,
    tags=("source", "jdbc"),
)
def source_catalog_pointer_db(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The catalog's own pointer table as a database source — the analytic
    engine reading its metadata plane (the reference's iceberg_tables,
    mod.rs:365-385).

    In production this is ``spark.read.jdbc(url, "iceberg_tables")`` straight
    at Postgres (catalog ops are point lookups; an analytic scan of the
    pointer table is tiny — O(#tables)). No JDBC driver jar ships in this
    container, so the rows travel via the Python DB-API into
    ``createDataFrame`` — same source semantics, documented substitution.
    """
    work = os.path.join(_REPO_ROOT, ".tmp", "catalog_source_demo")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)

    from iceberg_catalog_postgres_spark.catalog.catalog import PostgresCatalog, TableIdentifier

    catalog = PostgresCatalog.connect(
        "demo_src", f"sqlite://{os.path.join(work, 'catalog.db')}", os.path.join(work, "warehouse")
    )
    catalog.initialize()
    for t in ("ns_a.t1", "ns_a.t2", "ns_b.t1"):
        catalog.create_table(
            TableIdentifier.parse(t), load(spark, sf_dir, "region").schema
        )

    # r8: Arrow-batched transfer (one RecordBatch, zero per-row pickling) —
    # same source semantics as before, JDBC-shaped encoding
    df = dbapi_read(
        spark,
        catalog.backend.execute,
        "iceberg_tables",
        [
            ("catalog_name", "string"),
            ("table_namespace", "string"),
            ("table_name", "string"),
            ("metadata_location", "string"),
        ],
    )
    return df.groupBy("catalog_name", "table_namespace").agg(
        F.count(F.lit(1)).alias("n_tables"),
        F.count(F.col("metadata_location")).alias("n_with_metadata"),
    )


@register(
    "source_orc_roundtrip",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, round(s_acctbal, 4) AS s_acctbal
    FROM supplier
    """,
    tags=("source", "orc"),
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source: the other columnar format Spark ships natively.
    Value-preservation across the round-trip is the contract.

    Scale: ORC, like parquet, supports column pruning and predicate pushdown
    from Catalyst (stripe/row-group statistics), so the scan-side story of
    every parquet query here carries over; choose by ecosystem, not by
    engine capability.
    """
    path = _staging("supplier_orc", sf_dir)
    src = load(spark, sf_dir, "supplier")
    if not os.path.exists(path):
        src.write.mode("overwrite").orc(path + ".tmp")
        os.rename(path + ".tmp", path)
    return spark.read.orc(path).select(
        "s_suppkey", "s_name", "s_nationkey", F.round("s_acctbal", 4).alias("s_acctbal")
    )


@register(
    "source_jdbc_real_roundtrip",
    oracle="""
    SELECT CAST(count(*) AS BIGINT)          AS n_rows,
           CAST(sum(n_nationkey) AS BIGINT)  AS key_sum,
           CAST((SELECT count(*) FROM nation WHERE n_regionkey = 2) AS BIGINT)
             AS n_filtered,
           true AS partitioned_read_parity,
           true AS filter_pushed_to_jdbc
    FROM nation
    """,
    tags=("source", "jdbc"),
)
def source_jdbc_real_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL ``spark.read.jdbc`` path, executable in this container via
    the embedded Derby driver that ships with Spark's Hive support (no
    external server needed — same JDBC code path as Postgres/MySQL):

    1. nation is written through ``df.write.jdbc`` (DDL + batched inserts
       through the JVM driver);
    2. read back THREE ways — plain, PARTITIONED (4 ranges on
       n_nationkey: four concurrent JDBC connections, each fetching its
       slice — the parallel-ingest shape for a 100 TB backfill from an
       operational DB), and with a filter whose plan must show
       ``PushedFilters`` (predicate shipped INTO the database, certified
       boolean);
    3. the oracle pins full row/sum parity and the filtered count.

    This upgrades the catalog's JDBC story from the documented DB-API
    bridge to the genuine JVM JDBC source; swapping Derby for Postgres is
    a URL + driver-class change.
    """
    import os as _os
    import shutil as _shutil

    db_dir = _os.path.join(_REPO_ROOT, ".tmp", "jdbc_derby_demo")
    _shutil.rmtree(db_dir, ignore_errors=True)
    url = f"jdbc:derby:{db_dir};create=true"

    src = load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    src.write.mode("overwrite").format("jdbc").option("url", url).option(
        "dbtable", "nation_jdbc"
    ).save()

    plain = spark.read.format("jdbc").option("url", url).option(
        "dbtable", "nation_jdbc"
    ).load()
    lo, hi = src.agg(F.min("n_nationkey"), F.max("n_nationkey")).first()
    parts = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "nation_jdbc")
        .option("partitionColumn", "n_nationkey")
        .option("lowerBound", str(lo))
        .option("upperBound", str(hi + 1))
        .option("numPartitions", "4")
        .load()
    )
    partitioned_parity = (
        parts.rdd.getNumPartitions() == 4 and parts.count() == plain.count()
    )
    filtered = plain.filter(F.col("n_regionkey") == 2)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    filter_pushed = "PushedFilters" in plan and "n_regionkey" in plan
    n_filtered = filtered.count()

    return plain.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_nationkey").alias("key_sum"),
    ).select(
        "n_rows",
        "key_sum",
        F.lit(n_filtered).cast("long").alias("n_filtered"),
        F.lit(partitioned_parity).alias("partitioned_read_parity"),
        F.lit(filter_pushed).alias("filter_pushed_to_jdbc"),
    )
