"""Partition transforms (Iceberg bucket/truncate): Spark write expression
and driver-side Python planner must agree bit-for-bit."""

from __future__ import annotations

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from iceberg_catalog_postgres_spark.catalog.catalog import PostgresCatalog, TableIdentifier
from iceberg_catalog_postgres_spark.catalog.table import (
    parse_partition_field,
    transform_column,
    transform_value,
)


@pytest.fixture
def catalog(tmp_path):
    cat = PostgresCatalog.connect("pt_cat", None, str(tmp_path / "warehouse"))
    cat.initialize()
    yield cat
    cat.backend.close()


def test_parse():
    assert parse_partition_field("c") == ("identity", None, "c")
    assert parse_partition_field("bucket(8,o_custkey)") == ("bucket", 8, "o_custkey")
    assert parse_partition_field("truncate(4, name)") == ("truncate", 4, "name")


def test_spark_python_transform_parity(spark):
    """The Spark shadow-column expression and the Python planner transform
    must produce identical strings for every value — the whole design rests
    on this (CRC-32 is the same polynomial on both runtimes)."""
    vals = [(-17, "alpha"), (0, "b"), (5, ""), (123456789, "delta-x"), (7, "éé")]
    df = spark.createDataFrame(vals, "k long, s string")
    for entry, col, dtype in [
        ("bucket(8,k)", "k", LongType()),
        ("bucket(5,s)", "s", StringType()),
        ("truncate(10,k)", "k", LongType()),
        ("truncate(3,s)", "s", StringType()),
        ("k", "k", LongType()),
    ]:
        got = [
            r["t"]
            for r in df.select(transform_column(entry, dtype).alias("t"))
            .collect()
        ]
        want = [transform_value(entry, v[0] if col == "k" else v[1]) for v in vals]
        assert got == want, (entry, got, want)


def test_truncate_negative_int_floor():
    assert transform_value("truncate(10,k)", -7) == "-10"
    assert transform_value("truncate(10,k)", 7) == "0"
    assert transform_value("truncate(10,k)", 20) == "20"
    assert transform_value("bucket(8,k)", None) is None


def test_bucket_partitioned_roundtrip_and_pruning(catalog, spark):
    s = StructType(
        [StructField("k", LongType(), True), StructField("v", LongType(), True)]
    )
    df = spark.createDataFrame([(i, i * 10) for i in range(64)], s)
    t = catalog.create_table(
        TableIdentifier.parse("pt.t1"), s, partition_by=["bucket(4,k)"]
    )
    t = t.new_transaction().append_dataframe(df.coalesce(1)).commit()
    snap = t.metadata.current_snapshot()
    assert len(snap.data_files) == 4  # one file per bucket
    # every file's recorded tuple key is the spec entry
    assert all(set(tup) == {"bucket(4,k)"} for tup in snap.file_partitions.values())
    # full read parity
    assert sorted(r["k"] for r in t.to_df(spark).collect()) == list(range(64))
    # point-lookup pruning: exactly one file planned, correct rows inside
    planned = t.planned_files_transformed({"k": 13})
    assert len(planned) == 1
    rows = spark.read.schema(s).parquet(*planned).filter("k = 13").collect()
    assert [(r["k"], r["v"]) for r in rows] == [(13, 130)]
    # reload keeps working
    t2 = catalog.load_table(TableIdentifier.parse("pt.t1"))
    assert len(t2.planned_files_transformed({"k": 13})) == 1


def test_truncate_string_partitioned_pruning(catalog, spark):
    s = StructType(
        [StructField("name", StringType(), True), StructField("v", LongType(), True)]
    )
    df = spark.createDataFrame(
        [("apple", 1), ("apric", 2), ("banan", 3), ("blueb", 4), ("cherry", 5)], s
    )
    t = catalog.create_table(
        TableIdentifier.parse("pt.t2"), s, partition_by=["truncate(1,name)"]
    )
    t = t.new_transaction().append_dataframe(df.coalesce(1)).commit()
    snap = t.metadata.current_snapshot()
    assert len(snap.data_files) == 3  # prefixes a, b, c
    planned = t.planned_files_transformed({"name": "banan"})
    assert len(planned) == 1
    got = sorted(
        r["name"]
        for r in spark.read.schema(s).parquet(*planned).collect()
    )
    assert got == ["banan", "blueb"]
