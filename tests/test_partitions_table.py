"""The ``partitions`` metadata table (``partitions_df``): per-partition
footprint + delete attribution + last-updated lineage, served from the
metadata tree."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.catalog.catalog import (
    PostgresCatalog,
    TableIdentifier,
)
from iceberg_catalog_postgres_spark.catalog.maintenance import partitions_df


@pytest.fixture
def catalog(tmp_path):
    cat = PostgresCatalog.connect("ptbl", None, str(tmp_path / "wh"))
    cat.initialize()
    yield cat
    cat.backend.close()


def test_partitions_df_counts_and_last_updated(catalog, spark):
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "k long, r long"
    )
    t = catalog.create_table(
        TableIdentifier.parse("p.t"), df.schema, partition_by=["r"]
    )
    t = t.new_transaction().append_dataframe(df.coalesce(1)).commit()
    s1 = t.metadata.current_snapshot_id
    # second append touches ONLY partition r=0
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(100, 0)], "k long, r long").coalesce(1)
    ).commit()
    s2 = t.metadata.current_snapshot_id

    rows = {r.r: r for r in partitions_df(spark, t).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0].record_count == 11 and rows[0].file_count == 2
    assert rows[1].record_count == 10 and rows[1].file_count == 1
    assert rows[0].last_updated_snapshot_id == s2
    assert rows[1].last_updated_snapshot_id == s1
    assert rows[2].last_updated_snapshot_id == s1
    assert all(r.total_data_file_size_in_bytes > 0 for r in rows.values())
    assert all(
        r.position_delete_record_count == 0
        and r.equality_delete_record_count == 0
        for r in rows.values()
    )


def test_partitions_df_delete_attribution(catalog, spark):
    df = spark.createDataFrame(
        [(i, i % 2) for i in range(20)], "k long, r long"
    )
    t = catalog.create_table(
        TableIdentifier.parse("p.d"), df.schema, partition_by=["r"]
    )
    t = t.new_transaction().append_dataframe(df.coalesce(1)).commit()
    doomed = (
        t.to_df(spark)
        .withColumn("file_path", F.col("_metadata.file_path"))
        .withColumn("row_index", F.col("_metadata.row_index"))
        .where(F.col("k").isin(0, 2, 4))  # all r=0
        .select("file_path", "row_index")
        .coalesce(1)
    )
    t = t.new_transaction().delete_positions_dataframe(doomed).commit()
    keys = spark.createDataFrame([(1,), (3,)], "k long").coalesce(1)  # r=1
    t = t.new_transaction().delete_keys_dataframe(keys).commit()

    rows = {r.r: r for r in partitions_df(spark, t).collect()}
    assert rows[0].position_delete_record_count == 3
    assert rows[0].position_delete_file_count == 1
    assert rows[0].equality_delete_record_count == 0
    assert rows[1].equality_delete_record_count == 2
    assert rows[1].equality_delete_file_count == 1
    assert rows[1].position_delete_record_count == 0
    # record_count stays PRE-delete (the spec meaning)
    assert rows[0].record_count == 10 and rows[1].record_count == 10


def test_partitions_df_no_snapshot_raises(catalog, spark):
    df = spark.createDataFrame([(1,)], "k long")
    t = catalog.create_table(TableIdentifier.parse("p.u"), df.schema)
    with pytest.raises(ValueError, match="snapshot"):
        partitions_df(spark, t)


def test_partitions_df_attributes_deletion_vectors(catalog, spark):
    """v3 deletion vectors count as position deletes in table$partitions —
    a zero-I/O fold from the vector map's cardinalities (r11)."""
    df = spark.createDataFrame(
        [(i, i % 2) for i in range(20)], "k long, r long"
    )
    t = catalog.create_table(
        TableIdentifier.parse("p.dv"), df.schema, partition_by=["r"]
    )
    t = t.new_transaction().append_dataframe(df.coalesce(1)).commit()
    doomed = (
        t.to_df(spark)
        .withColumn("file_path", F.col("_metadata.file_path"))
        .withColumn("row_index", F.col("_metadata.row_index"))
        .where(F.col("k").isin(0, 2, 4, 6))  # all r=0
        .select("file_path", "row_index")
    )
    t = t.new_transaction().delete_positions_dv(doomed).commit()
    rows = {r.r: r for r in partitions_df(spark, t).collect()}
    assert rows[0].position_delete_record_count == 4
    assert rows[0].position_delete_file_count == 1  # one vector
    assert rows[1].position_delete_record_count == 0
    assert rows[0].record_count == 10  # pre-delete, the spec meaning


def test_partitions_df_after_mor_merge(catalog, spark):
    """A MOR multi-clause merge's row delta surfaces in table$partitions:
    DV-deleted originals count as position deletes, appended update files
    join their partitions' file counts."""
    from iceberg_catalog_postgres_spark.catalog.maintenance import merge_into

    df = spark.createDataFrame(
        [(i, i % 2) for i in range(10)], "k long, r long"
    )
    t = catalog.create_table(
        TableIdentifier.parse("p.mm"), df.schema, partition_by=["r"]
    )
    t = t.new_transaction().append_dataframe(df.coalesce(1)).commit()
    src = spark.createDataFrame([(0, 0), (2, 0)], "k long, r long")
    t = merge_into(
        spark, t, src, on=["k"],
        when_matched=[{"action": "update", "set": {"r": "t.r"}},],
        strategy="mor",
    )
    # the matched rows (k=0,2, both r=0) are rewritten by the row delta
    # regardless of the values assigned: originals -> DV, new versions
    # appended
    rows = {r.r: r for r in partitions_df(spark, t).collect()}
    assert rows[0].position_delete_record_count == 2
    assert rows[0].file_count >= 2  # base file + the row-delta append
    assert rows[1].position_delete_record_count == 0


def test_partitions_df_unpartitioned_single_row(catalog, spark):
    """r12 (VERDICT r11 #6): an unpartitioned table serves Iceberg's
    single-row form — whole-table footprint, no partition columns — where
    it previously raised (BI tools expect the row)."""
    from iceberg_catalog_postgres_spark.catalog.catalog import TableIdentifier

    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(20)], "k long, name string"
    )
    t = catalog.create_table(TableIdentifier.parse("pt.unpart"), df.schema)
    t = t.new_transaction().append_dataframe(df.coalesce(2)).commit()
    keys = spark.createDataFrame([(3,)], "k long").coalesce(1)
    t = t.new_transaction().delete_keys_dataframe(keys).commit()
    rows = partitions_df(spark, t).collect()
    assert len(rows) == 1
    (r,) = rows
    assert r.record_count == 20 and r.file_count == 2
    assert r.equality_delete_record_count == 1
    assert r.last_updated_snapshot_id is not None
    # no partition columns in the schema
    assert [f for f in partitions_df(spark, t).columns] == [
        "spec_id", "record_count", "file_count",
        "total_data_file_size_in_bytes", "position_delete_record_count",
        "position_delete_file_count", "equality_delete_record_count",
        "equality_delete_file_count", "last_updated_at",
        "last_updated_snapshot_id",
    ]
