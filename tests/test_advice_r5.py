"""Regression tests for the r5 ADVICE defects (maintenance/table edge cases):
empty-table vacuum, changelog duplicate-delete emission, z-order NULL range.
(The NDV delta-only fix is covered in test_ndv.py; the bucket-hash
canonicalization fix in test_partition_transforms.py.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from iceberg_catalog_postgres_spark.catalog.catalog import (
    PostgresCatalog,
    TableIdentifier,
)
from iceberg_catalog_postgres_spark.catalog.maintenance import vacuum


@pytest.fixture
def catalog(tmp_path):
    cat = PostgresCatalog.connect("advice_cat", None, str(tmp_path / "warehouse"))
    cat.initialize()
    yield cat
    cat.backend.close()


S = StructType(
    [StructField("k", LongType(), True), StructField("v", LongType(), True)]
)


def test_vacuum_empty_table_is_noop(catalog, spark):
    """A scheduler vacuuming every table must not crash on one that was
    created but never written (no snapshots -> no current_snapshot)."""
    t = catalog.create_table(TableIdentifier.parse("adv.empty"), S)
    t2, report = vacuum(t)
    assert t2.metadata.current_snapshot() is None
    assert report["manifest_chunks_consolidated"] == 0
    assert report["snapshots_expired"] == 0


def test_changelog_delete_emitted_once_for_keys_split_across_files(
    catalog, spark
):
    """A key whose rows land in MORE THAN ONE delete part file of the same
    snapshot (duplicate keys in the staged frame, split by repartition)
    must produce its 'delete' change exactly once — matching the read
    path's unioned anti-join."""
    t = catalog.create_table(TableIdentifier.parse("adv.cdc"), S)
    src = spark.createDataFrame([(i, i * 10) for i in range(20)], S)
    t = t.new_transaction().append_dataframe(src.coalesce(1)).commit()
    from_id = t.metadata.current_snapshot_id

    # key 7 twice + key 3 once, spread over 3 part files so 7's copies land
    # in different files
    keys = spark.createDataFrame([(7,), (7,), (3,)], "k long").repartition(3)
    t = t.new_transaction().delete_keys_dataframe(keys).commit()
    assert len(t.metadata.current_snapshot().delete_files) > 1

    changes = t.changelog_df(spark, from_id).filter(
        F.col("_change_type") == "delete"
    )
    got = sorted(r["k"] for r in changes.collect())
    assert got == [3, 7]  # each removed row exactly once

    # and the read path agrees on the final state
    remaining = sorted(r["k"] for r in t.to_df(spark).collect())
    assert remaining == [i for i in range(20) if i not in (3, 7)]


def test_zorder_write_with_all_null_column_falls_back(catalog, spark):
    """zorder_by with an all-NULL column (min/max None) must degrade to a
    working write, not raise TypeError on float(None)."""
    t = catalog.create_table(TableIdentifier.parse("adv.znull"), S)
    df = spark.createDataFrame([(i, None) for i in range(10)], S)
    t = t.new_transaction().append_dataframe(df, zorder_by=["k", "v"]).commit()
    assert sorted(r["k"] for r in t.to_df(spark).collect()) == list(range(10))


def test_zorder_write_empty_frame(catalog, spark):
    t = catalog.create_table(TableIdentifier.parse("adv.zempty"), S)
    df = spark.createDataFrame([], S)
    t = t.new_transaction().append_dataframe(df, zorder_by=["k", "v"]).commit()
    assert t.to_df(spark).count() == 0
