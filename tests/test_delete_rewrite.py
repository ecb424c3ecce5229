"""Equality-delete -> positional-delete rewrite (r5): representation swap
must be invisible to readers across sequence scoping, renames, and
subsequent compaction."""

from __future__ import annotations

import pytest
from pyspark.sql.types import LongType, StructField, StructType

from iceberg_catalog_postgres_spark.catalog.catalog import PostgresCatalog, TableIdentifier
from iceberg_catalog_postgres_spark.catalog.maintenance import rewrite_equality_deletes


@pytest.fixture
def catalog(tmp_path):
    cat = PostgresCatalog.connect("rwdel_cat", None, str(tmp_path / "warehouse"))
    cat.initialize()
    yield cat
    cat.backend.close()


def _schema(names):
    return StructType([StructField(n, LongType(), True) for n in names])


def test_rewrite_preserves_seq_scoped_reinsert(catalog, spark):
    """Key deleted then re-inserted: the rewrite must target only the
    pre-delete file's row, so the re-inserted row survives."""
    s = _schema(["k"])
    t = catalog.create_table(TableIdentifier.parse("rw.t1"), s)
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(i,) for i in range(10)], s)
    ).commit()
    t = t.new_transaction().delete_keys_dataframe(
        spark.createDataFrame([(3,), (7,)], "k long")
    ).commit()
    t = t.new_transaction().append_dataframe(spark.createDataFrame([(7,)], s)).commit()

    before = sorted(r["k"] for r in t.to_df(spark).collect())
    t = rewrite_equality_deletes(spark, t)
    snap = t.metadata.current_snapshot()
    assert snap.delete_files == []
    assert snap.position_delete_files
    after = sorted(r["k"] for r in t.to_df(spark).collect())
    assert after == before == [0, 1, 2, 4, 5, 6, 7, 8, 9]
    # fresh catalog load reads the same
    t2 = catalog.load_table(TableIdentifier.parse("rw.t1"))
    assert sorted(r["k"] for r in t2.to_df(spark).collect()) == after


def test_rewrite_maps_delete_keys_through_rename(catalog, spark):
    """Delete file written under the OLD column name, column renamed, then
    rewritten: the key join must map forward through the rename log."""
    s = _schema(["id", "amount"])
    t = catalog.create_table(TableIdentifier.parse("rw.t2"), s)
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(1, 10), (2, 20), (3, 30)], s)
    ).commit()
    t = t.new_transaction().delete_keys_dataframe(
        spark.createDataFrame([(20,)], "amount long")
    ).commit()
    renamed = StructType(
        [
            StructField("id", LongType(), True, t.schema["id"].metadata),
            StructField("amount_usd", LongType(), True, t.schema["amount"].metadata),
        ]
    )
    t = t.commit_schema(renamed)
    before = sorted((r["id"], r["amount_usd"]) for r in t.to_df(spark).collect())
    t = rewrite_equality_deletes(spark, t)
    after = sorted((r["id"], r["amount_usd"]) for r in t.to_df(spark).collect())
    assert after == before == [(1, 10), (3, 30)]


def test_rewrite_noop_without_eq_deletes(catalog, spark):
    s = _schema(["k"])
    t = catalog.create_table(TableIdentifier.parse("rw.t3"), s)
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(1,)], s)
    ).commit()
    assert rewrite_equality_deletes(spark, t) is t
