"""Incremental column-NDV sketches (Puffin/ANALYZE model): delta-only
updates, overwrite reset, metadata-only reads."""

from __future__ import annotations

import pytest
from pyspark.sql.types import LongType, StructField, StructType

from iceberg_catalog_postgres_spark.catalog.catalog import PostgresCatalog, TableIdentifier
from iceberg_catalog_postgres_spark.catalog.maintenance import column_ndv, update_column_ndv


@pytest.fixture
def catalog(tmp_path):
    cat = PostgresCatalog.connect("ndv_cat", None, str(tmp_path / "warehouse"))
    cat.initialize()
    yield cat
    cat.backend.close()


S = StructType([StructField("k", LongType(), True)])


def test_incremental_update_covers_only_delta(catalog, spark):
    t = catalog.create_table(TableIdentifier.parse("ndv.t1"), S)
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(i,) for i in range(100)], S).coalesce(1)
    ).commit()
    t = update_column_ndv(spark, t, ["k"])
    est1 = column_ndv(t, "k")
    assert abs(est1 - 100) / 100 <= 0.05
    c1 = list(t.metadata.properties["ndv.covered-files.k"])

    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(i,) for i in range(100, 150)], S).coalesce(1)
    ).commit()
    t = update_column_ndv(spark, t, ["k"])
    c2 = t.metadata.properties["ndv.covered-files.k"]
    assert c2[: len(c1)] == c1 and len(c2) == len(t.metadata.current_data_files())
    assert abs(column_ndv(t, "k") - 150) / 150 <= 0.05
    # idempotent: no new files -> same table (no commit)
    assert update_column_ndv(spark, t, ["k"]) is t


def test_overwrite_resets_sketches(catalog, spark):
    t = catalog.create_table(TableIdentifier.parse("ndv.t2"), S)
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(i,) for i in range(200)], S).coalesce(1)
    ).commit()
    t = update_column_ndv(spark, t, ["k"])
    assert abs(column_ndv(t, "k") - 200) / 200 <= 0.05
    t = t.new_transaction().overwrite_dataframe(
        spark.createDataFrame([(i,) for i in range(10)], S).coalesce(1)
    ).commit()
    t = update_column_ndv(spark, t, ["k"])
    # additive sketch cannot unsee removed rows -> must have reset
    assert column_ndv(t, "k") == 10
    assert len(t.metadata.properties["ndv.covered-files.k"]) == len(
        t.metadata.current_data_files()
    )


def test_ndv_survives_reload_without_scans(catalog, spark):
    t = catalog.create_table(TableIdentifier.parse("ndv.t3"), S)
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(i % 7,) for i in range(50)], S).coalesce(1)
    ).commit()
    t = update_column_ndv(spark, t, ["k"])
    fresh = catalog.load_table(TableIdentifier.parse("ndv.t3"))
    assert column_ndv(fresh, "k") == 7
    assert column_ndv(fresh, "missing") is None


S2 = StructType(
    [StructField("k", LongType(), True), StructField("v", LongType(), True)]
)


def test_new_column_on_fully_covered_table_gets_full_sketch(catalog, spark):
    """ADVICE r5: requesting NDV for a never-sketched column on a table
    whose files are all covered (a prior run analyzed OTHER columns) must
    sketch it over ALL current files, not the (empty) delta."""
    t = catalog.create_table(TableIdentifier.parse("ndv.t4"), S2)
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(i, i % 7) for i in range(200)], S2).coalesce(1)
    ).commit()
    t = update_column_ndv(spark, t, ["k"])           # covers every file for k
    assert column_ndv(t, "v") is None
    t = update_column_ndv(spark, t, ["v"])           # zero delta files for v
    assert column_ndv(t, "v") == 7                    # full pass, exact at 7
    # and k's existing sketch is untouched
    assert abs(column_ndv(t, "k") - 200) / 200 <= 0.05


def test_new_column_full_pass_spans_covered_and_delta_files(catalog, spark):
    """Mixed case: v never sketched + new files appended since k's ANALYZE.
    v must see BOTH the covered and the delta files; k only the delta."""
    t = catalog.create_table(TableIdentifier.parse("ndv.t5"), S2)
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(i, 0) for i in range(100)], S2).coalesce(1)
    ).commit()
    t = update_column_ndv(spark, t, ["k"])
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(i, 1) for i in range(100, 150)], S2).coalesce(1)
    ).commit()
    t = update_column_ndv(spark, t, ["k", "v"])
    assert column_ndv(t, "v") == 2                    # saw value 0 (covered) AND 1 (delta)
    assert abs(column_ndv(t, "k") - 150) / 150 <= 0.05
    for col in ("k", "v"):
        assert len(t.metadata.properties[f"ndv.covered-files.{col}"]) == len(
            t.metadata.current_data_files()
        )


def test_mixed_column_history_does_not_freeze_ndv(catalog, spark):
    """VERDICT r6 latent defect: with a SHARED covered-files set, the
    sequence analyze(A) → append → analyze(B) → analyze(A) froze A's NDV
    forever (B's full pass advanced the shared set past A's sketch).
    Per-column coverage must merge the appended files into A's sketch."""
    t = catalog.create_table(TableIdentifier.parse("ndv.t7"), S2)
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(i, i) for i in range(100)], S2).coalesce(1)
    ).commit()
    t = update_column_ndv(spark, t, ["k"])            # A = k covers file 1
    assert abs(column_ndv(t, "k") - 100) / 100 <= 0.05
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(i, i) for i in range(100, 200)], S2).coalesce(1)
    ).commit()
    t = update_column_ndv(spark, t, ["v"])            # B = v full pass only
    assert abs(column_ndv(t, "v") - 200) / 200 <= 0.05
    t = update_column_ndv(spark, t, ["k"])            # A again: delta = file 2
    # the shared-set layout returned ~100 here (stale forever); must be ~200
    assert abs(column_ndv(t, "k") - 200) / 200 <= 0.05
    assert len(t.metadata.properties["ndv.covered-files.k"]) == len(
        t.metadata.current_data_files()
    )


def test_legacy_shared_coverage_migrates(catalog, spark):
    """Metadata written under the pre-r7 shared `ndv.covered-files` layout
    must keep its delta-only behavior after migration: the shared set is
    adopted as every sketched column's own coverage on the next run."""
    from dataclasses import replace as _dc_replace

    t = catalog.create_table(TableIdentifier.parse("ndv.t8"), S)
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(i,) for i in range(50)], S).coalesce(1)
    ).commit()
    t = update_column_ndv(spark, t, ["k"])
    # rewrite the properties into the legacy shared layout in place
    props = dict(t.metadata.properties)
    props["ndv.covered-files"] = props.pop("ndv.covered-files.k")
    t.metadata = _dc_replace(t.metadata, properties=props)
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(i,) for i in range(50, 80)], S).coalesce(1)
    ).commit()
    t = update_column_ndv(spark, t, ["k"])
    assert abs(column_ndv(t, "k") - 80) / 80 <= 0.05
    assert "ndv.covered-files" not in t.metadata.properties
    assert len(t.metadata.properties["ndv.covered-files.k"]) == len(
        t.metadata.current_data_files()
    )


def test_no_commit_when_nothing_to_do(catalog, spark):
    """Empty table, or all requested columns current with no delta: the
    maintenance run must not land a metadata commit."""
    t = catalog.create_table(TableIdentifier.parse("ndv.t6"), S2)
    assert update_column_ndv(spark, t, ["k"]) is t    # no snapshot at all
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(1, 1)], S2).coalesce(1)
    ).commit()
    t = update_column_ndv(spark, t, ["k", "v"])
    loc = t.metadata_location()
    t2 = update_column_ndv(spark, t, ["k", "v"])
    assert t2 is t and t2.metadata_location() == loc


def test_analyze_retries_past_concurrent_append(catalog, spark):
    """r7: ANALYZE racing a concurrent commit must retry-recompute, not
    fail. Simulated with a STALE table handle: another writer appends
    between the handle's load and the analyze CAS — the retry reloads the
    winner and its recompute sees BOTH files, so the estimate covers the
    concurrent append too."""
    t = catalog.create_table(TableIdentifier.parse("ndv.race1"), S)
    t = t.new_transaction().append_dataframe(
        spark.createDataFrame([(i,) for i in range(60)], S).coalesce(1)
    ).commit()
    stale = catalog.load_table(TableIdentifier.parse("ndv.race1"))
    # concurrent writer lands after `stale` was loaded
    catalog.load_table(TableIdentifier.parse("ndv.race1")).new_transaction(
    ).append_dataframe(
        spark.createDataFrame([(i,) for i in range(60, 100)], S).coalesce(1)
    ).commit()
    t2 = update_column_ndv(spark, stale, ["k"])   # stale CAS -> retry path
    assert abs(column_ndv(t2, "k") - 100) / 100 <= 0.05
    assert len(t2.metadata.properties["ndv.covered-files.k"]) == len(
        t2.metadata.current_data_files()
    )
