"""$history and $manifests metadata tables (r13 continuation): history
ancestry flags across a rollback, and the manifest-chunk listing for a
spilled snapshot — both pure metadata folds, reachable as ``t$suffix``
through the SQL front-end."""

from __future__ import annotations

import pytest

from iceberg_catalog_postgres_spark.catalog.catalog import (
    PostgresCatalog,
    TableIdentifier,
)
from iceberg_catalog_postgres_spark.catalog.maintenance import (
    history_df,
    manifests_df,
)
from iceberg_catalog_postgres_spark.catalog.merge_sql import execute_dml


@pytest.fixture
def catalog(tmp_path):
    cat = PostgresCatalog.connect("mdt", None, str(tmp_path / "wh"))
    cat.initialize()
    yield cat
    cat.backend.close()


def test_history_flags_rollback(spark, catalog):
    df = spark.createDataFrame([(i,) for i in range(9)], "k int")
    t = catalog.create_table(TableIdentifier.parse("d.t"), df.schema)
    for lo in (0, 3, 6):
        t = (
            t.new_transaction()
            .append_dataframe(df.filter(f"k >= {lo} and k < {lo + 3}").coalesce(1))
            .commit()
        )
    snaps = t.metadata.snapshots
    t = t.rollback_to(snaps[1].snapshot_id)
    hist = history_df(spark, t).orderBy("made_current_at").collect()
    assert [h.snapshot_id for h in hist] == [s.snapshot_id for s in snaps]
    assert [h.is_current_ancestor for h in hist] == [True, True, False]
    # through SQL, joined against $snapshots
    n = execute_dml(
        spark, catalog,
        "SELECT count(*) AS n FROM d.t$history h JOIN d.t$snapshots s "
        "ON h.snapshot_id = s.snapshot_id WHERE h.is_current_ancestor",
    ).collect()[0].n
    assert n == 2
    # empty table: no snapshots, empty history
    e = catalog.create_table(TableIdentifier.parse("d.empty"), df.schema)
    assert history_df(spark, e).count() == 0


def test_manifests_lists_spilled_chunks(spark, catalog):
    df = spark.createDataFrame([(i, i % 5) for i in range(600)], "k int, r int")
    t = catalog.create_table(TableIdentifier.parse("d.big"), df.schema)
    t = (
        t.new_transaction()
        # range partitioning on a dense key: every one of the 120 output
        # files is non-empty, pushing the snapshot over MANIFEST_THRESHOLD
        .append_dataframe(df.repartitionByRange(120, "k"))
        .commit()
    )
    snap = t.metadata.current_snapshot()
    n_files = len(snap.data_files)
    assert n_files > 100  # over MANIFEST_THRESHOLD -> spilled
    assert snap.manifests
    m = manifests_df(spark, t).collect()
    assert len(m) == len(snap.manifests)
    assert sum(r.data_files for r in m) == n_files
    assert all(r.path for r in m)
    assert sum(r.data_records or 0 for r in m) == 600
    # through SQL
    got = execute_dml(
        spark, catalog,
        "SELECT sum(data_files) AS files, count(*) AS chunks "
        "FROM d.big$manifests",
    ).collect()[0]
    assert got.files == n_files and got.chunks == len(m)


def test_manifests_empty_for_inline_snapshot(spark, catalog):
    df = spark.createDataFrame([(1,)], "k int")
    t = catalog.create_table(TableIdentifier.parse("d.small"), df.schema)
    t = t.new_transaction().append_dataframe(df.coalesce(1)).commit()
    assert manifests_df(spark, t).count() == 0
    # no snapshot at all
    e = catalog.create_table(TableIdentifier.parse("d.none"), df.schema)
    assert manifests_df(spark, e).count() == 0


def test_show_namespaces(spark, catalog):
    from iceberg_catalog_postgres_spark.catalog.views import create_view

    df = spark.createDataFrame([(1,)], "k int")
    catalog.create_table(TableIdentifier.parse("a.t1"), df.schema)
    catalog.create_table(TableIdentifier.parse("b.t2"), df.schema)
    t = catalog.create_table(TableIdentifier.parse("a.t3"), df.schema)
    t.new_transaction().append_dataframe(df.coalesce(1)).commit()
    create_view(spark, catalog, TableIdentifier.parse("c.v"), "SELECT k FROM a.t3")
    got = [r.namespace for r in execute_dml(spark, catalog, "SHOW NAMESPACES").collect()]
    assert got == ["a", "b", "c"]


# ---------------------------------------------------------------------------
# add_files migration procedure (r13)


def test_add_files_registers_in_place(spark, catalog, tmp_path):
    import os

    from iceberg_catalog_postgres_spark.catalog.maintenance import add_files

    df = spark.createDataFrame([(i, i % 3) for i in range(30)], "k int, r int")
    store = catalog.object_store()
    legacy = os.path.join(store.root, "legacy")
    df.repartition(3).write.mode("overwrite").parquet(legacy)
    n_files = len([p for p in os.listdir(legacy) if p.endswith(".parquet")])

    t = catalog.create_table(TableIdentifier.parse("d.mig"), df.schema)
    t2, added, records = add_files(spark, t, "legacy")
    assert (added, records) == (n_files, 30)
    assert t2.to_df(spark).count() == 30
    # manifest stats came from the footers: planning prunes on them
    snap = t2.metadata.current_snapshot()
    assert all(
        "record_count" in (snap.file_stats.get(f) or {})
        for f in snap.data_files
    )
    assert t2.record_count() == 30  # pure metadata fold works

    # double registration refuses
    with pytest.raises(ValueError, match="already registered"):
        add_files(spark, t2, "legacy")


def test_add_files_guards(spark, catalog, tmp_path):
    import os

    from iceberg_catalog_postgres_spark.catalog.maintenance import add_files

    df = spark.createDataFrame([(1, 0)], "k int, r int")
    t = catalog.create_table(TableIdentifier.parse("d.mig"), df.schema)
    with pytest.raises(ValueError, match="no parquet files"):
        add_files(spark, t, "nowhere")
    # schema mismatch refuses loudly
    store = catalog.object_store()
    bad = os.path.join(store.root, "bad")
    spark.createDataFrame([(1, "x")], "k int, other string").write.mode(
        "overwrite"
    ).parquet(bad)
    with pytest.raises(ValueError, match="schema mismatch"):
        add_files(spark, t, "bad")
    # outside-warehouse path refuses
    outside = str(tmp_path / "outside")
    df.write.mode("overwrite").parquet(outside)
    with pytest.raises(ValueError, match="outside the warehouse"):
        add_files(spark, t, outside)


# ---------------------------------------------------------------------------
# ANALYZE TABLE (r13)


def test_analyze_for_columns_stores_ndv(spark, catalog):
    from iceberg_catalog_postgres_spark.catalog.maintenance import column_ndv

    df = spark.createDataFrame(
        [(i, i % 4, f"s{i % 7}") for i in range(60)], "k int, r int, s string"
    )
    t = catalog.create_table(TableIdentifier.parse("d.an"), df.schema)
    t.new_transaction().append_dataframe(df.coalesce(1)).commit()
    got = execute_dml(
        spark, catalog,
        "ANALYZE TABLE d.an COMPUTE STATISTICS FOR COLUMNS (r, s)",
    ).collect()
    assert {(x.stat, x.column, x.value) for x in got} == {
        ("ndv", "r", 4), ("ndv", "s", 7),
    }
    # the estimate is a stored property, readable with zero scans
    t2 = catalog.load_table(TableIdentifier.parse("d.an"))
    assert column_ndv(t2, "r") == 4
    # ALL COLUMNS covers the rest
    got = execute_dml(
        spark, catalog, "ANALYZE TABLE d.an COMPUTE STATISTICS FOR ALL COLUMNS"
    ).collect()
    assert {x.column for x in got} == {"k", "r", "s"}


def test_analyze_plain_backfills_stats(spark, catalog):
    import glob
    import os

    df = spark.createDataFrame([(1, 0, "a")], "k int, r int, s string")
    t = catalog.create_table(TableIdentifier.parse("d.bk"), df.schema)
    t = t.new_transaction().append_dataframe(df.coalesce(1)).commit()
    store = catalog.object_store()
    raw = os.path.join(store.root, "raw_bk")
    df.coalesce(1).write.mode("overwrite").parquet(raw)
    rels = [
        os.path.relpath(p, store.root)
        for p in glob.glob(os.path.join(raw, "*.parquet"))
    ]
    t = t.new_transaction().append_files(rels).commit()
    got = {
        x.stat: x.value
        for x in execute_dml(
            spark, catalog, "ANALYZE TABLE d.bk COMPUTE STATISTICS"
        ).collect()
    }
    assert got == {"files": 2, "files_backfilled": 1, "record_count": 2}
    # idempotent: a second run backfills nothing
    got = {
        x.stat: x.value
        for x in execute_dml(
            spark, catalog, "ANALYZE TABLE d.bk COMPUTE STATISTICS"
        ).collect()
    }
    assert got["files_backfilled"] == 0


def test_analyze_refusals(spark, catalog):
    df = spark.createDataFrame([(1,)], "k int")
    catalog.create_table(TableIdentifier.parse("d.rf"), df.schema)
    with pytest.raises(ValueError, match="unknown column"):
        execute_dml(
            spark, catalog,
            "ANALYZE TABLE d.rf COMPUTE STATISTICS FOR COLUMNS (nope)",
        )
    with pytest.raises(ValueError, match="COMPUTE STATISTICS"):
        execute_dml(spark, catalog, "ANALYZE TABLE d.rf GATHER STATS")


# ---------------------------------------------------------------------------
# TRUNCATE TABLE + $files time travel (r13)


def test_truncate_and_files_travel(spark, catalog):
    df = spark.createDataFrame([(i,) for i in range(9)], "k int")
    t = catalog.create_table(TableIdentifier.parse("d.tr"), df.schema)
    t = t.new_transaction().append_dataframe(df.coalesce(1)).commit()
    snap1 = t.metadata.current_snapshot_id
    t2 = execute_dml(spark, catalog, "TRUNCATE TABLE d.tr")
    assert t2.to_df(spark).count() == 0
    # metadata-only: the truncate snapshot references zero files
    assert t2.metadata.current_snapshot().data_files == []
    # history stays time-travelable
    n = execute_dml(
        spark, catalog, f"SELECT count(*) AS n FROM d.tr FOR VERSION AS OF {snap1}"
    ).collect()[0].n
    assert n == 9
    # truncate of an empty table is a no-op (same pointer)
    t3 = execute_dml(spark, catalog, "TRUNCATE TABLE d.tr")
    assert t3.metadata.current_snapshot_id == t2.metadata.current_snapshot_id
    # $files supports time travel; other metadata tables refuse
    old_files = execute_dml(
        spark, catalog,
        f"SELECT count(*) AS n FROM d.tr$files FOR VERSION AS OF {snap1}",
    ).collect()[0].n
    now_files = execute_dml(
        spark, catalog, "SELECT count(*) AS n FROM d.tr$files"
    ).collect()[0].n
    assert (old_files, now_files) == (1, 0)
    with pytest.raises(ValueError, match="files only"):
        execute_dml(
            spark, catalog,
            f"SELECT * FROM d.tr$history FOR VERSION AS OF {snap1}",
        )
